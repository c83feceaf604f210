"""Minimal stdlib-only OOXML (xlsx/docx) readers + writers.

The reference ingested xlsx via ``pd.read_excel`` and docx via
mammoth->HTML->``pd.read_html`` (reference app/app.py:425-465).  This
container ships neither openpyxl nor mammoth, so this module parses
the (public, ECMA-376) Office Open XML container directly with
``zipfile`` + ``xml.etree``: an xlsx is a zip holding
``xl/worksheets/sheet*.xml`` (+ optional ``xl/sharedStrings.xml``), a
docx holds ``word/document.xml``.  Only the features the CDC pipeline
needs are supported: inline/shared strings, numbers, tables,
tab-separated paragraphs.

These run driver-side on small upload files (same posture as the
reference — ingest normalization, not the distributed data path);
the resulting rows go straight into ``spark.createDataFrame``.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zipfile
from io import BytesIO

_SSML = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_WML = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
_PKG_REL = "http://schemas.openxmlformats.org/package/2006/relationships"
_ODREL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27 (0-based column index)."""
    idx = 0
    for ch in cell_ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return idx - 1


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        return "".join(el.text or "" for el in c.iter(f"{{{_SSML}}}t"))
    v = c.find(f"{{{_SSML}}}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return v.text == "1"
    # numeric: int when exact, else float
    try:
        f = float(v.text)
        return int(f) if f.is_integer() and "." not in v.text and "E" not in v.text.upper() else f
    except ValueError:  # malformed cell — keep raw text
        return v.text


def xlsx_sheet_names(data: bytes) -> list[str]:
    with zipfile.ZipFile(BytesIO(data)) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
    return [s.get("name", "") for s in wb.iter(f"{{{_SSML}}}sheet")]


def _sheet_part_paths(zf: zipfile.ZipFile) -> list[str]:
    """Worksheet part paths in ``workbook.xml`` declaration order.

    Resolves each ``<sheet r:id=...>`` through
    ``xl/_rels/workbook.xml.rels`` (ECMA-376 §12.3.23) — part file
    numbering need not match declaration order, and a lexicographic
    sort puts ``sheet10.xml`` before ``sheet2.xml``.  Falls back to a
    NUMERIC sort of ``sheetN.xml`` names when the rels part is absent.
    """
    rels: dict[str, str] = {}
    rels_path = "xl/_rels/workbook.xml.rels"
    if rels_path in zf.namelist():
        for rel in ET.fromstring(zf.read(rels_path)).iter(f"{{{_PKG_REL}}}Relationship"):
            target = rel.get("Target", "")
            # Target is workbook-relative ("worksheets/sheet1.xml") or
            # package-absolute ("/xl/worksheets/sheet1.xml")
            path = target.lstrip("/") if target.startswith("/") else f"xl/{target}"
            rels[rel.get("Id", "")] = path
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    out: list[str] = []
    for s in wb.iter(f"{{{_SSML}}}sheet"):
        rid = s.get(f"{{{_ODREL}}}id")
        if rid and rid in rels:
            out.append(rels[rid])
    if out:
        return out
    return sorted(
        (n for n in zf.namelist() if re.fullmatch(r"xl/worksheets/sheet\d+\.xml", n)),
        key=lambda n: int(re.search(r"(\d+)\.xml$", n).group(1)),
    )


def read_xlsx_rows(data: bytes, sheet: int | str = 0) -> list[list]:
    """One worksheet -> list of rows (ragged rows padded with None).

    ``sheet`` is a 0-based index or a sheet name.
    """
    with zipfile.ZipFile(BytesIO(data)) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            shared = [
                "".join(t.text or "" for t in si.iter(f"{{{_SSML}}}t"))
                for si in root.iter(f"{{{_SSML}}}si")
            ]
        if isinstance(sheet, str):
            names = xlsx_sheet_names(data)
            sheet = names.index(sheet)
        ws = ET.fromstring(zf.read(_sheet_part_paths(zf)[sheet]))

    rows: list[list] = []
    for row in ws.iter(f"{{{_SSML}}}row"):
        cells: list = []
        for c in row.iter(f"{{{_SSML}}}c"):
            ref = c.get("r")
            col = _col_index(ref) if ref else len(cells)
            while len(cells) < col:
                cells.append(None)
            cells.append(_cell_value(c, shared))
        rows.append(cells)
    width = max((len(r) for r in rows), default=0)
    return [r + [None] * (width - len(r)) for r in rows]


def read_docx_table(data: bytes) -> list[list[str]]:
    """First ``<w:tbl>`` -> rows of cell texts; when no table exists,
    fall back to tab-split paragraphs (reference app/app.py:290-333)."""
    with zipfile.ZipFile(BytesIO(data)) as zf:
        doc = ET.fromstring(zf.read("word/document.xml"))
    tbl = doc.find(f".//{{{_WML}}}tbl")
    if tbl is not None:
        return [
            [
                "".join(t.text or "" for t in tc.iter(f"{{{_WML}}}t"))
                for tc in tr.findall(f"{{{_WML}}}tc")
            ]
            for tr in tbl.findall(f"{{{_WML}}}tr")
        ]
    out = []
    for p in doc.iter(f"{{{_WML}}}p"):
        text = "".join(t.text or "" for t in p.iter(f"{{{_WML}}}t"))
        if text.strip():
            out.append(text.split("\t"))
    return out


# --------------------------------------------------------------- writers
# Deterministic fixture writers (tests + staged io queries).

_XLSX_CT = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
    '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
    "{sheet_overrides}"
    "</Types>"
)
_XLSX_SHEET_CT = (
    '<Override PartName="/xl/worksheets/sheet{i}.xml" '
    'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
)
_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="{target}"/>'
    "</Relationships>"
)


def _esc(s: str) -> str:
    return (
        str(s)
        .replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
    )


def write_xlsx(sheets: dict[str, list[list]]) -> bytes:
    """``{sheet_name: rows}`` -> xlsx bytes (inline strings, numbers)."""
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        n = len(sheets)
        zf.writestr(
            "[Content_Types].xml",
            _XLSX_CT.format(
                sheet_overrides="".join(
                    _XLSX_SHEET_CT.format(i=i + 1) for i in range(n)
                )
            ),
        )
        zf.writestr("_rels/.rels", _RELS.format(target="xl/workbook.xml"))
        sheet_tags = "".join(
            f'<sheet name="{_esc(name)}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
            for i, name in enumerate(sheets)
        )
        zf.writestr(
            "xl/workbook.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<workbook xmlns="{_SSML}" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
            f"<sheets>{sheet_tags}</sheets></workbook>",
        )
        rels = "".join(
            f'<Relationship Id="rId{i + 1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
            f'Target="worksheets/sheet{i + 1}.xml"/>'
            for i in range(n)
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            f"{rels}</Relationships>",
        )
        for i, rows in enumerate(sheets.values()):
            body = []
            for r, row in enumerate(rows, start=1):
                cells = []
                for j, v in enumerate(row):
                    if v is None:
                        continue
                    ref = f"{_col_letter(j)}{r}"
                    if isinstance(v, (int, float)) and not isinstance(v, bool):
                        cells.append(f'<c r="{ref}"><v>{v}</v></c>')
                    else:
                        cells.append(
                            f'<c r="{ref}" t="inlineStr"><is><t>{_esc(v)}</t></is></c>'
                        )
                body.append(f'<row r="{r}">{"".join(cells)}</row>')
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                f'<worksheet xmlns="{_SSML}"><sheetData>'
                f'{"".join(body)}</sheetData></worksheet>',
            )
    return buf.getvalue()


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def write_docx_table(rows: list[list[str]]) -> bytes:
    """Rows -> docx bytes holding one table."""
    buf = BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(
            "[Content_Types].xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            '<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
            '<Default Extension="xml" ContentType="application/xml"/>'
            '<Override PartName="/word/document.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>'
            "</Types>",
        )
        zf.writestr("_rels/.rels", _RELS.format(target="word/document.xml"))
        trs = "".join(
            "<w:tr>"
            + "".join(
                f"<w:tc><w:p><w:r><w:t>{_esc(c)}</w:t></w:r></w:p></w:tc>"
                for c in row
            )
            + "</w:tr>"
            for row in rows
        )
        zf.writestr(
            "word/document.xml",
            '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            f'<w:document xmlns:w="{_WML}"><w:body>'
            f"<w:tbl>{trs}</w:tbl></w:body></w:document>",
        )
    return buf.getvalue()
