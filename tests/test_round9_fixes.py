"""Round-9 ADVICE regressions: TIFF inline value slots, PNG filter-type
validation, JPEG progressive classification, linear-trend degenerate
groups, watermark-metrics guard.

Reference parity: the reference ingests uploaded artifacts as opaque
rows (app/app.py upload path); the codec edge cases bound here belong
to the multimodal column extension, so the contract is bound directly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from cdc_pipe_line_spark.multimodal import (
    MediaDecodeError,
    _jpeg_gray_pixels,
    _png_gray_pixels,
    _tiff_gray_pixels,
    jpeg_frame_class,
    make_jpeg_gray,
    make_png_gray,
    make_tiff_gray,
)


# ---------------------------------------------------------------------
# TIFF: count>1 values whose bytes fit the 4-byte slot are INLINE
# (TIFF6 spec p.15), not offset-indirect — ADVICE r8 item 1.
# ---------------------------------------------------------------------


def _tiff_inline_short_strips(arr: np.ndarray, *, little_endian: bool = True) -> bytes:
    """Two-strip TIFF whose StripOffsets/StripByteCounts are TWO
    SHORTs stored INLINE in the entry value slot (count*size == 4)."""
    e = "<" if little_endian else ">"
    h, w = arr.shape
    rps = (h + 1) // 2
    strips = [arr[:rps].tobytes(), arr[rps:].tobytes()]
    n_entries = 9
    ifd_off = 8
    data_off = ifd_off + 2 + n_entries * 12 + 4
    strip0_off = data_off
    strip1_off = strip0_off + len(strips[0])
    assert strip1_off + len(strips[1]) < 0x10000  # SHORT-addressable

    def entry(tag, typ, count, value):
        return struct.pack(f"{e}HHII", tag, typ, count, value)

    def short_val(v):
        return v if little_endian else v << 16

    def two_shorts(v0, v1):
        # the 4-byte value slot holds the two SHORTs back to back in
        # file byte order
        (packed,) = struct.unpack(f"{e}I", struct.pack(f"{e}HH", v0, v1))
        return packed

    ifd = b"".join(
        [
            entry(256, 3, 1, short_val(w)),
            entry(257, 3, 1, short_val(h)),
            entry(258, 3, 1, short_val(8)),
            entry(259, 3, 1, short_val(1)),
            entry(262, 3, 1, short_val(1)),
            entry(273, 3, 2, two_shorts(strip0_off, strip1_off)),
            entry(277, 3, 1, short_val(1)),
            entry(278, 3, 1, short_val(rps)),
            entry(279, 3, 2, two_shorts(len(strips[0]), len(strips[1]))),
        ]
    )
    return (
        (b"II" if little_endian else b"MM")
        + struct.pack(f"{e}HI", 42, ifd_off)
        + struct.pack(f"{e}H", n_entries)
        + ifd
        + struct.pack(f"{e}I", 0)
        + strips[0]
        + strips[1]
    )


@pytest.mark.parametrize("little_endian", [True, False])
def test_tiff_inline_short_strip_arrays_decode(little_endian):
    arr = (np.arange(24) * 7 % 256).astype(np.uint8).reshape(4, 6)
    data = _tiff_inline_short_strips(arr, little_endian=little_endian)
    w, h, n_strips, raster = _tiff_gray_pixels(data)
    assert (w, h, n_strips) == (6, 4, 2)
    assert np.array_equal(raster, arr)


@pytest.mark.parametrize("little_endian", [True, False])
def test_tiff_offset_indirect_long_strips_still_decode(little_endian):
    arr = (np.arange(40) * 3 % 256).astype(np.uint8).reshape(5, 8)
    data = make_tiff_gray(arr, little_endian=little_endian)
    w, h, n_strips, raster = _tiff_gray_pixels(data)
    assert (w, h, n_strips) == (8, 5, 2)
    assert np.array_equal(raster, arr)


# ---------------------------------------------------------------------
# PNG: unknown scanline filter types must QUARANTINE (PNG spec §9),
# not silently fall through to Paeth — ADVICE r8 item 2.
# ---------------------------------------------------------------------


def test_png_invalid_filter_type_quarantines():
    arr = np.full((3, 4), 9, dtype=np.uint8)
    enc = make_png_gray(arr)
    # rebuild the IDAT with filter byte 5 on row 0
    h, w = arr.shape
    raw = bytearray()
    for r in range(h):
        raw += bytes([5 if r == 0 else 0]) + arr[r].tobytes()
    body = zlib.compress(bytes(raw))
    idat = (
        len(body).to_bytes(4, "big")
        + b"IDAT"
        + body
        + zlib.crc32(b"IDAT" + body).to_bytes(4, "big")
    )
    # splice: signature + IHDR chunk (8+25 bytes) + new IDAT + IEND
    iend = enc[enc.index(b"IEND") - 4 :]
    bad = enc[: 8 + 25] + idat + iend
    # _png_decode's structural walk rejects it first ("bad filter
    # type 5 on row 0"); the unfilter loop carries its own guard too
    # (defense in depth) — accept either precise reason
    with pytest.raises(MediaDecodeError, match="filter type 5"):
        _png_gray_pixels(bad)


def test_png_valid_filters_still_decode():
    arr = (np.arange(35) * 11 % 256).astype(np.uint8).reshape(5, 7)
    w, h, out = _png_gray_pixels(make_png_gray(arr))
    assert (w, h) == (7, 5)
    assert np.array_equal(out, arr)


# ---------------------------------------------------------------------
# JPEG: progressive (SOF2) classified with a PRECISE reason
# (VERDICT r8 item 5) — and the header-tier frame classifier.
# ---------------------------------------------------------------------


def _to_sof2(payload: bytes) -> bytes:
    i = payload.index(b"\xff\xc0")
    return payload[:i] + b"\xff\xc2" + payload[i + 2 :]


def test_jpeg_progressive_raises_precise_reason():
    arr = np.full((8, 8), 128, dtype=np.uint8)
    prog = _to_sof2(make_jpeg_gray(arr))
    with pytest.raises(MediaDecodeError, match="progressive"):
        _jpeg_gray_pixels(prog)


def test_jpeg_frame_class():
    arr = np.full((8, 8), 128, dtype=np.uint8)
    base = make_jpeg_gray(arr)
    assert jpeg_frame_class(base) == "baseline"
    assert jpeg_frame_class(_to_sof2(base)) == "progressive"
    i = base.index(b"\xff\xc0")
    ext = base[:i] + b"\xff\xc1" + base[i + 2 :]
    assert jpeg_frame_class(ext) == "extended"
    lossless = base[:i] + b"\xff\xc3" + base[i + 2 :]
    assert jpeg_frame_class(lossless) == "lossless"
    with pytest.raises(MediaDecodeError, match="SOF"):
        jpeg_frame_class(base[:i])  # truncated before any SOF


# ---------------------------------------------------------------------
# Watermark-metrics guard: a progress row with rows but no 'gate'
# observed metrics degrades (skipped) instead of TypeError —
# ADVICE r8 item 3.
# ---------------------------------------------------------------------


def test_watermark_progress_rows_guard():
    from cdc_pipe_line_spark.queries.streaming_q import _watermark_progress_rows

    good = {
        "batchId": 1,
        "numInputRows": 10,
        "stateOperators": [{"numRowsDroppedByWatermark": 2}],
        "observedMetrics": {
            "gate": {"obs_rows": 10, "obs_min_id": 1, "obs_max_id": 99}
        },
    }
    missing_gate = {
        "batchId": 2,
        "numInputRows": 5,
        "stateOperators": [],
        "observedMetrics": {},
    }
    no_om = {"batchId": 3, "numInputRows": 4}
    empty = {"batchId": 4, "numInputRows": 0}
    rows = _watermark_progress_rows([good, missing_gate, no_om, empty])
    assert rows == [(1, 10, 2, 10, 1, 99)]


# ---------------------------------------------------------------------
# global_running_sum: exact + deterministic (the global_row_number
# boundary-resampling trap applies identically to the cumsum twin).
# ---------------------------------------------------------------------


def test_global_running_sum_exact_and_deterministic(spark):
    from pyspark.sql import functions as F

    from cdc_pipe_line_spark.functions import global_running_sum

    df = (
        spark.range(2550)
        .select(
            F.md5(F.col("id").cast("string")).alias("ok"),
            F.col("id"),
            (F.col("id") % 97 + 1).alias("v"),
        )
    )
    out = {
        r["id"]: r["cum_before"]
        for r in global_running_sum(df, ["ok", "id"], "v").collect()
    }
    rows = sorted(
        ((r["ok"], r["id"], r["v"]) for r in df.collect())
    )
    cum, truth = 0, {}
    for _ok, i, v in rows:
        truth[i] = cum
        cum += v
    assert out == truth
    out2 = {
        r["id"]: r["cum_before"]
        for r in global_running_sum(df, ["ok", "id"], "v").collect()
    }
    assert out2 == truth


# ---------------------------------------------------------------------
# EXIF GPS sub-IFD: nested pointer walk + RATIONAL[3] folds.
# ---------------------------------------------------------------------


def test_exif_gps_roundtrip_and_quarantine():
    from cdc_pipe_line_spark.multimodal import (
        _exif_gps_fields,
        make_exif_gps_app1,
    )

    for le, bo in ((True, "II"), (False, "MM")):
        app1 = make_exif_gps_app1(
            48, 51, 23456, "N", 2, 21, 7890, "E", little_endian=le
        )
        got = _exif_gps_fields(b"\xff\xd8" + app1 + b"\xff\xd9")
        assert got == (
            bo,
            "N",
            (48 * 3600 + 51 * 60) * 1_000_000 + 23456 * 1000,
            "E",
            (2 * 3600 + 21 * 60) * 1_000_000 + 7890 * 1000,
        )
    bad = make_exif_gps_app1(1, 2, 3, "S", 4, 5, 6, "W", break_pointer=True)
    with pytest.raises(MediaDecodeError, match="GPS IFD offset out of range"):
        _exif_gps_fields(b"\xff\xd8" + bad + b"\xff\xd9")
