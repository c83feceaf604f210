"""Reshaping operators (SURVEY.md §2.4 R1-R9): wide<->tall pivots,
schema-drift unions, lineage columns, header auto-detection.

The reference exploded a wide financial table (one row per metric,
~120 date-named columns — data/Balance-Sheet-TTM.csv:1) into
per-metric two-column frames with a Python loop over rows
(azuredatalake.py:170-221).  Spark-first: ``unpivot`` produces the
tall form in one narrow pass (no shuffle — it's a generator
projection), and the per-metric "files" become partitions of ONE
table (``partitionBy(metric)``), fixing the reference's
file-per-metric small-files problem at scale.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cdc_pipe_line_spark.functions import coerce_double


def unpivot_to_tall(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str] | None = None,
    *,
    var_name: str = "metric",
    value_name: str = "value",
    coerce_numeric: bool = True,
) -> DataFrame:
    """Wide -> tall (R1; azuredatalake.py:202-206).

    ``value_cols`` defaults to every non-id column.  Values are
    numeric-coerced (invalid -> null) like the reference's
    ``pd.to_numeric(errors='coerce')`` unless disabled.  Narrow op:
    rows fan out ``len(value_cols)``x with no exchange.
    """
    if value_cols is None:
        value_cols = [c for c in df.columns if c not in id_cols]
    cast_df = df.select(
        *id_cols,
        *[
            (coerce_double(c) if coerce_numeric else F.col(c).cast("string")).alias(c)
            for c in value_cols
        ],
    )
    return cast_df.unpivot(id_cols, value_cols, var_name, value_name)


def pivot_to_wide(
    df: DataFrame,
    group_cols: list[str],
    pivot_col: str,
    value_col: str,
    *,
    values: list[str] | None = None,
) -> DataFrame:
    """Tall -> wide (R9) for Power-BI-shaped output.

    Pass ``values`` whenever the pivot domain is known: it removes the
    extra distinct-collection job AND fixes the output schema (a
    requirement for 100 TB — an unbounded pivot domain is a driver
    OOM).  One shuffle on ``group_cols``.
    """
    p = df.groupBy(*group_cols).pivot(pivot_col, values)
    return p.agg(F.first(value_col))


def union_with_drift(dfs: list[DataFrame]) -> DataFrame:
    """Union frames whose schemas drifted (R3; app/app.py:646).

    ``unionByName(allowMissingColumns=True)`` — missing columns become
    nulls, the Spark-native equivalent of ``pd.concat``.
    """
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def add_lineage(df: DataFrame, **constants: str) -> DataFrame:
    """Prepend constant lineage columns (R4; app/app.py:626-629)."""
    return df.select(
        *[F.lit(v).alias(k) for k, v in constants.items()], "*"
    )


def detect_header_pandas(pdf, *, scan_rows: int = 3, marker: str = "date"):
    """Header auto-detection on a raw (headerless) sheet frame (R5;
    app/app.py:610-619).

    Driver-side by design: sheets are small files read on the driver
    before parallelizing (SURVEY.md §2.1 S2).  Scans the first
    ``scan_rows`` rows for a cell containing ``marker``
    (case-insensitive); that row becomes the header, the first header
    cell is renamed ``METRIC``, rows above are dropped.  Returns the
    re-headered pandas frame, or None when no header row is found.
    """
    import pandas as pd  # local: driver-side only

    for i in range(min(scan_rows, len(pdf))):
        row = pdf.iloc[i].fillna("").astype(str)
        if any(marker in v.lower() for v in row):
            header = list(row)
            header[0] = "METRIC"
            out = pdf.iloc[i + 1 :].copy()
            out.columns = [str(h) for h in header]
            return out.reset_index(drop=True)
    return None


def filename_metadata(path_col=None):
    """Name-derived metadata (R6; app/app.py:537,622-624): company =
    uppercased filename prefix before the first ``-``; returns a struct
    column ``(company, statement, frequency)`` parsed from the file
    path/sheet name.
    """
    c = path_col if path_col is not None else F.input_file_name()
    base = F.element_at(F.split(c, "/"), -1)
    stem = F.regexp_replace(base, r"\.[A-Za-z0-9]+$", "")
    parts = F.split(stem, "-")
    return F.struct(
        F.upper(F.element_at(parts, 1)).alias("company"),
        F.element_at(parts, 2).alias("statement"),
        F.element_at(parts, -1).alias("frequency"),
    )
