"""Source/sink queries (SURVEY.md §2.1 S1-S14): each stages a
deterministic file-format fixture under ``/tmp/cdc_io_cache`` derived
from the parquet test tables, ingests it through
:mod:`cdc_pipe_line_spark.sources`, and is hash-checked against a
DuckDB oracle over the original tables — proving the format round
trips losslessly.
"""

from __future__ import annotations

import os
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cdc_pipe_line_spark import ooxml, sources


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from cdc_pipe_line_spark.queries import load_table

    return load_table(spark, sf_dir, name)


def _cache(sf_dir: str, leaf: str) -> tuple[str, bool]:
    sf_name = os.path.basename(sf_dir.rstrip("/")) or "sf"
    path = f"/tmp/cdc_io_cache/{sf_name}/{leaf}"
    ready = os.path.exists(os.path.join(path, "_READY")) or (
        os.path.isfile(path) and os.path.getsize(path) > 0
    )
    return path, ready


def _mark(path: str) -> None:
    with open(os.path.join(path, "_READY"), "w") as fh:
        fh.write("ok")


# ------------------------------------------------------------- S1 + S5


def q_io_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part -> CSV sink -> CSV scan (header + inferSchema) -> agg."""
    path, ready = _cache(sf_dir, "part_csv")
    if not ready:
        part = _t(spark, sf_dir, "part").select(
            "p_partkey", "p_brand", "p_retailprice"
        )
        part.write.mode("overwrite").option("header", "true").csv(path)
        _mark(path)
    df = sources.read_csv(spark, os.path.join(path, "*.csv"))
    return df.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.sum("p_partkey").alias("sum_key"),
        F.min("p_retailprice").alias("min_price"),
        F.max("p_retailprice").alias("max_price"),
    )


# ------------------------------------------------------------ S12 + S13


def q_io_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> JSON sink -> JSON scan -> agg (S12/S13)."""
    path, ready = _cache(sf_dir, "events_json")
    if not ready:
        ev = _t(spark, sf_dir, "events").select(
            "event_id", "ts", "event_type", "value"
        )
        sources.write_json(ev, path)
        _mark(path)
    df = sources.read_json(spark, path)
    return df.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("event_id").alias("sum_id"),
        F.max("value").alias("max_value"),
    )


# ------------------------------------------------------------ S5 + S14


def q_io_partitioned_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem -> partitioned parquet layout -> pruned scan of ONE
    partition (S14): the Catalyst answer to the reference's
    path-convention pruning."""
    path, ready = _cache(sf_dir, "lineitem_part")
    if not ready:
        li = _t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_quantity", "l_returnflag"
        )
        sources.write_parquet_partitioned(li, path, ["l_returnflag"])
        _mark(path)
    df = spark.read.parquet(path).filter(F.col("l_returnflag") == "A")
    return df.agg(
        F.count("*").alias("n_rows"),
        F.sum("l_quantity").alias("sum_qty"),
        F.sum("l_orderkey").alias("sum_orderkey"),
    )


# ------------------------------------------------------------------ S2


def q_io_xlsx_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nation -> xlsx (junk rows above a 'Date' header, reference
    shape) -> stdlib OOXML scan with header autodetect (S2 + R5)."""
    path, ready = _cache(sf_dir, "nation.xlsx")
    if not ready:
        nation = sorted(
            _t(spark, sf_dir, "nation")
            .select("n_nationkey", "n_name", "n_regionkey")
            .collect()
        )
        rows: list[list] = [
            ["Generated workbook", None, None],
            [None, "ignore me", None],
            ["Name", "Date", "RegionKey"],
        ]
        rows += [[r.n_name, "2024-01-01", r.n_regionkey] for r in nation]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as fh:
            fh.write(ooxml.write_xlsx({"Balance-Sheet-TTM": rows}))
    return sources.read_xlsx(spark, path)


# ------------------------------------------------------------------ S3


def q_io_docx_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """region -> docx table -> stdlib OOXML scan (S3)."""
    path, ready = _cache(sf_dir, "region.docx")
    if not ready:
        region = sorted(
            _t(spark, sf_dir, "region").select("r_regionkey", "r_name").collect()
        )
        rows = [["r_regionkey", "r_name"]]
        rows += [[str(r.r_regionkey), r.r_name] for r in region]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as fh:
            fh.write(ooxml.write_docx_table(rows))
    return sources.read_docx(spark, path)


# ------------------------------------------------- S4 + R3 + R4 + R6


def q_io_zip_consolidated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two workbooks in a zip -> consolidated wide table with lineage
    columns and schema-drift union (S4; app/app.py:574-646).

    Workbook ACME has a 2-quarter sheet; workbook ZETA-corp has a
    1-quarter sheet — the missing quarter must surface as nulls via
    unionByName(allowMissingColumns=True).
    """
    path, ready = _cache(sf_dir, "financials.zip")
    if not ready:
        nation = sorted(
            _t(spark, sf_dir, "nation")
            .select("n_nationkey", "n_name", "n_regionkey")
            .collect()
        )
        region = sorted(
            _t(spark, sf_dir, "region").select("r_regionkey", "r_name").collect()
        )
        acme_rows: list[list] = [["Metric", "Date", "2024-03-31", "2024-06-30"]]
        acme_rows += [
            [r.n_name, "TTM", r.n_regionkey, r.n_nationkey] for r in nation
        ]
        zeta_rows: list[list] = [["Metric", "Date", "2024-03-31"]]
        zeta_rows += [[r.r_name, "Q", r.r_regionkey] for r in region]
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            zf.writestr(
                "ACME-financials.xlsx",
                ooxml.write_xlsx({"Balance-Sheet-TTM": acme_rows}),
            )
            zf.writestr(
                "ZETA-corp.xlsx", ooxml.write_xlsx({"Income-Statement-Q": zeta_rows})
            )
            zf.writestr("__MACOSX/junk.xlsx", b"not a workbook")
        os.replace(tmp, path)
    return sources.read_zip_workbooks(spark, path)


# ----------------------------------------------------------------- S10


def q_io_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier -> JDBC sink -> partitioned JDBC scan -> agg (S10).

    The database is embedded Derby (ships with Spark's JVM) standing in
    for the reference's Postgres (consumer.py:126-206,
    chatbot.py:150-158); the wrapper is plain ``df.write.jdbc`` /
    ``spark.read.jdbc`` so any dialect with a driver jar works
    unchanged.  The read back is a 4-way parallel range scan on
    ``s_suppkey`` — the JDBC scale shape.
    """
    path, ready = _cache(sf_dir, "derby")
    # keep Derby's home (and its derby.log) out of the repo cwd
    spark._jvm.java.lang.System.setProperty("derby.system.home", "/tmp/cdc_io_cache")
    url = f"jdbc:derby:{path}/db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    if not ready:
        os.makedirs(path, exist_ok=True)
        supp = _t(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
        )
        sources.write_jdbc(
            supp, url, "supplier_rt", num_partitions=2, properties=props
        )
        _mark(path)
    hi = 10_000_000
    df = sources.read_jdbc(
        spark,
        url,
        "supplier_rt",
        partition_column="s_suppkey",
        lower_bound=0,
        upper_bound=hi,
        num_partitions=4,
        properties=props,
    )
    df = df.toDF(*[c.lower() for c in df.columns])  # Derby uppercases
    return df.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("s_suppkey").alias("sum_key"),
        F.min("s_acctbal").alias("min_bal"),
        F.max("s_acctbal").alias("max_bal"),
    )


QUERIES = {
    "io_csv_roundtrip": q_io_csv_roundtrip,
    "io_json_roundtrip": q_io_json_roundtrip,
    "io_partitioned_prune": q_io_partitioned_prune,
    "io_xlsx_ingest": q_io_xlsx_ingest,
    "io_docx_ingest": q_io_docx_ingest,
    "io_zip_consolidated": q_io_zip_consolidated,
    "io_jdbc_roundtrip": q_io_jdbc_roundtrip,
}

ORACLE = {
    "io_csv_roundtrip": """
SELECT p_brand, count(*) AS n_parts, CAST(sum(p_partkey) AS BIGINT) AS sum_key,
       min(p_retailprice) AS min_price, max(p_retailprice) AS max_price
FROM part GROUP BY p_brand""",
    "io_json_roundtrip": """
SELECT event_type, count(*) AS n_events, CAST(sum(event_id) AS BIGINT) AS sum_id,
       max(value) AS max_value
FROM events GROUP BY event_type""",
    "io_partitioned_prune": """
SELECT count(*) AS n_rows, sum(l_quantity) AS sum_qty,
       CAST(sum(l_orderkey) AS BIGINT) AS sum_orderkey
FROM lineitem WHERE l_returnflag = 'A'""",
    "io_xlsx_ingest": """
SELECT n_name AS METRIC, '2024-01-01' AS Date,
       CAST(n_regionkey AS VARCHAR) AS RegionKey
FROM nation""",
    "io_docx_ingest": """
SELECT CAST(r_regionkey AS VARCHAR) AS r_regionkey, r_name FROM region""",
    "io_zip_consolidated": """
SELECT 'GAS UTILITY' AS SECTOR, 'ACME' AS COMPANY,
       'Balance' AS STATEMENT, 'TTM' AS FREQUENCY,
       n_name AS METRIC, 'TTM' AS Date,
       CAST(n_regionkey AS VARCHAR) AS "2024-03-31",
       CAST(n_nationkey AS VARCHAR) AS "2024-06-30"
FROM nation
UNION ALL
SELECT 'GAS UTILITY', 'ZETA', 'Income', 'Q',
       r_name, 'Q', CAST(r_regionkey AS VARCHAR), NULL
FROM region""",
    "io_jdbc_roundtrip": """
SELECT s_nationkey, count(*) AS n_suppliers,
       CAST(sum(s_suppkey) AS BIGINT) AS sum_key,
       min(s_acctbal) AS min_bal, max(s_acctbal) AS max_bal
FROM supplier GROUP BY s_nationkey""",
}
