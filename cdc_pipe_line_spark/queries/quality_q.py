"""Data-quality constraint suite (Deequ-style declarative checks).

The reference pipeline trusts its upstream dumps blindly (e.g.
``/root/reference/cdc_data_dump.sql`` is loaded without validation;
``consumer.py`` quarantines only JSON decode errors) — a production
CDC lake needs a verification layer that asserts the contracts a
downstream consumer relies on: primary-key uniqueness, referential
integrity, completeness, value bounds, and cross-column consistency.

This pack runs each check as ONE shrinking aggregate (or one anti-join
count) over its table and unions the 1-row verdicts — at 100 TB every
check is a full scan but nothing wider: no window functions, no
row-level materialization, and the union is of single-row frames, so
the job is a handful of independent map-reduce passes that AQE runs
in parallel off one action.  The referential-integrity check is the
only shuffle join, and it aggregates BEFORE the join (distinct keys,
not raw rows), so the join input is bounded by key cardinality, not
table size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from cdc_pipe_line_spark.queries import load_table

    return load_table(spark, sf_dir, name)


def constraint_suite(
    customer: DataFrame,
    orders: DataFrame,
    events: DataFrame,
    lineitem: DataFrame,
    documents: DataFrame,
) -> DataFrame:
    """Run the standard check set; returns one row per constraint:
    ``(constraint, table, metric double, passed boolean)``.

    metric semantics per check:
      - ``pk_unique``: number of duplicated key values
      - ``ri_orphans``: foreign keys with no parent row
      - ``completeness``: fraction of NULLs in the column
      - ``bounds``: rows outside the legal range
      - ``accepted_values``: rows outside the domain
      - ``consistency``: rows violating the cross-column invariant
    """

    def verdict(constraint: str, table: str, metric, passed):
        return F.struct(
            F.lit(constraint).alias("constraint"),
            F.lit(table).alias("table_name"),
            metric.cast("double").alias("metric"),
            passed.alias("passed"),
        )

    # 1. PK uniqueness: duplicated c_custkey values.
    dup = F.count("*") - F.count_distinct(F.col("c_custkey"))
    pk = customer.agg(
        verdict("pk_unique_c_custkey", "customer", dup, dup == 0).alias("v")
    )

    # 2. Referential integrity: orders.o_custkey -> customer.c_custkey.
    #    Aggregate to distinct keys FIRST so the anti-join is
    #    key-cardinality-sized, then count the orphans.
    orphans = (
        orders.select(F.col("o_custkey").alias("k"))
        .distinct()
        .join(
            customer.select(F.col("c_custkey").alias("k")).distinct(),
            "k",
            "left_anti",
        )
    )
    ri = orphans.agg(
        verdict(
            "ri_orders_custkey", "orders", F.count("*"), F.count("*") == 0
        ).alias("v")
    )

    # 3. Completeness: NULL fraction of events.value (pipeline contract:
    #    at most half the rows may carry a NULL measure).
    nullfrac = F.round(
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0))
        / F.count("*"),
        6,
    )
    comp = events.agg(
        verdict(
            "completeness_events_value", "events", nullfrac, nullfrac <= 0.5
        ).alias("v")
    )

    # 4. Bounds: l_quantity must lie in [1, 50] (TPC-H domain).
    oob = F.sum(
        F.when(
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1
        ).otherwise(0)
    )
    bounds = lineitem.agg(
        verdict("bounds_l_quantity_1_50", "lineitem", oob, oob == 0).alias(
            "v"
        )
    )

    # 5. Accepted values: o_orderstatus in {O, F, P}.
    bad = F.sum(
        F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
    )
    dom = orders.agg(
        verdict(
            "accepted_values_o_orderstatus", "orders", bad, bad == 0
        ).alias("v")
    )

    # 6. Cross-column consistency: documents.n_chars == length(text).
    bad_len = F.sum(
        F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
    )
    cons = documents.agg(
        verdict(
            "consistency_documents_n_chars", "documents", bad_len,
            bad_len == 0,
        ).alias("v")
    )

    frames = [pk, ri, comp, bounds, dom, cons]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.select("v.*")


def q_constraint_suite(spark, sf_dir):
    """Declarative data-quality verification over five tables in one
    action: PK uniqueness, FK integrity, completeness, bounds, domain,
    and cross-column consistency — each a single shrinking aggregate."""
    return constraint_suite(
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "events"),
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "documents"),
    )


QUERIES = {
    "qa_constraint_suite": q_constraint_suite,
}

ORACLE = {
    "qa_constraint_suite": """
SELECT 'pk_unique_c_custkey' AS constraint, 'customer' AS table_name,
  CAST(count(*) - count(DISTINCT c_custkey) AS DOUBLE) AS metric,
  count(*) - count(DISTINCT c_custkey) = 0 AS passed
FROM customer
UNION ALL
SELECT 'ri_orders_custkey', 'orders',
  CAST(count(*) AS DOUBLE), count(*) = 0
FROM (
  SELECT DISTINCT o_custkey FROM orders
  WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
UNION ALL
SELECT 'completeness_events_value', 'events',
  round(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) / count(*), 6),
  round(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) / count(*), 6)
    <= 0.5
FROM events
UNION ALL
SELECT 'bounds_l_quantity_1_50', 'lineitem',
  CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END)
    AS DOUBLE),
  sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) = 0
FROM lineitem
UNION ALL
SELECT 'accepted_values_o_orderstatus', 'orders',
  CAST(sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0
    END) AS DOUBLE),
  sum(CASE WHEN o_orderstatus NOT IN ('O', 'F', 'P') THEN 1 ELSE 0 END)
    = 0
FROM orders
UNION ALL
SELECT 'consistency_documents_n_chars', 'documents',
  CAST(sum(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END)
    AS DOUBLE),
  sum(CASE WHEN n_chars != length(text) THEN 1 ELSE 0 END) = 0
FROM documents""",
}
