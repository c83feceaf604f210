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


def q_gdpr_purge_audit(spark, sf_dir):
    """Right-to-be-forgotten purge with audit trail: a deterministic
    deletion-request set (user_id % 97 == 0 stands in for the request
    table) is anti-joined out of the event store, and the audit emits
    per-table before/after row counts plus a verified-zero-remaining
    flag — the compliance evidence a data-subject-erasure job must
    produce.  Scale shape: the request set is broadcast into both the
    purge anti-join and the residual check, so the fact table is
    scanned once per leg with no shuffle; counts are shrinking
    aggregates.  The purged frame is pinned — audit counts and the
    residual check both derive from it."""
    ev = _t(spark, sf_dir, "events")
    requests = (
        ev.select("user_id")
        .distinct()
        .filter(F.col("user_id") % 97 == 0)
        .localCheckpoint(eager=True)
    )
    purged = ev.join(
        F.broadcast(requests), "user_id", "left_anti"
    ).localCheckpoint(eager=True)
    before = ev.agg(
        F.count("*").alias("rows_before"),
        F.count_distinct("user_id").alias("users_before"),
    )
    after = purged.agg(
        F.count("*").alias("rows_after"),
        F.count_distinct("user_id").alias("users_after"),
    )
    residual = (
        purged.join(F.broadcast(requests), "user_id", "left_semi")
        .agg(F.count("*").alias("rows_residual"))
    )
    n_req = requests.agg(F.count("*").alias("n_requests"))
    return (
        before.crossJoin(after)
        .crossJoin(residual)
        .crossJoin(n_req)
        .select(
            "n_requests",
            "rows_before",
            "rows_after",
            (F.col("rows_before") - F.col("rows_after")).alias(
                "rows_purged"
            ),
            "users_before",
            "users_after",
            "rows_residual",
            (F.col("rows_residual") == 0).alias("purge_verified"),
        )
    )


def q_skew_report(spark, sf_dir):
    """Join-key skew diagnostics — the pre-flight a 100 TB join wants
    before choosing salting / AQE skew handling: per candidate key,
    the cardinality, the hottest key's share of rows, and the
    max/mean rows-per-key ratio.  One shuffle per key column
    (pre-aggregated histograms); the per-key histogram never leaves
    the executors — only the 1-row summary does."""

    def profile(df: DataFrame, table: str, col: str) -> DataFrame:
        hist = df.groupBy(F.col(col).alias("k")).agg(
            F.count("*").alias("n")
        )
        fl = lambda c: F.floor(c * 10000 + F.lit(0.5)) / 10000
        return hist.agg(
            F.lit(table).alias("table_name"),
            F.lit(col).alias("key_col"),
            F.count("*").alias("n_keys"),
            F.sum("n").alias("n_rows"),
            F.max("n").alias("max_per_key"),
        ).select(
            "table_name",
            "key_col",
            "n_keys",
            "n_rows",
            "max_per_key",
            fl(
                F.col("max_per_key") / F.col("n_rows").cast("double")
                * 100.0
            ).alias("hot_key_pct"),
            fl(
                F.col("max_per_key")
                / (F.col("n_rows") / F.col("n_keys").cast("double"))
            ).alias("max_over_mean"),
        )

    ev = _t(spark, sf_dir, "events")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    out = profile(ev, "events", "user_id")
    for frame in (
        profile(ev, "events", "event_type"),
        profile(li, "lineitem", "l_orderkey"),
        profile(li, "lineitem", "l_partkey"),
        profile(o, "orders", "o_custkey"),
    ):
        out = out.unionByName(frame)
    return out


QUERIES["qa_gdpr_purge_audit"] = q_gdpr_purge_audit
QUERIES["qa_skew_report"] = q_skew_report

ORACLE["qa_gdpr_purge_audit"] = """
WITH req AS (
  SELECT DISTINCT user_id FROM events WHERE user_id % 97 = 0),
purged AS (
  SELECT * FROM events WHERE user_id NOT IN (SELECT user_id FROM req))
SELECT
  (SELECT count(*) FROM req) AS n_requests,
  (SELECT count(*) FROM events) AS rows_before,
  (SELECT count(*) FROM purged) AS rows_after,
  (SELECT count(*) FROM events) - (SELECT count(*) FROM purged)
    AS rows_purged,
  (SELECT count(DISTINCT user_id) FROM events) AS users_before,
  (SELECT count(DISTINCT user_id) FROM purged) AS users_after,
  (SELECT count(*) FROM purged
   WHERE user_id IN (SELECT user_id FROM req)) AS rows_residual,
  (SELECT count(*) FROM purged
   WHERE user_id IN (SELECT user_id FROM req)) = 0 AS purge_verified"""

ORACLE["qa_skew_report"] = """
WITH h1 AS (SELECT user_id AS k, count(*) AS n FROM events GROUP BY 1),
h2 AS (SELECT event_type AS k, count(*) AS n FROM events GROUP BY 1),
h3 AS (SELECT l_orderkey AS k, count(*) AS n FROM lineitem GROUP BY 1),
h4 AS (SELECT l_partkey AS k, count(*) AS n FROM lineitem GROUP BY 1),
h5 AS (SELECT o_custkey AS k, count(*) AS n FROM orders GROUP BY 1)
SELECT 'events' AS table_name, 'user_id' AS key_col,
  count(*) AS n_keys, CAST(sum(n) AS BIGINT) AS n_rows,
  CAST(max(n) AS BIGINT) AS max_per_key,
  floor(max(n) / CAST(sum(n) AS DOUBLE) * 100.0 * 10000 + 0.5) / 10000
    AS hot_key_pct,
  floor(max(n) / (CAST(sum(n) AS DOUBLE) / count(*)) * 10000 + 0.5)
    / 10000 AS max_over_mean
FROM h1
UNION ALL
SELECT 'events', 'event_type', count(*), CAST(sum(n) AS BIGINT),
  CAST(max(n) AS BIGINT),
  floor(max(n) / CAST(sum(n) AS DOUBLE) * 100.0 * 10000 + 0.5) / 10000,
  floor(max(n) / (CAST(sum(n) AS DOUBLE) / count(*)) * 10000 + 0.5)
    / 10000
FROM h2
UNION ALL
SELECT 'lineitem', 'l_orderkey', count(*), CAST(sum(n) AS BIGINT),
  CAST(max(n) AS BIGINT),
  floor(max(n) / CAST(sum(n) AS DOUBLE) * 100.0 * 10000 + 0.5) / 10000,
  floor(max(n) / (CAST(sum(n) AS DOUBLE) / count(*)) * 10000 + 0.5)
    / 10000
FROM h3
UNION ALL
SELECT 'lineitem', 'l_partkey', count(*), CAST(sum(n) AS BIGINT),
  CAST(max(n) AS BIGINT),
  floor(max(n) / CAST(sum(n) AS DOUBLE) * 100.0 * 10000 + 0.5) / 10000,
  floor(max(n) / (CAST(sum(n) AS DOUBLE) / count(*)) * 10000 + 0.5)
    / 10000
FROM h4
UNION ALL
SELECT 'orders', 'o_custkey', count(*), CAST(sum(n) AS BIGINT),
  CAST(max(n) AS BIGINT),
  floor(max(n) / CAST(sum(n) AS DOUBLE) * 100.0 * 10000 + 0.5) / 10000,
  floor(max(n) / (CAST(sum(n) AS DOUBLE) / count(*)) * 10000 + 0.5)
    / 10000
FROM h5"""


def q_observe_metrics(spark, sf_dir):
    """Pipeline instrumentation via the Observation API: metrics
    (row count, null count, value sum, distinct-day count) are
    attached to a REAL transformation pipeline with ``df.observe`` and
    collected as a side effect of the pipeline's own action — zero
    extra passes over the data, the production pattern for data-volume
    SLO monitoring inside an ETL job (vs. re-scanning the table to
    audit it afterwards).  The observed values are returned as a 1-row
    frame; the oracle recomputes them relationally, proving the
    instrumented numbers equal the ground truth.  The only
    driver-side transfer is the bounded metrics row — the API's
    contract."""
    from pyspark.sql import Observation

    ev = _t(spark, sf_dir, "events")
    obs = Observation("etl_metrics")
    pipeline = ev.filter(F.col("event_type") != "error").observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias(
            "n_null_values"
        ),
        F.round(F.sum("value"), 2).alias("sum_value"),
        # DISTINCT aggregates are rejected in observed metrics
        # (INVALID_OBSERVED_METRICS) — span is the deterministic stand-in
        (
            F.datediff(
                F.max(F.date_trunc("day", "ts").cast("date")),
                F.min(F.date_trunc("day", "ts").cast("date")),
            )
            + 1
        ).alias("n_days"),
    )
    # the pipeline's own terminal action drives metric collection
    n_written = pipeline.groupBy("event_type").count().count()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["n_null_values"]),
                float(m["sum_value"]),
                int(m["n_days"]),
                int(n_written),
            )
        ],
        "n_rows long, n_null_values long, sum_value double, "
        "n_days long, n_groups long",
    )


QUERIES["qa_observe_metrics"] = q_observe_metrics

ORACLE["qa_observe_metrics"] = """
SELECT count(*) AS n_rows,
  CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS n_null_values,
  round(sum(value), 2) AS sum_value,
  CAST(date_diff('day', min(CAST(date_trunc('day', ts) AS DATE)),
    max(CAST(date_trunc('day', ts) AS DATE))) + 1 AS BIGINT) AS n_days,
  (SELECT count(DISTINCT event_type) FROM events
   WHERE event_type != 'error') AS n_groups
FROM events WHERE event_type != 'error'"""


def q_psi_drift(spark, sf_dir):
    """PSI (population stability index) drift monitor — the standard
    ML-ops check that a feature's distribution hasn't shifted between
    a reference window and the current one (PSI < 0.1 stable,
    0.1-0.25 drifting, > 0.25 action).  The time range splits at its
    integer-microsecond midpoint into reference (A) and current (B);
    bucket edges are the reference deciles from ONE scalar
    ``percentile`` reduce (broadcast — the RFM-approx boundary
    pattern, never a global sort); each period's bucket shares then
    fold into PSI = sum((qB - qA) * ln(qB / qA)).

    Cross-engine exactness: the midpoint is integer microseconds
    (``unix_micros`` both engines, no fractional-second rounding),
    decile edges are IEEE-identical interpolations of identical
    doubles, bucket assignment is pure comparison, counts are
    integers, and each PSI term is floor-8dp-pinned before the sum
    so summation order cannot move the total.  Laplace-smoothed
    shares ((n+1)/(N+10)) keep empty buckets finite.  Scale shape:
    two scans of events (range pins + decile reduce), one 20-row
    aggregate — no shuffle beyond the bucket rollup."""
    ev = _t(spark, sf_dir, "events").select(
        "value", F.unix_micros("ts").alias("us")
    )
    rng = ev.agg(
        F.min("us").alias("lo"), F.max("us").alias("hi")
    ).select(
        "lo", "hi",
        ((F.col("lo") + F.col("hi")) / F.lit(2)).cast("bigint").alias("mid"),
    )
    tagged = ev.crossJoin(F.broadcast(rng)).select(
        "value",
        F.when(F.col("us") < F.col("mid"), F.lit("A"))
        .otherwise(F.lit("B"))
        .alias("period"),
    ).localCheckpoint(eager=True)
    qs = F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
    edges = tagged.filter(F.col("period") == "A").agg(
        F.percentile("value", qs).alias("e")
    )
    e = F.col("e")
    bucket = F.when(F.col("value") <= e[0], 0)
    for i in range(1, 9):
        bucket = bucket.when(F.col("value") <= e[i], i)
    bucket = bucket.otherwise(9)
    counts = (
        tagged.crossJoin(F.broadcast(edges))
        .groupBy(bucket.alias("bucket"), "period")
        .agg(F.count("*").alias("n"))
    )
    tots = tagged.groupBy("period").agg(F.count("*").alias("n_tot"))
    q_share = (F.col("n") + 1) / (F.col("n_tot") + 10).cast("double")
    shares = counts.join(F.broadcast(tots), "period").select(
        "bucket", "period", "n", q_share.alias("q")
    )
    a = shares.filter(F.col("period") == "A").select(
        "bucket", F.col("n").alias("n_a"), F.col("q").alias("qa")
    )
    b = shares.filter(F.col("period") == "B").select(
        "bucket", F.col("n").alias("n_b"), F.col("q").alias("qb")
    )
    term = F.floor(
        (F.col("qb") - F.col("qa")) * F.log(F.col("qb") / F.col("qa")) * 1e8
        + F.lit(0.5)
    ) / 1e8
    per_bucket = (
        a.join(b, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("n_a", F.lit(0)).alias("n_a"),
            F.coalesce("n_b", F.lit(0)).alias("n_b"),
            term.alias("psi_term"),
        )
        .localCheckpoint(eager=True)
    )
    fl = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6
    psi = per_bucket.agg(fl(F.sum("psi_term")).alias("psi"))
    return per_bucket.select(
        "bucket", "n_a", "n_b", fl(F.col("psi_term")).alias("psi_term")
    ).crossJoin(F.broadcast(psi))


QUERIES["qa_psi_drift"] = q_psi_drift

ORACLE["qa_psi_drift"] = """
WITH ev AS (
  SELECT value, epoch_us(ts) AS us FROM events),
rng AS (
  SELECT min(us) AS lo, max(us) AS hi,
    CAST((min(us) + max(us)) / 2.0 AS BIGINT) AS mid
  FROM ev),
tagged AS (
  SELECT value,
    CASE WHEN us < (SELECT mid FROM rng) THEN 'A' ELSE 'B' END
      AS period
  FROM ev),
edges AS (
  SELECT quantile_cont(value,
    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS e
  FROM tagged WHERE period = 'A'),
bucketed AS (
  SELECT period,
    CASE WHEN value <= e[1] THEN 0
         WHEN value <= e[2] THEN 1
         WHEN value <= e[3] THEN 2
         WHEN value <= e[4] THEN 3
         WHEN value <= e[5] THEN 4
         WHEN value <= e[6] THEN 5
         WHEN value <= e[7] THEN 6
         WHEN value <= e[8] THEN 7
         WHEN value <= e[9] THEN 8
         ELSE 9 END AS bucket
  FROM tagged CROSS JOIN edges),
counts AS (
  SELECT bucket, period, count(*) AS n
  FROM bucketed GROUP BY 1, 2),
tots AS (SELECT period, count(*) AS n_tot FROM bucketed GROUP BY 1),
shares AS (
  SELECT bucket, counts.period, n,
    (n + 1) / CAST(n_tot + 10 AS DOUBLE) AS q
  FROM counts JOIN tots ON tots.period = counts.period),
ab AS (
  SELECT coalesce(a.bucket, b.bucket) AS bucket,
    coalesce(a.n, 0) AS n_a, coalesce(b.n, 0) AS n_b,
    floor((b.q - a.q) * ln(b.q / a.q) * 1e8 + 0.5) / 1e8 AS psi_term
  FROM (SELECT * FROM shares WHERE period = 'A') a
  FULL JOIN (SELECT * FROM shares WHERE period = 'B') b
    ON a.bucket = b.bucket),
tot_psi AS (
  SELECT floor(sum(psi_term) * 1e6 + 0.5) / 1e6 AS psi FROM ab)
SELECT CAST(bucket AS INT) AS bucket,
  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
  floor(psi_term * 1e6 + 0.5) / 1e6 AS psi_term, psi
FROM ab CROSS JOIN tot_psi"""


def q_referential_audit(spark, sf_dir):
    """Referential-integrity audit across the lake — the cross-table
    verification a CDC pipeline runs after every batch: orphaned
    facts (lineitem rows whose order key has no orders row), dangling
    dimension references (orders -> customer), and coverage ratios.
    Pure anti-join arithmetic: each check is one left-anti join (the
    scale shape — anti joins shuffle once on the key, no row survives
    that doesn't violate) + integer counts; ratios are
    floor-6dp-pinned integer quotients.  One output row per check so
    a new violation class is a new ROW, not a schema change."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")

    def check(name, child, parent, child_key, parent_key):
        n_child = child.agg(F.count("*").alias("n")).select(
            F.lit(name).alias("check"),
            F.col("n").alias("n_child_rows"),
        )
        orphans = (
            child.join(
                parent,
                child[child_key] == parent[parent_key],
                "left_anti",
            )
            .agg(
                F.count("*").alias("n_orphans"),
                F.countDistinct(child_key).alias("n_orphan_keys"),
            )
        )
        return n_child.crossJoin(F.broadcast(orphans)).select(
            "check",
            "n_child_rows",
            "n_orphans",
            "n_orphan_keys",
            (
                F.floor(
                    (F.col("n_child_rows") - F.col("n_orphans"))
                    / F.col("n_child_rows").cast("double")
                    * 1e6
                    + F.lit(0.5)
                )
                / 1e6
            ).alias("coverage"),
        )

    return check(
        "lineitem_orders", li, o, "l_orderkey", "o_orderkey"
    ).unionByName(
        check("orders_customer", o, c, "o_custkey", "c_custkey")
    )


QUERIES["qa_referential_audit"] = q_referential_audit

ORACLE["qa_referential_audit"] = """
WITH lo AS (
  SELECT count(*) AS n_orphans,
    count(DISTINCT l_orderkey) AS n_orphan_keys
  FROM lineitem WHERE l_orderkey NOT IN
    (SELECT o_orderkey FROM orders)),
ln AS (SELECT count(*) AS n FROM lineitem),
oc AS (
  SELECT count(*) AS n_orphans,
    count(DISTINCT o_custkey) AS n_orphan_keys
  FROM orders WHERE o_custkey NOT IN
    (SELECT c_custkey FROM customer)),
onn AS (SELECT count(*) AS n FROM orders)
SELECT 'lineitem_orders' AS check, ln.n AS n_child_rows,
  lo.n_orphans, lo.n_orphan_keys,
  floor((ln.n - lo.n_orphans) / CAST(ln.n AS DOUBLE) * 1e6 + 0.5)
    / 1e6 AS coverage
FROM ln CROSS JOIN lo
UNION ALL
SELECT 'orders_customer', onn.n, oc.n_orphans, oc.n_orphan_keys,
  floor((onn.n - oc.n_orphans) / CAST(onn.n AS DOUBLE) * 1e6 + 0.5)
    / 1e6
FROM onn CROSS JOIN oc"""


def q_freshness_slo(spark, sf_dir):
    """Per-source data-freshness SLO check — the ops dashboard that
    pages someone: each document source's latest arrival lag behind
    the corpus watermark, with the SLO breach as an oracle-checked
    BOOLEAN (the sketch-claim pattern: a silent pipeline stall flips
    the bit and fails the hash).  Events drive the clock: per
    event_type max ts vs the global max, lag in whole minutes
    (integer — no float boundary), breach = lag > 60 min.  One
    grouped aggregate + a 1-row broadcast watermark."""
    ev = _t(spark, sf_dir, "events")
    wm = ev.agg(F.max(F.unix_micros(F.col("ts"))).alias("wm_us"))
    per = ev.groupBy("event_type").agg(
        F.max(F.unix_micros(F.col("ts"))).alias("last_us"),
        F.count("*").alias("n_events"),
    )
    lag_min = (
        (F.col("wm_us") - F.col("last_us")) / F.lit(60_000_000)
    ).cast("bigint")
    return per.crossJoin(F.broadcast(wm)).select(
        "event_type",
        "n_events",
        lag_min.alias("lag_minutes"),
        (lag_min > 60).alias("slo_breach"),
    )


QUERIES["qa_freshness_slo"] = q_freshness_slo

ORACLE["qa_freshness_slo"] = """
WITH wm AS (SELECT max(epoch_us(ts)) AS wm_us FROM events),
per AS (
  SELECT event_type, max(epoch_us(ts)) AS last_us,
    count(*) AS n_events
  FROM events GROUP BY 1)
SELECT event_type, n_events,
  CAST((wm_us - last_us) // 60000000 AS BIGINT) AS lag_minutes,
  ((wm_us - last_us) // 60000000) > 60 AS slo_breach
FROM per CROSS JOIN wm"""


def q_functional_deps(spark, sf_dir):
    """Functional-dependency DISCOVERY (the profiling step schema
    inference and key detection rest on — Papenbrock et al.'s FD
    landscape, reduced to the deployed candidate-validation core):
    for each candidate ``lhs -> rhs`` report group counts, violating
    groups, the worst rhs fan-out, and a holds verdict.

    Scale shape: every candidate from one table rides ONE melted
    explode of that table (constant fan-out, map-side), then a
    three-stage SHRINKING aggregate cascade — dedup (cand,lhs,rhs)
    -> per-(cand,lhs) distinct counts -> per-cand verdict — so the
    whole candidate set costs one scan per table and cascaded
    hash-aggregates, never one job per candidate and never an exact
    countDistinct expand over raw rows.
    """
    def melt(df, cands):
        return df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("cand"),
                            F.concat_ws(
                                "|", *[F.col(c).cast("string") for c in lhs]
                            ).alias("lhs"),
                            F.col(rhs).cast("string").alias("rhs"),
                        )
                        for name, lhs, rhs in cands
                    ]
                )
            ).alias("x")
        ).select("x.cand", "x.lhs", "x.rhs")

    orders = _t(spark, sf_dir, "orders")
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    lineitem = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    melted = (
        melt(
            orders,
            [
                ("orders: o_orderkey -> o_custkey", ["o_orderkey"], "o_custkey"),
                (
                    "orders: o_custkey -> o_orderpriority",
                    ["o_custkey"],
                    "o_orderpriority",
                ),
            ],
        )
        .unionByName(
            melt(
                customer,
                [
                    (
                        "customer: c_custkey -> c_mktsegment",
                        ["c_custkey"],
                        "c_mktsegment",
                    ),
                    (
                        "customer: c_nationkey -> c_mktsegment",
                        ["c_nationkey"],
                        "c_mktsegment",
                    ),
                ],
            )
        )
        .unionByName(
            melt(nation, [("nation: n_name -> n_regionkey", ["n_name"], "n_regionkey")])
        )
        .unionByName(
            melt(
                lineitem,
                [
                    (
                        "lineitem: l_orderkey,l_linenumber -> l_partkey",
                        ["l_orderkey", "l_linenumber"],
                        "l_partkey",
                    ),
                    (
                        "lineitem: l_partkey -> l_suppkey",
                        ["l_partkey"],
                        "l_suppkey",
                    ),
                ],
            )
        )
        .unionByName(melt(part, [("part: p_brand -> p_type", ["p_brand"], "p_type")]))
    )
    dedup = melted.groupBy("cand", "lhs", "rhs").agg(F.count("*").alias("nr"))
    grp = dedup.groupBy("cand", "lhs").agg(
        F.count("*").alias("d"), F.sum("nr").alias("nr")
    )
    return (
        grp.groupBy("cand")
        .agg(
            F.count("*").cast("bigint").alias("n_groups"),
            F.sum((F.col("d") > 1).cast("bigint")).alias("n_violating_groups"),
            F.max("d").cast("bigint").alias("max_rhs_distinct"),
            F.sum(F.col("d") - 1).cast("bigint").alias("n_extra_values"),
            F.sum("nr").cast("bigint").alias("n_rows"),
        )
        .withColumn("holds", F.col("max_rhs_distinct") == 1)
    )


QUERIES["qa_functional_deps"] = q_functional_deps

ORACLE["qa_functional_deps"] = """
WITH fd_pairs AS (
  SELECT 'orders: o_orderkey -> o_custkey' AS cand,
    CAST(o_orderkey AS VARCHAR) AS lhs, CAST(o_custkey AS VARCHAR) AS rhs
  FROM orders
  UNION ALL
  SELECT 'orders: o_custkey -> o_orderpriority',
    CAST(o_custkey AS VARCHAR), o_orderpriority FROM orders
  UNION ALL
  SELECT 'customer: c_custkey -> c_mktsegment',
    CAST(c_custkey AS VARCHAR), c_mktsegment FROM customer
  UNION ALL
  SELECT 'customer: c_nationkey -> c_mktsegment',
    CAST(c_nationkey AS VARCHAR), c_mktsegment FROM customer
  UNION ALL
  SELECT 'nation: n_name -> n_regionkey',
    n_name, CAST(n_regionkey AS VARCHAR) FROM nation
  UNION ALL
  SELECT 'lineitem: l_orderkey,l_linenumber -> l_partkey',
    CAST(l_orderkey AS VARCHAR) || '|' || CAST(l_linenumber AS VARCHAR),
    CAST(l_partkey AS VARCHAR) FROM lineitem
  UNION ALL
  SELECT 'lineitem: l_partkey -> l_suppkey',
    CAST(l_partkey AS VARCHAR), CAST(l_suppkey AS VARCHAR) FROM lineitem
  UNION ALL
  SELECT 'part: p_brand -> p_type', p_brand, p_type FROM part),
fd_dedup AS (
  SELECT cand, lhs, rhs, count(*) AS nr FROM fd_pairs GROUP BY 1, 2, 3),
fd_grp AS (
  SELECT cand, lhs, count(*) AS d, sum(nr) AS nr FROM fd_dedup GROUP BY 1, 2)
SELECT cand,
  CAST(count(*) AS BIGINT) AS n_groups,
  CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
    AS n_violating_groups,
  CAST(max(d) AS BIGINT) AS max_rhs_distinct,
  CAST(sum(d - 1) AS BIGINT) AS n_extra_values,
  CAST(sum(nr) AS BIGINT) AS n_rows,
  max(d) = 1 AS holds
FROM fd_grp GROUP BY cand"""


def q_inclusion_deps(spark, sf_dir):
    """Inclusion-dependency DISCOVERY (the Sindy/Binder problem —
    FK-candidate detection schema inference rests on; the fixed-FK
    twin of this is qa_referential_audit's violation gate): for each
    candidate ``child.col c parent.col`` report child distinct
    cardinality, values missing from the parent, a containment
    verdict, and how much of the parent the child actually references
    (coverage) — containment + high coverage is what promotes a
    candidate to a real FK.  Both directions of each key pair are
    tested, so genuine non-INDs are hash-bound too.

    Scale shape: every candidate aggregates to DISTINCT KEYS before
    any join (key cardinality, never table size), one full-outer
    per candidate over those bounded key sets, one verdict row each —
    independent small jobs AQE schedules in parallel off one action.
    """
    tables = {
        "lineitem": _t(spark, sf_dir, "lineitem"),
        "orders": _t(spark, sf_dir, "orders"),
        "customer": _t(spark, sf_dir, "customer"),
        "nation": _t(spark, sf_dir, "nation"),
        "supplier": _t(spark, sf_dir, "supplier"),
        "part": _t(spark, sf_dir, "part"),
        "events": _t(spark, sf_dir, "events"),
    }
    cands = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_orderkey", "lineitem", "l_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_custkey", "orders", "o_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("events", "user_id", "customer", "c_custkey"),
    ]
    outs = []
    for ct, cc, pt, pc in cands:
        name = f"{ct}.{cc} < {pt}.{pc}"
        c = (
            tables[ct]
            .select(F.col(cc).cast("string").alias("v"))
            .distinct()
            .withColumn("__c", F.lit(1))
        )
        p = (
            tables[pt]
            .select(F.col(pc).cast("string").alias("v"))
            .distinct()
            .withColumn("__p", F.lit(1))
        )
        full = c.join(p, "v", "full_outer")
        outs.append(
            full.agg(
                F.sum(F.col("__c").isNotNull().cast("bigint")).alias(
                    "n_child_distinct"
                ),
                F.sum(
                    (F.col("__c").isNotNull() & F.col("__p").isNull()).cast(
                        "bigint"
                    )
                ).alias("n_missing"),
                F.sum(F.col("__p").isNotNull().cast("bigint")).alias(
                    "__n_parent"
                ),
                F.sum(
                    (F.col("__c").isNotNull() & F.col("__p").isNotNull()).cast(
                        "bigint"
                    )
                ).alias("__n_ref"),
            ).select(
                F.lit(name).alias("cand"),
                "n_child_distinct",
                "n_missing",
                (F.col("n_missing") == 0).alias("contained"),
                F.expr("(1000000 * __n_ref) div __n_parent").alias(
                    "parent_coverage_micro"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


QUERIES["qa_inclusion_deps"] = q_inclusion_deps


def _ind_oracle_sql() -> str:
    cands = [
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders", "o_orderkey", "lineitem", "l_orderkey"),
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_custkey", "orders", "o_custkey"),
        ("customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("events", "user_id", "customer", "c_custkey"),
    ]
    parts = []
    for ct, cc, pt, pc in cands:
        name = f"{ct}.{cc} < {pt}.{pc}"
        parts.append(
            f"""SELECT '{name}' AS cand,
  (SELECT CAST(count(DISTINCT {cc}) AS BIGINT) FROM {ct})
    AS n_child_distinct,
  (SELECT CAST(count(*) AS BIGINT) FROM
    (SELECT DISTINCT {cc} FROM {ct}
     EXCEPT SELECT DISTINCT {pc} FROM {pt}))
    AS n_missing,
  (SELECT count(*) FROM
    (SELECT DISTINCT {cc} FROM {ct}
     EXCEPT SELECT DISTINCT {pc} FROM {pt})) = 0 AS contained,
  CAST((1000000 * (SELECT count(*) FROM
    (SELECT DISTINCT {cc} FROM {ct}
     INTERSECT SELECT DISTINCT {pc} FROM {pt})))
    // (SELECT count(DISTINCT {pc}) FROM {pt}) AS BIGINT)
    AS parent_coverage_micro"""
        )
    return "\nUNION ALL\n".join(parts)


ORACLE["qa_inclusion_deps"] = _ind_oracle_sql()


def q_schema_contract(spark, sf_dir):
    """DATA-CONTRACT enforcement (the schema-registry gate a lake
    applies before accepting a producer's drop): every physical
    table's Spark schema is checked against its declared contract —
    missing columns, UNDECLARED EXTRAS, and type mismatches each
    produce a verdict row.  The contracts here deliberately carry
    one drift per class (orders declares a retired ``o_comment``,
    events declares ``value`` as string, documents omits
    ``n_chars``) so all three violation paths are hash-bound, not
    just the happy path.

    Scale shape: pure schema introspection — zero data rows read
    (the scans never execute); verdicts are built from the catalog
    metadata the planner already holds."""
    contracts = {
        "orders": {
            "o_orderkey": "bigint",
            "o_custkey": "bigint",
            "o_orderstatus": "string",
            "o_totalprice": "double",
            "o_orderdate": "timestamp",
            "o_orderpriority": "string",
            "o_comment": "string",  # retired upstream: MISSING here
        },
        "events": {
            "event_id": "bigint",
            "ts": "timestamp",
            "user_id": "bigint",
            "event_type": "string",
            "value": "string",  # drifted: physical type is double
            "props": "string",
        },
        "documents": {
            "doc_id": "bigint",
            "text": "string",
            "lang": "string",
            "source": "string",
            # n_chars absent from the contract: UNDECLARED extra
        },
    }
    rows = []
    for table, contract in contracts.items():
        # tz-encoding family normalization: the driver's parquet
        # encodings have flipped between TIMESTAMP and TIMESTAMP_NTZ
        # across rounds (verify-skill round-4 note) and load_table
        # already normalizes the columns queries compute on — a
        # contract gate should flag REAL drift, not that encoding
        # dimension, so both timestamp variants map to the family.
        actual = {
            f.name: f.dataType.simpleString().replace(
                "timestamp_ntz", "timestamp"
            )
            for f in _t(spark, sf_dir, table).schema.fields
        }
        for col, want in contract.items():
            if col not in actual:
                rows.append((table, col, want, None, "missing"))
            elif actual[col] != want:
                rows.append((table, col, want, actual[col], "type_mismatch"))
            else:
                rows.append((table, col, want, actual[col], "ok"))
        for col in actual:
            if col not in contract:
                rows.append((table, col, None, actual[col], "undeclared"))
    return spark.createDataFrame(
        rows,
        "table_name string, column_name string, declared_type string, "
        "actual_type string, verdict string",
    )


QUERIES["qa_schema_contract"] = q_schema_contract

ORACLE["qa_schema_contract"] = """
SELECT * FROM (VALUES
  ('orders', 'o_orderkey', 'bigint', 'bigint', 'ok'),
  ('orders', 'o_custkey', 'bigint', 'bigint', 'ok'),
  ('orders', 'o_orderstatus', 'string', 'string', 'ok'),
  ('orders', 'o_totalprice', 'double', 'double', 'ok'),
  ('orders', 'o_orderdate', 'timestamp', 'timestamp', 'ok'),
  ('orders', 'o_orderpriority', 'string', 'string', 'ok'),
  ('orders', 'o_comment', 'string', NULL, 'missing'),
  ('events', 'event_id', 'bigint', 'bigint', 'ok'),
  ('events', 'ts', 'timestamp', 'timestamp', 'ok'),
  ('events', 'user_id', 'bigint', 'bigint', 'ok'),
  ('events', 'event_type', 'string', 'string', 'ok'),
  ('events', 'value', 'string', 'double', 'type_mismatch'),
  ('events', 'props', 'string', 'string', 'ok'),
  ('documents', 'doc_id', 'bigint', 'bigint', 'ok'),
  ('documents', 'text', 'string', 'string', 'ok'),
  ('documents', 'lang', 'string', 'string', 'ok'),
  ('documents', 'source', 'string', 'string', 'ok'),
  ('documents', 'n_chars', NULL, 'bigint', 'undeclared'))
  t(table_name, column_name, declared_type, actual_type, verdict)"""
