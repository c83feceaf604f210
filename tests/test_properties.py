"""Property-based correctness: the CDC diff is definitionally correct
iff replaying its events over v1 reconstructs v2 exactly — for ANY
pair of keyed tables, including nulls, duplicated values, and
disjoint key sets (SURVEY.md §5 golden semantics).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st_
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from cdc_pipe_line_spark.cdc.diff import snapshot_diff

SCHEMA = StructType(
    [
        StructField("k", IntegerType(), True),
        StructField("a", StringType(), True),
        StructField("b", IntegerType(), True),
    ]
)

row = st_.tuples(
    st_.integers(min_value=0, max_value=9),
    st_.one_of(st_.none(), st_.sampled_from(["x", "y", ""])),
    st_.one_of(st_.none(), st_.integers(min_value=-2, max_value=2)),
)


def _dedup_keys(rows):
    seen, out = set(), []
    for r in rows:
        if r[0] not in seen:
            seen.add(r[0])
            out.append(r)
    return out


tables = st_.lists(row, max_size=8).map(_dedup_keys)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(v1=tables, v2=tables)
def test_diff_reconstructs_v2(spark, v1, v2):
    df1 = spark.createDataFrame(v1, SCHEMA)
    df2 = spark.createDataFrame(v2, SCHEMA)
    diff = snapshot_diff(df2, df1, "k").collect()

    state = {str(r[0]): (r[1], r[2]) for r in v1}
    for ev in diff:
        if ev.event_type == "delete":
            assert ev.key_value in state
            del state[ev.key_value]
        else:
            if ev.event_type == "update":
                assert ev.key_value in state
                assert ev.changed_cols, "update event with no changed columns"
            else:
                assert ev.key_value not in state
            nv = ev.new_values
            state[ev.key_value] = (
                nv.get("a"),
                None if nv.get("b") is None else int(nv["b"]),
            )
    want = {str(r[0]): (r[1], r[2]) for r in v2}
    assert state == want


def test_diff_self_is_empty(spark):
    from cdc_pipe_line_spark.queries import load_table

    from tests.conftest import SF_DIR

    orders = load_table(spark, SF_DIR, "orders")
    assert snapshot_diff(orders, orders, "o_orderkey").count() == 0


def test_salted_aggregate_equals_direct(spark):
    from cdc_pipe_line_spark.functions import salted_aggregate
    from cdc_pipe_line_spark.queries import load_table

    from tests.conftest import SF_DIR

    ev = load_table(spark, SF_DIR, "events")
    got = {
        r.event_type: (r.n, r.s)
        for r in salted_aggregate(
            ev, ["event_type"], {"n": ("count", "event_id"), "s": ("sum", "event_id")}
        ).collect()
    }
    want = {
        r.event_type: (r.n, r.s)
        for r in ev.groupBy("event_type")
        .agg(F.count("event_id").alias("n"), F.sum("event_id").alias("s"))
        .collect()
    }
    assert got == want
