"""Master gate: every queries() entry hash-matches its oracle_sql().

Mirrors the driver's CORRECTNESS check at a smaller scale factor
(sf0.001 by default) so iteration stays fast.  Queries without an
oracle get a weaker rows-run check, exactly like the driver.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import assert_matches_oracle, SF_DIR

ALL = sorted(entrymod.queries().keys())


def test_registry_consistency():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert q, "queries() must not be empty"
    unknown = set(o) - set(q)
    assert not unknown, f"oracle_sql keys without queries: {unknown}"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.schema.fieldNames()


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF_DIR)
    sql = entrymod.oracle_sql().get(name)
    if sql is None:
        # rows-only check (non-SQL-expressible op)
        assert df.count() >= 0
        return
    assert_matches_oracle(df, duck, sql)
