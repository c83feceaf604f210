"""Bitemporal (valid-time x transaction-time) operators.

The reference's SCD2 pipeline tracks one time axis — when the
warehouse LEARNED a fact (transaction time, `/root/reference/
deltaprocessing.py` start/end dates).  A bitemporal table adds the
axis of when the fact WAS TRUE in the world (valid time), answering
"what did we believe on T about the state of things at V" — the
audit/backfill question every CDC consumer eventually asks (a late
correction arrives at T2 about a period around V1).

Shapes: interval derivation is ONE lead() window per key (the same
shuffle the SCD2 builder pays); a bitemporal point read is two
interval predicates — pure pushdown-able filters, no join — so at
rest it row-group-skips like `current_view`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def add_tx_intervals(
    df: DataFrame,
    *,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Chain each key's versions into [tx_from, tx_to) intervals —
    tx_to = next version's tx_from, open (null) for the latest.  One
    window shuffle on the key."""
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak_col).asc()
    )
    return df.withColumn("tx_from", F.col(ts_col)).withColumn(
        "tx_to", F.lead(ts_col).over(w)
    )


def as_of_bitemporal(
    df: DataFrame,
    *,
    valid_at: Column,
    tx_at: Column,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    tx_from: str = "tx_from",
    tx_to: str = "tx_to",
) -> DataFrame:
    """Point read on both axes: rows believed true at ``tx_at`` about
    the world at ``valid_at``.  Half-open [from, to) semantics, null
    ``to`` = open interval.  Two filter predicates — no join, no
    window; at rest both reach the scan as pushed filters."""
    return df.filter(
        (F.col(tx_from) <= tx_at)
        & (F.col(tx_to).isNull() | (F.col(tx_to) > tx_at))
        & (F.col(valid_from) <= valid_at)
        & (F.col(valid_to).isNull() | (F.col(valid_to) > valid_at))
    )
