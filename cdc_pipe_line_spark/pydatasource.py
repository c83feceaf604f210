"""Custom connectors via the Spark 4 Python DataSource API.

The reference ingests from sources Spark has no bundled jar for
(its Kafka consumer, `/root/reference/consumer.py:377-397`, and the
FastAPI-fronted cursor feeds in `app/app.py`).  Where a JVM connector
jar is absent — exactly this container's Kafka situation — Spark 4's
``pyspark.sql.datasource`` API hosts the connector in Python: the
reader declares PARTITIONS (one per cursor shard, so the scan
parallelizes like any jar-backed source) and each executor pulls its
shard independently.  ``CursorFeedDataSource`` is that pattern end to
end with a deterministic closed-form feed standing in for the remote
cursor: swap ``read``'s row generator for real HTTP/Kafka-client
calls and the Spark side — registration, schema, partition planning,
pushdown-free scan — is unchanged.

Scale shape: one InputPartition per shard -> one task per shard; rows
are generated (or fetched) inside the executor, never through the
driver; no shuffle until the consumer aggregates.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

#: Knuth multiplicative hash constant; modulus a prime > 1e6 so the
#: value stream is deterministic, well-mixed, and exactly replayable
#: in SQL (pure integer arithmetic).
_MIX = 2654435761
_MOD = 1000003


def feed_value(event_id: int) -> int:
    """Closed-form payload for one cursor event — the arithmetic the
    DuckDB oracle replays."""
    return (event_id * _MIX) % _MOD


class _CursorFeedReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.n_shards = int(options.get("shards", "8"))
        self.rows_per_shard = int(options.get("rowsPerShard", "10000"))

    def partitions(self) -> list[InputPartition]:
        return [InputPartition(i) for i in range(self.n_shards)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        shard = partition.value
        base = shard * self.rows_per_shard
        for off in range(self.rows_per_shard):
            event_id = base + off
            yield (shard, off, event_id, feed_value(event_id))


class CursorFeedDataSource(DataSource):
    """``spark.read.format("cursor_feed")`` after
    ``spark.dataSource.register(CursorFeedDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "cursor_feed"

    def schema(self) -> str:
        return "shard int, offset bigint, event_id bigint, value bigint"

    def reader(self, schema) -> _CursorFeedReader:
        return _CursorFeedReader(self.options)

    def streamReader(self, schema) -> "_CursorFeedStreamReader":
        return _CursorFeedStreamReader(self.options)


class _CursorRange(InputPartition):
    def __init__(self, shard: int, start: int, end: int) -> None:
        self.shard = shard
        self.start = start
        self.end = end


class _CursorFeedStreamReader(DataSourceStreamReader):
    """Offset-tracked streaming reader (T1/T2 without a broker): the
    offset is a cursor position per the whole feed; Spark serializes
    it into the checkpoint, so a restarted query resumes exactly
    where the committed batch ended — the same at-least-once contract
    the Kafka source keeps, hosted in Python.  Imported lazily so the
    batch path has no streaming dependency."""

    def __init__(self, options: dict) -> None:
        self.n_shards = int(options.get("shards", "8"))
        self.rows_per_shard = int(options.get("rowsPerShard", "10000"))

    def initialOffset(self) -> dict:
        return {"cursor": 0}

    def latestOffset(self) -> dict:
        return {"cursor": self.rows_per_shard}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        return [
            _CursorRange(s, start["cursor"], end["cursor"])
            for s in range(self.n_shards)
        ]

    def read(self, partition: _CursorRange) -> Iterator[tuple]:
        base = partition.shard * self.rows_per_shard
        for off in range(partition.start, partition.end):
            event_id = base + off
            yield (partition.shard, off, event_id, feed_value(event_id))

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass
