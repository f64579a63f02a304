"""`frizzle` — a pure-Python Spark 4 DataSource emitting Msg-shaped
records (Spark Python Data Source API, SPARK-44076).

The reference's transport abstraction (frizzle) hands the engine an
unbounded stream of ``Msg`` records from Kafka [SURVEY §2 A2]. This
sandbox has no broker, so the Kafka recipes in ``streaming/`` stay
construction-only — but Spark 4's Python Data Source API lets the
CONNECTOR surface itself be exercised end-to-end: ``frizzle`` is a
registered source with the Msg schema (topic/partition/offset/key/
value/ts), deterministic payloads derived from (partition, offset)
(the house sentinel rule — tests state content by construction), a
batch reader with PARTITION PLANNING and FILTER-PUSHDOWN pruning,
and a micro-batch stream reader with real offset bookkeeping. Swap
the synthesis for a consumer client and this is the shape of a
custom transport connector; everything Spark-side (planning, Arrow
transfer, offset commit/restart) is identical.

Scale shape: ``partitions()`` runs on the DRIVER and is the pruning
point — an ``EqualTo("partition", p)`` pushed filter drops whole
input partitions before any executor work (the Python-source
equivalent of parquet partition pruning); each ``read`` streams its
partition's rows lazily (no per-partition materialization); the
stream reader's offsets are a dict the checkpoint WAL persists, so
restart-resume follows from Spark's own contract.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    InputPartition,
    SimpleDataSourceStreamReader,
)

MSG_SCHEMA = (
    "topic string, partition int, offset bigint, "
    "key string, value string, ts timestamp"
)
_BASE_TS = datetime(2024, 1, 1, tzinfo=timezone.utc)


def _msg(topic: str, part: int, off: int) -> tuple:
    """Deterministic Msg payload for (partition, offset)."""
    val = hashlib.md5(f"{topic}:{part}:{off}".encode()).hexdigest()
    return (
        topic,
        part,
        off,
        str(off % 50),
        val,
        _BASE_TS + timedelta(seconds=off),
    )


class FrizzlePartition(InputPartition):
    def __init__(self, part: int):
        self.part = part


class FrizzleBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.topic = options.get("topic", "events")
        self.n_parts = int(options.get("partitions", "4"))
        self.rows = int(options.get("rows_per_partition", "1000"))
        self._wanted: set[int] | None = None  # None = all partitions

    def pushFilters(self, filters):
        """Accept EqualTo on the partition column (prunes whole input
        partitions at planning time); everything else is returned as
        unsupported and evaluated by Spark above the scan."""
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("partition",):
                if self._wanted is None:
                    self._wanted = set()
                self._wanted.add(int(f.value))
            else:
                yield f

    def partitions(self):
        parts = range(self.n_parts)
        if self._wanted is not None:
            parts = [p for p in parts if p in self._wanted]
        return [FrizzlePartition(p) for p in parts]

    def read(self, partition: FrizzlePartition):
        for off in range(self.rows):
            yield _msg(self.topic, partition.part, off)


class FrizzleStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch reader over the same deterministic feed: the
    global offset o maps to (partition = o mod P, offset = o div P);
    each read() attempt serves at most ``batch_rows`` records and
    advances the committed offset dict, so the checkpoint WAL
    replays/resumes exactly like any Spark source."""

    def __init__(self, options: dict):
        self.topic = options.get("topic", "events")
        self.n_parts = int(options.get("partitions", "4"))
        self.rows = int(options.get("rows_per_partition", "1000"))
        self.batch_rows = int(options.get("batch_rows", "500"))
        self.total = self.n_parts * self.rows

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def read(self, start: dict):
        lo = int(start["offset"])
        hi = min(lo + self.batch_rows, self.total)
        # a LIST, not a generator: the simple-stream contract ships the
        # record batch through the driver-side prefetch cache (pickled)
        rows = [
            _msg(self.topic, o % self.n_parts, o // self.n_parts)
            for o in range(lo, hi)
        ]
        return rows, {"offset": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        for o in range(int(start["offset"]), int(end["offset"])):
            yield _msg(self.topic, o % self.n_parts, o // self.n_parts)

    def commit(self, end: dict) -> None:
        pass  # nothing external to acknowledge; the WAL is the record


class FrizzleDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "frizzle"

    def schema(self) -> str:
        return MSG_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return FrizzleBatchReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return FrizzleStreamReader(self.options)
