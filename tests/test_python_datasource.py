"""Spark 4 Python Data Source: the `frizzle` Msg-feed connector.

Exercises the full custom-connector surface the Kafka environment
floor keeps construction-only elsewhere: registration, batch read
with partition planning, EqualTo pushdown pruning whole input
partitions at the driver, and micro-batch streaming with offset
bookkeeping through a real checkpoint.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from frafka_spark.sources.frizzle_source import (
    FrizzleBatchReader,
    FrizzleDataSource,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(FrizzleDataSource)
    yield spark
    spark.conf.unset("spark.sql.python.filterPushdown.enabled")


def test_batch_read_deterministic(registered):
    df = (
        registered.read.format("frizzle")
        .option("partitions", "3")
        .option("rows_per_partition", "100")
        .option("topic", "t1")
        .load()
    )
    assert df.count() == 300
    row = df.filter((F.col("partition") == 2) & (F.col("offset") == 7)).first()
    assert row.value == hashlib.md5(b"t1:2:7").hexdigest()
    assert row.key == "7"
    assert [f.name for f in df.schema.fields] == [
        "topic",
        "partition",
        "offset",
        "key",
        "value",
        "ts",
    ]


def test_pushdown_prunes_partitions_at_planning():
    """EqualTo('partition', 2) must drop the other input partitions
    BEFORE any executor work — partitions() is driver-side, so the
    pruning is directly observable at unit level."""
    from pyspark.sql.datasource import EqualTo, GreaterThan

    r = FrizzleBatchReader({"partitions": "8"})
    unsupported = list(
        r.pushFilters(
            [EqualTo(("partition",), 2), GreaterThan(("offset",), 10)]
        )
    )
    # the offset filter is rejected back to Spark, the partition one kept
    assert [type(f).__name__ for f in unsupported] == ["GreaterThan"]
    parts = r.partitions()
    assert [p.part for p in parts] == [2]


def test_pushdown_end_to_end_rows(registered):
    df = (
        registered.read.format("frizzle")
        .option("partitions", "4")
        .option("rows_per_partition", "50")
        .load()
        .filter((F.col("partition") == 1) & (F.col("offset") >= 40))
    )
    assert df.count() == 10  # pruned partition, residual offset filter


def test_stream_reads_feed_exactly_once(registered, tmp_path):
    q = (
        registered.readStream.format("frizzle")
        .option("partitions", "2")
        .option("rows_per_partition", "100")
        .option("batch_rows", "60")
        .load()
        .writeStream.format("memory")
        .queryName("frizzle_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    # batch_rows=60 over 200 records → 4 micro-batches; poll until the
    # feed is exhausted (the source then reports the same offset and
    # batches go empty), then stop.
    import time

    deadline = time.time() + 60
    while time.time() < deadline:
        n = registered.sql("SELECT count(*) AS n FROM frizzle_out").first().n
        if n >= 200:
            break
        time.sleep(0.5)
    q.stop()
    got = registered.sql(
        "SELECT count(*) AS n, count(DISTINCT partition || '/' || offset) AS d "
        "FROM frizzle_out"
    ).first()
    assert got.n == 200 and got.d == 200  # exhaustive, no duplicates
    assert len(q.recentProgress) >= 4
