"""FrSink — the frafka Sink re-expressed as Structured Streaming.

frafka's Sink is an async Kafka producer: ``Send(msg, topic)``
(partition chosen by Kafka), delivery reports surfacing failures on
an events channel, flush-on-close [upstream: frafka/sink.go §
InitSink/Send/Close — SURVEY.md §2 Tier A9-A12]. The Spark analogs:

- per-record topic routing = a ``topic`` column on the output frame
  (the Kafka sink reads it per row — exact ``Send(msg, topic)``
  parity);
- delivery guarantees = micro-batch epoch commit (at-least-once to
  Kafka, like the reference);
- flush/close = epoch boundary — every batch is fully produced
  before its offsets commit (Tier A12);
- delivery reports = StreamingQueryListener (see pipeline.py).

File/memory variants exist for this broker-less test environment.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql.streaming import DataStreamWriter

from frafka_spark.streaming.config import sink_options_from_env


@dataclass
class FrSink:
    fmt: str
    options: dict[str, str] = field(default_factory=dict)
    output_mode: str = "append"
    partition_by: str | None = None
    #: exactly-once mode: partition on the (re-delivery-stable) batch
    #: id and dynamically overwrite only that partition per write.
    idempotent: bool = False

    @classmethod
    def kafka(cls, env=None, **overrides) -> "FrSink":
        """Kafka producer sink from frafka-style env config.

        If the frame has a ``topic`` column it routes per record
        (frafka ``Send(msg, topic)``); otherwise set a fixed
        ``topic`` option.
        """
        opts = sink_options_from_env(env)
        opts.update(overrides)
        return cls("kafka", opts)

    @classmethod
    def parquet(cls, path: str) -> "FrSink":
        return cls("parquet", {"path": path})

    @classmethod
    def topic_routed_parquet(cls, path: str) -> "FrSink":
        """Broker-less execution of per-row topic routing (A10).

        The Kafka producer sink routes each row by its ``topic``
        column; with no broker in this environment, this sink applies
        the SAME per-row destination contract by partitioning the
        write on ``topic`` — every row lands under ``topic=<value>/``,
        so routing is actually *executed* (not construction-only) and
        assertable from the output layout. Swapping this for
        ``FrSink.kafka()`` changes only the transport.
        """
        return cls("parquet", {"path": path}, partition_by="topic")

    @classmethod
    def manifest(cls, path: str) -> "FrSink":
        """Exactly-once sink into the native manifest table format.

        The strongest sink in the library: each micro-batch commits as
        ONE atomic manifest snapshot carrying its batch_id, so a
        redelivered batch (crash between the data write and the
        checkpoint commit) is detected by id and skipped — the
        ``parquet_txn`` idempotence contract, plus the table format's
        time travel, file-skipping stats, and concurrent-reader
        snapshot isolation on the output. This is the sink that turns
        the frafka-parity pipeline into a lakehouse ingest path.
        """
        return cls("manifest", {"path": path})

    @classmethod
    def parquet_txn(cls, path: str) -> "FrSink":
        """Idempotent (exactly-once) parquet sink for foreachBatch.

        frafka's own guarantee is at-least-once: a crash between the
        producer flush and the offset commit re-delivers the batch,
        and an append-mode sink then duplicates rows. Structured
        Streaming has the same contract inside ``foreachBatch`` —
        the batch id, however, is STABLE across re-deliveries, which
        is the standard upgrade path: partition the write on
        ``_batch_id`` and overwrite ONLY that partition (dynamic
        partition overwrite). A re-delivered batch replaces its own
        partition instead of appending beside it; distinct batches
        never touch each other's partitions. Readers see
        exactly-once output at the price of one partition column
        [public pattern: Structured Streaming foreachBatch docs'
        idempotent-write guidance].
        """
        return cls("parquet", {"path": path}, idempotent=True)

    @classmethod
    def memory(cls, name: str, output_mode: str = "append") -> "FrSink":
        return cls("memory", {"queryName": name}, output_mode)

    def configure(self, writer: DataStreamWriter) -> DataStreamWriter:
        writer = writer.format(self.fmt).outputMode(self.output_mode)
        if self.partition_by:
            # keep the per-row routing contract on the streaming-writer
            # path too, not only in write_batch
            writer = writer.partitionBy(self.partition_by)
        for k, v in self.options.items():
            if k == "queryName":
                writer = writer.queryName(v)
            else:
                writer = writer.option(k, v)
        return writer

    def write_batch(self, df: DataFrame, batch_id: int | None = None) -> None:
        """Batch-mode write (used inside foreachBatch pipelines)."""
        if self.fmt == "memory":
            raise ValueError("memory sink is stream-only; use configure()")
        if self.fmt == "manifest":
            if batch_id is None:
                raise ValueError("manifest sink needs the foreachBatch batch_id")
            from frafka_spark.sources import manifest_table as mt

            mt.write_stream_batch(df, batch_id, self.options["path"])
            return
        if self.idempotent:
            if batch_id is None:
                raise ValueError("idempotent sink needs the foreachBatch batch_id")
            from pyspark.sql import functions as F

            (
                df.withColumn("_batch_id", F.lit(batch_id))
                .write.format(self.fmt)
                .mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch_id")
                .options(**self.options)
                .save()
            )
            return
        writer = df.write.format(self.fmt).mode("append")
        if self.partition_by:
            writer = writer.partitionBy(self.partition_by)
        for k, v in self.options.items():
            writer = writer.option(k, v)
        writer.save()
