"""Pipeline — the frizzle processing loop re-expressed on Spark.

The reference's whole "engine" is this loop [upstream: frizzle README
§ usage — SURVEY.md §3.3]::

    for msg := range f.Receive() {
        out, err := transform(msg)
        if err != nil { f.Fail(msg) }        // → fail sink (DLQ)
        else          { f.Send(out, topic); f.Ack(msg) }
    }

Spark mapping (SURVEY.md §3.4):

- Receive        → the source micro-batch
- transform      → a DataFrame transformation, or a per-record Python
                   function wrapped in ``mapInPandas`` with per-record
                   error capture (``record_transform``)
- Ack            → micro-batch commit to the checkpoint WAL (offsets
                   advance only after the batch's writes finish —
                   at-least-once, same as the reference)
- Fail/FailSink  → the DLQ split inside ``foreachBatch``: rows whose
                   transform errored go to the fail sink, the rest to
                   the main sink, and the batch still commits
                   [SURVEY.md §7 hard-list #4]
- Events()       → ``PipelineListener`` (StreamingQueryListener)
                   exposing progress/error events as a drainable list

Scale: everything per-record runs Arrow-batched inside executors; the
driver never sees row data. State (watermarks, dedup, session
windows) lives in the state store, keyed and partitioned — the same
code runs against a 1000-executor Kafka topic set.
"""

from __future__ import annotations

import json
import threading
import traceback
from collections.abc import Callable, Iterator
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

from frafka_spark.streaming.sink import FrSink
from frafka_spark.streaming.source import FrSource

ERROR_COL = "_fr_error"


def record_transform(
    fn: Callable[[dict], dict | None],
    output_schema: str,
) -> Callable[[DataFrame], DataFrame]:
    """Wrap a per-record Python function with per-record error capture.

    frizzle parity: ``fn(record_dict) -> out_dict`` may raise (=Fail)
    or return the transformed record (=ok). The wrapper runs it over
    Arrow batches via ``mapInPandas``; failed records carry the error
    string in ``_fr_error`` with null payload, so the pipeline can
    split them to the DLQ without aborting the batch.

    ``output_schema`` is the DDL schema of fn's output dict, e.g.
    ``"event_id bigint, score double"``.
    """
    full_schema = f"{output_schema}, {ERROR_COL} string, _fr_source string"

    def apply(df: DataFrame) -> DataFrame:
        out_names = [
            c.strip().split()[0] for c in output_schema.split(",")
        ]

        def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for rec in pdf.to_dict("records"):
                    try:
                        out = fn(rec) or {}
                        out = {k: out.get(k) for k in out_names}
                        out[ERROR_COL] = None
                        out["_fr_source"] = None
                    except Exception as exc:  # per-record Fail path
                        out = dict.fromkeys(out_names)
                        out[ERROR_COL] = f"{type(exc).__name__}: {exc}"
                        out["_fr_source"] = json.dumps(rec, default=str)
                    rows.append(out)
                yield pd.DataFrame(rows, columns=[*out_names, ERROR_COL, "_fr_source"])

        return df.mapInPandas(mapper, full_schema)

    return apply


@dataclass
class PipelineEvent:
    """One entry of the async event feed (frafka Events() parity)."""

    kind: str  # "progress" | "terminated" | "error"
    detail: str


class PipelineListener(StreamingQueryListener):
    """Drainable async event feed — frafka's Events() channel analog.

    [upstream: frizzle § Eventer; frafka/sink.go § delivery-report
    loop — SURVEY.md §2 Tier A11]
    """

    def __init__(self) -> None:
        self._events: list[PipelineEvent] = []
        self._lock = threading.Lock()

    def onQueryStarted(self, event) -> None:
        with self._lock:
            self._events.append(PipelineEvent("progress", "query started"))

    def onQueryProgress(self, event) -> None:
        with self._lock:
            self._events.append(
                PipelineEvent("progress", f"batch={event.progress.batchId}")
            )

    def onQueryIdle(self, event) -> None:
        pass

    def onQueryTerminated(self, event) -> None:
        kind = "error" if event.exception else "terminated"
        with self._lock:
            self._events.append(PipelineEvent(kind, str(event.exception or "clean")))

    def drain(self) -> list[PipelineEvent]:
        with self._lock:
            out, self._events = self._events, []
        return out


class Pipeline:
    """source → transform → sink with Ack/Fail/DLQ parity."""

    def __init__(
        self,
        source: FrSource,
        transform: Callable[[DataFrame], DataFrame] | None,
        sink: FrSink,
        fail_sink: FrSink | None = None,
        checkpoint: str | None = None,
        name: str = "fr-pipeline",
    ) -> None:
        self.source = source
        self.transform = transform or (lambda df: df)
        self.sink = sink
        self.fail_sink = fail_sink
        self.checkpoint = checkpoint
        self.name = name
        self.listener = PipelineListener()
        self._memory_rows: list = []

    # -- the foreachBatch body: transform, split, double-write, commit --
    def _process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        out = self.transform(batch_df)
        if ERROR_COL in out.columns:
            out.persist()
            try:
                bad = out.filter(out[ERROR_COL].isNotNull()).select(
                    "_fr_source", ERROR_COL
                )
                good = out.filter(out[ERROR_COL].isNull()).drop(
                    ERROR_COL, "_fr_source"
                )
                if self.fail_sink is not None:
                    self.fail_sink.write_batch(bad)  # Fail → DLQ (A5/A7)
                self.sink.write_batch(good)  # Send+Ack (A10/A4)
            finally:
                out.unpersist()
        else:
            self.sink.write_batch(out)

    def start(self, available_now: bool = True):
        """Start the query (Trigger.AvailableNow for bounded replays)."""
        spark = self.source.spark
        spark.streams.addListener(self.listener)
        stream = self.source.stream()
        needs_split = self.fail_sink is not None or self.transform is not None
        if needs_split and self.sink.fmt != "memory":
            writer = stream.writeStream.foreachBatch(self._process_batch)
        else:
            writer = self.sink.configure(self.transform(stream).writeStream)
        writer = writer.queryName(self.name)
        if self.checkpoint:
            writer = writer.option("checkpointLocation", self.checkpoint)
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    def run_to_completion(self) -> None:
        """Replay the whole bounded source and stop (test harness)."""
        q = self.start(available_now=True)
        q.awaitTermination()

    def events(self) -> list[PipelineEvent]:
        """Drain the async event feed (frafka Events() parity)."""
        return self.listener.drain()
