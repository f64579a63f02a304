"""Late-data accounting: the watermark drop rule as a declared query.

B9's watermark semantics were pytest-only (the two-phase replay in
tests/test_streaming.py observes Spark dropping late rows behind a
restored watermark). This module DECLARES that accounting so the
differential driver grades it: a deterministic two-phase arrival
model — the on-time feed is the even-``event_id`` half, the late
replay is the odd half, and the batch-close watermark is
``max(on-time ts) − 10 minutes`` (exactly the ``withWatermark("ts",
"10 minutes")`` bound the streaming tests run) — and per hour window
the counts a streaming aggregation would keep vs drop: a late row
survives iff its window is still open at the watermark
(``window_end > WM``), the Structured Streaming state-eviction rule.

All event-time arithmetic is integer epoch MICROSECONDS
(``unix_micros`` ↔ DuckDB ``epoch_us`` — TZ-free, exact cross-engine)
and window keys are emitted as the window-start micros, never a
rendered timestamp. ``tests/test_streaming.py::
test_late_drop_matches_streaming_metric`` ties the declared rule to
observed behavior: a real two-phase checkpointed replay of the same
even/odd feeds must report exactly ``Σ n_late_dropped`` through the
state operator's ``numRowsDroppedByWatermark`` metric.

Scale shape: one events scan, a 1-row watermark aggregate broadcast
over the stream (the scalar-denominator pattern), one map-side-
combined hash aggregate on the hour key. Constant shuffle bytes per
hour bucket at any event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frafka_spark.io import table
from frafka_spark.registry import query

HOUR_US = 3_600_000_000
LATENESS_US = 600_000_000  # 10 minutes — the streaming tests' bound


@query(
    "q_stream_late_drop",
    oracle=f"""
    WITH e AS (
        SELECT epoch_us(ts) AS us, event_id FROM events
    ),
    wm AS (
        SELECT max(us) - {LATENESS_US} AS wm_us
        FROM e WHERE event_id % 2 = 0
    )
    SELECT CAST(us - us % {HOUR_US} AS BIGINT) AS window_start_us,
           CAST(sum(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_base,
           CAST(sum(CASE WHEN event_id % 2 = 1
                          AND us - us % {HOUR_US} + {HOUR_US} > wm_us
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late_kept,
           CAST(sum(CASE WHEN event_id % 2 = 1
                          AND us - us % {HOUR_US} + {HOUR_US} <= wm_us
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_late_dropped
    FROM e CROSS JOIN wm
    GROUP BY 1
    """,
)
def q_stream_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept/dropped late-data accounting per hour window under the
    deterministic two-phase arrival model (even ``event_id`` = the
    on-time feed, odd = the late replay, watermark = max on-time ts
    − 10 min): ``n_base`` on-time rows, plus the odd rows a streaming
    aggregation restored from the phase-1 checkpoint would still
    aggregate (window open past the watermark) vs drop (window
    closed — ``window_end ≤ WM``, Spark's state-eviction boundary).

    Exactness: epoch-microsecond integers end-to-end; the watermark
    is a 1-row integer aggregate; every bucket and comparison is
    integer arithmetic — no doubles, no rendered timestamps, no TZ.

    Scale shape: scalar watermark broadcast over the stream side,
    then ONE map-side-combined hash aggregate on the hour bucket —
    the q_agg_global discipline applied to the lateness audit a
    production streaming pipeline runs next to its watermarked aggs.
    """
    e = table(spark, sf_dir, "events").select(
        F.unix_micros("ts").alias("us"), "event_id"
    )
    wm = e.filter(F.col("event_id") % 2 == 0).agg(
        (F.max("us") - F.lit(LATENESS_US)).alias("wm_us")
    )
    hour = (F.col("us") - F.col("us") % HOUR_US).cast("bigint")
    is_late = F.col("event_id") % 2 == 1
    win_end = F.col("us") - F.col("us") % HOUR_US + F.lit(HOUR_US)
    return (
        e.crossJoin(F.broadcast(wm))
        .groupBy(hour.alias("window_start_us"))
        .agg(
            F.sum(F.when(~is_late, 1).otherwise(0))
            .cast("bigint")
            .alias("n_base"),
            F.sum(
                F.when(is_late & (win_end > F.col("wm_us")), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_late_kept"),
            F.sum(
                F.when(is_late & (win_end <= F.col("wm_us")), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_late_dropped"),
        )
    )
