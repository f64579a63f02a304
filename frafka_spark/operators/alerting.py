"""Batch twin of the streaming hysteresis alerter
(``streaming/stateful.py::alert_stream``): per key, an alert episode
OPENS when the per-minute value crosses above ``ALERT_HI`` and CLOSES
when it falls below ``ALERT_LO`` — emitted as one row per CLOSED
episode with its open/close minutes, peak, and point count. The
declared batch key makes the state-machine genre differentially
graded (the stream side is pytest-pinned against the same reference
machine LOGIC — the two tests run it on their own rounding of the
minute series, dec_avg here vs the stream test's round(avg), so the
agreement is machine-semantics equivalence, not literal row
equality).

The sequential state machine has an exact RELATIONAL form — the
lo-row segmentation identity: split each key's timeline at every
``v < LO`` row (the row belongs to the segment it terminates; its
segment id is the count of lo-rows strictly before it). Within a
segment, the FIRST ``v > HI`` row is the only possible open (the
machine cannot close inside a segment — no lo-row precedes the
boundary), and the boundary lo-row is the close. Segments without a
hi-crossing, and the trailing unterminated segment (a still-open
live alert), emit nothing — exactly the machine's semantics, with no
per-row recursion anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from frafka_spark.functions.determinism import (
    dec_avg,
    half_up,
    sql_dec_avg,
    sql_half_up,
)
from frafka_spark.io import table
from frafka_spark.registry import query

ALERT_HI = 15.0  # open threshold (same constants the stream test pins)
ALERT_LO = 5.0  # close threshold — two levels stop flapping


@query(
    "q_events_alert_episodes",
    oracle=f"""
    WITH obs AS (
        SELECT event_type AS key,
               CAST(floor(epoch(ts) / 60) AS BIGINT) AS mi,
               {sql_dec_avg('value')} AS v
        FROM events
        GROUP BY key, mi
    ),
    seg AS (
        SELECT key, mi, v,
               count(CASE WHEN v < {ALERT_LO} THEN 1 END) OVER (
                   PARTITION BY key ORDER BY mi
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS seg_id
        FROM obs
    ),
    bounds AS (
        SELECT key, seg_id,
               min(CASE WHEN v > {ALERT_HI} THEN mi END) AS opened_mi,
               min(CASE WHEN v < {ALERT_LO} THEN mi END) AS closed_mi
        FROM seg GROUP BY key, seg_id
    ),
    episodes AS (
        SELECT s.key, b.opened_mi, b.closed_mi,
               max(s.v) AS peak,
               CAST(count(*) AS BIGINT) AS n_points
        FROM seg s
        JOIN bounds b
          ON b.key = s.key AND b.seg_id = s.seg_id
        WHERE b.opened_mi IS NOT NULL AND b.closed_mi IS NOT NULL
          AND s.mi >= b.opened_mi AND s.mi <= b.closed_mi
        GROUP BY s.key, b.opened_mi, b.closed_mi
    )
    SELECT key, opened_mi, closed_mi,
           {sql_half_up('peak', 4)} AS peak, n_points
    FROM episodes
    """,
)
def q_events_alert_episodes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed hysteresis alert episodes over the per-minute
    ``dec_avg`` value series of each event type: ``(key, opened_mi,
    closed_mi, peak, n_points)`` per episode, where an episode opens
    strictly above ALERT_HI and closes strictly below ALERT_LO — the batch
    relation the streaming alerter emits incrementally (the docstring
    of ``alert_stream`` names this pass as its backfill tool; a law
    test replays the same reference machine logic on this key's own
    dec_avg series and requires episode-for-episode equality).

    Exactness: v is the exact decimal average (bitwise cross-engine),
    threshold comparisons and the peak max operate on those identical
    doubles, counts are integers, and peak displays through the
    pinned half-up. ``COUNT(CASE ...) OVER (... AND 1 PRECEDING)``
    over an empty frame is 0 on both engines (first row → segment 0).

    Scale shape: every stage is KEYED and the plan is ONE linear
    pipeline — the map-side-combined minute rollup exchanges on
    (key, mi), the segmentation window on (key) (running count —
    O(n) incremental frame), and the per-segment bounds are
    FULL-FRAME WINDOW mins over (key, seg_id) rather than a separate
    aggregate joined back: the join form re-executed the whole
    rollup+window subtree on BOTH join children (Catalyst optimizes
    trees, not DAGs), while the window form reads the segment rows
    once (three keyed exchanges + the final episode aggregate,
    plan-pinned; no all-to-one stage, no corpus broadcast, no
    self-join). No per-row recursion, no unbounded-following frame,
    nothing quadratic — the lo-row segmentation turns the sequential
    machine into window + aggregates, which is why the batch backfill
    of years of history is safe where replaying the stream would not
    be.
    """
    e = table(spark, sf_dir, "events")
    obs = e.groupBy(
        F.col("event_type").alias("key"),
        F.floor(F.unix_timestamp("ts") / 60).cast("bigint").alias("mi"),
    ).agg(dec_avg("value", "v"))
    w_seg = (
        Window.partitionBy("key")
        .orderBy("mi")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seg = obs.withColumn(
        "seg_id",
        F.count(F.when(F.col("v") < ALERT_LO, 1)).over(w_seg),
    )
    # per-segment bounds as full-frame mins — identical semantics to
    # aggregating (key, seg_id) bounds and joining them back onto the
    # segment rows, without the second read of the segment subtree
    w_b = Window.partitionBy("key", "seg_id")
    bounded = seg.select(
        "key",
        "mi",
        "v",
        F.min(F.when(F.col("v") > ALERT_HI, F.col("mi")))
        .over(w_b)
        .alias("opened_mi"),
        F.min(F.when(F.col("v") < ALERT_LO, F.col("mi")))
        .over(w_b)
        .alias("closed_mi"),
    )
    episodes = (
        bounded.filter(
            F.col("opened_mi").isNotNull()
            & F.col("closed_mi").isNotNull()
            & (F.col("mi") >= F.col("opened_mi"))
            & (F.col("mi") <= F.col("closed_mi"))
        )
        .groupBy("key", "opened_mi", "closed_mi")
        .agg(
            F.max("v").alias("peak"),
            F.count("*").cast("bigint").alias("n_points"),
        )
    )
    return episodes.select(
        "key",
        "opened_mi",
        "closed_mi",
        half_up(F.col("peak"), 4).alias("peak"),
        "n_points",
    )
