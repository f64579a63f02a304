"""B9 (declared subset) — batch-equivalent forms of streaming operators.

Structured Streaming's windowed operators (``F.window``,
``F.session_window``, dedup) produce the same results in batch mode
over a bounded input — these declared queries pin the *semantics*
against the DuckDB oracle, while ``tests/test_streaming.py`` runs the
same transformations through ``readStream`` + ``Trigger.AvailableNow``
and asserts stream≡batch (the frafka round-trip test style, SURVEY.md
§5.1/§5.3.2).

Timestamp discipline: events.ts is ns in DuckDB and µs in Spark, so
every returned time is truncated to the second and formatted as a
string (SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frafka_spark.functions.determinism import dec_sum, sql_dec_sum
from frafka_spark.io import table
from frafka_spark.registry import query


@query(
    "q_stream_tumbling",
    oracle=f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n,
           {sql_dec_sum('value')} AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window aggregation.

    In streaming this is ``withWatermark + groupBy(window(...))``; the
    batch form is semantics-identical (hour buckets are half-open).
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dec_sum("value", "total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "q_stream_session",
    oracle=f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         >= INTERVAL 30 MINUTE
                    OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, value,
               sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_id
        FROM flagged
    )
    SELECT user_id,
           strftime(date_trunc('second', min(ts)), '%Y-%m-%d %H:%M:%S')
               AS session_start,
           strftime(date_trunc('second', max(ts)), '%Y-%m-%d %H:%M:%S')
               AS session_last,
           count(*) AS n_events,
           {sql_dec_sum('value')} AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) per user.

    Engine side: native ``F.session_window`` (the operator Structured
    Streaming uses for stateful sessionization). Oracle: the
    gaps-and-islands formulation — lag + cumulative new-session flags
    — which must match Spark's merge semantics exactly: an event at
    prev_ts + gap starts a NEW session (session intervals are
    half-open [ts, ts+gap)) [SURVEY.md §7 hard-list #2].
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            dec_sum("value", "session_value"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        .select(
            "user_id",
            F.date_format(F.date_trunc("second", "min_ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.date_trunc("second", "max_ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_last"
            ),
            "n_events",
            "session_value",
        )
    )


@query(
    "q_stream_dedup",
    oracle="""
    SELECT user_id, event_type,
           min(event_id) AS first_event_id,
           count(*) AS n_dups
    FROM events
    GROUP BY user_id, event_type
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dedup: first event per (user, type) key.

    ``dropDuplicates`` keeps an arbitrary row in batch mode, so the
    declared form is the deterministic min-id variant; streaming
    ``dropDuplicatesWithinWatermark`` is exercised in
    tests/test_streaming.py (SURVEY.md §2 B9).
    """
    e = table(spark, sf_dir, "events")
    return e.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"),
        F.count("*").alias("n_dups"),
    )


@query(
    "q_stream_sliding",
    oracle=f"""
    WITH expanded AS (
        -- TIMESTAMP '1970-01-01' + to_seconds(...) stays a naive
        -- TIMESTAMP; to_timestamp() would return TIMESTAMPTZ and make
        -- strftime output depend on the DuckDB session TimeZone.
        SELECT unnest([
                   TIMESTAMP '1970-01-01'
                       + to_seconds(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT)),
                   TIMESTAMP '1970-01-01'
                       + to_seconds(CAST(floor(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT))
               ]) AS w_start,
               event_type, value
        FROM events
    )
    SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           count(*) AS n,
           {sql_dec_sum('value')} AS total_value
    FROM expanded
    GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window (1 h width, 30 min slide): each event lands in 2
    overlapping windows.

    Spark's ``window(ts, '1 hour', '30 minutes')`` assigns epoch-
    aligned buckets; the oracle derives the same two window starts per
    event arithmetically (floor to the 30-min grid, and that minus one
    slide) — SURVEY §2 B9 called this fragile, but the epoch-grid
    formulation is exact.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), dec_sum("value", "total_value"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


@query(
    "q_stream_interval_join",
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           CAST((epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS BIGINT)
               AS secs_to_purchase
    FROM events c JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts
     AND epoch_us(p.ts) - epoch_us(c.ts) <= 600 * 1000000
    """,
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time interval join: each click matched to same-user
    purchases within the next 10 minutes — the batch-equivalent of
    the watermarked stream-stream join (`tests/test_streaming.py`
    runs the true streaming formulation of this exact shape).

    Plan: the equality key (user_id) carries the shuffle; the time
    bound is a post-join filter over each user's event pairs, so
    per-task work is Σ|user events|² at worst and in practice bounded
    by the interval. This is precisely how Structured Streaming
    executes the stream-stream version — state keyed on user_id,
    rows expired past the watermark + interval — so the batch plan
    IS the streaming plan with retention replaced by the watermark.
    Elapsed seconds use integer microseconds (`unix_micros` ↔
    `epoch_us`) and INTEGER division on both sides (`div` ↔ `//`):
    float `/` then bigint-cast diverges because DuckDB rounds the
    cast while Spark truncates.
    """
    e = table(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros("ts").alias("c_us"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.unix_micros("ts").alias("p_us"),
    )
    return (
        c.join(
            p,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("p_us") >= F.col("c_us"))
            & (F.col("p_us") - F.col("c_us") <= 600 * 1_000_000),
        )
        .select(
            "click_id",
            "purchase_id",
            "user_id",
            F.expr("(p_us - c_us) div 1000000")
            .cast("bigint")
            .alias("secs_to_purchase"),
        )
    )
