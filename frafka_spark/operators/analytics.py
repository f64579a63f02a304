"""Event-analytics composites: funnel and cohort retention.

Beyond SURVEY.md §2's per-operator inventory, these are the two
event-stream shapes every product-analytics workload runs (and the
reference's Kafka-transport users feed into exactly such queries
downstream): a staged conversion funnel and a cohort-retention
matrix. Both are expressed as compositions of the engine's existing
operators — filtered per-key min-aggregates chained by shuffle joins
on ``user_id`` — so Catalyst plans them with map-side partial
aggregation and one hash partitioning reused across stages.

Scale shape (100 TB lens): every intermediate relation here is
O(users) or O(users × days), never O(events²); all joins key on
``user_id`` so AQE can reuse one exchange layout end-to-end, and
nothing is collected or broadcast (user-count relations are unbounded
— at fixture scale AQE may size-broadcast them at runtime, which is
fine because that decision is data-driven, not a hint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from frafka_spark.functions.determinism import dec_avg, half_up, sql_dec_avg
from frafka_spark.io import table
from frafka_spark.registry import query

_FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_stages(
    events: DataFrame, stages: tuple[str, ...] = _FUNNEL_STAGES
) -> list[DataFrame]:
    """Chain ordered funnel stages over an events relation.

    Returns one per-user frame per stage: ``(user_id, _t{i})`` where
    ``_t{i}`` is the user's first event of stage ``i`` occurring at or
    after their stage ``i-1`` timestamp. Each stage is a filtered
    min-aggregate joined to the previous stage on ``user_id`` — one
    timestamp of per-user state, no window sort.
    """
    out: list[DataFrame] = []
    prev: DataFrame | None = None
    for i, etype in enumerate(stages):
        s = events.filter(F.col("event_type") == etype)
        if prev is not None:
            s = s.join(prev, "user_id").filter(F.col("ts") >= F.col(f"_t{i - 1}"))
        prev = s.groupBy("user_id").agg(F.min("ts").alias(f"_t{i}"))
        out.append(prev)
    return out


def funnel_user_stages(
    events: DataFrame, stages: tuple[str, ...] = _FUNNEL_STAGES
) -> DataFrame:
    """Per-user funnel timestamps in ONE keyed pass: ``(user_id, _t0,
    _t1, ... )`` where ``_t{i}`` is the user's first stage-``i`` event
    at or after their ``_t{i-1}`` (NULL propagates down the chain —
    no earlier stage, no later one).

    The single-relation replacement for consuming every frame of
    ``funnel_stages``: that chain is correct but each stage is a
    separate aggregate JOINED to the previous one, so a consumer that
    unions per-stage counts re-executes the shared prefix on every
    branch (q_events_funnel's plan scanned events 7×, guide §2.4
    one-read). Here non-stage rows are filtered before the single
    user_id exchange (§2.3 shuffle fewer bytes), the chained mins are
    full-partition window aggregates over that one layout (no sort —
    the frame is unbounded), and one user-keyed aggregate collapses to
    a per-user row that every consumer branch reads for free.
    Equivalence with the chained-join form is pinned by
    tests/test_properties.py::test_funnel_user_stages_equals_chain.
    """
    w = Window.partitionBy("user_id")
    df = events.select("user_id", "event_type", "ts").filter(
        F.col("event_type").isin(*stages)
    )
    for i, etype in enumerate(stages):
        cond = F.col("event_type") == etype
        if i > 0:
            cond = cond & (F.col("ts") >= F.col(f"_t{i - 1}"))
        df = df.withColumn(f"_t{i}", F.min(F.when(cond, F.col("ts"))).over(w))
    return df.groupBy("user_id").agg(
        *[F.min(f"_t{i}").alias(f"_t{i}") for i in range(len(stages))]
    )


@query(
    "q_events_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t1
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts >= v.t0
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.t1
        GROUP BY e.user_id
    ),
    stages AS (
        SELECT '1_view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
        UNION ALL
        SELECT '2_click', CAST(count(*) AS BIGINT) FROM c
        UNION ALL
        SELECT '3_purchase', CAST(count(*) AS BIGINT) FROM p
    )
    SELECT stage, n_users,
           floor(CAST(n_users AS DOUBLE)
                 / (SELECT n_users FROM stages WHERE stage = '1_view')
                 * 10000.0 + 0.5) / 10000.0 AS pct_of_entry
    FROM stages
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: view → click-after-view →
    purchase-after-click, counted per stage.

    The per-user stage timestamps come from ``funnel_user_stages`` —
    one events scan, one ``user_id`` exchange, chained full-partition
    window mins (the ordered-sequence semantics — a click only counts
    AFTER that user's first view — with no window sort). The three
    stage counts are then three ``count(non-null)`` columns of ONE
    global aggregate over that per-user row, unpivoted with ``stack``;
    the entry count rides the same row, so no branch re-executes the
    chain (the former per-stage-aggregate + union form re-ran the
    shared prefix on every union branch and again for the entry
    crossJoin — 7 events scans in the plan, now 1; guide §2.4).
    """
    e = table(spark, sf_dir, "events")
    pu = funnel_user_stages(e)
    counts = pu.agg(
        F.count("_t0").alias("n0"),
        F.count("_t1").alias("n1"),
        F.count("_t2").alias("n2"),
    )
    return counts.select(
        F.expr(
            "stack(3, '1_view', n0, '2_click', n1, '3_purchase', n2)"
            " AS (stage, n_users)"
        ),
        F.col("n0").alias("n_entry"),
    ).select(
        "stage",
        "n_users",
        half_up(F.col("n_users").cast("double") / F.col("n_entry"), 4).alias(
            "pct_of_entry"
        ),
    )


@query(
    "q_events_retention",
    oracle="""
    WITH cohort AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS c_day
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS a_day FROM events
    )
    SELECT strftime(c.c_day, '%Y-%m-%d') AS cohort_day,
           CAST(date_diff('day', c.c_day, a.a_day) AS INT) AS day_offset,
           CAST(count(*) AS BIGINT) AS n_active
    FROM active a JOIN cohort c ON c.user_id = a.user_id
    WHERE date_diff('day', c.c_day, a.a_day) BETWEEN 0 AND 7
    GROUP BY c.c_day, date_diff('day', c.c_day, a.a_day)
    """,
)
def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users first seen on day D still active on
    D+k, for k ∈ [0, 7].

    The distinct (user, day) projection collapses event volume to at
    most one row per user-day BEFORE the cohort join, so the wide
    side of the join is O(users × active days), not O(events). After
    the distinct, each (cohort, offset) group counts rows — a plain
    ``count(*)``, because a user contributes at most one row per day
    by construction; no countDistinct Expand needed.
    """
    e = table(spark, sf_dir, "events")
    cohort = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("c_day"))
    active = e.select("user_id", F.to_date("ts").alias("a_day")).distinct()
    off = F.datediff(F.col("a_day"), F.col("c_day"))
    return (
        active.join(cohort, "user_id")
        .filter((off >= 0) & (off <= 7))
        .groupBy(
            F.date_format("c_day", "yyyy-MM-dd").alias("cohort_day"),
            off.cast("int").alias("day_offset"),
        )
        .agg(F.count("*").alias("n_active"))
    )


@query(
    "q_ts_gapfill",
    oracle=f"""
    WITH bounds AS (
        SELECT date_trunc('hour', min(ts)) AS h0,
               date_trunc('hour', max(ts)) AS h1
        FROM events
    ),
    hours AS (
        SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr FROM bounds
    ),
    grid AS (
        SELECT t.event_type, h.hr
        FROM (SELECT DISTINCT event_type FROM events) t, hours h
    ),
    actual AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               CAST(count(*) AS BIGINT) AS n_events,
               {sql_dec_avg("value")} AS avg_value
        FROM events GROUP BY 1, 2
    )
    SELECT g.event_type,
           strftime(g.hr, '%Y-%m-%d %H') AS bucket,
           COALESCE(a.n_events, 0) AS n_events,
           COALESCE(last_value(a.avg_value IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0)
               AS avg_value_ffill
    FROM grid g
    LEFT JOIN actual a ON a.event_type = g.event_type AND a.hr = g.hr
    """,
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style time-bucket rollup with gap fill: hourly
    per-type event counts over a DENSE calendar, empty buckets
    zero-counted and their running metric forward-filled
    (last-observation-carried-forward).

    The time-series shape relational engines lack natively: the dense
    hour grid is generated (``sequence`` + ``explode`` over the
    global [min, max] hour bounds crossed with the distinct type
    dimension), then left-joined to the actual per-bucket rollup.
    Both the grid and the rolled-up actuals are bounded by
    |types| × |calendar hours| regardless of event volume — only the
    one rollup aggregate ever touches the raw events — so the
    aggregated side is explicitly broadcast and the gap-fill window
    (partitioned by type, ordered by hour) runs over
    calendar-bounded partitions. At 100 TB the plan shape is
    unchanged: one map-side-combined shuffle on (type, hour), then
    O(types × hours) post-aggregate work. ``avg_value`` uses the
    exact decimal-sum discipline (`dec_avg`) so the filled values are
    bitwise identical across engines and partition layouts.
    """
    e = table(spark, sf_dir, "events")
    hour = F.date_trunc("hour", F.col("ts"))
    actual = e.groupBy(F.col("event_type"), hour.alias("hr")).agg(
        F.count("*").alias("n_events"),
        dec_avg("value", "avg_value"),
    )
    # Bounds and the type dimension are DERIVED from the rollup, not
    # written as separate raw-events queries: min/max of truncated
    # hours ≡ truncated min/max ts, and every type present in events
    # appears in its rollup. Catalyst column-prunes each branch
    # (ReuseExchange therefore can't unify them — verified), so the
    # physical cost is one full-width rollup scan plus two scans
    # pruned to 1–2 columns with map-side partial aggregation — at
    # 100 TB the narrow branches read a small fraction of table
    # bytes, and a production pipeline materializes ``actual`` once
    # anyway (it is O(types × hours)).
    bounds = actual.agg(F.min("hr").alias("h0"), F.max("hr").alias("h1"))
    grid = (
        actual.select("event_type")
        .distinct()
        .crossJoin(bounds)
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("hr"),
        )
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(F.broadcast(actual), ["event_type", "hr"], "left")
        .select(
            "event_type",
            F.date_format("hr", "yyyy-MM-dd HH").alias("bucket"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.coalesce(
                F.last("avg_value", ignorenulls=True).over(w), F.lit(0.0)
            ).alias("avg_value_ffill"),
        )
    )


@query(
    "q_events_sessionize",
    oracle="""
    WITH base AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS flag,
               row_number() OVER w AS rn
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, event_id,
           CAST(sum(flag) OVER wc AS INT) AS session_seq,
           CAST(rn - max(CASE WHEN flag = 1 THEN rn END) OVER wc + 1 AS INT)
               AS seq_in_session
    FROM base
    WINDOW wc AS (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event sessionization: tag EVERY event with its session
    ordinal and position within the session (30-min inactivity gap,
    same half-open boundary as ``q_stream_session``: an event at
    exactly prev_ts + gap starts a new session).

    This is the per-row complement of ``q_stream_session``'s
    aggregated ``session_window`` output — clickstream pipelines need
    the event-level session tag (for path analysis, bounce detection,
    per-session joins), which ``session_window`` cannot produce.

    Single-exchange plan by construction: every window expression —
    the lag-based new-session flag, the running session counter, and
    the within-session ordinal — shares the one
    ``partitionBy(user_id)`` sort. The ordinal is derived as
    ``rn - running_max(rn at session starts) + 1`` instead of a
    ``row_number`` over ``(user_id, session_seq)``, which would force
    a second hash exchange on the computed key. At 100 TB: one
    shuffle on ``user_id``, per-user sorted streams, no global sort,
    state bounded per partition — the same layout Structured
    Streaming's sessionization state store uses.
    """
    from pyspark.sql import Window

    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev_ts = F.lag("ts").over(w)
    flag = F.when(
        prev_ts.isNull()
        | (F.col("ts") >= prev_ts + F.expr("INTERVAL 30 MINUTES")),
        1,
    ).otherwise(0)
    base = e.select(
        "user_id",
        "event_id",
        "ts",
        flag.alias("flag"),
        F.row_number().over(w).alias("rn"),
    )
    return base.select(
        "user_id",
        "event_id",
        F.sum("flag").over(wc).cast("int").alias("session_seq"),
        (
            F.col("rn")
            - F.max(F.when(F.col("flag") == 1, F.col("rn"))).over(wc)
            + F.lit(1)
        )
        .cast("int")
        .alias("seq_in_session"),
    )


@query(
    "q_llm_bigram_lm",
    oracle="""
    WITH words AS (
        SELECT string_split(text, ' ') AS w FROM documents
    ),
    bi AS (
        SELECT unnest([{'w1': w[i], 'w2': w[i+1]}
                       for i in generate_series(1, len(w) - 1)]) AS b
        FROM words
    ),
    counts AS (
        SELECT b.w1 AS w1, b.w2 AS w2, CAST(count(*) AS BIGINT) AS n
        FROM bi GROUP BY b.w1, b.w2
    ),
    firsts AS (
        SELECT w1, CAST(sum(n) AS BIGINT) AS n_first FROM counts GROUP BY w1
    )
    SELECT c.w1, c.w2, c.n, f.n_first,
           floor(CAST(c.n AS DOUBLE) / f.n_first * 10000.0 + 0.5) / 10000.0
               AS p_next
    FROM counts c JOIN firsts f ON f.w1 = c.w1
    WHERE c.n >= 20
    """,
)
def q_llm_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus bigram language-model statistics: count(w1 w2) and the
    conditional next-word probability P(w2 | w1).

    The n-gram-LM profile a training-data pipeline runs to spot
    boilerplate and estimate corpus diversity. Reads the shared
    cached ``_bigrams`` relation (one corpus explode per session,
    shared with repetition and NLL scoring), one (w1, w2)
    hash-aggregate, and the first-word totals DERIVED from that
    aggregate by a second roll-up — the corpus is never exploded
    twice (round 2's tfidf/heavy-hitters lesson). The w1-keyed join
    shuffles both sides on w1; vocabulary relations are Zipf-skewed
    but bounded by |vocab|², and the ``n >= 20`` floor keeps the
    output the head of the distribution.
    """
    from frafka_spark.llm.text import _bigrams

    counts = (
        _bigrams(spark, sf_dir)
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n"))
    )
    firsts = counts.groupBy("w1").agg(F.sum("n").alias("n_first"))
    return (
        counts.filter(F.col("n") >= 20)
        .join(firsts, "w1")
        .select(
            "w1",
            "w2",
            "n",
            "n_first",
            half_up(
                F.col("n").cast("double") / F.col("n_first"), 4
            ).alias("p_next"),
        )
    )


@query(
    "q_events_rolling_actives",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT
               epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr,
               user_id
        FROM events
    ),
    exploded AS (
        SELECT p.hr + k.k AS target_hr, p.user_id
        FROM pairs p, generate_series(0, 23) k(k)
    ),
    counts AS (
        SELECT target_hr AS hr,
               CAST(count(DISTINCT user_id) AS BIGINT) AS active_24h
        FROM exploded GROUP BY target_hr
    )
    SELECT c.hr, c.active_24h
    FROM counts c SEMI JOIN pairs p ON p.hr = c.hr
    """,
)
def q_events_rolling_actives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 24-hour distinct active users per hour — the DAU/WAU/
    MAU family's core shape (count distinct over a trailing time
    window, which no window-function frame supports directly).

    Scale formulation (r6 rewrite, VERDICT r5 #3 — 1.44 s → ~0.65 s
    at sf0.1; results and oracle unchanged): interval merge + boundary
    deltas instead of a ×24 slot explode.

    1. Reduce raw events to DISTINCT (hour, user) activity pairs
       (bounded by hours × active users, NOT event count).
    2. Per user, a pair's coverage is [hr, hr+23]; consecutive
       activity hours ≤23 apart chain into one covered interval, so
       lag/lead over (user ORDER BY hr) marks interval starts (gap
       from prev > 23) and ends (gap to next > 23) in ONE window
       pass — no group-by, no slot explode.
    3. Each interval emits +1 at its start hour and −1 at end+24;
       every pair also emits an "hour observed" marker. Summed per
       hour, a running total over the hour axis IS the trailing-24 h
       distinct active count (a user in ≥1 covering interval counts
       exactly once — intervals of one user never overlap by
       construction).

    Shuffle bytes are ∝ pairs (vs pairs×24 for the slot explode —
    the r5 shape); the final running sum is a single-partition window
    over the *hour axis*, whose cardinality is bounded by calendar
    time (~9 k rows/year) regardless of data volume, never by event
    or user count. Hours are integer epoch indexes
    (`unix_micros // 3600e6` ↔ `epoch_us // 3600000000`) so no
    timestamp rendering or timezone enters the result; output keeps
    only observed hours (the carried marker, not a second pairs
    subtree + semi join as in r5).
    """
    e = table(spark, sf_dir, "events")
    return rolling_distinct_actives(e, window_hours=24, out="active_24h")


@query(
    "q_events_anomaly",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr,
               count(*) AS n
        FROM events GROUP BY event_type, hr
    ),
    base AS (
        SELECT event_type, hr, n,
               count(*) OVER w AS n_base,
               sum(n) OVER w AS s,
               sum(n * n) OVER w AS ss
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hr
                     RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)
    ),
    stats AS (
        SELECT event_type, hr, n, n_base,
               CAST(s AS DOUBLE) / n_base AS mean,
               (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * s / n_base)
                   / (n_base - 1) AS var
        FROM base WHERE n_base >= 12
    ),
    scored AS (
        SELECT event_type, hr, n, n_base, mean,
               CASE WHEN var > 0 THEN
                   (round((CAST(n AS DOUBLE) - mean) / sqrt(var), 4) + 0.0)
               END AS z
        FROM stats
    )
    SELECT event_type, hr,
           CAST(n AS BIGINT) AS n_events,
           CAST(n_base AS BIGINT) AS n_base,
           floor(mean * 10000.0 + 0.5) / 10000.0 AS base_mean,
           z,
           coalesce(abs(z) > 3.0, FALSE) AS is_anomaly
    FROM scored
    """,
)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event-volume anomaly detection: z-score of each hour's
    count per event type against its own trailing-24 h baseline —
    the ops-monitoring shape behind every "traffic dropped/spiked"
    alert (and, in a data pipeline, the crawler-outage detector run
    before a day's crawl is admitted into training data).

    Determinism is engineered rather than hoped for: the baseline
    variance comes from windowed ``sum(n)`` and ``sum(n²)`` — integer
    sums, exact in both engines regardless of accumulation order —
    with mean/variance/z derived from those exact integers by the
    same double formula on both sides (never ``stddev_samp``, whose
    Welford-vs-textbook accumulation differs across engines at the
    last ulp). ``round_z`` canonicalizes the signed zero a
    dead-centre baseline can produce. Hours with fewer than 12
    baseline hours are suppressed (cold start); a zero-variance
    baseline is guarded explicitly (``var > 0``, which also absorbs
    the tiny-negative float residue an exactly-constant baseline can
    leave in ``ss − s²/n``) → NULL z and ``is_anomaly = false`` via
    coalesce.

    Scale shape: the raw stream collapses to (event_type, hour)
    counts first — map-side partials bound the shuffle by types ×
    hours, not events. The trailing window then runs per event type
    over the *hour axis*, whose cardinality is calendar-bounded
    (~9 k rows/year/type) no matter how many events arrive; the
    RANGE frame handles gap hours (missing hours simply contribute
    nothing) without gap-filling.
    """
    from frafka_spark.functions.determinism import round_z

    e = table(spark, sf_dir, "events")
    hourly = (
        e.select(
            "event_type",
            (F.unix_micros(F.date_trunc("hour", "ts")) / 3_600_000_000)
            .cast("bigint")
            .alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count("*").alias("n"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rangeBetween(-24, -1)
    )
    base = hourly.select(
        "event_type",
        "hr",
        "n",
        F.count("*").over(w).alias("n_base"),
        F.sum("n").over(w).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("ss"),
    ).filter(F.col("n_base") >= 12)
    mean = F.col("s").cast("double") / F.col("n_base")
    var = (
        F.col("ss").cast("double") - F.col("s").cast("double") * F.col("s") / F.col("n_base")
    ) / (F.col("n_base") - 1)
    z = F.when(var > 0, round_z((F.col("n").cast("double") - mean) / F.sqrt(var), 4))
    return base.select(
        "event_type",
        "hr",
        F.col("n").cast("bigint").alias("n_events"),
        F.col("n_base").cast("bigint").alias("n_base"),
        half_up(mean, 4).alias("base_mean"),
        z.alias("z"),
        F.coalesce(F.abs(z) > 3.0, F.lit(False)).alias("is_anomaly"),
    )


TOP_PATHS_K = 10


@query(
    "q_events_top_paths",
    oracle=f"""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    paths AS (
        SELECT event_type || '>' || e2 || '>' || e3 AS path,
               count(*) AS n
        FROM seq WHERE e3 IS NOT NULL
        GROUP BY path
    )
    SELECT path, CAST(n AS BIGINT) AS n
    FROM paths ORDER BY n DESC, path LIMIT {TOP_PATHS_K}
    """,
)
def q_events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event trigram paths: the most frequent 3-step event-type
    sequences across users (clickstream path mining — the "what do
    users do next" query behind funnel design).

    Scale shape: the per-user sequence window hash-partitions on
    user_id (millions of small partitions, never one task), trigram
    paths collapse through a hash aggregate whose key space is
    |event_types|³ — map-side partials bound the shuffle by that
    cube, not by events — and the final top-K is
    TakeOrderedAndProject (per-partition heaps, no global sort).
    Ordering inside a user is (ts, event_id) — a total order, so the
    trigram multiset is engine-independent even when one user fires
    two events in the same microsecond.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(TOP_PATHS_K)
    )


def rolling_distinct_actives(
    events: DataFrame, window_hours: int, out: str
) -> DataFrame:
    """Trailing-``window_hours`` distinct active users per observed
    hour — the interval-merge + boundary-delta engine behind the
    DAU (24 h) / WAU (168 h) / MAU (720 h) family. See
    ``q_events_rolling_actives`` for the derivation; the window width
    only changes the interval-chaining gap (``window_hours − 1``) and
    the end-delta offset, so one implementation serves every width
    with identical scale properties (shuffle ∝ pairs; final running
    sum over the calendar-bounded hour axis).
    """
    gap = window_hours - 1
    pairs = (
        events.select(
            (F.unix_micros(F.date_trunc("hour", "ts")) / 3_600_000_000)
            .cast("bigint")
            .alias("hr"),
            "user_id",
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("hr")
    prev, nxt = F.lag("hr").over(w), F.lead("hr").over(w)
    flagged = pairs.select(
        "hr",
        (prev.isNull() | ((F.col("hr") - prev) > gap)).alias("is_start"),
        (nxt.isNull() | ((nxt - F.col("hr")) > gap)).alias("is_end"),
    )
    pts = (
        flagged.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("hr").alias("p"),
                        F.lit(0).alias("d"),
                        F.lit(1).alias("o"),
                    ),
                    F.when(
                        F.col("is_start"),
                        F.struct(
                            F.col("hr").alias("p"),
                            F.lit(1).alias("d"),
                            F.lit(0).alias("o"),
                        ),
                    ),
                    F.when(
                        F.col("is_end"),
                        F.struct(
                            (F.col("hr") + F.lit(window_hours)).alias("p"),
                            F.lit(-1).alias("d"),
                            F.lit(0).alias("o"),
                        ),
                    ),
                )
            ).alias("x")
        )
        .filter(F.col("x").isNotNull())
        .select("x.*")
    )
    hour_axis = pts.groupBy("p").agg(F.sum("d").alias("d"), F.max("o").alias("o"))
    run = Window.orderBy("p").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        hour_axis.select(
            F.col("p").alias("hr"),
            F.sum("d").over(run).cast("bigint").alias(out),
            "o",
        )
        .filter(F.col("o") == 1)
        .select("hr", out)
    )


@query(
    "q_events_rolling_actives_7d",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT
               epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr,
               user_id
        FROM events
    ),
    exploded AS (
        SELECT p.hr + k.k AS target_hr, p.user_id
        FROM pairs p, generate_series(0, 167) k(k)
    ),
    counts AS (
        SELECT target_hr AS hr,
               CAST(count(DISTINCT user_id) AS BIGINT) AS active_7d
        FROM exploded GROUP BY target_hr
    )
    SELECT c.hr, c.active_7d
    FROM counts c SEMI JOIN pairs p ON p.hr = c.hr
    """,
)
def q_events_rolling_actives_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day (168 h) distinct actives per hour — the WAU twin
    of ``q_events_rolling_actives``, declared to prove the interval
    engine is width-parameterized: the ENGINE cost is identical at
    any width (shuffle ∝ pairs — wider windows only merge more
    intervals), while the naive slot-explode oracle pays ×168 — the
    gap that makes the interval formulation the only viable one for
    MAU at event scale.
    """
    e = table(spark, sf_dir, "events")
    return rolling_distinct_actives(e, window_hours=168, out="active_7d")


EMA_ALPHA = 0.1


@query(
    "q_events_ema",
    oracle=f"""
    SELECT user_id,
           CAST(len(vals) AS BIGINT) AS n_events,
           floor(list_reduce(vals,
                 (acc, x) -> {EMA_ALPHA} * x + {1 - EMA_ALPHA} * acc)
                 * 1000000.0 + 0.5) / 1000000.0 AS ema_value
    FROM (
        SELECT user_id, list(value::DOUBLE ORDER BY event_id) AS vals
        FROM events GROUP BY user_id
    )
    """,
)
def q_events_ema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponential moving average of event values
    (``y₁ = x₁; yₜ = α·xₜ + (1−α)·yₜ₋₁``) — the classic
    NON-associative sequential recurrence no window frame or
    mergeable aggregate expresses (contrast the decomposable
    sums/counts everywhere else in this module).

    Determinism across engines comes from ORDERED-FOLD PARITY: both
    sides materialize the user's values in (event_id) order and fold
    left-to-right with the identical double arithmetic — Spark
    ``aggregate(slice(l, 2, n−1), l[1], f)`` replicates DuckDB
    ``list_reduce`` exactly (first element seeds the accumulator),
    so the pre-rounding result is bit-identical; no accumulation-
    order hazard exists because the order IS the semantics.

    Scale shape: one (user_id) exchange; the fold state is one
    ordered array per user — memory ∝ a single user's history, the
    inherent footprint of any exact EMA replay (an unbounded stream
    keeps ONE running scalar instead via the stateful streaming op,
    ``applyInPandasWithState`` in streaming/). The sort is
    aggregate-local (``array_sort`` on (event_id, value) structs),
    never a global sort.
    """
    e = table(spark, sf_dir, "events")
    lst = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct("event_id", F.col("value").cast("double").alias("value"))
            )
        ),
        lambda s: s["value"],
    )
    grouped = e.groupBy("user_id").agg(lst.alias("vals"))
    fold = F.aggregate(
        F.slice(F.col("vals"), 2, F.size("vals") - 1),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: F.lit(EMA_ALPHA) * x + F.lit(1 - EMA_ALPHA) * acc,
    )
    return grouped.select(
        "user_id",
        F.size("vals").cast("bigint").alias("n_events"),
        half_up(fold, 6).alias("ema_value"),
    )


@query(
    "q_events_drawdown",
    oracle="""
    WITH dd AS (
        SELECT user_id,
               max(value) OVER (PARTITION BY user_id ORDER BY event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) - value AS d
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           round(max(d), 6) AS max_drawdown
    FROM dd GROUP BY user_id
    """,
)
def q_events_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user maximum drawdown: the largest drop of ``value`` below
    its running peak over the event sequence — the risk/stability
    metric of any monitored time series (portfolio equity, queue
    depth, quality score drift).

    Deterministic by construction: running max and final max are
    SELECTIONS (no accumulation arithmetic), and each drawdown is one
    subtraction of two doubles both engines read identically — so
    unlike mean/variance shapes nothing here is order-sensitive.
    Scale: one (user_id) exchange shared by the window and the
    aggregate; running-max state is a single scalar per partition
    row stream.
    """
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dd = e.select(
        "user_id", (F.max("value").over(w) - F.col("value")).alias("d")
    )
    return dd.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        F.round(F.max("d"), 6).alias("max_drawdown"),
    )


@query(
    "q_events_longest_streak",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id)
               - row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY event_id) AS grp
        FROM events
    ),
    runs AS (
        SELECT user_id, event_type, count(*) AS run_len
        FROM seq GROUP BY user_id, event_type, grp
    ),
    best AS (
        SELECT user_id, event_type, run_len,
               row_number() OVER (
                   PARTITION BY user_id
                   ORDER BY run_len DESC, event_type) AS rk
        FROM runs
    )
    SELECT user_id, event_type AS streak_type,
           CAST(run_len AS BIGINT) AS streak_len
    FROM best WHERE rk = 1
    """,
)
def q_events_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive same-type run per user — the
    gaps-and-islands classic (login streaks, repeated-failure runs,
    habit tracking): the difference of two row_numbers (overall vs
    per-type, both ordered by event_id) is constant exactly within a
    consecutive run, so one group-by on that derived key measures
    every run without any sequential scan.

    Determinism: both row_numbers order by the unique event_id and
    run lengths are integers; the per-user winner breaks length ties
    by event_type. Scale: both windows and both aggregates share the
    (user_id[, event_type]) hash layout — integer state only, and
    never a cross-row arithmetic accumulation.
    """
    e = table(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("event_id")
    seq = e.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
    )
    runs = seq.groupBy("user_id", "event_type", "grp").agg(
        F.count("*").alias("run_len")
    )
    w_best = Window.partitionBy("user_id").orderBy(
        F.desc("run_len"), F.asc("event_type")
    )
    return (
        runs.withColumn("rk", F.row_number().over(w_best))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_type").alias("streak_type"),
            F.col("run_len").cast("bigint").alias("streak_len"),
        )
    )


@query(
    "q_events_inter_arrival",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        FROM events
    )
    SELECT user_id,
           CAST(count(gap_us) AS BIGINT) AS n_gaps,
           floor(quantile_cont(gap_us, 0.5) / 100 + 0.5) / 10000
               AS median_gap_s,
           floor(quantile_cont(gap_us, 0.9) / 100 + 0.5) / 10000
               AS p90_gap_s,
           CAST(max(gap_us) // 1000000 AS BIGINT) AS max_gap_floor_s
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
)
def q_events_inter_arrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival gap statistics (median / p90 / max of
    the time between consecutive events) — the engagement-cadence and
    latency-profile shape behind session-timeout tuning and
    bot-vs-human heuristics (and the cousin of `q_events_sessionize`,
    which thresholds these same gaps).

    Determinism: gaps are exact integer microseconds (epoch-µs
    differences over a (ts, event_id) total order); the interpolated
    percentiles are the same rank-(n−1)·p linear rule on both engines
    over identical integers. The seconds rescale rounds by the
    EXPLICIT half-up ``floor(p_us/100 + 0.5)/1e4`` (bit-identical
    IEEE ops) rather than ``round(p_us/1e6, 4)`` — a median that is
    the midpoint of two gaps ends in exactly .5 µs, which the plain
    round resolves engine-specifically (caught live by the sf0.1
    full-suite differential). Scale: one (user_id) exchange shared by the lag
    window and the percentile aggregate; per-user state is the gap
    list one exact percentile needs (swap for ``percentile_approx``'s
    mergeable sketch when a single user's history overflows a
    buffer — the same trade documented at ``q_llm_length_trim``).
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = e.select(
        "user_id",
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias(
            "gap_us"
        ),
    ).filter(F.col("gap_us").isNotNull())
    def half_up_s(p):
        return F.floor(p / 100 + F.lit(0.5)) / 10_000

    return gaps.groupBy("user_id").agg(
        F.count("gap_us").cast("bigint").alias("n_gaps"),
        half_up_s(F.percentile("gap_us", F.lit(0.5))).alias("median_gap_s"),
        half_up_s(F.percentile("gap_us", F.lit(0.9))).alias("p90_gap_s"),
        F.floor(F.max("gap_us") / 1_000_000).cast("bigint").alias(
            "max_gap_floor_s"
        ),
    )


@query(
    "q_events_ohlc",
    oracle="""
    SELECT user_id,
           strftime(date_trunc('hour', ts), '%Y-%m-%d %H') AS bucket,
           round(arg_min(value,
                 CAST(epoch_us(ts) AS DECIMAL(38,0)) * 10000000000
                 + event_id), 4) AS open,
           round(max(value), 4) AS high,
           round(min(value), 4) AS low,
           round(arg_max(value,
                 CAST(epoch_us(ts) AS DECIMAL(38,0)) * 10000000000
                 + event_id), 4) AS close,
           count(*) AS n_events
    FROM events
    GROUP BY user_id, date_trunc('hour', ts)
    """,
)
def q_events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC candlestick bars: per (user, hour) — first value, max,
    min, last value, count. The downsampling shape every metrics /
    tick-data pipeline runs before charting or feature extraction.

    open/close are arg-extrema over ONE packed DECIMAL(38,0) ordering
    key — ``epoch_µs × 10^10 + event_id`` — so a ts tie inside a
    bucket (absent in the fixture, guaranteed possible at 100 TB)
    still resolves identically on any engine: the packed key is
    unique because event_id is. One hash aggregate, map-side partials
    (min_by/max_by partials are (value, key) pairs — mergeable), one
    shuffle ∝ distinct (user, hour) buckets, never event volume. No
    window function: a sort-based first/last-value formulation would
    pay a per-partition sort this agg avoids.
    """
    e = table(spark, sf_dir, "events")
    tie = (
        F.unix_micros("ts").cast("decimal(38,0)")
        * F.lit(10_000_000_000).cast("decimal(38,0)")
        + F.col("event_id").cast("decimal(38,0)")
    )
    return (
        e.groupBy("user_id", F.date_trunc("hour", "ts").alias("hr"))
        .agg(
            F.round(F.min_by("value", tie), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", tie), 4).alias("close"),
            F.count("*").alias("n_events"),
        )
        .select(
            "user_id",
            F.date_format("hr", "yyyy-MM-dd HH").alias("bucket"),
            "open",
            "high",
            "low",
            "close",
            "n_events",
        )
    )


@query(
    "q_events_anomaly_mad",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               epoch_us(date_trunc('hour', ts)) // 3600000000 AS hr,
               count(*) AS n
        FROM events GROUP BY event_type, hr
    ),
    med AS (
        SELECT event_type, median(n) AS med FROM hourly GROUP BY event_type
    ),
    dev AS (
        SELECT h.event_type, h.hr, h.n, m.med,
               abs(CAST(h.n AS DOUBLE) - m.med) AS adev
        FROM hourly h JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, median(adev) AS mad FROM dev GROUP BY event_type
    )
    SELECT d.event_type, d.hr,
           CAST(d.n AS BIGINT) AS n_events,
           round(d.med, 4) AS med,
           round(m.mad, 4) AS mad,
           CASE WHEN m.mad > 0 THEN
               round(0.6745 * (CAST(d.n AS DOUBLE) - d.med) / m.mad, 4) + 0.0
           END AS modified_z,
           coalesce(abs(0.6745 * (CAST(d.n AS DOUBLE) - d.med) / m.mad) > 3.5
                    AND m.mad > 0, FALSE) AS is_anomaly
    FROM dev d JOIN mad m USING (event_type)
    """,
)
def q_events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (median/MAD) volume-anomaly twin of ``q_events_anomaly``:
    the modified z-score ``0.6745·(n − median)/MAD`` per event type —
    the estimator of choice when the baseline itself contains the
    outliers a mean/stddev z-score would absorb (one crawler-outage
    hour inflates a stddev by orders of magnitude; it moves a median
    by at most one rank).

    Determinism: the inputs to every median are exact integers
    (hourly counts) or exact half-integers (|n − median| where the
    median of integers interpolates at most one half) — both engines'
    rank-interpolated median then lands on the same double, and the
    final score is one shared double expression rounded once
    (signed zero normalized). Scale shape: events collapse to
    (type, hour) counts first (map-side partials; cardinality is
    calendar-bounded), then two tiny per-type aggregates join back —
    no window over the raw stream, no collect.
    """
    from frafka_spark.functions.determinism import round_z

    e = table(spark, sf_dir, "events")
    hourly = (
        e.select(
            "event_type",
            (F.unix_micros(F.date_trunc("hour", "ts")) / 3_600_000_000)
            .cast("bigint")
            .alias("hr"),
        )
        .groupBy("event_type", "hr")
        .agg(F.count("*").alias("n"))
    )
    med = hourly.groupBy("event_type").agg(F.median("n").alias("med"))
    dev = hourly.join(med, "event_type").withColumn(
        "adev", F.abs(F.col("n").cast("double") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(F.median("adev").alias("mad"))
    # Guard the division itself, not just the output columns: under
    # ANSI mode an unguarded /0 raises even when a CASE discards the
    # row's result (bitten at sf0.001, where a type's hourly counts
    # are all equal and MAD is exactly 0).
    mz = F.when(
        F.col("mad") > 0,
        F.lit(0.6745)
        * (F.col("n").cast("double") - F.col("med"))
        / F.col("mad"),
    )
    return (
        dev.join(mad, "event_type")
        .select(
            "event_type",
            "hr",
            F.col("n").cast("bigint").alias("n_events"),
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            round_z(mz, 4).alias("modified_z"),
            F.coalesce(F.abs(mz) > 3.5, F.lit(False)).alias("is_anomaly"),
        )
    )


@query(
    "q_events_transitions",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    pairs AS (
        SELECT prev_type, event_type, count(*) AS n
        FROM ordered WHERE prev_type IS NOT NULL
        GROUP BY prev_type, event_type
    )
    SELECT prev_type, event_type, n,
           floor(CAST(n AS DOUBLE)
                 / sum(n) OVER (PARTITION BY prev_type)
                 * 10000.0 + 0.5) / 10000.0 AS p
    FROM pairs
    """,
)
def q_events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: P(next event type | current event type) — the
    behavioral-model / next-action-prediction primitive, and the
    sanity check a sessionization pipeline runs (a transition that
    "can't happen" showing mass = instrumentation bug).

    Per-user ``lag`` runs under a (user_id)-partitioned window —
    distributed state, ordered by (ts, event_id) so ties are
    deterministic; the stream then collapses to a ≤types² pair count
    (map-side partials). The normalizing row-sum window runs over
    that ≤types²-row frame — trivially small at any event volume.
    The probability is one exact-integer division rounded once.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            "user_id",
            "event_type",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count("*").alias("n"))
    )
    w_norm = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "event_type",
        "n",
        half_up(
            F.col("n").cast("double") / F.sum("n").over(w_norm), 4
        ).alias("p"),
    )


@query(
    "q_events_winsorize",
    oracle=f"""
    WITH cuts AS (
        SELECT event_type,
               quantile_cont(value, 0.01) AS p01,
               quantile_cont(value, 0.99) AS p99
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           count(*) AS n,
           CAST(sum(CASE WHEN e.value < c.p01 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clip_low,
           CAST(sum(CASE WHEN e.value > c.p99 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clip_high,
           {sql_dec_avg('e.value')} AS mean_raw,
           {sql_dec_avg('least(greatest(e.value, c.p01), c.p99)')}
               AS mean_winsorized
    FROM events e JOIN cuts c USING (event_type)
    GROUP BY e.event_type
    """,
)
def q_events_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized means: clip each event type's values at its own
    [p01, p99] and report the clipped-tail counts plus the mean
    before/after — the outlier-robust preprocessing step (sensor
    glitches, retry storms) run before any mean-based KPI is trusted.

    Two aggregates over the same hash layout: the per-type cut points
    (exact interpolated percentiles — the ``q_agg_percentile``
    cross-engine parity), joined back on event_type (co-partitioned
    with the first aggregate's output — AQE reuses the exchange; at
    fixture scale the 3-row cuts side may broadcast, a data-driven
    downgrade that's also fine), then the winsorized re-aggregate.
    ``least(greatest(v,p01),p99)`` is pure double comparison — no
    arithmetic, so no new float error — and both means accumulate in
    the exact decimal sum.
    """
    e = table(spark, sf_dir, "events")
    cuts = e.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.01)).alias("p01"),
        F.percentile("value", F.lit(0.99)).alias("p99"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
    return (
        e.join(cuts, "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("value") < F.col("p01")).cast("long")).alias(
                "n_clip_low"
            ),
            F.sum((F.col("value") > F.col("p99")).cast("long")).alias(
                "n_clip_high"
            ),
            dec_avg("value", "mean_raw"),
            dec_avg(clipped, "mean_winsorized"),
        )
    )


@query(
    "q_events_funnel_latency",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t0 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t1
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'click' AND e.ts >= v.t0
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN c ON c.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.t1
        GROUP BY e.user_id
    ),
    gaps AS (
        SELECT '1_view_to_click' AS step,
               epoch_us(c.t1) - epoch_us(v.t0) AS gap_us
        FROM v JOIN c USING (user_id)
        UNION ALL
        SELECT '2_click_to_purchase',
               epoch_us(p.t2) - epoch_us(c.t1)
        FROM c JOIN p USING (user_id)
    )
    SELECT step, count(*) AS n_users,
           floor(quantile_cont(gap_us, 0.5) / 1e6 * 10000.0 + 0.5)
               / 10000.0 AS median_s,
           floor(quantile_cont(gap_us, 0.9) / 1e6 * 10000.0 + 0.5)
               / 10000.0 AS p90_s
    FROM gaps GROUP BY step
    """,
)
def q_events_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel step latency: how long converting users take between
    stages (first view → first subsequent click → first subsequent
    purchase), as median/p90 seconds per step — the companion to
    ``q_events_funnel``'s conversion counts that tells you WHERE the
    funnel is slow, not just where it leaks.

    Reuses the funnel's per-user stage timestamps
    (``funnel_user_stages`` — one events scan, one user_id exchange,
    no window sort anywhere), diffs them as exact integer
    microseconds, and rank-interpolates percentiles from those exact
    integers (the ``q_events_inter_arrival`` cross-engine parity).
    Both steps' gaps come off the SAME per-user row via ``stack`` —
    ``_t1`` non-null implies ``_t0`` non-null (the chain nulls
    propagate), so dropping null gaps is exactly the former
    stage-join membership and no union branch re-executes the chain
    (the former form re-ran the shared stage prefix on both
    branches — 8 events scans in the plan, now 1; guide §2.4).
    Per-step state is the step's gap list — bounded by converting
    users, not events.
    """
    e = table(spark, sf_dir, "events")
    pu = funnel_user_stages(e)
    gaps = pu.select(
        F.expr(
            "stack(2,"
            " '1_view_to_click', unix_micros(_t1) - unix_micros(_t0),"
            " '2_click_to_purchase', unix_micros(_t2) - unix_micros(_t1))"
            " AS (step, gap_us)"
        )
    ).filter(F.col("gap_us").isNotNull())
    pcts = F.percentile("gap_us", F.array(F.lit(0.5), F.lit(0.9)))
    return (
        gaps.groupBy("step")
        .agg(F.count("*").alias("n_users"), pcts.alias("_p"))
        .select(
            "step",
            "n_users",
            half_up(F.col("_p")[0] / 1e6, 4).alias("median_s"),
            half_up(F.col("_p")[1] / 1e6, 4).alias("p90_s"),
        )
    )


@query(
    "q_events_pareto",
    oracle="""
    WITH per_user AS (
        SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ),
    ranked AS (
        SELECT n,
               row_number() OVER (ORDER BY n DESC, user_id ASC) AS rn,
               count(*) OVER () AS n_users
        FROM per_user
    ),
    deciles AS (
        SELECT CAST((rn - 1) * 10 // n_users + 1 AS BIGINT) AS user_decile,
               count(*) AS n_users,
               CAST(sum(n) AS BIGINT) AS n_events
        FROM ranked GROUP BY user_decile
    )
    SELECT user_decile, n_users, n_events,
           floor(CAST(sum(n_events) OVER (
                     ORDER BY user_decile
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS DOUBLE)
                 / sum(n_events) OVER () * 10000.0 + 0.5) / 10000.0
               AS cum_share
    FROM deciles
    """,
)
def q_events_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity concentration (Pareto curve): rank users by event
    volume, bucket into deciles, report each decile's event mass and
    the cumulative share — "the top 10% of users generate X% of
    traffic", the skew diagnosis that decides whether per-user keys
    need salting.

    The rank comes from the range-partitioned row-number helper (no
    single-task sort over the per-user relation, which at 100 TB is
    itself large); the decile derives arithmetically from rank — the
    ``q_llm_length_deciles`` closed form; the cumulative window then
    runs over exactly 10 rows. Integer event counts make every share
    one exact division, rounded once.
    """
    from frafka_spark.operators.windows import range_partitioned_row_number

    per_user = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    ranked = range_partitioned_row_number(
        per_user,
        [F.col("n").desc(), F.col("user_id").asc()],
        out="rn",
        total="n_users",
        memo=(spark, sf_dir, "pareto_ranked"),
    )
    decile = ((F.col("rn") - 1) * 10 / F.col("n_users")).cast("bigint") + 1
    deciles = ranked.groupBy(decile.alias("user_decile")).agg(
        F.count("*").alias("n_users"), F.sum("n").alias("n_events")
    )
    w_cum = Window.orderBy("user_decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.orderBy("user_decile").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return deciles.select(
        "user_decile",
        "n_users",
        "n_events",
        half_up(
            F.sum("n_events").over(w_cum).cast("double")
            / F.sum("n_events").over(w_all),
            4,
        ).alias("cum_share"),
    )


@query(
    "q_events_active_days",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT)
                   AS n_active_days
        FROM events GROUP BY user_id
    )
    SELECT n_active_days, count(*) AS n_users
    FROM per_user
    GROUP BY n_active_days
    """,
)
def q_events_active_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement-depth histogram: how many users were active on
    exactly N distinct days — the retention-adjacent distribution
    behind DAU/MAU decomposition and cohort-quality scoring.

    Two-level aggregate: events collapse to DISTINCT (user, day)
    pairs first (map-side partial dedup bounds the shuffle by pairs,
    not events — the `q_events_rolling_actives` discipline), then a
    per-user count, then a ≤days-sized histogram. All integers; no
    window, no join.
    """
    e = table(spark, sf_dir, "events")
    per_user = (
        e.select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("n_active_days"))
    )
    return per_user.groupBy("n_active_days").agg(
        F.count("*").alias("n_users")
    )


@query(
    "q_events_weekday_profile",
    oracle="""
    WITH counts AS (
        SELECT event_type,
               CAST(isodow(ts) AS INT) AS dow,
               count(*) AS n
        FROM events GROUP BY event_type, dow
    )
    SELECT event_type, dow, n,
           floor(CAST(n AS DOUBLE)
                 / (sum(n) OVER (PARTITION BY event_type) / 7.0)
                 * 10000.0 + 0.5) / 10000.0 AS vs_flat
    FROM counts
    """,
)
def q_events_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday seasonality profile: each event type's volume per ISO
    weekday as a ratio against a flat week (1.0 = no seasonality) —
    the traffic-shape fingerprint that distinguishes human activity
    (weekday-heavy) from bot/batch traffic (flat or cron-spiked),
    and the input to any day-of-week-corrected anomaly baseline.

    Events collapse to a ≤types×7 count relation (map-side partials);
    the normalizing window runs over that tiny frame. ISO weekday
    (Mon=1..Sun=7) is used because the two engines agree on it —
    DuckDB's ``dayofweek`` is 0-based Sunday while Spark's is
    1-based Sunday, a classic cross-engine trap this declaration
    documents by construction.
    """
    e = table(spark, sf_dir, "events")
    counts = (
        e.select("event_type", F.dayofweek("ts").alias("_dow_sun1"))
        # Spark dayofweek: Sun=1..Sat=7 → ISO Mon=1..Sun=7
        .select(
            "event_type",
            F.when(F.col("_dow_sun1") == 1, 7)
            .otherwise(F.col("_dow_sun1") - 1)
            .cast("int")
            .alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "dow",
        "n",
        half_up(
            F.col("n").cast("double") / (F.sum("n").over(w) / 7.0), 4
        ).alias("vs_flat"),
    )


@query(
    "q_events_gini",
    oracle="""
    WITH per_user AS (
        SELECT user_id, count(*) AS n FROM events GROUP BY user_id
    ),
    ranked AS (
        SELECT n,
               row_number() OVER (ORDER BY n ASC, user_id ASC) AS rnk,
               count(*) OVER () AS n_users
        FROM per_user
    )
    SELECT CAST(max(n_users) AS BIGINT) AS n_users,
           CAST(sum(n) AS BIGINT) AS n_events,
           floor((CAST(2 * sum(rnk * n) AS DOUBLE)
                 / (max(n_users) * sum(n))
                 - CAST(max(n_users) + 1 AS DOUBLE) / max(n_users))
                 * 10000.0 + 0.5) / 10000.0 AS gini
    FROM ranked
    """,
)
def q_events_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-user event volume — the single-number
    inequality index behind the Pareto curve (0 = perfectly even,
    →1 = one user generates everything), computed by the exact
    rank formula ``G = 2·Σ(rank·x) / (n·Σx) − (n+1)/n`` over counts
    sorted ascending.

    Ranks come from the range-partitioned row-number helper (the
    per-user relation is unbounded at 100 TB — no single-task sort),
    ``Σ rank·x`` is an exact integer sum (rank ≤ users, x = counts —
    products fit BIGINT far beyond any real cardinality), and the
    closed form evaluates once on both engines.
    """
    from frafka_spark.operators.windows import range_partitioned_row_number

    per_user = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    ranked = range_partitioned_row_number(
        per_user,
        [F.col("n").asc(), F.col("user_id").asc()],
        out="rnk",
        memo=(spark, sf_dir, "gini_ranked"),
    )
    return ranked.agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("n").cast("bigint").alias("n_events"),
        half_up(
            (2 * F.sum(F.col("rnk") * F.col("n"))).cast("double")
            / (F.count("*") * F.sum("n"))
            - (F.count("*") + 1).cast("double") / F.count("*"),
            4,
        ).alias("gini"),
    )


@query(
    "q_events_bot_score",
    oracle="""
    WITH ordered AS (
        SELECT user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS gap_us
        FROM events
    ),
    stats AS (
        SELECT user_id,
               count(gap_us) AS n_gaps,
               CAST(sum(gap_us) AS DOUBLE) AS s,
               CAST(sum(CAST(gap_us AS DECIMAL(19,0))
                        * CAST(gap_us AS DECIMAL(19,0))) AS DOUBLE) AS ss
        FROM ordered WHERE gap_us IS NOT NULL
        GROUP BY user_id HAVING count(gap_us) >= 10
    )
    SELECT user_id,
           CAST(n_gaps AS BIGINT) AS n_gaps,
           floor(s / n_gaps / 1e6 * 10000.0 + 0.5) / 10000.0
               AS mean_gap_s,
           floor(CASE WHEN s > 0 THEN
               sqrt(greatest((ss - s * s / n_gaps) / (n_gaps - 1), 0))
               / (s / n_gaps) END * 10000.0 + 0.5) / 10000.0 AS gap_cv,
           coalesce(CASE WHEN s > 0 THEN
               sqrt(greatest((ss - s * s / n_gaps) / (n_gaps - 1), 0))
               / (s / n_gaps) < 0.30 END, FALSE) AS is_bot_like
    FROM stats
    """,
)
def q_events_bot_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot-likeness score: the coefficient of variation of each user's
    inter-event gaps — humans are bursty (CV ≈ 1 for Poisson, higher
    with sessions), schedulers are metronomes (CV → 0). The standard
    first-pass automation filter a data pipeline runs before
    treating event counts as engagement.

    Gaps are exact integer microseconds from a per-user lag (ordered
    by (ts, event_id) — tie-deterministic); variance derives from
    exact Σgap and Σgap² (BIGINT sums cast once — the
    ``q_events_anomaly`` discipline, never stddev_samp's fold), with
    the textbook numerator clamped at zero before the sqrt (a
    constant-gap user's exact-zero variance can land a hair negative
    in ONE engine's double evaluation and NaN the sqrt). Users with
    <10 gaps are suppressed (no stable CV from a handful of events).
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    ).alias("gap_us")
    stats = (
        e.select("user_id", gap)
        .filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.sum("gap_us").cast("double").alias("s"),
            # gap² overflows BIGINT (a multi-day gap in µs squared is
            # ~1e22 > 2⁶³): accumulate squares in DECIMAL(38,0) — both
            # engines then round the identical exact integer to double
            F.sum(
                F.col("gap_us").cast("decimal(19,0)")
                * F.col("gap_us").cast("decimal(19,0)")
            )
            .cast("double")
            .alias("ss"),
        )
        .filter(F.col("n_gaps") >= 10)
    )
    mean = F.col("s") / F.col("n_gaps")
    var = F.greatest(
        (F.col("ss") - F.col("s") * F.col("s") / F.col("n_gaps"))
        / (F.col("n_gaps") - 1),
        F.lit(0.0),
    )
    cv = F.when(F.col("s") > 0, F.sqrt(var) / mean)
    return stats.select(
        "user_id",
        F.col("n_gaps").cast("bigint").alias("n_gaps"),
        half_up(mean / 1e6, 4).alias("mean_gap_s"),
        half_up(cv, 4).alias("gap_cv"),
        F.coalesce(cv < 0.30, F.lit(False)).alias("is_bot_like"),
    )


_RFM_SEGMENT_SQL = """CASE
        WHEN r_score = 1 AND f_score <= 2 THEN 'champion'
        WHEN r_score <= 2 AND m_score <= 2 THEN 'loyal_high_value'
        WHEN r_score >= 4 AND f_score <= 2 THEN 'at_risk'
        WHEN r_score >= 4 AND f_score >= 4 THEN 'hibernating'
        ELSE 'regular'
    END"""


@query(
    "q_events_rfm",
    oracle=f"""
    WITH u AS (
        SELECT user_id,
               date_diff('day', max(CAST(ts AS DATE)),
                         (SELECT max(CAST(ts AS DATE)) FROM events))
                   AS recency_days,
               count(*) AS frequency,
               CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS monetary
        FROM events GROUP BY user_id
    ),
    s AS (
        SELECT *,
               CAST(ntile(5) OVER (ORDER BY recency_days, user_id) AS INT)
                   AS r_score,
               CAST(ntile(5) OVER (ORDER BY frequency DESC, user_id) AS INT)
                   AS f_score,
               CAST(ntile(5) OVER (ORDER BY monetary DESC, user_id) AS INT)
                   AS m_score
        FROM u
    )
    SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
           frequency,
           floor(monetary * 10000.0 + 0.5) / 10000.0 AS monetary,
           r_score, f_score, m_score,
           {_RFM_SEGMENT_SQL} AS segment
    FROM s
    """,
)
def q_events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency / frequency / monetary quintiles per
    user, plus a rule-based segment label — the classic lifecycle
    scoring every event warehouse runs (score 1 = best quintile).

    Scale shape: one per-user aggregate collapses event volume to
    O(users); the corpus anchor date is a broadcast 1-row aggregate.
    The three quintile scores are NOT three global ``ntile``
    windows (each would funnel all users through one task) and not
    three ranking passes either: the metrics are MELTED into one
    (user, metric, val) relation — descending metrics negated, so
    every ordering is ASC with the ``user_id`` tiebreak — and ONE
    ``range_partitioned_row_number`` over (metric, val, user_id)
    ranks all three at once. With ``metric`` the leading sort key,
    each metric's block is contiguous in the global rank, so
    rank-within-metric is ``global_rn − block_index·n_users``
    (``n_users = n/3`` rides the helper's total), and ``ntile(5)``
    follows arithmetically — the same distributed-ntile identity
    ``q_win_ntile`` plan-asserts, amortized across three orderings
    for one range exchange instead of three full helper chains
    (measured 3.2 s → ~1 s at sf0.1; at cluster scale it is one
    sort-shuffle of 3·users rows instead of three). The oracle keeps
    the plain-window formulation, so the hash match proves the
    melt+offset identity on all three orderings at once.

    Determinism: ``monetary`` is the order-independent exact decimal
    sum (``dec_sum``) — bitwise identical across engines and
    partition layouts — because it is an ORDERING key here, where a
    last-ulp float difference would flip a quintile boundary, not
    just a rounded digit. The melt casts are exact (counts and day
    deltas are far below 2^53; negation flips a sign bit), so the
    stacked double order IS each metric's native order.
    """
    from frafka_spark.functions.determinism import dec_sum, half_up
    from frafka_spark.operators.windows import range_partitioned_row_number

    e = table(spark, sf_dir, "events")
    anchor = e.agg(F.max(F.to_date("ts")).alias("_anchor"))
    u = (
        e.groupBy("user_id")
        .agg(
            F.max(F.to_date("ts")).alias("_last_day"),
            F.count("*").alias("frequency"),
            dec_sum("value", "monetary"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "user_id",
            F.datediff("_anchor", "_last_day").cast("bigint").alias("recency_days"),
            "frequency",
            "monetary",
        )
    )

    melted = u.select(
        "user_id",
        F.expr(
            """stack(3,
                 'f', CAST(-frequency AS DOUBLE),
                 'm', -monetary,
                 'r', CAST(recency_days AS DOUBLE)) AS (metric, val)"""
        ),
    )
    ranked = range_partitioned_row_number(
        melted,
        ["metric", "val", "user_id"],
        out="_rn",
        total="_n",
        memo=(spark, sf_dir, "rfm_ranked"),
    )
    # blocks are contiguous because 'metric' leads the total order;
    # block indexes follow the metric strings' sort order f < m < r
    bucket = F.expr(
        """CAST(1 + CASE
             WHEN rn <= (n % 5) * (n div 5 + 1)
             THEN (rn - 1) div (n div 5 + 1)
             ELSE (n % 5) + (rn - 1 - (n % 5) * (n div 5 + 1))
                  div (n div 5)
           END AS INT)"""
    )
    scores = (
        ranked.withColumn("n", (F.col("_n") / 3).cast("bigint"))
        .withColumn(
            "rn",
            F.col("_rn")
            - F.when(F.col("metric") == "f", 0)
            .when(F.col("metric") == "m", 1)
            .otherwise(2)
            * F.col("n"),
        )
        .withColumn("score", bucket)
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("metric") == "r", F.col("score"))).alias("r_score"),
            F.max(F.when(F.col("metric") == "f", F.col("score"))).alias("f_score"),
            F.max(F.when(F.col("metric") == "m", F.col("score"))).alias("m_score"),
        )
    )
    return u.join(scores, "user_id").select(
        "user_id",
        "recency_days",
        "frequency",
        half_up("monetary", 4).alias("monetary"),
        "r_score",
        "f_score",
        "m_score",
        F.expr(_RFM_SEGMENT_SQL).alias("segment"),
    )


@query(
    "q_events_stickiness",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    dau AS (SELECT d, count(*) AS dau FROM pairs GROUP BY d),
    mau AS (
        SELECT t, count(DISTINCT user_id) AS mau30
        FROM (SELECT user_id, d + CAST(k AS INTEGER) AS t
              FROM pairs, (SELECT unnest(generate_series(0, 29)) AS k))
        GROUP BY t
    )
    SELECT CAST(dau.d AS VARCHAR) AS day, dau.dau,
           mau.mau30,
           floor(dau.dau / CAST(mau.mau30 AS DOUBLE) * 10000.0 + 0.5)
               / 10000.0 AS stickiness
    FROM dau JOIN mau ON mau.t = dau.d
    """,
)
def q_events_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/MAU(30) stickiness per day — the product-health ratio
    (what share of the trailing month's actives showed up today).

    Same interval-engine idea as ``q_events_rolling_actives`` at day
    granularity, in a SINGLE pass: collapse events to distinct
    (user, day) pairs FIRST (shuffle ∝ user-days, not events), then
    each pair votes into the ≤30 future days whose trailing window
    contains it — an explode bounded by pairs×30, never events×30.
    One (user, target-day) aggregate dedups the votes while keeping
    an ``is_today`` flag (offset-0 vote present), and one narrow
    (target-day) aggregate then yields BOTH counts — ``mau30`` as
    ``count(*)``, ``dau`` as ``count_if(is_today)`` — so the plan is
    two keyed exchanges and no join (the earlier dau⋈mau twin-branch
    formulation scanned and deduped the pairs twice; measured
    0.82 s → 0.5 s at sf0.1). Days reported are days with ≥1 event
    (``dau > 0``), exactly the oracle's inner join.
    """
    e = table(spark, sf_dir, "events")
    pairs = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    votes = pairs.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(29))).alias("k"),
        "d",
    ).select("user_id", F.date_add("d", F.col("k")).alias("t"), (F.col("k") == 0).alias("is_today"))
    per_user_day = votes.groupBy("user_id", "t").agg(
        F.max("is_today").alias("is_today")
    )
    return (
        per_user_day.groupBy("t")
        .agg(
            F.count(F.when(F.col("is_today"), F.lit(1))).alias("dau"),
            F.count(F.lit(1)).alias("mau30"),
        )
        .filter(F.col("dau") > 0)
        .select(
            F.col("t").cast("string").alias("day"),
            "dau",
            "mau30",
            half_up(F.col("dau") / F.col("mau30").cast("double"), 4).alias(
                "stickiness"
            ),
        )
    )


@query(
    "q_events_topk_hourly",
    oracle="""
    WITH counts AS (
        SELECT date_trunc('hour', ts) AS hr, event_type, count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    ranked AS (
        SELECT CAST(hr AS VARCHAR) AS hour, event_type, n,
               CAST(row_number() OVER (PARTITION BY hr
                                       ORDER BY n DESC, event_type) AS INT)
                   AS rnk
        FROM counts
    )
    SELECT hour, event_type, n, rnk FROM ranked WHERE rnk <= 3
    """,
)
def q_events_topk_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per hour — the trending/leaderboard shape
    every event dashboard serves.

    Aggregate FIRST, rank SECOND: the window runs over the (hour,
    type) count relation — at most |types| rows per partition — never
    over raw events, so the ranking state is bounded by the type
    cardinality no matter the event volume, and the count aggregate
    partial-combines map-side. `event_type` tiebreak makes equal
    counts deterministic.
    """
    e = table(spark, sf_dir, "events")
    counts = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hr"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("hr").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= 3)
        .select(
            F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
            "n",
            "rnk",
        )
    )


@query(
    "q_events_growth_accounting",
    oracle="""
    WITH pairs AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    marked AS (
        SELECT user_id, day,
               min(day) OVER (PARTITION BY user_id) AS first_day,
               lag(day)  OVER w AS prev_day,
               lead(day) OVER w AS next_day,
               max(day) OVER () AS last_corpus_day
        FROM pairs
        WINDOW w AS (PARTITION BY user_id ORDER BY day)
    ),
    states AS (
        SELECT strftime(day, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS n_active,
               CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new,
               CAST(sum(CASE WHEN prev_day = day - 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_retained,
               CAST(sum(CASE WHEN day <> first_day
                              AND (prev_day IS NULL OR prev_day < day - 1)
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        FROM marked GROUP BY day
    ),
    churn AS (
        SELECT strftime(day + 1, '%Y-%m-%d') AS day,
               CAST(count(*) AS BIGINT) AS n_churned
        FROM marked
        WHERE day < last_corpus_day
          AND (next_day IS NULL OR next_day > day + 1)
        GROUP BY day + 1
    )
    SELECT s.day, s.n_active, s.n_new, s.n_retained, s.n_resurrected,
           coalesce(c.n_churned, 0) AS n_churned
    FROM states s LEFT JOIN churn c USING (day)
    """,
)
def q_events_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: each day's active users split into NEW
    (first-ever day), RETAINED (also active yesterday), RESURRECTED
    (returning after a gap), plus the day's CHURNED count (active
    yesterday, absent today) — the standard DAU decomposition
    (new + retained + resurrected = active, an identity the
    differential enforces on every row) that product analytics teams
    read before any other growth metric.

    Scale shape: one DISTINCT collapses events to (user, day) pairs
    (shuffle ∝ pairs, not events); every window is PARTITIONED BY
    user (lag/lead/min ride one sort within the user's hash
    partition — no global window); the per-day rollups are hash
    aggregates with map-side partials; churn attributes each exit to
    the day AFTER the last active day via the same lead() pass, then
    joins back on the (bounded) day dimension. The one global max
    (corpus end, to avoid charging churn past the observation
    window) is a broadcast 1-row aggregate.
    """
    e = table(spark, sf_dir, "events")
    pairs = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    last_day = pairs.agg(F.max("day").alias("last_corpus_day"))
    marked = (
        pairs.select(
            "user_id",
            "day",
            F.min("day").over(Window.partitionBy("user_id")).alias("first_day"),
            F.lag("day").over(w).alias("prev_day"),
            F.lead("day").over(w).alias("next_day"),
        )
        .crossJoin(F.broadcast(last_day))
    )
    states = marked.groupBy(
        F.date_format("day", "yyyy-MM-dd").alias("day")
    ).agg(
        F.count("*").alias("n_active"),
        F.sum(
            F.when(F.col("day") == F.col("first_day"), 1).otherwise(0)
        ).alias("n_new"),
        F.sum(
            F.when(F.col("prev_day") == F.date_sub("day", 1), 1).otherwise(0)
        ).alias("n_retained"),
        F.sum(
            F.when(
                (F.col("day") != F.col("first_day"))
                & (
                    F.col("prev_day").isNull()
                    | (F.col("prev_day") < F.date_sub("day", 1))
                ),
                1,
            ).otherwise(0)
        ).alias("n_resurrected"),
    )
    churn = (
        marked.filter(
            (F.col("day") < F.col("last_corpus_day"))
            & (
                F.col("next_day").isNull()
                | (F.col("next_day") > F.date_add("day", 1))
            )
        )
        .groupBy(
            F.date_format(F.date_add("day", 1), "yyyy-MM-dd").alias("day")
        )
        .agg(F.count("*").alias("n_churned"))
    )
    return (
        states.join(churn, "day", "left")
        .select(
            "day",
            "n_active",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce("n_churned", F.lit(0)).alias("n_churned"),
        )
    )


@query(
    "q_events_attribution",
    oracle="""
    WITH purchases AS (
        SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
        WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT user_id, event_id AS t_id, event_type AS channel, ts AS t_ts
        FROM events WHERE event_type IN ('view', 'click')
    ),
    matched AS (
        SELECT p.p_id, t.channel, t.t_ts, t.t_id,
               count(*) OVER (PARTITION BY p.p_id) AS n_touches,
               row_number() OVER (PARTITION BY p.p_id
                                  ORDER BY t.t_ts, t.t_id) AS rn_first,
               row_number() OVER (PARTITION BY p.p_id
                                  ORDER BY t.t_ts DESC, t.t_id DESC)
                   AS rn_last
        FROM purchases p
        JOIN touches t ON t.user_id = p.user_id
                      AND t.t_ts < p.p_ts
                      AND t.t_ts >= p.p_ts - INTERVAL 24 HOUR
    )
    SELECT channel,
           CAST(sum(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS first_touch,
           CAST(sum(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS last_touch,
           floor(sum(CAST(floor(1000000.0 / n_touches + 0.5) AS BIGINT))
                 / 1000000.0 * 10000.0 + 0.5) / 10000.0 AS linear_credit,
           count(*) AS n_touchpoints
    FROM matched
    GROUP BY channel
    """,
)
def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution: every purchase credits the view/click
    touchpoints the same user generated in the 24 h before it —
    first-touch and last-touch counts plus fractional linear credit
    (1/n per touch, so credits sum to conversions) per channel. The
    marketing-analytics allocation every event warehouse runs, and
    relationally the interesting compound: a PER-CONVERSION lookback
    join + within-conversion ranking + cross-conversion rollup.

    Scale shape: the conversion⋈touch join carries the user_id
    EQUALITY key with the 24 h lookback as residual (per-user fan
    bounded by activity density × window — never all-pairs); both
    ranking windows partition by the conversion id (bounded groups);
    the final rollup is a 2-row hash aggregate. Linear credit does
    NOT sum raw 1/n doubles (a float sum is accumulation-order
    sensitive — the partial-aggregate tree could land a different
    last-ulp than the oracle's): each touch's share is pinned to an
    integer MICRO-CREDIT (``floor(1e6/n + 0.5)`` — identical on both
    engines, n ≤ 10^6 exact), the credits sum as plain longs
    (order-independent, codegen primitive adds — the ``dec_sum``
    discipline), and the display divides once and rounds via the
    explicit half-up.
    """
    from frafka_spark.functions.determinism import half_up

    e = table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("p_ts"),
    )
    touches = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("event_id").alias("t_id"),
        F.col("event_type").alias("channel"),
        F.col("ts").alias("t_ts"),
    )
    matched = purchases.join(
        touches,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 24 HOURS")),
    )
    w_conv = Window.partitionBy("p_id")
    w_first = w_conv.orderBy("t_ts", "t_id")
    w_last = w_conv.orderBy(F.col("t_ts").desc(), F.col("t_id").desc())
    ranked = matched.select(
        "p_id",
        "channel",
        F.count("*").over(w_conv).alias("n_touches"),
        F.row_number().over(w_first).alias("rn_first"),
        F.row_number().over(w_last).alias("rn_last"),
    )
    return ranked.groupBy("channel").agg(
        F.sum(F.when(F.col("rn_first") == 1, 1).otherwise(0)).alias(
            "first_touch"
        ),
        F.sum(F.when(F.col("rn_last") == 1, 1).otherwise(0)).alias(
            "last_touch"
        ),
        half_up(
            F.sum(
                F.floor(F.lit(1e6) / F.col("n_touches") + F.lit(0.5)).cast(
                    "bigint"
                )
            )
            / 1e6,
            4,
        ).alias("linear_credit"),
        F.count("*").alias("n_touchpoints"),
    )


@query(
    "q_events_error_bursts",
    oracle="""
    WITH seq AS (
        SELECT user_id, ts, event_id,
               (event_type = 'error') AS is_err,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    err AS (
        SELECT user_id,
               rn - row_number() OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS grp
        FROM seq WHERE is_err
    ),
    runs AS (
        SELECT user_id, count(*) AS run_len
        FROM err GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(sum(CASE WHEN run_len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bursts,
           CAST(max(run_len) AS BIGINT) AS longest_run,
           CAST(sum(run_len) AS BIGINT) AS n_errors
    FROM runs GROUP BY user_id
    """,
)
def q_events_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands run-length encoding: maximal runs of
    CONSECUTIVE error events in each user's stream (no intervening
    non-error event), reporting run count, bursts (runs ≥ 3 — the
    alerting threshold), longest run, and total errors. The
    MATCH_RECOGNIZE-class sequence operator (A+ pattern) expressed
    relationally with the two-row_number islands identity:
    ``global_rn − within-error_rn`` is constant exactly along each
    maximal error run, so grouping by it reconstitutes the islands
    without any iteration.

    Scale shape: both row_number windows partition by user_id (one
    sort each inside the user's hash partition — the second reuses
    the first's order, so AQE plans one exchange); the island and
    per-user rollups are hash aggregates over ≤events rows with
    map-side partials. Counts are exact integers; the (ts, event_id)
    tiebreak makes run boundaries deterministic under equal
    timestamps on both engines.
    """
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = table(spark, sf_dir, "events").select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "error").alias("is_err"),
        F.row_number().over(w_all).alias("rn"),
    )
    err = seq.filter("is_err").select(
        "user_id",
        (F.col("rn") - F.row_number().over(w_all)).alias("grp"),
    )
    runs = err.groupBy("user_id", "grp").agg(F.count("*").alias("run_len"))
    return runs.groupBy("user_id").agg(
        F.count("*").alias("n_runs"),
        F.sum(F.when(F.col("run_len") >= 3, 1).otherwise(0)).alias("n_bursts"),
        F.max("run_len").alias("longest_run"),
        F.sum("run_len").alias("n_errors"),
    )


@query(
    "q_events_forecast_baseline",
    oracle="""
    WITH hourly AS (
        SELECT CAST(ts AS DATE) AS day, extract(hour FROM ts) AS hr,
               count(*) AS n
        FROM events GROUP BY 1, 2
    ),
    last_day AS (SELECT max(day) AS d FROM hourly),
    pred AS (
        SELECT extract(dow FROM h.day) AS dow, h.hr,
               avg(h.n) AS yhat
        FROM hourly h, last_day WHERE h.day < d
        GROUP BY 1, 2
    ),
    actual AS (
        SELECT h.hr, h.n, extract(dow FROM h.day) AS dow
        FROM hourly h, last_day WHERE h.day = d
    )
    SELECT CAST(a.hr AS INT) AS hr,
           a.n AS actual,
           floor(p.yhat * 10000.0 + 0.5) / 10000.0 AS predicted,
           floor(abs(a.n - p.yhat) * 10000.0 + 0.5) / 10000.0 AS abs_err
    FROM actual a JOIN pred p ON p.dow = a.dow AND p.hr = a.hr
    """,
)
def q_events_forecast_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast backtest: hold out the corpus's last
    day, predict each of its hours as the MEAN of the same
    (weekday, hour) cell over the training days, and report per-hour
    actual / predicted / absolute error — the baseline every
    capacity-planning or anomaly pipeline must beat before any model
    earns its keep (and the backtest harness is the operator here:
    temporal split + seasonal profile + held-out join are the same
    three moves at any model complexity).

    Weekday indexing is the documented cross-engine trap
    (``q_events_weekday_profile``): DuckDB ``extract(dow)`` is
    Sunday=0 while Spark ``dayofweek`` is Sunday=1, so the engine
    maps ``dayofweek − 1`` to align the join key. The predicted mean
    divides an exact integer sum by an exact count (identical
    doubles both engines) and displays through the explicit half-up.

    Scale shape: events collapse to (day, hour) counts FIRST (one
    hash aggregate — the only pass over the fact; shuffle ∝
    day×hour cells); the anchor day is a broadcast 1-row max; the
    seasonal profile re-aggregates the tiny cell relation, and the
    held-out join runs on ≤24 rows. At 100 TB the profile costs the
    same as a daily rollup.
    """
    from frafka_spark.functions.determinism import half_up

    e = table(spark, sf_dir, "events")
    hourly = (
        e.select(F.to_date("ts").alias("day"), F.hour("ts").alias("hr"))
        .groupBy("day", "hr")
        .agg(F.count("*").alias("n"))
    )
    last_day = hourly.agg(F.max("day").alias("d"))
    cells = hourly.crossJoin(F.broadcast(last_day))
    dow = F.dayofweek("day") - 1  # align to DuckDB's Sunday=0
    pred = (
        cells.filter(F.col("day") < F.col("d"))
        .groupBy(dow.alias("dow"), "hr")
        .agg(F.avg("n").alias("yhat"))
    )
    actual = cells.filter(F.col("day") == F.col("d")).select(
        F.col("hr").alias("a_hr"), "n", dow.alias("a_dow")
    )
    return actual.join(
        F.broadcast(pred),
        (F.col("dow") == F.col("a_dow")) & (F.col("hr") == F.col("a_hr")),
    ).select(
        F.col("a_hr").cast("int").alias("hr"),
        F.col("n").alias("actual"),
        half_up(F.col("yhat"), 4).alias("predicted"),
        half_up(F.abs(F.col("n") - F.col("yhat")), 4).alias("abs_err"),
    )


@query(
    "q_events_ltv_curve",
    oracle="""
    WITH cohort AS (
        SELECT user_id, min(CAST(ts AS DATE)) AS c_day FROM events
        GROUP BY user_id
    ),
    daily AS (
        SELECT c.c_day,
               date_diff('day', c.c_day, CAST(e.ts AS DATE)) AS offset,
               sum(CAST(e.value AS DECIMAL(38,6))) AS v,
               count(DISTINCT e.user_id) AS n_active
        FROM events e JOIN cohort c USING (user_id)
        GROUP BY 1, 2
    ),
    sized AS (SELECT c_day, count(*) AS cohort_size FROM cohort GROUP BY 1)
    SELECT strftime(d.c_day, '%Y-%m-%d') AS cohort_day,
           CAST(d.offset AS INT) AS day_offset,
           s.cohort_size,
           CAST(d.n_active AS BIGINT) AS n_active,
           floor(CAST(sum(d.v) OVER (PARTITION BY d.c_day ORDER BY d.offset)
                      AS DOUBLE)
                 / s.cohort_size * 10000.0 + 0.5) / 10000.0
               AS cum_value_per_user
    FROM daily d JOIN sized s USING (c_day)
    """,
)
def q_events_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curve: for each acquisition cohort (first-active
    day), cumulative value per cohort member at every day offset —
    the payback-period table every growth team reads next to the
    retention triangle (`q_events_retention` counts WHO returns;
    this accumulates WHAT they're worth).

    Scale shape (r13 rewrite, guide §2.4 one-read): the cohort day
    attaches as a per-user full-partition window min — ONE events
    scan and one user_id exchange, replacing the aggregate-join-back
    that scanned events three times (cohort fed both the join and
    the size aggregate, each reference re-executing its subtree).
    Events then collapse to (cohort_day, offset) cells — value
    summed in exact decimal (order-independent; the partial-
    aggregate discipline), actives as the usual expand-based
    distinct — and the cumulative window runs over the COLLAPSED
    ≤days² relation, partitioned by cohort day (bounded partitions,
    no fact-level window). The cohort-size denominator needs NO
    join and no second pass: every user has an event on their own
    first day, so cohort_size ≡ n_active at offset 0, read from the
    same c_day partition with a full-frame window max (the
    q_events_concurrency discipline) sharing the cumsum's exchange
    and sort. The per-user normalization divides two exact
    quantities and displays through the explicit half-up.
    """
    from frafka_spark.functions.determinism import dec_sum_dec, half_up

    e = table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id")
    tagged = e.select(
        "user_id", F.to_date("ts").alias("day"), "value"
    ).withColumn("c_day", F.min("day").over(w_user))
    # Per-cell sums stay DECIMAL so the cumulative window sum below is
    # exact/order-independent; the double cast happens ONCE after the
    # window, mirroring the oracle's CAST(sum(v) OVER ... AS DOUBLE).
    daily = tagged.select(
        "c_day",
        F.datediff("day", F.col("c_day")).alias("offset"),
        "value",
        "user_id",
    ).groupBy("c_day", "offset").agg(
        dec_sum_dec("value", "v"),
        F.countDistinct("user_id").alias("n_active"),
    )
    w_part = Window.partitionBy("c_day").orderBy("offset")
    w_cum = w_part.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = w_part.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # cohort_size = members whose first day is c_day = distinct users
    # active at their own offset 0 — the (c_day, 0) cell's n_active,
    # which exists for every cohort (min-day membership is witnessed
    # by at least one event on that day).
    cohort_size = F.max(
        F.when(F.col("offset") == 0, F.col("n_active"))
    ).over(w_all)
    return daily.select(
        F.date_format("c_day", "yyyy-MM-dd").alias("cohort_day"),
        F.col("offset").cast("int").alias("day_offset"),
        cohort_size.alias("cohort_size"),
        "n_active",
        half_up(
            F.sum("v").over(w_cum).cast("double") / cohort_size,
            4,
        ).alias("cum_value_per_user"),
    )


@query(
    "q_ts_interpolate",
    oracle=f"""
    WITH actual AS (
        SELECT event_type, date_trunc('minute', ts) AS mi,
               CAST(count(*) AS BIGINT) AS n_events,
               {{DEC_AVG}} AS avg_value
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT min(mi) AS m0, max(mi) AS m1 FROM actual),
    grid AS (
        SELECT t.event_type, m.mi
        FROM (SELECT DISTINCT event_type FROM actual) t,
             (SELECT unnest(generate_series(m0, m1, INTERVAL 1 MINUTE))
                  AS mi FROM bounds) m
    ),
    joined AS (
        SELECT g.event_type, g.mi, a.n_events, a.avg_value,
               CASE WHEN a.avg_value IS NOT NULL THEN g.mi END AS obs_mi
        FROM grid g
        LEFT JOIN actual a ON a.event_type = g.event_type AND a.mi = g.mi
    ),
    filled AS (
        SELECT event_type, mi, n_events, avg_value,
               last_value(avg_value IGNORE NULLS) OVER wp AS pv,
               last_value(obs_mi IGNORE NULLS) OVER wp AS pt,
               first_value(avg_value IGNORE NULLS) OVER wf AS nv,
               first_value(obs_mi IGNORE NULLS) OVER wf AS nt
        FROM joined
        WINDOW wp AS (PARTITION BY event_type ORDER BY mi
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY event_type ORDER BY mi
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type,
           strftime(mi, '%Y-%m-%d %H:%M') AS bucket,
           COALESCE(n_events, 0) AS n_events,
           (avg_value IS NOT NULL) AS is_observed,
           CASE
             WHEN avg_value IS NOT NULL
                 THEN floor(avg_value * 10000.0 + 0.5) / 10000.0
             WHEN pv IS NOT NULL AND nv IS NOT NULL
                 THEN floor((pv + (nv - pv) * (epoch(mi) - epoch(pt))
                                  / (epoch(nt) - epoch(pt)))
                            * 10000.0 + 0.5) / 10000.0
           END AS value_interp
    FROM filled
    """.replace("{DEC_AVG}", sql_dec_avg("value")),
)
def q_ts_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap interpolation on a dense minute grid — the fill
    policy ``q_ts_gapfill`` deliberately does NOT implement (LOCF is
    right for state-like metrics; linear is right for sampled
    continuous signals — sensor readings, rates): every empty minute
    bucket gets ``prev + (next−prev)·Δt/ΔT`` between its neighboring
    observations, exact at the observed endpoints, NULL outside the
    observed range (no extrapolation). The minute grain is chosen
    because this fixture's hourly buckets are dense — a fill
    operator differentially verified only on a grid with real gaps
    is worth having; at sf0.01 ~80% of minute cells interpolate.

    Scale shape (r12 wave 3 — generate gaps from the observations,
    don't join observations onto a pre-built grid): one map-side-
    combined rollup is still the only pass over raw events; then a
    SINGLE lag/lead window over the OBSERVED cells (the sparse
    relation — 37% of the grid at sf0.1) hands every observation its
    predecessor, and each observation emits its own minute plus the
    gap minutes since that predecessor IN-ROW (``sequence`` +
    ``explode``; the last observation per type also emits the
    trailing edge to the global m1, the first inherits the leading
    edge from m0). The previous form materialized the dense
    types×minutes grid, LEFT-joined the observations back onto it,
    and ran TWO opposite-order fill windows over the dense grid —
    three dense-relation passes and a join that this form does not
    have; the interpolation endpoints arrive on the exploded row
    itself (pv/pt from the lag, nv/nt are the emitting row). The
    interpolation weight divides exact integer epoch seconds; the
    endpoints are ``dec_avg`` values (bitwise identical both
    engines — same lag source rows as the old fill windows'), so
    the blend is identical arithmetic and the display rounds
    through the explicit half-up. Events with NULL value do not
    occur in this corpus (asserted by the differential at every
    sf); the dec_avg endpoints are therefore never NULL on an
    observed cell.
    """
    from frafka_spark.functions.determinism import half_up

    e = table(spark, sf_dir, "events")
    actual = e.groupBy(
        "event_type", F.date_trunc("minute", F.col("ts")).alias("mi")
    ).agg(F.count("*").alias("n_events"), dec_avg("value", "avg_value"))
    bounds = actual.agg(F.min("mi").alias("m0"), F.max("mi").alias("m1"))
    one_min = F.expr("INTERVAL 1 MINUTE")
    w = Window.partitionBy("event_type").orderBy("mi")
    aug = actual.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "mi",
        "n_events",
        "avg_value",
        "m0",
        "m1",
        F.lag("mi").over(w).alias("pt"),
        F.lag("avg_value").over(w).alias("pv"),
        F.lead("mi").over(w).isNull().alias("is_last"),
    )
    # Gap minutes strictly between the previous observation (or the
    # global m0 before the first) and this one; the trailing edge
    # after the last observation runs to the global m1. CaseWhen
    # evaluates branches lazily per row, so sequence() never sees a
    # start > stop pair.
    gap_start = F.coalesce(F.col("pt") + one_min, F.col("m0"))
    gap_end = F.col("mi") - one_min
    # Empty array typed exactly like the sequences (ts may be NTZ —
    # a literal cast would have to guess the timestamp flavor).
    empty = F.slice(F.sequence(F.col("mi"), F.col("mi"), one_min), 1, 0)
    gap_arr = F.when(
        gap_start <= gap_end, F.sequence(gap_start, gap_end, one_min)
    ).otherwise(empty)
    tail_arr = F.when(
        F.col("is_last") & (F.col("mi") < F.col("m1")),
        F.sequence(F.col("mi") + one_min, F.col("m1"), one_min),
    ).otherwise(empty)

    def tag(arr, kind: int):
        return F.transform(
            arr,
            lambda m: F.struct(
                m.alias("g_mi"), F.lit(kind).alias("kind")
            ),
        )

    cells = F.concat(
        tag(gap_arr, 0),
        F.array(
            F.struct(F.col("mi").alias("g_mi"), F.lit(1).alias("kind"))
        ),
        tag(tail_arr, 2),
    )
    ex = aug.select(
        "event_type",
        "mi",
        "n_events",
        "avg_value",
        "pt",
        "pv",
        F.explode(cells).alias("c"),
    )
    t = F.unix_timestamp(F.col("c.g_mi")).cast("double")
    pt = F.unix_timestamp("pt").cast("double")
    nt = F.unix_timestamp("mi").cast("double")
    interp = (
        F.col("pv")
        + (F.col("avg_value") - F.col("pv")) * (t - pt) / (nt - pt)
    )
    is_obs = F.col("c.kind") == 1
    return ex.select(
        "event_type",
        F.date_format("c.g_mi", "yyyy-MM-dd HH:mm").alias("bucket"),
        F.when(is_obs, F.col("n_events")).otherwise(F.lit(0)).alias(
            "n_events"
        ),
        is_obs.alias("is_observed"),
        F.when(is_obs, half_up(F.col("avg_value"), 4))
        .when(
            (F.col("c.kind") == 0) & F.col("pv").isNotNull(),
            half_up(interp, 4),
        )
        .alias("value_interp"),
    )


@query(
    "q_events_concurrency",
    oracle="""
    WITH bounds AS (
        SELECT event_type, ts AS t, 1 AS delta FROM events
        UNION ALL
        SELECT event_type, ts + INTERVAL 300 SECOND, -1 FROM events
    ),
    swept AS (
        SELECT event_type, t,
               sum(delta) OVER (PARTITION BY event_type
                                ORDER BY t, delta
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS live
        FROM bounds
    ),
    peak AS (
        SELECT event_type, max(live) AS peak_concurrency FROM swept
        GROUP BY event_type
    )
    SELECT s.event_type,
           CAST(p.peak_concurrency AS BIGINT) AS peak_concurrency,
           strftime(min(s.t), '%Y-%m-%d %H:%M:%S') AS first_peak_at
    FROM swept s JOIN peak p
      ON p.event_type = s.event_type AND s.live = p.peak_concurrency
    GROUP BY s.event_type, p.peak_concurrency
    """,
)
def q_events_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency via the sweep line: each event opens a 5-minute
    activity interval ``[ts, ts+300 s)``; interval starts emit +1,
    ends emit −1, a running sum over the boundary sequence counts
    live intervals, and its maximum (plus the first instant it is
    reached) is the per-type peak — the interval-overlap operator
    behind "max concurrent sessions/connections/viewers", which no
    relational builtin expresses directly. Half-open semantics are
    encoded IN THE SORT: at an equal timestamp the −1 boundary
    orders before the +1 (``ORDER BY t, delta``), so an interval
    ending exactly when another starts never counts as overlap —
    identical tie handling on both engines by construction.

    Scale shape: the boundary explode is a 2× union of the events
    scan; the sweep is ONE cumulative window partitioned by
    event_type (each type's boundary stream sorts within its hash
    partition — no global sweep, the standard parallelization of
    sweep lines by independent partitions); the per-type peak is a
    FULL-PARTITION max window over the SAME partitioning — one more
    O(n) pass on data already sorted in place, no extra exchange —
    and the first-peak-time resolves with a filter + per-type
    aggregate. The r12 wave-3 form: the original aggregate-then-
    join-back made Catalyst re-execute the whole swept subtree
    (2× events scan + exchange + sort + window) on BOTH join
    children — trees, not DAGs. Counts are exact integers
    end-to-end.
    """
    e = table(spark, sf_dir, "events").select("event_type", "ts")
    bounds = e.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        e.select(
            "event_type",
            (F.col("ts") + F.expr("INTERVAL 300 SECONDS")).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    w_sweep = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Full-partition frame (NOT a shrinking/growing frame): Spark
    # evaluates an unbounded-both-ends max in one linear pass per
    # partition, and the spec shares w_sweep's partitioning, so both
    # windows ride one Exchange + one Sort.
    w_peak = Window.partitionBy("event_type")
    swept = bounds.select(
        "event_type",
        "t",
        F.sum("delta").over(w_sweep).alias("live"),
    ).withColumn("peak_concurrency", F.max("live").over(w_peak))
    return (
        swept.filter(F.col("live") == F.col("peak_concurrency"))
        .groupBy("event_type", "peak_concurrency")
        .agg(
            F.date_format(F.min("t"), "yyyy-MM-dd HH:mm:ss").alias(
                "first_peak_at"
            )
        )
        .select("event_type", "peak_concurrency", "first_peak_at")
    )


@query(
    "q_events_active_time",
    oracle="""
    WITH iv AS (
        SELECT user_id, ts AS s, ts + INTERVAL 300 SECOND AS e
        FROM events
    ),
    marked AS (
        SELECT user_id, s, e,
               CASE WHEN s > coalesce(max(e) OVER (
                        PARTITION BY user_id ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING),
                        TIMESTAMP '1900-01-01 00:00:00')
                    THEN 1 ELSE 0 END AS new_island
        FROM iv
    ),
    islands AS (
        SELECT user_id, s, e,
               sum(new_island) OVER (PARTITION BY user_id
                                     ORDER BY s, e
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND CURRENT ROW) AS island
        FROM marked
    ),
    merged AS (
        SELECT user_id, island, min(s) AS m_start, max(e) AS m_end
        FROM islands GROUP BY user_id, island
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(epoch_us(m_end) - epoch_us(m_start)) // 1000000
                AS BIGINT) AS active_seconds,
           CAST(max(epoch_us(m_end) - epoch_us(m_start)) // 1000000
                AS BIGINT) AS longest_session_seconds
    FROM merged GROUP BY user_id
    """,
)
def q_events_active_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval union (merge-overlapping): each event opens a 5-minute
    activity interval; overlapping/touching intervals per user merge
    into maximal sessions, and the user's TOTAL active seconds is
    the union's measure — the billing/uptime operator ("time spent",
    "minutes watched") that naive per-event sums overcount wherever
    activity overlaps. The dual of `q_events_concurrency`'s sweep:
    same intervals, union length instead of overlap depth.

    The merge is the running-max islands identity: an interval
    starts a NEW session iff its start exceeds the running max end
    of every earlier interval (window ordered by (start, end),
    frame ending 1 PRECEDING — the current row must not see itself);
    the island id is the running sum of those flags, and min/max
    per island reconstitute the merged spans. Touching endpoints
    (start == previous end) merge — half-open adjacency counts as
    continuity here, the billing convention.

    Scale shape: both windows partition by user_id (sorting each
    user's intervals within its hash partition, one exchange serves
    both), then two hash aggregates with map-side partials. All
    arithmetic is integer microseconds — exact on both engines.
    """
    e = table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 300 SECONDS")).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = iv.withColumn(
        "new_island",
        F.when(
            F.col("s")
            > F.coalesce(
                F.max("e").over(w_prev),
                F.lit("1900-01-01").cast("timestamp"),
            ),
            1,
        ).otherwise(0),
    )
    islands = marked.withColumn("island", F.sum("new_island").over(w_run))
    merged = islands.groupBy("user_id", "island").agg(
        F.min("s").alias("m_start"), F.max("e").alias("m_end")
    )
    dur_us = F.unix_micros("m_end") - F.unix_micros("m_start")
    return merged.groupBy("user_id").agg(
        F.count("*").alias("n_sessions"),
        F.floor(F.sum(dur_us) / F.lit(1_000_000))
        .cast("bigint")
        .alias("active_seconds"),
        F.floor(F.max(dur_us) / F.lit(1_000_000))
        .cast("bigint")
        .alias("longest_session_seconds"),
    )


@query(
    "q_events_changepoint",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, day
    ),
    tot AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS d_days,
               CAST(sum(n) AS BIGINT) AS t_events
        FROM daily GROUP BY event_type
    ),
    resid AS (
        SELECT d.event_type, d.day, d.n, t.d_days, t.t_events,
               t.d_days * d.n - t.t_events AS r
        FROM daily d JOIN tot t USING (event_type)
    ),
    cum AS (
        SELECT event_type, day, n, d_days, t_events,
               sum(r) OVER (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS c
        FROM resid
    ),
    cus AS (
        SELECT event_type, day, n, d_days, t_events,
               c - least(0, min(c) OVER w) AS s_up,
               greatest(0, max(c) OVER w) - c AS s_dn
        FROM cum
        WINDOW w AS (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    ranked AS (
        SELECT event_type, day, d_days, t_events, s_up, s_dn,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY s_up DESC, day ASC) AS rk_up,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY s_dn DESC, day ASC) AS rk_dn
        FROM cus
    )
    SELECT up.event_type,
           CAST(up.day AS BIGINT) AS up_peak_day,
           CAST(up.s_up AS BIGINT) AS up_cusum,
           (floor(CAST(up.s_up AS DOUBLE)
                  / (up.d_days * up.t_events) * 1000000.0 + 0.5)
            / 1000000.0) AS up_shift_frac,
           CAST(dn.day AS BIGINT) AS down_peak_day,
           CAST(dn.s_dn AS BIGINT) AS down_cusum,
           (floor(CAST(dn.s_dn AS DOUBLE)
                  / (dn.d_days * dn.t_events) * 1000000.0 + 0.5)
            / 1000000.0) AS down_shift_frac
    FROM ranked up
    JOIN ranked dn
      ON dn.event_type = up.event_type AND dn.rk_dn = 1
    WHERE up.rk_up = 1
    """,
)
def q_events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM mean-shift detection on daily event volume, per event
    type: the "when did traffic change" primitive behind crawler
    regression triage and data-freshness monitoring. For each type,
    both one-sided CUSUM statistics (upward and downward shift) are
    computed over the day-indexed count series and the argmax day of
    each — the most likely changepoint — is reported with the peak
    statistic and a normalized shift fraction.

    The textbook CUSUM is a recursion (``S_t = max(0, S_{t-1} +
    r_t)``), which looks stream-only; the closed form ``S_t = C_t −
    min(0, min_{j≤t} C_j)`` (cumulative sum minus its running
    minimum) turns it into two plain windowed aggregates — the same
    running-extreme identity as ``q_events_drawdown``, so Spark plans
    it with one keyed sort, no iteration. The downward statistic is
    the mirror image (running max minus current).

    Determinism is integer-exact end to end: residuals are scaled to
    ``D·n_t − T`` (day count times daily count minus total — integer,
    sums to zero over the series), so cumulative sums, running
    extrema, CUSUM peaks, and the argmax tiebreak (peak desc, day
    asc) involve no floats; the only division is the final display
    fraction, pinned half-up on both engines.

    Scale shape: the raw stream collapses to (type, day) counts with
    map-side partials first — every later relation is calendar-
    bounded (days × types), so the keyed windows and the top-1
    row_number are negligible regardless of event volume. Day is an
    integer epoch index: no timestamp rendering or timezone in the
    result.
    """
    from frafka_spark.functions.determinism import half_up

    e = table(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.unix_date(F.to_date("ts")).cast("bigint").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n"))
    )
    tot = daily.groupBy("event_type").agg(
        F.count("*").alias("d_days"), F.sum("n").alias("t_events")
    )
    resid = daily.join(tot, "event_type").withColumn(
        "r", F.col("d_days") * F.col("n") - F.col("t_events")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = resid.withColumn("c", F.sum("r").over(w))
    cus = cum.select(
        "event_type",
        "day",
        "d_days",
        "t_events",
        (F.col("c") - F.least(F.lit(0).cast("bigint"), F.min("c").over(w))).alias(
            "s_up"
        ),
        (F.greatest(F.lit(0).cast("bigint"), F.max("c").over(w)) - F.col("c")).alias(
            "s_dn"
        ),
    )
    w_up = Window.partitionBy("event_type").orderBy(
        F.col("s_up").desc(), F.col("day").asc()
    )
    w_dn = Window.partitionBy("event_type").orderBy(
        F.col("s_dn").desc(), F.col("day").asc()
    )
    ranked = cus.select(
        "event_type",
        "day",
        "d_days",
        "t_events",
        "s_up",
        "s_dn",
        F.row_number().over(w_up).alias("rk_up"),
        F.row_number().over(w_dn).alias("rk_dn"),
    )
    up = ranked.filter(F.col("rk_up") == 1).select(
        "event_type",
        F.col("day").alias("up_peak_day"),
        F.col("s_up").alias("up_cusum"),
        half_up(
            F.col("s_up").cast("double") / (F.col("d_days") * F.col("t_events")), 6
        ).alias("up_shift_frac"),
    )
    dn = ranked.filter(F.col("rk_dn") == 1).select(
        "event_type",
        F.col("day").alias("down_peak_day"),
        F.col("s_dn").alias("down_cusum"),
        half_up(
            F.col("s_dn").cast("double") / (F.col("d_days") * F.col("t_events")), 6
        ).alias("down_shift_frac"),
    )
    return up.join(dn, "event_type")


@query(
    "q_events_autocorr",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, day
    ),
    tot AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS d_days,
               CAST(sum(n) AS BIGINT) AS t_events
        FROM daily GROUP BY event_type
    ),
    u AS (
        SELECT d.event_type, d.day,
               t.d_days * d.n - t.t_events AS u
        FROM daily d JOIN tot t USING (event_type)
    ),
    den AS (
        SELECT event_type,
               sum(CAST(u AS DECIMAL(19,0)) * CAST(u AS DECIMAL(19,0)))
                   AS den
        FROM u GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type, l.lag,
               CAST(a.u AS DECIMAL(19,0)) * CAST(b.u AS DECIMAL(19,0)) AS p
        FROM u a
        CROSS JOIN (SELECT CAST(unnest(generate_series(1, 7)) AS BIGINT)
                        AS lag) l
        JOIN u b ON b.event_type = a.event_type AND b.day = a.day + l.lag
    ),
    num AS (
        SELECT event_type, lag,
               CAST(count(*) AS BIGINT) AS n_pairs,
               sum(p) AS num
        FROM pairs GROUP BY event_type, lag
    )
    SELECT n.event_type, n.lag, n.n_pairs,
           CASE WHEN d.den > 0 THEN
               (floor(CAST(n.num AS DOUBLE) / CAST(d.den AS DOUBLE)
                      * 10000.0 + 0.5) / 10000.0)
           END AS acf
    FROM num n JOIN den d USING (event_type)
    """,
)
def q_events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily event volume, per event type,
    at lags 1–7 days: the periodicity probe (weekly seasonality shows
    as a lag-7 peak, day-over-day momentum as lag-1) run before
    fitting any forecast baseline — and the diagnostic that justifies
    ``q_events_forecast_baseline``'s seasonal-naive choice.

    Exactness is engineered by scaling the centered series to
    integers: with ``D`` days and ``T`` total events, ``u_t = D·n_t −
    T`` is an integer multiple (``D·(n_t − mean)``) of the centered
    count, and the common factor cancels in the ACF ratio. Numerator
    ``Σ u_t·u_{t+k}`` and denominator ``Σ u_t²`` are DECIMAL(38,0)
    sums of integer products — exact in both engines regardless of
    accumulation order (and overflow-safe far past bigint at
    100 TB day-counts); the single final division is pinned half-up.
    A constant series (zero variance) yields NULL, guarded on both
    sides. Lagged pairs come from an equi-join on ``day + k`` —
    missing days simply contribute no pair (n_pairs records the
    support), so no gap-fill pass is needed.

    Scale shape: the event stream collapses to (type, day) counts
    with map-side partials; everything after — the 7× lag fan-out,
    the self-join on (type, day), both aggregates — runs on a
    calendar-bounded relation (days × types × 7), independent of
    event volume. The lag spine is a broadcast 7-row range.
    """
    from frafka_spark.functions.determinism import half_up

    e = table(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.unix_date(F.to_date("ts")).cast("bigint").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n"))
    )
    tot = daily.groupBy("event_type").agg(
        F.count("*").alias("d_days"), F.sum("n").alias("t_events")
    )
    u = daily.join(tot, "event_type").select(
        "event_type",
        "day",
        (F.col("d_days") * F.col("n") - F.col("t_events")).alias("u"),
    )
    u_dec = F.col("u").cast("decimal(19,0)")
    den = u.groupBy("event_type").agg(
        F.sum(u_dec * u_dec).alias("den")
    )
    lags = spark.range(1, 8).select(F.col("id").cast("bigint").alias("lag"))
    a = u.crossJoin(F.broadcast(lags)).select(
        "event_type",
        "lag",
        (F.col("day") + F.col("lag")).alias("day_b"),
        F.col("u").alias("u_a"),
    )
    b = u.select("event_type", F.col("day").alias("day_b"), F.col("u").alias("u_b"))
    num = (
        a.join(b, ["event_type", "day_b"])
        .groupBy("event_type", "lag")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(
                F.col("u_a").cast("decimal(19,0)")
                * F.col("u_b").cast("decimal(19,0)")
            ).alias("num"),
        )
    )
    return num.join(den, "event_type").select(
        "event_type",
        "lag",
        "n_pairs",
        F.when(
            F.col("den") > 0,
            half_up(F.col("num").cast("double") / F.col("den").cast("double"), 4),
        ).alias("acf"),
    )


@query(
    "q_events_seasonality",
    oracle="""
    WITH hod AS (
        SELECT event_type,
               CAST(extract(hour FROM ts) AS BIGINT) AS hod,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, hod
    ),
    tot AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_hours_active,
               CAST(sum(n) AS BIGINT) AS n_events
        FROM hod GROUP BY event_type
    ),
    ss AS (
        SELECT h.event_type,
               sum(CAST(24 * h.n - t.n_events AS DECIMAL(19,0))
                   * CAST(24 * h.n - t.n_events AS DECIMAL(19,0))) AS ss_obs
        FROM hod h JOIN tot t USING (event_type)
        GROUP BY h.event_type
    ),
    peak AS (
        SELECT event_type, hod, n,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY n DESC, hod ASC) AS rk
        FROM hod
    )
    SELECT t.event_type, t.n_events, t.n_hours_active,
           p.hod AS peak_hour,
           (floor(CAST(p.n AS DOUBLE) / t.n_events * 10000.0 + 0.5)
            / 10000.0) AS peak_share,
           (floor((CAST(s.ss_obs AS DOUBLE)
                   + (24 - t.n_hours_active)
                     * CAST(t.n_events AS DOUBLE) * t.n_events)
                  / (576.0 * CAST(t.n_events AS DOUBLE) * t.n_events)
                  * 10000.0 + 0.5) / 10000.0) AS season_strength
    FROM tot t
    JOIN ss s USING (event_type)
    JOIN peak p ON p.event_type = t.event_type AND p.rk = 1
    """,
)
def q_events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonality strength per event type: how far the
    24-slot intraday profile departs from uniform, summarized as the
    sum of squared share deviations ``Σ_h (share_h − 1/24)²`` (0 =
    perfectly flat, ≈0.958 = everything in one hour), plus the peak
    hour and its share — the load-shaping / bot-cohort diagnostic
    that decides whether hourly partitioning of a 100 TB event lake
    will skew.

    The deviation sum is made integer-exact by clearing denominators:
    ``share_h − 1/24 = (24·n_h − T)/(24T)``, so the statistic is
    ``Σ (24·n_h − T)² / (576·T²)`` with a DECIMAL(38,0)-summed
    integer numerator (overflow-safe past bigint at warehouse-scale
    counts). Hours with zero events are not materialized by the
    aggregate — their ``(0 − T/24)²`` mass is added in closed form as
    ``(24 − hours_active)·T²`` — so no 24-slot gap-fill join exists
    in the plan. Peak selection tiebreaks (count desc, hour asc);
    the two final divisions are pinned half-up on both engines.

    Scale shape: one map-side-partial aggregate collapses the stream
    to ≤ 24 rows per type; the three tiny follow-up relations (totals,
    squared sums, peak) join on event_type. Nothing downstream of the
    first aggregate depends on event volume.
    """
    from frafka_spark.functions.determinism import half_up

    e = table(spark, sf_dir, "events")
    hod = (
        e.select("event_type", F.hour("ts").cast("bigint").alias("hod"))
        .groupBy("event_type", "hod")
        .agg(F.count("*").alias("n"))
    )
    tot = hod.groupBy("event_type").agg(
        F.count("*").alias("n_hours_active"), F.sum("n").alias("n_events")
    )
    dev = (F.lit(24) * F.col("n") - F.col("n_events")).cast("decimal(19,0)")
    ss = (
        hod.join(tot, "event_type")
        .groupBy("event_type")
        .agg(F.sum(dev * dev).alias("ss_obs"))
    )
    w_peak = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("hod").asc()
    )
    peak = (
        hod.withColumn("rk", F.row_number().over(w_peak))
        .filter(F.col("rk") == 1)
        .select("event_type", F.col("hod").alias("peak_hour"), F.col("n").alias("n_peak"))
    )
    t_dbl = F.col("n_events").cast("double")
    return (
        tot.join(ss, "event_type")
        .join(peak, "event_type")
        .select(
            "event_type",
            "n_events",
            "n_hours_active",
            "peak_hour",
            half_up(F.col("n_peak").cast("double") / F.col("n_events"), 4).alias(
                "peak_share"
            ),
            half_up(
                (
                    F.col("ss_obs").cast("double")
                    + (F.lit(24) - F.col("n_hours_active")) * t_dbl * F.col("n_events")
                )
                / (F.lit(576.0) * t_dbl * F.col("n_events")),
                4,
            ).alias("season_strength"),
        )
    )


@query(
    "q_events_audience_overlap",
    oracle="""
    WITH au AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    sizes AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_users
        FROM au GROUP BY event_type
    ),
    inter AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_both
        FROM au a JOIN au b
          ON b.user_id = a.user_id AND a.event_type < b.event_type
        GROUP BY type_a, type_b
    )
    SELECT i.type_a, i.type_b, sa.n_users AS n_a, sb.n_users AS n_b,
           i.n_both,
           (floor(CAST(i.n_both AS DOUBLE)
                  / (sa.n_users + sb.n_users - i.n_both)
                  * 10000.0 + 0.5) / 10000.0) AS jaccard,
           (floor(CAST(i.n_both AS DOUBLE)
                  / least(sa.n_users, sb.n_users)
                  * 10000.0 + 0.5) / 10000.0) AS containment
    FROM inter i
    JOIN sizes sa ON sa.event_type = i.type_a
    JOIN sizes sb ON sb.event_type = i.type_b
    """,
)
def q_events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types: Jaccard and
    containment of the user sets behind every unordered type pair —
    the segment-overlap matrix product analytics asks for ("do
    purchasers also click?") and, in a training-data lens, the
    source-audience dual of ``q_llm_dedup_cross_source``'s document
    matrix.

    Exact set algebra on aggregates: the stream collapses to the
    DISTINCT (type, user) relation first (map-side partial distinct),
    then one self-join keyed on user_id with an anti-symmetric type
    predicate (a < b, each unordered pair once) counts
    intersections, and per-type set sizes join back by type. Both
    coefficients are single divisions of exact integers, pinned
    half-up on both engines.

    Scale shape: everything downstream of the first distinct is
    bounded by users × types, never events. The self-join fans each
    user's type list into its pairs — with T types a user appears in,
    T(T−1)/2 rows, T ≤ |type vocabulary| (single digits here, and
    capped in any schema'd event stream); the join keys on user_id so
    AQE handles the power-user skew, and the final joins are
    broadcast-sized (types² rows vs per-type sizes).
    """
    from frafka_spark.functions.determinism import half_up

    e = table(spark, sf_dir, "events")
    au = e.select("event_type", "user_id").distinct()
    sizes = au.groupBy("event_type").agg(F.count("*").alias("n_users"))
    a = au.select(F.col("event_type").alias("type_a"), "user_id")
    b = au.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_both",
            half_up(
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both")),
                4,
            ).alias("jaccard"),
            half_up(
                F.col("n_both").cast("double") / F.least("n_a", "n_b"), 4
            ).alias("containment"),
        )
    )


@query(
    "q_events_pagerank_step",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_type
        FROM events
    ),
    pairs AS (
        SELECT prev_type AS src, event_type AS dst,
               CAST(count(*) AS BIGINT) AS c
        FROM ordered WHERE prev_type IS NOT NULL
        GROUP BY src, dst
    ),
    outd AS (
        SELECT src, CAST(sum(c) AS BIGINT) AS out_c FROM pairs GROUP BY src
    ),
    nodes AS (SELECT DISTINCT event_type AS node FROM events),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
    contrib AS (
        SELECT p.dst,
               CAST(floor(CAST(p.c AS DOUBLE) / o.out_c / nn.n
                          * 1000000000000.0 + 0.5) AS BIGINT) AS micro
        FROM pairs p JOIN outd o USING (src) CROSS JOIN nn
    ),
    insum AS (
        SELECT dst, CAST(count(*) AS BIGINT) AS in_degree,
               CAST(sum(micro) AS BIGINT) AS in_micro
        FROM contrib GROUP BY dst
    )
    SELECT nodes.node AS event_type,
           CAST(coalesce(i.in_degree, 0) AS BIGINT) AS in_degree,
           (floor(1.0 / nn.n * 1000000.0 + 0.5) / 1000000.0) AS rank_before,
           (floor((0.15 / nn.n
                   + 0.85 * (CAST(coalesce(i.in_micro, 0) AS DOUBLE)
                             / 1000000000000.0))
                  * 1000000.0 + 0.5) / 1000000.0) AS rank_after
    FROM nodes
    LEFT JOIN insum i ON i.dst = nodes.node
    CROSS JOIN nn
    """,
)
def q_events_pagerank_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One damped PageRank iteration (d = 0.85) from a uniform start
    over the event-type transition graph — nodes are event types,
    edge weights the user-consecutive transition counts of
    ``q_events_transitions`` — the graph-centrality primitive beyond
    ``q_llm_dedup_cluster``'s connected components; the same join+
    aggregate step iterates to the stationary behavioral importance
    of each action (this declared single step is the loop body;
    nodes without out-edges leak their mass in this simplified
    formulation, stated rather than silently renormalized).

    The cross-engine hazard is the in-mass fold: Σ_j rank_j·w_ji sums
    DOUBLES whose accumulation order differs between engines. House
    discipline (the attribution-credit pattern): each term
    ``(c_ji/out_j)/n`` is computed by an identical single-division
    chain on both engines — hence bit-identical — then pinned to
    integer 1e-12 micro-units, and the fold sums LONGS, exactly. The
    final rank is one half-up-pinned affine map of that exact
    integer. In an iterated deployment the re-quantization per step
    makes the whole fixed point engine-identical, not just one step.

    Scale shape: per-user lag under a keyed window (the transition
    extraction), collapse to ≤types² weighted edges with map-side
    partials, then all graph arithmetic runs on the edge relation —
    bounded by the type vocabulary squared, independent of event
    volume. The node spine and scalar n broadcast. The out-degree is
    a full-partition window sum OVER the aggregated edge relation
    (≤types² rows), not a separate aggregate joined back — the
    joined-back form re-executed the per-user lag window subtree on
    BOTH join children (guide §2.4 one-read; the
    q_events_concurrency/alert_episodes discipline), doubling the
    expensive pass for a value derivable in one keyed pipeline.
    """
    from frafka_spark.functions.determinism import half_up

    e = table(spark, sf_dir, "events")
    w_lag = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            "event_type",
            F.lag("event_type").over(w_lag).alias("src"),
        )
        .filter(F.col("src").isNotNull())
        .groupBy("src", F.col("event_type").alias("dst"))
        .agg(F.count("*").alias("c"))
    )
    w_src = Window.partitionBy("src")
    nodes = e.select(F.col("event_type").alias("node")).distinct()
    nn = nodes.agg(F.count("*").alias("n"))
    contrib = (
        pairs.withColumn("out_c", F.sum("c").over(w_src))
        .crossJoin(F.broadcast(nn))
        .select(
            "dst",
            F.floor(
                F.col("c").cast("double") / F.col("out_c") / F.col("n")
                * 1e12
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("micro"),
        )
    )
    insum = contrib.groupBy("dst").agg(
        F.count("*").alias("in_degree"), F.sum("micro").alias("in_micro")
    )
    return (
        nodes.join(insum, nodes.node == insum.dst, "left")
        .crossJoin(F.broadcast(nn))
        .select(
            F.col("node").alias("event_type"),
            F.coalesce("in_degree", F.lit(0).cast("bigint")).alias("in_degree"),
            half_up(F.lit(1.0) / F.col("n"), 6).alias("rank_before"),
            half_up(
                F.lit(0.15) / F.col("n")
                + F.lit(0.85)
                * (F.coalesce("in_micro", F.lit(0).cast("bigint")).cast("double") / 1e12),
                6,
            ).alias("rank_after"),
        )
    )


@query(
    "q_events_rolling_corr",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                    AS BIGINT) AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, day
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               a.day, a.n AS x, b.n AS y
        FROM daily a JOIN daily b
          ON b.day = a.day AND a.event_type < b.event_type
    ),
    win AS (
        SELECT type_a, type_b, day,
               CAST(count(*) OVER w AS BIGINT) AS n_win,
               CAST(sum(x) OVER w AS BIGINT) AS sx,
               CAST(sum(y) OVER w AS BIGINT) AS sy,
               sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                   OVER w AS sxy,
               sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)))
                   OVER w AS sxx,
               sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0)))
                   OVER w AS syy
        FROM pairs
        WINDOW w AS (PARTITION BY type_a, type_b ORDER BY day
                     RANGE BETWEEN 13 PRECEDING AND CURRENT ROW)
    ),
    terms AS (
        SELECT type_a, type_b, day, n_win,
               CAST(n_win * sxy - CAST(sx AS DECIMAL(19,0)) * sy AS DOUBLE)
                   AS num,
               CAST(n_win * sxx - CAST(sx AS DECIMAL(19,0)) * sx AS DOUBLE)
                   AS va,
               CAST(n_win * syy - CAST(sy AS DECIMAL(19,0)) * sy AS DOUBLE)
                   AS vb
        FROM win WHERE n_win >= 10
    )
    SELECT type_a, type_b, day, n_win,
           CASE WHEN va > 0 AND vb > 0 THEN
               (floor(num / (sqrt(va) * sqrt(vb)) * 10000.0 + 0.5)
                / 10000.0)
           END AS corr14
    FROM terms
    """,
)
def q_events_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 14-day Pearson correlation between every pair of
    event types' daily volumes: the co-movement monitor ("do clicks
    still track views?") whose breakdowns localize instrumentation
    regressions in time — the windowed, pairwise extension of
    ``q_agg_corr``, built on the same exact-sums discipline as
    ``q_events_anomaly``.

    Every windowed statistic (n, Σx, Σy, Σxy, Σx², Σy²) is an
    integer sum — DECIMAL(19→38,0) for the product sums, exact in
    both engines regardless of accumulation order; the correlation
    is then derived by one identical double chain (the two variance
    terms cast to double BEFORE multiplying, so no DECIMAL(38)
    overflow at warehouse-scale counts and both engines evaluate the
    same IEEE sqrt/product/quotient), pinned half-up — which also
    canonicalizes the signed zero a dead-flat window can produce
    (``floor(±ε·10⁴ + 0.5)/10⁴`` is +0.0 from either sign). Windows
    with under 10 observed days are suppressed; zero-variance
    windows yield NULL on both sides.

    Scale shape: the stream collapses to (type, day) counts first;
    the pair fan-out and the RANGE-framed window run on the
    calendar-bounded rollup (days × type-pairs), so cost is
    independent of event volume. Gap days contribute no pair row —
    the RANGE frame does calendar truncation without gap-filling.
    """
    from frafka_spark.functions.determinism import half_up

    e = table(spark, sf_dir, "events")
    daily = (
        e.select(
            "event_type",
            F.unix_date(F.to_date("ts")).cast("bigint").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("n"))
    )
    a = daily.select(F.col("event_type").alias("type_a"), "day", F.col("n").alias("x"))
    b = daily.select(F.col("event_type").alias("type_b"), "day", F.col("n").alias("y"))
    pairs = a.join(b, "day").filter(F.col("type_a") < F.col("type_b"))
    w = (
        Window.partitionBy("type_a", "type_b")
        .orderBy("day")
        .rangeBetween(-13, 0)
    )
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    win = pairs.select(
        "type_a",
        "type_b",
        "day",
        F.count("*").over(w).alias("n_win"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum(xd * yd).over(w).alias("sxy"),
        F.sum(xd * xd).over(w).alias("sxx"),
        F.sum(yd * yd).over(w).alias("syy"),
    ).filter(F.col("n_win") >= 10)
    sxd = F.col("sx").cast("decimal(19,0)")
    syd = F.col("sy").cast("decimal(19,0)")
    num = (F.col("n_win") * F.col("sxy") - sxd * F.col("sy")).cast("double")
    va = (F.col("n_win") * F.col("sxx") - sxd * F.col("sx")).cast("double")
    vb = (F.col("n_win") * F.col("syy") - syd * F.col("sy")).cast("double")
    return win.select(
        "type_a",
        "type_b",
        "day",
        "n_win",
        F.when(
            (va > 0) & (vb > 0),
            half_up(num / (F.sqrt(va) * F.sqrt(vb)), 4),
        ).alias("corr14"),
    )


@query(
    "q_events_triangles",
    oracle="""
    WITH hu AS (
        SELECT DISTINCT date_trunc('hour', ts) AS hr, user_id FROM events
    ),
    peru AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS h FROM hu GROUP BY user_id
    ),
    hrs AS (SELECT CAST(count(DISTINCT hr) AS BIGINT) AS nh FROM hu),
    capped AS (
        SELECT hr, user_id FROM (
            SELECT hu.hr, hu.user_id,
                   row_number() OVER (PARTITION BY hu.hr
                                      ORDER BY p.h DESC, hu.user_id ASC
                                     ) AS rn
            FROM hu JOIN peru p ON p.user_id = hu.user_id
        ) WHERE rn <= 512
    ),
    pairs AS (
        SELECT a.user_id AS u1, b.user_id AS u2,
               CAST(count(*) AS BIGINT) AS co
        FROM capped a JOIN capped b ON b.hr = a.hr AND a.user_id < b.user_id
        GROUP BY u1, u2
    ),
    edges AS (
        SELECT p.u1, p.u2
        FROM pairs p
        JOIN peru x ON x.user_id = p.u1
        JOIN peru y ON y.user_id = p.u2
        CROSS JOIN hrs
        WHERE 10 * p.co * hrs.nh >= 11 * x.h * y.h
        ORDER BY CAST(floor(CAST(p.co AS DOUBLE) * hrs.nh
                            / (CAST(x.h AS DOUBLE) * y.h)
                            * 1000000.0) AS BIGINT) DESC,
                 p.u1 ASC, p.u2 ASC
        LIMIT 2000
    ),
    deg AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS degree
        FROM (SELECT u1 AS user_id FROM edges
              UNION ALL SELECT u2 FROM edges)
        GROUP BY user_id
    ),
    tri AS (
        SELECT e1.u1 AS x, e1.u2 AS y, e2.u2 AS z
        FROM edges e1
        JOIN edges e2 ON e2.u1 = e1.u2
        JOIN edges e3 ON e3.u1 = e1.u1 AND e3.u2 = e2.u2
    ),
    tcnt AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS tri_cnt
        FROM (SELECT x AS user_id FROM tri
              UNION ALL SELECT y FROM tri
              UNION ALL SELECT z FROM tri)
        GROUP BY user_id
    )
    SELECT d.user_id, d.degree,
           CAST(coalesce(t.tri_cnt, 0) AS BIGINT) AS tri_cnt
    FROM deg d LEFT JOIN tcnt t ON t.user_id = d.user_id
    ORDER BY tri_cnt DESC, d.degree DESC, d.user_id ASC
    LIMIT 15
    """,
)
def q_events_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the user co-activity graph — the motif/
    community-cohesion primitive: project the bipartite (hour, user)
    incidence onto users (edge when two users' co-active hours exceed
    1.1x the independence expectation co·H >= 1.1·h_a·h_b, i.e. lift
    >= 1.1, keeping only the 2000 strongest edges by lift), then
    count triangles by the ordered-triple join. Top 15 users by
    triangle participation (degree, then user_id tiebreaks).

    Exactness: the lift floor is cleared of division — the edge
    test is the INTEGER comparison 10·co·H >= 11·h_a·h_b — and
    the top-K
    edge ranking orders by the INTEGER-floored lift micro-score (one
    identical double chain) with (u1, u2) tiebreaks — and everything
    else is counting, so the graph (and thus the result) is
    bit-identical cross-engine with no pinned float anywhere.

    Scale shape: the classic bounded-projection discipline — collapse
    events to DISTINCT (hour, user) first (partial-agg), CAP each hour
    block to its 512 most-active users (rank by global hour-count h
    desc, user_id tiebreak — the q_llm_dedup_near_capped block-cap
    discipline, applied here for real, mirrored in the oracle; the
    cap never binds on this fixture's 150 users) so the within-hour
    pairing fans out at most 512²/2 per block at ANY corpus scale,
    aggregate pairs before thresholding, and SPARSIFY to the K=2000
    strongest edges (TakeOrderedAndProject — per-task heaps, never a
    global sort) so the triangle join's input is bounded by a code
    constant at every scale: without the cap the sf0.1 fixture alone
    builds 427k edges and 32M triangles. The ordered-triple join
    (u1 < u2 < u3) emits each triangle exactly once over the
    broadcast-sized edge list. No window, no collect, no broadcast
    of a data-bounded side.
    """
    # Shared-subtree discipline (r13: lifted to SESSION legs in
    # operators/graph.py — the same hu/peru/capped/pair-fan build
    # also feeds the co-activity edge list behind label prop,
    # modularity, PageRank and k-core, and previously executed once
    # per module): hu feeds 3 consumers (peru, hrs, capped), peru 3
    # (cap rank, h1, h2), edges 4 (deg + the triple self-join).
    # hu/peru are the collapsed incidence/degree relations (∝ users,
    # not events); the pair fan is the expensive Σ cap²/2 explode;
    # edges is 2000 rows by code constant. The block cap (keep each
    # hour's LP_BLOCK_CAP most-active users before pairing) lives in
    # the shared leg.
    from frafka_spark.operators.graph import (
        _copair_counts,
        _hour_user,
        _user_hours,
    )

    hu = _hour_user(spark, sf_dir)
    peru = _user_hours(spark, sf_dir)
    hrs = hu.agg(F.countDistinct("hr").alias("nh"))
    pairs = _copair_counts(spark, sf_dir)
    edges = (
        pairs.join(
            peru.select(F.col("user_id").alias("u1"), F.col("h").alias("h1")),
            "u1",
        )
        .join(
            peru.select(F.col("user_id").alias("u2"), F.col("h").alias("h2")),
            "u2",
        )
        .crossJoin(F.broadcast(hrs))
        .filter(
            10 * F.col("co") * F.col("nh") >= 11 * F.col("h1") * F.col("h2")
        )
        .orderBy(
            F.floor(
                F.col("co").cast("double")
                * F.col("nh")
                / (F.col("h1").cast("double") * F.col("h2"))
                * F.lit(1000000.0)
            )
            .cast("bigint")
            .desc(),
            F.col("u1").asc(),
            F.col("u2").asc(),
        )
        .limit(2000)
        .select("u1", "u2")
        .cache()
    )
    deg = (
        edges.select(F.col("u1").alias("user_id"))
        .unionAll(edges.select(F.col("u2").alias("user_id")))
        .groupBy("user_id")
        .agg(F.count("*").alias("degree"))
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.u1") == F.col("e1.u2"))
        .join(
            e3,
            (F.col("e3.u1") == F.col("e1.u1"))
            & (F.col("e3.u2") == F.col("e2.u2")),
        )
        .select(
            F.col("e1.u1").alias("x"),
            F.col("e1.u2").alias("y"),
            F.col("e2.u2").alias("z"),
        )
    )
    tcnt = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("user_id"))
        .groupBy("user_id")
        .agg(F.count("*").alias("tri_cnt"))
    )
    return (
        deg.join(tcnt, "user_id", "left")
        .select(
            "user_id",
            "degree",
            F.coalesce("tri_cnt", F.lit(0).cast("bigint")).alias("tri_cnt"),
        )
        .orderBy(
            F.col("tri_cnt").desc(), F.col("degree").desc(), F.col("user_id")
        )
        .limit(15)
    )


@query(
    "q_basket_lift",
    oracle="""
    WITH ob AS (
        SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ),
    cb AS (
        SELECT brand, CAST(count(*) AS BIGINT) AS c FROM ob GROUP BY brand
    ),
    nb AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n FROM ob),
    pair AS (
        SELECT a.brand AS brand_a, b.brand AS brand_b,
               CAST(count(*) AS BIGINT) AS c_ab
        FROM ob a JOIN ob b ON b.okey = a.okey AND a.brand < b.brand
        GROUP BY brand_a, brand_b
    )
    SELECT p.brand_a, p.brand_b, p.c_ab,
           floor(CAST(p.c_ab AS DOUBLE) / nb.n * 1000000.0 + 0.5)
               / 1000000.0 AS support,
           floor(CAST(p.c_ab AS DOUBLE) / ca.c * 1000000.0 + 0.5)
               / 1000000.0 AS confidence,
           floor(CAST(p.c_ab AS DOUBLE) * nb.n
                 / (CAST(ca.c AS DOUBLE) * cb2.c) * 1000000.0 + 0.5)
               / 1000000.0 AS lift
    FROM pair p
    JOIN cb ca ON ca.brand = p.brand_a
    JOIN cb cb2 ON cb2.brand = p.brand_b
    CROSS JOIN nb
    WHERE p.c_ab >= 20
    """,
)
def q_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining over order baskets: for every
    brand pair co-occurring in >= 20 orders, support, confidence
    (A=>B) and lift — the co-occurrence mining shape (A-priori's
    pair pass) that also powers "docs that cite X also cite Y"
    curation heuristics.

    Exactness: all counts are DISTINCT-collapsed integers; support /
    confidence / lift are each ONE identical double chain over those
    integers, half-up pinned to 6 digits.

    Scale shape: baskets collapse to ONE row per order — a
    ``collect_set(brand)`` aggregate on the basket key — and the pair
    pass generates each basket's a<b combinations IN-ROW from the
    sorted set (the A-priori candidate expansion), so there is no
    (okey,brand) distinct exchange and no okey self-join at all: one
    exchange builds the basket sets, and the exploded pair stream
    partial-aggregates map-side to at most |brands|² rows per
    partition before its shuffle (previous shape: distinct + self-join
    = 3 corpus-sized exchanges; this one: 1, measured 0.88 s → 0.74 s
    warm same-session A/B at sf0.1, identical rows). Per-basket fan-out stays bounded
    by the distinct-brand count (the q_llm_dedup_near_capped cap
    discipline applies to pathological baskets). The dimension counts
    (brand vocabulary, 1-row basket total) derive from the SAME cached
    basket sets and broadcast. min-support prunes before any emission.
    No window, no collect.
    """
    from frafka_spark.functions.determinism import half_up

    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    # cache(): the basket-set relation feeds THREE consumers (brand
    # counts, basket total, pair expansion) — an uncached plan re-runs
    # the lineitem⋈part join + basket aggregate per consumer. Bounded
    # by |orders| rows.
    baskets = (
        li.join(p, li.l_partkey == p.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("brand"))
        .groupBy("okey")
        .agg(F.sort_array(F.collect_set("brand")).alias("brands"))
        .cache()
    )
    cb = (
        baskets.select(F.explode("brands").alias("brand"))
        .groupBy("brand")
        .agg(F.count("*").alias("c"))
    )
    nb = baskets.agg(F.count("*").alias("n"))
    arr = F.col("brands")
    # sorted + deduped set ⇒ every in-row (i, j>i) combination is a
    # distinct brand_a < brand_b pair, each emitted exactly once
    pair_structs = F.flatten(
        F.transform(
            arr,
            lambda a, i: F.transform(
                F.slice(arr, i + F.lit(2), F.size(arr)),
                lambda b: F.struct(a.alias("brand_a"), b.alias("brand_b")),
            ),
        )
    )
    pair = (
        baskets.select(F.explode(pair_structs).alias("p"))
        .groupBy(
            F.col("p.brand_a").alias("brand_a"), F.col("p.brand_b").alias("brand_b")
        )
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= 20)
    )
    ca = cb.select(F.col("brand").alias("brand_a"), F.col("c").alias("c_a"))
    cbb = cb.select(F.col("brand").alias("brand_b"), F.col("c").alias("c_b"))
    return (
        pair.join(F.broadcast(ca), "brand_a")
        .join(F.broadcast(cbb), "brand_b")
        .crossJoin(F.broadcast(nb))
        .select(
            "brand_a",
            "brand_b",
            "c_ab",
            half_up(F.col("c_ab").cast("double") / F.col("n"), 6).alias(
                "support"
            ),
            half_up(F.col("c_ab").cast("double") / F.col("c_a"), 6).alias(
                "confidence"
            ),
            half_up(
                F.col("c_ab").cast("double")
                * F.col("n")
                / (F.col("c_a").cast("double") * F.col("c_b")),
                6,
            ).alias("lift"),
        )
    )


_MATCH_WINDOW_US = 30 * 60 * 1_000_000  # click -> purchase bound: 30 min


@query(
    "q_events_sequence_match",
    oracle=f"""
    WITH marked AS (
        SELECT user_id, event_id, event_type,
               epoch_us(ts) AS us,
               max(CASE WHEN event_type = 'click'
                        THEN epoch_us(ts) END)
                   OVER w AS click_us,
               max(CASE WHEN event_type = 'error'
                        THEN epoch_us(ts) END)
                   OVER w AS err_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id,
           event_id AS purchase_event_id,
           us AS purchase_us,
           click_us,
           us - click_us AS gap_us
    FROM marked
    WHERE event_type = 'purchase'
      AND click_us IS NOT NULL
      AND (err_us IS NULL OR err_us < click_us)
      AND us - click_us <= {_MATCH_WINDOW_US}
    """,
)
def q_events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style sequence pattern over per-user event
    streams: emit every ``purchase`` whose most recent preceding
    ``click`` is (a) within 30 minutes and (b) NOT superseded by an
    intervening ``error`` — the `click (no error)* purchase` regex
    that SQL MATCH_RECOGNIZE / Flink CEP express, compiled here to
    plain running windows (Spark has no MATCH_RECOGNIZE; this is the
    standard lowering for patterns whose predicates only reference
    the LATEST occurrence of each symbol).

    The lowering: one ordered pass per user computes the running
    max event-time of each trigger symbol (`click`, `error`) in an
    UNBOUNDED-PRECEDING..CURRENT frame — running max is the O(n)
    frame shape (contrast the O(n²) unbounded-FOLLOWING trap that
    sank q_ts_interpolate in round 7) — and the match predicate
    becomes a row-local comparison on the purchase rows: a veto is
    just ``last_error < last_click`` failing. Event-times compare as
    exact integer microseconds (``unix_micros``/``epoch_us``), with
    the unique ``event_id`` as the order tiebreak, so match
    boundaries are bit-deterministic across engines — no timestamp
    rendering, no float time arithmetic.

    Scale shape: ONE shuffle (hash by ``user_id``), per-user sort
    within the partition, output bounded by the purchase count. A
    100 TB stream pattern-matches with the same plan — or streaming,
    where the running maxes become per-key state in
    ``applyInPandasWithState`` (see streaming tests).
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        F.max(
            F.when(F.col("event_type") == "click", F.unix_micros("ts"))
        )
        .over(w)
        .alias("click_us"),
        F.max(
            F.when(F.col("event_type") == "error", F.unix_micros("ts"))
        )
        .over(w)
        .alias("err_us"),
    )
    return marked.filter(
        (F.col("event_type") == "purchase")
        & F.col("click_us").isNotNull()
        & (F.col("err_us").isNull() | (F.col("err_us") < F.col("click_us")))
        & ((F.col("us") - F.col("click_us")) <= _MATCH_WINDOW_US)
    ).select(
        "user_id",
        F.col("event_id").alias("purchase_event_id"),
        F.col("us").alias("purchase_us"),
        "click_us",
        (F.col("us") - F.col("click_us")).alias("gap_us"),
    )


_SIM_TYPES = ("click", "error", "purchase", "signup", "view")
_SIM_BUILD_CAP = 1024  # per-block candidate build side (most active first)

_SIM_SQL_DOT = " + ".join(f"a.c_{t} * b.c_{t}" for t in _SIM_TYPES)
_SIM_SQL_VEC = ",\n".join(
    f"           sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS c_{t}"
    for t in _SIM_TYPES
)
# CASE order encodes the alphabetical tiebreak: an earlier type wins
# ties against every later one by >= and first-match semantics.
_SIM_SQL_DOM = (
    "CASE "
    + " ".join(
        "WHEN "
        + " AND ".join(
            f"c_{t} >= c_{u}" for u in _SIM_TYPES[i + 1 :]
        )
        + f" THEN '{t}'"
        for i, t in enumerate(_SIM_TYPES[:-1])
    )
    + f" ELSE '{_SIM_TYPES[-1]}' END"
)
_SIM_SQL_NRM = "sqrt(" + " + ".join(f"c_{t} * c_{t}" for t in _SIM_TYPES) + ")"


@query(
    "q_events_user_similarity",
    oracle=f"""
    WITH vec AS (
        SELECT user_id,
{_SIM_SQL_VEC},
               count(*) AS n_events
        FROM events GROUP BY user_id
    ),
    dom AS (
        SELECT *,
               {_SIM_SQL_DOM} AS dom_type,
               {_SIM_SQL_NRM} AS nrm
        FROM vec
    ),
    build AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (
                PARTITION BY dom_type
                ORDER BY n_events DESC, user_id ASC) AS rk
            FROM dom)
        WHERE rk <= {_SIM_BUILD_CAP}
    ),
    pairs AS (
        SELECT a.user_id, a.dom_type, b.user_id AS neighbor_id,
               ({_SIM_SQL_DOT}) / (a.nrm * b.nrm) AS cos
        FROM dom a JOIN build b
          ON a.dom_type = b.dom_type AND a.user_id <> b.user_id
    )
    SELECT user_id, dom_type, neighbor_id,
           floor(cos * 1000000.0 + 0.5) / 1000000.0 AS cosine
    FROM (SELECT *, row_number() OVER (
              PARTITION BY user_id
              ORDER BY cos DESC, neighbor_id ASC) AS rn
          FROM pairs)
    WHERE rn = 1
    """,
)
def q_events_user_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral nearest neighbor: each user's most-similar user by
    cosine over their event-type count vector — the collaborative
    "users like you" primitive, computed from raw events with no
    embedding table (the vector IS the per-type activity profile).

    Blocking: users are compared only within their DOMINANT event
    type's block (argmax count, alphabetical tiebreak encoded as an
    ordered CASE chain identical on both engines) — the same
    cell-join discipline as the IVF/LSH families in llm/. Within a
    block the candidate BUILD side is capped at the {_SIM_BUILD_CAP}
    most active users (activity-desc, user-asc — the
    ``q_llm_dedup_near_capped`` rule VERDICT r7 asked every
    quadratic block to carry): probes stay uncapped, so every user
    gets a neighbor, but per-block fan-out is O(n·K), not O(n²).

    Determinism: the vector is integer counts, the dot product is
    exact BIGINT arithmetic, and the only floats are ``sqrt`` (an
    IEEE-exact operation) and one division — identically ordered on
    both engines, so the cosine ranking needs no tolerance; ties
    still break on ``neighbor_id``.

    Scale shape: one hash aggregate events→users (map-side partial),
    one bounded window for the block cap, one equi-join on the block
    key. The 5-type fan is fixture-shaped; a high-cardinality
    feature space would LSH instead (llm/similarity.py) — this
    operator demonstrates the count-vector construction and capped
    block join.
    """
    e = table(spark, sf_dir, "events")
    vec = e.groupBy("user_id").agg(
        *[
            F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"c_{t}")
            for t in _SIM_TYPES
        ],
        F.count("*").alias("n_events"),
    )
    dom_chain = None
    for i, t in enumerate(_SIM_TYPES[:-1]):
        cond = None
        for u in _SIM_TYPES[i + 1 :]:
            c = F.col(f"c_{t}") >= F.col(f"c_{u}")
            cond = c if cond is None else (cond & c)
        dom_chain = (
            F.when(cond, t) if dom_chain is None else dom_chain.when(cond, t)
        )
    dom_chain = dom_chain.otherwise(_SIM_TYPES[-1])
    sq = None
    for t in _SIM_TYPES:
        term = F.col(f"c_{t}") * F.col(f"c_{t}")
        sq = term if sq is None else sq + term
    nrm = F.sqrt(sq)
    dom = vec.select("*", dom_chain.alias("dom_type"), nrm.alias("nrm"))
    w_cap = Window.partitionBy("dom_type").orderBy(
        F.col("n_events").desc(), F.col("user_id").asc()
    )
    build = (
        dom.withColumn("rk", F.row_number().over(w_cap))
        .filter(F.col("rk") <= _SIM_BUILD_CAP)
        .select(
            F.col("user_id").alias("neighbor_id"),
            F.col("dom_type").alias("b_dom"),
            F.col("nrm").alias("b_nrm"),
            *[F.col(f"c_{t}").alias(f"b_{t}") for t in _SIM_TYPES],
        )
    )
    dot = None
    for t in _SIM_TYPES:
        term = F.col(f"c_{t}") * F.col(f"b_{t}")
        dot = term if dot is None else dot + term
    pairs = dom.join(
        build,
        (F.col("dom_type") == F.col("b_dom"))
        & (F.col("user_id") != F.col("neighbor_id")),
    ).select(
        "user_id",
        "dom_type",
        "neighbor_id",
        (dot / (F.col("nrm") * F.col("b_nrm"))).alias("cos"),
    )
    # Per-user argmax as a map-side-combinable lexicographic
    # max(struct(cos, −neighbor_id)) — the identical (cos DESC,
    # neighbor ASC) selection the rank window made, without sorting
    # the full O(users × block-cap) pair fan (guide §2.3: aggregate
    # before you shuffle — partials reduce each partition to one row
    # per user before the exchange).
    return (
        pairs.groupBy("user_id", "dom_type")
        .agg(
            F.max(
                F.struct(
                    F.col("cos"), (-F.col("neighbor_id")).alias("neg_id")
                )
            ).alias("m")
        )
        .select(
            "user_id",
            "dom_type",
            (-F.col("m.neg_id")).alias("neighbor_id"),
            half_up(F.col("m.cos"), 6).alias("cosine"),
        )
    )


_KM_CENSOR_CUTOFF = "2024-01-24"  # last-week actives are censored, not churned


@query(
    "q_events_survival",
    oracle=f"""
    WITH lastd AS (
        SELECT event_type, user_id, max(CAST(ts AS DATE)) AS last_day
        FROM events GROUP BY event_type, user_id
    ),
    per_day AS (
        SELECT event_type, last_day,
               sum(CASE WHEN last_day < DATE '{_KM_CENSOR_CUTOFF}'
                        THEN 1 ELSE 0 END) AS n_churn,
               sum(CASE WHEN last_day < DATE '{_KM_CENSOR_CUTOFF}'
                        THEN 0 ELSE 1 END) AS n_censored
        FROM lastd GROUP BY event_type, last_day
    ),
    risk AS (
        SELECT *,
               sum(n_churn + n_censored) OVER (
                   PARTITION BY event_type ORDER BY last_day DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS n_risk
        FROM per_day
    ),
    km AS (
        SELECT event_type, last_day, n_churn, n_risk,
               CAST(n_churn AS DOUBLE) / CAST(n_risk AS DOUBLE) AS hazard,
               exp(sum(ln(1.0 - CAST(n_churn AS DOUBLE)
                                / CAST(n_risk AS DOUBLE))) OVER (
                   PARTITION BY event_type ORDER BY last_day ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               )) AS surv
        FROM risk
    )
    SELECT event_type,
           strftime(last_day, '%Y-%m-%d') AS day,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(n_churn AS BIGINT) AS n_churn,
           floor(hazard * 1000000.0 + 0.5) / 1000000.0 AS hazard,
           floor(surv * 10000.0 + 0.5) / 10000.0 AS survival
    FROM km
    WHERE n_churn > 0
    """,
)
def q_events_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival with right-censoring: per event type,
    the probability a user is still active after day t, where a
    user's terminal day is their LAST event of that type — users
    whose last activity falls in the study's final week
    (≥ {_KM_CENSOR_CUTOFF}) are CENSORED (study ended before we
    could observe churn), not counted as churned: the distinction
    that separates KM from a naive complementary CDF and makes the
    estimator unbiased under end-of-window truncation (without
    censoring the product telescopes to exactly that CDF).

    Estimator: S(t) = Π_{{s ≤ t}} (1 − d_s/n_s) over churn days,
    d = churns that day, n = risk set (everyone whose terminal day
    is ≥ s, censored included). The risk set is a running
    REVERSE-cumulative sum (DESC-ordered O(n) frame — the r7
    interpolate lesson applied), the product is exp∘sum∘ln in an
    ASC running frame, spelled identically on both engines so the
    only cross-engine surface is per-op libm ulp under a 1e-4 pin
    (the entropy/zipf precedent).

    Scale shape: one users×types hash aggregate (map-side partial),
    one |types|×|days| calendar-bounded relation, two O(n) running
    windows partitioned by event_type. Nothing global, nothing
    quadratic; at 100 TB the cost is the first aggregate — exactly
    where it should be.
    """
    cutoff = F.lit(_KM_CENSOR_CUTOFF).cast("date")
    lastd = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.max(F.to_date("ts")).alias("last_day"))
    )
    per_day = lastd.groupBy("event_type", "last_day").agg(
        F.sum(F.when(F.col("last_day") < cutoff, 1).otherwise(0)).alias("n_churn"),
        F.sum(F.when(F.col("last_day") < cutoff, 0).otherwise(1)).alias(
            "n_censored"
        ),
    )
    w_rev = (
        Window.partitionBy("event_type")
        .orderBy(F.col("last_day").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    risk = per_day.withColumn(
        "n_risk", F.sum(F.col("n_churn") + F.col("n_censored")).over(w_rev)
    )
    hazard = F.col("n_churn").cast("double") / F.col("n_risk").cast("double")
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy(F.col("last_day").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    km = risk.withColumn(
        "surv", F.exp(F.sum(F.log(F.lit(1.0) - hazard)).over(w_fwd))
    )
    return km.filter(F.col("n_churn") > 0).select(
        "event_type",
        F.date_format("last_day", "yyyy-MM-dd").alias("day"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.col("n_churn").cast("bigint").alias("n_churn"),
        half_up(hazard, 6).alias("hazard"),
        half_up(F.col("surv"), 4).alias("survival"),
    )


@query(
    "q_ts_theil_sen",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS d,
               CAST(count(*) AS BIGINT) AS v
        FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    pairs AS (
        SELECT a.event_type,
               a.d AS di, b.d AS dj,
               CAST(b.v - a.v AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS slope
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND b.d > a.d
    ),
    ranked AS (
        SELECT *, row_number() OVER (
                   PARTITION BY event_type
                   ORDER BY slope ASC, di ASC, dj ASC) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n_pairs
        FROM pairs
    ),
    med AS (
        SELECT event_type, CAST(n_pairs AS BIGINT) AS n_pairs,
               sum(CASE WHEN rn = (n_pairs + 1) // 2 THEN slope ELSE 0 END
                   + CASE WHEN rn = (n_pairs + 2) // 2 THEN slope ELSE 0 END
               ) / 2.0 AS ts_slope
        FROM ranked GROUP BY event_type, n_pairs
    ),
    days AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_days FROM daily
        GROUP BY event_type
    )
    SELECT m.event_type, d.n_days, m.n_pairs,
           floor(m.ts_slope * 1000000.0 + 0.5) / 1000000.0 AS ts_slope
    FROM med m JOIN days d ON d.event_type = m.event_type
    """,
)
def q_ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend: per event type, the MEDIAN of all
    pairwise day-over-day slopes of daily volume — the
    outlier-immune alternative to the OLS slope ``q_agg_regr`` fits
    (one corrupted day drags least squares; it moves a median of
    C(n,2) slopes almost nowhere). The classic robust-statistics
    companion to ``q_events_anomaly_mad``.

    Exactness: slopes are single divisions of exact integer deltas
    (identical IEEE ops both engines), and the median is the
    explicit midpoint rule — row_number over (slope, di, dj), pick
    ⌊(n+1)/2⌋ and ⌈(n+1)/2⌉, average — never an engine quantile
    (interpolation rules differ across engines; the
    q_agg_weighted_median lesson).

    Scale shape: the pair fan-out is per-type C(days, 2) — CALENDAR-
    bounded (30 days ⇒ 435 pairs), not data-bounded, so the
    quadratic is a constant multiplier on a 30-row relation however
    many raw events fold into it; the one unbounded aggregate is
    the daily rollup, which partial-aggregates map-side. A
    years-long window would band-limit pairs (|dj−di| ≤ 90) to keep
    the fan linear — noted, not needed at one month.
    """
    daily = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")).alias(
                "d"
            ),
        )
        .agg(F.count("*").alias("v"))
    )
    a = daily.select(
        "event_type", F.col("d").alias("di"), F.col("v").alias("vi")
    )
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("d").alias("dj"),
        F.col("v").alias("vj"),
    )
    pairs = a.join(
        b, (F.col("event_type") == F.col("et_b")) & (F.col("dj") > F.col("di"))
    ).select(
        "event_type",
        "di",
        "dj",
        (
            (F.col("vj") - F.col("vi")).cast("double")
            / (F.col("dj") - F.col("di")).cast("double")
        ).alias("slope"),
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("slope").asc(), F.col("di").asc(), F.col("dj").asc()
    )
    wc = Window.partitionBy("event_type")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(wc).alias("n_pairs"),
    )
    med = ranked.groupBy("event_type", "n_pairs").agg(
        (
            (
                F.sum(
                    F.when(
                        F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2),
                        F.col("slope"),
                    ).otherwise(0.0)
                )
                + F.sum(
                    F.when(
                        F.col("rn") == F.floor((F.col("n_pairs") + 2) / 2),
                        F.col("slope"),
                    ).otherwise(0.0)
                )
            )
            / 2.0
        ).alias("ts_slope")
    )
    days = daily.groupBy("event_type").agg(F.count("*").alias("n_days"))
    return med.join(days, "event_type").select(
        "event_type",
        "n_days",
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        half_up(F.col("ts_slope"), 6).alias("ts_slope"),
    )


_SEAS_MIN_SAMPLES = 4  # (dow, hour) cells need >= 4 observed days


@query(
    "q_events_anomaly_seasonal",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type,
               CAST(ts AS DATE) AS day,
               CAST(hour(ts) AS INT) AS hr,
               dayofweek(ts) AS dow,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY event_type, CAST(ts AS DATE), hour(ts), dayofweek(ts)
    ),
    cells AS (
        SELECT *,
               count(*) OVER w AS k,
               sum(n) OVER w AS s,
               sum(n * n) OVER w AS ss
        FROM hourly
        WINDOW w AS (PARTITION BY event_type, dow, hr)
    ),
    loo AS (
        SELECT event_type, day, hr, n, CAST(k AS BIGINT) AS k,
               CAST(s - n AS DOUBLE) / (k - 1) AS mean_loo,
               (CAST(ss - n * n AS DOUBLE)
                - CAST(s - n AS DOUBLE) * (s - n) / (k - 1))
               / (k - 2) AS var_loo
        FROM cells WHERE k >= {_SEAS_MIN_SAMPLES}
    )
    SELECT event_type,
           strftime(day, '%Y-%m-%d') AS day,
           hr, n, k,
           {{z}} AS z,
           (abs((CAST(n AS DOUBLE) - mean_loo) / sqrt(var_loo)) > 2.0)
               AS is_anomaly
    FROM loo WHERE var_loo > 0
    """.replace(
        "{z}",
        "floor((CAST(n AS DOUBLE) - mean_loo) / sqrt(var_loo)"
        " * 10000.0 + 0.5) / 10000.0 + 0.0",
    ),
)
def q_events_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-residual anomaly: each (type, day, hour) volume
    z-scored against ITS OWN (weekday, hour) cell across the month,
    leave-one-out — the "is this Tuesday 9am weird FOR a Tuesday
    9am" detector that completes the anomaly family (global mean →
    q_events_anomaly, robust MAD → _mad, trailing window → both;
    seasonal baseline → here). LOO matters at k≈4 samples: an
    in-sample baseline absorbs the outlier it should flag.

    Exactness: per-cell k/S/SS are exact integers from one
    partitioned window (no per-row re-aggregation), the LOO
    mean/variance algebra is one identical double chain off
    ``S − n`` and ``SS − n²``, and the z pin is explicit half-up
    with a signed-zero normalization (``+ 0.0``) since z straddles
    zero.

    Scale shape: one hash aggregate events → (type, day, hour), one
    PARTITION-only window over the 5×7×24-bounded cell space, then
    row-local math — the window's partition count is fixed by the
    calendar, its rows by observed days.
    """
    hourly = (
        table(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.to_date("ts").alias("day"),
            F.hour("ts").cast("int").alias("hr"),
            F.dayofweek("ts").alias("dow"),
        )
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type", "dow", "hr")
    cells = hourly.select(
        "*",
        F.count("*").over(w).alias("k"),
        F.sum("n").over(w).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("ss"),
    ).filter(F.col("k") >= _SEAS_MIN_SAMPLES)
    mean_loo = (F.col("s") - F.col("n")).cast("double") / (F.col("k") - 1)
    var_loo = (
        (F.col("ss") - F.col("n") * F.col("n")).cast("double")
        - (F.col("s") - F.col("n")).cast("double")
        * (F.col("s") - F.col("n"))
        / (F.col("k") - 1)
    ) / (F.col("k") - 2)
    z_raw = (F.col("n").cast("double") - mean_loo) / F.sqrt(var_loo)
    return cells.filter(var_loo > 0).select(
        "event_type",
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "hr",
        "n",
        F.col("k").cast("bigint").alias("k"),
        (half_up(z_raw, 4) + 0.0).alias("z"),
        (F.abs(z_raw) > 2.0).alias("is_anomaly"),
    )
