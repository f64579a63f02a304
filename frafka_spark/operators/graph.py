"""Graph / semi-supervised operators over the user co-activity graph:
label propagation (the classic transductive classifier) and the
stationary distribution of the event-type Markov chain (the long-run
behavioral mix), joining the existing graph family (connected
components in llm/dedup.py, PageRank step + power iteration in
llm/similarity.py, triangles in operators/analytics.py).

Both are EXACT cross-engine: label propagation is integer vote
counting with lexicographic tiebreaks; the stationary distribution is
computed in fixed-point integer arithmetic (micro-units, floor
division spelled ``(x − x%d)/d`` so both engines run the identical
dialect-neutral chain) inside a recursive CTE — no float accumulates
anywhere, so the full 20-iteration power method hash-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from frafka_spark.functions.determinism import sql_half_up
from frafka_spark.io import table
from frafka_spark.registry import query

EDGE_TOP_K = 1000  # strongest co-activity edges kept (by co, u1, u2)
SEED_MOD = 10  # user_id % 10 == 0 → seeded with its dominant type
LP_BLOCK_CAP = 512  # same hour-block cap as q_events_triangles

# The declared chain state space (a config constant, like funnel
# steps elsewhere in this repo): transitions outside it are ignored.
MARKOV_TYPES = ("click", "error", "purchase", "signup", "view")
MARKOV_ITERS = 20
_MICRO = 1_000_000


@query(
    "q_events_label_prop",
    oracle=f"""
    WITH hu AS (
        SELECT DISTINCT date_trunc('hour', ts) AS hr, user_id FROM events
    ),
    peru AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS h FROM hu GROUP BY user_id
    ),
    capped AS (
        SELECT hr, user_id FROM (
            SELECT hu.hr, hu.user_id,
                   row_number() OVER (PARTITION BY hu.hr
                                      ORDER BY p.h DESC, hu.user_id ASC
                                     ) AS rn
            FROM hu JOIN peru p ON p.user_id = hu.user_id
        ) WHERE rn <= {LP_BLOCK_CAP}
    ),
    pairs AS (
        SELECT a.user_id AS u1, b.user_id AS u2,
               CAST(count(*) AS BIGINT) AS co
        FROM capped a JOIN capped b ON b.hr = a.hr AND a.user_id < b.user_id
        GROUP BY u1, u2
    ),
    edges AS (
        SELECT u1, u2 FROM pairs
        ORDER BY co DESC, u1 ASC, u2 ASC LIMIT {EDGE_TOP_K}
    ),
    sym AS (
        SELECT u1 AS u, u2 AS v FROM edges
        UNION ALL SELECT u2, u1 FROM edges
    ),
    seeds AS (
        SELECT user_id, event_type AS label FROM (
            SELECT user_id, event_type,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY count(*) DESC,
                                               event_type ASC) AS rn
            FROM events WHERE user_id % {SEED_MOD} = 0
            GROUP BY user_id, event_type
        ) WHERE rn = 1
    ),
    r1 AS (
        SELECT user_id, label FROM (
            SELECT s.u AS user_id, l.label,
                   row_number() OVER (PARTITION BY s.u
                                      ORDER BY count(*) DESC,
                                               l.label ASC) AS rn
            FROM sym s JOIN seeds l ON l.user_id = s.v
            WHERE s.u NOT IN (SELECT user_id FROM seeds)
            GROUP BY s.u, l.label
        ) WHERE rn = 1
    ),
    known AS (
        SELECT user_id, label FROM seeds
        UNION ALL SELECT user_id, label FROM r1
    ),
    r2 AS (
        SELECT user_id, label FROM (
            SELECT s.u AS user_id, k.label,
                   row_number() OVER (PARTITION BY s.u
                                      ORDER BY count(*) DESC,
                                               k.label ASC) AS rn
            FROM sym s JOIN known k ON k.user_id = s.v
            WHERE s.u NOT IN (SELECT user_id FROM known)
            GROUP BY s.u, k.label
        ) WHERE rn = 1
    )
    SELECT u.user_id,
           coalesce(s.label, r1.label, r2.label) AS label,
           CAST(CASE WHEN s.user_id IS NOT NULL THEN 0
                     WHEN r1.user_id IS NOT NULL THEN 1
                     WHEN r2.user_id IS NOT NULL THEN 2
                END AS INT) AS rnd
    FROM (SELECT DISTINCT user_id FROM hu) u
    LEFT JOIN seeds s ON s.user_id = u.user_id
    LEFT JOIN r1 ON r1.user_id = u.user_id
    LEFT JOIN r2 ON r2.user_id = u.user_id
    """,
)
def q_events_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two rounds of label propagation on the sparsified co-activity
    graph: every 10th user is seeded with its dominant event type (the
    "persona" a marketer would hand-label), then unlabeled users take
    the majority label over their neighbors' known labels — round 1
    over seeds, round 2 over everything labeled so far. Majority votes
    are integer counts with (count DESC, label ASC) tiebreaks, so the
    whole transductive assignment is exact cross-engine.

    Scale shape: reuses q_events_triangles' bounded graph build
    verbatim (DISTINCT incidence → {cap}-capped hour blocks → pair
    partial-agg → top-{k} edge sparsification via TakeOrdered), then
    each propagation round is ONE edge-sized join + hash aggregate —
    a fixed number of rounds, every shuffle keyed, nothing quadratic,
    nothing iterated to a data-dependent depth (contrast the CC
    resolver in llm/dedup.py, which documents the log-diameter loop).
    """
    e = table(spark, sf_dir, "events")
    hu = (
        e.select(F.date_trunc("hour", F.col("ts")).alias("hr"), "user_id")
        .distinct()
        .cache()
    )
    peru = hu.groupBy("user_id").agg(F.count("*").alias("h"))
    w_blk = Window.partitionBy("hr").orderBy(F.desc("h"), F.asc("user_id"))
    capped = (
        hu.join(peru, "user_id")
        .withColumn("rn", F.row_number().over(w_blk))
        .filter(F.col("rn") <= LP_BLOCK_CAP)
        .select("hr", "user_id")
    )
    a = capped.alias("a")
    b = capped.alias("b")
    edges = (
        a.join(b, "hr")
        .filter(F.col("a.user_id") < F.col("b.user_id"))
        .groupBy(
            F.col("a.user_id").alias("u1"), F.col("b.user_id").alias("u2")
        )
        .agg(F.count("*").alias("co"))
        .orderBy(F.desc("co"), F.asc("u1"), F.asc("u2"))
        .limit(EDGE_TOP_K)
        .select("u1", "u2")
        .cache()
    )
    sym = edges.select(
        F.col("u1").alias("u"), F.col("u2").alias("v")
    ).unionAll(edges.select(F.col("u2").alias("u"), F.col("u1").alias("v")))

    w_mode = Window.partitionBy("user_id").orderBy(
        F.desc("cnt"), F.asc("event_type")
    )
    seeds = (
        e.filter(F.col("user_id") % SEED_MOD == 0)
        .groupBy("user_id", "event_type")
        .agg(F.count("*").alias("cnt"))
        .withColumn("rn", F.row_number().over(w_mode))
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("label"))
        .cache()
    )

    def propagate(labels: DataFrame) -> DataFrame:
        """Majority neighbor label for users NOT in ``labels``."""
        w_vote = Window.partitionBy("u").orderBy(
            F.desc("votes"), F.asc("label")
        )
        return (
            sym.join(
                labels.select(F.col("user_id").alias("v"), "label"), "v"
            )
            .join(
                labels.select(F.col("user_id").alias("u")),
                "u",
                "left_anti",
            )
            .groupBy("u", "label")
            .agg(F.count("*").alias("votes"))
            .withColumn("rn", F.row_number().over(w_vote))
            .filter(F.col("rn") == 1)
            .select(F.col("u").alias("user_id"), "label")
        )

    r1 = propagate(seeds).cache()
    known = seeds.unionAll(r1)
    r2 = propagate(known)
    users = hu.select("user_id").distinct()
    return (
        users.join(
            seeds.select("user_id", F.col("label").alias("l0")),
            "user_id",
            "left",
        )
        .join(
            r1.select("user_id", F.col("label").alias("l1")),
            "user_id",
            "left",
        )
        .join(
            r2.select("user_id", F.col("label").alias("l2")),
            "user_id",
            "left",
        )
        .select(
            "user_id",
            F.coalesce("l0", "l1", "l2").alias("label"),
            F.when(F.col("l0").isNotNull(), 0)
            .when(F.col("l1").isNotNull(), 1)
            .when(F.col("l2").isNotNull(), 2)
            .cast("int")
            .alias("rnd"),
        )
    )


def _markov_sql() -> str:
    """The shared verbatim stationary-distribution SQL (both engines).

    Fixed-point power method: transition probabilities and the state
    vector live in integer micro-units (×1e6); every matvec component
    is ``(Σᵢ vᵢ·pᵢⱼ − (Σ % 1e6)) / 1e6`` — floor division spelled
    without ``//``/``DIV`` so the identical text parses on Spark and
    DuckDB, and exact in both (the dividend is a multiple of 1e6
    below 2⁵³). No aggregation inside the recursive term (neither
    engine allows it): the K×K matrix is pivoted to ONE row in the
    non-recursive prelude, so each iteration is a 1×1 cross join.
    """
    ts = MARKOV_TYPES
    m_cols = ",\n            ".join(
        f"CAST(sum(CASE WHEN f = '{f}' AND t = '{t}' THEN pm ELSE 0 END)"
        f" AS BIGINT) AS p_{f}_{t}"
        for f in ts
        for t in ts
    )
    v0 = _MICRO // len(ts)
    anchor = ", ".join(
        f"CAST({v0} AS BIGINT) AS v_{t}" for t in ts
    )

    def matvec(t: str) -> str:
        s = " + ".join(f"v_{f} * p_{f}_{t}" for f in ts)
        return (
            f"CAST((({s}) - (({s}) % {_MICRO})) / {_MICRO} AS BIGINT)"
            f" AS v_{t}"
        )

    steps = ",\n               ".join(matvec(t) for t in ts)
    # The explicit outer DOUBLE cast pins the shared text's result
    # type on BOTH engines (Spark types floor(x)/1e6.0 as DECIMAL,
    # DuckDB as DOUBLE; the value is identical either way).
    finals = "\n    UNION ALL ".join(
        f"SELECT '{t}' AS event_type, v_{t} AS stationary_micro, CAST("
        + sql_half_up(f"CAST(v_{t} AS DOUBLE) / {_MICRO}.0", 6)
        + f" AS DOUBLE) AS stationary_p FROM final"
        for t in ts
    )
    in_list = ", ".join(f"'{t}'" for t in ts)
    return f"""
WITH RECURSIVE seq AS (
    SELECT user_id, event_type,
           lead(event_type) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS nxt
    FROM events WHERE event_type IN ({in_list})
),
tc AS (
    SELECT event_type AS f, nxt AS t, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE nxt IS NOT NULL GROUP BY f, t
),
tot AS (SELECT f, CAST(sum(n) AS BIGINT) AS tn FROM tc GROUP BY f),
p AS (
    SELECT tc.f, tc.t,
           CAST((tc.n * {_MICRO} - (tc.n * {_MICRO}) % tot.tn) / tot.tn
                AS BIGINT) AS pm
    FROM tc JOIN tot ON tot.f = tc.f
),
m AS (SELECT {m_cols}
      FROM p),
iter AS (
    SELECT CAST(0 AS INT) AS it, {anchor}
  UNION ALL
    SELECT CAST(it + 1 AS INT),
               {steps}
    FROM iter CROSS JOIN m WHERE it < {MARKOV_ITERS}
),
final AS (SELECT * FROM iter WHERE it = {MARKOV_ITERS})
{finals}
"""


_MARKOV_SQL = _markov_sql()


@query("q_events_markov_stationary", oracle=_MARKOV_SQL)
def q_events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the per-user event-type Markov
    chain — where the behavioral mix settles if users keep acting
    like the observed transition matrix (complements the one-step
    transition probabilities exhibit): 20 power-method iterations
    from the uniform vector, entirely in fixed-point integer
    micro-units, so the result (down to every micro-unit) is
    bit-identical cross-engine (the oracle's ``WITH RECURSIVE`` and
    the engine's integer loop are the same arithmetic by
    construction).

    Scale shape: the only data-bounded work is the transition count
    (one window over user-partitioned sequences + one hash aggregate
    — the same shape the existing transition exhibit pins); the
    power iteration touches only the CODE-CONSTANT K×K matrix, so
    its cost is independent of corpus size.
    """
    # The oracle runs the WITH RECURSIVE text above; Spark executes
    # the same arithmetic in two stages instead, because Spark's
    # recursive-CTE implementation RE-EVALUATES the non-recursive
    # prelude (the full events scan + window) on every iteration —
    # measured 90 s for 20 iterations vs ~1 s for this split. The
    # data-bounded stage (transition counts) stays distributed; the
    # K×K micro-unit matrix (≤25 longs, bounded by the DECLARED state
    # space, same contract as the IVF codebook collect in
    # similarity.py) iterates driver-side in exact Python integers —
    # bit-identical to the oracle's recursion by construction.
    import math

    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(*MARKOV_TYPES)
    )
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tc = (
        e.select(
            F.col("event_type").alias("f"),
            F.lead("event_type").over(w_seq).alias("t"),
        )
        .filter(F.col("t").isNotNull())
        .groupBy("f", "t")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    counts = {(r["f"], r["t"]): r["n"] for r in tc.collect()}
    tot = {f: sum(n for (ff, _), n in counts.items() if ff == f)
           for f in MARKOV_TYPES}
    pm = {
        (f, t): counts.get((f, t), 0) * _MICRO // tot[f]
        for f in MARKOV_TYPES
        for t in MARKOV_TYPES
        if tot.get(f)
    }
    v = {t: _MICRO // len(MARKOV_TYPES) for t in MARKOV_TYPES}
    for _ in range(MARKOV_ITERS):
        v = {
            t: sum(v[f] * pm.get((f, t), 0) for f in MARKOV_TYPES) // _MICRO
            for t in MARKOV_TYPES
        }
    rows = [
        (t, v[t], math.floor(v[t] / _MICRO * _MICRO + 0.5) / _MICRO)
        for t in MARKOV_TYPES
    ]
    return spark.createDataFrame(
        rows, "event_type string, stationary_micro bigint, stationary_p double"
    )
