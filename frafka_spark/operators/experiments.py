"""Experimentation statistics: the A/B-test readout every
event-analytics engine ends up serving (complementing the drift/
hypothesis family in ``stats_tests.py``: KS, Mann-Whitney,
Spearman, ANOVA, χ²).

Deterministic-assignment discipline: the variant split is
``user_id % 2`` — a code-level hash split, reproducible on both
engines (a real system salts the id; the arithmetic is identical).
All moments are computed as exact integers (per-user event counts,
their sums and sums of squares), so means/variances/z are single
double chains from identical integers — bit-identical cross-engine,
rounded only at the display edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frafka_spark.functions.determinism import (
    half_up,
    round_z,
    sql_half_up,
    sql_round_z,
)
from frafka_spark.io import table
from frafka_spark.registry import query


@query(
    "q_events_ab_test",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x
        FROM events GROUP BY user_id
    ),
    m AS (
        SELECT
            CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_a,
            CAST(sum(CASE WHEN user_id % 2 = 0 THEN x ELSE 0 END) AS BIGINT)
                AS sx_a,
            CAST(sum(CASE WHEN user_id % 2 = 0 THEN x * x ELSE 0 END)
                 AS BIGINT) AS sxx_a,
            CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_b,
            CAST(sum(CASE WHEN user_id % 2 = 1 THEN x ELSE 0 END) AS BIGINT)
                AS sx_b,
            CAST(sum(CASE WHEN user_id % 2 = 1 THEN x * x ELSE 0 END)
                 AS BIGINT) AS sxx_b
        FROM per_user
    )
    SELECT n_a, n_b,
           {sql_half_up('CAST(sx_a AS DOUBLE) / n_a', 4)} AS mean_a,
           {sql_half_up('CAST(sx_b AS DOUBLE) / n_b', 4)} AS mean_b,
           {sql_half_up(
               'CAST(n_a * sxx_a - sx_a * sx_a AS DOUBLE)'
               ' / (CAST(n_a AS DOUBLE) * (n_a - 1))', 4)} AS var_a,
           {sql_half_up(
               'CAST(n_b * sxx_b - sx_b * sx_b AS DOUBLE)'
               ' / (CAST(n_b AS DOUBLE) * (n_b - 1))', 4)} AS var_b,
           {sql_round_z(
               'CAST(sx_a AS DOUBLE) / n_a - CAST(sx_b AS DOUBLE) / n_b',
               4)} AS diff,
           {sql_round_z(
               '(CAST(sx_a AS DOUBLE) / n_a - CAST(sx_b AS DOUBLE) / n_b)'
               ' / sqrt('
               '   CAST(n_a * sxx_a - sx_a * sx_a AS DOUBLE)'
               '   / (CAST(n_a AS DOUBLE) * (n_a - 1)) / n_a'
               ' + CAST(n_b * sxx_b - sx_b * sx_b AS DOUBLE)'
               '   / (CAST(n_b AS DOUBLE) * (n_b - 1)) / n_b)',
               4)} AS welch_z
    FROM m
    """,
)
def q_events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch two-sample test on per-user purchase counts between the
    deterministic ``user_id % 2`` variants: group sizes, means, sample
    variances, the mean difference, and the Welch z-statistic
    ``(x̄_A − x̄_B) / √(s²_A/n_A + s²_B/n_B)`` — the experiment
    readout primitive.

    Exactness: the three moments per group (n, Σx, Σx²) are integer
    aggregates of integer per-user counts; every derived value is ONE
    double chain from those integers (variance via the
    ``(nΣx² − (Σx)²) / (n·(n−1))`` form — no mean subtraction pass,
    so no float accumulation order anywhere), pinned half-up, with the
    sign-straddling diff/z through ``round_z`` (+0.0 normalization).

    Scale shape: per-user counts are one map-side-combined hash
    aggregate over events; the six group moments collapse in a second
    single-row aggregate (commutative sums — constant state per
    partition, one 6-long shuffle). Nothing else moves. At 10¹¹
    events this is two partial-agg passes, the same shape as
    q_agg_global.
    """
    per_user = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("x")
        )
    )
    is_a = F.col("user_id") % 2 == 0
    m = per_user.agg(
        F.sum(F.when(is_a, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(is_a, F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("sx_a"),
        F.sum(F.when(is_a, F.col("x") * F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("sxx_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(~is_a, F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("sx_b"),
        F.sum(F.when(~is_a, F.col("x") * F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("sxx_b"),
    )
    mean_a = F.col("sx_a").cast("double") / F.col("n_a")
    mean_b = F.col("sx_b").cast("double") / F.col("n_b")
    var_a = (
        (F.col("n_a") * F.col("sxx_a") - F.col("sx_a") * F.col("sx_a"))
        .cast("double")
        / (F.col("n_a").cast("double") * (F.col("n_a") - F.lit(1)))
    )
    var_b = (
        (F.col("n_b") * F.col("sxx_b") - F.col("sx_b") * F.col("sx_b"))
        .cast("double")
        / (F.col("n_b").cast("double") * (F.col("n_b") - F.lit(1)))
    )
    return m.select(
        "n_a",
        "n_b",
        half_up(mean_a, 4).alias("mean_a"),
        half_up(mean_b, 4).alias("mean_b"),
        half_up(var_a, 4).alias("var_a"),
        half_up(var_b, 4).alias("var_b"),
        round_z(mean_a - mean_b, 4).alias("diff"),
        round_z(
            (mean_a - mean_b)
            / F.sqrt(var_a / F.col("n_a") + var_b / F.col("n_b")),
            4,
        ).alias("welch_z"),
    )


@query(
    "q_events_ab_cuped",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(sum(CASE WHEN event_type = 'purchase'
                              AND ts < TIMESTAMP '2024-01-16'
                             THEN 1 ELSE 0 END) AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'purchase'
                              AND ts >= TIMESTAMP '2024-01-16'
                             THEN 1 ELSE 0 END) AS BIGINT) AS y
        FROM events GROUP BY user_id
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_a,
               CAST(sum(CASE WHEN user_id % 2 = 0 THEN x ELSE 0 END)
                    AS BIGINT) AS sx_a,
               CAST(sum(CASE WHEN user_id % 2 = 0 THEN y ELSE 0 END)
                    AS BIGINT) AS sy_a,
               CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_b,
               CAST(sum(CASE WHEN user_id % 2 = 1 THEN x ELSE 0 END)
                    AS BIGINT) AS sx_b,
               CAST(sum(CASE WHEN user_id % 2 = 1 THEN y ELSE 0 END)
                    AS BIGINT) AS sy_b
        FROM per_user
    )
    SELECT n_a, n_b,
           {{THETA}} AS theta,
           {{RAW}} AS raw_diff,
           {{ADJ}} AS adj_diff,
           {{VR}} AS var_reduction
    FROM m
    """.replace(
        "{THETA}",
        sql_round_z(
            "CAST(n * sxy - sx * sy AS DOUBLE)"
            " / CAST(n * sxx - sx * sx AS DOUBLE)",
            6,
        ),
    ).replace(
        "{RAW}",
        sql_round_z(
            "CAST(sy_a AS DOUBLE) / n_a - CAST(sy_b AS DOUBLE) / n_b", 4
        ),
    ).replace(
        "{ADJ}",
        sql_round_z(
            "(CAST(sy_a AS DOUBLE) / n_a"
            " - CAST(n * sxy - sx * sy AS DOUBLE)"
            "   / CAST(n * sxx - sx * sx AS DOUBLE)"
            "   * (CAST(sx_a AS DOUBLE) / n_a - CAST(sx AS DOUBLE) / n))"
            " - (CAST(sy_b AS DOUBLE) / n_b"
            " - CAST(n * sxy - sx * sy AS DOUBLE)"
            "   / CAST(n * sxx - sx * sx AS DOUBLE)"
            "   * (CAST(sx_b AS DOUBLE) / n_b - CAST(sx AS DOUBLE) / n))",
            4,
        ),
    ).replace(
        "{VR}",
        sql_half_up(
            "CAST(n * sxy - sx * sy AS DOUBLE)"
            " * (n * sxy - sx * sy)"
            " / CAST(n * sxx - sx * sx AS DOUBLE)"
            " / CAST(n * syy - sy * sy AS DOUBLE)",
            6,
        ),
    ),
)
def q_events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction (Deng et al. 2013, controlled
    pre-period covariate) for the ``user_id % 2`` experiment: the
    pre-period purchase count (Jan 1–15) adjusts the outcome period
    (Jan 16–31) via the pooled regression coefficient
    ``θ = cov(X,Y)/var(X)``, shrinking the arm-mean difference toward
    what the experiment would have shown with pre-period imbalance
    removed. Emits θ, the raw and adjusted mean differences, and the
    achieved variance-reduction fraction ``ρ² = cov²/(var_x·var_y)``.

    Exactness: one pass of integer moments per user (x, y, x², y²,
    xy + per-arm conditionals), so θ and both diffs are single double
    chains over exact integers (the (nΣxy − ΣxΣy)-style lift clears
    every mean-subtraction float pass); all sign-straddling outputs
    ride round_z.

    Scale shape: identical to q_events_ab_test — one map-side-
    combined per-user aggregate, then a single-row aggregate of
    twelve longs. The entire covariate adjustment costs twelve
    numbers of shuffle, independent of event volume.
    """
    cutoff = F.lit("2024-01-16").cast("timestamp")
    is_p = F.col("event_type") == "purchase"
    per_user = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.when(is_p & (F.col("ts") < cutoff), 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
            F.sum(F.when(is_p & (F.col("ts") >= cutoff), 1).otherwise(0))
            .cast("bigint")
            .alias("y"),
        )
    )
    is_a = F.col("user_id") % 2 == 0
    m = per_user.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.when(is_a, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(is_a, F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("sx_a"),
        F.sum(F.when(is_a, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("sy_a"),
        F.sum(F.when(~is_a, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when(~is_a, F.col("x")).otherwise(0))
        .cast("bigint")
        .alias("sx_b"),
        F.sum(F.when(~is_a, F.col("y")).otherwise(0))
        .cast("bigint")
        .alias("sy_b"),
    )
    cov = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    var_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    var_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    theta = cov / var_x
    xbar = F.col("sx").cast("double") / F.col("n")
    ya = F.col("sy_a").cast("double") / F.col("n_a")
    yb = F.col("sy_b").cast("double") / F.col("n_b")
    xa = F.col("sx_a").cast("double") / F.col("n_a")
    xb = F.col("sx_b").cast("double") / F.col("n_b")
    return m.select(
        "n_a",
        "n_b",
        round_z(theta, 6).alias("theta"),
        round_z(ya - yb, 4).alias("raw_diff"),
        round_z(
            (ya - theta * (xa - xbar)) - (yb - theta * (xb - xbar)), 4
        ).alias("adj_diff"),
        half_up(
            cov
            * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / var_x
            / var_y,
            6,
        ).alias("var_reduction"),
    )
