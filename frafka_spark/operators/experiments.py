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
