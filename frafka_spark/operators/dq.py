"""Declarative data-quality rules, evaluated in ONE scan — the
Deequ/Great-Expectations genre re-expressed as a single Spark
aggregate (SURVEY.md §2 B10-ext: pipeline-hygiene operators a
training-data engine runs before anything else touches a corpus).

The shape that matters at 100 TB: N constraints must cost ONE pass.
Each rule compiles to one aggregate expression (count / conditional
count) over the same scan, so the physical plan is a single
parquet read + one (partial-combined) aggregate no matter how many
rules are declared — never one job per rule. The lone wide measure is
the exact-uniqueness count-distinct, which Spark plans as an Expand
over the same scan (still one read; an HLL `approx_count_distinct`
drops even that for monitoring-grade checks, and the exact per-key
violation LIST — which rows are duplicated — is the separate
`q_agg_fd_audit` genre).

Output is the audit table a pipeline gates on: one row per rule with
the observed satisfying-row count, the total row count, and the pass
verdict (observed == total) — all exact longs/booleans, so the DuckDB
differential is tie-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frafka_spark.io import table
from frafka_spark.registry import query

#: price-range rule bound — deliberately BELOW the corpus max so the
#: rule demonstrably FAILS and the verdict column carries both values
PRICE_HI = 200_000.0


@query(
    "q_agg_dq_rules",
    oracle=f"""
    WITH m AS (
      SELECT CAST(count(*) AS BIGINT) AS total,
             CAST(count(o_custkey) AS BIGINT) AS m_notnull,
             CAST(count(DISTINCT o_orderkey) AS BIGINT) AS m_unique,
             CAST(sum(CASE WHEN o_totalprice BETWEEN 0 AND {PRICE_HI}
                           THEN 1 ELSE 0 END) AS BIGINT) AS m_range,
             CAST(sum(CASE WHEN o_orderstatus IN ('F', 'O')
                           THEN 1 ELSE 0 END) AS BIGINT) AS m_set,
             CAST(sum(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-')
                           THEN 1 ELSE 0 END) AS BIGINT) AS m_pattern
      FROM orders
    )
    SELECT 'not_null:o_custkey' AS rule, m_notnull AS observed,
           total, m_notnull = total AS passed FROM m
    UNION ALL SELECT 'unique:o_orderkey', m_unique, total,
           m_unique = total FROM m
    UNION ALL SELECT 'range:o_totalprice[0,200000]', m_range, total,
           m_range = total FROM m
    UNION ALL SELECT 'in_set:o_orderstatus(F,O)', m_set, total,
           m_set = total FROM m
    UNION ALL SELECT 'pattern:o_orderpriority[1-5]-', m_pattern, total,
           m_pattern = total FROM m
    """,
)
def q_agg_dq_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five data-quality constraints over orders — completeness
    (not-null), exact uniqueness, numeric range, value-set membership,
    regex pattern — compiled into ONE aggregate over ONE scan, emitted
    as the audit table (rule, observed, total, passed). The range and
    set rules are tuned to FAIL on the fixture (prices above the
    bound, a third order status), so the verdict path is exercised,
    not just the all-green one.

    Exactness: observed/total are exact longs (conditional counts);
    ``passed`` is their equality — no floats anywhere, so the
    cross-engine hash is tie-free by construction.

    Scale shape: rule count is plan width, not pass count — all five
    measures ride one parquet read with map-side partial aggregation;
    the one-row result then unpivots driver-free via ``stack``. The
    exact count-distinct plans as an Expand on the same scan (the
    documented price of exactness; HLL is the monitoring-grade
    alternative). Adding a sixth rule at 100 TB costs one more
    expression, not one more job.
    """
    o = table(spark, sf_dir, "orders")
    agg = o.agg(
        F.count(F.lit(1)).cast("bigint").alias("total"),
        F.count("o_custkey").cast("bigint").alias("m_notnull"),
        F.countDistinct("o_orderkey").cast("bigint").alias("m_unique"),
        F.sum(
            F.when(
                F.col("o_totalprice").between(0.0, PRICE_HI), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("m_range"),
        F.sum(
            F.when(F.col("o_orderstatus").isin("F", "O"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("m_set"),
        F.sum(
            F.when(
                F.col("o_orderpriority").rlike("^[1-5]-"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("m_pattern"),
    )
    return agg.selectExpr(
        """stack(5,
           'not_null:o_custkey', m_notnull,
           'unique:o_orderkey', m_unique,
           'range:o_totalprice[0,200000]', m_range,
           'in_set:o_orderstatus(F,O)', m_set,
           'pattern:o_orderpriority[1-5]-', m_pattern
        ) as (rule, observed)""",
        "total",
    ).withColumn("passed", F.col("observed") == F.col("total"))
