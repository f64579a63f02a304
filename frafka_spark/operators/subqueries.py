"""Subqueries and CTEs — Catalyst decorrelation surface (SURVEY §4.2).

The reference has no query language at all; these pin the SQL-entry
path (``spark.sql``) and the analyzer rewrites that make correlated
subqueries distributable: scalar subqueries become left joins on the
correlation key, IN/EXISTS become semi joins — no per-row re-execution
exists at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from frafka_spark.io import register_views
from frafka_spark.registry import query

_SCALAR_SQL = """
SELECT c.c_custkey, c.c_name,
       round(c.c_acctbal, 4) AS bal,
       round((SELECT avg(c2.c_acctbal) FROM customer c2
              WHERE c2.c_nationkey = c.c_nationkey), 4) AS nation_avg,
       (c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)) AS above_avg
FROM customer c
"""


@query("q_subquery_scalar", oracle=_SCALAR_SQL)
def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (decorrelated to an aggregate+join)."""
    register_views(spark, sf_dir)
    return spark.sql(_SCALAR_SQL)


_IN_SQL = """
SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS price
FROM orders
WHERE o_custkey IN (
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'
)
  AND o_orderkey NOT IN (
    SELECT l_orderkey FROM lineitem WHERE l_quantity >= 49
)
"""


@query("q_subquery_in", oracle=_IN_SQL)
def q_subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / NOT IN subqueries (planned as semi / null-aware anti joins)."""
    register_views(spark, sf_dir)
    return spark.sql(_IN_SQL)


_CTE_SQL = """
WITH spend AS (
    SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(38,6))) AS total
    FROM orders GROUP BY o_custkey
),
ranked AS (
    SELECT o_custkey, CAST(total AS DOUBLE) AS total,
           row_number() OVER (ORDER BY total DESC, o_custkey ASC) AS rnk
    FROM spend
)
SELECT r.rnk, r.o_custkey, c.c_name, round(r.total, 4) AS total_spent
FROM ranked r JOIN customer c ON c.c_custkey = r.o_custkey
WHERE r.rnk <= 25
"""


@query("q_cte", oracle=_CTE_SQL)
def q_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained CTEs feeding a windowed top-N + dimension join."""
    register_views(spark, sf_dir)
    return spark.sql(_CTE_SQL)
