"""B7 — set operations (UNION [ALL] / INTERSECT [ALL] / EXCEPT [ALL]).

Multiplicity matters: the ALL variants are hash-checked including
duplicate counts, the distinct variants deduplicate. Spark plans the
distinct variants as aggregates over the union and the ALL variants
with a count-tagged expand — both shuffle once on the full row, which
is the correct (and only) distributed strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frafka_spark.io import table
from frafka_spark.registry import query

# Two overlapping customer-key sets: urgent-order customers and
# finished-order customers (overlap guaranteed).
_URGENT = "SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'"
_FINISHED = "SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'"


def _sides(spark: SparkSession, sf_dir: str):
    o = table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    finished = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return urgent, finished


@query("q_union_all", oracle=f"{_URGENT} UNION ALL {_FINISHED}")
def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL: bag union, duplicates preserved."""
    urgent, finished = _sides(spark, sf_dir)
    return urgent.unionAll(finished)


@query("q_union", oracle=f"{_URGENT} UNION {_FINISHED}")
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct): set union."""
    urgent, finished = _sides(spark, sf_dir)
    return urgent.union(finished).distinct()


@query("q_intersect", oracle=f"{_URGENT} INTERSECT {_FINISHED}")
def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct)."""
    urgent, finished = _sides(spark, sf_dir)
    return urgent.intersect(finished)


@query("q_intersect_all", oracle=f"{_URGENT} INTERSECT ALL {_FINISHED}")
def q_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL: bag intersection (min multiplicity)."""
    urgent, finished = _sides(spark, sf_dir)
    return urgent.intersectAll(finished)


@query("q_except", oracle=f"{_URGENT} EXCEPT {_FINISHED}")
def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct)."""
    urgent, finished = _sides(spark, sf_dir)
    return urgent.subtract(finished)


@query("q_except_all", oracle=f"{_URGENT} EXCEPT ALL {_FINISHED}")
def q_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL: bag difference (multiplicity subtraction)."""
    urgent, finished = _sides(spark, sf_dir)
    return urgent.exceptAll(finished)
