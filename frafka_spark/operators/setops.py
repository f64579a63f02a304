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


@query(
    "q_union_by_name",
    oracle="""
    SELECT c_custkey AS entity_key, c_acctbal AS balance,
           c_mktsegment AS segment, NULL AS priority
    FROM customer WHERE c_acctbal > 9000
    UNION ALL BY NAME
    SELECT o_orderpriority AS priority, o_custkey AS entity_key,
           o_totalprice AS balance
    FROM orders WHERE o_totalprice > 300000
    """,
)
def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two relations with REORDERED and
    PARTIALLY OVERLAPPING columns combined by column NAME, absent
    columns null-filled — ``unionByName(allowMissingColumns=True)``
    on the engine, DuckDB's ``UNION ALL BY NAME`` as the oracle.
    This is the union a lakehouse actually runs (shards written
    across schema versions drift in column order and presence);
    positional UNION ALL would silently mis-bind or reject.

    Scale shape: same as any union — no shuffle, the branches
    concatenate partition-wise; the name resolution is purely
    analysis-time.
    """
    hi_cust = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(
            F.col("c_custkey").alias("entity_key"),
            F.col("c_acctbal").alias("balance"),
            F.col("c_mktsegment").alias("segment"),
        )
    )
    big_orders = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 300000)
        .select(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_custkey").alias("entity_key"),
            F.col("o_totalprice").alias("balance"),
        )
    )
    return hi_cust.unionByName(big_orders, allowMissingColumns=True)
