"""B1 — scans with column pruning and predicate pushdown.

frafka's only "scan" is consuming raw Kafka messages
[upstream: frafka/source.go § Receive — SURVEY.md §2 Tier A2]; the
batch analog is the parquet scan. Both queries here are deliberately
shaped so Catalyst pushes the work into the scan node: a projection
that prunes to 3 of 11 lineitem columns (ReadSchema shows only those)
and a filter that lands in PushedFilters. ``tests/test_plans.py``
asserts both. At 100 TB this is the difference between reading ~27%
of the table bytes and reading all of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frafka_spark.io import table
from frafka_spark.registry import query


@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_extendedprice, 4) AS price
    FROM lineitem
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan + column pruning: 3 of 11 columns read."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 4).alias("price"),
    )


@query(
    "q_scan_filter_pushdown",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00'
      AND l_quantity > 45.0
    """,
)
def q_scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan with predicate pushed into the parquet reader."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("2000-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 45.0)
    ).select("l_orderkey", "l_linenumber", "l_quantity")
