"""B6 — sorts, limits, top-k.

The driver's value hash is order-insensitive, so sort correctness is
encoded as *data*: a ``row_number`` position column proves the total
order, and top-k queries prove the selected set. Every order carries
a unique tiebreak (SURVEY.md §2 rule 2).

Physical notes: ``orderBy().limit(k)`` becomes
``TakeOrderedAndProject`` — each task keeps a k-heap and the driver
merges, no global sort, which is exactly the 100 TB-safe plan.
Top-k *per group* is the window + ``row_number() <= k`` pattern: one
shuffle on the group key, per-partition sort, no global anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from frafka_spark.io import table
from frafka_spark.registry import query


@query(
    "q_sort_multi",
    oracle="""
    WITH s AS (
        SELECT s_suppkey, s_name,
               nullif(s_nationkey, 3) AS nk,
               round(s_acctbal, 4) AS bal
        FROM supplier
    )
    SELECT s_suppkey, s_name, nk, bal,
           row_number() OVER (
               ORDER BY nk DESC NULLS LAST, bal ASC, s_suppkey ASC
           ) AS sort_pos
    FROM s
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort (desc nulls-last, asc) encoded as a position column.

    Routed through ``range_partitioned_row_number`` rather than a
    bare ``Window.orderBy(...)``: supplier scales with SF (1B rows
    at SF100k), and the bare global window funnels every row through
    ONE task. The range formulation keeps the same total order —
    sort expressions (desc-nulls-last included) pass straight
    through to the range partitioner — with distributed state.
    """
    from frafka_spark.operators.windows import range_partitioned_row_number

    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_name",
        F.nullif(F.col("s_nationkey"), F.lit(3)).alias("nk"),
        F.round("s_acctbal", 4).alias("bal"),
    )
    return range_partitioned_row_number(
        s,
        [F.col("nk").desc_nulls_last(), F.col("bal").asc(), F.col("s_suppkey").asc()],
        out="sort_pos",
        memo=(spark, sf_dir, "sort_multi_ranked"),
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT → TakeOrderedAndProject (per-task k-heaps)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 4).alias("price"))
    )


@query(
    "q_topk_per_group",
    oracle="""
    WITH ranked AS (
        SELECT c_mktsegment, c_custkey, c_name, round(c_acctbal, 4) AS bal,
               row_number() OVER (
                   PARTITION BY c_mktsegment
                   ORDER BY c_acctbal DESC, c_custkey ASC
               ) AS rn
        FROM customer
    )
    SELECT c_mktsegment, c_custkey, c_name, bal, rn
    FROM ranked WHERE rn <= 5
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 richest customers per market segment (window + filter)."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 4).alias("bal"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 5)
    )


@query(
    "q_sort_skyline",
    oracle="""
    SELECT x.p_partkey, x.p_size, round(x.p_retailprice, 4) AS price
    FROM part x
    WHERE NOT EXISTS (
        SELECT 1 FROM part y
        WHERE y.p_retailprice <= x.p_retailprice
          AND y.p_size >= x.p_size
          AND (y.p_retailprice < x.p_retailprice OR y.p_size > x.p_size)
    )
    """,
)
def q_sort_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts not dominated on
    (minimize retail price, maximize size) — the multi-objective
    curation filter ("keep only documents no other beats on both
    quality and length" runs this exact operator).

    The oracle states dominance declaratively (NOT EXISTS — a
    quadratic anti-join, fine for the reference engine); the Spark
    side uses the O(n) two-pass identity instead: a part survives
    iff its price equals the min price AT its size and beats the min
    price at every STRICTLY LARGER size, i.e.

        survive(x)  <=>  price(x) = m(size(x))  AND
                         price(x) < m_strict(size(x))

    where m is the per-size min and m_strict the strict-suffix min
    over sizes. Duplicates of a frontier point all survive (no
    strict part of the dominance test separates them) — on both
    formulations.

    Scale shape: one partial-agg group-by collapses data to the size
    vocabulary (bounded domain); the strict-suffix min is a
    vocabulary-sized broadcast self-join (window-free); the final
    test is a broadcast hash join against the spine — the big
    relation is scanned twice, shuffled never.
    """
    p = table(spark, sf_dir, "part")
    spine = p.groupBy("p_size").agg(F.min("p_retailprice").alias("minp"))
    s = spine.alias("s")
    t = spine.alias("t")
    strict = (
        s.join(F.broadcast(t), F.col("t.p_size") > F.col("s.p_size"), "left")
        .groupBy(F.col("s.p_size").alias("p_size"), F.col("s.minp").alias("minp"))
        .agg(F.min(F.col("t.minp")).alias("m_strict"))
    )
    return (
        p.join(F.broadcast(strict), "p_size")
        .filter(
            (F.col("p_retailprice") == F.col("minp"))
            & (
                F.col("m_strict").isNull()
                | (F.col("p_retailprice") < F.col("m_strict"))
            )
        )
        .select(
            "p_partkey", "p_size", F.round("p_retailprice", 4).alias("price")
        )
    )
