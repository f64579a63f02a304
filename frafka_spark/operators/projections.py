"""B2 — projection, computed columns, predicates, null semantics.

In the reference all record interpretation happens in user transform
code between Receive and Send [upstream: frizzle README § usage —
SURVEY.md §2 Tier A13]; here it is declarative columns that Catalyst
folds into the scan's projection.

Null note: the fixtures contain no NULLs (FIXTURES.md), so
``q_filter_null`` synthesizes them with ``nullif`` identically on the
engine and oracle sides, then exercises IS NULL / IS NOT NULL /
null-safe equality (Spark ``<=>`` ↔ SQL ``IS NOT DISTINCT FROM``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frafka_spark.io import table
from frafka_spark.registry import query


@query(
    "q_project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 6) AS revenue,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 8) AS charge,
           CAST(l_quantity > 25 AS BOOLEAN) AS bulky
    FROM lineitem
    """,
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed columns: arithmetic over row values."""
    li = table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # Inputs have exact 2-decimal values, so these products are exact at
        # 4/6 decimals — rounding 2 digits beyond that is an identity round
        # on both engines (no tie-breaking divergence; see determinism.py).
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 6).alias("revenue"),
        F.round(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
            8,
        ).alias("charge"),
        (F.col("l_quantity") > 25).alias("bulky"),
    )


@query(
    "q_filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, round(o_totalprice, 4) AS price
    FROM orders
    WHERE (o_orderstatus IN ('F', 'P') OR o_totalprice > 150000.0)
      AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                          AND TIMESTAMP '1998-12-31 00:00:00'
      AND NOT (o_orderpriority = '5-LOW')
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND/OR/NOT, IN, BETWEEN over dates."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus").isin("F", "P") | (F.col("o_totalprice") > 150000.0))
        & F.col("o_orderdate").between("1996-01-01", "1998-12-31")
        & ~(F.col("o_orderpriority") == "5-LOW")
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.round("o_totalprice", 4).alias("price"),
    )


@query(
    "q_filter_like",
    oracle=r"""
    SELECT p_partkey, p_name, p_type, p_brand
    FROM part
    WHERE p_type LIKE 'PROMO%'
       OR (p_name LIKE '%gold%' AND p_brand NOT LIKE '%#1')
       OR regexp_matches(p_type, '^STANDARD (BRUSHED|POLISHED)')
    """,
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / NOT LIKE / regexp predicates."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("PROMO%")
        | (F.col("p_name").like("%gold%") & ~F.col("p_brand").like("%#1"))
        | F.col("p_type").rlike("^STANDARD (BRUSHED|POLISHED)")
    ).select("p_partkey", "p_name", "p_type", "p_brand")


@query(
    "q_filter_null",
    oracle="""
    WITH c AS (
        SELECT c_custkey,
               nullif(c_mktsegment, 'BUILDING') AS seg,
               nullif(round(c_acctbal, 4), 0.0) AS bal
        FROM customer
    )
    SELECT c_custkey, seg, bal,
           (seg IS NULL) AS seg_is_null,
           coalesce(seg, 'NONE') AS seg_filled,
           (seg IS NOT DISTINCT FROM 'MACHINERY') AS null_safe_eq
    FROM c
    WHERE seg IS NULL OR seg IS NOT NULL  -- tautology: keep all rows incl. nulls
    """,
)
def q_filter_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null semantics over synthesized nulls (fixtures have none)."""
    c = table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    withseg = c.select(
        "c_custkey",
        seg.alias("seg"),
        F.nullif(F.round("c_acctbal", 4), F.lit(0.0)).alias("bal"),
    )
    return withseg.select(
        "c_custkey",
        "seg",
        "bal",
        F.col("seg").isNull().alias("seg_is_null"),
        F.coalesce("seg", F.lit("NONE")).alias("seg_filled"),
        F.col("seg").eqNullSafe("MACHINERY").alias("null_safe_eq"),
    ).filter(F.col("seg").isNull() | F.col("seg").isNotNull())
