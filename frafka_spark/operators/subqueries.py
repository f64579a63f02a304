"""Subqueries and CTEs — Catalyst decorrelation surface (SURVEY §4.2).

The reference has no query language at all; these pin the SQL-entry
path (``spark.sql``) and the analyzer rewrites that make correlated
subqueries distributable: scalar subqueries become left joins on the
correlation key, IN/EXISTS become semi joins — no per-row re-execution
exists at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frafka_spark.io import register_views, table
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


# Shared verbatim by engine and oracle (dialect-neutral: integer
# parent derivation via (k - k%10)/10, concat's implicit casts).
_RECURSIVE_SQL = """
WITH RECURSIVE chain AS (
    SELECT c_custkey AS key, c_custkey AS root, 0 AS depth,
           concat('', c_custkey) AS path
    FROM customer WHERE c_custkey < 10
  UNION ALL
    SELECT c.c_custkey, ch.root, ch.depth + 1,
           concat(ch.path, '/', c.c_custkey)
    FROM customer c JOIN chain ch
      ON CAST((c.c_custkey - c.c_custkey % 10) / 10 AS BIGINT) = ch.key
     AND c.c_custkey >= 10
)
SELECT key, root, CAST(depth AS INT) AS depth, path
FROM chain
"""


@query("q_cte_recursive", oracle=_RECURSIVE_SQL)
def q_cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive hierarchy walk — parent(k) = k div 10, roots below
    10 — carrying root id, depth, and the materialized path. The
    oracle states it as the natural ``WITH RECURSIVE`` (org-chart/BOM
    traversal); the engine computes the identical fixpoint in CLOSED
    FORM, because this hierarchy is arithmetic: dropping the last
    decimal digit IS ``k div 10`` for non-negative keys, so a key's
    ancestor chain is exactly its decimal-string prefixes, its depth
    is ``digits(k) − 1``, its root the leading digit, and the
    materialized path the prefixes joined root-first. Membership in
    the recursive fixpoint is then a per-key predicate — EVERY proper
    prefix exists as a customer key — checked by ONE exploded
    semi-join (key, ancestor-prefix) ⋈ customer keys with a
    count-of-matches == digits−1 test (keys below 10 are anchors and
    need no check; customer keys are unique, so count equals
    distinct-match). Proven row-identical to the recursive statement
    (exceptAll 0 both directions; the oracle re-proves it every run).

    Scale shape: the ``WITH RECURSIVE`` execution re-scans and
    re-joins customer once per level — ⌈log₁₀(key range)⌉ sequential
    iterations, each a full scan + shuffle + union-loop barrier
    (measured 1.65 s at sf0.1, 4.5× the rewrite). The closed form is
    ONE scan, one ≤⌈log₁₀⌉-way in-row explode, one hash semi-join and
    one aggregate — constant number of shuffles at ANY depth/scale
    (guide §2.4/§3.2). The general engine construct (iterate until a
    fixpoint with the level-limit guard) is still exercised: the
    oracle runs it, and q_llm_pack's recursive-CTE oracle does too.
    """
    c = table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("key"))
    s = F.col("key").cast("string")
    keyed = c.select("key", s.alias("s"), F.length(s).alias("n"))
    ancestors = keyed.filter(F.col("n") > 1).select(
        "key",
        F.explode(
            F.expr(
                "transform(sequence(1, n - 1),"
                " i -> CAST(substring(s, 1, i) AS BIGINT))"
            )
        ).alias("anc"),
    )
    matched = (
        ancestors.join(c.select(F.col("key").alias("anc")), "anc")
        .groupBy("key")
        .agg(F.count("*").alias("m"))
    )
    # Anchors (n == 1) pass unconditionally; deeper keys need every
    # proper prefix present. A missing-join NULL m correctly fails
    # the equality, dropping keys with absent ancestors.
    qualified = keyed.join(matched, "key", "left").filter(
        (F.col("n") == 1) | (F.col("m") == F.col("n") - 1)
    )
    return qualified.select(
        "key",
        F.expr("CAST(substring(s, 1, 1) AS BIGINT)").alias("root"),
        (F.col("n") - 1).cast("int").alias("depth"),
        F.expr(
            "concat_ws('/', transform(sequence(1, n), i -> substring(s, 1, i)))"
        ).alias("path"),
    )


_LATERAL_SQL = """
SELECT c.c_custkey, c.c_name, l.o_orderkey, l.price
FROM customer c,
LATERAL (
    SELECT o_orderkey, round(o_totalprice, 4) AS price
    FROM orders o
    WHERE o.o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 2
) l
"""


@query("q_join_lateral", oracle=_LATERAL_SQL)
def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: each customer's top-2 orders by
    price, written as the SQL-standard lateral derived table (the
    construct APPLY/CROSS JOIN LATERAL users reach for) rather than
    the window formulation ``q_topk_per_group`` already pins.

    The parity point is the PLANNER, not the semantics: a naive
    engine re-executes the subquery per outer row; Catalyst
    decorrelates the LATERAL-with-LIMIT into a per-key ranking over
    ONE orders scan (DecorrelateInnerQuery — same physical shape as
    the window top-k), so the identical statement stays a two-scan
    hash join at any scale. Deterministic via the (price DESC,
    orderkey ASC) total order; customers without orders drop (inner
    lateral join semantics, also pinned).
    """
    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)
