"""Skew mitigation — salted joins (plans/scale_notes.md § joins).

AQE's skew-join split handles most skew automatically; salting is
the manual fallback for pathological keys (one user with 10⁹ events
joining a per-user dimension). The mechanics:

- fact side: append a random-but-deterministic salt (hash of row
  payload mod N) to the join key → the hot key's rows spread over N
  shuffle partitions;
- dim side: replicate each row N times (one per salt value);
- join on (key, salt), drop the salt.

Result-identical to the plain join (verified in
tests/test_misc_ops.py), shuffle-balanced at any skew.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "_fr_salt"


def salt_fact(df: DataFrame, n_salts: int, *payload_cols: str) -> DataFrame:
    """Add a deterministic salt derived from payload columns.

    Deterministic (hash, not rand()) so retried tasks salt
    identically — a rand() salt breaks exactly-once sinks under task
    retry.
    """
    cols = list(payload_cols) or df.columns
    return df.withColumn(
        SALT_COL, F.pmod(F.hash(*cols), F.lit(n_salts)).cast("int")
    )


def replicate_dim(df: DataFrame, n_salts: int) -> DataFrame:
    """Replicate each dimension row once per salt value."""
    return df.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the hot-key load spread over ``n_salts`` partitions.

    ``on`` is the ordinary join condition; the salt equality is added
    on top. The dim side is replicated, so prefer this only when the
    dim is small-ish and the fact key is skewed (otherwise broadcast
    or AQE already wins).
    """
    f = salt_fact(fact, n_salts)
    d = replicate_dim(dim, n_salts)
    joined = f.join(d, on & (f[SALT_COL] == d[SALT_COL]), how)
    return joined.drop(SALT_COL)


from pyspark.sql import SparkSession  # noqa: E402

from frafka_spark.functions.determinism import DEC, sql_dec_sum  # noqa: E402
from frafka_spark.io import table  # noqa: E402
from frafka_spark.registry import query  # noqa: E402


@query(
    "q_agg_salted",
    oracle=f"""
    SELECT l_returnflag,
           count(*) AS n,
           {sql_dec_sum('l_extendedprice')} AS sum_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage SALTED aggregation — the skewed-group-key mitigation
    as a declared, oracle-checked operator.

    ``l_returnflag`` has 3 values over the whole corpus: a plain
    groupBy sends every row for a flag to ONE reducer — the exact
    shape that stalls at 100 TB (a single hot partition does all the
    work while the cluster idles). The salted plan:

    1. stage 1 groups by (key, salt16) — the deterministic hash salt
       spreads each hot key over 16 partitions; partials stay exact
       (count + DECIMAL(38,6) sum, both mergeable);
    2. stage 2 merges the ≤ |keys|×16 partial rows by key — a
       near-free shuffle.

    The oracle is the PLAIN group-by, so the hash match proves
    salting is result-invisible. (Spark's partial aggregation already
    combines map-side, which usually suffices; explicit salting is
    for when combine ratios are poor — high-cardinality aggregation
    states like collect/distinct under a skewed key.)
    """
    li = table(spark, sf_dir, "lineitem")
    salted = salt_fact(li, 16, "l_orderkey", "l_linenumber")
    partial = salted.groupBy("l_returnflag", SALT_COL).agg(
        F.count("*").alias("pn"),
        F.sum(F.col("l_extendedprice").cast(DEC)).alias("ps"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"),
        F.sum("ps").cast("double").alias("sum_price"),
    )


@query(
    "q_join_salted",
    oracle="""
    WITH dim AS (
        SELECT event_type, count(*) AS n_type,
               sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS sum_cents
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN CAST(floor(e.value * 100 + 0.5) AS BIGINT)
                              * d.n_type > d.sum_cents
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_above
    FROM events e JOIN dim d ON d.event_type = e.event_type
    GROUP BY e.event_type
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted fact⋈dim join, DECLARED end-to-end: events join a
    5-row per-type dimension on ``event_type`` — a pathologically
    skewed key (each key owns ~20% of the fact) — through
    ``salted_join``: the fact side salts deterministically
    (hash-mod-8 of the row payload, retry-stable), the dim side
    replicates 8×, the join runs on (key, salt), and the result is
    provably identical to the plain join (the oracle IS the plain
    join). Above-mean flags compare exact integer cents × counts
    (``round(value·100)·n > Σcents``) so the threshold needs no
    cross-engine float mean.

    Scale shape: the hot key's rows spread over 8 shuffle partitions
    instead of one straggler task — the manual fallback when AQE's
    skew split can't help (e.g. the skewed side feeds a window, or
    the join is the first exchange). Cost: 8× the 5-row dim, nothing
    on the fact but one int column. The plan pin in
    ``tests/test_plans.py`` asserts the salt actually reaches the
    join keys.
    """
    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("cents"),
    )
    dim = e.groupBy(F.col("event_type").alias("d_type")).agg(
        F.count("*").alias("n_type"), F.sum("cents").alias("sum_cents")
    )
    joined = salted_join(
        e, dim, F.col("event_type") == F.col("d_type"), n_salts=8
    )
    return joined.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(
            F.when(
                F.col("cents") * F.col("n_type") > F.col("sum_cents"), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_above"),
    )


#: modulus for the hot-key funnel: lineitem rows whose orderkey is NOT
#: divisible by this collapse onto orderkey 1 → ~90% of the fact on
#: one join key, the canonical straggler-partition shape.
SKEW_HOT_MOD = 10


@query(
    "q_join_skewed",
    oracle=f"""
    SELECT o.o_orderpriority, l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS BIGINT)
               AS total_qty,
           CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM (SELECT CASE WHEN l_orderkey % {SKEW_HOT_MOD} <> 0
                      THEN 1 ELSE l_orderkey END AS hot_key,
                 l_returnflag, l_quantity, l_extendedprice
          FROM lineitem) l
    JOIN orders o ON o.o_orderkey = l.hot_key
    GROUP BY o.o_orderpriority, l.l_returnflag
    """,
)
def q_join_skewed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberately SKEWED orders⋈lineitem rollup — the engine-side
    skew fix (AQE's OptimizeSkewedJoin) as a declared, oracle-checked
    operator, completing the executed-layout trio (dpp / bucketed /
    fileskip) with the fourth runtime behavior.

    The fact funnels ~90% of lineitem through ONE join key (orderkeys
    not divisible by {SKEW_HOT_MOD} collapse onto orderkey 1 — a
    corpus-relative rule, identical arithmetic in the oracle), and the
    join carries a ``merge`` hint so the plan is a SortMergeJoin at
    any size — the shape where one shuffle partition would otherwise
    hold 90% of the table and a single straggler task does all the
    work. Under AQE with qualifying thresholds (production defaults:
    256 MB / factor 5; the runtime pin in tests/test_plans.py lowers
    them so fixture-scale bytes qualify) OptimizeSkewedJoin SPLITS
    that hot partition into advisory-sized slices at runtime —
    asserted on the executed plan's ``numSkewedSplits`` metric via
    ``plans/inspect.py:skew_split_metrics``. Salting
    (``q_join_salted``) remains the write-side fix for shapes AQE
    can't reach.

    Exactness: the oracle is the PLAIN join over the same funneled
    key — skew handling changes the partitioning, never the rows;
    counts are longs, quantity/price roll up as per-row half-up
    integers summed as BIGINTs.

    Scale shape: at 100 TB a hot key holding 90% of a fact is the
    difference between a 1000-task stage and one task running for
    hours; AQE's split needs no layout change and no query rewrite —
    exactly why it's the first knob, with salting as the fallback.

    The fact reads the repo's multi-file z-ordered lineitem layout
    (the ``q_scan_file_skip`` table, {N_ZFILES} files) rather than
    the single-row-group fixture parquet: AQE splits a skewed
    partition on MAPPER boundaries, and a one-file/one-row-group scan
    is a single mapper — unsplittable by construction, a fixture
    artifact no 100 TB table exhibits. Same rows either way (the
    oracle reads the flat fixture).
    """
    from frafka_spark.operators.fileskip import _ensure_layout
    from frafka_spark.sources.manifest_table import read_table

    zpath, _hi = _ensure_layout(spark, sf_dir)
    li = read_table(spark, zpath).select(
        F.when(
            F.col("l_orderkey") % SKEW_HOT_MOD != 0, F.lit(1).cast("bigint")
        )
        .otherwise(F.col("l_orderkey"))
        .alias("hot_key"),
        "l_returnflag",
        "l_quantity",
        "l_extendedprice",
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    return (
        li.hint("merge")
        .join(o, li["hot_key"] == o["o_orderkey"])
        .groupBy("o_orderpriority", "l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n_items"),
            F.sum(F.floor(F.col("l_quantity") + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("total_qty"),
            F.sum(
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )
