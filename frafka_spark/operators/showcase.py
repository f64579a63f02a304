"""Composite showcase queries — classic TPC-H shapes (Q3/Q6/Q18).

Operator-wise these are compositions of already-declared primitives;
they are declared anyway because they are the workloads a user
actually runs, and they exercise the operator *combinations* (join →
agg → top-k; having-subquery → join) whose plans matter at scale:
broadcast dims, partial aggregation, TakeOrderedAndProject — all in
one pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from frafka_spark.functions.determinism import dec_sum, half_up, sql_dec_sum
from frafka_spark.io import table
from frafka_spark.registry import query


@query(
    "q_tpch_q6_shape",
    oracle=f"""
    SELECT {sql_dec_sum('l_extendedprice * l_discount')} AS revenue,
           count(*) AS n_rows
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 shape: forecast-revenue — pure scan+filter+agg, fully pushed."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dec_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q_tpch_q3_shape",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dec_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey ASC
    LIMIT 10
    """,
)
def q_tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 shape: shipping-priority — join → agg → deterministic top-10."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
    )


@query(
    "q_tpch_q18_shape",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           round(o.o_totalprice, 4) AS totalprice,
           {sql_dec_sum('l.l_quantity')} AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey HAVING sum(l_quantity) > 250
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    """,
)
def q_tpch_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18 shape: large-volume customers — having-subquery semi-join.

    r12 wave 3 reorder (guide §3.2/§2.3): the HAVING set keeps ~1.5%
    of orders, so the semi-join is applied to ORDERS first and the
    lineitem detail join runs against the surviving slice (AQE
    broadcasts it at fixture scale — the detail side then never
    shuffles); the customer columns attach AFTER the per-order
    aggregate, keyed on the ≤|big-orders| aggregate rows instead of
    riding every detail row through the join chain. Grouping by
    (o_custkey, o_orderkey, ...) before the customer join partitions
    the rows identically to the old (c_custkey, c_name, ...) keys —
    c_custkey = o_custkey and c_name is functional on it. The answer
    is unchanged (same oracle, hash-verified tri-scale).
    """
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 250)
        .select("l_orderkey")
    )
    o_big = o.join(big, big.l_orderkey == o.o_orderkey, "left_semi")
    per_order = (
        li.join(o_big, li.l_orderkey == o_big.o_orderkey)
        .groupBy("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dec_sum("l_quantity", "total_qty"))
    )
    return per_order.join(c, c.c_custkey == per_order.o_custkey).select(
        "c_custkey",
        "c_name",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        F.round("o_totalprice", 4).alias("totalprice"),
        "total_qty",
    )


@query(
    "q_tpch_q5_shape",
    oracle=f"""
    SELECT n.n_name,
           {sql_dec_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q_tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 shape: local-supplier volume — the 6-table star-plus-snowflake
    join with the famously non-hierarchical twist (customer and
    supplier must share a nation, a predicate BETWEEN two fact-side
    dims), grouped by nation.

    The plan this declares at scale: region/nation/supplier/customer
    all broadcast (dims stay ≤GBs at any fact scale), so the only
    shuffles are orders⋈lineitem on the orderkey — the unavoidable
    fact-fact co-location — and the final ≤25-row nation aggregate
    fed by map-side partials. The c_nationkey = s_nationkey predicate
    rides the broadcast joins as a filter, never forcing a second
    fact shuffle. Revenue uses the repo's exact decimal sum so group
    totals are accumulation-order-independent.
    """
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    s = table(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            F.broadcast(c),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
    )


@query(
    "q_tpch_q10_shape",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {sql_dec_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           round(c.c_acctbal, 4) AS acctbal,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
)
def q_tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: returned-item report — which customers returned the
    most revenue last quarter. Fact-fact join on orderkey with the
    quarter filter pushed into the orders scan and the returnflag
    filter pushed into the lineitem scan (both prune at the parquet
    reader), customer/nation broadcast, ≤customers-sized aggregate
    with exact decimal revenue, then a deterministic top-20 via
    TakeOrderedAndProject (revenue DESC, custkey tiebreak).
    """
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 4).alias("acctbal"),
            "n_name",
        )
    )


@query(
    "q_tpch_q14_shape",
    oracle=f"""
    SELECT floor(100.00 * {sql_dec_sum(
        "CASE WHEN p.p_type = 'PROMO' "
        "THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END"
    )} / {sql_dec_sum('l.l_extendedprice * (1 - l.l_discount)')}
                 * 1000000.0 + 0.5) / 1000000.0 AS promo_revenue_pct,
           count(*) AS n_rows
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-10-01 00:00:00'
    """,
)
def q_tpch_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape: promotion-effect — what fraction of one month's
    revenue came from promo parts. A conditional aggregate over a
    fact⋈dim join: the ship-month filter prunes the lineitem scan
    (at scale, with date partitioning, whole files never open), part
    broadcasts (dim stays ≤GBs at any fact scale), and the answer is
    a single row fed by map-side partials — no shuffle carries more
    than one partial-aggregate row per partition.

    Both the numerator (CASE-gated) and denominator accumulate in the
    repo's exact decimal sum, so the one float division + round at
    the end is the only place a double appears — the ratio is
    accumulation-order-independent on both engines.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            half_up(
                F.lit(100.0) * dec_sum(promo) / dec_sum(rev), 6
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q_tpch_q4_shape",
    oracle="""
    SELECT o.o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey
            AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    """,
)
def q_tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: order-priority checking — count one quarter's orders
    that had at least one line shipped more than 60 days after the
    order date (the fixture's stand-in for Q4's commitdate <
    receiptdate, which the fixture lineitem does not carry).

    EXISTS compiles to a LEFT SEMI join: equi on the orderkey (the
    one fact-fact shuffle, co-locatable by bucketing at scale) with
    the date comparison riding the join as an extra condition —
    never a second shuffle, never row multiplication (semi
    short-circuits on first match, so a 7-line order costs one probe
    hit). The quarter filter prunes the orders scan; the ≤5-row
    priority aggregate is map-side-partial fed.
    """
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@query(
    "q_tpch_q19_shape",
    oracle=f"""
    SELECT {sql_dec_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           count(*) AS n_rows
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q_tpch_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: discounted-revenue under a disjunction of
    (brand, size-band, quantity-band) conjuncts — the classic
    OR-of-ANDs predicate that defeats naive pushdown.

    What Catalyst does with it (and why this is the scale-safe
    declaration): each disjunct mixes part-side and lineitem-side
    columns, so the predicate as written can only be evaluated after
    the join — but the optimizer derives the per-side implications
    (``p_brand IN (...) AND p_size <= 15`` onto the part scan,
    ``l_quantity BETWEEN 1 AND 30`` onto the lineitem scan) and
    pushes THOSE into the parquet readers, shrinking the broadcast
    build side and the probe stream before the join; the full
    disjunction then runs as the join's residual filter. One
    broadcast join, one single-row aggregate, exact decimal revenue.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(band)
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q_tpch_q7_shape",
    oracle=f"""
    SELECT n1.n_name AS cust_nation,
           n2.n_name AS supp_nation,
           CAST(year(l.l_shipdate) AS INT) AS l_year,
           {sql_dec_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           count(*) AS n_rows
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
    JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
    WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    GROUP BY cust_nation, supp_nation, l_year
    """,
)
def q_tpch_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: volume shipping between two trading nations, by
    direction and ship year — the bidirectional-pair filter whose
    disjunction spans the customer side AND the supplier side of the
    same lineitem row.

    Scale plan: both nation filters prune their dim scans to one row
    each; customer and supplier broadcast pre-filtered by their
    nation semi-join (the broadcast join against a 1-nation dim
    drops most of each dim before the fact sees it — at 100 TB the
    fact rows for other nations' customers/suppliers die at the
    first two broadcast probes). The only shuffle is the
    orders⋈lineitem fact-fact orderkey join; the
    (nation, nation, year) aggregate is a handful of rows fed by
    map-side partials. The OR-of-pairs residual evaluates after both
    broadcast joins — no second fact shuffle, mirroring the
    ``q_tpch_q19_shape`` disjunction discipline.
    """
    n1 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
    c = (
        table(spark, sf_dir, "customer")
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .select("c_custkey", "cust_nation")
    )
    s = (
        table(spark, sf_dir, "supplier")
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .select("s_suppkey", "supp_nation")
    )
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair = (
        (F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2")
    ) | (
        (F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1")
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(pair)
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"
            ),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q_tpch_q8_shape",
    oracle=f"""
    WITH vol AS (
        SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
               l.l_extendedprice * (1 - l.l_discount) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o   ON l.l_orderkey = o.o_orderkey
        JOIN part p     ON l.l_partkey = p.p_partkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
        JOIN region r   ON n1.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
        WHERE r.r_name = 'ASIA' AND p.p_type = 'STANDARD'
    )
    SELECT o_year,
           floor({sql_dec_sum(
               "CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END"
           )} / {sql_dec_sum('volume')}
                 * 1000000.0 + 0.5) / 1000000.0 AS mkt_share,
           count(*) AS n_rows
    FROM vol
    GROUP BY o_year
    """,
)
def q_tpch_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: national market share — NATION_3 suppliers' slice of
    STANDARD-part volume sold to ASIA customers, by order year. The
    widest dim fan in the suite (7 tables), with the numerator gated
    on a dim attribute (supplier nation) and the denominator over the
    whole filtered volume.

    Scale plan: region→nation→customer is a broadcast snowflake that
    prunes the customer dim before the fact probe; part's type filter
    prunes its broadcast build; supplier⋈nation broadcasts unpruned
    (the CASE needs every supplier's nation). The only shuffle is
    orders⋈lineitem on the orderkey; the per-year share divides two
    exact decimal sums once.
    """
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = table(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    ).select(F.col("n_nationkey").alias("c_nkey"))
    c = table(spark, sf_dir, "customer").join(
        F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey")
    ).select("c_custkey")
    n2 = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    s = table(spark, sf_dir, "supplier").join(
        F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey")
    ).select("s_suppkey", "supp_nation")
    p = table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    gated = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            half_up(dec_sum(gated) / dec_sum(vol), 6).alias("mkt_share"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q_tpch_q11_shape",
    oracle=f"""
    WITH by_supp AS (
        SELECT l_suppkey,
               {sql_dec_sum('l_extendedprice * (1 - l_discount)')} AS value
        FROM lineitem GROUP BY l_suppkey
    ),
    tot AS (SELECT {sql_dec_sum('l_extendedprice * (1 - l_discount)')}
            AS total FROM lineitem)
    SELECT b.l_suppkey, b.value,
           floor(b.value / t.total * 1000000.0 + 0.5) / 1000000.0
               AS share
    FROM by_supp b, tot t
    WHERE b.value > 0.0015 * t.total
    """,
)
def q_tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: important stock — suppliers whose revenue exceeds a
    fraction of the GLOBAL total (the having-against-a-scalar-subquery
    pattern; the fixture has no partsupp, so supplier revenue from
    lineitem stands in for stock value).

    The scale question Q11 poses is how the global total meets the
    per-supplier rows: here both aggregates reduce the same scan
    (Catalyst reuses the cached fixture relation), the one-row total
    cross-joins back as a broadcast — O(1) bytes, never a shuffle of
    the supplier relation — and the threshold evaluates as a
    projection-level filter. Exact decimal sums on both sides make
    the share and the cut deterministic; values straddling the
    threshold cannot flip engine-to-engine because both compare the
    identical doubles.
    """
    li = table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    by_supp = li.groupBy("l_suppkey").agg(dec_sum(rev, "value"))
    tot = li.agg(dec_sum(rev, "total"))
    return (
        by_supp.crossJoin(F.broadcast(tot))
        .filter(F.col("value") > 0.0015 * F.col("total"))
        .select(
            "l_suppkey",
            "value",
            half_up(F.col("value") / F.col("total"), 6).alias("share"),
        )
    )


@query(
    "q_tpch_q13_shape",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_custkey, count(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    SELECT c_count, count(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
)
def q_tpch_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: customer order-count distribution — how many
    customers placed 0, 1, 2, … non-urgent orders. The double
    aggregate whose first level MUST be a left outer join (an inner
    join silently drops the zero-order customers, the bar Q13
    exists to test), with a join-condition filter (not a WHERE —
    a WHERE on the right side would turn the outer join inner).

    Scale: the customer⋈orders join shuffles on custkey (both sides
    unbounded — no broadcast), count(o_orderkey) ignores the NULLs
    the outer join manufactures, and the second aggregate collapses
    to ≤ max-orders-per-customer rows with map-side partials. AQE
    may size-broadcast the fixture's customer side at runtime — a
    data-driven call that reverses itself at 100 TB.
    """
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@query(
    "q_tpch_q22_shape",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE)
               / 100 / count(*) AS ab
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c.c_nationkey,
           count(*) AS numcust,
           CAST(sum(CAST(floor(c.c_acctbal * 100 + 0.5) AS BIGINT)) AS DOUBLE)
               / 100 AS totacctbal
    FROM customer c, avg_bal a
    WHERE c.c_acctbal > a.ab
      AND NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderpriority = '1-URGENT'
      )
    GROUP BY c.c_nationkey
    """,
)
def q_tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: global-sales-opportunity — customers with no
    URGENT orders but an above-average account balance, grouped by
    nation (the fixture's stand-in for Q22's phone-prefix country
    code; "no urgent orders" stands in for "no orders", which is
    empty at fixture scale and would make the check vacuous). Combines
    the two subquery forms Q22 exists to test: a scalar aggregate
    subquery feeding an inequality, and NOT EXISTS compiled to a
    LEFT ANTI join.

    Scale: the positive-balance average is one broadcast row; the
    anti join shuffles on custkey (or runs bloom-pruned under AQE) —
    never row-multiplying, short-circuiting per probe; the nation
    aggregate is ≤25 rows. Balance totals sum exactly: integer cents
    (the fixture's balances are 2-decimal) in BIGINT, recombined by
    one division — the same value DuckDB's identical expression
    produces, accumulation-order-free.
    """
    c = table(spark, sf_dir, "customer")
    # The average feeds an inequality: derive it from exact integer
    # cents so both engines compare the identical double — a plain
    # avg() differs at the last ulp with accumulation order, and a
    # balance sitting exactly on the boundary would then flip.
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum((F.col("c_acctbal") * 100).cast("bigint")).cast("double")
            / 100
            / F.count(F.lit(1))
        ).alias("ab")
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint")
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            (F.sum(cents).cast("double") / 100).alias("totacctbal"),
        )
    )


@query(
    "q_tpch_q15_shape",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey,
               {sql_dec_sum('l_extendedprice * (1 - l_discount)')}
                   AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-10-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
    ),
    best AS (SELECT max(total_rev) AS m FROM rev)
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM supplier s
    JOIN rev r ON r.l_suppkey = s.s_suppkey
    JOIN best b ON r.total_rev = b.m
    """,
)
def q_tpch_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: top supplier — the supplier(s) with the maximum
    quarterly revenue, found by comparing each supplier's revenue to
    the global max (Q15's "revenue view + scalar max" pattern; ties
    all qualify, per the spec).

    Equality against a float max is normally a cross-engine hazard —
    it is safe here ONLY because every revenue is the repo's exact
    decimal sum cast once to double: both engines hold bit-identical
    revenues, so `total_rev = max(total_rev)` selects identical rows.
    The quarter filter prunes the fact scan, the per-supplier
    aggregate is map-side-partial fed, the one-row max broadcasts
    back, and the supplier dim broadcasts for the name lookup.
    """
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy("l_suppkey").agg(
        dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_rev")
    )
    best = rev.agg(F.max("total_rev").alias("m"))
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total_rev") == F.col("m"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
    )


@query(
    "q_tpch_q17_shape",
    oracle=f"""
    WITH part_avg AS (
        SELECT l_partkey, avg(l_quantity) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT floor({sql_dec_sum('l.l_extendedprice')} / 7.0
                 * 10000.0 + 0.5) / 10000.0 AS avg_yearly,
           count(*) AS n_rows
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN part_avg a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#12'
      AND l.l_quantity < 0.2 * a.avg_qty
    """,
)
def q_tpch_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: small-quantity-order revenue — lines of one brand
    whose quantity is under 20% of that part's average quantity
    (the correlated-aggregate-subquery pattern, decorrelated into a
    per-part aggregate + join on both engines — exactly what
    Catalyst's DecorrelateInnerQuery does to the correlated form).

    The threshold is `0.2 × avg(l_quantity)`: quantities are small
    integers, their sums are exact in double far beyond any real
    group size, so both engines derive the identical average and the
    strict inequality cannot flip. Scale: the per-part average is one
    partkey-keyed aggregate co-partitioned with the fact join (AQE
    reuses the exchange); the brand filter prunes the broadcast part
    dim which then prunes the probe early.
    """
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#12"
    ).select("p_partkey")
    part_avg = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(part_avg, F.col("a_partkey") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            half_up(dec_sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"),
            F.count("*").alias("n_rows"),
        )
    )


@query(
    "q_tpch_q9_shape",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS INT) AS o_year,
           {sql_dec_sum(
               'l.l_extendedprice * (1 - l.l_discount)'
               ' - 0.1 * p.p_retailprice * l.l_quantity'
           )} AS sum_profit
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    """,
)
def q_tpch_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: product-type profit — net profit on parts whose name
    matches a pattern, by supplier nation and order year (the fixture
    has no partsupp, so unit cost is proxied as 10% of the part's
    retail price — the operator shape, a LIKE-filtered dim gating a
    profit expression, is Q9's).

    The LIKE filter prunes the part broadcast BEFORE the fact probe
    — the reason Q9 is a pushdown benchmark: ~1/4 of parts survive,
    so ~3/4 of fact rows die at the first broadcast join. Remaining
    joins are broadcast dims; the only shuffle is orders⋈lineitem;
    the profit polynomial accumulates in the exact decimal sum so
    nation-year totals hash-match despite mixed signs (profit sums
    are the classic catastrophic-cancellation case a float fold
    gets wrong at the last ulp).
    """
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    ).select("p_partkey", "p_retailprice")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dec_sum(profit, "sum_profit"))
    )


@query(
    "q_tpch_q21_shape",
    oracle="""
    WITH l1 AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_name, count(*) AS numwait
    FROM l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
        SELECT 1 FROM l1 l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
    )
    GROUP BY s.s_name
    """,
)
def q_tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: suppliers who kept orders waiting — late lines
    (shipped >60 days after the order date, the fixture's stand-in
    for receipt-after-commit) on finalized orders where OTHER
    suppliers participated (EXISTS) but NONE of them were also late
    (NOT EXISTS) — i.e., this supplier alone stalled a multi-supplier
    order. The densest subquery composition in TPC-H: one relation
    probed by both an EXISTS and a NOT EXISTS against itself.

    Both subqueries compile to orderkey-keyed SEMI / ANTI joins with
    the supplier-inequality as residual — every join in the plan
    (fact⋈orders, semi, anti) shuffles on the SAME orderkey, so AQE
    plans one exchange layout end-to-end and the late relation is
    reused for both probes (localCheckpoint pins one materialization;
    at 100 TB that is the "materialize the late-lines table once"
    move). Counts are exact; supplier dim broadcasts for names.
    """
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l1 = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .localCheckpoint(eager=False)
    )
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = l1.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    return (
        l1.join(
            l2,
            (F.col("o2") == F.col("l_orderkey"))
            & (F.col("s2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("o3") == F.col("l_orderkey"))
            & (F.col("s3") != F.col("l_suppkey")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@query(
    "q_tpch_q2_shape",
    oracle="""
    WITH pair_cost AS (
        SELECT l_partkey, l_suppkey,
               min(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    regional AS (
        SELECT pc.l_partkey, pc.unit_cost,
               s.s_name, s.s_acctbal, n.n_name
        FROM pair_cost pc
        JOIN supplier s ON s.s_suppkey = pc.l_suppkey
        JOIN nation n   ON n.n_nationkey = s.s_nationkey
        JOIN region r   ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    best AS (
        SELECT l_partkey, min(unit_cost) AS min_cost
        FROM regional GROUP BY l_partkey
    )
    SELECT g.s_acctbal, g.s_name, g.n_name, p.p_partkey, p.p_brand,
           g.unit_cost AS supply_cost
    FROM regional g
    JOIN best b ON b.l_partkey = g.l_partkey AND g.unit_cost = b.min_cost
    JOIN part p ON p.p_partkey = g.l_partkey
    WHERE p.p_size = 15
    ORDER BY g.s_acctbal DESC, g.n_name, g.s_name, p.p_partkey
    LIMIT 100
    """,
)
def q_tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: minimum-cost supplier — for each size-15 part, the
    EUROPE supplier(s) whose observed unit price (min
    l_extendedprice/l_quantity over the pair's lineitems — the
    fixture's stand-in for ps_supplycost; no partsupp table ships)
    matches the regional per-part minimum. The
    aggregate-subquery-equality join is THE Q2 operator: a min
    computed per group in a subquery, equi-joined back against the
    detail rows that achieved it.

    Scale shape: a broadcast semi-join on the size-15 partkeys
    prunes the fact scan to ~1/50 of its rows BEFORE anything
    shuffles (guide §3.2 — the part filter restricts parts and the
    per-part min never mixes parts, so pruning early is
    answer-preserving); then one (part,supp)-keyed aggregate
    collapses the surviving lineitems (the ONLY pass over the
    fact); the supplier→nation→region dim chain and the part
    columns broadcast onto the collapsed pair relation; the per-part regional min is then a WINDOW over that
    filtered relation (partitioned by partkey — groups bounded by
    suppliers-per-part), and the achiever filter compares in place.
    One window instead of a re-aggregate + self-join: the round-7
    bench showed the join-back formulation re-derived the pair
    aggregate twice (1.26 s → this shape; the oracle keeps the
    two-CTE join-back form, so the hash match also proves the
    window≡self-join identity). Determinism: the unit price divides two parquet
    doubles (IEEE division — identical doubles both engines), min is
    order-independent, and the equality join compares those exact
    doubles, so min-achievers cannot differ engine-to-engine. The
    top-100 order is a total order (acctbal, nation, supplier, part
    — (part, supplier) is unique per row).
    """
    li = table(spark, sf_dir, "lineitem")
    p15 = table(spark, sf_dir, "part").filter(F.col("p_size") == 15).select(
        "p_partkey", "p_brand"
    )
    # §3.2 semi-join prefilter (r12 wave 3): only ~1/50 of parts are
    # size 15 and every non-size-15 pair row is dropped by the p15
    # join below anyway — the per-part min never mixes parts — so
    # dropping those lineitems BEFORE the pair aggregate cuts the
    # only fact-table exchange by the same factor. Broadcast left_semi
    # on the partkey: no row multiplication, no column added.
    li = li.join(
        F.broadcast(p15.select("p_partkey")),
        li["l_partkey"] == p15["p_partkey"],
        "left_semi",
    )
    pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    dims = (
        table(spark, sf_dir, "supplier")
        .join(
            table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    regional = (
        pair.join(F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey"))
        # part filter pushed BEFORE the per-part min: it restricts
        # parts (not suppliers), so each surviving part's regional
        # min is unchanged — and the window below runs on the
        # filtered pair relation only
        .join(F.broadcast(p15), F.col("p_partkey") == F.col("l_partkey"))
        .select(
            "l_partkey", "unit_cost", "s_name", "s_acctbal", "n_name",
            "p_partkey", "p_brand",
        )
    )
    w_part = Window.partitionBy("l_partkey")
    return (
        regional.withColumn("min_cost", F.min("unit_cost").over(w_part))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            F.col("unit_cost").alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@query(
    "q_tpch_q12_shape",
    oracle="""
    SELECT l.l_returnflag AS shipmode_class,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def q_tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 shape: late shipments by mode — among 1997 lines shipped
    ≥60 days after their order date (the fixture's stand-in for
    receipt-after-commit; no shipmode/commitdate columns ship, so
    l_returnflag stands in for the mode axis), how many belong to
    high- vs low-priority orders. The Q12 operator is the
    CASE-conditional split aggregate over a fact⋈fact join with a
    cross-relation date predicate.

    Scale shape: the year filter pushes to the lineitem scan (only
    the 1997 slice shuffles); the join keys both sides on orderkey;
    the lateness predicate evaluates as a join residual (it needs
    both sides, so it cannot push below the join — the interesting
    part of the plan); both CASE sums ride ONE HashAggregate with
    map-side partials. Counts are exact integers.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            F.col("l_shipdate")
            >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy(F.col("l_returnflag").alias("shipmode_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


@query(
    "q_tpch_q16_shape",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#45'
      AND p.p_type NOT LIKE 'MEDIUM%'
      AND p.p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q_tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: supplier breadth per part attribute — how many
    DISTINCT suppliers ship each (brand, type, size) combination,
    excluding blacklisted suppliers (negative account balance stands
    in for Q16's complaint-comment predicate; no partsupp table, so
    observed lineitem (part,supp) pairs stand in for the catalog).
    The Q16 operator stack: NOT-IN exclusion subquery + dimension
    filters + count-distinct per attribute group.

    Scale shape: the blacklist compiles to a BROADCAST anti-join
    (bounded: suppliers with complaints), the part filter broadcasts
    onto the fact, and the count-distinct rides Spark's two-level
    expand/aggregate with map-side partial dedup — no all-pairs
    anything. NOT IN's null trap is structurally avoided (s_suppkey
    is a key, never null), so anti-join semantics match.
    """
    li = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bad = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#45")
            & ~F.col("p_type").like("MEDIUM%")
            & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_tpch_q20_shape",
    oracle="""
    WITH pair_qty AS (
        SELECT l_partkey, l_suppkey, sum(l_quantity) AS pair_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_partkey, l_suppkey
    ),
    part_qty AS (
        SELECT l_partkey, sum(l_quantity) AS part_qty
        FROM lineitem GROUP BY l_partkey
    ),
    excess AS (
        SELECT DISTINCT pq.l_suppkey
        FROM pair_qty pq
        JOIN part_qty t USING (l_partkey)
        JOIN part p ON p.p_partkey = pq.l_partkey
        WHERE p.p_name LIKE 'small%'
          AND pq.pair_qty > 0.05 * t.part_qty
    )
    SELECT s.s_name, s.s_acctbal, n.n_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    JOIN excess e ON e.l_suppkey = s.s_suppkey
    WHERE r.r_name = 'AFRICA'
    ORDER BY s.s_name
    """,
)
def q_tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: concentration suppliers — AFRICA suppliers who, for
    some 'small…' part, shipped more than 5% of that part's
    all-time volume inside 1997 (the fixture's stand-in for Q20's
    availqty-vs-half-of-demand test; no partsupp ships). The Q20
    operator stack: TWO nested aggregates at different granularities
    ((part,supp) year volume vs part all-time volume) compared
    row-wise, collapsed to a DISTINCT supplier set, then semi-joined
    into the dimension chain.

    Scale shape: both aggregates collapse lineitem with map-side
    partials keyed on partkey (+suppkey) — the comparison join then
    co-locates on partkey with no extra exchange for the pair side;
    the part-name filter broadcasts; the distinct supplier set is
    bounded by |suppliers| and joins the dim chain broadcast-side.
    Quantities are integral doubles (exact at any sum order on both
    engines — no decimal detour needed); the 5% threshold compares
    identically-derived doubles, so membership cannot flip
    engine-to-engine.
    """
    li = table(spark, sf_dir, "lineitem")
    pair = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("pair_qty"))
    )
    total = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("l_quantity").alias("part_qty")
    )
    small = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    excess = (
        pair.join(total, F.col("t_partkey") == F.col("l_partkey"))
        .join(F.broadcast(small), F.col("p_partkey") == F.col("l_partkey"))
        .filter(F.col("pair_qty") > 0.05 * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    dims = (
        table(spark, sf_dir, "supplier")
        .join(
            table(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    return (
        dims.join(excess, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "s_acctbal", "n_name")
        .orderBy("s_name")
    )
