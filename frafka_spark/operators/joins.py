"""B3 — joins.

The reference joins nothing — correlation across streams is left to
user code [SURVEY.md §2 Tier A13]. Here joins are declarative and
Catalyst picks the physical strategy; the queries are shaped so the
*right* strategy is available at 100 TB:

- dimension joins (nation/region/customer/supplier) broadcast — no
  shuffle of the fact table (``q_join_broadcast`` pins the hint; the
  rest stay under ``spark.sql.autoBroadcastJoinThreshold``);
- fact-to-fact equi-joins (lineitem⋈orders) shuffle on the join key
  and AQE handles skew — at scale these become bucketed co-located
  joins (see plans/scale_notes.md);
- the theta self-join aggregates instead of materializing the
  quadratic pair set;
- the as-of join is the join+window formulation (Spark has no native
  as-of): candidates via range-predicated join, winner via
  ``row_number()=1`` with an explicit total order — the same pattern
  scales by key-partitioning, and ties are broken deterministically
  (latest o_orderdate, then max o_orderkey) per SURVEY.md §7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frafka_spark.functions.determinism import dec_sum, half_up, sql_dec_sum
from frafka_spark.io import table
from frafka_spark.registry import query


@query(
    "q_join_inner",
    oracle="""
    SELECT o.o_orderkey, c.c_custkey, c.c_name, c.c_mktsegment,
           round(o.o_totalprice, 4) AS price,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders⋈customer (Catalyst picks broadcast/SMJ)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey).select(
        "o_orderkey",
        "c_custkey",
        "c_name",
        "c_mktsegment",
        F.round("o_totalprice", 4).alias("price"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
    )


@query(
    "q_join_broadcast",
    oracle=f"""
    SELECT n.n_name,
           count(*) AS n_items,
           {sql_dec_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join: fact table never shuffles for dim lookups.

    ``F.broadcast`` is pinned so the plan is BroadcastHashJoin at any
    scale — supplier/nation stay ≪ executor memory while lineitem is
    the 100 TB side.
    """
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    dim = F.broadcast(s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey))
    return (
        li.join(dim, li.l_suppkey == dim.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_items"),
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        )
    )


@query(
    "q_join_multiway",
    oracle=f"""
    SELECT n.n_name,
           {sql_dec_sum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped 6-way star join: local-supplier revenue by nation."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "q_join_left",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders,
           coalesce({sql_dec_sum('o.o_totalprice')}, 0.0) AS total_spent
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                      AND o.o_orderstatus = 'F'
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: customers kept even with zero matching orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dec_sum("o_totalprice"), F.lit(0.0)).alias("total_spent"),
        )
    )


@query(
    "q_join_full",
    oracle="""
    WITH hi_cust AS (
        SELECT c_custkey, c_name FROM customer WHERE c_acctbal > 9000
    ),
    big_orders AS (
        SELECT o_custkey, count(*) AS n_big
        FROM orders WHERE o_totalprice > 250000 GROUP BY o_custkey
    )
    SELECT coalesce(h.c_custkey, b.o_custkey) AS custkey,
           coalesce(h.c_name, 'NO_ACCOUNT') AS name,
           coalesce(b.n_big, 0) AS n_big,
           (h.c_custkey IS NULL) AS only_orders,
           (b.o_custkey IS NULL) AS only_account
    FROM hi_cust h
    FULL OUTER JOIN big_orders b ON h.c_custkey = b.o_custkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with unmatched rows on both sides."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    hi = c.filter(F.col("c_acctbal") > 9000).select("c_custkey", "c_name")
    big = (
        o.filter(F.col("o_totalprice") > 250000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_big"))
    )
    j = hi.join(big, hi.c_custkey == big.o_custkey, "full")
    return j.select(
        F.coalesce("c_custkey", "o_custkey").alias("custkey"),
        F.coalesce("c_name", F.lit("NO_ACCOUNT")).alias("name"),
        F.coalesce("n_big", F.lit(0)).alias("n_big"),
        F.col("c_custkey").isNull().alias("only_orders"),
        F.col("o_custkey").isNull().alias("only_account"),
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT p.p_partkey, p.p_name, p.p_type
    FROM part p
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_partkey = p.p_partkey AND l.l_quantity >= 49
    )
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): parts ever shipped in near-max quantity."""
    p = table(spark, sf_dir, "part")
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return p.join(li, p.p_partkey == li.l_partkey, "left_semi").select(
        "p_partkey", "p_name", "p_type"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c.c_custkey, c.c_name, round(c.c_acctbal, 4) AS acctbal
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no urgent orders."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", F.round("c_acctbal", 4).alias("acctbal")
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r.r_name, n.n_name, (r.r_regionkey = n.n_regionkey) AS is_home
    FROM region r
    CROSS JOIN nation n
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of the two smallest dims (5 × 25)."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select(
        "r_name", "n_name", (F.col("r_regionkey") == F.col("n_regionkey")).alias("is_home")
    )


@query(
    "q_join_theta",
    oracle=f"""
    SELECT s1.s_suppkey,
           s1.s_name,
           CAST(count(s2.s_suppkey) AS BIGINT) AS n_richer,
           coalesce({sql_dec_sum('s2.s_acctbal - s1.s_acctbal')}, 0.0) AS gap_sum
    FROM supplier s1
    LEFT JOIN supplier s2 ON s2.s_acctbal > s1.s_acctbal
    GROUP BY s1.s_suppkey, s1.s_name
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (range) self-join, aggregated so output stays linear.

    Physically a broadcast nested-loop join; the quadratic pair set is
    consumed by the aggregate, never materialized. At true scale this
    exact shape (rank-vs-all) would be rewritten as a window over a
    global sort — the theta join is declared to exercise BNLJ.
    """
    s = table(spark, sf_dir, "supplier")
    s1 = s.select(
        F.col("s_suppkey"), F.col("s_name"), F.col("s_acctbal").alias("bal1")
    )
    s2 = s.select(F.col("s_suppkey").alias("k2"), F.col("s_acctbal").alias("bal2"))
    return (
        s1.join(F.broadcast(s2), F.col("bal2") > F.col("bal1"), "left")
        .groupBy("s_suppkey", "s_name")
        .agg(
            F.count("k2").alias("n_richer"),
            F.coalesce(
                dec_sum(F.col("bal2") - F.col("bal1")), F.lit(0.0)
            ).alias("gap_sum"),
        )
    )


@query(
    "q_join_asof",
    oracle="""
    WITH cand AS (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate, o.o_totalprice,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC NULLS LAST,
                            o.o_orderkey DESC NULLS LAST
               ) AS rn
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT event_id, user_id, o_orderkey AS asof_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS asof_date,
           round(o_totalprice, 4) AS asof_price
    FROM cand WHERE rn = 1
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest order at-or-before each event, per user.

    Spark has no native as-of operator; this is a range-predicated
    broadcast-left join to build the candidate set, then a per-event
    ``max`` over ONE packed bigint — ``(epoch_day << 44) | orderkey``
    — to pick the winner, then a broadcast join-back on the decoded
    orderkey for the payload columns. The packing exists because a
    ``max(struct(...))``/``max_by`` aggregate falls back to
    SortAggregate (struct isn't a mutable hash-buffer type), which
    SORTS the whole candidate set inside each partition — measured
    ~2.5× slower end-to-end. A plain long max stays in HashAggregate
    with map-side partial fold: at 100 TB the shuffle carries one
    8-byte value per (event × map partition), never the candidates.
    Packed ordering equals (o_orderdate DESC, o_orderkey DESC), the
    deterministic tiebreak [SURVEY.md §7 hard-list #3]; sound while
    orderkey < 2^44 (TPC-H orderkey ≈ 6e9 at SF1k) and dates ≥ 1970.
    The probe side fans out to one partition per core first: the
    fixture is a single-row-group file that scans as ONE task, and
    the join expansion + aggregate are the hot path (a multi-file
    100 TB layout gets this parallelism from the scan itself).
    Events with no matching order keep a null packed max, decode to a
    null orderkey, and exit the left join-back with null fields.
    """
    sc = spark.sparkContext
    e = (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts")
        .repartition(sc.defaultParallelism, "user_id")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    cand = e.join(
        F.broadcast(o), (o.o_custkey == e.user_id) & (o.o_orderdate <= e.ts), "left"
    )
    epoch_day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    packed = F.shiftleft(epoch_day.cast("bigint"), 44) + F.col("o_orderkey")
    best = cand.groupBy("event_id", "user_id").agg(F.max(packed).alias("pk"))
    payload = o.select(
        F.col("o_orderkey").alias("asof_orderkey"), "o_orderdate", "o_totalprice"
    )
    return (
        best.withColumn("asof_orderkey", F.col("pk").bitwiseAND(F.lit((1 << 44) - 1)))
        .join(F.broadcast(payload), "asof_orderkey", "left")
        .select(
            "event_id",
            "user_id",
            "asof_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("asof_date"),
            F.round("o_totalprice", 4).alias("asof_price"),
        )
    )


RANGE_US = 120_000_000  # ±120 s correlation window, in microseconds
_BAND_US = 2 * RANGE_US  # band width = 2x the range → ≤3 candidate bands


@query(
    "q_join_range_banded",
    oracle=f"""
    SELECT e1.event_id,
           CAST(count(*) AS BIGINT) AS n_nearby,
           {sql_dec_sum('e2.value')} AS sum_value
    FROM events e1
    JOIN events e2
      ON abs(epoch_us(e1.ts) - epoch_us(e2.ts)) <= {RANGE_US}
    WHERE e1.event_type = 'error'
    GROUP BY e1.event_id
    """,
)
def q_join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure range join (no equi key), executed as a BANDED equi-join:
    for each error event, count/sum all events within ±120 s — burst
    correlation.

    The scale pattern for interval/range joins Spark would otherwise
    plan as a broadcast nested loop (O(n·m) comparisons): quantize
    time into bands of width 2×range, explode the PROBE side to its
    ≤3 candidate bands (a fixed 3× expansion of one side — never a
    pair blowup), hash-join on the band id, and apply the exact range
    predicate as a residual filter. Any match is at most one band
    away from its probe, so recall is exact by construction. At
    100 TB the join shuffles on the band key like any equi-join;
    burst-heavy bands are the skew hazard, mitigated with the salting
    utility (operators/skew.py) if AQE's skew split isn't enough.
    Matches include the probe event itself (|Δ| = 0 ≤ range), so
    ``n_nearby ≥ 1`` — same on both sides of the oracle comparison.
    All arithmetic is integer microseconds; no float time math.
    """
    ev = table(spark, sf_dir, "events").select(
        "event_id", "event_type", F.unix_micros("ts").alias("us"), "value"
    )
    build = ev.select(
        F.col("us").alias("us2"),
        "value",
        (F.col("us") / _BAND_US).cast("bigint").alias("band"),
    )
    probe_band = (F.col("us") / _BAND_US).cast("bigint")
    probes = ev.filter(F.col("event_type") == "error").select(
        "event_id",
        F.col("us").alias("us1"),
        F.explode(
            F.array(probe_band - 1, probe_band, probe_band + 1)
        ).alias("band"),
    )
    return (
        probes.join(build, "band")
        .filter(F.abs(F.col("us1") - F.col("us2")) <= RANGE_US)
        .groupBy("event_id")
        .agg(
            F.count("*").alias("n_nearby"),
            dec_sum("value", "sum_value"),
        )
    )


@query(
    "q_join_nullsafe",
    oracle="""
    WITH s AS (SELECT nullif(s_nationkey, 3) AS nk, s_suppkey FROM supplier),
         c AS (SELECT nullif(c_nationkey, 3) AS nk, c_custkey FROM customer)
    SELECT coalesce(CAST(s.nk AS VARCHAR), 'NULL') AS nk_key,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(count(DISTINCT s.s_suppkey) AS BIGINT) AS n_supp,
           CAST(count(DISTINCT c.c_custkey) AS BIGINT) AS n_cust
    FROM s JOIN c ON s.nk IS NOT DISTINCT FROM c.nk
    GROUP BY coalesce(CAST(s.nk AS VARCHAR), 'NULL')
    """,
)
def q_join_nullsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): NULL
    keys match each other instead of vanishing.

    ``eqNullSafe`` is still a HASH-join key (Catalyst treats
    EqualNullSafe as an equi condition — the plan is a broadcast/
    shuffled hash join, not a nested loop), which is exactly why the
    operator matters at scale: the naive
    ``(a = b) OR (a IS NULL AND b IS NULL)`` rewrite is NOT
    recognized as equi and falls to BNLJ. Aggregated so the paired
    output stays linear in the key cardinality.
    """
    s = table(spark, sf_dir, "supplier").select(
        F.nullif(F.col("s_nationkey"), F.lit(3)).alias("nk"), "s_suppkey"
    )
    c = table(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey"), F.lit(3)).alias("nk_c"), "c_custkey"
    )
    return (
        s.join(c, s.nk.eqNullSafe(c.nk_c))
        .groupBy(
            F.coalesce(F.col("nk").cast("string"), F.lit("NULL")).alias("nk_key")
        )
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("s_suppkey").alias("n_supp"),
            F.countDistinct("c_custkey").alias("n_cust"),
        )
    )


@query(
    "q_join_asof_forward",
    oracle="""
    WITH cand AS (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate, o.o_totalprice,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate ASC NULLS LAST,
                            o.o_orderkey ASC NULLS LAST
               ) AS rn
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
    )
    SELECT event_id, user_id, o_orderkey AS next_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS next_date,
           round(o_totalprice, 4) AS next_price
    FROM cand WHERE rn = 1
    """,
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: EARLIEST order at-or-after each event, per
    user — the "what happened next" direction (pandas
    ``merge_asof(direction='forward')``), completing the as-of family
    beside the backward ``q_join_asof``.

    Identical scale machinery to the backward op (see its docstring):
    range-predicated broadcast-left candidates, then a per-event
    ``min`` over ONE packed bigint — ``(epoch_day << 44) | orderkey``
    packs (date ASC, orderkey ASC) so a primitive long min in
    HashAggregate with map-side partials replaces the
    SortAggregate-bound ``min(struct)`` — then a broadcast join-back
    on the decoded winner for payload columns. Events with no later
    order keep nulls through the left joins.
    """
    sc = spark.sparkContext
    e = (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts")
        .repartition(sc.defaultParallelism, "user_id")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    cand = e.join(
        F.broadcast(o), (o.o_custkey == e.user_id) & (o.o_orderdate >= e.ts), "left"
    )
    epoch_day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    packed = F.shiftleft(epoch_day.cast("bigint"), 44) + F.col("o_orderkey")
    best = cand.groupBy("event_id", "user_id").agg(F.min(packed).alias("pk"))
    payload = o.select(
        F.col("o_orderkey").alias("next_orderkey"), "o_orderdate", "o_totalprice"
    )
    return (
        best.withColumn("next_orderkey", F.col("pk").bitwiseAND(F.lit((1 << 44) - 1)))
        .join(F.broadcast(payload), "next_orderkey", "left")
        .select(
            "event_id",
            "user_id",
            "next_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("next_date"),
            F.round("o_totalprice", 4).alias("next_price"),
        )
    )


@query(
    "q_join_asof_nearest",
    oracle="""
    WITH cand AS (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
               abs(datediff('day', CAST(e.ts AS DATE), o.o_orderdate))
                   AS gap_days,
               CASE WHEN o.o_orderdate <= CAST(e.ts AS DATE)
                    THEN 0 ELSE 1 END AS dir,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY abs(datediff('day', CAST(e.ts AS DATE),
                                         o.o_orderdate)) ASC NULLS LAST,
                            CASE WHEN o.o_orderdate <= CAST(e.ts AS DATE)
                                 THEN 0 ELSE 1 END ASC NULLS LAST,
                            o.o_orderkey ASC NULLS LAST
               ) AS rn
        FROM events e
        LEFT JOIN orders o ON o.o_custkey = e.user_id
    )
    SELECT event_id, user_id,
           o_orderkey AS nearest_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS nearest_date,
           CAST(gap_days AS BIGINT) AS gap_days,
           CASE dir WHEN 0 THEN 'backward' WHEN 1 THEN 'forward' END
               AS direction
    FROM cand WHERE rn = 1
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join: the order closest in time to each event in
    EITHER direction — pandas ``merge_asof(direction='nearest')`` —
    completing the as-of family (backward ``q_join_asof``, forward
    ``q_join_asof_forward``).

    Same packed-extremum discipline as its siblings, with the
    ordering encoded in one bigint: ``(gap_days << 45) | (dir << 44)
    | orderkey`` — ``min`` picks the smallest gap, prefers backward
    on an exact-tie gap (dir bit: at-or-before = 0), then the
    smallest orderkey; a struct/min_by would fall back to
    SortAggregate and sort every candidate. Bit budget: gap ≤ ~2ⁱ⁸
    days (718 years), dir 1 bit, orderkey < 2⁴⁴ — no collision while
    the packed value stays under 2⁶³. The per-event aggregate folds
    map-side (8 bytes per event per partition crosses the wire), and
    payload columns return via a broadcast join-back on the decoded
    orderkey, so the candidate expansion itself is never shuffled.
    Events whose user has no orders keep NULLs through the decode.
    """
    sc = spark.sparkContext
    e = (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts")
        .repartition(sc.defaultParallelism, "user_id")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    cand = e.join(F.broadcast(o), F.col("o_custkey") == F.col("user_id"), "left")
    gap = F.abs(F.datediff(F.col("o_orderdate"), F.col("ts").cast("date")))
    direction = F.when(
        F.col("o_orderdate") <= F.col("ts").cast("date"), F.lit(0)
    ).otherwise(F.lit(1))
    packed = (
        F.shiftleft(gap.cast("bigint"), 45)
        + F.shiftleft(direction.cast("bigint"), 44)
        + F.col("o_orderkey")
    )
    best = cand.groupBy("event_id", "user_id").agg(F.min(packed).alias("pk"))
    payload = o.select(
        F.col("o_orderkey").alias("nearest_orderkey"),
        F.col("o_orderdate").alias("nearest_dt"),
    )
    return (
        best.withColumn(
            "nearest_orderkey", F.col("pk").bitwiseAND(F.lit((1 << 44) - 1))
        )
        .join(F.broadcast(payload), "nearest_orderkey", "left")
        .select(
            "event_id",
            "user_id",
            "nearest_orderkey",
            F.date_format("nearest_dt", "yyyy-MM-dd").alias("nearest_date"),
            F.shiftright("pk", 45).cast("bigint").alias("gap_days"),
            F.when(
                F.shiftright("pk", 44).bitwiseAND(F.lit(1)) == 0, "backward"
            )
            .when(F.shiftright("pk", 44).bitwiseAND(F.lit(1)) == 1, "forward")
            .alias("direction"),
        )
    )


TOL_DAYS = 9000  # as-of tolerance: bridge the fixture's events↔orders epoch gap


@query(
    "q_join_asof_tolerance",
    oracle=f"""
    WITH cand AS (
        SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
               o.o_totalprice,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC NULLS LAST,
                            o.o_orderkey DESC NULLS LAST
               ) AS rn
        FROM events e
        LEFT JOIN orders o
          ON o.o_custkey = e.user_id
         AND o.o_orderdate <= e.ts
         AND o.o_orderdate >= e.ts - INTERVAL {TOL_DAYS} DAY
    )
    SELECT event_id, user_id, o_orderkey AS asof_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS asof_date,
           round(o_totalprice, 4) AS asof_price
    FROM cand WHERE rn = 1
    """,
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE window — the fourth and last
    parameter of the pandas/polars ``merge_asof`` surface
    (backward / forward / nearest / tolerance): latest order
    at-or-before each event, but only if it is RECENT ENOUGH
    (within {TOL_DAYS} days — sized to bridge the fixture's
    events↔orders epoch gap so both matched and staleness-rejected
    rows exist); staler states are treated as expired and the event
    keeps NULLs. The semantics every feature-store lookup needs: a
    quote/feature older than the freshness SLA must NOT join.

    Same physical shape as ``q_join_asof`` (candidate range join →
    packed-long max in a HashAggregate → broadcast join-back): the
    tolerance adds one residual lower-bound predicate to the
    candidate join, which only SHRINKS the candidate set — at scale
    the tolerance is the lever that bounds per-probe fan (a 100 TB
    as-of with unbounded lookback carries every historical version;
    with a tolerance it carries only the fresh window).
    """
    sc = spark.sparkContext
    e = (
        table(spark, sf_dir, "events")
        .select("event_id", "user_id", "ts")
        .repartition(sc.defaultParallelism, "user_id")
    )
    o = table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    cand = e.join(
        F.broadcast(o),
        (o.o_custkey == e.user_id)
        & (o.o_orderdate <= e.ts)
        & (o.o_orderdate >= e.ts - F.expr(f"INTERVAL {TOL_DAYS} DAYS")),
        "left",
    )
    epoch_day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    packed = F.shiftleft(epoch_day.cast("bigint"), 44) + F.col("o_orderkey")
    best = cand.groupBy("event_id", "user_id").agg(F.max(packed).alias("pk"))
    payload = o.select(
        F.col("o_orderkey").alias("asof_orderkey"), "o_orderdate", "o_totalprice"
    )
    return (
        best.withColumn("asof_orderkey", F.col("pk").bitwiseAND(F.lit((1 << 44) - 1)))
        .join(F.broadcast(payload), "asof_orderkey", "left")
        .select(
            "event_id",
            "user_id",
            "asof_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("asof_date"),
            F.round("o_totalprice", 4).alias("asof_price"),
        )
    )


_GEO_RADIUS = 2.0  # grid cell size == match radius, in planar degrees

# Deterministic synthetic coordinates (house sentinel rule: derive
# the feature from keys, so ground truth holds by construction).
_GEO_SQL_POINTS = """
    cust_pts AS (
        SELECT c_custkey,
               ((c_custkey * 9973) % 1800) / 10.0 - 90.0 AS lat,
               ((c_custkey * 7919) % 3600) / 10.0 - 180.0 AS lon
        FROM customer
    ),
    supp_pts AS (
        SELECT s_suppkey,
               ((s_suppkey * 6547) % 1800) / 10.0 - 90.0 AS lat,
               ((s_suppkey * 4513) % 3600) / 10.0 - 180.0 AS lon
        FROM supplier
    )
"""


@query(
    "q_join_geo_radius",
    oracle=f"""
    WITH {_GEO_SQL_POINTS}
    SELECT c.c_custkey, s.s_suppkey,
           floor(((c.lat - s.lat) * (c.lat - s.lat)
                  + (c.lon - s.lon) * (c.lon - s.lon))
                 * 1000000.0 + 0.5) / 1000000.0 AS dist2
    FROM cust_pts c JOIN supp_pts s
      ON (c.lat - s.lat) * (c.lat - s.lat)
         + (c.lon - s.lon) * (c.lon - s.lon)
         <= {_GEO_RADIUS} * {_GEO_RADIUS}
    """,
)
def q_join_geo_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial radius join, grid-bucketed: customers matched to all
    suppliers within planar distance R of their (synthesized)
    coordinates. The oracle states the semantics as the naive
    all-pairs theta join; the engine plan is the SCALE formulation —
    snap both sides to an R-sized grid, explode the probe side to
    its 3×3 cell neighborhood, EQUI-join on the cell id, then apply
    the exact distance predicate to candidates only. Because the
    cell size equals the radius, every true match lies in a
    neighboring cell: recall is exact, and the all-pairs O(|C|·|S|)
    scan becomes Σ per-cell products — the standard spatial-join
    bucketing (same discipline as the LSH band-bucket and IVF cell
    joins in llm/).

    Coordinates are planar degrees (no spherical wraparound; the
    haversine variant swaps only the final predicate — kept planar
    so the cross-engine arithmetic stays transcendental-free:
    integer-mod synthesis, then identically-ordered double subtract/
    multiply/compare on both engines, with the boundary exact).

    Scale shape: the 9× probe fan-out is constant-factor, the join
    is a hash shuffle on (cell_x, cell_y) — skew only if points
    concentrate in one cell, the classic urban-hotspot case, handled
    the same way as any skewed key (salt or AQE); nothing is
    broadcast by hint and no side is scanned quadratically.
    """
    cust = table(spark, sf_dir, "customer").select(
        "c_custkey",
        (((F.col("c_custkey") * 9973) % 1800) / 10.0 - 90.0).alias("lat"),
        (((F.col("c_custkey") * 7919) % 3600) / 10.0 - 180.0).alias("lon"),
    )
    supp = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        (((F.col("s_suppkey") * 6547) % 1800) / 10.0 - 90.0).alias("s_lat"),
        (((F.col("s_suppkey") * 4513) % 3600) / 10.0 - 180.0).alias("s_lon"),
    )
    r = F.lit(_GEO_RADIUS)
    probe = (
        cust.select(
            "c_custkey",
            "lat",
            "lon",
            F.floor(F.col("lat") / r).alias("cx0"),
            F.floor(F.col("lon") / r).alias("cy0"),
        )
        .select(
            "*", F.explode(F.expr("array(-1, 0, 1)")).alias("dx")
        )
        .select(
            "c_custkey",
            "lat",
            "lon",
            (F.col("cx0") + F.col("dx")).alias("cx"),
            "cy0",
            F.explode(F.expr("array(-1, 0, 1)")).alias("dy"),
        )
        .select(
            "c_custkey", "lat", "lon", "cx", (F.col("cy0") + F.col("dy")).alias("cy")
        )
    )
    build = supp.select(
        "s_suppkey",
        "s_lat",
        "s_lon",
        F.floor(F.col("s_lat") / r).alias("cx"),
        F.floor(F.col("s_lon") / r).alias("cy"),
    )
    d2 = (F.col("lat") - F.col("s_lat")) * (F.col("lat") - F.col("s_lat")) + (
        F.col("lon") - F.col("s_lon")
    ) * (F.col("lon") - F.col("s_lon"))
    return (
        probe.join(build, ["cx", "cy"])
        .filter(d2 <= r * r)
        .select(
            "c_custkey",
            "s_suppkey",
            half_up(d2, 6).alias("dist2"),
        )
    )
