"""Frequency / membership sketches with EXACT cross-engine parity:
a Count-Min frequency sketch and a Bloom-filter membership audit.

The repo's other sketch operators (``q_agg_approx_distinct`` HLL,
``q_agg_approx_quantile`` GK, ``q_agg_sketch_merge`` Datasketches)
are rows-only by design — their estimates are engine-specific. These
two close that gap for the sketch *family*: both are built from a
pairwise-independent Carter–Wegman hash family

    h_i(x) = ((x * A_i + B_i) mod P) mod W,   P = 2^31 − 1

over integer keys — plain 64-bit integer arithmetic that both
engines evaluate bit-identically, so the full sketch (every cell
count, every bit, every estimate) is hash-checked against the DuckDB
oracle, not merely bounded. This mirrors production CMS/Bloom
implementations, which use exactly this universal family; md5-slice
hashing (the dedup modules' idiom) would work too but costs a digest
per (row, seed) where CW costs one multiply-add.

Scale shape (100 TB lens): a Count-Min table is D×W cells and a
Bloom filter K×M bits — CODE CONSTANTS, not data-sized — so both
relations collapse map-side to ≤ D·W (resp. ≤ K·M) rows per
partition before their shuffle and are broadcast-joinable by
construction on the probe side. The only data-bounded shuffles are
the per-key true-count group-bys the audits themselves need. This is
the same "bounded build side" discipline as similarity.py's codebook
broadcast, here enforced by the sketch's own geometry.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from frafka_spark.functions.determinism import half_up, sql_half_up
from frafka_spark.io import table
from frafka_spark.registry import query

# Carter–Wegman family constants (primes; P = 2^31 − 1, Mersenne).
CW_P = 2_147_483_647
CW_A = (1_299_721, 15_485_863, 32_452_843, 49_979_687)
CW_B = (104_729, 224_737, 350_377, 479_909)

CMS_DEPTH = 4  # hash rows (one per (A, B) pair)
CMS_WIDTH = 64  # buckets per row
CMS_TOP = 10  # audited heavy keys

BLOOM_M = 4_096  # bits
BLOOM_K = 3  # hash functions (first K of the CW family)
# Member set: "whale" customers (any order at/above this price) — a
# selective predicate so the probe universe has true non-members to
# measure the false-positive rate against (this fixture's every
# customer orders, so bare o_custkey membership has no negatives).
BLOOM_MEMBER_MIN_PRICE = 495_000


def _cw_bucket(key: Column, i: int, width: int) -> Column:
    """h_i(key) — identical single chain of bigint ops on both engines.

    Overflow contract: ``key * A_i`` stays under 2^63 for keys up to
    ~1.8e11 with the largest A (4.99e7) — far above any fixture or
    TPC-H key range; beyond that, pre-reduce the key mod P first.
    """
    return ((key * CW_A[i] + CW_B[i]) % CW_P % width).cast("bigint")


def _cw_bucket_sql(key: str, i: int, width: int) -> str:
    return f"(({key} * {CW_A[i]} + {CW_B[i]}) % {CW_P} % {width})"


@query(
    "q_agg_cms",
    oracle=f"""
    WITH seeds AS (SELECT unnest([0, 1, 2, 3]) AS i),
    hashed AS (
        SELECT s.i,
               CASE s.i
                   {" ".join(
                       f"WHEN {i} THEN {_cw_bucket_sql('e.user_id', i, CMS_WIDTH)}"
                       for i in range(CMS_DEPTH)
                   )}
               END AS bucket,
               e.user_id
        FROM events e CROSS JOIN seeds s
    ),
    cms AS (
        SELECT i, bucket, CAST(count(*) AS BIGINT) AS cell
        FROM hashed GROUP BY i, bucket
    ),
    truec AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS true_cnt
        FROM events GROUP BY user_id
        ORDER BY true_cnt DESC, user_id ASC
        LIMIT {CMS_TOP}
    ),
    probe AS (
        SELECT t.user_id, t.true_cnt, c.cell
        FROM truec t CROSS JOIN seeds s
        JOIN cms c
          ON c.i = s.i
         AND c.bucket = CASE s.i
                   {" ".join(
                       f"WHEN {i} THEN {_cw_bucket_sql('t.user_id', i, CMS_WIDTH)}"
                       for i in range(CMS_DEPTH)
                   )}
               END
    )
    SELECT user_id, true_cnt,
           min(cell) AS est_cnt,
           min(cell) - true_cnt AS over_cnt
    FROM probe
    GROUP BY user_id, true_cnt
    """,
)
def q_agg_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency audit: build a D=4 × W=64 CMS over
    the event stream's ``user_id`` occurrences, then for the top-10
    true-frequency users report the sketch estimate
    ``min_i cms[i][h_i(u)]`` next to the exact count and the
    guaranteed-nonnegative overcount — the standard
    heavy-hitter-frequency primitive when the key cardinality is too
    large for an exact per-key table.

    Everything is integer: CW bucket hashing, cell counts, the min
    over depth rows — the whole sketch hash-matches the oracle cell
    for cell (via the estimates), no float anywhere.

    Scale shape: the sketch build explodes each event into D rows but
    the hash-aggregate's map-side partials collapse them to ≤ D·W
    (256) rows per partition before the shuffle, so sketch-build
    shuffle bytes are constant in corpus size. The true-count top-10
    (the audit's ground truth, not part of the sketch) is the usual
    partial-agg + TakeOrdered pair, and the probe joins the
    D·W-row CMS relation broadcast — bounded by construction, hinted.
    """
    e = table(spark, sf_dir, "events").select("user_id")
    seeds = range(CMS_DEPTH)
    cells = e.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _cw_bucket(F.col("user_id"), i, CMS_WIDTH).alias(
                            "bucket"
                        ),
                    )
                    for i in seeds
                ]
            )
        ).alias("h")
    ).select("h.i", "h.bucket")
    cms = cells.groupBy("i", "bucket").agg(
        F.count("*").cast("bigint").alias("cell")
    )
    truec = (
        e.groupBy("user_id")
        .agg(F.count("*").cast("bigint").alias("true_cnt"))
        .orderBy(F.desc("true_cnt"), F.asc("user_id"))
        .limit(CMS_TOP)
    )
    probe = truec.select(
        "user_id",
        "true_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _cw_bucket(F.col("user_id"), i, CMS_WIDTH).alias(
                            "bucket"
                        ),
                    )
                    for i in seeds
                ]
            )
        ).alias("h"),
    ).select("user_id", "true_cnt", "h.i", "h.bucket")
    return (
        probe.join(F.broadcast(cms), ["i", "bucket"])
        .groupBy("user_id", "true_cnt")
        .agg(F.min("cell").alias("est_cnt"))
        .select(
            "user_id",
            "true_cnt",
            "est_cnt",
            (F.col("est_cnt") - F.col("true_cnt")).alias("over_cnt"),
        )
    )


@query(
    "q_agg_bloom",
    oracle=f"""
    WITH members AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE o_totalprice >= {BLOOM_MEMBER_MIN_PRICE}
    ),
    seeds AS (SELECT unnest([0, 1, 2]) AS j),
    bits AS (
        SELECT DISTINCT s.j,
               CASE s.j
                   {" ".join(
                       f"WHEN {j} THEN {_cw_bucket_sql('m.k', j, BLOOM_M)}"
                       for j in range(BLOOM_K)
                   )}
               END AS bit
        FROM members m CROSS JOIN seeds s
    ),
    probe_bits AS (
        SELECT c.c_custkey AS k, s.j,
               CASE s.j
                   {" ".join(
                       f"WHEN {j} THEN {_cw_bucket_sql('c.c_custkey', j, BLOOM_M)}"
                       for j in range(BLOOM_K)
                   )}
               END AS bit
        FROM customer c CROSS JOIN seeds s
    ),
    hits AS (
        SELECT p.k, CAST(count(b.bit) AS BIGINT) AS n_hit
        FROM probe_bits p
        LEFT JOIN bits b ON b.j = p.j AND b.bit = p.bit
        GROUP BY p.k
    ),
    verdicts AS (
        SELECT h.k,
               (h.n_hit = {BLOOM_K}) AS positive,
               (m.k IS NOT NULL) AS member
        FROM hits h LEFT JOIN members m ON m.k = h.k
    )
    SELECT CAST((SELECT count(*) FROM members) AS BIGINT) AS n_members,
           CAST((SELECT count(*) FROM bits) AS BIGINT) AS n_bits_set,
           CAST(count(*) AS BIGINT) AS n_probes,
           CAST(sum(CASE WHEN member THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true_members,
           CAST(sum(CASE WHEN positive THEN 1 ELSE 0 END) AS BIGINT)
               AS bloom_positives,
           CAST(sum(CASE WHEN positive AND NOT member THEN 1 ELSE 0 END)
                AS BIGINT) AS false_positives,
           CAST(sum(CASE WHEN member AND NOT positive THEN 1 ELSE 0 END)
                AS BIGINT) AS false_negatives,
           {sql_half_up(
               "CAST(sum(CASE WHEN positive AND NOT member THEN 1 ELSE 0 END)"
               " AS DOUBLE) / sum(CASE WHEN NOT member THEN 1 ELSE 0 END)",
               6,
           )} AS fp_rate
    FROM verdicts
    """,
)
def q_agg_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership audit: set K=3 CW-hash bits per member
    key (the distinct ``o_custkey`` set) in an M=4096-bit filter,
    probe EVERY customer key, and report the confusion counts — the
    false-negative column is structurally zero (a Bloom filter's
    defining guarantee, also property-tested) and the false-positive
    rate is the measured cost of the M/K geometry. This is the
    join-pre-filter primitive: at scale the filter replaces a shuffle
    of the probe side with a broadcast bitmap test that discards
    non-members early (Spark's own runtime row-group Bloom pushdown
    does exactly this; here the mechanism is first-class and
    auditable).

    Everything except the one fp-rate quotient (pinned half-up) is
    integer counting, so the audit hash-matches exactly.

    Scale shape: the bit set is ≤ K·M rows — a code constant — built
    with map-side-collapsing DISTINCTs and broadcast to the probe
    join (hinted, bounded by construction). Probe keys stream through
    one explode + broadcast join + per-key count; the only
    data-bounded shuffles are the member DISTINCT and the per-key
    hit count, both ∝ keys, never ∝ events.
    """
    # members feeds three consumers (bit build, membership join, the
    # n_members scalar) and bits two — cache both so the orders scan
    # + distinct shuffle run once (shared-subtree discipline).
    members = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") >= BLOOM_MEMBER_MIN_PRICE)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
        .cache()
    )
    seeds = range(BLOOM_K)

    def bit_rows(df: DataFrame, key: str) -> DataFrame:
        return df.select(
            F.col(key).alias("k"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            _cw_bucket(F.col(key), j, BLOOM_M).alias("bit"),
                        )
                        for j in seeds
                    ]
                )
            ).alias("h"),
        ).select("k", "h.j", "h.bit")

    bits = bit_rows(members, "k").select("j", "bit").distinct().cache()
    probes = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("k")
    )
    # USING-join semantics coalesce the join columns, so membership
    # must be detected via a right-side marker, not bit-nullness.
    hits = (
        bit_rows(probes, "k")
        .join(
            F.broadcast(bits.withColumn("hit", F.lit(1))),
            ["j", "bit"],
            "left",
        )
        .groupBy("k")
        .agg(F.sum(F.coalesce("hit", F.lit(0))).alias("n_hit"))
    )
    verdicts = (
        hits.join(
            members.select(F.col("k"), F.lit(True).alias("is_member")),
            "k",
            "left",
        )
        .select(
            "k",
            (F.col("n_hit") == BLOOM_K).alias("positive"),
            F.coalesce("is_member", F.lit(False)).alias("member"),
        )
    )
    # Filter-geometry scalars as 1-row relational aggregates (no
    # driver-side action; both are broadcast one-row cross joins).
    n_members = members.agg(F.count("*").cast("bigint").alias("n_members"))
    n_bits_set = bits.agg(F.count("*").cast("bigint").alias("n_bits_set"))
    fp = F.sum(F.when(F.col("positive") & ~F.col("member"), 1).otherwise(0))
    return verdicts.crossJoin(F.broadcast(n_members)).crossJoin(
        F.broadcast(n_bits_set)
    ).groupBy("n_members", "n_bits_set").agg(
        F.count("*").cast("bigint").alias("n_probes"),
        F.sum(F.when(F.col("member"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_true_members"),
        F.sum(F.when(F.col("positive"), 1).otherwise(0))
        .cast("bigint")
        .alias("bloom_positives"),
        fp.cast("bigint").alias("false_positives"),
        F.sum(F.when(F.col("member") & ~F.col("positive"), 1).otherwise(0))
        .cast("bigint")
        .alias("false_negatives"),
        half_up(
            fp.cast("double")
            / F.sum(F.when(~F.col("member"), 1).otherwise(0)),
            6,
        ).alias("fp_rate"),
    )
