"""MERGE / upsert — the lakehouse write-path operator, batch-emulated.

The reference's sink is append-only Kafka; a table engine also needs
MERGE INTO (upsert): apply a change set to a target keyed table —
update matched rows, insert unmatched ones. Spark without Delta/
Iceberg has no MERGE statement, but the relational core is a keyed
full-outer join + per-row resolution, which is exactly how Delta
executes a whole-partition merge under the hood. Declared here over
the fixture tables so the resolution semantics are oracle-checked;
the lakehouse writers in ``sources/batch.py`` document the
transactional variant.

Scale shape: one shuffle of target ∪ changes on the merge key (or a
broadcast when the change set is small — the common CDC case, hinted
here); no driver-side state. At 100 TB the win over rewrite-the-world
is file-level pruning, which belongs to the table format; the
operator itself stays this join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from frafka_spark.io import table
from frafka_spark.registry import query


def merge_upsert(
    target: DataFrame, changes: DataFrame, key: str, broadcast_changes: bool = True
) -> DataFrame:
    """MERGE: rows from ``changes`` replace same-key rows of ``target``
    (matched → update all columns), unmatched change rows are inserted.

    Both inputs must share a schema. With ``broadcast_changes`` (the
    usual CDC asymmetry: small change set, huge target) the plan is
    shuffle-free on the target:

    - update branch: ``target LEFT JOIN broadcast(changes)`` +
      per-column coalesce — Spark cannot broadcast the build side of
      a FULL outer join (it warns and falls back), which is why the
      naive one-join MERGE emulation always shuffles the target;
    - insert branch: matched keys are found with a broadcast SEMI
      join against a key-only pruned scan of the target (output ≤
      |changes|), then anti-joined back to ``changes`` — broadcast
      again. The target is scanned twice, but the second scan reads
      ONE column and nothing ever shuffles.

    Pass ``broadcast_changes=False`` for a table-sized change set:
    both branches become plain shuffle joins on the key, which is the
    correct plan at that shape.

    Two deliberate divergences from Delta's MERGE (callers beware):

    - ``changes`` must be keyed (≤1 row per key). A duplicate-keyed
      change set fans out each matched target row once per duplicate
      (the left join multiplies rows) where Delta would raise
      ``DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW``. Dedup the
      change set first (e.g. keep the latest by a version column).
    - NULL in a change column means "keep the target value" (the
      per-column coalesce), so a column cannot be updated TO NULL
      through this helper. That is upsert-patch semantics, not
      SQL MERGE's unconditional ``UPDATE SET col = src.col``.
    """
    cols = target.columns
    ch = F.broadcast(changes) if broadcast_changes else changes
    t = target.alias("t")
    c = ch.alias("c")
    updated = t.join(c, F.col(f"t.{key}") == F.col(f"c.{key}"), "left").select(
        *[F.coalesce(F.col(f"c.{col}"), F.col(f"t.{col}")).alias(col) for col in cols]
    )
    matched_keys = target.select(key).join(ch.select(key), key, "left_semi")
    mk = F.broadcast(matched_keys) if broadcast_changes else matched_keys
    inserts = changes.join(mk, key, "left_anti").select(*cols)
    return updated.unionAll(inserts)


@query(
    "q_merge_upsert",
    oracle="""
    WITH changes AS (
        SELECT c_custkey, c_name, c_nationkey,
               CAST(round(CAST(c_acctbal AS DECIMAL(18,2))
                          * CAST(1.1 AS DECIMAL(3,1)), 2) AS DOUBLE)
                   AS c_acctbal,
               'UPGRADED' AS c_mktsegment
        FROM customer WHERE c_acctbal > 9000
        UNION ALL
        SELECT c_custkey + 1000000, c_name, c_nationkey,
               0.0 AS c_acctbal,
               'NEW' AS c_mktsegment
        FROM customer WHERE c_custkey % 100 = 0
    ),
    merged AS (
        SELECT coalesce(ch.c_custkey, t.c_custkey) AS c_custkey,
               coalesce(ch.c_name, t.c_name) AS c_name,
               coalesce(ch.c_nationkey, t.c_nationkey) AS c_nationkey,
               coalesce(ch.c_acctbal, t.c_acctbal) AS c_acctbal,
               coalesce(ch.c_mktsegment, t.c_mktsegment) AS c_mktsegment
        FROM (SELECT c_custkey, c_name, c_nationkey,
                     round(c_acctbal, 2) AS c_acctbal, c_mktsegment
              FROM customer) t
        FULL OUTER JOIN changes ch ON ch.c_custkey = t.c_custkey
    )
    SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey,
           round(c_acctbal, 2) AS c_acctbal, c_mktsegment
    FROM merged
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation: a deterministic CDC change set (balance
    upgrades for rich customers + planted brand-new rows) applied to
    the customer table — update-matched + insert-unmatched in one
    full-outer join, broadcast on the (small) change side.
    """
    base = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    )
    updates = base.filter(F.col("c_acctbal") > 9000).select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        # ×1.1 in exact DECIMAL: the double product lands on .xx5
        # rounding boundaries (9107.96 × 1.1), where Spark's HALF_UP
        # and DuckDB's binary-double rounding split; both engines
        # round exact decimals HALF_UP identically (determinism.py).
        F.round(
            F.col("c_acctbal").cast("decimal(18,2)")
            * F.lit(1.1).cast("decimal(3,1)"),
            2,
        )
        .cast("double")
        .alias("c_acctbal"),
        F.lit("UPGRADED").alias("c_mktsegment"),
    )
    inserts = base.filter(F.col("c_custkey") % 100 == 0).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        "c_name",
        "c_nationkey",
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    changes = updates.unionAll(inserts)
    merged = merge_upsert(base, changes, "c_custkey")
    return merged.select(
        "c_custkey",
        "c_name",
        F.col("c_nationkey").cast("bigint").alias("c_nationkey"),
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    )


@query(
    "q_merge_scd2",
    oracle="""
    WITH feed AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
               lag(o_orderpriority) OVER
                   (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders
    ),
    changes AS (
        SELECT * FROM feed WHERE prev IS NULL OR prev <> o_orderpriority
    ),
    versioned AS (
        SELECT o_custkey, o_orderdate, o_orderpriority,
               row_number() OVER w AS version,
               lead(o_orderdate) OVER w AS next_from
        FROM changes
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
    )
    SELECT o_custkey AS custkey,
           CAST(version AS INT) AS version,
           strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
           coalesce(strftime(next_from, '%Y-%m-%d'), '9999-12-31')
               AS valid_to,
           (next_from IS NULL) AS is_current,
           o_orderpriority AS attr
    FROM versioned
    """,
)
def q_merge_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: turn a change feed
    (each customer's orders, ordered by date, carrying the tracked
    attribute ``o_orderpriority``) into versioned validity intervals
    — ``[valid_from, valid_to)``, monotonically numbered versions,
    one open ``is_current`` row per key. The other half of the
    lakehouse write path next to ``q_merge_upsert``: MERGE keeps the
    latest state, SCD2 keeps the history a point-in-time join needs.

    The operator that makes it SCD2 rather than a plain lead/lag
    exercise is the RUN-LENGTH COLLAPSE: consecutive feed rows with
    an UNCHANGED attribute do not open a new version (lag-compare,
    keep first-of-run), so versions count attribute CHANGES — then
    the interval chain is rebuilt over the collapsed rows only.
    Same-day changes produce zero-length intervals, deterministically
    ordered by the orderkey tiebreak on both engines.

    Scale shape: two window passes, both PARTITIONED BY the dimension
    key (no global window, no single-task sort) — each customer's
    history sorts within its hash partition, the collapse filter
    prunes between the passes, and the output is bounded by the
    number of attribute changes, not the feed size. The date render
    is string-typed (the house rule: no timestamp-typed output).
    """
    from frafka_spark.llm.dedup import memoized_result

    return memoized_result(
        spark, sf_dir, "scd2_dim", lambda: _scd2_plan(spark, sf_dir)
    )


def _scd2_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw SCD2 interval build (pre-memo — plan pins render this
    directly; q_merge_scd2 and the PIT join share its session-cached
    result, the versioned-dim materialization a warehouse keeps)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    feed = table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        "o_orderpriority",
        F.lag("o_orderpriority").over(w).alias("prev"),
    )
    changes = feed.filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("o_orderpriority"))
    )
    versioned = changes.select(
        "o_custkey",
        "o_orderdate",
        "o_orderpriority",
        F.row_number().over(w).alias("version"),
        F.lead("o_orderdate").over(w).alias("next_from"),
    )
    return versioned.select(
        F.col("o_custkey").alias("custkey"),
        F.col("version").cast("int").alias("version"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("valid_from"),
        F.coalesce(
            F.date_format("next_from", "yyyy-MM-dd"), F.lit("9999-12-31")
        ).alias("valid_to"),
        F.col("next_from").isNull().alias("is_current"),
        F.col("o_orderpriority").alias("attr"),
    )


@query(
    "q_join_pit",
    oracle="""
    WITH feed AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_orderpriority,
               lag(o_orderpriority) OVER
                   (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders
    ),
    changes AS (
        SELECT * FROM feed WHERE prev IS NULL OR prev <> o_orderpriority
    ),
    dim AS (
        SELECT o_custkey AS custkey,
               strftime(o_orderdate, '%Y-%m-%d') AS valid_from,
               coalesce(strftime(lead(o_orderdate) OVER w, '%Y-%m-%d'),
                        '9999-12-31') AS valid_to,
               o_orderpriority AS attr
        FROM changes
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
    ),
    fact AS (
        SELECT l.l_orderkey, l.l_linenumber, o.o_custkey,
               strftime(l.l_shipdate, '%Y-%m-%d') AS ship_day
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT coalesce(d.attr, '(no history)') AS priority_at_ship,
           count(*) AS n_lines
    FROM fact f
    LEFT JOIN dim d ON d.custkey = f.o_custkey
                   AND f.ship_day >= d.valid_from
                   AND f.ship_day <  d.valid_to
    GROUP BY coalesce(d.attr, '(no history)')
    """,
)
def q_join_pit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join — the read-side payoff of SCD2: each shipped
    lineitem is joined to the dimension version that was VALID on its
    ship date (``valid_from ≤ ship_day < valid_to``), recovering the
    customer's order-priority state as of shipment, then aggregated.
    This is the temporal-validity join every warehouse runs against a
    versioned dimension (prices as-of order date, org charts as-of
    event time).

    Composes the DECLARED ``q_merge_scd2`` interval build (same CTE
    chain on the oracle side — the house composition rule). The
    interval endpoints are yyyy-MM-dd strings, whose lexicographic
    order IS chronological order, so the range predicate needs no
    date re-parse and the open '9999-12-31' sentinel compares
    correctly for free.

    Scale shape: the join carries an EQUALITY key (custkey) with the
    interval bounds as residual predicates — Spark shuffles both
    sides on custkey and evaluates the range inside the matched
    group (per-customer fan bounded by that customer's version
    count), never an all-pairs range join. The intervals PARTITION
    each customer's timeline from the first change record onward, so
    a fact row matches AT MOST one version; facts dated BEFORE the
    history began (this fixture's ship dates are not constrained to
    follow order dates) fall into an explicit '(no history)' bucket
    via LEFT join rather than silently dropping — exactly-one-
    match-or-bucket is the law the tests assert, the property that
    makes PIT joins safe to run unsupervised.
    """
    from frafka_spark.io import fan_wide

    dim = q_merge_scd2(spark, sf_dir).select(
        "custkey", "valid_from", "valid_to", "attr"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # fan the fact past the single-file scan width BEFORE the join
    # chain (the house layout rule): the fixture's lineitem scans as
    # 3 tasks, which otherwise caps the join+aggregate parallelism
    # (bench: 1.8 s -> 0.8 s at sf0.1); a multi-file 100 TB layout
    # gets this width from the scan itself.
    fact = (
        fan_wide(
            table(spark, sf_dir, "lineitem").select(
                "l_orderkey",
                "l_linenumber",
                F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
            ),
            "l_orderkey",
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return (
        fact.join(
            dim,
            (F.col("custkey") == F.col("o_custkey"))
            & (F.col("ship_day") >= F.col("valid_from"))
            & (F.col("ship_day") < F.col("valid_to")),
            "left",
        )
        .groupBy(
            F.coalesce(F.col("attr"), F.lit("(no history)")).alias(
                "priority_at_ship"
            )
        )
        .agg(F.count("*").alias("n_lines"))
    )


@query(
    "q_merge_cdc",
    oracle="""
    WITH feed AS (
        SELECT o_orderkey AS seq,
               o_custkey + CASE WHEN o_orderkey % 13 = 0
                                THEN 1000000 ELSE 0 END AS key,
               CASE WHEN o_orderkey % 97 = 0 THEN 'D'
                    WHEN o_orderkey % 13 = 0 THEN 'I'
                    ELSE 'U' END AS op,
               o_totalprice AS bal
        FROM orders
    ),
    compacted AS (
        SELECT key,
               CAST(count(*) AS BIGINT) AS n_ops,
               max_by(op, seq) AS last_op,
               max_by(bal, seq) AS last_bal
        FROM feed GROUP BY key
    ),
    applied AS (
        SELECT coalesce(c.key, t.c_custkey) AS c_custkey,
               coalesce(c.n_ops, 0) AS n_ops,
               coalesce(c.last_op, 'KEEP') AS last_op,
               CASE WHEN c.key IS NULL THEN t.c_acctbal
                    ELSE c.last_bal END AS acctbal,
               CASE WHEN c.key IS NULL THEN t.c_mktsegment
                    WHEN t.c_custkey IS NULL THEN 'CDC-NEW'
                    ELSE 'CDC' END AS segment
        FROM (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer) t
        FULL OUTER JOIN compacted c ON c.key = t.c_custkey
    )
    SELECT * FROM applied WHERE last_op <> 'D'
    """,
)
def q_merge_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC changefeed apply: compact an ordered I/U/D operation log
    to the LATEST op per key, then apply it to a keyed target in one
    pass — the third lakehouse write-path member next to
    ``q_merge_upsert`` (stateless patch) and ``q_merge_scd2``
    (history build). This is how Debezium/binlog feeds land in a
    table: ops on the same key supersede each other by log sequence,
    a trailing D tombstone deletes the row no matter what preceded
    it, and an I on an unseen key inserts.

    The feed is synthesized deterministically from ``orders`` (the
    house sentinel rule): each order is an op on its customer keyed
    by the unique ``o_orderkey`` as the log sequence — ``%97`` rows
    are delete tombstones, ``%13`` rows target a shifted brand-new
    key (inserts), the rest update the balance to the order's total.

    Scale shape: compaction is ONE hash aggregate (``max_by`` keyed
    on the unique sequence — partial-aggregates map-side, so a
    billion-op log reduces to |keys| rows before the shuffle), and
    the apply is ONE full-outer shuffle join target ∪ compacted on
    the key. No window over the log (a per-key ``row_number`` DESC
    formulation sorts the whole feed; ``max_by`` does not), no
    broadcast of anything unbounded — the change set compacts to
    table-sized, the asymmetric-broadcast variant stays
    ``merge_upsert``'s territory.
    """
    feed = table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("seq"),
        (
            F.col("o_custkey")
            + F.when(F.col("o_orderkey") % 13 == 0, 1000000).otherwise(0)
        ).alias("key"),
        F.when(F.col("o_orderkey") % 97 == 0, "D")
        .when(F.col("o_orderkey") % 13 == 0, "I")
        .otherwise("U")
        .alias("op"),
        F.col("o_totalprice").alias("bal"),
    )
    compacted = feed.groupBy("key").agg(
        F.count("*").cast("bigint").alias("n_ops"),
        F.max_by("op", "seq").alias("last_op"),
        F.max_by("bal", "seq").alias("last_bal"),
    )
    target = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    applied = target.join(
        compacted, F.col("c_custkey") == F.col("key"), "full_outer"
    ).select(
        F.coalesce(F.col("key"), F.col("c_custkey")).alias("c_custkey"),
        F.coalesce(F.col("n_ops"), F.lit(0).cast("bigint")).alias("n_ops"),
        F.coalesce(F.col("last_op"), F.lit("KEEP")).alias("last_op"),
        F.when(F.col("key").isNull(), F.col("c_acctbal"))
        .otherwise(F.col("last_bal"))
        .alias("acctbal"),
        F.when(F.col("key").isNull(), F.col("c_mktsegment"))
        .when(F.col("c_custkey").isNull(), "CDC-NEW")
        .otherwise("CDC")
        .alias("segment"),
    )
    return applied.filter(F.col("last_op") != "D")
