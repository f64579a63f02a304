"""Bucketed co-located fact⋈fact join, executed for real.

The second §4 layout behavior elevated from pytest to a DECLARED
query (the DPP sibling, ``operators/dpp.py``): ``orders`` and
``lineitem`` are persisted ONCE per session as bucketed managed
tables on the join key (``sources/batch.py:write_bucketed_table`` —
Spark's bucketing contract: same key, same bucket count, files
pre-hashed into matching buckets), and the declared rollup joins
them with ZERO Exchange on either side — the plan property that
decides whether a 100 TB fact⋈fact join pays two full-table shuffles
per run or none ever (plan-pinned in tests/test_plans.py; a
100 TB deployment writes the bucketed layout once at ingest and
amortizes it over every subsequent join, exactly as modeled here).

The differential oracle reads the SAME rows from the flat parquet
fixtures — layout changes the plan, never the answer.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frafka_spark.io import table
from frafka_spark.registry import query

N_BUCKETS = 8

_BUCKET_LOCK = threading.Lock()
_BUCKETED: dict[tuple[str, str], tuple[str, str]] = {}


def _bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write (once per session+fixture) and return the managed
    bucketed table names for orders/lineitem keyed on orderkey.

    The write is the one-time layout job a production pipeline runs
    at ingest: one shuffle into ``N_BUCKETS`` pre-hashed files per
    table, after which every orderkey join is exchange-free. Only
    the joined columns are persisted (the bucketed copy is a join
    index, not a second copy of the fact)."""
    import hashlib
    from pathlib import Path

    # The tag must be unique per FIXTURE PATH, not per basename: the
    # memo keys on the full sf_dir, so two fixture dirs sharing a
    # basename in one session would otherwise have the second build
    # DROP and rewrite the fs_bkt_* tables the first memo entry still
    # points to (ADVICE r9). A short path hash disambiguates.
    base = (Path(sf_dir).name or "sf").replace(".", "_").replace("-", "_")
    phash = hashlib.sha1(
        str(Path(sf_dir).resolve()).encode()
    ).hexdigest()[:8]
    # Bucketing metadata lives in the session catalog (in-memory for
    # this repo), so tables can never be REUSED across processes —
    # every process builds its own. Folding the applicationId into
    # the name makes concurrent processes (pytest beside a driver
    # sim, two CI jobs) build DISJOINT locations instead of racing
    # one shared name with drop-and-rewrite.
    apphash = hashlib.sha1(
        spark.sparkContext.applicationId.encode()
    ).hexdigest()[:8]
    tag = f"{base}_{phash}_{apphash}"
    key = (spark.sparkContext.applicationId, sf_dir)
    with _BUCKET_LOCK:
        hit = _BUCKETED.get(key)
        if hit is not None:
            return hit
        o_name = f"fs_bkt_orders_{tag}"
        l_name = f"fs_bkt_lineitem_{tag}"
        o = table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority"
        )
        li = table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_returnflag", "l_quantity", "l_extendedprice"
        )
        from frafka_spark.sources.batch import write_bucketed_table

        # A previous run of THIS application id (session restart) may
        # have left the managed locations on disk while the in-memory
        # catalog has no entry — saveAsTable then fails
        # LOCATION_ALREADY_EXISTS. Drop/clear only OWN-tag locations;
        # other live processes' tables are untouched by construction.
        # Crashed runs' leftovers (other apphashes) are swept once
        # they are a WEEK old — the gc_orphans retention window. A
        # day proved too short: a long-running driver session (>24h)
        # would have its live tables rmtree'd by a newer process
        # while its in-memory catalog still pointed at them
        # (ADVICE r10).
        import shutil
        import time
        from urllib.parse import urlparse

        wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for name in (o_name, l_name):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
            shutil.rmtree(Path(wh) / name, ignore_errors=True)
        cutoff = time.time() - 7 * 24 * 3600
        for leftover in Path(wh).glob(f"fs_bkt_*_{base}_{phash}_*"):
            try:
                if leftover.stat().st_mtime < cutoff:
                    shutil.rmtree(leftover, ignore_errors=True)
            except OSError:
                pass

        write_bucketed_table(
            o, o_name, "o_orderkey", n_buckets=N_BUCKETS, sort_by="o_orderkey"
        )
        write_bucketed_table(
            li, l_name, "l_orderkey", n_buckets=N_BUCKETS, sort_by="l_orderkey"
        )
        _BUCKETED[key] = (o_name, l_name)
        return o_name, l_name


@query(
    "q_join_bucketed",
    oracle="""
    SELECT o.o_orderpriority, l.l_returnflag,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(floor(l.l_quantity + 0.5) AS BIGINT)) AS BIGINT)
               AS total_qty,
           CAST(sum(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority, l.l_returnflag
    """,
)
def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority × return-flag rollup over the orders⋈lineitem
    join, executed on BUCKETED layouts so the join itself moves no
    data: both tables are pre-hashed into matching orderkey buckets,
    Spark plans a SortMergeJoin whose children are bare bucketed
    scans — no Exchange on either side (pinned), the only shuffle in
    the query being the final small rollup.

    Exactness: counts are longs; quantity and price roll up as
    per-row half-up integers (units / cents) summed as BIGINTs —
    never an engine-ordered double sum. The oracle runs the same
    join over the flat fixture parquet: same rows, different plan.

    Scale shape: THE fact⋈fact pattern at 100 TB — an orderkey-
    bucketed orders and lineitem join with zero exchanges at ANY
    scale factor, where the unbucketed plan shuffles both full
    tables every run. Bucket count scales with the cluster (fixture
    uses 8); the one-time layout write is the amortized cost, and
    repeated joins (the common case: every query in this suite
    touching orders⋈lineitem) ride it for free.
    """
    o_name, l_name = _bucketed_tables(spark, sf_dir)
    bo = spark.table(o_name)
    bl = spark.table(l_name)
    return (
        bo.join(bl, bo.o_orderkey == bl.l_orderkey)
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
