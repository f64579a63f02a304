"""Lakehouse MAINTENANCE DML on the graded surface — declared queries
over manifest tables that have lived through the two rewrite commits a
100 TB table cannot avoid (``sources/manifest_table.py``):

- **compaction** (``q_scan_compacted``): a table accreted as many
  small append commits — the shape every streaming sink and frequent
  micro-batch loader produces — compacted into few right-sized files
  by one ``compact`` commit. The read answer must be bit-identical to
  the pre-compaction table (compaction is a logical no-op), which the
  DuckDB oracle proves from the flat fixture.
- **file-pruned DELETE** (``q_scan_deleted``): a range-clustered
  table with manifest min/max stats, hit by a copy-on-write
  ``delete_rows`` that rewrites ONLY the files whose span intersects
  the predicate and carries every other file byte-identical. The
  latest snapshot must answer exactly like the fixture filtered with
  ``NOT BETWEEN`` — and the lifecycle pytest pins that pruning
  actually happened (carried files, verbatim stats entries, intact
  pre-delete time travel, delete-tagged CDF).

Why these are graded and not just unit-tested: at 100 TB, OPTIMIZE
and DELETE are the two operations that rewrite data outside a query,
and the failure mode of a broken rewrite is a silently wrong ANSWER
on every subsequent read — exactly what the driver's differential is
built to catch.
"""

from __future__ import annotations

import json
import os
import threading
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frafka_spark.io import table
from frafka_spark.registry import query

#: the DELETE predicate both engines apply: orderkeys in [DEL_LO,
#: DEL_HI] are removed — a contiguous key range so manifest stats can
#: prune. Fixture orderkeys are DENSE 0..N-1, so the range must stay
#: well under the smallest fixture's N (sf0.001 has 1500 orders) for
#: the key to exercise a partial delete at every scale
DEL_LO = 1
DEL_HI = 512
#: range-cluster width for the deletable table (files ≈ disjoint
#: orderkey spans, the layout a real table earns by clustering)
N_RANGE_FILES = 8
#: small-append count for the compaction table
N_APPENDS = 6

_LH_LOCK = threading.Lock()
#: (appId, sf_dir, which) → table path
_LH_MEMO: dict[tuple[str, str, str], str] = {}


def _build_compact_table(spark: SparkSession, sf_dir: str, tmp: Path) -> None:
    """v0..v5: six small appends (orderkey mod-6 slices, each split
    into 2 files — the micro-batch accretion shape); v6: compact."""
    from frafka_spark.sources.manifest_table import compact, write_table

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    for i in range(N_APPENDS):
        write_table(
            o.filter(F.col("o_orderkey") % N_APPENDS == i).repartition(2),
            str(tmp),
            mode="append" if i else "overwrite",
        )
    compact(spark, str(tmp))


def _build_deleted_table(spark: SparkSession, sf_dir: str, tmp: Path) -> None:
    """v0: range-clustered stats write; v1: file-pruned DELETE of
    orderkeys in [DEL_LO, DEL_HI]."""
    from frafka_spark.sources.manifest_table import (
        delete_rows,
        write_table_with_stats,
    )

    o = (
        table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .repartitionByRange(N_RANGE_FILES, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
    )
    write_table_with_stats(o, str(tmp), ["o_orderkey"], mode="overwrite")
    delete_rows(spark, str(tmp), "o_orderkey", DEL_LO, DEL_HI)


_BUILDERS = {
    "orders_compacted": _build_compact_table,
    "orders_deleted": _build_deleted_table,
}


def _ensure_table(spark: SparkSession, sf_dir: str, which: str) -> str:
    """Build (once per fixture generation) the ``which`` lifecycle
    table. Freshness-markered like the dpp/fileskip/evolution layouts;
    concurrent constructors serialize on the lock, and the memo makes
    repeat construction free within a session."""
    key = (spark.sparkContext.applicationId, sf_dir, which)
    root = (
        Path(__file__).resolve().parents[2]
        / "spark-warehouse"
        / "lakehouse_layout"
        / (Path(sf_dir).name or "sf")
    )
    dest = root / which
    marker = root / f"{which}.source.json"
    st = os.stat(Path(sf_dir) / "orders.parquet")
    # constants participate in the fingerprint so changing the graded
    # predicate/layout invalidates a stale on-disk lifecycle table
    fp = {
        "size": st.st_size,
        "mtime_ns": st.st_mtime_ns,
        "params": [DEL_LO, DEL_HI, N_RANGE_FILES, N_APPENDS],
    }
    with _LH_LOCK:
        hit = _LH_MEMO.get(key)
        if hit is not None:
            return hit
        fresh = False
        try:
            fresh = json.loads(marker.read_text()) == fp and any(
                (dest / "_manifest").iterdir()
            )
        except (OSError, json.JSONDecodeError):
            pass
        if not fresh:
            import shutil
            import time

            tmp = root / f"_lhbuild_{os.getpid()}_{time.monotonic_ns()}"
            _BUILDERS[which](spark, sf_dir, tmp)
            # manifests record absolute paths — retarget before the
            # rename-aside swap (the fileskip._ensure_layout pattern)
            for mf in (tmp / "_manifest").glob("v*.json"):
                m = json.loads(mf.read_text())
                m["files"] = [
                    f.replace(str(tmp), str(dest), 1) for f in m["files"]
                ]
                if "stats" in m:
                    m["stats"] = {
                        k.replace(str(tmp), str(dest), 1): v
                        for k, v in m["stats"].items()
                    }
                mf.write_text(json.dumps(m))
            trash = None
            if dest.exists():
                trash = root / f"_trash_{os.getpid()}_{time.monotonic_ns()}"
                os.rename(dest, trash)
            dest.parent.mkdir(parents=True, exist_ok=True)
            try:
                os.rename(tmp, dest)
            except OSError:
                if not any((dest / "_manifest").iterdir()):
                    raise
                shutil.rmtree(tmp, ignore_errors=True)
            marker.write_text(json.dumps(fp))
            if trash is not None:
                shutil.rmtree(trash, ignore_errors=True)
        _LH_MEMO[key] = str(dest)
        return str(dest)


@query(
    "q_scan_compacted",
    oracle="""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS price_cents
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q_scan_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPACTION as a logical no-op, graded: the orders table built
    as six mod-6 append commits of two files each (the small-file
    accretion every micro-batch sink produces) and then rewritten by
    one ``compact`` commit must answer a priority rollup EXACTLY like
    the flat fixture — same rows, same cents. The lifecycle pytest
    additionally pins the physical contract (fewer files after,
    pre-compaction snapshot time-travels, CDF across the compact
    commit is empty).

    Exactness: counts are longs; the price rollup is per-row half-up
    cents summed as BIGINTs.

    Scale shape: compaction cost is one distributed read+write of the
    live snapshot, sized by bytes (``ceil(bytes/target)`` output
    files) with no extra pass; the read after it is the point — a
    table that accreted a million micro-batch files reads at
    per-file-open cost until OPTIMIZE, and the rewrite must never
    change an answer. The rollup itself is a scan + one
    map-side-combined hash aggregate.
    """
    from frafka_spark.sources.manifest_table import read_table

    path = _ensure_table(spark, sf_dir, "orders_compacted")
    t = read_table(spark, path)
    return t.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        )
        .cast("bigint")
        .alias("price_cents"),
    )


@query(
    "q_scan_deleted",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS price_cents
    FROM orders
    WHERE NOT (o_orderkey BETWEEN {DEL_LO} AND {DEL_HI})
    GROUP BY o_orderpriority
    """,
)
def q_scan_deleted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-pruned copy-on-write DELETE, graded end-to-end: the
    range-clustered orders table (manifest min/max stats on the
    cluster key) after ``delete_rows(o_orderkey BETWEEN {DEL_LO} AND
    {DEL_HI})`` must answer the priority rollup exactly like the
    fixture filtered with ``NOT BETWEEN``. The lifecycle pytest pins
    what the differential can't see: only span-intersecting files
    were rewritten, untouched files carried byte-identical with their
    stats entries verbatim, the pre-delete snapshot still
    time-travels, and CDF across the commit is exactly the deleted
    rows tagged ``'delete'``.

    Exactness: counts are longs; the price rollup is per-row half-up
    cents summed as BIGINTs; the deleted key range is a fixed corpus
    constant applied with identical integer comparisons.

    Scale shape: THE reason row-level DML is viable at 100 TB — a
    DELETE on a clustered key touches O(files whose span intersects)
    instead of copying the table (``merge_table``'s documented
    refinement, implemented). The read is a plain multi-file scan +
    one hash aggregate; deleted files stay until ``vacuum``, so time
    travel and CDF keep their contracts.
    """
    from frafka_spark.sources.manifest_table import read_table

    path = _ensure_table(spark, sf_dir, "orders_deleted")
    t = read_table(spark, path)
    return t.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
        )
        .cast("bigint")
        .alias("price_cents"),
    )
