"""Write-side data layout: z-order clustering and small-file compaction.

At 100 TB the scan is the query plan's biggest line item, and what
the scan can SKIP is decided at write time: parquet footers carry
per-row-group min/max statistics, and readers (Spark's parquet
filter pushdown, and every lakehouse engine) prune row groups whose
stat range excludes the predicate. A table sorted on one column
prunes on that column only; multi-dimensional workloads (filter by
part today, by supplier tomorrow) need a layout where EVERY listed
column's per-file range is narrow. Z-ordering delivers that by
sorting on the bit-interleaving of the columns' normalized ranks —
points close in the z-curve are close in every dimension, so each
file covers a small hyper-rectangle [public technique: Morton 1966;
used by Delta Lake OPTIMIZE ZORDER BY, Databricks engineering blog].

Everything here is declarative DataFrame work — the z-value is pure
built-in bit arithmetic (whole-stage codegen, no UDF), the
distribution is one ``repartitionByRange`` (range exchange on the
z-value), and the sort is partition-local. Cost: one shuffle of the
written data, the same price as any clustered write.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: bits per dimension in the interleaved key; 16 bits × up to 4 cols
#: stays within a bigint's 63 usable bits.
Z_BITS = 16


def zorder_key(*cols: str | Column, bits: int = Z_BITS) -> Column:
    """Bit-interleaved (Morton) key over integer columns in
    ``[0, 2**bits)``.

    Callers normalize first (see :func:`zorder_rank` for the
    rank-based normalizer used by :func:`write_zordered`). The
    interleave is a fixed unrolled expression — ``bits × n_cols``
    shift/mask/or terms, all codegen'd primitives; no Python runs
    per row.
    """
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    n = len(cols)
    if bits * n > 63:
        raise ValueError(f"{n} cols x {bits} bits exceeds a bigint")
    cs = [F.col(c).cast("bigint") if isinstance(c, str) else c.cast("bigint") for c in cols]
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        for i, c in enumerate(cs):
            bit = F.shiftright(c, b).bitwiseAND(F.lit(1))
            z = z + F.shiftleft(bit, b * n + i)
    return z


def zorder_rank(col: str, bits: int = Z_BITS) -> Column:
    """Normalize a column to ``[0, 2**bits)`` by scaled dense rank.

    Rank-based normalization (vs min-max scaling) is what production
    z-order implementations use: it is distribution-free, so skewed
    columns still spread evenly across the key space. This portable
    form (``dense_rank`` scaled by its max) plans one global sort —
    a deliberate trade for a write-time layout job, where the write
    shuffles everything once anyway; for strictly-distributed
    normalization at extreme scale, swap in
    ``range_partitioned_row_number`` (operators/windows.py), whose
    range-exchange formulation never funnels through one task.
    """
    w = Window.orderBy(F.col(col))
    r = F.dense_rank().over(w) - 1
    mx = F.max(r).over(Window.partitionBy())
    # scale into [0, 2**bits - 1] INCLUSIVE — scaling by 2**bits would
    # map the max rank to 2**bits exactly, and any wrap/clamp of that
    # value teleports the column's largest values into the lowest
    # z-bucket, widening that file's span to the full range.
    return (r * ((1 << bits) - 1) / F.greatest(mx, F.lit(1))).cast("bigint")


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 8,
    bits: int = Z_BITS,
) -> None:
    """Write ``df`` as parquet clustered on the z-order of ``cols``.

    ``repartitionByRange`` on the z-value gives each output file a
    contiguous z-range (narrow per-file min/max on every listed
    column — the prunable layout); the partition-local sort tightens
    ROW-GROUP stats inside each file. Integer columns only (parquet
    stat pruning on floats/strings works too, but rank normalization
    of them is caller's business).
    """
    ranked = df.select(
        "*", *[zorder_rank(c, bits).alias(f"__zr_{c}") for c in cols]
    )
    z = zorder_key(*[f"__zr_{c}" for c in cols], bits=bits).alias("__z")
    # Range boundaries come from reservoir sampling (default 100
    # rows/partition) — an unlucky draw hands one file a z-range wide
    # enough to ruin its min/max spans (observed as a rare test
    # flake). A layout job runs once and shuffles everything anyway;
    # 20× the sample is noise in its cost and makes boundary quality
    # deterministic in practice.
    spark = df.sparkSession
    key = "spark.sql.execution.rangeExchange.sampleSizePerPartition"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "2000")
    try:
        (
            ranked.select("*", z)
            .repartitionByRange(n_files, F.col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z", *[f"__zr_{c}" for c in cols])
            .write.mode("overwrite")
            .parquet(path)
        )
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def write_compacted(
    df: DataFrame, path: str, rows_per_file: int, n_files: int
) -> None:
    """Compact a (small-file-fragmented) relation into ``n_files``
    parquet files of at most ``rows_per_file`` rows.

    The streaming-sink follow-up every lakehouse pipeline runs:
    micro-batches leave thousands of KB-sized files, and file-open
    cost then dominates scans. One round-robin exchange to
    ``n_files`` partitions + ``maxRecordsPerFile`` as the safety cap.
    """
    (
        df.repartition(n_files)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_file)
        .parquet(path)
    )
