"""Batch sources and sinks beyond the fixture loader.

The reference reads exactly one thing (Kafka); an engine a frafka
user switches to also needs the batch formats. Everything funnels
through ``spark.read``/``DataFrameWriter`` so Catalyst keeps
pushdown/pruning; schemas are explicit (inference is a full extra
scan of 100 TB).

Lakehouse formats (Delta/Iceberg/Hudi) need jars absent from this
environment — their constructors are import-try-gated stubs that
fail with an actionable message rather than a classpath error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

BATCH_FORMATS = ("parquet", "csv", "json", "orc", "text")


def read_batch(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    **options: str,
) -> DataFrame:
    """Read a batch table with an explicit schema.

    CSV/JSON default to permissive mode with a ``_corrupt_record``
    column — the batch analog of the streaming DLQ split (malformed
    rows are captured, not dropped and not fatal).
    """
    if fmt not in BATCH_FORMATS:
        raise ValueError(f"unsupported batch format {fmt!r}; known: {BATCH_FORMATS}")
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt in ("csv", "json"):
        raise ValueError(f"{fmt} requires an explicit schema (inference = extra scan)")
    # "text" needs no schema: one line per row in a single string
    # column `value` — the raw .txt corpus-shard front door (pair
    # with input_file_name() for provenance)
    if fmt == "csv":
        options.setdefault("header", "true")
        options.setdefault("mode", "PERMISSIVE")
    if fmt == "json":
        options.setdefault("mode", "PERMISSIVE")
    return reader.options(**options).load(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write with the 100 TB layout: directory partitions for pruning.

    ``partition_by`` columns become directory levels — date-partition
    the fact tables so time predicates prune before any IO
    (plans/scale_notes.md § layout).
    """
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_by: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """Persist as a bucketed managed table: co-located joins on the
    bucket key need no shuffle (the batch analog of Kafka's
    partition-by-key contract)."""
    writer = df.write.format("parquet").mode("overwrite").bucketBy(
        n_buckets, bucket_by
    )
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name)


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    """Delta Lake reader — STUB: delta-spark jars not in this image.

    The transactional semantics themselves (atomic snapshot commits,
    time travel, optimistic concurrency) are implemented natively and
    jar-free in ``sources/manifest_table.py`` — use that for tables
    this engine owns; this stub is for reading EXISTING Delta tables.
    """
    try:
        import delta  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "Delta Lake requires the delta-spark package and its jars on "
            "the session classpath (spark.jars.packages=io.delta:delta-spark_2.13:...)"
        ) from exc
    return spark.read.format("delta").load(path)


def read_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Apache Iceberg reader — STUB: iceberg runtime jar not in this image."""
    if "spark.sql.catalog.iceberg" not in {
        k for k, _ in spark.sparkContext.getConf().getAll()
    }:
        raise NotImplementedError(
            "Iceberg requires the iceberg-spark-runtime jar and a catalog "
            "config (spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog)"
        )
    return spark.read.table(table)
