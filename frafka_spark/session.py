"""SparkSession factory tuned for this engine.

Local-mode defaults follow SURVEY.md §6: one shared session, shuffle
partitions ~ cores (AQE coalesces down when partitions are small),
UTC session timezone so timestamp semantics match the DuckDB oracle,
Arrow enabled for the pandas-UDF path.

At 100 TB these settings change shape, not kind: shuffle partitions
scale with cluster cores (or are left to AQE's
``spark.sql.adaptive.coalescePartitions.initialPartitionNum``), AQE
skew-join stays on, and CBO + table stats get enabled for join
reordering (SURVEY.md §4.2).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "frafka-spark",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a local SparkSession with engine defaults."""
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # 366 declared queries × whole-stage codegen × repeated bench
        # passes overflow HotSpot's 240 MB default code cache — the
        # JVM then DISABLES the JIT compiler mid-suite ("CodeHeap
        # 'non-profiled nmethods' is full", observed in every full
        # bench capture) and later passes run partly interpreted.
        # Applied at gateway launch like spark.driver.memory above;
        # sized for the full suite, env-overridable for smaller boxes.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize="
            + os.environ.get("SPARK_GRAFT_CODECACHE", "512m"),
        )
        .config("spark.ui.enabled", "false")
        # 32 MiB broadcast threshold: every dim table in the fixture star
        # schema broadcasts; at 100 TB the dims are still ≤ GBs vs a
        # multi-TB fact table, so broadcasting dims remains correct.
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # events.ts has shipped as TIMESTAMP(NANOS) in older fixture
        # generations (current fixtures are TIMESTAMP(MICROS, NTZ),
        # which needs no conf). Keep nanosAsLong on so a nanos fixture
        # reads first-try; io.table adapts per file either way (it
        # retries with this conf only on the Illegal-Parquet-type
        # error, and pins the session to UTC for the events read).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
