"""Batch source/sink layer (sources/batch.py): format round-trips,
permissive corrupt-record capture, partitioned layout pruning, and the
gated lakehouse stubs.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from frafka_spark.io import table
from frafka_spark.plans.inspect import pushed_filters
from frafka_spark.sources.batch import (
    read_batch,
    read_delta,
    read_iceberg,
    write_partitioned,
)

from tests.conftest import SF_DIR


def test_csv_json_roundtrip_with_schema(spark, tmp_path):
    src = table(spark, SF_DIR, "region")
    for fmt in ("csv", "json", "orc"):
        path = str(tmp_path / fmt)
        src.write.format(fmt).option("header", "true").save(path)
        got = read_batch(
            spark, path, fmt, schema="r_regionkey int, r_name string"
        )
        assert sorted(r["r_name"] for r in got.collect()) == sorted(
            r["r_name"] for r in src.collect()
        )


def test_csv_requires_schema(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_batch(spark, str(tmp_path), "csv")


def test_json_permissive_captures_corrupt_records(spark, tmp_path):
    """Malformed rows land in _corrupt_record — the batch DLQ analog."""
    p = tmp_path / "data.json"
    p.write_text('{"a": 1}\n{"a": 2}\nNOT JSON AT ALL\n{"a": 3}\n')
    got = read_batch(
        spark,
        str(p),
        "json",
        schema="a int, _corrupt_record string",
    ).cache()
    assert got.filter(F.col("_corrupt_record").isNotNull()).count() == 1
    assert got.filter(F.col("a").isNotNull()).count() == 3


def test_partitioned_write_prunes(spark, tmp_path):
    """Date-directory layout: a partition predicate prunes the scan."""
    out = str(tmp_path / "orders_by_status")
    o = table(spark, SF_DIR, "orders")
    write_partitioned(o, out, partition_by=["o_orderstatus"])
    got = spark.read.parquet(out).filter(F.col("o_orderstatus") == "F")
    assert got.count() == o.filter(F.col("o_orderstatus") == "F").count()
    # Partition pruning: only the o_orderstatus=F directory is listed.
    files = {f["file"] for f in got.select(F.input_file_name().alias("file")).collect()}
    assert files and all("o_orderstatus=F" in f for f in files)


def test_parquet_filter_pushdown_via_helper(spark):
    df = table(spark, SF_DIR, "lineitem").filter(F.col("l_quantity") > 10)
    (filters,) = pushed_filters(df)
    assert "l_quantity" in filters


def test_lakehouse_stubs_fail_actionably(spark):
    with pytest.raises(NotImplementedError, match="delta-spark"):
        read_delta(spark, "/tmp/nope")
    with pytest.raises(NotImplementedError, match="iceberg"):
        read_iceberg(spark, "iceberg.db.t")
