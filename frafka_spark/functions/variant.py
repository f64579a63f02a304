"""Semi-structured VARIANT surface (Spark 4): ``parse_json`` →
``variant_get`` typed extraction — the open-schema ingestion path a
Kafka-fed table engine needs when producers don't share a fixed
schema (the reference hands such payloads to user code [SURVEY §2
A13]; ``q_fn_json``'s ``from_json`` is the CLOSED-schema sibling that
needs the shape declared up front).

Differential design: the engine ROUND-TRIPS typed order columns
through a JSON payload into VARIANT and extracts them back, while the
oracle reads the original columns directly — so the check proves the
encode→parse→extract chain is lossless, not that two engines render
JSON identically. Per the house payload rule (q_fn_csv), only
integer and string fields ride the payload: double→string rendering
is engine-specific, and a real feed casts downstream of extraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frafka_spark.io import table
from frafka_spark.registry import query

# schema_of_variant renders object fields sorted by name; the fixture
# order columns are null-free (verified at all three sfs), so every
# row infers the same type text. Both constants are pinned here and
# asserted structurally in tests — a fixture with planted nulls would
# flip a field to VOID and fail the differential first.
_VTYPE = (
    "OBJECT<cust: OBJECT<id: BIGINT, st: STRING>, k: BIGINT,"
    " nul: VOID, tags: ARRAY<STRING>>"
)
_TAGS_TYPE = "ARRAY<STRING>"


@query(
    "q_fn_variant",
    oracle=f"""
    SELECT o_orderkey AS k,
           CAST(o_custkey AS BIGINT) AS cust_id,
           o_orderstatus AS cust_st,
           o_orderpriority AS tag1,
           CAST(NULL AS BIGINT) AS miss,
           TRUE AS nul_is_null,
           FALSE AS miss_is_null,
           '{_VTYPE}' AS vtype,
           '{_TAGS_TYPE}' AS tags_type
    FROM orders
    """,
)
def q_fn_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT family: build a JSON payload from order columns
    (nested object, array, explicit JSON null), ``parse_json`` it
    into a VARIANT, and extract typed values back out —
    ``variant_get`` with bigint/string targets and JSONPath steps
    (``$.cust.id``, ``$.tags[1]``), ``try_variant_get`` on an absent
    path (NULL, no error), ``is_variant_null`` distinguishing a JSON
    null VALUE (true) from a MISSING path (false), and
    ``schema_of_variant`` type introspection on the document and a
    sub-variant. The oracle reads the source columns directly: the
    assertion is that the encode→parse→extract chain is lossless.

    Scale shape: pure per-row projection — one Jackson encode and
    one variant parse per row, all JVM-side (no Python boundary), no
    shuffle, and column pruning reaches the scan (only the four
    payload columns are read). Fanned out past the single-file scan
    width before the per-row encode/parse (the ``q_fn_try`` move; a
    multi-file 100 TB layout gets the parallelism from the scan).
    The VARIANT binary encoding is O(document); extraction is a path
    walk, not a reparse, which is exactly why the open-schema path
    beats per-field ``get_json_object`` chains at 100 TB.
    """
    from frafka_spark.io import fan_out

    o = fan_out(table(spark, sf_dir, "orders"), "o_orderkey")
    payload = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("k"),
            F.struct(
                F.col("o_custkey").alias("id"),
                F.col("o_orderstatus").alias("st"),
            ).alias("cust"),
            F.array("o_orderstatus", "o_orderpriority").alias("tags"),
            F.lit(None).cast("string").alias("nul"),
        ),
        {"ignoreNullFields": "false"},
    )
    v = F.col("v")
    return o.select(F.parse_json(payload).alias("v")).select(
        F.variant_get(v, "$.k", "bigint").alias("k"),
        F.variant_get(v, "$.cust.id", "bigint").alias("cust_id"),
        F.variant_get(v, "$.cust.st", "string").alias("cust_st"),
        F.variant_get(v, "$.tags[1]", "string").alias("tag1"),
        F.try_variant_get(v, "$.nope", "bigint").alias("miss"),
        F.is_variant_null(F.variant_get(v, "$.nul", "variant")).alias(
            "nul_is_null"
        ),
        F.is_variant_null(F.try_variant_get(v, "$.nope", "variant")).alias(
            "miss_is_null"
        ),
        F.schema_of_variant(v).alias("vtype"),
        F.schema_of_variant(F.variant_get(v, "$.tags", "variant")).alias(
            "tags_type"
        ),
    )
