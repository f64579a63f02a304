"""B10 — multimodal columns: opaque binary payloads + typed metadata.

The pattern for image/audio/video at 100 TB: the payload is an
opaque ``binary`` column (or an object-store URI to fetch lazily),
metadata is a typed struct, and every decode / feature-extract /
resize / frame-sample step is an Arrow-batched ``mapInPandas``
operator so bytes never round-trip through the driver and partitions
stream batch-by-batch through Python memory.

No media codecs exist in this container (numpy/pandas only), so the
*decode kernels* are deterministic fakes behind ``DECODERS`` —
clearly marked stubs with the real libraries named — while the
Spark-side plumbing (schema, batching, partitioning, UDF signatures)
is real and tested in tests/test_llm_ops.py.

``q_llm_multimodal`` (declared, oracle-checked) covers the portable
part: building the binary column and digesting it — byte length +
md5 hex agree across engines.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frafka_spark.io import table
from frafka_spark.registry import query

# Decoded-image feature schema: what a real pipeline would extract.
IMAGE_FEATURES_DDL = (
    "doc_id bigint, width int, height int, n_bytes bigint, "
    "mean_intensity double, histogram array<int>"
)


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture adapter: text bytes stand in for an image payload.

    Real pipelines read (payload binary, metadata struct) straight
    from parquet — binary columns are first-class there.
    """
    d = table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.col("n_chars").cast("int").alias("declared_size"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def _fake_decode_image(payload: bytes) -> np.ndarray:
    """STUB decoder — deterministic fake of e.g. PIL.Image.open.

    A real implementation would be::

        import io
        from PIL import Image          # not installed in this container
        arr = np.asarray(Image.open(io.BytesIO(payload)))

    The fake reshapes the payload bytes into a pseudo-image so the
    downstream feature math exercises realistic shapes.
    """
    arr = np.frombuffer(payload, dtype=np.uint8)
    side = max(int(np.sqrt(arr.size)), 1)
    return arr[: side * side].reshape(side, side)


def extract_image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over binary payloads.

    ``mapInPandas`` streams whole Arrow batches through one Python
    worker call per batch — the only sane shape for media decode at
    scale (row-at-a-time UDFs re-cross the serialization boundary per
    record; collect-based decode doesn't distribute at all).
    """

    def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = _fake_decode_image(bytes(payload))
                hist = np.bincount(img.ravel() // 32, minlength=8)[:8]
                rows.append(
                    {
                        "doc_id": doc_id,
                        "width": img.shape[1],
                        "height": img.shape[0],
                        "n_bytes": len(payload),
                        "mean_intensity": float(img.mean()) if img.size else 0.0,
                        "histogram": hist.astype("int32").tolist(),
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(decode_batch, IMAGE_FEATURES_DDL)


def sample_frames(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """STUB frame sampler — the video analog (ffmpeg in production).

    Emits one row per sampled "frame" (byte-offset slice), i.e. a
    1→N expansion done executor-side, the same plumbing a real
    keyframe extractor needs.
    """

    def sampler(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                for frame_no, off in enumerate(range(0, len(data), every_n_bytes)):
                    chunk = data[off : off + every_n_bytes]
                    rows.append(
                        {
                            "doc_id": doc_id,
                            "frame_no": frame_no,
                            "frame_bytes": len(chunk),
                            "checksum": int(np.frombuffer(chunk, "uint8").sum()),
                        }
                    )
            yield pd.DataFrame(rows)

    return media.mapInPandas(
        sampler, "doc_id bigint, frame_no int, frame_bytes int, checksum bigint"
    )


@query(
    "q_llm_multimodal",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes,
           md5(text) AS payload_md5,
           (CAST(octet_length(encode(text)) AS BIGINT) = n_chars) AS size_matches_meta,
           source AS origin
    FROM documents
    """,
)
def q_llm_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: payload construction + digest + metadata.

    The oracle-checkable slice of the multimodal path (decode stubs
    can't be SQL-mirrored): byte lengths and digests of the payload
    column must agree with the metadata, engine vs oracle.
    """
    m = documents_as_media(spark, sf_dir)
    d = table(spark, sf_dir, "documents").select("doc_id", "n_chars", "text")
    return (
        m.join(d, "doc_id")
        .select(
            "doc_id",
            F.octet_length("payload").cast("bigint").alias("payload_bytes"),
            F.md5("text").alias("payload_md5"),
            (F.octet_length("payload").cast("bigint") == F.col("n_chars")).alias(
                "size_matches_meta"
            ),
            F.col("meta.origin").alias("origin"),
        )
    )
