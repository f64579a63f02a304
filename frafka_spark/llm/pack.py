"""Sequence packing — greedy next-fit of documents into fixed
token-budget bins, the training-data primitive that turns a ragged
corpus into dense fixed-length model inputs (VERDICT r5 "What's
missing" #4).

Semantics: documents are ordered by a content-independent hash of
their id and packed greedily — a running fill accumulates until the
next document would overflow the budget, which starts a new bin
(next-fit). ``n_chars`` is the token proxy (the fixture has no
tokenizer; swap in ``q_llm_tokens``'s count upstream for real runs).
A document larger than the budget gets a bin of its own (the standard
convention — it must go somewhere; callers chunk oversized docs first
with ``q_llm_chunk``).

Scale shape: a greedy scan is inherently sequential, so the corpus is
split into SEGMENTS by the leading hex digit of the id hash and the
scan runs per segment. Segment boundaries depend only on the hash —
never on partitioning, cluster shape, or insertion order — so the
assignment is bit-identical on any cluster, and each segment is an
independent unit of sequential work (``applyInPandas`` over the
segment key: one shuffle, then an O(segment) loop executor-side; no
driver state). At 100 TB widen ``seg`` to 2-3 hex digits (256-4096
segments) so each segment's doc list fits one task comfortably —
the knob trades packing locality for parallelism without touching
semantics. Bins are namespaced per segment, so bin ids never need a
global sequence (the classic counter bottleneck).

Determinism: hash order + per-segment reset recurrence has a single
possible output; the DuckDB oracle replays the identical recurrence
as a recursive CTE (one row per segment advanced per iteration), so
the driver hash-checks the full per-document assignment, not just
summary stats.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frafka_spark.io import table
from frafka_spark.registry import query

BUDGET = 2048  # chars per bin (token proxy at fixture scale)

_OUT_SCHEMA = "seg string, doc_id bigint, bin bigint, n_chars bigint"


def _make_packer(budget: int):
    """Greedy next-fit over one hash segment, in hash order.

    Plain Python loop over the segment's sizes: the recurrence
    (fill + next > budget → reset) is non-associative, so there is
    no vectorized or window form; segments keep each loop small and
    parallel. ~1 µs/doc — never the bottleneck next to the shuffle.
    """

    def _pack_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["h", "doc_id"]).reset_index(drop=True)
        bins = []
        bin_no, fill = 0, 0
        for sz in pdf["n_chars"]:
            if bin_no == 0 or fill + sz > budget:
                bin_no += 1
                fill = sz
            else:
                fill += sz
            bins.append(bin_no)
        out = pdf[["seg", "doc_id", "n_chars"]].copy()
        out["bin"] = bins
        return out[["seg", "doc_id", "bin", "n_chars"]]

    return _pack_segment


def pack_documents(docs: DataFrame, budget: int = BUDGET) -> DataFrame:
    """Assign every row a (seg, bin) under ``budget``; see module doc.

    ``docs`` needs ``doc_id`` and ``n_chars`` columns.
    """
    h = F.md5(F.col("doc_id").cast("string"))
    staged = docs.select(
        F.substring(h, 1, 1).alias("seg"),
        h.alias("h"),
        "doc_id",
        "n_chars",
    )
    return staged.groupBy("seg").applyInPandas(_make_packer(budget), _OUT_SCHEMA)


@query(
    "q_llm_pack",
    oracle=f"""
    WITH RECURSIVE ordered AS (
        SELECT substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS seg,
               md5(CAST(doc_id AS VARCHAR)) AS h,
               doc_id, n_chars,
               row_number() OVER (
                   PARTITION BY substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        FROM documents
    ),
    packed AS (
        SELECT seg, doc_id, n_chars, rn, 1 AS bin, n_chars AS acc
        FROM ordered WHERE rn = 1
        UNION ALL
        SELECT o.seg, o.doc_id, o.n_chars, o.rn,
               CASE WHEN p.acc + o.n_chars > {BUDGET} THEN p.bin + 1
                    ELSE p.bin END,
               CASE WHEN p.acc + o.n_chars > {BUDGET} THEN o.n_chars
                    ELSE p.acc + o.n_chars END
        FROM packed p JOIN ordered o ON o.seg = p.seg AND o.rn = p.rn + 1
    )
    SELECT seg, doc_id, CAST(bin AS BIGINT) AS bin, n_chars FROM packed
    """,
)
def q_llm_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document packing assignment over the fixture corpus."""
    return pack_documents(table(spark, sf_dir, "documents"))
