"""Corpus curation operators — per-source quota capping and
train/eval split-leakage measurement.

Round-6 additions to the training-data family (beyond SURVEY §2, in
the spirit of the B10-ext rows): both are standard pre-training
hygiene steps — cap over-represented sources so one crawl domain
cannot dominate the mixture, and measure n-gram leakage from the
training split into val/test before trusting an eval number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from frafka_spark.io import table
from frafka_spark.llm.dedup import _shingle_sql, _shingles
from frafka_spark.registry import query

CAP_PER_SOURCE = 15


@query(
    "q_llm_source_cap",
    oracle=f"""
    WITH ranked AS (
        SELECT doc_id, source, n_chars,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
        FROM documents
    )
    SELECT doc_id, source, n_chars, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {CAP_PER_SOURCE}
    """,
)
def q_llm_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota: keep at most ``CAP_PER_SOURCE`` docs per
    source, chosen deterministically by id-hash order — the mixture
    rebalancing step that stops one domain dominating training data.

    Hash order (not "first N ingested") makes the kept set a uniform
    sample of the source, reproducible on any cluster, and stable
    under re-ingestion order. Exact-quota selection is a per-source
    ``row_number`` — one shuffle on source, rank, filter.

    Scale: a mega-source serializes its rank into one task. The
    scale path prunes first — keep docs with hash below
    ~cap×slack/count(source) (one cheap count aggregate), then
    exact-rank the ~cap×slack survivors. The prune is probabilistic,
    so an exact engine must fall back to the unpruned rank for any
    source whose pruned survivor count < cap (possible at small
    per-source thresholds); at fixture scale (25 docs/source) the
    direct rank IS the right plan, so the prune is documented, not
    paid.
    """
    d = table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select(
            "doc_id",
            "source",
            "n_chars",
            F.row_number().over(w).cast("bigint").alias("rk"),
        )
        .filter(F.col("rk") <= CAP_PER_SOURCE)
    )


# Split thresholds — identical rule to q_llm_split (llm/text.py): the
# first 16 md5 bits of the id carve ~80/10/10.
_TRAIN_HI = "cccd"
_VAL_HI = "e666"

LEAK_MIN_SHARED = 5  # shared distinct shingles before a doc is flagged


@query(
    "q_llm_split_leakage",
    oracle=f"""
    WITH shingles AS ({_shingle_sql()}),
    labeled AS (
        SELECT doc_id, sh,
               CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                         < '{_TRAIN_HI}' THEN 'train'
                    WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4)
                         < '{_VAL_HI}' THEN 'val'
                    ELSE 'test' END AS split
        FROM shingles
    ),
    train_sh AS (SELECT DISTINCT sh FROM labeled WHERE split = 'train'),
    eval_docs AS (
        SELECT doc_id, split,
               count(*) AS n_shingles,
               count(*) FILTER (WHERE sh IN (SELECT sh FROM train_sh))
                   AS n_shared
        FROM labeled WHERE split <> 'train'
        GROUP BY doc_id, split
    )
    SELECT doc_id, split,
           CAST(n_shingles AS BIGINT) AS n_shingles,
           CAST(n_shared AS BIGINT) AS n_shared,
           round(n_shared / n_shingles, 4) AS leak_ratio,
           (n_shared >= {LEAK_MIN_SHARED}) AS flagged
    FROM eval_docs
    """,
)
def q_llm_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit: for every val/test document, how much of
    its distinct-3-gram mass also occurs in the training split —
    the check that must pass before an eval number means anything
    (companion to ``q_llm_decontaminate``, which drops *training*
    docs contaminated by a fixed eval list; this measures the other
    direction against the declared hash split of ``q_llm_split``).

    Scale shape: the train shingle set is the BIG side (~80% of the
    corpus) — never broadcast. The match is a LEFT SEMI join on the
    shingle hash (inverted-index shape, hint-free): semi join keeps
    each eval (doc, shingle) row at multiplicity ≤1 no matter how
    many train docs contain the shingle, so boilerplate shingles
    cannot fan out (the hazard the capped-LSH op mitigates for
    pair-joins never arises). Both counting aggregates then share
    one (doc_id, split) grouping off the cached shingle projection.
    """
    sh = _shingles(spark, sf_dir)
    hk = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    split = (
        F.when(hk < _TRAIN_HI, "train").when(hk < _VAL_HI, "val").otherwise("test")
    )
    labeled = sh.select("doc_id", "sh", split.alias("split"))
    eval_side = labeled.filter(F.col("split") != "train")
    train_sh = (
        labeled.filter(F.col("split") == "train").select("sh").distinct()
    )
    totals = eval_side.groupBy("doc_id", "split").agg(
        F.count("*").alias("n_shingles")
    )
    shared = (
        eval_side.join(train_sh, "sh", "left_semi")
        .groupBy("doc_id", "split")
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        totals.join(shared, ["doc_id", "split"], "left")
        .select(
            "doc_id",
            "split",
            "n_shingles",
            F.coalesce("n_shared", F.lit(0)).cast("bigint").alias("n_shared"),
            F.round(
                F.coalesce("n_shared", F.lit(0))
                / F.col("n_shingles").cast("double"),
                4,
            ).alias("leak_ratio"),
            (F.coalesce("n_shared", F.lit(0)) >= LEAK_MIN_SHARED).alias("flagged"),
        )
    )
