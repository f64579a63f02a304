"""Phonetic-key blocking — the classic entity-resolution candidate
generator, completing the dedup family's blocking spectrum:

    minhash-LSH (set overlap) · simhash (bit proximity) ·
    fuzzy prefix join (character n-grams) · PHONETIC KEY (sound)

A simplified Soundex-class consonant skeleton (vowels/h/w/y dropped,
consonants mapped to the six Soundex classes, runs collapsed) buckets
words that *sound* alike; only same-bucket pairs pay an edit-distance
verification. Both engines compute the key with the SAME regex chain
(RE2-safe: run-collapse via ``d+ → d`` per digit, no backreferences)
and both have a built-in ``levenshtein``, so the whole relation is
hash-checked exactly — no float anywhere.

Classic Soundex differs in two documented ways: it preserves the
first LETTER unconverted and collapses same-class consonants across
a dropped h/w; this skeleton converts every consonant and collapses
only adjacent runs — simpler, deterministic, and identical on both
engines, which is what a blocking key needs (recall comes from the
verify step, not key fidelity).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from frafka_spark.io import table
from frafka_spark.registry import query

# (pattern, replacement) chain: drop silents, map Soundex classes,
# collapse runs. Applied left-to-right on BOTH engines.
_PHONETIC_STEPS = (
    ("[aeiouhwy]", ""),
    ("[bfpv]", "1"),
    ("[cgjkqsxz]", "2"),
    ("[dt]", "3"),
    ("l", "4"),
    ("[mn]", "5"),
    ("r", "6"),
    ("1+", "1"),
    ("2+", "2"),
    ("3+", "3"),
    ("4+", "4"),
    ("5+", "5"),
    ("6+", "6"),
)

BLOCK_CAP = 256  # max words per phonetic block before pairing
MATCH_MAX_LEV = 2


def phonetic_key(col: Column) -> Column:
    """Consonant-class skeleton of a lowercase word (Spark side)."""
    return reduce(
        lambda c, step: F.regexp_replace(c, step[0], step[1]),
        _PHONETIC_STEPS,
        col,
    )


def _sql_phonetic_key(expr: str) -> str:
    """Identical chain in DuckDB SQL ('g' = replace-all, RE2 engine)."""
    out = expr
    for pat, rep in _PHONETIC_STEPS:
        out = f"regexp_replace({out}, '{pat}', '{rep}', 'g')"
    return out


@query(
    "q_llm_phonetic_block",
    oracle=f"""
    WITH vocab AS (
        SELECT DISTINCT w FROM (
            SELECT unnest(string_split(lower(text), ' ')) AS w
            FROM documents
            UNION ALL
            SELECT unnest(string_split(lower(p_name), ' ')) FROM part
        ) WHERE length(w) > 0
    ),
    keyed AS (
        SELECT w, {_sql_phonetic_key('w')} AS pkey FROM vocab
    ),
    capped AS (
        SELECT w, pkey FROM (
            SELECT w, pkey,
                   row_number() OVER (PARTITION BY pkey ORDER BY w ASC)
                       AS rn
            FROM keyed
        ) WHERE rn <= {BLOCK_CAP}
    )
    SELECT a.pkey, a.w AS w1, b.w AS w2,
           CAST(levenshtein(a.w, b.w) AS INT) AS lev,
           (levenshtein(a.w, b.w) <= {MATCH_MAX_LEV}) AS is_match
    FROM capped a JOIN capped b ON a.pkey = b.pkey AND a.w < b.w
    """,
)
def q_llm_phonetic_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking join over the corpus vocabulary (documents
    words ∪ part-name words): words sharing a consonant-class skeleton
    become candidate pairs; ``levenshtein ≤ 2`` is the verify step
    that separates true fuzzy matches (red/rod, blue/value) from
    same-sounding non-matches. Emitting candidates WITH their verdict
    (not just survivors) makes the blocking quality itself auditable —
    candidates ≪ all-pairs is the entire point of blocking.

    Scale shape: the corpus collapses to its DISTINCT vocabulary
    first (partial-agg; vocabulary grows ~Heaps-law sublinearly, not
    with corpus size), the key is one chain of constant regex maps,
    and pairing happens only INSIDE key blocks via an equi-join on
    pkey — never all-pairs. Pathological blocks (phonetics is lossy:
    every vowel-only word keys to '') are rank-capped at
    {BLOCK_CAP} words (alphabetical, the near_capped discipline), so
    per-block fan-out is bounded by a code constant at any scale.
    """
    docs = table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower("text"), " ")).alias("w")
    )
    parts = table(spark, sf_dir, "part").select(
        F.explode(F.split(F.lower("p_name"), " ")).alias("w")
    )
    vocab = (
        docs.unionAll(parts).filter(F.length("w") > 0).distinct()
    )
    keyed = vocab.select("w", phonetic_key(F.col("w")).alias("pkey"))
    from pyspark.sql import Window

    w_blk = Window.partitionBy("pkey").orderBy(F.asc("w"))
    capped = (
        keyed.withColumn("rn", F.row_number().over(w_blk))
        .filter(F.col("rn") <= BLOCK_CAP)
        .select("w", "pkey")
    )
    a = capped.select(F.col("pkey"), F.col("w").alias("w1"))
    b = capped.select(F.col("pkey").alias("pkey_b"), F.col("w").alias("w2"))
    lev = F.levenshtein("w1", "w2")
    return (
        a.join(
            b,
            (F.col("pkey") == F.col("pkey_b")) & (F.col("w1") < F.col("w2")),
        )
        .select(
            "pkey",
            "w1",
            "w2",
            lev.cast("int").alias("lev"),
            (lev <= MATCH_MAX_LEV).alias("is_match"),
        )
    )
