"""Product quantization (Jégou et al., TPAMI 2011): the compression
stage of the IVF-PQ index every billion-vector ANN system runs —
split each embedding into M subvectors, quantize each against a
per-subspace codebook, and a 64-float vector becomes M small code
ids. Completes the repo's embedding-compression family: int8
scalar quantization (``q_llm_embed_quantize``) bounds per-DIMENSION
error; PQ bounds per-SUBSPACE error and is what makes residual
distance estimation cheap at query time.

Codebook discipline: like IVF's ``vec_id % CENTROID_MOD`` centroids
(similarity.py), the per-subspace codes are the slices of the first
``PQ_CODES`` vectors — deterministic by construction on both engines
(a production system trains them with k-means; ``q_llm_kmeans_step``
is that trainer's inner loop). Distances are the
``‖a‖² − 2a·b + ‖b‖²`` expansion over the SAME sequential
left-to-right dot-product fold on both engines (the
``list_dot_product`` parity rule), so the argmin and its tiebreak
are exact cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from frafka_spark.functions.determinism import half_up, sql_half_up
from frafka_spark.io import table
from frafka_spark.registry import query

PQ_M = 4  # subspaces
PQ_SUBDIM = 16  # dims per subspace (embeddings are 64-d)
PQ_CODES = 16  # codebook entries per subspace (vec_id < PQ_CODES)


@query(
    "q_llm_embed_pq",
    oracle=f"""
    WITH vecs AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ),
    subs AS MATERIALIZED (
        SELECT vec_id, sub,
               emb[(sub - 1) * {PQ_SUBDIM} + 1 : sub * {PQ_SUBDIM}] AS s
        FROM vecs
        CROSS JOIN (SELECT unnest(generate_series(1, {PQ_M})) AS sub)
    ),
    codes AS MATERIALIZED (
        SELECT sub, vec_id AS code_id, s AS c
        FROM subs WHERE vec_id < {PQ_CODES}
    ),
    scored AS (
        SELECT v.vec_id, v.sub, k.code_id,
               list_dot_product(v.s, v.s)
                   - 2 * list_dot_product(v.s, k.c)
                   + list_dot_product(k.c, k.c) AS d2,
               row_number() OVER (
                   PARTITION BY v.vec_id, v.sub
                   ORDER BY list_dot_product(v.s, v.s)
                                - 2 * list_dot_product(v.s, k.c)
                                + list_dot_product(k.c, k.c) ASC,
                            k.code_id ASC
               ) AS rn
        FROM subs v JOIN codes k ON k.sub = v.sub
    )
    SELECT vec_id, sub, code_id,
           {sql_half_up('d2', 6)} AS qerr
    FROM scored WHERE rn = 1
    """,
)
def q_llm_embed_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encoding of the embedding corpus: per (vector, subspace),
    the nearest per-subspace codebook entry by squared L2 (code_id
    ascending on ties) and the subspace quantization error — the
    relation an IVF-PQ index stores instead of raw floats (M·log₂K
    bits per vector here vs M·SUBDIM floats).

    Exactness: every distance is the identically-written
    ``‖s‖² − 2s·c + ‖c‖²`` chain over sequential left-fold dot
    products (both engines fold left-to-right — similarity.py's
    list_dot_product parity); the argmin sorts those identical
    doubles with the code_id tiebreak, and the reported error rides
    the pinned half-up.

    Scale shape: the codebook is M·K = {PQ_M}·{PQ_CODES} slices —
    bounded by construction, the legitimate broadcast side (the IVF
    codebook rule). The corpus explodes to M rows per vector,
    streams through ONE broadcast join (M·K candidates per row,
    a code constant), and the argmin is one keyed window on
    (vec_id, sub) — a single corpus-sized shuffle. At 10⁹ vectors
    this is exactly the PQ-encode pass a production indexer runs;
    nothing O(corpus) is ever broadcast or collected.
    """
    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    vecs = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("emb")
    )
    # ss/cc hoisted out of the candidate fan: the per-candidate work
    # is ONE length-SUBDIM fold (s·c), not three — the values are
    # identical to the oracle's inline list_dot_product calls, so the
    # d2 chain stays bit-equal while the engine does a third of the
    # lambda evaluations.
    subs = (
        vecs.select(
            "vec_id",
            F.explode(F.sequence(F.lit(1), F.lit(PQ_M))).alias("sub"),
            "emb",
        )
        .select(
            "vec_id",
            "sub",
            F.slice(
                "emb", (F.col("sub") - 1) * PQ_SUBDIM + 1, PQ_SUBDIM
            ).alias("s"),
        )
        .withColumn("ss", dot(F.col("s"), F.col("s")))
    )
    codes = subs.filter(F.col("vec_id") < PQ_CODES).select(
        "sub",
        F.col("vec_id").alias("code_id"),
        F.col("s").alias("c"),
        F.col("ss").alias("cc"),
    )
    scored = subs.join(F.broadcast(codes), "sub").select(
        "vec_id",
        "sub",
        "code_id",
        (
            F.col("ss")
            - F.lit(2) * dot(F.col("s"), F.col("c"))
            + F.col("cc")
        ).alias("d2"),
    )
    w = Window.partitionBy("vec_id", "sub").orderBy(
        F.asc("d2"), F.asc("code_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "sub", "code_id", half_up(F.col("d2"), 6).alias("qerr"))
    )
