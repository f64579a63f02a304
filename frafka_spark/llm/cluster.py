"""Embedding-space clustering operators — one Lloyd (k-means)
assignment step and per-label centroid-distance outliers.

Round-6 additions to the training-data family (beyond SURVEY §2,
B10-ext spirit). Together with ``q_llm_embed_centroid`` (the update
step) these form the relational k-means loop used for corpus
clustering / IVF codebook training, and the prototype-distance
outlier scan used to surface mislabeled or off-distribution vectors
before training.

Determinism across engines is engineered end-to-end: centroids are
micro-unit-pinned integer means with an explicit half-up at 4
decimals (plain IEEE multiply/add/floor — bit-identical on both
engines, tie or no tie), distances are sequential
left-to-right float folds (``aggregate(zip_with(...))`` ≡ DuckDB
``list_dot_product`` — the same contract similarity.py relies on),
so every candidate distance is bit-identical on both sides and the
argmin needs only a label tiebreak for true ties.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from frafka_spark.functions.determinism import half_up
from frafka_spark.llm.similarity import _SQL_VECS, _dot, _vectors
from frafka_spark.registry import query

OUTLIER_TOP_N = 5  # flagged vectors per label

# Shared SQL: per-label centroid as an ordered DOUBLE[] whose
# components are micro-unit-pinned means with an explicit half-up at
# 4 decimals — the same arithmetic q_llm_embed_centroid hash-checks
# (see its docstring for why the decimal-cast form was retired),
# reassembled into a vector.
_SQL_CENTROIDS = """
    cents AS (
        SELECT label AS c_label,
               list(centroid ORDER BY dim) AS cvec
        FROM (
            SELECT label, dim,
                   floor(CAST(sum(CAST(floor(x * 1000000 + 0.5) AS BIGINT))
                              AS DOUBLE) / count(*) / 100 + 0.5) / 10000
                       AS centroid
            FROM (SELECT label, unnest(emb) AS x,
                         generate_subscripts(emb, 1) AS dim
                  FROM vecs)
            GROUP BY label, dim
        ) GROUP BY label
    )
"""


def _centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors: posexplode → micro-unit-pinned
    integer mean per (label, dim), explicit half-up at 4 decimals —
    identical to the oracle's arithmetic — reassembled into an
    ordered array.

    Map-side partials collapse the explode before the (label, dim)
    exchange (shuffle ∝ labels × dims × partitions); the reassembly
    groups k×dims rows — trivial at any corpus size since k and dims
    are model constants, not data-driven.
    """
    v = _vectors(spark, sf_dir)
    e6 = F.floor(F.col("x") * 1_000_000 + F.lit(0.5)).cast("bigint")
    per_dim = (
        v.select("label", F.posexplode("emb").alias("pos", "x"))
        .groupBy("label", "pos")
        .agg(
            (
                F.floor(
                    F.sum(e6).cast("double") / F.count("*") / 100 + F.lit(0.5)
                )
                / 10_000
            ).alias("centroid")
        )
    )
    return per_dim.groupBy(F.col("label").alias("c_label")).agg(
        F.array_sort(
            F.collect_list(F.struct("pos", "centroid"))
        ).alias("pc")
    ).select(
        "c_label", F.transform("pc", lambda s: s["centroid"]).alias("cvec")
    )


def _sq_dist(a: Column, b: Column) -> Column:
    """Squared L2 via the three-dot expansion ``a·a − 2·a·b + b·b`` —
    the exact term order the oracle uses, so results are bit-identical."""
    return _dot(a, a) - 2 * _dot(a, b) + _dot(b, b)


@query(
    "q_llm_kmeans_step",
    oracle=f"""
    WITH {_SQL_VECS},
    {_SQL_CENTROIDS},
    scored AS (
        SELECT v.vec_id, v.label, c.c_label,
               list_dot_product(v.emb, v.emb)
                 - 2 * list_dot_product(v.emb, c.cvec)
                 + list_dot_product(c.cvec, c.cvec) AS d,
               row_number() OVER (
                   PARTITION BY v.vec_id
                   ORDER BY list_dot_product(v.emb, v.emb)
                            - 2 * list_dot_product(v.emb, c.cvec)
                            + list_dot_product(c.cvec, c.cvec),
                            c.c_label) AS rk
        FROM vecs v, cents c
    )
    SELECT vec_id, label,
           CAST(c_label AS INT) AS assigned,
           floor(d * 10000.0 + 0.5) / 10000.0 AS sq_dist,
           (c_label <> label) AS moved
    FROM scored WHERE rk = 1
    """,
)
def q_llm_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd assignment step: every vector moves to its nearest
    per-label centroid (squared L2), reporting the assignment and
    whether it differs from the current label — the convergence
    signal of the k-means loop (``q_llm_embed_centroid`` is the
    matching update step; alternating the two IS k-means, with the
    label column as cluster state).

    Scale shape: centroids are k×dims model constants — broadcast by
    construction, never data-sized — so the candidate scoring is a
    broadcast nested-loop over k candidates per vector with NO
    shuffle of the corpus; the argmin is a partial-aggregatable
    ``min(struct(d, label))`` — k candidate rows per vector collapse
    map-side before the vec_id exchange, so shuffle bytes are
    ∝ vectors, not vectors×k. (Struct min has no mutable hash-agg
    buffer, so Catalyst plans SortAggregate; the sort is partition-
    local over the k-fan-out and the partial combine still applies —
    strictly cheaper than the row_number-window alternative, which
    pays the same sort plus an unreduced vectors×k shuffle.) Distances are sequential
    float folds over centroid components rounded to 4 decimals, so
    both engines score bit-identical doubles and the argmin's only
    nondeterminism — a true tie — is broken by label order.
    """
    v = _vectors(spark, sf_dir)
    c = _centroids(spark, sf_dir)
    scored = v.crossJoin(F.broadcast(c)).select(
        "vec_id",
        "label",
        "c_label",
        _sq_dist(F.col("emb"), F.col("cvec")).alias("d"),
    )
    best = (
        scored.groupBy("vec_id", "label")
        .agg(F.min(F.struct("d", "c_label")).alias("m"))
    )
    return best.select(
        "vec_id",
        "label",
        F.col("m.c_label").cast("int").alias("assigned"),
        half_up(F.col("m.d"), 4).alias("sq_dist"),
        (F.col("m.c_label") != F.col("label")).alias("moved"),
    )


@query(
    "q_llm_embed_outlier",
    oracle=f"""
    WITH {_SQL_VECS},
    {_SQL_CENTROIDS},
    scored AS (
        SELECT v.vec_id, v.label,
               list_dot_product(v.emb, v.emb)
                 - 2 * list_dot_product(v.emb, c.cvec)
                 + list_dot_product(c.cvec, c.cvec) AS d
        FROM vecs v JOIN cents c ON v.label = c.c_label
    ),
    ranked AS (
        SELECT vec_id, label, d,
               row_number() OVER (
                   PARTITION BY label ORDER BY d DESC, vec_id) AS rk
        FROM scored
    )
    SELECT vec_id, label,
           floor(d * 10000.0 + 0.5) / 10000.0 AS sq_dist,
           CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= {OUTLIER_TOP_N}
    """,
)
def q_llm_embed_outlier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label prototype-distance outliers: the ``OUTLIER_TOP_N``
    vectors farthest (squared L2) from their own label's centroid —
    the scan that surfaces mislabeled / off-distribution vectors for
    review before a corpus trains a classifier (the filtering half of
    prototype-based cleaning; ``q_llm_dedup_embed`` is the duplicate
    half).

    Scale shape: the centroid join is broadcast (k rows by
    construction); scoring is a shuffle-free projection. The per-label
    top-N rides a (label) window — k partitions, skew-safe only
    because the heavy lifting (distance) is already done and the sort
    key is one double per vector; for corpora where even one label's
    vectors overflow a task, swap the window for the repo's
    ``q_topk_per_group`` aggregate shape (per-partition top-N structs
    merged associatively). Distances are bit-identical on both
    engines (see module docstring), so rank ties reduce to the
    vec_id tiebreak.
    """
    v = _vectors(spark, sf_dir)
    c = _centroids(spark, sf_dir)
    scored = v.join(
        F.broadcast(c), v["label"] == c["c_label"], "inner"
    ).select("vec_id", "label", _sq_dist(F.col("emb"), F.col("cvec")).alias("d"))
    w = Window.partitionBy("label").orderBy(F.desc("d"), F.asc("vec_id"))
    return (
        scored.select(
            "vec_id",
            "label",
            half_up(F.col("d"), 4).alias("sq_dist"),
            F.row_number().over(w).cast("bigint").alias("rk"),
        )
        .filter(F.col("rk") <= OUTLIER_TOP_N)
    )


def kmeans_fit(
    spark: SparkSession,
    sf_dir: str,
    n_iters: int = 3,
) -> tuple[DataFrame, list[float]]:
    """Full relational Lloyd loop: alternate the centroid update and
    the nearest-centroid assignment ``n_iters`` times, starting from
    the label column as the initial partition (deterministic — no
    RNG init to disagree about across runs or engines).

    Returns the final assignment frame ``(vec_id, cluster)`` and the
    per-iteration inertia history (Σ squared distance to the assigned
    centroid, measured after each assignment step — non-increasing by
    Lloyd's guarantee, which ``tests/test_llm_ops.py`` pins).

    Scale discipline (the same two rules as the connected-components
    op in ``llm/dedup.py``): each iteration's assignment is
    ``localCheckpoint``-ed so the plan does not grow by one
    centroid-join per round (GraphX-style lineage truncation — on a
    cluster use a reliable checkpoint dir), and the only driver-side
    data per round is one k×dims centroid collect feeding the next
    broadcast plus one inertia scalar: both bounded by the model
    size, never by the corpus. Unlike the declared single-step query,
    the in-loop centroids stay unrounded doubles — there is no oracle
    to match, and rounding would perturb Lloyd monotonicity.
    """
    v = _vectors(spark, sf_dir).select("vec_id", "emb", F.col("label").alias("cluster"))
    assign = v
    history: list[float] = []
    for _ in range(n_iters):
        per_dim = (
            assign.select("cluster", F.posexplode("emb").alias("pos", "x"))
            .groupBy("cluster", "pos")
            .agg((F.sum("x") / F.count("*")).alias("c"))
        )
        cents = (
            per_dim.groupBy(F.col("cluster").alias("c_label"))
            .agg(F.array_sort(F.collect_list(F.struct("pos", "c"))).alias("pc"))
            .select("c_label", F.transform("pc", lambda s: s["c"]).alias("cvec"))
        )
        scored = assign.crossJoin(F.broadcast(cents)).select(
            "vec_id",
            "emb",
            "c_label",
            _sq_dist(F.col("emb"), F.col("cvec")).alias("d"),
        )
        best = (
            scored.groupBy("vec_id")
            .agg(F.min(F.struct("d", "c_label")).alias("m"))
            .select(
                "vec_id",
                F.col("m.d").alias("d"),
                F.col("m.c_label").alias("cluster"),
            )
        )
        assign = (
            assign.select("vec_id", "emb")
            .join(best, "vec_id")
            .select("vec_id", "emb", "cluster", "d")
            .localCheckpoint()
        )
        history.append(assign.agg(F.sum("d")).collect()[0][0])
        assign = assign.drop("d")
    return assign.select("vec_id", "cluster"), history
