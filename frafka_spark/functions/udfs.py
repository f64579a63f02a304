"""B11 — UDF / UDAF / UDTF surface.

The reference's "transform hook" is arbitrary user Go code between
Receive and Send [SURVEY.md §2 Tier A13]; the Spark equivalents are
the Python UDF tiers, in descending preference:

1. Don't — use built-ins (everything in functions/scalar.py).
2. ``@pandas_udf`` — Arrow-batched, vectorized, ~10-100× faster than
   row-at-a-time; the only acceptable Python on a 100 TB hot path.
3. Row ``F.udf`` — declared here because the operator exists; the
   docstring is the warning.

Each UDF's logic is intentionally SQL-expressible so the DuckDB
oracle can mirror it exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from frafka_spark.functions.determinism import half_up
from frafka_spark.io import fan_out, table
from frafka_spark.registry import query


@query(
    "q_udf_python",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 250000 THEN 'platinum'
                WHEN o_totalprice > 100000 THEN 'gold'
                ELSE 'standard' END AS tier,
           CAST(length(o_orderpriority) + (o_orderkey % 3) AS BIGINT) AS fee_units
    FROM orders
    """,
)
def q_udf_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow path, declared for parity)."""

    @F.udf("string")
    def tier(price: float) -> str:
        if price > 250000:
            return "platinum"
        if price > 100000:
            return "gold"
        return "standard"

    @F.udf("long")
    def fee_units(priority: str, orderkey: int) -> int:
        return len(priority) + (orderkey % 3)

    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        tier("o_totalprice").alias("tier"),
        fee_units("o_orderpriority", "o_orderkey").alias("fee_units"),
    )


@query(
    "q_udf_pandas",
    oracle="""
    SELECT event_id,
           floor(ln(1 + value) * 1000000.0 + 0.5) / 1000000.0
               AS log_value,
           floor(value / 200.0 * 1000000.0 + 0.5) / 1000000.0
               AS unit_scaled
    FROM events
    """,
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized scalar pandas UDF (Arrow batches, numpy kernel)."""

    @pandas_udf("double")
    def log1p_vec(v: pd.Series) -> pd.Series:
        return pd.Series(np.log1p(v.to_numpy()))

    @pandas_udf("double")
    def unit_scale(v: pd.Series) -> pd.Series:
        return v / 200.0

    e = table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        half_up(log1p_vec("value"), 6).alias("log_value"),
        half_up(unit_scale("value"), 6).alias("unit_scaled"),
    )


@query(
    "q_udaf_pandas",
    oracle="""
    SELECT l_returnflag,
           floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 / CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 * 10000.0 + 0.5) / 10000.0 AS weighted_avg_price,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_udaf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-agg pandas UDF: quantity-weighted mean price.

    Both sides sum exactly (integer-scaled int64 in the UDF, DECIMAL
    in the oracle), so the pre-round doubles are bitwise identical
    regardless of shuffle arrival order or engine parallelism.
    """

    @pandas_udf("double")
    def weighted_mean(x: pd.Series, w: pd.Series) -> float:
        # Exact integer-scaled arithmetic (inputs have ≤2 decimals):
        # scaled sums are exact int64 (≪2^53), so the result is
        # independent of accumulation order — the UDF-side analog of
        # the DECIMAL(38,6) discipline in determinism.py. A float
        # reduction here would differ from the oracle's sum order in
        # the last ulp and occasionally cross the rounding boundary.
        xi = np.rint(x.to_numpy(np.float64) * 100).astype(np.int64)
        wi = np.rint(w.to_numpy(np.float64) * 100).astype(np.int64)
        return float(xi @ wi) / 100.0 / float(wi.sum())

    @pandas_udf("long")
    def n_rows(x: pd.Series) -> int:
        # Spark disallows mixing pandas grouped-agg UDFs with built-in
        # aggregates in one agg(), so the count is a pandas UDF too.
        return len(x)

    li = table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        half_up(weighted_mean("l_extendedprice", "l_quantity"), 4).alias(
            "weighted_avg_price"
        ),
        n_rows("l_orderkey").alias("n"),
    )


@query(
    "q_udtf",
    oracle="""
    SELECT o.o_orderkey,
           t.n,
           floor(o.o_totalprice / 3 * 1000000.0 + 0.5) / 1000000.0
               AS installment,
           CAST(t.n = 3 AS BOOLEAN) AS is_final
    FROM orders o, generate_series(1, 3) t(n)
    WHERE o.o_totalprice > 300000
    """,
)
def q_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one row in → three installment rows out (lateral).

    Cost contract: a UDTF pays the Python boundary per input row —
    pickle the argument, cross the worker socket, run the generator,
    ship rows back. Two mitigations were measured at sf0.1 (r5):

    - ``useArrow=True`` (PySpark 4.x Arrow-optimized UDTF): 15.4 s
      warm vs 1.5 s pickled — 10× WORSE for this shape (3 tiny rows
      out per row in; Arrow's per-batch framing dominates), so the
      pickled path is kept deliberately.
    - Parallelizing the boundary: the single-file scan runs the
      lateral in ONE task, serializing all Python work. Filtering
      first (pushed to the parquet scan), then ``fan_out`` across the
      session's shuffle width before the lateral cuts warm time
      1.5 s → ~0.6 s on local[32]. One extra exchange of the
      filtered rows buys boundary-parallelism — exactly the trade a
      1000-executor cluster wants, where the scan is already wide
      and per-row Python must never funnel through few tasks.

    When the expansion logic is expressible without arbitrary Python
    (as here, structurally), the fast paths remain
    ``explode(sequence(...))``/``posexplode`` (pure codegen, see
    ``q_fn_posexplode``) or an Arrow-batched pandas UDF
    (``q_udf_pandas``); keep UDTFs for genuinely imperative row →
    rows logic (parsers, tokenizers with state, API-shaped adapters).
    """

    @udtf(returnType="n bigint, installment double, is_final boolean")
    class SplitInstallments:
        def eval(self, price: float):
            for n in range(1, 4):
                yield n, price / 3, n == 3

    spark.udtf.register("fs_split_installments", SplitInstallments)
    o = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    fan_out(o, "o_orderkey").createOrReplaceTempView("fs_orders_udtf")
    return spark.sql(
        """
        SELECT o.o_orderkey, t.n,
               floor(t.installment * 1e6 + 5e-1) / 1e6 AS installment,
               t.is_final
        FROM fs_orders_udtf o,
             LATERAL fs_split_installments(o.o_totalprice) t
        """
    )


@query(
    "q_udf_grouped_map",
    oracle="""
    SELECT event_id, event_type,
           floor((value - min(value) OVER w)
                 / (max(value) OVER w - min(value) OVER w)
                 * 10000.0 + 0.5) / 10000.0 AS scaled
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    """,
)
def q_udf_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map pandas UDF (``applyInPandas``): per-group min-max
    scaling of the event value, one pandas frame per event type.

    The fourth Python tier after scalar/grouped-agg pandas UDFs and
    UDTFs: ``groupBy(k).applyInPandas(fn)`` hands each group to
    Python as ONE Arrow-backed DataFrame — the Spark surface for
    whole-group imperative logic (per-group model fits, resampling,
    custom normalizers). Contract and cost at 100 TB: one shuffle on
    the group key, and each group must fit in one worker's memory —
    low-cardinality keys like ``event_type`` make wide groups, so at
    corpus scale pre-aggregate per key first or switch to the
    two-pass formulation (windowed min/max join, exactly the oracle's
    shape) when groups outgrow workers. Min-max is chosen over
    z-score deliberately: min/max are order-independent, so the
    pandas result is bitwise identical to the oracle's window
    formulation with no float-summation hazard; the division result
    is a "dirty" double rounded 4 digits (no representable-tie risk),
    and the round is applied Spark-side so both engines round the
    identical binary double.
    """

    def scale(pdf: pd.DataFrame) -> pd.DataFrame:
        lo = pdf["value"].min()
        rng = pdf["value"].max() - lo
        return pd.DataFrame(
            {
                "event_id": pdf["event_id"],
                "event_type": pdf["event_type"],
                "scaled_raw": (pdf["value"] - lo) / rng,
            }
        )

    e = table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = e.groupBy("event_type").applyInPandas(
        scale, schema="event_id long, event_type string, scaled_raw double"
    )
    return out.select(
        "event_id", "event_type", half_up(F.col("scaled_raw"), 4).alias("scaled")
    )


@query("q_llm_compression", oracle=None)
def q_llm_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compression-ratio quality signal: ``len(zlib(text)) /
    len(text)`` per document, rolled up per source — the cheapest
    repetition/boilerplate proxy in production corpus pipelines
    (Gopher/RefinedWeb-style): heavily templated text compresses far
    below natural prose, near-random noise refuses to compress.

    zlib has no relational equivalent, so this is a DECLARED
    Python-boundary operator (tests/test_plans.py inventory):
    an Arrow-batched pandas UDF (never per-row Python), with
    deterministic output — zlib at a fixed level is bit-stable across
    platforms, so the per-doc ratio and the per-source exact-decimal
    mean both replay identically. No oracle exists (DuckDB has no
    zlib); the driver records rows-only and the property test pins
    the semantics (repetitive ≪ natural < noise, bounds, and
    determinism across runs).
    """
    import zlib

    from frafka_spark.functions.determinism import dec_avg

    @pandas_udf("double")
    def zratio(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [
                len(zlib.compress(t.encode("utf-8"), 6)) / max(len(t), 1)
                for t in texts
            ]
        )

    d = table(spark, sf_dir, "documents")
    per_doc = d.select(
        "source", half_up(zratio("text"), 6).alias("ratio")
    )
    return per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        dec_avg("ratio", "mean_ratio"),
        half_up(F.min("ratio"), 6).alias("min_ratio"),
        half_up(F.max("ratio"), 6).alias("max_ratio"),
    )
