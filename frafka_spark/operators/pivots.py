"""Pivot / unpivot (SURVEY guide § common OLAP patterns).

The oracle side uses conditional aggregation / UNION ALL — the
engine-portable formulations — while the Spark side uses the native
``pivot``/``unpivot`` operators, proving they reduce to the same
relational result. Pivot with an explicit value list is one
hash-aggregate (no extra pass to discover pivot values).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from frafka_spark.functions.determinism import sql_dec_sum
from frafka_spark.io import table
from frafka_spark.registry import query


@query(
    "q_pivot",
    oracle=f"""
    SELECT l_returnflag,
           coalesce({sql_dec_sum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")}, 0.0) AS qty_O,
           coalesce({sql_dec_sum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")}, 0.0) AS qty_F,
           count(*) FILTER (l_linestatus = 'O') AS n_O,
           count(*) FILTER (l_linestatus = 'F') AS n_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (explicit value list, one agg)."""
    li = table(spark, sf_dir, "lineitem")
    from frafka_spark.functions.determinism import DEC

    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return p.select(
        "l_returnflag",
        F.coalesce("O_qty", F.lit(0.0)).alias("qty_O"),
        F.coalesce("F_qty", F.lit(0.0)).alias("qty_F"),
        F.coalesce("O_n", F.lit(0)).alias("n_O"),
        F.coalesce("F_n", F.lit(0)).alias("n_F"),
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT s_suppkey, 'acctbal' AS metric, round(s_acctbal, 4) AS value
    FROM supplier
    UNION ALL
    SELECT s_suppkey, 'nationkey' AS metric, CAST(s_nationkey AS DOUBLE) AS value
    FROM supplier
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) wide columns into (metric, value) rows."""
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        F.round("s_acctbal", 4).alias("acctbal"),
        F.col("s_nationkey").cast("double").alias("nationkey"),
    )
    return s.unpivot(
        ids=["s_suppkey"],
        values=["acctbal", "nationkey"],
        variableColumnName="metric",
        valueColumnName="value",
    )
