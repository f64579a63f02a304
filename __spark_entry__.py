"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``frafka_spark``; every operator from
SURVEY.md §2 registers itself in ``frafka_spark.registry`` with its
DuckDB oracle, and this module just exposes the registry.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the repo importable no matter where the driver launches from —
# on the DRIVER via sys.path, and on PYTHON WORKERS via PYTHONPATH
# (local-mode workers inherit the driver process env at JVM launch;
# this import runs before the driver builds its session, so every
# executor-shipped closure that references a frafka_spark function by
# module name resolves even when the driver's cwd is not the repo).
import os as _os  # noqa: E402

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
if _REPO not in _os.environ.get("PYTHONPATH", "").split(_os.pathsep):
    _os.environ["PYTHONPATH"] = (
        _REPO + _os.pathsep + _os.environ["PYTHONPATH"]
        if _os.environ.get("PYTHONPATH")
        else _REPO
    )

from frafka_spark.registry import get_oracle_sql, get_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-shaped pricing summary over lineitem (filter → hash
    aggregate with map-side partial combine → 8 aggregates).
    """
    return get_queries()["q_agg_group"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per declared query (omitted ⇒ rows-only check)."""
    return get_oracle_sql()
