"""Plan-inspection helpers: make physical-plan properties assertable.

The scale discipline (plans/scale_notes.md) only holds if it's
checkable — these helpers give library users (and tests/test_plans.py)
programmatic access to the properties that matter: did the filter
push down, did the dim broadcast, did the aggregate partial-combine,
did anything fall out of codegen into Python.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def plan_str(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as a string (explain output, captured)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the data-source scan (one entry per scan)."""
    return [
        line.split("PushedFilters:", 1)[1].strip()
        for line in plan_str(df).splitlines()
        if "PushedFilters:" in line
    ]


def read_schemas(df: DataFrame) -> list[str]:
    """Columns actually read from each scan (pruning check)."""
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in plan_str(df).splitlines()
        if "ReadSchema:" in line
    ]


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_str(df)


def has_partial_aggregation(df: DataFrame) -> bool:
    """Map-side combine present and located before the shuffle."""
    plan = plan_str(df)
    return "partial_" in plan and (
        "Exchange" not in plan or plan.index("partial_") > plan.index("Exchange")
    )


def python_eval_nodes(df: DataFrame) -> list[str]:
    """Python-boundary operators in the plan (empty = all JVM)."""
    plan = plan_str(df)
    return [
        node
        for node in (
            "BatchEvalPython",
            "ArrowEvalPython",
            "MapInPandas",
            "FlatMapGroupsInPandas",
            "AggregateInPandas",
            "ArrowAggregatePython",
            "WindowInPandas",
        )
        if node in plan
    ]


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators (each is a full shuffle stage)."""
    return sum(
        1
        for line in plan_str(df).splitlines()
        if line.strip().startswith("(") and ") Exchange" in line
    )
