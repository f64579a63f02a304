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
    """Map-side combine present and located BELOW the shuffle.

    Uses the formatted plan's numbered detail sections: children carry
    lower node numbers than parents, so a partial aggregate feeding an
    Exchange has a smaller number. (Raw substring order would be
    vacuous — the tree header always prints Exchange before any
    detail line.)
    """
    import re

    plan = plan_str(df)
    sections = re.split(r"\n\n(?=\(\d+\) )", plan)
    partial_nodes = [
        int(m.group(1))
        for s in sections
        if (m := re.match(r"\((\d+)\) \w*HashAggregate", s)) and "partial_" in s
    ]
    exchange_nodes = [
        int(m.group(1))
        for s in sections
        if (m := re.match(r"\((\d+)\) Exchange", s))
    ]
    if not partial_nodes:
        return False
    if not exchange_nodes:
        return True  # no shuffle at all (single-partition agg)
    return min(partial_nodes) < min(exchange_nodes)


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


def scan_metrics(df: DataFrame) -> list[dict]:
    """Per-scan SQL metrics from the EXECUTED plan (call after an
    action has run the DataFrame), one dict per data-source scan with
    a ``_location`` key for identifying the table.

    This is how runtime scan behavior becomes assertable: dynamic
    partition pruning reports ``numPartitions`` (directories actually
    read) against ``staticFilesNum`` (what the static filters alone
    would read) plus ``pruningTime`` — the metrics the Spark UI shows,
    surfaced programmatically. Walks through AQE wrappers and query
    stages to reach the final physical plan.
    """
    jplan = df._jdf.queryExecution().executedPlan()
    if "AdaptiveSparkPlan" in jplan.getClass().getName():
        jplan = jplan.executedPlan()
    out: list[dict] = []
    stack = [jplan]
    while stack:
        node = stack.pop()
        cls = node.getClass().getName()
        if "Scan" in node.nodeName():
            mets = node.metrics()
            it = mets.iterator()
            vals: dict = {}
            while it.hasNext():
                kv = it.next()
                vals[kv._1()] = kv._2().value()
            # first occurrence = this scan's own location (a scan's
            # string can embed whole subquery subtrees — e.g. a DPP
            # SubqueryBroadcast — whose scans print their own later)
            vals["_location"] = node.toString().split("Location:", 1)[-1][
                :500
            ]
            out.append(vals)
        ch = node.children()
        for i in range(ch.length()):
            stack.append(ch.apply(i))
        if "QueryStage" in cls:
            stack.append(node.plan())
    return out


def skew_split_metrics(df: DataFrame) -> list[dict]:
    """Per-AQEShuffleRead SQL metrics from the EXECUTED plan (call
    after an action), one dict per shuffle-read node — surfacing
    ``numSkewedPartitions`` / ``numSkewedSplits`` so OptimizeSkewedJoin
    having actually SPLIT a hot partition at runtime is assertable
    (the q_join_skewed runtime pin), the same way ``scan_metrics``
    makes DPP's partitions-read count assertable."""
    jplan = df._jdf.queryExecution().executedPlan()
    if "AdaptiveSparkPlan" in jplan.getClass().getName():
        jplan = jplan.executedPlan()
    out: list[dict] = []
    stack = [jplan]
    while stack:
        node = stack.pop()
        cls = node.getClass().getName()
        if "AQEShuffleRead" in cls:
            mets = node.metrics()
            it = mets.iterator()
            vals: dict = {}
            while it.hasNext():
                kv = it.next()
                vals[kv._1()] = kv._2().value()
            vals["_desc"] = node.toString()[:200]
            out.append(vals)
        ch = node.children()
        for i in range(ch.length()):
            stack.append(ch.apply(i))
        if "QueryStage" in cls:
            stack.append(node.plan())
    return out


def shuffle_count(df: DataFrame) -> int:
    """Number of Exchange operators (each is a full shuffle stage)."""
    return sum(
        1
        for line in plan_str(df).splitlines()
        if line.strip().startswith("(") and ") Exchange" in line
    )
