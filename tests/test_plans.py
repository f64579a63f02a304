"""Physical-plan assertions (SURVEY.md §5.3.4 / §4.2).

Correctness tests prove the answers; these prove the *plans* — the
properties that decide whether a query survives a 100× scale-up:
filters reach the parquet reader, projections prune the read schema,
dimension joins broadcast, aggregates partial-combine before the
shuffle, top-k never globally sorts, and the hot path stays inside
whole-stage codegen.
"""

from __future__ import annotations

import frafka_spark
from frafka_spark.registry import QUERIES

from tests.conftest import SF_DIR

frafka_spark.load_all()


def _plan(spark, name: str) -> str:
    import contextlib
    import io

    df = QUERIES[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(spark, "q_scan_filter_pushdown")
    assert "PushedFilters:" in plan
    pushed = next(l for l in plan.splitlines() if "PushedFilters:" in l)
    assert "l_shipdate" in pushed and "l_quantity" in pushed, pushed


def test_column_pruning_in_read_schema(spark):
    plan = _plan(spark, "q_scan_project")
    schema_line = next(l for l in plan.splitlines() if "ReadSchema:" in l)
    # 3 of 11 lineitem columns survive into the scan.
    assert "l_orderkey" in schema_line
    assert "l_extendedprice" in schema_line
    for dropped in ("l_shipdate", "l_discount", "l_returnflag", "l_partkey"):
        assert dropped not in schema_line, f"{dropped} not pruned: {schema_line}"


def test_dim_join_broadcasts(spark):
    plan = _plan(spark, "q_join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_multiway_join_broadcasts_dims(spark):
    # nation/region (and under the 32 MB threshold, customer/supplier)
    # must broadcast — the 100 TB fact table never shuffles for dims.
    plan = _plan(spark, "q_join_multiway")
    assert "BroadcastHashJoin" in plan


def test_agg_partial_combine_before_shuffle(spark):
    plan = _plan(spark, "q_agg_group")
    # Two HashAggregate nodes = map-side partial + final merge, and the
    # partial functions must appear BEFORE the Exchange.
    assert plan.count("HashAggregate") >= 2, plan
    assert "partial_sum" in plan, plan
    assert plan.index("partial_sum") > plan.index("Exchange"), (
        "partial aggregation did not precede the shuffle"
    )


def test_topk_avoids_global_sort(spark):
    plan = _plan(spark, "q_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_semi_anti_stay_joins(spark):
    # EXISTS/NOT EXISTS must plan as semi/anti joins, not aggregates.
    assert "LeftSemi" in _plan(spark, "q_join_semi")
    assert "LeftAnti" in _plan(spark, "q_join_anti")


def test_scalar_functions_stay_in_codegen(spark):
    # No Python evaluation node in the built-in function families, and
    # the operators carry the whole-stage-codegen star marker (simple
    # explain mode prints codegen'd operators as "*(n) Op").
    import contextlib
    import io

    for name in ("q_fn_string", "q_fn_math", "q_fn_date", "q_fn_json"):
        df = QUERIES[name].fn(spark, SF_DIR)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        plan = buf.getvalue()
        assert "BatchEvalPython" not in plan, name
        assert "ArrowEvalPython" not in plan, name
        assert "*(1)" in plan, f"{name} not codegen'd:\n{plan}"
