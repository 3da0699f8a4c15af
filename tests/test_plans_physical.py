"""Physical-plan checks: the optimizations we claim must be visible in
``explain`` output — predicate pushdown to the parquet scan, column
pruning, broadcast of the dimension side, no Python in expression-only
pipelines."""

from __future__ import annotations

import pytest

from etl_spark.operators import isin_filter, lookup_in
from etl_spark.functions.text import normalize_transcripts_expr


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")


def test_isin_filter_pushed_to_scan(lineitem):
    df = isin_filter(lineitem, "l_returnflag", ["A", "R"]).select(
        "l_orderkey", "l_returnflag"
    )
    plan = _executed_plan(df)
    assert "PushedFilters" in plan and "l_returnflag" in plan.split("PushedFilters", 1)[1][:200]


def test_column_pruning_reaches_scan(lineitem):
    df = lineitem.select("l_orderkey", "l_quantity")
    plan = _executed_plan(df)
    read = plan.split("ReadSchema", 1)[1][:200]
    assert "l_orderkey" in read and "l_extendedprice" not in read


def test_lookup_in_uses_broadcast_join(spark):
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    df = lookup_in(customer, nation, "c_nationkey", "n_nationkey", "n_name")
    assert "BroadcastHashJoin" in _executed_plan(df)


def test_normalize_transform_has_no_python(spark):
    df = spark.createDataFrame(
        [("a", 0, "user", " x ", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    plan = _executed_plan(normalize_transcripts_expr(df))
    # expression-only: no Arrow/Python eval nodes in the CDC hot path
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
