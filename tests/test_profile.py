"""Column profiling (operators/profile.py): exact stats vs hand truth,
approx sketch error bounds vs exact, and the plan-shape contract (exact
mode pays Expand, approx mode must not)."""

from __future__ import annotations

import math

from pyspark.sql import types as T

from etl_spark.operators.profile import profile_approx, profile_exact

SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("v", T.DoubleType()),
        T.StructField("s", T.StringType()),
    ]
)

ROWS = [
    (1, 1.5, "alpha"),
    (2, None, "beta"),
    (3, 2.5, None),
    (3, 2.5, "beta"),
    (None, -1.0, ""),
]


def by_col(df):
    return {r["col_name"]: r.asDict() for r in df.collect()}


def test_profile_exact_values(spark):
    p = by_col(profile_exact(spark.createDataFrame(ROWS, SCHEMA)))
    assert set(p) == {"k", "v", "s"}
    k = p["k"]
    assert (k["n_rows"], k["n_nulls"], k["n_distinct"]) == (5, 1, 3)
    assert float(k["min_num"]) == 1 and float(k["max_num"]) == 3
    assert float(k["sum_num"]) == 9 and k["sum_len"] is None
    v = p["v"]
    assert (v["n_nulls"], v["n_distinct"]) == (1, 3)
    assert float(v["min_num"]) == -1.0 and float(v["sum_num"]) == 5.5
    s = p["s"]
    assert (s["n_nulls"], s["n_distinct"]) == (1, 3)
    assert s["min_num"] is None and s["sum_len"] == len("alphabetabeta")


def test_profile_exact_column_subset(spark):
    df = spark.createDataFrame(ROWS, SCHEMA)
    p = profile_exact(df, cols=["k"])
    assert [r["col_name"] for r in p.collect()] == ["k"]


def test_profile_approx_error_bounds(spark):
    n = 5000
    df = spark.range(n).selectExpr(
        "id AS k",
        "CAST(id % 997 AS DOUBLE) AS v",
        "CASE WHEN id % 10 = 0 THEN NULL ELSE concat('s', id % 250) END AS s",
    )
    exact = by_col(profile_exact(df))
    approx = by_col(profile_approx(df, rsd=0.02))
    for c in ("k", "v", "s"):
        e, a = exact[c]["n_distinct"], approx[c]["approx_distinct"]
        assert abs(a - e) <= max(3, 0.08 * e), (c, e, a)
        assert approx[c]["n_rows"] == n
        assert approx[c]["n_nulls"] == exact[c]["n_nulls"]
    # quantiles: rank error within 1/accuracy of the true rank
    med = approx["v"]["quantiles"][1]
    assert abs(med - 498.0) <= 10.0
    assert approx["s"]["quantiles"] is None
    assert float(approx["k"]["min_num"]) == 0.0
    assert float(approx["k"]["max_num"]) == float(n - 1)


def test_exact_pays_expand_approx_does_not(spark):
    """The scale contract: exact distincts Expand the scan per column;
    the sketch profile is one pass with no Expand node."""
    df = spark.range(100).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    exact_plan = profile_exact(df)._jdf.queryExecution().executedPlan().toString()
    approx_plan = profile_approx(df)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in exact_plan
    assert "Expand" not in approx_plan


def test_profile_single_job_each(spark):
    """Both profiles are one aggregation over the input — the output is
    inlined from the single aggregate row, never a per-column union."""
    df = spark.range(1000).selectExpr(
        "id AS k", "CAST(id AS DOUBLE) AS v", "concat('x', id) AS s"
    )
    for fn in (profile_exact, profile_approx):
        plan = fn(df)._jdf.queryExecution().executedPlan().toString()
        assert "Union" not in plan
