"""Property-based tests (hypothesis): the LWW dedup and schema-evolution
kernels against independent models, over adversarial generated inputs."""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import types as T

from etl_spark.cdc.apply import dedup_last_writer_wins
from etl_spark.lake.table import SchemaEvolutionError, evolve_schema

# small domains on purpose: collisions in key/ts/lsn are the adversarial part
_events = st.lists(
    st.tuples(
        st.integers(0, 5),            # key
        st.integers(0, 3),            # ts tick
        st.integers(0, 50),           # lsn
        st.integers(0, 4),            # source_partition
        st.text(alphabet="abcd", max_size=4),  # payload
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=_events)
def test_lww_dedup_matches_pandas_model(spark, rows):
    # unique (partition, lsn) per event — the WAL invariant
    seen = set()
    rows = [r for r in rows if (r[3], r[2]) not in seen and not seen.add((r[3], r[2]))]
    pdf = pd.DataFrame(rows, columns=["k", "ts", "lsn", "source_partition", "v"])
    df = spark.createDataFrame(pdf)
    got = (
        dedup_last_writer_wins(
            df, key=["k"], order_by=["ts", "lsn", "source_partition"]
        )
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    exp = (
        pdf.sort_values(["ts", "lsn", "source_partition"], kind="stable")
        .drop_duplicates(subset=["k"], keep="last")
        .sort_values("k")
        .reset_index(drop=True)[got.columns]
    )
    pd.testing.assert_frame_equal(
        got.astype(exp.dtypes.to_dict()), exp, check_dtype=False
    )


_types = st.sampled_from(
    [T.IntegerType(), T.LongType(), T.FloatType(), T.DoubleType(), T.StringType()]
)
_fields = st.dictionaries(
    st.sampled_from(list("abcdef")), _types, min_size=1, max_size=5
)


def _widen_model(x: T.DataType, y: T.DataType):
    order = {"integer": 0, "long": 1, "float": 2, "double": 3}
    xn, yn = x.typeName(), y.typeName()
    if xn == yn:
        return x
    if xn == "string" or yn == "string":
        return None  # not widenable
    # int family widens into float family; within family wider wins
    return x if order[xn] >= order[yn] else y


@settings(max_examples=50, deadline=None)
@given(cur=_fields, inc=_fields)
def test_evolve_schema_model(cur, inc):
    cur_s = T.StructType([T.StructField(k, v) for k, v in cur.items()])
    inc_s = T.StructType([T.StructField(k, v) for k, v in inc.items()])
    conflict = any(
        k in inc and _widen_model(cur[k], inc[k]) is None for k in cur
    )
    if conflict:
        with pytest.raises(SchemaEvolutionError):
            evolve_schema(cur_s, inc_s)
        return
    out = evolve_schema(cur_s, inc_s)
    by_name = {f.name: f.dataType for f in out.fields}
    # every field from both sides present; widened per model; current order first
    assert [f.name for f in out.fields][: len(cur)] == list(cur)
    for k, v in cur.items():
        assert by_name[k] == (_widen_model(v, inc[k]) if k in inc else v)
    for k, v in inc.items():
        if k not in cur:
            assert by_name[k] == v
