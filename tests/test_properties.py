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


_paths = st.lists(
    st.sampled_from(["a", "a.b", "a.c", "a.d.e", "x", "nope", "a.zz"]),
    min_size=1, max_size=5, unique=True,
)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(srcs=_paths)
def test_field_map_paths_match_select_model(spark, srcs):
    """Any dotted path that df.select can resolve must resolve to the same
    value through field_map; unresolvable ones become literals."""
    from etl_spark.operators import field_map

    df = spark.createDataFrame(
        [(7, ("s", 1.5, (9,)))],
        "x long, a struct<b:string, c:double, d:struct<e:long>>",
    )
    mapping = {f"d{i}": s for i, s in enumerate(srcs)}
    row = field_map(df, mapping).first()
    for i, s in enumerate(srcs):
        try:
            exp = df.select(s).first()[0]
        except Exception:
            exp = s  # unresolvable -> literal fallback
        got = row[f"d{i}"]
        if s == "a":  # struct value comes back as a Row
            got = tuple(got)
            exp = tuple(exp)
        elif s == "a.d":
            got, exp = tuple(got), tuple(exp)
        assert got == exp, (s, got, exp)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 30), st.integers(-5, 5)),
        min_size=1, max_size=30, unique_by=lambda r: r[0],
    ),
    threshold=st.integers(-4, 4),
)
def test_lake_update_matches_case_model(spark, tmp_path_factory, rows, threshold):
    """LakeTable.update == the CASE WHEN projection of the same expressions
    over the pre-update state (standard SQL UPDATE semantics)."""
    from etl_spark.lake import LakeTable

    pdf = pd.DataFrame(rows, columns=["k", "v"])
    df = spark.createDataFrame(pdf.astype({"k": "int64", "v": "int64"}))
    path = str(tmp_path_factory.mktemp("upd") / "t")
    table = LakeTable.create(spark, path, df.schema, key=["k"], n_buckets=4)
    table.append(df)
    table.update({"v": "v * 10 + 1"}, where=f"v < {threshold}")
    got = table.read().toPandas().sort_values("k").reset_index(drop=True)
    exp = pdf.copy()
    exp.loc[exp["v"] < threshold, "v"] = exp["v"] * 10 + 1
    exp = exp.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"k": "int64", "v": "int64"}), exp.astype({"k": "int64", "v": "int64"})
    )


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    n_conv=st.integers(10, 60),
    churn=st.floats(0.5, 4.0),
    skew=st.floats(1.0, 2.5),
    n_parts=st.integers(1, 5),
    segs=st.integers(1, 5),
    cutover=st.floats(0.0, 1.0),
    seed=st.integers(0, 10_000),
)
def test_whole_engine_converges_on_random_changelogs(
    spark, tmp_path_factory, n_conv, churn, skew, n_parts, segs, cutover, seed
):
    """End-to-end fuzz: ANY changelog shape (churn, skew, partitioning,
    segmentation, schema-evolution cut point, seed) streamed through the
    full engine must converge bit-for-bit to the pandas oracle."""
    from etl_spark.cdc import ChangelogSpec, generate_changelog, write_changelog
    from etl_spark.cdc.changelog import TRANSCRIPTS_SCHEMA, expected_final_state
    from etl_spark.lake import LakeTable
    from etl_spark.streaming import CdcStream

    spec = ChangelogSpec(
        n_conversations=n_conv, churn=churn, skew=skew, n_partitions=n_parts,
        segments_per_partition=segs, evolution_cutover=cutover, seed=seed,
    )
    pdf = generate_changelog(spec)
    base = tmp_path_factory.mktemp("fuzz")
    wal = str(base / "wal")
    write_changelog(pdf, wal, spec)
    table = LakeTable.create(
        spark, str(base / "t"), TRANSCRIPTS_SCHEMA,
        key=["conv_id", "turn_idx"], n_buckets=4, bucket_by=["conv_id"],
    )
    CdcStream(spark, wal, table, str(base / "state")).run_to_completion()
    got = (
        table.read().orderBy("conv_id", "turn_idx").toPandas()
        [["conv_id", "turn_idx", "role", "text"]].reset_index(drop=True)
    )
    exp = expected_final_state(pdf)[
        ["conv_id", "turn_idx", "role", "text"]
    ].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 60),
                  st.one_of(st.none(), st.integers(-8, 8))),
        min_size=1, max_size=40, unique_by=lambda r: r[0],
    ),
    horizon=st.integers(-7, 7),
    chunks=st.integers(1, 3),
)
def test_delete_where_dispositions_match_filter_model(
    spark, tmp_path_factory, rows, horizon, chunks
):
    """delete_where == the NOT-matching filter over the pre-delete state
    for ANY mix of file dispositions. Rows arrive value-sorted in several
    commits (tight, disjoint zone ranges per file) with NULLs sprinkled
    in, the predicate parses completely into stats conjuncts — so across
    examples the three dispositions (metadata drop / verbatim keep /
    boundary rewrite) all occur, and each must be invisible in the
    result."""
    from etl_spark.lake import LakeTable

    path = str(tmp_path_factory.mktemp("dw") / "t")
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.LongType()),
    ])
    table = LakeTable.create(
        spark, path, schema, key=["k"], n_buckets=2, stats_cols=["v"],
    )
    ordered = sorted(rows, key=lambda r: (r[1] is None, r[1] or 0, r[0]))
    step = -(-len(ordered) // chunks)
    for i in range(0, len(ordered), step):
        table.append(spark.createDataFrame(ordered[i:i + step], schema))
    _snap, stats = table.delete_where(f"v < {horizon}")
    got = sorted(
        (r["k"], r["v"]) for r in table.read().collect()
    )
    exp = sorted(
        (k, v) for k, v in rows if v is None or v >= horizon
    )
    assert got == exp
    assert stats["rows_deleted"] == len(rows) - len(exp)


_patch_rows = st.lists(
    st.tuples(
        st.integers(0, 4),                                   # key
        st.sampled_from(["I", "U", "D"]),
        st.sets(st.sampled_from(["v", "w"]), min_size=1),    # touched (U)
        st.one_of(st.none(), st.text(alphabet="ab", max_size=2)),  # v
        st.one_of(st.none(), st.integers(-5, 5)),            # w
    ),
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    rows=_patch_rows,
    chunks=st.integers(1, 3),
    modes=st.lists(
        st.sampled_from(["cow", "mor_patch", "cow+c", "mor_patch+c"]),
        min_size=3, max_size=3,
    ),
)
def test_patch_mode_interleavings_match_column_fold_model(
    spark, tmp_path_factory, rows, chunks, modes
):
    """ANY interleaving of insert/partial-update/delete events, split
    into ANY lsn-ordered batches, applied through ANY per-batch mix of
    eager (cow) and deferred (mor_patch) patch application with
    compaction at arbitrary points, must equal the sequential
    column-wise fold model — set-to-NULL vs untouched-keeps-stored,
    delete-then-patch recreation (pre-delete values must NOT leak), and
    read-time folds over mixed cow/patch state included."""
    from etl_spark.cdc.patch import apply_patches
    from etl_spark.lake import LakeTable

    path = str(tmp_path_factory.mktemp("patchfuzz") / "t")
    schema = T.StructType([
        T.StructField("k", T.LongType()),
        T.StructField("v", T.StringType()),
        T.StructField("w", T.LongType()),
    ])
    table = LakeTable.create(spark, path, schema, key=["k"], n_buckets=2)

    events = []  # (k, op, lsn, touched, v, w)
    for i, (k, op, touched, v, w) in enumerate(rows):
        if op == "U":
            events.append((
                k, op, i + 1, sorted(touched),
                v if "v" in touched else None,
                w if "w" in touched else None,
            ))
        else:  # I/D: every column is touched by contract; D carries NULLs
            events.append(
                (k, op, i + 1, None, v if op == "I" else None,
                 w if op == "I" else None)
            )

    ev_schema = ("k long, op string, lsn long, touched array<string>,"
                 " v string, w long")
    size = -(-len(events) // chunks)
    for b in range(chunks):
        batch = events[b * size:(b + 1) * size]
        if not batch:
            continue
        mode = modes[b % len(modes)]
        apply_patches(
            table, spark.createDataFrame(batch, ev_schema),
            key=["k"], order_by=["lsn"],
            mode="mor_patch" if mode.startswith("mor_patch") else "cow",
        )
        if mode.endswith("+c"):
            table.compact()

    # sequential column-wise fold model
    state: dict[int, dict] = {}
    for k, op, _lsn, touched, v, w in events:
        if op == "D":
            state.pop(k, None)
            continue
        row = state.setdefault(k, {"v": None, "w": None})
        if op == "I":
            row["v"], row["w"] = v, w
        else:
            if "v" in touched:
                row["v"] = v
            if "w" in touched:
                row["w"] = w
    got = {(r.k, r.v, r.w) for r in table.read().collect()}
    exp = {(k, d["v"], d["w"]) for k, d in state.items()}
    assert got == exp
