"""Deferred-resolution patch deltas (LakeTable.commit_patches — the
Paimon partial-update merge-on-read shape): write O(batch) with no
stored-row read, fold at read time, materialize at compaction."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.cdc.patch import apply_patches
from etl_spark.lake import LakeTable

TS0 = dt.datetime(2020, 1, 1)


def ts(s: int) -> dt.datetime:
    return TS0 + dt.timedelta(seconds=s)


SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
])

PATCH_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("op", T.StringType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("touched", T.ArrayType(T.StringType())),
])

EV_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("op", T.StringType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("touched", T.ArrayType(T.StringType())),
])


def make(spark, tmp_path, n_buckets=4):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key=["user_id"],
        n_buckets=n_buckets,
    )
    t.append(spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], SCHEMA
    ))
    return t


def patch(spark, rows):
    return spark.createDataFrame(rows, PATCH_SCHEMA)


def state(t):
    return {
        r["user_id"]: (r["event_type"], r["value"])
        for r in t.read().collect()
    }


def test_commit_patches_folds_at_read(spark, tmp_path):
    t = make(spark, tmp_path)
    snap, stats = t.commit_patches(patch(spark, [
        (1, "U", "a2", None, ["event_type"]),   # only event_type
        (2, "U", None, None, ["value"]),        # explicit NULL value
        (9, "U", "new", None, ["event_type"]),  # patch-created key
        (3, "D", None, None, None),             # delete -> eqdel
    ]))
    assert stats["mode"] == "patch" and stats["rewritten_buckets"] == 0
    assert len(t.snapshot().patch_files) >= 1
    assert state(t) == {
        1: ("a2", 1.0),    # value kept from base
        2: ("b", None),    # explicit NULL overwrote 2.0; event_type kept
        9: ("new", None),  # created: untouched value NULL
    }
    # exact live count despite partial physical rows
    assert t.row_count() == 3
    assert t.health()["patch_delta_rows"] >= 3


def test_patch_commits_stack_column_wise(spark, tmp_path):
    t = make(spark, tmp_path)
    t.commit_patches(patch(spark, [(1, "U", "x", None, ["event_type"])]))
    t.commit_patches(patch(spark, [(1, "U", None, 42.0, ["value"])]))
    assert state(t)[1] == ("x", 42.0)  # one column per commit, both stick
    # a later patch of the SAME column wins over the earlier one
    t.commit_patches(patch(spark, [(1, "U", "y", None, ["event_type"])]))
    assert state(t)[1] == ("y", 42.0)


def test_compact_materializes_and_restores_pruning(spark, tmp_path):
    t = make(spark, tmp_path)
    t.commit_patches(patch(spark, [
        (1, "U", "x", None, ["event_type"]),
        (3, "D", None, None, None),
    ]))
    before = state(t)
    t.compact()
    snap = t.snapshot()
    assert snap.patch_files == [] and snap.delete_source_files == []
    assert state(t) == before == {1: ("x", 1.0), 2: ("b", 2.0)}


def test_scan_is_exact_under_patch_backlog(spark, tmp_path):
    """A patch changes `value` to a range the base file's zone map
    excludes — scan must still find the live row (pruning disabled
    under backlog), and re-enable pruning after compact."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key=["user_id"], n_buckets=4,
        stats_cols=["value"],
    )
    t.append(spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0)], SCHEMA))
    t.commit_patches(patch(spark, [(1, "U", None, 100.0, ["value"])]))
    got = {r["user_id"] for r in t.scan([("value", ">", 50.0)]).collect()}
    assert got == {1}
    t.compact()
    got = {r["user_id"] for r in t.scan([("value", ">", 50.0)]).collect()}
    assert got == {1}


def test_scan_pruning_stays_per_bucket_under_backlog(spark, tmp_path):
    """Only buckets carrying patch deltas lose zone-map pruning; a
    patch-free bucket's non-matching file still never becomes an input
    split."""
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key=["user_id"], n_buckets=8,
        stats_cols=["value"],
    )
    # two appends -> per-bucket files with disjoint value ranges
    t.append(spark.createDataFrame(
        [(i, "lo", float(i % 10)) for i in range(40)], SCHEMA))
    t.append(spark.createDataFrame(
        [(100 + i, "hi", 1000.0 + i) for i in range(40)], SCHEMA))
    # patch exactly one key -> one bucket has a backlog
    t.commit_patches(patch(spark, [(1, "U", None, 5000.0, ["value"])]))
    pb = {f["bucket"] for f in t.snapshot().patch_files}
    assert len(pb) == 1
    df = t.scan([("value", ">=", 1000.0)])
    got = {r["user_id"] for r in df.collect()}
    assert got == {100 + i for i in range(40)} | {1}  # patched row found
    # low-range files of PATCH-FREE buckets were pruned from the input
    # (full relative paths: partitionBy reuses part-file basenames
    # across bucket dirs, so basenames are not unique)
    read_paths = {p.split("file:", 1)[-1] for p in df.inputFiles()}
    lo_pruned = [
        f for f in t.snapshot().data_files
        if f["bucket"] not in pb
        and f["stats"]["value"][1] < 1000.0  # a lo-range file
    ]
    assert lo_pruned, "expected prunable lo files in patch-free buckets"
    for f in lo_pruned:
        assert not any(p.endswith(f["path"]) for p in read_paths)


def test_cow_merge_consumes_patch_backlog(spark, tmp_path):
    t = make(spark, tmp_path)
    t.commit_patches(patch(spark, [
        (1, "U", "x", None, ["event_type"]),
        (2, "U", None, 9.0, ["value"]),
    ]))
    # cow merge upserting key 1 only — its bucket folds; key 2 may sit in
    # an untouched bucket and keep its patch entry
    src = spark.createDataFrame([(1, "merged", 7.0, "U")], T.StructType(
        list(SCHEMA.fields) + [T.StructField("op", T.StringType())]
    ))
    t.merge(src, op_col="op")
    assert state(t) == {1: ("merged", 7.0), 2: ("b", 9.0), 3: ("c", 3.0)}
    # patch entries for rewritten buckets are consumed, never re-applied
    b1 = {f["bucket"] for f in t.snapshot().patch_files}
    src1_bucket = t.bucket_histogram(src)
    assert not (set(src1_bucket) & b1)


def test_mor_full_row_shadows_older_patch(spark, tmp_path):
    t = make(spark, tmp_path)
    t.commit_patches(patch(spark, [(1, "U", "x", None, ["event_type"])]))
    src = spark.createDataFrame([(1, "full", 5.0, "U")], T.StructType(
        list(SCHEMA.fields) + [T.StructField("op", T.StringType())]
    ))
    t.merge(src, op_col="op", mode="mor")
    assert state(t)[1] == ("full", 5.0)  # patch below the delta is dead
    # and a NEWER patch on top of the mor delta applies
    t.commit_patches(patch(spark, [(1, "U", None, 6.5, ["value"])]))
    assert state(t)[1] == ("full", 6.5)


def test_delete_then_patch_recreates_partial(spark, tmp_path):
    t = make(spark, tmp_path)
    t.commit_patches(patch(spark, [(1, "D", None, None, None)]))
    assert 1 not in state(t)
    t.commit_patches(patch(spark, [(1, "U", None, 8.0, ["value"])]))
    assert state(t)[1] == (None, 8.0)  # pre-delete "a" never leaks


def test_point_lookup_folds_patches(spark, tmp_path):
    t = make(spark, tmp_path)
    t.commit_patches(patch(spark, [
        (1, "U", "x", None, ["event_type"]),
        (9, "U", "ghost", None, ["event_type"]),  # patch-created key
    ]))
    got = {r["user_id"]: r["event_type"] for r in t.read_for_keys([1, 9]).collect()}
    assert got == {1: "x", 9: "ghost"}


def test_table_changes_sees_patch_commit(spark, tmp_path):
    t = make(spark, tmp_path)
    v0 = t.current_version()
    t.commit_patches(patch(spark, [(1, "U", "x", None, ["event_type"])]))
    chg = t.table_changes(v0, t.current_version()).collect()
    upd = [r for r in chg if r["_change_type"] == "update"]
    assert len(upd) == 1 and upd[0]["event_type"] == "x"
    assert upd[0]["value"] == 1.0  # post-image carries the folded row


def test_guard_rails(spark, tmp_path):
    t = make(spark, tmp_path)
    t.commit_patches(patch(spark, [(1, "U", "x", None, ["event_type"])]))
    src = spark.createDataFrame([(1, "z", 1.0, "U")], T.StructType(
        list(SCHEMA.fields) + [T.StructField("op", T.StringType())]
    ))
    with pytest.raises(ValueError, match="patch-delta backlog"):
        t.merge(src, op_col="op", lww_by=["value"])
    # and the other direction: guarded tables refuse patch commits
    t2 = LakeTable.create(
        spark, str(tmp_path / "t2"), SCHEMA, key=["user_id"], n_buckets=4
    )
    t2.merge(
        spark.createDataFrame([(1, "a", 1.0, "U")], src.schema), op_col="op"
    )
    t2.merge(
        spark.createDataFrame([(1, None, 2.0, "D")], src.schema),
        op_col="op", lww_by=["value"],
    )
    with pytest.raises(ValueError, match="tombstones"):
        t2.commit_patches(patch(spark, [(1, "U", "x", None, ["event_type"])]))


def test_apply_patches_mor_patch_equals_eager(spark, tmp_path):
    """3-batch patch log: deferred (mor_patch) and eager (cow) paths
    converge to the identical table state; compaction of the deferred
    table changes nothing."""
    logs = [
        [(1, ts(1), 1, "I", "a", 1.0, None), (2, ts(1), 2, "I", "b", 2.0, None)],
        [(1, ts(2), 3, "U", "a2", None, ["event_type"]),
         (2, ts(2), 4, "D", None, None, None),
         (4, ts(2), 5, "U", None, 4.5, ["value"])],
        [(2, ts(3), 6, "U", "back", None, ["event_type"]),
         (1, ts(3), 7, "U", None, None, ["value"])],
    ]
    finals = {}
    for mode in ("cow", "mor_patch"):
        d = tmp_path / mode
        d.mkdir()
        t = LakeTable.create(
            spark, str(d / "t"), SCHEMA, key=["user_id"], n_buckets=4
        )
        for batch in logs:
            apply_patches(
                t, spark.createDataFrame(batch, EV_SCHEMA),
                key=["user_id"], order_by=["ts", "lsn"], mode=mode,
            )
        finals[mode] = state(t)
        if mode == "mor_patch":
            assert t.snapshot().patch_files  # really deferred
            t.compact()
            assert state(t) == finals[mode]
    assert finals["cow"] == finals["mor_patch"] == {
        1: ("a2", None), 2: ("back", None), 4: (None, 4.5),
    }


def test_read_plan_under_backlog_is_broadcast_only(spark, tmp_path):
    t = make(spark, tmp_path, n_buckets=4)
    t.commit_patches(patch(spark, [(1, "U", "x", None, ["event_type"])]))
    plan = t.read()._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    # pass-through anti-join + fold-subset semi-join both broadcast
    assert plan.count("BroadcastHashJoin") >= 2, plan
