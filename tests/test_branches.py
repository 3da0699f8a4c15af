"""Writable branches: an independent snapshot chain forked from main,
invisible until fast-forwarded, sharing data files and manifests
(Iceberg branch semantics generalizing WAP from one staged commit to a
staged lineage)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from etl_spark.lake import CommitConflict, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def make(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key=["conv_id", "turn_idx"],
        n_buckets=4, bucket_by=["conv_id"],
    )
    t.append(spark.createDataFrame([("c1", 0, "base")], SCHEMA))
    return t


def rows(df):
    return {(r.conv_id, r.turn_idx, r.text) for r in df.collect()}


def test_branch_writes_invisible_until_fast_forward(spark, tmp_path):
    t = make(spark, tmp_path)
    b = t.create_branch("backfill")
    b.merge(spark.createDataFrame([("c1", 0, "edited"), ("c2", 0, "new")], SCHEMA))
    b.append(spark.createDataFrame([("c3", 0, "third")], SCHEMA))
    # main chain is untouched: version, rows, history
    assert t.current_version() == 1
    assert rows(t.read()) == {("c1", 0, "base")}
    # branch sees its own lineage AND time travel below the fork
    assert b.current_version() == 3
    assert rows(b.read()) == {
        ("c1", 0, "edited"), ("c2", 0, "new"), ("c3", 0, "third")
    }
    assert rows(b.read(version=1)) == {("c1", 0, "base")}
    assert t.branches() == {"backfill": {"fork": 1, "head": 3}}
    snap = t.fast_forward("backfill")
    assert snap.version == 3 and ":ff(backfill)" in snap.op
    assert rows(t.read()) == {
        ("c1", 0, "edited"), ("c2", 0, "new"), ("c3", 0, "third")
    }
    # ops on the published chain carry their original kind too
    assert t.snapshot(2).op.startswith("merge")
    assert t.snapshot(3).op.startswith("append")
    # branch survives with fork advanced — write again, publish again
    assert t.branches()["backfill"] == {"fork": 3, "head": 3}
    b2 = t.branch("backfill")
    b2.merge(spark.createDataFrame([("c2", 0, "v2")], SCHEMA))
    t.fast_forward("backfill")
    assert rows(t.read()) == {
        ("c1", 0, "edited"), ("c2", 0, "v2"), ("c3", 0, "third")
    }


def test_fast_forward_conflicts_when_main_advanced(spark, tmp_path):
    t = make(spark, tmp_path)
    b = t.create_branch("b")
    b.merge(spark.createDataFrame([("c2", 0, "branch")], SCHEMA))
    # a main writer lands first
    t.merge(spark.createDataFrame([("c3", 0, "winner")], SCHEMA))
    with pytest.raises(CommitConflict):
        t.fast_forward("b")
    # nothing published; branch state intact for inspection / rebase
    assert rows(t.read()) == {("c1", 0, "base"), ("c3", 0, "winner")}
    assert rows(t.branch("b").read()) == {("c1", 0, "base"), ("c2", 0, "branch")}
    t.drop_branch("b")
    with pytest.raises(FileNotFoundError):
        t.branch("b")


def test_gc_retains_branch_references(spark, tmp_path):
    t = make(spark, tmp_path)
    b = t.create_branch("keep")
    b.merge(spark.createDataFrame([("c2", 0, "branch-only")], SCHEMA))
    # advance main twice so the branch's fork version (1) is expirable
    t.merge(spark.createDataFrame([("c1", 0, "m1")], SCHEMA))
    t.merge(spark.createDataFrame([("c1", 0, "m2")], SCHEMA))
    t.expire_snapshots(keep_last=1)
    assert t.vacuum(older_than_s=0.0) == 0  # branch files are NOT orphans
    # the branch still reads: its own commit and the retained fork base
    b = t.branch("keep")
    assert rows(b.read()) == {("c1", 0, "base"), ("c2", 0, "branch-only")}
    assert rows(b.read(version=1)) == {("c1", 0, "base")}
    # dropping the branch orphans its exclusive files; vacuum reclaims
    t.drop_branch("keep")
    assert t.vacuum(older_than_s=0.0) > 0
    assert rows(t.read()) == {("c1", 0, "m2")}


def test_branch_full_surface_update_delete_compact_cdf(spark, tmp_path):
    t = make(spark, tmp_path)
    t.append(spark.createDataFrame([("c2", 0, "keep"), ("c2", 1, "drop")], SCHEMA))
    b = t.create_branch("surgery")
    b.update({"text": "'patched'"}, where="conv_id = 'c1'")
    b.delete_where("turn_idx = 1")
    b.compact()
    assert rows(b.read()) == {("c1", 0, "patched"), ("c2", 0, "keep")}
    assert rows(t.read()) == {
        ("c1", 0, "base"), ("c2", 0, "keep"), ("c2", 1, "drop")
    }
    # change feed across the fork boundary on the branch handle
    cdf = b.table_changes(2, b.current_version())
    kinds = {(r.conv_id, r.turn_idx): r._change_type for r in cdf.collect()}
    assert kinds[("c1", 0)] == "update"
    assert kinds[("c2", 1)] == "delete"
    t.fast_forward("surgery")
    assert rows(t.read()) == {("c1", 0, "patched"), ("c2", 0, "keep")}


def test_branch_blocked_lifecycle_ops(spark, tmp_path):
    t = make(spark, tmp_path)
    b = t.create_branch("b")
    for fn in (
        lambda: b.expire_snapshots(),
        lambda: b.vacuum(),
        lambda: b.create_ref("x"),
        lambda: b.create_branch("nested"),
        lambda: b.fast_forward("b"),
        lambda: b.drop_branch("b"),
        lambda: b.wap("w"),
    ):
        with pytest.raises(RuntimeError, match="main table handle"):
            fn()
    with pytest.raises(FileExistsError):
        t.create_branch("b")
    with pytest.raises(ValueError, match="must match"):
        t.create_branch("bad/name")


def test_branch_handle_stays_live_across_fast_forward(spark, tmp_path):
    """A handle held across fast_forward must see the advanced fork
    (branch.json is re-read, never cached) — its own published commits
    on main — and keep committing on the right base."""
    t = make(spark, tmp_path)
    b = t.create_branch("b")
    b.merge(spark.createDataFrame([("c2", 0, "first")], SCHEMA))
    t.fast_forward("b")
    # the SAME pre-publish handle resolves its published commit on main
    assert b.current_version() == 2
    assert rows(b.read()) == {("c1", 0, "base"), ("c2", 0, "first")}
    # and a new write commits on the published base, not the stale fork
    b.merge(spark.createDataFrame([("c3", 0, "second")], SCHEMA))
    assert rows(b.read()) == {
        ("c1", 0, "base"), ("c2", 0, "first"), ("c3", 0, "second")
    }
    t.fast_forward("b")
    assert rows(t.read()) == {
        ("c1", 0, "base"), ("c2", 0, "first"), ("c3", 0, "second")
    }


def test_fast_forward_resumes_after_mid_publish_crash(spark, tmp_path):
    """Main ahead of the recorded fork with our own :ff-tagged commits
    is a crashed publish, not divergence — the next call rolls the fork
    forward over the published prefix and publishes the rest."""
    import json
    import time as _time

    t = make(spark, tmp_path)
    b = t.create_branch("b")
    b.merge(spark.createDataFrame([("c2", 0, "two")], SCHEMA))    # v2
    b.merge(spark.createDataFrame([("c3", 0, "three")], SCHEMA))  # v3
    # simulate a crash AFTER snap-2 landed on main, BEFORE the branch-side
    # cleanup: main copy exists (tagged), branch copy remains, fork stale
    bdir = t._branch_dir("b")
    src = os.path.join(bdir, "snap-%012d.json" % 2)
    with open(src) as fh:
        d = json.load(fh)
    d["op"] += ":ff(b)"
    d["ts"] = _time.time()
    with open(t._snap_path(2), "w") as fh:
        json.dump(d, fh)
    assert t.branches()["b"]["fork"] == 1
    snap = t.fast_forward("b")  # must NOT raise CommitConflict
    assert snap.version == 3
    assert rows(t.read()) == {
        ("c1", 0, "base"), ("c2", 0, "two"), ("c3", 0, "three")
    }
    assert t.branches()["b"]["fork"] == 3

    # crash variant: branch copy already removed, only the fork is stale
    b2 = t.branch("b")
    b2.merge(spark.createDataFrame([("c4", 0, "four")], SCHEMA))  # v4
    t.fast_forward("b")
    meta = os.path.join(bdir, "branch.json")
    with open(meta) as fh:
        m = json.load(fh)
    m["fork"] = 3  # roll back: crashed after os.remove, before advance
    with open(meta, "w") as fh:
        json.dump(m, fh)
    snap = t.fast_forward("b")  # nothing pending; reconciles fork only
    assert snap.version == 4
    assert t.branches()["b"]["fork"] == 4


def test_branch_from_old_version_not_fast_forwardable(spark, tmp_path):
    t = make(spark, tmp_path)
    t.merge(spark.createDataFrame([("c1", 0, "v2")], SCHEMA))
    b = t.create_branch("old", version=1)
    b.append(spark.createDataFrame([("c9", 0, "x")], SCHEMA))
    assert rows(b.read()) == {("c1", 0, "base"), ("c9", 0, "x")}
    with pytest.raises(CommitConflict, match="not fast-forwardable"):
        t.fast_forward("old")
    t.drop_branch("old")
