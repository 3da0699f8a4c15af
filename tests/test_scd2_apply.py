"""Incremental SCD2 apply (cdc.scd2): batch-wise history building must
converge to the one-shot ``scd2_history`` window, replays must be
no-ops, and the late-data guard must catch cross-batch reordering."""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.cdc.scd2 import apply_scd2, create_scd2_table
from etl_spark.operators.temporal import scd2_history

EV_SCHEMA = T.StructType([
    T.StructField("uid", T.StringType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("lsn", T.LongType()),
    T.StructField("plan", T.StringType()),
    T.StructField("region", T.StringType()),
])


def TS(m: int) -> dt.datetime:
    return dt.datetime(2024, 3, 1, 12, m)


ROWS = [
    ("u1", TS(0), 1, "trial", "eu"),
    ("u1", TS(10), 2, "trial", "eu"),   # heartbeat: no version
    ("u1", TS(20), 3, "paid", "eu"),
    ("u2", TS(5), 4, "free", None),     # NULL payload field
    ("u1", TS(30), 5, "paid", "us"),
    ("u2", TS(35), 6, None, None),      # transition to NULL
    ("u3", TS(40), 7, "trial", "ap"),
    ("u2", TS(50), 8, None, None),      # heartbeat with NULLs
    ("u1", TS(55), 9, "trial", "us"),
]


@pytest.fixture()
def full(spark):
    return spark.createDataFrame(ROWS, EV_SCHEMA)


def _mk(spark, tmp_path):
    return create_scd2_table(
        spark, str(tmp_path / "scd2"), EV_SCHEMA, ["uid"], "ts",
        payload_cols=["plan", "region"], n_buckets=4,
    )


def _final(table):
    return (
        table.read()
        .select("uid", "plan", "region", "valid_from", "valid_to",
                "is_current", "version")
        .orderBy("uid", "version")
        .toPandas()
        .reset_index(drop=True)
    )


def test_batched_apply_equals_one_shot_history(spark, tmp_path, full):
    table = _mk(spark, tmp_path)
    cuts = [(0, 3), (4, 6), (7, 9)]
    for lo, hi in cuts:
        _, stats = apply_scd2(
            table, full.filter(F.col("lsn").between(lo, hi)), "ts",
            tiebreak=["lsn"],
        )
        assert stats["late_rows"] == 0
    ref = (
        scd2_history(full, ["uid"], "ts", payload_cols=["plan", "region"],
                     tiebreak=["lsn"])
        .orderBy("uid", "version").toPandas().reset_index(drop=True)
    )
    got = _final(table)
    pd.testing.assert_frame_equal(got, ref[got.columns])


def test_replay_is_noop_without_snapshot(spark, tmp_path, full):
    table = _mk(spark, tmp_path)
    b1 = full.filter(F.col("lsn") <= 5)
    apply_scd2(table, b1, "ts", tiebreak=["lsn"])
    v = table.current_version()
    before = _final(table)
    snap, stats = apply_scd2(table, b1, "ts", tiebreak=["lsn"])
    assert snap is None
    assert stats["late_rows"] == stats["source_rows"]
    assert table.current_version() == v
    pd.testing.assert_frame_equal(_final(table), before)


def test_heartbeat_advances_last_seen_and_guards_reorder(spark, tmp_path):
    """The A@t1, A@t5(heartbeat) then late B@t3 hazard: without
    last_seen tracking the B event would splice wrong history; the guard
    must drop it and count it."""
    table = _mk(spark, tmp_path)
    b1 = spark.createDataFrame(
        [("u1", TS(1), 1, "A", "x"), ("u1", TS(5), 2, "A", "x")], EV_SCHEMA
    )
    _, s1 = apply_scd2(table, b1, "ts", tiebreak=["lsn"])
    assert s1["versions_written"] == 1  # heartbeat collapsed
    cur = table.read().filter("is_current").collect()[0]
    assert cur["last_seen"] == TS(5)  # advanced PAST the version's ts

    b2 = spark.createDataFrame([("u1", TS(3), 3, "B", "x")], EV_SCHEMA)
    snap, s2 = apply_scd2(table, b2, "ts", tiebreak=["lsn"])
    assert snap is None and s2["late_rows"] == 1
    assert table.read().count() == 1  # history unchanged


def test_mixed_batch_applies_only_fresh_events(spark, tmp_path):
    table = _mk(spark, tmp_path)
    b1 = spark.createDataFrame([("u1", TS(10), 1, "A", "x")], EV_SCHEMA)
    apply_scd2(table, b1, "ts", tiebreak=["lsn"])
    b2 = spark.createDataFrame(
        [("u1", TS(10), 1, "A", "x"),   # replayed duplicate -> late
         ("u1", TS(20), 2, "B", "x"),   # fresh change
         ("u2", TS(5), 3, "C", "y")],   # brand-new key (earlier ts is fine)
        EV_SCHEMA,
    )
    _, stats = apply_scd2(table, b2, "ts", tiebreak=["lsn"])
    assert stats["late_rows"] == 1 and stats["events_applied"] == 2
    rows = {(r["uid"], r["version"]): r for r in table.read().collect()}
    assert set(rows) == {("u1", 1), ("u1", 2), ("u2", 1)}
    assert rows[("u1", 1)]["is_current"] is False
    assert rows[("u1", 1)]["valid_to"] == TS(20)
    assert rows[("u1", 2)]["plan"] == "B" and rows[("u1", 2)]["is_current"] is True


def test_version_continuation_after_reopen(spark, tmp_path, full):
    from etl_spark.lake import LakeTable

    table = _mk(spark, tmp_path)
    apply_scd2(table, full.filter(F.col("lsn") <= 4), "ts", tiebreak=["lsn"])
    reopened = LakeTable.load(spark, str(tmp_path / "scd2"))
    apply_scd2(reopened, full.filter(F.col("lsn") > 4), "ts", tiebreak=["lsn"])
    ref = (
        scd2_history(full, ["uid"], "ts", payload_cols=["plan", "region"],
                     tiebreak=["lsn"])
        .orderBy("uid", "version").toPandas().reset_index(drop=True)
    )
    got = _final(reopened)
    pd.testing.assert_frame_equal(got, ref[got.columns])


OP_SCHEMA = T.StructType(
    EV_SCHEMA.fields + [T.StructField("op", T.StringType())]
)


def _mk_op(spark, tmp_path):
    # op is the CDC verb, not payload: exclude it from the table schema
    return create_scd2_table(
        spark, str(tmp_path / "scd2d"), EV_SCHEMA, ["uid"], "ts",
        payload_cols=["plan", "region"], n_buckets=4,
    )


def _apply_op(table, df):
    return apply_scd2(table, df, "ts", tiebreak=["lsn"], op_col="op")


def test_delete_closes_current_version(spark, tmp_path):
    table = _mk_op(spark, tmp_path)
    b1 = spark.createDataFrame([("u1", TS(0), 1, "A", "x", "U")], OP_SCHEMA)
    _apply_op(table, b1)
    b2 = spark.createDataFrame([("u1", TS(10), 2, None, None, "D")], OP_SCHEMA)
    _, stats = _apply_op(table, b2)
    assert stats["events_applied"] == 1
    rows = table.read().collect()
    assert len(rows) == 1  # closed, no new version minted
    r = rows[0]
    assert r["version"] == 1 and r["valid_to"] == TS(10)
    assert r["is_current"] is False
    # anchor contract: the delete-closed max-version row keeps last_seen
    assert r["last_seen"] == TS(10)


def test_reopen_after_delete_continues_versions(spark, tmp_path):
    from etl_spark.lake import LakeTable

    table = _mk_op(spark, tmp_path)
    _apply_op(table, spark.createDataFrame(
        [("u1", TS(0), 1, "A", "x", "U"), ("u1", TS(10), 2, None, None, "D")],
        OP_SCHEMA,
    ))
    # reopen the table from disk: the anchor must survive a process restart
    reopened = LakeTable.load(spark, str(tmp_path / "scd2d"))
    _, stats = apply_scd2(
        reopened, spark.createDataFrame(
            [("u1", TS(20), 3, "A", "x", "U")], OP_SCHEMA),
        "ts", tiebreak=["lsn"], op_col="op",
    )
    assert stats["late_rows"] == 0
    rows = {r["version"]: r for r in reopened.read().collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["valid_to"] == TS(10) and rows[1]["is_current"] is False
    assert rows[1]["last_seen"] is None  # anchor moved to v2
    assert rows[2]["valid_from"] == TS(20) and rows[2]["is_current"] is True
    assert rows[2]["plan"] == "A"  # same payload as v1: still a new version
    assert rows[2]["last_seen"] == TS(20)


def test_delete_replay_and_repeat_are_noops(spark, tmp_path):
    table = _mk_op(spark, tmp_path)
    _apply_op(table, spark.createDataFrame(
        [("u1", TS(0), 1, "A", "x", "U")], OP_SCHEMA))
    b2 = spark.createDataFrame([("u1", TS(10), 2, None, None, "D")], OP_SCHEMA)
    _apply_op(table, b2)
    before = _final(table)
    # exact replay: the delete's ts is at-or-before last_seen -> late
    snap, stats = _apply_op(table, b2)
    assert snap is None and stats["late_rows"] == 1
    # a LATER second delete on an already-deleted key: applied, collapses
    # against the synthetic delete edge, changes nothing but last_seen
    b3 = spark.createDataFrame([("u1", TS(20), 3, "A", "x", "D")], OP_SCHEMA)
    _, s3 = _apply_op(table, b3)
    assert s3["events_applied"] == 1
    pd.testing.assert_frame_equal(_final(table), before)
    cur = table.read().collect()[0]
    assert cur["last_seen"] == TS(20)  # guard advanced past the 2nd delete


def test_delete_absent_key_is_noop(spark, tmp_path):
    table = _mk_op(spark, tmp_path)
    _, stats = _apply_op(table, spark.createDataFrame(
        [("ghost", TS(0), 1, None, None, "D")], OP_SCHEMA))
    assert stats["versions_written"] == 0
    assert table.read().count() == 0


def test_event_then_delete_same_batch(spark, tmp_path):
    table = _mk_op(spark, tmp_path)
    _, stats = _apply_op(table, spark.createDataFrame(
        [("ghost", TS(0), 1, None, None, "D"),   # leading delete: no-op
         ("u1", TS(5), 2, "A", "x", "U"),
         ("u1", TS(9), 3, None, None, "D")], OP_SCHEMA))
    rows = table.read().collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["uid"] == "u1" and r["version"] == 1
    assert r["valid_to"] == TS(9) and r["is_current"] is False
    assert r["last_seen"] == TS(9)


def test_batched_deletes_converge_to_one_shot_history(spark, tmp_path):
    """Interleaved upserts/deletes/heartbeats across four chronological
    batches must converge to exactly the one-shot ``scd2_history`` with
    the same op alphabet — including a delete that carries a stale
    payload (CDC pre-image) and consecutive cross-batch deletes."""
    rows = [
        ("u1", TS(0), 1, "A", "x", "U"),
        ("u2", TS(1), 2, "A", None, "U"),
        ("u1", TS(5), 3, "A", "x", "U"),      # heartbeat
        # -- batch 2
        ("u1", TS(10), 4, "A", "x", "D"),     # delete carrying pre-image
        ("u2", TS(11), 5, "B", "y", "U"),
        ("u3", TS(12), 6, None, None, "D"),   # delete of absent key
        # -- batch 3
        ("u1", TS(20), 7, "A", "x", "D"),     # repeat delete (collapse)
        ("u2", TS(21), 8, None, None, "D"),
        ("u3", TS(22), 9, "C", "z", "U"),
        # -- batch 4
        ("u1", TS(30), 10, "A", "x", "U"),    # reopen with v1's payload
        ("u2", TS(31), 11, "B", "y", "U"),    # reopen
        ("u3", TS(32), 12, None, "z", "U"),   # NULL payload transition
    ]
    full = spark.createDataFrame(rows, OP_SCHEMA)
    table = _mk_op(spark, tmp_path)
    for lo, hi in [(1, 3), (4, 6), (7, 9), (10, 12)]:
        _apply_op(table, full.filter(F.col("lsn").between(lo, hi)))
    ref = (
        scd2_history(full, ["uid"], "ts", payload_cols=["plan", "region"],
                     tiebreak=["lsn"], op_col="op")
        .orderBy("uid", "version").toPandas().reset_index(drop=True)
    )
    got = _final(table)
    pd.testing.assert_frame_equal(got, ref[got.columns])


def test_single_batch_bootstrap_matches_history(spark, tmp_path, full):
    table = _mk(spark, tmp_path)
    _, stats = apply_scd2(table, full, "ts", tiebreak=["lsn"])
    assert stats["late_rows"] == 0
    ref = (
        scd2_history(full, ["uid"], "ts", payload_cols=["plan", "region"],
                     tiebreak=["lsn"])
        .orderBy("uid", "version").toPandas().reset_index(drop=True)
    )
    got = _final(table)
    pd.testing.assert_frame_equal(got, ref[got.columns])
