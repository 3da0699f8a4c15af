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
