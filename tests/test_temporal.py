"""Temporal operators: as-of join, interval join, SCD2 history.

Semantics pinned on small hand-built frames (ties, tolerance, unmatched
rows, forward direction, name collisions); plan shape asserted on the
sf0.001 events table (single Exchange for the as-of union+window, no
cartesian/broadcast-nested-loop for the interval join). Bit-exact
DuckDB-oracle equivalence at sf0.01 runs in the driver gate
(queries `asof_join`, `interval_join`, `scd2`).
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from etl_spark.operators.temporal import asof_join, interval_join, scd2_history


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 3, 1, 12, minute, 0)


@pytest.fixture(scope="module")
def quotes(spark):
    # right side: per-key quotes at minutes 0, 10, 20
    return spark.createDataFrame(
        [("a", _ts(0), 1.0), ("a", _ts(10), 2.0), ("a", _ts(20), 3.0),
         ("b", _ts(5), 10.0)],
        "sym string, qts timestamp, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [("a", _ts(10), 100), ("a", _ts(15), 101), ("a", _ts(25), 102),
         ("b", _ts(4), 200),  # before b's only quote
         ("c", _ts(30), 300)],  # key with no quotes at all
        "sym string, ts timestamp, trade_id int",
    )


def test_asof_backward_inclusive_tie(spark, trades, quotes):
    out = {
        r["trade_id"]: r["px"]
        for r in asof_join(
            trades, quotes, keys=["sym"], left_time="ts", right_time="qts",
            right_cols=["px"],
        ).collect()
    }
    # trade at :10 matches the quote AT :10 (inclusive bound)
    assert out == {100: 2.0, 101: 2.0, 102: 3.0, 200: None, 300: None}


def test_asof_forward(spark, trades, quotes):
    out = {
        r["trade_id"]: r["px"]
        for r in asof_join(
            trades, quotes, keys=["sym"], left_time="ts", right_time="qts",
            right_cols=["px"], direction="forward",
        ).collect()
    }
    # forward: earliest quote at-or-after; trade :10 -> quote :10,
    # trade :25 -> none, b's :04 trade -> b's :05 quote
    assert out == {100: 2.0, 101: 3.0, 102: None, 200: 10.0, 300: None}


def test_asof_tolerance(spark, trades, quotes):
    out = {
        r["trade_id"]: r["px"]
        for r in asof_join(
            trades, quotes, keys=["sym"], left_time="ts", right_time="qts",
            right_cols=["px"], tolerance_seconds=120,
        ).collect()
    }
    # only matches within 2 minutes survive: trade :10 (gap 0) yes,
    # trade :15 (gap 5 min) no, trade :25 (gap 5 min) no
    assert out == {100: 2.0, 101: None, 102: None, 200: None, 300: None}


def test_asof_collision_suffix_and_left_columns(spark, quotes):
    left = spark.createDataFrame(
        [("a", _ts(15), 7.7)], "sym string, ts timestamp, px double"
    )
    out = asof_join(
        left, quotes, keys=["sym"], left_time="ts", right_time="qts",
        right_cols=["px"],
    )
    row = out.collect()[0]
    assert row["px"] == 7.7 and row["px_r"] == 2.0
    assert set(out.columns) == {"sym", "ts", "px", "px_r"}


def test_asof_matches_pandas_merge_asof(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    p = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    v = events.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("vts"), F.col("event_id").alias("vid")
    )
    got = (
        asof_join(p, v, keys=["user_id"], left_time="ts", right_time="vts",
                  right_cols=["vid"])
        .orderBy("event_id").toPandas()[["user_id", "event_id", "vid"]]
    )
    lp = p.toPandas().sort_values("ts")
    rp = v.toPandas().sort_values("vts")
    want = (
        pd.merge_asof(lp, rp, left_on="ts", right_on="vts", by="user_id")
        .sort_values("event_id")[["user_id", "event_id", "vid"]]
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want)


def test_asof_single_exchange(spark, trades, quotes):
    out = asof_join(trades, quotes, keys=["sym"], left_time="ts",
                    right_time="qts", right_cols=["px"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------
# interval join
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def sessions(spark):
    return spark.createDataFrame(
        [("a", _ts(0), _ts(10), "s1"), ("a", _ts(8), _ts(20), "s2"),
         ("b", _ts(0), _ts(59), "s3")],
        "sym string, lo timestamp, hi timestamp, sid string",
    )


def test_interval_join_containment_and_overlap(spark, trades, sessions):
    got = {
        (r["trade_id"], r["sid"])
        for r in interval_join(
            trades, sessions, "ts", "lo", "hi", keys=["sym"], bin_seconds=300
        ).collect()
    }
    # trade :10 is in BOTH overlapping a-sessions (boundary inclusive);
    # :15 only in s2; :25 in none; b's :04 in s3; c unmatched
    assert got == {(100, "s1"), (100, "s2"), (101, "s2"), (200, "s3")}


def test_interval_join_left_keeps_unmatched(spark, trades, sessions):
    out = interval_join(
        trades, sessions, "ts", "lo", "hi", keys=["sym"], bin_seconds=300,
        how="left",
    )
    ids = [r["trade_id"] for r in out.collect()]
    assert sorted(ids) == [100, 100, 101, 102, 200, 300]
    unmatched = {r["trade_id"] for r in out.collect() if r["sid"] is None}
    assert unmatched == {102, 300}


def test_interval_join_bin_width_invariance(spark, trades, sessions):
    a = interval_join(trades, sessions, "ts", "lo", "hi", keys=["sym"],
                      bin_seconds=60).collect()
    b = interval_join(trades, sessions, "ts", "lo", "hi", keys=["sym"],
                      bin_seconds=7200).collect()
    key = lambda r: (r["trade_id"], r["sid"])
    assert sorted(map(key, a)) == sorted(map(key, b))


def test_interval_join_guard_raises_on_huge_interval(spark, trades):
    wide = spark.createDataFrame(
        [("a", _ts(0), dt.datetime(2030, 1, 1), "w")],
        "sym string, lo timestamp, hi timestamp, sid string",
    )
    with pytest.raises(Exception, match="spans more than"):
        interval_join(trades, wide, "ts", "lo", "hi", keys=["sym"],
                      bin_seconds=1, max_bins_per_interval=1000).collect()


def test_interval_join_no_cartesian(spark, trades, sessions):
    out = interval_join(trades, sessions, "ts", "lo", "hi", keys=["sym"],
                        bin_seconds=300)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------
# SCD2
# --------------------------------------------------------------------------

def test_scd2_versions_and_validity(spark):
    log = spark.createDataFrame(
        [("u1", _ts(0), 1, "trial"), ("u1", _ts(10), 2, "trial"),
         ("u1", _ts(20), 3, "paid"), ("u1", _ts(30), 4, "paid"),
         ("u2", _ts(5), 5, "free")],
        "uid string, ts timestamp, lsn int, plan string",
    )
    rows = {
        (r["uid"], r["version"]): r
        for r in scd2_history(log, ["uid"], "ts", payload_cols=["plan"],
                              tiebreak=["lsn"]).collect()
    }
    # heartbeats collapsed: u1 has 2 versions, u2 has 1
    assert set(rows) == {("u1", 1), ("u1", 2), ("u2", 1)}
    v1, v2 = rows[("u1", 1)], rows[("u1", 2)]
    assert v1["plan"] == "trial" and v1["valid_from"] == _ts(0)
    assert v1["valid_to"] == _ts(20) and v1["is_current"] is False
    assert v2["plan"] == "paid" and v2["valid_from"] == _ts(20)
    assert v2["valid_to"] is None and v2["is_current"] is True
    assert rows[("u2", 1)]["is_current"] is True


def test_scd2_change_only_false_keeps_heartbeats(spark):
    log = spark.createDataFrame(
        [("u1", _ts(0), 1, "x"), ("u1", _ts(10), 2, "x")],
        "uid string, ts timestamp, lsn int, plan string",
    )
    out = scd2_history(log, ["uid"], "ts", payload_cols=["plan"],
                       tiebreak=["lsn"], change_only=False).collect()
    assert len(out) == 2
    assert {r["version"] for r in out} == {1, 2}


def test_scd2_equal_timestamp_tiebreak(spark):
    log = spark.createDataFrame(
        [("u1", _ts(0), 2, "b"), ("u1", _ts(0), 1, "a")],
        "uid string, ts timestamp, lsn int, plan string",
    )
    rows = {
        r["version"]: r["plan"]
        for r in scd2_history(log, ["uid"], "ts", payload_cols=["plan"],
                              tiebreak=["lsn"]).collect()
    }
    assert rows == {1: "a", 2: "b"}


def test_scd2_single_exchange(spark):
    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = scd2_history(
        events.select("user_id", "ts", "event_id", "event_type"),
        ["user_id"], "ts", payload_cols=["event_type"], tiebreak=["event_id"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_scd2_deletes_close_reopen_collapse(spark):
    """op_col alphabet: D closes the open version (valid_to = delete
    time) without minting one; consecutive deletes collapse; a later
    event reopens at the next version; a leading delete is a no-op."""
    log = spark.createDataFrame(
        [("u1", _ts(0), 1, "a", "U"),
         ("u1", _ts(10), 2, None, "D"),
         ("u1", _ts(15), 3, None, "D"),    # repeat delete: collapses
         ("u1", _ts(20), 4, "a", "U"),     # reopen, same payload as v1
         ("u2", _ts(0), 5, None, "D"),     # leading delete: nothing open
         ("u2", _ts(5), 6, "z", "U")],
        "uid string, ts timestamp, lsn int, plan string, op string",
    )
    rows = {
        (r["uid"], r["version"]): r
        for r in scd2_history(log, ["uid"], "ts", payload_cols=["plan"],
                              tiebreak=["lsn"], op_col="op").collect()
    }
    assert set(rows) == {("u1", 1), ("u1", 2), ("u2", 1)}
    v1 = rows[("u1", 1)]
    assert v1["valid_to"] == _ts(10) and v1["is_current"] is False
    v2 = rows[("u1", 2)]
    assert v2["valid_from"] == _ts(20) and v2["is_current"] is True
    assert rows[("u2", 1)]["valid_from"] == _ts(5)
    assert rows[("u2", 1)]["is_current"] is True


def test_scd2_trailing_delete_leaves_no_current(spark):
    log = spark.createDataFrame(
        [("u1", _ts(0), 1, "a", "I"), ("u1", _ts(9), 2, "a", "X")],
        "uid string, ts timestamp, lsn int, plan string, op string",
    )
    out = scd2_history(log, ["uid"], "ts", payload_cols=["plan"],
                       tiebreak=["lsn"], op_col="op", delete_op="X").collect()
    assert len(out) == 1
    assert out[0]["valid_to"] == _ts(9) and out[0]["is_current"] is False


def test_enrich_history_containment_gap_and_boundaries(spark):
    """Half-open containment: valid_from inclusive, valid_to exclusive;
    NULL valid_to = open/current; facts inside a delete-closed coverage
    gap or before the first version enrich to NULL."""
    from etl_spark.operators.temporal import enrich_history

    hist = spark.createDataFrame(
        [
            # u1: [0,10) gold, GAP [10,20) (delete-closed), [20,None) silver
            ("u1", "gold", _ts(0), _ts(10)),
            ("u1", "silver", _ts(20), None),
            # u2: single open version from :5
            ("u2", "bronze", _ts(5), None),
        ],
        "uid string, tier string, valid_from timestamp, valid_to timestamp",
    )
    facts = spark.createDataFrame(
        [
            ("u1", _ts(0), 1),    # == valid_from -> gold (inclusive)
            ("u1", _ts(9), 2),    # inside first version -> gold
            ("u1", _ts(10), 3),   # == valid_to -> GAP (exclusive) -> NULL
            ("u1", _ts(15), 4),   # in the gap -> NULL
            ("u1", _ts(20), 5),   # reopen boundary -> silver
            ("u1", _ts(59), 6),   # open interval -> silver
            ("u2", _ts(4), 7),    # before first version -> NULL
            ("u2", _ts(5), 8),    # at first version -> bronze
            ("u3", _ts(1), 9),    # key with no history -> NULL
        ],
        "uid string, ts timestamp, fid int",
    )
    out = {
        r["fid"]: r["tier"]
        for r in enrich_history(
            facts, hist, keys=["uid"], fact_time="ts",
            payload_cols=["tier"],
        ).collect()
    }
    assert out == {1: "gold", 2: "gold", 3: None, 4: None, 5: "silver",
                   6: "silver", 7: None, 8: "bronze", 9: None}


def test_enrich_history_empty_interval_deterministic(spark):
    """A zero-width version (valid_to == valid_from — an equal-timestamp
    change) contains no points and never shadows the real match."""
    from etl_spark.operators.temporal import enrich_history

    hist = spark.createDataFrame(
        [
            ("u1", "flash", _ts(10), _ts(10)),  # empty interval
            ("u1", "steady", _ts(10), None),
        ],
        "uid string, tier string, valid_from timestamp, valid_to timestamp",
    )
    facts = spark.createDataFrame(
        [("u1", _ts(10), 1), ("u1", _ts(11), 2)],
        "uid string, ts timestamp, fid int",
    )
    out = {
        r["fid"]: r["tier"]
        for r in enrich_history(
            facts, hist, keys=["uid"], fact_time="ts",
            payload_cols=["tier"],
        ).collect()
    }
    assert out == {1: "steady", 2: "steady"}


def test_enrich_history_collision_suffix(spark):
    """A payload/valid_to name already present on the fact side gets the
    suffix; the fact's own column is untouched."""
    from etl_spark.operators.temporal import enrich_history

    hist = spark.createDataFrame(
        [("u1", "gold", _ts(0), None)],
        "uid string, tier string, valid_from timestamp, valid_to timestamp",
    )
    facts = spark.createDataFrame(
        [("u1", _ts(5), "mine", 1)],
        "uid string, ts timestamp, tier string, fid int",
    )
    row = enrich_history(
        facts, hist, keys=["uid"], fact_time="ts", payload_cols=["tier"],
    ).collect()[0]
    assert row["tier"] == "mine" and row["tier_dim"] == "gold"
    assert "valid_to" not in row.asDict() and "valid_to_dim" not in row.asDict()
