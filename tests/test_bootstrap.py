"""Fuzzy-snapshot bootstrap + WAL handoff (cdc.bootstrap): convergence for
randomized per-key read points, overlap replay accounting, idempotence,
crash-replay safety."""

from __future__ import annotations

import os
import zlib

import numpy as np
import pandas as pd
import pytest

from etl_spark.cdc import ChangelogSpec, generate_changelog, write_changelog
from etl_spark.cdc.bootstrap import bootstrap_from_snapshot
from etl_spark.cdc.changelog import TRANSCRIPTS_SCHEMA, expected_final_state
from etl_spark.lake import LakeTable
from etl_spark.streaming import CdcStream

SPEC = ChangelogSpec(
    n_conversations=60, max_turns=5, churn=2.0, p_delete=0.18,
    p_reinsert=0.08, n_partitions=3, segments_per_partition=4, seed=11,
)


def fuzzy_snapshot(pdf: pd.DataFrame, read_seed: int):
    """Simulate a non-locking snapshot read while the WAL keeps writing:
    every key is read at its OWN point r in the snapshot window
    [start_p, end_p] (start = 40%, end = 70% of each partition's LSNs),
    r drawn from a stable per-key hash. Returns (snapshot_rows frame with
    the table's payload columns, start_lsns dict) — exactly what a DMS/
    Debezium-style full load hands to the CDC attach step."""
    hi = pdf.groupby("source_partition")["lsn"].max()
    start = {int(p): int(m * 0.4) for p, m in hi.items()}
    end = {int(p): int(m * 0.7) for p, m in hi.items()}

    d = pdf.copy()
    keyhash = d.apply(
        lambda r: zlib.crc32(
            f"{r['conv_id']}:{r['turn_idx']}:{read_seed}".encode()
        ),
        axis=1,
    )
    span = d["source_partition"].map(
        {p: end[p] - start[p] + 1 for p in start}
    )
    base = d["source_partition"].map(start)
    d["_r"] = base + (keyhash % span)
    # state as of the per-key read LSN: within a partition lsn order is
    # the (ts, lsn) LWW order, so "last event with lsn <= r" IS the row
    # the snapshot read would have returned
    seen = (
        d[d["lsn"] <= d["_r"]]
        .sort_values(["source_partition", "lsn"])
        .drop_duplicates(subset=["conv_id", "turn_idx"], keep="last")
    )
    snap = seen[seen["op"] != "D"][
        ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    ].reset_index(drop=True)
    return snap, start


def make_target(spark, tmp_path, name="t"):
    return LakeTable.create(
        spark, str(tmp_path / name), TRANSCRIPTS_SCHEMA,
        key=["conv_id", "turn_idx"], n_buckets=8, bucket_by=["conv_id"],
    )


def assert_converged(table, pdf):
    got = (
        table.read().orderBy("conv_id", "turn_idx").toPandas()
        [["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
        .reset_index(drop=True)
    )
    exp = expected_final_state(pdf).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


@pytest.mark.parametrize("read_seed", [1, 2])
def test_fuzzy_snapshot_bootstrap_converges(spark, tmp_path, read_seed):
    """Bootstrap from a snapshot whose per-key read points are scattered
    across the window, attach the stream at the snapshot-START position,
    replay: the converged table must equal the full-log LWW oracle — the
    overlap window (reads racing writes) is absorbed, keys inserted or
    deleted DURING the snapshot included. Parameterized over read-point
    seeds: convergence must hold for any interleaving."""
    pdf = generate_changelog(SPEC)
    snap, start_lsns = fuzzy_snapshot(pdf, read_seed)
    # the window is non-degenerate: some keys the snapshot holds get
    # overlap churn, some keys are born after their read point
    overlap = pdf[pdf["lsn"] > pdf["source_partition"].map(start_lsns)]
    assert 0 < len(overlap) < len(pdf)

    wal = str(tmp_path / "wal")
    write_changelog(pdf, wal, SPEC)
    table = make_target(spark, tmp_path)
    state_dir = str(tmp_path / "state")

    snap_df = spark.createDataFrame(snap, schema=TRANSCRIPTS_SCHEMA)
    stats = bootstrap_from_snapshot(
        spark, snap_df, table, state_dir, start_lsns=start_lsns
    )
    assert not stats["skipped"]
    assert stats["rows_applied"] == len(snap)

    stream = CdcStream(spark, wal, table, state_dir, max_files_per_trigger=3)
    bstats = stream.run_to_completion()
    assert_converged(table, pdf)

    # handoff accounting: the stream processed EXACTLY the events after
    # the snapshot-start position — nothing before (skipped by the seeded
    # watermarks), nothing missed
    rows_in = sum(s["rows_in"] for s in bstats if not s.get("skipped"))
    assert rows_in == len(overlap)


def test_bootstrap_rerun_is_noop(spark, tmp_path):
    pdf = generate_changelog(SPEC)
    snap, start_lsns = fuzzy_snapshot(pdf, read_seed=3)
    table = make_target(spark, tmp_path)
    state_dir = str(tmp_path / "state")
    snap_df = spark.createDataFrame(snap, schema=TRANSCRIPTS_SCHEMA)

    first = bootstrap_from_snapshot(
        spark, snap_df, table, state_dir, start_lsns=start_lsns
    )
    v1 = table.current_version()
    again = bootstrap_from_snapshot(
        spark, snap_df, table, state_dir, start_lsns=start_lsns
    )
    assert first["rows_applied"] == len(snap)
    assert again["skipped"] and again["rows_applied"] == 0
    assert table.current_version() == v1


def test_bootstrap_crash_before_marker_replays_safely(spark, tmp_path):
    """Crash between the snapshot MERGE and the bootstrap marker: the
    re-run re-merges the same snapshot (idempotent — zero state change)
    and the attached stream still converges with no duplicates."""
    pdf = generate_changelog(SPEC)
    snap, start_lsns = fuzzy_snapshot(pdf, read_seed=4)
    wal = str(tmp_path / "wal")
    write_changelog(pdf, wal, SPEC)
    table = make_target(spark, tmp_path)
    state_dir = str(tmp_path / "state")
    snap_df = spark.createDataFrame(snap, schema=TRANSCRIPTS_SCHEMA)

    bootstrap_from_snapshot(
        spark, snap_df, table, state_dir, start_lsns=start_lsns
    )
    # simulate the crash: the MERGE + watermarks landed, the marker didn't
    commits = os.path.join(state_dir, "commits")
    for n in os.listdir(commits):
        if "bootstrap" in n:
            os.remove(os.path.join(commits, n))
    redo = bootstrap_from_snapshot(
        spark, snap_df, table, state_dir, start_lsns=start_lsns
    )
    assert not redo["skipped"]
    got = table.read().toPandas()
    assert len(got) == len(snap)
    assert got.duplicated(subset=["conv_id", "turn_idx"]).sum() == 0

    CdcStream(spark, wal, table, state_dir).run_to_completion()
    assert_converged(table, pdf)


def test_bootstrap_retried_snapshot_chunk_collapses(spark, tmp_path):
    """A retried snapshot chunk (duplicate key rows in the snapshot frame)
    collapses through the LWW dedup instead of failing the MERGE."""
    pdf = generate_changelog(SPEC)
    snap, start_lsns = fuzzy_snapshot(pdf, read_seed=5)
    dup = pd.concat([snap, snap.head(25)], ignore_index=True)
    table = make_target(spark, tmp_path)
    snap_df = spark.createDataFrame(dup, schema=TRANSCRIPTS_SCHEMA)
    stats = bootstrap_from_snapshot(
        spark, snap_df, table, str(tmp_path / "state"),
        start_lsns=start_lsns,
    )
    assert stats["rows_applied"] == len(snap)
    assert table.read().count() == len(snap)
