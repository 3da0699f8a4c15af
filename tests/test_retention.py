"""WAL retention (footer-stat pruning), consumer-lag report, and
streaming-integrated change-feed publication."""

from __future__ import annotations

import os
import shutil

import pandas as pd

from etl_spark.cdc import ChangelogSpec, generate_changelog, write_changelog
from etl_spark.cdc.changelog import TRANSCRIPTS_SCHEMA, expected_final_state
from etl_spark.cdc.retention import lag_report, prune_wal, wal_segment_stats
from etl_spark.cdc.state import WatermarkStore
from etl_spark.lake import LakeTable
from etl_spark.streaming import CdcStream

SPEC = ChangelogSpec(
    n_conversations=50, max_turns=5, churn=1.5, n_partitions=3,
    segments_per_partition=3,
)


def make_target(spark, tmp_path, name="transcripts"):
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


def test_segment_stats_match_data(tmp_path):
    pdf = generate_changelog(SPEC)
    wal = str(tmp_path / "wal")
    write_changelog(pdf, wal, SPEC)
    stats = wal_segment_stats(wal)
    assert len(stats) == SPEC.n_partitions * SPEC.segments_per_partition
    by_part = pdf.groupby("source_partition")["lsn"]
    got = {}
    for s in stats:
        lo, hi, n = got.get(s.partition, (s.min_lsn, s.max_lsn, 0))
        got[s.partition] = (min(lo, s.min_lsn), max(hi, s.max_lsn), n + s.rows)
    for p, (lo, hi, n) in got.items():
        grp = by_part.get_group(p)
        assert (lo, hi, n) == (grp.min(), grp.max(), len(grp))


def test_prune_after_full_replay_then_resume(spark, tmp_path):
    """Fully-applied segments archive away (keep_last newest survives per
    partition); a restarted stream over the pruned WAL applies nothing;
    fresh segments still apply and the state equals the FULL-log oracle."""
    pdf = generate_changelog(SPEC)
    cut = int(len(pdf) * 0.7)
    early, late = pdf[pdf["_seq"] < cut], pdf[pdf["_seq"] >= cut]
    wal = str(tmp_path / "wal")
    spec_flat = ChangelogSpec(**{**SPEC.__dict__, "evolution_cutover": 0.0})
    write_changelog(early, wal, spec_flat)
    table = make_target(spark, tmp_path)
    state = str(tmp_path / "state")
    CdcStream(spark, wal, table, state).run_to_completion()

    wm = WatermarkStore(os.path.join(state, "watermarks"))
    archive = str(tmp_path / "cold")
    dry = prune_wal(wal, wm, archive_dir=archive, dry_run=True)
    assert dry["pruned_segments"] > 0
    assert wal_segment_stats(wal)  # dry run moved nothing

    res = prune_wal(wal, wm, archive_dir=archive)
    assert res["pruned_paths"] == dry["pruned_paths"]
    left = wal_segment_stats(wal)
    # keep_last=1 newest segment per partition survives
    assert len(left) == SPEC.n_partitions
    per_part_max = {s.partition: s.max_lsn for s in left}
    for s in res["pruned_paths"]:
        assert not os.path.exists(s)
    # archive preserves the relative layout (replayable cold storage)
    assert wal_segment_stats(archive)
    # survivors are each partition's NEWEST segment
    for p, segs in pd.DataFrame(
        [(s.partition, s.max_lsn) for s in wal_segment_stats(archive)],
        columns=["p", "hi"],
    ).groupby("p"):
        assert per_part_max[p] > segs["hi"].max()

    # resume over the pruned WAL: nothing reprocessed
    s2 = CdcStream(spark, wal, table, state)
    s2.run_to_completion()
    assert sum(
        s["rows_in"] for s in s2.batch_stats if not s.get("skipped")
    ) == 0
    assert_converged(table, early)

    # fresh segments land; resume applies exactly them
    write_changelog(late, str(tmp_path / "wal2"), spec_flat)
    for root, _d, names in os.walk(str(tmp_path / "wal2")):
        for n in names:
            rel = os.path.relpath(root, str(tmp_path / "wal2"))
            os.makedirs(os.path.join(wal, rel), exist_ok=True)
            shutil.move(
                os.path.join(root, n), os.path.join(wal, rel, "late-" + n)
            )
    s3 = CdcStream(spark, wal, table, state)
    s3.run_to_completion()
    assert sum(
        s["rows_in"] for s in s3.batch_stats if not s.get("skipped")
    ) == len(late)
    assert_converged(table, pdf)


def test_prune_holds_segments_for_lagging_consumer(tmp_path):
    """A stalled partition watermark pins that partition's segments."""
    pdf = generate_changelog(SPEC)
    wal = str(tmp_path / "wal")
    write_changelog(pdf, wal, SPEC)
    maxes = pdf.groupby("source_partition")["lsn"].max().to_dict()
    wm = {p: int(m) for p, m in maxes.items()}
    wm[0] = -1  # partition 0's consumer never applied anything
    res = prune_wal(wal, wm, keep_last=0, dry_run=True)
    pruned_parts = {
        int(path.split("source_partition=")[1].split(os.sep)[0])
        for path in res["pruned_paths"]
    }
    assert pruned_parts == {1, 2}  # partition 0 held for its consumer


def test_lag_report_counts_pending(tmp_path):
    """lag_lsns is exact under contiguous LSNs; row bounds bracket the
    true pending count computed from the raw frame."""
    pdf = generate_changelog(SPEC)
    wal = str(tmp_path / "wal")
    write_changelog(pdf, wal, SPEC)
    # watermark = each partition's median LSN (mid-segment on purpose)
    med = pdf.groupby("source_partition")["lsn"].median().astype(int).to_dict()
    rep = {r["source_partition"]: r for r in lag_report(wal, med)}
    for p, grp in pdf.groupby("source_partition"):
        true_pending = int((grp["lsn"] > med[p]).sum())
        r = rep[p]
        assert r["applied_lsn"] == med[p]
        assert r["max_wal_lsn"] == grp["lsn"].max()
        assert r["lag_lsns"] == grp["lsn"].max() - med[p]
        assert r["pending_rows_min"] <= true_pending <= r["pending_rows_max"]
    # unseen partition -> everything pending
    rep0 = {r["source_partition"]: r for r in lag_report(wal, {})}
    for p, grp in pdf.groupby("source_partition"):
        assert rep0[p]["pending_rows_min"] == len(grp)


def test_stream_publishes_change_feed(spark, tmp_path):
    """CdcStream(replicate_to=...) publishes one export window per applied
    batch; a replica tailing the feed converges to the primary's state."""
    from etl_spark.lake.export import replicate_available

    pdf = generate_changelog(SPEC)
    wal = str(tmp_path / "wal")
    write_changelog(pdf, wal, SPEC)
    table = make_target(spark, tmp_path)
    feed = str(tmp_path / "feed")
    stream = CdcStream(
        spark, wal, table, str(tmp_path / "state"),
        max_files_per_trigger=4, replicate_to=feed,
    )
    stats = stream.run_to_completion()
    applied = [s for s in stats if not s.get("skipped")]
    assert all(not s["export"]["skipped"] for s in applied)
    segs = [n for n in os.listdir(feed) if n.startswith("seg-")]
    assert len(segs) == len(applied)

    replica = make_target(spark, tmp_path, name="replica")
    applied_stats = replicate_available(
        spark, feed, replica, str(tmp_path / "rep-state"),
        payload_schema=table.schema,
    )
    assert len(applied_stats) == len(segs)
    assert_converged(replica, pdf)


def test_stream_publication_with_compaction_cadence(spark, tmp_path):
    """replicate_to + compact_every together: maintenance commits advance
    the export cursor immediately (zero-cost skip), so no data window
    ever mixes with a compaction, and the replica still converges."""
    from etl_spark.lake.export import replicate_available

    pdf = generate_changelog(SPEC)
    wal = str(tmp_path / "wal")
    write_changelog(pdf, wal, SPEC)
    table = make_target(spark, tmp_path)
    feed = str(tmp_path / "feed")
    stream = CdcStream(
        spark, wal, table, str(tmp_path / "state"),
        max_files_per_trigger=3, replicate_to=feed, compact_every=2,
    )
    stats = stream.run_to_completion()
    maint = [
        s["export_after_maintenance"]
        for s in stats if "export_after_maintenance" in s
    ]
    assert maint and all(m["skipped"] and m.get("maintenance_only") for m in maint)

    replica = make_target(spark, tmp_path, name="replica")
    replicate_available(
        spark, feed, replica, str(tmp_path / "rep-state"),
        payload_schema=table.schema,
    )
    assert_converged(replica, pdf)
