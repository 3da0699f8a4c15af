"""CDC core: generator determinism, LWW dedup, batch replay vs oracle."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from etl_spark.cdc import (
    CHANGELOG_SCHEMA,
    TRANSCRIPTS_SCHEMA,
    ChangelogSpec,
    generate_changelog,
    replay,
)
from etl_spark.cdc.apply import apply_batch, dedup_last_writer_wins
from etl_spark.cdc.changelog import expected_final_state
from etl_spark.lake import LakeTable

SPEC = ChangelogSpec(n_conversations=60, max_turns=6, churn=2.0, n_partitions=3)


def changelog_sdf(spark, pdf):
    return spark.createDataFrame(pdf.drop(columns=["_seq"]), CHANGELOG_SCHEMA)


def make_target(spark, tmp_path, n_buckets=8):
    return LakeTable.create(
        spark,
        str(tmp_path / "transcripts"),
        TRANSCRIPTS_SCHEMA,
        key=["conv_id", "turn_idx"],
        n_buckets=n_buckets,
        bucket_by=["conv_id"],
    )


def assert_state_equals_oracle(table, oracle: pd.DataFrame):
    got = (
        table.read()
        .orderBy("conv_id", "turn_idx")
        .toPandas()[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
        .reset_index(drop=True)
    )
    exp = oracle.reset_index(drop=True)
    exp["tool"] = exp["tool"].where(pd.notna(exp["tool"]), None)
    got["tool"] = got["tool"].where(pd.notna(got["tool"]), None)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_generator_deterministic_and_shaped():
    a = generate_changelog(SPEC)
    b = generate_changelog(SPEC)
    pd.testing.assert_frame_equal(a, b)
    assert set(a["op"].unique()) <= {"I", "U", "D"}
    # lsn strictly monotonic per partition
    for _, g in a.groupby("source_partition"):
        assert (g["lsn"].to_numpy() == range(len(g))).all()
    # deliberate ts collisions exist (forces lsn tiebreak)
    assert a.duplicated(subset=["ts"]).any()
    # deletes carry null payload
    assert a.loc[a.op == "D", "text"].isna().all()
    # schema evolution: tool appears only late in the stream
    early = a[a["_seq"] < len(a) * 0.4]
    assert early["tool"].isna().all()
    assert a["tool"].notna().any()


def test_dedup_lww_basic(spark):
    pdf = generate_changelog(SPEC)
    sdf = changelog_sdf(spark, pdf)
    out = dedup_last_writer_wins(sdf).toPandas()
    assert not out.duplicated(subset=["conv_id", "turn_idx"]).any()
    # cross-check winner selection against pandas argmax on (ts,lsn,partition)
    exp = pdf.sort_values(["ts", "lsn", "source_partition"]).drop_duplicates(
        subset=["conv_id", "turn_idx"], keep="last"
    )
    m = out.merge(exp, on=["conv_id", "turn_idx"], suffixes=("", "_e"))
    assert len(m) == len(exp)
    assert (m["lsn"] == m["lsn_e"]).all()
    assert (m["op"] == m["op_e"]).all()


def test_dedup_salted_equals_unsalted(spark):
    sdf = changelog_sdf(spark, generate_changelog(SPEC))
    a = dedup_last_writer_wins(sdf, salted=False).orderBy("conv_id", "turn_idx")
    b = dedup_last_writer_wins(sdf, salted=True).orderBy("conv_id", "turn_idx")
    assert a.collect() == b.collect()


def test_bulk_replay_matches_oracle(spark, tmp_path):
    pdf = generate_changelog(SPEC)
    table = make_target(spark, tmp_path)
    stats = replay(spark, changelog_sdf(spark, pdf), table)
    assert stats["table_version"] == 1
    assert_state_equals_oracle(table, expected_final_state(pdf))


def test_incremental_batches_match_oracle(spark, tmp_path):
    """Split the log into 5 LSN-ordered chunks, apply incrementally: final
    state must equal the bulk oracle (per-turn text equality under stable
    (conv_id, turn_idx) ordering — the north-rule invariant)."""
    pdf = generate_changelog(SPEC)
    table = make_target(spark, tmp_path)
    ordered = pdf.sort_values("_seq")
    n = len(ordered)
    bounds = [0, n // 5, 2 * n // 5, 3 * n // 5, 4 * n // 5, n]
    for i in range(5):
        chunk = ordered.iloc[bounds[i]:bounds[i + 1]]
        apply_batch(spark, changelog_sdf(spark, chunk), table, batch_id=i)
    assert_state_equals_oracle(table, expected_final_state(pdf))


def test_apply_batch_idempotent_replay(spark, tmp_path):
    from etl_spark.cdc.state import CommitLog

    pdf = generate_changelog(SPEC)
    table = make_target(spark, tmp_path)
    log = CommitLog(str(tmp_path / "commits"))
    sdf = changelog_sdf(spark, pdf)
    s1 = apply_batch(spark, sdf, table, batch_id=0, commit_log=log)
    assert not s1["skipped"]
    v = table.current_version()
    s2 = apply_batch(spark, sdf, table, batch_id=0, commit_log=log)
    assert s2["skipped"]
    assert table.current_version() == v  # no new snapshot
    assert_state_equals_oracle(table, expected_final_state(pdf))


def test_watermark_filter_drops_applied_events(spark, tmp_path):
    from etl_spark.cdc.state import WatermarkStore, filter_by_watermarks

    pdf = generate_changelog(SPEC)
    sdf = changelog_sdf(spark, pdf)
    wm = WatermarkStore(str(tmp_path / "wm"))
    wm.advance({0: 50, 1: 10})
    out = filter_by_watermarks(sdf, wm.get_all())
    rem = out.groupBy("source_partition").agg(F.min("lsn").alias("lo")).collect()
    lows = {r["source_partition"]: r["lo"] for r in rem}
    assert lows[0] == 51 and lows[1] == 11
    assert lows[2] == 0  # unwatermarked partition untouched
    # monotonic advance never regresses
    wm.advance({0: 20})
    assert wm.get_all()[0] == 50


def test_dead_letter_split(spark, tmp_path):
    import numpy as np

    pdf = generate_changelog(SPEC)
    bad = pdf.head(3).copy()
    bad["op"] = "X"  # unknown op -> dead letter
    mixed = pd.concat([pdf, bad], ignore_index=True)
    table = make_target(spark, tmp_path)
    dl_dir = str(tmp_path / "dead")
    stats = apply_batch(
        spark, changelog_sdf(spark, mixed), table, batch_id=0,
        dead_letter_dir=dl_dir,
    )
    assert stats["rows_failed"] == 3
    dead = spark.read.parquet(dl_dir)
    assert dead.count() == 3
    assert set(dead.select("error").distinct().toPandas()["error"]) == {"op_known"}
    assert_state_equals_oracle(table, expected_final_state(pdf))


def test_rows_applied_is_post_dedup(spark, tmp_path):
    """In-batch duplicates must not inflate rows_applied: the metric is the
    post-dedup (distinct-key) count observed on the merge-write job, on
    both the bootstrap path and the anti-join path."""
    pdf = generate_changelog(SPEC)
    table = make_target(spark, tmp_path)
    sdf = changelog_sdf(spark, pdf)
    n_keys = (
        sdf.filter(F.col("conv_id").isNotNull())
        .select("conv_id", "turn_idx").distinct().count()
    )
    # bootstrap: empty table, no anti-join
    s1 = apply_batch(spark, sdf, table, batch_id=0)
    assert s1["rows_in"] == len(pdf)
    assert s1["rows_applied"] < s1["rows_in"]  # churn=2.0 guarantees dups
    # applied = post-dedup distinct keys (upserts + delete events), exact
    # from the origin-partitioned write footers
    assert s1["rows_applied"] == n_keys
    n_final = table.row_count()
    assert s1["rows_upserted"] == n_final
    assert s1["rows_deleted"] == n_keys - n_final
    # incremental: same batch again against non-empty table -> anti-join
    # path; same accounting
    s2 = apply_batch(spark, sdf, table, batch_id=1)
    assert s2["rows_applied"] == n_keys
    assert table.row_count() == n_final  # idempotent on converged state


def test_key_rewriting_transform_needs_flag_false(spark, tmp_path):
    """A transform that REWRITES a bucket-key column must run with
    transform_preserves_keys_and_validity=False so the affected-bucket set
    is computed post-transform; the converged table then has no duplicate
    keys even across two batches that remap the same keys."""
    pdf = generate_changelog(SPEC)
    table = make_target(spark, tmp_path)

    def remap_keys(df):
        return df.withColumn("conv_id", F.concat(F.lit("t-"), F.col("conv_id")))

    sdf = changelog_sdf(spark, pdf)
    half = len(pdf) // 2
    b0 = changelog_sdf(spark, pdf.iloc[:half])
    b1 = changelog_sdf(spark, pdf.iloc[half:])
    apply_batch(
        spark, b0, table, batch_id=0, transform=remap_keys,
        transform_preserves_keys_and_validity=False,
    )
    apply_batch(
        spark, b1, table, batch_id=1, transform=remap_keys,
        transform_preserves_keys_and_validity=False,
    )
    got = table.read()
    assert got.count() == got.select("conv_id", "turn_idx").distinct().count()
    exp = expected_final_state(pdf)
    exp = exp.assign(conv_id="t-" + exp["conv_id"])
    assert_state_equals_oracle(table, exp)


def test_dead_letter_write_is_idempotent_per_batch(spark, tmp_path):
    """Replaying the same batch id (retry after a mid-apply crash, before
    the commit marker) must not duplicate dead-letter rows."""
    pdf = generate_changelog(SPEC)
    bad = pdf.head(4).copy()
    bad["op"] = "X"
    mixed = pd.concat([pdf, bad], ignore_index=True)
    table = make_target(spark, tmp_path)
    dl = str(tmp_path / "dead")
    apply_batch(spark, changelog_sdf(spark, mixed), table, batch_id=0,
                dead_letter_dir=dl)
    # simulate retry of the same batch (no commit log -> reruns fully)
    apply_batch(spark, changelog_sdf(spark, mixed), table, batch_id=0,
                dead_letter_dir=dl)
    dead = spark.read.option("basePath", dl).parquet(dl)
    assert dead.count() == 4  # not 8


def test_replay_dead_letters_recovers_fixed_rows(spark, tmp_path):
    from etl_spark.cdc.apply import replay_dead_letters

    pdf = generate_changelog(SPEC)
    # fixable: 4 GENUINELY NEW events (newest per key) that a defect
    # op-mangled upstream — recovery must land them in the table
    bad_op = pdf.head(4).copy()
    bad_op["op"] = "X"
    bad_op["ts"] = pdf["ts"].max() + pd.Timedelta(minutes=5)
    bad_op["lsn"] = pdf["lsn"].max() + 1 + pd.RangeIndex(4)
    bad_op["text"] = "RECOVERED " + bad_op["text"].fillna("")
    # stale duplicate of an ALREADY-APPLIED old event, also op-mangled:
    # the auto order guard must NOT let it clobber newer state. The key
    # must survive to the final state — the original apply was unguarded
    # (no tombstones), so a deleted key would legitimately resurrect.
    exp0 = expected_final_state(pdf)
    live_keys = set(zip(exp0["conv_id"], exp0["turn_idx"]))
    in_final = pdf.apply(
        lambda x: (x["conv_id"], x["turn_idx"]) in live_keys, axis=1
    )
    stale = pdf[in_final].head(1).copy()
    stale["op"] = "X"
    stale["text"] = "STALE"
    # unfixable: key is gone
    bad_key = pdf.head(2).copy()
    bad_key["conv_id"] = None
    mixed = pd.concat([pdf, bad_op, stale, bad_key], ignore_index=True)
    table = make_target(spark, tmp_path)
    dl_dir = str(tmp_path / "dead")
    stats = apply_batch(
        spark, changelog_sdf(spark, mixed), table, batch_id=0,
        dead_letter_dir=dl_dir,
    )
    assert stats["rows_failed"] == 7
    before = expected_final_state(pdf)

    fix = lambda df: df.withColumn(  # noqa: E731
        "op", F.when(F.col("op") == "X", "U").otherwise(F.col("op"))
    )
    r = replay_dead_letters(spark, dl_dir, table, fix=fix)
    assert r["rows_read"] == 7
    assert r["rows_still_failed"] == 2
    assert r["rows_recovered"] == 4  # the new events; the stale dup lost
    got = table.read().toPandas()
    assert (got["text"].str.startswith("RECOVERED")).sum() == 4
    assert not (got["text"] == "STALE").any()
    # every key the recovery didn't touch still matches the oracle
    recovered_keys = set(zip(bad_op["conv_id"], bad_op["turn_idx"]))
    untouched = got[~got.apply(
        lambda x: (x["conv_id"], x["turn_idx"]) in recovered_keys, axis=1
    )]
    exp_untouched = before[~before.apply(
        lambda x: (x["conv_id"], x["turn_idx"]) in recovered_keys, axis=1
    )]
    assert len(untouched) == len(exp_untouched)
    # recovered batches purged; only the requeued unfixables remain
    dead = spark.read.parquet(dl_dir)
    assert dead.count() == 2
    assert set(dead.toPandas()["error"]) == {"key_not_null"}
    # second replay with no fix: nothing recovers, nothing is lost
    r2 = replay_dead_letters(spark, dl_dir, table)
    assert r2["rows_read"] == 2
    assert r2["rows_recovered"] == 0
    assert r2["rows_still_failed"] == 2


def test_null_pred_rows_dead_letter_not_vanish(spark, tmp_path):
    """A row whose validator predicate evaluates to NULL (op IS NULL
    through isin's three-valued logic) must land in the FAILED split with
    accounting and a dead-letter record — without the totality coalesce
    it passes neither filter nor ~filter and silently vanishes."""
    pdf = generate_changelog(SPEC)
    bad = pdf.head(2).copy()
    bad["op"] = None  # op IS NULL -> op_known evaluates to NULL
    mixed = pd.concat([pdf, bad], ignore_index=True)
    table = make_target(spark, tmp_path)
    dl_dir = str(tmp_path / "dead")
    stats = apply_batch(
        spark, changelog_sdf(spark, mixed), table, batch_id=0,
        dead_letter_dir=dl_dir,
    )
    assert stats["rows_failed"] == 2
    assert stats["rows_in"] == len(pdf)
    dead = spark.read.parquet(dl_dir)
    assert dead.count() == 2
    assert set(dead.toPandas()["error"]) == {"op_known"}
    assert_state_equals_oracle(table, expected_final_state(pdf))


def test_replay_dead_letters_null_pred_rows_survive_purge(spark, tmp_path):
    """Rows still failing with a NULL verdict after fix() must be
    requeued by the purge, never deleted with the recovered batches."""
    from etl_spark.cdc.apply import replay_dead_letters

    pdf = generate_changelog(SPEC)
    bad = pdf.head(3).copy()
    bad["op"] = None
    mixed = pd.concat([pdf, bad], ignore_index=True)
    table = make_target(spark, tmp_path)
    dl_dir = str(tmp_path / "dead")
    apply_batch(
        spark, changelog_sdf(spark, mixed), table, batch_id=0,
        dead_letter_dir=dl_dir,
    )
    # no fix: the NULL-op rows still fail — purge must requeue all 3
    r = replay_dead_letters(spark, dl_dir, table)
    assert r["rows_read"] == 3
    assert r["rows_recovered"] == 0
    assert r["rows_still_failed"] == 3
    dead = spark.read.parquet(dl_dir)
    assert dead.count() == 3
    assert set(dead.toPandas()["error"]) == {"op_known"}


def test_all_failed_batch_records_metrics(spark, tmp_path):
    """A batch where every row fails validation must still write its
    per-partition rows_failed to the metrics table — that spike is
    exactly what monitoring needs to see."""
    from etl_spark.cdc.metrics import MetricsTable

    pdf = generate_changelog(SPEC).head(20).copy()
    pdf["op"] = "X"
    table = make_target(spark, tmp_path)
    metrics = MetricsTable(str(tmp_path / "metrics"))
    stats = apply_batch(
        spark, changelog_sdf(spark, pdf), table, batch_id=0,
        metrics=metrics, dead_letter_dir=str(tmp_path / "dead"),
    )
    assert stats["rows_in"] == 0 and stats["rows_failed"] == 20
    m = metrics.to_df(spark).toPandas()
    assert m["rows_failed"].sum() == 20
    assert (m["rows_in"] == 0).all()


def test_dedup_lww_requires_an_order_column(spark):
    """A frame carrying none of the order columns has no 'last writer' —
    must raise, not silently pick the lexicographically-max payload."""
    import pytest

    df = spark.createDataFrame(
        [("c1", 0, "user", "a"), ("c1", 0, "user", "b")],
        "conv_id string, turn_idx int, role string, text string",
    )
    with pytest.raises(ValueError, match="order_by"):
        dedup_last_writer_wins(df, key=["conv_id", "turn_idx"])
