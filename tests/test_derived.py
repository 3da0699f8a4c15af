"""Incremental materialized-view maintenance (etl_spark.lake.derived).

Every scenario drives a source LakeTable through a churn sequence
(inserts, value updates, group-moving updates, null-ing updates,
deletes, whole-group deletions) and asserts the incrementally-maintained
view equals a FULL RECOMPUTE of the same aggregate/transform over the
final source state — the defining invariant of view maintenance."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.lake import LakeTable
from etl_spark.lake.derived import IncrementalAggView, IncrementalRowView

SRC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("grp", T.StringType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def make_source(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "src"), SRC_SCHEMA, key=["id"], n_buckets=4
    )
    rows = [(i, f"g{i % 5}", float(i)) for i in range(40)]
    t.merge(
        spark.createDataFrame(rows, SRC_SCHEMA).withColumn("op", F.lit("U")),
        op_col="op",
    )
    return t


def churn(spark, src: LakeTable, view) -> None:
    """Apply a churn batch between refreshes: updates (same group),
    group-moving updates, update-to-NULL, deletes, and new inserts."""
    ops = T.StructType(list(SRC_SCHEMA.fields) + [T.StructField("op", T.StringType())])
    view.refresh()
    # value updates + a group-moving update + an update to NULL
    b1 = [
        (0, "g0", 100.0, "U"),          # value change, same group
        (1, "g3", 1.0, "U"),            # moves g1 -> g3
        (2, "g2", None, "U"),           # value -> NULL
        (40, "gNEW", 7.5, "U"),         # brand-new group
        (41, "g0", 2.5, "U"),           # insert into existing group
    ]
    src.merge(spark.createDataFrame(b1, ops), op_col="op")
    view.refresh()
    # deletes, including one that empties a group
    b2 = [
        (40, None, None, "D"),          # gNEW becomes empty -> view row gone
        (5, None, None, "D"),
        (3, "g3", 33.0, "U"),
    ]
    src.merge(spark.createDataFrame(b2, ops), op_col="op")
    view.refresh()


def full_recompute(src: LakeTable):
    """One-shot aggregate over the final source state, same exposure
    rules as IncrementalAggView.read()."""
    dec = "decimal(18,6)"
    return (
        src.read()
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("val").cast(dec)).cast("decimal(28,6)")
            .cast("double").alias("total"),
            (
                F.sum(F.col("val").cast(dec)).cast("decimal(28,6)")
                .cast("double") / F.count("val")
            ).alias("mean"),
        )
    )


AGGS = {"n": ("count", "*"), "total": ("sum", "val"), "mean": ("avg", "val")}


@pytest.mark.parametrize("strategy", ["delta", "rescan"])
def test_agg_view_tracks_full_recompute_through_churn(
    spark, tmp_path, strategy
):
    src = make_source(spark, tmp_path)
    view = IncrementalAggView(
        spark, str(tmp_path / f"v_{strategy}"), src,
        group_by=["grp"], aggs=AGGS, strategy=strategy,
    )
    assert view.strategy == strategy
    churn(spark, src, view)
    got = view.read().orderBy("grp").toPandas()
    exp = full_recompute(src).orderBy("grp").toPandas()
    pd.testing.assert_frame_equal(got, exp)
    # gNEW was created then emptied: no residual row
    assert "gNEW" not in set(got["grp"])


def test_delta_strategy_never_rescans_source(spark, tmp_path):
    """The whole point of delta maintenance: after the initial build, a
    refresh must not read the source table's data files at all — only
    the change feed (two bounded snapshots) and the view's own state."""
    src = make_source(spark, tmp_path)
    view = IncrementalAggView(
        spark, str(tmp_path / "v"), src, group_by=["grp"], aggs=AGGS,
        strategy="delta",
    )
    view.refresh()
    ops = T.StructType(list(SRC_SCHEMA.fields) + [T.StructField("op", T.StringType())])
    src.merge(
        spark.createDataFrame([(0, "g0", 9.9, "U")], ops), op_col="op"
    )
    # the delta pipeline reads ONLY the change feed (bucket-pruned
    # manifest entries of the two endpoint snapshots via _read_files) —
    # a call to source.read() would mean a full-table rescan
    seen = []
    orig = src.read

    def spy(version=None):
        seen.append(version)
        return orig(version)

    src.read = spy
    try:
        view.refresh()
    finally:
        src.read = orig
    assert seen == []


def test_change_feed_is_bucket_pruned(spark, tmp_path):
    """Copy-on-write lineage: a churn batch confined to a few buckets
    must produce a change feed that SCANS only those buckets' files —
    the property that keeps view refresh O(churn) on a 100 TB table."""
    t = LakeTable.create(
        spark, str(tmp_path / "p"), SRC_SCHEMA, key=["id"], n_buckets=16
    )
    ops = T.StructType(list(SRC_SCHEMA.fields) + [T.StructField("op", T.StringType())])
    t.merge(
        spark.createDataFrame(
            [(i, f"g{i % 5}", float(i), "U") for i in range(2000)], ops
        ),
        op_col="op",
    )
    v0 = t.current_version()
    t.merge(spark.createDataFrame([(7, "g7", 1.0, "U")], ops), op_col="op")
    ch = t.table_changes(v0)
    full_files = len(t.read().inputFiles())
    ch_files = len(ch.inputFiles())
    # one changed key -> one rewritten bucket -> the diff reads that
    # bucket's old + new file, not 2 x 16 buckets
    assert ch_files <= 4 < full_files
    rows = ch.collect()
    assert len(rows) == 1 and rows[0]["id"] == 7


def test_refresh_is_idempotent_and_watermarked(spark, tmp_path):
    src = make_source(spark, tmp_path)
    view = IncrementalAggView(
        spark, str(tmp_path / "v"), src, group_by=["grp"], aggs=AGGS,
    )
    r1 = view.refresh()
    assert not r1["no_op"] and r1["refreshed_through"] == src.current_version()
    before = view.read().orderBy("grp").toPandas()
    r2 = view.refresh()  # nothing changed upstream
    assert r2["no_op"]
    # a source maintenance commit with zero logical changes advances the
    # watermark with a metadata-only tag, not a data rewrite
    src.compact()
    r3 = view.refresh()
    assert not r3["no_op"] and r3["groups_updated"] == 0
    assert view.last_applied() == src.current_version()
    after = view.read().orderBy("grp").toPandas()
    pd.testing.assert_frame_equal(before, after)


def test_rescan_minmax_with_retraction_of_extremes(spark, tmp_path):
    """Deleting the row holding a group's max is exactly what delta
    maintenance cannot do — the rescan strategy must recompute it."""
    src = make_source(spark, tmp_path)
    view = IncrementalAggView(
        spark, str(tmp_path / "v"), src, group_by=["grp"],
        aggs={"lo": ("min", "val"), "hi": ("max", "val"),
              "n_distinct": ("expr", "count(DISTINCT val)")},
    )
    assert view.strategy == "rescan"
    view.refresh()
    # id=39 is the max of g4 (val=39.0); delete it
    ops = T.StructType(list(SRC_SCHEMA.fields) + [T.StructField("op", T.StringType())])
    src.merge(spark.createDataFrame([(39, None, None, "D")], ops), op_col="op")
    view.refresh()
    got = {r["grp"]: (r["lo"], r["hi"], r["n_distinct"])
           for r in view.read().collect()}
    exp = {r["grp"]: (r["lo"], r["hi"], r["n_distinct"])
           for r in src.read().groupBy("grp").agg(
               F.min("val").alias("lo"), F.max("val").alias("hi"),
               F.count_distinct("val").alias("n_distinct")).collect()}
    assert got == exp
    assert got["g4"][1] == 34.0  # new max after retracting 39.0


def test_reopen_with_changed_definition_rejected(spark, tmp_path):
    src = make_source(spark, tmp_path)
    IncrementalAggView(
        spark, str(tmp_path / "v"), src, group_by=["grp"], aggs=AGGS,
    ).refresh()
    with pytest.raises(ValueError, match="different\\s+definition"):
        IncrementalAggView(
            spark, str(tmp_path / "v"), src, group_by=["grp"],
            aggs={"n": ("count", "*")},
        )


def test_delta_rejects_minmax(spark, tmp_path):
    src = make_source(spark, tmp_path)
    with pytest.raises(ValueError, match="not self-maintainable"):
        IncrementalAggView(
            spark, str(tmp_path / "v"), src, group_by=["grp"],
            aggs={"hi": ("max", "val")}, strategy="delta",
        )


def test_row_view_filter_membership_changes(spark, tmp_path):
    """An update can move a row OUT of the view's filter (must delete)
    and back IN (must reinsert); source deletes propagate."""
    src = make_source(spark, tmp_path)

    def transform(df):
        return df.filter(F.col("val") >= 10.0).select(
            "id", "grp",
            (F.col("val") * 2).alias("doubled"),
            F.upper("grp").alias("grp_uc"),
        )

    view = IncrementalRowView(spark, str(tmp_path / "rv"), src, transform)
    view.refresh()
    assert view.read().count() == 30  # ids 10..39

    ops = T.StructType(list(SRC_SCHEMA.fields) + [T.StructField("op", T.StringType())])
    src.merge(
        spark.createDataFrame(
            [
                (15, "g0", 3.0, "U"),    # moves below the filter -> delete
                (2, "g2", 50.0, "U"),    # moves above -> insert
                (20, None, None, "D"),   # source delete -> view delete
                (21, "g1", 84.0, "U"),   # stays in, value changes
            ],
            ops,
        ),
        op_col="op",
    )
    r = view.refresh()
    assert not r["no_op"]
    got = view.read().orderBy("id").toPandas()
    exp = (
        transform(src.read()).orderBy("id").toPandas()
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )
    ids = set(got["id"])
    assert 15 not in ids and 2 in ids and 20 not in ids
    assert got.loc[got["id"] == 21, "doubled"].iloc[0] == 168.0
    # idempotent: second refresh is a no-op with identical state
    assert view.refresh()["no_op"]


def test_row_view_requires_key_preserving_transform(spark, tmp_path):
    src = make_source(spark, tmp_path)
    with pytest.raises(ValueError, match="preserve the source key"):
        IncrementalRowView(
            spark, str(tmp_path / "rv"), src,
            lambda df: df.select("grp", "val"),
        )


def test_row_view_rejects_redefinition_at_same_path(spark, tmp_path):
    """Reopening a materialized row view with a transform that changes
    the output columns must raise, never silently mix two definitions'
    rows in one state table (same guard as the agg view)."""
    src = make_source(spark, tmp_path)
    IncrementalRowView(
        spark, str(tmp_path / "rv"), src,
        lambda df: df.select("id", "grp", (F.col("val") * 2).alias("d")),
    ).refresh()
    with pytest.raises(ValueError, match="different transform"):
        IncrementalRowView(
            spark, str(tmp_path / "rv"), src,
            lambda df: df.select("id", "grp", (F.col("val") * 2).alias("e")),
        )
    # same names but an incompatible type change is also a redefinition
    with pytest.raises(ValueError, match="different transform"):
        IncrementalRowView(
            spark, str(tmp_path / "rv"), src,
            lambda df: df.select("id", "grp", F.col("grp").alias("d")),
        )
    # identical definition reopens fine and is a refresh no-op
    again = IncrementalRowView(
        spark, str(tmp_path / "rv"), src,
        lambda df: df.select("id", "grp", (F.col("val") * 2).alias("d")),
    )
    assert again.refresh()["no_op"]


def test_row_view_reopens_after_source_evolution(spark, tmp_path):
    """Source schema evolution (appended column) must NOT trip the
    redefinition guard on a restart: the identity-ish transform's output
    gains the column, the stored view schema doesn't have it yet, and
    refresh() evolves the view through the merge."""
    src = make_source(spark, tmp_path)
    transform = lambda df: df  # noqa: E731
    IncrementalRowView(spark, str(tmp_path / "rv"), src, transform).refresh()
    evolved = T.StructType(
        list(SRC_SCHEMA.fields) + [T.StructField("note", T.StringType())]
    )
    src.append(
        spark.createDataFrame([(900, "g9", 1.5, "hello")], evolved)
    )
    # fresh construction (process restart): stored cols are a strict
    # subset of the new output — allowed, and refresh converges
    view = IncrementalRowView(spark, str(tmp_path / "rv"), src, transform)
    r = view.refresh()
    assert not r["no_op"]
    got = view.read()
    assert "note" in got.columns
    assert got.filter(F.col("id") == 900).first()["note"] == "hello"


def test_view_self_heals_after_source_snapshot_expiry(spark, tmp_path):
    """A view lagging past the source's snapshot retention cannot diff
    incrementally — refresh must fall back to ONE bounded full rebuild
    (atomic overwrite carrying the watermark) and converge."""
    src = make_source(spark, tmp_path)
    view = IncrementalAggView(
        spark, str(tmp_path / "v"), src, group_by=["grp"], aggs=AGGS,
        strategy="delta",
    )
    view.refresh()
    ops = T.StructType(list(SRC_SCHEMA.fields) + [T.StructField("op", T.StringType())])
    for i in range(3):  # source races ahead while the view lags
        src.merge(
            spark.createDataFrame([(i, f"g{i}", 500.0 + i, "U")], ops),
            op_col="op",
        )
    src.expire_snapshots(keep_last=1)  # the view's watermark is now gone
    r = view.refresh()
    assert r.get("rebuilt") and not r["no_op"]
    assert view.last_applied() == src.current_version()
    got = view.read().orderBy("grp").toPandas()
    exp = full_recompute(src).orderBy("grp").toPandas()
    pd.testing.assert_frame_equal(got, exp)
    # and the view is incremental again afterwards
    src.merge(spark.createDataFrame([(0, "g0", 1.0, "U")], ops), op_col="op")
    r2 = view.refresh()
    assert not r2.get("rebuilt") and r2["groups_updated"] == 1
    pd.testing.assert_frame_equal(
        view.read().orderBy("grp").toPandas(),
        full_recompute(src).orderBy("grp").toPandas(),
    )


def test_streaming_cadence_refreshes_views(spark, tmp_path):
    """CdcStream(views=[...]) keeps downstream materialized views
    converged with the streamed table as part of the maintenance
    cadence."""
    from etl_spark.cdc import ChangelogSpec, generate_changelog, write_changelog
    from etl_spark.cdc.changelog import TRANSCRIPTS_SCHEMA
    from etl_spark.streaming import CdcStream

    spec = ChangelogSpec(
        n_conversations=30, max_turns=4, churn=1.5, n_partitions=2,
        segments_per_partition=2,
    )
    pdf = generate_changelog(spec)
    wal = str(tmp_path / "wal")
    write_changelog(pdf, wal, spec)
    table = LakeTable.create(
        spark, str(tmp_path / "t"), TRANSCRIPTS_SCHEMA,
        key=["conv_id", "turn_idx"], n_buckets=8, bucket_by=["conv_id"],
    )
    view = IncrementalAggView(
        spark, str(tmp_path / "v"), table, group_by=["role"],
        aggs={"n_turns": ("count", "*"), "chars": ("sum", "length(text)")},
        strategy="delta",
    )
    CdcStream(
        spark, wal, table, str(tmp_path / "state"),
        max_files_per_trigger=2, views=[view],
    ).run_to_completion()
    assert view.last_applied() == table.current_version()
    got = {r["role"]: (r["n_turns"], r["chars"])
           for r in view.read().collect()}
    exp = {r["role"]: (r["n_turns"], r["chars"])
           for r in table.read().groupBy("role").agg(
               F.count(F.lit(1)).alias("n_turns"),
               F.sum(F.expr("length(text)").cast("decimal(18,6)"))
               .cast("decimal(28,6)").cast("double").alias("chars"),
           ).collect()}
    assert got == exp


def test_maintenance_only_range_skips_diff(spark, tmp_path):
    """Compaction rewrites every bucket's files, so path-equality pruning
    cannot skip it — the op-based maintenance detector must: a refresh
    over a compact/DDL-only range advances the watermark without reading
    any data files."""
    src = make_source(spark, tmp_path)
    view = IncrementalAggView(
        spark, str(tmp_path / "v"), src, group_by=["grp"], aggs=AGGS,
    )
    view.refresh()
    src.compact()
    src.add_column("note", "string")
    calls = []
    orig = src.table_changes

    def spy(*a, **k):
        calls.append(a)
        return orig(*a, **k)

    src.table_changes = spy
    try:
        r = view.refresh()
    finally:
        src.table_changes = orig
    assert r.get("maintenance_only") and calls == []
    assert view.last_applied() == src.current_version()
    # a real change after the maintenance range still flows through
    ops2 = T.StructType(
        list(SRC_SCHEMA.fields)
        + [T.StructField("note", T.StringType()),
           T.StructField("op", T.StringType())]
    )
    src.merge(
        spark.createDataFrame([(0, "g0", 7.0, "x", "U")], ops2), op_col="op"
    )
    r2 = view.refresh()
    assert not r2.get("maintenance_only") and r2["groups_updated"] >= 1
    pd.testing.assert_frame_equal(
        view.read().orderBy("grp").toPandas(),
        full_recompute(src).orderBy("grp").toPandas(),
    )


def test_row_view_survives_source_schema_evolution(spark, tmp_path):
    """A column added to the source mid-stream: the change feed aligns old
    snapshots to the new schema (NULLs), the transform sees the column,
    and the view's own table evolves on the next merge."""
    src = make_source(spark, tmp_path)

    def transform(df):
        cols = ["id", "grp", (F.col("val") * 2).alias("doubled")]
        if "note" in df.columns:
            cols.append(F.upper("note").alias("note_uc"))
        return df.select(*cols)

    view = IncrementalRowView(spark, str(tmp_path / "rv"), src, transform)
    view.refresh()
    assert "note_uc" not in view.read().columns
    ops2 = T.StructType(
        list(SRC_SCHEMA.fields)
        + [T.StructField("note", T.StringType()),
           T.StructField("op", T.StringType())]
    )
    src.merge(
        spark.createDataFrame(
            [(0, "g0", 0.0, "hello", "U"), (99, "g9", 9.0, "hey", "U")],
            ops2,
        ),
        op_col="op",
    )
    view.refresh()
    got = view.read()
    assert "note_uc" in got.columns
    rows = {r["id"]: r["note_uc"] for r in got.collect()}
    assert rows[0] == "HELLO" and rows[99] == "HEY"
    assert rows[5] is None  # untouched pre-evolution row reads NULL


def test_agg_view_random_churn_equivalence(spark, tmp_path):
    """Randomized lifecycle soak (seeded): many batches of random
    inserts/updates/deletes with NULLs and group moves, refresh after
    each — the delta-maintained view must equal the full recompute at
    every step."""
    import random

    rng = random.Random(1234)
    src = make_source(spark, tmp_path)
    view = IncrementalAggView(
        spark, str(tmp_path / "v"), src, group_by=["grp"], aggs=AGGS,
        strategy="delta",
    )
    ops = T.StructType(list(SRC_SCHEMA.fields) + [T.StructField("op", T.StringType())])
    live = set(range(40))
    next_id = 100
    for _ in range(5):
        batch = []
        used: set[int] = set()  # merge contract: <= 1 row per key per batch
        for _ in range(rng.randint(3, 10)):
            kind = rng.choice(["ins", "upd", "del"])
            free = sorted(live - used)
            if kind == "ins" or not free:
                batch.append(
                    (next_id, f"g{rng.randint(0, 8)}",
                     rng.choice([None, round(rng.uniform(-50, 50), 3)]), "U")
                )
                live.add(next_id)
                used.add(next_id)
                next_id += 1
            elif kind == "upd":
                i = rng.choice(free)
                used.add(i)
                batch.append(
                    (i, f"g{rng.randint(0, 8)}",
                     rng.choice([None, round(rng.uniform(-50, 50), 3)]), "U")
                )
            else:
                i = rng.choice(free)
                used.add(i)
                live.discard(i)
                batch.append((i, None, None, "D"))
        src.merge(spark.createDataFrame(batch, ops), op_col="op")
        view.refresh()
        pd.testing.assert_frame_equal(
            view.read().orderBy("grp").toPandas(),
            full_recompute(src).orderBy("grp").toPandas(),
        )


def test_medallion_chain_view_on_view(spark, tmp_path):
    """Bronze -> silver (row view) -> gold (agg view): a view's own table
    is a LakeTable, so views CHAIN — each layer refreshes incrementally
    from the previous layer's change feed. A silver refresh commits
    `merge:refresh:N`, which the gold layer correctly treats as a data
    change (only bare `refresh:N` tags are maintenance-only)."""
    bronze = make_source(spark, tmp_path)

    def silver_tf(df):
        return df.filter(F.col("val").isNotNull()).select(
            "id", "grp", (F.col("val") * 10).alias("scaled")
        )

    silver = IncrementalRowView(
        spark, str(tmp_path / "silver"), bronze, silver_tf
    )
    silver.refresh()
    gold = IncrementalAggView(
        spark, str(tmp_path / "gold"), silver.table, group_by=["grp"],
        aggs={"n": ("count", "*"), "total": ("sum", "scaled")},
        strategy="delta",
    )
    gold.refresh()

    ops = T.StructType(list(SRC_SCHEMA.fields) + [T.StructField("op", T.StringType())])
    bronze.merge(
        spark.createDataFrame(
            [(0, "g4", 99.0, "U"),      # group move g0 -> g4
             (1, "g1", None, "U"),      # falls out of silver's filter
             (5, None, None, "D"),      # delete propagates both layers
             (77, "gZ", 7.0, "U")],     # new group appears in gold
            ops,
        ),
        op_col="op",
    )
    silver.refresh()
    gold.refresh()

    dec = "decimal(18,6)"
    expect = (
        silver_tf(bronze.read())
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("scaled").cast(dec)).cast("decimal(28,6)")
            .cast("double").alias("total"),
        )
        .orderBy("grp")
        .toPandas()
    )
    got = gold.read().orderBy("grp").toPandas()
    pd.testing.assert_frame_equal(got, expect)
    assert "gZ" in set(got["grp"])


def test_read_as_of_timestamp(spark, tmp_path):
    import time as _time

    t = LakeTable.create(
        spark, str(tmp_path / "tt"), SRC_SCHEMA, key=["id"], n_buckets=2
    )
    t.append(spark.createDataFrame([(1, "a", 1.0)], SRC_SCHEMA))
    mid = _time.time()
    _time.sleep(0.01)
    t.append(spark.createDataFrame([(2, "b", 2.0)], SRC_SCHEMA))
    assert t.read(as_of_ts=mid).count() == 1
    assert t.read(as_of_ts=_time.time()).count() == 2
    assert t.version_as_of(mid) < t.current_version()
    with pytest.raises(ValueError, match="no snapshot"):
        t.version_as_of(0.0)
    with pytest.raises(ValueError, match="at most one"):
        t.read(version=0, as_of_ts=mid)


def test_view_rebuilds_after_source_purge(spark, tmp_path):
    """An RTBF purge collapses the source's history, so a downstream view
    cannot diff — refresh must fall back to the rebuild path and the
    purged subject must vanish from the view too (erasure propagates)."""
    src = make_source(spark, tmp_path)
    view = IncrementalAggView(
        spark, str(tmp_path / "v"), src, group_by=["grp"], aggs=AGGS,
    )
    view.refresh()
    assert "g0" in {r["grp"] for r in view.read().collect()}
    src.purge("grp = 'g0'")
    r = view.refresh()
    assert r.get("rebuilt")
    got = view.read().orderBy("grp").toPandas()
    assert "g0" not in set(got["grp"])
    pd.testing.assert_frame_equal(
        got, full_recompute(src).orderBy("grp").toPandas()
    )


def test_pre_image_change_feed(spark, tmp_path):
    """table_changes(pre_images=True) is the retraction feed: updates emit
    (update_preimage, update_postimage) pairs with old/new values."""
    src = make_source(spark, tmp_path)
    v0 = src.current_version()
    ops = T.StructType(list(SRC_SCHEMA.fields) + [T.StructField("op", T.StringType())])
    src.merge(
        spark.createDataFrame(
            [(0, "g9", 100.0, "U"), (1, None, None, "D"),
             (99, "g9", 1.0, "U")],
            ops,
        ),
        op_col="op",
    )
    ch = src.table_changes(v0, pre_images=True).orderBy("id", "_change_type")
    rows = [(r["id"], r["_change_type"], r["grp"], r["val"])
            for r in ch.collect()]
    assert rows == [
        (0, "update_postimage", "g9", 100.0),
        (0, "update_preimage", "g0", 0.0),
        (1, "delete", "g1", 1.0),
        (99, "insert", "g9", 1.0),
    ]


def test_rescan_view_assembles_transcripts(spark, tmp_path):
    """Conversation-assembly as a rescan-maintained view: per conv, turns
    concatenated in stable turn order (the north-rule text-equality
    invariant as a VIEW). Churn — edited turn, appended turn, deleted
    turn, whole conversation deleted — refreshes only affected convs and
    must equal a full recompute over the final source."""
    schema = T.StructType(
        [
            T.StructField("conv", T.StringType()),
            T.StructField("turn", T.IntegerType()),
            T.StructField("text", T.StringType()),
        ]
    )
    src = LakeTable.create(
        spark, str(tmp_path / "tsrc"), schema, key=["conv", "turn"],
        n_buckets=4, bucket_by=["conv"],
    )
    rows = [
        (f"c{c}", t, f"c{c} turn {t}") for c in range(6) for t in range(4)
    ]
    src.merge(
        spark.createDataFrame(rows, schema).withColumn("op", F.lit("U")),
        op_col="op",
    )
    ASSEMBLY = (
        "array_join(transform(array_sort(collect_list(struct(turn, text))),"
        " x -> x.text), '\n')"
    )
    view = IncrementalAggView(
        spark, str(tmp_path / "tview"), src, group_by=["conv"],
        aggs={"n_turns": ("count", "*"), "transcript": ("expr", ASSEMBLY)},
    )
    assert view.strategy == "rescan"
    view.refresh()

    ops = T.StructType(list(schema.fields) + [T.StructField("op", T.StringType())])
    churn_rows = [
        ("c0", 2, "c0 turn 2 EDITED", "U"),
        ("c1", 4, "c1 turn 4 appended", "U"),
        ("c2", 0, None, "D"),
    ] + [("c3", t, None, "D") for t in range(4)]
    src.merge(spark.createDataFrame(churn_rows, ops), op_col="op")
    view.refresh()

    got = view.read().orderBy("conv").toPandas().reset_index(drop=True)
    exp = (
        src.read().groupBy("conv")
        .agg(F.count(F.lit(1)).cast("long").alias("n_turns"),
             F.expr(ASSEMBLY).alias("transcript"))
        .orderBy("conv").toPandas().reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[exp.columns], exp, check_dtype=False)
    assert "c3" not in set(got["conv"])                    # conv fully gone
    row = got[got["conv"] == "c0"]["transcript"].iloc[0]
    assert "EDITED" in row and row.startswith("c0 turn 0")  # stable order


def test_row_view_maintains_pq_index_incrementally(spark, tmp_path):
    """Compressed ANN index as a derived view: pq_encode is a
    key-preserving row transform, so an IncrementalRowView maintains the
    PQ-codes table from the change feed — churned vectors re-encode,
    deleted ones drop, untouched ones are never re-read — and the codes
    always equal a full re-encode of the current source (codebooks are
    frozen at index creation, part of the on-disk format)."""
    import numpy as np

    from etl_spark.operators.similarity import (
        pq_encode,
        pq_topk,
        pq_train_codebooks,
    )

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    rng = np.random.default_rng(9)
    rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(80)]
    src = LakeTable.create(
        spark, str(tmp_path / "vecs"), schema, key=["vec_id"], n_buckets=4
    )
    src.merge(
        spark.createDataFrame(rows, schema).withColumn("op", F.lit("U")),
        op_col="op",
    )
    B = pq_train_codebooks(src.read(), m=4, n_centroids=16, n_rows=80)
    view = IncrementalRowView(
        spark, str(tmp_path / "pqidx"), src,
        transform=lambda df: pq_encode(df, B),
    )
    r1 = view.refresh()
    assert r1["rows_upserted"] == 80

    ops = T.StructType(list(schema.fields) + [T.StructField("op", T.StringType())])
    churn = [
        (0, [float(x) for x in rng.normal(size=16)], "U"),   # vector replaced
        (80, [float(x) for x in rng.normal(size=16)], "U"),  # new vector
        (5, None, "D"),                                      # vector deleted
    ]
    src.merge(spark.createDataFrame(churn, ops), op_col="op")
    r2 = view.refresh()
    assert r2["rows_upserted"] == 2 and r2["rows_deleted"] == 1  # churn only

    got = {r["vec_id"]: bytes(r["pq_code"]) for r in view.table.read().collect()}
    exp = {r["vec_id"]: bytes(r["pq_code"]) for r in pq_encode(src.read(), B).collect()}
    assert got == exp

    # the maintained codes serve queries identically to a fresh encode
    q = src.read().filter(F.col("vec_id").isin(1, 2))
    a = {
        (r.query_id, r.vec_id, r.rank)
        for r in pq_topk(
            src.read(), q, k=5, codebooks=B, codes=view.table.read()
        ).collect()
    }
    b = {
        (r.query_id, r.vec_id, r.rank)
        for r in pq_topk(src.read(), q, k=5, codebooks=B).collect()
    }
    assert a == b


@pytest.mark.parametrize("strategy", ["delta", "rescan"])
def test_null_group_touch_raises_untouched_survives(spark, tmp_path, strategy):
    """SQL GROUP BY forms a NULL group, but the refresh's joins (and the
    merge's key matching) are NULL-unsafe — a touched NULL group would
    silently reset/duplicate its state row. The guard raises exactly
    when a window touches one; an UNTOUCHED NULL group rides through
    refreshes intact, and rebuild() is exact for it."""
    ops = T.StructType(
        list(SRC_SCHEMA.fields) + [T.StructField("op", T.StringType())]
    )
    src = LakeTable.create(
        spark, str(tmp_path / f"src_{strategy}"), SRC_SCHEMA,
        key=["id"], n_buckets=4,
    )
    rows = [(0, None, 1.0, "U"), (1, "g1", 2.0, "U"), (2, "g1", 3.0, "U")]
    src.merge(spark.createDataFrame(rows, ops), op_col="op")
    aggs = (
        {"n": ("count", "*"), "s": ("sum", "val")}
        if strategy == "delta"
        else {"mx": ("max", "val")}
    )
    view = IncrementalAggView(
        spark, str(tmp_path / f"v_{strategy}"), src,
        group_by=["grp"], aggs=aggs, strategy=strategy,
    )
    # ANY window touching the NULL group raises — including the initial
    # one (rescan's semi-join would silently drop the group even then)
    with pytest.raises(ValueError, match="NULL value in group-by"):
        view.refresh()
    view.rebuild()  # the documented path: one-shot overwrite, exact
    state0 = {r["grp"]: r for r in view.read().collect()}
    assert None in state0 and state0[None]["n" if strategy == "delta" else "mx"]

    # churn NOT touching the NULL group: refresh fine, NULL row intact
    src.merge(spark.createDataFrame([(3, "g1", 9.0, "U")], ops), op_col="op")
    view.refresh()
    state1 = {r["grp"]: r for r in view.read().collect()}
    assert state1[None] == state0[None]
    assert len([r for r in view.read().collect() if r["grp"] is None]) == 1

    # churn touching the NULL group: clear error, state unchanged
    src.merge(spark.createDataFrame([(4, None, 5.0, "U")], ops), op_col="op")
    with pytest.raises(ValueError, match="NULL value in group-by"):
        view.refresh()
    assert {r["grp"]: r for r in view.read().collect()} == state1

    # the documented recovery is exact, including the NULL group
    view.rebuild()
    got = {r["grp"]: r for r in view.read().collect()}
    if strategy == "delta":
        assert got[None]["n"] == 2 and float(got[None]["s"]) == 6.0
    else:
        assert got[None]["mx"] == 5.0


def test_agg_view_definition_pin_refuses_expression_change(spark, tmp_path):
    """The state-column guard can't see an agg EXPRESSION change under
    the same output name; the persisted definition pin must: same
    definition reopens fine, changed expression / strategy refuses
    loudly instead of silently combining old state with new deltas."""
    src = make_source(spark, tmp_path)
    path = str(tmp_path / "view")
    v = IncrementalAggView(
        spark, path, src, ["grp"], {"total": ("sum", "val")}
    )
    v.refresh()

    # identical definition: reopens and keeps maintaining
    v2 = IncrementalAggView(
        spark, path, src, ["grp"], {"total": ("sum", "val")}
    )
    assert v2.last_applied() == v.last_applied()

    # same output name + schema, different expression: refused
    with pytest.raises(ValueError, match="different definition"):
        IncrementalAggView(
            spark, path, src, ["grp"], {"total": ("sum", "val * 2")}
        )
    # different strategy for the same aggs: refused (state shape differs
    # anyway, but the pin fires first with the full story)
    with pytest.raises(ValueError, match="different definition"):
        IncrementalAggView(
            spark, path, src, ["grp"], {"total": ("sum", "val")},
            strategy="rescan",
        )


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

# (op, id, group-index, value-index, refresh after this step?)
# value-index 10 encodes NULL (update-to-NULL churn); group keys stay
# non-NULL (NULL groups are refused by contract, tested separately)
_view_steps = st.lists(
    st.tuples(
        st.sampled_from(["up", "del"]),
        st.integers(0, 14),
        st.integers(0, 3),
        st.integers(0, 10),
        st.booleans(),
    ),
    min_size=4,
    max_size=12,
)


@settings(max_examples=4, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(steps=_view_steps, strategy=st.sampled_from(["delta", "rescan"]))
def test_agg_view_fuzz_random_churn_equals_full_recompute(
    spark, tmp_path_factory, steps, strategy
):
    """Random upsert/delete churn (group moves, value->NULL flips,
    re-deletes of absent keys) with refreshes interleaved at random
    points: after every refresh AND at the end, the incrementally
    maintained view must equal a full recompute over the current source
    — for both the delta (retraction arithmetic) and rescan
    (affected-group recompute) strategies."""
    base = tmp_path_factory.mktemp("dv_fuzz")
    src = LakeTable.create(
        spark, str(base / "src"), SRC_SCHEMA, key=["id"], n_buckets=4
    )
    view = IncrementalAggView(
        spark, str(base / "view"), src, ["grp"],
        {"n": ("count", "*"), "total": ("sum", "val"), "m": ("avg", "val")},
        strategy=strategy,
    )
    ops = T.StructType(
        list(SRC_SCHEMA.fields) + [T.StructField("op", T.StringType())]
    )

    def check():
        got = (
            view.read().orderBy("grp").toPandas().reset_index(drop=True)
        )
        exp = (
            src.read()
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("val").cast("decimal(18,6)"))
                .cast("decimal(28,6)").cast("double").alias("total"),
                (
                    F.sum(F.col("val").cast("decimal(18,6)"))
                    .cast("decimal(28,6)").cast("double")
                    / F.count("val")
                ).alias("m"),
            )
            .orderBy("grp")
            .toPandas()
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, exp[got.columns], check_dtype=False)

    for op, i, g, v, do_refresh in steps:
        if op == "up":
            row = [(i, f"g{g}", None if v == 10 else float(v * 3 + g))]
        else:
            row = [(i, None, None)]
        src.merge(
            spark.createDataFrame(
                [tuple(r) + (("U" if op == "up" else "D"),) for r in row],
                ops,
            ),
            op_col="op",
        )
        if do_refresh:
            view.refresh()
            check()
    view.refresh()
    check()
