"""Metadata-only DELETE WHERE (file-level zone-map deletes).

The retention sweep at 10^10 rows must not rewrite the table:
``delete_where("ts < horizon")`` over an ingest-ordered table should DROP
whole files whose zone maps prove every row matches (zero data I/O), keep
files whose range excludes the predicate verbatim (same path, never
read), and rewrite only the boundary. These tests pin the three
dispositions at the manifest level and the guard rails that force the
conservative path (NULLs, unparsable predicates, mor backlog).
"""

from __future__ import annotations

from pyspark.sql import types as T

from etl_spark.lake import LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("ts", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

OP_SCHEMA = T.StructType(list(SCHEMA.fields) + [T.StructField("op", T.StringType())])


def make(spark, path, n_buckets=2, **kw):
    return LakeTable.create(
        spark, str(path / "t"), SCHEMA, key=["conv_id", "turn_idx"],
        n_buckets=n_buckets, bucket_by=["conv_id"], stats_cols=["ts"], **kw,
    )


def batch(spark, lo, n=50):
    return spark.createDataFrame(
        [(f"c{i % 8}", lo + i, lo + i, f"v{lo + i}") for i in range(n)], SCHEMA
    )


def test_retention_drops_old_files_without_rewrite(spark, tmp_path):
    t = make(spark, tmp_path)
    for lo in (0, 100, 200):  # old / boundary / new time windows
        t.append(batch(spark, lo))
    base = t.snapshot()
    old = {e["path"] for e in base.data_files
           if e["stats"]["ts"][1] < 125}
    new = {e["path"] for e in base.data_files
           if e["stats"]["ts"][0] >= 125}
    boundary = {e["path"] for e in base.data_files} - old - new
    assert old and new and boundary  # the fixture really has all three

    v0 = t.current_version()
    snap, stats = t.delete_where("ts < 125")
    assert stats["rows_deleted"] == 75
    assert stats["dropped_files"] == len(old)
    after = {e["path"] for e in snap.data_files}
    # all-match files left the manifest with zero I/O
    assert not (old & after)
    # zone-proven no-match files survive VERBATIM (same path = no rewrite)
    assert new <= after
    # boundary files were rewritten (their old paths are gone)
    assert not (boundary & after)
    # state + history
    assert {r.ts for r in t.read().collect()} == (
        set(range(125, 150)) | set(range(200, 250))
    )
    assert t.read(version=v0).count() == 150


def test_null_stats_rows_block_wholesale_drop(spark, tmp_path):
    t = make(spark, tmp_path, n_buckets=1)  # one file holds the NULL too
    rows = [(f"c{i}", i, i, "old") for i in range(10)]
    rows.append(("cnull", 99, None, "keepme"))  # NULL ts rides in the file
    t.append(spark.createDataFrame(rows, SCHEMA))
    snap, stats = t.delete_where("ts < 50")
    # NULL never satisfies the predicate: the file cannot be dropped
    # wholesale, and the NULL row survives the rewrite
    assert stats["dropped_files"] == 0
    assert stats["rows_deleted"] == 10
    got = {(r.conv_id, r.text) for r in t.read().collect()}
    assert got == {("cnull", "keepme")}


def test_unparsable_predicate_falls_back_exactly(spark, tmp_path):
    t = make(spark, tmp_path)
    t.append(batch(spark, 0))
    t.append(batch(spark, 100))
    # OR at the top level: not expressible as stats conjuncts -> every
    # file is boundary, results still exact
    snap, stats = t.delete_where("ts < 20 OR text = 'v130'")
    assert stats["dropped_files"] == 0
    assert stats["rows_deleted"] == 21
    left = {r.ts for r in t.read().collect()}
    assert left == (set(range(20, 50)) | set(range(100, 150))) - {130}


def test_partially_parsable_conjunct_never_drops(spark, tmp_path):
    t = make(spark, tmp_path)
    t.append(batch(spark, 0))
    t.append(batch(spark, 100))
    # "ts < 120" parses; "text >= 'v'" is not a stats column -> may-match
    # pruning may skip the new file, but nothing is provably all-match
    snap, stats = t.delete_where("ts < 120 AND text >= 'v'")
    assert stats["dropped_files"] == 0
    assert {r.ts for r in t.read().collect()} == set(range(120, 150))


def test_mor_backlog_bucket_is_never_dropped_wholesale(spark, tmp_path):
    t = make(spark, tmp_path, n_buckets=1)  # the whole table IS the backlog bucket
    t.append(batch(spark, 0, n=20))
    # a mor upsert moves one conversation's ts ABOVE the horizon without
    # rewriting the base file: dropping the base file on its (stale)
    # zone range would delete the shadowed live row
    upd = spark.createDataFrame([("c3", 3, 500, "moved", "U")], OP_SCHEMA)
    t.merge(upd, op_col="op", mode="mor")
    snap, stats = t.delete_where("ts < 100")
    assert stats["dropped_files"] == 0  # backlog forces the fold-first path
    got = {(r.conv_id, r.turn_idx, r.ts) for r in t.read().collect()}
    assert got == {("c3", 3, 500)}
    assert stats["rows_deleted"] == 19


def test_drop_only_delete_commits_without_a_write_job(spark, tmp_path):
    t = make(spark, tmp_path)
    t.append(batch(spark, 0))    # wholly below the horizon
    t.append(batch(spark, 200))  # wholly above
    base_new = {e["path"] for e in t.snapshot().data_files
                if e["stats"]["ts"][0] >= 200}
    snap, stats = t.delete_where("ts < 150")
    assert stats["rows_deleted"] == 50
    assert stats["rewritten_buckets"] == 0  # no boundary bucket at all
    assert {e["path"] for e in snap.data_files} == base_new
    assert t.read().count() == 50


def test_update_keeps_no_match_files_verbatim(spark, tmp_path):
    t = make(spark, tmp_path)
    for lo in (0, 100, 200):
        t.append(batch(spark, lo))
    base = t.snapshot()
    untouched = {e["path"] for e in base.data_files
                 if e["stats"]["ts"][0] >= 100}
    snap, stats = t.update({"text": "'aged'"}, where="ts < 50")
    assert stats["rows_updated"] == 50
    after = {e["path"] for e in snap.data_files}
    # files whose range excludes the predicate share the affected buckets
    # but keep their exact paths — never read, never rewritten
    assert untouched <= after
    got = {r.ts for r in t.read().filter("text = 'aged'").collect()}
    assert got == set(range(50))
    assert t.read().count() == 150
