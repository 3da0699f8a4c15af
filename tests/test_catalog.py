"""Versioned catalog + atomic cross-table transactions (lake.catalog).

Semantics under test: the catalog version is the visibility root —
writes on member tables (even committed table-level) appear to catalog
readers only when a catalog commit points at them; a transaction's
writes across several tables flip visibility in ONE catalog commit;
losers of any race compensate and raise CommitConflict with nothing
partially visible; catalog history gives consistent cross-table time
travel; catalog pins protect table snapshots from expiry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.lake import Catalog, CommitConflict, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def mk_table(spark, tmp_path, name, rows=()):
    t = LakeTable.create(
        spark, str(tmp_path / name), SCHEMA, key=["conv_id", "turn_idx"],
        n_buckets=4, bucket_by=["conv_id"],
    )
    if rows:
        t.append(spark.createDataFrame(list(rows), SCHEMA))
    return t


def rows(df):
    return {(r.conv_id, r.turn_idx, r.text) for r in df.collect()}


def mk_cat(spark, tmp_path, tables):
    cat = Catalog.create(spark, str(tmp_path / "cat"))
    for name, t in tables.items():
        cat.register(name, t)
    return cat


def test_register_publish_and_pinned_reads(spark, tmp_path):
    a = mk_table(spark, tmp_path, "a", [("c1", 0, "hi")])
    cat = mk_cat(spark, tmp_path, {"a": a})
    assert rows(cat.read("a")) == {("c1", 0, "hi")}
    # a DIRECT table write is invisible through the catalog until publish
    a.append(spark.createDataFrame([("c2", 0, "yo")], SCHEMA))
    assert rows(cat.read("a")) == {("c1", 0, "hi")}
    assert rows(a.read()) == {("c1", 0, "hi"), ("c2", 0, "yo")}
    v = cat.publish("a")
    assert rows(cat.read("a")) == {("c1", 0, "hi"), ("c2", 0, "yo")}
    # old catalog version still reads the old pin
    assert rows(cat.read("a", catalog_version=v - 1)) == {("c1", 0, "hi")}
    with pytest.raises(FileExistsError):
        cat.register("a", a)
    with pytest.raises(FileNotFoundError):
        cat.read("nope")
    cat.drop("a")
    with pytest.raises(FileNotFoundError):
        cat.read("a")
    # history retains the dropped pointer for time travel
    assert rows(cat.read("a", catalog_version=v)) == {
        ("c1", 0, "hi"), ("c2", 0, "yo"),
    }


def test_txn_two_tables_flip_visibility_atomically(spark, tmp_path):
    a = mk_table(spark, tmp_path, "a", [("c1", 0, "keep"), ("c2", 0, "move")])
    b = mk_table(spark, tmp_path, "b")
    cat = mk_cat(spark, tmp_path, {"a": a, "b": b})
    base = cat.current_version()

    txn = cat.transaction()
    ta, tb = txn.table("a"), txn.table("b")
    ta.delete_where(F.col("conv_id") == "c2")
    tb.append(spark.createDataFrame([("c2", 0, "move")], SCHEMA))
    # staged: neither main chains nor the catalog see anything
    assert rows(a.read()) == {("c1", 0, "keep"), ("c2", 0, "move")}
    assert rows(b.read()) == set()
    assert rows(cat.read("a")) == {("c1", 0, "keep"), ("c2", 0, "move")}
    assert rows(cat.read("b")) == set()

    v = txn.commit()
    assert v == base + 1
    assert rows(cat.read("a")) == {("c1", 0, "keep")}
    assert rows(cat.read("b")) == {("c2", 0, "move")}
    # cross-table consistency at EVERY catalog version: the row is in
    # exactly one table, never zero or two
    for cv in (base, v):
        got = rows(cat.read("a", cv)) | rows(cat.read("b", cv))
        assert ("c2", 0, "move") in got
        assert len(rows(cat.read("a", cv)) & rows(cat.read("b", cv))) == 0


def test_txn_abort_and_noop_commit(spark, tmp_path):
    a = mk_table(spark, tmp_path, "a", [("c1", 0, "hi")])
    cat = mk_cat(spark, tmp_path, {"a": a})
    base = cat.current_version()

    with cat.transaction() as txn:
        txn.table("a").append(spark.createDataFrame([("c9", 9, "x")], SCHEMA))
        txn.abort()
    assert cat.current_version() == base
    assert rows(cat.read("a")) == {("c1", 0, "hi")}
    assert rows(a.read()) == {("c1", 0, "hi")}
    assert a.branches() == {}

    # context manager aborts on exception
    with pytest.raises(RuntimeError, match="boom"):
        with cat.transaction() as txn:
            txn.table("a").append(
                spark.createDataFrame([("c9", 9, "x")], SCHEMA)
            )
            raise RuntimeError("boom")
    assert cat.current_version() == base
    assert a.branches() == {}

    # touched-but-unwritten tables commit NOTHING
    txn = cat.transaction()
    txn.table("a")
    assert txn.commit() is None
    assert cat.current_version() == base


def test_same_table_txn_race_compensates_and_conflicts(spark, tmp_path):
    a = mk_table(spark, tmp_path, "a", [("c1", 0, "hi")])
    b = mk_table(spark, tmp_path, "b")
    cat = mk_cat(spark, tmp_path, {"a": a, "b": b})

    t1, t2 = cat.transaction(), cat.transaction()
    # t2 stages b FIRST so its commit fast-forwards b before hitting the
    # contended a — exercising the compensation path
    t2.table("b").append(spark.createDataFrame([("b1", 0, "t2")], SCHEMA))
    t2.table("a").append(spark.createDataFrame([("a1", 0, "t2")], SCHEMA))
    t1.table("a").append(spark.createDataFrame([("a1", 0, "t1")], SCHEMA))

    v = t1.commit()
    assert v is not None
    with pytest.raises(CommitConflict):
        t2.commit()
    # nothing of t2 is visible — b's fast-forwarded write was compensated
    assert rows(cat.read("a")) == {("c1", 0, "hi"), ("a1", 0, "t1")}
    assert rows(cat.read("b")) == set()
    # and the compensated chain is reusable: a fresh txn on b succeeds
    # (the rollback head is recognized, not refused as divergence)
    t3 = cat.transaction()
    t3.table("b").append(spark.createDataFrame([("b1", 0, "t3")], SCHEMA))
    assert t3.commit() is not None
    assert rows(cat.read("b")) == {("b1", 0, "t3")}


def test_catalog_level_conflict_compensates_forwarded_chain(spark, tmp_path):
    """The pointer-only race: a publish() re-pins the table WITHOUT
    touching its chain after a transaction already fast-forwarded it —
    the table-level commit succeeded, so compensation must happen at the
    CATALOG-conflict stage: the forwarded chain rolls back to its fork
    state and nothing of the transaction is visible anywhere."""
    a = mk_table(spark, tmp_path, "a", [("c1", 0, "base")])
    cat = mk_cat(spark, tmp_path, {"a": a})
    txn = cat.transaction()
    txn.table("a").append(spark.createDataFrame([("c2", 0, "txn")], SCHEMA))
    # deliberate pointer rewind to the empty create snapshot (version 0):
    # chain untouched, so the transaction's fast_forward will SUCCEED and
    # only the catalog commit can detect the conflict
    cat.publish("a", version=0)
    with pytest.raises(CommitConflict):
        txn.commit()
    # chain compensated back to its fork STATE; catalog reads the rewind
    assert rows(a.read()) == {("c1", 0, "base")}
    assert rows(cat.read("a")) == set()
    assert a.branches() == {}


def test_disjoint_txns_rebase_both_land(spark, tmp_path):
    a = mk_table(spark, tmp_path, "a")
    b = mk_table(spark, tmp_path, "b")
    cat = mk_cat(spark, tmp_path, {"a": a, "b": b})

    t1, t2 = cat.transaction(), cat.transaction()
    t1.table("a").append(spark.createDataFrame([("a1", 0, "x")], SCHEMA))
    t2.table("b").append(spark.createDataFrame([("b1", 0, "y")], SCHEMA))
    v1 = t1.commit()
    v2 = t2.commit()  # rebases onto t1's pointer set internally
    assert v2 == v1 + 1
    assert rows(cat.read("a")) == {("a1", 0, "x")}
    assert rows(cat.read("b")) == {("b1", 0, "y")}


def test_diverged_chain_refused_then_repaired_or_published(spark, tmp_path):
    a = mk_table(spark, tmp_path, "a", [("c1", 0, "hi")])
    cat = mk_cat(spark, tmp_path, {"a": a})
    # a stranded commit above the pointer (crash between fast_forward and
    # the catalog commit, or an out-of-band writer)
    a.append(spark.createDataFrame([("c9", 9, "stray")], SCHEMA))

    txn = cat.transaction()
    with pytest.raises(RuntimeError, match="diverged"):
        txn.table("a")
    txn.abort()

    # repair() compensates; txns work again and the stray row is gone
    assert cat.repair("a") is not None
    assert cat.repair("a") is None  # idempotent: already clean
    txn = cat.transaction()
    txn.table("a").append(spark.createDataFrame([("c2", 0, "ok")], SCHEMA))
    txn.commit()
    assert rows(cat.read("a")) == {("c1", 0, "hi"), ("c2", 0, "ok")}

    # ... or publish() adopts the stray commits instead
    a.append(spark.createDataFrame([("c3", 3, "adopt")], SCHEMA))
    cat.publish("a")
    assert ("c3", 3, "adopt") in rows(cat.read("a"))


def test_catalog_pins_survive_table_expiry_until_catalog_expire(
    spark, tmp_path
):
    a = mk_table(spark, tmp_path, "a", [("c1", 0, "v0")])
    cat = mk_cat(spark, tmp_path, {"a": a})
    v0 = cat.current_version()
    for i in (1, 2):
        txn = cat.transaction()
        txn.table("a").overwrite(
            spark.createDataFrame([("c1", 0, f"v{i}")], SCHEMA)
        )
        txn.commit()
    # aggressive TABLE-side expiry: catalog-pinned versions must survive
    a.expire_snapshots(keep_last=1)
    assert rows(cat.read("a", catalog_version=v0)) == {("c1", 0, "v0")}
    assert rows(cat.read("a")) == {("c1", 0, "v2")}
    # catalog expiry releases the old pins; table expiry then reclaims
    out = cat.expire(keep_last=1)
    assert out["removed_versions"] >= 1 and out["dropped_refs"] >= 1
    a.expire_snapshots(keep_last=1)
    assert rows(cat.read("a")) == {("c1", 0, "v2")}
    with pytest.raises(FileNotFoundError):
        cat.read("a", catalog_version=v0)


def test_expire_releases_pins_of_dropped_tables(spark, tmp_path):
    """A table dropped from the catalog appears in NO retained version
    after enough expiry — its pins must still be released (leak fix)."""
    a = mk_table(spark, tmp_path, "a", [("c1", 0, "v0")])
    cat = mk_cat(spark, tmp_path, {"a": a})
    prefix = f"cat{cat._tag}-v"
    assert any(r.startswith(prefix) for r in a.refs())
    cat.drop("a")
    # push the drop (and the pre-drop versions) out of retained history
    b = mk_table(spark, tmp_path, "b")
    cat.register("b", b)
    cat.expire(keep_last=1)
    # no retained catalog version references table a, so its catalog
    # pins are gone and table-side expiry can reclaim everything
    assert not any(r.startswith(prefix) for r in a.refs())
    # idempotent: a second expire finds nothing more to drop
    assert cat.expire(keep_last=1)["dropped_refs"] == 0


def test_txn_merge_through_branch_handle(spark, tmp_path):
    """The full MERGE surface works on a staged handle (the CDC shape:
    per-batch data + metrics committed as one transaction)."""
    a = mk_table(spark, tmp_path, "a", [("c1", 0, "old"), ("c2", 0, "gone")])
    m = LakeTable.create(
        spark, str(tmp_path / "m"),
        T.StructType(
            [
                T.StructField("batch", T.IntegerType()),
                T.StructField("rows_applied", T.IntegerType()),
            ]
        ),
        key=["batch"], n_buckets=2,
    )
    cat = mk_cat(spark, tmp_path, {"a": a, "metrics": m})

    txn = cat.transaction()
    src = spark.createDataFrame(
        [("c1", 0, "new", "U"), ("c2", 0, None, "D"), ("c3", 1, "ins", "U")],
        T.StructType(SCHEMA.fields + [T.StructField("op", T.StringType())]),
    )
    _, stats = txn.table("a").merge(src, op_col="op")
    txn.table("metrics").append(
        spark.createDataFrame([(1, int(stats["rows_applied"]))], m.schema)
    )
    txn.commit()
    assert rows(cat.read("a")) == {("c1", 0, "new"), ("c3", 1, "ins")}
    got = cat.read("metrics").collect()
    assert len(got) == 1 and got[0].batch == 1


def test_concurrent_txns_serialize_with_retry(spark, tmp_path):
    """4 threads x 3 transactions over OVERLAPPING table pairs, each
    retrying on CommitConflict: every batch lands exactly once, the
    catalog history is linear, and every catalog version is a consistent
    cross-table point (compensation never leaves a partial commit
    visible). The threaded analogue of the single-table
    merge_with_retry race test, for the transaction machinery."""
    import threading

    a = mk_table(spark, tmp_path, "a")
    b = mk_table(spark, tmp_path, "b")
    c = mk_table(spark, tmp_path, "c")
    cat = mk_cat(spark, tmp_path, {"a": a, "b": b, "c": c})
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("b", "a")]
    errors: list[Exception] = []

    def worker(i: int, t1: str, t2: str) -> None:
        try:
            for j in range(3):
                for attempt in range(30):
                    txn = cat.transaction()
                    try:
                        row = [(f"w{i}b{j}", i * 100 + j, t1)]
                        txn.table(t1).append(
                            spark.createDataFrame(row, SCHEMA)
                        )
                        txn.table(t2).append(
                            spark.createDataFrame(
                                [(f"w{i}b{j}", i * 100 + j, t2)], SCHEMA
                            )
                        )
                        txn.commit()
                        break
                    except CommitConflict:
                        continue
                else:
                    raise RuntimeError(f"worker {i} starved")
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [
        threading.Thread(target=worker, args=(i, *p))
        for i, p in enumerate(pairs)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []
    # every batch landed in BOTH its tables exactly once
    got: dict[str, set] = {n: rows(cat.read(n)) for n in ("a", "b", "c")}
    for i, (t1, t2) in enumerate(pairs):
        for j in range(3):
            assert (f"w{i}b{j}", i * 100 + j, t1) in got[t1]
            assert (f"w{i}b{j}", i * 100 + j, t2) in got[t2]
    assert sum(len(v) for v in got.values()) == 2 * len(pairs) * 3
    # every retained catalog version is a consistent cross-table point:
    # for each version, a batch's two rows are either both visible or
    # both absent
    def rows_at(n, v):
        try:
            return rows(cat.read(n, catalog_version=v))
        except FileNotFoundError:  # not yet registered at this version
            return set()

    for v in range(cat.current_version() + 1):
        snap = {n: rows_at(n, v) for n in ("a", "b", "c")}
        for i, (t1, t2) in enumerate(pairs):
            for j in range(3):
                in1 = (f"w{i}b{j}", i * 100 + j, t1) in snap[t1]
                in2 = (f"w{i}b{j}", i * 100 + j, t2) in snap[t2]
                assert in1 == in2, (v, i, j, in1, in2)


def test_version_as_of_reads_consistent_cuts(spark, tmp_path):
    """Timestamp time travel over the catalog: version_as_of(t) resolves
    the cut VISIBLE at t — a table commit published later is excluded
    even though the table chain carried it earlier — and reading both
    tables at that cut is the consistent pair of the time."""
    import time as _time

    a = mk_table(spark, tmp_path, "a", [("c1", 0, "v1")])
    b = mk_table(spark, tmp_path, "b", [("c1", 0, "m1")])
    cat = mk_cat(spark, tmp_path, {"a": a, "b": b})
    t0 = _time.time()

    _time.sleep(0.05)
    # commit on the chain BEFORE t1, publish AFTER t1: at t1 the catalog
    # cut must not include it
    a.append(spark.createDataFrame([("c2", 0, "v2")], SCHEMA))
    _time.sleep(0.05)
    t1 = _time.time()
    _time.sleep(0.05)
    cat.publish("a")
    t2 = _time.time()

    v0, v1, v2 = (cat.version_as_of(t) for t in (t0, t1, t2))
    assert v0 == v1 < v2
    assert rows(cat.read("a", v1)) == {("c1", 0, "v1")}
    assert rows(cat.read("a", v2)) == {("c1", 0, "v1"), ("c2", 0, "v2")}
    assert rows(cat.read("b", v1)) == rows(cat.read("b", v2))
    with pytest.raises(ValueError):
        cat.version_as_of(t0 - 3600)


def test_sql_views_join_at_one_consistent_point(spark, tmp_path):
    a = mk_table(spark, tmp_path, "a", [("c1", 0, "x")])
    b = mk_table(spark, tmp_path, "b", [("c1", 0, "y")])
    cat = mk_cat(spark, tmp_path, {"a": a, "b": b})
    v = cat.current_version()
    # advance a AFTER capturing v: the pinned views must not see it
    txn = cat.transaction()
    txn.table("a").append(spark.createDataFrame([("c2", 0, "new")], SCHEMA))
    txn.commit()
    names = cat.sql_views(prefix="cat_", catalog_version=v)
    assert names == ["cat_a", "cat_b"]
    got = spark.sql(
        "SELECT a.conv_id, a.text AS ta, b.text AS tb "
        "FROM cat_a a JOIN cat_b b ON a.conv_id = b.conv_id"
    ).collect()
    assert [(r.conv_id, r.ta, r.tb) for r in got] == [("c1", "x", "y")]
    assert spark.sql("SELECT count(*) c FROM cat_a").collect()[0].c == 1
    # head views see the committed transaction
    cat.sql_views(prefix="cat_")
    assert spark.sql("SELECT count(*) c FROM cat_a").collect()[0].c == 2


def test_catalog_tags_pin_consistent_cuts_through_expiry(spark, tmp_path):
    """create_tag pins a whole catalog version by NAME: reads by tag see
    the tagged consistent cut, catalog expire retains the tagged version
    AND its table-side pins (so member expire_snapshots can't reclaim
    the tagged snapshot), and drop_tag releases everything."""
    a = mk_table(spark, tmp_path, "a", [("c1", 0, "v1")])
    cat = mk_cat(spark, tmp_path, {"a": a})
    tagged_v = cat.create_tag("release-1")
    tagged_tv = cat.pinned_version("a")

    # churn well past the tag, then expire the catalog aggressively
    for i in range(4):
        a.append(spark.createDataFrame([(f"c{i + 2}", 0, "x")], SCHEMA))
        cat.publish("a")
    cat.expire(keep_last=1)
    assert rows(cat.read("a", "release-1")) == {("c1", 0, "v1")}
    assert cat.resolve_tag("release-1") == tagged_v
    # the member table's snapshot is still pinned: its own expiry keeps it
    a.expire_snapshots(keep_last=1)
    assert rows(cat.read("a", "release-1")) == {("c1", 0, "v1")}

    with pytest.raises(FileExistsError):
        cat.create_tag("release-1")
    with pytest.raises(FileNotFoundError):
        cat.resolve_tag("nope")
    with pytest.raises(ValueError):
        cat.create_tag("bad name!")

    cat.drop_tag("release-1")
    cat.expire(keep_last=1)
    with pytest.raises(FileNotFoundError):
        cat.read("a", "release-1")
    # pin released -> member expiry reclaims the old snapshot
    a.expire_snapshots(keep_last=1)
    with pytest.raises(FileNotFoundError):
        a.snapshot(tagged_tv, buckets=set())
