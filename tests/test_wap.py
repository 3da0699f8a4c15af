"""Write-audit-publish staging: staged commits are invisible until
published, auditable through a read view, atomic to publish, and
orphan-reclaimed when abandoned (Iceberg WAP pattern)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from etl_spark.lake import CommitConflict, LakeTable

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def make(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key=["conv_id", "turn_idx"],
        n_buckets=4, bucket_by=["conv_id"],
    )
    t.append(spark.createDataFrame([("c1", 0, "base")], SCHEMA))
    return t


def rows(df):
    return {(r.conv_id, r.turn_idx, r.text) for r in df.collect()}


def test_stage_is_invisible_then_publish_applies(spark, tmp_path):
    t = make(spark, tmp_path)
    batch = spark.createDataFrame([("c1", 0, "edited"), ("c2", 0, "new")], SCHEMA)
    with t.wap("audit-1"):
        t.merge(batch)
    # live chain unchanged: readers, version, row counts all pre-stage
    assert t.current_version() == 1
    assert rows(t.read()) == {("c1", 0, "base")}
    # audit view sees the staged state (and can time-travel to the base)
    aud = t.staged("audit-1")
    assert rows(aud.read()) == {("c1", 0, "edited"), ("c2", 0, "new")}
    assert rows(aud.read(version=1)) == {("c1", 0, "base")}
    assert aud.row_count() == 2
    snap = t.publish("audit-1")
    assert snap.version == 2 and ":wap(audit-1)" in snap.op
    assert rows(t.read()) == {("c1", 0, "edited"), ("c2", 0, "new")}
    # the stage file is gone; publishing twice is an error
    with pytest.raises(FileNotFoundError):
        t.staged("audit-1")


def test_publish_conflicts_when_base_advanced(spark, tmp_path):
    t = make(spark, tmp_path)
    with t.wap("stale"):
        t.merge(spark.createDataFrame([("c2", 0, "staged")], SCHEMA))
    # another writer lands on the live chain first
    t.merge(spark.createDataFrame([("c3", 0, "winner")], SCHEMA))
    with pytest.raises(CommitConflict):
        t.publish("stale")
    # the stage survives the failed publish for inspection, then abandon
    assert rows(t.staged("stale").read()) == {("c1", 0, "base"), ("c2", 0, "staged")}
    t.abandon("stale")
    assert rows(t.read()) == {("c1", 0, "base"), ("c3", 0, "winner")}


def test_abandon_then_vacuum_reclaims_only_staged_files(spark, tmp_path):
    t = make(spark, tmp_path)
    with t.wap("drop-me"):
        t.merge(spark.createDataFrame([("c2", 0, "staged")], SCHEMA))
    # while staged, vacuum must NOT touch the stage's data files
    assert t.vacuum(older_than_s=0.0) == 0
    assert rows(t.staged("drop-me").read()) == {("c1", 0, "base"), ("c2", 0, "staged")}
    t.abandon("drop-me")
    removed = t.vacuum(older_than_s=0.0)
    assert removed > 0
    assert rows(t.read()) == {("c1", 0, "base")}


def test_expire_snapshots_keeps_staged_references(spark, tmp_path):
    t = make(spark, tmp_path)
    with t.wap("pending"):
        t.merge(spark.createDataFrame([("c2", 0, "staged")], SCHEMA))
    # churn the live chain so the stage's base version expires
    t.merge(spark.createDataFrame([("c1", 0, "v2")], SCHEMA))
    t.merge(spark.createDataFrame([("c1", 0, "v3")], SCHEMA))
    t.expire_snapshots(keep_last=1)
    # the staged view still reads fine: expire kept its file + manifests
    assert rows(t.staged("pending").read()) == {("c1", 0, "base"), ("c2", 0, "staged")}


def test_one_commit_per_stage_and_read_only_view(spark, tmp_path):
    t = make(spark, tmp_path)
    with t.wap("once"):
        t.merge(spark.createDataFrame([("c2", 0, "a")], SCHEMA))
        with pytest.raises(CommitConflict):
            t.merge(spark.createDataFrame([("c3", 0, "b")], SCHEMA))
    with pytest.raises(RuntimeError):
        t.staged("once").append(spark.createDataFrame([("c4", 0, "x")], SCHEMA))
    t.abandon("once")
    # live chain never saw any of it
    assert t.current_version() == 1


def test_wap_id_validation_and_duplicate_stage(spark, tmp_path):
    t = make(spark, tmp_path)
    with pytest.raises(ValueError):
        t.wap("bad/../id")
    with t.wap("dup"):
        t.append(spark.createDataFrame([("c2", 0, "a")], SCHEMA))
    with pytest.raises(ValueError):
        with t.wap("dup"):
            pass
    t.abandon("dup")


def test_staged_audit_gate_workflow(spark, tmp_path):
    """The WAP loop a pipeline runs: stage -> audit query -> publish or
    abandon based on the audit result."""
    t = make(spark, tmp_path)
    bad = spark.createDataFrame([("c9", 0, None)], SCHEMA)
    with t.wap("gate"):
        t.merge(bad)
    nulls = t.staged("gate").read().filter("text IS NULL").count()
    assert nulls == 1  # audit fails
    t.abandon("gate")
    good = spark.createDataFrame([("c9", 0, "ok")], SCHEMA)
    with t.wap("gate"):  # id reusable after abandon
        t.merge(good)
    assert t.staged("gate").read().filter("text IS NULL").count() == 0
    t.publish("gate")
    assert ("c9", 0, "ok") in rows(t.read())
