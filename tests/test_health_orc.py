"""LakeTable.health() metadata report + ORC source/sink round-trip."""

from __future__ import annotations

from pyspark.sql import types as T

from etl_spark.lake import LakeTable
from etl_spark.sources import read_orc_source, write_orc_sink

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def test_orc_roundtrip_and_lowercase(spark, tmp_path):
    df = spark.createDataFrame([("c1", 0, "hi"), ("c2", 1, "yo")], SCHEMA)
    out = str(tmp_path / "orc")
    write_orc_sink(df.toDF("CONV_ID", "TURN_IDX", "TEXT"), out)
    back = read_orc_source(spark, out)
    assert set(back.columns) == {"conv_id", "turn_idx", "text"}
    assert {(r.conv_id, r.turn_idx, r.text) for r in back.collect()} == {
        ("c1", 0, "hi"),
        ("c2", 1, "yo"),
    }


def test_health_report_tracks_lifecycle(spark, tmp_path):
    t = LakeTable.create(
        spark, str(tmp_path / "t"), SCHEMA, key=["conv_id", "turn_idx"],
        n_buckets=4, bucket_by=["conv_id"],
    )
    rows = [("c%02d" % i, j, f"m{i}{j}") for i in range(12) for j in range(2)]
    t.append(spark.createDataFrame(rows, SCHEMA))
    h = t.health()
    assert h["version"] == 1 and h["n_snapshots"] == 2
    assert h["physical_rows"] == 24 and h["live_bytes"] > 0
    assert 0 < h["buckets_filled"] <= 4 and h["n_buckets"] == 4
    assert h["bucket_skew"] >= 1.0
    assert h["mor_delta_rows"] == 0 and h["orphan_files"] == 0
    assert h["staged_wap"] == []
    # mor backlog + staged wap + orphans all become visible
    sch = T.StructType(SCHEMA.fields + [T.StructField("op", T.StringType())])
    t.merge(
        spark.createDataFrame([("c01", 0, "upd", "U")], sch),
        op_col="op", mode="mor",
    )
    with t.wap("pending-audit"):
        t.merge(spark.createDataFrame([("c99", 0, "staged", "U")], sch), op_col="op")
    h2 = t.health()
    assert h2["mor_delta_rows"] >= 1
    assert h2["staged_wap"] == ["pending-audit"]
    assert h2["orphan_files"] == 0  # staged files are NOT orphans
    t.abandon("pending-audit")
    h3 = t.health()
    assert h3["staged_wap"] == [] and h3["orphan_files"] > 0
    t.vacuum(older_than_s=0.0)
    assert t.health()["orphan_files"] == 0
    # compaction folds the mor backlog
    t.compact()
    assert t.health()["mor_delta_rows"] == 0
