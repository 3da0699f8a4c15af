"""Debezium-envelope adapter: parse/serialize, rejects, streaming tail."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.cdc.apply import apply_batch
from etl_spark.cdc.state import CommitLog
from etl_spark.lake import LakeTable
from etl_spark.sources.debezium import (
    parse_debezium,
    split_rejects,
    to_debezium_json,
)

PAYLOAD = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
    ]
)


def env(op, before=None, after=None, lsn=1, ts_ms=1_700_000_000_000):
    return json.dumps(
        {
            "payload": {
                "before": before,
                "after": after,
                "source": {"lsn": lsn, "ts_ms": ts_ms, "table": "turns"},
                "op": op,
                "ts_ms": ts_ms,
            }
        }
    )


def row(conv_id, turn_idx, text):
    return {"conv_id": conv_id, "turn_idx": turn_idx, "text": text}


def test_parse_ops_images_and_metadata(spark):
    lines = [
        env("c", after=row("c1", 0, "hello"), lsn=10),
        env("r", after=row("c2", 0, "snap"), lsn=11),          # snapshot read
        env("u", before=row("c1", 0, "hello"),
            after=row("c1", 0, "hello!"), lsn=12),
        env("d", before=row("c2", 0, "snap"), lsn=13),         # delete: pre-image
    ]
    df = spark.createDataFrame([(s,) for s in lines], ["value"])
    clean, rejects = split_rejects(parse_debezium(df, PAYLOAD))
    assert rejects.count() == 0
    got = {
        (r.conv_id, r.turn_idx, r.text, r.op, r.lsn) for r in clean.collect()
    }
    assert got == {
        ("c1", 0, "hello", "U", 10),
        ("c2", 0, "snap", "U", 11),
        ("c1", 0, "hello!", "U", 12),
        ("c2", 0, "snap", "D", 13),   # delete carries the before-image
    }
    ts = clean.select("ts").distinct().collect()[0][0]
    assert ts.year == 2023  # envelope ts_ms decoded, not source read time


def test_rejects_malformed_and_imageless(spark):
    lines = [
        env("u", before=row("c1", 0, "a"), after=row("c1", 0, "b")),  # clean
        "{not json at all",
        env("u"),                                   # neither image
        env("x", after=row("c9", 0, "?")),          # unknown op
        json.dumps({"payload": None}),
        json.dumps({"payload": {"before": None, "after": row("c3", 0, "t"),
                                "source": {"lsn": 5}}}),  # op missing
    ]
    df = spark.createDataFrame([(s,) for s in lines], ["value"])
    clean, rejects = split_rejects(parse_debezium(df, PAYLOAD))
    assert clean.count() == 1
    bad = [r["_corrupt"] for r in rejects.collect()]
    assert len(bad) == 5
    assert all(b is not None for b in bad)  # raw line retained for dead-letter


def test_roundtrip_is_identity(spark):
    src = spark.createDataFrame(
        [
            ("c1", 0, "hi", "U", 1, 1_700_000_000_000),
            ("c1", 1, None, "U", 2, 1_700_000_000_500),   # null payload col
            ("c1", 0, "hi", "D", 3, 1_700_000_001_000),
        ],
        T.StructType(
            list(PAYLOAD.fields)
            + [
                T.StructField("op", T.StringType()),
                T.StructField("lsn", T.LongType()),
                T.StructField("ms", T.LongType()),
            ]
        ),
    ).withColumn("ts", F.timestamp_millis(F.col("ms"))).drop("ms")
    js = to_debezium_json(src, ["conv_id", "turn_idx", "text"])
    clean, rejects = split_rejects(parse_debezium(js, PAYLOAD))
    assert rejects.count() == 0
    cols = ["conv_id", "turn_idx", "text", "op", "lsn", "ts"]
    assert sorted(map(tuple, clean.select(cols).collect())) == sorted(
        map(tuple, src.select(cols).collect())
    )


def test_streaming_debezium_tail_converges(spark, tmp_path):
    """End-to-end binlog-JSON tail: text-file stream -> parse_debezium ->
    exactly-once apply_batch per micro-batch -> converged lake state."""
    wal = tmp_path / "wal"
    wal.mkdir()
    f1 = wal / "seg-000.jsonl"
    f1.write_text(
        "\n".join(
            [
                env("c", after=row("c1", 0, "a"), lsn=1, ts_ms=1_700_000_000_000),
                env("c", after=row("c1", 1, "b"), lsn=2, ts_ms=1_700_000_001_000),
                env("c", after=row("c2", 0, "x"), lsn=3, ts_ms=1_700_000_002_000),
            ]
        )
    )
    f2 = wal / "seg-001.jsonl"
    f2.write_text(
        "\n".join(
            [
                env("u", before=row("c1", 0, "a"), after=row("c1", 0, "a2"),
                    lsn=4, ts_ms=1_700_000_003_000),
                env("d", before=row("c2", 0, "x"), lsn=5,
                    ts_ms=1_700_000_004_000),
                "{corrupt-line",
            ]
        )
    )
    # FileStreamSource orders by mtime: pin it so seg-000 lands first
    now = time.time()
    os.utime(f1, (now - 60, now - 60))
    os.utime(f2, (now, now))

    schema = T.StructType(
        list(PAYLOAD.fields) + [T.StructField("ts", T.TimestampType())]
    )
    table = LakeTable.create(
        spark, str(tmp_path / "t"), schema, key=["conv_id", "turn_idx"],
        n_buckets=4, bucket_by=["conv_id"],
    )
    commit_log = CommitLog(str(tmp_path / "commits"))
    rejects_dir = str(tmp_path / "rejects")
    seen_rejects: list[int] = []

    def fb(df, batch_id):
        clean, rejects = split_rejects(parse_debezium(df, PAYLOAD))
        n_bad = rejects.count()
        if n_bad:
            rejects.write.mode("overwrite").parquet(
                os.path.join(rejects_dir, f"batch={batch_id}")
            )
            seen_rejects.append(n_bad)
        apply_batch(
            spark, clean, table,
            batch_id=batch_id, source="dbz", commit_log=commit_log,
            # this payload has no `role` column, so the transcript-shaped
            # default validators don't apply
            validators=[
                ("key_present",
                 F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()),
            ],
        )

    q = (
        spark.readStream.text(str(wal))
        .writeStream.foreachBatch(fb)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .option("maxFilesPerTrigger", 1)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.conv_id, r.turn_idx, r.text) for r in table.read().collect()}
    assert got == {("c1", 0, "a2"), ("c1", 1, "b")}
    assert seen_rejects == [1]  # the corrupt line went to the reject sink
