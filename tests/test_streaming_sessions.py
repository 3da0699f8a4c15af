"""Stateful streaming sessionization (applyInPandasWithState): sessions
close on gap within a batch, across micro-batches, and via event-time
timeout on a resumed stream."""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from etl_spark.streaming.sessions import stream_sessionize

GAP = 1800


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [pd.Timestamp(r[1], unit="s") for r in rows], pa.timestamp("us")
            ),
        }
    )
    pq.write_table(t, path)


def _run(spark, src_dir, ckpt, out_dir):
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream_sessionize(stream, gap_sec=GAP)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {
        (r["user_id"], r["session_start"].timestamp(),
         r["session_end"].timestamp(), r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }


def test_stream_sessionize_gap_and_timeout(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    day = 86_400
    # NB: times start well above epoch 0 — Spark's late-row filter drops
    # rows with ts <= watermark and the INITIAL watermark is epoch 0, so a
    # ts=0 event is silently dropped (boundary is inclusive)
    # batch 1: user 1 two quick events; user 2 two quick events
    _write(os.path.join(src, "f1.parquet"),
           [(1, 1000), (1, 1010), (2, 1005), (2, 1100)])
    import time
    os.utime(os.path.join(src, "f1.parquet"), (1000, 1000))
    # batch 2: user 1 events past the gap (closes session 1 in-group) plus
    # a far-future sentinel user that advances the watermark
    _write(os.path.join(src, "f2.parquet"),
           [(1, 4000), (1, 4010), (99, day)])
    os.utime(os.path.join(src, "f2.parquet"), (2000, 2000))
    out = str(tmp_path / "out")
    got = _run(spark, src, ckpt, out)
    # user 1's first session closed by the gap (emitted directly)
    assert (1, 1000.0, 1010.0, 2) in got

    # resume with one more file far in the future: watermark passes every
    # open session's end + gap -> EventTimeTimeout fires for users with NO
    # new data
    _write(os.path.join(src, "f3.parquet"), [(99, 2 * day)])
    os.utime(os.path.join(src, "f3.parquet"), (3000, 3000))
    got2 = _run(spark, src, ckpt, out)
    all_sessions = got | got2
    assert (1, 4000.0, 4010.0, 2) in all_sessions   # closed via timeout
    assert (2, 1005.0, 1100.0, 2) in all_sessions   # closed via timeout
