"""spark-submit entrypoint: tail a WAL into a lake table, exactly once.

    spark-submit --master <cluster> --py-files dist/etl_spark.zip \
        tools/replay_job.py <wal_dir> <table_dir> <state_dir> \
        [--buckets N] [--transform normalize] [--create]

Uses the session spark-submit provides (never overrides the submitted
master); creates the target table on first run with ``--create``;
resumable — rerunning after a crash or with new WAL segments applies
only unprocessed batches (checkpoint + commit log + watermarks).
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("wal_dir")
    ap.add_argument("table_dir")
    ap.add_argument("state_dir")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--transform", choices=["none", "normalize"], default="normalize")
    ap.add_argument("--transform-stage", choices=["pre", "post"], default="post")
    ap.add_argument("--create", action="store_true")
    ap.add_argument("--max-files-per-trigger", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    # the submitted master/conf wins; we only add engine-required SQL confs
    spark = (
        SparkSession.builder.appName("etl_spark-replay")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    from etl_spark.cdc.changelog import TRANSCRIPTS_SCHEMA
    from etl_spark.functions.text import normalize_transcripts_expr
    from etl_spark.lake import LakeTable
    from etl_spark.streaming.stream import run_stream

    if args.create and not LakeTable.exists(spark, args.table_dir):
        LakeTable.create(
            spark, args.table_dir, TRANSCRIPTS_SCHEMA,
            key=["conv_id", "turn_idx"], n_buckets=args.buckets,
            bucket_by=["conv_id"],
        )
    table = LakeTable.load(spark, args.table_dir)
    stats = run_stream(
        spark, args.wal_dir, table, args.state_dir,
        transform=normalize_transcripts_expr if args.transform == "normalize" else None,
        transform_stage=args.transform_stage,
        max_files_per_trigger=args.max_files_per_trigger,
    )
    applied = sum(s.get("rows_applied", 0) for s in stats if not s.get("skipped"))
    print(
        f"REPLAY_DONE batches={len(stats)} rows_applied={applied} "
        f"table_rows={table.row_count()}"
    )


if __name__ == "__main__":
    main()
