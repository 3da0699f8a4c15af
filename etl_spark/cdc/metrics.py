"""Per-batch metrics table (lineage + row counts + latency).

Replaces the reference's printf accounting (`Total rows: %d ... Batch %d
stored`, /root/reference/etl.go:364,380-385 and failed-row counts at
/root/reference/etl.go:325-330) with a queryable parquet table: one row per
(batch, source_partition) carrying rows in/applied/failed, the LSN range
applied (per-partition lineage), and wall latency. Append-only parquet —
O(#batches x #partitions) rows, written once per micro-batch."""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("batch_id", T.LongType()),
        T.StructField("source_partition", T.IntegerType()),
        T.StructField("rows_in", T.LongType()),
        T.StructField("rows_applied", T.LongType()),
        T.StructField("rows_failed", T.LongType()),
        T.StructField("low_lsn", T.LongType()),
        T.StructField("high_lsn", T.LongType()),
        T.StructField("latency_ms", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


class MetricsTable:
    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)

    def record(self, spark: SparkSession, rows: list[dict]) -> None:
        if not rows:
            return
        import datetime

        now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
        data = [
            (
                r.get("source", "wal"),
                r.get("batch_id", -1),
                r.get("source_partition", -1),
                r.get("rows_in", 0),
                r.get("rows_applied", 0),
                r.get("rows_failed", 0),
                r.get("low_lsn"),
                r.get("high_lsn"),
                r.get("latency_ms", 0),
                now,
            )
            for r in rows
        ]
        spark.createDataFrame(data, METRICS_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.path)

    def to_df(self, spark: SparkSession) -> DataFrame:
        try:
            return spark.read.schema(METRICS_SCHEMA).parquet(self.path)
        except Exception:
            return spark.createDataFrame([], METRICS_SCHEMA)
