"""Per-batch metrics table (lineage + row counts + latency).

Replaces the reference's printf accounting (`Total rows: %d ... Batch %d
stored`, /root/reference/etl.go:364,380-385 and failed-row counts at
/root/reference/etl.go:325-330) with a queryable parquet table: one row per
(batch, source_partition) carrying rows in/failed, the LSN range applied
(per-partition lineage), and wall latency. Append-only parquet —
O(#batches x #partitions) rows, written once per micro-batch.

``rows_applied`` is populated only at batch grain (in the batch stats /
commit log): the LWW dedup crosses source partitions, so a per-partition
applied count does not exist — the column is NULL here rather than a
mislabeled pre-dedup count."""

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
        """Append one parquet file with the batch's metric rows. Driver-side
        pyarrow write — the payload is O(#source partitions) rows, and a
        Spark job per micro-batch just for metrics is measurable overhead."""
        if not rows:
            return
        import datetime
        import uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
        table = pa.table(
            {
                "source": [r.get("source", "wal") for r in rows],
                "batch_id": pa.array(
                    [r.get("batch_id", -1) for r in rows], pa.int64()
                ),
                "source_partition": pa.array(
                    [r.get("source_partition", -1) for r in rows], pa.int32()
                ),
                "rows_in": pa.array([r.get("rows_in", 0) for r in rows], pa.int64()),
                "rows_applied": pa.array(
                    [r.get("rows_applied", 0) for r in rows], pa.int64()
                ),
                "rows_failed": pa.array(
                    [r.get("rows_failed", 0) for r in rows], pa.int64()
                ),
                "low_lsn": pa.array([r.get("low_lsn") for r in rows], pa.int64()),
                "high_lsn": pa.array([r.get("high_lsn") for r in rows], pa.int64()),
                "latency_ms": pa.array(
                    [r.get("latency_ms", 0) for r in rows], pa.int64()
                ),
                "ts": pa.array([now for _ in rows], pa.timestamp("us")),
            }
        )
        pq.write_table(
            table, os.path.join(self.path, f"metrics-{uuid.uuid4().hex[:12]}.parquet")
        )

    def to_df(self, spark: SparkSession) -> DataFrame:
        try:
            return spark.read.schema(METRICS_SCHEMA).parquet(self.path)
        except Exception:
            return spark.createDataFrame([], METRICS_SCHEMA)
