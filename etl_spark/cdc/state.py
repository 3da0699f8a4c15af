"""Exactly-once state: idempotent commit log + per-partition high watermarks.

Re-expresses the reference's checkpoint contract on Spark terms:

- v2 saves a resume token only *after* a successful commit
  (/root/reference/v2/etl.go:196-207, contracts at
  /root/reference/v2/contracts/contracts.go:35-38) — at-least-once with
  downstream dedup. Here, Structured Streaming's checkpoint gives
  at-least-once delivery into ``foreachBatch``; the **commit log** records
  `(source, batch_id)` after the lake MERGE commits, so a replayed batch is
  recognized and skipped — exactly-once end-to-end.
- v1 persists `MigrationInfo{LastInsertedID}` per table as `<table>.json`
  (/root/reference/migration.go:11-32) and resumes with
  `WHERE pk > last_inserted_id` (/root/reference/etl.go:412-424). Here, the
  **watermark store** keeps the highest applied LSN per source partition;
  on resume, events at-or-below the watermark are filtered out before the
  merge.

Both stores are tiny driver-side metadata (O(#batches) and O(#partitions),
never O(rows)), written with atomic create/replace — the same scale shape
as an Iceberg catalog pointer. Each is also exposed as a DataFrame for
lineage/metrics queries.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class CommitLog:
    """Marker-file commit log keyed (source, batch_id); creation is atomic
    (O_EXCL), existence = batch already applied."""

    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)

    def _marker(self, source: str, batch_id: int) -> str:
        safe = source.replace("/", "_")
        return os.path.join(self.path, f"commit-{safe}-{batch_id:012d}.json")

    def is_committed(self, source: str, batch_id: int) -> bool:
        return os.path.exists(self._marker(source, batch_id))

    def commit(self, source: str, batch_id: int, stats: dict | None = None) -> bool:
        """Record the batch; returns False if it was already committed."""
        try:
            fd = os.open(
                self._marker(source, batch_id), os.O_CREAT | os.O_EXCL | os.O_WRONLY
            )
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as fh:
            json.dump(
                {
                    "source": source,
                    "batch_id": batch_id,
                    "committed_at": time.time(),
                    "stats": stats or {},
                },
                fh,
            )
        return True

    def to_df(self, spark: SparkSession) -> DataFrame:
        schema = T.StructType(
            [
                T.StructField("source", T.StringType()),
                T.StructField("batch_id", T.LongType()),
                T.StructField("committed_at", T.DoubleType()),
            ]
        )
        rows = []
        for n in sorted(os.listdir(self.path)):
            if n.startswith("commit-") and n.endswith(".json"):
                with open(os.path.join(self.path, n)) as fh:
                    d = json.load(fh)
                rows.append((d["source"], d["batch_id"], d["committed_at"]))
        return spark.createDataFrame(rows, schema)


class WatermarkStore:
    """Per-source-partition high LSN, atomically replaced per update."""

    def __init__(self, path: str):
        self.path = os.path.abspath(path)
        os.makedirs(self.path, exist_ok=True)

    def _file(self, partition: int) -> str:
        return os.path.join(self.path, f"partition-{partition:06d}.json")

    def get_all(self) -> dict[int, int]:
        out: dict[int, int] = {}
        for n in os.listdir(self.path):
            if n.startswith("partition-") and n.endswith(".json"):
                with open(os.path.join(self.path, n)) as fh:
                    d = json.load(fh)
                out[d["source_partition"]] = d["high_lsn"]
        return out

    def advance(self, high_lsns: dict[int, int]) -> None:
        """Monotonic advance (never regress a watermark on replay)."""
        current = self.get_all()
        for p, lsn in high_lsns.items():
            if p in current and current[p] >= lsn:
                continue
            tmp = self._file(p) + ".tmp"
            with open(tmp, "w") as fh:
                json.dump(
                    {"source_partition": p, "high_lsn": lsn, "updated_at": time.time()},
                    fh,
                )
            os.replace(tmp, self._file(p))

    def to_df(self, spark: SparkSession) -> DataFrame:
        schema = T.StructType(
            [
                T.StructField("source_partition", T.IntegerType()),
                T.StructField("high_lsn", T.LongType()),
            ]
        )
        return spark.createDataFrame(list(self.get_all().items()), schema)


def filter_by_watermarks(
    df: DataFrame,
    watermarks: dict[int, int],
    lsn_col: str = "lsn",
    partition_col: str = "source_partition",
) -> DataFrame:
    """Drop events already applied (lsn <= partition's high watermark).

    The watermark dict is O(#partitions) — inlined as a literal MAP
    expression, so the filter is a pure map-side predicate pushed into the
    scan (no join, no shuffle, no driver round-trip per row)."""
    if not watermarks:
        return df
    pairs: list = []
    for p, lsn in watermarks.items():
        pairs.extend([F.lit(p), F.lit(lsn)])
    hwm = F.element_at(F.create_map(*pairs), F.col(partition_col))
    return df.filter(F.col(lsn_col) > F.coalesce(hwm, F.lit(-1)))
