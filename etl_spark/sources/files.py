"""File sources and sinks (CSV / JSON), batch and streaming.

Reference parity:
- v2 FileSource streams CSV/JSON records onto a channel
  (/root/reference/v2/source/file.go:26-38). Spark shape: ``spark.read``
  for batch, ``spark.readStream`` over a directory for the streaming tail
  — partitioned, predicate-pushdown-capable scans instead of a
  single-goroutine record loop.
- v2 FileLoader writes a JSON array (maintaining the trailing ``]`` across
  appends) or CSV with a sorted header from the first record
  (/root/reference/v2/loader/file.go:31-221). Spark shape: distributed
  ``df.write`` — JSON-lines rather than a single JSON array, because one
  growing array file is inherently single-writer and unmergeable at scale
  (documented intentional divergence); CSV keeps the sorted-header
  contract via an explicit sorted column projection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def parquet_row_count(path: str) -> int:
    """Exact row count of a parquet file/directory from the FOOTERS only —
    O(#files) metadata reads, no data scan, no Spark job. The scale-safe
    way to size driver-side samples (IVF training) or validate loads: at
    10^10 rows a ``df.count()`` is a full cluster scan, the footers are a
    driver-side listing."""
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        total = 0
        for root, _dirs, names in os.walk(path):
            for n in names:
                if n.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(root, n)).metadata.num_rows
        return total
    return pq.ParquetFile(path).metadata.num_rows


def read_csv_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    streaming: bool = False,
    lowercase_columns: bool = True,
    **options,
) -> DataFrame:
    """CSV scan (batch or streaming directory tail). Column names are
    lowercased by default — the reference sanitizes every record's keys to
    lowercase on ingest (/root/reference/etl.go:152-159); doing it as a
    plan-time rename is free."""
    reader = spark.readStream if streaming else spark.read
    reader = reader.option("header", header)
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    elif not streaming:
        reader = reader.option("inferSchema", True)
    df = reader.csv(path)
    if lowercase_columns:
        df = df.toDF(*[c.lower() for c in df.columns])
    return df


def read_json_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    streaming: bool = False,
    lowercase_columns: bool = True,
    **options,
) -> DataFrame:
    """JSON-lines (or multiline JSON array with ``multiLine=True``) scan."""
    reader = spark.readStream if streaming else spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    if lowercase_columns:
        df = df.toDF(*[c.lower() for c in df.columns])
    return df


def write_csv_sink(
    df: DataFrame,
    path: str,
    mode: str = "append",
    sorted_header: bool = True,
    single_file: bool = False,
) -> None:
    """CSV sink. ``sorted_header`` mirrors the reference's
    sorted-keys-from-first-record header (/root/reference/v2/loader/
    file.go:190-197). ``single_file`` coalesces to one part — only for
    small exports; a 100 TB result stays many-part."""
    if sorted_header:
        df = df.select(*sorted(df.columns))
    if single_file:
        df = df.coalesce(1)
    df.write.mode(mode).option("header", True).csv(path)


def write_json_sink(
    df: DataFrame,
    path: str,
    mode: str = "append",
    single_file: bool = False,
) -> None:
    """JSON-lines sink (the scale-correct analogue of the reference's
    append-into-one-array loader, /root/reference/v2/loader/file.go:31-171)."""
    if single_file:
        df = df.coalesce(1)
    df.write.mode(mode).json(path)


def read_orc_source(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    streaming: bool = False,
    lowercase_columns: bool = True,
    **options,
) -> DataFrame:
    """ORC scan (batch or streaming directory tail) — same columnar
    pushdown/pruning properties as parquet (ORC is Spark-native; no
    extra jars). Extends the reference's CSV/JSON file-source family
    (/root/reference/v2/source/file.go:26-38) with the warehouse format
    Hive-side producers emit."""
    reader = spark.readStream if streaming else spark.read
    for k, v in options.items():
        reader = reader.option(k, v)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.orc(path)
    if lowercase_columns:
        df = df.toDF(*[c.lower() for c in df.columns])
    return df


def write_orc_sink(
    df: DataFrame,
    path: str,
    mode: str = "append",
    single_file: bool = False,
) -> None:
    """ORC sink (columnar, splittable, predicate-pushdown-readable —
    unlike the reference's JSON-array loader this stays mergeable and
    scan-efficient at any size)."""
    if single_file:
        df = df.coalesce(1)
    df.write.mode(mode).orc(path)


def console_sink(
    df: DataFrame, n: int = 20, truncate: bool = True, verbose: bool = False
) -> int:
    """Console / verbose loader (/root/reference/v2/loader/loaders.go:11-47):
    prints up to ``n`` rows; ``verbose`` also prints the schema (the
    reference's payload-dump variant). Returns the number of rows shown.
    Debug-only by design — it collects ``n`` rows to the driver and
    nothing else."""
    if verbose:
        df.printSchema()
    shown = df.limit(n)
    shown.show(n, truncate=truncate)
    return shown.count()
