"""etl_spark — a PySpark-native CDC / incremental-ingest analytics engine.

A from-scratch re-expression of the capabilities of oarkflow/etl (Go) on
idiomatic Spark: DataFrame/SQL logical plans, Structured Streaming ingest,
snapshot-committed lake tables with MERGE semantics, schema evolution,
exactly-once sinks, and a library of dataflow operators (mapping, unpivot,
dedup, similarity, text analysis) designed for 100 TB-scale execution.

Layout:
  lake/       snapshot-based parquet table format (MERGE, schema evolution)
  cdc/        changelog generator, LWW dedup, batch apply, commit/watermark state
  streaming/  Structured Streaming tail (readStream -> foreachBatch(apply))
  operators/  reference operator surface (map/melt/explode/filter/dedup/...)
  functions/  column-expression function library (text, vectors)
  sources/    file/http-style sources and file sinks
  plans/      config-driven pipeline builder (YAML/JSON table configs)
"""

__version__ = "0.2.0"
