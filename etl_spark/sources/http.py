"""HTTP JSON source (driver-side fetch -> DataFrame).

Parity with the reference's HTTPSource (GET url, unmarshal a JSON array of
records, emit on a channel — /root/reference/v2/source/http.go:29-56).
HTTP endpoints are outside Spark's distributed-source model: a single URL
has no offsets/splits, so the fetch is a driver-side bootstrap followed by
``createDataFrame`` — appropriate for small dimension/config payloads only
(exactly how the reference uses it). Network access may be absent in the
test sandbox; callers get the underlying ``URLError`` untouched."""

from __future__ import annotations

import json
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def http_json_source(
    spark: SparkSession,
    url: str,
    schema: T.StructType | None = None,
    timeout: float = 30.0,
    lowercase_columns: bool = True,
) -> DataFrame:
    with urllib.request.urlopen(url, timeout=timeout) as resp:
        payload = json.loads(resp.read().decode("utf-8"))
    if isinstance(payload, dict):
        payload = [payload]
    if lowercase_columns:
        payload = [{k.lower(): v for k, v in rec.items()} for rec in payload]
    if schema is not None:
        return spark.createDataFrame(payload, schema)
    return spark.createDataFrame(payload)
