from etl_spark.sources.files import (
    console_sink,
    parquet_row_count,
    read_csv_source,
    read_json_source,
    read_orc_source,
    write_csv_sink,
    write_json_sink,
    write_orc_sink,
)
from etl_spark.sources.http import fetch_urls, http_json_source

__all__ = [
    "read_csv_source",
    "console_sink",
    "read_json_source",
    "read_orc_source",
    "write_csv_sink",
    "write_json_sink",
    "write_orc_sink",
    "http_json_source",
    "fetch_urls",
    "parquet_row_count",
]
