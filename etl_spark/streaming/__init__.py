from etl_spark.streaming.stream import CdcStream, run_stream

__all__ = ["CdcStream", "run_stream"]
