from etl_spark.streaming.stream import CdcStream, Scd2Stream, run_stream

__all__ = ["CdcStream", "Scd2Stream", "run_stream"]
