from etl_spark.functions import text, vectors  # noqa: F401
