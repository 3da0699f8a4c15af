from etl_spark.lake.table import CommitConflict, LakeTable, SchemaEvolutionError

__all__ = ["LakeTable", "CommitConflict", "SchemaEvolutionError"]
