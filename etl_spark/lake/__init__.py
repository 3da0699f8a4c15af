from etl_spark.lake.table import CommitConflict, LakeTable, SchemaEvolutionError
from etl_spark.lake.catalog import Catalog, CatalogTransaction

__all__ = [
    "LakeTable",
    "CommitConflict",
    "SchemaEvolutionError",
    "Catalog",
    "CatalogTransaction",
]
