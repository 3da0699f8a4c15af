from etl_spark.lake.table import CommitConflict, LakeTable, SchemaEvolutionError
from etl_spark.lake.catalog import Catalog, CatalogTransaction

# NOTE: lake.export / lake.replicate are imported by module path
# (they depend on cdc.apply, which imports this package — re-exporting
# them here would be a circular import).

__all__ = [
    "LakeTable",
    "CommitConflict",
    "SchemaEvolutionError",
    "Catalog",
    "CatalogTransaction",
]
