from etl_spark.plans.config import (
    MigrationConfig,
    TableConfig,
    build_table_frame,
    load_config,
    run_migration,
)

__all__ = [
    "TableConfig",
    "MigrationConfig",
    "load_config",
    "build_table_frame",
    "run_migration",
]
