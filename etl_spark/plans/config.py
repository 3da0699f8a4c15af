"""Config-driven pipelines: the YAML/JSON TableConfig interpreter.

Re-expression of the reference's config entry point
(/root/reference/cmd/main.go:20-51 -> /root/reference/migrate/migrate.go:63-137,
TableConfig at /root/reference/migrate/migrate.go:19-43): a declarative
table list where each entry either maps columns (with ``{{...}}``
templates), multiplies rows through mapping templates, runs a raw SQL
query, or key-value-unpivots — here compiled to a DataFrame plan instead
of interpreted per row, so Catalyst sees the whole pipeline.

Dispatch parity with migrate.Data:
  a) ``query``            -> spark.sql over registered temp views
                             (migrate.go:69-74; pushdown joins/DISTINCT)
  b) ``mapping``          -> field_map projection (migrate.go:79-105)
  c) ``multiple_mapping`` -> explode row multiplication (migrate.go:106-121)
  d) ``key_value``        -> kv_unpivot (etl.go:226-300)
  e) ``old_name: nil``    -> single literal row (migrate.go:157-176)
  f) ``truncate``         -> overwrite instead of append (migrate.go:128-136)
``update_query`` (migrate.go:142-150) and postgres sequence resync
(migrate.go:177-210) are destination-DB-side operations with no lake
analogue; they raise with pointers to the MERGE/overwrite equivalents.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from etl_spark.lake import LakeTable
from etl_spark.operators import (
    field_map,
    isin_filter,
    kv_unpivot,
    lowercase_columns,
    multi_mapping,
)


@dataclass
class TableConfig:
    old_name: str = ""
    new_name: str = ""
    query: str = ""
    update_query: str = ""
    mapping: dict[str, Any] = field(default_factory=dict)
    multiple_mapping: list[dict[str, Any]] = field(default_factory=list)
    keep_unmatched: bool = False
    additional_fields: dict[str, Any] = field(default_factory=dict)
    filters: dict[str, list] = field(default_factory=dict)  # col -> IN-list
    key_value: bool = False
    include_fields: list[str] = field(default_factory=list)
    exclude_fields: list[str] = field(default_factory=list)
    extra_values: dict[str, Any] = field(default_factory=dict)
    key_field: str = "key"
    value_field: str = "value"
    type_field: str = ""
    truncate: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "TableConfig":
        known = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v for k, v in d.items() if k in known})


@dataclass
class MigrationConfig:
    tables: list[TableConfig] = field(default_factory=list)
    skip_tables: list[str] = field(default_factory=list)
    clone_tables: list[str] = field(default_factory=list)

    @classmethod
    def from_dict(cls, d: dict) -> "MigrationConfig":
        return cls(
            tables=[TableConfig.from_dict(t) for t in d.get("tables", [])],
            skip_tables=list(d.get("skip_tables", [])),
            clone_tables=list(d.get("clone_tables", [])),
        )


def load_config(path: str) -> MigrationConfig:
    """Load JSON (always) or YAML (if a parser is available) config files —
    the cmd/main.go loadYaml/loadJson pair (/root/reference/cmd/main.go:78-107)."""
    with open(path) as fh:
        text = fh.read()
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "YAML config requires pyyaml; convert to JSON or install it"
            ) from e
        return MigrationConfig.from_dict(yaml.safe_load(text))
    return MigrationConfig.from_dict(json.loads(text))


def build_table_frame(
    spark: SparkSession, cfg: TableConfig, source: DataFrame | None
) -> DataFrame:
    """Compile one TableConfig to its output DataFrame."""
    if cfg.update_query:
        raise NotImplementedError(
            "update_query is a destination-DB mutation; use LakeTable.merge "
            "(row-level upsert) or overwrite instead"
        )
    if cfg.query:
        df = spark.sql(cfg.query)
    elif cfg.old_name == "nil":
        # literal single row evaluated from the mapping with empty input
        # (/root/reference/migrate/migrate.go:157-176)
        df = spark.range(1).drop("id")
        return field_map(df, cfg.mapping)
    elif source is not None:
        df = source
    else:
        raise ValueError(f"table config {cfg.new_name!r} has no source")

    df = lowercase_columns(df)
    for col, values in cfg.filters.items():
        df = isin_filter(df, col, values)
    if cfg.multiple_mapping:
        df = multi_mapping(df, cfg.multiple_mapping)
    elif cfg.mapping:
        df = field_map(
            df, cfg.mapping,
            keep_unmatched=cfg.keep_unmatched,
            additional=cfg.additional_fields or None,
        )
    if cfg.key_value:
        value_cols = [
            c for c in df.columns
            if c not in cfg.include_fields and c not in cfg.exclude_fields
        ]
        df = kv_unpivot(
            df,
            value_columns=value_cols,
            include=cfg.include_fields,
            key_field=cfg.key_field,
            value_field=cfg.value_field,
            type_field=cfg.type_field or None,
            exclude_keys=cfg.exclude_fields,
            extra=cfg.extra_values or None,
        )
    return df


def run_migration(
    spark: SparkSession,
    config: MigrationConfig,
    sources: dict[str, DataFrame],
    dest_root: str,
    n_buckets: int = 16,
    keys: dict[str, list[str]] | None = None,
) -> dict[str, LakeTable]:
    """Run every table config: build the frame, write it to a lake table
    under ``dest_root/<new_name>`` (overwrite when ``truncate``, else
    append). ``sources`` maps old_name -> DataFrame (registered as temp
    views for ``query`` configs — the pushdown-SQL path)."""
    for name, df in sources.items():
        df.createOrReplaceTempView(name)
    out: dict[str, LakeTable] = {}
    for cfg in config.tables:
        if cfg.old_name in config.skip_tables:
            continue
        df = build_table_frame(spark, cfg, sources.get(cfg.old_name))
        name = cfg.new_name or cfg.old_name
        path = f"{dest_root}/{name}"
        key = (keys or {}).get(name, df.columns[:1])
        table = LakeTable.create(
            spark, path, df.schema, key=key, n_buckets=n_buckets,
            if_not_exists=True,
        )
        if cfg.truncate:
            table.overwrite(df)
        else:
            table.append(df)
        out[name] = table
    return out
