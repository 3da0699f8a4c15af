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
``update_query`` (migrate.go:142-150) is parsed (UPDATE <t> SET ... WHERE
...) and executed as a bucket-pruned ``LakeTable.update``; postgres
sequence resync (migrate.go:177-210, ``update_sequence: true``) maps to
``LakeTable.resync_sequence`` — MAX(key)+1 persisted as the table's
next-surrogate-id counter.
"""

from __future__ import annotations

import json
import re
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
    update_sequence: bool = False
    # reference-YAML fields accepted for config compatibility
    # (/root/reference/examples/users.yaml): ``migrate: false`` skips the
    # entry (migrate.go gates on it); batch_size / skip_store_error /
    # clone_source are engine-managed here (Spark batching, dead-letter
    # validators, create-from-schema) and retained for introspection.
    migrate: bool = True
    batch_size: int = 0
    skip_store_error: bool = False
    clone_source: bool = False

    # reference field name -> engine field name
    _ALIASES = {
        "truncate_destination": "truncate",
        "keep_unmatched_fields": "keep_unmatched",
        "key_value_table": "key_value",
        "additional_fields": "additional_fields",
    }

    @classmethod
    def from_dict(cls, d: dict) -> "TableConfig":
        known = {f for f in cls.__dataclass_fields__}
        out = {}
        for k, v in d.items():
            k = cls._ALIASES.get(k, k)
            if k in known:
                out[k] = v
        return cls(**out)


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


def _load_config_dict(path: str) -> dict:
    with open(path) as fh:
        text = fh.read()
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml  # type: ignore
        except ImportError as e:  # pragma: no cover
            raise RuntimeError(
                "YAML config requires pyyaml; convert to JSON or install it"
            ) from e
        return yaml.safe_load(text)
    return json.loads(text)


def load_config(path: str) -> MigrationConfig:
    """Load JSON (always) or YAML (if a parser is available) config files —
    the cmd/main.go loadYaml/loadJson pair (/root/reference/cmd/main.go:78-107).

    A config with a ``files`` list is a file-of-files: each entry (joined
    with ``path`` if given) is loaded and its table/skip/clone lists are
    concatenated in order (/root/reference/cmd/main.go:38-67 runs each
    sub-file as its own migration; with a single lake destination the
    ordered merge is equivalent). One level of indirection, as in the
    reference."""
    import os

    d = _load_config_dict(path)
    files = d.get("files") or []
    if not files:
        return MigrationConfig.from_dict(d)
    root = d.get("path") or os.path.dirname(path)
    merged = MigrationConfig()
    for f in files:
        sub = MigrationConfig.from_dict(_load_config_dict(os.path.join(root, f)))
        merged.tables.extend(sub.tables)
        merged.skip_tables.extend(sub.skip_tables)
        merged.clone_tables.extend(sub.clone_tables)
    return merged


_UPDATE_HEAD_RE = re.compile(
    r"^\s*UPDATE\s+(\S+)\s+SET\s+(.+?)\s*;?\s*$", re.IGNORECASE | re.DOTALL
)


def _find_top_level_where(s: str) -> int:
    """Index of the first ``WHERE`` keyword at paren depth 0 outside any
    quoted string, or -1 (a regex would split on WHERE inside literals)."""
    depth, quote, i, n = 0, None, 0, len(s)
    while i < n:
        ch = s[i]
        if quote:
            if ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and s[i:i + 5].upper() == "WHERE":
            before_ok = i == 0 or s[i - 1].isspace()
            after = s[i + 5:i + 6]
            if before_ok and (after == "" or after.isspace()):
                return i
        i += 1
    return -1


def _split_top_level(s: str, sep: str) -> list[str]:
    """Split on ``sep`` at paren/quote depth 0 (SET lists contain function
    calls and string literals with commas)."""
    parts, depth, quote, cur = [], 0, None, []
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == sep and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def parse_update_query(sql: str) -> tuple[str, dict[str, str], str | None]:
    """Parse ``UPDATE <table> SET col = expr[, ...] [WHERE cond]`` into
    (table, {col: sql_expr}, where). Expressions/predicates are Spark SQL,
    matching the reference's raw destination SQL
    (/root/reference/migrate/migrate.go:142-150); FROM-subquery updates
    are out of scope (use LakeTable.merge for join-shaped updates)."""
    m = _UPDATE_HEAD_RE.match(sql)
    if not m:
        raise ValueError(f"unparseable UPDATE statement: {sql!r}")
    table, rest = m.group(1), m.group(2)
    wi = _find_top_level_where(rest)
    if wi >= 0:
        set_part, where = rest[:wi], rest[wi + 5:].strip()
    else:
        set_part, where = rest, None
    sets: dict[str, str] = {}
    for assign in _split_top_level(set_part, ","):
        col, eq, expr = assign.partition("=")
        if not eq:
            raise ValueError(f"bad SET assignment: {assign!r}")
        sets[col.strip().strip('"`')] = expr.strip()
    return table, sets, where.strip() if where else None


def build_table_frame(
    spark: SparkSession, cfg: TableConfig, source: DataFrame | None
) -> DataFrame:
    """Compile one TableConfig to its output DataFrame."""
    if cfg.update_query:
        raise NotImplementedError(
            "update_query configs are executed by run_migration against the "
            "destination lake table (LakeTable.update); they do not produce "
            "a source frame"
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
        # the shared `mapping` merges into EVERY multi-mapping entry, with
        # `mapping` winning on key conflicts (migrate.go:106-118: cMap
        # copied first, then mapping overwrites)
        entries = (
            [{**m, **cfg.mapping} for m in cfg.multiple_mapping]
            if cfg.mapping
            else cfg.multiple_mapping
        )
        df = multi_mapping(df, entries)
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
        # reference gate (migrate.go: `if tableConfig.Migrate {`); literal
        # rows (old_name == "nil") are dispatched regardless, as in the
        # reference's elif chain
        if not cfg.migrate and cfg.old_name != "nil":
            continue
        if cfg.update_query:
            # destination-side row-level UPDATE over an existing lake
            # table (reference runs it raw on the destination DB,
            # /root/reference/migrate/migrate.go:142-150)
            tname, sets, where = parse_update_query(cfg.update_query)
            name = cfg.new_name or tname
            table = LakeTable.load(spark, f"{dest_root}/{name}")
            table.update(sets, where)
            out[name] = table
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
        if cfg.update_sequence:
            # K11: reference resyncs the destination's Postgres sequence to
            # MAX(pk)+1 after load (migrate.go:177-210); the lake analogue
            # persists the next surrogate id in table metadata.
            table.resync_sequence()
        out[name] = table
    return out
