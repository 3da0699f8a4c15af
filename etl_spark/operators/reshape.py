"""Reshaping operators: key-value unpivot (melt) and row multiplication.

The two genuinely relational reshape ops the reference implements in
imperative Go, re-expressed as single Catalyst `Generate`/`Expand` nodes —
narrow, pipelined, no shuffle:

- KV unpivot (`processKeyValueTable`, /root/reference/etl.go:226-300): one
  row becomes K ``(key, value[, value_type])`` rows with carried include
  columns. Spark: ``melt`` -> an Expand node.
- Row multiplication (`multiple_mapping`,
  /root/reference/migrate/migrate.go:82-119): each source row crossed with
  N mapping templates. Spark: ``explode(array(struct...))`` -> Generate.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_spark.operators.mapping import _TEMPLATE_RE, template_expr


def kv_unpivot(
    df: DataFrame,
    value_columns: list[str],
    include: list[str] | None = None,
    key_field: str = "key",
    value_field: str = "value",
    type_field: str | None = None,
    exclude_keys: list[str] | None = None,
    extra: dict[str, Any] | None = None,
) -> DataFrame:
    """Melt ``value_columns`` into (key, value) rows.

    Parity with /root/reference/etl.go:226-300: values stringified (bools
    normalized to 'true'/'false' like the reference's "0"/"1" handling at
    etl.go:274-281 — Spark's boolean->string cast already yields
    true/false); optional ``type_field`` carries the SOURCE column's type
    name (schema-as-data, GetDataTypeMap at etl.go:270-273) — resolved at
    plan time from the DataFrame schema, so it is a literal per melted
    column, not a runtime lookup. ``exclude_keys`` drops melted rows by key
    name (etl.go:291-297)."""
    include = include or []
    by_name = {f.name: f.dataType for f in df.schema.fields}
    structs = []
    for c in value_columns:
        fields = [
            F.lit(c).alias(key_field),
            F.col(c).cast("string").alias(value_field),
        ]
        if type_field:
            fields.append(F.lit(by_name[c].simpleString()).alias(type_field))
        structs.append(F.struct(*fields))
    out = df.select(
        *include, F.explode(F.array(*structs)).alias("_kv")
    ).select(*include, "_kv.*")
    if exclude_keys:
        out = out.filter(~F.col(key_field).isin(exclude_keys))
    for k, v in (extra or {}).items():
        if isinstance(v, str) and _TEMPLATE_RE.match(v.strip()):
            out = out.withColumn(k, template_expr(v))
        else:
            out = out.withColumn(k, F.lit(v))
    return out


def multi_mapping(df: DataFrame, mappings: list[dict[str, Any]]) -> DataFrame:
    """Each input row x N mapping templates -> N output rows
    (/root/reference/migrate/migrate.go:82-119, e.g. one user-settings row
    expanding to `default_company` + `default_service` rows). Template
    values may reference source columns or ``{{...}}`` expressions; all
    templates must share a key set."""
    if not mappings:
        return df.limit(0)
    keys = list(mappings[0])
    structs = []
    for m in mappings:
        if list(m) != keys:
            raise ValueError("all multi_mapping templates must share one key set")
        fields = []
        for k in keys:
            v = m[k]
            if isinstance(v, str) and _TEMPLATE_RE.match(v.strip()):
                fields.append(template_expr(v).alias(k))
            elif isinstance(v, str) and v in df.columns:
                fields.append(F.col(v).alias(k))
            else:
                fields.append(F.lit(v).alias(k))
        structs.append(F.struct(*fields))
    return df.select(F.explode(F.array(*structs)).alias("_m")).select("_m.*")
