"""Destination-schema type coercion.

Re-expression of `fixFieldType` (/root/reference/etl.go:530-554, applied
per batch at etl.go:164-168): the reference fetches the destination table's
field types and coerces each row value — int via strconv fallback, boolean
via "1"/"true"/"0"/"false" normalization (else NULL), everything else
passthrough. Here it is a single projection of casts; Catalyst folds it
into the scan."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _coerce_bool(c: Column) -> Column:
    """'1'/'true' -> true, '0'/'false' -> false, else NULL — exactly the
    reference's boolean switch (/root/reference/etl.go:540-548)."""
    s = F.lower(F.trim(c.cast("string")))
    return (
        F.when(s.isin("1", "true", "t", "yes"), F.lit(True))
        .when(s.isin("0", "false", "f", "no"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )


def coerce_to_schema(df: DataFrame, target: T.StructType,
                     keep_extra: bool = False) -> DataFrame:
    """Cast every matching column to the destination type; missing columns
    become NULLs; extra columns drop unless ``keep_extra``. String->int
    parse failures become NULL (ANSI off for try_cast semantics)."""
    have = {f.name for f in df.schema.fields}
    cols: list[Column] = []
    for f in target.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif isinstance(f.dataType, T.BooleanType):
            cols.append(_coerce_bool(F.col(f.name)).alias(f.name))
        elif isinstance(f.dataType, (T.IntegerType, T.LongType, T.ShortType)):
            cols.append(
                F.trim(F.col(f.name).cast("string"))
                .try_cast(f.dataType)
                .alias(f.name)
            )
        else:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
    if keep_extra:
        target_names = {f.name for f in target.fields}
        cols.extend(F.col(c) for c in df.columns if c not in target_names)
    return df.select(*cols)
