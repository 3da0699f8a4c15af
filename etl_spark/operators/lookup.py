"""Dimension lookup as a broadcast join.

`lookupIn('users','user_id',[user_uid],'user_id')`
(/root/reference/mapper/mapper.go:60-120) loads the whole dimension table
into memory (/root/reference/migrate/migrate.go:215-255) and memoizes
probes (mapper.go:86-91). The scale-correct Spark shape is a **broadcast
left join**: the dimension ships once per executor (the memo cache,
distributed), the fact side streams through map-side — zero shuffle."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lookup_in(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    value_column: str,
    output_column: str | None = None,
    default=None,
) -> DataFrame:
    """Append ``output_column`` = dim[value_column] where
    fact[fact_key] == dim[dim_key] (first match wins, like the reference's
    linear scan; enforced by dropDuplicates on the dim key)."""
    output_column = output_column or value_column
    d = (
        dim.select(
            F.col(dim_key).alias("__lk"), F.col(value_column).alias(output_column)
        )
        .dropDuplicates(["__lk"])
    )
    out = fact.join(
        F.broadcast(d), on=fact[fact_key] == d["__lk"], how="left"
    ).drop("__lk")
    if default is not None:
        out = out.withColumn(
            output_column, F.coalesce(F.col(output_column), F.lit(default))
        )
    return out
