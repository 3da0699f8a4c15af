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
    broadcast: bool | str = "auto",
    broadcast_threshold: int = 200_000,
) -> DataFrame:
    """Append ``output_column`` = dim[value_column] where
    fact[fact_key] == dim[dim_key] (first match wins, like the reference's
    linear scan; enforced by dropDuplicates on the dim key).

    ``broadcast``: True forces the hint, False leaves the strategy to
    AQE (shuffle hash/sort-merge — the safe shape when the "dimension"
    is actually big), "auto" (default) probes the dim with a
    ``limit(threshold+1).count()`` — the scan short-circuits at the
    limit, so the probe costs one tiny job — and only force-broadcasts
    a dim that is provably under ``broadcast_threshold`` rows. The
    reference loads the whole dim into driver memory unconditionally
    (/root/reference/migrate/migrate.go:215-255), which is exactly the
    failure mode the guard exists to avoid at scale."""
    output_column = output_column or value_column
    d = (
        dim.select(
            F.col(dim_key).alias("__lk"), F.col(value_column).alias(output_column)
        )
        .dropDuplicates(["__lk"])
    )
    if broadcast == "auto":
        broadcast = dim.limit(broadcast_threshold + 1).count() <= broadcast_threshold
    out = fact.join(
        F.broadcast(d) if broadcast else d, on=fact[fact_key] == d["__lk"], how="left"
    ).drop("__lk")
    if default is not None:
        out = out.withColumn(
            output_column, F.coalesce(F.col(output_column), F.lit(default))
        )
    return out
