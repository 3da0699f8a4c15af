"""Filter / validator operators.

- Rule filters: AND-combined predicates applied before row processing
  (/root/reference/etl.go:117-144; example IN-list rule at
  /root/reference/examples/main.go:38-49) -> plain Catalyst Filter, pushed
  into the scan.
- Required-field validator (/root/reference/v2/transfomer/transformers.go:22-31)
  and validator chain with drop-on-error (/root/reference/v2/etl.go:121-141)
  -> declarative predicate split: valid stream + dead-letter stream, each a
  filter over one cached scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def isin_filter(df: DataFrame, column: str, values: Sequence) -> DataFrame:
    """`code IN (...)` rule filter (/root/reference/examples/main.go:38-49)."""
    return df.filter(F.col(column).isin(list(values)))


def required_fields(df: DataFrame, fields: Sequence[str]) -> DataFrame:
    """Drop records missing any required field
    (/root/reference/v2/transfomer/transformers.go:22-31)."""
    pred = F.lit(True)
    for f in fields:
        pred = pred & F.col(f).isNotNull()
    return df.filter(pred)


def validator_split(
    df: DataFrame, validators: Sequence[tuple[str, Column]]
) -> tuple[DataFrame, DataFrame]:
    """(valid, dead) split. ``dead`` carries an ``error`` column naming the
    first failed validator — the declarative replacement for the
    reference's row-at-a-time failed-data salvage
    (/root/reference/etl.go:302-333)."""
    if not validators:
        return df, df.limit(0).withColumn("error", F.lit(None).cast("string"))
    ok = validators[0][1]
    for _, p in validators[1:]:
        ok = ok & p
    err = F.coalesce(
        *[F.when(~p, F.lit(name)) for name, p in validators], F.lit(None)
    )
    return df.filter(ok), df.filter(~ok).withColumn("error", err)
