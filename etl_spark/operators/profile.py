"""Column profiling — the data-quality census a training-data pipeline
runs before (and after) every major transform.

Two modes with one output shape (one row per profiled column):

- ``profile_exact``: bit-reproducible statistics. Exact distinct counts
  make Catalyst plan an Expand (one projected copy of the scan per
  DISTINCT column), so the pass costs ~n_cols × scan — the correctness
  baseline and the DuckDB-oracle mode, fine at audit cadence.
- ``profile_approx``: the 100-TB mode. ONE pass, no Expand — distinct
  counts via HyperLogLog++ (``approx_count_distinct``, mergeable
  register sketches, map-side combined like any partial agg) and
  quantiles via ``percentile_approx`` (Greenwald-Khanna, also
  mergeable). Error is bounded by ``rsd`` / ``pa_accuracy``; tests pin
  both against the exact profile.

Everything is built-in JVM aggregation — no UDFs, no collect beyond the
O(n_cols) result. Numeric sums ACCUMULATE in DECIMAL(38,6) so the
parallel Spark sum and any sequential oracle sum agree bit-exactly
(float addition is not associative; decimal is), then surface as DOUBLE
— one exact-to-float conversion at the very end.

The reference has no profiling surface (closest is its console loader's
schema dump, /root/reference/v2/loader/loader.go); this is a
first-class extension for the LLM-data-pipeline family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType,
    T.FloatType, T.DoubleType, T.DecimalType,
)

_DEC = "decimal(38,6)"


def _null_dbl() -> Column:
    return F.lit(None).cast("double")


def profile_exact(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact per-column profile: (col_name, n_rows, n_nulls, n_distinct,
    min_num, max_num, sum_num, sum_len). Numeric stats are NULL for
    string columns and vice versa; unsupported types keep counts only.

    One aggregation job; the row-per-column output is emitted with a
    single ``inline(array(structs))`` over the aggregate row (a union of
    per-column selects would re-scan the table once per column)."""
    cols = cols or [f.name for f in df.schema.fields]
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        dt = df.schema[c].dataType
        aggs.append(F.count(F.col(c)).alias(f"__nn_{i}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__nd_{i}"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__mn_{i}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__mx_{i}"))
            aggs.append(
                F.sum(F.col(c).cast(_DEC)).cast("double").alias(f"__sm_{i}")
            )
        elif isinstance(dt, T.StringType):
            aggs.append(
                F.sum(F.length(F.col(c)).cast("long")).alias(f"__sl_{i}")
            )
    row = df.agg(*aggs)
    structs = []
    for i, c in enumerate(cols):
        dt = df.schema[c].dataType
        is_num = isinstance(dt, _NUMERIC)
        is_str = isinstance(dt, T.StringType)
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{i}")).alias("n_nulls"),
                F.col(f"__nd_{i}").alias("n_distinct"),
                (F.col(f"__mn_{i}") if is_num else _null_dbl()).alias("min_num"),
                (F.col(f"__mx_{i}") if is_num else _null_dbl()).alias("max_num"),
                (F.col(f"__sm_{i}") if is_num else _null_dbl()).alias("sum_num"),
                (
                    F.col(f"__sl_{i}") if is_str
                    else F.lit(None).cast("long")
                ).alias("sum_len"),
            )
        )
    return row.select(F.inline(F.array(*structs)))


def profile_approx(
    df: DataFrame,
    cols: list[str] | None = None,
    rsd: float = 0.05,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
    pa_accuracy: int = 10_000,
) -> DataFrame:
    """Single-pass sketch profile: (col_name, n_rows, n_nulls,
    approx_distinct, min_num, max_num, quantiles). Distincts are HLL++
    with relative standard deviation ``rsd``; ``quantiles`` (numeric
    columns) are Greenwald-Khanna with rank error 1/``pa_accuracy``.
    Both sketches partial-aggregate map-side, so the shuffle carries one
    sketch per column per map task — O(cols), never O(rows)."""
    cols = cols or [f.name for f in df.schema.fields]
    qs = list(quantiles)
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        dt = df.schema[c].dataType
        aggs.append(F.count(F.col(c)).alias(f"__nn_{i}"))
        aggs.append(F.approx_count_distinct(F.col(c), rsd).alias(f"__ad_{i}"))
        if isinstance(dt, _NUMERIC):
            aggs.append(F.min(F.col(c)).cast("double").alias(f"__mn_{i}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"__mx_{i}"))
            aggs.append(
                F.percentile_approx(
                    F.col(c).cast("double"), qs, pa_accuracy
                ).alias(f"__pq_{i}")
            )
    row = df.agg(*aggs)
    structs = []
    for i, c in enumerate(cols):
        is_num = isinstance(df.schema[c].dataType, _NUMERIC)
        structs.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__nn_{i}")).alias("n_nulls"),
                F.col(f"__ad_{i}").alias("approx_distinct"),
                (F.col(f"__mn_{i}") if is_num else _null_dbl()).alias("min_num"),
                (F.col(f"__mx_{i}") if is_num else _null_dbl()).alias("max_num"),
                (
                    F.col(f"__pq_{i}") if is_num
                    else F.lit(None).cast("array<double>")
                ).alias("quantiles"),
            )
        )
    return row.select(F.inline(F.array(*structs)))


def turn_integrity(
    df: DataFrame,
    key_cols: list[str],
    idx_col: str,
) -> DataFrame:
    """Per-conversation turn-index integrity report — the convergence
    audit for a CDC-maintained transcript table keyed on
    ``(conv_id, turn_idx)``: after any replay, every conversation should
    hold exactly one row per turn index with no duplicates and no gaps
    (an out-of-order delete that lost its tombstone, or a double-applied
    insert, shows up here before it shows up in training data).

    Output, one row per key: ``n_turns`` (rows), ``n_distinct_idx``,
    ``min_idx`` / ``max_idx``, ``n_dup_idx`` (rows minus distinct — >0
    means a duplicated turn index survived dedup), ``has_gaps``
    (the index range is wider than the distinct count — a turn is
    missing), ``contiguous`` (no duplicates, no gaps: the healthy
    state).

    ONE hash aggregation (map-side combinable except the exact distinct,
    which Catalyst plans as a single Expand over the key shuffle — at
    audit cadence, the exactness is the point; NULL indexes count toward
    ``n_turns`` but not ``n_distinct_idx``, so they surface as
    duplicates/gaps rather than vanishing).
    """
    idx = F.col(idx_col)
    agg = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.count_distinct(idx).alias("n_distinct_idx"),
        F.min(idx).alias("min_idx"),
        F.max(idx).alias("max_idx"),
    )
    span = F.col("max_idx") - F.col("min_idx") + F.lit(1)
    return agg.select(
        *key_cols,
        "n_turns",
        "n_distinct_idx",
        "min_idx",
        "max_idx",
        (F.col("n_turns") - F.col("n_distinct_idx")).alias("n_dup_idx"),
        (span != F.col("n_distinct_idx")).alias("has_gaps"),
        (
            (F.col("n_turns") == F.col("n_distinct_idx"))
            & (span == F.col("n_distinct_idx"))
        ).alias("contiguous"),
    )
