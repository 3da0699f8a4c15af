"""Temporal joins and history tracking: as-of join, interval (range)
join, SCD2 history.

The reference engine has no temporal operators — these are the
training-data / CDC-ingest extensions a transcript pipeline needs:
join each event to the dimension version valid at event time (as-of),
attribute points to time windows (interval join), and keep the full
versioned history of every key instead of last-writer-wins (SCD2 — the
history-preserving complement of ``cdc.apply.dedup_last_writer_wins``).

All three are single-shuffle shapes:

- ``asof_join`` is the union-and-window trick: tag both sides, union,
  one window per key ordered by time carrying the last-seen right
  payload forward. ONE shuffle on the keys — never a per-key collect,
  never a broadcast of the (big) right side, no range-explosion. This
  is how you as-of join two 10^10-row tables.
- ``interval_join`` bins the time axis: points land in exactly one bin,
  intervals explode into the bins they cover, and the match becomes a
  bin-key equi-join + exact containment filter. Each qualifying pair
  is emitted exactly once (the point's bin is unique), so no dedup
  pass. Shuffle volume = points + sum(interval spans)/bin_width.
- ``scd2_history`` is two windows over one shuffle (lag to detect
  change, lead to close validity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_time: str,
    right_time: str | None = None,
    right_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_time <= left_time`` (direction="backward", inclusive) or the
    least ``right_time >= left_time`` ("forward") within the same
    ``keys`` — i.e. ANSI/DuckDB ``ASOF LEFT JOIN`` semantics. Unmatched
    left rows keep NULL right columns.

    Implementation: union both sides with a tag, then one running
    ``last(right_payload, ignorenulls=True)`` window per key ordered by
    (time, tag). The right payload is packed into a single struct so the
    fill is ONE window expression regardless of column count. At equal
    timestamps the right row sorts first (tag 0 < 1), making the bound
    inclusive. Exactly one shuffle (the window partitioning); both sides
    stream through it — nothing is collected or broadcast, so the shape
    holds when both sides are billions of rows. Skewed keys degrade to a
    per-key sort like any window — pre-split pathological keys upstream.

    The right side should be unique per ``(keys, right_time)``; with
    duplicates the matched row among equals is unspecified (pass a
    deduplicated frame, e.g. ``dropDuplicates``, for determinism).

    ``tolerance_seconds`` nulls the match when the time gap exceeds it
    (pandas ``merge_asof`` tolerance).
    """
    if not keys:
        raise ValueError("asof_join requires at least one key column")
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    right_time = right_time or left_time
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in keys and c != right_time]

    out_names = {}
    for c in right_cols:
        out_names[c] = c + suffix if c in left.columns else c
    matched_t = "__asof_t" + suffix

    rp = F.struct(
        F.col(right_time).alias(matched_t),
        *[F.col(c).alias(out_names[c]) for c in right_cols],
    )
    r = right.select(
        *keys,
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__tag"),
        rp.alias("__rp"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in keys],
    )
    l = left.select(
        *keys,
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__tag"),
        F.lit(None).cast(r.schema["__rp"].dataType).alias("__rp"),
        *[c for c in left.columns if c not in keys],
    )

    order = [F.col("__t").asc(), F.col("__tag").asc()]
    if direction == "forward":
        order = [F.col("__t").desc(), F.col("__tag").asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r.unionByName(l).withColumn(
        "__fill", F.last("__rp", ignorenulls=True).over(w)
    )

    fill: Column = F.col("__fill")
    if tolerance_seconds is not None:
        gap = F.unix_timestamp("__t") - F.unix_timestamp(
            F.col("__fill")[matched_t]
        )
        if direction == "forward":
            gap = -gap
        fill = F.when(gap <= F.lit(tolerance_seconds), F.col("__fill"))

    return (
        filled.filter(F.col("__tag") == 1)
        .select(
            *keys,
            F.col("__t").alias(left_time),
            *[c for c in left.columns if c not in keys and c != left_time],
            *[fill[out_names[c]].alias(out_names[c]) for c in right_cols],
        )
    )


def enrich_history(
    facts: DataFrame,
    history: DataFrame,
    keys: list[str],
    fact_time: str,
    payload_cols: list[str] | None = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    suffix: str = "_dim",
) -> DataFrame:
    """Temporal dimension lookup: attach to each fact the dimension
    version whose validity interval contains the fact's time —
    ``valid_from <= t < valid_to`` (half-open; NULL valid_to = open/
    current) against an SCD2 history (``scd2_history`` /
    ``cdc.scd2.apply_scd2`` output). The fact-to-dimension join every
    warehouse pipeline runs ("price as of the order", "user segment as
    of the event"). Facts before the key's first version, or inside a
    delete-closed coverage GAP, enrich to NULL like an unmatched left
    join.

    Implementation: empty intervals (valid_to == valid_from — an
    equal-timestamp change or a same-instant delete-close) are dropped
    first (they contain no points under half-open semantics, and
    dropping them makes (keys, valid_from) unique so the match is
    deterministic); then ONE ``asof_join`` on valid_from (single
    shuffle, both sides stream — holds at 10^10 facts x 10^9 dimension
    versions); then a pure expression pass nullifies matches whose
    version was already closed at fact time. Never an interval
    explosion, never a broadcast of the history."""
    if payload_cols is None:
        payload_cols = [
            c for c in history.columns
            if c not in keys
            and c not in (valid_from, valid_to, "is_current", "version")
        ]
    hist = history.filter(
        F.col(valid_to).isNull() | (F.col(valid_to) > F.col(valid_from))
    )
    joined = asof_join(
        facts, hist, keys, left_time=fact_time, right_time=valid_from,
        right_cols=payload_cols + [valid_to], suffix=suffix,
    )
    vt = valid_to + suffix if valid_to in facts.columns else valid_to
    open_at_t = F.col(vt).isNull() | (F.col(fact_time) < F.col(vt))
    out = joined
    for c in payload_cols:
        name = c + suffix if c in facts.columns else c
        out = out.withColumn(name, F.when(open_at_t, F.col(name)))
    return out.drop(vt)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_time: str,
    interval_start: str,
    interval_end: str,
    keys: list[str] | None = None,
    bin_seconds: int = 3600,
    how: str = "inner",
    max_bins_per_interval: int = 100_000,
) -> DataFrame:
    """Join every point row to every interval row with
    ``interval_start <= point_time <= interval_end`` (and equal ``keys``
    if given) — a range/containment join without a cartesian product.

    Both sides are bucketed onto a shared time grid of ``bin_seconds``:
    a point belongs to exactly one bin; an interval covers
    ``span/bin_seconds + 1`` bins (``sequence`` + ``explode``). The
    match is then a plain equi-join on (keys, bin) + the exact
    containment filter, which Catalyst runs as a shuffled hash join —
    never the BroadcastNestedLoopJoin a raw inequality join degrades to.
    Each qualifying pair appears exactly once because the point's bin is
    unique. Pick ``bin_seconds`` near the median interval span: smaller
    bins replicate intervals, larger bins inflate the post-join filter.
    Intervals longer than ``max_bins_per_interval`` bins raise rather
    than silently exploding the build side (an open-ended interval with
    a 1s grid would OOM any cluster).

    ``how="left"`` keeps unmatched points with NULL interval columns.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")
    keys = keys or []
    b0 = F.floor(F.unix_timestamp(F.col(interval_start)) / bin_seconds)
    b1 = F.floor(F.unix_timestamp(F.col(interval_end)) / bin_seconds)
    guard = F.when(
        b1 - b0 < max_bins_per_interval, F.sequence(b0, b1)
    ).otherwise(F.raise_error(F.concat(
        F.lit(f"interval spans more than {max_bins_per_interval} bins of "
              f"{bin_seconds}s: "),
        F.col(interval_start).cast("string"), F.lit(" .. "),
        F.col(interval_end).cast("string"),
    )))
    # alias both sides so self-derived lineage (points and intervals cut
    # from the same source frame) resolves unambiguously
    iv = intervals.withColumn("__bin", F.explode(guard)).alias("__iv")
    pt = points.withColumn(
        "__bin", F.floor(F.unix_timestamp(F.col(point_time)) / bin_seconds)
    ).alias("__pt")
    cond = F.col("__pt.__bin") == F.col("__iv.__bin")
    for k in keys:
        cond = cond & (F.col(f"__pt.{k}") == F.col(f"__iv.{k}"))
    cond = cond & (F.col(f"__pt.{point_time}") >= F.col(f"__iv.{interval_start}"))
    cond = cond & (F.col(f"__pt.{point_time}") <= F.col(f"__iv.{interval_end}"))
    joined = pt.join(iv, on=cond, how=how)
    return joined.select(
        *[F.col(f"__pt.{c}") for c in points.columns],
        *[F.col(f"__iv.{c}") for c in intervals.columns if c not in keys],
    )


def scd2_history(
    changelog: DataFrame,
    keys: list[str],
    time_col: str,
    payload_cols: list[str] | None = None,
    tiebreak: list[str] | None = None,
    change_only: bool = True,
    op_col: str | None = None,
    delete_op: str = "D",
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Slowly-changing-dimension type 2: turn a changelog of observed
    states into versioned validity rows — one row per (key, version)
    with ``valid_from`` (inclusive), ``valid_to`` (exclusive, NULL while
    current) and ``is_current``. The history-preserving complement of
    last-writer-wins CDC apply: LWW keeps the latest state, SCD2 keeps
    every state with the interval it was true.

    ``change_only=True`` (default) collapses consecutive identical
    payloads first (a ``lag`` comparison), so a heartbeat feed that
    re-observes the same state doesn't mint empty versions.

    With ``op_col`` given, events whose op equals ``delete_op`` CLOSE
    the key's current version (its ``valid_to`` = the delete's time)
    without minting one; a later event reopens the key at the next
    version number. Consecutive deletes collapse; a delete with nothing
    open (leading, or for an absent key) is a no-op. Delete rows never
    appear in the output. Same alphabet as ``cdc.scd2.apply_scd2`` —
    the incremental apply converges to exactly this frame.

    ``carry_cols`` ride along on each version (the value of the event
    that opened it) without participating in change detection — e.g.
    the wall-clock event time when the validity axis is an LSN.

    Two window passes over ONE shuffle on ``keys`` (lag for the change
    flag, lead for the closing edge, a cumulative non-delete count for
    the version — all share the same partitioning/ordering, so Catalyst
    plans a single Exchange + sort). ``tiebreak`` columns break
    equal-timestamp ordering deterministically (e.g. an LSN / event id).
    """
    if not keys:
        raise ValueError("scd2_history requires at least one key column")
    carry_cols = carry_cols or []
    payload_cols = payload_cols or [
        c for c in changelog.columns
        if c not in keys and c != time_col and c != op_col
        and c not in carry_cols
    ]
    order = [F.col(time_col).asc()] + [F.col(c).asc() for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)

    is_del = (
        (F.col(op_col) == F.lit(delete_op)) if op_col is not None
        else F.lit(False)
    )
    df = changelog.withColumn("__del", is_del)
    if change_only:
        # null-safe: a payload transitioning to/from NULL is a change,
        # and NULL-valued fields must not nullify the comparison (a plain
        # != on structs with NULL members returns NULL -> row dropped).
        # The delete flag joins the payload in the state: delete->delete
        # collapses, X->delete and delete->X are changes.
        state = F.struct(F.col("__del"), *payload_cols)
        prev = F.lag(state).over(w)
        df = df.withColumn("__chg", ~prev.eqNullSafe(state)).filter("__chg")

    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    nondel_one = F.when(~F.col("__del"), F.lit(1)).otherwise(F.lit(0))
    return (
        df.select(
            *keys,
            *payload_cols,
            *carry_cols,
            "__del",
            F.col(time_col).alias("valid_from"),
            # closing edge over ALL kept rows: a trailing delete closes
            # its predecessor version
            F.lead(time_col).over(w).alias("valid_to"),
            F.sum(nondel_one).over(wcum).cast("long").alias("version"),
        )
        .filter(~F.col("__del"))
        .drop("__del")
        .select(
            *keys, *payload_cols, *carry_cols, "valid_from", "valid_to",
            F.col("valid_to").isNull().alias("is_current"), "version",
        )
    )
