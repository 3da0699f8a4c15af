"""Deterministic corpus sampling, splitting, and sequence packing.

The sampling stages of a training-data pipeline have one non-negotiable
property at 10^10 documents: they must be DETERMINISTIC functions of the
data, not of the run. A train/test split taken with ``rand()`` leaks when
the corpus is re-ingested; a quota sample taken with ``LIMIT`` changes
with the physical plan. Everything here keys on a content hash instead
(md5 → 48-bit integer — portable across engines, so the DuckDB oracle
reproduces every assignment bit-for-bit), which also makes splits STABLE
under corpus growth: a document's split never changes when other
documents are added or removed.

Scale shapes:
- ``hash_split``: pure codegen expression, zero shuffle — the split label
  rides along with the scan.
- ``quota_sample``: rank-per-stratum needs a shuffle on the strata keys;
  the optional two-phase bucket-cutoff path (``n_prefilter_buckets``)
  bounds the rows that reach the rank window to ~one bucket per stratum,
  so a hot stratum (one language is 40% of the web) no longer funnels
  its entire partition through a single sort — only the boundary bucket
  is ranked, everything below the cutoff passes with a map-side filter.
- ``pack_sequences``: a running-sum window per shard; shards are
  hash-assigned so packing parallelism = ``n_shards``, independent of
  data order, and each pack's contents are a deterministic function of
  (doc ids, budget, n_shards).

Reference behavior: the reference engine (oarkflow/etl) has no sampling
surface — these extend the training-data family (SURVEY.md §2 extension
table) the same way the dedup/similarity operators do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "apportion",
    "content_hash_bucket",
    "hash_split",
    "mixture_sample",
    "pack_sequences",
    "quota_sample",
]

#: md5-derived hash space: first 12 hex chars = 48 bits, fits a BIGINT in
#: every engine with no sign/overflow edge (Spark ANSI mode throws on
#: 64-bit overflow; 48 bits never overflows).
_HASH_HEX_CHARS = 12
_HASH_SPACE = 1 << (4 * _HASH_HEX_CHARS)


def content_hash_bucket(col: Column | str, n_buckets: int) -> Column:
    """Deterministic, engine-portable bucket in ``[0, n_buckets)``:
    first 48 bits of ``md5(col)`` mod ``n_buckets``. DuckDB equivalent:
    ``('0x' || substr(md5(col), 1, 12))::BIGINT % n_buckets``."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, _HASH_HEX_CHARS), 16, 10)
    return F.pmod(h.cast("long"), F.lit(n_buckets))


def hash_split(
    df: DataFrame,
    on: str,
    fractions: dict[str, float],
    split_col: str = "split",
    n_buckets: int = 1_000_000,
) -> DataFrame:
    """Assign every row to a named split (train/val/test/…) by hashing
    ``on`` — stable across runs AND across corpus growth, so no
    train/test leakage when the corpus is re-ingested or extended.

    ``fractions`` maps split name → fraction; they must sum to 1 (±1e-9).
    Buckets are carved into contiguous ranges in dict insertion order, so
    the assignment is reproducible from the fractions alone. Zero
    shuffle: one codegen expression per row.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if not fractions:
        raise ValueError("fractions must be non-empty")
    # md5(NULL) is NULL: every when-branch would be NULL and the row
    # would silently fall through to the LAST split, concentrating all
    # NULL-keyed rows there and breaking the fractions contract. Fail
    # loudly instead — inline, no extra validation action at scale.
    bucket = F.when(
        F.col(on).isNull(),
        F.raise_error(
            F.lit(
                f"hash_split: NULL {on!r} has no deterministic split — "
                "filter NULL keys out or fill them first"
            )
        ).cast("long"),
    ).otherwise(content_hash_bucket(on, n_buckets))
    expr: Column | None = None
    hi = 0
    names = list(fractions)
    for name in names[:-1]:
        hi += int(round(fractions[name] * n_buckets))
        branch = F.lit(name)
        expr = F.when(bucket < hi, branch) if expr is None else expr.when(
            bucket < hi, branch
        )
    # last split takes the remainder of the bucket space (no rounding gap)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def _hash48(col: Column | str) -> Column:
    """The 48-bit md5 prefix as a BIGINT (engine-portable; DuckDB:
    ``('0x' || substr(md5(c), 1, 12))::BIGINT``)."""
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, _HASH_HEX_CHARS), 16, 10)
    return h.cast("long")


def _hash48_strict(col: str, ctx: str) -> Column:
    """``_hash48`` that REFUSES NULLs loudly (same contract as
    ``hash_split``): a NULL sampling key would make every rank-order
    column NULL — the plain path then breaks ties arbitrarily (a
    NONdeterministic sample, violating the module's core contract) and
    the two-phase path crashes obscurely sorting a NULL bucket id
    driver-side. Inline when-branch, pure codegen, no validation
    action."""
    return F.when(
        F.col(col).isNull(),
        F.raise_error(
            F.lit(
                f"{ctx}: NULL {col!r} has no deterministic hash order — "
                "filter NULL keys out or fill them first"
            )
        ).cast("long"),
    ).otherwise(_hash48(col))


def _range_bucket(col: str, n_buckets: int) -> Column:
    """Range-partition the 48-bit hash space into ``n_buckets`` ordered
    slices: every value in bucket i hashes BELOW every value in bucket
    i+1 — the property that makes the two-phase quota cutoff select the
    exact same rows as a global hash-order rank, for any bucket count."""
    width = -(-_HASH_SPACE // n_buckets)  # ceil: bucket ids stay < n_buckets
    return (_hash48_strict(col, "quota_sample") / F.lit(width)).cast("long")


def _rank_order(hash_on: str) -> list[Column]:
    # 48-bit hash, then the content itself as the unique tiebreak: a
    # total order, deterministic, portable (DuckDB:
    # ORDER BY ('0x' || substr(md5(c),1,12))::BIGINT, c)
    return [
        _hash48_strict(hash_on, "quota_sample"),
        F.col(hash_on).cast("string"),
    ]


def quota_sample(
    df: DataFrame,
    strata: list[str],
    k: int | dict[str, int],
    hash_on: str,
    n_prefilter_buckets: int | None = None,
) -> DataFrame:
    """Keep at most ``k`` rows per stratum (e.g. per (lang, source)),
    chosen deterministically: the k smallest ``(hash48(hash_on),
    hash_on)`` in each stratum. Frequency capping / quota balancing for
    corpus composition control.

    ``k`` may be a per-stratum dict (single stratum column only):
    ``{stratum_value: quota}`` — strata absent from the dict get quota 0
    (dropped). This is the primitive under ``mixture_sample``; both the
    plain and the two-phase path honor it identically.

    Plain path: one rank window partitioned by ``strata`` — exact, one
    shuffle, but a hot stratum sorts on a single partition.

    ``n_prefilter_buckets=B`` switches to the two-phase exact variant:
    (1) count rows per (stratum, RANGE-bucket of the hash space) —
    map-side combinable, tiny result; (2) per stratum, find the cutoff
    bucket where the running total crosses ``k`` (driver-side over ≤
    |strata|·B rows, bounded at 2M and broadcast back); (3) rows strictly
    below the cutoff pass with NO sort; only the boundary bucket
    (expected ~rows/B per stratum) goes through the rank window. Range
    buckets preserve hash order (bucket i < bucket i+1 ⇒ hash order), so
    the output is IDENTICAL to the plain path for any B — including
    NULL-valued strata: the plain path's partitionBy groups NULLs as
    their own stratum, so the cutoff join uses null-safe equality
    (``eqNullSafe``, still a broadcast hash join) rather than silently
    dropping NULL-keyed rows.

    The two-phase path reads the corpus three times (stats, pass filter,
    boundary rank) — all fully parallel scans, the right trade against
    the plain path's single scan that funnels a hot stratum through one
    reducer's sort.
    """
    if isinstance(k, dict) and len(strata) != 1:
        raise ValueError("per-stratum quotas require exactly one stratum column")

    def _k_expr() -> Column:
        if not isinstance(k, dict):
            return F.lit(k)
        # tiny dict -> literal CASE chain: pure codegen, no join
        expr = F.lit(0)
        for val, kk in sorted(k.items()):
            expr = F.when(F.col(strata[0]) == F.lit(val), F.lit(int(kk))).otherwise(expr)
        return expr

    def _k_for(key: tuple) -> int:
        return int(k) if not isinstance(k, dict) else int(k.get(key[0], 0))

    if n_prefilter_buckets is None:
        w = Window.partitionBy(*strata).orderBy(*_rank_order(hash_on))
        return (
            df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= _k_expr())
            .drop("__rn")
        )

    B = n_prefilter_buckets
    bucket = _range_bucket(hash_on, B).alias("__bkt")
    staged = df.select("*", bucket)
    _GUARD = 2_000_000
    counts = (
        staged.groupBy(*strata, "__bkt")
        .agg(F.count("*").alias("__n"))
        .limit(_GUARD + 1)
        .collect()
    )
    if len(counts) > _GUARD:
        raise ValueError(
            f"quota_sample prefilter stats exceed {_GUARD} rows "
            f"(strata cardinality × {B} buckets); lower n_prefilter_buckets"
        )
    # per stratum: running total over buckets in ascending order → the
    # first bucket where cumulative >= k is the boundary; below it, all
    # rows pass unranked.
    if not counts:  # empty input: schema-correct empty result
        return df.limit(0)
    per_stratum: dict[tuple, list[tuple[int, int]]] = {}
    for r in counts:
        key = tuple(r[c] for c in strata)
        per_stratum.setdefault(key, []).append((r["__bkt"], r["__n"]))
    cutoff_rows = []  # (strata..., cutoff_bucket, taken_below)
    for key, lst in per_stratum.items():
        lst.sort()
        cum = 0
        kk = _k_for(key)
        cutoff, below = B, 0  # default: whole stratum fits under k
        for bkt, n in lst:
            if cum + n >= kk:
                cutoff, below = bkt, cum
                break
            cum += n
        else:
            cutoff, below = B, cum
        cutoff_rows.append(key + (cutoff, below))
    # explicit schema: a stratum whose every cutoff row is NULL would
    # otherwise fail createDataFrame type inference
    from pyspark.sql import types as T

    cuts_schema = T.StructType(
        [df.schema[c] for c in strata]
        + [
            T.StructField("__cutoff", T.LongType(), False),
            T.StructField("__below", T.LongType(), False),
        ]
    )
    cuts = F.broadcast(
        staged.sparkSession.createDataFrame(
            [tuple(r[:-2]) + (int(r[-2]), int(r[-1])) for r in cutoff_rows],
            cuts_schema,
        )
    ).alias("__cuts")
    lhs = staged.alias("__staged")
    cond = None
    for c in strata:
        # null-safe: NULL strata are a stratum, exactly as the plain
        # path's window partitioning treats them
        eq = F.col(f"__staged.{c}").eqNullSafe(F.col(f"__cuts.{c}"))
        cond = eq if cond is None else cond & eq
    joined = lhs.join(cuts, cond, "inner").select(
        "__staged.*", "__cuts.__cutoff", "__cuts.__below"
    )
    passed = joined.filter(F.col("__bkt") < F.col("__cutoff"))
    boundary = joined.filter(F.col("__bkt") == F.col("__cutoff"))
    w = Window.partitionBy(*strata).orderBy(*_rank_order(hash_on))
    ranked = (
        boundary.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") + F.col("__below") <= _k_expr())
        .drop("__rn")
    )
    drop = ["__bkt", "__cutoff", "__below"]
    return (
        passed.drop(*drop)
        .unionByName(ranked.drop(*drop))
        .select(*df.columns)  # same column order as the plain path
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: Column | str,
    budget: int,
    n_shards: int = 64,
    shard_col: str = "shard",
    pack_col: str = "pack_id",
) -> DataFrame:
    """Concat-and-chunk sequence packing: assign each document to a
    (shard, pack) so that consecutive documents within a shard fill a
    token ``budget`` — the standard pre-tokenization packing pass before
    writing training shards. A pack may overspill by at most one
    document (next-fit semantics), which is the deterministic,
    window-expressible variant used at scale (first-fit bin packing is
    inherently sequential and non-distributable).

    Shards are hash-assigned from ``id_col`` (engine-portable md5
    bucket), so packing parallelism = ``n_shards`` regardless of input
    partitioning, and the full assignment is a pure function of
    (ids, token counts, budget, n_shards). One shuffle (by shard), one
    running-sum window per shard.

    ``id_col`` must be unique — it is the within-shard packing order, and
    ties would make the running sum (hence pack assignment)
    nondeterministic.

    Returns the input plus (shard, pack_id, n_tokens) columns.
    """
    tok = F.col(token_col) if isinstance(token_col, str) else token_col
    out = df.withColumn(shard_col, content_hash_bucket(id_col, n_shards))
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = out.withColumn("n_tokens", tok)
    cum = F.sum("n_tokens").over(w)
    # pack index from the running total BEFORE this doc: a doc that
    # straddles a budget boundary belongs to the pack it started in
    return out.withColumn(
        pack_col, F.floor((cum - F.col("n_tokens")) / F.lit(budget)).cast("long")
    )


def apportion(weights: dict[str, float], total: int) -> dict[str, int]:
    """Largest-remainder (Hamilton) integer apportionment of ``total``
    over ``weights`` — the deterministic quota computation under
    ``mixture_sample``. Quotas sum to exactly ``total``; ties in the
    fractional remainder break by domain name (ascending), so the result
    is a pure function of (weights, total) on every host."""
    if total < 0:
        raise ValueError("total must be >= 0")
    wsum = float(sum(weights.values()))
    if not weights or wsum <= 0:
        raise ValueError("weights must be a non-empty map with positive sum")
    shares = {d: total * (w / wsum) for d, w in weights.items()}
    quotas = {d: int(s) for d, s in shares.items()}
    leftover = total - sum(quotas.values())
    by_remainder = sorted(
        weights, key=lambda d: (-(shares[d] - quotas[d]), d)
    )
    for d in by_remainder[:leftover]:
        quotas[d] += 1
    return quotas


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    weights: dict[str, float],
    total: int,
    hash_on: str,
    n_prefilter_buckets: int | None = None,
) -> DataFrame:
    """Domain-weighted corpus mixture — the data-mixing stage of a
    pretraining pipeline ("50% web, 30% code, 20% papers"): draw
    ``total`` rows split across ``domain_col`` values in proportion to
    ``weights``, each domain's rows chosen as its smallest content
    hashes (deterministic, stable under corpus growth — adding documents
    never evicts a previously-sampled one unless it hashes below the
    domain's cutoff).

    Quotas come from :func:`apportion` (largest-remainder, sums to
    exactly ``total``); domains not in ``weights`` are excluded. A
    domain with fewer rows than its quota yields what it has — there is
    NO redistribution, by design: redistribution would make every
    domain's sample depend on every other domain's row count, breaking
    both growth stability and the per-domain oracle.

    Scale shape: one IN-list scan filter plus :func:`quota_sample` with
    per-stratum quotas — with ``n_prefilter_buckets`` the skew-proof
    two-phase path (a hot domain at 40% of the web never funnels through
    one reducer's sort)."""
    quotas = apportion(weights, total)
    sub = df.filter(F.col(domain_col).isin(*quotas.keys()))
    return quota_sample(
        sub, [domain_col], quotas, hash_on,
        n_prefilter_buckets=n_prefilter_buckets,
    )
