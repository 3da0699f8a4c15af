"""Anti-entropy table sync: fingerprint → diff → repair.

The change-feed replication chain (``lake.export``) keeps a replica
converged as long as every segment applies exactly once. Anti-entropy is
the safety net for everything else — lost feed windows, out-of-band
writes, a replica restored from an old backup, plain bit rot: detect
divergence cheaply, then repair ONLY what differs. (The reference has no
replication story; this extends the engine's own export chain with the
Merkle-style divergence check Dynamo/Cassandra repair uses, re-shaped
for bucketed lake tables.)

Scale shape at 100 TB:

- **Fingerprints**: one full scan per side, but the aggregate is fully
  map-side combinable — 3 numbers per bucket (row count, bit-XOR and
  modular sum of per-row hashes), commutative and associative, so the
  shuffle carries O(n_buckets) rows no matter the data size, and the
  driver compares two bucket->triple maps (a few thousand entries).
- **Diff**: reads ONLY the divergent buckets on both sides
  (manifest-pruned, the ``read_for_keys`` path) and full-outer-joins
  them on the table key. Both sides hash-partition by the same key, so
  the join input is O(divergent data), never O(table).
- **Repair**: one idempotent MERGE of the diff into the replica —
  bucket-pruned copy-on-write, O(changed buckets) rewrite. Running
  repair twice is a no-op (the second diff is empty).

The per-row hash covers every column plus an is-null flag per column
(``xxhash64`` skips NULL inputs, so without the flags a NULL shifting
between columns could collide); XOR+sum+count over 64-bit hashes makes
an undetected divergent bucket need a deliberate collision, not luck.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_spark.lake.table import LakeTable, align_to_schema

_OP_COL = "__op"


def _row_fingerprint(cols: list[str]) -> Column:
    parts: list[Column] = []
    for c in sorted(cols):
        parts.append(F.col(c))
        parts.append(F.col(c).isNull())
    return F.xxhash64(*parts)


def bucket_fingerprints(
    df: DataFrame, bucket_expr: Column, cols: list[str]
) -> DataFrame:
    """(bucket, n_rows, xor_fp, sum_fp) — the O(n_buckets)-row summary a
    divergence check ships to the driver. Partial-aggregates map-side;
    the only shuffled rows are the per-bucket triples."""
    return (
        df.select(
            bucket_expr.alias("bucket"),
            _row_fingerprint(cols).alias("__fp"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(__fp)").alias("xor_fp"),
            F.sum(F.col("__fp").cast("decimal(38,0)")).alias("sum_fp"),
        )
    )


def _read_buckets(table: LakeTable, version: int | None, buckets: set[int]) -> DataFrame:
    snap = table.snapshot(version, buckets=buckets)
    entries = [e for e in snap.data_files if e["bucket"] in buckets]
    return table._read_files(snap, entries)


def diff_tables(
    primary: LakeTable,
    replica: LakeTable,
    primary_version: int | None = None,
    replica_version: int | None = None,
) -> tuple[DataFrame, dict[str, Any]]:
    """Row-level diff of ``replica`` against ``primary``.

    Returns ``(diff, info)``: ``diff`` has the primary's schema plus an
    ``__op`` column — ``U`` rows (missing from or different in the
    replica; payload is the primary's) and ``D`` rows (present only in
    the replica; payload NULL) — exactly the MERGE source that converges
    the replica. ``info`` reports the divergent bucket set and totals.

    Bucket comparison uses the PRIMARY's bucket layout evaluated as an
    expression on both sides, so it works even when the replica's
    physical bucketing differs (after a ``rebucket``); file-level pruning
    then applies to the primary always, and to the replica only when its
    layout matches (otherwise its divergent rows are row-filtered out of
    a full scan — the metadata told us *that* it diverged either way).
    """
    psnap = primary.snapshot(primary_version, buckets=set())
    rsnap = replica.snapshot(replica_version, buckets=set())
    if psnap.key != rsnap.key:
        raise ValueError(
            f"key mismatch: primary {psnap.key} vs replica {rsnap.key}"
        )
    schema = psnap.schema
    cols = [f.name for f in schema.fields]
    key = psnap.key
    bexpr = primary._bucket_expr(psnap)

    pf = bucket_fingerprints(
        primary.read(primary_version), bexpr, cols
    ).collect()
    r_full = align_to_schema(replica.read(replica_version), schema)
    rf = bucket_fingerprints(r_full, bexpr, cols).collect()
    pmap = {r["bucket"]: (r["n_rows"], r["xor_fp"], r["sum_fp"]) for r in pf}
    rmap = {r["bucket"]: (r["n_rows"], r["xor_fp"], r["sum_fp"]) for r in rf}
    divergent = {
        b for b in set(pmap) | set(rmap) if pmap.get(b) != rmap.get(b)
    }
    info = {
        "divergent_buckets": sorted(divergent),
        "primary_buckets": len(pmap),
        "replica_buckets": len(rmap),
    }
    spark = primary.spark
    if not divergent:
        import pyspark.sql.types as T

        empty = T.StructType(
            list(schema.fields) + [T.StructField(_OP_COL, T.StringType())]
        )
        return spark.createDataFrame([], empty), info

    p_rows = _read_buckets(primary, primary_version, divergent)
    same_layout = (rsnap.n_buckets, rsnap.bucket_by) == (
        psnap.n_buckets,
        psnap.bucket_by,
    )
    if same_layout:
        r_rows = align_to_schema(
            _read_buckets(replica, replica_version, divergent), schema
        )
    else:
        r_rows = r_full.filter(bexpr.isin(list(divergent)))

    payload = [c for c in cols if c not in key]
    if payload:
        P = p_rows.select(
            *key, F.struct(*payload).alias("__pp"), F.lit(True).alias("__in_p")
        )
        R = r_rows.select(
            *key, F.struct(*payload).alias("__rp"), F.lit(True).alias("__in_r")
        )
    else:
        P = p_rows.select(*key, F.lit(True).alias("__in_p"))
        R = r_rows.select(*key, F.lit(True).alias("__in_r"))
    j = P.join(R, on=key, how="full_outer")
    classify = (
        F.when(F.col("__in_p").isNull(), F.lit("D"))
        .when(F.col("__in_r").isNull(), F.lit("U"))
        .otherwise(
            F.when(
                F.lit(True)
                if not payload
                else F.col("__pp").eqNullSafe(F.col("__rp")),
                F.lit(None).cast("string"),
            ).otherwise(F.lit("U"))
        )
    )
    out_cols = [F.col(c) for c in key]
    for c in payload:
        out_cols.append(
            F.when(F.col(_OP_COL) == "U", F.col(f"__pp.{c}")).alias(c)
        )
    diff = (
        j.withColumn(_OP_COL, classify)
        .filter(F.col(_OP_COL).isNotNull())
        .select(*out_cols, F.col(_OP_COL))
    )
    return diff, info


def repair_replica(
    primary: LakeTable,
    replica: LakeTable,
    primary_version: int | None = None,
) -> dict[str, Any]:
    """Converge ``replica`` to ``primary``'s state: diff, then one
    idempotent MERGE (upserts for missing/different rows, deletes for
    extras). Returns the diff info plus the merge stats; when nothing
    diverged, no commit is made."""
    diff, info = diff_tables(primary, replica, primary_version)
    if not info["divergent_buckets"]:
        return {**info, "repaired": 0}
    snap, stats = replica.merge(diff, op_col=_OP_COL)
    return {
        **info,
        "repaired": stats.get("source_rows", 0),
        "replica_version": None if snap is None else snap.version,
    }
