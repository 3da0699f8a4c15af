"""Multi-table WAL routing: ONE heterogeneous change stream -> N lake
tables, atomically visible per micro-batch.

A real binlog/WAL tail is rarely single-table: Debezium emits one event
stream per *server*, each event naming its table, and the downstream
job routes rows to per-table sinks. The reference migrates a whole
database with an outer per-table loop — each table its own extract +
load pass over the source (/root/reference/etl.go:463-477,
migrate/migrate.go) — which re-reads the stream once per destination
and commits tables independently (a crash leaves table A loaded and
table B not, with nothing tying their states together). This module is
the streaming-native upgrade:

* **One scan, N sinks.** The batch is read once for the fused
  accounting pass (per-(table, source-partition, target-bucket)
  conditional aggregation — ONE driver action for the whole
  heterogeneous batch, extending apply_batch's one-accounting-action
  rule across tables), and once per destination for its merge write —
  each destination's scan filter (`table = 'x'`) pushes down to the WAL
  parquet, so a destination reads only its own rows.
* **Atomic cross-table visibility.** The per-table MERGEs stage on a
  :class:`~etl_spark.lake.catalog.CatalogTransaction`'s branch handles;
  ONE catalog link-create flips every destination from batch N-1 state
  to batch N state together. Catalog readers can never observe table A
  at batch 3 and table B at batch 2 — the cross-table half of
  exactly-once that per-table commit logs alone cannot give.
* **Exactly-once end to end.** The (source, batch_id) commit marker is
  written AFTER the catalog commit (checkpoint-after-commit ordering,
  same as apply_batch); a replayed batch short-circuits on the marker.
  A crash between catalog commit and marker replays the batch: every
  re-merge lands on converged state (idempotent MERGE of the same
  deduped rows) and the catalog gains one redundant version — state is
  exactly-once, versions at-least-once, identical to the single-table
  contract. A crash MID-commit (after some fast_forward, before the
  catalog commit) leaves those chains diverged from their pointers; the
  next transaction refuses loudly and ``Catalog.repair(name)`` rolls
  them back (see lake.catalog failure semantics) — opt into
  ``repair_diverged=True`` ONLY when this router is the sole writer of
  the routed tables (repair would also roll back a foreign writer's
  unpublished commits).

Scale shape: routing metadata (key/bucket spec per destination) is
O(#tables) driver-side JSON header reads; the validity/bucket routing
expressions are literal CASE chains (pure codegen, no join); the only
per-batch Spark work beyond apply_batch's is one filtered scan per
destination that actually has rows. Hot destinations keep apply_batch's
skew story (map-side-combined LWW dedup, salted variant).

Schema note: a heterogeneous WAL's union schema carries every
destination's payload columns (other tables' columns ride as NULL), so
the router drops columns outside each destination's CURRENT schema
before the merge — otherwise every destination would "evolve" to the
union schema. Deliberate evolution opts in per table via ``evolve``.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_spark.cdc.apply import dedup_last_writer_wins
from etl_spark.cdc.metrics import MetricsTable
from etl_spark.cdc.state import CommitLog, WatermarkStore, filter_by_watermarks
from etl_spark.lake import LakeTable


def _route_infos(
    spark: SparkSession,
    catalog: Any,
    tables: Sequence[str] | None,
    batch_cols: set[str],
) -> dict[str, dict[str, Any]]:
    """Per-destination routing metadata from the catalog's PINNED
    versions (the transaction forks there, so bucket specs must match):
    key columns, bucket spec, current schema field set. O(#tables)
    driver-side header reads, no Spark jobs."""
    entries = catalog.entries()
    names = list(tables) if tables is not None else sorted(entries)
    infos: dict[str, dict[str, Any]] = {}
    for name in names:
        if name not in entries:
            raise FileNotFoundError(f"no table {name!r} in catalog")
        t = LakeTable.load(spark, entries[name]["path"])
        snap = t.snapshot(
            version=int(entries[name]["version"]), buckets=set()
        )
        missing = [k for k in snap.key if k not in batch_cols]
        if missing:
            raise ValueError(
                f"route for table {name!r} needs key column(s) {missing} "
                "in the batch schema — a WAL that cannot express a "
                "destination's key is a misconfigured route, not a "
                "dead-letter case"
            )
        infos[name] = {
            "key": list(snap.key),
            "bucket_by": list(snap.bucket_by),
            "n_buckets": int(snap.n_buckets),
            "schema_cols": set(snap.schema.fieldNames()),
        }
    return infos


def route_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    catalog: Any,
    *,
    table_col: str = "dest_table",
    batch_id: int = 0,
    source: str = "wal",
    op_col: str = "op",
    tables: Sequence[str] | None = None,
    transforms: dict[str, Callable[[DataFrame], DataFrame]] | None = None,
    evolve: dict[str, Sequence[str]] | None = None,
    commit_log: CommitLog | None = None,
    watermark_store: WatermarkStore | None = None,
    metrics: MetricsTable | None = None,
    dead_letter_dir: str | None = None,
    salted_dedup: bool = False,
    merge_lww_by: Sequence[str] | None = None,
    merge_mode: str = "cow",
    repair_diverged: bool = False,
    transforms_preserve_keys_and_validity: bool = True,
) -> dict:
    """Apply one heterogeneous changelog micro-batch: route rows by
    ``table_col`` to their catalog tables, LWW-dedup per destination
    key, MERGE each on a transaction branch, flip visibility with ONE
    catalog commit. Exactly once (see module docstring for the crash
    matrix).

    ``tables`` restricts the routed destinations (default: every
    registered table). Rows naming an unregistered/NULL table — or
    failing the generic per-destination validity (key columns non-null,
    ``op`` in I/U/D) — are dead-lettered with an error label and
    counted, never silently dropped. ``transforms[name]`` runs on that
    destination's rows before its dedup; ``evolve[name]`` lists extra
    batch columns to carry INTO that table (schema evolution through
    the router is explicit — see module schema note).

    ``transforms_preserve_keys_and_validity`` is the same contract as
    ``apply_batch``'s flag: the fused accounting pass runs on the RAW
    batch, and its per-destination bucket histogram becomes each
    merge's affected-bucket set — files of unlisted buckets are kept
    VERBATIM, so a transform that rewrites key/bucket column values
    under the default promise would silently corrupt the table
    (batch rows landing in a "kept" bucket duplicate its stored keys).
    Set it False for re-keying transforms: those destinations' merges
    recount buckets from the TRANSFORMED rows (one extra count action
    per transformed destination — the fused pass still serves
    dead-letter/watermark accounting, which stays a pre-transform
    concept either way).

    Returns ``{batch_id, source, rows_in, rows_failed, catalog_version,
    tables: {name: merge_stats}}``.
    """
    t0 = time.time()
    if commit_log is not None and commit_log.is_committed(source, batch_id):
        return {"skipped": True, "batch_id": batch_id, "rows_applied": 0}

    raw = batch_df
    if watermark_store is not None:
        raw = filter_by_watermarks(raw, watermark_store.get_all())

    infos = _route_infos(spark, catalog, tables, set(raw.columns))
    if repair_diverged:
        for name in infos:
            catalog.repair(name)

    tbl = F.col(table_col)
    # literal CASE chains over the (small) destination set: validity,
    # error label, and the DESTINATION-SPECIFIC bucket id — so the one
    # fused accounting pass yields each destination's per-bucket
    # histogram under its own bucket spec
    valid_expr: Column | None = None
    bucket_expr: Column | None = None
    for name, info in infos.items():
        p = F.col(op_col).isin("I", "U", "D")
        for k in info["key"]:
            p = p & F.col(k).isNotNull()
        b = (
            F.pmod(
                F.xxhash64(*[F.col(c) for c in info["bucket_by"]]),
                F.lit(info["n_buckets"]),
            ).cast("int")
            if info["n_buckets"] > 0
            else F.lit(0)
        )
        if valid_expr is None:
            valid_expr = F.when(tbl == name, p)
            bucket_expr = F.when(tbl == name, b)
        else:
            valid_expr = valid_expr.when(tbl == name, p)
            bucket_expr = bucket_expr.when(tbl == name, b)
    valid_pred = F.coalesce(valid_expr.otherwise(F.lit(False)), F.lit(False))
    bucket = bucket_expr.otherwise(F.lit(-1)).alias("_bucket")

    lsn = F.col("lsn") if "lsn" in raw.columns else F.lit(None).cast("long")
    part = (
        F.col("source_partition")
        if "source_partition" in raw.columns
        else F.lit(-1).alias("source_partition")
    )
    cells = (
        raw.groupBy(tbl.alias("_tbl"), part, bucket)
        .agg(
            F.count(F.when(valid_pred, 1)).alias("rows_in"),
            F.count(F.when(~valid_pred, 1)).alias("rows_failed"),
            F.min(F.when(valid_pred, lsn)).alias("low_lsn"),
            F.max(F.when(valid_pred, lsn)).alias("high_lsn"),
        )
        .collect()
    )
    per_table_buckets: dict[str, dict[int, int]] = {}
    per_table_parts: dict[str, dict[int, dict]] = {}
    parts: dict[int, dict] = {}
    rows_in = rows_failed = 0
    for c in cells:
        rows_in += c["rows_in"]
        rows_failed += c["rows_failed"]
        if c["rows_in"] and c["_tbl"] in infos:
            pb = per_table_buckets.setdefault(c["_tbl"], {})
            pb[c["_bucket"]] = pb.get(c["_bucket"], 0) + c["rows_in"]
            tp = per_table_parts.setdefault(c["_tbl"], {}).setdefault(
                c["source_partition"],
                {"rows_in": 0, "rows_failed": 0, "low_lsn": None, "high_lsn": None},
            )
            tp["rows_in"] += c["rows_in"]
        p = parts.setdefault(
            c["source_partition"],
            {"rows_in": 0, "rows_failed": 0, "low_lsn": None, "high_lsn": None},
        )
        p["rows_in"] += c["rows_in"]
        p["rows_failed"] += c["rows_failed"]
        for k, fn in (("low_lsn", min), ("high_lsn", max)):
            if c[k] is not None:
                p[k] = c[k] if p[k] is None else fn(p[k], c[k])
    # per-destination failed counts for metrics: failures group under the
    # row's own claimed table (unknown tables land under their raw name,
    # which is not in infos — they stay in the global count only)
    for c in cells:
        if c["rows_failed"] and c["_tbl"] in infos:
            tp = per_table_parts.setdefault(c["_tbl"], {}).setdefault(
                c["source_partition"],
                {"rows_in": 0, "rows_failed": 0, "low_lsn": None, "high_lsn": None},
            )
            tp["rows_failed"] += c["rows_failed"]

    stats: dict = {
        "batch_id": batch_id,
        "source": source,
        "skipped": False,
        "rows_in": rows_in,
        "rows_failed": rows_failed,
        "tables": {},
    }

    if rows_failed and dead_letter_dir is not None:
        is_known = tbl.isin(*infos.keys()) if infos else F.lit(False)
        err = (
            F.when(~F.coalesce(is_known, F.lit(False)), F.lit("unknown_table"))
            .when(
                ~F.coalesce(F.col(op_col).isin("I", "U", "D"), F.lit(False)),
                F.lit("op_unknown"),
            )
            .otherwise(F.lit("key_not_null"))
        )
        (
            raw.filter(~valid_pred)
            .withColumn("error", err)
            .withColumn("batch_id", F.lit(batch_id).cast("long"))
            .write.mode("overwrite")
            .parquet(os.path.join(dead_letter_dir, f"batch={batch_id}"))
        )

    def _finish() -> dict:
        if commit_log is not None:
            commit_log.commit(source, batch_id, stats)
        stats["latency_ms"] = int((time.time() - t0) * 1000)
        stats.setdefault("rows_applied", 0)
        if metrics is not None:
            rows = []
            for name, tparts in per_table_parts.items():
                for sp, r in tparts.items():
                    rows.append(
                        {
                            "source": f"{source}:{name}",
                            "batch_id": batch_id,
                            "source_partition": sp,
                            "rows_in": r["rows_in"],
                            "rows_applied": None,
                            "rows_failed": r["rows_failed"],
                            "low_lsn": r["low_lsn"],
                            "high_lsn": r["high_lsn"],
                            "latency_ms": stats["latency_ms"],
                        }
                    )
            if rows:
                metrics.record(spark, rows)
        return stats

    if not per_table_buckets:
        stats["rows_applied"] = 0
        stats["catalog_version"] = None
        return _finish()

    keep = set(merge_lww_by or ())
    with catalog.transaction() as txn:
        for name in sorted(per_table_buckets):
            info = infos[name]
            handle = txn.table(name)
            sub = raw.filter(valid_pred & (tbl == name))
            fn = (transforms or {}).get(name)
            if fn is not None:
                sub = fn(sub)
            deduped = dedup_last_writer_wins(
                sub, key=info["key"], salted=salted_dedup
            )
            # drop the routing column, other destinations' payload
            # columns, and engine meta (unless the guard keeps an order
            # column or `evolve` carries a brand-new column in)
            carry = info["schema_cols"] | {op_col} | keep
            carry |= set((evolve or {}).get(name, ()))
            merge_src = deduped.drop(
                *[c for c in deduped.columns if c not in carry]
            )
            # a non-preserving transform invalidates the pre-transform
            # histogram: hand merge per_bucket=None so it recounts from
            # the transformed rows (see docstring contract)
            pb = (
                per_table_buckets[name]
                if fn is None or transforms_preserve_keys_and_validity
                else None
            )
            _snap, mstats = handle.merge(
                merge_src,
                op_col=op_col,
                per_bucket=pb,
                lww_by=list(merge_lww_by) if merge_lww_by else None,
                mode=merge_mode,
            )
            stats["tables"][name] = mstats
        stats["catalog_version"] = txn.commit()

    stats["rows_applied"] = sum(
        m.get("rows_applied", m.get("source_rows", 0))
        for m in stats["tables"].values()
    )
    if watermark_store is not None:
        watermark_store.advance(
            {
                sp: r["high_lsn"]
                for sp, r in parts.items()
                if r["high_lsn"] is not None
            }
        )
    return _finish()


@dataclass
class RoutedCdcStream:
    """Structured Streaming tail of a heterogeneous WAL ->
    foreachBatch(route_batch): the multi-destination sibling of
    ``CdcStream``, with the catalog commit as each micro-batch's atomic
    visibility point. availableNow trigger; resume = streaming
    checkpoint + commit log + watermarks, exactly as CdcStream."""

    spark: SparkSession
    wal_dir: str
    catalog: Any
    state_dir: str
    table_col: str = "dest_table"
    source_name: str = "wal"
    tables: list[str] | None = None
    transforms: dict[str, Callable[[DataFrame], DataFrame]] | None = None
    evolve: dict[str, Sequence[str]] | None = None
    op_col: str = "op"
    max_files_per_trigger: int = 8
    # backlog-aware trigger coalescing, same contract as CdcStream:
    # per-destination LWW dedup resolves intra-batch order, so grouping
    # more segments per trigger is order-safe; rows-per-batch bound from
    # sampled footer estimates with max_files_per_trigger as the floor
    adaptive_trigger_rows: int | None = None
    salted_dedup: bool = False
    merge_lww_by: list[str] | None = None
    # "mor" commits each destination's merge merge-on-read (O(batch)
    # bytes per table per micro-batch — the high-frequency multi-table
    # shape); pair with compact_every so every destination's delta
    # backlog stays bounded.
    merge_mode: str = "cow"
    dead_letter: bool = True
    retry_attempts: int = 3
    repair_diverged: bool = False
    # False when any transforms[name] rewrites key/bucket column values:
    # those destinations' merges recount their bucket histogram from the
    # transformed rows instead of trusting the raw-batch accounting pass
    # (route_batch docstring has the full corruption story)
    transforms_preserve_keys_and_validity: bool = True
    # Maintenance cadence: every N applied batches, compact + expire
    # EVERY routed destination, then Catalog.publish the maintenance
    # commit — maintenance advances the table chain past the catalog
    # pointer, and an unadopted maintenance commit would make the next
    # transaction refuse the chain as diverged. Publishing immediately
    # (a driver-side no-data link-create; catalog pins keep published
    # versions safe from the expire) closes that window. 0 disables.
    compact_every: int = 0
    expire_keep_last: int = 3
    # Downstream incremental materialized views over routed destinations
    # (lake.derived / lake.joinview — anything with .refresh()),
    # refreshed after every N applied batches, same duck-typed cadence
    # contract as CdcStream.views: refreshes are exactly-once on their
    # own watermark, so a crashed cadence just catches up next time.
    views: list = field(default_factory=list)
    refresh_views_every: int = 1
    query: object = field(default=None, init=False)

    def __post_init__(self) -> None:
        os.makedirs(self.state_dir, exist_ok=True)
        self._applied = 0
        self.commit_log = CommitLog(os.path.join(self.state_dir, "commits"))
        self.watermarks = WatermarkStore(
            os.path.join(self.state_dir, "watermarks")
        )
        self.metrics = MetricsTable(os.path.join(self.state_dir, "metrics"))
        self.checkpoint_dir = os.path.join(self.state_dir, "checkpoint")
        self.dead_letter_dir = (
            os.path.join(self.state_dir, "dead_letter")
            if self.dead_letter
            else None
        )
        self.batch_stats: list[dict] = []

    def _apply(self, batch_df: DataFrame, batch_id: int) -> None:
        from etl_spark.streaming.stream import retry_with_backoff

        stats = retry_with_backoff(
            lambda: route_batch(
                self.spark,
                batch_df,
                self.catalog,
                table_col=self.table_col,
                batch_id=batch_id,
                source=self.source_name,
                op_col=self.op_col,
                tables=self.tables,
                transforms=self.transforms,
                evolve=self.evolve,
                commit_log=self.commit_log,
                watermark_store=self.watermarks,
                metrics=self.metrics,
                dead_letter_dir=self.dead_letter_dir,
                salted_dedup=self.salted_dedup,
                merge_lww_by=self.merge_lww_by,
                merge_mode=self.merge_mode,
                repair_diverged=self.repair_diverged,
                transforms_preserve_keys_and_validity=(
                    self.transforms_preserve_keys_and_validity
                ),
            ),
            attempts=self.retry_attempts,
        )
        self.batch_stats.append(stats)
        if not stats.get("skipped"):
            self._applied += 1
            if (
                self.views
                and self.refresh_views_every
                and self._applied % self.refresh_views_every == 0
            ):
                stats["view_refreshes"] = [
                    retry_with_backoff(v.refresh, attempts=self.retry_attempts)
                    for v in self.views
                ]
            if self.compact_every and self._applied % self.compact_every == 0:
                stats["maintenance"] = self._maintenance_tick()

    def _maintenance_tick(self) -> dict:
        """Compact + expire every routed destination, adopting each
        maintenance commit into the catalog immediately (see
        compact_every comment). Folds any mor delta backlog; catalog
        pins protect published/pinned versions from the expire."""
        out: dict[str, int] = {}
        names = (
            list(self.tables)
            if self.tables is not None
            else sorted(self.catalog.entries())
        )
        for name in names:
            t = self.catalog.table(name)
            t.compact()
            if self.expire_keep_last:
                t.expire_snapshots(keep_last=self.expire_keep_last)
            out[name] = self.catalog.publish(name)
        return out

    def run_to_completion(self) -> list[dict]:
        from etl_spark.streaming.stream import (
            adaptive_files_per_trigger,
            discover_wal_schema,
        )

        schema = discover_wal_schema(self.spark, self.wal_dir)
        per_trigger = self.max_files_per_trigger
        if self.adaptive_trigger_rows is not None:
            per_trigger = adaptive_files_per_trigger(
                self.wal_dir,
                int(self.adaptive_trigger_rows),
                floor=self.max_files_per_trigger,
            )
        stream = (
            self.spark.readStream.schema(schema)
            .option("basePath", self.wal_dir)
            .option("maxFilesPerTrigger", per_trigger)
            .parquet(self.wal_dir)
        )
        self.query = (
            stream.writeStream.foreachBatch(self._apply)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        self.query.awaitTermination()
        return self.batch_stats
