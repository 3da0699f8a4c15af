"""Initial-load bootstrap: fuzzy snapshot + WAL handoff, exactly once.

Starting CDC ingest against an existing source is the one lifecycle step
the tail itself cannot cover: the WAL may not reach back to the table's
creation, so the table must be seeded from a SNAPSHOT and the stream
attached WITHOUT a gap and WITHOUT double-applying the overlap. The
reference bootstraps by re-running the full extract and resuming with
``WHERE pk > last_inserted_id`` (/root/reference/etl.go:412-424,
migration.go:11-32) — which assumes an append-only source. For a real
change stream the industry contract is Debezium's initial-snapshot /
DMS full-load-plus-CDC handoff, and that is what this module implements
on the engine's own primitives:

1. **Record the WAL position FIRST** (``start_lsns``: the per-source-
   partition high LSN at the moment the snapshot read begins — the
   ``SHOW MASTER STATUS`` step). The caller captures it; this module
   treats it as the handoff contract.
2. **Bulk-load the snapshot** with one LWW dedup + idempotent MERGE
   (``cdc.apply.replay`` shape: one key shuffle with map-side combine +
   one bucketed write — the minimum data movement for a 10^10-row seed).
3. **Seed the watermark store at ``start_lsns``** so the attached
   ``CdcStream`` replays every event AFTER the snapshot began and skips
   everything before — the overlap window (events that landed while the
   snapshot was being read) is REPLAYED, not skipped.

Why replaying the overlap converges on a *fuzzy* (non-locking) snapshot —
one whose per-row reads are spread across the window, the only kind a
live 10^10-row source can give you: change rows in this engine are
FULL-ROW images (north-rule changelog shape; Debezium after-images
likewise). For any key, let ``r`` be the (unknown, per-key) LSN at which
the snapshot read it, with ``start <= r``:

- events at ``lsn <= start`` are reflected in the snapshot value (they
  precede the whole window) and are correctly skipped;
- events at ``start < lsn <= r`` are already inside the snapshot value
  AND get replayed — but replaying the latest of them writes exactly the
  state the snapshot already holds (full-row images), a no-op;
- events at ``lsn > r`` replay normally, including deletes of rows the
  snapshot contains and inserts of keys it doesn't.

So the converged state equals a full-log replay for EVERY per-key read
point in the window — the fuzziness is absorbed by the same LWW + MERGE
idempotence the steady-state tail already relies on. The property test
randomizes ``r`` per key against the pandas full-log oracle.

Crash safety uses the engine's checkpoint-after-commit ordering: MERGE
commits first, watermarks advance second, the bootstrap marker lands
last (its own commit-log stream, so it can never collide with the
stream's batch ids). A crash anywhere re-runs the bootstrap; the
re-MERGE of the same deduped snapshot is a no-op on converged state and
watermark advance is monotonic.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

from etl_spark.cdc.apply import META_COLS, dedup_last_writer_wins
from etl_spark.cdc.state import CommitLog, WatermarkStore
from etl_spark.lake import LakeTable

BOOTSTRAP_SOURCE_SUFFIX = ":bootstrap"


def bootstrap_from_snapshot(
    spark: SparkSession,
    snapshot_df: DataFrame,
    table: LakeTable,
    state_dir: str,
    *,
    start_lsns: dict[int, int],
    source: str = "wal",
    transform: Callable[[DataFrame], DataFrame] | None = None,
    salted_dedup: bool = False,
    order_by: Sequence[str] | None = None,
) -> dict:
    """Seed ``table`` from a consistent-or-fuzzy snapshot and arm the
    watermark store so a ``CdcStream`` over the same ``state_dir`` resumes
    exactly at the snapshot-start position.

    ``start_lsns`` maps source_partition -> the highest LSN already
    written to the WAL when the snapshot read BEGAN. Events at or below
    it are skipped by the stream's watermark filter; the overlap window
    (events concurrent with the snapshot read) is replayed and absorbed
    idempotently (module docstring).

    ``snapshot_df`` carries the table's payload columns (full-row
    images); duplicate keys — a retried snapshot chunk — collapse through
    the same LWW dedup the tail uses (``order_by`` defaults to whatever
    of the engine's order columns the frame carries). Returns stats;
    ``{"skipped": True}`` if this state_dir already bootstrapped.
    """
    os.makedirs(state_dir, exist_ok=True)
    commit_log = CommitLog(os.path.join(state_dir, "commits"))
    watermarks = WatermarkStore(os.path.join(state_dir, "watermarks"))
    bsource = source + BOOTSTRAP_SOURCE_SUFFIX
    if commit_log.is_committed(bsource, 0):
        return {"skipped": True, "rows_applied": 0}

    t0 = time.time()
    df = transform(snapshot_df) if transform is not None else snapshot_df
    deduped = dedup_last_writer_wins(
        df,
        key=table.key,
        **({"order_by": list(order_by)} if order_by is not None else {}),
        salted=salted_dedup,
    )
    merge_src = deduped.drop(*[c for c in META_COLS if c in deduped.columns])
    snap, mstats = table.merge(merge_src, op_note="bootstrap")

    # checkpoint-after-commit: data first, then position, then the marker
    watermarks.advance(dict(start_lsns))
    stats = {
        "skipped": False,
        "rows_applied": mstats.get("rows_applied", mstats.get("source_rows", 0)),
        "table_version": snap.version if snap else None,
        "start_lsns": dict(start_lsns),
        "latency_ms": int((time.time() - t0) * 1000),
    }
    commit_log.commit(bsource, 0, stats)
    return stats
