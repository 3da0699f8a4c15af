"""WAL retention + consumer-lag accounting from parquet footers alone.

The reference never manages its source's lifecycle (it reads tables and
moves on), but a file-WAL CDC deployment accumulates segments forever
unless someone retires the ones every consumer has applied. The unit of
truth here is the engine's own exactly-once state: a segment is
retirable once its highest LSN is at or below the applied high-watermark
of its source partition (`WatermarkStore`) — the stream has provably
merged (or watermark-filtered) every event in it, and the streaming
checkpoint's seen-files log means a resume never re-lists it.

Everything in this module is driver-side parquet FOOTER metadata —
O(#segments) small reads, zero Spark jobs, zero row scans — the same
scale shape as an Iceberg manifest walk. At 10^5 segments that is a few
seconds of stat calls, not a cluster job.

Layout contract (cdc.changelog.write_changelog, and any compatible
producer): ``wal_dir/source_partition=<p>/<segment>.parquet`` with a
monotonic ``lsn`` column per partition.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from etl_spark.cdc.state import WatermarkStore

_PART_PREFIX = "source_partition="


@dataclass
class SegmentStat:
    partition: int
    path: str
    min_lsn: int
    max_lsn: int
    rows: int
    bytes: int


def _footer_lsn_range(path: str) -> tuple[int, int, int]:
    """(min_lsn, max_lsn, rows) from row-group column statistics — the
    footer only, never row data."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    if "lsn" not in idx:
        raise ValueError(f"{path}: WAL segment has no 'lsn' column")
    lo, hi = None, None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx["lsn"]).statistics
        if st is None or not st.has_min_max:
            raise ValueError(
                f"{path}: row group {rg} lacks lsn min/max statistics"
            )
        lo = st.min if lo is None else min(lo, st.min)
        hi = st.max if hi is None else max(hi, st.max)
    return int(lo), int(hi), md.num_rows


def wal_segment_stats(wal_dir: str) -> list[SegmentStat]:
    """Footer stats for every segment, (partition, path)-ordered."""
    out: list[SegmentStat] = []
    for part in sorted(os.listdir(wal_dir)):
        pdir = os.path.join(wal_dir, part)
        if not (os.path.isdir(pdir) and part.startswith(_PART_PREFIX)):
            continue
        p = int(part[len(_PART_PREFIX):])
        for name in sorted(os.listdir(pdir)):
            if not name.endswith(".parquet"):
                continue
            path = os.path.join(pdir, name)
            lo, hi, rows = _footer_lsn_range(path)
            out.append(
                SegmentStat(p, path, lo, hi, rows, os.path.getsize(path))
            )
    return out


def prune_wal(
    wal_dir: str,
    watermarks: WatermarkStore | dict[int, int],
    *,
    archive_dir: str | None = None,
    keep_last: int = 1,
    dry_run: bool = False,
) -> dict:
    """Retire every fully-applied segment: ``max_lsn <= partition
    watermark``. With ``archive_dir`` segments MOVE there (relative
    layout preserved — replayable cold storage); without it they are
    deleted. ``keep_last`` newest segments per partition always survive,
    pruned or not: schema discovery reads each partition's first/last
    footer, and FileStreamSource orders by mtime, so an empty partition
    dir must never appear while the stream lives.

    Only the engine's own applied state gates retirement — never age or
    count — so a stalled consumer (lagging watermark) simply holds its
    partition's segments, which is the correct failure mode."""
    wm = watermarks.get_all() if isinstance(watermarks, WatermarkStore) else watermarks
    stats = wal_segment_stats(wal_dir)
    by_part: dict[int, list[SegmentStat]] = {}
    for s in stats:
        by_part.setdefault(s.partition, []).append(s)
    pruned: list[str] = []
    pruned_bytes = 0
    kept_bytes = 0
    for p, segs in by_part.items():
        high = wm.get(p)
        segs.sort(key=lambda s: s.max_lsn)  # newest = highest LSN, not name
        retirable = segs[: max(0, len(segs) - keep_last)] if keep_last else segs
        for s in retirable:
            if high is None or s.max_lsn > high:
                kept_bytes += s.bytes
                continue
            if not dry_run:
                if archive_dir:
                    rel = os.path.relpath(s.path, wal_dir)
                    dst = os.path.join(archive_dir, rel)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    os.replace(s.path, dst)
                else:
                    os.remove(s.path)
            pruned.append(s.path)
            pruned_bytes += s.bytes
        for s in segs[len(retirable):]:
            kept_bytes += s.bytes
    return {
        "pruned_segments": len(pruned),
        "pruned_paths": pruned,
        "pruned_bytes": pruned_bytes,
        "kept_bytes": kept_bytes,
        "dry_run": dry_run,
        "archived": archive_dir is not None,
    }


def lag_report(
    wal_dir: str, watermarks: WatermarkStore | dict[int, int]
) -> list[dict]:
    """Per-source-partition consumer lag, footers only.

    ``lag_lsns`` is exact under the contiguous-LSN contract (LSNs are
    dense per partition, so LSN distance == event count); the row bounds
    hold for ANY monotonic LSN: ``pending_rows_min`` counts segments
    entirely above the watermark, ``pending_rows_max`` adds the one
    straddling segment's rows. A partition the store has never seen
    reports watermark -1 (everything pending)."""
    wm = watermarks.get_all() if isinstance(watermarks, WatermarkStore) else watermarks
    out: list[dict] = []
    by_part: dict[int, list[SegmentStat]] = {}
    for s in wal_segment_stats(wal_dir):
        by_part.setdefault(s.partition, []).append(s)
    for p, segs in sorted(by_part.items()):
        high = wm.get(p, -1)
        max_lsn = max(s.max_lsn for s in segs)
        lo = sum(s.rows for s in segs if s.min_lsn > high)
        straddle = sum(
            s.rows for s in segs if s.min_lsn <= high < s.max_lsn
        )
        out.append(
            {
                "source_partition": p,
                "applied_lsn": high,
                "max_wal_lsn": max_lsn,
                "lag_lsns": max(0, max_lsn - high),
                "pending_rows_min": lo,
                "pending_rows_max": lo + straddle,
                "segments": len(segs),
            }
        )
    return out
