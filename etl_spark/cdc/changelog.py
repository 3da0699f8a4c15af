"""Deterministic synthetic binlog/WAL changelog over conversation transcripts.

Plays the role of the reference's fake-data load generator
(/root/reference/examples/generate.go:13-103) generalized from insert-only
rows to full I/U/D change events, and of its incremental source
(`WHERE pk > last_inserted_id`, /root/reference/etl.go:412-424) generalized
to a WAL with per-partition monotonic LSNs.

Properties engineered into the stream (all seed-deterministic):

- **Key**: (conv_id, turn_idx); a conversation's events all land in one
  source partition (real binlogs shard by table/key, so per-key ordering is
  per-partition ordering).
- **LSN**: monotonic within each source_partition — the resume watermark unit.
- **ts collisions**: event timestamps are coarsened so distinct events share
  a timestamp; last-writer-wins MUST fall back to (lsn, source_partition)
  to be deterministic. This is deliberate adversarial input for the dedup.
- **Hot-key skew**: update/delete targets drawn from a Zipf-ish rank
  distribution over conversations — a few conversations get a large share
  of churn (the "hot conversation" the north rule says must not stall a
  reducer).
- **Schema evolution**: events before the cut-over LSN have no ``tool``
  column at all (files written with the v0 schema); later files carry it.
  Replaying across the cut-over exercises lake schema merge.
- **Messy text**: leading/trailing/internal whitespace and unicode spaces,
  so the normalization transform has real work.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

# v0: pre-schema-evolution stream (no `tool` column yet)
CHANGELOG_SCHEMA_V0 = T.StructType(
    [
        T.StructField("op", T.StringType()),
        T.StructField("lsn", T.LongType()),
        T.StructField("source_partition", T.IntegerType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
    ]
)

CHANGELOG_SCHEMA = T.StructType(
    CHANGELOG_SCHEMA_V0.fields + [T.StructField("tool", T.StringType())]
)

_BASE_TS = np.datetime64("2025-06-01T00:00:00", "us")
_MESS = ["  ", " \t ", " ", "", " ", " "]
_TOOLS = ["search", "python", "browser"]


@dataclass(frozen=True)
class ChangelogSpec:
    n_conversations: int = 100
    max_turns: int = 8
    churn: float = 1.5          # extra events per initial key (updates/deletes/reinserts)
    p_delete: float = 0.12      # share of churn events that are deletes
    p_reinsert: float = 0.05    # share of churn events that re-insert after delete
    skew: float = 1.1           # Zipf exponent for hot-conversation churn
    n_partitions: int = 4       # WAL shards
    segments_per_partition: int = 4
    evolution_cutover: float = 0.5  # fraction of the stream after which `tool` appears
    ts_collision_group: int = 8     # events sharing one timestamp tick
    seed: int = 42


def generate_changelog(spec: ChangelogSpec = ChangelogSpec()) -> pd.DataFrame:
    """Vectorized generation of the full event stream as one pandas frame,
    globally ordered by (source_partition, lsn). Columns = CHANGELOG_SCHEMA
    (+ ``_seq`` the global emit order). `tool` is NaN before the cut-over."""
    rng = np.random.default_rng(spec.seed)
    n_conv = spec.n_conversations

    turns_per_conv = rng.integers(1, spec.max_turns + 1, n_conv)
    conv_of_key = np.repeat(np.arange(n_conv), turns_per_conv)
    # turn_idx 0..t-1 within each conversation
    offsets = np.concatenate(([0], np.cumsum(turns_per_conv)[:-1]))
    turn_of_key = np.arange(conv_of_key.size) - np.repeat(offsets, turns_per_conv)
    n_keys = conv_of_key.size

    # churn events target existing keys with Zipf-rank skew over conversations
    n_extra = int(n_keys * spec.churn)
    conv_weights = 1.0 / np.power(np.arange(1, n_conv + 1, dtype=np.float64), spec.skew)
    conv_weights /= conv_weights.sum()
    extra_conv = rng.choice(n_conv, size=n_extra, p=conv_weights)
    extra_turn = (rng.random(n_extra) * turns_per_conv[extra_conv]).astype(np.int64)
    u = rng.random(n_extra)
    extra_op = np.where(
        u < spec.p_delete, "D", np.where(u < spec.p_delete + spec.p_reinsert, "I", "U")
    )

    conv = np.concatenate([conv_of_key, extra_conv])
    turn = np.concatenate([turn_of_key, extra_turn]).astype(np.int32)
    op = np.concatenate([np.full(n_keys, "I"), extra_op])
    n = conv.size

    # emit order: initial inserts (shuffled), then churn (shuffled)
    seq = np.empty(n, dtype=np.int64)
    seq[:n_keys] = rng.permutation(n_keys)
    seq[n_keys:] = n_keys + rng.permutation(n_extra)

    # coarse timestamps -> deliberate LWW ties broken only by (lsn, partition)
    ts = _BASE_TS + (seq // spec.ts_collision_group).astype("timedelta64[s]")

    # stable partition per conversation; knuth-hash so partition != conv order
    partition = ((conv.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(2**32)
                 % np.uint64(spec.n_partitions)).astype(np.int32)

    # global order (source_partition, _seq) via lexsort — the pandas
    # sort_values + two groupby.cumcount calls this replaces were the
    # generator's hot spots at 10^7+ events.
    order = np.lexsort((seq, partition))
    conv, turn, op, seq, ts, partition = (
        a[order] for a in (conv, turn, op, seq, ts, partition)
    )

    def grouped_cumcount(group_ids: np.ndarray) -> np.ndarray:
        """cumcount within each group, in current array order (vectorized)."""
        o = np.argsort(group_ids, kind="stable")
        g = group_ids[o]
        starts = np.concatenate(([0], np.flatnonzero(g[1:] != g[:-1]) + 1))
        counts = np.diff(np.concatenate((starts, [g.size])))
        pos = np.arange(g.size) - np.repeat(starts, counts)
        out = np.empty(g.size, dtype=np.int64)
        out[o] = pos
        return out

    lsn = grouped_cumcount(partition.astype(np.int64))

    # payload: role/text/tool; NULL payload on deletes
    conv_names = np.array([f"conv{i:06d}" for i in range(n_conv)], dtype=object)
    reply_names = np.array([f"reply {i:06d}" for i in range(n_conv)], dtype=object)
    conv_id = conv_names[conv]
    rev = grouped_cumcount(conv.astype(np.int64) * (spec.max_turns + 1) + turn)
    role = np.where(turn == 0, "system",
                    np.where(turn % 2 == 1, "user", "assistant")).astype(object)
    mess_pre = rng.choice(_MESS, n)
    mess_post = rng.choice(_MESS, n)
    text = (
        pd.Series(mess_pre)
        + pd.Series(reply_names[conv])
        + " turn " + pd.Series(turn).astype(str)
        + " rev " + pd.Series(rev).astype(str)
        + pd.Series(np.where(rng.random(n) < 0.2, "  double  spaced", ""))
        + pd.Series(mess_post)
    ).to_numpy(dtype=object)

    after_cutover = seq >= int(n * spec.evolution_cutover)
    has_tool = after_cutover & (role == "assistant") & (rng.random(n) < 0.4)
    tool = np.where(has_tool, rng.choice(_TOOLS, n), None).astype(object)

    is_delete = op == "D"
    return pd.DataFrame(
        {
            "op": op,
            "lsn": lsn,
            "source_partition": partition,
            "ts": ts.astype("datetime64[us]"),
            "conv_id": conv_id,
            "turn_idx": turn,
            "role": np.where(is_delete, None, role),
            "text": np.where(is_delete, None, text),
            "tool": np.where(is_delete, None, tool),
            "_seq": seq,
        }
    )


def write_changelog(df: pd.DataFrame, wal_dir: str, spec: ChangelogSpec) -> list[str]:
    """Write the stream as an immutable parquet WAL:
    ``wal_dir/source_partition=<p>/seg-<i>.parquet``, each segment LSN-
    contiguous. Segments wholly before the evolution cut-over are written
    WITHOUT the `tool` column (schema v0) — true on-disk schema evolution.
    Returns the file paths in (partition, segment) order."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cut_seq = int(len(df) * spec.evolution_cutover)
    paths = []
    for p, part in df.groupby("source_partition", sort=True):
        pdir = os.path.join(wal_dir, f"source_partition={int(p)}")
        os.makedirs(pdir, exist_ok=True)
        # Append semantics: continue segment numbering past any existing
        # WAL segments instead of silently overwriting seg-00000..N — a
        # second write_changelog into the same dir is a new WAL tail
        # (the mtime pin below then orders it after the existing one).
        start = 1 + max(
            (
                int(n[4:-8])  # seg-<idx>.parquet, idx width may grow
                for n in os.listdir(pdir)
                if n.startswith("seg-") and n.endswith(".parquet")
            ),
            default=-1,
        )
        segs = np.array_split(np.arange(len(part)), spec.segments_per_partition)
        segs = [(start + i, idx) for i, idx in enumerate(segs)]
        for i, idx in segs:
            if idx.size == 0:
                continue
            seg = part.iloc[idx]
            cols = ["op", "lsn", "ts", "conv_id", "turn_idx", "role", "text"]
            if bool((seg["_seq"] >= cut_seq).any()):
                cols.append("tool")
            table = pa.Table.from_pandas(seg[cols], preserve_index=False).cast(
                pa.schema(
                    [
                        ("op", pa.string()),
                        ("lsn", pa.int64()),
                        ("ts", pa.timestamp("us")),
                        ("conv_id", pa.string()),
                        ("turn_idx", pa.int32()),
                        ("role", pa.string()),
                        ("text", pa.string()),
                    ]
                    + ([("tool", pa.string())] if "tool" in cols else [])
                )
            )
            path = os.path.join(pdir, f"seg-{i:05d}.parquet")
            pq.write_table(table, path)
            paths.append(path)
    # Pin strictly-increasing mtimes in (partition, segment) order:
    # FileStreamSource batches files by mtime (ms granularity, ties in
    # arbitrary order), and the per-partition high-watermark filter
    # assumes same-partition segments arrive in LSN order — two segments
    # written within one millisecond could otherwise process reversed
    # and the earlier one's rows be dropped as stale (observed as a rare
    # load-dependent convergence flake). The WAL writer owns the
    # delivery-order contract, so it pins it explicitly — including
    # ACROSS calls: a second write_changelog (or any writer) appending
    # to the same wal_dir must pin strictly above every existing
    # segment's mtime, else its segments could deliver before (and be
    # hwm-dropped by) the first call's future-pinned ones.
    prior = 0.0
    for root, _dirs, files in os.walk(wal_dir):
        for fname in files:
            fpath = os.path.join(root, fname)
            if fpath not in paths:
                try:
                    prior = max(prior, os.path.getmtime(fpath))
                except OSError:
                    pass
    base = max(time.time(), prior + 0.01)
    for j, path in enumerate(paths):  # 10 ms spacing: distinct at the
        t = base + 0.01 * j           # source's ms granularity, bounded
        os.utime(path, (t, t))        # future-skew on big WALs
    return paths


def expected_final_state(df: pd.DataFrame) -> pd.DataFrame:
    """Independent oracle: converged table state = per-key last writer by
    (ts, lsn, source_partition), dropping keys whose last op is D.
    Pure pandas — shares no code with the Spark path."""
    # NB: keep="last" on the sorted frame takes the last ROW per key;
    # groupby().last() would wrongly take the last NON-NULL value per column
    # (resurrecting stale `tool` values over a final null).
    d = df.sort_values(["ts", "lsn", "source_partition"]).drop_duplicates(
        subset=["conv_id", "turn_idx"], keep="last"
    )
    d = d[d["op"] != "D"]
    return (
        d[["conv_id", "turn_idx", "role", "text", "tool", "ts"]]
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
