"""The scaling experiment's WAL inflation must be semantically sound:
x`factor` events, disjoint conversation namespaces, unique and
order-preserving LSNs per source partition — otherwise the N vs 4N
measurement would be replaying a different (or invalid) workload."""

from __future__ import annotations

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_inflate_wal_preserves_wal_invariants(tmp_path):
    from bench import inflate_wal
    from etl_spark.cdc import ChangelogSpec, generate_changelog, write_changelog

    spec = ChangelogSpec(n_conversations=30, n_partitions=2,
                         segments_per_partition=2)
    pdf = generate_changelog(spec)
    src = str(tmp_path / "wal")
    write_changelog(pdf, src, spec)
    dst = str(tmp_path / "big")
    total = inflate_wal(src, dst, factor=3)
    assert total == 3 * len(pdf)

    parts = []
    for root, _d, names in os.walk(dst):
        # source_partition lives in the directory name, not the file
        sp = next(
            (int(seg.split("=", 1)[1]) for seg in root.split(os.sep)
             if seg.startswith("source_partition=")), None,
        )
        for n in names:
            if n.endswith(".parquet"):
                f = pd.read_parquet(os.path.join(root, n))
                f["source_partition"] = sp
                parts.append(f)
    big = pd.concat(parts, ignore_index=True)
    assert len(big) == total
    # replica namespaces are disjoint and each replica keeps the original
    # conversation count
    prefixes = big["conv_id"].str[:4].unique()
    assert len(prefixes) == 3
    assert big.groupby(big["conv_id"].str[:4])["conv_id"].nunique().nunique() == 1
    # LSNs stay unique per source partition (the WAL invariant the
    # watermark store depends on)
    assert not big.duplicated(subset=["source_partition", "lsn"]).any()
    # and order-preserving: replica 0 keeps the ORIGINAL lsns (replica r
    # is offset by r * (partition max + 1) — replica-major, so lsn ranges
    # never interleave across files)
    orig = pdf[["source_partition", "lsn", "conv_id", "turn_idx", "op"]]
    r0 = big[big["conv_id"].str.startswith("c00_")].copy()
    r0["lsn_orig"] = r0["lsn"]
    merged = orig.merge(
        r0[["source_partition", "lsn_orig", "op"]],
        left_on=["source_partition", "lsn"],
        right_on=["source_partition", "lsn_orig"],
        suffixes=("", "_r"),
    )
    assert len(merged) == len(pdf)
    assert (merged["op"] == merged["op_r"]).all()
    # delivery-order contract: per partition, files in MTIME order carry
    # strictly increasing, non-overlapping lsn ranges — so ANY micro-batch
    # split of the inflated WAL satisfies the per-partition watermark
    # filter (the old lsn*factor+rep scheme interleaved ranges and was
    # only safe replayed as one batch)
    for root, _d, names in os.walk(dst):
        files = sorted(
            (os.stat(os.path.join(root, n)).st_mtime, n)
            for n in names if n.endswith(".parquet")
        )
        last_hi = -1
        for _mt, n in files:
            f = pd.read_parquet(os.path.join(root, n))
            assert f["lsn"].min() > last_hi, (root, n)
            last_hi = int(f["lsn"].max())


def test_write_changelog_pins_mtimes_above_prior_calls(tmp_path):
    """ADVICE r4 (medium): a second write_changelog into the SAME wal
    dir must pin its segments' mtimes strictly ABOVE every existing
    segment — mtimes pinned into the future by call 1 must not outrank
    call 2's, or same-partition segments deliver in reverse LSN order
    and the per-partition hwm filter silently drops rows."""
    from etl_spark.cdc import ChangelogSpec, generate_changelog, write_changelog

    spec = ChangelogSpec(n_conversations=200, n_partitions=2,
                         segments_per_partition=40)
    wal = str(tmp_path / "wal")
    p1 = write_changelog(generate_changelog(spec), wal, spec)
    hi1 = max(os.path.getmtime(p) for p in p1)
    # call 1 pinned 40 segments at 10 ms spacing -> its max mtime sits
    # ~0.4 s in the future; an unguarded call 2 starting at time.time()
    # would slot below it
    p2 = write_changelog(generate_changelog(spec), wal, spec)
    lo2 = min(os.path.getmtime(p) for p in p2)
    assert lo2 > hi1
    # and within call 2 the (partition, segment) order is still strict
    mts = [os.path.getmtime(p) for p in p2]
    assert mts == sorted(mts) and len(set(mts)) == len(mts)
