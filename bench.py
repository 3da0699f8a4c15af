"""Benchmark harness: headline queries + end-to-end CDC replay throughput.

Run by the driver per round:
    python bench.py                  # $SPARK_GRAFT_SF_DIR (default sf0.1),
                                     # local[$SPARK_GRAFT_CPUS]
Prints ONE JSON line:
    {"metric": "...", "value": <sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": ...,
     "cdc": {"n_events": N, "events_per_sec": X, ...}}

The primary metric (`value`) is the wall-clock of the end-to-end CDC
replay: deterministic synthetic transcript changelog -> parquet WAL ->
Structured Streaming tail -> exactly-once LWW MERGE into the bucketed lake
table -> converged state (the BASELINE.json metric at sandbox scale).
`--scaling` additionally re-runs the replay at two parallelism levels and
reports throughput scaling efficiency (the north rule's two-cluster-size
criterion, proxied by local[N] vs local[4N] on identical input).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HEADLINE = [
    "cdc_apply_final_state",
    "lww_dedup",
    "sessionize",
    "agg_pricing_summary",
    "join_revenue_by_nation",
    "kv_unpivot",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "similarity_topk",
    "embedding_neardup",
    "text_stats",
]

# Bench changelog: ~1.1M change events over ~450k (conv_id, turn_idx) keys,
# 8 WAL shards x 8 segments, seed-fixed, with hot-key churn skew and the
# mid-stream schema evolution (tool column appears half-way).
BENCH_SPEC = dict(
    n_conversations=100_000,
    max_turns=8,
    churn=1.5,
    n_partitions=8,
    segments_per_partition=8,
    seed=42,
)


def _materialize(df) -> int:
    """Force full computation of every column (count() alone lets Catalyst
    prune the projections we are trying to measure)."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def run_queries(spark, sf_dir: str) -> dict[str, float]:
    from etl_spark.queries import QUERIES

    out: dict[str, float] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        t0 = time.time()
        _materialize(fn(spark, sf_dir))
        out[name] = round(time.time() - t0, 3)
    return out


def run_cdc_replay(spark, work_dir: str, wal_dir: str, n_events: int) -> dict:
    """Stream the pre-generated WAL into a fresh lake table; returns
    throughput stats. WAL generation is excluded from the measured time."""
    from etl_spark.cdc.changelog import TRANSCRIPTS_SCHEMA
    from etl_spark.functions.text import normalize_transcripts_expr
    from etl_spark.lake import LakeTable
    from etl_spark.streaming.stream import run_stream

    table_dir = os.path.join(work_dir, "table")
    state_dir = os.path.join(work_dir, "state")
    table = LakeTable.create(
        spark, table_dir, TRANSCRIPTS_SCHEMA,
        key=["conv_id", "turn_idx"], n_buckets=32,
    )
    t0 = time.time()
    stats = run_stream(
        spark, wal_dir, table, state_dir,
        transform=normalize_transcripts_expr,
        max_files_per_trigger=16,
    )
    wall = time.time() - t0
    return {
        "n_events": n_events,
        "n_batches": len(stats),
        "replay_sec": round(wall, 3),
        "events_per_sec": round(n_events / wall, 1),
        "final_rows": table.row_count(),
    }


def make_wal(work_dir: str) -> tuple[str, int]:
    from etl_spark.cdc.changelog import ChangelogSpec, generate_changelog, write_changelog

    spec = ChangelogSpec(**BENCH_SPEC)
    df = generate_changelog(spec)
    wal_dir = os.path.join(work_dir, "wal")
    write_changelog(df, wal_dir, spec)
    return wal_dir, len(df)


def new_session(cpus: int):
    from etl_spark.session import get_session

    spark = get_session(
        app_name=f"etl_spark-bench-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=2 * cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark

def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    scaling = "--scaling" in sys.argv
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0

    work_dir = tempfile.mkdtemp(prefix="etl_spark_bench_")
    try:
        wal_dir, n_events = make_wal(work_dir)

        spark = new_session(cpus)
        queries = run_queries(spark, sf_dir)
        cdc = run_cdc_replay(
            spark, os.path.join(work_dir, f"run{cpus}"), wal_dir, n_events
        )

        result = {
            "metric": "end_to_end_cdc_replay_wall",
            "value": cdc["replay_sec"],
            "unit": "sec",
            "queries": queries,
            "sf": sf,
            "cpus": cpus,
            "cdc": cdc,
        }

        if scaling:
            spark.stop()
            levels = sorted({max(2, cpus // 4), cpus})
            scaling_rows = []
            for lv in levels:
                s = new_session(lv)
                r = run_cdc_replay(
                    s, os.path.join(work_dir, f"scale{lv}"), wal_dir, n_events
                )
                scaling_rows.append({"parallelism": lv, **r})
                s.stop()
            if len(scaling_rows) == 2:
                t_n = scaling_rows[0]["events_per_sec"]
                t_4n = scaling_rows[1]["events_per_sec"]
                factor = levels[1] / levels[0]
                result["scaling"] = {
                    "levels": levels,
                    "throughput": [t_n, t_4n],
                    "efficiency": round((t_4n / t_n) / factor, 3),
                }

        print(json.dumps(result))
    finally:
        shutil.rmtree(work_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
