"""Driver-harness query surface: one entry per implemented operator.

Each query is a ``(spark, sf_dir) -> DataFrame`` callable exercising one
operator from SURVEY.md §2 (or a training-data-pipeline operator) against
the driver's synthetic parquet tables; ``ORACLE_SQL`` carries the
equivalent DuckDB SQL the driver compares against (row count + schema +
order-insensitive value hash). Column names/types are aligned on both
sides; float aggregates go through DECIMAL so parallel Spark sums and
sequential DuckDB sums are bit-identical.

Queries with no oracle entry (LSH/IVF approximate search, simhash/minhash
candidate generation, winnowing overlap, the incremental dedup index, the
engine-synthesized media table, the streaming CDC replay) are rows-only
checks by design: their outputs depend on engine-internal hashing or
temp-dir state DuckDB cannot see; their semantics are covered by pytest
instead (recall vs brute force, cross-batch detection, replay vs pandas
oracle). Notable oracle-checked non-trivials: the stateful streaming
sessionizer (vs the batch aggregate), connected components (vs a
recursive-CTE closure), the blocked LSH near-dup at full-recall
parameters (vs the exact scan), and the MinHash-LSH verify pipeline at a
full-recall band config (vs the exact-Jaccard oracle), and the temporal
family (as-of join vs DuckDB's native ASOF LEFT JOIN, the bucketed
interval join vs an inequality join, SCD2 vs a lag/lead window — with
and without the delete alphabet — and the INCREMENTAL SCD2 apply, a
four-batch lake-table lifecycle, vs the same full-log SQL; the
streaming SCD2 replay is rows-only here but pytest-checked bit-exact
against that window). The out-of-order guarded MERGE
(stale-event skip + delete tombstones) replays parity-split halves of
the log in the wrong order and is checked against the one-window global
LWW; the merge-on-read mode replays the same lifecycles as delta/
equality-delete commits (`cdc_apply_mor`: four ts-ordered mor batches vs
the cow flagship's oracle; `merge_mor_out_of_order`: the guarded
wrong-order parity replay vs the global-LWW oracle) — proving the
shadow-applied read path reconstructs exactly the copy-on-write state.
Change detection (`cdc_apply_skip_unchanged`) replays each batch unioned
with a full re-send of the previous one — the at-least-once /
snapshot-re-read upstream shape — through `changed_only` no-op elision
and must still converge to the flagship's oracle, with a zero-commit
assertion on an all-unchanged re-apply.
The derived-view family (incremental materialized-view maintenance
from the change feed — delta-maintained count/sum/avg, rescan-maintained
min/max, and a row-level filtered projection) replays a four-batch
insert/delete/update lifecycle and is checked against the one-shot
aggregate over the final state. The approximate-search family follows
the full-recall-config pattern throughout: each production config stays
rows-only while a degenerate config that MUST equal the exact answer
(LSH bits=0, IVF probing all lists, winnowing window=1, the verified
MinHash band config — one-shot AND the two-batch incremental index —
and the blocked near-dup at full-recall params) is oracle-checked
bit-exactly — so the bucketing/re-rank machinery is proven to add no
error beyond the documented approximation. The change-feed export
chain (`change_feed_replicate`: primary -> Debezium JSONL feed ->
replica, two windows) is checked against the same full-log LWW oracle
as the flagship. Current inventory: 77 entries — 66 oracle, 11
rows-only.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_spark.cdc.apply import dedup_last_writer_wins, replay
from etl_spark.cdc.state import filter_by_watermarks
from etl_spark.functions.text import (
    lang_id,
    ordered_assembly,
    quality_score,
    slug,
    token_count,
    whitespace_token_count,
)
from etl_spark.functions.vectors import cosine_similarity
from etl_spark.lake import LakeTable
from etl_spark.operators import (
    concat_fields,
    field_map,
    include_exclude_extra,
    isin_filter,
    kv_unpivot,
    lookup_in,
    multi_mapping,
    uppercase_string_values,
    validator_split,
)
from etl_spark.operators.coerce import coerce_to_schema
from etl_spark.operators.dedup import (
    exact_dedup,
    md5_shingle_hashes,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_from_hashes,
    simhash_neardup_pairs,
    simhash_pairs_from_fingerprints,
)
from etl_spark.operators.multimodal import (
    decode_media_meta,
    media_stats,
    synthesize_media_df,
)
from etl_spark.operators.similarity import (
    brute_force_topk,
    embedding_neardup_pairs,
    ivf_topk,
    lsh_topk,
    pq_topk,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _pin_session(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _pin_session(spark: SparkSession) -> None:
    """Defensive runtime conf for driver-owned sessions: results must be
    bit-comparable to the DuckDB oracle regardless of how the harness
    built its SparkSession (UTC timestamps, TimestampType for tz-naive
    parquet). Both are runtime-settable SQL confs."""
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    except Exception:
        pass  # read-only conf in some harnesses; defaults then apply


# --------------------------------------------------------------------------
# CDC core (S3, K1/K2, T6-T8, §4 custom op 1-3)
# --------------------------------------------------------------------------

def q_cdc_apply_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP: full CDC batch core on the `events` stream — events become
    I/U/D changes keyed by user_id ('error' events are deletes), LWW dedup
    by (ts, lsn), MERGE into a bucketed lake table, converged state read
    back. Exercises dedup + MERGE + schema alignment end-to-end."""
    events = _t(spark, sf_dir, "events")
    chg = events.select(
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("event_id").alias("lsn"),
        F.col("ts"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="etl_spark_cdc_q_")
    # 32 buckets = 32-way parallel bucketed write (the copy-on-write unit
    # sizing rule: enough buckets that a commit's write saturates the
    # executor pool while a bucket stays a rewrite-sized chunk)
    table = LakeTable.create(
        spark, os.path.join(tmp, "t"), schema, key=["user_id"], n_buckets=32
    )
    replay(spark, chg, table)
    return table.read().select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


_ORACLE_CDC_FINAL = """
WITH ranked AS (
  SELECT user_id, event_type, value, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT user_id,
       event_type AS last_event_type,
       value      AS last_value,
       ts         AS last_ts
FROM ranked WHERE rn = 1 AND event_type <> 'error'
"""


def q_lww_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LWW dedup in isolation (§4 custom op 1): grouped max-struct, no
    window shuffle-sort."""
    events = _t(spark, sf_dir, "events")
    d = events.select(
        "user_id", "ts", F.col("event_id").alias("lsn"), "event_type", "value"
    )
    return dedup_last_writer_wins(d, key=["user_id"], order_by=["ts", "lsn"]).select(
        "user_id", "ts", "lsn", "event_type", "value"
    )


_ORACLE_LWW = """
WITH ranked AS (
  SELECT user_id, ts, event_id AS lsn, event_type, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT user_id, ts, lsn, event_type, value FROM ranked WHERE rn = 1
"""


def q_lww_dedup_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level salted LWW dedup (hot-key skew mitigation, SURVEY §2.6
    skew note): max() is associative so the salted two-phase aggregation
    must produce EXACTLY the unsalted result — checked against the same
    SQL oracle as ``lww_dedup``."""
    events = _t(spark, sf_dir, "events")
    d = events.select(
        "user_id", "ts", F.col("event_id").alias("lsn"), "event_type", "value"
    )
    return dedup_last_writer_wins(
        d, key=["user_id"], order_by=["ts", "lsn"], salted=True, salt_buckets=16
    ).select("user_id", "ts", "lsn", "event_type", "value")


def q_incremental_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: resume scan past per-partition high-watermark LSNs
    (/root/reference/etl.go:412-424, migration.go:11-32)."""
    events = _t(spark, sf_dir, "events").withColumn(
        "source_partition", F.pmod(F.col("user_id"), F.lit(4)).cast("int")
    )
    wm = {0: 2500, 1: 5000, 2: 7500}
    return filter_by_watermarks(events, wm, lsn_col="event_id").select(
        "event_id", "user_id", "event_type", "source_partition"
    )


_ORACLE_TAIL = """
SELECT event_id, user_id, event_type,
       CAST(user_id % 4 AS INTEGER) AS source_partition
FROM events
WHERE event_id > CASE CAST(user_id % 4 AS INTEGER)
                   WHEN 0 THEN 2500 WHEN 1 THEN 5000 WHEN 2 THEN 7500
                   ELSE -1 END
"""


def q_merge_out_of_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order tolerant MERGE (``LakeTable.merge(lww_by=...)``): the
    events changelog is split by LSN parity and the halves are applied in
    the WRONG order — the second batch is full of events older than
    already-applied state, including stale updates for deleted keys. The
    guard (stored-order comparison + delete tombstones) must still
    converge to the global LWW state, which is exactly what the oracle
    computes over the full log in one window."""
    events = _t(spark, sf_dir, "events")
    chg = events.select(
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("event_id").alias("lsn"),
        F.col("ts"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("lsn", T.LongType()),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="etl_spark_oooo_q_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "t"), schema, key=["user_id"], n_buckets=32
    )
    replay(
        spark, chg.filter(F.col("lsn") % 2 == 0), table,
        merge_lww_by=["ts", "lsn"],
    )
    replay(
        spark, chg.filter(F.col("lsn") % 2 == 1), table,
        merge_lww_by=["ts", "lsn"],
    )
    return table.read().select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
        F.col("lsn").alias("last_lsn"),
    )


def _events_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    return events.select(
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("event_id").alias("lsn"),
        F.col("ts"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
    )


def q_cdc_apply_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read CDC lifecycle (``LakeTable.merge(mode="mor")``): the
    events changelog is split into FOUR (ts, lsn)-ordered batches and
    applied as successive mor commits — each batch lands as O(batch)
    delta/equality-delete files, no bucket is ever rewritten, and the
    shadow-applied READ path must reconstruct exactly the state the
    copy-on-write flagship produces (same DuckDB oracle as
    ``cdc_apply_final_state``). Cross-batch upserts, deletes and
    delete-then-reinsert sequences all resolve through the seq-ordered
    equality-delete join at read time."""
    from pyspark.sql.window import Window

    chg = _events_changelog(spark, sf_dir).withColumn(
        "__q",
        F.ntile(4).over(Window.orderBy(F.col("ts"), F.col("lsn"))),
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="etl_spark_mor_q_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "t"), schema, key=["user_id"], n_buckets=32
    )
    for q in range(1, 5):
        replay(spark, chg.filter(F.col("__q") == q).drop("__q"), table,
               mor=True)
    return table.read().select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


def q_cdc_apply_skip_unchanged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-detection CDC lifecycle (``LakeTable.changed_only`` via
    ``apply_batch(skip_unchanged=True)``): the events changelog is split
    into four (ts, lsn)-ordered batches and each batch is applied as the
    union of itself and a FULL RE-SEND of the previous batch — the
    at-least-once / snapshot-re-read upstream shape where most delivered
    rows are state no-ops. Change detection must elide exactly the no-op
    rows (identical full images, deletes of absent keys) and keep the
    real changes, converging to the SAME final state as the flagship
    (same DuckDB oracle). The query also re-applies the final batch once
    more and asserts the merge was a ZERO-COMMIT no-op (table version
    unchanged) — the all-unchanged-batch contract."""
    from pyspark.sql.window import Window

    from etl_spark.cdc.apply import apply_batch

    chg = _events_changelog(spark, sf_dir).withColumn(
        "__q",
        F.ntile(4).over(Window.orderBy(F.col("ts"), F.col("lsn"))),
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="etl_spark_skipun_q_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "t"), schema, key=["user_id"], n_buckets=32
    )
    for q in range(1, 5):
        batch = chg.filter(
            (F.col("__q") == q) | (F.col("__q") == q - 1)
        ).drop("__q")
        apply_batch(spark, batch, table, batch_id=q, skip_unchanged=True,
                    validators=[("op_known", F.col("op").isin("I", "U", "D"))])
    v_before = table.snapshot().version
    stats = apply_batch(
        spark, chg.filter(F.col("__q") == 4).drop("__q"), table,
        batch_id=5, skip_unchanged=True,
        validators=[("op_known", F.col("op").isin("I", "U", "D"))],
    )
    assert table.snapshot().version == v_before, (
        "re-applied all-unchanged batch must be a zero-commit no-op"
    )
    assert stats["rows_applied"] == 0, stats
    return table.read().select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


def q_multi_table_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table WAL routing (``cdc.route_batch``): the events changelog
    is labeled with a destination by user_id parity and split into two
    (ts, lsn)-ordered batches; each heterogeneous batch routes through
    ONE catalog transaction — per-destination LWW dedup + MERGE on
    branch handles, a single catalog commit flipping both tables'
    visibility together, exactly-once commit markers. The union of the
    two converged tables (read through the catalog, so through the
    atomic pointers) must equal the flagship's LWW oracle with the
    parity label re-derived — proving routing loses nothing, duplicates
    nothing, and leaks nothing across destinations."""
    from pyspark.sql.window import Window

    from etl_spark.cdc.router import route_batch
    from etl_spark.cdc.state import CommitLog
    from etl_spark.lake import Catalog

    chg = _events_changelog(spark, sf_dir).select(
        F.when(F.col("user_id") % 2 == 0, F.lit("even"))
        .otherwise(F.lit("odd"))
        .alias("dest_table"),
        "*",
    ).withColumn(
        "__q", F.ntile(2).over(Window.orderBy(F.col("ts"), F.col("lsn")))
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="etl_spark_route_q_")
    cat = Catalog.create(spark, os.path.join(tmp, "cat"))
    # deliberately different bucket counts: the router's fused accounting
    # pass computes each destination's histogram under its OWN spec
    for name, nb in (("even", 32), ("odd", 16)):
        cat.register(
            name,
            LakeTable.create(
                spark, os.path.join(tmp, name), schema,
                key=["user_id"], n_buckets=nb,
            ),
        )
    log = CommitLog(os.path.join(tmp, "commits"))
    for q in (1, 2):
        route_batch(
            spark, chg.filter(F.col("__q") == q).drop("__q"), cat,
            batch_id=q, commit_log=log,
        )
    parts = [
        cat.read(name).select(
            F.lit(name).alias("dest"),
            "user_id",
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
            F.col("ts").alias("last_ts"),
        )
        for name in ("even", "odd")
    ]
    return parts[0].unionByName(parts[1])


_ORACLE_MULTI_ROUTE = """
WITH ranked AS (
  SELECT user_id, event_type, value, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT CASE WHEN user_id % 2 = 0 THEN 'even' ELSE 'odd' END AS dest,
       user_id,
       event_type AS last_event_type,
       value      AS last_value,
       ts         AS last_ts
FROM ranked WHERE rn = 1 AND event_type <> 'error'
"""


def _run_patch_apply(
    spark: SparkSession, sf_dir: str, mode: str, compact_after: int | None
) -> DataFrame:
    """Shared body of the two patch queries: derive the TOAST-style patch
    changelog from `events` (inserts full, updates touch a deterministic
    column subset, errors delete), apply it in four (ts, lsn)-ordered
    batches via ``apply_patches(mode=...)``, optionally compacting after
    batch ``compact_after``, and read the converged state. ONE derivation
    shared by both entries so the oracle contract can never drift between
    the eager and deferred paths."""
    from pyspark.sql.window import Window

    from etl_spark.cdc.patch import apply_patches

    events = _t(spark, sf_dir, "events")
    eid3 = F.pmod(F.col("event_id"), F.lit(3))
    chg = events.select(
        "user_id",
        F.col("ts"),
        F.col("event_id").alias("lsn"),
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.pmod(F.col("event_id"), F.lit(5)) == 0, F.lit("I"))
        .otherwise(F.lit("U"))
        .alias("op"),
        "event_type",
        "value",
        F.when(eid3 == 0, F.array(F.lit("value")))
        .when(eid3 == 1, F.array(F.lit("event_type")))
        .otherwise(F.array(F.lit("value"), F.lit("event_type")))
        .alias("touched"),
    ).withColumn(
        "__q", F.ntile(4).over(Window.orderBy(F.col("ts"), F.col("lsn")))
    )
    chg.persist()
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="etl_spark_patch_q_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "t"), schema, key=["user_id"], n_buckets=32
    )
    try:
        for q in range(1, 5):
            apply_patches(
                table,
                chg.filter(F.col("__q") == q).drop("__q"),
                key=["user_id"],
                order_by=["ts", "lsn"],
                mode=mode,
            )
            if compact_after is not None and q == compact_after:
                table.compact()
    finally:
        chg.unpersist()
    return table.read().select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


def q_cdc_apply_patch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-update (patch) CDC apply (cdc.patch): the events changelog
    becomes a TOAST/minimal-row-image-style stream — inserts are full
    images, updates carry ONLY the columns named in ``touched`` (the
    others must keep their stored value), deletes clear the row. Applied
    in four (ts, lsn)-ordered batches via ``apply_patches``: one
    map-side-combinable column-wise LWW fold per batch, stored values for
    untouched columns resolved from a bucket-pruned broadcast-semi-joined
    read (the table side never shuffles), then the ordinary MERGE. The
    oracle replays the identical patch semantics over the full log with
    DuckDB struct-max aggregates — untouched-keeps-stored, explicit
    set-to-NULL, and delete-then-patch recreation must all agree."""
    return _run_patch_apply(spark, sf_dir, mode="cow", compact_after=None)


def q_cdc_apply_patch_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deferred-resolution patch apply (``LakeTable.commit_patches`` —
    the Paimon partial-update merge-on-read shape): the SAME patch
    changelog as ``cdc_apply_patch``, but each batch commits O(batch)
    patch-delta files with NO stored-row read; column resolution happens
    in the read gate (``_fold_patch_rows``). Batches 1-2 are compacted
    mid-stream (materialize-then-continue), batches 3-4 are left as a
    live backlog — so the oracle validates BOTH the compaction fold and
    the read-time fold against the same full-log DuckDB column-wise
    struct-max oracle, bit-exactly."""
    return _run_patch_apply(spark, sf_dir, mode="mor_patch", compact_after=2)


_ORACLE_CDC_PATCH = """
WITH chg AS (
  SELECT user_id, ts, event_id AS lsn,
         CASE WHEN event_type = 'error' THEN 'D'
              WHEN event_id % 5 = 0 THEN 'I'
              ELSE 'U' END AS op,
         event_type, value,
         CASE WHEN event_id % 3 = 0 THEN ['value']
              WHEN event_id % 3 = 1 THEN ['event_type']
              ELSE ['value', 'event_type'] END AS touched
  FROM events),
folded AS (
  SELECT user_id,
    max(CASE WHEN op <> 'U' OR list_contains(touched, 'event_type')
        THEN struct_pack(ts := ts, lsn := lsn,
             p := struct_pack(v := CASE WHEN op = 'D' THEN NULL
                                        ELSE event_type END)) END) AS et,
    max(CASE WHEN op <> 'U' OR list_contains(touched, 'value')
        THEN struct_pack(ts := ts, lsn := lsn,
             p := struct_pack(v := CASE WHEN op = 'D' THEN NULL
                                        ELSE value END)) END) AS val,
    max(struct_pack(ts := ts, lsn := lsn, o := op)) AS last
  FROM chg GROUP BY user_id)
SELECT user_id,
       et.p.v  AS last_event_type,
       val.p.v AS last_value,
       last.ts AS last_ts
FROM folded WHERE last.o <> 'D'
"""


def q_debezium_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium-envelope adapter (sources.debezium): the events changelog
    is serialized into standard Debezium JSON envelopes (before/after
    images, source.lsn, ts_ms) and parsed back into normalized engine
    change rows — one ``to_json`` and one ``from_json`` projection, pure
    JVM codegen. The oracle computes the same normalization straight from
    the parquet, so the round trip must be the identity: payload values
    bit-exact, deletes carrying their pre-image, ts at the envelope's
    millisecond precision."""
    from etl_spark.sources.debezium import (
        parse_debezium,
        split_rejects,
        to_debezium_json,
    )

    chg = _events_changelog(spark, sf_dir)
    payload_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    js = to_debezium_json(chg, ["user_id", "event_type", "value"])
    clean, _rejects = split_rejects(
        parse_debezium(js, payload_schema)
    )
    return clean.select("user_id", "event_type", "value", "op", "lsn", "ts")


_ORACLE_DEBEZIUM = """
SELECT user_id, event_type, value,
       CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
       event_id AS lsn,
       make_timestamp(epoch_ms(ts) * 1000) AS ts
FROM events
"""


def q_change_feed_replicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC chaining end-to-end (lake.export): the events changelog replays
    into a PRIMARY lake table in two temporal windows; after each window
    the primary's change feed is exported as Debezium-envelope JSONL (the
    engine as a CDC *producer* — bucket-pruned ``table_changes`` diff +
    ``to_debezium_json`` encode) and applied to a REPLICA through
    ``parse_debezium`` + exactly-once ``apply_batch``. Returns the
    replica's converged state, checked against the SAME full-log LWW
    oracle as ``cdc_apply_final_state`` — the export -> feed -> replay
    chain must be lossless: deletes, NULL updates, doubles, and
    microsecond timestamps all survive the JSON wire format."""
    from etl_spark.lake.export import replicate

    events = _t(spark, sf_dir, "events")
    chg = events.select(
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("event_id").alias("lsn"),
        F.col("ts"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("value"),
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="etl_spark_cdf_rep_")
    primary = LakeTable.create(
        spark, os.path.join(tmp, "primary"), schema, key=["user_id"],
        n_buckets=32,
    )
    replica = LakeTable.create(
        spark, os.path.join(tmp, "replica"), schema, key=["user_id"],
        n_buckets=32,
    )
    # split on event time so cross-window per-key order IS (ts, lsn) order
    cut = F.lit("2024-01-16").cast("timestamp")
    for window in (chg.filter(F.col("ts") < cut), chg.filter(F.col("ts") >= cut)):
        replay(spark, window, primary)
        replicate(spark, primary, replica, os.path.join(tmp, "chain"))
    return replica.read().select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


def q_merge_mor_out_of_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Guarded merge-on-read (``mode="mor"`` + ``lww_by``): the same
    wrong-order parity split as ``merge_out_of_order``, but every commit
    is a mor delta — stale events must be skipped by the stored-order
    guard AND already-applied newer state must keep shadowing at read
    time; delete tombstones double as equality-delete sources. Converges
    to the identical global-LWW oracle without ever rewriting a bucket."""
    chg = _events_changelog(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("lsn", T.LongType()),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="etl_spark_mor_ooo_q_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "t"), schema, key=["user_id"], n_buckets=32
    )
    replay(
        spark, chg.filter(F.col("lsn") % 2 == 0), table,
        merge_lww_by=["ts", "lsn"], mor=True,
    )
    replay(
        spark, chg.filter(F.col("lsn") % 2 == 1), table,
        merge_lww_by=["ts", "lsn"], mor=True,
    )
    return table.read().select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
        F.col("lsn").alias("last_lsn"),
    )


_ORACLE_OOO_MERGE = """
WITH ranked AS (
  SELECT user_id, event_type, value, ts, event_id AS lsn,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
SELECT user_id,
       event_type AS last_event_type,
       value      AS last_value,
       ts         AS last_ts,
       lsn        AS last_lsn
FROM ranked WHERE rn = 1 AND event_type <> 'error'
"""


def q_branch_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writable-branch lifecycle (``LakeTable.create_branch/branch/
    fast_forward/drop_branch`` — Iceberg branch semantics): the flagship
    changelog replays in FOUR (ts, lsn)-ordered batches — 1-2 straight
    onto main, 3-4 as a MULTI-COMMIT staged lineage on branch
    ``backfill`` (the thing one-shot WAP cannot express), audited as a
    whole and fast-forwarded atomically; a poison branch is audited and
    dropped without main ever seeing it. Final state must equal the
    flagship oracle bit-exactly — proof the branch replay is the same
    replay, just staged."""
    from pyspark.sql.window import Window

    chg = _events_changelog(spark, sf_dir).withColumn(
        "__q",
        F.ntile(4).over(Window.orderBy(F.col("ts"), F.col("lsn"))),
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="etl_spark_branch_q_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "t"), schema, key=["user_id"], n_buckets=32
    )
    for q in (1, 2):
        replay(spark, chg.filter(F.col("__q") == q).drop("__q"), table)
    # a poisoned reprocessing attempt: staged on its own branch, fails
    # audit, dropped — main and the real backfill never see it
    poison = table.create_branch("poison")
    poison.merge(
        spark.createDataFrame(
            [(999_999_001, "__poison", 0.0, None)], schema
        )
    )
    assert (
        poison.read().filter(F.col("event_type").startswith("__"))
        .limit(1).count() > 0
    )
    table.drop_branch("poison")
    # the real backfill: two commits staged as one lineage, one audit,
    # one atomic publish
    b = table.create_branch("backfill")
    for q in (3, 4):
        replay(spark, chg.filter(F.col("__q") == q).drop("__q"), b)
    assert b.read().filter(F.col("user_id").isNull()).limit(1).count() == 0
    table.fast_forward("backfill")
    return table.read().select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


def q_wap_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish gate (``LakeTable.wap/staged/publish/abandon``,
    Iceberg's WAP pattern): the flagship changelog replays in FOUR
    (ts, lsn)-ordered batches, each one STAGED as an invisible snapshot,
    audit-queried against the staged view, and only then published onto
    the live chain; a poisoned batch injected mid-sequence fails its
    audit and is abandoned, so the final table must equal the flagship
    oracle exactly — the gate provably kept bad data out without
    disturbing the good commits."""
    from pyspark.sql.window import Window

    chg = _events_changelog(spark, sf_dir).withColumn(
        "__q",
        F.ntile(4).over(Window.orderBy(F.col("ts"), F.col("lsn"))),
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="etl_spark_wap_q_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "t"), schema, key=["user_id"], n_buckets=32
    )

    def audit_ok(view) -> bool:
        # the pipeline's quality gate: no poison markers, no NULL keys
        bad = view.read().filter(
            F.col("user_id").isNull() | F.col("event_type").startswith("__")
        )
        return bad.limit(1).count() == 0

    for q in range(1, 5):
        if q == 3:
            # out-of-band poison batch: staged, caught by audit, abandoned
            poison = spark.createDataFrame(
                [(999_999_001 + i, "__poison", 0.0, None, "U") for i in range(3)],
                T.StructType(
                    schema.fields + [T.StructField("op", T.StringType())]
                ),
            )
            with table.wap("poison"):
                table.merge(poison, op_col="op")
            assert not audit_ok(table.staged("poison"))
            table.abandon("poison")
        wap_id = f"batch-{q}"
        with table.wap(wap_id):
            replay(spark, chg.filter(F.col("__q") == q).drop("__q"), table)
        if audit_ok(table.staged(wap_id)):
            table.publish(wap_id)
        else:  # pragma: no cover - good batches always pass
            table.abandon(wap_id)
    return table.read().select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


def q_catalog_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Atomic cross-table transactions (``lake.catalog.Catalog`` —
    Nessie/Iceberg-REST multi-table commit semantics): the flagship
    changelog replays in FOUR (ts, lsn)-ordered batches; each batch is
    ONE catalog transaction routing its even-user rows to table ``even``
    and its odd-user rows to table ``odd`` (the A/B-split / target+
    derived-tables shape), staged on writable branches and flipped
    visible by a single catalog link-create. In-query invariants: the
    catalog head advances exactly once per batch, and the two tables'
    pinned reads stay a CONSISTENT pair at every catalog version. Final
    answer = the union of the two catalog-pinned reads, which must equal
    the flagship full-log LWW oracle bit-exactly — proof the split
    transactional replay is the same replay."""
    from pyspark.sql.window import Window

    from etl_spark.lake.catalog import Catalog

    chg = _events_changelog(spark, sf_dir).withColumn(
        "__q",
        F.ntile(4).over(Window.orderBy(F.col("ts"), F.col("lsn"))),
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="etl_spark_cat_q_")
    cat = Catalog.create(spark, os.path.join(tmp, "cat"))
    for name in ("even", "odd"):
        cat.register(
            name,
            LakeTable.create(
                spark, os.path.join(tmp, name), schema,
                key=["user_id"], n_buckets=16,
            ),
        )
    parity = (F.col("user_id") % 2 == 0)
    for q in range(1, 5):
        batch = chg.filter(F.col("__q") == q).drop("__q")
        base = cat.current_version()
        txn = cat.transaction()
        replay(spark, batch.filter(parity), txn.table("even"))
        replay(spark, batch.filter(~parity), txn.table("odd"))
        v = txn.commit()
        assert v == base + 1, "one catalog commit per transaction"
    union = cat.read("even").unionByName(cat.read("odd"))
    return union.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


def q_catalog_replicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-catalog replication (``lake.replicate.CatalogReplicator``):
    the flagship changelog replays into a PRIMARY catalog in two
    (ts, lsn)-ordered windows, each window ONE catalog transaction
    routing even-user rows to table ``even`` and odd-user rows to
    ``odd``; after each window a replicator tick exports both tables'
    change windows AT THE CATALOG PINS, applies them to a replica
    catalog's tables, and flips the replica pointer set in ONE commit.
    In-query invariants: the replica catalog advances exactly once per
    tick (bootstrap registration + flip ride the first commit together)
    and a third quiet tick commits NOTHING. Final answer = the union of
    the REPLICA catalog's pinned reads, which must equal the flagship
    full-log LWW oracle bit-exactly — the consistent-cut chain
    (txn -> pin-bounded export -> exactly-once apply -> atomic flip)
    is lossless end to end."""
    from pyspark.sql.window import Window

    from etl_spark.lake.catalog import Catalog
    from etl_spark.lake.replicate import CatalogReplicator

    chg = _events_changelog(spark, sf_dir).withColumn(
        "__q",
        F.ntile(2).over(Window.orderBy(F.col("ts"), F.col("lsn"))),
    )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="etl_spark_catrep_q_")
    cat = Catalog.create(spark, os.path.join(tmp, "cat"))
    for name in ("even", "odd"):
        cat.register(
            name,
            LakeTable.create(
                spark, os.path.join(tmp, name), schema,
                key=["user_id"], n_buckets=16,
            ),
        )
    replica = Catalog.create(spark, os.path.join(tmp, "replica"))
    rep = CatalogReplicator(spark, cat, replica, os.path.join(tmp, "work"))
    parity = (F.col("user_id") % 2 == 0)
    for q in range(1, 3):
        batch = chg.filter(F.col("__q") == q).drop("__q")
        txn = cat.transaction()
        replay(spark, batch.filter(parity), txn.table("even"))
        replay(spark, batch.filter(~parity), txn.table("odd"))
        txn.commit()
        base = replica.current_version()
        rep.tick()
        assert replica.current_version() == base + 1, (
            "one replica catalog flip per tick"
        )
    quiet = rep.tick()
    assert quiet["replica_catalog_version"] == replica.current_version(), (
        "quiet tick must commit nothing"
    )
    union = replica.read("even").unionByName(replica.read("odd"))
    return union.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


def q_catalog_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-level anti-entropy (``lake.sync.repair_catalog``): the
    flagship changelog replays into an even/odd 2-member catalog,
    replicates once, then BOTH replica members are corrupted out-of-band
    in different classes (rows deleted from ``even``; payloads tampered
    + alien rows on ``odd``); ``repair_catalog`` converges every member
    against the primary's pinned cut and flips the replica catalog in
    ONE commit (asserted in-query, plus a second repair committing
    nothing). Final answer = union of the REPLICA pinned reads vs the
    flagship full-log LWW oracle — bit-exact."""
    from etl_spark.lake.catalog import Catalog
    from etl_spark.lake.replicate import CatalogReplicator
    from etl_spark.lake.sync import repair_catalog

    chg = _events_changelog(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="etl_spark_catrepair_q_")
    cat = Catalog.create(spark, os.path.join(tmp, "cat"))
    parity = (F.col("user_id") % 2 == 0)
    for name, side in (("even", parity), ("odd", ~parity)):
        t = LakeTable.create(
            spark, os.path.join(tmp, name), schema,
            key=["user_id"], n_buckets=16,
        )
        replay(spark, chg.filter(side), t)
        cat.register(name, t)
    replica = Catalog.create(spark, os.path.join(tmp, "replica"))
    CatalogReplicator(spark, cat, replica, os.path.join(tmp, "work")).tick()

    sel = F.pmod(F.xxhash64("user_id"), F.lit(5))
    even_r = replica.table("even")
    even_r.delete_where(sel == 0)  # silently lost rows
    odd_r = replica.table("odd")
    cur = odd_r.read()
    opified = T.StructType(schema.fields + [T.StructField("op", T.StringType())])
    odd_r.merge(
        cur.filter(sel == 1).select(  # tampered payloads
            "user_id", F.lit("tampered").alias("event_type"),
            (F.col("value") * 2 + 1).alias("value"), "ts",
            F.lit("U").alias("op"),
        ).unionByName(
            spark.createDataFrame(  # alien rows the primary never had
                [(900_000_001 + 2 * i, "alien", -1.0, None, "U")
                 for i in range(5)],
                opified,
            )
        ),
        op_col="op",
    )

    base = replica.current_version()
    repair_catalog(cat, replica)
    assert replica.current_version() == base + 1, "one flip for all repairs"
    again = repair_catalog(cat, replica)
    assert replica.current_version() == base + 1, (
        "converged catalog repairs nothing"
    )
    assert all(v["repaired"] == 0 for v in again["tables"].values())
    union = replica.read("even").unionByName(replica.read("odd"))
    return union.select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


def q_replica_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy repair (``lake.sync``): a replica of the flagship
    table is corrupted out-of-band in every class the fingerprints must
    catch — deleted rows, tampered payloads (including a value→NULL
    flip), alien extra rows — then ``repair_replica`` detects the
    divergent buckets from O(n_buckets) fingerprint triples, diffs ONLY
    those buckets, and MERGEs the replica back to convergence. The
    repaired replica must match the flagship oracle bit-exactly."""
    from etl_spark.lake.sync import repair_replica

    chg = _events_changelog(spark, sf_dir)
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    tmp = tempfile.mkdtemp(prefix="etl_spark_sync_q_")
    primary = LakeTable.create(
        spark, os.path.join(tmp, "p"), schema, key=["user_id"], n_buckets=32
    )
    replay(spark, chg, primary)
    replica = LakeTable.create(
        spark, os.path.join(tmp, "r"), schema, key=["user_id"], n_buckets=32
    )
    replica.append(primary.read())

    cur = primary.read()
    sel = F.pmod(F.xxhash64("user_id"), F.lit(7))
    opified = T.StructType(schema.fields + [T.StructField("op", T.StringType())])
    corruption = (
        cur.filter(sel == 0).select(  # silently lost rows
            "user_id", "event_type", "value", "ts", F.lit("D").alias("op")
        )
        .unionByName(
            cur.filter(sel == 1).select(  # tampered payloads
                "user_id",
                F.lit("tampered").alias("event_type"),
                (F.col("value") * 2 + 1).alias("value"),
                "ts",
                F.lit("U").alias("op"),
            )
        )
        .unionByName(
            cur.filter(sel == 2).select(  # value -> NULL flips
                "user_id", "event_type",
                F.lit(None).cast("double").alias("value"),
                "ts", F.lit("U").alias("op"),
            )
        )
        .unionByName(  # alien rows the primary never had
            spark.createDataFrame(
                [(900_000_000 + i, "alien", -1.0, None, "U") for i in range(5)],
                opified,
            )
        )
    )
    replica.merge(corruption, op_col="op")
    repair_replica(primary, replica)
    return replica.read().select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.col("ts").alias("last_ts"),
    )


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time sessionization (30-min gap) — the stateful-stream shape
    (§2.6 T10 extension) as a batch window op."""
    from pyspark.sql import Window

    events = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    is_new = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    out = events.withColumn("_new", is_new)
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return out.select(
        "user_id",
        "event_id",
        F.sum("_new").over(w2).cast("long").alias("session_idx"),
    )


_ORACLE_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, event_id,
       CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
FROM g
"""


# --------------------------------------------------------------------------
# Projections / mapping (P1-P13)
# --------------------------------------------------------------------------

def q_field_map_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1-P3: field map with rename + ternary template + literal."""
    orders = _t(spark, sf_dir, "orders")
    return field_map(
        orders,
        {
            "okey": "o_orderkey",
            "status_label": "{{o_orderstatus == 'F' ? 'FILLED' : 'OPEN'}}",
            "priority": "o_orderpriority",
        },
        additional={"src_system": "legacy"},
    )


_ORACLE_FIELD_MAP = """
SELECT o_orderkey AS okey,
       CASE WHEN o_orderstatus = 'F' THEN 'FILLED' ELSE 'OPEN' END AS status_label,
       o_orderpriority AS priority,
       'legacy' AS src_system
FROM orders
"""


def q_field_map_dotted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14: dotted struct-path + job-context namespace resolution
    (/root/reference/lib/value.go:34-210). Events are nested into a struct
    column first, then mapped back out through ``meta.x`` paths plus a
    ``param.x`` context literal — the reference-YAML access pattern."""
    events = _t(spark, sf_dir, "events")
    nested = events.select(
        "event_id",
        F.struct(
            F.col("event_type").alias("kind"),
            F.col("value").alias("score"),
            F.struct(F.col("user_id").alias("uid")).alias("who"),
        ).alias("meta"),
    )
    return field_map(
        nested,
        {
            "eid": "event_id",
            "kind": "meta.kind",
            "score": "meta.score",
            "uid": "meta.who.uid",
            "tenant": "param.tenant",
        },
        context={"param": {"tenant": "acme"}},
    )


_ORACLE_FIELD_MAP_DOTTED = """
SELECT event_id AS eid, event_type AS kind, value AS score,
       user_id AS uid, 'acme' AS tenant
FROM events
"""


def q_concat_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: concat_ws + drop sources (/root/reference/concat/concat.go:25-46)."""
    customer = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    return concat_fields(customer, ["c_name", "c_mktsegment"], "name_segment", "-")


_ORACLE_CONCAT = """
SELECT c_custkey, c_name || '-' || c_mktsegment AS name_segment FROM customer
"""


def q_slug(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: slug() scalar fn (/root/reference/etl.go:21-32)."""
    part = _t(spark, sf_dir, "part")
    return part.select("p_partkey", slug("p_name").alias("name_slug"))


_ORACLE_SLUG = """
SELECT p_partkey,
       regexp_replace(
         regexp_replace(lower(trim(p_name)), '[^a-z0-9]+', '-', 'g'),
         '^-+|-+$', '', 'g') AS name_slug
FROM part
"""


def q_uppercase_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: uppercase every string value
    (/root/reference/v2/transfomer/transformers.go:11-20)."""
    return uppercase_string_values(_t(spark, sf_dir, "region"))


_ORACLE_UPPER = "SELECT r_regionkey, upper(r_name) AS r_name FROM region"


def q_include_exclude_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13: include/extra projection (/root/reference/etl.go:243-297)."""
    events = _t(spark, sf_dir, "events")
    return include_exclude_extra(
        events,
        include=["event_id", "event_type", "user_id"],
        exclude=["user_id"],
        extra={"origin": "events", "uid": "field:event_id"},
    )


_ORACLE_INC_EXC = """
SELECT event_id, event_type, 'events' AS origin, event_id AS uid FROM events
"""


def q_coerce_to_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12: destination-schema coercion incl. boolean normalization
    (/root/reference/etl.go:530-554)."""
    events = _t(spark, sf_dir, "events").withColumn(
        "active_flag",
        F.when(F.col("value") > 0.5, F.lit("1")).otherwise(F.lit("no")),
    )
    target = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.IntegerType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("active_flag", T.BooleanType()),
            T.StructField("missing_col", T.StringType()),
        ]
    )
    return coerce_to_schema(events, target)


_ORACLE_COERCE = """
SELECT event_id,
       CAST(user_id AS INTEGER) AS user_id,
       event_type,
       CASE WHEN value > 0.5 THEN true ELSE false END AS active_flag,
       CAST(NULL AS VARCHAR) AS missing_col
FROM events
"""


# --------------------------------------------------------------------------
# Reshape (R1, R2)
# --------------------------------------------------------------------------

def q_kv_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1: key-value unpivot with schema-as-data type tags
    (/root/reference/etl.go:226-300)."""
    customer = _t(spark, sf_dir, "customer")
    return kv_unpivot(
        customer,
        value_columns=["c_name", "c_mktsegment", "c_nationkey"],
        include=["c_custkey"],
        key_field="key",
        value_field="value",
        type_field="value_type",
        exclude_keys=["c_name"],
    )


_ORACLE_KV = """
SELECT c_custkey, 'c_mktsegment' AS key, c_mktsegment AS value,
       'string' AS value_type FROM customer
UNION ALL
SELECT c_custkey, 'c_nationkey', CAST(c_nationkey AS VARCHAR), 'int' FROM customer
"""


def q_multi_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: row multiplication via explode(array(struct...))
    (/root/reference/migrate/migrate.go:82-119)."""
    orders = _t(spark, sf_dir, "orders")
    return multi_mapping(
        orders,
        [
            {"okey": "o_orderkey", "kind": "status", "val": "o_orderstatus"},
            {"okey": "o_orderkey", "kind": "priority", "val": "o_orderpriority"},
        ],
    )


_ORACLE_MULTI_MAP = """
SELECT o_orderkey AS okey, 'status' AS kind, o_orderstatus AS val FROM orders
UNION ALL
SELECT o_orderkey, 'priority', o_orderpriority FROM orders
"""


# --------------------------------------------------------------------------
# Filters / validators (F1-F4), lookup (P5)
# --------------------------------------------------------------------------

def q_isin_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: IN-list rule filter (/root/reference/examples/main.go:38-49)."""
    li = _t(spark, sf_dir, "lineitem")
    return isin_filter(li, "l_returnflag", ["A", "R"]).select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )


_ORACLE_ISIN = """
SELECT l_orderkey, l_linenumber, l_returnflag
FROM lineitem WHERE l_returnflag IN ('A', 'R')
"""


def q_validator_dead_letter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3/K3: validator split — the dead-letter side with first-failure
    labels (/root/reference/v2/etl.go:133-141, etl.go:302-333)."""
    events = _t(spark, sf_dir, "events")
    _, dead = validator_split(
        events,
        [
            ("value_in_range", F.col("value") < 0.9),
            ("not_error", F.col("event_type") != "error"),
        ],
    )
    return dead.select("event_id", "event_type", "error")


_ORACLE_DEAD = """
SELECT event_id, event_type,
       CASE WHEN NOT (value < 0.9) THEN 'value_in_range'
            WHEN NOT (event_type <> 'error') THEN 'not_error' END AS error
FROM events
WHERE NOT (value < 0.9 AND event_type <> 'error')
"""


def q_lookup_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: lookupIn dimension lookup as a broadcast left join
    (/root/reference/mapper/mapper.go:60-120)."""
    customer = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return lookup_in(
        customer.select("c_custkey", "c_name", "c_nationkey"),
        nation,
        fact_key="c_nationkey",
        dim_key="n_nationkey",
        value_column="n_name",
        output_column="nation_name",
        default="UNKNOWN",
    )


_ORACLE_LOOKUP = """
SELECT c_custkey, c_name, c_nationkey,
       COALESCE(n.n_name, 'UNKNOWN') AS nation_name
FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


# --------------------------------------------------------------------------
# Relational pushdown parity (R3-R7): join / distinct / sort / limit / agg
# --------------------------------------------------------------------------

def q_agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7 + vectorized agg: TPC-H-Q1-shaped rollup. Sums go through
    DECIMAL(18,4) so the parallel Spark aggregation is bit-identical to the
    sequential DuckDB one."""
    li = _t(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))).cast(
                    "decimal(28,8)"
                )
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_ORACLE_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                AS DECIMAL(28,8))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3: multi-way join + agg — nation is broadcast (the lookup-cache
    shape at cluster scale)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    nation = _t(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


_ORACLE_REVENUE = """
SELECT n_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n_name
"""


def q_distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4: DISTINCT (/root/reference/examples/memberships.yaml:23)."""
    return _t(spark, sf_dir, "customer").select("c_mktsegment").distinct()


_ORACLE_DISTINCT = "SELECT DISTINCT c_mktsegment FROM customer"


def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5/R6: sort + limit."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice")
    )


_ORACLE_TOP = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_entity_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7: entity + child rows sharing an identifier
    (/root/reference/entity.go:27-50)."""
    customer = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    parent = customer.filter(F.col("c_custkey") <= 5)
    return parent.join(
        orders, parent.c_custkey == orders.o_custkey, "inner"
    ).select("c_custkey", "c_name", "o_orderkey", "o_orderstatus")


_ORACLE_ENTITY = """
SELECT c_custkey, c_name, o_orderkey, o_orderstatus
FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
WHERE c_custkey <= 5
"""


def q_update_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K10: config-driven destination UPDATE (reference
    /root/reference/migrate/migrate.go:142-150) — customer is loaded into
    a bucketed lake table, an ``update_query`` TableConfig rewrites the
    negative-balance rows via bucket-pruned copy-on-write, converged state
    read back."""
    from etl_spark.plans.config import MigrationConfig, TableConfig, run_migration

    customer = _t(spark, sf_dir, "customer")
    tmp = tempfile.mkdtemp(prefix="etl_spark_upd_q_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "cust"), customer.schema,
        key=["c_custkey"], n_buckets=8,
    )
    table.append(customer)
    cfg = MigrationConfig(
        tables=[
            TableConfig(
                new_name="cust",
                update_query=(
                    "UPDATE cust SET c_mktsegment = concat(c_mktsegment, '-NEG'), "
                    "c_acctbal = c_acctbal * 2 WHERE c_acctbal < 0"
                ),
            )
        ]
    )
    run_migration(spark, cfg, sources={}, dest_root=tmp)
    return table.read().select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


def q_delete_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level DELETE WHERE (retention/TTL shape): customer loads into
    a bucketed lake table, ``delete_where`` rewrites only the buckets
    containing matches (negative balances), prior snapshots stay
    time-travelable. Oracle: plain NOT-matching SELECT."""
    customer = _t(spark, sf_dir, "customer")
    tmp = tempfile.mkdtemp(prefix="etl_spark_del_q_")
    table = LakeTable.create(
        spark, os.path.join(tmp, "cust"), customer.schema,
        key=["c_custkey"], n_buckets=8,
    )
    table.append(customer)
    table.delete_where("c_acctbal < 0")
    return table.read().select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


_ORACLE_DELETE_WHERE = """
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
FROM customer WHERE NOT (c_acctbal < 0)
"""


_ORACLE_UPDATE = """
SELECT c_custkey, c_name, c_nationkey,
       CASE WHEN c_acctbal < 0 THEN c_acctbal * 2 ELSE c_acctbal END AS c_acctbal,
       CASE WHEN c_acctbal < 0 THEN c_mktsegment || '-NEG' ELSE c_mktsegment END
         AS c_mktsegment
FROM customer
"""


# --------------------------------------------------------------------------
# Training-data pipeline: dedup / similarity / text analysis / multimodal
# --------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return exact_dedup(docs, "text", "doc_id")


_ORACLE_DEDUP_EXACT = r"""
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
FROM documents
GROUP BY lower(trim(regexp_replace(text, '\s+', ' ', 'g')))
"""


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard near-dup pairs (inverted-index join).
    ``max_doc_frequency=0`` disables the hot-shingle cap: this entry is
    compared against an EXACT DuckDB Jaccard, so the (approximating) cap
    must be off — a corpus with one near-stopword shingle would otherwise
    silently change intersection counts."""
    docs = _t(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, threshold=0.5, max_doc_frequency=0
    ).withColumn("jaccard", F.round("jaccard", 6))


_ORACLE_JACCARD = r"""
WITH words AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
              ELSE w[i] || ' ' || w[i+1] || ' ' || w[i+2] END AS shingle
  FROM words,
       UNNEST(CASE WHEN len(w) < 3 THEN [1]
                   ELSE range(1, len(w) - 1) END) AS t(i)),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
SELECT id_a, id_b,
       round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = id_a
JOIN sz sb ON sb.doc_id = id_b
WHERE inter / (sa.sz + sb.sz - inter) >= 0.5
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER formation: n-gram Jaccard pairs -> connected
    components (min-label propagation) -> (doc_id, cluster_id). The oracle
    recomputes the same pairs in SQL and closes them transitively with a
    recursive CTE — so the distributed label propagation is checked
    against exact graph semantics."""
    from etl_spark.operators.dedup import connected_components

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, max_doc_frequency=0)
    return connected_components(pairs)


_ORACLE_CLUSTERS = r"""
WITH RECURSIVE words AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
              ELSE w[i] || ' ' || w[i+1] || ' ' || w[i+2] END AS shingle
  FROM words,
       UNNEST(CASE WHEN len(w) < 3 THEN [1]
                   ELSE range(1, len(w) - 1) END) AS t(i)),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sz sa ON sa.doc_id = id_a
  JOIN sz sb ON sb.doc_id = id_b
  WHERE inter / (sa.sz + sb.sz - inter) >= 0.5),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION SELECT id_b, id_a FROM pairs),
reach AS (
  SELECT a AS v, a AS r FROM edges
  UNION
  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.v)
SELECT v AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY v
"""


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end of the dedup pipeline: the corpus that SURVIVES near-dup
    removal — every unclustered doc plus one representative (min id) per
    near-dup cluster. pairs -> components -> anti-join; the materialized
    view a training run would actually read."""
    from etl_spark.operators.dedup import connected_components

    docs = _t(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, threshold=0.5, max_doc_frequency=0)
    clusters = connected_components(pairs)
    victims = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    return docs.join(victims, on="doc_id", how="left_anti").select("doc_id")


_ORACLE_SURVIVORS = _ORACLE_CLUSTERS.replace(
    "SELECT v AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY v",
    """, cc AS (SELECT v AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY v)
SELECT doc_id FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM cc WHERE doc_id <> cluster_id)""",
)


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data quality gate: keep documents over a quality score
    with enough tokens — the filter stage between text analysis and
    tokenization in a data pipeline."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        quality_score("text").alias("quality"),
        token_count("text").alias("n_tokens"),
    ).filter((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 20)).select(
        "doc_id", F.round("quality", 6).alias("quality"), "n_tokens"
    )


_ORACLE_QUALITY_FILTER = r"""
WITH h AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS n,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
         CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS punct,
         CAST(len(regexp_extract_all(lower(text),
              '\b(the|and|of|to|in|is|for|that|with|a)\b')) AS DOUBLE) AS stop_hits,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|\d+|[^\sA-Za-z\d]')) AS INTEGER)
           AS n_tokens
  FROM documents),
q AS (
  SELECT doc_id, n_tokens,
         greatest(least(
           0.3 * least(n / 500.0, 1.0)
           + 0.35 * (CASE WHEN n > 0 THEN alpha / n ELSE 0.0 END)
           + 0.25 * least(stop_hits / 8.0, 1.0)
           - 0.1 * (CASE WHEN n > 0 THEN least(punct / n * 5.0, 1.0) ELSE 0.0 END),
           1.0), 0.0) AS quality
  FROM h)
SELECT doc_id, round(quality, 6) AS quality, n_tokens
FROM q WHERE quality >= 0.5 AND n_tokens >= 20
"""


def q_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-corpus pipeline as ONE composed plan — the
    "switch your pipeline to this engine" flagship for the training-data
    family: quality gate (score >= 0.5, >= 20 tokens) -> exact dedup on
    normalized content (min-id survivor, duplicate count carried) ->
    deterministic content-hash train/val/test split. Every stage is the
    already-oracle-checked operator; this entry proves they COMPOSE
    bit-exactly (one oracle SQL = the three oracle CTEs chained). The
    whole pipeline is three map-side-combinable shuffles (quality gate is
    shuffle-free codegen, dedup one groupBy, survivor join key-equality,
    split pure expression) — no Python anywhere."""
    from etl_spark.operators.dedup import exact_dedup
    from etl_spark.operators.sampling import hash_split

    docs = _t(spark, sf_dir, "documents")
    gated = docs.select(
        "doc_id", "text",
        quality_score("text").alias("quality"),
        token_count("text").alias("n_tokens"),
    ).filter((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 20))
    survivors = gated.join(
        exact_dedup(gated, "text", "doc_id"), on="doc_id"
    )
    return hash_split(
        survivors, "text", {"train": 0.9, "val": 0.05, "test": 0.05}
    ).select(
        "doc_id", "split", F.round("quality", 6).alias("quality"),
        "n_tokens", "n_dups",
    )


_ORACLE_CORPUS_PIPELINE = r"""
WITH h AS (
  SELECT doc_id, text,
         CAST(length(text) AS DOUBLE) AS n,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
         CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS punct,
         CAST(len(regexp_extract_all(lower(text),
              '\b(the|and|of|to|in|is|for|that|with|a)\b')) AS DOUBLE) AS stop_hits,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|\d+|[^\sA-Za-z\d]')) AS INTEGER)
           AS n_tokens
  FROM documents),
gated AS (
  SELECT doc_id, text, n_tokens,
         greatest(least(
           0.3 * least(n / 500.0, 1.0)
           + 0.35 * (CASE WHEN n > 0 THEN alpha / n ELSE 0.0 END)
           + 0.25 * least(stop_hits / 8.0, 1.0)
           - 0.1 * (CASE WHEN n > 0 THEN least(punct / n * 5.0, 1.0) ELSE 0.0 END),
           1.0), 0.0) AS quality
  FROM h),
gq AS (SELECT * FROM gated WHERE quality >= 0.5 AND n_tokens >= 20),
d AS (
  SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
  FROM gq
  GROUP BY lower(trim(regexp_replace(text, '\s+', ' ', 'g')))),
s AS (SELECT gq.doc_id, gq.text, gq.quality, gq.n_tokens, d.n_dups
      FROM gq JOIN d USING (doc_id))
SELECT doc_id,
       CASE WHEN ('0x' || substr(md5(text), 1, 12))::BIGINT % 1000000 < 900000
              THEN 'train'
            WHEN ('0x' || substr(md5(text), 1, 12))::BIGINT % 1000000 < 950000
              THEN 'val'
            ELSE 'test' END AS split,
       round(quality, 6) AS quality, n_tokens, n_dups
FROM s
"""


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH near-dup candidates, verified with exact Jaccard.
    No SQL oracle: band bucketing depends on engine hashing; recall vs the
    exact pairs is asserted in tests/test_dedup.py."""
    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, n_hashes=64, n_bands=16, jaccard_threshold=0.5
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_minhash_lsh_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates + exact-Jaccard verify at a FULL-RECALL band
    config, checked bit-exactly against the same DuckDB oracle as the
    exact inverted-index entry. rows_per_band = 64/64 = 1 makes a pair a
    candidate when ANY of the 64 minhash values agree: P[miss a true
    pair] = (1-j)^64 <= 2^-64 at j >= 0.5 — and the signatures are
    seed-deterministic, so on this corpus the LSH-then-verify pipeline
    reproduces the exact pair set exactly. The strongest evidence class
    for the sub-quadratic path (same pattern as
    ``embedding_neardup_blocked``)."""
    docs = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(
        docs, n_hashes=64, n_bands=64, jaccard_threshold=0.5
    ).select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (rows-only check; Hamming blocking is
    engine-hash-dependent)."""
    docs = _t(spark, sf_dir, "documents")
    return simhash_neardup_pairs(docs, max_hamming=3)


def q_dedup_simhash_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash with a BIT-EXACT oracle: fingerprints are built from
    md5-hashed shingle strings (60 bits — hex-reproducible in DuckDB,
    unlike xxhash64), and the pigeonhole chunk join has FULL recall for
    Hamming <= 3 by construction (4 chunks x 15 bits cover all 60), so
    the distributed blocked join must equal DuckDB's brute-force
    bit_count(xor) over the same fingerprints — closing the one
    dedup-family member without a bit-exact config (VERDICT r3 #4)."""
    docs = _t(spark, sf_dir, "documents")
    fp = docs.select(
        "doc_id",
        simhash_from_hashes(
            md5_shingle_hashes(F.col("text"), 3), 60
        ).alias("simhash"),
    )
    pairs = simhash_pairs_from_fingerprints(
        fp, "doc_id", "simhash", bits=60, max_hamming=3
    )
    return pairs.select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


_ORACLE_SIMHASH_FULL = r"""
WITH words AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
              ELSE w[i] || ' ' || w[i+1] || ' ' || w[i+2] END AS shingle
  FROM words,
       UNNEST(CASE WHEN len(w) < 3 THEN [1]
                   ELSE range(1, len(w) - 1) END) AS t(i)),
hashes AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(shingle), 1, 15)) AS BIGINT) AS h
  FROM sh),
bit_sums AS (
  SELECT doc_id, i AS bit,
         SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS cnt
  FROM hashes, UNNEST(range(0, 60)) AS t(i)
  GROUP BY doc_id, i),
fp AS (
  SELECT doc_id,
         SUM(CASE WHEN cnt > 0 THEN (1::BIGINT << bit) ELSE 0 END)::BIGINT AS f
  FROM bit_sums GROUP BY doc_id)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.f, b.f)) AS BIGINT) AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.f, b.f)) <= 3
"""


def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (exact baseline for ANN)."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") < 5)
    out = brute_force_topk(emb, q, k=10)
    return out.select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("int").alias("rank"),
    )


_ORACLE_TOPK = """
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
           FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_cosine_similarity(q.qv, e.embedding::DOUBLE[]) AS cs
  FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
ranked AS (
  SELECT query_id, vec_id, cs,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cs DESC, vec_id) AS rank
  FROM scored)
SELECT query_id, vec_id, round(cs, 6) AS cos_sim, CAST(rank AS INTEGER) AS rank
FROM ranked WHERE rank <= 10
"""


def q_similarity_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (rows-only; recall vs brute force is
    asserted in tests/test_similarity.py)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return lsh_topk(emb, q, k=10, bits=4, n_tables=16).select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("int").alias("rank"),
    )


def q_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (rows-only; probe/re-rank plumbing covered by
    tests/test_dedup_similarity.py). The training-sample modulus is sized
    from the parquet FOOTER row count — no full-scan count action in the
    probe path."""
    from etl_spark.sources.files import parquet_row_count

    emb = _t(spark, sf_dir, "embeddings")
    n_rows = parquet_row_count(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(emb, q, k=10, n_lists=16, n_probe=4, n_rows=n_rows).select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("int").alias("rank"),
    )


def q_similarity_lsh_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH top-k at the degenerate full-recall config (bits=0 -> every
    vector shares the single bucket): the candidate set is the whole
    corpus, so the bucketed pipeline must reproduce the EXACT brute-force
    top-k — same oracle as ``similarity_topk``. Proves the bucket-join +
    re-rank machinery introduces no approximation beyond the blocking
    itself (the production config stays rows-only as ``similarity_lsh``)."""
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return lsh_topk(emb, q, k=10, bits=0, n_tables=1).select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("int").alias("rank"),
    )


def q_similarity_ivf_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k probing EVERY list (n_probe = n_lists): the candidate set
    is the whole corpus, so the list-partitioned pipeline must equal the
    exact brute-force top-k — same oracle as ``similarity_topk``. The
    production config (n_probe=4) stays rows-only as ``similarity_ivf``."""
    from etl_spark.sources.files import parquet_row_count

    emb = _t(spark, sf_dir, "embeddings")
    n_rows = parquet_row_count(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.filter(F.col("vec_id") < 5)
    return ivf_topk(
        emb, q, k=10, n_lists=16, n_probe=16, n_rows=n_rows
    ).select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("int").alias("rank"),
    )


def q_similarity_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k at a production (lossy) config —
    8 subspaces x 32 centroids = 8-byte codes per 64-dim vector, the
    10^10-vector memory path (rows-only; recall + losslessness covered
    by tests/test_dedup_similarity.py)."""
    from etl_spark.sources.files import parquet_row_count

    emb = _t(spark, sf_dir, "embeddings")
    n_rows = parquet_row_count(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.filter(F.col("vec_id") < 5)
    return pq_topk(
        emb, q, k=10, m=8, n_centroids=32, n_rows=n_rows, refine=100
    ).select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("int").alias("rank"),
    )


def q_similarity_pq_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ at the LOSSLESS config: trained on the full corpus with
    n_centroids >= corpus size, every subvector quantizes to itself, so
    the asymmetric-distance scan must equal the exact brute-force top-k
    — same oracle as ``similarity_topk`` (the family's full-recall
    evidence pattern; the lossy production config stays rows-only as
    ``similarity_pq``)."""
    from etl_spark.sources.files import parquet_row_count

    emb = _t(spark, sf_dir, "embeddings")
    n_rows = parquet_row_count(os.path.join(sf_dir, "embeddings.parquet"))
    q = emb.filter(F.col("vec_id") < 5)
    return pq_topk(
        emb, q, k=10, m=8, n_centroids=max(512, n_rows),
        sample_target=max(512, n_rows), kmeans_iters=1, n_rows=n_rows,
    ).select(
        "query_id", "vec_id", F.round("cos_sim", 6).alias("cos_sim"),
        F.col("rank").cast("int").alias("rank"),
    )


def q_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic clustering over the embeddings table (rows-only: assignments
    depend on engine-internal hash sampling; blob-separation semantics are
    covered by tests/test_dedup_similarity.py). One assignment row per
    vector — train on the hash sample, one map-side matmul pass."""
    from etl_spark.operators.similarity import cluster_embeddings
    from etl_spark.sources.files import parquet_row_count

    emb = _t(spark, sf_dir, "embeddings")
    n_rows = parquet_row_count(os.path.join(sf_dir, "embeddings.parquet"))
    return cluster_embeddings(emb, n_clusters=8, n_rows=n_rows).select(
        "vec_id", "cluster_id", F.round("sim", 6).alias("sim")
    )


def q_embedding_clusters_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster ASSIGNMENT machinery under a fixed, analytically-known
    centroid matrix (the first 8 axis unit vectors): the BLAS
    assignment pass must then reduce to argmax over the first 8
    normalized components — which DuckDB computes directly from the raw
    embeddings. Proves the mapInPandas matmul + argmax + sim plumbing
    bit-exactly; the trained-centroid config stays rows-only as
    ``embedding_clusters`` (engine-internal kmeans)."""
    import numpy as np

    from etl_spark.operators.similarity import cluster_embeddings

    emb = _t(spark, sf_dir, "embeddings")
    C = np.eye(8, 64)
    return cluster_embeddings(emb, n_clusters=8, centroids=C).select(
        "vec_id", "cluster_id", F.round("sim", 6).alias("sim")
    )


_ORACLE_CLUSTERS_FIXED = """
WITH s AS (
  SELECT vec_id,
         [x / sqrt(list_inner_product(embedding::DOUBLE[],
                                      embedding::DOUBLE[]))
          FOR x IN (embedding::DOUBLE[])[1:8]] AS u
  FROM embeddings)
SELECT vec_id,
       CAST(list_position(u, list_max(u)) - 1 AS INTEGER) AS cluster_id,
       round(list_max(u), 6) AS sim
FROM s
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup composition (cluster -> within-cluster cosine dedup ->
    keep-first survivors) under the fixed axis-unit centroid matrix, so
    DuckDB reproduces the whole pipeline: assignment = argmax over the
    first 8 normalized components, duplicates = same-cluster pairs with
    round(cosine, 6) >= 0.4 (both sides round before thresholding so
    ulp-level BLAS-vs-DuckDB divergence cannot flip a near-threshold
    pair — the repo's float-parity discipline), survivors = ids
    dominated by no smaller id. The trained-centroid production config
    is engine-internal kmeans (same split as embedding_clusters /
    embedding_clusters_fixed)."""
    import numpy as np

    from etl_spark.operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    C = np.eye(8, 64)
    return semantic_dedup(
        emb, n_clusters=8, threshold=0.4, centroids=C, sim_decimals=6
    ).select("vec_id", "cluster_id")


_ORACLE_SEMANTIC_DEDUP = """
WITH s AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         [x / sqrt(list_inner_product(embedding::DOUBLE[],
                                      embedding::DOUBLE[]))
          FOR x IN (embedding::DOUBLE[])[1:8]] AS u
  FROM embeddings),
a AS (
  SELECT vec_id, e,
         CAST(list_position(u, list_max(u)) - 1 AS INTEGER) AS cluster_id
  FROM s),
victims AS (
  SELECT DISTINCT hi.vec_id
  FROM a lo JOIN a hi
    ON lo.cluster_id = hi.cluster_id AND lo.vec_id < hi.vec_id
  WHERE round(list_cosine_similarity(lo.e, hi.e), 6) >= 0.4)
SELECT vec_id, cluster_id FROM a
WHERE vec_id NOT IN (SELECT vec_id FROM victims)
"""


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — EXACT, via the tiled-GEMM
    mapInPandas scan (one BLAS matmul per Arrow batch; the baseline path,
    bounded to ~1e6 vectors)."""
    emb = _t(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    return embedding_neardup_pairs(emb, threshold=0.4).select(
        "id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim")
    )


def q_embedding_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via the SUB-QUADRATIC path: multi-table
    hyperplane-LSH bucket join + exact scoring inside buckets — the
    10^10-vector architecture. Checked against the SAME exact oracle: at
    (bits=3, n_tables=24, seed=7) the deterministic signatures give full
    recall at threshold 0.4 on this corpus, so the outputs are equal;
    recall for other settings is asserted in tests/test_dedup_similarity.py."""
    emb = _t(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(
        emb, threshold=0.4, blocked=True, dim=64, bits=3, n_tables=24
    ).select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))


_ORACLE_EMB_NEARDUP = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[],
                                    b.embedding::DOUBLE[]), 6) AS cos_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
"""


def q_embedding_neardup_blocked_hi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 10^10-scale near-dup configuration: REALISTIC dedup threshold
    (0.95) with deep signatures (bits=16, 8 tables), where sign-LSH prunes
    exponentially — candidates ~ n^2/2^16 per table instead of n^2. Same
    exact oracle at the same threshold (this corpus has no pairs >= 0.95,
    so blocked == exact == empty; the entry exists to bench/verify the
    sub-quadratic machinery at the threshold it is built for — the
    nontrivial-result equality evidence is `embedding_neardup_blocked`)."""
    emb = _t(spark, sf_dir, "embeddings")
    return embedding_neardup_pairs(
        emb, threshold=0.95, blocked=True, dim=64, bits=16, n_tables=8
    ).select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))


_ORACLE_EMB_NEARDUP_HI = _ORACLE_EMB_NEARDUP.replace(">= 0.4", ">= 0.95")


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID + quality + token counts per document."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        lang_id("text").alias("lang_pred"),
        quality_score("text").alias("quality"),
        token_count("text").alias("n_tokens"),
        whitespace_token_count("text").alias("n_ws_tokens"),
    )


_ORACLE_TEXT_STATS = r"""
WITH h AS (
  SELECT doc_id, text,
         len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|nicht|ein|ich)\b')) AS h_de,
         len(regexp_extract_all(lower(text), '\b(the|and|is|of|to|that|you|with)\b'))    AS h_en,
         len(regexp_extract_all(lower(text), '\b(el|la|los|las|es|que|por|una)\b'))      AS h_es,
         len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|que|pas|vous)\b'))     AS h_fr,
         CAST(length(text) AS DOUBLE) AS n,
         CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) AS alpha,
         CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) AS punct,
         CAST(len(regexp_extract_all(lower(text),
              '\b(the|and|of|to|in|is|for|that|with|a)\b')) AS DOUBLE) AS stop_hits
  FROM documents)
SELECT doc_id,
       CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
            WHEN h_fr = greatest(h_de, h_en, h_es, h_fr) THEN 'fr'
            WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
            WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
            ELSE 'de' END AS lang_pred,
       round(greatest(least(
         0.3 * least(n / 500.0, 1.0)
         + 0.35 * (CASE WHEN n > 0 THEN alpha / n ELSE 0.0 END)
         + 0.25 * least(stop_hits / 8.0, 1.0)
         - 0.1 * (CASE WHEN n > 0 THEN least(punct / n * 5.0, 1.0) ELSE 0.0 END),
         1.0), 0.0), 6) AS quality,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|\d+|[^\sA-Za-z\d]')) AS INTEGER) AS n_tokens,
       CAST(len(string_split_regex(trim(text), '\s+')) AS INTEGER)
         - (CASE WHEN trim(text) = '' THEN 1 ELSE 0 END) AS n_ws_tokens
FROM h
"""


def q_profile_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact column profile of the documents corpus
    (``operators.profile.profile_exact``): per-column row/null/distinct
    counts, DECIMAL-routed numeric min/max/sum, string length sums — one
    aggregation job, rows emitted via one inline(array(structs)) pass."""
    from etl_spark.operators.profile import profile_exact

    return profile_exact(_t(spark, sf_dir, "documents"))


_ORACLE_PROFILE = """
SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT(doc_id) AS n_nulls,
       COUNT(DISTINCT doc_id) AS n_distinct,
       CAST(MIN(doc_id) AS DOUBLE) AS min_num,
       CAST(MAX(doc_id) AS DOUBLE) AS max_num,
       CAST(SUM(CAST(doc_id AS DECIMAL(38,6))) AS DOUBLE) AS sum_num,
       CAST(NULL AS BIGINT) AS sum_len
FROM documents
UNION ALL
SELECT 'text', COUNT(*), COUNT(*) - COUNT(text), COUNT(DISTINCT text),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(NULL AS DOUBLE), CAST(SUM(LENGTH(text)) AS BIGINT)
FROM documents
UNION ALL
SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang), COUNT(DISTINCT lang),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(NULL AS DOUBLE), CAST(SUM(LENGTH(lang)) AS BIGINT)
FROM documents
UNION ALL
SELECT 'source', COUNT(*), COUNT(*) - COUNT(source), COUNT(DISTINCT source),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       CAST(NULL AS DOUBLE), CAST(SUM(LENGTH(source)) AS BIGINT)
FROM documents
UNION ALL
SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
       COUNT(DISTINCT n_chars),
       CAST(MIN(n_chars) AS DOUBLE),
       CAST(MAX(n_chars) AS DOUBLE),
       CAST(SUM(CAST(n_chars AS DECIMAL(38,6))) AS DOUBLE),
       CAST(NULL AS BIGINT)
FROM documents
"""


def q_profile_docs_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch profile (``profile_approx``): HLL++ distincts +
    Greenwald-Khanna quantiles in ONE pass with no Expand — the 100-TB
    census mode. Rows-only (sketch values are engine-specific);
    tests/test_profile.py pins the error bounds against the exact
    profile."""
    from etl_spark.operators.profile import profile_approx

    return profile_approx(_t(spark, sf_dir, "documents"))


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data PII redaction: emails / IPv4s / phone-like runs / long
    numbers scrubbed with chained regexp_replace (patterns restricted to
    the Java-regex ∩ RE2 subset, so DuckDB reproduces the output
    bit-for-bit). PII shapes are synthesized deterministically from each
    row on BOTH sides — the corpus itself is clean."""
    from etl_spark.functions.text import redact_pii

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id"),
        F.lit("@example.com or +1 (555) 010-"), F.col("doc_id"),
        F.lit(" ip 10.0.0."), F.pmod(F.col("doc_id"), F.lit(256)),
        F.lit(" acct 1234567890"),
    )
    return docs.select("doc_id", redact_pii(synth).alias("redacted"))


_ORACLE_REDACT = r"""
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    text || ' contact user' || doc_id || '@example.com or +1 (555) 010-'
         || doc_id || ' ip 10.0.0.' || (doc_id % 256) || ' acct 1234567890',
    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
    '\+?\d[\d\s().-]{7,}\d', '[PHONE]', 'g'),
    '\b\d{6,}\b', '[NUM]', 'g') AS redacted
FROM documents WHERE doc_id < 100
"""


def q_ngram_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide 3-gram frequency table (contamination / boilerplate
    analysis) — explode + hash groupBy with map-side combine; threshold
    (not top-k) keeps the result deterministic for the oracle."""
    from etl_spark.functions.text import ngram_frequencies

    docs = _t(spark, sf_dir, "documents")
    return ngram_frequencies(docs, "text", n=3, min_count=5)


_ORACLE_NGRAM_FREQ = r"""
WITH words AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
  FROM documents),
sh AS (
  SELECT CASE WHEN len(w) < 3 THEN array_to_string(w, ' ')
              ELSE w[i] || ' ' || w[i+1] || ' ' || w[i+2] END AS ngram
  FROM words,
       UNNEST(CASE WHEN len(w) < 3 THEN [1]
                   ELSE range(1, len(w) - 1) END) AS t(i))
SELECT ngram, COUNT(*) AS n_occurrences
FROM sh GROUP BY ngram HAVING COUNT(*) >= 5
"""


def q_lm_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM document quality: mean token log-prob under the corpus's
    own add-1-smoothed unigram distribution (functions.text.
    unigram_lm_score) — the cheap perplexity-style ranking signal of a
    training-data pipeline. Per-token log-probs go through DECIMAL(24,12)
    so the parallel weighted sum is bit-equal to the sequential oracle."""
    from etl_spark.functions.text import unigram_lm_score

    docs = _t(spark, sf_dir, "documents")
    return unigram_lm_score(docs, "text", "doc_id")


_ORACLE_LM_SCORE = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ')) AS tok
  FROM documents),
tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM toks WHERE tok <> '' GROUP BY doc_id, tok),
vocab AS (
  SELECT tok, CAST(SUM(c) AS BIGINT) AS n_t FROM tf GROUP BY tok),
tot AS (
  SELECT CAST(SUM(n_t) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v
  FROM vocab)
SELECT tf.doc_id,
       CAST(SUM(tf.c) AS BIGINT) AS n_tokens,
       CAST(SUM(CAST(tf.c AS DECIMAL(12,0))
                * CAST(ln((vocab.n_t + 1) / (tot.n + tot.v))
                       AS DECIMAL(24,12))) AS DOUBLE)
         / CAST(SUM(tf.c) AS BIGINT) AS avg_logprob
FROM tf JOIN vocab USING (tok) CROSS JOIN tot
GROUP BY tf.doc_id
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination: corpus docs sharing >= 3 distinct word 5-grams with
    any 'benchmark' doc (every 20th doc plays the eval suite). The
    benchmark shingle set is broadcast; the corpus streams map-side."""
    from etl_spark.operators.dedup import cross_corpus_overlap

    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.pmod(F.col("doc_id"), F.lit(20)) == 0)
    corpus = docs.filter(F.pmod(F.col("doc_id"), F.lit(20)) != 0)
    return cross_corpus_overlap(corpus, bench, shingle_words=5, min_shared=3)


_ORACLE_DECONTAMINATE = r"""
WITH words AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
  FROM documents),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(w) < 5 THEN array_to_string(w, ' ')
              ELSE w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3]
                   || ' ' || w[i+4] END AS shingle
  FROM words,
       UNNEST(CASE WHEN len(w) < 5 THEN [1]
                   ELSE range(1, len(w) - 3) END) AS t(i)),
b AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % 20 = 0),
c AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 20 <> 0)
SELECT c.doc_id, COUNT(DISTINCT c.shingle) AS shared_shingles
FROM c JOIN b USING (shingle)
GROUP BY c.doc_id HAVING COUNT(DISTINCT c.shingle) >= 3
"""


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split keyed on content hash — stable
    across runs and corpus growth (no leakage on re-ingest). Pure codegen
    expression, zero shuffle."""
    from etl_spark.operators.sampling import hash_split

    docs = _t(spark, sf_dir, "documents")
    return hash_split(
        docs, "text", {"train": 0.9, "val": 0.05, "test": 0.05}
    ).select("doc_id", "split")


_ORACLE_HASH_SPLIT = r"""
SELECT doc_id,
       CASE WHEN ('0x' || substr(md5(text), 1, 12))::BIGINT % 1000000 < 900000
              THEN 'train'
            WHEN ('0x' || substr(md5(text), 1, 12))::BIGINT % 1000000 < 950000
              THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def q_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) quota sampling: at most k docs per stratum,
    chosen as the k smallest content hashes. Runs the TWO-PHASE
    bucket-cutoff path (the skew-proof scale variant) against an oracle
    expressed as the plain global rank — proving the paths equal."""
    from etl_spark.operators.sampling import quota_sample

    docs = _t(spark, sf_dir, "documents")
    return quota_sample(
        docs, ["lang", "source"], k=5, hash_on="text", n_prefilter_buckets=256
    ).select("doc_id", "lang", "source")


_ORACLE_QUOTA_SAMPLE = r"""
SELECT doc_id, lang, source
FROM (
  SELECT doc_id, lang, source,
         ROW_NUMBER() OVER (
           PARTITION BY lang, source
           ORDER BY ('0x' || substr(md5(text), 1, 12))::BIGINT, text
         ) AS rn
  FROM documents)
WHERE rn <= 5
"""


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: hash-sharded, budget-chunked
    (doc_id, shard, pack_id, n_tokens) assignment — the pre-tokenization
    packing pass before writing training shards. Window running-sum per
    shard; deterministic for any input partitioning."""
    from etl_spark.functions.text import token_count
    from etl_spark.operators.sampling import pack_sequences

    docs = _t(spark, sf_dir, "documents")
    return pack_sequences(
        docs, "doc_id", token_count("text"), budget=2000, n_shards=8
    ).select("doc_id", "shard", "pack_id", F.col("n_tokens").cast("int").alias("n_tokens"))


_ORACLE_SEQUENCE_PACKING = r"""
WITH t AS (
  SELECT doc_id,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT % 8 AS shard,
         CAST(len(regexp_extract_all(text, '[A-Za-z]+|\d+|[^\sA-Za-z\d]')) AS INTEGER)
           AS n_tokens
  FROM documents)
SELECT doc_id, shard,
       CAST(floor((CAST(SUM(n_tokens) OVER w AS BIGINT) - n_tokens) / 2000.0)
            AS BIGINT) AS pack_id,
       n_tokens
FROM t
WINDOW w AS (PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-weighted corpus mixture: 397 docs apportioned over langs
    (en .5 / zh .2 / es .15 / de .1 / fr .05 → largest-remainder quotas
    198/79/60/40/20), each domain's rows its smallest content hashes.
    Runs the skew-proof two-phase path; zh holds only ~75 docs at this
    sf, so the quota shortfall (no redistribution, by contract) is
    exercised too. Oracle = plain per-domain rank with the same CASE
    quotas."""
    from etl_spark.operators.sampling import apportion, mixture_sample

    weights = {"en": 0.5, "zh": 0.2, "es": 0.15, "de": 0.1, "fr": 0.05}
    assert apportion(weights, 397) == {
        "en": 198, "zh": 79, "es": 60, "de": 40, "fr": 20,
    }  # the oracle SQL inlines these constants
    docs = _t(spark, sf_dir, "documents")
    return mixture_sample(
        docs, "lang", weights, total=397, hash_on="text",
        n_prefilter_buckets=64,
    ).select("doc_id", "lang")


_ORACLE_MIXTURE_SAMPLE = r"""
SELECT doc_id, lang
FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5(text), 1, 12))::BIGINT, text
         ) AS rn
  FROM documents
  WHERE lang IN ('en', 'zh', 'es', 'de', 'fr'))
WHERE rn <= CASE lang WHEN 'en' THEN 198 WHEN 'zh' THEN 79
                      WHEN 'es' THEN 60 WHEN 'de' THEN 40
                      WHEN 'fr' THEN 20 ELSE 0 END
"""


def q_truncate_to_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window truncation: per user, keep the longest SUFFIX of
    events (most recent first) whose summed token estimate fits a
    40-token budget — the prompt-assembly trim before packing turns into
    a model context. One reverse running-sum window, pure codegen."""
    from etl_spark.functions.text import token_count
    from etl_spark.operators.reshape import truncate_to_budget

    ev = _t(spark, sf_dir, "events")
    return truncate_to_budget(
        ev, ["user_id"], ["ts", "event_id"], token_count("props"), budget=40
    ).select("event_id", "user_id", "event_type")


_ORACLE_TRUNCATE = r"""
SELECT event_id, user_id, event_type
FROM (
  SELECT event_id, user_id, event_type,
         SUM(CAST(len(regexp_extract_all(props, '[A-Za-z]+|\d+|[^\sA-Za-z\d]'))
                  AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS rc
  FROM events)
WHERE rc <= 40
"""


def q_turn_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Turn-index integrity audit over a deterministically-corrupted
    transcript stand-in: lineitem keyed (l_orderkey, l_linenumber) with
    line 2 dropped from every 5th order (gaps) and line 1 duplicated in
    every 7th (dup indexes). The report flags exactly the damaged
    conversations — the post-replay convergence check a CDC transcript
    table runs before training data ships."""
    from etl_spark.operators.profile import turn_integrity

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    corrupted = li.filter(
        ~((F.col("l_orderkey") % 5 == 0) & (F.col("l_linenumber") == 2))
    ).unionAll(
        li.filter((F.col("l_orderkey") % 7 == 0) & (F.col("l_linenumber") == 1))
    )
    return turn_integrity(corrupted, ["l_orderkey"], "l_linenumber").filter(
        ~F.col("contiguous")
    )


_ORACLE_TURN_INTEGRITY = r"""
WITH corrupted AS (
  SELECT l_orderkey, l_linenumber FROM lineitem
  WHERE NOT (l_orderkey % 5 = 0 AND l_linenumber = 2)
  UNION ALL
  SELECT l_orderkey, l_linenumber FROM lineitem
  WHERE l_orderkey % 7 = 0 AND l_linenumber = 1),
rep AS (
  SELECT l_orderkey,
         COUNT(*) AS n_turns,
         COUNT(DISTINCT l_linenumber) AS n_distinct_idx,
         MIN(l_linenumber) AS min_idx,
         MAX(l_linenumber) AS max_idx,
         COUNT(*) - COUNT(DISTINCT l_linenumber) AS n_dup_idx,
         (MAX(l_linenumber) - MIN(l_linenumber) + 1)
           <> COUNT(DISTINCT l_linenumber) AS has_gaps,
         COUNT(*) = COUNT(DISTINCT l_linenumber)
           AND (MAX(l_linenumber) - MIN(l_linenumber) + 1)
             = COUNT(DISTINCT l_linenumber) AS contiguous
  FROM corrupted GROUP BY l_orderkey)
SELECT * FROM rep WHERE NOT contiguous
"""


def q_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 TF-IDF keywords per document at the integer-exact rational
    weighting (the bit-portable config; the transcendental log form is
    pytest-covered — libm vs JVM log differ in the last ulp). min_df=2
    drops hapax noise; ties break on token, so ranks are total."""
    from etl_spark.functions.text import tfidf_keywords

    docs = _t(spark, sf_dir, "documents")
    return tfidf_keywords(docs, k=5, min_df=2, idf="rational")


_ORACLE_TFIDF = r"""
WITH toks AS (
  SELECT doc_id, u.t AS token
  FROM documents, unnest(string_split_regex(lower(text), '[^a-z0-9]+')) AS u(t)
  WHERE u.t <> ''),
tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
         (tf.tf * 1000000) // (dfreq.df + 1) AS score
  FROM tf JOIN dfreq USING (token)
  WHERE dfreq.df >= 2)
SELECT doc_id, token, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       CAST(score AS BIGINT) AS score, rnk
FROM (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY doc_id ORDER BY score DESC, token) AS rnk
  FROM scored)
WHERE rnk <= 5
"""


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: the 64-bit content fingerprint must be a
    bijection onto distinct normalized texts (no collisions at this
    scale), which IS oracle-checkable even though DuckDB cannot reproduce
    xxhash64 values: distinct-fingerprint count == distinct-normalized-
    text count, plus total docs."""
    from etl_spark.functions.text import fingerprint

    docs = _t(spark, sf_dir, "documents")
    return docs.agg(
        F.countDistinct(fingerprint("text")).alias("n_distinct"),
        F.count("*").alias("n_docs"),
    )


_ORACLE_FINGERPRINT = r"""
SELECT CAST(COUNT(DISTINCT lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))
            AS BIGINT) AS n_distinct,
       COUNT(*) AS n_docs
FROM documents
"""


def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest-time dedup: the documents table arrives as two
    batches; the persisted MinHash band index detects near-dups across
    AND within batches without re-running global dedup (rows-only: band
    keys are engine-hash; cross-batch semantics pytest-verified)."""
    from etl_spark.operators.incremental_dedup import MinHashIndex

    docs = _t(spark, sf_dir, "documents")
    half = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    idx = MinHashIndex(spark, os.path.join(tempfile.mkdtemp("etl_idx_q_"), "idx"))
    first = idx.ingest(docs.filter(F.col("doc_id") <= half))
    second = idx.ingest(docs.filter(F.col("doc_id") > half))
    out = first.unionByName(second)
    out = out.persist()
    out.count()
    return out


def q_incremental_dedup_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest path at a FULL-RECALL band config, bit-exact vs
    the exact-Jaccard DuckDB oracle (same evidence pattern as
    ``dedup_minhash_lsh_verified``): n_bands=64/rows_per_band=1 makes a
    pair a candidate when ANY of the 64 seed-deterministic minhash values
    agree (P[miss] <= (1-j)^64 at j >= 0.5), and every pair is either
    within one ingest batch or across them — so the union of both
    batches' candidates, exact-verified against the corpus text, must
    reproduce the one-shot exact pair set EXACTLY. Proves the persisted
    index + broadcast probe loses nothing across batch boundaries."""
    from etl_spark.operators.dedup import with_shingle_hashes
    from etl_spark.operators.incremental_dedup import MinHashIndex

    docs = _t(spark, sf_dir, "documents")
    half = docs.agg(F.expr("percentile(doc_id, 0.5)")).first()[0]
    idx = MinHashIndex(
        spark, os.path.join(tempfile.mkdtemp("etl_idx_v_"), "idx"),
        n_hashes=64, n_bands=64,
    )
    first = idx.ingest(docs.filter(F.col("doc_id") <= half))
    second = idx.ingest(docs.filter(F.col("doc_id") > half))
    cand = (
        first.unionByName(second)
        .select(
            F.least("new_id", "match_id").alias("id_a"),
            F.greatest("new_id", "match_id").alias("id_b"),
        )
        .distinct()
    )
    # exact verify on candidates only — identical expression family to
    # ngram_jaccard_pairs (distinct hashed 3-shingles, intersect/union)
    sets_ = with_shingle_hashes(docs, "text", 3, "__sh").select(
        F.col("doc_id").cast("long").alias("_id"), "__sh"
    )
    out = (
        cand.join(sets_.select(F.col("_id").alias("id_a"),
                               F.col("__sh").alias("_sa")), on="id_a")
        .join(sets_.select(F.col("_id").alias("id_b"),
                           F.col("__sh").alias("_sb")), on="id_b")
        .withColumn("_i", F.size(F.array_intersect("_sa", "_sb")))
        .withColumn(
            "jaccard",
            F.col("_i") / (F.size("_sa") + F.size("_sb") - F.col("_i")),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    out = out.persist()
    out.count()
    first.unpersist()
    second.unpersist()
    return out


def q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style winnowing overlap pairs (rows-only: fingerprints are
    engine-xxhash64 window minima DuckDB cannot reproduce; the winnowing
    guarantee — any shared >= k+window-1-word substring shares a
    fingerprint — is asserted in tests/test_dedup_similarity.py)."""
    from etl_spark.functions.text import winnow_overlap_pairs

    docs = _t(spark, sf_dir, "documents")
    return winnow_overlap_pairs(docs, k=5, window=4, min_shared=2)


def q_winnow_overlap_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing overlap at the degenerate full-density config (window=1
    -> EVERY k-gram's window minimum is itself, so the fingerprint set is
    exactly the distinct k-gram set): shared-fingerprint counts must then
    equal shared-distinct-5-gram counts, which DuckDB can compute from the
    raw text — the bit-exact check for the k-gram staging + inverted-index
    overlap join (the sampled window=4 config stays rows-only as
    ``winnow_overlap``)."""
    from etl_spark.functions.text import winnow_overlap_pairs

    docs = _t(spark, sf_dir, "documents")
    return winnow_overlap_pairs(docs, k=5, window=1, min_shared=2)


_ORACLE_WINNOW_FULL = r"""
WITH words AS (
  SELECT doc_id,
         string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' ') AS w
  FROM documents),
kg AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(w) < 5 THEN array_to_string(w, ' ')
              ELSE w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
                   w[i+3] || ' ' || w[i+4] END AS g
  FROM words,
       UNNEST(CASE WHEN len(w) < 5 THEN [1]
                   ELSE range(1, len(w) - 3) END) AS t(i))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       COUNT(*) AS shared_fingerprints
FROM kg a JOIN kg b USING (g)
WHERE a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal binary-column plumbing: synthesize media, decode headers
    via Arrow-batched mapInPandas, metadata rollup. Rows-only check (the
    media table is engine-synthesized; decode parity asserted in
    tests/test_multimodal.py)."""
    media = synthesize_media_df(spark, n=96)
    return media_stats(decode_media_meta(media))


def q_multimodal_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal with a BIT-EXACT oracle: each document's UTF-8 bytes
    are encoded through the REAL stdlib codecs — a (1 x n_bytes+1)
    grayscale PNG (operators.png; +1 sentinel so empty text stays a
    valid raster) and a 1 kHz PCM WAV of ceil(n_bytes/2) int16 samples
    (operators.wav; at 1 kHz, duration_ms == n_samples exactly, no
    rounding ambiguity) — and (r5) a structurally-valid JPEG header
    stream whose SOF0 records a (n_bytes+1) x 1 frame with the text
    bytes riding in a COM segment BEFORE the SOF, so the stdlib marker
    walk (operators.jpeg) must skip a variable-length segment to find
    the dimensions — then decoded back through the production
    ``decode_media_meta`` mapInPandas stage. The decoded dimensions /
    duration are pure functions of octet_length(text), which DuckDB
    computes directly: the whole encode->decode plumbing must round-trip
    bit-exactly for the numbers to match."""
    import numpy as np

    from etl_spark.operators.jpeg import jpeg_header_fixture
    from etl_spark.operators.multimodal import decode_media_meta
    from etl_spark.operators.png import encode_png
    from etl_spark.operators.wav import encode_wav

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out_schema = T.StructType(
        [
            T.StructField("doc_id", docs.schema["doc_id"].dataType),
            T.StructField("kind", T.StringType()),
            T.StructField("data", T.BinaryType()),
        ]
    )

    def build(batches):
        import pandas as pd

        for b in batches:
            ids, kinds, blobs = [], [], []
            for did, t in zip(b["doc_id"], b["text"]):
                data = (t or "").encode("utf-8")
                img = np.frombuffer(
                    data + b"\x00", dtype=np.uint8
                ).reshape(1, -1)
                ids.append(did); kinds.append("image")
                blobs.append(encode_png(img))
                pcm = data + (b"\x00" if len(data) % 2 else b"")
                samples = np.frombuffer(pcm, dtype="<i2")
                ids.append(did); kinds.append("audio")
                blobs.append(encode_wav(samples, 1000))
                ids.append(did); kinds.append("jpeg")
                blobs.append(
                    jpeg_header_fixture(len(data) + 1, 1, comment=data)
                )
            yield pd.DataFrame({"doc_id": ids, "kind": kinds, "data": blobs})

    media = docs.mapInPandas(build, out_schema)
    dec = decode_media_meta(media)
    return dec.groupBy("doc_id").agg(
        F.max(
            F.when(F.col("kind") == "image", F.col("decoded_width"))
        ).cast("int").alias("png_width"),
        F.max(
            F.when(F.col("kind") == "image", F.col("decoded_height"))
        ).cast("int").alias("png_height"),
        F.max(
            F.when(F.col("kind") == "audio", F.col("decoded_duration_ms"))
        ).cast("int").alias("wav_duration_ms"),
        F.max(
            F.when(F.col("kind") == "jpeg", F.col("decoded_width"))
        ).cast("int").alias("jpeg_width"),
        F.max(
            F.when(F.col("kind") == "jpeg", F.col("decoded_height"))
        ).cast("int").alias("jpeg_height"),
    )


_ORACLE_MULTIMODAL_ROUNDTRIP = """
SELECT doc_id,
       CAST(strlen(text) + 1 AS INTEGER) AS png_width,
       1 AS png_height,
       CAST(CEIL(strlen(text) / 2.0) AS INTEGER) AS wav_duration_ms,
       CAST(strlen(text) + 1 AS INTEGER) AS jpeg_width,
       1 AS jpeg_height
FROM documents
"""


def q_stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful STREAMING sessionization (applyInPandasWithState,
    event-time timeout) over the events table, flushed with a far-future
    sentinel so every session closes — the final output then equals the
    batch sessionization aggregate, which IS the DuckDB oracle. Exercises
    state store, watermark advance, and the timeout path end-to-end."""
    import shutil

    from pyspark.sql.functions import max as fmax

    from etl_spark.streaming.sessions import stream_sessionize

    events = _t(spark, sf_dir, "events").select("user_id", "ts")
    tmp = tempfile.mkdtemp(prefix="etl_spark_sess_q_")
    src = os.path.join(tmp, "src")
    # batch 1: every real event in one file; batch 2: the sentinel.
    # FileStreamSource orders by modification time — pin the first file
    # well into the past so a sub-second mtime tie can never process the
    # sentinel first (which would advance the watermark and drop every
    # real event as late).
    events.coalesce(1).write.parquet(src)
    for root, _d, names in os.walk(src):
        for n in names:
            os.utime(os.path.join(root, n), (1_000_000, 1_000_000))
    max_ts = events.agg(fmax("ts")).first()[0]
    sent = spark.createDataFrame(
        [(int(-1), max_ts + __import__("datetime").timedelta(days=30))],
        "user_id long, ts timestamp",
    )
    sent.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_dir = os.path.join(tmp, "out")
    q = (
        stream_sessionize(stream, gap_sec=1800)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = (
        spark.read.parquet(out_dir)
        .filter(F.col("user_id") >= 0)  # drop the sentinel's own session
        .select("user_id", "session_start", "session_end", "n_events")
    )
    out = out.cache()
    out.count()  # materialize before tmp cleanup
    shutil.rmtree(os.path.join(tmp, "ckpt"), ignore_errors=True)
    return out


def q_stream_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATERMARKED tumbling-window streaming aggregation — the classic
    Structured Streaming late-data shape (withWatermark + window + agg,
    append mode): hourly (window, event_type) counts and DECIMAL-routed
    value sums over the events stream, flushed with a far-future
    sentinel so the final no-data micro-batch emits every real window
    (append mode only releases a window once the watermark passes its
    end). The emitted set must equal the one-shot GROUP BY
    date_trunc('hour') aggregate — bit-exact, since the source files are
    event-time-ordered so nothing is ever late-dropped. Exercises
    watermark advance across micro-batches, windowed state store, and
    append-mode emission end-to-end."""
    import datetime
    import shutil

    events = _t(spark, sf_dir, "events").select("event_type", "ts", "value")
    tmp = tempfile.mkdtemp(prefix="etl_spark_winagg_q_")
    src = os.path.join(tmp, "src")
    # batch 1: every real event; batch 2: the sentinel. Pin the real
    # file's mtime into the past so the sentinel can never process first
    # (which would advance the watermark and late-drop everything).
    events.coalesce(1).write.parquet(src)
    for root, _d, names in os.walk(src):
        for n in names:
            os.utime(os.path.join(root, n), (1_000_000, 1_000_000))
    max_ts = events.agg(F.max("ts")).first()[0]
    sent = spark.createDataFrame(
        [("__sentinel__", max_ts + datetime.timedelta(days=30), 0.0)],
        "event_type string, ts timestamp, value double",
    )
    sent.coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema("event_type string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
        )
    )
    out_dir = os.path.join(tmp, "out")
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .outputMode("append")
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = (
        spark.read.parquet(out_dir)
        .filter(F.col("event_type") != "__sentinel__")
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            # DECIMAL-routed sum (order-independent), double on the wire
            F.col("sum_value").cast("double").alias("sum_value"),
        )
    )
    out = out.cache()
    out.count()  # materialize before tmp cleanup
    shutil.rmtree(tmp, ignore_errors=True)
    return out


_ORACLE_STREAM_WINDOW_AGG = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


_ORACLE_STREAM_SESSIONIZE = """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - epoch(lag(ts) OVER w) IS NULL
                OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM g)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
"""


# --------------------------------------------------------------------------
# Temporal joins / history (as-of, interval, SCD2)
# --------------------------------------------------------------------------

def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward, inclusive): every purchase gets the user's
    most recent view at-or-before the purchase timestamp — DuckDB
    ``ASOF LEFT JOIN`` semantics via the single-shuffle union+window
    shape (operators/temporal.py)."""
    from etl_spark.operators.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("vts"),
        F.col("event_id").alias("view_event_id"),
        F.col("value").alias("view_value"),
    )
    return asof_join(
        p, v, keys=["user_id"], left_time="ts", right_time="vts",
        right_cols=["view_event_id", "view_value"],
    ).select("user_id", "event_id", "value", "view_event_id", "view_value")


_ORACLE_ASOF = """
SELECT p.user_id, p.event_id, p.value,
       v.event_id AS view_event_id, v.value AS view_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.ts >= v.ts
"""


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval (range containment) join without a cartesian product:
    clicks landing inside any [error_ts, error_ts + 1h] window of the
    same user, via the shared time-grid bucketing in
    operators/temporal.py (equi-join on (user, bin) + exact filter)."""
    from etl_spark.operators.temporal import interval_join

    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    errs = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 3600 SECONDS")).alias("w_end"),
        F.col("event_id").alias("error_event_id"),
    )
    return interval_join(
        clicks, errs, "ts", "w_start", "w_end",
        keys=["user_id"], bin_seconds=3600,
    ).select("user_id", "event_id", "error_event_id")


_ORACLE_INTERVAL = """
SELECT c.user_id, c.event_id, e.event_id AS error_event_id
FROM (SELECT * FROM events WHERE event_type = 'click') c
JOIN (SELECT user_id, ts, ts + INTERVAL 3600 SECONDS AS w_end, event_id
      FROM events WHERE event_type = 'error') e
  ON c.user_id = e.user_id AND c.ts >= e.ts AND c.ts <= e.w_end
"""


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history: the per-user event_type changelog becomes versioned
    validity rows (valid_from/valid_to/is_current/version), consecutive
    repeats collapsed — the history-preserving complement of LWW apply."""
    from etl_spark.operators.temporal import scd2_history

    ev = _t(spark, sf_dir, "events")
    return scd2_history(
        ev.select("user_id", "ts", "event_id", "event_type"),
        keys=["user_id"], time_col="ts",
        payload_cols=["event_type"], tiebreak=["event_id"],
    )


_ORACLE_SCD2 = """
WITH chg AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER w AS prev
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), f AS (SELECT * FROM chg WHERE prev IS NULL OR prev <> event_type)
SELECT user_id, event_type, ts AS valid_from,
       lead(ts) OVER w2 AS valid_to,
       lead(ts) OVER w2 IS NULL AS is_current,
       CAST(row_number() OVER w2 AS BIGINT) AS version
FROM f WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q_scd2_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL SCD2: the events changelog applied in four
    chronological batches through ``cdc.scd2.apply_scd2`` (bucket-pruned
    current-row reads, version continuation, late-data guard) must
    converge to EXACTLY the history the one-shot window computes — same
    oracle as the batch ``scd2`` query. This is the strongest evidence
    class for the apply loop: a multi-commit lake-table lifecycle checked
    bit-exact against one SQL statement over the raw log."""
    import shutil

    from etl_spark.cdc.scd2 import apply_scd2, create_scd2_table

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    tmp = tempfile.mkdtemp(prefix="scd2_inc_")
    try:
        table = create_scd2_table(
            spark, os.path.join(tmp, "t"), ev.schema, ["user_id"], "ts",
            payload_cols=["event_type"], n_buckets=8,
        )
        # event_id order IS event-time order in this table (verified
        # strictly monotone), so id-range batches are chronological
        hi = ev.agg(F.max("event_id")).collect()[0][0]
        step = (hi + 4) // 4
        for b in range(4):
            batch = ev.filter(
                (F.col("event_id") >= b * step)
                & (F.col("event_id") < (b + 1) * step)
            )
            apply_scd2(table, batch, "ts", tiebreak=["event_id"])
        out = table.read().select(
            "user_id", "event_type", "valid_from", "valid_to",
            "is_current", "version",
        )
        out = out.cache()
        out.count()  # materialize before the temp table dir goes away
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _events_with_op(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events changelog with a deterministic CDC verb: 'error'
    events are deletes, everything else upserts (~20% deletes at every
    SF, so most users cycle through delete -> reopen)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U")).alias("op"),
    )


def q_scd2_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 with the full CDC alphabet: delete events CLOSE the open
    version (valid_to = delete time) without minting one; a later event
    reopens the key at the next version; consecutive deletes collapse.
    Same single-shuffle window shape as ``scd2`` plus a cumulative
    non-delete count for the version."""
    from etl_spark.operators.temporal import scd2_history

    return scd2_history(
        _events_with_op(spark, sf_dir),
        keys=["user_id"], time_col="ts",
        payload_cols=["event_type"], tiebreak=["event_id"], op_col="op",
    )


_ORACLE_SCD2_DELETES = """
WITH t AS (
  SELECT user_id, ts, event_id, event_type,
         (event_type = 'error') AS del
  FROM events
), chg AS (
  SELECT *, lag(del) OVER w AS pdel, lag(event_type) OVER w AS pet
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), f AS (
  SELECT * FROM chg
  WHERE pdel IS NULL
     OR NOT (pdel IS NOT DISTINCT FROM del
             AND pet IS NOT DISTINCT FROM event_type)
)
SELECT user_id, event_type, valid_from, valid_to,
       valid_to IS NULL AS is_current, version
FROM (
  SELECT user_id, event_type, del, ts AS valid_from,
         lead(ts) OVER w2 AS valid_to,
         CAST(sum(CASE WHEN del THEN 0 ELSE 1 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
  FROM f WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
) WHERE NOT del
"""


def q_scd2_incremental_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL SCD2 with deletes: the op-tagged changelog applied in
    four chronological batches through ``apply_scd2(op_col=...)`` —
    delete-closed anchors must survive commits and reopen at the right
    version — converging bit-exact to the one-shot window's history
    (same oracle as ``scd2_deletes``)."""
    import shutil

    from etl_spark.cdc.scd2 import apply_scd2, create_scd2_table

    ev = _events_with_op(spark, sf_dir)
    tmp = tempfile.mkdtemp(prefix="scd2_del_")
    try:
        table = create_scd2_table(
            spark, os.path.join(tmp, "t"), ev.schema, ["user_id"], "ts",
            payload_cols=["event_type"], n_buckets=8,
        )
        hi = ev.agg(F.max("event_id")).collect()[0][0]
        step = (hi + 4) // 4
        for b in range(4):
            batch = ev.filter(
                (F.col("event_id") >= b * step)
                & (F.col("event_id") < (b + 1) * step)
            )
            apply_scd2(table, batch, "ts", tiebreak=["event_id"],
                       op_col="op")
        out = table.read().select(
            "user_id", "event_type", "valid_from", "valid_to",
            "is_current", "version",
        )
        out = out.cache()
        out.count()  # materialize before the temp table dir goes away
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_enrich_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal dimension lookup (operators/temporal.py enrich_history):
    every purchase enriched with the user's SCD2 ``event_type`` version
    valid AT purchase time — half-open containment against the
    delete-closing history of ``scd2_deletes``, so purchases inside a
    delete-closed coverage gap enrich to NULL. One asof_join shuffle +
    an expression pass; never an interval explosion or history
    broadcast."""
    from etl_spark.operators.temporal import enrich_history, scd2_history

    hist = scd2_history(
        _events_with_op(spark, sf_dir),
        keys=["user_id"], time_col="ts",
        payload_cols=["event_type"], tiebreak=["event_id"], op_col="op",
    )
    ev = _t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    return enrich_history(
        p, hist, keys=["user_id"], fact_time="ts",
        payload_cols=["event_type"],
    ).select(
        "user_id", "event_id", "value",
        F.col("event_type").alias("dim_event_type"),
    )


_ORACLE_ENRICH_HISTORY = """
WITH t AS (
  SELECT user_id, ts, event_id, event_type,
         (event_type = 'error') AS del
  FROM events
), chg AS (
  SELECT *, lag(del) OVER w AS pdel, lag(event_type) OVER w AS pet
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), f AS (
  SELECT * FROM chg
  WHERE pdel IS NULL
     OR NOT (pdel IS NOT DISTINCT FROM del
             AND pet IS NOT DISTINCT FROM event_type)
), hist AS (
  SELECT user_id, event_type, valid_from, valid_to
  FROM (
    SELECT user_id, event_type, del, ts AS valid_from,
           lead(ts) OVER w2 AS valid_to
    FROM f WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
  ) WHERE NOT del
), p AS (
  SELECT user_id, ts, event_id, value FROM events
  WHERE event_type = 'purchase'
)
SELECT p.user_id, p.event_id, p.value,
       h.event_type AS dim_event_type
FROM p LEFT JOIN hist h
  ON p.user_id = h.user_id
 AND p.ts >= h.valid_from
 AND (h.valid_to IS NULL OR p.ts < h.valid_to)
"""


def q_streaming_cdc_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full streaming engine path: deterministic transcript changelog ->
    WAL segments -> Structured Streaming tail -> exactly-once MERGE ->
    converged table. Rows-only here; pandas-oracle equality is asserted in
    tests/test_streaming.py."""
    import shutil

    from etl_spark.cdc.changelog import (
        ChangelogSpec,
        TRANSCRIPTS_SCHEMA,
        generate_changelog,
        write_changelog,
    )
    from etl_spark.functions.text import normalize_transcripts_expr
    from etl_spark.streaming.stream import run_stream

    tmp = tempfile.mkdtemp(prefix="etl_spark_stream_q_")
    spec = ChangelogSpec(n_conversations=50, seed=7)
    wal = os.path.join(tmp, "wal")
    write_changelog(generate_changelog(spec), wal, spec)
    table = LakeTable.create(
        spark,
        os.path.join(tmp, "table"),
        TRANSCRIPTS_SCHEMA,
        key=["conv_id", "turn_idx"],
        n_buckets=8,
    )
    run_stream(
        spark,
        wal,
        table,
        os.path.join(tmp, "state"),
        transform=normalize_transcripts_expr,
    )
    out = table.read().select("conv_id", "turn_idx", "role", "text", "tool")
    out = out.cache()
    out.count()  # materialize before the temp WAL/state dirs go away
    shutil.rmtree(os.path.join(tmp, "state"), ignore_errors=True)
    return out


def q_streaming_cdc_replay_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full streaming engine path made ORACLE-CHECKABLE: the change
    stream is derived from the shared ``events`` table by pure
    expressions (op/key/payload all deterministic functions of
    event_id/user_id), written as a per-partition LSN-ordered parquet
    WAL, tailed by the real ``CdcStream`` (micro-batches, exactly-once
    commit log, LWW dedup, bucket-pruned MERGE), and the CONVERGED table
    is compared bit-exactly against a DuckDB window over ``events``
    computing last-writer-wins per (conv_id, turn_idx) with trailing
    deletes absent. `ts` is strictly increasing with event_id in the
    testdata (verified at every SF) and a key's events all land in one
    source partition (user_id % 4), so per-key order equals per-partition
    LSN order and the plain time-ordered merge is exact — the same
    contract the synthetic-changelog replay exercises rows-only with
    adversarial ts collisions."""
    import shutil

    from etl_spark.cdc.changelog import TRANSCRIPTS_SCHEMA
    from etl_spark.streaming.stream import run_stream

    ev = _t(spark, sf_dir, "events")
    ch = ev.select(
        F.when(F.col("event_id") % 11 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
        F.col("event_id").alias("lsn"),
        (F.col("user_id") % 4).cast("int").alias("source_partition"),
        "ts",
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("conv_id"),
        (F.col("event_id") % 7).cast("int").alias("turn_idx"),
        F.col("event_type").alias("role"),
        F.col("props").alias("text"),
        F.when(F.col("event_id") % 3 == 0, F.lit("search")).alias("tool"),
    ).toPandas()  # bounded: the WAL is written driver-side like a real
    #               binlog tap; the REPLAY below is fully distributed

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    tmp = tempfile.mkdtemp(prefix="etl_spark_stream_ev_q_")
    wal = os.path.join(tmp, "wal")
    arrow_schema = pa.schema(
        [
            ("op", pa.string()),
            ("lsn", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
        ]
    )
    cols = [f.name for f in arrow_schema]
    for p, part in ch.groupby("source_partition", sort=True):
        pdir = os.path.join(wal, f"source_partition={int(p)}")
        os.makedirs(pdir, exist_ok=True)
        part = part.sort_values("lsn")
        for i, idx in enumerate(np.array_split(np.arange(len(part)), 4)):
            if idx.size == 0:
                continue
            path = os.path.join(pdir, f"seg-{i:05d}.parquet")
            pq.write_table(
                pa.Table.from_pandas(
                    part.iloc[idx][cols], preserve_index=False
                ).cast(arrow_schema),
                path,
            )
            # FileStreamSource orders by mtime: segment index IS batch
            # order (per-partition LSN order — the WAL contract)
            os.utime(path, (1_000_000 + i, 1_000_000 + i))
    table = LakeTable.create(
        spark,
        os.path.join(tmp, "table"),
        TRANSCRIPTS_SCHEMA,
        key=["conv_id", "turn_idx"],
        n_buckets=8,
    )
    # max_files_per_trigger=4 forces multi-batch replay (exactly-once
    # machinery under test); adaptive_trigger_rows rides along with a
    # row target sized to ~2 segments so the r5 backlog-coalescing path
    # is ALSO driver-attested — the converged state is trigger-sizing
    # independent by construction
    run_stream(spark, wal, table, os.path.join(tmp, "state"),
               max_files_per_trigger=1,
               adaptive_trigger_rows=max(2, len(ch) // 2))
    out = table.read().select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )
    out = out.cache()
    out.count()  # materialize before the temp WAL/state dirs go away
    shutil.rmtree(tmp, ignore_errors=True)
    return out


_ORACLE_STREAMING_REPLAY = r"""
WITH ch AS (
  SELECT 'u' || CAST(user_id AS VARCHAR) AS conv_id,
         CAST(event_id % 7 AS INTEGER) AS turn_idx,
         CASE WHEN event_id % 11 = 0 THEN 'D' ELSE 'U' END AS op,
         event_id AS lsn, ts,
         event_type AS role, props AS text,
         CASE WHEN event_id % 3 = 0 THEN 'search' END AS tool
  FROM events),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
      PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
  FROM ch)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM ranked WHERE rn = 1 AND op = 'U'
"""


def q_streaming_scd2_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """History-preserving streaming CDC: the same transcript WAL tailed
    into an SCD2 lake table (Scd2Stream -> apply_scd2 per micro-batch,
    LSN validity axis, event ts carried per version). Rows-only here; the
    bit-exact convergence to the one-shot scd2_history window — itself
    oracle-checked via `scd2_deletes` — is asserted in
    tests/test_streaming.py::test_scd2_stream_history_converges."""
    import shutil

    from etl_spark.cdc.changelog import (
        CHANGELOG_SCHEMA,
        ChangelogSpec,
        generate_changelog,
        write_changelog,
    )
    from etl_spark.cdc.scd2 import create_scd2_table
    from etl_spark.streaming import Scd2Stream

    tmp = tempfile.mkdtemp(prefix="etl_spark_scd2_stream_q_")
    spec = ChangelogSpec(n_conversations=50, seed=7)
    wal = os.path.join(tmp, "wal")
    write_changelog(generate_changelog(spec), wal, spec)
    table = create_scd2_table(
        spark, os.path.join(tmp, "table"), CHANGELOG_SCHEMA,
        ["conv_id", "turn_idx"], "lsn",
        payload_cols=["role", "text", "tool"], carry_cols=["ts"],
        n_buckets=8,
    )
    Scd2Stream(
        spark, wal, table, os.path.join(tmp, "state")
    ).run_to_completion()
    out = table.read().select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
        "valid_from", "valid_to", "is_current", "version",
    )
    out = out.cache()
    out.count()  # materialize before the temp WAL/state dirs go away
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_streaming_scd2_replay_oracle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The STREAMING SCD2 target made oracle-checkable, same recipe as
    ``streaming_cdc_replay_oracle``: the op-tagged events changelog
    (``_events_with_op`` — 'error' = delete, same derivation as the
    oracle-checked ``scd2_deletes``/``scd2_incremental_deletes``) is
    written as a per-partition chronologically-segmented parquet WAL and
    tailed by the real ``Scd2Stream`` (micro-batches, commit log,
    per-key last_seen guard, version continuation across commits); the
    converged history table must equal the one-shot SCD2 window DuckDB
    computes over ``events`` — bit-exact. Validity axis is ``ts`` with
    ``event_id`` tiebreak (ts is strictly monotone with event_id in the
    testdata, and a key's events all land in one source partition, so
    per-partition segment order is per-key chronological order — the
    WAL contract)."""
    import shutil

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_spark.cdc.scd2 import create_scd2_table
    from etl_spark.streaming import Scd2Stream

    ev = _events_with_op(spark, sf_dir)
    ch = ev.withColumn(
        "source_partition", (F.col("user_id") % 4).cast("int")
    ).toPandas()

    tmp = tempfile.mkdtemp(prefix="etl_spark_scd2_stream_ev_q_")
    wal = os.path.join(tmp, "wal")
    arrow_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("event_id", pa.int64()),
            ("event_type", pa.string()),
            ("op", pa.string()),
        ]
    )
    cols = [f.name for f in arrow_schema]
    for p, part in ch.groupby("source_partition", sort=True):
        pdir = os.path.join(wal, f"source_partition={int(p)}")
        os.makedirs(pdir, exist_ok=True)
        part = part.sort_values("event_id")
        for i, idx in enumerate(np.array_split(np.arange(len(part)), 4)):
            if idx.size == 0:
                continue
            path = os.path.join(pdir, f"seg-{i:05d}.parquet")
            pq.write_table(
                pa.Table.from_pandas(
                    part.iloc[idx][cols], preserve_index=False
                ).cast(arrow_schema),
                path,
            )
            # segment index IS batch order (FileStreamSource mtime sort)
            os.utime(path, (1_000_000 + i, 1_000_000 + i))
    table = create_scd2_table(
        spark, os.path.join(tmp, "t"), ev.schema, ["user_id"], "ts",
        payload_cols=["event_type"], n_buckets=8,
    )
    Scd2Stream(
        spark, wal, table, os.path.join(tmp, "state"),
        time_col="ts", tiebreak=["event_id"], carry_cols=[],
        max_files_per_trigger=4,
    ).run_to_completion()
    out = table.read().select(
        "user_id", "event_type", "valid_from", "valid_to",
        "is_current", "version",
    )
    out = out.cache()
    out.count()  # materialize before the temp WAL/state dirs go away
    shutil.rmtree(tmp, ignore_errors=True)
    return out


# --------------------------------------------------------------------------
# Transcript / quality extensions (context windows, repetition filters)
# --------------------------------------------------------------------------

def q_conversation_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transcript reassembly (turns -> one document per conversation)
    expressed over the events stream: per user, every event rendered as
    one line and concatenated in STABLE (ts, event_id) order. This is
    the north-rule invariant ("per-turn text equality under stable turn
    ordering") as a direct oracle check — the order columns ride inside
    the collected struct and ``array_sort`` restores the total order
    after the shuffle, so the assembled string is a pure function of the
    data at any parallelism; DuckDB recomputes it sequentially with
    ``string_agg(... ORDER BY)``."""
    ev = _t(spark, sf_dir, "events")
    line = F.concat_ws(
        "#", F.col("event_type"), F.col("event_id").cast("string")
    )
    return ordered_assembly(
        ev, ["user_id"], ["ts", "event_id"], line, sep="|",
        out_col="timeline",
    ).select("user_id", "timeline")


_ORACLE_ASSEMBLY = """
SELECT user_id,
       string_agg(event_type || '#' || CAST(event_id AS VARCHAR), '|'
                  ORDER BY ts, event_id) AS timeline
FROM events GROUP BY user_id
"""


def q_context_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-pair extraction primitive: per event, the concatenated
    trailing context (previous 3 event_types per user in event-time
    order) — the transcript shape (context = prior turns, response =
    this turn) expressed over the events stream. First events per user
    carry NULL context (string_agg-over-empty-frame semantics)."""
    from etl_spark.operators.reshape import with_context_window

    ev = _t(spark, sf_dir, "events")
    out = with_context_window(
        ev, ["user_id"], ["ts", "event_id"], "event_type", n=3
    )
    return out.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id",
        F.col("event_type").alias("response"), "context",
    )


_ORACLE_CONTEXT = """
WITH w AS (
  SELECT event_id, user_id, event_type,
         string_agg(event_type, ' ') OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING) AS context
  FROM events)
SELECT event_id, user_id, event_type AS response, context
FROM w WHERE event_type = 'purchase'
"""


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (duplicate-word fraction,
    top-bigram fraction) per document — the degenerate/boilerplate-text
    filter of a pretraining pipeline, as pure key-equality shuffles."""
    from etl_spark.operators.reshape import repetition_signals

    docs = _t(spark, sf_dir, "documents")
    return repetition_signals(docs).select(
        "doc_id", "n_words",
        F.round("dup_word_frac", 6).alias("dup_word_frac"),
        F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
    )


_ORACLE_REPETITION = r"""
WITH words AS (
  SELECT doc_id, i AS p, w[i] AS w
  FROM (SELECT doc_id,
               string_split(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))),
                            ' ') AS w
        FROM documents),
       UNNEST(range(1, len(w) + 1)) AS t(i)),
pw AS (SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY 1, 2),
ws AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
              1.0 - CAST(COUNT(*) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                AS dup_word_frac
       FROM pw GROUP BY 1),
bg AS (SELECT doc_id,
              w || ' ' || lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS bg,
              lead(w) OVER (PARTITION BY doc_id ORDER BY p) AS nx
       FROM words),
pb AS (SELECT doc_id, bg, COUNT(*) AS c FROM bg WHERE nx IS NOT NULL
       GROUP BY 1, 2),
bs AS (SELECT doc_id,
              CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE)
                AS top_bigram_frac
       FROM pb GROUP BY 1)
SELECT ws.doc_id, n_words,
       round(dup_word_frac, 6) AS dup_word_frac,
       round(top_bigram_frac, 6) AS top_bigram_frac
FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
"""


# --------------------------------------------------------------------------
# Incremental materialized views (change-feed-driven view maintenance)
# --------------------------------------------------------------------------

def _churned_source(spark: SparkSession, sf_dir: str, tmp: str):
    """Shared lifecycle for the derived-view queries: a keyed lake table
    driven through inserts (two halves), deletes (all 'error' events) and
    updates (value doubled for user_id % 5 == 0), with ``refresh_cb``
    called after every source commit — so the view sees four genuinely
    incremental deltas, never the final state in one shot."""
    src_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    src = LakeTable.create(
        spark, os.path.join(tmp, "src"), src_schema,
        key=["event_id"], n_buckets=16,
    )
    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    batches = [
        ev.filter(F.col("event_id") % 2 == 0).withColumn("op", F.lit("U")),
        ev.filter(F.col("event_id") % 2 == 1).withColumn("op", F.lit("U")),
        ev.filter(F.col("event_type") == "error").withColumn("op", F.lit("D")),
        ev.filter(
            (F.col("user_id") % 5 == 0) & (F.col("event_type") != "error")
        )
        .withColumn("value", F.col("value") * 2)
        .withColumn("op", F.lit("U")),
    ]
    return src, batches


def _run_view_lifecycle(spark, sf_dir, view_factory, prefix):
    import shutil

    tmp = tempfile.mkdtemp(prefix=prefix)
    src, batches = _churned_source(spark, sf_dir, tmp)
    view = view_factory(src, tmp)
    for b in batches:
        src.merge(b, op_col="op")
        view.refresh()
    out = view.read().cache()
    out.count()  # materialize before the temp lake dirs go away
    shutil.rmtree(tmp, ignore_errors=True)
    return out


def q_derived_agg_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained grouped aggregate (delta strategy): the
    view NEVER rescans the source after the initial build — every refresh
    reads only the change feed (with pre-images) and adjusts per-group
    (count, exact-decimal sum) state, so a group-moving update or a
    delete retracts from the old group and adds to the new one. The final
    view must equal a one-shot aggregate over the final source state —
    which is exactly what the oracle computes."""
    from etl_spark.lake.derived import IncrementalAggView

    def mk(src, tmp):
        return IncrementalAggView(
            spark, os.path.join(tmp, "view"), src, group_by=["user_id"],
            aggs={
                "n_events": ("count", "*"),
                "total_value": ("sum", "value"),
                "mean_value": ("avg", "value"),
            },
            strategy="delta",
        )

    return _run_view_lifecycle(
        spark, sf_dir, mk, "etl_spark_derived_agg_q_"
    ).select("user_id", "n_events", "total_value", "mean_value")


_ORACLE_DERIVED_AGG = """
WITH final AS (
  SELECT user_id,
         CASE WHEN user_id % 5 = 0 THEN value * 2 ELSE value END AS value
  FROM events WHERE event_type <> 'error')
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(value)
         AS mean_value
FROM final GROUP BY user_id
"""


def q_derived_minmax_rescan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained min/max view (rescan strategy): extremes
    are not self-maintainable under retraction, so each refresh
    recomputes ONLY the affected groups — a broadcast semi-join prune of
    the source, never a full rescan. The delete batch retracts many
    per-group extremes; the view must still equal the one-shot
    aggregate."""
    from etl_spark.lake.derived import IncrementalAggView

    def mk(src, tmp):
        return IncrementalAggView(
            spark, os.path.join(tmp, "view"), src, group_by=["user_id"],
            aggs={
                "n_events": ("count", "*"),
                "min_value": ("min", "value"),
                "max_value": ("max", "value"),
            },
        )

    return _run_view_lifecycle(
        spark, sf_dir, mk, "etl_spark_derived_mm_q_"
    ).select("user_id", "n_events", "min_value", "max_value")


_ORACLE_DERIVED_MINMAX = """
WITH final AS (
  SELECT user_id,
         CASE WHEN user_id % 5 = 0 THEN value * 2 ELSE value END AS value
  FROM events WHERE event_type <> 'error')
SELECT user_id,
       COUNT(*)   AS n_events,
       MIN(value) AS min_value,
       MAX(value) AS max_value
FROM final GROUP BY user_id
"""


def q_derived_row_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained row-level view (filter + projection):
    updates that cross the filter boundary move rows in/out of the view,
    and source deletes propagate — post-images flow through the
    transform, dropped keys become view deletes."""
    from etl_spark.lake.derived import IncrementalRowView

    def transform(df):
        return df.filter(F.col("value") > 50.0).select(
            "event_id", "user_id",
            F.upper("event_type").alias("event_type_uc"),
            (F.col("value") * 0.5).alias("half_value"),
        )

    def mk(src, tmp):
        return IncrementalRowView(spark, os.path.join(tmp, "view"), src, transform)

    return _run_view_lifecycle(
        spark, sf_dir, mk, "etl_spark_derived_row_q_"
    ).select("event_id", "user_id", "event_type_uc", "half_value")


_ORACLE_DERIVED_ROW = """
WITH final AS (
  SELECT event_id, user_id, event_type,
         CASE WHEN user_id % 5 = 0 THEN value * 2 ELSE value END AS value
  FROM events WHERE event_type <> 'error')
SELECT event_id, user_id,
       upper(event_type) AS event_type_uc,
       value * 0.5       AS half_value
FROM final WHERE value > 50.0
"""


def q_join_view_incremental(
    spark: SparkSession, sf_dir: str, how: str = "left"
) -> DataFrame:
    """Incrementally-maintained JOIN view (orders ⋈ customer dimension
    enrichment, ``lake.joinview``): after the initial build, refreshes
    read ONLY the two change feeds — a left delta joins against the
    bucket-pruned dimension, a dimension delta probes the reverse-fk
    index for the affected facts — never a full rescan of either side.
    Lifecycle: full load → (fact price updates + fact deletes + dim
    balance updates) → dim deletes (how='left' ⇒ enriched columns go
    NULL; how='inner' ⇒ the referencing facts LEAVE the view). The
    final view must equal the plain SQL join over the final table
    states, bit-exactly."""
    import shutil

    from etl_spark.lake.joinview import IncrementalJoinView

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    tmp = tempfile.mkdtemp(prefix="etl_spark_joinview_q_")
    try:
        left = LakeTable.create(
            spark, os.path.join(tmp, "l"), orders.schema,
            key=["o_orderkey"], n_buckets=8,
        )
        right = LakeTable.create(
            spark, os.path.join(tmp, "r"), cust.schema,
            key=["c_custkey"], n_buckets=8,
        )
        left.merge(orders.withColumn("op", F.lit("U")), op_col="op")
        right.merge(cust.withColumn("op", F.lit("U")), op_col="op")
        view = IncrementalJoinView(
            spark, os.path.join(tmp, "v"), left, right,
            on=["o_custkey"], how=how, right_prefix="d_", n_buckets=8,
        )
        view.refresh()  # initial build
        # batch 2: fact updates + deletes, dim balance updates
        upd = orders.filter(
            (F.col("o_orderkey") % 5 == 0) & (F.col("o_orderkey") % 7 != 3)
        ).select(
            "o_orderkey", "o_custkey",
            F.lit(-1.0).alias("o_totalprice"), F.lit("U").alias("op"),
        )
        dels = orders.filter(F.col("o_orderkey") % 7 == 3).select(
            "o_orderkey",
            F.lit(None).cast("long").alias("o_custkey"),
            F.lit(None).cast("double").alias("o_totalprice"),
            F.lit("D").alias("op"),
        )
        left.merge(upd.unionByName(dels), op_col="op")
        right.merge(
            cust.filter(F.col("c_custkey") % 3 == 0).select(
                "c_custkey", "c_name",
                (F.col("c_acctbal") + F.lit(1000.0)).alias("c_acctbal"),
                F.lit("U").alias("op"),
            ),
            op_col="op",
        )
        view.refresh()
        # batch 3: dim deletes — enrichment goes NULL under how='left'
        right.merge(
            cust.filter(F.col("c_custkey") % 11 == 5).select(
                "c_custkey",
                F.lit(None).cast("string").alias("c_name"),
                F.lit(None).cast("double").alias("c_acctbal"),
                F.lit("D").alias("op"),
            ),
            op_col="op",
        )
        view.refresh()
        out = view.read().select(
            "o_orderkey", "o_custkey", "o_totalprice",
            F.col("d_c_name").alias("d_name"),
            F.col("d_c_acctbal").alias("d_acctbal"),
        ).cache()
        out.count()  # materialize before the temp lake dirs go away
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_join_view_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAINED join views (star-schema enrichment): view1 = orders ⋈
    customer, view2 = view1 ⋈ nation — the second view's LEFT SOURCE is
    the first view's own LakeTable, so dimension churn anywhere in the
    star propagates through two incremental refreshes (view commits are
    ordinary merge commits, hence ordinary change feeds; watermark tags
    read as maintenance-only windows downstream). Churn re-points the
    MIDDLE of the chain (customers move nations) and deletes second-level
    dims; the final chained view must equal the plain 3-table SQL join
    over final states, bit-exactly."""
    import shutil

    from etl_spark.lake.joinview import IncrementalJoinView

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    tmp = tempfile.mkdtemp(prefix="etl_spark_jv_star_q_")
    try:
        l1 = LakeTable.create(
            spark, os.path.join(tmp, "o"), orders.schema,
            key=["o_orderkey"], n_buckets=8,
        )
        r1 = LakeTable.create(
            spark, os.path.join(tmp, "c"), cust.schema,
            key=["c_custkey"], n_buckets=8,
        )
        r2 = LakeTable.create(
            spark, os.path.join(tmp, "n"), nation.schema,
            key=["n_nationkey"], n_buckets=4,
        )
        l1.merge(orders.withColumn("op", F.lit("U")), op_col="op")
        r1.merge(cust.withColumn("op", F.lit("U")), op_col="op")
        r2.merge(nation.withColumn("op", F.lit("U")), op_col="op")
        v1 = IncrementalJoinView(
            spark, os.path.join(tmp, "v1"), l1, r1,
            on=["o_custkey"], how="left", right_prefix="d_", n_buckets=8,
        )
        v2 = IncrementalJoinView(
            spark, os.path.join(tmp, "v2"), v1.table, r2,
            on=["d_c_nationkey"], how="left", right_prefix="", n_buckets=8,
        )
        v1.refresh()
        v2.refresh()
        # batch 2: customers change NATION (re-points the chain's middle
        # fk), orders change price
        r1.merge(
            cust.filter(F.col("c_custkey") % 4 == 0).select(
                "c_custkey",
                ((F.col("c_nationkey") + 7) % 25).cast("int")
                .alias("c_nationkey"),
                "c_acctbal", F.lit("U").alias("op"),
            ),
            op_col="op",
        )
        l1.merge(
            orders.filter(F.col("o_orderkey") % 5 == 0).select(
                "o_orderkey", "o_custkey",
                F.lit(-1.0).alias("o_totalprice"), F.lit("U").alias("op"),
            ),
            op_col="op",
        )
        v1.refresh()
        v2.refresh()
        # batch 3: second-level dim deletes — nation names go NULL
        r2.merge(
            nation.filter(F.col("n_nationkey").isin(3, 9)).select(
                "n_nationkey",
                F.lit(None).cast("string").alias("n_name"),
                F.lit("D").alias("op"),
            ),
            op_col="op",
        )
        v1.refresh()
        v2.refresh()
        out = v2.read().select(
            "o_orderkey", "o_custkey", "o_totalprice",
            F.col("d_c_nationkey").alias("d_nationkey"),
            F.col("d_c_acctbal").alias("d_acctbal"),
            F.col("n_name").alias("nation_name"),
        ).cache()
        out.count()  # materialize before the temp lake dirs go away
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


_ORACLE_JOIN_VIEW_STAR = """
WITH c AS (
  SELECT c_custkey,
         CASE WHEN c_custkey % 4 = 0
              THEN CAST((c_nationkey + 7) % 25 AS INTEGER)
              ELSE c_nationkey END AS c_nationkey,
         c_acctbal
  FROM customer
), l AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 5 = 0 THEN -1.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders
), n AS (
  SELECT n_nationkey, n_name FROM nation WHERE n_nationkey NOT IN (3, 9)
)
SELECT l.o_orderkey, l.o_custkey, l.o_totalprice,
       c.c_nationkey AS d_nationkey, c.c_acctbal AS d_acctbal,
       n.n_name AS nation_name
FROM l LEFT JOIN c ON l.o_custkey = c.c_custkey
       LEFT JOIN n ON c.c_nationkey = n.n_nationkey
"""


def q_join_view_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same lifecycle as ``join_view_incremental`` with how='inner': the
    batch-3 dimension deletes must REMOVE every referencing fact from
    the view through the reverse-fk index probe (delete/resurrect flow),
    matching the plain INNER JOIN over final states bit-exactly."""
    return q_join_view_incremental(spark, sf_dir, how="inner")


_JOIN_VIEW_SQL = """
WITH l AS (
  SELECT o_orderkey, o_custkey,
         CASE WHEN o_orderkey % 5 = 0 THEN -1.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 7 <> 3
), r AS (
  SELECT c_custkey, c_name,
         CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 1000.0
              ELSE c_acctbal END AS c_acctbal
  FROM customer WHERE c_custkey % 11 <> 5
)
SELECT l.o_orderkey, l.o_custkey, l.o_totalprice,
       r.c_name AS d_name, r.c_acctbal AS d_acctbal
FROM l {JOIN} r ON l.o_custkey = r.c_custkey
"""

_ORACLE_JOIN_VIEW = _JOIN_VIEW_SQL.format(JOIN="LEFT JOIN")
_ORACLE_JOIN_VIEW_INNER = _JOIN_VIEW_SQL.format(JOIN="INNER JOIN")


QUERIES = {
    # --- the driver's correctness gate runs the FIRST 50 entries only,
    # so this order IS the coverage policy. r5 ROTATION (VERDICT r4 #1):
    # ~15 family anchors stay pinned; the other 35 slots carry entries
    # that had never earned a driver-green row through r4 (join views,
    # scd2 deletes, replication/repair, sampling/text tails, promoted
    # bit-exact variants). CORRECTNESS_r05 + CORRECTNESS_r04 together
    # then cover 86 distinct entries. r4's window members now sit below
    # the line -- still in the local gate (tools/check_oracle.py).
    #
    # ~15 family anchors (every one driver-green in r4, except
    # semantic_dedup which ADVICE r4 asked to get window attestation):
    "cdc_apply_final_state": q_cdc_apply_final_state,
    "cdc_apply_mor": q_cdc_apply_mor,
    "catalog_txn": q_catalog_txn,
    "streaming_cdc_replay_oracle": q_streaming_cdc_replay_oracle,
    "streaming_scd2_replay_oracle": q_streaming_scd2_replay_oracle,
    "multimodal_roundtrip": q_multimodal_roundtrip,
    "dedup_exact": q_dedup_exact,
    "dedup_minhash_lsh_verified": q_dedup_minhash_lsh_verified,
    "dedup_simhash_full": q_dedup_simhash_full,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_clusters": q_dedup_clusters,
    "semantic_dedup": q_semantic_dedup,
    "similarity_pq_full": q_similarity_pq_full,
    "similarity_ivf_full": q_similarity_ivf_full,
    "similarity_lsh_full": q_similarity_lsh_full,
    # 35 rotation slots -- first driver attestation for each:
    "join_view_inner": q_join_view_inner,
    "join_view_star": q_join_view_star,
    "scd2_deletes": q_scd2_deletes,
    "scd2_incremental_deletes": q_scd2_incremental_deletes,
    "enrich_history": q_enrich_history,
    "interval_join": q_interval_join,
    "derived_minmax_rescan": q_derived_minmax_rescan,
    "derived_row_view": q_derived_row_view,
    "stream_sessionize": q_stream_sessionize,
    "catalog_replicate": q_catalog_replicate,
    "change_feed_replicate": q_change_feed_replicate,
    "replica_repair": q_replica_repair,
    "catalog_repair": q_catalog_repair,
    "branch_backfill": q_branch_backfill,
    "delete_where": q_delete_where,
    "update_query": q_update_query,
    "mixture_sample": q_mixture_sample,
    "truncate_to_budget": q_truncate_to_budget,
    "turn_integrity": q_turn_integrity,
    "redact_pii": q_redact_pii,
    "ngram_frequencies": q_ngram_frequencies,
    "doc_fingerprint": q_doc_fingerprint,
    "context_window": q_context_window,
    "repetition_signals": q_repetition_signals,
    "winnow_overlap_full": q_winnow_overlap_full,
    "incremental_dedup_verified": q_incremental_dedup_verified,
    "embedding_clusters_fixed": q_embedding_clusters_fixed,
    "embedding_neardup_blocked": q_embedding_neardup_blocked,
    "concat_fields": q_concat_fields,
    "slug": q_slug,
    "field_map_dotted": q_field_map_dotted,
    "include_exclude_extra": q_include_exclude_extra,
    "distinct_segments": q_distinct_segments,
    "top_orders": q_top_orders,
    "entity_relation": q_entity_relation,
    # --- below the 50-entry driver window: every entry here was
    # driver-green in CORRECTNESS_r04.json (or is a rows-only /
    # near-variant whose family representative sits above); all still
    # run in the local gate.
    "multi_table_route": q_multi_table_route,
    "cdc_apply_patch": q_cdc_apply_patch,
    "cdc_apply_patch_mor": q_cdc_apply_patch_mor,
    "wap_publish": q_wap_publish,
    "merge_out_of_order": q_merge_out_of_order,
    "debezium_roundtrip": q_debezium_roundtrip,
    "lww_dedup": q_lww_dedup,
    "incremental_tail": q_incremental_tail,
    "sessionize": q_sessionize,
    "stream_window_agg": q_stream_window_agg,
    "derived_agg_incremental": q_derived_agg_incremental,
    "join_view_incremental": q_join_view_incremental,
    "scd2": q_scd2,
    "scd2_incremental": q_scd2_incremental,
    "asof_join": q_asof_join,
    "field_map_template": q_field_map_template,
    "coerce_to_schema": q_coerce_to_schema,
    "kv_unpivot": q_kv_unpivot,
    "multi_mapping": q_multi_mapping,
    "isin_filter": q_isin_filter,
    "validator_dead_letter": q_validator_dead_letter,
    "lookup_in": q_lookup_in,
    "agg_pricing_summary": q_agg_pricing_summary,
    "join_revenue_by_nation": q_join_revenue_by_nation,
    "quality_filter": q_quality_filter,
    "corpus_pipeline": q_corpus_pipeline,
    "decontaminate": q_decontaminate,
    "embedding_neardup": q_embedding_neardup,
    "text_stats": q_text_stats,
    "tfidf_keywords": q_tfidf_keywords,
    "lm_quality_score": q_lm_quality_score,
    "profile_docs": q_profile_docs,
    "hash_split": q_hash_split,
    "quota_sample": q_quota_sample,
    "sequence_packing": q_sequence_packing,
    "conversation_assembly": q_conversation_assembly,
    "cdc_apply_skip_unchanged": q_cdc_apply_skip_unchanged,
    "merge_mor_out_of_order": q_merge_mor_out_of_order,
    "lww_dedup_salted": q_lww_dedup_salted,
    "uppercase_values": q_uppercase_values,
    "dedup_survivors": q_dedup_survivors,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "similarity_topk": q_similarity_topk,
    "similarity_lsh": q_similarity_lsh,
    "similarity_ivf": q_similarity_ivf,
    "similarity_pq": q_similarity_pq,
    "embedding_clusters": q_embedding_clusters,
    "embedding_neardup_blocked_hi": q_embedding_neardup_blocked_hi,
    "profile_docs_approx": q_profile_docs_approx,
    "winnow_overlap": q_winnow_overlap,
    "incremental_dedup": q_incremental_dedup,
    "multimodal_meta": q_multimodal_meta,
    "streaming_cdc_replay": q_streaming_cdc_replay,
    "streaming_scd2_replay": q_streaming_scd2_replay,
}

ORACLE_SQL = {
    "cdc_apply_final_state": _ORACLE_CDC_FINAL,
    "cdc_apply_mor": _ORACLE_CDC_FINAL,
    "multi_table_route": _ORACLE_MULTI_ROUTE,
    "cdc_apply_skip_unchanged": _ORACLE_CDC_FINAL,
    "cdc_apply_patch": _ORACLE_CDC_PATCH,
    "cdc_apply_patch_mor": _ORACLE_CDC_PATCH,
    "wap_publish": _ORACLE_CDC_FINAL,
    "branch_backfill": _ORACLE_CDC_FINAL,
    "catalog_txn": _ORACLE_CDC_FINAL,
    "catalog_replicate": _ORACLE_CDC_FINAL,
    "catalog_repair": _ORACLE_CDC_FINAL,
    "replica_repair": _ORACLE_CDC_FINAL,
    "change_feed_replicate": _ORACLE_CDC_FINAL,
    "merge_out_of_order": _ORACLE_OOO_MERGE,
    "merge_mor_out_of_order": _ORACLE_OOO_MERGE,
    "debezium_roundtrip": _ORACLE_DEBEZIUM,
    "lww_dedup": _ORACLE_LWW,
    "lww_dedup_salted": _ORACLE_LWW,
    "incremental_tail": _ORACLE_TAIL,
    "sessionize": _ORACLE_SESSIONIZE,
    "field_map_template": _ORACLE_FIELD_MAP,
    "field_map_dotted": _ORACLE_FIELD_MAP_DOTTED,
    "concat_fields": _ORACLE_CONCAT,
    "slug": _ORACLE_SLUG,
    "uppercase_values": _ORACLE_UPPER,
    "include_exclude_extra": _ORACLE_INC_EXC,
    "coerce_to_schema": _ORACLE_COERCE,
    "kv_unpivot": _ORACLE_KV,
    "multi_mapping": _ORACLE_MULTI_MAP,
    "isin_filter": _ORACLE_ISIN,
    "validator_dead_letter": _ORACLE_DEAD,
    "lookup_in": _ORACLE_LOOKUP,
    "agg_pricing_summary": _ORACLE_Q1,
    "join_revenue_by_nation": _ORACLE_REVENUE,
    "distinct_segments": _ORACLE_DISTINCT,
    "top_orders": _ORACLE_TOP,
    "entity_relation": _ORACLE_ENTITY,
    "update_query": _ORACLE_UPDATE,
    "delete_where": _ORACLE_DELETE_WHERE,
    "dedup_exact": _ORACLE_DEDUP_EXACT,
    "dedup_ngram_jaccard": _ORACLE_JACCARD,
    "dedup_simhash_full": _ORACLE_SIMHASH_FULL,
    "dedup_minhash_lsh_verified": _ORACLE_JACCARD,
    "incremental_dedup_verified": _ORACLE_JACCARD,
    "dedup_clusters": _ORACLE_CLUSTERS,
    "dedup_survivors": _ORACLE_SURVIVORS,
    "quality_filter": _ORACLE_QUALITY_FILTER,
    "corpus_pipeline": _ORACLE_CORPUS_PIPELINE,
    "similarity_topk": _ORACLE_TOPK,
    "similarity_lsh_full": _ORACLE_TOPK,
    "similarity_ivf_full": _ORACLE_TOPK,
    "similarity_pq_full": _ORACLE_TOPK,
    "semantic_dedup": _ORACLE_SEMANTIC_DEDUP,
    "embedding_neardup": _ORACLE_EMB_NEARDUP,
    "embedding_neardup_blocked": _ORACLE_EMB_NEARDUP,
    "embedding_neardup_blocked_hi": _ORACLE_EMB_NEARDUP_HI,
    "text_stats": _ORACLE_TEXT_STATS,
    "profile_docs": _ORACLE_PROFILE,
    "redact_pii": _ORACLE_REDACT,
    "ngram_frequencies": _ORACLE_NGRAM_FREQ,
    "decontaminate": _ORACLE_DECONTAMINATE,
    "multimodal_roundtrip": _ORACLE_MULTIMODAL_ROUNDTRIP,
    "lm_quality_score": _ORACLE_LM_SCORE,
    "hash_split": _ORACLE_HASH_SPLIT,
    "mixture_sample": _ORACLE_MIXTURE_SAMPLE,
    "quota_sample": _ORACLE_QUOTA_SAMPLE,
    "sequence_packing": _ORACLE_SEQUENCE_PACKING,
    "tfidf_keywords": _ORACLE_TFIDF,
    "truncate_to_budget": _ORACLE_TRUNCATE,
    "turn_integrity": _ORACLE_TURN_INTEGRITY,
    "asof_join": _ORACLE_ASOF,
    "interval_join": _ORACLE_INTERVAL,
    "scd2": _ORACLE_SCD2,
    "scd2_incremental": _ORACLE_SCD2,
    "scd2_deletes": _ORACLE_SCD2_DELETES,
    "enrich_history": _ORACLE_ENRICH_HISTORY,
    "scd2_incremental_deletes": _ORACLE_SCD2_DELETES,
    "doc_fingerprint": _ORACLE_FINGERPRINT,
    "winnow_overlap_full": _ORACLE_WINNOW_FULL,
    "embedding_clusters_fixed": _ORACLE_CLUSTERS_FIXED,
    "stream_sessionize": _ORACLE_STREAM_SESSIONIZE,
    "stream_window_agg": _ORACLE_STREAM_WINDOW_AGG,
    "streaming_cdc_replay_oracle": _ORACLE_STREAMING_REPLAY,
    "streaming_scd2_replay_oracle": _ORACLE_SCD2_DELETES,
    "derived_agg_incremental": _ORACLE_DERIVED_AGG,
    "derived_minmax_rescan": _ORACLE_DERIVED_MINMAX,
    "derived_row_view": _ORACLE_DERIVED_ROW,
    "join_view_incremental": _ORACLE_JOIN_VIEW,
    "join_view_inner": _ORACLE_JOIN_VIEW_INNER,
    "join_view_star": _ORACLE_JOIN_VIEW_STAR,
    "context_window": _ORACLE_CONTEXT,
    "conversation_assembly": _ORACLE_ASSEMBLY,
    "repetition_signals": _ORACLE_REPETITION,
}
