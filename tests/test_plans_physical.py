"""Physical-plan checks: the optimizations we claim must be visible in
``explain`` output — predicate pushdown to the parquet scan, column
pruning, broadcast of the dimension side, no Python in expression-only
pipelines."""

from __future__ import annotations

import pytest

from etl_spark.operators import isin_filter, lookup_in
from etl_spark.functions.text import normalize_transcripts_expr


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")


def test_isin_filter_pushed_to_scan(lineitem):
    df = isin_filter(lineitem, "l_returnflag", ["A", "R"]).select(
        "l_orderkey", "l_returnflag"
    )
    plan = _executed_plan(df)
    assert "PushedFilters" in plan and "l_returnflag" in plan.split("PushedFilters", 1)[1][:200]


def test_column_pruning_reaches_scan(lineitem):
    df = lineitem.select("l_orderkey", "l_quantity")
    plan = _executed_plan(df)
    read = plan.split("ReadSchema", 1)[1][:200]
    assert "l_orderkey" in read and "l_extendedprice" not in read


def test_lookup_in_uses_broadcast_join(spark):
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    df = lookup_in(customer, nation, "c_nationkey", "n_nationkey", "n_name")
    assert "BroadcastHashJoin" in _executed_plan(df)


def test_lookup_in_size_guard_regimes(spark):
    """auto-broadcast probes the dim size: a dim over the threshold must
    NOT be force-broadcast (the hint is withheld; AQE may still choose a
    small-side broadcast on its own, so assert on the forced regime via
    broadcast=False), a small dim must be."""
    customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    nation = spark.read.parquet("/root/testdata/sf0.001/nation.parquet")
    small = lookup_in(
        customer, nation, "c_nationkey", "n_nationkey", "n_name",
        broadcast="auto", broadcast_threshold=200_000,
    )
    assert "BroadcastHashJoin" in _executed_plan(small)
    # over-threshold dim: auto withholds the broadcast HINT (AQE may still
    # choose a size-based broadcast on its own — that's fine and exactly
    # the point: strategy from real sizes, not a forced hint)
    def analyzed(df):
        return df._jdf.queryExecution().analyzed().toString()

    assert "ResolvedHint" in analyzed(small)
    guarded = lookup_in(
        customer, nation, "c_nationkey", "n_nationkey", "n_name",
        broadcast="auto", broadcast_threshold=10,  # nation has 25 rows
    )
    assert "ResolvedHint" not in analyzed(guarded)
    # results identical across regimes
    a = sorted(map(tuple, small.collect()))
    b = sorted(map(tuple, guarded.collect()))
    assert a == b


def test_incremental_dedup_probe_join_no_index_shuffle(spark, tmp_path):
    """MinHashIndex.ingest's probe must NOT reshuffle the persisted band
    index per batch (it is O(total docs x bands) — reshuffling it every
    micro-batch defeats the incremental design): with the size-guarded
    broadcast of the small batch side, the join is a BroadcastHashJoin and
    the only Exchange in the probe plan is the batch-side
    BroadcastExchange — zero shuffle (hashpartitioning) Exchanges."""
    from etl_spark.operators.incremental_dedup import MinHashIndex

    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    seed_docs = spark.createDataFrame(
        [(i, f"seed document number {i} with some shared words") for i in range(20)],
        ["doc_id", "text"],
    )
    idx.ingest(seed_docs)
    batch = spark.createDataFrame(
        [(100, "seed document number 3 with some shared words")],
        ["doc_id", "text"],
    )
    bands = idx._band_rows(batch, "doc_id", "text")
    plan = _executed_plan(idx._probe_join(bands, broadcast=True))
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan
    # and the broadcast probe finds the cross-batch dup
    got = {
        (r["new_id"], r["match_id"])
        for r in idx.ingest(batch).collect()
    }
    assert (100, 3) in got


def test_normalize_transform_has_no_python(spark):
    df = spark.createDataFrame(
        [("a", 0, "user", " x ", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    plan = _executed_plan(normalize_transcripts_expr(df))
    # expression-only: no Arrow/Python eval nodes in the CDC hot path
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_no_cartesian_product_in_query_plans(spark):
    """Plan audit over the side-effect-free driver queries: no
    CartesianProduct anywhere (the only all-pairs scoring path is the
    tiled-GEMM mapInPandas, and LSH/IVF candidates are key-equality
    joins); Python nodes (Arrow mapInPandas) appear only in the operators
    documented to use them."""
    from etl_spark.queries import QUERIES

    # excluded: queries that materialize state as a side effect of plan
    # construction (lake replay, streaming run, media synth, update)
    skip = {
        "cdc_apply_final_state", "update_query", "streaming_cdc_replay",
        "multimodal_meta", "merge_out_of_order",
        "derived_agg_incremental", "derived_minmax_rescan",
        "derived_row_view",
        # two-table replay + export/apply chain at plan-construction time
        "change_feed_replicate",
    }
    python_ok = {
        # Arrow-batched numpy stages, by design (never per-row Python)
        "similarity_lsh", "similarity_ivf", "similarity_pq",
        "similarity_pq_full",
        "similarity_lsh_full", "similarity_ivf_full", "embedding_neardup",
        "embedding_neardup_blocked", "embedding_neardup_blocked_hi",
        "dedup_simhash", "dedup_minhash_lsh", "dedup_minhash_lsh_verified",
        "incremental_dedup", "incremental_dedup_verified",
        "embedding_clusters", "embedding_clusters_fixed",
        # SemDeDup: mapInPandas assignment + grouped applyInPandas
        "semantic_dedup",
        # codec round-trip: mapInPandas encode + decode stages
        "multimodal_roundtrip",
    }
    sf = "/root/testdata/sf0.001"
    for name, fn in QUERIES.items():
        if name in skip:
            continue
        plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        if name not in python_ok:
            assert "EvalPython" not in plan and "MapInPandas" not in plan, name


def test_derived_view_refresh_prunes_with_broadcast_semi(spark, tmp_path):
    """The delta-refresh combine must read the view state through a
    size-guarded BROADCAST left-semi join on the delta's group keys
    (map-side prune — the view is never shuffled for a small delta), and
    the state<-delta combine must not sort-merge."""
    from pyspark.sql import types as T

    from etl_spark.lake import LakeTable
    from etl_spark.lake.derived import IncrementalAggView

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("grp", T.StringType()),
            T.StructField("val", T.DoubleType()),
        ]
    )
    src = LakeTable.create(
        spark, str(tmp_path / "src"), schema, key=["id"], n_buckets=4
    )
    ops = T.StructType(list(schema.fields) + [T.StructField("op", T.StringType())])
    src.merge(
        spark.createDataFrame(
            [(i, f"g{i % 7}", float(i), "U") for i in range(100)], ops
        ),
        op_col="op",
    )
    view = IncrementalAggView(
        spark, str(tmp_path / "v"), src, group_by=["grp"],
        aggs={"n": ("count", "*"), "s": ("sum", "val")}, strategy="delta",
    )
    view.capture_plans = True
    view.refresh()
    src.merge(spark.createDataFrame([(3, "g3", 9.0, "U")], ops), op_col="op")
    view.refresh()
    plan = view.last_plan
    assert plan is not None
    # view state is semi-pruned by the broadcast delta keys, and the
    # state<-delta combine is itself a broadcast join — the view is never
    # the probe side of a shuffle join
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    # the ONLY sort-merge join allowed is the change feed's full-outer
    # snapshot diff (co-partitioned bucket files of the same table at
    # cluster scale)
    smj = [ln for ln in plan.splitlines() if "SortMergeJoin" in ln]
    assert all("FullOuter" in ln for ln in smj), smj


def test_hash_split_is_shuffle_free(spark):
    """The split label is a pure codegen expression riding the scan: no
    Exchange and no Python anywhere in the plan."""
    from etl_spark.operators.sampling import hash_split

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _executed_plan(
        hash_split(docs, "text", {"train": 0.9, "val": 0.05, "test": 0.05})
    )
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_quota_two_phase_broadcasts_cutoffs(spark):
    """The per-stratum cutoff table (tiny by construction) must join in
    as a broadcast, never reshuffling the corpus on the strata keys for
    the filter phase."""
    from etl_spark.operators.sampling import quota_sample

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = quota_sample(docs, ["lang"], k=5, hash_on="text", n_prefilter_buckets=64)
    assert "BroadcastHashJoin" in _executed_plan(out)


def test_fingerprint_agg_is_partial_no_python(spark):
    """The anti-entropy fingerprint summary must partial-aggregate
    map-side (one HashAggregate below the Exchange, one above — the
    shuffle carries per-bucket triples, never rows) and stay pure
    codegen: no Python, no Expand, exactly one Exchange."""
    from pyspark.sql import functions as F

    from etl_spark.lake.sync import bucket_fingerprints

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bexpr = F.pmod(F.xxhash64("doc_id"), F.lit(32)).cast("int")
    plan = _executed_plan(
        bucket_fingerprints(docs, bexpr, ["doc_id", "text", "lang"])
    )
    assert plan.count("Exchange") == 1
    # partial + final aggregate pair around the single exchange
    assert plan.count("HashAggregate") >= 2
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "Expand" not in plan
