"""Tests for deterministic sampling / splitting / packing.

The load-bearing property everywhere: assignments are pure functions of
the DATA (content hashes), never of the run — so we test stability under
re-computation, under corpus growth, and (for the two-phase quota path)
exact equality against the plain rank path across bucket counts.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_spark.operators.sampling import (
    hash_split,
    pack_sequences,
    quota_sample,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (i, f"document number {i} with body text {i * 7 % 13}", ["en", "de", "fr"][i % 3],
         ["web", "books"][i % 2])
        for i in range(600)
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang", "source"])


class TestHashSplit:
    def test_fractions_validation(self, corpus):
        with pytest.raises(ValueError):
            hash_split(corpus, "text", {"train": 0.5, "test": 0.4})

    def test_total_and_rough_proportions(self, corpus):
        out = hash_split(corpus, "text", {"train": 0.8, "val": 0.1, "test": 0.1})
        counts = {r["split"]: r["n"] for r in
                  out.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == 600
        assert counts["train"] > 400          # ~480 expected
        assert 20 <= counts.get("val", 0) <= 120
        assert 20 <= counts.get("test", 0) <= 120

    def test_null_key_raises_not_silently_skews(self, spark):
        """md5(NULL) is NULL: the old behavior dumped every NULL-keyed
        row into the LAST split. Must fail loudly instead."""
        df = spark.createDataFrame(
            [(1, "a"), (2, None)], ["doc_id", "text"]
        )
        out = hash_split(df, "text", {"train": 0.9, "test": 0.1})
        with pytest.raises(Exception, match="deterministic split"):
            out.collect()
        # NULL-free input is unaffected
        clean = hash_split(
            df.filter("text is not null"), "text", {"train": 0.9, "test": 0.1}
        )
        assert clean.count() == 1

    def test_null_hash_key_raises_on_both_quota_paths(self, spark):
        """A NULL sampling key would make every rank-order column NULL:
        the plain path then breaks ties arbitrarily (nondeterministic
        sample) and the two-phase path crashed sorting a NULL bucket id
        driver-side. Both must fail loudly, same contract as
        hash_split."""
        df = spark.createDataFrame(
            [(1, "a", "en"), (2, None, "en")], ["doc_id", "text", "lang"]
        )
        with pytest.raises(Exception, match="deterministic hash order"):
            quota_sample(df, ["lang"], 1, "text").collect()
        with pytest.raises(Exception, match="deterministic hash order"):
            quota_sample(
                df, ["lang"], 1, "text", n_prefilter_buckets=4
            ).collect()
        clean = quota_sample(
            df.filter("text is not null"), ["lang"], 1, "text"
        )
        assert clean.count() == 1

    def test_stable_under_growth(self, corpus):
        """A doc's split must not change when the corpus doubles."""
        small = hash_split(corpus.filter("doc_id < 300"), "text",
                           {"train": 0.9, "test": 0.1})
        big = hash_split(corpus, "text", {"train": 0.9, "test": 0.1})
        a = {r["doc_id"]: r["split"] for r in small.select("doc_id", "split").collect()}
        b = {r["doc_id"]: r["split"] for r in big.select("doc_id", "split").collect()}
        assert all(b[k] == v for k, v in a.items())

    def test_deterministic_recompute(self, corpus):
        f = {"train": 0.7, "test": 0.3}
        one = dict(hash_split(corpus, "text", f).select("doc_id", "split").collect())
        two = dict(hash_split(corpus, "text", f).select("doc_id", "split").collect())
        assert one == two


class TestQuotaSample:
    def test_k_enforced_per_stratum(self, corpus):
        out = quota_sample(corpus, ["lang", "source"], k=5, hash_on="text")
        counts = out.groupBy("lang", "source").agg(F.count("*").alias("n")).collect()
        assert all(r["n"] <= 5 for r in counts)
        assert len(counts) == 6  # 3 langs x 2 sources all represented

    def test_small_stratum_kept_whole(self, spark):
        df = spark.createDataFrame(
            [(i, f"t{i}", "rare") for i in range(3)], ["doc_id", "text", "lang"]
        )
        out = quota_sample(df, ["lang"], k=10, hash_on="text")
        assert out.count() == 3

    @pytest.mark.parametrize("buckets", [1, 7, 64, 4096])
    def test_two_phase_equals_plain_for_any_bucket_count(self, corpus, buckets):
        plain = quota_sample(corpus, ["lang"], k=40, hash_on="text")
        two = quota_sample(corpus, ["lang"], k=40, hash_on="text",
                           n_prefilter_buckets=buckets)
        a = sorted(tuple(r) for r in plain.collect())
        b = sorted(tuple(r) for r in two.collect())
        assert a == b

    def test_two_phase_keeps_null_strata(self, spark):
        """NULL-valued strata are a stratum of their own on BOTH paths
        (window partitionBy groups NULLs; the cutoff join is null-safe)
        — two-phase must not silently drop them."""
        rows = [
            (i, f"text {i}", None if i % 3 == 0 else "en") for i in range(90)
        ]
        df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
        plain = quota_sample(df, ["lang"], k=7, hash_on="text")
        two = quota_sample(df, ["lang"], k=7, hash_on="text",
                           n_prefilter_buckets=16)
        a = sorted(tuple(r) for r in plain.collect())
        b = sorted(tuple(r) for r in two.collect())
        assert a == b
        assert sum(1 for r in a if r[2] is None) == 7  # NULL stratum kept

        # all-NULL stratum column: createDataFrame inference edge
        all_null = df.withColumn("lang", F.lit(None).cast("string"))
        out = quota_sample(all_null, ["lang"], k=5, hash_on="text",
                           n_prefilter_buckets=8)
        assert out.count() == 5

    def test_sample_is_prefix_stable(self, corpus):
        """k=10 sample must be a subset of the k=20 sample (hash-order
        ranks don't reshuffle as the quota grows)."""
        s10 = {r["doc_id"] for r in
               quota_sample(corpus, ["lang"], 10, "text").select("doc_id").collect()}
        s20 = {r["doc_id"] for r in
               quota_sample(corpus, ["lang"], 20, "text").select("doc_id").collect()}
        assert s10 <= s20


class TestPackSequences:
    def test_packing_invariants(self, corpus):
        out = pack_sequences(
            corpus, "doc_id",
            F.length("text").cast("int"), budget=200, n_shards=4,
        ).collect()
        by_shard: dict[int, list] = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r)
        assert set(by_shard) <= set(range(4))
        for shard, rows in by_shard.items():
            rows.sort(key=lambda r: r["doc_id"])
            cum = 0
            for r in rows:
                # next-fit: the pack a doc opens in is determined by the
                # running total BEFORE the doc
                assert r["pack_id"] == cum // 200
                cum += r["n_tokens"]
            # pack ids are non-decreasing and start at 0
            ids = [r["pack_id"] for r in rows]
            assert ids[0] == 0 and ids == sorted(ids)

    def test_assignment_independent_of_input_partitioning(self, corpus):
        a = pack_sequences(corpus, "doc_id", F.length("text").cast("int"),
                           budget=300, n_shards=8)
        b = pack_sequences(corpus.repartition(13), "doc_id",
                           F.length("text").cast("int"), budget=300, n_shards=8)
        ka = sorted((r["doc_id"], r["shard"], r["pack_id"]) for r in a.collect())
        kb = sorted((r["doc_id"], r["shard"], r["pack_id"]) for r in b.collect())
        assert ka == kb


class TestMixtureSample:
    def test_apportion_sums_and_largest_remainder(self):
        from etl_spark.operators.sampling import apportion

        w = {"en": 0.5, "zh": 0.2, "es": 0.15, "de": 0.1, "fr": 0.05}
        assert apportion(w, 397) == {
            "en": 198, "zh": 79, "es": 60, "de": 40, "fr": 20,
        }
        for total in (0, 1, 7, 100, 9973):
            q = apportion(w, total)
            assert sum(q.values()) == total
            assert all(v >= 0 for v in q.values())
        # unnormalized weights apportion identically
        assert apportion({"a": 2, "b": 1}, 10) == {"a": 7, "b": 3}
        with pytest.raises(ValueError):
            apportion({}, 10)
        with pytest.raises(ValueError):
            apportion({"a": 0.0}, 10)

    def test_quotas_and_domain_exclusion(self, corpus):
        from etl_spark.operators.sampling import mixture_sample

        out = mixture_sample(
            corpus, "lang", {"en": 0.6, "de": 0.4}, total=100, hash_on="text"
        )
        counts = {r["lang"]: r["n"] for r in
                  out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert counts == {"en": 60, "de": 40}  # fr excluded entirely

    def test_shortfall_yields_available_no_redistribution(self, spark):
        from etl_spark.operators.sampling import mixture_sample

        df = spark.createDataFrame(
            [(i, f"t{i}", "big" if i < 90 else "small") for i in range(100)],
            ["doc_id", "text", "lang"],
        )
        out = mixture_sample(
            df, "lang", {"big": 0.5, "small": 0.5}, total=60, hash_on="text"
        )
        counts = {r["lang"]: r["n"] for r in
                  out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        # small has 10 < its 30-quota: yields 10, big stays at 30
        assert counts == {"big": 30, "small": 10}

    @pytest.mark.parametrize("buckets", [1, 16, 512])
    def test_two_phase_equals_plain_per_stratum_quotas(self, corpus, buckets):
        from etl_spark.operators.sampling import mixture_sample

        w = {"en": 0.45, "de": 0.35, "fr": 0.2}
        plain = mixture_sample(corpus, "lang", w, 150, "text")
        two = mixture_sample(
            corpus, "lang", w, 150, "text", n_prefilter_buckets=buckets
        )
        assert sorted(plain.collect()) == sorted(two.collect())

    def test_growth_stability_per_domain(self, corpus):
        """Adding documents never evicts a sampled doc unless a new doc
        hashes below the domain cutoff — with quotas filled, the sample
        of the original corpus restricted to surviving docs is a subset
        relation on hash order. Weaker, testable form: re-running on a
        superset keeps every original pick whose rank didn't shift."""
        from etl_spark.operators.sampling import mixture_sample

        w = {"en": 0.5, "de": 0.5}
        base = mixture_sample(corpus, "lang", w, 40, "text")
        grown = corpus.unionByName(
            corpus.sparkSession.createDataFrame(
                [(10_000 + i, f"zz new doc {i}", ["en", "de"][i % 2], "web")
                 for i in range(50)],
                corpus.schema,
            )
        )
        regrown = mixture_sample(grown, "lang", w, 40, "text")
        base_ids = {r["doc_id"] for r in base.collect()}
        new_ids = {r["doc_id"] for r in regrown.collect()}
        # every evicted original was displaced by a smaller-hash newcomer:
        # count(evicted) == count(newcomers admitted)
        evicted = base_ids - new_ids
        admitted = {i for i in new_ids if i >= 10_000}
        assert len(evicted) == len(admitted)
