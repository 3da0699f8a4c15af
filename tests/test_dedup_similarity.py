"""Tests for the training-data dedup and similarity operators.

Semantics checks run against hand-built frames with known duplicates;
recall checks compare the approximate paths (MinHash LSH, hyperplane LSH,
SimHash) against their exact counterparts."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_neardup_pairs,
    word_shingles,
)
from etl_spark.operators.similarity import (
    brute_force_topk,
    embedding_neardup_pairs,
    ivf_topk,
    lsh_topk,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, base),
        (1, base),                                   # exact dup of 0
        (2, "  THE   quick brown fox jumps over the lazy dog again and again "),
        (3, base.replace("lazy", "sleepy")),         # near dup of 0
        (4, "completely different text about spark shuffles and partitions"),
        (5, "another unrelated document mentioning broadcast joins only"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_collapses_normalized_dups(docs):
    out = exact_dedup(docs).orderBy("doc_id").collect()
    # 0,1,2 normalize to identical text -> one survivor (min id 0, 3 dups)
    by_id = {r["doc_id"]: r["n_dups"] for r in out}
    assert by_id[0] == 3
    assert set(by_id) == {0, 3, 4, 5}


def test_word_shingles_short_doc(spark):
    df = spark.createDataFrame([(1, "one two")], ["doc_id", "text"])
    row = df.select(word_shingles("text", 3).alias("s")).first()
    assert row["s"] == ["one two"]


def test_ngram_jaccard_finds_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert pairs[(0, 2)] == 1.0  # normalization makes them identical
    assert (0, 3) in pairs and pairs[(0, 3)] < 1.0
    assert all(4 not in p and 5 not in p for p in pairs)


def test_ngram_jaccard_stop_shingle_cap_bounds_candidates(spark):
    """Adversarial corpus: every doc shares one 3-gram ('common filler
    phrase'). Uncapped, the inverted index pairs all C(n,2) docs through
    that single hot shingle; the doc-frequency cap drops it and leaves
    ZERO candidate pairs (docs are otherwise disjoint) while true near-dup
    pairs on a normal corpus are unaffected."""
    n = 60
    rows = [
        (i, f"common filler phrase unique{i}a unique{i}b unique{i}c")
        for i in range(n)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    uncapped = ngram_jaccard_pairs(docs, threshold=0.0, max_doc_frequency=0)
    assert uncapped.count() == n * (n - 1) // 2  # quadratic hot bucket
    capped = ngram_jaccard_pairs(docs, threshold=0.0)  # auto cap sqrt(60)<60
    assert capped.count() == 0

    # normal corpus (every shingle in <= 2 docs, under the cap): the auto
    # cap drops nothing -> identical results
    pairs = []
    for i in range(20):
        base = f"alpha{i} beta{i} gamma{i} delta{i} epsilon{i} zeta{i}"
        pairs.append((i, base))
        pairs.append((100 + i, base.replace(f"zeta{i}", "omega")))
    normal = spark.createDataFrame(pairs, ["doc_id", "text"])
    with_cap = set(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(normal, threshold=0.3).collect()
    )
    without = set(
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(normal, threshold=0.3, max_doc_frequency=0).collect()
    )
    assert with_cap == without


def test_minhash_lsh_catches_exact_and_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, n_hashes=64, n_bands=16, jaccard_threshold=0.5
        ).collect()
    }
    assert (0, 1) in pairs and (0, 2) in pairs
    # verified-jaccard filter kills unrelated docs even if banded together
    assert all(4 not in p and 5 not in p for p in pairs)


def test_minhash_recall_vs_exact(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, n_hashes=64, n_bands=16, jaccard_threshold=0.5
        ).collect()
    }
    assert lsh <= exact  # verification step guarantees no false positives
    assert len(lsh) >= 0.9 * len(exact)  # 16 bands of 4 rows: high recall at J>=0.5


def test_simhash_neardup_on_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_neardup_pairs(docs, max_hamming=3).collect()
    }
    assert pairs[(0, 1)] == 0
    assert pairs[(0, 2)] == 0


def test_simhash_pandas_equals_expression(spark):
    """The vectorized numpy signature builder must be bit-identical to the
    expression (aggregate/zip_with) reference on real corpus text."""
    from etl_spark.operators.dedup import (
        simhash_from_hashes,
        simhash_signatures_pandas,
        with_shingle_hashes,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").limit(200)
    expr_fp = with_shingle_hashes(
        docs.select("doc_id", "text"), "text", 2, "__sh"
    ).select("doc_id", simhash_from_hashes(F.col("__sh"), 64).alias("simhash"))
    pd_fp = simhash_signatures_pandas(docs, "doc_id", "text", 64, 2)
    a = {r["doc_id"]: r["simhash"] for r in expr_fp.collect()}
    b = {r["doc_id"]: r["simhash"] for r in pd_fp.collect()}
    assert a == b


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(11)
    base = rng.normal(size=(20, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # id 100+i = tiny perturbation of id i -> guaranteed near-dup
        rows.append((100 + i, [float(x) for x in v + rng.normal(scale=0.01, size=16)]))
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_brute_force_topk_finds_planted_neighbor(vectors):
    q = vectors.filter(F.col("vec_id") == 0)
    top = brute_force_topk(vectors, q, k=1).first()
    assert top["vec_id"] == 100  # the perturbed copy
    assert top["cos_sim"] > 0.99


def test_embedding_neardup_exact_and_blocked(vectors):
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(
            vectors, threshold=0.99, dim=16
        ).collect()
    }
    assert (0, 100) in exact and len(exact) >= 20
    blocked = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(
            vectors, threshold=0.99, blocked=True, dim=16, bits=8
        ).collect()
    }
    assert blocked <= exact
    # at cos >= 0.99 (angle ~8 deg) sign-blocking keeps most true pairs
    assert len(blocked) >= 0.7 * len(exact)


def test_embedding_neardup_blocked_multitable_recall(vectors):
    """Multi-table LSH: even at a LOW threshold (wide angles, where single-
    table sign blocking cannot prune/recall), enough low-bit tables reach
    full recall; P[miss] = (1 - (1-theta/pi)^bits)^n_tables."""
    exact = {
        (r["id_a"], r["id_b"], round(r["cos_sim"], 9))
        for r in embedding_neardup_pairs(vectors, threshold=0.4).collect()
    }
    assert len(exact) >= 20
    blocked = {
        (r["id_a"], r["id_b"], round(r["cos_sim"], 9))
        for r in embedding_neardup_pairs(
            vectors, threshold=0.4, blocked=True, dim=16, bits=2, n_tables=24
        ).collect()
    }
    assert blocked <= exact
    assert len(blocked) >= 0.95 * len(exact)


def test_embedding_neardup_exact_path_string_ids(spark):
    """The exact tiled-GEMM path must handle any orderable id type
    (out_schema advertises id_field.dataType) — string vec_ids regressed
    in round 2 when ids were forced through int64."""
    rows = [
        ("doc-a", [1.0, 0.0, 0.0, 0.0]),
        ("doc-b", [1.0, 0.01, 0.0, 0.0]),
        ("doc-c", [0.0, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(df, threshold=0.99).collect()
    }
    assert got == {("doc-a", "doc-b")}


def test_embedding_neardup_zero_norm_vector_is_guarded(spark):
    """A zero vector must score cos=0 (not null/NaN) on every path."""
    rows = [(0, [0.0] * 8), (1, [1.0] + [0.0] * 7), (2, [1.0] + [0.0] * 7)]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    exact = embedding_neardup_pairs(df, threshold=0.5).collect()
    assert {(r["id_a"], r["id_b"]) for r in exact} == {(1, 2)}
    top = brute_force_topk(df, df.filter(F.col("vec_id") == 0), k=2).collect()
    assert all(r["cos_sim"] == 0.0 for r in top)


def test_lsh_topk_recall(vectors):
    q = vectors.filter(F.col("vec_id") < 5)
    bf = brute_force_topk(vectors, q, k=5).select("query_id", "vec_id")
    ls = lsh_topk(vectors, q, k=5, dim=16, bits=4, n_tables=16).select(
        "query_id", "vec_id"
    )
    recall = bf.intersect(ls).count() / bf.count()
    assert recall >= 0.8


def test_ivf_topk_schema_and_rank(vectors):
    q = vectors.filter(F.col("vec_id") == 0)
    rows = ivf_topk(vectors, q, k=5, n_lists=4, n_probe=4).collect()
    assert len(rows) == 5
    assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]


def test_ivf_recall_at_64_lists(spark):
    """Real-corpus recall: kmeans centroids + probed-list re-rank must
    recover >= 0.8 of the exact top-10 at n_lists=64 (VERDICT round-1
    acceptance for the IVF path)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    bf = brute_force_topk(emb, q, k=10).select("query_id", "vec_id")
    # embeddings are near-uniform (planted pairs sit at cos ~0.4), so
    # exact top-10 neighbors spread across lists: probing 24/64 lists
    # (37% of the corpus) reaches the bar; clustered real corpora need far
    # fewer probes
    ivf = ivf_topk(emb, q, k=10, n_lists=64, n_probe=24).select(
        "query_id", "vec_id"
    )
    recall = bf.intersect(ivf).count() / bf.count()
    assert recall >= 0.8


def test_ivf_centroids_are_closure_shipped_not_plan_literals(spark):
    """The physical plan must not inline the centroid matrix as literals
    (n_lists x dim F.lit nodes made planning itself the bottleneck)."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 2)
    plan = ivf_topk(emb, q, k=5, n_lists=32, n_probe=4)._jdf.queryExecution().toString()
    # a literal-array plan would be megabytes of text; closure-shipped
    # centroids keep it small
    assert len(plan) < 200_000


def test_connected_components_chain_and_islands(spark):
    """Min-label propagation: a 6-node chain (needs several rounds), a
    triangle, and an isolated pair resolve to the right components."""
    from etl_spark.operators.dedup import connected_components

    pairs = [
        (1, 2), (2, 3), (3, 4), (4, 5), (5, 6),   # chain -> cluster 1
        (10, 11), (11, 12), (10, 12),             # triangle -> cluster 10
        (20, 21),                                  # pair -> cluster 20
    ]
    df = spark.createDataFrame(pairs, ["id_a", "id_b"])
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 6: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 20,
    }


def test_connected_components_star_matches_min_label(spark):
    """The small-star/large-star alternation must produce identical
    (doc_id, cluster_id) labels to min-label propagation on randomized
    graphs (mixed cliques, chains, isolated edges)."""
    import random

    from etl_spark.operators.dedup import connected_components

    rng = random.Random(99)
    pairs = set()
    for _ in range(120):
        a, b = rng.randrange(200), rng.randrange(200)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    df = spark.createDataFrame(sorted(pairs), ["id_a", "id_b"])
    ml = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df, algorithm="min_label").collect()
    }
    st = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(df, algorithm="star").collect()
    }
    assert st == ml


def test_connected_components_star_long_chain_converges(spark, caplog):
    """Adversarial 300-node chain with max_iter=25: min-label needs
    diameter (~300) rounds and warns; the star alternation converges in
    O(log n) rounds with the right labels and NO warning."""
    import logging

    from etl_spark.operators.dedup import connected_components

    chain = [(i, i + 1) for i in range(300)]
    df = spark.createDataFrame(chain, ["id_a", "id_b"])
    with caplog.at_level(logging.WARNING, logger="etl_spark.operators.dedup"):
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in connected_components(
                df, max_iter=25, algorithm="star"
            ).collect()
        }
    assert got == {i: 0 for i in range(301)}
    assert not [r for r in caplog.records if "still changing" in r.message]


def test_winnowing_guarantee_and_overlap(spark):
    """Winnowing guarantee: two docs sharing a substring of >= k+window-1
    words MUST share at least one fingerprint; disjoint docs share none;
    the overlap detector surfaces exactly the overlapping pair."""
    from etl_spark.functions.text import winnow_fingerprints, winnow_overlap_pairs

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 words = k+w-1
    rows = [
        (1, f"one two three {shared} four five six"),
        (2, f"{shared} nine ten eleven twelve thirteen"),
        (3, "completely different words nothing in common here at all"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = winnow_fingerprints(docs, k=5, window=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[1] & by_doc[2]            # guarantee: shared fingerprint
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])
    pairs = {
        (r["id_a"], r["id_b"]): r["shared_fingerprints"]
        for r in winnow_overlap_pairs(docs, k=5, window=4, min_shared=1).collect()
    }
    assert set(pairs) == {(1, 2)}


def test_ivf_centroid_reuse_and_footer_count(spark, vectors, tmp_path):
    """Train-once/probe-many: a trained centroid matrix passed back into
    ivf_topk must reproduce the self-training path exactly (same seed,
    same deterministic sample), and the footer-based row count that sizes
    the training sample must equal the true count without a scan."""
    from etl_spark.operators.similarity import ivf_train_centroids
    from etl_spark.sources.files import parquet_row_count

    p = str(tmp_path / "v.parquet")
    vectors.write.parquet(p)
    n = parquet_row_count(p)
    assert n == vectors.count()
    q = vectors.filter(F.col("vec_id") < 3)
    C = ivf_train_centroids(vectors, n_lists=8, n_rows=n)
    reused = ivf_topk(vectors, q, k=5, n_lists=8, centroids=C).collect()
    trained = ivf_topk(vectors, q, k=5, n_lists=8, n_rows=n).collect()
    assert sorted(map(tuple, reused)) == sorted(map(tuple, trained))


def test_dedup_family_leaves_no_cached_rdds(spark):
    """The LSH-family operators persist O(corpus) intermediates internally;
    after materializing the (small, persisted) result and unpersisting the
    returned handle, NO cached RDDs may remain — a long-running ingest
    loop must not accumulate dead signature/shingle caches.

    Uses its OWN corpus (unique texts): Spark's CacheManager dedups
    identical logical plans, so reusing the shared fixture would alias
    caches leaked by earlier tests and make the count assertion lie."""
    from etl_spark.operators.dedup import connected_components

    docs = spark.createDataFrame(
        [
            (0, "unique leak check corpus alpha beta gamma delta epsilon"),
            (1, "unique leak check corpus alpha beta gamma delta zeta"),
            (2, "an entirely different cached rdd accounting document"),
        ],
        ["doc_id", "text"],
    )

    def live() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    before = live()
    for make in (
        lambda: minhash_lsh_pairs(docs, jaccard_threshold=0.5),
        lambda: simhash_neardup_pairs(docs),
        lambda: ngram_jaccard_pairs(docs, threshold=0.5),
    ):
        out = make()
        out.collect()
        out.unpersist(True)
        assert live() == before
    pairs = ngram_jaccard_pairs(docs, threshold=0.5)
    cc = connected_components(pairs)
    cc.collect()
    cc.unpersist(True)
    pairs.unpersist(True)
    assert live() == before


def test_winnowing_guarantee_randomized_sweep(spark):
    """The guarantee must hold for ANY word content, not one lucky
    phrasing: plant the same minimal shared substring (k+window-1 words)
    at varying offsets inside random filler across many doc pairs, and
    require every pair to share >= 1 fingerprint. The round-2 selection
    bug (only keeping hashes that were the min of the window ending at
    their own position) fails this within a few seeds."""
    import random

    from etl_spark.functions.text import winnow_fingerprints

    k, window = 5, 4
    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(200)]
    rows = []
    for i in range(25):
        shared = " ".join(rng.choice(vocab) for _ in range(k + window - 1))
        pre_a = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))
        post_a = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))
        pre_b = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))
        post_b = " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))
        rows.append((2 * i, f"{pre_a} {shared} {post_a}".strip()))
        rows.append((2 * i + 1, f"{pre_b} {shared} {post_b}".strip()))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    fps = winnow_fingerprints(docs, k=k, window=window)
    by_doc: dict[int, set] = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    missing = [
        i for i in range(25) if not (by_doc[2 * i] & by_doc[2 * i + 1])
    ]
    assert missing == []


def test_cluster_embeddings_separates_blobs(spark):
    import numpy as np

    from etl_spark.operators.similarity import (
        cluster_embeddings,
        ivf_train_centroids,
    )

    rng = np.random.default_rng(11)
    dim = 16
    a, b = np.zeros(dim), np.zeros(dim)
    a[0], b[1] = 1.0, 1.0
    rows = []
    for i in range(60):
        base = a if i % 2 == 0 else b
        v = base + rng.normal(0, 0.05, dim)
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r.vec_id: r for r in cluster_embeddings(
        df, n_clusters=2, n_rows=60, sample_target=60
    ).collect()}
    assert len(out) == 60
    blob_a = {out[i].cluster_id for i in range(0, 60, 2)}
    blob_b = {out[i].cluster_id for i in range(1, 60, 2)}
    # each blob lands in exactly one cluster, and they differ
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
    assert all(r.sim > 0.9 for r in out.values())
    # train-once / assign-many: shipping the trained matrix reproduces
    # the assignment without retraining
    C = ivf_train_centroids(
        df, n_lists=2, n_rows=60, sample_target=60
    )
    out2 = {r.vec_id: r.cluster_id for r in cluster_embeddings(
        df, n_clusters=2, centroids=C
    ).collect()}
    assert out2 == {k: v.cluster_id for k, v in out.items()}


class TestProductQuantization:
    def test_lossless_config_equals_brute_force(self, vectors):
        """n_centroids >= corpus size trains one centroid per (sub)vector
        -> zero quantization error -> the ADC scan must reproduce the
        exact top-k, ids ranks and (rounded) scores."""
        from etl_spark.operators.similarity import brute_force_topk, pq_topk

        n = vectors.count()
        q = vectors.filter(F.col("vec_id") < 3)
        pq = pq_topk(
            vectors, q, k=5, m=4, n_centroids=n, sample_target=n,
            kmeans_iters=1, n_rows=n,
        )
        bf = brute_force_topk(vectors, q, k=5)
        a = {
            (r.query_id, r.vec_id, r.rank, round(r.cos_sim, 6))
            for r in pq.collect()
        }
        b = {
            (r.query_id, r.vec_id, r.rank, round(r.cos_sim, 6))
            for r in bf.collect()
        }
        assert a == b

    def test_lossy_recall_and_code_size(self, vectors):
        """Production config: codes are m bytes per vector and recall@5
        stays high on the planted near-dup corpus."""
        from etl_spark.operators.similarity import (
            brute_force_topk,
            pq_encode,
            pq_topk,
            pq_train_codebooks,
        )

        n = vectors.count()
        B = pq_train_codebooks(
            vectors, m=4, n_centroids=16, kmeans_iters=10, n_rows=n
        )
        assert B.shape == (4, 16, 4)
        enc = pq_encode(vectors, B)
        lens = {len(r["pq_code"]) for r in enc.collect()}
        assert lens == {4}  # 4 uint8 codes = 4 bytes per 16-dim vector

        q = vectors.filter(F.col("vec_id") < 5)
        pq = pq_topk(vectors, q, k=5, codebooks=B, codes=enc, n_rows=n)
        bf = brute_force_topk(vectors, q, k=5)
        got = {(r.query_id, r.vec_id) for r in pq.collect()}
        exact = {(r.query_id, r.vec_id) for r in bf.collect()}
        recall = len(got & exact) / len(exact)
        assert recall >= 0.6, recall
        # the planted twin (vec_id+100) must survive quantization as the
        # top neighbor for every query
        top1 = {r.query_id: r.vec_id for r in pq.filter(F.col("rank") == 1).collect()}
        assert all(top1[i] == 100 + i for i in top1)

    def test_uint16_codes_beyond_256_centroids(self, spark):
        """k > 256 switches to uint16 codes; encode+scan stay aligned."""
        import numpy as np

        from etl_spark.operators.similarity import pq_encode, pq_topk

        rng = np.random.default_rng(3)
        rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(300)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        from etl_spark.operators.similarity import (
            brute_force_topk,
            pq_train_codebooks,
        )

        B = pq_train_codebooks(
            df, m=2, n_centroids=300, sample_target=300, kmeans_iters=1,
            n_rows=300,
        )
        enc = pq_encode(df, B)
        assert {len(r["pq_code"]) for r in enc.collect()} == {4}  # 2x uint16
        q = df.filter(F.col("vec_id") < 2)
        a = {
            (r.query_id, r.vec_id, r.rank)
            for r in pq_topk(df, q, k=5, codebooks=B, codes=enc).collect()
        }
        b = {
            (r.query_id, r.vec_id, r.rank)
            for r in brute_force_topk(df, q, k=5).collect()
        }
        assert a == b  # lossless at k = corpus size, even with uint16

    def test_refine_recovers_recall(self, spark):
        """ADC + exact refine (FAISS IndexRefine shape): on hard
        near-random vectors the refine shortlist strictly improves
        recall over the pure ADC scan, reaching 1.0 when the shortlist
        covers the corpus."""
        import numpy as np

        from etl_spark.operators.similarity import (
            brute_force_topk,
            pq_encode,
            pq_topk,
            pq_train_codebooks,
        )

        rng = np.random.default_rng(5)
        rows = [(i, [float(x) for x in rng.normal(size=16)]) for i in range(200)]
        df = spark.createDataFrame(rows, ["vec_id", "embedding"])
        B = pq_train_codebooks(df, m=4, n_centroids=8, kmeans_iters=10, n_rows=200)
        enc = pq_encode(df, B)
        q = df.filter(F.col("vec_id") < 3)
        bf = {(r.query_id, r.vec_id) for r in brute_force_topk(df, q, k=5).collect()}

        def recall(refine):
            got = {
                (r.query_id, r.vec_id)
                for r in pq_topk(
                    df, q, k=5, codebooks=B, codes=enc, refine=refine
                ).collect()
            }
            return len(got & bf) / len(bf)

        r0, r50, rall = recall(0), recall(50), recall(200)
        assert r0 <= r50 <= rall
        assert rall == 1.0  # shortlist covers the corpus -> exact


def test_semantic_dedup_keeps_one_per_cluster_dup_group(spark):
    """SemDeDup composition: within-cluster cosine dups collapse to the
    smallest id; cross-cluster near-dups survive (the documented
    approximation — the quadratic is bounded per cluster)."""
    from etl_spark.operators.similarity import semantic_dedup

    rng = np.random.default_rng(3)
    e0 = np.zeros(8); e0[0] = 1.0
    e1 = np.zeros(8); e1[1] = 1.0
    rows = []
    # dup group in cluster 0: three copies of the same direction
    base = np.abs(rng.normal(size=8)); base[0] += 10.0
    for i in (1, 2, 3):
        rows.append((i, (base * (1.0 + 0.001 * i)).tolist()))
    # singleton in cluster 0, orthogonal-ish
    solo = np.zeros(8); solo[0] = 1.0; solo[7] = 9.0
    rows.append((4, solo.tolist()))
    # boundary pair: high mutual cosine but argmax splits them across
    # clusters 0 and 1 -> BOTH survive
    rows.append((5, np.array([1.0, 0.99, 0, 0, 0, 0, 0, 0]).tolist()))
    rows.append((6, np.array([0.99, 1.0, 0, 0, 0, 0, 0, 0]).tolist()))
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    C = np.eye(2, 8)
    got = {
        (r["vec_id"], r["cluster_id"])
        for r in semantic_dedup(
            emb, n_clusters=2, threshold=0.95, centroids=C
        ).collect()
    }
    assert (1, 0) in got and (2, 0) not in got and (3, 0) not in got
    assert (4, 0) in got
    assert (5, 0) in got and (6, 1) in got

    # trained-centroid path (engine kmeans): still exactly one of the
    # planted dup group; the boundary pair may legitimately land in ONE
    # trained cluster and collapse (5 dominates 6), never vanish
    got2 = {r["vec_id"] for r in semantic_dedup(
        emb, n_clusters=2, threshold=0.95
    ).collect()}
    assert len(got2 & {1, 2, 3}) == 1 and 4 in got2 and 5 in got2

    # oversized cluster raises with guidance
    with pytest.raises(Exception, match="max_cluster_rows"):
        semantic_dedup(
            emb, n_clusters=1, threshold=0.95,
            centroids=np.eye(1, 8), max_cluster_rows=2,
        ).collect()
