"""Similarity search over embedding columns (array<float>).

Two paths, same contract:

- ``brute_force_topk`` — exact cosine top-k: broadcast the (small) query
  set against the corpus, score with JVM higher-order functions, rank.
  The baseline and the verifier for the approximate paths.
- ``lsh_topk`` — random-hyperplane LSH: sign-bit signatures bucket the
  corpus; queries probe their bucket (plus multi-probe neighbors), exact
  re-rank inside the candidate set. At 10^10 vectors the bucket join is a
  key-equality shuffle and the re-rank touches ~corpus/2^bits per probe.
- ``ivf_topk`` — inverted-file variant: corpus assigned to nearest of K
  centroids (broadcast), queries probe ``n_probe`` nearest lists, exact
  re-rank inside the probed lists.

Everything is expression-only; scoring runs in whole-stage codegen.
Embedding near-duplicate detection (``embedding_neardup_pairs``) reuses the
same machinery with a threshold instead of top-k.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_spark.functions.vectors import cosine_similarity, dot, normalize_vec
from etl_spark.operators.dedup import _perm_constants


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query row.

    Output: (query_id, vec_id, cos_sim, rank). Queries are broadcast — the
    corpus scan is one pass, no shuffle until the final per-query top-k
    (which AQE keeps tiny). Self-matches (same id) are excluded when both
    sides share the id column."""
    qid = query_id_col or id_col
    q = queries.select(
        F.col(qid).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    c = corpus.select(F.col(id_col).alias(id_col), F.col(vec_col).alias("_cv"))
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col(id_col)
    )
    scored = scored.select(
        "query_id",
        id_col,
        cosine_similarity("_qv", "_cv").alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signature(
    vec_col: Column | str, dim: int, bits: int = 16, seed: int = 7
) -> Column:
    """Random-hyperplane sign signature packed into a bigint. Hyperplane
    coefficients come from a deterministic splitmix64 stream (same planes on
    every executor / cluster size — no shipped state)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    consts = _perm_constants(bits * dim, seed)
    sig = F.lit(0).cast("long")
    for b in range(bits):
        # plane_b . v  via zip_with against a literal coefficient array
        coeffs = F.array(
            *[
                F.lit((consts[b * dim + j][0] % 2001) - 1000).cast("double")
                for j in range(dim)
            ]
        )
        proj = F.aggregate(
            F.zip_with(v, coeffs, lambda x, c: x.cast("double") * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(
            F.when(proj > 0, F.shiftleft(F.lit(1).cast("long"), b)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    bits: int = 12,
    n_tables: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k: ``n_tables`` independent hyperplane tables; a
    query's candidates are the union of its buckets; exact cosine re-rank.
    Output schema matches ``brute_force_topk`` (+ recall depends on
    bits/tables)."""
    def with_sigs(df: DataFrame, name: str) -> DataFrame:
        out = df.select(
            F.col(id_col).alias(name), F.col(vec_col).alias(f"_{name}_v")
        )
        sigs = F.array(
            *[
                hyperplane_signature(f"_{name}_v", dim, bits, seed + 101 * t)
                for t in range(n_tables)
            ]
        )
        return (
            out.withColumn("_sigs", sigs)
            .select(name, f"_{name}_v", F.posexplode("_sigs").alias("table", "sig"))
        )

    cb = with_sigs(corpus, "cand_id")
    qb = with_sigs(queries, "query_id")
    cands = (
        qb.join(cb, on=["table", "sig"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "_query_id_v", "cand_id", "_cand_id_v")
        .dropDuplicates(["query_id", "cand_id"])
    )
    scored = cands.select(
        "query_id",
        F.col("cand_id").alias(id_col),
        cosine_similarity("_query_id_v", "_cand_id_v").alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """IVF approximate top-k. Centroids are sampled deterministically from
    the corpus (every n-th row by id order — kmeans would converge better
    but adds an iterative dependency; the probe/re-rank plumbing is
    identical). Corpus rows join their nearest list; queries probe the
    ``n_probe`` nearest lists and re-rank exactly within them."""
    cents = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv"))
        .orderBy("cid")
        .limit(n_lists)
        .withColumn("list_id", F.row_number().over(Window.orderBy("cid")) - 1)
        .select("list_id", F.col("cv").alias("centroid"))
    )
    cent_rows = cents.collect()
    cent_arr = F.array(
        *[
            F.struct(
                F.lit(r["list_id"]).alias("list_id"),
                F.array(*[F.lit(float(x)) for x in r["centroid"]]).alias("centroid"),
            )
            for r in cent_rows
        ]
    )

    def nearest_lists(df: DataFrame, name: str, n: int) -> DataFrame:
        scored = F.transform(
            cent_arr,
            lambda c: F.struct(
                cosine_similarity(F.col(vec_col), c["centroid"]).alias("sim"),
                c["list_id"].alias("list_id"),
            ),
        )
        top = F.slice(F.reverse(F.array_sort(scored)), 1, n)
        return df.select(
            F.col(id_col).alias(name),
            F.col(vec_col).alias(f"_{name}_v"),
            F.explode(F.transform(top, lambda s: s["list_id"])).alias("list_id"),
        )

    cl = nearest_lists(corpus, "cand_id", 1)
    ql = nearest_lists(queries, "query_id", n_probe)
    scored = (
        ql.join(cl, on="list_id")
        .filter(F.col("query_id") != F.col("cand_id"))
        .dropDuplicates(["query_id", "cand_id"])
        .select(
            "query_id",
            F.col("cand_id").alias(id_col),
            cosine_similarity("_query_id_v", "_cand_id_v").alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def embedding_neardup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    blocked: bool = False,
    dim: int = 64,
    bits: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Near-duplicate pairs by cosine >= threshold (id_a < id_b).

    ``blocked=False``: exact — self-join scored pairwise (quadratic; the
    verification/baseline path). ``blocked=True``: hyperplane-bucket join
    first (high-cosine pairs almost always share all sign bits), then exact
    scoring inside buckets — the 10^10-scale path."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    if blocked:
        a = a.withColumn("_sig", hyperplane_signature("_va", dim, bits, seed))
        b = b.withColumn("_sig", hyperplane_signature("_vb", dim, bits, seed))
        pairs = a.join(b, on="_sig").drop("_sig")
    else:
        pairs = a.crossJoin(b)
    return (
        pairs.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine_similarity("_va", "_vb"))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
