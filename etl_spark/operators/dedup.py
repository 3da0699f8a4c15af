"""Deduplication operators for large-scale text corpora.

The reference dedups only via destination unique-key errors
(/root/reference/etl.go:205-216); a training-data pipeline needs real
content dedup. Everything here is expression-only (JVM, whole-stage
codegen) — no Python in the executor path — and every pairwise method is
**blocked** (LSH bands / pigeonhole chunks / shingle inverted index) so the
candidate set is a key-equality join, never an O(n^2) cross join: at 10^9
documents the shuffle is on band/chunk keys, and hot buckets are bounded by
the band width.

Methods:
- exact_dedup              hash-groupBy on normalized content
- minhash_signature(+LSH)  shingle -> 64-perm minhash -> banded bucket join
- simhash(+pairs)          64-bit sign fingerprint -> pigeonhole chunk join
- ngram_jaccard_pairs      exact Jaccard via shingle inverted index
- (embedding cosine near-dup lives in operators/similarity.py)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_spark.functions.text import normalize_text


def _materialize_pairs(out: DataFrame, *intermediates: DataFrame) -> DataFrame:
    """Persist + materialize the (small) pair/candidate output, then
    unpersist the O(corpus) intermediates so a long-running ingest loop
    never accumulates dead cached signature/shingle frames in executor
    storage. The returned frame IS the unpersist handle — the caller owns
    ``out.unpersist()`` once done with it (the one-shot driver queries just
    let the session end)."""
    out = out.persist()
    out.count()
    for df in intermediates:
        df.unpersist()
    return out

# Mersenne prime 2^61-1: universal-hash modulus for the minhash permutation
# family h_i(x) = (a_i*x + b_i) mod P. Constants derive from splitmix64 so
# signatures are seed-deterministic across runs/cluster sizes.
_P = (1 << 61) - 1


def _splitmix64(seed: int) -> int:
    z = (seed + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return z ^ (z >> 31)


def _i64(x: int) -> int:
    """Unsigned 64-bit -> signed 64-bit (Java long range)."""
    return x - (1 << 64) if x >= (1 << 63) else x


def _perm_constants(n: int, seed: int) -> list[tuple[int, int]]:
    out = []
    for i in range(n):
        a = _splitmix64(seed * 2_000_003 + 2 * i) % (_P - 1) + 1
        b = _splitmix64(seed * 2_000_003 + 2 * i + 1) % _P
        out.append((a, b))
    return out


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Array of n-word shingles over whitespace-normalized, lowercased text.
    Documents shorter than n words yield their single full-text 'shingle'
    (so they can still be compared)."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.split(F.lower(normalize_text(c)), " ")
    return F.when(F.size(words) < n, F.array(F.concat_ws(" ", words))).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )
    )


def shingle_hashes(text: Column | str, n: int = 3) -> Column:
    """Distinct 64-bit shingle hashes (the minhash input set), built from
    the shingle STRINGS — exact but string-building-heavy; prefer
    ``with_shingle_hashes`` in hot paths."""
    return F.array_distinct(
        F.transform(word_shingles(text, n), lambda s: F.xxhash64(s))
    )


def with_shingle_hashes(
    df: DataFrame, text_col: str, n: int = 3, out_col: str = "__sh"
) -> DataFrame:
    """Append distinct 64-bit shingle hashes WITHOUT materializing shingle
    strings: hash each word once, then combine n consecutive word hashes
    with one xxhash64 per shingle. Spark higher-order functions are
    interpreted (CodegenFallback), so per-element work dominates — this
    does 1 hash + n array lookups per shingle instead of slice +
    concat_ws + string-hash, ~4x less interpreted work. The word-hash
    array is staged as its own column so it is computed once per row, not
    once per shingle."""
    c = F.col(text_col)
    words = F.split(F.lower(normalize_text(c)), " ")
    staged = df.withColumn(
        "__words", words
    ).withColumn("__wh", F.transform(F.col("__words"), lambda w: F.xxhash64(w)))
    wh = F.col("__wh")
    combined = F.transform(
        F.sequence(F.lit(0), F.size(wh) - n),
        lambda i: F.xxhash64(*[F.element_at(wh, i + k + 1) for k in range(n)]),
    )
    short = F.array(F.xxhash64(F.concat_ws(" ", F.col("__words"))))
    return (
        staged.withColumn(
            out_col,
            F.when(F.size(wh) < n, short).otherwise(F.array_distinct(combined)),
        )
        .drop("__words", "__wh")
    )


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: str = "min",
) -> DataFrame:
    """Exact dedup on normalized content: one survivor per distinct
    normalized text (keep = min|max id). A pure hash groupBy — map-side
    partial agg collapses duplicates before the shuffle, so at 10^10 rows
    the shuffle carries ~#distinct texts, not #rows."""
    agg = F.min(id_col) if keep == "min" else F.max(id_col)
    norm = F.lower(normalize_text(text_col))
    return (
        df.groupBy(norm.alias("_norm"))
        .agg(agg.alias(id_col), F.count("*").alias("n_dups"))
        .drop("_norm")
    )


def minhash_signature(
    df: DataFrame,
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_words: int = 3,
    seed: int = 42,
    out_col: str = "minhash",
) -> DataFrame:
    """Append an ``array<bigint>`` minhash signature column.

    sig[i] = min over shingles of xxhash64(salt_i, shingle_hash) — a
    salted-rehash permutation family, computed over the staged word-hash
    shingles (see ``with_shingle_hashes``; the shingle array is a column
    reference so it is built once per row, not once per permutation)."""
    def perm(salt: int):
        return lambda h: F.xxhash64(F.lit(salt), h)

    staged = with_shingle_hashes(df, text_col, shingle_words, "__sh")
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("__sh"), perm(_i64(_splitmix64(seed + i)))))
            for i in range(n_hashes)
        ]
    )
    return staged.withColumn(out_col, sig).drop("__sh")


def minhash_signatures_pandas(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    shingle_words: int = 3,
    seed: int = 42,
    out_col: str = "minhash",
) -> DataFrame:
    """Vectorized minhash signatures: sig[i] = min over shingles of
    splitmix64(shingle_hash ^ salt_i), computed as one numpy pass per
    Arrow batch (wrapping uint64 arithmetic — no interpreted HOF lambdas;
    the expression builder evaluates 64 permutations per shingle
    interpreted, the dominant cost of the LSH pipeline).

    NOTE the hash FAMILY differs from ``minhash_signature`` (numpy cannot
    reproduce JVM xxhash64(salt, h) cheaply; splitmix64 mixing is an
    equally uniform 64-bit family). Signatures are engine-internal —
    recall/containment properties are what tests assert — but a persisted
    index must stick to ONE family (see incremental_dedup)."""
    import numpy as np

    from pyspark.sql import types as T

    staged = with_shingle_hashes(
        df.select(id_col, text_col), text_col, shingle_words, "__sh"
    ).select(id_col, "__sh")
    salts = np.array(
        [_splitmix64(seed * 7_654_321 + i) for i in range(n_hashes)],
        dtype=np.uint64,
    )
    id_field = df.schema[id_col]
    out_schema = T.StructType(
        [id_field, T.StructField(out_col, T.ArrayType(T.LongType()))]
    )
    C30, C27, C31 = np.uint64(30), np.uint64(27), np.uint64(31)
    M1 = np.uint64(0xBF58476D1CE4E5B9)
    M2 = np.uint64(0x94D049BB133111EB)

    def fn(batches):
        import pandas as pd

        for b in batches:
            if len(b) == 0:
                continue
            sigs: list = []
            step = 256  # bound the (n_hashes x shingles) working set
            for i0 in range(0, len(b), step):
                sub = b["__sh"].iloc[i0:i0 + step]
                lens = sub.map(len).to_numpy()
                flat = np.concatenate(sub.to_numpy()).astype(np.int64)
                H = flat.astype(np.uint64)
                z = H[None, :] ^ salts[:, None]          # (n_hashes, total)
                z = (z ^ (z >> C30)) * M1
                z = (z ^ (z >> C27)) * M2
                z = z ^ (z >> C31)
                offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
                mins = np.minimum.reduceat(z, offsets, axis=1)
                sigs.extend(mins[:, j].astype(np.int64) for j in range(mins.shape[1]))
            yield pd.DataFrame({id_col: b[id_col], out_col: sigs})

    par = df.sparkSession.sparkContext.defaultParallelism
    return staged.repartition(par).mapInPandas(fn, out_schema)


def lsh_band_keys(
    sig_col: Column | str, n_bands: int, rows_per_band: int
) -> Column:
    """array<struct<band:int, key:bigint>> — one bucket key per band
    (key = hash of the band's signature slice)."""
    sig = F.col(sig_col) if isinstance(sig_col, str) else sig_col
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(F.slice(sig, b * rows_per_band + 1, rows_per_band)).alias(
                    "key"
                ),
            )
            for b in range(n_bands)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 64,
    n_bands: int = 16,
    shingle_words: int = 3,
    seed: int = 42,
    jaccard_threshold: float | None = None,
    use_pandas: bool = True,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash LSH.

    Pipeline: signature -> explode band keys -> self-join on (band, key)
    -> distinct pairs [-> exact Jaccard verify >= threshold]. The join is
    key-equality on band buckets (shuffle on band keys); estimated Jaccard
    from signature agreement is returned as ``jaccard_est``; if
    ``jaccard_threshold`` is set, pairs are verified with EXACT shingle-set
    Jaccard and filtered. ``use_pandas`` picks the vectorized signature
    builder (default; the expression builder is interpreted-HOF).

    The result is persisted + materialized inside (it is the small pair
    set) and the O(corpus) signature frame is unpersisted before return —
    the caller owns ``result.unpersist()``."""
    rows_per_band = n_hashes // n_bands
    if use_pandas:
        sigs = minhash_signatures_pandas(
            df.select(id_col, text_col), id_col, text_col,
            n_hashes, shingle_words, seed,
        ).select(id_col, "minhash")
    else:
        sigs = minhash_signature(
            df.select(id_col, text_col), text_col, n_hashes, shingle_words, seed
        ).select(id_col, "minhash")
    sigs = sigs.persist()
    buckets = sigs.select(
        id_col,
        "minhash",
        F.explode(lsh_band_keys("minhash", n_bands, rows_per_band)).alias("bk"),
    ).select(id_col, "minhash", "bk.band", "bk.key")

    a = buckets.select(
        F.col(id_col).alias("id_a"), F.col("minhash").alias("sig_a"), "band", "key"
    )
    b = buckets.select(
        F.col(id_col).alias("id_b"), F.col("minhash").alias("sig_b"), "band", "key"
    )
    pairs = (
        a.join(b, on=["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            (
                F.size(
                    F.filter(
                        F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda eq: eq,
                    )
                )
                / F.lit(float(n_hashes))
            ).alias("jaccard_est"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    if jaccard_threshold is not None:
        # Exact verification on the CANDIDATE pairs only: join each side's
        # shingle-hash set and score with array_intersect — candidate
        # count is tiny post-LSH, so this never touches the full
        # inverted-index join that scoring all pairs would need.
        sets_ = with_shingle_hashes(
            df.select(id_col, text_col), text_col, shingle_words, "__sh"
        ).select(id_col, "__sh")
        a_sets = sets_.select(
            F.col(id_col).alias("id_a"), F.col("__sh").alias("_sa")
        )
        b_sets = sets_.select(
            F.col(id_col).alias("id_b"), F.col("__sh").alias("_sb")
        )
        scored = (
            pairs.join(a_sets, on="id_a")
            .join(b_sets, on="id_b")
            .withColumn("_inter", F.size(F.array_intersect("_sa", "_sb")))
            .withColumn(
                "jaccard",
                F.col("_inter")
                / (F.size("_sa") + F.size("_sb") - F.col("_inter")),
            )
            .filter(F.col("jaccard") >= jaccard_threshold)
        )
        return _materialize_pairs(
            scored.select("id_a", "id_b", "jaccard_est", "jaccard"), sigs
        )
    return _materialize_pairs(pairs, sigs)


def simhash(
    text_col: Column | str, bits: int = 64, shingle_words: int = 2
) -> Column:
    """SimHash fingerprint: sign of the per-bit sum of shingle-hash bit
    vectors, packed into one bigint. aggregate+zip_with over the shingle
    array — a single expression tree, no UDF."""
    return simhash_from_hashes(shingle_hashes(text_col, shingle_words), bits)


def simhash_from_hashes(hashes: Column, bits: int = 64) -> Column:
    """SimHash over a precomputed shingle-hash array column (stage the
    array with ``with_shingle_hashes`` so it is built once per row)."""
    def bit_vec(h: Column) -> Column:
        # +1/-1 per bit of the shingle hash (bit positions unrolled at plan
        # time — shift amounts must be literals).
        return F.array(
            *[
                F.when(
                    F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
                ).otherwise(F.lit(-1))
                for i in range(bits)
            ]
        )

    counts = F.aggregate(
        hashes,
        F.array(*[F.lit(0) for _ in range(bits)]),
        lambda acc, h: F.zip_with(acc, bit_vec(h), lambda x, y: x + y),
    )
    # Pack sign bits with ONE reference to `counts` (zip against literal
    # bit-value array) — referencing it per bit would clone the aggregate
    # subtree 64x in the plan.
    bit_values = F.array(*[F.lit(_i64(1 << i)).cast("long") for i in range(bits)])
    return F.aggregate(
        F.zip_with(
            counts,
            bit_values,
            lambda c, p: F.when(c > 0, p).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc.bitwiseOR(v),
    )


def simhash_signatures_pandas(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    shingle_words: int = 2,
    out_col: str = "simhash",
) -> DataFrame:
    """(id, simhash) with the sign-accumulation done in ONE vectorized
    numpy pass per Arrow batch instead of the interpreted
    aggregate/zip_with expression tree (``simhash_from_hashes`` builds
    64 ``when`` branches per shingle — CodegenFallback, ~1000x slower
    than codegen; same bottleneck class the hyperplane signatures had).

    The shingle HASHES still come from the JVM expression stage
    (``with_shingle_hashes``, xxhash64 over word hashes), so the pandas
    fingerprints are bit-identical to the expression version — asserted in
    tests. Per batch: unpack each hash's ``bits`` bits (+1/-1), segment-sum
    per document with np.add.reduceat, pack sign bits."""
    import numpy as np

    from pyspark.sql import types as T

    staged = with_shingle_hashes(
        df.select(id_col, text_col), text_col, shingle_words, "__sh"
    ).select(id_col, "__sh")
    id_field = df.schema[id_col]
    out_schema = T.StructType([id_field, T.StructField(out_col, T.LongType())])
    positions = np.arange(bits, dtype=np.uint64)

    def fn(batches):
        import pandas as pd

        for b in batches:
            if len(b) == 0:
                continue
            lens = b["__sh"].map(len).to_numpy()
            flat = np.concatenate(b["__sh"].to_numpy()).astype(np.int64)
            H = flat.astype(np.uint64)  # wraps mod 2^64: same bit pattern
            offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
            # (total_shingles, bits) of +/-1 in int16 — the uint64
            # intermediate from the shifts is the memory hog, so build it
            # in bounded row chunks
            pm = np.empty((len(H), bits), dtype=np.int16)
            step = 1 << 16
            for i in range(0, len(H), step):
                pm[i:i + step] = (
                    ((H[i:i + step, None] >> positions) & 1) * 2 - 1
                ).astype(np.int16)
            counts = np.add.reduceat(
                pm.astype(np.int32), offsets, axis=0
            )  # (n_docs, bits)
            packed = ((counts > 0).astype(np.uint64) << positions).sum(
                axis=1, dtype=np.uint64
            )
            yield pd.DataFrame(
                {id_col: b[id_col], out_col: packed.astype(np.int64)}
            )

    # one parquet file = one partition would serialize the numpy work
    par = df.sparkSession.sparkContext.defaultParallelism
    return staged.repartition(par).mapInPandas(fn, out_schema)


def simhash_pairs_from_fingerprints(
    fp: DataFrame,
    id_col: str = "doc_id",
    fp_col: str = "simhash",
    bits: int = 64,
    max_hamming: int = 3,
) -> DataFrame:
    """Pigeonhole pair join over precomputed fingerprints: split the
    ``bits``-bit fingerprint into ``max_hamming+1`` chunks (the last
    chunk absorbs any remainder so every bit is covered) — any pair
    within Hamming distance k agrees exactly on >= 1 of the k+1 chunks,
    so the (chunk_idx, chunk_value) equality join has FULL recall for
    the Hamming predicate. Equality join + bit_count filter; never a
    cross join. Exhaustive by construction — what makes the
    ``dedup_simhash_full`` oracle entry bit-exact.

    The result is persisted + materialized inside and the O(corpus)
    fingerprint frame unpersisted before return — caller owns
    ``result.unpersist()``."""
    n_chunks = max_hamming + 1
    chunk_bits = bits // n_chunks
    if chunk_bits < 1:
        raise ValueError(
            f"max_hamming={max_hamming} needs {n_chunks} chunks but the "
            f"fingerprint has only {bits} bits"
        )
    spans = [
        (i * chunk_bits,
         chunk_bits if i < n_chunks - 1 else bits - i * chunk_bits)
        for i in range(n_chunks)
    ]
    fp = fp.persist()
    chunks = fp.select(
        id_col,
        fp_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftrightunsigned(F.col(fp_col), off)
                        .bitwiseAND(F.lit(_i64((1 << width) - 1)))
                        .alias("val"),
                    )
                    for i, (off, width) in enumerate(spans)
                ]
            )
        ).alias("c"),
    ).select(id_col, fp_col, "c.chunk", "c.val")
    a = chunks.select(
        F.col(id_col).alias("id_a"), F.col(fp_col).alias("fp_a"), "chunk", "val"
    )
    b = chunks.select(
        F.col(id_col).alias("id_b"), F.col(fp_col).alias("fp_b"), "chunk", "val"
    )
    out = (
        a.join(b, on=["chunk", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
        .dropDuplicates(["id_a", "id_b"])
    )
    return _materialize_pairs(out, fp)


def md5_shingle_hashes(text: Column | str, n: int = 3) -> Column:
    """Distinct 60-bit shingle hashes built from md5 over the shingle
    STRINGS — hex-for-hex reproducible in any engine with md5 (the
    DuckDB oracle computes the identical values), unlike xxhash64.
    60 bits (15 hex chars) so conv()'s unsigned decimal string always
    fits a signed long under ANSI casts. The slow-but-portable variant:
    production paths use ``with_shingle_hashes`` (xxhash64, no string
    materialization)."""
    return F.array_distinct(
        F.transform(
            word_shingles(text, n),
            lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10)
            .cast("long"),
        )
    )


def simhash_neardup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    shingle_words: int = 2,
    use_pandas: bool = True,
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash_a, simhash_b) <= max_hamming.

    Blocking: the pigeonhole chunk join (``simhash_pairs_from_
    fingerprints``). ``use_pandas`` picks the vectorized signature
    builder (default; the expression builder is interpreted-HOF and
    exists as the equality reference).

    The result is persisted + materialized inside and the O(corpus)
    fingerprint frame unpersisted before return — caller owns
    ``result.unpersist()``."""
    if use_pandas:
        fp = simhash_signatures_pandas(
            df, id_col, text_col, 64, shingle_words, "simhash"
        )
    else:
        fp = with_shingle_hashes(
            df.select(id_col, text_col), text_col, shingle_words, "__sh"
        ).select(id_col, simhash_from_hashes(F.col("__sh"), 64).alias("simhash"))
    return simhash_pairs_from_fingerprints(
        fp, id_col, "simhash", bits=64, max_hamming=max_hamming
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 3,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
    max_doc_frequency: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (id_a < id_b, jaccard >= t).

    Inverted-index join: explode distinct shingles, self-join on the
    shingle, count matches per pair = |A ∩ B|; |A ∪ B| = |A| + |B| - inter.
    The shuffle key is the shingle, so ONE stop-shingle appearing in k docs
    would put a k^2 hot bucket in the self-join — the 100-TB killer.
    Guard: shingles with document frequency > ``max_doc_frequency``
    (default ``max(16, isqrt(n_docs))``) are dropped from the JOIN side
    before pairing; pass ``max_doc_frequency=0`` to disable. Set sizes stay
    exact (computed pre-cap), so only intersection counts running through
    a dropped near-stopword shingle are affected — for true near-dup pairs
    (which share many rare shingles) the error is bounded by
    #hot-shingles/|A ∪ B|. Dropped-shingle counts are logged. NOTE any
    caller comparing against an EXACT external oracle must pass
    ``max_doc_frequency=0`` (the driver's oracle-gated queries do) — the
    default cap trades exactness for the hot-bucket bound. If
    ``candidates`` (id_a, id_b) is given, only those pairs are scored.

    The result is persisted + materialized inside and the O(corpus)
    staged shingle frame unpersisted before return — caller owns
    ``result.unpersist()``."""
    import logging
    import math

    # Inverted index over 64-bit shingle HASHES, not shingle strings: the
    # self-join shuffles ~|docs| x |shingles/doc| rows, so 8-byte bigint
    # keys vs multi-word strings is a direct shuffle-volume/compare win,
    # and set sizes fall out of the array length (no extra groupBy over
    # the exploded rows). Hash collisions would need two distinct shingles
    # colliding within one doc pair's union (~2^-64 per pair) to perturb a
    # count.
    staged = with_shingle_hashes(
        df.select(id_col, text_col), text_col, shingle_words, "__sh"
    ).persist()
    sizes = staged.select(
        F.col(id_col).alias("_id"), F.size("__sh").alias("sz")
    )
    sh = staged.select(
        F.col(id_col).alias("_id"), F.explode("__sh").alias("shingle")
    )
    sh_join = sh
    if max_doc_frequency is None or max_doc_frequency > 0:
        cap = max_doc_frequency
        if cap is None:
            # count the persisted staged frame, not df — one scan total
            cap = max(16, math.isqrt(staged.count()))
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > cap)
        )
        # The hot set is tiny by construction (each member covers > cap
        # docs); collect it and prune with a plan-literal NOT IN — no join,
        # and the collect doubles as the drop-count log. Degenerate corpora
        # with a huge hot set fall back to a broadcast anti-join.
        hot_rows = hot.select("shingle").limit(10_001).collect()
        if hot_rows:
            logging.getLogger(__name__).warning(
                "ngram_jaccard_pairs: dropping %s%d shingles with doc "
                "frequency > %d from the inverted-index join",
                ">" if len(hot_rows) > 10_000 else "", min(len(hot_rows), 10_000),
                cap,
            )
            if len(hot_rows) > 10_000:
                sh_join = sh.join(
                    F.broadcast(hot.select("shingle")), on="shingle", how="left_anti"
                )
            else:
                sh_join = sh.filter(
                    ~F.col("shingle").isin([r["shingle"] for r in hot_rows])
                )
    a = sh_join.select(F.col("_id").alias("id_a"), "shingle")
    b = sh_join.select(F.col("_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    if candidates is not None:
        inter = inter.join(candidates, on=["id_a", "id_b"], how="left_semi")
    out = (
        inter.join(sizes.withColumnRenamed("sz", "sz_a"), inter.id_a == sizes._id)
        .drop("_id")
        .join(sizes.withColumnRenamed("sz", "sz_b"), inter.id_b == sizes._id)
        .drop("_id")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return _materialize_pairs(out, staged)


def _cc_star(
    pairs: DataFrame, id_a: str, id_b: str, max_iter: int
) -> DataFrame:
    """Small-star/large-star alternation (Kiveris et al., "Connected
    Components in MapReduce and Beyond"): converges in O(log n) rounds on
    ANY graph — the upgrade path for adversarial long chains where
    min-label propagation needs diameter rounds. Each round is two
    key-equality groupBy/join passes over the (shrinking) edge set;
    convergence is detected with a (count, 64-bit-hash-sum) checksum of
    the edge set — one tiny aggregate per round, no full set compare.

    Each round references the previous edge set several times, so the
    logical plan would grow exponentially across rounds (the plan string
    alone OOMs the driver after ~8 rounds); every round is therefore
    ``localCheckpoint(eager=True)``-ed — lineage truncated to a cached
    RDD scan — and the previous round's checkpoint RDD is released as
    soon as the next is materialized."""
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    vertices = (
        edges.select(F.col("u").alias("doc_id"))
        .union(edges.select(F.col("v").alias("doc_id")))
        .distinct()
        .persist()
    )

    def large_star(e: DataFrame) -> DataFrame:
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = (
            sym.groupBy("u")
            .agg(F.min("v").alias("mv"))
            .select("u", F.least("mv", "u").alias("m"))
        )
        return (
            sym.join(mins, on="u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def small_star(e: DataFrame) -> DataFrame:
        direc = (
            e.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            .where(F.col("u") != F.col("v"))
            .distinct()
        )
        mins = direc.groupBy("u").agg(F.min("v").alias("mv"))
        return (
            direc.join(mins, on="u")
            .select(F.col("v").alias("u"), F.col("mv").alias("v"))
            .union(mins.select(F.col("u"), F.col("mv").alias("v")))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

    def checksum(e: DataFrame) -> tuple:
        # ANSI mode: bigint SUM overflows, so hash-sum through decimal
        row = e.agg(
            F.count("*").alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    cur = edges
    handles: list = []  # java RDD handles of each round's checkpoint
    prev_sum = checksum(cur)
    for _ in range(max_iter):
        nxt = small_star(large_star(cur)).localCheckpoint(eager=True)
        handles.append(nxt._jdf.queryExecution().analyzed().rdd())
        cur_sum = checksum(nxt)
        cur = nxt
        while len(handles) > 1:  # older rounds are dead once nxt exists
            handles.pop(0).unpersist(True)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        import logging

        logging.getLogger(__name__).warning(
            "connected_components(star): edge set still changing after "
            "max_iter=%d rounds", max_iter,
        )
    # converged edges are (vertex -> component root); roots label themselves
    labels = cur.select(F.col("u").alias("doc_id"), F.col("v").alias("cluster_id"))
    roots = vertices.join(
        labels.select("doc_id"), on="doc_id", how="left_anti"
    ).select("doc_id", F.col("doc_id").alias("cluster_id"))
    out = _materialize_pairs(labels.unionByName(roots), edges, vertices)
    # `out` is persisted + counted (MEMORY_AND_DISK: evicts to disk, never
    # dropped in-app), so the last round's checkpoint can go too
    while handles:
        handles.pop().unpersist(True)
    return out


def exploded_shingle_hashes(
    df: DataFrame, text_col: str, n: int, keep: list[str]
) -> DataFrame:
    """(keep..., shingle) rows — one per word-``n``-gram occurrence, as
    64-bit hashes; documents shorter than ``n`` words contribute one
    whole-text hash (same semantics as ``with_shingle_hashes``, which
    these agree with bit-for-bit).

    This is the EXPLODE-THEN-HASH shape: ``posexplode`` runs over the
    cheap word-hash array and the shingle hash is computed AFTER the
    explode from ``element_at`` lookups — all codegen. Measured on this
    host: ``explode`` directly over the interpreted (CodegenFallback)
    shingle-array projection costs ~30x the array computation itself
    (36.7 s vs 1.2 s at sf0.1), which ``ngram_jaccard_pairs`` works
    around by persisting the arrays first; this shape needs NO persist,
    so streaming aggregations over 10^10 docs don't hold an O(corpus)
    cache."""
    norm = F.lower(normalize_text(F.col(text_col)))
    words = F.split(norm, " ")
    staged = df.select(
        *keep,
        norm.alias("__norm"),
        F.transform(words, lambda w: F.xxhash64(w)).alias("__wh"),
    )
    long = (
        staged.filter(F.size("__wh") >= n)
        .select(*keep, "__wh", F.posexplode("__wh").alias("__pos", "__x"))
        .filter(F.col("__pos") <= F.size("__wh") - n)
        .select(
            *keep,
            F.xxhash64(
                *[F.element_at("__wh", F.col("__pos") + k + 1) for k in range(n)]
            ).alias("shingle"),
        )
    )
    # concat_ws(" ", split(norm, " ")) == norm (whitespace already
    # collapsed), so the short-doc hash matches with_shingle_hashes
    short = staged.filter(F.size("__wh") < n).select(
        *keep, F.xxhash64("__norm").alias("shingle")
    )
    return long.unionByName(short)


def cross_corpus_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 5,
    min_shared: int = 3,
    broadcast_threshold: int = 5_000_000,
) -> DataFrame:
    """Decontamination: corpus documents sharing >= ``min_shared`` distinct
    word ``shingle_words``-grams with ANY benchmark document — the overlap
    check a training run does against its eval suites before training.
    Returns (doc_id, shared_shingles).

    Scale shape: the benchmark side is a SUITE (small by nature — 10^4-10^6
    docs), so its distinct shingle-hash set is size-guarded and broadcast;
    the 10^10-doc corpus then streams through one map-side semi-join-style
    hash probe + a hash groupBy — no corpus shuffle on the join. Over the
    guard, the probe falls back to a plain shingle-key equi-join under
    AQE. Shingles compare as 64-bit hashes (two distinct shingles
    colliding within one doc-benchmark union ~2^-64).

    Both sides use the explode-then-hash shape
    (``exploded_shingle_hashes``) so NO O(corpus) frame is persisted —
    within-doc duplicate shingles are absorbed by the ``countDistinct``
    aggregate (corpus side) and the ``distinct`` (benchmark side)."""
    c = exploded_shingle_hashes(
        corpus.select(F.col(id_col).alias("doc_id"), text_col),
        text_col, shingle_words, ["doc_id"],
    )
    b = (
        exploded_shingle_hashes(
            benchmark.select(text_col), text_col, shingle_words, []
        )
        .select("shingle")
        .distinct()
    )
    if b.limit(broadcast_threshold + 1).count() <= broadcast_threshold:
        b = F.broadcast(b)
    return (
        c.join(b, on="shingle")
        .groupBy("doc_id")
        .agg(F.countDistinct("shingle").alias("shared_shingles"))
        .filter(F.col("shared_shingles") >= min_shared)
    )


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
    algorithm: str = "min_label",
) -> DataFrame:
    """Cluster near-duplicate candidate pairs into components:
    (doc_id, cluster_id = min member id). The step a real dedup pipeline
    runs AFTER pair generation — survivors are then one doc per cluster.

    Min-label propagation over the undirected pair graph: every vertex
    starts labeled with itself; each round every vertex takes the min of
    its own and its neighbors' labels; fixpoint when no label changes
    (checked with one tiny count action per round). Rounds needed = graph
    diameter — near-dup components are cliques-ish (diameter 1-3), so this
    converges in a couple of shuffles even at 10^9 docs. For adversarial
    long-chain graphs pass ``algorithm="star"``: the O(log n)
    small-star/large-star alternation (``_cc_star``) converges in
    ~log2(diameter) rounds regardless of chain length. Labels are carried
    per-vertex, never materializing the transitive closure. The result is
    persisted + materialized and every loop intermediate unpersisted
    before return — caller owns ``result.unpersist()``."""
    if algorithm == "star":
        return _cc_star(pairs, id_a, id_b, max_iter)
    if algorithm != "min_label":
        raise ValueError(f"unknown algorithm {algorithm!r}: min_label | star")
    edges = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .union(pairs.select(F.col(id_b).alias("a"), F.col(id_a).alias("b")))
        .distinct()
        .persist()
    )
    labels = edges.select(F.col("a").alias("v")).distinct().withColumn(
        "label", F.col("v")
    ).persist()
    # every round's labels frame is localCheckpoint-ed: each round's plan
    # references the previous labels twice (propagate + change count), so
    # WITHOUT lineage truncation the logical plan grows exponentially
    # across rounds and the driver OOMs just BUILDING the plan string
    # around round ~10 — same disease _cc_star documents.
    handles: list = []  # java RDD handles of round checkpoints
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges.b == labels.v)
            .groupBy("a")
            .agg(F.min("label").alias("nlabel"))
        )
        new_labels = (
            labels.join(neigh, labels.v == neigh.a, "left")
            .select(
                "v",
                F.least(
                    F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        handles.append(new_labels._jdf.queryExecution().analyzed().rdd())
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.v") == F.col("o.v"))
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        if len(handles) == 1:
            labels.unpersist()  # the initial persisted frame
        else:
            handles.pop(0).unpersist(True)  # previous round's checkpoint
        labels = new_labels
        if changed == 0:
            break
    else:
        import logging

        logging.getLogger(__name__).warning(
            "connected_components: %d labels still changing after max_iter=%d "
            "rounds — graph diameter exceeds the iteration budget; raise "
            "max_iter or switch to small-star/large-star for long chains",
            changed, max_iter,
        )
    out = _materialize_pairs(
        labels.select(F.col("v").alias("doc_id"), F.col("label").alias("cluster_id")),
        edges,
    )
    while handles:
        handles.pop().unpersist(True)
    return out
