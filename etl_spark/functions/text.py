"""Text column functions: normalization, slug, language-ID, quality,
tokens, fingerprints.

Everything here is a pure Catalyst column expression (JVM-side, whole-stage
codegen, zero Python in the executor hot path) unless explicitly named
``*_pandas`` — those exist to exercise the vectorized Arrow path the north
rule mandates for transform stages, and are verified equal to the
expression versions in tests.

Reference parity: trim transformer
(/root/reference/v2/transfomer/transformers.go:33-42), uppercase transformer
(/root/reference/v2/transfomer/transformers.go:11-20), slug expression fn
(/root/reference/etl.go:21-32).
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Unicode space family the normalizer collapses (NBSP, NNBSP, ideographic,
# zero-width, plus ASCII whitespace).
_WS_CLASS = r"[\s  -​ 　]+"


def normalize_text(col: Column | str) -> Column:
    """Whitespace normalization: collapse runs of (unicode) whitespace to a
    single space and trim. The CDC transform-stage default."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(c, _WS_CLASS, " "))


def slug(col: Column | str) -> Column:
    """Slugify (reference registers `slug` as an expression operator,
    /root/reference/etl.go:21-32): lowercase, non-alnum runs -> '-',
    trim leading/trailing '-'."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(c)), r"[^a-z0-9]+", "-"), r"^-+|-+$", ""
    )


def canonicalize_role(col: Column | str, mapping: dict[str, str] | None = None) -> Column:
    """Map free-form role strings onto the canonical set
    user/assistant/system/tool (dimension-lookup semantics of `lookupIn`,
    /root/reference/mapper/mapper.go:60-120, as a literal-map expression —
    the broadcast degenerates to a constant map, no join at all)."""
    mapping = mapping or {
        "human": "user", "customer": "user", "usr": "user", "user": "user",
        "ai": "assistant", "bot": "assistant", "model": "assistant",
        "assistant": "assistant",
        "sys": "system", "system": "system",
        "function": "tool", "tool": "tool",
    }
    c = F.lower(F.trim(F.col(col) if isinstance(col, str) else col))
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.extend([F.lit(k), F.lit(v)])
    return F.coalesce(F.element_at(F.create_map(*pairs), c), c)


def token_count(col: Column | str) -> Column:
    """BPE-ish token estimate: count word chunks, digits runs, and
    punctuation marks as separate tokens (regexp, JVM-side)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.regexp_extract_all(c, F.lit(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]"), 0)
    return F.coalesce(F.array_size(toks), F.lit(0))


def whitespace_token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+")) - F.when(F.trim(c) == "", 1).otherwise(0)


def quality_score(col: Column | str) -> Column:
    """Heuristic document quality in [0,1]: length band, alpha ratio,
    punctuation ratio, stopword presence. Deterministic, expression-only."""
    c = F.col(col) if isinstance(col, str) else col
    n = F.length(c).cast("double")
    alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", "")).cast("double")
    punct = F.length(F.regexp_replace(c, r"[^.,;:!?]", "")).cast("double")
    stop_hits = F.array_size(
        F.regexp_extract_all(
            F.lower(c), F.lit(r"\b(the|and|of|to|in|is|for|that|with|a)\b"), 0
        )
    ).cast("double")
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha_ratio = F.when(n > 0, alpha / n).otherwise(F.lit(0.0))
    punct_penalty = F.when(n > 0, F.least(punct / n * 5.0, F.lit(1.0))).otherwise(0.0)
    stop_score = F.least(stop_hits / F.lit(8.0), F.lit(1.0))
    raw = (
        0.3 * len_score + 0.35 * alpha_ratio + 0.25 * stop_score
        - 0.1 * punct_penalty
    )
    return F.round(F.greatest(F.least(raw, F.lit(1.0)), F.lit(0.0)), 6)


_LANG_MARKERS: dict[str, str] = {
    # cheap n-gram/function-word heuristic per language
    "en": r"\b(the|and|is|of|to|that|you|with)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|ich)\b",
    "fr": r"\b(le|la|les|et|est|que|pas|vous)\b",
    "es": r"\b(el|la|los|las|es|que|por|una)\b",
}


def lang_id(col: Column | str) -> Column:
    """Heuristic language ID over function-word hit counts; 'und' if no
    marker hits. argmax via array sort on (hits, lang) pairs — pure exprs."""
    c = F.lower(F.col(col) if isinstance(col, str) else col)
    scored = [
        F.struct(
            F.array_size(F.regexp_extract_all(c, F.lit(rx), 0)).alias("hits"),
            F.lit(lang).alias("lang"),
        )
        for lang, rx in sorted(_LANG_MARKERS.items())
    ]
    best = F.array_max(F.array(*scored))
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


# PII redaction patterns, applied IN ORDER (email before phone/number so an
# address's digits are gone before the looser digit patterns see them; IP
# before phone for the same reason). Every pattern is valid in BOTH Java
# regex (Spark) and RE2 (DuckDB) — no lookaround, no backrefs — so the
# redaction is oracle-checkable bit-for-bit.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
    ("phone", r"\+?\d[\d\s().-]{7,}\d", "[PHONE]"),
    ("number", r"\b\d{6,}\b", "[NUM]"),
]


def redact_pii(col: Column | str) -> Column:
    """Scrub common PII shapes (emails, IPv4s, phone-like digit runs, long
    numbers) from a text column — the redaction stage of a training-data
    pipeline. Pure chained ``regexp_replace`` expressions: JVM-side,
    whole-stage codegen, zero Python; patterns restricted to the
    Java-regex ∩ RE2 subset so the DuckDB oracle reproduces the output
    exactly."""
    c = F.col(col) if isinstance(col, str) else col
    for _name, rx, token in PII_PATTERNS:
        c = F.regexp_replace(c, rx, token)
    return c


def ngram_frequencies(
    df: DataFrame, text_col: str = "text", n: int = 3, min_count: int = 5
) -> DataFrame:
    """Corpus-wide n-gram frequency table: (ngram, n_occurrences) for every
    word n-gram occurring at least ``min_count`` times — the standard
    contamination / boilerplate / memorization analysis over a training
    corpus. One explode + hash groupBy: map-side partial aggregation
    collapses repeats before the shuffle, so at 10^10 docs the shuffle
    carries ~|distinct n-grams|, and the ``min_count`` filter keeps the
    result bounded. A threshold (not top-k) keeps the output deterministic
    — no tie-breaking ambiguity against the oracle.

    Explode-then-concat shape: ``posexplode`` runs over the word array
    and each n-gram string is assembled AFTER the explode from
    ``element_at`` lookups (all codegen) — exploding an interpreted
    shingle-array expression directly costs ~4x more (measured 9.3 s vs
    2.2 s at sf0.1; see ``operators.dedup.exploded_shingle_hashes``).
    Short documents (< n words) contribute their whole normalized text
    once, matching ``word_shingles``."""
    norm = F.lower(normalize_text(F.col(text_col)))
    words = F.split(norm, " ")
    staged = df.select(norm.alias("__norm"), words.alias("__w"))
    long = (
        staged.filter(F.size("__w") >= n)
        .select("__w", F.posexplode("__w").alias("__pos", "__x"))
        .filter(F.col("__pos") <= F.size("__w") - n)
        .select(
            F.concat_ws(
                " ",
                *[F.element_at("__w", F.col("__pos") + k + 1) for k in range(n)],
            ).alias("ngram")
        )
    )
    short = staged.filter(F.size("__w") < n).select(F.col("__norm").alias("ngram"))
    return (
        long.unionByName(short)
        .groupBy("ngram")
        .agg(F.count("*").alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )


def unigram_lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    add_k: int = 1,
    totals: tuple[int, int] | None = None,
) -> DataFrame:
    """Per-document mean token log-probability under the corpus's OWN
    unigram distribution with add-k smoothing — the cheap KenLM-style
    perplexity signal used to rank training documents by "fluency"
    (gibberish / boilerplate / wrong-tokenization docs score far below
    prose). Returns (id_col, n_tokens, avg_logprob).

    Plan shape at scale: per-(doc, token) counts FIRST (map-side combine
    collapses repeats, so downstream stages carry distinct doc-token
    pairs, not every token occurrence), per-token corpus counts as a
    WINDOW sum over that single tf pass — a tf-self-join for the vocab
    would make Catalyst evaluate the explode+groupBy subtree twice (an
    inlined subtree re-evaluates per reference). Corpus totals (N total
    tokens, V vocab size) broadcast as a 1-row crossJoin, which costs
    one extra subtree evaluation; pass ``totals=(N, V)`` (from a prior
    profile pass or lake metadata) to skip it and get a SINGLE-SCAN
    plan — the 100-TB shape.

    Determinism vs the DuckDB oracle: ``ln`` differs between the JVM and
    libm by 1 ulp on ~2% of inputs, so each token's log-prob is cast to
    DECIMAL(24,12) BEFORE the weighted sum — decimal aggregation is exact
    and order-independent, making the parallel result bit-equal to the
    sequential one."""
    from pyspark.sql import Window as W

    norm = F.lower(normalize_text(F.col(text_col)))
    toks = df.select(
        F.col(id_col), F.explode(F.split(norm, " ")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy(id_col, "tok").agg(F.count("*").alias("c"))
    enriched = tf.withColumn(
        "n_t", F.sum("c").over(W.partitionBy("tok"))
    )
    if totals is not None:
        enriched = enriched.withColumn(
            "N", F.lit(int(totals[0]))
        ).withColumn("V", F.lit(int(totals[1])))
    else:
        enriched = enriched.crossJoin(
            F.broadcast(
                tf.agg(
                    F.sum("c").alias("N"),
                    F.count_distinct("tok").alias("V"),
                )
            )
        )
    lp = F.log(
        (F.col("n_t") + F.lit(add_k))
        / (F.col("N") + F.lit(add_k) * F.col("V"))
    ).cast("decimal(24,12)")
    return (
        enriched.groupBy(id_col)
        .agg(
            F.sum("c").alias("n_tokens"),
            # c as DECIMAL(12,0): c(bigint) * DECIMAL(24,12) would exceed
            # precision 38 and Spark silently RESCALES the product to ~6
            # decimals; (12,0)x(24,12) stays exact at scale 12
            (
                F.sum(F.col("c").cast("decimal(12,0)") * lp).cast("double")
                / F.sum("c")
            ).alias("avg_logprob"),
        )
    )


def ordered_assembly(
    df: DataFrame,
    key: list[str],
    order_by: list[str],
    line: Column,
    *,
    sep: str = "\n",
    out_col: str = "assembled",
) -> DataFrame:
    """Assemble one deterministic document per key from its rows in
    ``order_by`` order — the transcript-reassembly primitive (turns ->
    conversation) and the direct check of the north-rule invariant
    "per-turn text equality under STABLE turn ordering": a shuffled
    ``collect_list`` alone is arrival-ordered and non-deterministic, so
    the order columns ride inside the collected struct and ``array_sort``
    restores the total order after the shuffle, making the output a pure
    function of the data regardless of partitioning/parallelism.

    One hash aggregation (map-side partial collect), no window. The
    ``transform`` extraction is CodegenFallback (interpreted per element
    — see CLAUDE.md) but does one field access per row, dwarfed by the
    string concat that already ran codegen BEFORE the aggregation. Group
    sizes are conversation-sized; for degenerate million-turn keys, cap
    upstream.
    """
    skey = [F.col(c) for c in order_by]
    packed = F.array_sort(
        F.collect_list(F.struct(*skey, line.alias("__line")))
    )
    return df.groupBy(*key).agg(
        F.array_join(
            F.transform(packed, lambda x: x["__line"]), sep
        ).alias(out_col)
    )


def fingerprint(col: Column | str) -> Column:
    """64-bit document fingerprint of normalized content (rolling-hash
    analogue): xxhash64 over the whitespace-normalized, lowercased text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.xxhash64(F.lower(normalize_text(c)))


# --------------------------------------------------------------------------
# Vectorized Arrow path (the north rule's mandated UDF shape). Used by the
# CDC transform stage over salted key partitions; semantics identical to the
# expression versions above.
# --------------------------------------------------------------------------

def normalize_transcripts_pandas(df: DataFrame, text_col: str = "text",
                                 role_col: str = "role") -> DataFrame:
    """mapInPandas text normalization + role canonicalization: Arrow-batched,
    no per-row Python. Null-safe (delete events carry null payloads)."""
    import re

    import pandas as pd

    ws = re.compile("[\\s  -​ 　]+")
    role_map = {
        "human": "user", "customer": "user", "usr": "user",
        "ai": "assistant", "bot": "assistant", "model": "assistant",
        "sys": "system", "function": "tool",
    }
    schema = df.schema

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            t = b[text_col]
            mask = t.notna()
            b.loc[mask, text_col] = (
                t[mask].str.replace(ws, " ", regex=True).str.strip()
            )
            r = b[role_col]
            rmask = r.notna()
            low = r[rmask].str.strip().str.lower()
            b.loc[rmask, role_col] = low.map(lambda x: role_map.get(x, x))
            yield b

    return df.mapInPandas(fn, schema)


def normalize_transcripts_expr(df: DataFrame, text_col: str = "text",
                               role_col: str = "role") -> DataFrame:
    """Expression-only equivalent of ``normalize_transcripts_pandas`` —
    preferred in production (whole-stage codegen, no Arrow exchange)."""
    return df.withColumn(
        text_col,
        F.when(F.col(text_col).isNotNull(), normalize_text(text_col)),
    ).withColumn(
        role_col,
        F.when(F.col(role_col).isNotNull(), canonicalize_role(role_col)),
    )


def winnow_fingerprints(
    df, id_col: str = "doc_id", text_col: str = "text",
    k: int = 5, window: int = 4, out_col: str = "fingerprint",
):
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): hash every k-gram (rolling word k-grams via the
    staged word-hash combine), then keep each ``window``-span's MINIMUM
    hash — guaranteeing any shared substring of length >= k + window - 1
    contributes at least one shared fingerprint, while storing only
    ~2/(window+1) of the hashes.

    Every trailing window (ending at each position) contributes its
    minimum — NOT just hashes that happen to be the minimum of the window
    ending at their own position, which would silently skip windows whose
    minimum lies earlier and break the guarantee. Ties (same 64-bit hash
    twice in a window) emit the same hash value either way, so no
    positional tie-break is needed. Partial windows at the start of a doc
    also emit; that only adds genuine k-gram hashes (a superset keeps the
    guarantee) and covers docs with fewer than ``window`` k-grams.

    Expression-only: the per-window minimum is a windowed ``min`` over
    (doc, position) — one partition-local sort per doc, no Python.
    Returns (id_col, fingerprint) with one row per distinct selected
    fingerprint per doc."""
    from pyspark.sql import Window as W

    # positions matter for winnowing, so build ORDERED (not distinct)
    # k-gram hashes: hash each word once, combine k consecutive word
    # hashes (same staging trick as dedup.with_shingle_hashes)
    c = F.col(text_col)
    words = F.split(F.lower(normalize_text(c)), " ")
    staged = df.select(id_col, words.alias("__w")).withColumn(
        "__wh", F.transform("__w", lambda w: F.xxhash64(w))
    )
    wh = F.col("__wh")
    ordered = F.when(
        F.size(wh) < k, F.array(F.xxhash64(F.concat_ws(" ", F.col("__w"))))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(wh) - k),
            lambda i: F.xxhash64(*[F.element_at(wh, i + j + 1) for j in range(k)]),
        )
    )
    pos = staged.select(
        id_col, F.posexplode(ordered).alias("__p", "__h")
    )
    win = (
        W.partitionBy(id_col)
        .orderBy("__p")
        .rowsBetween(-(window - 1), W.currentRow)
    )
    return (
        pos.select(id_col, F.min("__h").over(win).alias(out_col))
        .distinct()
    )


def winnow_overlap_pairs(
    df, id_col: str = "doc_id", text_col: str = "text",
    k: int = 5, window: int = 4, min_shared: int = 2,
):
    """Document pairs sharing >= ``min_shared`` winnowing fingerprints —
    MOSS-style overlap detection as an inverted-index join on the
    fingerprint (key-equality shuffle, never all-pairs)."""
    fps = winnow_fingerprints(df, id_col, text_col, k, window)
    a = fps.select(F.col(id_col).alias("id_a"), "fingerprint")
    b = fps.select(F.col(id_col).alias("id_b"), "fingerprint")
    return (
        a.join(b, on="fingerprint")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("shared_fingerprints"))
        .filter(F.col("shared_fingerprints") >= min_shared)
    )


def tfidf_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    min_df: int = 2,
    idf: str = "log",
    n_docs: int | None = None,
) -> DataFrame:
    """Top-``k`` TF-IDF keywords per document — the keyword/topic-tag
    stage of a corpus pipeline. Tokens are lowercase alphanumeric runs;
    tokens appearing in fewer than ``min_df`` documents are dropped
    (hapaxes are noise at corpus scale).

    ``idf`` picks the weighting:
    - ``"log"`` (production): score = tf · (ln((N+1)/(df+1)) + 1), the
      standard smoothed form. Transcendental — NOT bit-portable across
      engines (libm vs JVM ``Math.log`` may differ in the last ulp), so
      oracle comparisons use the rational form instead.
    - ``"rational"``: score = (tf · 1_000_000) div (df + 1) — integer
      arithmetic only, identical in every engine; same ranking intent
      (rarer ⇒ higher), the oracle-gated config.

    ``n_docs`` avoids a full count() action when the caller already
    knows the corpus size (lake tables track total_rows in metadata).

    Scale shape: explode → ONE map-side-combinable (doc, token) groupBy
    → window count over token for df → rank window per doc: one scan,
    one explode, three shuffles. (A tf-self-join for df would make
    Catalyst evaluate the explode+groupBy subtree TWICE — an inlined
    subtree re-evaluates per reference — so df is a window over the
    single tf pass instead.) No Python, no higher-order functions.
    """
    if idf not in ("log", "rational"):
        raise ValueError("idf must be 'log' or 'rational'")
    from pyspark.sql import Window as W

    # N only weights the log form; the rational form never scans for it
    N = 0
    if idf == "log":
        N = int(n_docs) if n_docs is not None else df.count()
    toks = df.select(
        id_col,
        F.explode(
            F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+")
        ).alias("token"),
    ).filter(F.col("token") != "")
    tf = toks.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(W.partitionBy("token"))
    ).filter(F.col("df") >= min_df)
    if idf == "log":
        score = F.col("tf") * (
            F.log((F.lit(N) + 1.0) / (F.col("df") + 1.0)) + F.lit(1.0)
        )
    else:
        score = F.expr("(tf * 1000000) div (df + 1)")
    scored = scored.withColumn("score", score)
    w = W.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select(id_col, "token", "tf", "df", "score", "rnk")
    )
