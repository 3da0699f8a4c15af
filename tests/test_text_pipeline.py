"""Tests for the corpus-preparation text operators: PII redaction,
corpus n-gram frequency tables, and cross-corpus decontamination.

Semantics run on hand-built frames with planted PII / overlaps; the
decontamination operator is additionally checked for path-equivalence
(broadcast probe vs plain-join fallback must produce identical rows).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_spark.functions.text import ngram_frequencies, redact_pii
from etl_spark.operators.dedup import cross_corpus_overlap


def _redact_one(spark, text: str) -> str:
    df = spark.createDataFrame([(text,)], ["t"])
    return df.select(redact_pii("t").alias("r")).first()["r"]


class TestRedactPii:
    def test_email(self, spark):
        assert (
            _redact_one(spark, "mail me at jo.doe+x@sub.example.co today")
            == "mail me at [EMAIL] today"
        )

    def test_ipv4(self, spark):
        assert _redact_one(spark, "host 192.168.1.254 down") == "host [IP] down"

    def test_phone_variants(self, spark):
        assert _redact_one(spark, "call +1 (555) 010-1234 now") == "call [PHONE] now"
        assert _redact_one(spark, "call 555-010-1234 now") == "call [PHONE] now"

    def test_long_number(self, spark):
        # 6-8 digit runs hit [NUM]; >=9 digits are phone-shaped and the
        # earlier phone pattern consumes them first (still redacted)
        assert _redact_one(spark, "acct 1234567 ok") == "acct [NUM] ok"
        assert _redact_one(spark, "acct 1234567890 ok") == "acct [PHONE] ok"

    def test_short_number_untouched(self, spark):
        # 5 digits: too short for [NUM], not phone-shaped either
        assert _redact_one(spark, "year 20261 fine") == "year 20261 fine"

    def test_order_email_wins_over_digits(self, spark):
        # the email pattern must consume the address before the phone/number
        # patterns can chew on its digit runs
        assert (
            _redact_one(spark, "a5551234567@example.com wrote")
            == "[EMAIL] wrote"
        )

    def test_clean_text_is_identity(self, spark):
        s = "no pii here just words and the number 42"
        assert _redact_one(spark, s) == s


class TestNgramFrequencies:
    def test_counts_and_threshold(self, spark):
        docs = spark.createDataFrame(
            [
                (0, "a b c d"),
                (1, "a b c e"),
                (2, "a b c f"),
                (3, "x y z w"),
            ],
            ["doc_id", "text"],
        )
        out = {
            r["ngram"]: r["n_occurrences"]
            for r in ngram_frequencies(docs, "text", n=3, min_count=3).collect()
        }
        # "a b c" appears once per doc in 0,1,2; every other 3-gram is rarer
        assert out == {"a b c": 3}

    def test_short_docs_count_whole_text(self, spark):
        docs = spark.createDataFrame(
            [(i, "tiny doc") for i in range(5)], ["doc_id", "text"]
        )
        out = ngram_frequencies(docs, "text", n=3, min_count=5).collect()
        assert [(r["ngram"], r["n_occurrences"]) for r in out] == [("tiny doc", 5)]


class TestDecontamination:
    @pytest.fixture(scope="class")
    def corpora(self, spark):
        leak = "the capital of france is paris and the capital of spain is madrid"
        corpus = spark.createDataFrame(
            [
                (10, f"some padding words then {leak} and trailing context here"),
                (11, "entirely unrelated document about spark shuffle tuning"),
                (12, "another clean document mentioning broadcast joins only"),
            ],
            ["doc_id", "text"],
        )
        benchmark = spark.createDataFrame(
            [(0, f"question: {leak} ?"), (1, "what is a catalyst rule")],
            ["doc_id", "text"],
        )
        return corpus, benchmark

    def test_flags_contaminated_doc_only(self, corpora):
        corpus, benchmark = corpora
        out = cross_corpus_overlap(
            corpus, benchmark, shingle_words=5, min_shared=3
        ).collect()
        assert [r["doc_id"] for r in out] == [10]
        # 13-word leak -> 9 distinct 5-grams shared
        assert out[0]["shared_shingles"] == 9

    def test_fallback_join_path_equals_broadcast_path(self, corpora):
        corpus, benchmark = corpora
        fast = cross_corpus_overlap(
            corpus, benchmark, shingle_words=5, min_shared=3
        ).collect()
        slow = cross_corpus_overlap(
            corpus, benchmark, shingle_words=5, min_shared=3, broadcast_threshold=0
        ).collect()
        assert sorted(map(tuple, fast)) == sorted(map(tuple, slow))

    def test_min_shared_filters(self, corpora):
        corpus, benchmark = corpora
        out = cross_corpus_overlap(
            corpus, benchmark, shingle_words=5, min_shared=10
        ).collect()
        assert out == []


def test_unigram_lm_score_ranks_fluent_above_gibberish(spark):
    from etl_spark.functions.text import unigram_lm_score

    rows = [(i, "the cat sat on the mat and the dog ran") for i in range(20)]
    rows.append((100, "zxqv jkwp qqzx vvbn mmlk"))  # unique gibberish tokens
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in unigram_lm_score(df).collect()}
    assert out[0].n_tokens == 10
    assert out[100].n_tokens == 5
    # every prose doc outscores the gibberish one under the corpus LM
    assert all(out[i].avg_logprob > out[100].avg_logprob for i in range(20))
    # smoothed probabilities are proper: logprob strictly negative
    assert all(r.avg_logprob < 0 for r in out.values())
    # known corpus totals (N tokens, V vocab) -> single-scan plan, SAME
    # scores bit-for-bit (20*10 + 5 = 205 tokens, 13 distinct)
    with_totals = {
        r.doc_id: r for r in unigram_lm_score(df, totals=(205, 13)).collect()
    }
    assert {k: (v.n_tokens, v.avg_logprob) for k, v in out.items()} == {
        k: (v.n_tokens, v.avg_logprob) for k, v in with_totals.items()
    }


def test_repetition_signals_flags_degenerate_docs(spark):
    from etl_spark.operators.reshape import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "the quick brown fox jumps over lazy dogs"),
            (3, "word"),  # single word: no bigrams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert got[1]["n_words"] == 6
    assert got[1]["dup_word_frac"] == 1 - 1 / 6
    assert got[1]["top_bigram_frac"] == 1.0  # "spam spam" is every bigram
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == 1 / 7
    assert got[3]["n_words"] == 1 and got[3]["top_bigram_frac"] is None


def test_context_window_first_rows_null(spark):
    from etl_spark.operators.reshape import with_context_window

    df = spark.createDataFrame(
        [("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "c"), ("u1", 4, "d"),
         ("u2", 1, "x")],
        "user string, seq int, turn string",
    )
    out = with_context_window(df, ["user"], ["seq"], "turn", n=2, sep=" | ")
    got = {(r["user"], r["seq"]): r["context"] for r in out.collect()}
    assert got[("u1", 1)] is None          # no history -> NULL, never ""
    assert got[("u1", 2)] == "a"
    assert got[("u1", 4)] == "b | c"       # trailing window of 2, in order
    assert got[("u2", 1)] is None          # partitions are independent


class TestOrderedAssembly:
    def test_stable_under_partitioning_and_matches_pandas(self, spark):
        """The assembled document is a pure function of the data: any
        repartitioning yields byte-identical output, equal to a
        sequential pandas reference."""
        import random

        from pyspark.sql import functions as F

        from etl_spark.functions.text import ordered_assembly

        rows = [
            (f"c{c}", t, f"line-{c}-{t}")
            for c in range(10) for t in range(12)
        ]
        random.Random(7).shuffle(rows)
        df = spark.createDataFrame(rows, ["conv", "turn", "text"])

        def run(frame):
            out = ordered_assembly(
                frame, ["conv"], ["turn"], F.col("text"), sep="\n"
            )
            return {r["conv"]: r["assembled"] for r in out.collect()}

        a = run(df.repartition(7, "turn"))   # order-hostile partitioning
        b = run(df.coalesce(1))
        assert a == b
        exp = {
            f"c{c}": "\n".join(f"line-{c}-{t}" for t in range(12))
            for c in range(10)
        }
        assert a == exp


class TestTruncateToBudget:
    def _conv(self, spark):
        # one conversation, turns 1..6 with token costs 5,5,5,5,5,100
        rows = [("c1", i, "w " * 4 + "w") for i in range(1, 6)]
        rows.append(("c1", 6, "x " * 99 + "x"))
        return spark.createDataFrame(rows, ["conv_id", "turn_idx", "text"])

    def test_keeps_longest_suffix_within_budget(self, spark):
        from etl_spark.functions.text import token_count
        from etl_spark.operators.reshape import truncate_to_budget

        df = spark.createDataFrame(
            [("c1", i, "w w w w w") for i in range(1, 7)],
            ["conv_id", "turn_idx", "text"],
        )
        out = truncate_to_budget(
            df, ["conv_id"], ["turn_idx"], token_count("text"), budget=17
        )
        kept = sorted(r["turn_idx"] for r in out.collect())
        assert kept == [4, 5, 6]  # 3 * 5 = 15 <= 17; a 4th turn would hit 20

    def test_oversized_newest_turn_blocks_everything_older(self, spark):
        from etl_spark.functions.text import token_count
        from etl_spark.operators.reshape import truncate_to_budget

        out = truncate_to_budget(
            self._conv(spark), ["conv_id"], ["turn_idx"],
            token_count("text"), budget=20,
        )
        # turn 6 costs 100 > 20: it and everything older is dropped —
        # the suffix contract (never skip the newest to keep older turns)
        assert out.count() == 0

    def test_partitions_independent_and_schema_preserved(self, spark):
        from etl_spark.operators.reshape import truncate_to_budget

        df = spark.createDataFrame(
            [("a", 1, 10), ("a", 2, 10), ("b", 1, 3), ("b", 2, 3), ("b", 3, 3)],
            ["conv_id", "turn_idx", "cost"],
        )
        out = truncate_to_budget(df, ["conv_id"], ["turn_idx"], "cost", budget=9)
        assert out.columns == df.columns
        got = {(r["conv_id"], r["turn_idx"]) for r in out.collect()}
        assert got == {("b", 1), ("b", 2), ("b", 3)}  # a: any one turn is 10 > 9


class TestTurnIntegrity:
    def test_flags_exactly_the_damage_classes(self, spark):
        from etl_spark.operators.profile import turn_integrity

        rows = (
            [("ok", i) for i in range(1, 4)]
            + [("dup", 1), ("dup", 1), ("dup", 2)]
            + [("gap", 1), ("gap", 3)]
            + [("offset", 5), ("offset", 6)]  # contiguous, just not 1-based
        )
        df = spark.createDataFrame(rows, ["conv_id", "turn_idx"])
        rep = {r["conv_id"]: r for r in
               turn_integrity(df, ["conv_id"], "turn_idx").collect()}
        assert rep["ok"]["contiguous"] and not rep["ok"]["has_gaps"]
        assert rep["dup"]["n_dup_idx"] == 1 and not rep["dup"]["contiguous"]
        assert rep["gap"]["has_gaps"] and not rep["gap"]["contiguous"]
        assert rep["offset"]["contiguous"]  # range-contiguity, not 1-based

    def test_null_indexes_surface_as_non_contiguous(self, spark):
        from etl_spark.operators.profile import turn_integrity

        df = spark.createDataFrame(
            [("c", 1), ("c", None), ("c", 2)], ["conv_id", "turn_idx"]
        )
        rep = turn_integrity(df, ["conv_id"], "turn_idx").first()
        assert rep["n_turns"] == 3 and rep["n_distinct_idx"] == 2
        assert rep["n_dup_idx"] == 1  # the NULL counts as a duplicate row
        assert not rep["contiguous"]


class TestTfidfKeywords:
    def _corpus(self, spark):
        rows = [
            (1, "spark shuffle spark partition spark"),   # spark dominates
            (2, "shuffle partition shuffle join"),
            (3, "partition join quantum"),                # quantum is rare
            (4, "the the the shuffle"),
        ]
        return spark.createDataFrame(rows, ["doc_id", "text"])

    def test_log_ranking_prefers_rare_over_common(self, spark):
        from etl_spark.functions.text import tfidf_keywords

        out = tfidf_keywords(
            self._corpus(spark), k=2, min_df=1, idf="log"
        ).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append((r["rnk"], r["token"]))
        # doc 3: quantum (df=1) outranks partition (df=3) and join (df=2)
        assert sorted(by_doc[3])[0][1] == "quantum"
        # doc 1: tf=3 rare-ish 'spark' (df=1) is the top keyword
        assert sorted(by_doc[1])[0][1] == "spark"

    def test_min_df_drops_hapaxes_and_rational_matches_log_order(self, spark):
        from etl_spark.functions.text import tfidf_keywords

        corpus = self._corpus(spark)
        rational = tfidf_keywords(corpus, k=3, min_df=2, idf="rational")
        assert rational.filter("token = 'quantum'").count() == 0  # df=1 dropped
        # same (doc, rank) -> token assignment under both weightings here:
        # both are monotone in tf and antitone in df on this corpus
        log = tfidf_keywords(corpus, k=3, min_df=2, idf="log")
        r = {(x["doc_id"], x["rnk"]): x["token"] for x in rational.collect()}
        l = {(x["doc_id"], x["rnk"]): x["token"] for x in log.collect()}
        assert r == l

    def test_n_docs_param_equals_derived_count(self, spark):
        from etl_spark.functions.text import tfidf_keywords

        corpus = self._corpus(spark)
        a = tfidf_keywords(corpus, k=2, min_df=2, idf="log")
        b = tfidf_keywords(corpus, k=2, min_df=2, idf="log", n_docs=4)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
