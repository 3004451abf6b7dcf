"""Text-analysis operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_log_streamer_spark.operators import text as TX


class TestTokenCounters:
    def test_counts_on_known_string(self, spark):
        df = spark.createDataFrame(
            [(0, "Hello, world! This is the test.")], "doc_id long, text string"
        )
        row = TX.quality_features(df).first()
        assert row.n_ws_tokens == 6
        # words: Hello world This is the test (6) + punct , ! . (3)
        assert row.n_bpe_tokens == 9
        assert row.n_chars == 31

    def test_punct_ratio(self, spark):
        df = spark.createDataFrame([(0, "a.b.c")], "doc_id long, text string")
        assert TX.quality_features(df).first().punct_ratio == 0.4


class TestLangId:
    def test_english_text_scores_en(self, spark):
        df = spark.createDataFrame(
            [(0, "the cat and the dog in a house of wonders is it that for")],
            "doc_id long, text string",
        )
        row = TX.langid(df).first()
        assert row.pred_lang == "en"

    def test_spanish_text_scores_es(self, spark):
        df = spark.createDataFrame(
            [(0, "el perro y la casa de que los gatos se van del pueblo en un dia")],
            "doc_id long, text string",
        )
        assert TX.langid(df).first().pred_lang == "es"


class TestFingerprint:
    def test_identical_texts_same_fingerprints(self, spark):
        df = spark.createDataFrame(
            [(0, "same text here"), (1, "same text here"), (2, "other")],
            "doc_id long, text string",
        )
        rows = {r.doc_id: (r.fp_md5, r.fp_roll) for r in TX.fingerprint(df).collect()}
        assert rows[0] == rows[1]
        assert rows[0] != rows[2]

    def test_rolling_hash_order_sensitive(self, spark):
        df = spark.createDataFrame(
            [(0, "a b c"), (1, "c b a")], "doc_id long, text string"
        )
        rows = {r.doc_id: r.fp_roll for r in TX.fingerprint(df).collect()}
        assert rows[0] != rows[1]


class TestNgrams:
    def test_bigrams(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame([("A b c d",)], "text string")
        row = df.select(TX.ngrams_col(F.col("text"), 2).alias("g")).first()
        assert row.g == ["a b", "b c", "c d"]

    def test_trigrams_and_short_doc(self, spark):
        from pyspark.sql import functions as F

        df = spark.createDataFrame([("a b c",), ("a",)], "text string")
        rows = [
            r.g
            for r in df.select(TX.ngrams_col(F.col("text"), 3).alias("g")).collect()
        ]
        assert rows == [["a b c"], []]


class TestTfidf:
    def test_scores_match_formula(self, spark):
        import math

        # 3 docs; "rare" appears in 1, "common" in all 3.
        df = spark.createDataFrame(
            [
                (0, "common rare"),
                (1, "common common"),
                (2, "common"),
            ],
            "doc_id long, text string",
        )
        rows = {
            (r.doc_id, r.term): r for r in TX.tfidf(df).collect()
        }
        idf = lambda d: math.log(4.0 / (d + 1)) + 1.0  # N=3, smoothed
        assert rows[(0, "rare")].df == 1
        assert rows[(0, "rare")].tfidf == pytest.approx(1 * idf(1))
        assert rows[(1, "common")].tf == 2
        assert rows[(1, "common")].tfidf == pytest.approx(2 * idf(3))

    def test_df_counts_docs_not_occurrences(self, spark):
        df = spark.createDataFrame(
            [(0, "x x x"), (1, "x")], "doc_id long, text string"
        )
        r = {(r.doc_id, r.term): r for r in TX.tfidf(df).collect()}
        assert r[(0, "x")].df == 2  # 2 docs, not 4 occurrences


class TestUnigramEntropy:
    def test_known_values(self, spark):
        from kinesis_log_streamer_spark.plans.queries import (
            t16_unigram_entropy,
        )

        # uniform over 4 tokens -> H = 2; constant -> H = 0
        import os
        import tempfile

        base = tempfile.mkdtemp(prefix="klss_t16_")
        df = spark.createDataFrame(
            [
                (0, "a b c d", "en", "s", 7),
                (1, "a a a a", "en", "s", 7),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        df.write.mode("overwrite").parquet(
            os.path.join(base, "documents.parquet")
        )
        rows = {r.doc_id: r for r in t16_unigram_entropy(spark, base).collect()}
        assert rows[0].entropy == pytest.approx(2.0)
        assert rows[1].entropy == pytest.approx(0.0)
        assert rows[0].n_tokens == 4


class TestContainmentPairs:
    def test_subset_doc_fully_contained(self, spark):
        from kinesis_log_streamer_spark.plans.queries import (
            d07_containment_pairs,
        )

        import os
        import tempfile

        base = tempfile.mkdtemp(prefix="klss_d07_")
        # doc 10's tokens are a strict subset of doc 20's; doc 30 disjoint.
        df = spark.createDataFrame(
            [
                (10, "alpha beta", "en", "s", 10),
                (20, "alpha beta gamma delta", "en", "s", 22),
                (30, "omega psi chi", "en", "s", 13),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        df.write.mode("overwrite").parquet(
            os.path.join(base, "documents.parquet")
        )
        got = {
            (r.id_a, r.id_b): r.contain_pm
            for r in d07_containment_pairs(spark, base).collect()
        }
        assert got[(10, 20)] == 1000  # fully contained
        assert (20, 10) not in got  # only 2/4 of doc 20 in doc 10
        assert all(a != 30 and b != 30 for a, b in got)
