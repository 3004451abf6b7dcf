"""Dedup-operator tests: exact, MinHash-LSH, SimHash, Jaccard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_log_streamer_spark.operators import dedup as D

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat "
    "watches from the warm windowsill in the afternoon sun"
)
NEAR = BASE.replace("afternoon", "evening")
FAR = (
    "completely different content about database engines and shuffle "
    "partitioning strategies for large scale distributed joins"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(0, BASE), (1, BASE), (2, NEAR), (3, FAR)]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestExactDedup:
    def test_groups_identical_texts(self, spark, docs):
        out = {r.keeper: r.n_copies for r in D.exact_dedup(docs).collect()}
        assert out[0] == 2  # docs 0 and 1 identical, keeper = min id
        assert out[2] == 1 and out[3] == 1


class TestMinHashLSH:
    def test_finds_planted_near_dup(self, spark, docs):
        pairs = {
            (r.id_a, r.id_b): r.jaccard
            for r in D.minhash_dedup_pairs(docs, threshold=0.3).collect()
        }
        assert (0, 1) in pairs and pairs[(0, 1)] == 1.0  # identical
        assert (0, 2) in pairs and 0.5 < pairs[(0, 2)] < 1.0  # near-dup
        assert all(3 not in p for p in pairs)  # FAR never pairs

    def test_jaccard_self_similarity_is_one(self, spark, docs):
        sigs = D.minhash_signatures(docs)
        self_pairs = sigs.select(
            F.col("id").alias("id_a"), F.col("id").alias("id_b")
        )
        out = D.jaccard_verify(self_pairs, sigs, threshold=0.0)
        assert all(r.jaccard == 1.0 for r in out.collect())

    def test_signature_length(self, spark, docs):
        sig = D.minhash_signatures(docs, num_hashes=16).first().sig
        assert len(sig) == 16


class TestSimHash:
    def test_identical_texts_same_hash(self, spark, docs):
        sh = docs.select("doc_id", D.simhash64("text").alias("h")).collect()
        by_id = {r.doc_id: r.h for r in sh}
        assert by_id[0] == by_id[1]

    def test_near_dup_within_hamming(self, spark, docs):
        pairs = {
            (r.id_a, r.id_b): r.hamming
            for r in D.simhash_pairs(docs, max_hamming=16).collect()
        }
        assert pairs.get((0, 1)) == 0
        assert (0, 2) in pairs and pairs[(0, 2)] <= 16


class TestShingles:
    def test_shingle_construction(self, spark):
        df = spark.createDataFrame([("a b c d",)], "text string")
        sh = df.select(
            D.shingles_col(D.tokens_col(F.col("text")), 3).alias("s")
        ).first().s
        assert sh == ["a b c", "b c d"]

    def test_short_text_no_shingles(self, spark):
        df = spark.createDataFrame([("a b",)], "text string")
        sh = df.select(
            D.shingles_col(D.tokens_col(F.col("text")), 3).alias("s")
        ).first().s
        assert sh == []


class TestPortableLshLaneGuard:
    def test_overwide_band_config_rejected(self, spark):
        """dedup.py's lane-width guard (r5): n_bands*rows_per_band
        beyond the 32 md5 hex chars would make every lane substring
        empty and the candidate join O(n^2) — pin the refusal AND its
        message so the guard can't silently regress."""
        import pytest as _pytest

        from kinesis_log_streamer_spark.operators import dedup as D

        df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
        with _pytest.raises(ValueError, match=r"exceeds.*32 hex chars"):
            D.portable_minhash_pairs(
                df, n_bands=8, rows_per_band=5
            )

    def test_widest_legal_config_accepted(self, spark):
        from kinesis_log_streamer_spark.operators import dedup as D

        df = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d e f")],
            "doc_id long, text string",
        )
        # 8 * 4 = 32 -> lane width 1: legal boundary
        out = D.portable_minhash_pairs(df, n_bands=8, rows_per_band=4)
        assert {(r.id_a, r.id_b) for r in out.collect()} == {(1, 2)}
