"""Spherical k-means trace: Lloyd invariants and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_log_streamer_spark.operators.clustering import (
    spherical_kmeans_trace,
)
from kinesis_log_streamer_spark.sources.tables import load_table


class TestSphericalKmeans:
    def test_trace_shape_and_invariants(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        n = emb.count()
        rows = spherical_kmeans_trace(
            emb, n_clusters=4, n_iter=3
        ).collect()
        assert [r.iter for r in rows] == [0, 1, 2]
        # every point is assigned every round
        assert all(r.n_points == n for r in rows)
        # Lloyd: objective never increases
        assert all(r.inertia_ok == 1 for r in rows)

    def test_deterministic_across_runs(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings")
        a = spherical_kmeans_trace(emb, n_clusters=4, n_iter=2).collect()
        b = spherical_kmeans_trace(emb, n_clusters=4, n_iter=2).collect()
        assert [tuple(r) for r in a] == [tuple(r) for r in b]

    def test_single_cluster_degenerate(self, spark, sf_dir):
        emb = load_table(spark, sf_dir, "embeddings").filter(
            F.col("vec_id") < 50
        )
        rows = spherical_kmeans_trace(
            emb, n_clusters=1, n_iter=2
        ).collect()
        # one cluster: assignment is trivially total, objective flat
        assert all(r.n_points == 50 for r in rows)
        assert all(r.inertia_ok == 1 for r in rows)
