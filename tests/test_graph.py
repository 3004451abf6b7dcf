"""Connected-components / dedup-clustering operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_log_streamer_spark.operators import dedup as D
from kinesis_log_streamer_spark.operators import graph as G


@pytest.fixture(scope="module")
def edges(spark):
    # Two components: {1,2,3,4} chained (diameter 3, so propagation
    # needs >1 round) and {10,11}; 99 appears nowhere.
    rows = [(2, 1), (2, 3), (3, 4), (10, 11)]
    return spark.createDataFrame(rows, "src long, dst long")


class TestConnectedComponents:
    def test_transitive_closure(self, spark, edges):
        comp = {
            r.node: r.component
            for r in G.connected_components(edges).collect()
        }
        assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_long_chain_converges(self, spark):
        # A 12-node path: worst case for min-label propagation
        # (diameter 11) — exercises the multi-round loop + checkpoint.
        # driver_threshold=0 forces the distributed path (the default
        # would take the union-find fast path on a graph this small).
        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(11)], "src long, dst long"
        )
        comp = {
            r.node: r.component
            for r in G.connected_components(
                chain, driver_threshold=0
            ).collect()
        }
        assert set(comp) == set(range(12))
        assert set(comp.values()) == {0}

    def test_distributed_path_matches_union_find(self, spark, edges):
        fast = {
            r.node: r.component
            for r in G.connected_components(edges).collect()
        }
        dist = {
            r.node: r.component
            for r in G.connected_components(
                edges, driver_threshold=0
            ).collect()
        }
        assert fast == dist

    def test_non_convergence_raises(self, spark, edges):
        with pytest.raises(RuntimeError, match="converge"):
            G.connected_components(edges, max_iter=1, driver_threshold=0)

    def test_last_cc_stats_trace(self, spark, edges):
        """LAST_CC_STATS (VERDICT r8 #5) records path, arc count, and
        per-iteration changed counts so scalecheck can attribute a
        scaling bend to iteration count vs per-iteration blowup."""
        G.connected_components(edges)
        assert G.LAST_CC_STATS["path"] == "driver_union_find"
        # 4 edges symmetrized = 8 arcs, no dups
        assert G.LAST_CC_STATS["n_arcs"] == 8
        assert G.LAST_CC_STATS["changed_per_iter"] == []

        G.connected_components(edges, driver_threshold=0)
        assert G.LAST_CC_STATS["path"] == "distributed_min_label"
        trace = G.LAST_CC_STATS["changed_per_iter"]
        # diameter-3 chain: >=2 propagation rounds, final round 0
        assert len(trace) >= 2 and trace[-1] == 0
        assert all(a >= 0 for a in trace)


class TestDedupClusters:
    def test_singletons_kept(self, spark, edges):
        ids = spark.createDataFrame(
            [(i,) for i in (1, 2, 3, 4, 10, 11, 99)], "doc_id long"
        )
        pairs = edges.select(
            F.col("src").alias("id_a"), F.col("dst").alias("id_b")
        )
        out = {
            r.doc_id: r.cluster_id
            for r in G.dedup_clusters(pairs, ids).collect()
        }
        assert out[99] == 99  # never in a pair -> own cluster
        assert out[1] == out[4] == 1
        assert out[10] == out[11] == 10


class TestPortableMinhash:
    BASE = (
        "the quick brown fox jumps over the lazy dog while the cat "
        "watches from the warm windowsill in the afternoon sun"
    )

    def test_finds_near_dup_and_skips_far(self, spark):
        rows = [
            (0, self.BASE),
            (1, self.BASE.replace("afternoon", "evening")),
            (2, "entirely unrelated text about distributed shuffle joins"),
            (3, "xy"),  # < 3 tokens: excluded from pairing
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = {
            (r.id_a, r.id_b)
            for r in D.portable_minhash_pairs(docs, threshold=0.5).collect()
        }
        assert (0, 1) in pairs
        assert all(2 not in p and 3 not in p for p in pairs)


class TestPageRank:
    def _ranks(self, df):
        return {r.node: r.rank for r in df.collect()}

    def test_uniform_ring_is_uniform(self, spark):
        # A pure cycle: symmetry forces rank == 1/N for every node.
        ring = spark.createDataFrame(
            [(i, (i + 1) % 5) for i in range(5)], "src long, dst long"
        )
        ranks = self._ranks(G.pagerank(ring))
        assert all(abs(r - 0.2) < 1e-12 for r in ranks.values())

    def test_star_center_dominates_and_mass_conserved(self, spark):
        # 4 leaves -> center; center -> leaf 1. No dangling nodes.
        # The center<->leaf-1 two-cycle makes convergence oscillatory
        # (amplitude ~ d^k), so run enough iterations to damp it.
        edges = [(i, 0) for i in range(1, 5)] + [(0, 1)]
        df = spark.createDataFrame(edges, "src long, dst long")
        ranks = self._ranks(G.pagerank(df, n_iter=60))
        assert abs(sum(ranks.values()) - 1.0) < 1e-9
        assert ranks[0] == max(ranks.values())

    def test_distributed_path_matches_driver_path(self, spark):
        edges = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0)], "src long, dst long"
        )
        fast = self._ranks(G.pagerank(edges))
        dist = self._ranks(G.pagerank(edges, driver_threshold=0))
        assert set(fast) == set(dist)
        assert all(abs(fast[k] - dist[k]) < 1e-9 for k in fast)

    def test_dangling_mass_redistributed(self, spark):
        # 0 -> 1, 1 has no out-edges: its mass must recirculate, and
        # total mass stays 1.
        df = spark.createDataFrame([(0, 1)], "src long, dst long")
        ranks = self._ranks(G.pagerank(df))
        assert abs(sum(ranks.values()) - 1.0) < 1e-9
        assert ranks[1] > ranks[0]


class TestSsspWeighted:
    def test_matches_hand_dijkstra(self, spark):
        from kinesis_log_streamer_spark.operators.graph import sssp_weighted

        # 0 -5- 1 -1- 2 ; 0 -1- 3 -1- 2  => 2 via 0-3-2 (2), 1 via
        # 0-3-2-1 (3), never the direct w=5 edge
        edges = spark.createDataFrame(
            [(0, 1, 5), (1, 2, 1), (0, 3, 1), (3, 2, 1)],
            "src long, dst long, w long",
        )
        out = {r.node: r.dist for r in sssp_weighted(edges, 0).collect()}
        assert out == {0: 0, 1: 3, 2: 2, 3: 1}

    def test_parallel_arcs_take_min(self, spark):
        from kinesis_log_streamer_spark.operators.graph import sssp_weighted

        edges = spark.createDataFrame(
            [(0, 1, 9), (0, 1, 2)], "src long, dst long, w long"
        )
        out = {r.node: r.dist for r in sssp_weighted(edges, 0).collect()}
        assert out == {0: 0, 1: 2}

    def test_unreached_absent(self, spark):
        from kinesis_log_streamer_spark.operators.graph import sssp_weighted

        edges = spark.createDataFrame(
            [(0, 1, 1), (5, 6, 1)], "src long, dst long, w long"
        )
        out = {r.node: r.dist for r in sssp_weighted(edges, 0).collect()}
        assert set(out) == {0, 1}


class TestLabelPropagation:
    def test_two_cliques_with_bridge(self, spark):
        """Two 4-cliques joined by one bridge edge: after 3 rounds
        each clique converges on its minimum id; the bridge is not
        enough to merge them."""
        from kinesis_log_streamer_spark.operators import graph as G

        c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
        c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
        edges = spark.createDataFrame(
            c1 + c2 + [(3, 10)], "src long, dst long"
        )
        out = {
            r.node: r.label
            for r in G.label_propagation(edges, iterations=3).collect()
        }
        assert all(out[n] == 0 for n in range(4))
        assert all(out[n] == 10 for n in range(10, 14))

    def test_deterministic_tiebreak_smallest_label(self, spark):
        """A node with two equally frequent neighbor labels adopts the
        smaller one."""
        from kinesis_log_streamer_spark.operators import graph as G

        edges = spark.createDataFrame(
            [(5, 1), (5, 2)], "src long, dst long"
        )
        out = {
            r.node: r.label
            for r in G.label_propagation(edges, iterations=1).collect()
        }
        # node 5 sees labels {1, 2} once each -> adopts 1
        assert out[5] == 1
