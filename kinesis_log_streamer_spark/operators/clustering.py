"""Distributed spherical k-means (Lloyd iterations over embeddings).

The iterative-ML workload class a training-data engine needs beyond
one-shot queries: repeated {assign → update} rounds over the corpus
with a tiny model state.  The Spark-first shape:

* the MODEL (|C| × dim centroid matrix) lives driver-side and is
  broadcast into each round — it is the small side by construction
  (8 × 64 doubles here; even 64k × 4k would be ~2 GB, the documented
  ceiling for this pattern before switching to `pyspark.ml.KMeans`'s
  block-matrix paths);
* the DATA never leaves executors: assignment is the same
  posexplode → broadcast-matmul → hash-agg pipeline as IVF cell
  assignment (`operators/similarity.ivf_assign`), the centroid update
  is one (cell, pos) hash aggregation, and the objective is one
  scalar agg — per round: two shuffles, no driver data paths;
* every round's scalar objective is recorded, so convergence is an
  assertion the DuckDB oracle can gate (monotone non-increase is the
  Lloyd invariant) without replaying engine-specific fp arithmetic.

Spherical variant: unit-normalized points and centroids, objective
J = Σ (1 − cos(v, c(v))).  The mean-then-renormalize update maximizes
Σ cos within each cluster, so J is non-increasing per full round —
the textbook invariant the trace asserts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kinesis_log_streamer_spark.operators.similarity import (
    _normalized,
    ivf_assign,
)


def spherical_kmeans_trace(
    df: DataFrame,
    n_clusters: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``n_iter`` Lloyd rounds; return the per-round assertion
    trace (iter, n_points, inertia_ok).

    * ``n_points`` — rows assigned that round (every point, every
      round: assignment is total).
    * ``inertia_ok`` — 1 iff the round's objective did not increase
      over the previous round (trivially 1 for round 0).  A relative
      1e-9 slack absorbs fp re-association across partition counts.

    Init is deterministic: the ``n_clusters`` lowest vector ids (no
    seeded sample — the oracle must know nothing about Spark's
    sampling).  Empty clusters keep their previous centroid.
    """
    cn = _normalized(df, id_col, vec_col).localCheckpoint(eager=True)

    init = (
        cn.orderBy("id")
        .limit(n_clusters)
        .select("nvec")
        .collect()
    )
    cents: list[list[float]] = [list(r.nvec) for r in init]

    trace: list[tuple[int, int, int]] = []
    prev_j: float | None = None
    for it in range(n_iter):
        # Checkpoint the (id, cell, score) assignment: it feeds BOTH
        # the objective agg and the centroid update below — without
        # the checkpoint the posexplode-matmul assignment pipeline
        # would execute twice per round.  The materialized state is
        # 2 ints + 1 double per point.  The objective comes straight
        # from the assignment score (score = dot − ||c||²/2, and the
        # half-norms are driver-known), so no second matmul pass.
        assigned = ivf_assign(
            cn, cents, nprobe=1, id_col="id", vec_col="nvec",
            with_score=True,
        ).localCheckpoint(eager=True)
        half_sq = F.array(
            *[
                F.lit(sum(x * x for x in c) / 2.0)
                for c in cents
            ]
        )
        cos = F.col("score") + F.element_at(half_sq, F.col("cell") + 1)
        stats = assigned.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.lit(1.0) - cos).alias("j"),
        ).collect()[0]
        j = float(stats.j)
        ok = 1 if prev_j is None or j <= prev_j * (1.0 + 1e-9) else 0
        trace.append((it, int(stats.n), ok))
        prev_j = j

        # Centroid update: mean per (cell, pos) — one hash agg whose
        # output is |C| × dim rows (bounded by the model size), then a
        # driver-side renormalize.  Runs after the trace row so the
        # recorded objective pairs assignment and THE CENTROIDS THAT
        # PRODUCED IT.
        means = (
            assigned.join(cn, "id")
            .select("cell", F.posexplode("nvec").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r.cell, {})[r.pos] = r.m
        for c in range(len(cents)):
            if c not in by_cell:
                continue  # empty cluster: keep previous centroid
            vec = [by_cell[c][p] for p in range(len(cents[c]))]
            nrm = sum(x * x for x in vec) ** 0.5
            if nrm > 0:
                cents[c] = [x / nrm for x in vec]

    spark = df.sparkSession
    return spark.createDataFrame(
        trace, "iter int, n_points bigint, inertia_ok int"
    ).orderBy("iter")
