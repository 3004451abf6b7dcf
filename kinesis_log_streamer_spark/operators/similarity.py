"""Similarity search over embedding columns (``array<float>``).

Two paths, same API shape:

* **Brute-force cosine top-k** — correctness baseline. Query vectors
  broadcast to every partition; cosine computed JVM-side
  (functions/vector.py); per-query top-k via ranked window. Shuffle is
  |corpus| × |queries| *rows of (id, score)* — narrow — and only on the
  query key. Exact, oracle-checked.
* **Random-hyperplane LSH** — the scale path. Each vector gets an
  H-bit signature (sign of projection onto seeded hyperplanes), split
  into bands; candidates come from band-bucket equi-joins, then exact
  cosine re-ranks the (much smaller) candidate set. At 100 TB the
  bucket join replaces the corpus×queries product with
  O(collisions) — the standard ANN trade (recall tunable via
  bits/bands).

Hyperplanes are generated driver-side from a fixed seed (numpy) and
injected as literal arrays — deterministic across runs and executors.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from kinesis_log_streamer_spark.functions.vector import cosine_sim


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Returns (qid, vec_id, cos4, rnk). Ranking uses round(cos, 6) with
    the neighbor id as tiebreaker so ordering is engine-stable.
    """
    # Compute in float64: the source column is array<float> and mixed
    # float32/float64 accumulation is not oracle-reproducible.
    q = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).cast("array<double>").alias("q_vec"),
    )
    cos = cosine_sim(F.col(vec_col).cast("array<double>"), F.col("q_vec"))
    scored = (
        corpus.join(F.broadcast(q), F.col(id_col) != F.col("qid"))
        .select(
            "qid",
            id_col,
            F.round(cos, 6).alias("cos6"),
            F.round(cos, 4).alias("cos4"),
        )
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos6"), F.asc(id_col))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", id_col, "cos4", "rnk")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def lsh_signatures(
    df: DataFrame,
    dim: int,
    bits: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane signature: bit i = sign(v · plane_i)."""
    planes = _hyperplanes(dim, bits, seed)
    bit_cols = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        proj = F.aggregate(
            F.zip_with(F.col(vec_col), plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit_cols.append(F.when(proj >= 0, F.lit(1)).otherwise(F.lit(0)).alias(f"b{i}"))
    return df.select(F.col(id_col), F.col(vec_col), F.array(*bit_cols).alias("sig_bits"))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 16,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via banded hyperplane-LSH + exact re-rank.

    Candidates = vectors sharing ≥1 band bucket with the query; exact
    cosine then ranks candidates. Recall < 1 by design; the driver
    check is rows-only and tests assert recall ≥ 0.6 vs brute force.
    """
    rows_per_band = bits // bands

    def banded(df: DataFrame, name: str) -> DataFrame:
        sigs = lsh_signatures(df, dim, bits, seed, id_col, vec_col)
        return sigs.select(
            F.col(id_col).alias(f"{name}_id"),
            F.col(vec_col).alias(f"{name}_vec"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band_id"),
                            F.concat_ws(
                                "",
                                *[
                                    F.col("sig_bits")[b * rows_per_band + r]
                                    for r in range(rows_per_band)
                                ],
                            ).alias("band_key"),
                        )
                        for b in range(bands)
                    ]
                )
            ).alias("bk"),
        ).select(f"{name}_id", f"{name}_vec", "bk.band_id", "bk.band_key")

    cb = banded(corpus, "c")
    qb = banded(queries, "q")
    cand = (
        cb.join(
            F.broadcast(qb),
            (cb.band_id == qb.band_id)
            & (cb.band_key == qb.band_key)
            & (cb.c_id != qb.q_id),
        )
        .select(F.col("q_id").alias("qid"), F.col("c_id"), "c_vec", "q_vec")
        .dropDuplicates(["qid", "c_id"])
    )
    cos = cosine_sim(
        F.col("c_vec").cast("array<double>"), F.col("q_vec").cast("array<double>")
    )
    w = W.partitionBy("qid").orderBy(F.desc("cos6"), F.asc(id_col))
    return (
        cand.select(
            "qid",
            F.col("c_id").alias(id_col),
            F.round(cos, 6).alias("cos6"),
            F.round(cos, 4).alias("cos4"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("qid", id_col, "cos4", "rnk")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    dim: int,
    min_cosine: float = 0.95,
    bits: int = 16,
    bands: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH buckets + exact
    verify (the embedding twin of MinHash text dedup)."""
    rows_per_band = bits // bands
    sigs = lsh_signatures(df, dim, bits, seed, id_col, vec_col)
    banded = sigs.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.concat_ws(
                            "",
                            *[
                                F.col("sig_bits")[b * rows_per_band + r]
                                for r in range(rows_per_band)
                            ],
                        ).alias("band_key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "vec", "bk.band_id", "bk.band_key")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.vec").alias("vec_a"),
            F.col("b.vec").alias("vec_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    cos = cosine_sim(
        F.col("vec_a").cast("array<double>"), F.col("vec_b").cast("array<double>")
    )
    return (
        cand.withColumn("cosine", F.round(cos, 4))
        .filter(F.col("cosine") >= min_cosine)
        .select("id_a", "id_b", "cosine")
    )
