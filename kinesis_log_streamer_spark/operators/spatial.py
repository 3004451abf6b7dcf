"""Spatial operators: grid-blocked neighbor (radius) self-join.

The reference engine has no spatial surface; this is part of the
LLM-pipeline extension layer (near-duplicate detection over point
data, geo joins in log enrichment).  The pattern is the standard
distributed spatial join: bucket points into radius-sized grid
cells, replicate each LEFT point into its 3×3 neighborhood of
cells, equi-join on the cell key, then verify the exact distance
predicate — candidates are bounded by local density, never n².

Scale notes (100 TB):
* the only shuffle is the cell-key equi-join — identical shape to a
  hash join, AQE-coalescible;
* the 9× replication factor applies to one side only and is constant
  (independent of n);
* skew (a dense cell) is handled by the same salting machinery as any
  hot join key (`operators/skew.py`) — cells are integer keys.

Coordinates are INTEGERS (micro-degree / millimeter style fixed
point) so the distance predicate is integer-exact and replayable by
an external engine with no fp-boundary risk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_neighbor_join(
    points: DataFrame,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    radius: int = 10_000,
) -> DataFrame:
    """All pairs (id_a < id_b) within Euclidean ``radius``.

    Returns ``id_a, id_b, dist2`` where ``dist2`` is the exact
    squared distance (bigint).  Candidates come from a 3×3
    neighbor-cell equi-join with cell side == radius, which is
    sufficient: two points within ``radius`` differ by < 1 cell
    index on each axis.
    """
    cell = F.lit(int(radius))
    base = points.select(
        F.col(id_col).alias("_id"),
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
    )
    # Right side: points indexed by their own cell.
    right = base.select(
        F.col("_id").alias("id_b"),
        F.col("_x").alias("xb"),
        F.col("_y").alias("yb"),
        F.floor(F.col("_x") / cell).alias("cx"),
        F.floor(F.col("_y") / cell).alias("cy"),
    )
    # Left side: each point replicated into its 3x3 cell neighborhood.
    offs = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    left = (
        base.withColumn("_dx", F.explode(offs))
        .withColumn("_dy", F.explode(offs))
        .select(
            F.col("_id").alias("id_a"),
            F.col("_x").alias("xa"),
            F.col("_y").alias("ya"),
            (F.floor(F.col("_x") / cell) + F.col("_dx")).alias("cx"),
            (F.floor(F.col("_y") / cell) + F.col("_dy")).alias("cy"),
        )
    )
    dist2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        left.join(right, ["cx", "cy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist2.alias("dist2"))
        .filter(F.col("dist2") <= int(radius) ** 2)
    )
