"""Compute-parallelism guard for expression-heavy narrow operators.

Spark sizes scan tasks by bytes (``spark.sql.files.maxPartitionBytes``,
128 MiB default), which is right for I/O-bound plans.  But sketch /
similarity operators do orders of magnitude more CPU per byte than a
scan — 32 MinHash permutations per document, a bits×dim projection per
embedding — so a table that fits in one split serializes the whole
operator on one core.  At 100 TB the scan naturally yields thousands
of splits and this helper is a no-op; on a small or badly-compacted
input it buys full cluster parallelism for one narrow round-robin
shuffle of the (id, payload) rows — strictly cheaper than the
quadratic-ish compute it unblocks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_for_compute(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the cluster's core count if its plan
    currently has fewer partitions; no-op (and no shuffle) otherwise.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
