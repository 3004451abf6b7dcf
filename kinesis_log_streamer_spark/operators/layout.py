"""Data-layout operators: multi-dimensional clustering for scan pruning.

At 100 TB the dominant query cost is the scan, and the dominant scan
saving is skipping files whose min/max column stats exclude the
predicate.  Sorting the write by one column gives that pruning for
the leading column only; interleaving the bits of several columns
into one Morton (z-order) value and range-partitioning the write by
it gives bounded min/max extents in EVERY interleaved dimension —
each output file covers a small hyper-rectangle of the key space.

The z-value is pure bit arithmetic on already-binned dimensions, so
it runs scan-local inside whole-stage codegen — no shuffle beyond
the range partitioning the write needed anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(dims: list[Column], bits: int = 6) -> Column:
    """Interleave ``bits`` low bits of each dimension into a Morton
    z-value.  ``dims`` must be non-negative integral columns already
    binned into ``[0, 2**bits)``; values beyond the range would
    interleave high bits out of order, so bin first (fixed-width
    bins, rank buckets, or dictionary codes).

    Bit i of dimension d lands at position ``i * len(dims) + d`` —
    the standard Morton layout generalized to N dimensions.
    """
    n = len(dims)
    z: Column | None = None
    for d, col in enumerate(dims):
        c = col.cast("long")
        for i in range(bits):
            term = F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * n + d
            )
            z = term if z is None else z + term
    assert z is not None, "zvalue needs at least one dimension"
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    dims: list[Column],
    bits: int = 6,
    n_files: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the z-order of ``dims``:
    ``repartitionByRange`` on the z-value (Spark's distributed sort —
    it samples range bounds, so files get balanced row counts, not
    balanced key ranges) then ``sortWithinPartitions`` so row groups
    inside each file are also z-ordered and parquet page/row-group
    stats stay tight."""
    zed = df.withColumn("__z", zvalue(dims, bits))
    (
        zed.repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
