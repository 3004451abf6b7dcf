"""Skew-aware join utilities.

At 100 TB a handful of hot keys (one chatty host, one viral URL) can
put an entire shuffle partition on one task.  Two remedies, in order:

1. **AQE skew-join** (on by default in ``session.get_spark``):
   ``spark.sql.adaptive.skewJoin.enabled`` splits oversized partitions
   at runtime.  Prefer it — zero code.
2. **Salting** (:func:`salted_join`) for the cases AQE can't fix —
   e.g. a broadcast-ineligible build side whose single key exceeds a
   task, or aggregations (:func:`salted_count`) where one group
   dominates.

Salting trades one shuffle for two balanced ones: the skewed side
adds a random salt in [0, n); the other side explodes each row to all
n salt values; join on (key, salt).  The explosion multiplies the
small side by n — use only when the small side × n ≪ the skewed
partition it removes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted into ``n_salts`` buckets.

    ``skewed`` gets ``salt = pmod(xxhash64(monotonically_increasing_id),
    n)`` (uniform, no RNG nondeterminism across retries is fine here
    because the salt only balances placement, never affects results);
    ``other`` is exploded to every salt value.  The join key becomes
    (key, salt) so each hot key spreads over n tasks.

    Only ``inner`` and ``left`` are equivalence-preserving: in a
    right/full outer join every unmatched row of the exploded ``other``
    side exists once per salt value and would be emitted ``n_salts``
    times null-extended.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(
            f"salted_join supports how='inner'|'left' only, got {how!r}: "
            "outer joins would duplicate unmatched rows of the exploded side"
        )
    salted = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int"),
    )
    exploded = other.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    out = salted.join(exploded, [key, "__salt"], how)
    return out.drop("__salt")


def salted_count(
    df: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Two-phase count for skewed group keys: partial count per
    (key, salt), then final sum per key.  The first shuffle spreads a
    hot key over n partitions; the second moves only n rows per key.
    (For algebraic aggregates Spark's map-side partials usually make
    this unnecessary — it matters when upstream partitioning feeds a
    single reducer, e.g. after a join ON the skewed key.)"""
    salted = df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int"),
    )
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(key).agg(F.sum("__c").alias("n"))


def null_routed_left_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
) -> DataFrame:
    """Left join that routes NULL-key rows AROUND the shuffle.

    Null join keys never match, yet a plain left join still ships
    every null-key row through the hash partitioner — and they all
    land in ONE reducer (null hashes to one bucket), the single most
    common skew pathology in fact tables with optional foreign keys.
    The fix: split the null-key rows off with a scan-local filter,
    join only the non-null rows, and union the null rows back with
    null-extended right columns.  Result is row-identical to the
    plain left join; the shuffle never sees a null key.
    """
    rcols = [c for c in right.columns if c != key]
    nn = left.filter(F.col(key).isNotNull()).join(right, key, "left")
    nulls = left.filter(F.col(key).isNull())
    for c in rcols:
        nulls = nulls.withColumn(
            c, F.lit(None).cast(right.schema[c].dataType)
        )
    return nn.unionByName(nulls.select(nn.columns))
