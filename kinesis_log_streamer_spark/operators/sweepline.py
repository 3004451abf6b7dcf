"""Sweep-line interval concurrency — "how many sessions were open at
once" — as a TWO-PHASE distributed prefix sum.

The textbook sweep line sorts every +1/−1 boundary globally and runs
one cumulative sum: correct, but a single-partition window — the
classic scale-killer hiding in "just use a running total" answers.
The distributed form used here:

1. bucket boundaries by a coarse time unit (hour) and run the
   cumulative sum WITHIN each bucket — embarrassingly parallel, the
   window partitions by bucket;
2. aggregate each bucket's TOTAL delta (one tiny row per bucket),
   prefix-sum those totals with a window over the bucket table
   (days×24 rows — driver-scale, broadcastable), and
3. add each bucket's carried-in offset to its local running sums.

``cumsum(t) = local_cumsum(t) + Σ deltas of earlier buckets`` exactly,
so the result is identical to the global sort at any partition count.

Boundary tie rule: intervals are half-open ``[start, end)`` — an end
at time t is processed BEFORE a start at the same t (sort key
``(t, delta)`` with −1 < +1), so back-to-back intervals never
double-count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def interval_concurrency(
    df: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    bucket: str = "hour",
) -> DataFrame:
    """Per-``bucket`` PEAK concurrency over half-open intervals.

    Returns ``bucket_ts, peak`` — the maximum number of simultaneously
    open intervals observed at any boundary inside the bucket.  A
    bucket with boundaries inherits its carry-in; buckets with no
    boundaries are absent (their concurrency is constant and visible
    at the neighboring buckets' edges).
    """

    def _b(c: Column) -> Column:
        return F.date_trunc(bucket, c)

    bounds = (
        df.select(
            F.col(start_col).alias("t"), F.lit(1).alias("delta")
        ).unionAll(
            df.select(F.col(end_col).alias("t"), F.lit(-1).alias("delta"))
        )
    ).withColumn("bkt", _b(F.col("t")))

    # Phase 1: parallel within-bucket running sum (ends before starts
    # at equal t).
    w_local = (
        W.partitionBy("bkt")
        .orderBy("t", "delta")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = bounds.withColumn("run_local", F.sum("delta").over(w_local))

    # Phase 2: tiny per-bucket totals, prefix-summed EXCLUSIVE of the
    # current bucket = the concurrency carried into the bucket.
    w_carry = (
        W.orderBy("bkt")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    carry = (
        bounds.groupBy("bkt")
        .agg(F.sum("delta").alias("bucket_delta"))
        .withColumn(
            "carry_in",
            F.coalesce(F.sum("bucket_delta").over(w_carry), F.lit(0)),
        )
        .select("bkt", "carry_in")
    )

    # Phase 3: offset + per-bucket peak.  The carry table is
    # days×24-scale, so the join broadcasts.
    return (
        local.join(F.broadcast(carry), "bkt")
        .withColumn("run", F.col("run_local") + F.col("carry_in"))
        .groupBy(F.col("bkt").alias("bucket_ts"))
        .agg(F.max("run").alias("peak"))
    )
