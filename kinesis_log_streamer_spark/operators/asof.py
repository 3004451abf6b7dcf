"""As-of join: for each left row, the most recent right row at-or-before
its timestamp, per key.

Spark has no built-in as-of join (SURVEY.md §2.2). Two strategies:

* ``asof_join`` (default): union-trick — tag both sides, union on
  (key, ts), and carry the latest right-side values forward with
  ``last(..., ignorenulls=True)`` over an ordered window.  One shuffle
  on the key, no join explosion; at 100 TB this is the scalable path
  because per-key state is a single running value (Spark's window
  operator streams rows per partition after the sort).
* ``asof_join_ranked``: range-join + ``row_number() == 1`` — simpler,
  but materializes every (left, right-earlier) pair before pruning;
  O(n·m) per key worst case. Kept for small/skewed-key fallback and as
  an oracle cross-check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    tolerance_seconds: float | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Union + last/first(ignorenulls) as-of join.

    ``direction="backward"`` (default): right columns (except
    key/ts) are appended to every left row as of
    ``right_ts <= left_ts``; left rows with no prior right row keep
    nulls.  ``direction="forward"``: the NEXT right row at-or-after
    the left timestamp instead (``right_ts >= left_ts``) — the
    "first quote after the trade" / "next deploy after the alert"
    shape — implemented as the exact mirror: ``first(ignorenulls)``
    over the FOLLOWING frame, left rows sorting before right rows at
    equal timestamps so a simultaneous right row is still visible.
    Output columns: all left columns + right value columns.

    ``direction="nearest"``: whichever of the backward/forward
    candidates is closer in time, ties to BACKWARD (pandas
    ``merge_asof(direction="nearest")``) — computed in the SAME
    single pass (both fills share one sort; Catalyst reuses the
    window exchange).  With duplicate right rows at one (key, ts)
    the two fills would pick different members (max vs min struct),
    so pre-aggregate the right side to unique (key, ts) first — the
    nearest-direction queries do.

    ``tolerance_seconds`` bounds the lookback/lookahead (pandas
    ``merge_asof(tolerance=...)`` semantics): a match farther than
    the tolerance is nulled out, not replaced by another in-range
    row — the nearest right row either qualifies or nothing does.
    The bound is applied AFTER the fill, so it costs one projection,
    no extra shuffle: the matched right timestamp rides inside the
    fill struct and is compared against the left timestamp in the
    final select.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction: {direction!r}")
    forward = direction == "forward"
    nearest = direction == "nearest"
    from pyspark.sql.types import StructField, StructType

    rcols = [c for c in right.columns if c not in (key, right_ts)]
    lcols = left.columns

    # Right value columns travel as ONE struct so the forward fill picks
    # whole rows: filling each column independently with
    # last(col, ignorenulls=True) would stitch together values from
    # DIFFERENT right rows whenever a right row holds nulls in some
    # value columns — not "the most recent right row" semantics.
    # With a tolerance, the matched right timestamp must survive the
    # fill to be compared against the left row's timestamp — it rides
    # as a trailing struct field (trailing so the deterministic
    # tie-break order over the value fields is unchanged).
    need_rts = tolerance_seconds is not None or nearest
    struct_fields = [
        StructField(c, right.schema[c].dataType, True) for c in rcols
    ]
    if need_rts:
        struct_fields.append(
            StructField("__rts", right.schema[right_ts].dataType, True)
        )
    r_struct_type = StructType(struct_fields)
    r_struct_cols = [F.col(c) for c in rcols]
    if need_rts:
        r_struct_cols.append(F.col(right_ts).alias("__rts"))
    # Side ordering at equal ts: the right row must be VISIBLE to the
    # left row's frame — backward (preceding frame): right first
    # (0 < 1); forward (following frame): left first (0 < 1).
    l_side, r_side = (0, 1) if forward else (1, 0)
    l_tagged = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(l_side))
        .withColumn("__r", F.lit(None).cast(r_struct_type))
    )
    r_tagged = (
        right.withColumn("__ts", F.col(right_ts))
        .withColumn("__side", F.lit(r_side))
        .withColumn("__r", F.struct(*r_struct_cols))
    )
    for c in lcols:
        if c != key:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    sel = [key, "__ts", "__side", "__r", *[c for c in lcols if c != key]]
    unioned = l_tagged.select(*sel).unionByName(r_tagged.select(*sel))
    # Right rows sort before left rows at equal ts (__side 0 < 1) so an
    # exactly-simultaneous right row IS visible to the left row (<=).
    # __r as the final sort key makes ties between right rows at an
    # identical (key, ts) deterministic (struct comparison is
    # lexicographic by field; last() then always picks the max row).
    # Maps are not orderable — fall back to the ts-only ordering then.
    orderable = "map" not in r_struct_type.simpleString()
    order = ["__ts", "__side"] + (["__r"] if orderable else [])
    if nearest:
        # Backward-style side order (right before left at equal ts):
        # an exactly-simultaneous right row reaches the PRECEDING
        # frame at distance 0, which wins the tie anyway, so the
        # following frame not seeing it is immaterial.
        wb = (
            W.partitionBy(key)
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, 0)
        )
        wf = (
            W.partitionBy(key)
            .orderBy(*order)
            .rowsBetween(0, W.unboundedFollowing)
        )
        rb = F.last("__r", ignorenulls=True).over(wb)
        rf = F.first("__r", ignorenulls=True).over(wf)
        ts_d = F.col("__ts").cast("timestamp").cast("double")
        back_gap = ts_d - rb["__rts"].cast("timestamp").cast("double")
        fwd_gap = rf["__rts"].cast("timestamp").cast("double") - ts_d
        filled = unioned.withColumn(
            "__r",
            F.when(rf.isNull(), rb)
            .when(rb.isNull(), rf)
            .when(back_gap <= fwd_gap, rb)
            .otherwise(rf),
        )
    elif forward:
        w = (
            W.partitionBy(key)
            .orderBy(*order)
            .rowsBetween(0, W.unboundedFollowing)
        )
        filled = unioned.withColumn(
            "__r", F.first("__r", ignorenulls=True).over(w)
        )
    else:
        w = (
            W.partitionBy(key)
            .orderBy(*order)
            .rowsBetween(W.unboundedPreceding, 0)
        )
        filled = unioned.withColumn(
            "__r", F.last("__r", ignorenulls=True).over(w)
        )
    if tolerance_seconds is not None:
        gap = (
            F.col("__ts").cast("timestamp").cast("double")
            - F.col("__r.__rts").cast("timestamp").cast("double")
        )
        if nearest:
            bounded = F.abs(gap)
        else:
            bounded = -gap if forward else gap
        in_range = bounded <= F.lit(float(tolerance_seconds))
        filled = filled.withColumn(
            "__r", F.when(in_range, F.col("__r"))
        )
    return filled.filter(F.col("__side") == F.lit(l_side)).select(
        *lcols, *[F.col(f"__r.{c}").alias(c) for c in rcols]
    )


def asof_join_ranked(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    left_id: str,
) -> DataFrame:
    """Range-join + row_number()==1 as-of join (small-data fallback)."""
    rcols = [c for c in right.columns if c not in (key, right_ts)]
    j = left.join(
        right,
        on=(left[key] == right[key]) & (right[right_ts] <= left[left_ts]),
        how="left",
    )
    w = W.partitionBy(left[left_id]).orderBy(
        F.desc_nulls_last(right[right_ts])
    )
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*[left[c] for c in left.columns], *[right[c] for c in rcols])
    )
