"""Sessionization: assign gap-based session ids to event streams.

Batch variant (lag + cumulative-sum over a per-user window): a new
session starts when the gap since the previous event exceeds
``gap_seconds``.  One shuffle on the user key; window state is O(1) per
row, so the operator scales to arbitrarily many events per user.
The streaming twin is ``F.session_window`` (streaming/pipeline.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Add a ``session_id`` column (1-based per user, ordered by time).

    Pass ``tiebreak_cols`` (e.g. an event id) so equal-timestamp rows
    order deterministically.  Gap comparison uses fractional-second
    timestamps (microsecond precision), matching SQL ``epoch()``.
    """
    w = W.partitionBy(user_col).orderBy(ts_col, *tiebreak_cols)
    gap = F.col(ts_col).cast("double") - F.lag(F.col(ts_col).cast("double")).over(w)
    new_session = F.when(
        gap.isNull() | (gap > F.lit(gap_seconds)), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        F.sum(new_session).over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
