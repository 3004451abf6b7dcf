"""Binned range join: the scale path for point-in-interval joins.

A naive non-equi join (``point >= lo AND point < hi``) only has
BroadcastNestedLoopJoin as a physical strategy — O(|left|·|right|)
comparisons, and impossible when neither side fits in a broadcast.
The binning trick recovers an *equi*-join:

1. pick a bin width ``w``; each left point lands in bin
   ``floor(point / w)``;
2. each right interval is exploded into every bin it overlaps
   (``sequence(floor(lo/w), floor(hi/w))`` — the top bin may be a
   false candidate when ``hi`` is bin-aligned; the refine filter
   removes it);
3. equi-join on the bin id (broadcast-hash or sort-merge, Catalyst's
   choice), then re-apply the exact range predicate.

Shuffles partition by bin id, so the join scales horizontally; cost is
O(candidate pairs) instead of O(cross product).  Pick ``w`` near the
typical interval width: too small explodes the right side, too large
inflates candidate pairs per bin.

The reference has no joins at all (SURVEY §2.2); this is part of the
engine's analytics layer, mirroring the range-join binning used by
other SQL engines for interval/temporal joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BIN = "__range_bin"


def bin_range_join(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
) -> DataFrame:
    """Inner join of ``left`` rows onto ``right`` intervals where
    ``lo <= point < hi``, executed as an equi-join on a computed bin.

    Only inner semantics: the refine filter after an outer join would
    silently drop null-extended rows, so outer variants need the
    (unbinned) non-equi join.
    """
    w = float(bin_width)
    if w <= 0:
        raise ValueError("bin_width must be positive")
    lbin = left.withColumn(_BIN, F.floor(F.col(point_col) / w).cast("long"))
    rbin = right.withColumn(
        _BIN,
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    return (
        lbin.join(rbin, on=_BIN, how="inner")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) < F.col(hi_col))
        )
        .drop(_BIN)
    )
