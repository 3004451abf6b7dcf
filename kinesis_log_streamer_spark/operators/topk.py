"""Top-K per group via ranked windows.

``row_number`` over a partitioned ordered window, then filter rank<=k.
Catalyst turns the global pattern (no partition) into TakeOrderedAndProject;
the grouped form shuffles once on the group key and sorts per partition —
the scalable idiom for "top K per key" at any data size (no driver
collect, no global sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Keep the top-k rows per group; ties broken by order_cols order.

    Pass fully-deterministic ``order_cols`` (include a unique tiebreaker)
    so results are stable across engines.
    """
    w = W.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )
