"""Window operators (SURVEY.md §2.5, §2.6).

The reference's window-ish ops: ROW_NUMBER argmax-per-group
(Solutions/chapter04/scripts/select_pageview_counts.sql:1-12), pandas
``shift(-1)`` lead (gold_war:143-146), positional first/last
(lecture3/13:63-64), keep-last dedup (lecture3/15:129).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    partition_by: Sequence[str],
    order_by: Sequence[Column],
    k: int = 1,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-k rows per group via ROW_NUMBER (reference
    select_pageview_counts.sql:1-12, k=1 argmax hour per page).

    One shuffle on the partition keys. At scale, if k is small and groups are
    many, this beats global sort; for heavy skew AQE splits the hot
    partition.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def lead_shift(
    df: DataFrame,
    order_by: str,
    col: str,
    n: int = 1,
    partition_by: Sequence[str] = (),
    out_col: str | None = None,
) -> DataFrame:
    """Next-row value (reference ``close.shift(-1)`` → next-day price,
    gold_war:143-146).

    NB: an unpartitioned window is a single-task sort — fine for the
    reference's daily table (~thousands of rows), wrong for a 100 TB fact
    table; callers at scale must supply ``partition_by`` (e.g. symbol).
    """
    w = Window.partitionBy(*partition_by).orderBy(order_by)
    return df.withColumn(out_col or f"{col}_next", F.lead(col, n).over(w))


def dedup_keep_last(
    df: DataFrame, keys: Sequence[str], order_col: str
) -> DataFrame:
    """Dedup by key keeping the row with max ``order_col`` (reference
    ``drop_duplicates(subset=['closeTime'], keep='last')`` where 'last' is
    file order = fetch order, lecture3/15:129 — here defined by timestamp,
    deterministic under any partitioning).
    """
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def first_last_in_bucket(
    df: DataFrame,
    bucket_cols: Sequence[str],
    value_col: str,
    order_col: str,
) -> DataFrame:
    """First and last value per bucket by time order — the window-function
    form of lecture3/13:63-64's iloc[0]/iloc[-1]. Aggregation form
    (min_by/max_by) lives in aggregates.multi_stat_time_bucket; this variant
    annotates every row instead of collapsing."""
    w = (
        Window.partitionBy(*bucket_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return df.withColumn("first_" + value_col, F.first(value_col).over(w)).withColumn(
        "last_" + value_col, F.last(value_col).over(w)
    )
