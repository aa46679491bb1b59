"""Join operators (SURVEY.md §2.3, §2.7).

Catalyst picks broadcast vs sort-merge; these helpers add the hints the
planner can't infer (dimension side of star joins is broadcast) and express
the reference's implicit joins (upsert anti-join, union-of-sources,
as-of alignment) explicitly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def left_join_fill(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str],
    fill: dict | None = None,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Left join + null-fill for unmatched rows (reference
    gold_war_etl_dag.py:148-150 gold×sentiment merge + fillna(0)).

    ``broadcast_dim`` hints the dim side — at 100 TB the fact side shuffles
    nothing for a broadcast join.
    """
    right = F.broadcast(dim) if broadcast_dim else dim
    out = fact.join(right, on, "left")
    return out.na.fill(fill) if fill else out


def anti_join(df: DataFrame, other: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Rows of df whose key is NOT in other (reference upsert
    ``existing[~existing.date.isin(new_dates)]``, lecture3/15:186-188)."""
    return df.join(other, on, "left_anti")


def semi_join(df: DataFrame, other: DataFrame, on: str | Sequence[str]) -> DataFrame:
    """Rows of df whose key IS in other — membership at table scale (the
    set-membership filter of lecture4/06:45 when the set is itself a table)."""
    return df.join(other, on, "left_semi")


def union_sources(dfs: Sequence[DataFrame]) -> DataFrame:
    """Union-all of heterogeneous sources by column name, padding missing
    columns with null (reference multi-source extend,
    tutorial2_data_ingestion.py:222-259)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return out


def upsert(existing: DataFrame, new: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Delete-matching-then-insert (reference lecture3/13:80-83): existing
    rows whose key collides with new are replaced. anti-join + union —
    one shuffle each side on the key at scale; for table-backed storage use
    operators.upsert.write_partition_upsert (dynamic partition overwrite).
    """
    keep = existing.join(new.select(*keys).distinct(), list(keys), "left_anti")
    return keep.unionByName(new)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on_time: str,
    by: Sequence[str] = (),
    right_prefix: str = "r_",
    tolerance: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the most recent right row with
    ``right.ts <= left.ts`` (reference only aligns by exact date,
    gold_war:143-148 — this is the general time-series operator it implies;
    SURVEY.md §2.3 J5).

    Spark-first strategy: union both sides tagged, one window pass
    partitioned by ``by`` ordered by time — a single shuffle, no O(n·m)
    range-condition join blowup, skew-safe under AQE. ``tolerance`` (e.g.
    ``INTERVAL 1 HOUR``) invalidates matches older than left.ts - tolerance.
    """
    by = list(by)
    rcols = [c for c in right.columns if c != on_time and c not in by]
    # Aligned schemas: left keeps its payload; right contributes its payload
    # renamed with prefix; each side nulls the other's columns.
    lpay = [c for c in left.columns if c not in by and c != on_time]
    l_side = left.select(
        *by,
        F.col(on_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in lpay],
        *[F.lit(None).cast(right.schema[c].dataType).alias(right_prefix + c) for c in rcols],
        F.lit(None).cast(right.schema[on_time].dataType).alias("_rt"),
    )
    r_side = right.select(
        *by,
        F.col(on_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        *[F.col(c).alias(right_prefix + c) for c in rcols],
        F.col(on_time).alias("_rt"),
    )
    unioned = l_side.unionByName(r_side)
    # Right rows sort before left rows at the same timestamp so an exact-ts
    # right row is visible to the left row (<= semantics).
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[F.last(right_prefix + c, ignorenulls=True).over(w).alias("_f_" + c) for c in rcols],
        F.last("_rt", ignorenulls=True).over(w).alias("_f_rt"),
    )
    out = filled.filter(F.col("_is_left") == 1)
    if tolerance is not None:
        in_tol = F.col("_f_rt") >= F.col("_t") - F.expr(tolerance)
        proj = [
            F.when(in_tol, F.col("_f_" + c)).alias(right_prefix + c) for c in rcols
        ]
    else:
        proj = [F.col("_f_" + c).alias(right_prefix + c) for c in rcols]
    return out.select(*by, F.col("_t").alias(on_time), *lpay, *proj)
