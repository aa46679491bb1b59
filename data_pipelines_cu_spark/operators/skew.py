"""Skew mitigation: salted aggregation/join and bucketed layouts.

At 100 TB a handful of hot keys (one power user, one viral document) turn a
single shuffle partition into the job's critical path. AQE's skew-join
splitting (enabled in session.py) handles the join case at runtime; these
operators handle the aggregation case and the planned-layout case:

- ``salted_agg``: two-phase aggregation — phase 1 aggregates on
  (key, salt) spreading a hot key over N partitions, phase 2 merges the
  partials. Works for any algebraic aggregate (sum/count/min/max) and is
  exactly Spark's partial-aggregation idea applied a second time.
- ``salted_broadcast_left``: replicates the small side N ways so a skewed
  big side joins against (key, salt) — for when the small side is slightly
  too big to broadcast whole but a hot key dominates.
- ``write_bucketed``: co-located join layout — both fact tables bucketed by
  the join key mean the join is shuffle-free at read time
  (SortMergeJoin without Exchange).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGG_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def with_salt(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic row salt in [0, n_salts): hash of the whole row's
    stable id-ish columns would be ideal; spark_partition_id+monotonic id
    are nondeterministic under retry, so we hash all columns (cheap, exact
    enough for spreading)."""
    return df.withColumn(
        salt_col, (F.abs(F.xxhash64(*df.columns)) % n_salts).cast("int")
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Mapping[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column → (agg_kind, input_col) with kind in
    sum/count/min/max. Phase 1 groups by (keys..., salt); phase 2 merges
    partials by keys (count partials merge via sum).

    Equivalent to a plain groupBy for these algebraic aggregates; use when
    a key's row count is so large that even map-side partial aggregation
    leaves one reducer hot.
    """
    salted = with_salt(df, n_salts)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            (F.count(F.lit(1)) if kind == "count" else getattr(F, kind)(col)).alias(out)
            for out, (kind, col) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[_AGG_MERGE[kind](out).alias(out) for out, (kind, col) in aggs.items()]
    )


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-proof equi-join: big side gets a random-ish salt per row, small
    side is exploded n_salts ways, join on (key, salt). The hot key's rows
    land on n_salts reducers instead of one."""
    b = big.withColumn(
        "_salt", (F.abs(F.xxhash64(*big.columns)) % n_salts).cast("int")
    )
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return b.join(s, [on, "_salt"]).drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table: two
    tables bucketed identically on the join key join WITHOUT a shuffle —
    the planned-layout answer to repeated co-located joins (the minute→
    hourly→daily cascade re-joining on date is the reference-shaped
    example)."""
    writer = df.write.bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.mode("overwrite").saveAsTable(table)
