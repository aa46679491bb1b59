"""Deterministic cardinality sketches (north-star set: corpus statistics).

KMV (k-minimum-values, Bar-Yossef et al. 2002): hash every value to a
uniform integer, keep the k smallest DISTINCT hashes per group; the k-th
smallest hash h_k estimates distinct count as (k-1) * M / h_k (M = hash
range). Unlike HyperLogLog (whose register layout differs per engine, so
`approx_daily_users` is gated rows-only), KMV over an md5-derived hash is
BIT-DETERMINISTIC: the same k smallest hashes exist on any engine and any
partitioning, so the estimate — a single IEEE division of exact integers —
hash-matches a SQL oracle. That turns the approximate-distinct path from
"trust me" into a gated, error-measured operator.

Scale shape: one distinct on (group, hash) — the same digest-only shuffle
as exact dedup — then a per-group top-k window over AT MOST the distinct
hashes. Per-group sketch state is k longs, and sketches MERGE by k-smallest
of the union (tested), which is what makes per-partition/per-day sketches
combinable into corpus totals without a second scan at 100 TB.

Reference grounding: the course counts distincts with pandas nunique
(Solutions/chapter04 pageview counts); the sketch is the at-scale form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: Hash domain: 15 md5 hex chars = 60 bits — exact in a BIGINT on both
#: engines (DuckDB's hex-digit fold and Spark's conv agree value-for-value).
KMV_BITS = 60
KMV_M = 1 << KMV_BITS


def hash60(col: Column) -> Column:
    """First 60 bits of md5(value) as a nonnegative long (engine-portable)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_distinct(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate next to the exact count and
    relative error. Groups with fewer than k distinct values report the
    exact count (the sketch IS the value set there, error 0)."""
    hashes = df.select(
        *group_cols, hash60(F.col(value_col)).alias("h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc())
    ranked = hashes.withColumn("_rn", F.row_number().over(w))
    per_group = (
        ranked.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.max(F.when(F.col("_rn") == k, F.col("h"))).alias("hk"),
        )
    )
    est = F.when(
        F.col("n_exact") < k, F.col("n_exact").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(KMV_M)) / F.col("hk").cast("double")
    )
    return per_group.select(
        *group_cols,
        F.col("n_exact"),
        F.round(est, 6).alias("kmv_estimate"),
        F.round(
            F.abs(est - F.col("n_exact").cast("double"))
            / F.col("n_exact").cast("double"),
            6,
        ).alias("rel_err"),
    )


def kmv_oracle_sql(
    table: str = "events",
    group_expr: str = "strftime(ts, '%Y-%m-%d')",
    group_alias: str = "date",
    value_expr: str = "user_id",
    k: int = 64,
) -> str:
    """DuckDB twin of kmv_distinct: identical 60-bit md5 hash, identical
    k-th-smallest selection, identical estimate arithmetic."""
    h = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST({value_expr} AS VARCHAR)),"
        f" {j + 1}, 1)) - 1) * {16 ** (14 - j)}"
        for j in range(15)
    )
    return f"""
    WITH hashes AS (
        SELECT DISTINCT {group_expr} AS {group_alias}, ({h})::BIGINT AS h
        FROM {table}
    ),
    ranked AS (
        SELECT {group_alias}, h,
               ROW_NUMBER() OVER (PARTITION BY {group_alias}
                                  ORDER BY h ASC) AS rn
        FROM hashes
    ),
    per_group AS (
        SELECT {group_alias},
               COUNT(*) AS n_exact,
               MAX(CASE WHEN rn = {k} THEN h END) AS hk
        FROM ranked GROUP BY {group_alias}
    )
    SELECT {group_alias},
           n_exact,
           ROUND(CASE WHEN n_exact < {k} THEN n_exact::DOUBLE
                 ELSE {float(k - 1)} * {float(KMV_M)} / hk::DOUBLE END, 6)
               AS kmv_estimate,
           ROUND(ABS((CASE WHEN n_exact < {k} THEN n_exact::DOUBLE
                      ELSE {float(k - 1)} * {float(KMV_M)} / hk::DOUBLE END)
                     - n_exact::DOUBLE) / n_exact::DOUBLE, 6) AS rel_err
    FROM per_group
    """


def kmv_sketch(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """The raw mergeable sketch: (group, array of the k smallest distinct
    hashes, ascending). Persist per partition/day; merge with kmv_merge."""
    hashes = df.select(
        *group_cols, hash60(F.col(value_col)).alias("h")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc())
    return (
        hashes.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("h")).alias("kmv"))
    )


def kmv_merge(
    sketches: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Merge sketches sharing a group: k smallest of the distinct union —
    exactly the sketch a single pass over the union of the inputs builds
    (KMV's defining property; tested in test_operators)."""
    exploded = sketches.select(*group_cols, F.explode("kmv").alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("h").asc())
    return (
        exploded.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("h")).alias("kmv"))
    )
