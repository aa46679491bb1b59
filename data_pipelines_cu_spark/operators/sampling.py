"""Deterministic sampling / dataset splitting (north-star training-data ops).

Training pipelines need splits that are (a) stable under repartitioning,
retries, and engine changes — so NEVER ``rand()`` or ``TABLESAMPLE`` — and
(b) keyed on a business id so all rows of an entity land in one split.
The portable construction: bucket = md5-derived 32-bit hash of the key,
mod 100; split boundaries are percentile cutoffs over buckets. The same
arithmetic runs in any engine (the DuckDB oracle runs it verbatim).

Reference grounding: the course's only split is sklearn
``train_test_split(random_state=42)`` (Solutions/gold_war_etl_dag.py:171-172)
— process-local RNG, unreproducible across engines; this is its
distributed, content-addressed replacement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_bucket(key: Column, n_buckets: int = 100, salt: str = "") -> Column:
    """Deterministic bucket in [0, n_buckets): first 32 bits of
    md5(salt || key) mod n_buckets. Engine-portable and partition-
    independent."""
    h = F.md5(F.concat(F.lit(salt), key.cast("string")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_buckets
    ).alias("bucket")


def with_split(
    df: DataFrame,
    key_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
    salt: str = "",
    out: str = "split",
) -> DataFrame:
    """Assign train/val/test by hash bucket of the key column. All rows
    sharing a key get the same split (no leakage across splits); adding
    data never reassigns existing keys."""
    b = hash_bucket(F.col(key_col), 100, salt)
    return df.withColumn(
        out,
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def hash_bucket_sql(key_expr: str, n_buckets: int = 100, salt: str = "") -> str:
    """DuckDB twin of hash_bucket."""
    gx = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5('{salt}' || CAST({key_expr} AS VARCHAR)), {j + 1}, 1)) - 1) * {16 ** (7 - j)}"
        for j in range(8)
    )
    return f"(({gx})::BIGINT % {n_buckets})"


def split_sql(
    key_expr: str, train_pct: int = 80, val_pct: int = 10, salt: str = ""
) -> str:
    b = hash_bucket_sql(key_expr, 100, salt)
    return (
        f"(CASE WHEN {b} < {train_pct} THEN 'train' "
        f"WHEN {b} < {train_pct + val_pct} THEN 'val' ELSE 'test' END)"
    )


def quota_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    n_per_group: int = 20,
    salt: str = "",
    rank_col: str = "rk",
) -> DataFrame:
    """Deterministic per-group quota sample: rank rows within each group by
    md5(salt || key) — a content-addressed shuffle order, stable under
    repartitioning and engine changes — and keep the first ``n_per_group``.
    The language-rebalancing step of corpus curation (cap the dominant
    language, keep every row of the rare ones).

    One shuffle on the group key. At 100 TB a whole-language total order
    would straggle; the production refinement is a broadcast per-group
    count → keep hash < (oversampled n/count) cutoff → rank only the
    pre-filtered sliver. The cutoff pass is omitted here because the exact
    semantics ARE the ranked order and the driver gate must match it
    bit-for-bit; the prefilter preserves the result whenever >= n rows
    survive it (near-certain at any realistic n)."""
    h = F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h, F.col(key_col))
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= n_per_group
    )


def mixture_sample(
    df: DataFrame,
    group_col: str,
    weights: dict[str, int],
    key_col: str,
    salt: str = "",
    rank_col: str = "rk",
) -> DataFrame:
    """Resample to a target mixture: keep ``w_g * m`` rows of each group,
    where ``weights`` are integer mixture parts (e.g. {"web": 3, "code": 1}
    = 3:1) and ``m = min_g floor(count_g / w_g)`` is the largest multiplier
    every group can serve — the biggest corpus with EXACTLY the target
    proportions. Rows are chosen per group by md5 hash order (deterministic,
    partition-independent); groups outside ``weights`` are dropped.

    The data-mixture step of pre-training curation (rebalance web/code/
    reference shares before packing). All quota arithmetic is integer —
    no double ratios that could round differently across engines. Plan
    shape: one count aggregate (tiny), its min broadcast back as a scalar,
    one rank shuffle on the group key; the corpus never moves twice.
    """
    spark = df.sparkSession
    weights_df = F.broadcast(
        spark.createDataFrame(
            [(g, int(w)) for g, w in sorted(weights.items())],
            f"{group_col} string, _w long",
        )
    )
    counts = (
        df.join(weights_df, group_col)
        .groupBy(group_col, "_w")
        .agg(F.count(F.lit(1)).alias("_cnt"))
    )
    m = F.broadcast(
        counts.select(
            F.min(F.floor(F.col("_cnt") / F.col("_w"))).alias("_m")
        )
    )
    quotas = F.broadcast(
        counts.crossJoin(m).select(
            group_col, (F.col("_w") * F.col("_m")).alias("_quota")
        )
    )
    ranked = quota_sample(
        df.join(weights_df.select(group_col), group_col),
        group_col,
        key_col,
        n_per_group=2**62,
        salt=salt,
        rank_col=rank_col,
    )
    return ranked.join(quotas, group_col).filter(F.col(rank_col) <= F.col("_quota")).drop(
        "_quota"
    )


def mixture_sample_sql(
    weights: dict[str, int],
    table: str = "documents",
    group_expr: str = "source",
    key_expr: str = "doc_id",
    salt: str = "",
) -> str:
    """DuckDB twin of mixture_sample (same integer quota arithmetic)."""
    wvals = ", ".join(f"('{g}', {int(w)})" for g, w in sorted(weights.items()))
    return f"""
    WITH w(grp, wt) AS (VALUES {wvals}),
    counts AS (
        SELECT {group_expr} AS grp, wt, COUNT(*) AS cnt
        FROM {table} JOIN w ON w.grp = {group_expr}
        GROUP BY {group_expr}, wt
    ),
    m AS (SELECT MIN(cnt // wt) AS m FROM counts),
    quotas AS (SELECT grp, wt * m.m AS quota FROM counts, m),
    ranked AS (
        SELECT {group_expr} AS grp, {key_expr} AS key_val,
               ROW_NUMBER() OVER (
                   PARTITION BY {group_expr}
                   ORDER BY md5('{salt}' || CAST({key_expr} AS VARCHAR)),
                            {key_expr}) AS rk
        FROM {table} JOIN w ON w.grp = {group_expr}
    )
    SELECT grp AS {group_expr}, key_val AS {key_expr}, rk
    FROM ranked JOIN quotas USING (grp)
    WHERE rk <= quota
    """


def sqrt_scaled_quota_sample(
    df: DataFrame,
    group_col: str,
    key_col: str,
    total: int,
    salt: str = "",
    rank_col: str = "rk",
) -> DataFrame:
    """Square-root-scaled mixture sampling: group g gets quota
    floor(total * sqrt(c_g) / Σ_h sqrt(c_h)) rows — the classic
    temperature-style rebalancing (T=2) that upsamples low-resource
    groups relative to proportional sampling without the free-for-all of
    uniform. sqrt, not pow(x, 1/T): sqrt is correctly rounded in IEEE 754
    on both engines, so quotas are bit-reproducible where a pow-based
    temperature could flip a floor at the boundary.

    The denominator folds sqrt(c_g) in sorted-group order via a SEQUENTIAL
    reduce on a collected per-group array (a handful of rows by contract —
    one per group), never a parallel SUM whose addition order varies by
    partitioning. Rows are chosen per group by md5 hash order; quotas
    larger than a group keep the whole group.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_cnt"))
    denom = F.broadcast(
        counts.agg(
            F.aggregate(
                F.sort_array(F.collect_list(F.struct(group_col, "_cnt"))),
                F.lit(0.0),
                lambda acc, x: acc + F.sqrt(x["_cnt"].cast("double")),
            ).alias("_denom")
        )
    )
    quotas = F.broadcast(
        counts.crossJoin(denom).select(
            group_col,
            F.floor(
                F.lit(float(total))
                * F.sqrt(F.col("_cnt").cast("double"))
                / F.col("_denom")
            ).alias("_quota"),
        )
    )
    ranked = quota_sample(
        df, group_col, key_col, n_per_group=2**62, salt=salt, rank_col=rank_col
    )
    return (
        ranked.join(quotas, group_col)
        .filter(F.col(rank_col) <= F.col("_quota"))
        .drop("_quota")
    )


def sqrt_scaled_sample_sql(
    total: int,
    table: str = "documents",
    group_expr: str = "lang",
    key_expr: str = "doc_id",
    salt: str = "",
) -> str:
    """DuckDB twin of sqrt_scaled_quota_sample: same sorted-order
    sequential fold for the denominator (list_reduce over a group-ordered
    list — never an unordered SUM of doubles)."""
    return f"""
    WITH counts AS (
        SELECT {group_expr} AS grp, COUNT(*) AS cnt FROM {table} GROUP BY 1
    ),
    denom AS (
        SELECT list_reduce(
                   list_prepend(0.0, list(sqrt(CAST(cnt AS DOUBLE)) ORDER BY grp)),
                   (acc, x) -> acc + x) AS d
        FROM counts
    ),
    quotas AS (
        SELECT grp,
               FLOOR({float(total)} * sqrt(CAST(cnt AS DOUBLE)) / d.d) AS quota
        FROM counts, denom d
    ),
    ranked AS (
        SELECT {group_expr} AS grp, {key_expr} AS key_val,
               ROW_NUMBER() OVER (
                   PARTITION BY {group_expr}
                   ORDER BY md5('{salt}' || CAST({key_expr} AS VARCHAR)),
                            {key_expr}) AS rk
        FROM {table}
    )
    SELECT grp AS {group_expr}, key_val AS {key_expr}, rk
    FROM ranked JOIN quotas USING (grp)
    WHERE rk <= quota
    """
