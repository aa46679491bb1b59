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

Scale shape: a partition-local Arrow pass finds each partition's k
smallest distinct hashes per group (zero shuffle), then a capped-array
merge reduces the ≤ k-longs-per-group-per-partition candidates — the
sketch never shuffles the full distinct-hash set and no task sorts it,
which is what makes it genuinely cheaper than the exact distinct count it
approximates. Per-group sketch state is k longs, and sketches MERGE by
k-smallest of the union (tested), which is what makes per-partition/
per-day sketches combinable into corpus totals without a second scan at
100 TB.

Reference grounding: the course counts distincts with pandas nunique
(Solutions/chapter04 pageview counts); the sketch is the at-scale form.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from .materialize import lineage_cut

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
    exact count (the sketch IS the value set there, error 0).

    The sketch side goes through the shared partial top-k (per-partition
    k-smallest candidates, capped array merge — the shuffle is at most k
    longs per group per input partition, and no task ever sorts a group's
    full distinct-hash set). The exact count — present only because this is
    an error-PROFILE operator — rides the SAME distinct (group, h) table
    as the sketch (r14, guide §2.4: the old shape scanned the source and
    ran the md5→60-bit hash TWICE, once per side; countDistinct's partial
    dedup shuffles the same distinct pairs this explicit distinct does,
    so the exchange volume is unchanged and one full scan + hash pass
    disappears). The distinct table is lineage-cut: two consumers, and
    (group, h) compresses far below the source (§3 doctrine). At 100 TB
    you run the sketch without the exact side, which is its reason to
    exist."""
    from .materialize import lineage_cut  # noqa: PLC0415 (cycle guard)

    hashed = df.select(*group_cols, hash60(F.col(value_col)).alias("h"))
    distinct_h = hashed.distinct().transform(lineage_cut)
    sk = _kmv_partial_topk(distinct_h, list(group_cols), k=k)
    exact = distinct_h.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    hk = F.when(F.size("kmv") >= k, F.element_at("kmv", k))
    est = F.when(
        F.col("n_exact") < k, F.col("n_exact").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(KMV_M)) / hk.cast("double")
    )
    # one k-capped row per group — broadcast by contract
    return exact.join(F.broadcast(sk), group_cols).select(
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


# --- Count-Min frequency sketch ---------------------------------------------
# Cormode & Muthukrishnan 2005: d hash rows of w counters; a key's estimate
# is the MIN of its d counters — always >= the true count, with overestimate
# driven by colliding mass. Deterministic md5 row hashes make the estimate
# (and its measured overestimate) bit-identical on both engines, so the
# sketch path itself hash-gates. Counters are sums → sketches MERGE by
# bucket-wise addition (linearity), the per-shard rollup property.

CM_DEPTH = 4
CM_WIDTH = 1024


def _cm_bucket(col: Column, r: int) -> Column:
    """Row-r counter index: 60-bit md5 of 'r:value', mod width."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{r}:"), col)), 1, 15), 16, 10
        ).cast("long")
        % CM_WIDTH
    )


def cm_gram_count_error(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_count: int = 5,
) -> DataFrame:
    """Count-Min estimates vs exact counts for head n-grams (exact count >=
    min_count): gram, exact, cm_estimate, overestimate (always >= 0).

    Scale shape: the sketch build shuffles (row, bucket) keys — d*w = 4096
    groups regardless of corpus size; exact head counts shuffle grams once
    (the same pass any head-vocabulary job already runs). The probe joins
    the (small) head set against the 4096-row counter table. At 100 TB the
    counter table is the only state that grows with NOTHING."""
    from .dedup import gram_rows

    grams = gram_rows(df, text_col, id_col, n).select("gram")
    rb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"), _cm_bucket(F.col("gram"), r).alias("bucket")
                )
                for r in range(CM_DEPTH)
            ]
        )
    ).alias("rb")
    counters = (
        grams.select(rb)
        .select("rb.r", "rb.bucket")
        .groupBy("r", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    head = (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("exact"))
        .filter(F.col("exact") >= min_count)
    )
    probes = head.select("gram", "exact", rb).select(
        "gram", "exact", "rb.r", "rb.bucket"
    )
    return (
        probes.join(F.broadcast(counters), ["r", "bucket"])
        .groupBy("gram", "exact")
        .agg(F.min("cnt").alias("cm_estimate"))
        .select(
            "gram",
            "exact",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("exact")).alias("overestimate"),
        )
    )


def cm_oracle_sql(
    table: str = "documents",
    text_expr: str = "text",
    n: int = 3,
    min_count: int = 5,
) -> str:
    """DuckDB twin of cm_gram_count_error (identical row hashes, buckets,
    min-of-counters arithmetic)."""
    norm = f"regexp_replace(lower(trim({text_expr})), '\\s+', ' ', 'g')"
    gram_parts = " || ' ' || ".join(f"ws[i + {j}]" for j in range(n))

    def h60(expr: str) -> str:
        return "(" + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5({expr}), {j + 1}, 1)) - 1)"
            f" * {16 ** (14 - j)}"
            for j in range(15)
        ) + ")::BIGINT"

    rb_parts = []
    for r in range(CM_DEPTH):
        hr = h60(f"'{r}:' || g")
        rb_parts.append(
            f"SELECT g, {r} AS r, {hr} % {CM_WIDTH} AS bucket FROM grams"
        )
    rb_union = " UNION ALL ".join(rb_parts)
    return f"""
    WITH words AS (
        SELECT string_split({norm}, ' ') AS ws FROM {table}
    ),
    grams AS (
        SELECT {gram_parts} AS g
        FROM (SELECT ws, unnest(CASE WHEN len(ws) >= {n}
                     THEN range(1, len(ws) - {n - 2}) ELSE [] END) AS i
              FROM words)
    ),
    rb AS ({rb_union}),
    counters AS (
        SELECT r, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM rb GROUP BY r, bucket
    ),
    head AS (
        SELECT g AS gram, CAST(COUNT(*) AS BIGINT) AS exact
        FROM grams GROUP BY g HAVING COUNT(*) >= {min_count}
    ),
    probes AS (
        SELECT gram, exact, r,
               {h60("r::VARCHAR || ':' || gram")} % {CM_WIDTH} AS bucket
        FROM head CROSS JOIN (SELECT unnest(range({CM_DEPTH})) AS r)
    )
    SELECT gram, exact, MIN(cnt) AS cm_estimate,
           MIN(cnt) - exact AS overestimate
    FROM probes JOIN counters USING (r, bucket)
    GROUP BY gram, exact
    """


# --- Bloom-filter membership prefilter ---------------------------------------
# The at-scale decontamination/join-pruning pattern: build an m-bit Bloom
# bitmap (k md5-derived positions per key) over the benchmark's gram set,
# prefilter the corpus against the (tiny, broadcast) bitmap, and measure the
# false-positive cost against exact membership. Deterministic positions →
# the whole measurement hash-gates. Bitmaps merge by word-wise OR.

BLOOM_BITS = 65536  # ~8% fill at ~1.4k keys * k=4
BLOOM_K = 4
# 63 bits per bigint word: bit 63 stays clear, because DuckDB raises on
# 1::BIGINT << 63 (checked signed overflow) while Spark silently wraps —
# the one-bit sacrifice keeps the bitmap arithmetic identical on both.
BLOOM_WORD = 63


def _bloom_pos(col: Column, i: int) -> Column:
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}:"), col)), 1, 15), 16, 10
        ).cast("long")
        % BLOOM_BITS
    )


def bloom_bitmap(keys: DataFrame, key_col: str = "gram") -> DataFrame:
    """(word_idx, bits) bitmap rows — BLOOM_BITS/64 bigints, built with a
    bit_or aggregate over per-key set positions. Broadcastable at any
    corpus size (the bitmap size is a constant)."""
    pos = keys.select(
        F.explode(
            F.array(
                *[_bloom_pos(F.col(key_col), i) for i in range(BLOOM_K)]
            )
        ).alias("pos")
    ).distinct()
    return (
        pos.select(
            (F.col("pos") / BLOOM_WORD).cast("long").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_WORD} AS INT))"
            ).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_decontamination_stats(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Per corpus doc: distinct grams, Bloom-prefilter hits vs exact
    benchmark-membership hits, and the measured false-positive count —
    the evidence that the broadcast bitmap can gate the expensive exact
    join at scale. Only grams that pass the bloom go into the exact
    membership join (the production ordering), so exact hits are computed
    on the prefiltered set and n_false_pos = bloom - exact."""
    from .dedup import gram_rows

    # the BENCHMARK gram table materializes once (plan_audit detector 4):
    # it feeds the bitmap AND the exact membership join, and it is
    # eval-suite sized — in production a persisted artifact. The CORPUS
    # gram table is deliberately NOT checkpointed although two consumers
    # (the bloom-position chain and the per-doc totals) each compile the
    # tokenize: the rows carry n-word gram STRINGS, several times the
    # corpus text in bytes, so materializing them costs more than the
    # second linear pass it saves — at sf0.1 (measured +0.9s) and worse
    # at 100 TB. Allowlisted in plan_audit.TRIAGED_TOKENIZE.
    bench_grams = (
        gram_rows(benchmark, text_col, id_col, n)
        .select("gram")
        .distinct()
        .transform(lineage_cut)
    )
    bitmap = bloom_bitmap(bench_grams)
    doc_grams = gram_rows(corpus, text_col, id_col, n).select(id_col, "gram").distinct()
    pos = doc_grams.select(
        id_col,
        "gram",
        F.posexplode(
            F.array(*[_bloom_pos(F.col("gram"), i) for i in range(BLOOM_K)])
        ).alias("i", "pos"),
    )
    checked = (
        pos.join(
            F.broadcast(bitmap),
            (F.col("pos") / BLOOM_WORD).cast("long") == F.col("word_idx"),
        )
        .select(
            id_col,
            "gram",
            (
                F.expr(
                    f"(bits >> CAST(pos % {BLOOM_WORD} AS INT))"
                    " & CAST(1 AS BIGINT)"
                )
                == 1
            ).cast("int").alias("bit_set"),
        )
        .groupBy(id_col, "gram")
        .agg((F.sum("bit_set") == BLOOM_K).cast("int").alias("bloom_hit"))
    )
    # explicit broadcast: a localCheckpoint erases the source's size
    # statistics (the RDD-backed plan reports the default huge estimate),
    # so the auto-broadcast that picked this join up pre-checkpoint
    # silently degraded to a sort-merge join (caught by the
    # never-cartesian plan test)
    exact = checked.filter(F.col("bloom_hit") == 1).join(
        F.broadcast(bench_grams.withColumn("_in_bench", F.lit(1))),
        "gram",
        "left",
    ).groupBy(id_col).agg(
        F.sum(F.coalesce(F.col("_in_bench"), F.lit(0))).cast("bigint").alias(
            "n_exact_hits"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_bloom_hits"),
    )
    totals = doc_grams.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    # shuffle_hash, not sort-merge: the checkpointed benchmark side's
    # erased statistics propagate a huge estimate up through `exact`,
    # flipping this doc-grain join to SMJ (two corpus-side sorts for
    # nothing). A shuffled hash join builds on the bloom-hit side —
    # decontamination hits are sparse by nature — and needs no sort at
    # any scale; broadcast would be wrong here (doc-cardinality side).
    return (
        totals.join(exact.hint("shuffle_hash"), id_col, "left")
        .select(
            id_col,
            "n_grams",
            F.coalesce("n_bloom_hits", F.lit(0)).alias("n_bloom_hits"),
            F.coalesce("n_exact_hits", F.lit(0)).alias("n_exact_hits"),
            (
                F.coalesce("n_bloom_hits", F.lit(0))
                - F.coalesce("n_exact_hits", F.lit(0))
            ).alias("n_false_pos"),
        )
    )


def bloom_oracle_sql(
    table: str = "documents",
    corpus_pred: str = "source <> 'src0'",
    benchmark_pred: str = "source = 'src0'",
    text_expr: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> str:
    """DuckDB twin of bloom_decontamination_stats (identical positions,
    bitmap, bit tests)."""
    norm = f"regexp_replace(lower(trim({text_expr})), '\\s+', ' ', 'g')"
    gram_parts = " || ' ' || ".join(f"ws[i + {j}]" for j in range(n))

    def h60(expr: str) -> str:
        return "(" + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5({expr}), {j + 1}, 1)) - 1)"
            f" * {16 ** (14 - j)}"
            for j in range(15)
        ) + ")::BIGINT"

    pos_parts, doc_pos_parts = [], []
    for i in range(BLOOM_K):
        hi = h60(f"'{i}:' || gram")
        pos_parts.append(
            f"SELECT gram, {hi} % {BLOOM_BITS} AS pos FROM bench_grams"
        )
        doc_pos_parts.append(
            f"SELECT {id_col}, gram, {hi} % {BLOOM_BITS} AS pos FROM doc_grams"
        )
    pos_union = " UNION ALL ".join(pos_parts)
    doc_pos_union = " UNION ALL ".join(doc_pos_parts)
    return f"""
    WITH bench_words AS (
        SELECT {id_col}, string_split({norm}, ' ') AS ws
        FROM {table} WHERE {benchmark_pred}
    ),
    bench_grams AS (
        SELECT DISTINCT {gram_parts} AS gram
        FROM (SELECT {id_col}, ws, unnest(CASE WHEN len(ws) >= {n}
                     THEN range(1, len(ws) - {n - 2}) ELSE [] END) AS i
              FROM bench_words)
    ),
    bench_pos AS (SELECT DISTINCT pos FROM ({pos_union})),
    bitmap AS (
        SELECT pos // 63 AS word_idx,
               BIT_OR((1::BIGINT << CAST(pos % 63 AS INT))) AS bits
        FROM bench_pos GROUP BY 1
    ),
    corpus_words AS (
        SELECT {id_col}, string_split({norm}, ' ') AS ws
        FROM {table} WHERE {corpus_pred}
    ),
    doc_grams AS (
        SELECT DISTINCT {id_col}, {gram_parts} AS gram
        FROM (SELECT {id_col}, ws, unnest(CASE WHEN len(ws) >= {n}
                     THEN range(1, len(ws) - {n - 2}) ELSE [] END) AS i
              FROM corpus_words)
    ),
    doc_pos AS ({doc_pos_union}),
    checked AS (
        SELECT {id_col}, gram,
               CAST(SUM(CASE WHEN ((bits >> CAST(pos % 63 AS INT))
                                   & 1::BIGINT) = 1
                         THEN 1 ELSE 0 END) = {BLOOM_K} AS INT) AS bloom_hit
        FROM doc_pos JOIN bitmap ON pos // 63 = word_idx
        GROUP BY {id_col}, gram
    ),
    hits AS (
        SELECT c.{id_col},
               CAST(COUNT(*) AS BIGINT) AS n_bloom_hits,
               CAST(SUM(CASE WHEN b.gram IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_exact_hits
        FROM checked c LEFT JOIN bench_grams b ON c.gram = b.gram
        WHERE c.bloom_hit = 1
        GROUP BY c.{id_col}
    ),
    totals AS (
        SELECT {id_col}, COUNT(*) AS n_grams FROM doc_grams GROUP BY {id_col}
    )
    SELECT t.{id_col}, t.n_grams,
           COALESCE(h.n_bloom_hits, 0) AS n_bloom_hits,
           COALESCE(h.n_exact_hits, 0) AS n_exact_hits,
           COALESCE(h.n_bloom_hits, 0) - COALESCE(h.n_exact_hits, 0)
               AS n_false_pos
    FROM totals t LEFT JOIN hits h ON t.{id_col} = h.{id_col}
    """


def kmv_sketch(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """The raw mergeable sketch: (group, array of the k smallest distinct
    hashes, ascending). Persist per partition/day; merge with kmv_merge.

    PARTIAL top-k build: an Arrow pass computes each partition's k smallest
    distinct hashes per group IN PLACE (zero shuffle — the candidate set a
    partition can contribute is by definition its own k smallest), then one
    capped-array merge reduces candidates per group. What crosses the
    exchange is ≤ k longs per group per input partition — never the full
    distinct-hash set, and no task sorts a group's full hash set (the
    global-sort window this replaces made the sketch cost the same as the
    exact distinct count it exists to avoid)."""
    gcols = list(group_cols)
    hashed = df.select(*gcols, hash60(F.col(value_col)).alias("h"))
    return _kmv_partial_topk(hashed, gcols, k=k)


def _kmv_partial_topk(hashed: DataFrame, gcols: list[str], k: int) -> DataFrame:
    """Partial top-k over a (group..., h) table: per-partition k-smallest
    distinct hashes per group in place, then one capped-array merge.
    Works identically on a raw (duplicate-bearing) hash table and an
    already-distinct one — pd.unique inside the partial dedups either
    way — which is what lets kmv_distinct feed it the shared distinct
    table while kmv_sketch keeps its single-pass zero-dedup path."""
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415
    from pyspark.sql import types as T  # noqa: PLC0415

    def partial(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            yield (
                pdf.groupby(gcols, sort=False)["h"]
                .apply(
                    lambda s: np.sort(pd.unique(s.to_numpy()))[:k].tolist()
                )
                .reset_index(name="ks")
            )

    schema = T.StructType(
        [hashed.schema[c] for c in gcols]
        + [T.StructField("ks", T.ArrayType(T.LongType()))]
    )
    partials = hashed.mapInPandas(partial, schema=schema)
    return partials.groupBy(*gcols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("ks")))),
            1,
            k,
        ).alias("kmv")
    )


def kmv_merge(
    sketches: DataFrame, group_cols: list[str], k: int = 64
) -> DataFrame:
    """Merge sketches sharing a group: k smallest of the distinct union —
    exactly the sketch a single pass over the union of the inputs builds
    (KMV's defining property; tested in test_operators). Array-native: the
    merge shuffles k-capped arrays, never exploded hash rows."""
    return sketches.groupBy(*group_cols).agg(
        F.slice(
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmv")))),
            1,
            k,
        ).alias("kmv")
    )


# --- Fixed-bin histogram quantile sketch -------------------------------------
# The third member of the sketch family (KMV=distinct, CM=frequency,
# histogram=quantiles): per-group quantile estimates from a fixed 64-bin
# equi-width histogram over global [min, max]. The sketch is a vector of
# integer counts — trivially mergeable across partitions/days (counts add),
# which is its production reason to exist: an exact percentile needs the
# group's full value multiset; the sketch needs 64 longs.


def hist_quantile_error(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    n_bins: int = 64,
) -> DataFrame:
    """Per-group p50/p90 from a 64-bin equi-width histogram next to the
    exact percentiles and |error| — the error-profile query for the
    mergeable quantile sketch. Estimate = midpoint of the first bin whose
    cumulative count reaches ceil(q*n).

    Plan shape: one 2-value global bounds aggregate (broadcast), one
    (group, bin) count shuffle — at most groups*n_bins rows move — then a
    64-row-per-group cumulative window. The exact side (percentile) is
    present only because this is an error profile; at 100 TB you run the
    sketch alone, or merge per-day sketches by adding counts."""
    from pyspark.sql import Window as W  # noqa: PLC0415

    bounds = F.broadcast(
        df.agg(
            F.min(F.col(value_col).cast("double")).alias("_lo"),
            F.max(F.col(value_col).cast("double")).alias("_hi"),
        )
    )
    v = F.col(value_col).cast("double")
    # Degenerate-range guard: a constant column (or single row) makes
    # hi == lo; dividing by the zero width yields NaN bins (and errors
    # outright in stricter engines). Everything lands in bin 0, where the
    # midpoint rule still reports the (single) value's quantile exactly.
    bin_ = (
        F.when(
            F.col("_hi") > F.col("_lo"),
            F.least(
                F.lit(n_bins - 1),
                F.floor(
                    ((v - F.col("_lo")) * n_bins)
                    / (F.col("_hi") - F.col("_lo"))
                ),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    binned = df.crossJoin(bounds).select(
        F.col(group_col), bin_.alias("_bin"), F.col("_lo"), F.col("_hi")
    )
    counts = binned.groupBy(group_col, "_bin", "_lo", "_hi").agg(
        F.count(F.lit(1)).alias("_c")
    )
    wcum = (
        W.partitionBy(group_col)
        .orderBy("_bin")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    wall = W.partitionBy(group_col)
    cum = counts.withColumn("_cum", F.sum("_c").over(wcum)).withColumn(
        "_n", F.sum("_c").over(wall)
    )
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(n_bins))
    mid = F.col("_lo") + (F.col("_bin") + F.lit(0.5)) * width

    def approx(q: float):
        r = F.ceil(F.lit(q) * F.col("_n"))
        return F.min(F.when(F.col("_cum") >= r, mid))

    sketch = cum.groupBy(group_col).agg(
        F.max("_n").alias("n"),
        F.round(approx(0.5), 6).alias("approx_p50"),
        F.round(approx(0.9), 6).alias("approx_p90"),
    )
    exact = df.groupBy(group_col).agg(
        F.round(F.percentile(F.col(value_col).cast("double"), F.lit(0.5)), 6).alias(
            "exact_p50"
        ),
        F.round(F.percentile(F.col(value_col).cast("double"), F.lit(0.9)), 6).alias(
            "exact_p90"
        ),
    )
    return (
        sketch.join(exact, group_col)
        .select(
            group_col,
            "n",
            "exact_p50",
            "approx_p50",
            F.round(F.abs(F.col("approx_p50") - F.col("exact_p50")), 6).alias(
                "err_p50"
            ),
            "exact_p90",
            "approx_p90",
            F.round(F.abs(F.col("approx_p90") - F.col("exact_p90")), 6).alias(
                "err_p90"
            ),
        )
    )


def hist_quantile_oracle_sql(
    table: str = "events",
    group_col: str = "event_type",
    value_col: str = "value",
    n_bins: int = 64,
) -> str:
    """DuckDB twin of hist_quantile_error (same bin arithmetic, same
    ceil(q*n) rank rule, same midpoint estimate)."""
    v = f"CAST({value_col} AS DOUBLE)"
    return f"""
    WITH bounds AS (
        SELECT MIN({v}) AS lo, MAX({v}) AS hi FROM {table}
    ),
    binned AS (
        SELECT {group_col} AS grp,
               CAST(CASE WHEN hi > lo
                    THEN least({n_bins - 1},
                         FLOOR((({v} - lo) * {n_bins}) / (hi - lo)))
                    ELSE 0 END AS INT) AS bin,
               lo, hi
        FROM {table}, bounds
    ),
    counts AS (
        SELECT grp, bin, lo, hi, COUNT(*) AS c
        FROM binned GROUP BY grp, bin, lo, hi
    ),
    cum AS (
        SELECT grp, bin, lo, hi, c,
               SUM(c) OVER (PARTITION BY grp ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cumc,
               SUM(c) OVER (PARTITION BY grp) AS n
        FROM counts
    ),
    sk AS (
        SELECT grp,
               CAST(MAX(n) AS BIGINT) AS n,
               ROUND(MIN(CASE WHEN cumc >= CEIL(0.5 * n)
                    THEN lo + (bin + 0.5) * ((hi - lo) / {float(n_bins)}) END), 6)
                   AS approx_p50,
               ROUND(MIN(CASE WHEN cumc >= CEIL(0.9 * n)
                    THEN lo + (bin + 0.5) * ((hi - lo) / {float(n_bins)}) END), 6)
                   AS approx_p90
        FROM cum GROUP BY grp
    ),
    ex AS (
        SELECT {group_col} AS grp,
               ROUND(quantile_cont({v}, 0.5), 6) AS exact_p50,
               ROUND(quantile_cont({v}, 0.9), 6) AS exact_p90
        FROM {table} GROUP BY {group_col}
    )
    SELECT sk.grp AS {group_col}, n,
           exact_p50, approx_p50,
           ROUND(ABS(approx_p50 - exact_p50), 6) AS err_p50,
           exact_p90, approx_p90,
           ROUND(ABS(approx_p90 - exact_p90), 6) AS err_p90
    FROM sk JOIN ex ON sk.grp = ex.grp
    """


def hist_counts(
    df: DataFrame,
    lo: float,
    hi: float,
    group_col: str = "event_type",
    value_col: str = "value",
    n_bins: int = 64,
) -> DataFrame:
    """(group, bin, c) histogram-sketch counts against FIXED [lo, hi)
    bounds — the mergeable form: sketches over any partition of the data
    add bin-wise to the sketch of the union (the streaming contract)."""
    v = F.col(value_col).cast("double")
    bin_ = F.least(
        F.lit(n_bins - 1),
        F.floor(((v - F.lit(float(lo))) * n_bins) / F.lit(float(hi) - float(lo))),
    ).cast("int")
    return (
        df.select(F.col(group_col), bin_.alias("bin"))
        .groupBy(group_col, "bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def hist_quantiles_from_counts(
    counts: DataFrame,
    lo: float,
    hi: float,
    group_col: str = "event_type",
    n_bins: int = 64,
) -> DataFrame:
    """p50/p90 midpoint estimates from (group, bin, c) sketch counts —
    the read side of the mergeable histogram: counts from any number of
    shards/batches are first added bin-wise, so the estimate depends only
    on the union, not on how it arrived."""
    from pyspark.sql import Window as W  # noqa: PLC0415

    merged = counts.groupBy(group_col, "bin").agg(F.sum("c").alias("c"))
    wcum = (
        W.partitionBy(group_col).orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
    )
    wall = W.partitionBy(group_col)
    cum = merged.withColumn("_cum", F.sum("c").over(wcum)).withColumn(
        "_n", F.sum("c").over(wall)
    )
    width = F.lit((float(hi) - float(lo)) / n_bins)
    mid = F.lit(float(lo)) + (F.col("bin") + F.lit(0.5)) * width

    def approx(q: float):
        r = F.ceil(F.lit(q) * F.col("_n"))
        return F.min(F.when(F.col("_cum") >= r, mid))

    return cum.groupBy(group_col).agg(
        F.max("_n").alias("n"),
        F.round(approx(0.5), 6).alias("approx_p50"),
        F.round(approx(0.9), 6).alias("approx_p90"),
    )
