"""Similarity search over embedding columns (north-star set).

Brute-force cosine top-k as the correctness baseline and a sign-LSH
(random-hyperplane-style) bucketed variant as the scale path. Dot products
are sequential left-to-right double folds (F.aggregate over zip_with) so the
DuckDB oracle — a list comprehension with the same order — computes the
bit-identical value.

At 100 TB the brute-force path is a broadcast of the (small) query set
against a partitioned corpus scan — embarrassingly parallel, no shuffle
until the final per-query top-k; the LSH path prunes the corpus to matching
buckets first.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .aggregates import decimal_avg
from .windows import topk_per_group


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query set, score every
    (query, corpus) pair, per-query top-k via row_number. Excludes
    self-matches. Deterministic ties: (cos DESC, neighbor id ASC)."""
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    return topk_per_group(
        scored,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
    ).select("query_id", "neighbor_id", "cos_sim", "rank")


def sign_lsh_bucket(vec: Column, n_bits: int = 8) -> Column:
    """Axis-aligned sign bucket: the sign pattern of the first n_bits
    components. Kept as the degenerate baseline — on real embeddings the
    leading dimensions are correlated, so these buckets skew (see
    tests/test_operators.py bucket-balance test); production bucketing is
    ``random_hyperplane_bucket`` below."""
    bits = [
        F.when(F.element_at(vec, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(n_bits)
    ]
    return F.concat(*bits)


def seeded_hyperplanes(n_bits: int = 8, dim: int = 64, seed: int = 7) -> list[list[float]]:
    """Deterministic signed-random-projection hyperplanes: component (i, j)
    is ±1.0 from the parity of md5(seed:i:j) — reproducible across engines
    and sessions with no RNG state, and ±1.0 products are exact in IEEE
    doubles, so bucket bits are bit-stable (the repo's md5-derived-constant
    discipline, cf. operators/dedup.py affine hashes)."""
    import hashlib  # noqa: PLC0415

    return [
        [
            1.0
            if hashlib.md5(f"{seed}:{i}:{j}".encode()).digest()[0] % 2 == 0
            else -1.0
            for j in range(dim)
        ]
        for i in range(n_bits)
    ]


def random_hyperplane_bucket(
    vec: Column, planes: list[list[float]] | None = None
) -> Column:
    """Signed-random-projection LSH bucket: bit i = sign(<vec, plane_i>),
    planes from ``seeded_hyperplanes``. Unlike the axis-aligned pattern this
    mixes ALL dimensions into every bit, so correlated leading dims can't
    skew bucket occupancy. The projection is a left-to-right fold of exact
    ±component terms — bit-identical in any engine evaluating IEEE doubles
    left-associatively (the DuckDB twin is ``hyperplane_bucket_sql``)."""
    if planes is None:
        planes = seeded_hyperplanes()
    bits = []
    for plane in planes:
        proj = None
        for j, w in enumerate(plane):
            term = F.element_at(vec, j + 1).cast("double") * F.lit(w)
            proj = term if proj is None else proj + term
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def cosine_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed ANN: only corpus vectors in the query's LSH bucket are
    scored. Recall < 1 by design; the bucket join replaces the cross join so
    cost scales with bucket occupancy (corpus/2^bits per query). Buckets are
    seeded random hyperplanes (signed random projections), not axis-aligned
    sign patterns — balanced occupancy on correlated embedding dims."""
    planes = seeded_hyperplanes(n_bits=n_bits)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        random_hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        random_hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
    )
    return topk_per_group(
        scored,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
    ).select("query_id", "neighbor_id", "cos_sim", "rank")


def cosine_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Brute-force cosine top-k via an Arrow-batched numpy kernel — the
    high-throughput variant of cosine_topk for wide embeddings: one BLAS
    matmul per (batch × query set) instead of per-element column algebra.

    The query set is shipped to executors inside the closure (it is small
    by contract — the corpus never is); scoring is partition-local and the
    only shuffle is the final per-query top-k.
    """
    import numpy as np  # noqa: PLC0415
    import pandas as pd  # noqa: PLC0415

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[0] for r in q_rows])
    q_mat = np.array([r[1] for r in q_rows], dtype=np.float64)
    q_norm = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)

    def score(batches):
        for pdf in batches:
            c_mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            c_norm = np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = (c_mat / c_norm) @ q_norm.T  # (batch, n_queries)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(q_ids, n),
                    "neighbor_id": np.tile(pdf[id_col].to_numpy(), len(q_ids)),
                    "cos_sim": np.round(sims.T.ravel(), 6),
                }
            )

    scored = corpus.select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, neighbor_id long, cos_sim double"
    )
    scored = scored.filter(F.col("query_id") != F.col("neighbor_id"))
    return topk_per_group(
        scored,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
    ).select("query_id", "neighbor_id", "cos_sim", "rank")


def ivf_assign(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "cell",
    n_best: int = 1,
    centroid_id_col: str = "vec_id",
    centroid_vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its ``n_best`` nearest centroid cells by cosine
    (argmax via row_number; ties break on centroid id). The centroid set is
    broadcast — at 100 TB the corpus scan stays partition-local and the only
    shuffle is whatever the caller does with the cells."""
    c = F.broadcast(
        centroids.select(
            F.col(centroid_id_col).alias(out_col),
            F.col(centroid_vec_col).alias("_centroid_v"),
        )
    )
    scored = vectors.crossJoin(c).withColumn(
        "_cscore", cosine(F.col(vec_col), F.col("_centroid_v"))
    )
    best = topk_per_group(
        scored,
        [id_col],
        [F.col("_cscore").desc(), F.col(out_col).asc()],
        k=n_best,
        rank_col="_crank",
    )
    return best.drop("_centroid_v", "_cscore", "_crank")


def lloyd_refine(
    corpus: DataFrame,
    centroids: DataFrame,
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic Lloyd iterations: assign every corpus vector to its
    nearest centroid (cosine), recompute each cell's centroid as the
    element-wise mean of its members, repeat. Returns (cell, cv) with cell
    keeping the seed centroid's id.

    The per-component mean uses the decimal-sum discipline
    (aggregates.decimal_avg) so refined centroids are bit-identical across
    partitionings AND in the DuckDB oracle twin — which unrolls the same
    iterations as CTEs. Each iteration is one broadcast assign (no shuffle)
    plus one 512-group aggregate (n_cells × dim), so refinement cost is
    independent of corpus size per round and linear in corpus for the scan.
    Empty cells drop out, exactly as in the oracle's inner aggregation.
    """
    cents = centroids.select(F.col(id_col).alias("cell"), F.col(vec_col).alias("cv"))
    for _ in range(n_iters):
        assigned = ivf_assign(
            corpus.select(id_col, vec_col),
            cents,
            id_col=id_col,
            vec_col=vec_col,
            centroid_id_col="cell",
            centroid_vec_col="cv",
        )
        exploded = assigned.select(
            "cell", F.posexplode(F.col(vec_col)).alias("pos", "val")
        )
        means = exploded.groupBy("cell", "pos").agg(
            decimal_avg(F.col("val").cast("double")).alias("m")
        )
        cents = means.groupBy("cell").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda x: x["m"],
            ).alias("cv")
        )
    return cents


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    lloyd_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: corpus vectors are inverted-file-indexed by nearest centroid;
    each query scores only the corpus cells of its ``n_probe`` nearest
    centroids. Deterministic seeding — the ``n_centroids`` lowest-id vectors
    refined by ``lloyd_iters`` Lloyd rounds (decimal-mean, RNG-free) — so the
    index and the DuckDB oracle are exactly reproducible. Cost:
    corpus×centroids (broadcast, linear) + per-query work ~
    n_probe/n_centroids of the corpus instead of all of it.

    At scale the assignment step is materialized once (`ivf_assign` output
    written partitioned BY cell) and amortized across query batches.
    """
    seeds = corpus.filter(F.col(id_col) < n_centroids).select(id_col, vec_col)
    centroids = lloyd_refine(
        corpus, seeds, n_iters=lloyd_iters, id_col=id_col, vec_col=vec_col
    )
    indexed = ivf_assign(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")),
        centroids,
        id_col="neighbor_id",
        vec_col="cv",
        centroid_id_col="cell",
        centroid_vec_col="cv",
    )
    probes = ivf_assign(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")),
        centroids,
        id_col="query_id",
        vec_col="qv",
        n_best=n_probe,
        centroid_id_col="cell",
        centroid_vec_col="cv",
    )
    scored = (
        F.broadcast(probes)
        .join(indexed, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("cos_sim"),
        )
        # a (query, neighbor) pair can surface via several probed cells
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    return topk_per_group(
        scored,
        ["query_id"],
        [F.col("cos_sim").desc(), F.col("neighbor_id").asc()],
        k=k,
        rank_col="rank",
    ).select("query_id", "neighbor_id", "cos_sim", "rank")


# --- oracle SQL twins --------------------------------------------------------

def _cos_sql(av: str, bv: str) -> str:
    """Cosine with the same sequential double fold as the Spark side."""
    d = f"list_sum([CAST({av}[i] AS DOUBLE) * CAST({bv}[i] AS DOUBLE) for i in range(1, len({av}) + 1)])"
    na = f"sqrt(list_sum([CAST({av}[i] AS DOUBLE) * CAST({av}[i] AS DOUBLE) for i in range(1, len({av}) + 1)]))"
    nb = f"sqrt(list_sum([CAST({bv}[i] AS DOUBLE) * CAST({bv}[i] AS DOUBLE) for i in range(1, len({bv}) + 1)]))"
    return f"({d} / ({na} * {nb}))"


def cosine_topk_oracle_sql(
    k: int = 5, n_queries: int = 5, table: str = "embeddings"
) -> str:
    cos = _cos_sql("q.qv", "c.cv")
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM {table}
               WHERE vec_id < {n_queries}),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM {table}),
         scored AS (
            SELECT q.query_id, c.neighbor_id, ROUND({cos}, 6) AS cos_sim
            FROM q CROSS JOIN c WHERE q.query_id <> c.neighbor_id),
         ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cos_sim DESC, neighbor_id) AS rank
            FROM scored)
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {k}
    """


def sign_bucket_sql(vec: str, n_bits: int = 8) -> str:
    bits = " || ".join(
        f"(CASE WHEN {vec}[{i + 1}] >= 0 THEN '1' ELSE '0' END)" for i in range(n_bits)
    )
    return f"({bits})"


def hyperplane_bucket_sql(
    vec: str, planes: list[list[float]] | None = None
) -> str:
    """DuckDB twin of ``random_hyperplane_bucket``: the same ±1.0 literals
    in the same left-associative term order, so the projection doubles are
    bit-identical to Spark's."""
    if planes is None:
        planes = seeded_hyperplanes()
    bits = []
    for plane in planes:
        terms = " + ".join(
            f"CAST({vec}[{j + 1}] AS DOUBLE) * {w:.1f}" for j, w in enumerate(plane)
        )
        bits.append(f"(CASE WHEN ({terms}) >= 0 THEN '1' ELSE '0' END)")
    return "(" + " || ".join(bits) + ")"


def cosine_topk_ivf_oracle_sql(
    k: int = 5,
    n_queries: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    lloyd_iters: int = 2,
    table: str = "embeddings",
) -> str:
    """DuckDB twin of cosine_topk_ivf, Lloyd iterations unrolled as CTEs.
    The per-component centroid mean uses the identical decimal-sum/double-
    division as the Spark side, so refined centroids are bit-equal."""
    cos_assign = _cos_sql("v.emb", "cent.cv")
    cos_score = _cos_sql("p.qv", "ix.cv")
    ctes = [
        f"""cent0 AS (
        SELECT vec_id AS cell, embedding AS cv FROM {table}
        WHERE vec_id < {n_centroids})"""
    ]
    for i in range(1, lloyd_iters + 1):
        ctes.append(f"""la{i} AS (
        SELECT * FROM (
            SELECT v.vec_id, v.emb, cent.cell,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                       ORDER BY {cos_assign} DESC, cent.cell) AS r
            FROM (SELECT vec_id, embedding AS emb FROM {table}) v
            CROSS JOIN cent{i - 1} cent) WHERE r = 1)""")
        ctes.append(f"""cent{i} AS (
        SELECT cell, list(m ORDER BY pos) AS cv FROM (
            SELECT cell, pos,
                   CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(38,12)))
                        AS DOUBLE) / COUNT(val) AS m
            FROM (SELECT cell, unnest(emb) AS val,
                         generate_subscripts(emb, 1) AS pos FROM la{i})
            GROUP BY cell, pos)
        GROUP BY cell)""")
    final = f"cent{lloyd_iters}"
    ctes.append(f"""corpus_assign AS (
        SELECT v.vec_id AS neighbor_id, v.emb AS cv, cent.cell,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                   ORDER BY {cos_assign} DESC, cent.cell) AS r
        FROM (SELECT vec_id, embedding AS emb FROM {table}) v
        CROSS JOIN {final} cent)""")
    ctes.append("ix AS (SELECT neighbor_id, cv, cell FROM corpus_assign WHERE r = 1)")
    ctes.append(f"""query_assign AS (
        SELECT v.vec_id AS query_id, v.emb AS qv, cent.cell,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id
                   ORDER BY {cos_assign} DESC, cent.cell) AS r
        FROM (SELECT vec_id, embedding AS emb FROM {table}
              WHERE vec_id < {n_queries}) v CROSS JOIN {final} cent)""")
    ctes.append(
        f"p AS (SELECT query_id, qv, cell FROM query_assign WHERE r <= {n_probe})"
    )
    ctes.append(f"""scored AS (
        SELECT DISTINCT p.query_id, ix.neighbor_id,
               ROUND({cos_score}, 6) AS cos_sim
        FROM p JOIN ix ON p.cell = ix.cell
        WHERE p.query_id <> ix.neighbor_id)""")
    ctes.append("""ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos_sim DESC, neighbor_id) AS rank
        FROM scored)""")
    joined = ",\n    ".join(ctes)
    return f"""
    WITH {joined}
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {k}
    """


def cosine_topk_lsh_oracle_sql(
    k: int = 5, n_queries: int = 5, n_bits: int = 8, table: str = "embeddings"
) -> str:
    cos = _cos_sql("q.qv", "c.cv")
    bucket = hyperplane_bucket_sql("embedding", seeded_hyperplanes(n_bits=n_bits))
    return f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
                      {bucket} AS bucket
               FROM {table} WHERE vec_id < {n_queries}),
         c AS (SELECT vec_id AS neighbor_id, embedding AS cv,
                      {bucket} AS bucket
               FROM {table}),
         scored AS (
            SELECT q.query_id, c.neighbor_id, ROUND({cos}, 6) AS cos_sim
            FROM q JOIN c ON q.bucket = c.bucket
            WHERE q.query_id <> c.neighbor_id),
         ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                       ORDER BY cos_sim DESC, neighbor_id) AS rank
            FROM scored)
    SELECT query_id, neighbor_id, cos_sim, rank FROM ranked WHERE rank <= {k}
    """
