"""Graph operators: power-iteration PageRank with integer-exact arithmetic.

The reference's orchestration DAGs (e.g. Solutions/chapter05 fan-in/fan-out)
motivate graph-shaped analytics, but no reference operator computes graph
centrality; this module adds it as a first-class engine capability for the
entity-importance queries a curation pipeline runs over derived graphs
(dup-cluster graphs, source-link graphs, trade graphs).

Determinism contract: ranks are BIGINTs scaled by ``SCALE``; every step is
integer add / multiply / floor-divide, so the learned ranks hash-match the
oracle's unrolled-CTE iterations bit-for-bit (Spark ``div`` truncates, DuckDB
``//`` floors — identical on the nonnegative values used here).

Scale shape: the expensive part is EDGE DERIVATION (aggregating the fact
tables down to the edge list) — one shuffle keyed on (src, dst). Iterations
then join the rank table (node-dimension-sized, broadcast) back to the edge
list: each round is one broadcast join + one aggregate keyed on dst, with no
driver collect anywhere. Rounds are sequential by nature; at 100 TB you bound
the iteration count, not the data. Overflow bound: 85 * SCALE * max_edge_w
must fit int64 — at SCALE=1e12 that is max_edge_w < ~1e5; for heavier graphs
pre-normalize edge weights to per-src integer shares (same shape, smaller
factors) or lower SCALE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .materialize import lineage_cut

SCALE = 10**12
DAMP_NUM, DAMP_DEN = 85, 100  # damping 0.85 as an exact integer ratio


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iters: int = 3,
    scale: int = SCALE,
) -> DataFrame:
    """PageRank over ``nodes`` ("v") and weighted ``edges`` ("src", "dst",
    "w": long) — ``n_iters`` power-iteration rounds, damping 85/100,
    dangling mass redistributed uniformly. Returns (v, pr_scaled) with
    pr_scaled = rank * scale as an exact BIGINT.

    r_t(v) = (15*S) div (100*N)  +  SUM_{(u,v) in E} (85*r_{t-1}(u)*w) div
    (100*out(u))  +  (85*dangling_{t-1}) div (100*N), starting from
    r_0 = S div N. Every divide is a floor-divide of nonnegative integers,
    applied per edge term on BOTH sides, so the fixpoint trajectory is
    engine-portable.

    The edge-derived tables are materialized ONCE (localCheckpoint, the
    CC-loop discipline): ``ew``/``outs`` are consumed by every iteration
    (contrib join + dangling anti-join), and without the cut each
    consumer recompiled the caller's WHOLE edge-derivation subtree —
    round 11's executed-plan audit measured 14 file scans in one run of
    the nation-trade query (the 4-table fact join compiled per
    iteration per consumer), vs 5 after. Both tables are edge-sized —
    the natural thing an iterative algorithm persists; the rank table
    is checkpointed per round (node-sized) so plan depth stays flat in
    n_iters instead of nesting the full prior-round plan."""
    edges = edges.transform(lineage_cut)
    nodes = nodes.transform(lineage_cut)  # consumed 1 + n_iters times
    outs = edges.groupBy("src").agg(F.sum("w").alias("outw")).transform(lineage_cut)
    ew = edges.join(outs, "src").transform(lineage_cut)
    nn = nodes.agg(F.count(F.lit(1)).alias("n_nodes"))
    r = nodes.crossJoin(F.broadcast(nn)).select(
        "v", F.expr(f"CAST({scale} AS BIGINT) div n_nodes").alias("r")
    )
    for _ in range(n_iters):
        prev = r
        contrib = (
            ew.join(F.broadcast(prev.withColumnRenamed("v", "src")), "src")
            .select(
                F.col("dst").alias("v"),
                F.expr(
                    f"({DAMP_NUM} * r * w) div ({DAMP_DEN} * outw)"
                ).alias("c"),
            )
            .groupBy("v")
            .agg(F.sum("c").alias("contrib"))
        )
        dangling = prev.join(
            outs.withColumnRenamed("src", "v"), "v", "left_anti"
        ).agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dang"))
        r = (
            nodes.join(contrib, "v", "left")
            .crossJoin(F.broadcast(nn))
            .crossJoin(F.broadcast(dangling))
            .select(
                "v",
                (
                    F.expr(
                        f"({100 - DAMP_NUM} * CAST({scale} AS BIGINT))"
                        f" div ({DAMP_DEN} * n_nodes)"
                    )
                    + F.coalesce(F.col("contrib"), F.lit(0))
                    + F.expr(f"({DAMP_NUM} * dang) div ({DAMP_DEN} * n_nodes)")
                )
                .cast("long")
                .alias("pr_scaled"),
            )
            .withColumnRenamed("pr_scaled", "r")
            # node-sized cut per round: keeps every iteration's plan the
            # same shape instead of nesting the full prior-round subtree
            .transform(lineage_cut)
        )
    return r.select("v", F.col("r").alias("pr_scaled"))


def pagerank_iter_ctes(
    n_iters: int = 3, scale: int = SCALE
) -> tuple[list[str], str]:
    """Shared oracle fragment: the unrolled iteration CTEs over pre-defined
    ``edges``(src,dst,w) / ``outs``(src,outw) / ``nodes``(v) / ``nn``
    (n_nodes) CTEs. Returns (cte_list, final_rank_cte_name)."""
    d, h = DAMP_NUM, DAMP_DEN
    ctes = [
        f"r0 AS (SELECT v, CAST({scale} // (SELECT n_nodes FROM nn)"
        " AS BIGINT) AS r FROM nodes)"
    ]
    for t in range(1, n_iters + 1):
        p = f"r{t - 1}"
        ctes.append(
            f"c{t} AS (SELECT e.dst AS v, CAST(SUM(({d} * p.r * e.w)"
            f" // ({h} * o.outw)) AS BIGINT) AS contrib"
            f" FROM edges e JOIN {p} p ON e.src = p.v"
            " JOIN outs o ON e.src = o.src GROUP BY 1)"
        )
        ctes.append(
            f"d{t} AS (SELECT CAST(COALESCE(SUM(p.r), 0) AS BIGINT) AS dang"
            f" FROM {p} p LEFT JOIN outs o ON p.v = o.src"
            " WHERE o.src IS NULL)"
        )
        ctes.append(
            f"r{t} AS (SELECT n.v, CAST(({100 - d} * CAST({scale} AS BIGINT))"
            f" // ({h} * (SELECT n_nodes FROM nn))"
            " + COALESCE(c.contrib, 0)"
            f" + ({d} * (SELECT dang FROM d{t}))"
            f" // ({h} * (SELECT n_nodes FROM nn)) AS BIGINT) AS r"
            f" FROM nodes n LEFT JOIN c{t} c ON n.v = c.v)"
        )
    return ctes, f"r{n_iters}"


def nation_trade_pagerank_oracle_sql(n_iters: int = 3) -> str:
    """DuckDB twin of the nation-trade PageRank query: identical edge
    aggregation, identical unrolled integer iterations."""
    iter_ctes, last = pagerank_iter_ctes(n_iters)
    base = [
        "edges AS MATERIALIZED ("
        " SELECT c.c_nationkey AS src, s.s_nationkey AS dst,"
        " CAST(COUNT(*) AS BIGINT) AS w"
        " FROM lineitem l"
        " JOIN orders o ON l.l_orderkey = o.o_orderkey"
        " JOIN customer c ON o.o_custkey = c.c_custkey"
        " JOIN supplier s ON l.l_suppkey = s.s_suppkey"
        " GROUP BY 1, 2)",
        "outs AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw"
        " FROM edges GROUP BY 1)",
        "nodes AS (SELECT n_nationkey AS v, n_name FROM nation)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes FROM nodes)",
    ]
    joined = ",\n    ".join(base + iter_ctes)
    return f"""
    WITH {joined}
    SELECT n.n_name, r.r AS pr_scaled
    FROM {last} r JOIN nodes n ON r.v = n.v
    """


# --- Co-occurrence mining (market basket) ------------------------------------
# "Parts ordered together": the association signal behind related-items.
# Lift is kept as ONE exact-integer-product ratio — (c_ab * n_baskets) /
# (c_a * c_b) — a single double division, no logs, so the report
# hash-gates (the bigram_lift discipline applied to baskets instead of
# sequences).


def co_occurrence_lift(
    df,
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    top_n: int = 50,
):
    """Top-``top_n`` item pairs by within-basket co-occurrence:
    (item_a, item_b, pair_count, lift, rank). Pairs generate per basket
    over the DISTINCT item list (C(items, 2) rows per basket — bounded by
    basket width, never |items|²), count by pair key, then the per-item
    count table joins back twice. Ties: count DESC, item_a, item_b."""
    from .windows import take_ordered  # noqa: PLC0415 (cycle guard)

    # Materialize the distinct (basket, item) table once: its three
    # consumers (basket total, per-item counts, the pair self-join) each
    # carry DIFFERENT partial aggregates below the exchange, so exchange
    # reuse never fires and the source was scanned three times (measured:
    # 3 x ~0.5 s map stages at sf0.1). Two longs per row compresses well
    # below the source — the §3 compress-before-checkpoint rule holds.
    items = (
        df.select(F.col(basket_col).alias("_b"), F.col(item_col).alias("_i"))
        .distinct()
        .transform(lineage_cut)
    )
    # basket total as an IN-PLAN broadcast 1-row aggregate (the oracle's
    # nb CTE shape) — the old driver-side distinct().count() was a
    # separate full-scan action (measured 2.6 s at sf0.1) run before the
    # plan could even start, for a value the plan only needs as a scalar.
    # NULL semantics (ADVICE r13): count_distinct ignores a NULL basket,
    # which MATCHES the oracle's COUNT(DISTINCT b) — the old distinct()
    # .count() would have over-counted by one on a nullable basket_col.
    # (The pair join on _b drops NULL baskets on both engines either way;
    # the fixture's l_orderkey is non-null by construction.)
    n_baskets = items.agg(F.count_distinct(F.col("_b")).alias("_nb"))
    item_counts = items.groupBy("_i").agg(F.count(F.lit(1)).alias("_c"))
    a = items.select("_b", F.col("_i").alias("item_a"))
    b = items.select("_b", F.col("_i").alias("item_b"))
    pairs = (
        a.join(b, "_b")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    ca = item_counts.select(F.col("_i").alias("item_a"), F.col("_c").alias("_ca"))
    cb = item_counts.select(F.col("_i").alias("item_b"), F.col("_c").alias("_cb"))
    order = [
        F.col("pair_count").desc(), F.col("item_a").asc(),
        F.col("item_b").asc(),
    ]
    lifted = (
        pairs.join(ca, "item_a")
        .join(cb, "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "pair_count",
            F.round(
                (F.col("pair_count") * F.col("_nb")).cast("double")
                / (F.col("_ca") * F.col("_cb")).cast("double"),
                6,
            ).alias("lift"),
        )
    )
    # guarded top-n selection + rank: TakeOrderedAndProject below the
    # topKSortFallbackThreshold, blocked rank past it — the pair table
    # never single-task sorts either way
    return take_ordered(lifted, order, top_n, rank_col="rank")


def co_occurrence_sql(
    table: str = "lineitem",
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    top_n: int = 50,
) -> str:
    """DuckDB twin of co_occurrence_lift."""
    return f"""
    WITH items AS (
        SELECT DISTINCT {basket_col} AS b, {item_col} AS i FROM {table}
    ),
    nb AS (SELECT COUNT(DISTINCT b) AS n FROM items),
    ic AS (SELECT i, COUNT(*) AS c FROM items GROUP BY i),
    pairs AS (
        SELECT a.i AS item_a, b.i AS item_b, COUNT(*) AS pair_count
        FROM items a JOIN items b ON a.b = b.b AND a.i < b.i
        GROUP BY 1, 2
    ),
    ranked AS (
        SELECT item_a, item_b,
               CAST(pair_count AS BIGINT) AS pair_count,
               ROUND(CAST(pair_count * nb.n AS DOUBLE)
                     / CAST(ca.c * cb.c AS DOUBLE), 6) AS lift,
               ROW_NUMBER() OVER (ORDER BY pair_count DESC, item_a, item_b)
                   AS rank
        FROM pairs
        JOIN ic ca ON ca.i = pairs.item_a
        JOIN ic cb ON cb.i = pairs.item_b
        CROSS JOIN nb
    )
    SELECT item_a, item_b, pair_count, lift, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= {top_n}
    """


# --- Triangle counting (co-occurrence graph cohesion) ------------------------
# The classic graph-cohesion statistic: triangles in the thresholded
# co-order graph mark part COMMUNITIES (three parts that pairwise travel
# together), where pair counts alone only mark affinities. Distributed
# shape: the standard oriented-edge join — every edge is stored once with
# src < dst, so each triangle {a<b<c} is produced by exactly one join
# chain (a,b)+(b,c)+(a,c) and no post-dedup is needed.


def cooccurrence_triangles(
    fact: DataFrame,
    basket_col: str,
    item_col: str,
    min_count: int = 2,
    top_n: int = 20,
) -> DataFrame:
    """(item, n_triangles) for the ``top_n`` items by triangle
    participation (ties broken by item id): edges are item pairs sharing
    ≥ ``min_count`` baskets, oriented small-id → large-id; triangles come
    from two self-joins of the oriented edge list. The threshold keeps
    the edge list duplicate-density-sized — the fact table shuffles once
    into pairs and never again; both self-joins run on the (small) edge
    relation, shuffle-keyed on single item ids."""
    # Materialize the projected (basket, item) base ONCE: the self-join's
    # two sides are structurally identical but exchange reuse does not
    # fire across their differing output aliases (measured r14: 2 fact
    # scans in the cut job), so both sides re-scanned the fact. Two
    # longs/row compresses far below the source (§3 doctrine) — the
    # parts_co_ordered treatment applied to the triangle counter.
    base = fact.select(
        F.col(basket_col).alias("_bk"), F.col(item_col).alias("_i")
    ).transform(lineage_cut)
    pairs = (
        base.select("_bk", F.col("_i").alias("_ia"))
        .join(base.select("_bk", F.col("_i").alias("_ib")), "_bk")
        .filter(F.col("_ia") < F.col("_ib"))
        .groupBy("_ia", "_ib")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("_c") >= min_count)
        .select("_ia", "_ib")
        .transform(lineage_cut)  # feeds three join roles
    )
    tri = (
        pairs.select(F.col("_ia").alias("a"), F.col("_ib").alias("b"))
        .join(
            pairs.select(F.col("_ia").alias("b"), F.col("_ib").alias("c")),
            "b",
        )
        .join(
            pairs.select(F.col("_ia").alias("a"), F.col("_ib").alias("c")),
            ["a", "c"],
        )
    )
    from .windows import take_ordered  # noqa: PLC0415 (cycle guard)

    melted = tri.select(
        F.explode(F.array("a", "b", "c")).alias("item")
    )
    counted = melted.groupBy("item").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    # guarded top-n selection: TakeOrderedAndProject below the threshold,
    # blocked rank past it — never a global sort of the item count table
    return take_ordered(
        counted, [F.col("n_triangles").desc(), F.col("item")], top_n
    ).select("item", "n_triangles")


def cooccurrence_triangles_sql(
    table: str = "lineitem",
    basket_col: str = "l_orderkey",
    item_col: str = "l_partkey",
    min_count: int = 2,
    top_n: int = 20,
) -> str:
    """DuckDB twin of cooccurrence_triangles (same oriented edges, same
    join chain, same deterministic top-n)."""
    return f"""
    WITH pairs AS (
        SELECT a.{item_col} AS ia, b.{item_col} AS ib
        FROM {table} a JOIN {table} b
          ON a.{basket_col} = b.{basket_col} AND a.{item_col} < b.{item_col}
        GROUP BY 1, 2 HAVING COUNT(*) >= {min_count}
    ),
    tri AS (
        SELECT e1.ia AS a, e1.ib AS b, e2.ib AS c
        FROM pairs e1
        JOIN pairs e2 ON e2.ia = e1.ib
        JOIN pairs e3 ON e3.ia = e1.ia AND e3.ib = e2.ib
    ),
    counted AS (
        SELECT item, CAST(COUNT(*) AS BIGINT) AS n_triangles
        FROM (SELECT a AS item FROM tri UNION ALL
              SELECT b FROM tri UNION ALL
              SELECT c FROM tri)
        GROUP BY item
    )
    SELECT item, n_triangles
    FROM (SELECT item, n_triangles,
                 ROW_NUMBER() OVER (ORDER BY n_triangles DESC, item) AS rk
          FROM counted)
    WHERE rk <= {top_n}
    """
