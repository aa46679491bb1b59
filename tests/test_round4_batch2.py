"""Semantic tests for the round-4 second batch: PageRank, TV drift,
k-anonymity, longest duplicated span (the oracle-parity gate is covered by
test_queries_oracle; these pin the operator SEMANTICS on hand-built data)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_cu_spark.operators import dedup as dd
from data_pipelines_cu_spark.operators import graph as gr
from data_pipelines_cu_spark.operators import privacy as pv
from data_pipelines_cu_spark.operators import text as tx


def test_pagerank_uniform_cycle_is_uniform(spark):
    # 4-cycle with equal weights: symmetry => all ranks equal, and the
    # total stays within floor-division slack of SCALE.
    nodes = spark.createDataFrame([(i,) for i in range(4)], "v long")
    edges = spark.createDataFrame(
        [(i, (i + 1) % 4, 1) for i in range(4)], "src long, dst long, w long"
    )
    rows = gr.pagerank(nodes, edges, n_iters=3).collect()
    ranks = {r["v"]: r["pr_scaled"] for r in rows}
    assert len(set(ranks.values())) == 1
    total = sum(ranks.values())
    assert gr.SCALE - 100 <= total <= gr.SCALE


def test_pagerank_sink_gains_rank(spark):
    # 0->2, 1->2: node 2 receives everything; it must outrank its sources,
    # and its own (dangling) mass redistributes instead of leaking.
    nodes = spark.createDataFrame([(0,), (1,), (2,)], "v long")
    edges = spark.createDataFrame(
        [(0, 2, 1), (1, 2, 1)], "src long, dst long, w long"
    )
    ranks = {r["v"]: r["pr_scaled"] for r in gr.pagerank(nodes, edges).collect()}
    assert ranks[2] > ranks[0] == ranks[1] > 0
    assert sum(ranks.values()) > gr.SCALE * 0.99


def test_tv_drift_identical_sources_zero_disjoint_half(spark):
    docs = spark.createDataFrame(
        [(1, "a b", "A"), (2, "a b", "B")],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in tx.source_tv_drift(docs).collect()}
    assert rows["A"]["tv_vs_corpus"] == 0.0 == rows["B"]["tv_vs_corpus"]
    disjoint = spark.createDataFrame(
        [(1, "a a", "A"), (2, "b b", "B")],
        "doc_id long, text string, source string",
    )
    rows = {r["source"]: r for r in tx.source_tv_drift(disjoint).collect()}
    # each source's distribution is at TV 1/2 from the pooled corpus
    assert rows["A"]["tv_vs_corpus"] == 0.5 == rows["B"]["tv_vs_corpus"]
    assert rows["A"]["n_tokens"] == 2


def test_k_anonymity_histogram_partitions_rows(spark):
    df = spark.createDataFrame(
        [("x", 1, "s1"), ("x", 1, "s2"), ("x", 1, "s1"), ("y", 2, "s1")],
        "qa string, qb long, sens string",
    )
    rows = {
        r["grp_size"]: r
        for r in pv.k_anonymity_histogram(df, ["qa", "qb"], "sens", k=3).collect()
    }
    assert rows[3]["n_groups"] == 1 and rows[3]["n_rows"] == 3
    assert rows[3]["min_l"] == 2 and not rows[3]["violates_k"]
    assert rows[1]["violates_k"] and rows[1]["min_l"] == 1
    assert sum(r["n_rows"] for r in rows.values()) == df.count()


def test_longest_dup_span_finds_contiguous_block(spark):
    # doc 1 and doc 2 share a verbatim 10-word block => runs of 3
    # consecutive duplicated 8-grams (positions 0,1,2), span = 10 tokens.
    block = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    docs = spark.createDataFrame(
        [
            (1, block + " unique1 tail1 a b c d e f"),
            (2, "head2 lead2 " + block + " other2 x y z q r"),
            (3, "no dup here at all just words"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dd.longest_dup_span(docs, n=8).collect()}
    assert rows[1]["longest_dup_run"] == 3
    assert rows[1]["longest_dup_span_tokens"] == 10
    assert rows[2]["longest_dup_run"] == 3
    assert rows[3]["longest_dup_run"] == 0 == rows[3]["n_dup_grams"]
    assert rows[3]["longest_dup_span_tokens"] == 0


def test_pagerank_final_plan_is_materialized(spark):
    """Round 11 changed pagerank's contract: every iteration's joins
    (rank broadcast onto cached edges) execute at BUILD time behind
    per-round localCheckpoints, so the returned frame is a select over
    the materialized rank table — zero exchanges, zero scans for any
    number of downstream consumers (the old test asserted a broadcast
    in the FINAL lazy plan, which no longer exists by design; the
    broadcast now happens inside each round's checkpoint build —
    F.broadcast(prev) in operators/graph.py). On a symmetric 4-cycle
    every node's rank is identical and mass is conserved up to
    floor-division slack."""
    nodes = spark.createDataFrame([(i,) for i in range(4)], "v long")
    edges = spark.createDataFrame(
        [(i, (i + 1) % 4, 1) for i in range(4)], "src long, dst long, w long"
    )
    ranks = gr.pagerank(nodes, edges, n_iters=2)
    plan = ranks._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan
    assert "Exchange" not in plan and "FileScan" not in plan
    vals = [r.pr_scaled for r in ranks.collect()]
    assert len(set(vals)) == 1 and len(vals) == 4  # symmetry
    assert abs(sum(vals) - gr.SCALE) <= 4 * 4  # floor-div slack only
