"""Connected-components dedup clustering and Arrow ANN parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_cu_spark.operators import dedup as dd
from data_pipelines_cu_spark.operators import similarity as sim


def test_dedup_clusters_chain_and_islands(spark):
    # chain 1-2-3 (transitive closure), island pair 10-11, singleton edge 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21)], ["id_a", "id_b"]
    )
    out = {r.doc_id: r.canonical_id for r in dd.dedup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_dedup_clusters_deep_chain_converges(spark):
    # path graph 0-1-2-...-9: worst-case diameter for label propagation
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], ["id_a", "id_b"]
    )
    out = {r.doc_id: r.canonical_id for r in dd.dedup_clusters(pairs).collect()}
    assert set(out.values()) == {0}


def test_near_dup_survivors_greedy(spark):
    docs = spark.createDataFrame([(i, f"d{i}") for i in range(5)], ["doc_id", "x"])
    pairs = spark.createDataFrame([(0, 3), (1, 4)], ["id_a", "id_b"])
    kept = {r.doc_id for r in dd.near_dup_survivors(docs, pairs).collect()}
    assert kept == {0, 1, 2}


def test_arrow_ann_matches_column_algebra(spark, tables):
    em = tables["embeddings"]
    queries = em.filter(F.col("vec_id") < 3)
    a = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in sim.cosine_topk(em, queries, k=4).collect()
    }
    b = {
        (r.query_id, r.rank): (r.neighbor_id, r.cos_sim)
        for r in sim.cosine_topk_arrow(em, queries, k=4).collect()
    }
    assert a == b


def test_dedup_clusters_long_chain_needs_pointer_doubling(spark):
    # path graph of 60 nodes: plain one-hop min-label propagation needs 59
    # rounds (> max_iter=20); the pointer-doubling step collapses it in
    # O(log n) rounds. Regression guard for the doubling.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(59)], ["id_a", "id_b"]
    )
    out = {r.doc_id: r.canonical_id for r in dd.dedup_clusters(pairs).collect()}
    assert set(out.values()) == {0}
