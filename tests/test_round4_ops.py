"""Unit/property tests for the round-4 operator additions — invariants the
oracle gate can't see (code ranges, draw totals, shard balance, BPE merge
mechanics, CDC shift-robustness)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_cu_spark.operators import dedup as dd
from data_pipelines_cu_spark.operators import sampling as smp
from data_pipelines_cu_spark.operators import similarity as sim
from data_pipelines_cu_spark.operators import text as tx


def test_sq8_codes_are_bytes(spark, sf_dir):
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b = sim.sq8_bounds(em)
    codes = (
        em.crossJoin(F.broadcast(b))
        .select(sim.sq8_codes(F.col("embedding"), F.col("mn"), F.col("mx")).alias("c"))
    )
    row = codes.agg(
        F.min(F.array_min("c")).alias("lo"),
        F.max(F.array_max("c")).alias("hi"),
        F.min(F.size("c")).alias("d"),
    ).first()
    assert row["lo"] >= 0 and row["hi"] <= 255 and row["d"] == 64


def test_sq8_reconstruction_error_is_small(spark, sf_dir):
    """255-level quantization on these embeddings must keep top-k cosine
    within a small absolute error of exact (the contract the query
    reports; here we pin an upper bound so a quantizer bug that still
    hash-matches its own oracle cannot pass silently)."""
    em = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    worst = sim.cosine_topk_sq8(em, k=5, n_queries=5).agg(
        F.max("abs_err").alias("e")
    ).first()["e"]
    assert worst < 0.05, f"sq8 cosine error too large: {worst}"


def test_systematic_draws_total_exactly_n(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = smp.systematic_weighted_sample(docs, weight_col="n_chars", n_draws=100)
    row = out.agg(F.sum("n_picks").alias("t"), F.max("n_picks").alias("m")).first()
    assert row["t"] == 100  # systematic sampling draws EXACTLY n
    assert row["m"] >= 1


def test_systematic_multiplicity_tracks_weight(spark, sf_dir):
    """A row's expected multiplicity is weight/step; the realized count
    can differ by at most 1 from floor(weight/step)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = docs.agg(F.sum("n_chars")).first()[0]
    step = total / 100.0
    rows = smp.systematic_weighted_sample(
        docs, weight_col="n_chars", n_draws=100
    ).collect()
    for r in rows:
        lo = int(r["weight"] // step)
        assert lo <= r["n_picks"] <= lo + 1


def test_training_shard_order_partitions_everything(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = smp.training_shard_order(docs)
    n = docs.count()
    assert out.count() == n
    # positions are dense 1..count within each shard
    chk = out.groupBy("shard").agg(
        F.count(F.lit(1)).alias("c"), F.max("pos").alias("m"), F.min("pos").alias("lo")
    )
    bad = chk.filter((F.col("c") != F.col("m")) | (F.col("lo") != 1)).count()
    assert bad == 0


def test_bpe_merge_application_is_boundary_safe(spark):
    """Merging (b, c) must not fire inside 'ab c' (symbol 'ab' ends in
    'b'): the separator-wrapped representation prevents cross-symbol
    matches by construction."""
    df = spark.createDataFrame([("ab c ab c x",)], "text string")
    # corpus: words 'ab','c','x' — chars a,b,c,x; top pair is (a,b)
    out = {r["merge_rank"]: r for r in tx.bpe_merges(df, n_merges=2).collect()}
    assert out[1]["left_sym"] == "a" and out[1]["right_sym"] == "b"
    # after merging 'a b'->'ab' every word is a single symbol: NO further
    # merge may exist — a boundary-leaking replace would manufacture a
    # phantom 'b c' (or similar) cross-word adjacency here
    assert list(out) == [1]


def test_cdc_chunks_realign_after_insertion(spark):
    """The CDC property fixed windows lack: inserting one token near the
    head leaves most chunks identical."""
    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    edited = "INSERTED " + base
    df = spark.createDataFrame(
        [(1, base.strip()), (2, edited.strip())], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r for r in dd.cdc_chunk_stats(df, divisor=4).collect()
    }
    # the two docs share most chunks -> high dup fraction on both sides
    assert out[1]["dup_fraction"] > 0.5
    assert out[2]["dup_fraction"] > 0.5


def test_importance_weights_favor_target_like_docs(spark, sf_dir):
    """Docs in the target language must dominate the top of the ranking
    (their token distribution IS the target distribution)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    top = smp.importance_weighted_sample(
        docs, target_pred=F.col("lang") == "en", top_n=20
    )
    en = top.filter(F.col("lang") == "en").count()
    assert en >= 10, f"only {en}/20 top importance docs are English"
