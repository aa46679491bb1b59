"""End-to-end training-data curation pipeline: the engine's curation
operators composed through the DAG runner (plans.pipeline) into the shape a
production pre-training data build takes.

ingest → quality gate → exact dedup → near dedup → decontaminate →
rebalance → pack, with a fan-in report stage. Every stage is a
DataFrame→DataFrame function handed between stages via the runner's XCom
context (no serialization inside one Spark app), and every stage is a plan
the correctness gate already verifies individually — this module is about
their COMPOSITION: ordering (cheap filters before expensive pair
generation), monotonically shrinking row counts, and one place to read the
whole flow.

Stage order is the cost argument for 100 TB: the Gopher gate and exact
dedup are linear scans that shrink the corpus before the (bucketed but
costlier) MinHash pair stage; decontamination broadcasts benchmark digests
against the already-deduped corpus; rebalancing and packing run last on the
smallest surviving set.

Reference grounding: the multi-stage DAG pattern mirrors the course's
umbrella pipeline (Solutions/chapter01/dags/01_umbrella.py:20-26) and the
gold-war ETL's fetch→clean→join→train chain (Solutions/gold_war_etl_dag.py);
the stages themselves are the engine's training-data extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..operators import dedup as dd
from ..operators import sampling as smp
from ..operators import text as tx
from ..plans.pipeline import Pipeline, Stage
from ..operators.materialize import lineage_cut


def build_curation_pipeline(
    spark: SparkSession,
    sf_dir: str,
    bench_source: str = "src0",
    seq_len: int = 256,
    sample_total: int = 400,
    contamination_n: int = 6,
) -> Pipeline:
    """Wire the curation DAG. Run with ``.run()``; the returned context
    holds every stage's output under its stage id plus a ``report`` dict
    of per-stage surviving doc counts.

    ``contamination_n=6``: decontamination matches ``n``-gram spans, and on
    the fixture's tiny vocabulary a trigram match is near-certain for every
    doc once the benchmark slice grows (sf0.1 would strip the corpus to
    zero) — 6-grams keep the stage selective, mirroring production's 8-13
    on natural text."""
    p = Pipeline("curation", max_parallel=4)

    def ingest(ctx):
        return load_table(spark, sf_dir, "documents")

    def quality_gate(ctx):
        docs = ctx["ingest"]
        verdicts = tx.gopher_quality_gate(docs)
        keep = verdicts.filter(F.col("passes") == 1).select("doc_id")
        return docs.join(keep, "doc_id", "left_semi")

    def exact_dedup(ctx):
        docs = ctx["quality_gate"]
        groups = dd.exact_dedup_groups(docs)
        return docs.join(
            groups.select(F.col("canonical_id").alias("doc_id")),
            "doc_id",
            "left_semi",
        )

    def near_dedup(ctx):
        docs = ctx["exact_dedup"]
        pairs = dd.minhash_lsh_pairs(docs, threshold=0.5)
        return dd.near_dup_survivors(docs, pairs)

    def decontaminate(ctx):
        docs = ctx["near_dedup"]
        corpus = docs.filter(F.col("source") != bench_source)
        bench = docs.filter(F.col("source") == bench_source)
        hits = dd.contamination_hits(corpus, bench, n=contamination_n)
        return corpus.join(hits.select("doc_id"), "doc_id", "left_anti")

    def rebalance(ctx):
        return smp.sqrt_scaled_quota_sample(
            ctx["decontaminate"], group_col="lang", key_col="doc_id",
            total=sample_total,
        ).drop("rk")

    def pack(ctx):
        docs = ctx["rebalance"]
        placed = tx.pack_sequences(docs.select("doc_id", "text"), seq_len=seq_len)
        return docs.join(placed.select("doc_id", "bin_id", "bin_offset"), "doc_id")

    def report(ctx):
        return {
            stage: ctx[stage].count()
            for stage in (
                "ingest", "quality_gate", "exact_dedup", "near_dedup",
                "decontaminate", "rebalance", "pack",
            )
        }

    p.add(Stage(id="ingest", fn=ingest))
    p.add(Stage(id="quality_gate", fn=quality_gate, upstream=["ingest"]))
    p.add(Stage(id="exact_dedup", fn=exact_dedup, upstream=["quality_gate"]))
    p.add(Stage(id="near_dedup", fn=near_dedup, upstream=["exact_dedup"]))
    p.add(Stage(id="decontaminate", fn=decontaminate, upstream=["near_dedup"]))
    p.add(Stage(id="rebalance", fn=rebalance, upstream=["decontaminate"]))
    p.add(Stage(id="pack", fn=pack, upstream=["rebalance"]))
    p.add(Stage(id="report", fn=report, upstream=["pack"]))
    return p


def run_curation(spark: SparkSession, sf_dir: str, **kwargs) -> dict:
    """Execute the curation DAG and return the final context."""
    return build_curation_pipeline(spark, sf_dir, **kwargs).run()


def curated_pack(
    spark: SparkSession,
    sf_dir: str,
    bench_source: str = "src0",
    seq_len: int = 256,
    sample_total: int = 400,
    contamination_n: int = 6,
) -> DataFrame:
    """The curation chain as ONE lazy DataFrame (no per-stage actions):
    gate → exact dedup → near dedup → decontaminate → rebalance → pack,
    ending at (doc_id, lang, source, bin_id, bin_offset). This is the form
    the correctness gate verifies end-to-end against the chained SQL oracle
    — the DAG-runner variant above materializes per-stage counts instead.
    """
    docs = load_table(spark, sf_dir, "documents")
    verdicts = tx.gopher_quality_gate(docs)
    d1 = docs.join(
        verdicts.filter(F.col("passes") == 1).select("doc_id"),
        "doc_id", "left_semi",
    )
    groups = dd.exact_dedup_groups(d1)
    d2 = d1.join(
        groups.select(F.col("canonical_id").alias("doc_id")), "doc_id",
        "left_semi",
    )
    # Stage boundaries are materialization points, exactly as the DAG-runner
    # variant persists each stage: d2 feeds both the pair generation and the
    # survivor anti-join, d3 both decontamination sides — without cuts every
    # branch re-executes the whole prefix chain (measured 3x the wall).
    d2 = d2.transform(lineage_cut)
    pairs = dd.minhash_lsh_pairs(d2, threshold=0.5)
    d3 = dd.near_dup_survivors(d2, pairs).transform(lineage_cut)
    corpus = d3.filter(F.col("source") != bench_source)
    bench = d3.filter(F.col("source") == bench_source)
    hits = dd.contamination_hits(corpus, bench, n=contamination_n)
    d4 = corpus.join(hits.select("doc_id"), "doc_id", "left_anti")
    d5 = smp.sqrt_scaled_quota_sample(
        d4, group_col="lang", key_col="doc_id", total=sample_total
    ).drop("rk")
    placed = tx.pack_sequences(d5.select("doc_id", "text"), seq_len=seq_len)
    return d5.select("doc_id", "lang", "source").join(
        placed.select("doc_id", "bin_id", "bin_offset"), "doc_id"
    )


def curated_pack_oracle_sql(
    bench_source: str = "src0",
    seq_len: int = 256,
    sample_total: int = 400,
    contamination_n: int = 6,
) -> str:
    """DuckDB twin of curated_pack: every stage's existing oracle SQL
    chained as CTEs (each builder parameterized by the previous stage's
    CTE name), proving the COMPOSITION end-to-end, not just each stage."""
    gate = tx.gopher_gate_oracle_sql(table="documents")
    pairs = dd.minhash_oracle_sql(table="docs2", threshold=0.5)
    hits = dd.contamination_oracle_sql(
        corpus_pred=f"source <> '{bench_source}'",
        benchmark_pred=f"source = '{bench_source}'",
        table="docs3",
        n=contamination_n,
    )
    samp = smp.sqrt_scaled_sample_sql(
        total=sample_total, table="docs4", group_expr="lang"
    )
    packed = tx.pack_sequences_oracle_sql(table="docs5", seq_len=seq_len)
    return f"""
    WITH gate AS MATERIALIZED ({gate}),
    docs1 AS MATERIALIZED (
        SELECT d.* FROM documents d
        JOIN gate g ON d.doc_id = g.doc_id AND g.passes = 1),
    firsts AS (
        SELECT MIN(doc_id) AS doc_id
        FROM docs1
        GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
    docs2 AS MATERIALIZED (SELECT d.* FROM docs1 d JOIN firsts USING (doc_id)),
    pairs AS MATERIALIZED ({pairs}),
    docs3 AS MATERIALIZED (
        SELECT * FROM docs2
        WHERE doc_id NOT IN (SELECT id_b FROM pairs)),
    hits AS MATERIALIZED ({hits}),
    docs4 AS MATERIALIZED (
        SELECT * FROM docs3
        WHERE source <> '{bench_source}'
          AND doc_id NOT IN (SELECT doc_id FROM hits)),
    samp AS MATERIALIZED ({samp}),
    docs5 AS MATERIALIZED (SELECT d.* FROM docs4 d JOIN samp s USING (doc_id)),
    packed AS ({packed})
    SELECT d.doc_id, d.lang, d.source, p.bin_id, p.bin_offset
    FROM docs5 d JOIN packed p USING (doc_id)
    """
