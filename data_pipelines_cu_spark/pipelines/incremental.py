"""Incremental curation: the production daily-ingest wave.

Each wave of new documents is curated AGAINST PERSISTED STATE rather than
by rescanning the corpus: exact dedup anti-joins the admitted-digest
table, near-dup probes the admitted LSH band index, decontamination
screens against the benchmark, and the three state tables advance as
snapshot-isolated versioned-table commits keyed by the wave id — so a
crashed or replayed wave can never double-admit a document or tear the
state (operators/table.py commit protocol).

State is ADMITTED-ONLY by design, and that is self-consistent:
- an exact copy of a previously REJECTED near-dup is still caught,
  because it is a near-dup of the same admitted doc the original
  collided with (the band index holds admitted bands);
- a recurring contaminated doc is re-caught by the contamination screen
  (benchmark membership is stateless).

Scale: each wave shuffles digests/band hashes only (32-byte rows), the
benchmark grams broadcast, and state updates are unions of the prior
committed snapshot with the wave's admitted rows. Here the union rewrites
the snapshot (fixture-sized state); a production deployment appends a
wave partition to each state table instead — the commit protocol is
unchanged. Reference grounding: the course's backfill anti-join upsert
(lecture3/15:186-188), keyed on content and made stateful + transactional.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    contamination_hits,
    incremental_near_dup,
    normalized_text,
)
from ..operators.table import commit_batch, current_version, read_table


def _load_state(spark: SparkSession, path: str, schema: str) -> DataFrame:
    try:
        return read_table(spark, path)
    except FileNotFoundError:
        return spark.createDataFrame([], schema)


def ingest_wave(
    spark: SparkSession,
    new_docs: DataFrame,
    state_dir: str,
    wave_id: int,
    benchmark: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Run one curation wave; returns per-stage counts + state versions.
    Replay-safe: re-running a committed ``wave_id`` recomputes the same
    survivors from the same committed inputs and every commit no-ops."""
    corpus_path = f"{state_dir}/corpus"
    digest_path = f"{state_dir}/digests"
    bands_path = f"{state_dir}/bands"

    digests = _load_state(spark, digest_path, "content_hash string")
    bands = _load_state(spark, bands_path, "doc_id long, band int, bhash string")

    # 1. exact dedup: first occurrence in the wave, then anti-join the
    # admitted-digest table (32-byte keys only)
    inc = new_docs.select(
        F.col(id_col), F.md5(normalized_text(text_col)).alias("content_hash")
    )
    firsts = inc.groupBy("content_hash").agg(F.min(id_col).alias(id_col))
    fresh = firsts.join(
        digests.select("content_hash").distinct(), "content_hash", "left_anti"
    )
    s1 = new_docs.join(fresh.select(id_col), id_col)

    # 2. near-dup against the admitted band index (+ in-wave collisions)
    surviving_bands = incremental_near_dup(
        s1, bands, text_col=text_col, id_col=id_col
    ).localCheckpoint(eager=True)
    s2 = s1.join(surviving_bands.select(id_col).distinct(), id_col)

    # 3. benchmark decontamination (broadcast gram digests, stateless)
    if benchmark is not None:
        hits = contamination_hits(s2, benchmark, text_col=text_col, id_col=id_col)
        s3 = s2.join(hits.select(id_col), id_col, "left_anti")
    else:
        s3 = s2
    s3 = s3.localCheckpoint(eager=True)
    admitted_ids = s3.select(id_col)
    admitted_bands = surviving_bands.join(admitted_ids, id_col, "leftsemi")
    admitted_digests = inc.join(admitted_ids, id_col, "leftsemi").select(
        "content_hash"
    )

    # 4. transactional state advance — all keyed by wave_id (replay no-ops)
    commit_batch(s3, corpus_path, wave_id)
    commit_batch(
        digests.unionByName(admitted_digests).distinct(), digest_path, wave_id
    )
    commit_batch(bands.unionByName(admitted_bands), bands_path, wave_id)

    return {
        "wave_id": wave_id,
        "incoming": new_docs.count(),
        "after_exact": s1.count(),
        "after_near_dup": s2.count(),
        "admitted": s3.count(),
        "corpus_version": current_version(corpus_path),
        "digest_version": current_version(digest_path),
        "bands_version": current_version(bands_path),
    }


def read_corpus(spark: SparkSession, state_dir: str) -> DataFrame:
    """Union of every committed corpus wave (each wave is one version).
    Production keeps waves as partitions of one table; here versions ARE
    the waves, so the full corpus is their union."""
    from ..operators.table import table_versions

    corpus_path = f"{state_dir}/corpus"
    parts = [
        read_table(spark, corpus_path, version=v)
        for v in table_versions(corpus_path)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
