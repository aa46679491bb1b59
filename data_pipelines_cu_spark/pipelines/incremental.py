"""Incremental curation: the production daily-ingest wave.

Each wave of new documents is curated AGAINST PERSISTED STATE rather than
by rescanning the corpus: exact dedup anti-joins the admitted-digest
table, near-dup probes the admitted LSH band index, decontamination
screens against the benchmark, and ALL THREE state tables (corpus,
digests, bands) advance under ONE atomic multi-table commit keyed by the
wave id (operators/table.commit_batch_multi) — so a crashed or replayed
wave can never double-admit a document or tear the state. A crash at ANY
point either leaves no table advanced (the wave's data dirs are invisible
orphans; the replay recomputes from the same pre-wave committed state and
commits identical results) or all three advanced (the replay is a ledger
no-op). Three independent per-table commits would break this: a crash
between the digest and band commits makes the replay reload digest state
that already contains the wave, emptying the exact-dedup survivor set and
permanently omitting the wave's band rows.

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
from ..operators.table import (
    commit_batch_multi,
    multi_table_batches,
    read_multi_table,
)


def _load_state(spark: SparkSession, root: str, name: str, schema: str, fs=None):
    try:
        return read_multi_table(spark, root, name, fs=fs)
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
    fs=None,
) -> dict:
    """Run one curation wave; returns per-stage counts + state versions.
    Replay-safe: re-running a committed ``wave_id`` recomputes the same
    survivors from the same committed inputs and the single commit no-ops;
    a PARTIALLY-crashed wave (data written, manifest never flipped) leaves
    only invisible orphans, so the replay starts from identical pre-wave
    state for all three tables at once."""
    digests = _load_state(spark, state_dir, "digests", "content_hash string", fs)
    bands = _load_state(
        spark, state_dir, "bands", "doc_id long, band int, bhash string", fs
    )

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

    # 4. transactional state advance: ONE commit point for all three tables
    versions = commit_batch_multi(
        {
            "corpus": s3,
            "digests": digests.unionByName(admitted_digests).distinct(),
            "bands": bands.unionByName(admitted_bands),
        },
        state_dir,
        wave_id,
        fs=fs,
    )
    if versions is None:  # replayed, already-committed wave
        versions = multi_table_batches(state_dir, fs=fs)[str(wave_id)]

    return {
        "wave_id": wave_id,
        "incoming": new_docs.count(),
        "after_exact": s1.count(),
        "after_near_dup": s2.count(),
        "admitted": s3.count(),
        "corpus_version": versions["corpus"],
        "digest_version": versions["digests"],
        "bands_version": versions["bands"],
    }


def read_corpus(spark: SparkSession, state_dir: str, fs=None) -> DataFrame:
    """Union of every COMMITTED corpus wave, resolved through the batch
    ledger — never the on-disk directory listing, which can contain
    uncommitted orphans from crashed writers (reading those would
    double-count a crashed-then-replayed wave and expose torn data).
    Production keeps waves as partitions of one table; here versions ARE
    the waves, so the committed corpus is their union. Raises
    FileNotFoundError when no wave has ever committed."""
    ledger = multi_table_batches(state_dir, fs=fs)
    versions = sorted(
        vs["corpus"] for vs in ledger.values() if "corpus" in vs
    )
    if not versions:
        raise FileNotFoundError(f"no committed corpus waves at {state_dir}")
    parts = [
        read_multi_table(spark, state_dir, "corpus", version=v, fs=fs)
        for v in versions
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
