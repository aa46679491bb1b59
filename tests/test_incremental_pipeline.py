"""Incremental curation waves against persisted versioned state
(pipelines/incremental.py): admitted-only state semantics, replay safety,
and rejected-content recurrence."""

from __future__ import annotations

from data_pipelines_cu_spark.pipelines import incremental as inc


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


BENCH_TEXT = "alpha beta gamma delta epsilon zeta"


def test_ingest_waves_dedupe_against_state(spark, tmp_path):
    state = str(tmp_path / "state")
    bench = _docs(spark, [(9000, BENCH_TEXT)])
    w1 = _docs(spark, [
        (1, "spark rows join group count window stream batch table scan"),
        (2, "one two three four five six seven eight nine ten"),
    ])
    r1 = inc.ingest_wave(spark, w1, state, wave_id=1, benchmark=bench)
    assert r1["admitted"] == 2 and r1["corpus_version"] == 1

    w2 = _docs(spark, [
        # exact dup of doc 1 (different id, same normalized text)
        (101, "spark rows join group count window stream batch table scan"),
        # near-dup of doc 2 (one word changed)
        (102, "one two three four five six seven eight nine eleven"),
        # contaminated: shares the 'alpha beta gamma' trigram with the bench
        (103, "report contains alpha beta gamma quoted from the benchmark"),
        # fresh
        (104, "completely different words about training data goes here"),
    ])
    r2 = inc.ingest_wave(spark, w2, state, wave_id=2, benchmark=bench)
    assert r2["after_exact"] == 3      # 101 dropped vs digest state
    assert r2["after_near_dup"] == 2   # 102 dropped vs band state
    assert r2["admitted"] == 1         # 103 dropped by decontamination
    corpus = {r.doc_id for r in inc.read_corpus(spark, state).collect()}
    assert corpus == {1, 2, 104}

    # replay wave 2 (crash before checkpoint commit): same inputs, same
    # committed state -> every table commit no-ops, corpus unchanged
    r2b = inc.ingest_wave(spark, w2, state, wave_id=2, benchmark=bench)
    assert r2b["corpus_version"] == r2["corpus_version"] == 2
    assert {r.doc_id for r in inc.read_corpus(spark, state).collect()} == {1, 2, 104}

    # wave 3: an exact copy of the REJECTED near-dup 102 must still be
    # rejected — it near-dups the admitted doc 2 via the band index
    # (admitted-only state is self-consistent)
    w3 = _docs(spark, [
        (202, "one two three four five six seven eight nine eleven"),
        (203, "yet another genuinely novel document for the third wave"),
    ])
    r3 = inc.ingest_wave(spark, w3, state, wave_id=3, benchmark=bench)
    assert r3["after_exact"] == 2      # 202's text was never ADMITTED
    assert r3["admitted"] == 1         # ...but its bands collide with doc 2
    assert {r.doc_id for r in inc.read_corpus(spark, state).collect()} == {1, 2, 104, 203}


def test_partial_crash_replay_cannot_tear_state(spark, tmp_path):
    """The ADVICE r3 scenario: a wave that crashes AFTER its state data is
    written but BEFORE the commit point must leave all three state tables
    unadvanced, and the replay must admit exactly what a clean run would —
    in particular the wave's band rows reach the index, so later near-dups
    of the wave's docs are still caught (the old three-independent-commits
    design permanently dropped them)."""
    from data_pipelines_cu_spark.operators import table as vt

    class CrashAtPublish(vt.LocalTableFS):
        def __init__(self):
            self.crash_next_put = False

        def put_text(self, path, text, if_match=None):
            if self.crash_next_put:
                self.crash_next_put = False
                raise RuntimeError("simulated crash at the commit point")
            super().put_text(path, text, if_match)

    fs = CrashAtPublish()
    state = str(tmp_path / "state")
    w1 = _docs(spark, [(1, "spark rows join group count window stream batch table scan")])
    inc.ingest_wave(spark, w1, state, wave_id=1, fs=fs)

    w2 = _docs(spark, [(2, "one two three four five six seven eight nine ten")])
    fs.crash_next_put = True
    try:
        inc.ingest_wave(spark, w2, state, wave_id=2, fs=fs)
        raise AssertionError("expected the simulated crash")
    except RuntimeError:
        pass
    # nothing advanced: corpus, digests, bands all still at wave 1
    assert {r.doc_id for r in inc.read_corpus(spark, state, fs=fs).collect()} == {1}
    assert set(vt.multi_table_batches(state, fs=fs)) == {"1"}

    # replay commits everything under one manifest put
    r2 = inc.ingest_wave(spark, w2, state, wave_id=2, fs=fs)
    assert r2["admitted"] == 1
    assert {r.doc_id for r in inc.read_corpus(spark, state, fs=fs).collect()} == {1, 2}

    # the replayed wave's bands are IN the index: a near-dup of doc 2
    # (one word changed) is rejected in wave 3
    w3 = _docs(spark, [(3, "one two three four five six seven eight nine eleven")])
    r3 = inc.ingest_wave(spark, w3, state, wave_id=3, fs=fs)
    assert r3["after_exact"] == 1 and r3["admitted"] == 0
    assert {r.doc_id for r in inc.read_corpus(spark, state, fs=fs).collect()} == {1, 2}


def test_read_corpus_ignores_orphans_and_empty_state(spark, tmp_path):
    """read_corpus resolves waves through the committed ledger, so an
    orphan corpus version from a crashed writer is never unioned (no
    double-count), and an empty state dir raises instead of IndexError."""
    import os

    import pytest

    state = str(tmp_path / "state")
    with pytest.raises(FileNotFoundError):
        inc.read_corpus(spark, state)
    w1 = _docs(spark, [(1, "spark rows join group count window stream batch table scan")])
    inc.ingest_wave(spark, w1, state, wave_id=1)
    # orphan: same rows landed again under v=2, manifest never flipped
    corpus_dir = os.path.join(state, "corpus")
    spark.read.parquet(os.path.join(corpus_dir, "v=1")).write.parquet(
        os.path.join(corpus_dir, "v=2")
    )
    rows = inc.read_corpus(spark, state).collect()
    assert [r.doc_id for r in rows] == [1]  # not doubled


def test_v2_waves_plus_replay_match_one_shot_shards(spark, sf_dir, tmp_path):
    """Curation v2 run incrementally: two waves (the second crash-injected
    at the commit point, then replayed) followed by materialize must
    produce BYTE-IDENTICAL shard assignments to the one-shot
    curation_v2_shards plan over the union corpus — the CDC gate, DSIR
    ranking, and shard order all resolve from committed summaries alone."""
    import pytest

    from data_pipelines_cu_spark.operators import table as vt
    from data_pipelines_cu_spark.queries import all_queries

    class CrashAtPublish(vt.LocalTableFS):
        def __init__(self):
            self.crash_next_put = False

        def put_text(self, path, text, if_match=None):
            if self.crash_next_put:
                self.crash_next_put = False
                raise RuntimeError("simulated crash at the commit point")
            super().put_text(path, text, if_match)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    w1 = docs.filter("doc_id % 2 = 0")
    w2 = docs.filter("doc_id % 2 = 1")
    state = str(tmp_path / "v2state")
    fs = CrashAtPublish()

    inc.ingest_wave_v2(spark, w1, state, wave_id=1, fs=fs)
    fs.crash_next_put = True
    with pytest.raises(RuntimeError, match="simulated crash"):
        inc.ingest_wave_v2(spark, w2, state, wave_id=2, fs=fs)
    # crash left wave 2 entirely uncommitted
    assert set(vt.multi_table_batches(state, fs=fs)) == {"1"}
    # replay commits all three summary tables under one manifest put
    r2 = inc.ingest_wave_v2(spark, w2, state, wave_id=2, fs=fs)
    assert set(vt.multi_table_batches(state, fs=fs)) == {"1", "2"}

    got = sorted(
        (r.doc_id, r.shard, r.pos)
        for r in inc.materialize_v2_shards(spark, state, fs=fs).collect()
    )
    want = sorted(
        (r.doc_id, r.shard, r.pos)
        for r in all_queries()["curation_v2_shards"].fn(spark, sf_dir).collect()
    )
    assert got == want and len(got) > 0

    # double-replay of an already-committed wave is a ledger no-op
    r2b = inc.ingest_wave_v2(spark, w2, state, wave_id=2, fs=fs)
    assert r2b["corpus_version"] == r2["corpus_version"]
