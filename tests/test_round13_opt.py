"""Focused tests for the round-13 OPTIMIZATION internals.

Each test pins an internal the optimization round changed, on the exact
property the rewrite could have broken: the relation-handle cache must
never serve stale data; the PQ argmin-as-aggregate must keep the window
formulation's tie-break; the widen guard must be a no-op on wide plans;
the carried-size jaccard must equal the joined-size formulation.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from data_pipelines_cu_spark import catalog
from data_pipelines_cu_spark.operators import dedup as dd
from data_pipelines_cu_spark.operators import similarity as sim


def test_table_handle_cache_hits_and_mtime_invalidation(spark, tmp_path):
    """The catalog cache returns the SAME handle for an unchanged file and
    a FRESH handle (new data visible) after an in-place rewrite — the
    staleness guard the (mtime, size) key exists for."""
    sf_dir = str(tmp_path)
    p = os.path.join(sf_dir, "nation.parquet")
    spark.createDataFrame(
        [(0, "A", 0, "x")],
        "n_nationkey long, n_name string, n_regionkey long, n_comment string",
    ).coalesce(1).write.mode("overwrite").parquet(p)
    df1 = catalog.load_table(spark, sf_dir, "nation")
    df2 = catalog.load_table(spark, sf_dir, "nation")
    assert df1 is df2, "unchanged file must hit the handle cache"
    assert df1.count() == 1
    # rewrite in place with different content: the stamp key must miss
    spark.createDataFrame(
        [(0, "A", 0, "x"), (1, "B", 1, "y")],
        "n_nationkey long, n_name string, n_regionkey long, n_comment string",
    ).coalesce(1).write.mode("overwrite").parquet(p)
    df3 = catalog.load_table(spark, sf_dir, "nation")
    assert df3.count() == 2, "rewritten file must not serve the stale handle"


def test_pq_assign_codes_tiebreak_matches_window_rule(spark):
    """min(struct(_d, cell, ...)) must reproduce the old row_number
    (_d asc, cell asc) winner EXACTLY — including on distance ties, where
    the LOWEST cell must win. Codebook: cells 5 and 2 both at distance 0
    from the vector; cell 2 wins; a strictly-closer cell beats both."""
    sub = spark.createDataFrame(
        [(1, 0, [1.0, 0.0]), (2, 0, [0.0, 1.0])],
        "vec_id long, j int, sv array<double>",
    )
    cent = spark.createDataFrame(
        [
            (0, 5, [1.0, 0.0]),  # distance 0 to vec 1, tie with cell 2
            (0, 2, [1.0, 0.0]),  # distance 0 to vec 1 — lower cell, must win
            (0, 7, [0.0, 1.0]),  # distance 0 to vec 2 (unique winner)
        ],
        "j int, cell long, cv array<double>",
    )
    won = {
        r["vec_id"]: r["cell"]
        for r in sim._pq_assign_codes(sub, cent, keys=("vec_id",)).collect()
    }
    assert won == {1: 2, 2: 7}
    # carried fields belong to the winning row
    rows = sim._pq_assign_codes(sub, cent, keys=("vec_id",)).collect()
    by_id = {r["vec_id"]: r for r in rows}
    assert by_id[1]["cv"] == [1.0, 0.0]
    assert by_id[2]["cv"] == [0.0, 1.0]


def test_widen_if_narrow_widens_and_noops(spark, tmp_path):
    """Narrow SCAN-ROOTED plans get defaultParallelism partitions;
    already-wide / shuffle-rooted plans pass through UNCHANGED (the
    at-scale no-op contract; since r14 the helper also refuses any plan
    with a barrier node — see test_round14_opt for that side)."""
    par = spark.sparkContext.defaultParallelism
    p = str(tmp_path / "narrow.parquet")
    spark.range(10).coalesce(1).write.parquet(p)
    narrow = spark.read.parquet(p)  # one tiny split -> 1-partition scan
    assert sim._widen_if_narrow(narrow).rdd.getNumPartitions() == par
    wide = spark.range(1000).repartition(par + 4)
    out = sim._widen_if_narrow(wide)
    assert out is wide, "a wide plan must not pay a second exchange"


def test_ngram_jaccard_carried_sizes_match_joined_sizes(spark):
    """The window-carried gram-set sizes must reproduce the old
    groupBy+join formulation bit-for-bit: same pairs, same jac."""
    docs = spark.createDataFrame(
        [
            (1, "en", "the quick brown fox jumps over the lazy dog"),
            (2, "en", "the quick brown fox jumps over a lazy dog"),
            (3, "en", "completely different text with no shared grams here"),
            (4, "de", "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, lang string, text string",
    )
    got = {
        (r["id_a"], r["id_b"]): r["jac"]
        for r in dd.ngram_jaccard_pairs(
            docs, block_col="lang", threshold=0.1
        ).collect()
    }
    # reference: independent pairwise computation over distinct gram sets
    sets = {
        r["doc_id"]: (set(r["grams"]), r["lang"])
        for r in dd.ngram_sets(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .collect()
    }
    expect = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ga, la = sets[a]
            gb, lb = sets[b]
            if la != lb:
                continue
            inter = len(ga & gb)
            union = len(ga) + len(gb) - inter
            jac = inter / union if union else 0.0
            if jac >= 0.1:
                expect[(a, b)] = round(jac, 6)
    assert got == pytest.approx(expect)
