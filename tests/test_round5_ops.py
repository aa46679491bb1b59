"""Round-5 regression tests: ADVICE fixes (greedy BPE fold, small-corpus
oracle parity, EWMA tie order, histogram degenerate guard) and new ops."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from data_pipelines_cu_spark.operators import aggregates as ag
from data_pipelines_cu_spark.operators import sketches as sk
from data_pipelines_cu_spark.operators import text as tx


def test_bpe_merges_adjacent_occurrences(spark):
    """'abab' must merge BOTH (a,b) occurrences in round 1 (the old
    literal-replace consumed the shared boundary and left the second),
    so round 2's top pair is (ab, ab)."""
    df = spark.createDataFrame([("abab abab",)], "text string")
    out = {r["merge_rank"]: r for r in tx.bpe_merges(df, n_merges=2).collect()}
    assert out[1]["left_sym"] == "a" and out[1]["right_sym"] == "b"
    assert out[2]["left_sym"] == "ab" and out[2]["right_sym"] == "ab"
    assert out[2]["merged"] == "abab"


def test_bpe_repeated_symbol_run_is_greedy(spark):
    """'aaaa' with merge (a,a): greedy left-to-right gives [aa, aa], so
    round 2 merges (aa, aa). The old replace gave [aa, a, a] whose round-2
    argmax was (a, a) again — a different (wrong) merge table."""
    df = spark.createDataFrame([("aaaa",)], "text string")
    out = {r["merge_rank"]: r for r in tx.bpe_merges(df, n_merges=2).collect()}
    assert (out[1]["left_sym"], out[1]["right_sym"]) == ("a", "a")
    assert (out[2]["left_sym"], out[2]["right_sym"]) == ("aa", "aa")


def test_bpe_encode_greedy_compression(spark):
    """Full-word merge chain: 'aaaa' -> 1 symbol after two merges."""
    df = spark.createDataFrame([(1, "aaaa")], "doc_id long, text string")
    row = tx.bpe_encode_stats(df, n_merges=2).collect()[0]
    assert row["n_chars"] == 4
    assert row["n_syms"] == 1
    assert row["compression_ratio"] == 0.25


def _tiny_duck(rows):
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, '{t}')" for i, t in rows)
        + ") AS t(doc_id, text)"
    )
    return con


def test_bpe_oracle_parity_when_corpus_exhausts_merges(spark):
    """Corpus realizes fewer merges than n_merges: the Spark loop breaks;
    the unrolled oracle's empty t{k} rounds must no-op (not NULL-poison
    every downstream row — the old replace(s, NULL, ...) did)."""
    from tests.util import rows_key

    rows = [(1, "ab"), (2, "ab ab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    con = _tiny_duck(rows)
    for sdf, sql in [
        (tx.bpe_merges(df, n_merges=6), tx.bpe_oracle_sql(n_merges=6)),
        (
            tx.bpe_encode_stats(df, n_merges=6),
            tx.bpe_encode_oracle_sql(n_merges=6),
        ),
    ]:
        spd = sdf.toPandas()
        dpd = con.sql(sql).df()
        assert sorted(spd.columns) == sorted(c for c in dpd.columns)
        s = rows_key(list(spd.columns), spd.itertuples(index=False, name=None))
        d = rows_key(list(dpd.columns), dpd.itertuples(index=False, name=None))
        assert s == d
    # and the realized merge count is < 6 (the loop actually broke)
    assert tx.bpe_merges(df, n_merges=6).count() < 6


def test_ewma_fold_order_matches_oracle_on_ties_and_nulls(spark):
    """Duplicate (ts, event_id) order keys and NULL keys: the fold order
    is tie-broken by VALUE with NULLs first on both engines (the old
    oracle ORDER BY omitted the value and sorted NULLs last)."""
    from tests.util import rows_key

    rows = [
        # user 1: two rows with IDENTICAL order keys, different values —
        # fold order changes the EWMA (0.5*(0.5*a)+0.5*b depends on a,b
        # order), so an un-mirrored tie-break diverges here
        (1, "2024-01-01 00:00:00", 7, 100.0),
        (1, "2024-01-01 00:00:00", 7, 4.0),
        # user 2: NULL ts sorts FIRST on both engines
        (2, None, 1, 8.0),
        (2, "2024-01-01 00:00:00", 2, 2.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({u}, {'NULL' if t is None else repr(t)}::TIMESTAMP, {e}, {v})"
            for u, t, e, v in rows
        )
        + ") AS t(user_id, ts, event_id, value)"
    )
    spd = ag.ewma_by_key(df).toPandas()
    dpd = con.sql(ag.ewma_oracle_sql()).df()
    s = rows_key(list(spd.columns), spd.itertuples(index=False, name=None))
    d = rows_key(list(dpd.columns), dpd.itertuples(index=False, name=None))
    assert s == d
    got = {r["user_id"]: r["ewma_value"] for r in spd.to_dict("records")}
    # user 1: value tie-break folds 4.0 then 100.0 -> 0.25*4 + 0.5*100 = 51
    assert got[1] == 51.0
    # user 2: NULL ts first -> 0.25*8 + 0.5*2 = 3
    assert got[2] == 3.0


def test_nb_raw_vocab_option_matches_its_oracle(spark, sf_dir, duck):
    """The raw-unigram NB variant (n_buckets=None) is still available and
    still oracle-exact; the default is now the bounded hashed-bucket
    model (langs x 4096 broadcast instead of langs x vocab)."""
    import data_pipelines_cu_spark.ml as ml
    from tests.util import assert_matches_oracle

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    duck.sql(
        "CREATE OR REPLACE VIEW nb_docs AS "
        f"SELECT * FROM '{sf_dir}/documents.parquet' "
        "ORDER BY doc_id LIMIT 100"
    )
    sdf = ml.nb_lang_predict(
        docs.orderBy("doc_id").limit(100), n_buckets=None
    )
    assert_matches_oracle(
        sdf, duck, ml.nb_lang_oracle_sql(table="nb_docs", n_buckets=None)
    )


def test_nb_bucketed_predictions_track_labels(spark):
    """Hashing into 4096 buckets must not wreck the classifier: on a
    corpus whose languages have disjoint vocabularies, the bucketed
    model still classifies every doc correctly (collisions at
    vocab << buckets are rare and smoothing washes them out)."""
    import data_pipelines_cu_spark.ml as ml

    vocabs = {
        "aa": ["apfel", "birne", "kirsche", "pflaume"],
        "bb": ["pomme", "poire", "cerise", "prune"],
        "cc": ["apple", "pear", "cherry", "plum"],
    }
    rows = []
    i = 0
    for lang, ws in vocabs.items():
        for k in range(8):
            i += 1
            rows.append((i, lang, " ".join(ws[(k + j) % 4] for j in range(3))))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = ml.nb_lang_predict(df)
    acc = out.agg(F.avg(F.col("correct").cast("double"))).collect()[0][0]
    assert acc == 1.0


def test_hist_quantile_degenerate_constant_column(spark):
    """All-equal values (hi == lo): bins must collapse to bin 0 and the
    report must be exact with zero error, on both engines, instead of
    NaN bins / a crash."""
    from tests.util import rows_key

    rows = [("a", 5.0), ("a", 5.0), ("b", 5.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    con = duckdb.connect()
    con.sql(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(f"('{g}', {v})" for g, v in rows)
        + ") AS t(event_type, value)"
    )
    spd = sk.hist_quantile_error(df).toPandas()
    dpd = con.sql(sk.hist_quantile_oracle_sql()).df()
    s = rows_key(list(spd.columns), spd.itertuples(index=False, name=None))
    d = rows_key(list(dpd.columns), dpd.itertuples(index=False, name=None))
    assert s == d
    for r in spd.to_dict("records"):
        assert r["approx_p50"] == 5.0 and r["err_p50"] == 0.0
        assert r["approx_p90"] == 5.0 and r["err_p90"] == 0.0


def test_zorder_write_clusters_both_dimensions(spark, sf_dir, tmp_path):
    """write_zordered: every output file covers a compact range of BOTH
    dimensions, unlike a single-column sort (tight on its column,
    unbounded on the other) — the property parquet min/max pruning needs
    for predicates on either column."""
    import glob as _glob

    from pyspark.sql import functions as F

    from data_pipelines_cu_spark.operators import layout as lay

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", F.floor("value").cast("long").alias("v")
    )
    zpath, spath = str(tmp_path / "z"), str(tmp_path / "s")
    lay.write_zordered(ev, zpath, "user_id", "v", 1023, 1023, n_files=16)
    # single-column comparison layout: sorted by user only
    ev.repartitionByRange(16, "user_id").sortWithinPartitions(
        "user_id"
    ).write.mode("overwrite").parquet(spath)

    def spreads(path, col):
        out = []
        for f in sorted(_glob.glob(f"{path}/part-*.parquet")):
            stats = (
                spark.read.parquet(f)
                .agg(
                    (F.max(col) - F.min(col)).alias("spread"),
                    F.count(F.lit(1)).alias("n"),
                )
                .collect()[0]
            )
            if stats["n"] > 0:
                out.append(stats["spread"])
        return out

    # z-order: the VALUE dimension is also clustered; user-sort leaves it
    # at (nearly) full range in every file
    z_v = spreads(zpath, "v")
    s_v = spreads(spath, "v")
    assert sum(z_v) / len(z_v) < 0.6 * (sum(s_v) / len(s_v))
    # and the zorder key round-trips through the oracle-gated expression
    out = lay.zorder_key(
        ev, F.col("user_id"), F.col("v"), 1023, 1023, ["event_id"]
    )
    assert out.count() == ev.count()


def test_systematic_sample_zero_total_weight_is_empty(spark):
    """All-zero weights: no mass on the cumulative line -> empty draw set
    (not an ANSI DIVIDE_BY_ZERO from step = 0)."""
    from data_pipelines_cu_spark.operators import sampling as smp

    zw = spark.createDataFrame([(1, 0), (2, 0)], "doc_id long, n_chars long")
    assert smp.systematic_weighted_sample(zw, weight_col="n_chars").count() == 0


def test_twap_duplicate_timestamps_yield_null_not_crash(spark):
    """Every interval zero-length: n_intervals reported, twap NULL."""
    from data_pipelines_cu_spark.operators.aggregates import time_weighted_avg

    df = spark.createDataFrame(
        [("a", "2024-01-01 10:00:00", 1, 5.0), ("a", "2024-01-01 10:00:00", 2, 9.0)],
        "event_type string, ts string, event_id long, value double",
    ).selectExpr("event_type", "CAST(ts AS TIMESTAMP) AS ts", "event_id", "value")
    rows = time_weighted_avg(df).collect()
    assert len(rows) == 1 and rows[0]["n_intervals"] == 1
    assert rows[0]["twap"] is None


def test_cosine_zero_vector_yields_null_not_crash(spark):
    """A zero-norm vector anywhere in the corpus must degrade to NULL
    similarity (excluded by ranking), not an ANSI DIVIDE_BY_ZERO that
    kills the whole job."""
    from data_pipelines_cu_spark.operators import similarity as sim

    zv = spark.createDataFrame(
        [(0, [0.0] * 4, 0), (1, [1.0, 0.0, 0.0, 0.0], 1),
         (2, [0.0, 1.0, 0.0, 0.0], 1)],
        "vec_id long, embedding array<float>, label int",
    )
    out = sim.cosine_topk(zv, zv.filter("vec_id = 0"), k=2).collect()
    # the zero anchor has no defined similarity to anything: rows exist
    # with NULL cos_sim (ranked last), no crash
    assert all(r.cos_sim is None for r in out)
    out2 = sim.cosine_topk(zv, zv.filter("vec_id = 1"), k=2).collect()
    by_rank = {r.rank: r for r in out2}
    assert by_rank[1].cos_sim is not None  # real neighbor ranks first
