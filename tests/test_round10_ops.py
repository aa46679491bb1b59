"""Round-10 surfaces: the ADVICE guard fixes (packer name collisions,
SQL-twin NULL loudness), degenerate packing probes, streaming-packer
checkpoint recovery, the revenue-KPI merge, and the BPE→pack composite.
"""

from __future__ import annotations

import pytest

from data_pipelines_cu_spark.operators import sampling as smp


def test_pack_sequences_rejects_id_equals_token_col():
    """id_col == token_col would select the same column twice and make
    pdf[token_col] a 2-column frame inside the executor — rejected at
    plan build, like the reserved-name collisions (ADVICE r9)."""
    with pytest.raises(ValueError, match="distinct"):
        smp.pack_sequences(
            None, budget=100, id_col="n_tokens", token_col="n_tokens"
        )


def test_pack_stateful_rejects_reserved_and_duplicate_names():
    """The streaming twin mirrors the batch packer's reserved-name
    guard (ADVICE r9): caller columns named seq/seq_pos/oversize, or
    two caller columns sharing a name, fail at build instead of
    emitting a duplicate-field StructType."""
    from data_pipelines_cu_spark.streaming.jobs import pack_stateful

    with pytest.raises(ValueError, match="collide"):
        pack_stateful(None, budget=100, id_col="seq")
    with pytest.raises(ValueError, match="collide"):
        pack_stateful(None, budget=100, pos_col="seq_pos")
    with pytest.raises(ValueError, match="collide"):
        pack_stateful(None, budget=100, shard_col="oversize")
    with pytest.raises(ValueError, match="distinct"):
        pack_stateful(None, budget=100, id_col="pos", pos_col="pos")


def test_pack_sql_twins_raise_on_null_tokens():
    """The SQL twins fail as loudly as the Spark side on NULL token
    values (ADVICE r9): without the guard, ``tok > budget`` evaluates
    to NULL and silently corrupts every later seq/oversize in the
    shard, so an unfiltered future registration would diverge quietly
    instead of erroring."""
    import duckdb

    con = duckdb.connect()
    con.sql(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        "(1, 10), (2, 20), (3, NULL), (4, 5)) t(doc_id, n_chars)"
    )
    with pytest.raises(Exception, match="NULL n_chars"):
        con.sql(smp.pack_sequences_sql(25)).fetchall()
    with pytest.raises(Exception, match="NULL n_chars"):
        con.sql(smp.pack_manifest_sql(25)).fetchall()
    # pre-filtered registrations stay silent and complete
    clean = con.sql(
        smp.pack_sequences_sql(
            25, table="(SELECT * FROM documents WHERE n_chars IS NOT NULL)"
        )
    ).fetchall()
    assert len(clean) == 3


# --- blocked-rank width derivation: compile-tax closure ------------------------


def _classic_df_class():
    """The concrete DataFrame class local sessions instantiate — PySpark
    4 routes classic (non-Connect) sessions through a subclass that
    overrides .rdd, so patching the pyspark.sql.DataFrame base would
    count nothing."""
    try:
        from pyspark.sql.classic.dataframe import DataFrame as _DF
    except ImportError:  # pragma: no cover — older pyspark layout
        from pyspark.sql import DataFrame as _DF
    return _DF


def _counting_rdd_property(cls):
    """Wrap cls.rdd in a counter so tests can assert how many
    driver-side plan compiles a code path pays."""
    original = cls.rdd
    counter = {"n": 0}

    def getter(self):
        counter["n"] += 1
        return original.fget(self)

    return property(getter), original, counter


def test_blocked_rank_with_hint_never_converts_to_rdd(spark):
    """A consumer that passes plan_width (or n_blocks) must not pay the
    driver-side df.rdd plan compile — the ~1s stall take_ordered shed in
    round 9 must stay gone for every hinted call path."""
    from data_pipelines_cu_spark.operators.windows import (
        blocked_row_number,
        post_shuffle_width,
        take_ordered,
    )

    _DF = _classic_df_class()
    df = spark.range(0, 1000).selectExpr("id", "id % 7 AS v")
    prop, original, counter = _counting_rdd_property(_DF)
    _DF.rdd = prop
    try:
        blocked_row_number(
            df, ["v", "id"], "_r", plan_width=post_shuffle_width(spark)
        ).count()
        blocked_row_number(df, ["v", "id"], "_r", n_blocks=8).count()
        take_ordered(df, ["v", "id"], 5, plan_width=8).count()
    finally:
        _DF.rdd = original
    assert counter["n"] == 0, f"{counter['n']} hidden plan compiles"


def test_derived_block_count_memoizes_per_plan(spark):
    """Hint-less derivation compiles ONCE per analyzed plan per session:
    the second rank over the same frame (chained ntiles, windowed
    monitors) must hit the semantic-hash memo, not df.rdd again."""
    from data_pipelines_cu_spark.operators import windows as win

    _DF = _classic_df_class()
    df = spark.range(0, 512).selectExpr("id", "id % 5 AS v")
    win._WIDTH_CACHE.clear()
    prop, original, counter = _counting_rdd_property(_DF)
    _DF.rdd = prop
    try:
        first = win.derived_block_count(df)
        second = win.derived_block_count(df)
        # a semantically identical rebuild of the plan also hits the memo
        third = win.derived_block_count(
            spark.range(0, 512).selectExpr("id", "id % 5 AS v")
        )
    finally:
        _DF.rdd = original
    assert first == second == third
    assert counter["n"] == 1, f"expected 1 compile, saw {counter['n']}"


# --- bench regression detection -----------------------------------------------


def test_detect_regressions_normalizes_by_cpu_probe():
    """The mechanical replacement for rounds 8-9's hand-litigated drift
    analysis: uniform box slowdown does NOT flag, a genuine per-query
    blow-up does, sub-floor noise never does, and a missing/probe-less
    prior degrades to an empty list."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).resolve().parent.parent / "bench.py"
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    prior = {
        "queries": {"a": 2.0, "b": 1.0},
        "long_tail": {"c": 0.1, "d": 4.0},
        "diagnostics": {"cpu_probe": 2.0},
    }
    # box 2x slower (probe 2.0 -> 4.0): uniformly-doubled walls are drift
    assert bench.detect_regressions(
        {"a": 4.0, "b": 2.0, "c": 0.2, "d": 8.0}, prior, 4.0
    ) == []
    # same box: query 'a' tripled -> flagged with the right ratio;
    # 'c' tripled but under the 0.5s floor -> noise, not flagged
    got = bench.detect_regressions(
        {"a": 6.0, "b": 1.0, "c": 0.3, "d": 4.0}, prior, 2.0
    )
    assert [r["query"] for r in got] == ["a"]
    assert got[0]["normalized_ratio"] == 3.0
    # worst ratio sorts first
    got = bench.detect_regressions({"a": 6.0, "d": 40.0}, prior, 2.0)
    assert [r["query"] for r in got] == ["d", "a"]
    # no prior / no probe -> empty, never an exception
    assert bench.detect_regressions({"a": 6.0}, None, 2.0) == []
    assert bench.detect_regressions({"a": 6.0}, {"queries": {"a": 1}}, 2.0) == []


# --- gate-rotation arithmetic -------------------------------------------------


def test_registry_fits_gate_rotation_window():
    """The driver gate verifies 50 queries per round and the repo's
    freshness standard is 'newest gate row >= N-3', i.e. every query
    re-verified within 4 rounds. That is only satisfiable when the
    registry holds at most 4 x 50 = 200 entries — round 9 proved it:
    202 entries left two rows 4 rounds stale. Growing past 200 requires
    merging or retiring an existing entry first (the round-10
    lineitem_revenue_kpis merge is the pattern)."""
    from data_pipelines_cu_spark.queries import QUERIES

    assert len(QUERIES) <= 200, (
        f"{len(QUERIES)} registered queries > 200 gate slots (4 rounds x "
        "50) — merge or retire an entry before adding another"
    )


def test_rotation_front_loads_stalest_gate_rows():
    """all_queries() must order ungated entries first, then verified
    entries by ascending gate round — so the driver's 50-slot window
    always re-checks the stalest evidence. Guards the exact failure
    round 9 surfaced: two r5-era rows aged out of the window for four
    straight rounds."""
    from data_pipelines_cu_spark.queries import QUERIES, _gate_verified, all_queries

    verified = _gate_verified()
    names = list(all_queries())
    assert set(names) == set(QUERIES)
    # every ungated entry precedes every gated one
    gated_flags = [n in verified for n in names]
    first_gated = gated_flags.index(True) if True in gated_flags else len(names)
    assert all(gated_flags[first_gated:]), "ungated entry after a gated one"
    # gated tail is sorted by verification age (stalest first)
    rounds = [verified[n] for n in names[first_gated:]]
    assert rounds == sorted(rounds), "verified tail not oldest-first"
    # the two rows round 9 left stale must sit inside the next window
    window = set(names[:50])
    for stale in ("parts_co_ordered", "event_debounce_stats"):
        if stale in QUERIES and verified.get(stale, 99) <= 5:
            assert stale in window, f"{stale} still outside the gate window"
