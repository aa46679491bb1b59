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
