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
