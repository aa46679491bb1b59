"""Empty-corpus robustness sweep: every registered query must PLAN and
EXECUTE against 0-row tables without raising — the ANSI divide-by-zero /
empty-aggregate / collect-of-nothing failure class that the value-hash
gate can never see (both engines crash or both return nothing).

Queries are allowed to return 0 rows or schema-stable constant rows; they
are not allowed to throw."""

from __future__ import annotations

import pytest

from data_pipelines_cu_spark.queries import all_queries


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("empty_sf")
    from data_pipelines_cu_spark.catalog import TABLES

    for name in TABLES:
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        raw.limit(0).write.parquet(str(out / f"{name}.parquet"))
    return str(out)


def test_every_query_survives_an_empty_corpus(spark, empty_sf_dir):
    failures = []
    for name, q in sorted(all_queries().items()):
        try:
            n = q.fn(spark, empty_sf_dir).count()
            assert n >= 0
        except Exception as ex:  # noqa: BLE001 — collecting the sweep
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:160]}")
    assert not failures, "\n".join(failures)


@pytest.fixture(scope="module")
def null_sf_dir(spark, sf_dir, tmp_path_factory):
    """1-row tables where every non-key column is NULL — the
    Python-kernel / collected-seed crash class (a None row inside an
    Arrow batch or a collected query set)."""
    from pyspark.sql import functions as F

    from data_pipelines_cu_spark.catalog import TABLES

    keys = {
        "region": ["r_regionkey"], "nation": ["n_nationkey"],
        "customer": ["c_custkey"], "supplier": ["s_suppkey"],
        "part": ["p_partkey"], "orders": ["o_orderkey"],
        "lineitem": ["l_orderkey", "l_linenumber"], "events": ["event_id"],
        "documents": ["doc_id"], "embeddings": ["vec_id"],
    }
    out = tmp_path_factory.mktemp("null_sf")
    for name in TABLES:
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet").limit(1)
        dtypes = dict(raw.dtypes)
        cols = [
            F.col(c) if c in keys[name]
            else F.lit(None).cast(dtypes[c]).alias(c)
            for c in raw.columns
        ]
        raw.select(*cols).write.parquet(str(out / f"{name}.parquet"))
    return str(out)


def test_every_query_survives_all_null_payloads(spark, null_sf_dir):
    failures = []
    for name, q in sorted(all_queries().items()):
        try:
            n = q.fn(spark, null_sf_dir).count()
            assert n >= 0
        except Exception as ex:  # noqa: BLE001 — collecting the sweep
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:160]}")
    assert not failures, "\n".join(failures)
