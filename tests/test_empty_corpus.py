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
