"""Oracle output-type lint: no HUGEINT / DECIMAL columns, ever.

Round-2 gate failures (`daily_price_rollup`, `doc_packed_sequences`) were
both caused by DuckDB's SUM(BIGINT) → HUGEINT promotion: the driver's
pandas bridge renders HUGEINT as float64 (302.0) while Spark emits int64
(302), so the value hash diverges on otherwise-identical results. This
test type-checks EVERY registered oracle under DuckDB (plan-only, LIMIT 0,
so it is cheap) and fails on any HUGEINT or DECIMAL output column —
killing the whole bug class for every future oracle.
"""

from __future__ import annotations

import pytest

from data_pipelines_cu_spark.queries import all_queries

_FORBIDDEN = ("HUGEINT", "UHUGEINT", "DECIMAL")


def _oracle_items():
    return [
        (name, q.oracle)
        for name, q in all_queries().items()
        if q.oracle is not None
    ]


@pytest.mark.parametrize(
    "name,sql", _oracle_items(), ids=[n for n, _ in _oracle_items()]
)
def test_oracle_output_types(duck, name, sql):
    rel = duck.sql(f"SELECT * FROM ({sql}) LIMIT 0")
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(f in str(t).upper() for f in _FORBIDDEN)
    ]
    assert not bad, (
        f"oracle '{name}' emits driver-hostile column types {bad}: "
        "CAST the column to BIGINT/DOUBLE in the oracle SQL"
    )
