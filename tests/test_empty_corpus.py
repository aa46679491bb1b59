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


@pytest.mark.tier2
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


@pytest.mark.tier2
def test_every_query_survives_all_null_payloads(spark, null_sf_dir):
    failures = []
    for name, q in sorted(all_queries().items()):
        try:
            n = q.fn(spark, null_sf_dir).count()
            assert n >= 0
        except Exception as ex:  # noqa: BLE001 — collecting the sweep
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:160]}")
    assert not failures, "\n".join(failures)


@pytest.fixture(scope="module")
def degenerate_text_sf_dir(spark, sf_dir, tmp_path_factory):
    """Present-but-degenerate payloads — the class the round-11
    property test caught (a doc whose text normalizes to EMPTY made
    every per-doc character count 0 and tripped ANSI DIVIDE_BY_ZERO
    where the DuckDB twin returns NULL). NULL payloads (the sweep
    above) vanish at explode/filter; EMPTY payloads survive into the
    aggregate with zero-valued stats, which is a different failure
    surface. documents get empty/whitespace/single-char/repeated-token
    texts; embeddings get an all-zero vector (norm 0 — every cosine
    denominator's worst case); events get a zero value."""
    from pyspark.sql import functions as F

    from data_pipelines_cu_spark.catalog import TABLES

    out = tmp_path_factory.mktemp("degen_sf")
    for name in TABLES:
        raw = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "documents":
            base = raw.limit(4).collect()
            texts = ["", "   \t  ", "x", "the the the the"]
            rows = [
                r.asDict() | {"text": texts[i], "n_chars": len(texts[i])}
                for i, r in enumerate(base)
            ]
            spark.createDataFrame(rows, raw.schema).write.parquet(
                str(out / f"{name}.parquet")
            )
        elif name == "embeddings":
            dim = len(raw.limit(1).collect()[0]["embedding"])
            two = raw.limit(2)
            degen = two.select(
                "vec_id",
                F.when(
                    F.col("vec_id") == two.collect()[0]["vec_id"],
                    F.array(*[F.lit(0.0) for _ in range(dim)]).cast(
                        dict(raw.dtypes)["embedding"]
                    ),
                ).otherwise(F.col("embedding")).alias("embedding"),
                *[c for c in raw.columns if c not in ("vec_id", "embedding")],
            )
            degen.write.parquet(str(out / f"{name}.parquet"))
        elif name == "events":
            two = raw.limit(2)
            first_id = two.collect()[0]["event_id"]
            degen = two.select(
                *[
                    F.when(F.col("event_id") == first_id, F.lit(0.0))
                    .otherwise(F.col(c))
                    .cast(dict(raw.dtypes)[c])
                    .alias(c)
                    if c == "value"
                    else F.col(c)
                    for c in raw.columns
                ]
            )
            degen.write.parquet(str(out / f"{name}.parquet"))
        else:
            raw.limit(2).write.parquet(str(out / f"{name}.parquet"))
    return str(out)


@pytest.mark.tier2
def test_every_query_survives_degenerate_payloads(spark, degenerate_text_sf_dir):
    failures = []
    for name, q in sorted(all_queries().items()):
        try:
            n = q.fn(spark, degenerate_text_sf_dir).count()
            assert n >= 0
        except Exception as ex:  # noqa: BLE001 — collecting the sweep
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:160]}")
    assert not failures, "\n".join(failures)
