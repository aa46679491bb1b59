"""Tests for readers and the HTTP connector (pushdown + pagination)."""

from __future__ import annotations

import gzip
import json

import pytest
from pyspark.sql import types as T

from data_pipelines_cu_spark.sources import readers
from data_pipelines_cu_spark.sources.http import HttpSource, paginate_by_time


def test_read_csv_typed(spark, tmp_path):
    p = tmp_path / "products.csv"
    p.write_text("id,product_id,price,stock\n1,P001,9.99,5\n2,P002,19.5,0\n")
    schema = "id int, product_id string, price double, stock int"
    df = readers.read_csv(spark, str(p), schema=schema)
    rows = df.orderBy("id").collect()
    assert rows[0].price == 9.99 and rows[1].stock == 0


def test_read_json_multiline_array(spark, tmp_path):
    p = tmp_path / "users.json"
    p.write_text(json.dumps([{"id": 1, "name": " A "}, {"id": None, "name": "B"}]))
    df = readers.read_json(spark, str(p), multiline=True)
    assert df.count() == 2


def test_read_gz_text_and_space_delimited(spark, tmp_path):
    p = tmp_path / "pageviews.gz"
    lines = "en Google 42 123\nen Apple 7 55\nde Google 9 99\n"
    with gzip.open(p, "wt") as f:
        f.write(lines)
    df = readers.read_pageviews(spark, str(p))
    got = {(r.domain_code, r.page_title): r.view_count for r in df.collect()}
    assert got[("en", "Google")] == 42 and got[("de", "Google")] == 9
    assert dict(df.dtypes)["view_count"] == "int"


EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("date", T.StringType()),
        T.StructField("user", T.StringType()),
    ]
)


def _mock_server(url, params):
    """Fixture server honoring the events API contract: filters by
    [start_date, end_date) server-side (app.py:61-65)."""
    data = [
        {"date": "2024-01-01", "user": "a"},
        {"date": "2024-01-02", "user": "b"},
        {"date": "2024-01-03", "user": "c"},
    ]
    s, e = params.get("start_date", "0000"), params.get("end_date", "9999")
    return [r for r in data if s <= r["date"] < e]


def test_http_source_pushdown(spark):
    src = HttpSource(
        url="http://mock/events",
        schema=EVENTS_SCHEMA,
        param_map={"date >=": "start_date", "date <": "end_date"},
        fetch=_mock_server,
    )
    df = src.load(
        spark, predicates={"date >=": "2024-01-01", "date <": "2024-01-03"}
    )
    assert {r.user for r in df.collect()} == {"a", "b"}  # server filtered


def test_http_source_rejects_unpushable_predicate(spark):
    src = HttpSource(url="u", schema=EVENTS_SCHEMA, fetch=_mock_server)
    with pytest.raises(ValueError, match="not pushable"):
        src.load(spark, predicates={"user =": "a"})


def test_http_paginated_fetch(spark):
    calls = []

    def paged_fetch(url, params):
        calls.append(dict(params))
        lo, hi = int(params["startTime"]), int(params["endTime"])
        return [{"date": f"t{t}", "user": "u"} for t in range(lo, hi)]

    src = HttpSource(url="http://mock/klines", schema=EVENTS_SCHEMA, fetch=paged_fetch)
    pages = paginate_by_time(0, 10, page_ms=4)
    df = src.load_paginated(spark, pages)
    assert df.count() == 10  # pages 0-4, 4-8, 8-10: half-open, no overlap
    assert len(pages) == 3


def test_paginate_by_time_half_open():
    pages = paginate_by_time(0, 12, 5)
    spans = [(int(p["startTime"]), int(p["endTime"])) for p in pages]
    assert spans == [(0, 5), (5, 10), (10, 12)]


def test_read_jsonl_quarantine_splits_bad_lines(spark, tmp_path):
    """Malformed JSONL rows land in quarantine with the raw line kept;
    valid rows parse to the declared schema."""
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"id": 1, "name": "a"}\n'
        "not json at all\n"
        '{"id": 2, "name": "b"}\n'
        "\n"
        '{"id": oops}\n'
    )
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("name", T.StringType()),
        ]
    )
    valid, quarantine = readers.read_jsonl_quarantine(spark, str(p), schema)
    assert sorted((r.id, r.name) for r in valid.collect()) == [(1, "a"), (2, "b")]
    assert sorted(r._raw for r in quarantine.collect()) == [
        "not json at all",
        '{"id": oops}',
    ]


def test_read_parquet_evolved_merges_schemas(spark, tmp_path):
    """A file written before a column existed reads as null alongside a
    newer file that has it."""
    old, new = str(tmp_path / "gen1"), str(tmp_path / "gen2")
    spark.createDataFrame([(1, "x")], "id long, name string").write.parquet(old)
    spark.createDataFrame(
        [(2, "y", 9.5)], "id long, name string, score double"
    ).write.parquet(new)
    df = readers.read_parquet_evolved(spark, old, new)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows[1] is None and rows[2] == 9.5
