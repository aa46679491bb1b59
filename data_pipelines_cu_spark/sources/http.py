"""HTTP/REST source with filter→query-param pushdown and pagination
(SURVEY.md §2.1 S5-S7, §4 "custom work (a)").

The reference fetches APIs driver-side per task (requests.get with timeout +
raise_for_status, lecture3/12_binance_fetch_minute.py:35-48) and paginates
klines by advancing ``startTime`` past the last row with ``limit=1000``
pages (lecture3/15_binance_backfill_last_month.py:29-55). Re-expressed for
Spark:

- ``HttpSource`` — a connector whose ``predicates`` (date-range etc.) are
  translated into query parameters BEFORE the fetch — the same pushdown the
  reference performs by templating ``start_date={{ds}}`` into the URL
  (lecture3/06_templated_query.py:23-24): the server filters, not the
  engine.
- single fetch → driver-side GET → ``spark.createDataFrame`` (a control-
  plane call; the data is small by construction).
- partitioned fetch → a DataFrame of (start, end) page ranges fanned out
  via ``mapInPandas`` so 1000 executors fetch 1000 pages concurrently —
  the scale path for backfills.

Everything is mockable: pass ``fetch=callable`` and no network is touched
(the reference's own mock pattern, weather_ollama_dag.py:59-70).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator, Mapping, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

Fetch = Callable[[str, Mapping[str, str]], list[dict]]


def _default_fetch(url: str, params: Mapping[str, str]) -> list[dict]:
    """Driver/executor-side GET with the reference's timeout +
    raise_for_status discipline. Import-gated: environments without
    ``requests`` use an injected fetch (tests always do)."""
    import requests  # noqa: PLC0415

    resp = requests.get(url, params=dict(params), timeout=30)
    resp.raise_for_status()
    data = resp.json()
    return data if isinstance(data, list) else [data]


@dataclass
class HttpSource:
    """REST source with predicate pushdown into query params.

    ``param_map`` declares which logical predicates the server understands,
    e.g. ``{"date >=": "start_date", "date <": "end_date"}`` — matching the
    events API contract (app.py:61-65). Predicates not in the map would be
    applied post-scan by the caller (Spark filter) — pushdown is best-effort
    exactly like DSv2.
    """

    url: str
    schema: T.StructType
    param_map: Mapping[str, str] = field(default_factory=dict)
    base_params: Mapping[str, str] = field(default_factory=dict)
    fetch: Fetch = _default_fetch

    def with_predicates(self, predicates: Mapping[str, str]) -> dict[str, str]:
        params = dict(self.base_params)
        leftover = {}
        for pred, value in predicates.items():
            if pred in self.param_map:
                params[self.param_map[pred]] = value
            else:
                leftover[pred] = value
        if leftover:
            raise ValueError(
                f"predicates not pushable for this source: {sorted(leftover)}"
            )
        return params

    def load(
        self, spark: SparkSession, predicates: Mapping[str, str] | None = None
    ) -> DataFrame:
        """Single fetch (S5): GET with pushed-down params → DataFrame."""
        rows = self.fetch(self.url, self.with_predicates(predicates or {}))
        return spark.createDataFrame(rows, schema=self.schema)

    def load_paginated(
        self,
        spark: SparkSession,
        pages: Sequence[Mapping[str, str]],
        predicates: Mapping[str, str] | None = None,
    ) -> DataFrame:
        """Partitioned fetch (S6): one task per page param-set, executed on
        executors via mapInPandas — the distributed form of the reference's
        klines pagination loop. ``pages`` is the pre-computed page plan
        (e.g. one (startTime, endTime) window per page)."""
        import pandas as pd  # noqa: PLC0415

        base = self.with_predicates(predicates or {})
        url, fetch, schema = self.url, self.fetch, self.schema
        plan = spark.createDataFrame(
            [(json.dumps({**base, **dict(p)}),) for p in pages], "params string"
        ).repartition(max(1, min(len(pages), 64)))

        def fetch_pages(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            cols = [f.name for f in schema.fields]
            for pdf in batches:
                for params_json in pdf["params"]:
                    rows = fetch(url, json.loads(params_json))
                    yield pd.DataFrame(
                        [[r.get(c) for c in cols] for r in rows], columns=cols
                    )

        return plan.mapInPandas(fetch_pages, schema=self.schema)


def paginate_by_time(
    start_ms: int, end_ms: int, page_ms: int, limit: int = 1000
) -> list[dict[str, str]]:
    """Page plan for time-windowed APIs: contiguous [start, end) windows —
    the declarative version of 'advance startTime past the last row'
    (lecture3/15:29-55). Half-open, so pages never overlap and the union is
    exactly [start_ms, end_ms)."""
    pages = []
    t = start_ms
    while t < end_ms:
        hi = min(t + page_ms, end_ms)
        pages.append(
            {"startTime": str(t), "endTime": str(hi), "limit": str(limit)}
        )
        t = hi
    return pages
