"""LLM extraction operator: unstructured → typed struct (SURVEY.md §2.10 U4).

Reference: lecture11/assignment/dags/weather_ollama_dag.py — POST to an
Ollama /api/chat endpoint with ``format:"json"``, parse a fixed 7-key
payload, enforce the required-keys contract (:113-126), with a mock mode
selected by env var so tests never need a model server (:59-70).

Spark restatement: ``mapInPandas`` batches rows to the extractor (one HTTP
round-trip per row, amortized per Arrow batch), the response is parsed with
``from_json`` against an explicit StructType, and the contract check is a
filter + raise quality gate. The extractor callable is injected; the
default is the deterministic mock. At scale, executors fan out calls and
the batch size bounds in-flight requests per task.
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

WEATHER_SCHEMA = T.StructType(
    [
        T.StructField("city_label", T.StringType(), True),
        T.StructField("observation_date", T.StringType(), True),
        T.StructField("temp_c_current", T.DoubleType(), True),
        T.StructField("temp_c_max", T.DoubleType(), True),
        T.StructField("temp_c_min", T.DoubleType(), True),
        T.StructField("conditions_short", T.StringType(), True),
        T.StructField("precipitation_mm", T.DoubleType(), True),
    ]
)

REQUIRED_KEYS = tuple(f.name for f in WEATHER_SCHEMA.fields)

Extractor = Callable[[str], str]


def mock_extractor(text: str) -> str:
    """Deterministic mock (the reference's WEATHER_PIPELINES_MOCK_OLLAMA
    path): derives a stable payload from the input text itself."""
    h = sum(ord(c) for c in text) % 40 - 10  # stable pseudo-temperature
    return json.dumps(
        {
            "city_label": (text.split(",")[0] or "unknown")[:64],
            "observation_date": "2024-01-01",
            "temp_c_current": float(h),
            "temp_c_max": float(h + 3),
            "temp_c_min": float(h - 3),
            "conditions_short": "mock conditions",
            "precipitation_mm": 0.0,
        }
    )


def extract_structured(
    df: DataFrame,
    text_col: str = "text",
    id_col: str | None = None,
    extractor: Extractor = mock_extractor,
) -> DataFrame:
    """Run the extractor per row (Arrow-batched), parse with from_json
    against WEATHER_SCHEMA, flatten the struct. Rows whose payload misses a
    required key surface as nulls — apply contract_gate() downstream."""
    import pandas as pd  # noqa: PLC0415

    carry = [id_col] if id_col else []

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out = pdf[carry + [text_col]].copy()
            out["_raw_json"] = [extractor(t or "") for t in pdf[text_col]]
            yield out

    raw_schema = T.StructType(
        ([df.schema[id_col]] if id_col else [])
        + [df.schema[text_col], T.StructField("_raw_json", T.StringType())]
    )
    raw = df.select(*carry, text_col).mapInPandas(run, schema=raw_schema)
    parsed = raw.withColumn("_s", F.from_json("_raw_json", WEATHER_SCHEMA))
    return parsed.select(
        *carry, text_col, *[F.col(f"_s.{k}").alias(k) for k in REQUIRED_KEYS]
    )


def contract_gate(df: DataFrame, required: tuple[str, ...] = ("city_label", "observation_date")) -> DataFrame:
    """Required-keys contract (weather_ollama:113-126): missing → raise.
    Expressed as an isEmpty assertion on the violation set so the check is
    one distributed job, not a collect."""
    cond = F.lit(False)
    for k in required:
        cond = cond | F.col(k).isNull()
    bad = df.filter(cond)
    if not bad.isEmpty():
        examples = [r.asDict() for r in bad.limit(3).collect()]
        raise ValueError(f"LLM output missing required keys; examples: {examples}")
    return df
