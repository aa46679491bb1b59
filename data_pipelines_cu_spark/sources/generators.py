"""Deterministic synthetic sources (SURVEY.md §2.1 S12-S13).

The reference's fixture servers generate per-day seeded events
(Solutions/chapter03/docker/events-api/app.py:22-45: 50-100 users,
200-2000 events/day, seed derived from the date) and a rich variant with
event types and values (lecture3/events_api.py:36-51). Re-expressed
Spark-first: the generator is a DataFrame program — ``sequence`` +
``explode`` build the rows JVM-side and a seeded hash drives every random
choice, so the same (date, seed) always yields identical rows on any
cluster topology. No driver-side loops, no Python RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENT_TYPES = ("click", "view", "purchase", "login")
USERS = ("alice", "bob", "carol", "dave", "eve")


def _hash01(*cols) -> "F.Column":
    """Deterministic uniform [0,1) from xxhash64 of the inputs."""
    h = F.abs(F.xxhash64(*cols))
    return (h % F.lit(1_000_000)).cast("double") / 1_000_000.0


def generate_events(
    spark: SparkSession,
    start_date: str,
    end_date: str,
    seed: int = 42,
    min_events: int = 5,
    max_events: int = 15,
) -> DataFrame:
    """Seeded per-day event stream (lecture3/events_api.py semantics:
    5-15 events/day, 5 users, 4 event types, value 1-100).

    Distributed shape: days from ``sequence(start, end)`` → explode →
    per-day event count from the day's seed → explode event index → column
    hashes pick user/type/value. Scales linearly with days×events and
    parallelizes over the exploded rows.
    """
    span = min(max_events - min_events + 1, 2**31 - 1)
    days = spark.range(1).select(
        F.explode(
            F.sequence(
                F.lit(start_date).cast("date"),
                F.date_sub(F.lit(end_date).cast("date"), 1),
            )
        ).alias("date")
    )
    sd = F.lit(seed)
    n_events = (
        F.abs(F.xxhash64(F.col("date"), sd, F.lit("n"))) % span + min_events
    )
    events = days.select(
        "date", F.explode(F.sequence(F.lit(1), n_events)).alias("i")
    )
    pick = lambda arr, tag: F.element_at(  # noqa: E731
        F.array(*[F.lit(x) for x in arr]),
        (F.abs(F.xxhash64(F.col("date"), F.col("i"), sd, F.lit(tag))) % len(arr) + 1)
        .cast("int"),
    )
    return events.select(
        F.date_format("date", "yyyy-MM-dd").alias("date"),
        pick(USERS, "user").alias("user"),
        pick(EVENT_TYPES, "type").alias("event_type"),
        (F.abs(F.xxhash64(F.col("date"), F.col("i"), sd, F.lit("v"))) % 100 + 1)
        .cast("int")
        .alias("value"),
    )


def generate_minute_ticks(
    spark: SparkSession,
    date: str,
    base_price: float = 68000.0,
    seed: int = 42,
) -> DataFrame:
    """Seeded 1-row-per-minute price feed for one day (the binance ingest
    cadence, lecture3/12:90 — 1,440 rows/day) with a ±0.5% random walk-ish
    wobble. Columns mirror FIXTURES.md §2 (price decimal-as-string quirk
    included)."""
    minutes = spark.range(1440).select(
        (F.lit(date).cast("timestamp") + F.make_interval(mins=F.col("id")))
        .alias("fetch_time")
    )
    wobble = (_hash01(F.col("fetch_time"), F.lit(seed)) - 0.5) * 0.01
    price = F.lit(base_price) * (1.0 + wobble)
    return minutes.select(
        F.lit(5).alias("mins"),
        F.format_number(price, 8).alias("price"),
        (F.unix_micros(F.col("fetch_time")) / 1000).cast("long").alias("closeTime"),
        F.date_format("fetch_time", "yyyy-MM-dd'T'HH:mm:ss").alias("timestamp"),
        F.col("fetch_time"),
        price.alias("price_float"),
    )
