"""Structured Streaming tests: availableNow file-stream ingest, 1h windowed
agg parity with the batch operator, and the hourly→daily cascade."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from data_pipelines_cu_spark.operators.aggregates import multi_stat_time_bucket
from data_pipelines_cu_spark.sources.generators import generate_minute_ticks
from data_pipelines_cu_spark.streaming import jobs


def _write_tick_files(spark, path, date="2024-02-01"):
    ticks = generate_minute_ticks(spark, date).select(
        F.date_format("fetch_time", "yyyy-MM-dd HH:mm:ss").alias("fetch_time"),
        "price_float",
    )
    rows = [
        {"fetch_time": r.fetch_time, "price_float": r.price_float}
        for r in ticks.collect()
    ]
    # sentinel tick past the watermark horizon: append-mode windows only
    # emit once the watermark (max event time - 2h) passes their end, so a
    # bounded availableNow run needs one event beyond day-end + delay for
    # the day's final windows to close (a live stream does this naturally)
    rows.append({"fetch_time": "2024-02-02 02:30:00", "price_float": 1.0})
    # two files to exercise multi-file discovery
    for i, chunk in enumerate([rows[:700], rows[700:]]):
        with open(f"{path}/part-{i}.json", "w") as f:
            for r in chunk:
                f.write(json.dumps(r) + "\n")
    return rows


def test_streaming_hourly_matches_batch(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_tick_files(spark, str(src))
    sink = str(tmp_path / "hourly")
    q = jobs.run_hourly_to_sink(
        jobs.read_tick_stream(spark, str(src)),
        sink,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = spark.read.parquet(sink)
    batch = multi_stat_time_bucket(
        spark.read.json(str(src)).withColumn(
            "fetch_time", F.to_timestamp("fetch_time")
        ),
        "fetch_time",
        "price_float",
    ).filter(F.col("date") == "2024-02-01")  # sentinel's window never emits
    # partitioned sink re-infers date as DateType → normalize via str()
    g = {(str(r.date), r.hour): (r.avg_price, r.first_price, r.last_price, r.data_points)
         for r in got.collect()}
    b = {(str(r.date), r.hour): (r.avg_price, r.first_price, r.last_price, r.data_points)
         for r in batch.collect()}
    assert g == b
    assert len(g) == 24


def test_streaming_cascade_daily(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_tick_files(spark, str(src))
    hourly_path = str(tmp_path / "hourly")
    daily_path = str(tmp_path / "daily")
    q = jobs.run_cascade(
        jobs.read_tick_stream(spark, str(src)),
        hourly_path,
        daily_path,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    daily = spark.read.parquet(daily_path).collect()
    assert len(daily) == 1
    d = daily[0]
    assert d.hours_with_data == 24 and d.total_data_points == 1440
