"""Golden-output fidelity: the formatted CSVs byte-match the reference's
sample shapes (fixed column order, zero-padded hour, 2dp floats, quoted
pagenames) on a handcrafted input whose expected output is computed by hand.
"""

from __future__ import annotations

from data_pipelines_cu_spark import golden
from data_pipelines_cu_spark.pipelines import binance


def _ticks(spark):
    # two hours, three ticks each, values chosen for exact decimal results
    rows = [
        ("2024-01-15 00:00:00", 68000.0),
        ("2024-01-15 00:30:00", 68100.0),
        ("2024-01-15 00:59:00", 68200.0),
        ("2024-01-15 01:00:00", 68200.0),
        ("2024-01-15 01:30:00", 68300.0),
        ("2024-01-15 01:59:00", 68400.0),
    ]
    df = spark.createDataFrame(rows, ["fetch_time", "price_float"])
    return df.selectExpr(
        "CAST(fetch_time AS TIMESTAMP) fetch_time", "price_float"
    )


def test_hourly_golden_format(spark):
    hourly = binance.hourly_stats(_ticks(spark))
    out = golden.format_hourly_golden(hourly, "2024-01-15 02:00:00")
    lines = golden.csv_lines(out)
    assert lines == [
        "date,hour,avg_price,min_price,max_price,first_price,last_price,data_points,calculated_at",
        "2024-01-15,00,68100.00,68000.00,68200.00,68000.00,68200.00,3,2024-01-15 02:00:00",
        "2024-01-15,01,68300.00,68200.00,68400.00,68200.00,68400.00,3,2024-01-15 02:00:00",
    ]


def test_daily_golden_format(spark):
    daily = binance.daily_stats(binance.hourly_stats(_ticks(spark)))
    out = golden.format_daily_golden(daily, "2024-01-16 00:00:00")
    lines = golden.csv_lines(out)
    # avg = mean of hourly means (68100, 68300) = 68200.00 — NOT the raw
    # mean; opening = hour 00 first, closing = hour 01 last
    assert lines == [
        "date,avg_price,min_price,max_price,opening_price,closing_price,"
        "price_change,price_change_pct,total_data_points,hours_with_data,calculated_at",
        "2024-01-15,68200.00,68000.00,68400.00,68000.00,68400.00,400.00,0.59,"
        "6,2,2024-01-16 00:00:00",
    ]


def test_pageviews_golden_format(spark):
    counts = spark.createDataFrame(
        [("Google", 451), ("Amazon", 9)], ["pagename", "pageviewcount"]
    )
    out = golden.format_pageviews_golden(counts, "2024-01-15 10:00:00")
    lines = golden.csv_lines(out)
    assert lines[0] == "pagename,pageviewcount,datetime"
    assert '"Google",451,2024-01-15 10:00:00+00:00' in lines
