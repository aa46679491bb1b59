"""Golden-output CSV formatting (SURVEY.md §7.3 hard part 1).

The reference's outputs have a precise shape the course graded by eye:
fixed column order, hour as zero-padded string, floats printed with 2
decimals, a ``calculated_at`` processing timestamp, quoted pagenames
(lecture3/sample_output_hourly_avg.csv, sample_output_daily_avg.csv,
lecture4/sample_output_pageview_counts.csv). These formatters reproduce
that shape exactly from the engine's typed frames.

``calculated_at`` is injectable (deterministic tests); formatting is
``format_string('%.2f')`` (no thousands separators — format_number would
add them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOURLY_COLUMNS = [
    "date", "hour", "avg_price", "min_price", "max_price",
    "first_price", "last_price", "data_points", "calculated_at",
]

DAILY_COLUMNS = [
    "date", "avg_price", "min_price", "max_price", "opening_price",
    "closing_price", "price_change", "price_change_pct",
    "total_data_points", "hours_with_data", "calculated_at",
]


def _f2(col: str) -> F.Column:
    return F.format_string("%.2f", F.col(col).cast("double")).alias(col)


def format_hourly_golden(hourly: DataFrame, calculated_at: str) -> DataFrame:
    """sample_output_hourly_avg.csv shape: date,hour(zero-padded),5 price
    stats at 2dp, data_points, calculated_at."""
    return hourly.select(
        "date",
        "hour",
        _f2("avg_price"),
        _f2("min_price"),
        _f2("max_price"),
        _f2("first_price"),
        _f2("last_price"),
        F.col("data_points").cast("long").alias("data_points"),
        F.lit(calculated_at).alias("calculated_at"),
    ).orderBy("date", "hour")


def format_daily_golden(daily: DataFrame, calculated_at: str) -> DataFrame:
    """sample_output_daily_avg.csv shape (column order differs from the
    engine's natural order — change columns sit before the counts)."""
    return daily.select(
        "date",
        _f2("avg_price"),
        _f2("min_price"),
        _f2("max_price"),
        _f2("opening_price"),
        _f2("closing_price"),
        _f2("price_change"),
        _f2("price_change_pct"),
        F.col("total_data_points").cast("long").alias("total_data_points"),
        F.col("hours_with_data").cast("long").alias("hours_with_data"),
        F.lit(calculated_at).alias("calculated_at"),
    ).orderBy("date")


def format_pageviews_golden(counts: DataFrame, datetime_str: str) -> DataFrame:
    """sample_output_pageview_counts.csv shape: quoted pagename, int count,
    tz-suffixed datetime."""
    return counts.select(
        F.concat(F.lit('"'), F.col("pagename"), F.lit('"')).alias("pagename"),
        F.col("pageviewcount").cast("int").alias("pageviewcount"),
        F.lit(datetime_str + "+00:00").alias("datetime"),
    )


def csv_lines(df: DataFrame) -> list[str]:
    """Header + rows as CSV text lines. Golden outputs are tiny (24 hourly
    rows, 1 daily row, 5 pageview rows) — a driver-side render is the
    correct tool here; large sinks go through df.write.csv."""
    cols = df.columns
    lines = [",".join(cols)]
    for row in df.collect():
        lines.append(",".join("" if v is None else str(v) for v in row))
    return lines
