"""The pageviews pipeline (SURVEY.md §3.3).

Reference: download hourly Wikimedia dump → gunzip → line scan → filter
en + tracked pages → SQL insert → per-page argmax-hour analysis
(Solutions/chapter04/dags/listing_4_20.py; scripts/select_pageview_counts.sql).

Spark restatement: gz text read (native decompress) → split/getItem typed
projection → membership filter → zero-filled counts → window argmax. The
JDBC sink step becomes ``df.write.jdbc`` (wrapped, optional).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.aggregates import zero_fill_counts
from ..sources.readers import read_pageviews

TRACKED_PAGES = ("Google", "Amazon", "Apple", "Microsoft", "Facebook")


def pageview_counts(
    spark: SparkSession,
    path: str,
    pagenames: Sequence[str] = TRACKED_PAGES,
    domain: str = "en",
) -> DataFrame:
    """Counts for tracked pages with 0-default (lecture4/06:38-52):
    filter domain → aggregate → right-join the page list (broadcast)."""
    pv = read_pageviews(spark, path).filter(F.col("domain_code") == domain)
    # view_count-weighted total per page (the reference records the dump's
    # count column, not line counts)
    counts = (
        pv.groupBy("page_title")
        .agg(F.sum("view_count").alias("pageviewcount"))
    )
    pages = spark.createDataFrame([(p,) for p in pagenames], ["page_title"])
    return (
        pages.join(counts, "page_title", "left")
        .na.fill(0, ["pageviewcount"])
        .select(
            F.col("page_title").alias("pagename"),
            F.col("pageviewcount").cast("int"),
        )
    )


def best_hour_per_page(hourly_counts: DataFrame) -> DataFrame:
    """The analysis query verbatim (select_pageview_counts.sql:1-12):
    AVG per (pagename, hr), then ROW_NUMBER()=1 per page."""
    avg = hourly_counts.groupBy("pagename", "hr").agg(
        F.avg("pageviewcount").alias("average")
    )
    w = Window.partitionBy("pagename").orderBy(F.desc("average"))
    return (
        avg.withColumn("row_number", F.row_number().over(w))
        .filter(F.col("row_number") == 1)
    )


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    properties: dict[str, str] | None = None,
) -> None:
    """K5: the PostgresOperator insert (listing_4_20.py:73-79) as a JDBC
    sink. ``properties`` carries the driver class and credentials; tested
    end-to-end against embedded Derby (bundled with Spark), the same write
    path a Postgres URL + driver jar uses in production."""
    df.write.jdbc(url, table, mode=mode, properties=properties or {})


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """JDBC read-back (the analysis side of the reference's SQL sink)."""
    return spark.read.jdbc(url, table, properties=properties or {})


__all__ = [
    "TRACKED_PAGES",
    "pageview_counts",
    "best_hour_per_page",
    "write_jdbc",
    "read_jdbc",
    "zero_fill_counts",
]
