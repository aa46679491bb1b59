"""Native RSS/XML item reader (SURVEY.md §2.1 S10).

Reference: Solutions/gold_war_etl_dag.py:84-107 fetches NYT RSS feeds and
walks ``feed.entries`` with feedparser on the driver. Spark restatement:
feed documents land as files (the fetch is an out-of-band task, like S7's
download); parsing is a DISTRIBUTED wholetext scan — one row per ``<item>``
via JVM-side regexp extraction, no spark-xml dependency, no driver loop, no
Python UDF. A million feed files parse as fast as the cluster can read them;
each file is one task's work unit.

Scope: RSS 2.0 ``<item>`` elements with title/description/pubDate/link,
CDATA unwrapping and the five predefined XML entities. This is a
deliberately small grammar (the reference consumes exactly these fields),
not a general XML parser.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_ITEM_RE = r"(?s)<item[^>]*>(.*?)</item>"


def _field(body: Column, tag: str) -> Column:
    """First <tag>…</tag> text in the item body: CDATA unwrapped, entities
    decoded, whitespace collapsed — all JVM-side regexp/replace."""
    raw = F.regexp_extract(body, rf"(?s)<{tag}[^>]*>(.*?)</{tag}>", 1)
    no_cdata = F.regexp_replace(raw, r"(?s)<!\[CDATA\[(.*?)\]\]>", r"$1")
    txt = F.regexp_replace(no_cdata, r"\s+", " ")
    for ent, ch in [
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&apos;", "'"),
        ("&#39;", "'"),
        ("&amp;", "&"),  # last, so &amp;lt; decodes to &lt; not <
    ]:
        txt = F.replace(txt, F.lit(ent), F.lit(ch))
    return F.trim(txt)


def read_rss_items(spark: SparkSession, path: str) -> DataFrame:
    """One row per RSS ``<item>`` across every feed file under ``path``:
    (source_file, title, summary, link, pub_ts, date). pubDate is RFC-822
    ("Tue, 16 Jan 2024 10:30:00 GMT" / "+0000"); unparseable dates yield
    null pub_ts/date rather than failing the scan (try_to_timestamp)."""
    docs = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("source_file"), F.col("value").alias("doc")
    )
    items = docs.select(
        "source_file",
        F.explode(F.regexp_extract_all("doc", F.lit(_ITEM_RE), F.lit(1))).alias(
            "item"
        ),
    )
    body = F.col("item")
    pub_raw = _field(body, "pubDate")
    # normalize RFC-822 to what Spark's post-3.0 parser accepts: drop the
    # weekday prefix (EEE is format-only now) and map zone names to offsets
    pub_norm = F.regexp_replace(
        F.replace(
            F.replace(pub_raw, F.lit(" GMT"), F.lit(" +0000")),
            F.lit(" UT"),
            F.lit(" +0000"),
        ),
        r"^[A-Za-z]{3},\s*",
        "",
    )
    pub_ts = F.try_to_timestamp(pub_norm, F.lit("dd MMM yyyy HH:mm:ss Z"))
    return items.select(
        "source_file",
        _field(body, "title").alias("title"),
        _field(body, "description").alias("summary"),
        _field(body, "link").alias("link"),
        pub_ts.alias("pub_ts"),
        F.date_format(pub_ts, "yyyy-MM-dd").alias("date"),
    )


def read_news_rss(spark: SparkSession, path: str) -> DataFrame:
    """The goldwar pipeline's news frame from raw feed files: (date, title,
    summary) with the reference's truncations (title 200 chars, summary 500
    — gold_war_etl_dag.py:102-106). Keyword filtering stays in
    pipelines.goldwar.filter_war_news, as in the reference's flow."""
    items = read_rss_items(spark, path)
    return items.filter(F.col("date").isNotNull()).select(
        "date",
        F.substring("title", 1, 200).alias("title"),
        F.substring("summary", 1, 500).alias("summary"),
    )
