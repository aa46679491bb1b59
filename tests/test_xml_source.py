"""Native RSS/XML item reader (S10): distributed wholetext parse, CDATA and
entity handling, RFC-822 dates, and the goldwar news-frame adapter."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_cu_spark.sources import xml as xmlsrc

_FEED_A = """<?xml version="1.0" encoding="UTF-8"?>
<rss version="2.0"><channel>
  <title>World Feed</title>
  <item>
    <title>War escalates &amp; markets fall</title>
    <description><![CDATA[Conflict zone widens <b>rapidly</b>]]></description>
    <link>https://example.com/a1</link>
    <pubDate>Tue, 16 Jan 2024 10:30:00 GMT</pubDate>
  </item>
  <item>
    <title>Cooking tips</title>
    <description>Great &quot;success&quot; stories</description>
    <link>https://example.com/a2</link>
    <pubDate>Wed, 17 Jan 2024 08:00:00 +0000</pubDate>
  </item>
</channel></rss>
"""

_FEED_B = """<rss version="2.0"><channel>
  <item>
    <title>Missile strike reported</title>
    <description>Troops mobilize</description>
    <pubDate>not a real date</pubDate>
  </item>
</channel></rss>
"""


def _write_feeds(tmp_path):
    (tmp_path / "feeds").mkdir()
    (tmp_path / "feeds" / "a.xml").write_text(_FEED_A)
    (tmp_path / "feeds" / "b.xml").write_text(_FEED_B)
    return str(tmp_path / "feeds")


def test_read_rss_items(spark, tmp_path):
    path = _write_feeds(tmp_path)
    rows = {r.title: r for r in xmlsrc.read_rss_items(spark, path).collect()}
    assert len(rows) == 3
    war = rows["War escalates & markets fall"]  # &amp; decoded
    assert war.summary == "Conflict zone widens <b>rapidly</b>"  # CDATA kept verbatim
    assert war.link == "https://example.com/a1"
    assert war.date == "2024-01-16"
    cook = rows["Cooking tips"]
    assert cook.summary == 'Great "success" stories'
    assert cook.date == "2024-01-17"  # +0000 offset form parses too
    # unparseable pubDate nulls the date instead of failing the scan
    assert rows["Missile strike reported"].date is None


def test_read_news_rss_feeds_goldwar(spark, tmp_path):
    from data_pipelines_cu_spark.pipelines import goldwar

    path = _write_feeds(tmp_path)
    news = xmlsrc.read_news_rss(spark, path)
    # dated items only, reference truncations applied
    assert news.count() == 2
    war = goldwar.filter_war_news(news).collect()
    assert [r.title for r in war] == ["War escalates & markets fall"]
    # the frame plugs straight into the training-table path
    gold = spark.createDataFrame(
        [("2024-01-16", 100.0), ("2024-01-17", 110.0)], ["date", "close"]
    )
    table = goldwar.training_table(gold, news)
    got = {r.date: r for r in table.collect()}
    assert got["2024-01-16"].news_count == 1
    assert got["2024-01-16"].sentiment_mean is not None
