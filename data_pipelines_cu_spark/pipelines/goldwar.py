"""The gold-price × war-news training-data pipeline (SURVEY.md §3, §2.10).

Reference: Solutions/gold_war_etl_dag.py — fetch gold OHLC + NYT world RSS,
filter war keywords, sentiment-score each headline, aggregate daily
sentiment, left-join onto prices, derive next-day target, train a model.

Spark restatement: keyword rlike filter → deterministic lexicon sentiment
(operators.text.with_sentiment — the TextBlob stand-in) → daily agg →
broadcast left join + zero-fill → lead() window for the label. The ML step
stays out of the query engine (U5): the training table is the product.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.filters import keyword_any
from ..operators.joins import left_join_fill
from ..operators.text import with_sentiment

WAR_KEYWORDS = (
    "war", "conflict", "attack", "military", "invasion",
    "strike", "troops", "missile", "battle", "combat",
)


def filter_war_news(news: DataFrame) -> DataFrame:
    """Keyword any-of over lowercased title+summary (gold_war:37,93-97)."""
    return keyword_any(news, ["title", "summary"], WAR_KEYWORDS)


def daily_sentiment(news: DataFrame) -> DataFrame:
    """Per-date mean sentiment + article count (gold_war:134-141) using the
    deterministic lexicon polarity over title+summary."""
    scored = with_sentiment(
        news.withColumn("text", F.concat_ws(" ", "title", "summary"))
    )
    return scored.groupBy("date").agg(
        F.avg("sentiment").alias("sentiment_mean"),
        F.count(F.lit(1)).alias("news_count"),
    )


def training_table(gold: DataFrame, news: DataFrame) -> DataFrame:
    """The assembled training set (gold_war:143-155): gold sorted by date,
    next-day close via lead(), binary target, daily sentiment left-joined
    with zero-fill, rows without a next day dropped."""
    w = Window.orderBy("date")  # single series — tiny table, one partition OK
    sent = daily_sentiment(filter_war_news(news))
    labeled = (
        gold.withColumn("price_next", F.lead("close").over(w))
        .withColumn(
            "target", F.when(F.col("price_next") > F.col("close"), 1).otherwise(0)
        )
        .filter(F.col("price_next").isNotNull())
    )
    return left_join_fill(
        labeled, sent, "date", fill={"sentiment_mean": 0.0, "news_count": 0}
    ).select(
        "date", "close", "price_next", "target", "sentiment_mean", "news_count"
    )


def feature_columns() -> Sequence[str]:
    """The reference's model features (gold_war:158-181)."""
    return ("close", "sentiment_mean", "news_count")
