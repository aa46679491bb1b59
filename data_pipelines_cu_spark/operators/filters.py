"""Filter / predicate operators (SURVEY.md §2.2).

All are plain Column predicates so Catalyst pushes them into the parquet
scan (``PushedFilters``) — the declarative analog of the reference's
server-side date filtering (Solutions/chapter03/docker/events-api/app.py:61-65).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def date_range_half_open(
    df: DataFrame, date_col: str, start: str, end: str
) -> DataFrame:
    """``start <= date < end`` — half-open, matching Airflow interval
    semantics (reference lecture3/06_templated_query.py:23-24; events server
    filter app.py:61-65). Pushed down to the scan; prunes date partitions.
    """
    c = F.col(date_col)
    return df.filter((c >= F.lit(start)) & (c < F.lit(end)))


def keyword_any(
    df: DataFrame, text_cols: Sequence[str], keywords: Sequence[str]
) -> DataFrame:
    """Keep rows where ANY keyword appears in the lowercased concatenation
    of ``text_cols`` (reference gold_war_etl_dag.py:37,93-97 WAR_KEYWORDS).

    One rlike over a concat — single JVM regex per row, whole-stage codegen.
    """
    pattern = "|".join(keywords)
    text = F.lower(F.concat_ws(" ", *[F.col(c) for c in text_cols]))
    return df.filter(text.rlike(pattern))


def membership(df: DataFrame, col: str, values: Sequence[str]) -> DataFrame:
    """``col IN (values)`` (reference lecture4/06:45 page_title in PAGENAMES).
    Compiles to an In predicate — pushed to parquet scan."""
    return df.filter(F.col(col).isin(list(values)))


def threshold_all(df: DataFrame, predicates: Sequence[Column]) -> DataFrame:
    """Conjunctive multi-column threshold gate (reference
    tutorial4_rocket_launcher.py:158-176 weather/fuel go-no-go checks)."""
    cond = F.lit(True)
    for p in predicates:
        cond = cond & p
    return df.filter(cond)


def validate_split(
    df: DataFrame, required_cols: Sequence[str]
) -> tuple[DataFrame, DataFrame]:
    """Valid/invalid split: rows with all ``required_cols`` non-null pass;
    the rest are quarantined (reference's warn-and-skip validation,
    lecture2/tutorial1_basic_etl.py:146-161).

    Returns (valid, quarantine). Both sides derive from one scan; Spark
    evaluates the predicate twice rather than materializing — at scale,
    persist the parent if both sides are consumed.
    """
    cond = F.lit(True)
    for c in required_cols:
        cond = cond & F.col(c).isNotNull()
    return df.filter(cond), df.filter(~cond)


def null_strip(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Drop rows that are entirely/partially null in ``subset`` (reference
    drops None-valued keys per record, tutorial1:136-144)."""
    return df.na.drop(subset=list(subset) if subset else None)
