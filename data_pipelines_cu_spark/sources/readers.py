"""File readers (SURVEY.md §2.1 S1-S4, S8-S9).

The reference reads JSON/CSV row-by-row with stdlib/pandas; here every
format goes through ``spark.read`` with an explicit schema (schema-on-read,
no inference pass over 100 TB) so scans stay vectorized, prunable and
pushdown-capable. Gzip text is decompressed natively by Spark (S8 — the
reference shells out to gunzip, lecture4/06:79-83).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_json(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    multiline: bool = False,
) -> DataFrame:
    """JSON scan (S1/S2). ``multiline=True`` for whole-file JSON arrays
    (the reference's json.load of an array document); default is JSONL,
    which is the splittable-at-scale layout."""
    reader = spark.read.option("multiLine", multiline)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str | None = None,
    header: bool = True,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Typed CSV scan (S3/S4). PERMISSIVE mode nulls malformed fields —
    combine with operators.cleaning.cast_with_reject for the reference's
    warn-and-skip semantics (tutorial2:152-159)."""
    reader = spark.read.option("header", header).option("mode", mode)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)  # test convenience only
    return reader.csv(path)


def read_text(spark: SparkSession, path: str) -> DataFrame:
    """Line scan; handles .gz transparently (S8)."""
    return spark.read.text(path)


def parse_space_delimited(
    df: DataFrame,
    columns: Sequence[tuple[str, str]],
    value_col: str = "value",
    sep: str = " ",
) -> DataFrame:
    """Space-delimited text parse (S9 — the Wikimedia pageviews format
    ``domain_code page_title view_count response_size``,
    lecture4/06_stocksense_complete.py:40-50).

    ``columns`` is [(name, spark_type_ddl), ...] positional.
    """
    parts = F.split(F.col(value_col), sep)
    return df.select(
        *[
            parts.getItem(i).cast(dtype).alias(name)
            for i, (name, dtype) in enumerate(columns)
        ]
    )


PAGEVIEWS_COLUMNS: list[tuple[str, str]] = [
    ("domain_code", "string"),
    ("page_title", "string"),
    ("view_count", "int"),
    ("response_size", "long"),
]


def read_pageviews(spark: SparkSession, path: str) -> DataFrame:
    """The stocksense scan: gz text → 4 typed columns (S8+S9)."""
    return parse_space_delimited(read_text(spark, path), PAGEVIEWS_COLUMNS)


def read_jsonl_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    line_col: str = "_raw",
) -> tuple[DataFrame, DataFrame]:
    """JSONL scan with a malformed-record side-output: (valid, quarantine).

    Reads lines as text and applies ``from_json`` explicitly, so bad rows
    land in the quarantine frame with their raw line preserved — the
    reference's warn-and-skip ingestion (lecture2/tutorial1_basic_etl.py:
    146-161) as a two-output split. The corrupt-record marker lives
    INSIDE the from_json schema (PERMISSIVE from_json yields a struct of
    nulls, not a null struct, so marker-less null checks can't tell a bad
    line from a valid all-null record) — and unlike the file-source
    _corrupt_record column this form needs no cache to filter on. One
    pass, uncached, any input size. Blank lines are dropped, not
    quarantined."""
    marker = "_corrupt"
    with_marker = T.StructType(
        [*schema.fields, T.StructField(marker, T.StringType())]
    )
    lines = read_text(spark, path).filter(F.length(F.trim("value")) > 0)
    parsed = lines.select(
        F.col("value").alias(line_col),
        F.from_json(
            "value", with_marker, {"columnNameOfCorruptRecord": marker}
        ).alias("_parsed"),
    )
    ok = F.col(f"_parsed.{marker}").isNull()
    valid = parsed.filter(ok).select(
        *[F.col(f"_parsed.{f.name}") for f in schema.fields]
    )
    quarantine = parsed.filter(~ok).select(line_col)
    return valid, quarantine


def read_parquet_evolved(
    spark: SparkSession, *paths: str
) -> DataFrame:
    """Parquet read across schema generations: ``mergeSchema`` unions the
    footers so files written before a column existed read as null — the
    engine-side analog of unionByName(allowMissingColumns) for data that
    accumulated under an evolving pipeline (the reference's CSVs gain
    columns between lecture versions). Merge happens over footers only;
    at 100 TB the data pages are untouched and pruning still applies."""
    return spark.read.option("mergeSchema", True).parquet(*paths)


def read_orc(spark: SparkSession, *paths: str) -> DataFrame:
    """ORC scan (Spark-native reader): the columnar alternative every
    Hive-era lake still carries. Same pushdown/pruning contract as the
    parquet scans — predicates and column selection reach the stripe
    reader (ORC keeps min/max + bloom stripe statistics)."""
    return spark.read.orc(*paths)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (zlib default codec). Interop surface for consumers that
    read ORC; parquet stays the engine's primary format."""
    df.write.mode(mode).orc(path)
