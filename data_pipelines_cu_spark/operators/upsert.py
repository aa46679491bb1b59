"""Idempotent partitioned sinks (SURVEY.md §2.1 K3/K4, §2.6 O5).

The reference's upsert is read-modify-write on CSVs: drop rows matching the
new key, concat, rewrite (lecture3/13_binance_calculate_hourly.py:79-85,
14:76-89, 15:184-194). At scale that becomes dynamic partition overwrite:
recomputing a partition replaces exactly that partition, touching nothing
else — the idempotent-recompute property Airflow catchup/backfill relies on
(SURVEY.md §2.9). ``partitionOverwriteMode=dynamic`` is set in session.py.

Hour-level upserts use an hour-partitioned layout (date + hour partition
columns) rather than row-level merge inside a day file — SURVEY §7.3 hard
part 4: prefer partition granularity over read-modify-write.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_cols: Sequence[str], fmt: str = "parquet"
) -> None:
    """Date/hour-partitioned sink (K3: path contains {date} in the
    reference; here a real partitioned table so filters prune)."""
    (
        df.write.format(fmt)
        .mode("append")
        .partitionBy(*partition_cols)
        .save(path)
    )


def upsert_partitions(
    df: DataFrame, path: str, partition_cols: Sequence[str], fmt: str = "parquet"
) -> None:
    """Delete-matching-then-insert at partition granularity (K4/O5):
    overwrite ONLY the partitions present in ``df`` (dynamic mode), leaving
    all other partitions untouched. Re-running the same computation is a
    no-op state-wise — the atomicity/idempotency lesson of
    lecture3/10_non_atomic_send.py made structural."""
    (
        df.write.format(fmt)
        .mode("overwrite")
        .partitionBy(*partition_cols)
        .save(path)
    )


def read_partitioned(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(path)
