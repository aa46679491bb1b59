"""Structured Streaming jobs (SURVEY.md §2.9).

The reference's cadences map to streaming semantics:

- per-minute ingest DAG (lecture3/12:90) → file/rate source with
  ``trigger(processingTime=...)`` or ``availableNow`` for catch-up
- hourly agg DAG (13:47-50) → 1h tumbling event-time window + watermark
- daily rollup DAG (14) → the §7.3 cascade answer: stream level 1 into a
  sink, batch-rollup level 2 per trigger via ``foreachBatch`` (chained
  streaming aggregations would need update-mode intermediates)
- FileSensor on _SUCCESS (lecture5/07:80-87) → file-stream source picks up
  atomically-committed files; Spark writes _SUCCESS markers natively
- delete-and-replace upsert per hour (13:80-83) → watermark + update mode,
  late rows re-emit their bucket

Tests drive these with availableNow over temp dirs — the same code path a
1000-executor cluster runs against object storage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming import StreamingQuery

TICK_SCHEMA = T.StructType(
    [
        T.StructField("fetch_time", T.TimestampType(), True),
        T.StructField("price_float", T.DoubleType(), True),
    ]
)


def read_tick_stream(
    spark: SparkSession, path: str, schema: T.StructType = TICK_SCHEMA
) -> DataFrame:
    """File-arrival micro-batch source (the minute-ingest analog). New
    files under ``path`` are discovered per trigger; maxFilesPerTrigger
    bounds batch size for backpressure."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 96)
        .json(path)
    )


def hourly_window_agg(
    ticks: DataFrame,
    ts_col: str = "fetch_time",
    value_col: str = "price_float",
    watermark: str = "2 hours",
) -> DataFrame:
    """1h tumbling event-time window with late-data tolerance — the
    streaming twin of aggregates.multi_stat_time_bucket. min_by/max_by give
    first/last by event time exactly as the batch path does."""
    ts, val = F.col(ts_col), F.col(value_col)
    return (
        ticks.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts, "1 hour").alias("w"))
        .agg(
            F.avg(val).alias("avg_price"),
            F.min(val).alias("min_price"),
            F.max(val).alias("max_price"),
            F.min_by(val, ts).alias("first_price"),
            F.max_by(val, ts).alias("last_price"),
            F.count(val).alias("data_points"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd").alias("date"),
            F.date_format("w.start", "HH").alias("hour"),
            "avg_price",
            "min_price",
            "max_price",
            "first_price",
            "last_price",
            "data_points",
        )
    )


def run_hourly_to_sink(
    ticks: DataFrame,
    sink_path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Level-1 streaming agg → partitioned parquet sink (append on window
    close). availableNow processes the backlog then stops — the
    catchup=True analog."""
    agg = hourly_window_agg(ticks)
    writer = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint)
        .partitionBy("date")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def run_cascade(
    ticks: DataFrame,
    hourly_path: str,
    daily_path: str,
    checkpoint: str,
    available_now: bool = True,
) -> StreamingQuery:
    """The hourly→daily cascade via foreachBatch (§7.3 hard part 5):
    each micro-batch upserts hourly partitions, then recomputes the daily
    rollup for exactly the affected dates — streaming level 1, idempotent
    batch level 2, mirroring the reference's separate DAGs."""
    from ..operators.aggregates import daily_rollup
    from ..operators.upsert import upsert_partitions

    agg = hourly_window_agg(ticks)

    def process(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        upsert_partitions(batch, hourly_path, ["date"])
        affected = [r.date for r in batch.select("date").distinct().collect()]
        hourly_all = spark.read.parquet(hourly_path).filter(
            F.col("date").isin(affected)
        )
        upsert_partitions(daily_rollup(hourly_all), daily_path, ["date"])

    writer = (
        agg.writeStream.outputMode("append")
        .foreachBatch(process)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
