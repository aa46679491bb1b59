"""SparkSession factory tuned for both local testing and cluster scale.

The reference executes single-threaded pandas inside Airflow task processes
(SURVEY.md §4); here every query is a declarative Spark plan so Catalyst can
push filters/projections into the parquet scan, choose broadcast vs
sort-merge joins, and re-plan at runtime via AQE — the properties that make
the same code work at 100 TB on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the local[32] test harness; on a real cluster these are
# overridden by spark-submit conf. shuffle.partitions=auto via AQE coalescing:
# we set an upper bound and let AQE shrink post-shuffle partitions.
_DEFAULT_CONF = {
    # Adaptive execution: runtime partition coalescing, skew-join splitting,
    # and dynamic join strategy switching — essential at 100 TB where static
    # planning misguesses sizes.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Upper bound for shuffle partitions; AQE coalesces down. On a
    # 1000-executor cluster this should be ~2-3x total cores (set via conf).
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"),
    # Arrow for any pandas_udf / toPandas path (10-100x over pickle).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # PySpark 4's DataFrame-debugging layer captures the user call site on
    # EVERY DataFrame/Column function call (a Python stack walk plus two
    # extra py4j round trips: a conf read + PySparkCurrentOrigin.set).
    # Measured on this engine's expression-heavy builders: 2.2 ms/op with
    # it on vs 0.35 ms/op off — 6x the driver-side plan-construction cost,
    # which for the banded/hashed operators (minhash, simhash, PQ) was a
    # full second per query. The only loss is call-site decoration in
    # error messages; plans and results are identical. Overridable for
    # debugging sessions via the env knob.
    "spark.python.sql.dataFrameDebugging.enabled": os.environ.get(
        "SPARK_GRAFT_DF_DEBUGGING", "false"
    ),
    # Dynamic partition overwrite: idempotent per-partition recompute
    # (reference's delete-matching-then-insert upsert, SURVEY.md §2.6 O5).
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    # Broadcast threshold: dims (region/nation/supplier/part at test SF) are
    # broadcast; at 100 TB the fact side never is.
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    # Parquet scan tuning; at 100 TB maxPartitionBytes governs task count.
    "spark.sql.files.maxPartitionBytes": "128MB",
    "spark.sql.parquet.filterPushdown": "true",
    # Deterministic timestamp semantics regardless of host TZ (oracle parity).
    "spark.sql.session.timeZone": "UTC",
    # Fixture parquet stores TIMESTAMP(NANOS) which Spark has no native type
    # for; read as long and convert in the catalog (micros precision).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(app_name: str = "data_pipelines_cu_spark", **extra_conf: str) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's tuned defaults.

    Respects ``SPARK_GRAFT_CPUS`` for local parallelism (driver contract).
    Any ``extra_conf`` overrides the defaults.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(
        os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    )
    conf = dict(_DEFAULT_CONF)
    conf.update({k: str(v) for k, v in extra_conf.items()})
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
