from __future__ import annotations

import gc
import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")


@pytest.fixture(autouse=True)
def _release_checkpoint_blocks():
    """Drop orphaned localCheckpoint RDD blocks between tests. Many
    operators pin executor-storage blocks via lineage cuts; over an
    870-test session those blocks accumulate until the tail of the suite
    pays the JVM memory pressure (measured r14: ann_sq8_topk 79 s inside
    the full suite vs 3.9 s isolated at the same config — bench.py has
    collected per query since r10 for the same reason)."""
    yield
    gc.collect()

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from data_pipelines_cu_spark.session import get_spark

    spark = get_spark("tests")
    yield spark


@pytest.fixture(scope="session")
def tables(spark):
    from data_pipelines_cu_spark.catalog import load_tables

    return load_tables(spark, SF_DIR)


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    from data_pipelines_cu_spark.catalog import TABLES

    for name in TABLES:
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()
