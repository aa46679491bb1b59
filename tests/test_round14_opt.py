"""Round-14 optimization internals: the hardened `_widen_if_narrow`
precondition, the directory-aware catalog stamp + targeted eviction, and
the pyspark-internal pin behind the call-site-capture fast path."""

from __future__ import annotations

import time

from data_pipelines_cu_spark import catalog
from data_pipelines_cu_spark.operators import similarity as sim


def _job_count(spark) -> int:
    """Total jobs submitted so far on this context (DAGScheduler's next
    job id — advances exactly once per submitted job, no listener lag)."""
    return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()


def test_widen_refuses_shuffle_rooted_frames(spark):
    """On a shuffle-rooted frame `_widen_if_narrow` must be a no-op AND
    must not execute any stage: under AQE, touching `.rdd` materializes
    upstream shuffle stages at call time (r13 verdict item 3), so the
    helper now bails on any barrier node in the optimized plan."""
    from pyspark.sql import functions as F

    shuffled = spark.range(100).groupBy((F.col("id") % 7).alias("k")).count()
    before = _job_count(spark)
    out = sim._widen_if_narrow(shuffled)
    after = _job_count(spark)
    assert out is shuffled, "shuffle-rooted frame must pass through untouched"
    assert after == before, "the precondition check must never run a job"


def test_widen_scan_rooted_probe_is_job_free(spark, tmp_path):
    """The at-scale contract: on a scan-rooted frame the partition probe
    stays driver-side (no job), whether it widens or no-ops."""
    p = str(tmp_path / "t.parquet")
    spark.range(10).coalesce(1).write.parquet(p)
    narrow = spark.read.parquet(p)
    before = _job_count(spark)
    widened = sim._widen_if_narrow(narrow)
    assert _job_count(spark) == before, "scan-rooted probe ran a job"
    assert widened is not narrow  # 1 split < defaultParallelism -> widened


def test_pyspark_debugging_cache_internal_still_exists():
    """ensure_session_confs flips pyspark's process-local debugging-cache
    flag (the call-site-capture fast path). The attribute is a pyspark
    internal; this pins the 4.1.2 assumption so a future pyspark bump that
    renames it fails HERE, loudly, instead of silently reverting every
    Column op to the 6x-slower capture path."""
    from pyspark.errors import utils as err_utils

    assert hasattr(err_utils, "_enable_debugging_cache")


def test_dir_table_stamp_sees_inplace_part_rewrite(spark, tmp_path):
    """ADVICE r13 / verdict item 8: for a DIRECTORY-shaped parquet table,
    rewriting one part-file's contents in place (same file name, same
    entry count — root dir stat unchanged) must still invalidate the
    cached handle: the stamp folds in the direct children's stats."""
    p = str(tmp_path / "dirtable.parquet")
    spark.range(0, 10).repartition(2).write.parquet(p)
    first = catalog._raw_table(spark, p)
    assert first.count() == 10
    stamp_before = catalog._path_stamp(p)
    # in-place rewrite of ONE part file, same name, new contents
    import os

    parts = sorted(
        f for f in os.listdir(p) if f.endswith(".parquet") and f.startswith("part-")
    )
    assert parts, "expected part files"
    victim = os.path.join(p, parts[0])
    time.sleep(0.05)  # ensure a distinguishable mtime at ns resolution
    spark.range(100, 120).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "replacement.parquet")
    )
    repl_dir = str(tmp_path / "replacement.parquet")
    repl = sorted(
        f for f in os.listdir(repl_dir) if f.endswith(".parquet")
    )
    with open(os.path.join(repl_dir, repl[0]), "rb") as src:
        data = src.read()
    with open(victim, "wb") as dst:
        dst.write(data)
    # a real in-place rewrite also rewrites the Hadoop LocalFS checksum
    # sidecar; leaving the stale .crc would fail the read with a
    # ChecksumException, which is a different (loud) failure mode than
    # the silent staleness this test guards against
    repl_crc = os.path.join(repl_dir, f".{repl[0]}.crc")
    victim_crc = os.path.join(p, f".{parts[0]}.crc")
    if os.path.exists(repl_crc) and os.path.exists(victim_crc):
        with open(repl_crc, "rb") as src:
            crc = src.read()
        with open(victim_crc, "wb") as dst:
            dst.write(crc)
    stamp_after = catalog._path_stamp(p)
    assert stamp_after != stamp_before, "child rewrite must change the stamp"
    fresh = catalog._raw_table(spark, p)
    assert fresh is not first, "stale handle served after in-place rewrite"


def test_handle_cache_targeted_eviction(spark, tmp_path):
    """A rewritten path's STALE entries are evicted on insert (not left to
    pile up until the mass clear); hot entries for other paths survive."""
    pa = str(tmp_path / "a.parquet")
    pb = str(tmp_path / "b.parquet")
    spark.range(5).coalesce(1).write.parquet(pa)
    spark.range(7).coalesce(1).write.parquet(pb)
    ha = catalog._raw_table(spark, pa)
    hb = catalog._raw_table(spark, pb)
    time.sleep(0.05)
    spark.range(9).coalesce(1).write.mode("overwrite").parquet(pa)
    catalog._raw_table(spark, pa)  # re-resolve under the new stamp
    entries_for_a = [
        k
        for k in catalog._TABLE_HANDLES
        if len(k) >= 3 and k[2] == pa and k[0] == id(spark)
    ]
    assert len(entries_for_a) == 1, f"stale entries linger: {entries_for_a}"
    # untouched path keeps its hot handle
    assert catalog._raw_table(spark, pb) is hb
    assert ha is not None  # silence linters; the old handle simply ages out
