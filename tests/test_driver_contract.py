"""The driver imports __spark_entry__ and calls entry()/queries() with ITS
OWN SparkSession — one built without this engine's session.py confs. The
engine must self-provision any conf it needs (nanosAsLong for the
TIMESTAMP(NANOS) events fixture, UTC session TZ for oracle-comparable
date strings) on whatever session it is handed. Regression test runs the
contract in a clean subprocess with a vanilla session."""

from __future__ import annotations

import subprocess
import sys

SCRIPT = """
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .appName("vanilla-driver").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import sys
sys.path.insert(0, "/root/repo")
import __spark_entry__ as e
assert e.entry(spark).count() > 0
q = e.queries()
assert q["events_user_daily_counts"](spark, "/root/testdata/sf0.001").count() > 0
assert q["hourly_price_stats"](spark, "/root/testdata/sf0.001").count() > 0
print("CONTRACT_OK")
"""


def test_entry_contract_with_vanilla_session():
    out = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "CONTRACT_OK" in out.stdout, out.stderr[-2000:]


def test_flagship_rollup_stable_across_partitionings(spark):
    """The round-1 flagship failure mode: AVG over doubles flaking with
    partition layout. The decimal-sum rollup must produce IDENTICAL rounded
    values for any spark.sql.shuffle.partitions setting."""
    from data_pipelines_cu_spark.queries import all_queries

    fn = all_queries()["daily_price_rollup"].fn
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    results = []
    try:
        for n in ("2", "17", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", n)
            rows = sorted(
                tuple(r) for r in fn(spark, "/root/testdata/sf0.01").collect()
            )
            results.append(rows)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results[0] == results[1] == results[2]


ARROW_CWD_SCRIPT = """
import os, sys
os.chdir("/tmp")                       # hostile cwd: repo not implicitly on path
sys.path.insert(0, "/root/repo")       # driver-side import works...
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .appName("vanilla-arrow").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
import __spark_entry__ as e
q = e.queries()
# ...but Python WORKERS resolve the package through their own sys.path:
# without ensure_session_confs shipping the package via addPyFile these
# mapInPandas queries die with ModuleNotFoundError in the worker.
assert q["ann_ivf_topk"](spark, "/root/testdata/sf0.001").count() > 0
assert q["llm_extract_structured"](spark, "/root/testdata/sf0.001").count() > 0
print("ARROW_CWD_OK")
"""


def test_arrow_kernels_survive_foreign_cwd():
    """Regression: driver process with cwd outside the repo (workers can't
    inherit driver sys.path edits) must still run every Arrow kernel."""
    out = subprocess.run(
        [sys.executable, "-c", ARROW_CWD_SCRIPT],
        capture_output=True,
        text=True,
        timeout=300,
        env={k: v for k, v in __import__("os").environ.items() if k != "PYTHONPATH"},
    )
    assert "ARROW_CWD_OK" in out.stdout, out.stderr[-2000:]


def test_gate_rotation_reads_correctness_artifacts(monkeypatch, tmp_path):
    """all_queries() front-loads exactly the queries without a green row in
    any CORRECTNESS_r*.json, unpins the flagship once verified, and falls
    back to the recorded round-1 set when no artifact is readable."""
    import glob
    import json

    import data_pipelines_cu_spark.queries as Q

    names = list(Q.QUERIES)

    real_gate_verified = Q._gate_verified

    def scan(root):
        # the REAL artifact scanner, pointed at a test dir (bound before the
        # monkeypatch so it survives being patched out of the module)
        return real_gate_verified(root=str(root))

    # two rounds of artifacts: r1 greens half, r2 greens the flagship
    half = {n: {"hash_match": True} for n in names[: len(names) // 2]}
    r2 = {"daily_price_rollup": {"hash_match": True},
          "approx_daily_users": {"err": "no_oracle"}}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(half))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(r2))
    monkeypatch.setattr(
        "data_pipelines_cu_spark.queries._gate_verified", lambda: scan(tmp_path)
    )
    ordered = list(Q.all_queries())
    verified = scan(tmp_path)
    assert ordered[0] != "daily_price_rollup"  # unpinned once green
    n_ungated = len(names) - len(set(verified) & set(names))
    assert all(n not in verified for n in ordered[:n_ungated])
    assert all(n in verified for n in ordered[n_ungated:])
    # verified tail is ordered by verification AGE: every r1-verified query
    # precedes every r2-verified one, so the stalest greens re-enter the
    # driver's 50-slot gate window first
    tail_rounds = [verified[n] for n in ordered[n_ungated:] if n in names]
    assert tail_rounds == sorted(tail_rounds)

    # no artifacts -> falls back to the recorded round-1 set
    monkeypatch.setattr(
        "data_pipelines_cu_spark.queries._gate_verified",
        lambda: scan(tmp_path / "empty"),
    )
    ordered = list(Q.all_queries())
    assert ordered[0] == "daily_price_rollup"
    assert set(ordered) == set(names)


def test_gate_verified_latest_round_wins(tmp_path):
    """A query that hash-matched in an early round but regressed red in a
    later one must LOSE verified status (and rotate back into the gate
    window) — a monotone union across rounds would mask the regression
    forever. Exercises the real artifact scanner, not a reimplementation."""
    import json

    import data_pipelines_cu_spark.queries as Q

    r1 = {"q_stable": {"hash_match": True},
          "q_regressed": {"hash_match": True},
          "q_recovered": {"hash_match": False, "rows_match": True}}
    r2 = {"q_regressed": {"hash_match": False, "rows_match": True},
          "q_recovered": {"hash_match": True},
          "q_rowsonly": {"err": "no_oracle"}}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(r1))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps(r2))
    verified = Q._gate_verified(root=str(tmp_path))
    assert "q_stable" in verified          # green, never contradicted
    assert "q_regressed" not in verified   # later red overrides earlier green
    assert "q_recovered" in verified       # later green overrides earlier red
    assert "q_rowsonly" in verified        # rows-only-by-design counts
