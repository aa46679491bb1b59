#!/usr/bin/env python
"""Plan-hygiene audit: run the N most expensive registered queries (by
the last BENCH_DETAIL.json) and flag, per stage, the two execution
pathologies that correctness tests and wall-clock benchmarks both miss
until they explode at 100×:

1. **Duplicate partition reads** — distinct tasks within one stage whose
   shuffle-read record counts repeat pairwise. That is the signature of
   a plan consuming one expensive subtree twice (a union of two selects,
   a probe + build pair, a nondeterministic expression blocking
   ReusedExchange): the same map output is fetched once per consumer.
   Caught this way in round 8: dedup_clusters' edge union executed the
   whole PassJoin candidate join twice (max task 6.6s → 1.8s after the
   single-scan rewrite).
2. **Stragglers** — max task time > 3× the stage median. Distinguishes a
   hot key / fat group (data problem: salt or split) from uniform stage
   width (max ≈ median — add partitions, not salt).
3. **Repeated file scans** — the SAME source relation appearing ≥3
   times as a FileScan leaf in one query's physical plan: the signature
   of one expensive subtree compiled per consumer (no exchange to reuse
   — detector 1 is blind to it because the redundancy is file reads,
   not shuffle fetches; a cached/checkpointed table re-read per
   consumer is the FIX for this shape and scans as ExistingRDD, so it
   never false-flags here). Caught retroactively in round 11:
   source_tv_drift's (source, token) table fed four consumers as four
   scan+tokenize subtrees — 0 flags from detectors 1-2, 2× wall, fixed
   with one localCheckpoint. Threshold is 3 because a SECOND pass over
   the input is the algorithmic floor for vocab-then-encode shapes
   (BPE, TF-IDF); a third identical scan is a missed materialization
   cut.

Usage: python plan_audit.py [N]   (default 20; needs BENCH_DETAIL.json)
Prints one line per flagged (query, stage); exits 1 if anything flagged,
so it slots into CI next to the oracle gate.
"""

from __future__ import annotations

import json
import re
import sys
import urllib.request
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from data_pipelines_cu_spark.queries import all_queries  # noqa: E402
from data_pipelines_cu_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
FAT_READ_ROWS = 100_000  # only fat reads can hide a meaningful double scan
STRAGGLER_RATIO = 3.0
STRAGGLER_FLOOR_MS = 2_000  # ignore ratios on sub-2s stages (noise)


def _ui(base: str, app_id: str, path: str):
    # base comes from sparkContext.uiWebUrl — never a hardcoded port:
    # a second concurrent driver pushes this app's UI to 4041+
    url = f"{base}/api/v1/applications/{app_id}{path}"
    with urllib.request.urlopen(url, timeout=15) as r:
        return json.load(r)


def _scan_counts(df) -> Counter:
    """Per-relation FileScan counts from the compiled physical plan
    (driver-side compile, no job). Relation identity = the scan's
    location paths; an unparseable leaf is counted under its first
    line so a plan this can't read still shows up rather than
    vanishing."""
    counts: Counter = Counter()
    try:
        # string walk, not collectLeaves: under AQE the whole query is
        # ONE AdaptiveSparkPlanExec leaf, which hides every real scan
        text = df._jdf.queryExecution().executedPlan().toString()
        for line in text.splitlines():
            if "FileScan" not in line:
                continue
            m = re.search(r"Location: \w+(?:\(\d+ paths?\))?\[([^\]]*)", line)
            rel = (
                m.group(1)
                if m
                else re.sub(r"^[^A-Za-z]*", "", line)[:120]
            )
            counts[rel] += 1
    except Exception:  # noqa: BLE001 — audit must never block the run
        pass
    return counts


def audit(n_queries: int = 20) -> int:
    spark = get_spark(
        "plan-audit",
        **{"spark.ui.enabled": "true", "spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    app = spark.sparkContext.applicationId
    base = spark.sparkContext.uiWebUrl
    detail = json.loads(
        (Path(__file__).resolve().parent / "BENCH_DETAIL.json").read_text()
    )
    walls = dict(detail["queries"], **detail.get("long_tail", {}))
    queries = all_queries()
    # a stale BENCH_DETAIL may name renamed/retired queries — skip them
    targets = [
        k
        for k, _ in sorted(walls.items(), key=lambda kv: -kv[1])
        if k in queries
    ][:n_queries]
    seen: set = set()
    n_flags = 0
    for name in targets:
        df = queries[name].fn(spark, SF_DIR)
        # detector 3 (static): count FileScan leaves per source relation
        # BEFORE executing — ≥3 scans of one relation is a subtree
        # compiled per consumer (a localCheckpoint cut scans as
        # ExistingRDD and is invisible here, by design)
        for rel, cnt in _scan_counts(df).items():
            if cnt >= 3:
                print(
                    json.dumps(
                        {
                            "query": name,
                            "flag": "repeated_file_scan",
                            "relation": rel,
                            "n_scans": cnt,
                        }
                    )
                )
                n_flags += 1
        df.write.format("noop").mode("overwrite").save()
        for st in _ui(base, app, "/stages?status=complete"):
            key = (st["stageId"], st["attemptId"])
            if key in seen:
                continue
            seen.add(key)
            if st["numCompleteTasks"] < 4:
                continue
            try:
                # page until exhausted: a wide stage (> page size tasks)
                # sampled partially can hide a double scan pair or skew
                # the fat-read fraction
                tasks: list = []
                while True:
                    page = _ui(
                        base,
                        app,
                        f"/stages/{st['stageId']}/{st['attemptId']}/taskList"
                        f"?offset={len(tasks)}&length=1000",
                    )
                    tasks.extend(page)
                    if len(page) < 1000:
                        break
            except OSError:
                continue
            reads = [
                t.get("taskMetrics", {})
                .get("shuffleReadMetrics", {})
                .get("recordsRead", 0)
                for t in tasks
            ]
            times = sorted(
                t.get("taskMetrics", {}).get("executorRunTime", 0)
                for t in tasks
            )
            fat = [r for r in reads if r > FAT_READ_ROWS]
            # double-scan signature: MANY distinct counts, each repeated
            # exactly twice (partition sizes vary naturally, so pairs of
            # equal counts across tasks = the same partition read per
            # consumer). A single value repeated across ALL tasks is a
            # legitimately uniform stage (round-robin repartition,
            # generated data) — NOT a double scan.
            groups = Counter(fat)
            pairs = [c for c in groups.values() if c == 2]
            if (
                len(pairs) >= 4
                and 2 * len(pairs) >= 0.8 * len(fat)
                and len(fat) >= 8
                and len(groups) >= 4
            ):
                print(
                    json.dumps(
                        {
                            "query": name,
                            "stage": st["stageId"],
                            "flag": "duplicate_partition_reads",
                            "fat_reads": len(fat),
                            "duplicated": 2 * len(pairs),
                        }
                    )
                )
                n_flags += 1
            mx, md = (times[-1], times[len(times) // 2]) if times else (0, 0)
            # md == 0 (sub-ms median) CAN be the extreme straggler
            # (near-empty siblings), but legitimately tiny-sibling
            # stages also read md == 0 — so that branch additionally
            # requires the max task to dominate the stage's total time
            # (one task is most of the work), not just clear the floor
            if mx > STRAGGLER_FLOOR_MS and (
                (md == 0 and mx > 0.5 * sum(times))
                or (md > 0 and mx / md > STRAGGLER_RATIO)
            ):
                print(
                    json.dumps(
                        {
                            "query": name,
                            "stage": st["stageId"],
                            "flag": "straggler",
                            "max_s": round(mx / 1000, 2),
                            "med_s": round(md / 1000, 2),
                        }
                    )
                )
                n_flags += 1
    print(
        json.dumps(
            {"audited": len(targets), "flags": n_flags, "sf_dir": SF_DIR}
        )
    )
    return 1 if n_flags else 0


if __name__ == "__main__":
    sys.exit(audit(int(sys.argv[1]) if len(sys.argv) > 1 else 20))
