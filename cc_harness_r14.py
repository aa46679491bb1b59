"""Connected-components equivalence + round-count harness (r14 item 4).

Compares the committed dedup_clusters loop against candidate rewrites on
adversarial graphs (chains, stars, rings, random, and the bench-shaped
SemDeDup graph), checking (a) identical component assignments, (b) rounds
(actions) used, (c) wall clock.

Usage: python cc_harness_r14.py [candidate ...]
"""

from __future__ import annotations

import sys
from pathlib import Path
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from data_pipelines_cu_spark.operators import dedup as dd
from data_pipelines_cu_spark.session import get_spark

spark = get_spark("cc-harness", **{"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")


def graphs():
    """(name, edge list [(a, b)]) adversarial suite."""
    out = []
    # 64-deep chain x 8 chains (the SemDeDup bench shape's worst case)
    edges = []
    for c in range(8):
        base = c * 1000
        edges += [(base + i, base + i + 1) for i in range(63)]
    out.append(("chains64", edges))
    # 1000-deep single chain
    out.append(("chain1000", [(i, i + 1) for i in range(999)]))
    # star: hub high id (worst case for min-propagation)
    out.append(("star_high_hub", [(10_000, i) for i in range(200)]))
    # star: hub low id
    out.append(("star_low_hub", [(0, i + 1) for i in range(200)]))
    # ring of 256
    out.append(("ring256", [(i, (i + 1) % 256) for i in range(256)]))
    # binary tree depth 10
    out.append(("tree10", [((i - 1) // 2, i) for i in range(1, 1023)]))
    # random graph: 2000 nodes, 3000 edges (few big components)
    import random

    rng = random.Random(7)
    out.append(
        (
            "rand2000",
            [
                (rng.randrange(2000), rng.randrange(2000))
                for _ in range(3000)
            ],
        )
    )
    # duplicate/self edges mixed in
    out.append(("dups", [(1, 2), (2, 1), (3, 3), (2, 3), (9, 9)]))
    return out


def to_df(edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "ia long, ib long"
    )


def run(fn, edges):
    t0 = time.perf_counter()
    rows = fn(to_df(edges), "ia", "ib").collect()
    wall = time.perf_counter() - t0
    return {r["doc_id"]: r["canonical_id"] for r in rows}, wall


def reference_components(edges):
    """Driver-side union-find ground truth."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def job_count():
    return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()


def main():
    candidates = {"current": dd.dedup_clusters}
    for name in sys.argv[1:]:
        if hasattr(dd, name):
            candidates[name] = getattr(dd, name)
        else:
            sys.path.insert(0, str(Path(__file__).resolve().parent))
            import cc_candidates_r14 as cc_candidates  # noqa: PLC0415

            candidates[name] = getattr(cc_candidates, name)
    ok = True
    for gname, edges in graphs():
        truth = reference_components(edges)
        base = None
        for cname, fn in candidates.items():
            j0 = job_count()
            got, wall = run(fn, edges)
            jobs = job_count() - j0
            # canonical ids must be the component MIN (both the current
            # loop and any candidate must agree with union-find's min)
            mism = {
                n: (lab, truth.get(n))
                for n, lab in got.items()
                if truth.get(n) != lab
            }
            status = "OK" if not mism else f"MISMATCH x{len(mism)}"
            if mism:
                ok = False
                ex = list(mism.items())[:5]
                print(f"  {gname:14s} {cname:10s} {status} examples={ex}")
            else:
                print(
                    f"  {gname:14s} {cname:10s} {status} "
                    f"jobs={jobs} wall={wall:.2f}s"
                )
            if base is None:
                base = got
            elif got != base:
                ok = False
                print(f"  {gname}: {cname} DIFFERS from current")
    print("ALL OK" if ok else "FAILURES")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
