#!/usr/bin/env python
"""Round-13 opening triage: isolated, warm, median-of-3 re-measure of the ONE
query BENCH_r12.json flagged (part_profit_by_nation, 2.55x normalized), plus
the executed-plan census the round-12 verdict demanded: scan count per
relation, exchange count, and whether the two F.broadcast hints actually
planned as BroadcastHashJoin (the r12 lesson: checkpoint-adjacent frames
silently degrade to SMJ when size stats vanish)."""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench import cpu_probe, sched_probe  # noqa: E402
from plan_audit import ExecCursor, exec_plan_census  # noqa: E402
from data_pipelines_cu_spark.queries import all_queries  # noqa: E402
from data_pipelines_cu_spark.session import get_spark  # noqa: E402

FLAGGED = ["part_profit_by_nation"]
SF_DIR = "/root/testdata/sf0.1"


def plan_census(executions: list) -> dict:
    """Max-over-executions summary of the shared exec_plan_census (one
    parser for the /sql plan format, pinned by the characterization
    test — this script must not fork its own copy that drifts)."""
    per = [
        exec_plan_census(ex.get("planDescription", "") or "")
        for ex in executions
    ]
    agg = {"n_executions": len(executions)}
    for key in (
        "n_scans",
        "n_exchanges",
        "broadcast_hash_joins",
        "sort_merge_joins",
        "shuffled_hash_joins",
    ):
        agg[key] = max((c[key] for c in per), default=0)
    return agg


def main() -> None:
    spark = get_spark(
        "triage_r13",
        **{
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.ui.retainedExecutions": "5000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    queries["orders_by_region"].fn(spark, SF_DIR).count()  # warm footers + JVM

    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    out: dict[str, object] = {"sf": 0.1}
    for name in FLAGGED:
        fn = queries[name].fn

        def run():
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        run()  # warm-up: codegen + broadcast build, untimed
        cursor = ExecCursor(base, app_id)
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "samples": samples,
            "median": round(statistics.median(samples), 3),
            "plan": plan_census(cursor.new_executions()),
        }
    out["cpu_probe"] = cpu_probe(spark)
    out["sched_probe"] = sched_probe(spark)
    out["cpu_probe_reference"] = 1.80
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
