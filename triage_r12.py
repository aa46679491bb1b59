#!/usr/bin/env python
"""Round-12 opening triage: isolated, warm, median-of-3 re-measure of the 11
queries BENCH_r11.json flagged (corpus_datacard 5.95x normalized first), with
the cpu_probe box-state reading recorded alongside — the procedure BASELINE.md
declares required for every non-empty regressions field."""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench import cpu_probe  # noqa: E402
from data_pipelines_cu_spark.queries import all_queries  # noqa: E402
from data_pipelines_cu_spark.session import get_spark  # noqa: E402

FLAGGED = [
    "corpus_datacard",
    "doc_bigram_likelihood",
    "doc_length_histogram",
    "doc_packed_sequences",
    "doc_token_chunks",
    "doc_repeated_ngram_fraction",
    "sliding_window_chunks",
    "event_value_trend_by_type",
    "quality_dedup_survivors",
    "regional_supplier_volume",
    "doc_tfidf_top_terms",
]

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark("triage_r12", **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    # warm: parquet footers + JVM
    queries["orders_by_region"].fn(spark, SF_DIR).count()

    out: dict[str, object] = {"sf": 0.1}
    for name in FLAGGED:
        fn = queries[name].fn

        def run():
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()

        run()  # warm-up: codegen + any broadcast build, untimed
        samples = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {
            "samples": samples,
            "median": round(statistics.median(samples), 3),
        }
    out["cpu_probe"] = cpu_probe(spark)
    out["cpu_probe_reference"] = 1.80
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
