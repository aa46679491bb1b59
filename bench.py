#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is forced through the noop sink (full evaluation of every column,
no driver-side collection cost). Timings are end-to-end wall clock per query
including plan + execution.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from data_pipelines_cu_spark.queries import all_queries  # noqa: E402
from data_pipelines_cu_spark.session import get_spark  # noqa: E402

# Headline set: the reference's signature pipelines (events stats, hierarchical
# rollup, star join, window/top-k, dedup) + the north-star training-data ops.
HEADLINE = [
    "events_user_daily_counts",
    "cohort_retention",
    "purchase_funnel",
    "pricing_summary",
    "hourly_price_stats",
    "daily_price_rollup",
    "orders_by_region",
    "customer_order_totals",
    "top_events_per_user",
    "next_event_value",
    "dedup_keep_last",
    "daily_active_users",
    "best_hour_per_type",
    "doc_quality_scores",
    "doc_lang_id",
    "dedup_exact_groups",
    "simhash_fingerprints",
    "minhash_lsh_pairs",
    "ann_cosine_topk",
    "ann_cosine_topk_arrow",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "doc_winnowed_fingerprints",
    "nation_trade_flow",
    "min_cost_supplier_per_part",
    "event_value_percentiles",
    "late_shipment_priority",
    "unshipped_order_revenue",
    "regional_supplier_volume",
    "returned_item_losses",
    "customer_order_distribution",
    # round-10: the Q6/Q14/Q17/Q19 scalars merged into one 4-row KPI
    # suite (one gate entry; see queries.lineitem_revenue_kpis) — the
    # single entry replaces the old disjunctive_predicate_revenue +
    # discount_band_revenue headline rows and adds the Q14/Q17 work,
    # so headline totals gain ~2 queries' wall vs rounds <= 9
    "lineitem_revenue_kpis",
    "doc_repetition_ratio",
    "doc_token_rarity",
    "sole_late_supplier_orders",
    "doc_tfidf_top_terms",
    "user_activity_streaks",
    "ml_linear_scores",
    "ann_lsh_multiprobe_topk",
    "doc_decontamination",
    "incremental_dedup_new_docs",
    "doc_token_chunks",
    "lang_quota_sample",
    "doc_packed_sequences",
    "doc_source_mixture",
    "simhash_near_dup_pairs",
    "doc_lexical_diversity",
    "embedding_kmeans_clusters",
    "lang_bigram_top",
    "gopher_quality_gate",
    "source_dup_stats",
    "semantic_dedup_pairs",
    "semantic_dup_clusters",
    "ngram_containment_pairs",
    "fuzzy_decontamination",
    "word_freq_spectrum",
    "lang_sqrt_scaled_sample",
    "curriculum_order",
    "curation_pipeline_pack",
    "bigram_lift_top",
    "event_type_transitions",
    "stump_train_score",
    "click_purchase_recon",
    "minhash_jaccard_error",
    "doc_length_histogram",
    "doc_repeated_ngram_fraction",
    "kmv_daily_users",
    "cm_gram_count_error",
    "bloom_decontamination_stats",
    "perceptron_train_score",
    "event_value_trend_by_type",
    "jl_projection_distortion",
    # round-4 additions: compressed ANN, curation sampling, tokenizer
    "ann_sq8_topk",
    "ann_pq_topk",
    "importance_weighted_docs",
    "systematic_weighted_draws",
    "training_shard_order",
    "passage_dup_fraction",
    "cross_source_dedup",
    "doc_oov_rate",
    "bpe_top_merges",
    "user_value_ewma",
    "hist_quantile_sketch",
    "cdc_chunk_dup",
    "source_overlap_matrix",
    "quality_dedup_survivors",
    "doc_bigram_likelihood",
    "corpus_datacard",
    "ann_ivfpq_topk",
    "nb_lang_predict",
    "doc_feature_topk",
    "bpe_encode_ratio",
    "token_budget_mixture",
    "curation_v2_shards",
    "nation_trade_pagerank",
    "source_token_tv_drift",
    "k_anonymity_audit",
    "doc_longest_dup_span",
    # round-10: tokenize→pack composite (BPE token counts feeding the
    # sequence packer + manifest — the real pretraining last mile)
    "bpe_pack_pipeline",
]

REPEATS = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))


def _timed(run, repeats: int = REPEATS) -> float:
    """Median of ``repeats`` wall-clock runs — robust to one-off load spikes
    on a shared box (min hides queueing, mean absorbs it; median reports the
    typical run)."""
    return _timed_stats(run, repeats)[0]


def _timed_stats(run, repeats: int = REPEATS) -> tuple[float, float]:
    """(median, min) of ``repeats`` wall-clock runs. The median is the
    headline (typical run); the min is the stall-triage hint — on a box in
    a scheduler-starvation spell the min approaches the true compute cost
    while the median absorbs the queueing, so a flag whose min clears the
    regression threshold is box noise, not code (the round-11 flag burst:
    11 queries flagged on a probe-3.979 box, 10 of 11 cleared isolated)."""
    samples = []
    for _ in range(repeats):
        start = time.perf_counter()
        run()
        samples.append(time.perf_counter() - start)
    return round(statistics.median(samples), 3), round(min(samples), 3)


def _noop_write(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def cpu_probe(spark) -> float:
    """Box-state yardstick: a fixed, data-free, code-independent CPU
    burn (xxhash64 over a generated range, whole-stage codegen, no
    shuffle, no disk). The skew-join diagnostics proved to under-
    resolve whole-run box drift (r8-r9: ~4% diagnostic drift against a
    26% headline swing on identical code) — a pure-CPU probe separates
    'the machine is slower' from 'a query regressed' without touching
    any operator code path. Median of 3 after one warm-up."""
    import statistics  # noqa: PLC0415

    from pyspark.sql import functions as F  # noqa: PLC0415

    def burn():
        t0 = time.time()
        (
            spark.range(20_000_000_000)
            # bit_xor: overflow-free under ANSI (a SUM of hashes trips
            # ARITHMETIC_OVERFLOW); 20B rows ≈ 2s on the reference box
            # — big enough that scheduling noise is <5%
            .select(F.bit_xor(F.xxhash64("id")).alias("s"))
            .collect()
        )
        return time.time() - t0

    burn()  # codegen warm-up
    return round(statistics.median(burn() for _ in range(3)), 3)


def sched_probe(spark) -> dict[str, float]:
    """Scheduler-stall yardstick: median/min wall latency of 20 trivial
    one-task jobs (``spark.range(1).count()``), in milliseconds. The
    cpu_probe measures CPU-frequency-type slowdown only — one job of 32
    fat tasks amortizes scheduling latency to nothing — so it is blind to
    the starvation spells this box exhibits (proven by the r10 calibration
    row and r11's 11-flag burst at a flat probe: measured here, trivial-job
    latency runs 5-20 ms healthy and 100-190 ms mid-spell, inflating every
    multi-job sub-second query ~2x while cpu_probe moves <15%). Reported
    next to cpu_probe so a flag shower on a stalled box is mechanically
    attributable: sched_probe_ms >> anchor's reading = box spell, re-measure
    isolated before touching code. Median of 20 after one warm-up job; the
    min is the floor the scheduler actually achieves mid-run."""
    spark.range(1).count()  # warm: codegen + first-job setup, untimed
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        spark.range(1).count()
        lat.append((time.perf_counter() - t0) * 1000.0)
    return {
        "sched_probe_ms": round(statistics.median(lat), 1),
        "sched_probe_min_ms": round(min(lat), 1),
    }


def skew_demo(spark, sf_dir: str) -> dict[str, float]:
    """Salted vs unsalted sort-merge join on a deliberately skewed key:
    events amplified 50× with ~90% of rows on one hot key (the rest over
    ~1000 cold keys), with per-row hash work in the join's reduce stage so
    the straggler is compute-bound, as it is at 100 TB. Broadcast and AQE
    skew-splitting are disabled FOR THIS DEMO ONLY so the shuffle actually
    concentrates the hot key on one task — the failure mode when the dim
    is too big to broadcast and the engine lacks runtime skew handling;
    operators.skew.salted_broadcast_left spreads it over n_salts tasks.
    (In production this engine broadcasts small dims and leaves AQE on —
    the salt is the explicit fallback for the cases neither covers.)"""
    from pyspark.sql import functions as F

    from data_pipelines_cu_spark.catalog import load_table
    from data_pipelines_cu_spark.operators.skew import salted_broadcast_left

    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    amp = ev.withColumn("_r", F.explode(F.sequence(F.lit(1), F.lit(50))))
    skewed = amp.withColumn(
        "k",
        F.when(F.pmod("event_id", 10) < 9, F.lit(0)).otherwise(
            F.pmod("event_id", 1000) + 1
        ),
    )
    dim = spark.range(0, 1001).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("weight")
    )

    def heavy(joined):
        # md5 runs in the join's output stage: the hot task pays it for
        # every hot-key row, peers idle — unless the salt spreads them
        out = joined.select(
            "k",
            F.md5(F.concat_ws(":", "k", "event_id", "_r", "value", "weight")).alias(
                "h"
            ),
        )
        return out.select(F.count(F.lit(1)).alias("n"), F.max("h").alias("hmax"))

    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    try:
        run_unsalted = lambda: _noop_write(heavy(skewed.join(dim, "k")))  # noqa: E731
        run_salted = lambda: _noop_write(  # noqa: E731
            heavy(salted_broadcast_left(skewed, dim, "k", n_salts=32))
        )
        # One untimed warmup per variant: the first execution of each plan
        # shape pays codegen+JIT (~5s here, measured), which with 2 samples
        # poisons the median and hides the straggler contrast being measured.
        run_unsalted()
        run_salted()
        unsalted = _timed(run_unsalted, repeats=2)
        salted = _timed(run_salted, repeats=2)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)
    return {"skew_join_unsalted": unsalted, "skew_join_salted": salted}


def detect_regressions(
    current: dict[str, float],
    prior: dict | None,
    cur_probe: float,
    threshold: float = 1.5,
    floor_sec: float = 0.5,
    sf=None,
    current_min: dict[str, float] | None = None,
) -> list[dict]:
    """Mechanical per-query regression detection against the prior
    recorded run, normalized by the cpu_probe box-speed ratio — the
    comparison rounds 8-9 litigated by hand. A query flags when its
    current median exceeds ``threshold`` x its box-normalized prior
    (prior_wall x cur_probe/prior_probe) AND either side is at least
    ``floor_sec`` (sub-half-second walls are scheduler noise at
    median-of-1 long-tail resolution). Every flagged entry must be
    triaged in BASELINE.md before the round closes: either a real
    regression (fix it) or an in-run anomaly (re-measure isolated and
    record the reading).

    When per-query minimums are available (``current_min``, recorded since
    round 12), each flag additionally carries ``current_min_sec`` and
    ``min_ratio`` (min / box-normalized prior) plus ``stall_suspect: true``
    when the min clears the threshold the median tripped — i.e. at least
    one of the repeats ran at expected speed, so the flag is scheduler
    queueing, not a plan change. A stall_suspect flag still needs its
    BASELINE.md triage line, but the verdict is mechanical."""
    if not prior:
        return []
    if sf is not None and prior.get("sf") != sf:
        # an anchor recorded at a different scale factor (e.g. a
        # smoke-run detail at sf0.001) would flag everything; the
        # cpu_probe ratio normalizes box speed, not data volume
        return []
    prior_probe = (prior.get("diagnostics") or {}).get("cpu_probe")
    if not prior_probe or not cur_probe:
        return []
    box_ratio = cur_probe / prior_probe
    prior_walls = dict(prior.get("queries") or {})
    prior_walls.update(prior.get("long_tail") or {})
    flagged = []
    for name, cur in sorted(current.items()):
        pw = prior_walls.get(name)
        if pw is None:
            continue
        expected = pw * box_ratio
        if max(cur, expected) < floor_sec:
            continue
        if cur > threshold * expected:
            entry = {
                "query": name,
                "prior_sec": pw,
                "expected_sec": round(expected, 3),
                "current_sec": cur,
                "normalized_ratio": round(cur / expected, 2),
            }
            cmin = (current_min or {}).get(name)
            if cmin is not None:
                entry["current_min_sec"] = cmin
                entry["min_ratio"] = round(cmin / expected, 2)
                if cmin <= threshold * expected:
                    entry["stall_suspect"] = True
            flagged.append(entry)
    flagged.sort(key=lambda r: -r["normalized_ratio"])
    return flagged


def attach_forensics(spark, queries, sf_dir: str, regressions: list, cap: int = 8):
    """Flag-time forensics (round-12 verdict item 2): a post-close flag used
    to arrive with zero plan evidence — by the time the next round opened,
    the executed plan, scan census, and task times AT FLAG TIME were gone,
    and the builder re-measured on a different box state. Now every flag
    carries its own executed-plan summary, captured in-run on the SAME box
    state that produced the flag: one extra warm execution per flagged
    query (bounded at ``cap``), summarized via the plan_audit REST
    machinery (per-relation scan census, exchange count, join strategies,
    max task ms). Mutates the flag entries in place; any capture failure
    lands as ``{"error": ...}`` rather than blocking the bench."""
    if not regressions:
        return regressions
    import gc  # noqa: PLC0415

    from plan_audit import capture_forensics  # noqa: PLC0415

    for entry in regressions[:cap]:
        try:
            # lookup inside the guard: a stale anchor can flag a renamed
            # or retired query — that lands as an error note, not a crash
            fn = queries[entry["query"]].fn
            entry["forensics"] = capture_forensics(
                spark, lambda fn=fn: _noop_write(fn(spark, sf_dir))
            )
        except Exception as exc:  # noqa: BLE001 — never block the bench
            entry["forensics"] = {"error": str(exc)[:200]}
        gc.collect()
    return regressions


def selftest_status(selftest: dict | None) -> str:
    """One-word totals-line verdict for the forensics selftest. "ok"
    requires a REAL capture — at least one execution AND a plan census —
    because an empty capture (REST listing lag, planDescription
    disabled, cursor resync past the execution) is exactly the silent
    breakage the selftest exists to surface, and must not report
    healthy."""
    d = selftest or {}
    if (
        "error" not in d
        and d.get("n_executions", 0) >= 1
        and d.get("plan") is not None
    ):
        return "ok"
    return "error"


def load_anchor(repo_dir: Path) -> tuple[dict | None, str]:
    """Resolve the regression-gate anchor. Preference order:

    1. The newest committed ``BENCH_ANCHOR_r{N}.json`` — a per-round,
       git-versioned snapshot of a clean isolated run (headline +
       long-tail walls + the cpu_probe reading that normalizes them).
       Versioning the anchor is the point: the mutable on-disk detail
       gets overwritten by whoever ran last (round 10: the driver's
       post-close run silently replaced the builder's anchor), and a
       fresh clone had NO anchor at all, degrading the gate to
       no-flags with zero indication.
    2. ``BENCH_DETAIL.json`` (legacy fallback — last run on this disk).

    Returns ``(anchor_or_None, source_label)``; the label lands in the
    bench diagnostics so every BENCH artifact states which anchor it
    was judged against — "MISSING (regression gate inert)" is printed
    rather than silently flagging nothing."""
    # anchored round extraction, not an all-digits join: a stem carrying
    # extra digits (BENCH_ANCHOR_r2_sf1 -> "21") would misorder the
    # preference list and silently pick a stale anchor
    import re

    def _round(p: Path) -> int | None:
        m = re.fullmatch(r"BENCH_ANCHOR_r(\d+)", p.stem)
        return int(m.group(1)) if m else None

    candidates = sorted(
        (p for p in repo_dir.glob("BENCH_ANCHOR_r*.json") if _round(p) is not None),
        key=_round,
        reverse=True,
    )
    candidates.append(repo_dir / "BENCH_DETAIL.json")
    for path in candidates:
        try:
            anchor = json.loads(path.read_text())
        except (OSError, ValueError):
            continue  # absent or corrupt — fall through, report loudly below
        if anchor.get("queries") and (anchor.get("diagnostics") or {}).get(
            "cpu_probe"
        ):
            return anchor, path.name
    return None, "MISSING (regression gate inert)"


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # No console progress bars: their \r-spam inflated the captured output
    # past the driver's tail window in round 2 (BENCH_r02.json "parsed":
    # null) and they carry no information in a non-interactive run.
    spark = get_spark("bench", **{"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    # Warm the JVM + parquet footer caches with one tiny action so the first
    # timed query doesn't absorb session startup.
    queries["orders_by_region"].fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    import gc

    for name in HEADLINE:
        fn = queries[name].fn
        timings[name], timings_min[name] = _timed_stats(
            lambda: _noop_write(fn(spark, sf_dir))
        )
        # Release the previous query's localCheckpoint RDD blocks (several
        # headline queries pin (vector, cluster, norm)-sized frames in the
        # shared JVM): without the collect, pinned blocks accumulate across
        # the 89-query sweep and the tail of the run pays the GC pressure.
        gc.collect()

    total = round(sum(timings.values()), 3)
    # Long-tail coverage: every registered query NOT in the headline set,
    # timed once (median-of-1) so no registered query's wall-time is ever
    # a blind spot. Kept OUT of the headline total so round-over-round
    # totals stay comparable; recorded in BENCH_DETAIL.json.
    long_tail: dict[str, float] = {}
    for name in sorted(set(queries) - set(HEADLINE)):
        fn = queries[name].fn
        long_tail[name] = _timed(lambda: _noop_write(fn(spark, sf_dir)), repeats=1)
        gc.collect()
    # diagnostic entries (skew mitigation proof) — reported, not in the total
    extras = skew_demo(spark, sf_dir)
    extras["cpu_probe"] = cpu_probe(spark)
    extras.update(sched_probe(spark))
    # The reference reading of cpu_probe on the box that set the 78.06s
    # headline record (BASELINE.md round 9). Embedded so every BENCH
    # artifact carries its own normalization hint: headline totals are
    # only comparable across rounds after dividing out the box-speed
    # ratio cpu_probe / cpu_probe_reference (the machine behind this
    # repo has been observed to change speed by >2x between rounds,
    # including a mid-round reboot onto ~half the effective cores).
    extras["cpu_probe_reference"] = 1.80
    # Mechanical regression gate: compare every query (headline AND
    # long-tail) to the committed anchor (newest BENCH_ANCHOR_r{N}.json,
    # falling back to the on-disk BENCH_DETAIL.json), scaled by the
    # box-speed ratio the two runs' cpu_probes measure. A missing/corrupt
    # anchor degrades to an empty flag list but is REPORTED in the
    # diagnostics (anchor_source) — never a silent no-op.
    prior, anchor_source = load_anchor(Path(__file__).resolve().parent)
    extras["anchor_source"] = anchor_source
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "", 1).isdigit() else sf
    regressions = detect_regressions(
        {**timings, **long_tail},
        prior,
        extras["cpu_probe"],
        sf=sf_val,
        # long-tail entries are median-of-1: their min IS the median
        current_min={**timings_min, **long_tail},
    )
    attach_forensics(spark, queries, sf_dir, regressions)
    # Self-test of the forensics capture on a fixed cheap star join, recorded
    # in every BENCH artifact: proves IN the artifact that flag-time capture
    # works on this box (a zero-flag run would otherwise never exercise it,
    # and the first real flag is exactly when a silent breakage would hurt).
    try:
        from plan_audit import capture_forensics  # noqa: PLC0415

        _st_fn = queries["orders_by_region"].fn
        extras["forensics_selftest"] = capture_forensics(
            spark, lambda: _noop_write(_st_fn(spark, sf_dir))
        )
    except Exception as exc:  # noqa: BLE001
        extras["forensics_selftest"] = {"error": str(exc)[:200]}
    detail = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "n": REPEATS,
        "queries": timings,
        "queries_min": timings_min,
        "long_tail": long_tail,
        "diagnostics": extras,
        "regressions": regressions,
        "sf": sf_val,
    }
    # Per-query detail goes FIRST (and to BENCH_DETAIL.json): the driver only
    # captures the last ~2,000 chars of stdout, and the full 73-query dict is
    # ~3.5 KB — printing it last truncated the line head (including "metric"
    # and "value") for three rounds straight ("parsed": null in BENCH_r01-03).
    print(json.dumps(detail, separators=(",", ":")), flush=True)
    try:
        Path(__file__).resolve().parent.joinpath("BENCH_DETAIL.json").write_text(
            json.dumps(detail, indent=1) + "\n"
        )
    except OSError:
        pass
    # The VERY LAST stdout write is the driver-visible line. The driver
    # captures only the last ~2,000 chars of stdout (measured: the recorded
    # tail in every BENCH_r*.json is exactly 2,000 chars), so this line must
    # stay under that or its head — "metric", "value" — is truncated and the
    # whole artifact parses to null (rounds 1-3). Round 14 restores the
    # per-query timings contract here (VERDICT r13, item 1: the totals-only
    # "queries": {} line left PERF_r13 with no per-query table, no geomean
    # and an empty scaling block): the dict is filled MOST-EXPENSIVE-FIRST
    # from the full headline+long-tail walls, up to a hard character budget
    # that keeps the complete JSON object inside the tail window. Same
    # timings, same methodology — only where they are printed changes; the
    # complete dicts still go to the first stdout line and BENCH_DETAIL.json.
    sys.stdout.flush()
    sys.stderr.flush()
    final = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "n": REPEATS,
        "n_queries": len(timings),
        "queries": {},
        # the full selftest census lives in the detail artifact; the
        # totals line carries a one-word status so the forensics
        # layer can't push the line past the driver's tail window
        "diagnostics": {
            **extras,
            "forensics_selftest": selftest_status(extras.get("forensics_selftest")),
        },
        # flag NAMES live in the detail line / BENCH_DETAIL.json; the final
        # line spends its budget on per-query walls (the gate's input) and
        # keeps only the counts — a catastrophically-degraded box that flags
        # half the registry cannot push the line past the tail window
        "n_regressions": len(regressions),
        # flags whose per-query MIN cleared the threshold the
        # median tripped: mechanically attributable to scheduler
        # stalls (see sched_probe), not plan changes
        "n_stall_suspect": sum(1 for r in regressions if r.get("stall_suspect")),
        "sf": sf_val,
    }
    budget = 1880 - len(json.dumps(final, separators=(",", ":")))
    fill: dict[str, float] = {}
    used = 0
    for name, wall in sorted(
        {**long_tail, **timings}.items(), key=lambda kv: (-kv[1], kv[0])
    ):
        # 0.1 floor: a 0.0 entry would poison the driver's ratio math
        val = max(round(wall, 1), 0.1)
        cost = len(name) + 4 + len(json.dumps(val)) + 1  # "name":val,
        if used + cost > budget:
            break
        fill[name] = val
        used += cost
    final["queries"] = fill
    line = json.dumps(final, separators=(",", ":"))
    assert len(line) < 1950, f"final bench line {len(line)} chars > tail window"
    print(line, flush=True)


if __name__ == "__main__":
    main()
