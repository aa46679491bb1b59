"""Tests for the §2.11 pipeline runner: deps, branch, trigger rules,
retries, sensors, interval templating."""

from __future__ import annotations

import pytest

from data_pipelines_cu_spark.plans import (
    Branch,
    Pipeline,
    RetryPolicy,
    Stage,
    StageFailed,
    TriggerRule,
    interval_context,
)
from data_pipelines_cu_spark.plans.pipeline import backfill_intervals


def test_topological_execution_and_xcom():
    order = []
    p = Pipeline("t")
    p.add(Stage("a", lambda ctx: order.append("a") or 1))
    p.add(Stage("b", lambda ctx: order.append("b") or ctx["a"] + 1, upstream=["a"]))
    p.add(Stage("c", lambda ctx: order.append("c") or ctx["b"] * 10, upstream=["b"]))
    ctx = p.run()
    assert order == ["a", "b", "c"]
    assert ctx["c"] == 20  # XCom-style value handoff


def test_fan_out_fan_in():
    p = Pipeline("t", max_parallel=4)
    p.add(Stage("src", lambda ctx: 5))
    p.add(Stage("x", lambda ctx: ctx["src"] * 2, upstream=["src"]))
    p.add(Stage("y", lambda ctx: ctx["src"] * 3, upstream=["src"]))
    p.add(Stage("join", lambda ctx: ctx["x"] + ctx["y"], upstream=["x", "y"]))
    assert p.run()["join"] == 25


def test_branch_skips_unchosen_and_none_failed_join():
    ran = []
    p = Pipeline("t")
    p.add(Branch("pick", lambda ctx: "left"))
    p.add(Stage("left", lambda ctx: ran.append("left"), upstream=["pick"]))
    p.add(Stage("right", lambda ctx: ran.append("right"), upstream=["pick"]))
    p.add(
        Stage(
            "after",
            lambda ctx: ran.append("after"),
            upstream=["left", "right"],
            trigger_rule=TriggerRule.NONE_FAILED,
        )
    )
    ctx = p.run()
    assert ran == ["left", "after"]
    assert ctx["_states"]["right"].value == "skipped"


def test_all_success_blocks_after_failure():
    p = Pipeline("t")
    p.add(Stage("boom", lambda ctx: 1 / 0))
    p.add(Stage("next", lambda ctx: "ran", upstream=["boom"]))
    with pytest.raises(StageFailed):
        p.run()


def test_retry_eventually_succeeds():
    attempts = {"n": 0}

    def flaky(ctx):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    p = Pipeline("t")
    p.add(Stage("flaky", flaky, retry=RetryPolicy(retries=3, delay_sec=0.01)))
    assert p.run()["flaky"] == "ok"
    assert attempts["n"] == 3


def test_sensor_waits_for_predicate(tmp_path):
    marker = tmp_path / "_SUCCESS"

    def make_marker(ctx):
        marker.write_text("")
        return "made"

    p = Pipeline("t")
    p.add(Stage("produce", make_marker))
    p.add(
        Stage(
            "consume",
            lambda ctx: "consumed",
            upstream=["produce"],
            wait_for=lambda ctx: marker.exists(),
            timeout_sec=5,
        )
    )
    assert p.run()["consume"] == "consumed"


def test_sensor_timeout():
    p = Pipeline("t")
    p.add(
        Stage(
            "never",
            lambda ctx: "x",
            wait_for=lambda ctx: False,
            poke_interval_sec=0.01,
            timeout_sec=0.05,
        )
    )
    with pytest.raises(StageFailed):
        p.run()


def test_interval_context_half_open():
    ctx = interval_context("2024-01-10", interval_days=3)
    assert ctx == {"ds": "2024-01-10", "next_ds": "2024-01-13"}


def test_backfill_intervals():
    ivs = backfill_intervals("2024-01-01", "2024-01-04")
    assert [i["ds"] for i in ivs] == ["2024-01-01", "2024-01-02", "2024-01-03"]
    assert ivs[-1]["next_ds"] == "2024-01-04"


def test_cycle_prevented_by_construction():
    p = Pipeline("t")
    with pytest.raises(ValueError):
        p.add(Stage("a", lambda ctx: 1, upstream=["a"]))
