"""Pipeline runner: the engine-level orchestration surface (SURVEY.md §2.11)."""

from .pipeline import (  # noqa: F401
    Branch,
    Pipeline,
    RetryPolicy,
    Stage,
    StageFailed,
    TriggerRule,
    interval_context,
)
