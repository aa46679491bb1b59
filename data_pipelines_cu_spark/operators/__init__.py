"""Operator library — SURVEY.md §2 re-expressed as DataFrame transformations.

Every operator is a pure function ``DataFrame -> DataFrame`` (composable via
``df.transform``), keeps the plan declarative (no collect, no driver loops),
and is designed so Catalyst can push filters/prune columns through it.
"""
