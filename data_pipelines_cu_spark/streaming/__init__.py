"""Structured Streaming layer mirroring the reference's DAG cadences
(SURVEY.md §2.9)."""
