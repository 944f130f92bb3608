"""Streaming surface — Structured Streaming (SURVEY.md §2.10)."""

from auron_spark.streaming import kafka, ops  # noqa: F401
