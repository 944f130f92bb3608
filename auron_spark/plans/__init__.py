"""Plan-level rewrites and strategy helpers (SURVEY.md §4 custom work)."""

from auron_spark.plans import json_once, skew  # noqa: F401
