"""Plan-level rewrites and strategy helpers (SURVEY.md §4 custom work)."""

from auron_spark.plans import json_once, layout, skew  # noqa: F401
