"""Source/sink surface (SURVEY.md §2.1)."""

from auron_spark.sources import io, pyds  # noqa: F401
