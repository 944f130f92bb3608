"""Scalar function surface (SURVEY.md §2.9) — importing registers the
per-family function queries."""

from auron_spark.functions import decimal, families, families2, stats, udf  # noqa: F401
