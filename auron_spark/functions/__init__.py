"""Scalar function surface (SURVEY.md §2.9) — importing registers the
per-family function queries."""

from auron_spark.functions import (  # noqa: F401
    decimal,
    families,
    families2,
    stats,
    udaf_partial,
    udf,
)
