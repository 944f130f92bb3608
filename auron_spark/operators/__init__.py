"""Operator inventory (SURVEY.md §2) — importing this package registers every
relational query in the engine registry."""

from auron_spark.operators import (  # noqa: F401
    aggregate,
    asof,
    funnel,
    generate,
    joins,
    patterns,
    pivot,
    relational,
    relational2,
    sort_setops,
    subqueries,
    timeseries,
    tpcds_shapes,
    window,
)
