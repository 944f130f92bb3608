"""Pivot / unpivot.

No dedicated operator in the reference — Spark plans `pivot()` as a two-phase
aggregate over conditional expressions and `unpivot` as an Expand projection
(both covered by the reference's Agg/Expand operators, §2.2/§2.4).  Registered
here because they are part of the user-facing surface a reference user expects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.registry import query
from auron_spark.tables import Tables

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "pivot_event_counts",
    oracle="""
    SELECT user_id,
           COUNT(*) FILTER (WHERE event_type = 'click') AS click,
           COUNT(*) FILTER (WHERE event_type = 'error') AS error,
           COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
           COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
           COUNT(*) FILTER (WHERE event_type = 'view') AS view
    FROM events
    WHERE user_id <= 40
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("pivot", "agg"),
)
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pivot(): per-user event-type count matrix.  Pivot values are given
    explicitly — at scale, discovering them would be an extra pass."""
    t = Tables(spark, sf_dir)
    return (
        t.events.filter(F.col("user_id") <= 40)
        .groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0, list(EVENT_TYPES))
        .orderBy("user_id")
    )


@query(
    "unpivot_part_metrics",
    oracle="""
    SELECT p_partkey, metric, val FROM (
        SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
        UNION ALL
        SELECT p_partkey, 'retail' AS metric, CAST(p_retailprice AS DOUBLE) AS val
        FROM part
    )
    ORDER BY p_partkey, metric
    """,
    tags=("unpivot", "expand"),
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt → Expand projection (one output row per metric)."""
    t = Tables(spark, sf_dir)
    return (
        t.part.select(
            "p_partkey",
            F.col("p_size").cast("double").alias("size"),
            F.col("p_retailprice").cast("double").alias("retail"),
        )
        .unpivot("p_partkey", ["size", "retail"], "metric", "val")
        .orderBy("p_partkey", "metric")
    )
