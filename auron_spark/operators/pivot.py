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


@query(
    "pivot_topn_other_bucket",
    oracle="""
    WITH counts AS (
        SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type
    ),
    topn AS (
        SELECT event_type FROM (
            SELECT event_type,
                   ROW_NUMBER() OVER (ORDER BY n DESC, event_type) AS rk
            FROM counts) WHERE rk <= 3
    ),
    bucketed AS (
        SELECT e.user_id,
               CASE WHEN t.event_type IS NOT NULL
                    THEN e.event_type ELSE 'other' END AS bucket
        FROM events e LEFT JOIN topn t ON t.event_type = e.event_type
    )
    SELECT user_id, bucket, CAST(COUNT(*) AS BIGINT) AS n
    FROM bucketed
    WHERE user_id <= 30
    GROUP BY user_id, bucket
    ORDER BY user_id, bucket
    """,
    tags=("pivot", "topn", "bucketing"),
)
def pivot_topn_other_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic top-N + OTHER bucketing — the scale-safe form of a dynamic
    pivot: the column vocabulary is cut to the N globally-heaviest
    categories (deterministic count-then-name tiebreak) and everything
    else collapses into 'other', bounding downstream cardinality no
    matter how long the category tail grows (the reason a 100 TB report
    never pivots on a raw high-cardinality column).  Emitted long-form
    (user, bucket, n); `pivot_event_counts` covers the wide form for a
    static vocabulary.

    Scale shape: the top-N comes from a category-grain aggregate (|types|
    rows) + TakeOrderedAndProject-sized rank; the bucket map is a
    BROADCAST left join onto the fact table (N rows); the final count is
    one partial/final aggregate.  Fully distributed — no driver-side
    vocabulary collect, no literal pivot list."""
    from pyspark.sql import Window

    ev = Tables(spark, sf_dir).events
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    topn = (
        counts.withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("n"), "event_type")),
        )
        .filter(F.col("rk") <= 3)
        .select(F.col("event_type").alias("top_type"))
    )
    bucketed = ev.join(
        F.broadcast(topn), ev.event_type == F.col("top_type"), "left"
    ).select(
        "user_id",
        F.when(F.col("top_type").isNotNull(), F.col("event_type"))
        .otherwise(F.lit("other"))
        .alias("bucket"),
    )
    return (
        bucketed.where(F.col("user_id") <= 30)
        .groupBy("user_id", "bucket")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy("user_id", "bucket")
    )
