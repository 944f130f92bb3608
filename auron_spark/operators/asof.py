"""As-of join — a custom operator the reference does not have (SURVEY.md §2.3:
"no range/as-of/interval join in the reference").

Composition-of-built-ins implementation (option (a) in the build brief): union
the two event streams, tag the side, and forward-fill the right side's latest
timestamp with a running MAX window — one shuffle on (user_id), no pairwise
join ever materializes.  This beats `applyInPandas` + `pd.merge_asof` at scale
because it stays in Tungsten and inherits AQE skew splitting on the partition
key.

The DuckDB oracle uses its native ASOF JOIN, proving semantic equivalence of
the windowed formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from auron_spark.registry import query
from auron_spark.tables import Tables


def asof_join_last_right(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """For each left row, attach the greatest right-side timestamp `<=` the
    left timestamp within the same `on` group (columns: all left columns +
    `asof_ts`).  NULL when no prior right row exists."""
    lt = left.select(
        F.lit(1).alias("_is_left"),
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_payload"),
    )
    rt = right.select(
        F.lit(0).alias("_is_left"),
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(None).cast(lt.schema["_payload"].dataType).alias("_payload"),
    )
    # right rows sort before left rows at equal timestamps so `<=` matches
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = lt.unionByName(rt).withColumn(
        "asof_ts", F.max(F.when(F.col("_is_left") == 0, F.col("_ts"))).over(w)
    )
    out_cols = [F.col(f"_payload.{c}").alias(c) for c in left.columns]
    return filled.filter(F.col("_is_left") == 1).select(*out_cols, "asof_ts")


@query(
    "asof_join_purchase_click",
    oracle="""
    SELECT p.event_id,
           p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase' AND user_id <= 40) p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    ORDER BY p.event_id
    """,
    tags=("join", "asof", "custom-operator"),
)
def asof_join_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase matched to the user's most recent prior click."""
    t = Tables(spark, sf_dir)
    ev = t.events
    purchases = ev.filter((F.col("event_type") == "purchase") & (F.col("user_id") <= 40))
    clicks = ev.filter(F.col("event_type") == "click")
    joined = asof_join_last_right(purchases, clicks, on="user_id")
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("purchase_ts"),
        F.date_format("asof_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("click_ts"),
    ).orderBy("event_id")
