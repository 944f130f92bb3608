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


NEAREST_TOL = 3600.0  # seconds — match window on either side


@query(
    "asof_join_nearest",
    oracle=f"""
    WITH p AS (
        SELECT event_id, user_id, epoch(ts) AS pts
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, epoch(ts) AS cts
        FROM events WHERE event_type = 'click'
    ),
    prevn AS (
        SELECT event_id, MAX(c.cts) AS prev_ts
        FROM p JOIN c ON c.user_id = p.user_id
                     AND c.cts <= p.pts AND c.cts > p.pts - {NEAREST_TOL}
        GROUP BY event_id
    ),
    nextn AS (
        SELECT event_id, MIN(c.cts) AS next_ts
        FROM p JOIN c ON c.user_id = p.user_id
                     AND c.cts > p.pts AND c.cts <= p.pts + {NEAREST_TOL}
        GROUP BY event_id
    )
    SELECT p.event_id,
           p.user_id,
           ROUND(CASE
               WHEN prev_ts IS NULL AND next_ts IS NULL THEN NULL
               WHEN prev_ts IS NULL THEN next_ts - p.pts
               WHEN next_ts IS NULL THEN p.pts - prev_ts
               WHEN p.pts - prev_ts <= next_ts - p.pts THEN p.pts - prev_ts
               ELSE next_ts - p.pts END, 6) AS nearest_gap_sec,
           CASE
               WHEN prev_ts IS NULL AND next_ts IS NULL THEN 'none'
               WHEN prev_ts IS NULL THEN 'after'
               WHEN next_ts IS NULL THEN 'before'
               WHEN p.pts - prev_ts <= next_ts - p.pts THEN 'before'
               ELSE 'after' END AS nearest_side
    FROM p
    LEFT JOIN prevn USING (event_id)
    LEFT JOIN nextn USING (event_id)
    ORDER BY p.event_id
    """,
    tags=("join", "asof", "nearest", "tolerance"),
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of join with tolerance — pd.merge_asof's
    direction='nearest' at cluster scale: for each purchase, the CLOSEST
    click in either direction within {NEAREST_TOL:.0f}s, reporting the
    gap and which side won (ties prefer the earlier click, matching
    pandas).  Sensor-fusion and feature-alignment pipelines need this
    two-sided variant; the backward-only case is `asof_join_purchase_click`.

    Implementation: the union-stream trick twice in ONE window pass —
    running MAX of click times (backward candidate) and, over the
    REVERSED ordering, running MIN (forward candidate) — then a map-side
    tolerance + nearest pick.  Still no pairwise join, still one
    exchange on user_id; the oracle cross-checks with two explicit
    range-join aggregations.

    Exactness: epoch doubles, fixed-order comparisons; gap rounds to
    6 dp only at output."""
    ev = Tables(spark, sf_dir).events
    p = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").cast("double").alias("_ts"),
        F.lit(1).alias("_is_left"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.lit(None).cast("bigint").alias("event_id"),
        "user_id",
        F.col("ts").cast("double").alias("_ts"),
        F.lit(0).alias("_is_left"),
    )
    u = p.unionByName(c)
    wb = (
        Window.partitionBy("user_id")
        .orderBy("_ts", "_is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("_ts"), F.desc("_is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    click_ts = F.when(F.col("_is_left") == 0, F.col("_ts"))
    filled = u.select(
        "event_id",
        "user_id",
        "_ts",
        "_is_left",
        F.max(click_ts).over(wb).alias("prev_ts"),
        F.min(click_ts).over(wf).alias("next_ts"),
    ).filter(F.col("_is_left") == 1)
    prev_ok = F.col("prev_ts").isNotNull() & (
        F.col("prev_ts") > F.col("_ts") - NEAREST_TOL
    )
    next_ok = F.col("next_ts").isNotNull() & (
        F.col("next_ts") <= F.col("_ts") + NEAREST_TOL
    )
    d_prev = F.col("_ts") - F.col("prev_ts")
    d_next = F.col("next_ts") - F.col("_ts")
    gap = (
        F.when(~prev_ok & ~next_ok, F.lit(None).cast("double"))
        .when(~prev_ok, d_next)
        .when(~next_ok, d_prev)
        .when(d_prev <= d_next, d_prev)
        .otherwise(d_next)
    )
    side = (
        F.when(~prev_ok & ~next_ok, "none")
        .when(~prev_ok, "after")
        .when(~next_ok, "before")
        .when(d_prev <= d_next, "before")
        .otherwise("after")
    )
    return filled.select(
        "event_id",
        "user_id",
        F.round(gap, 6).alias("nearest_gap_sec"),
        side.alias("nearest_side"),
    ).orderBy("event_id")
