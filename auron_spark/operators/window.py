"""Window-function operator family.

Reference: WindowExec (`window_exec.rs:45`, processors under
`window/processors/`) covering row_number/rank/dense_rank/percent_rank/
cume_dist/lead/nth_value and running SUM/AVG/MAX/MIN/COUNT, plus the
WindowGroupLimit top-k pruning (`window_exec.rs:54-71`).  Spark's window
support is a strict superset (arbitrary frames, lag, ntile) — SURVEY.md §2.5.

Determinism: window ORDER BY always carries the `event_id` PK as tiebreaker so
rank/lag outputs are stable across engines.  Running aggregates over doubles go
through DECIMAL (segment-tree vs sequential accumulation would otherwise differ
at the ulp level between engines).

Scale: all windows partition by `user_id` (150 × SF keys, zipf-skewed).  At
100 TB a hot user's partition must fit one task — the top-k query uses Spark
3.5's WindowGroupLimit pushdown so only k rows per group survive the sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from auron_spark.registry import query
from auron_spark.tables import Tables

_W = "PARTITION BY user_id ORDER BY ts, event_id"


@query(
    "window_ranking",
    oracle=f"""
    SELECT event_id,
           user_id,
           ROW_NUMBER() OVER ({_W}) AS rn,
           RANK() OVER (PARTITION BY user_id ORDER BY event_type) AS rnk,
           DENSE_RANK() OVER (PARTITION BY user_id ORDER BY event_type) AS drnk,
           NTILE(4) OVER ({_W}) AS quartile
    FROM events
    ORDER BY event_id
    """,
    tags=("window", "rank"),
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank/ntile (`window/processors/*_processor.rs`)."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id").orderBy("event_type")
    return (
        t.events.select(
            "event_id",
            "user_id",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w_type).alias("rnk"),
            F.dense_rank().over(w_type).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("event_id")
    )


@query(
    "window_percentiles",
    oracle=f"""
    SELECT event_id,
           ROUND(PERCENT_RANK() OVER ({_W}), 9) AS pct_rank,
           ROUND(CUME_DIST() OVER ({_W}), 9) AS cume,
           NTH_VALUE(event_type, 3) OVER
             ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_type
    FROM events
    WHERE user_id <= 20
    ORDER BY event_id
    """,
    tags=("window", "percent_rank"),
)
def window_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist/nth_value — the reference constrains nth_value
    to the running frame (`NativeWindowBase.scala:163-177`); we use the same
    frame.  Ratios are exact small-integer divisions; rounded to 9 digits for
    cross-engine hash stability."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        t.events.filter(F.col("user_id") <= 20)
        .select(
            "event_id",
            F.round(F.percent_rank().over(w), 9).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 9).alias("cume"),
            F.nth_value("event_type", 3).over(w_run).alias("third_type"),
        )
        .orderBy("event_id")
    )


@query(
    "window_lead_lag",
    oracle=f"""
    SELECT event_id,
           LEAD(event_type, 1, 'none') OVER ({_W}) AS next_type,
           LAG(event_type, 1, 'none') OVER ({_W}) AS prev_type,
           LEAD(value, 2) OVER ({_W}) AS next2_value
    FROM events
    WHERE user_id <= 20
    ORDER BY event_id
    """,
    tags=("window", "lead", "lag"),
)
def window_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead (with default) and lag — lag is JVM-side in the reference
    (unsupported natively, `NativeWindowBase.scala:179-188`); both are
    first-class here."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t.events.filter(F.col("user_id") <= 20)
        .select(
            "event_id",
            F.lead("event_type", 1, "none").over(w).alias("next_type"),
            F.lag("event_type", 1, "none").over(w).alias("prev_type"),
            F.lead("value", 2).over(w).alias("next2_value"),
        )
        .orderBy("event_id")
    )


@query(
    "window_running_agg",
    oracle=f"""
    SELECT event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
             ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_sum,
           COUNT(*) OVER
             ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n,
           CAST(MAX(value) OVER
             ({_W} ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_max
    FROM events
    WHERE user_id <= 20
    ORDER BY event_id
    """,
    tags=("window", "agg"),
)
def window_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running SUM/COUNT/MAX — the only frame the reference supports for
    window aggregates (`NativeWindowBase.scala:197-236`)."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.events.filter(F.col("user_id") <= 20)
        .select(
            "event_id",
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("running_sum"),
            F.count("*").over(w).alias("running_n"),
            F.max("value").over(w).cast("double").alias("running_max"),
        )
        .orderBy("event_id")
    )


@query(
    "window_sliding_frame",
    oracle=f"""
    SELECT event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER
             ({_W} ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS win_sum,
           CAST(MIN(value) OVER
             ({_W} ROWS BETWEEN 3 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS win_min
    FROM events
    WHERE user_id <= 20
    ORDER BY event_id
    """,
    tags=("window", "frame"),
)
def window_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary sliding ROWS frame — beyond the reference's running-frame
    limit; free in Spark (SURVEY.md §2.5 note)."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-3, 1)
    return (
        t.events.filter(F.col("user_id") <= 20)
        .select(
            "event_id",
            F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("win_sum"),
            F.min("value").over(w).cast("double").alias("win_min"),
        )
        .orderBy("event_id")
    )


@query(
    "window_top_k_per_group",
    oracle="""
    SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rn
        FROM events
    ) WHERE rn <= 3
    ORDER BY user_id, event_id
    """,
    tags=("window", "group-limit", "topk"),
    bench=True,
)
def window_top_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: rank-filter pattern that Spark 3.5 rewrites to
    WindowGroupLimitExec — the reference's window group limit
    (`window_exec.rs:54-71`, `AuronConverters.scala:1079-1105`).  At scale this
    prunes to k rows per group *before* the full sort."""
    t = Tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    return (
        t.events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "value")
        .orderBy("user_id", "event_id")
    )


@query(
    "window_range_frame",
    oracle="""
    SELECT event_id,
           COUNT(*) OVER
             (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
              RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_last_hour
    FROM events
    WHERE user_id <= 20
    ORDER BY event_id
    """,
    tags=("window", "range-frame"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event-time seconds: events per trailing hour per user.
    Not supported by the reference at all; idiomatic Spark `rangeBetween`."""
    t = Tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, 0)
    )
    return (
        t.events.filter(F.col("user_id") <= 20)
        .select("event_id", F.count("*").over(w).alias("n_last_hour"))
        .orderBy("event_id")
    )


@query(
    "window_ignore_nulls",
    oracle="""
    SELECT event_id,
           LAG(v IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS prev_v,
           LEAD(v IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY ts, event_id) AS next_v,
           LAST_VALUE(v IGNORE NULLS) OVER
             (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_seen
    FROM (SELECT event_id, user_id, ts,
                 CASE WHEN value >= 10 THEN value END AS v
          FROM events WHERE user_id <= 20)
    ORDER BY event_id
    """,
    tags=("window", "ignore-nulls"),
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/last_value with IGNORE NULLS — gap-filling (last observation
    carried forward).  The reference explicitly cannot do this natively
    (`NativeWindowBase.scala:179-188` rejects IGNORE NULLS and lag); Spark
    supports it in the same window operator."""
    t = Tables(spark, sf_dir)
    v = F.when(F.col("value") >= 10, F.col("value"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # lag/lead don't expose ignorenulls in the Python functions API — the SQL
    # expression form is the documented spelling for them
    over = "OVER (PARTITION BY user_id ORDER BY ts, event_id)"
    return (
        t.events.filter(F.col("user_id") <= 20)
        .select("event_id", "user_id", "ts", v.alias("v"))
        .select(
            "event_id",
            F.expr(f"lag(v) IGNORE NULLS {over}").alias("prev_v"),
            F.expr(f"lead(v) IGNORE NULLS {over}").alias("next_v"),
            F.last("v", ignorenulls=True).over(wrun).alias("last_seen"),
        )
        .orderBy("event_id")
    )


@query(
    "window_gaps_islands",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id,
               event_id - ROW_NUMBER() OVER (PARTITION BY user_id
                                             ORDER BY event_id) AS grp
        FROM events WHERE event_type = 'click'
    ),
    islands AS (
        SELECT user_id, grp,
               CAST(MIN(event_id) AS BIGINT) AS island_start,
               CAST(MAX(event_id) AS BIGINT) AS island_end,
               CAST(COUNT(*) AS BIGINT) AS island_len
        FROM seq GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(MAX(island_len) AS BIGINT) AS longest_island,
           CAST(SUM(island_len) AS BIGINT) AS n_events,
           CAST(MIN(island_start) AS BIGINT) AS first_event,
           CAST(MAX(island_end) AS BIGINT) AS last_event
    FROM islands
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("window", "gaps-islands", "sequence"),
)
def window_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of CONSECUTIVE event_ids per user
    (here: uninterrupted click sequences — no other user claimed an
    intervening id), via the classic value-minus-row_number grouping
    trick; rolled up to per-user island stats.  The remaining sequence
    pattern in the window family: sessionize_gap groups by TIME gaps,
    streak_daily_activity by calendar days — this one by IDENTIFIER
    continuity, the shape used for detecting unbroken offset ranges
    (e.g. Kafka offset audits, missing-row detection).

    Scale shape: one window exchange on user_id; the island rollup groups
    by (user_id, grp) — a prefix re-key of the window partitioning — and
    the final per-user rollup re-keys on user_id again; both aggregates
    ride partial/final hash agg, so only group states cross the wire."""
    from pyspark.sql import Window

    ev = Tables(spark, sf_dir).events.where(F.col("event_type") == "click")
    w = Window.partitionBy("user_id").orderBy("event_id")
    seq = ev.select(
        "user_id",
        "event_id",
        (F.col("event_id") - F.row_number().over(w)).alias("grp"),
    )
    islands = seq.groupBy("user_id", "grp").agg(
        F.min("event_id").cast("bigint").alias("island_start"),
        F.max("event_id").cast("bigint").alias("island_end"),
        F.count("*").cast("bigint").alias("island_len"),
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count("*").cast("bigint").alias("n_islands"),
            F.max("island_len").cast("bigint").alias("longest_island"),
            F.sum("island_len").cast("bigint").alias("n_events"),
            F.min("island_start").cast("bigint").alias("first_event"),
            F.max("island_end").cast("bigint").alias("last_event"),
        )
        .orderBy("user_id")
    )


@query(
    "window_running_distinct",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN ROW_NUMBER() OVER (
                        PARTITION BY user_id, event_type
                        ORDER BY ts, event_id) = 1
                    THEN 1 ELSE 0 END AS first_seen
        FROM events
    )
    SELECT user_id, event_id, distinct_types_so_far
    FROM (
        SELECT user_id, event_id,
               CAST(SUM(first_seen) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS distinct_types_so_far
        FROM flagged
    )
    WHERE event_id % 50 = 0
    ORDER BY user_id, event_id
    """,
    tags=("window", "running-distinct", "first-occurrence"),
)
def window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count per user — how many distinct event types
    each user has touched as of each event.  COUNT(DISTINCT) OVER a
    running frame is unsupported (and inherently O(n^2) state) in both
    engines; the scale answer is the FIRST-OCCURRENCE decomposition:
    flag each (user, type)'s first event with one window, then a running
    SUM of flags — two windows sharing the user_id exchange, linear
    state.  The output samples every 50th event id to keep the
    driver-hashed result compact; the full curve is the same plan minus
    the filter.

    Scale shape: the first-seen window partitions by (user_id,
    event_type) — a prefix extension of the running-sum window's
    user_id partitioning, so Spark plans one exchange for the pair."""
    from pyspark.sql import Window

    ev = Tables(spark, sf_dir).events
    wf = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    wr = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.row_number().over(wf) == 1, 1).otherwise(0).alias(
            "first_seen"
        ),
    )
    return (
        flagged.select(
            "user_id",
            "event_id",
            F.sum("first_seen").over(wr).cast("bigint").alias(
                "distinct_types_so_far"
            ),
        )
        .where(F.col("event_id") % 50 == 0)
        .orderBy("user_id", "event_id")
    )


@query(
    "window_rolling_median",
    oracle="""
    WITH sm AS (
        SELECT event_type, event_id,
               list_sort(list(value) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS frame
        FROM events
    )
    SELECT event_type, event_id,
           ROUND(frame[CAST(floor((len(frame) - 1) / 2) AS BIGINT) + 1], 6)
               AS rolling_median
    FROM sm
    WHERE event_id % 50 = 0
    ORDER BY event_type, event_id
    """,
    tags=("window", "rolling-median", "robust-smoothing"),
)
def window_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling MEDIAN smoothing — the robust (outlier-immune) moving
    average for noisy metric streams: the lower median of a 7-row
    centered frame per event type.  Neither engine has a median window
    function; the exact formulation collects the frame, sorts it, and
    picks rank floor((n-1)/2) — rank-based like every median in this
    repo, so no interpolation and no cross-engine drift.  Edge rows get
    shorter frames (standard centered-window semantics).  Output samples
    every 50th event id, with the filter OUTSIDE the window block.

    Scale shape: one window exchange on event_type; the collected frame
    is BOUNDED (7 values) per row, so state is O(frame), not O(stream) —
    the reason this pattern is safe where a running DISTINCT set is not.
    A wider smoothing window changes the constant only."""
    from pyspark.sql import Window

    ev = Tables(spark, sf_dir).events
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, 3)
    )
    frame = F.sort_array(F.collect_list("value").over(w))
    med = F.element_at(
        frame, (F.floor((F.size(frame) - 1) / 2) + 1).cast("int")
    )
    return (
        ev.select(
            "event_type",
            "event_id",
            F.round(med, 6).alias("rolling_median"),
        )
        .where(F.col("event_id") % 50 == 0)
        .orderBy("event_type", "event_id")
    )


# --- exact NTILE without a single-partition sort (VERDICT r6 ask #5) -------


def distributed_ntile(
    df: DataFrame,
    n: int,
    order_cols: list,
    out_col: str,
    num_parts: int = 32,
) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY order_cols)`` with NO
    single-partition window — the scale-safe global rank.

    The naive plan (``Window.orderBy`` with no partitionBy) funnels the
    whole input through ONE task: fine at fixture scale, the plan you must
    not run at billions of rows.  This helper computes the identical
    bucket assignment distributed:

    1. range-repartition on the full (total-ordering) key — Spark samples
       boundaries, so partition ``p`` holds a contiguous key range and all
       of partition ``p`` sorts before all of ``p+1``;
    2. ``row_number`` WITHIN each partition (parallel windows);
    3. per-partition row counts — ``num_parts`` longs — collect to the
       driver (constant-size model state, like the Lloyd centroids) and
       prefix-sum into offsets, so ``global_rank = offset[pid] + local_rn``;
    4. the NTILE bucket is then a map-side closed form of the global rank:
       with ``q, r = divmod(N, n)`` the first ``r`` buckets take ``q+1``
       rows, so ``bucket = (rank-1) DIV (q+1) + 1`` in the first
       ``r*(q+1)`` ranks and ``r + (rank - r*(q+1) - 1) DIV q + 1`` after.

    ``order_cols`` must be a total order (tiebreak with the PK) — the same
    requirement the exact-twin queries already meet for cross-engine
    determinism.  ``localCheckpoint`` pins the range partitioning so the
    count pass and the rank pass see identical partitions.
    """
    parts = (
        df.repartitionByRange(num_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        # Lazy (r16): materializes inside the immediately-following
        # per-partition aggregate's collect job — one driver job fewer
        # per device call; the range partitioning is still sampled and
        # pinned exactly once, at first materialization.
        .localCheckpoint(eager=False)
    )
    counts = sorted(
        (r["_pid"], r["c"])
        for r in parts.groupBy("_pid").agg(F.count("*").alias("c")).collect()
    )
    total = sum(c for _, c in counts)
    offsets, acc = {}, 0
    for pid, c in counts:
        offsets[pid] = acc
        acc += c
    q, r = divmod(max(total, 1), n)
    off_map = F.create_map(
        *[F.lit(x) for pid, off in offsets.items() for x in (pid, off)]
    )
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    rank = (
        F.element_at(off_map, F.col("_pid")) + F.row_number().over(w_local)
    ).cast("long")
    head = r * (q + 1)
    # Integer division (ADVICE r7 #1): floor(double-division) is exact only
    # while rank and bucket width stay below ~2^52 combined; `DIV` on longs
    # is exact at ANY scale — the whole point of the scale-safe global rank.
    bucket = (
        f"CASE WHEN {head} > 0 AND _rank <= {head} "
        f"THEN (_rank - 1) DIV {q + 1} "
        f"ELSE {r} + (_rank - {head} - 1) DIV {max(q, 1)} END"
    )
    return (
        parts.withColumn("_rank", rank)
        .withColumn(out_col, (F.expr(bucket) + 1).cast("int"))
        .drop("_pid", "_rank")
    )


@query(
    "window_time_range_frame",
    oracle="""
    SELECT event_type, event_id,
           CAST(n_1h AS BIGINT) AS n_1h,
           CAST(sum_1h AS DOUBLE) AS sum_1h
    FROM (
        SELECT event_type, event_id,
               COUNT(*) OVER w AS n_1h,
               SUM(CAST(value AS DECIMAL(18,2))) OVER w AS sum_1h
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                           AND CURRENT ROW)
    )
    WHERE event_id % 50 = 0
    ORDER BY event_type, event_id
    """,
    tags=("window", "range-frame", "interval", "timeseries"),
)
def window_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per event type, the trailing-1-hour event
    count and decimal-exact value sum at every event — the INTERVAL form
    of the RANGE frame family (`window_range_frame` covers the numeric
    form; the reference rejects non-trivial frames outright,
    `NativeWindowBase.scala:163-188`, so both forms are beyond-ref
    surface).  RANGE frames are tie-safe by construction: all ts-peers
    share one frame, so the sums are deterministic under tie reordering
    in both engines.

    Scale shape: one window pass partitioned by event_type ordered by ts
    — the same partitioned-sort any per-entity rolling metric pays; the
    1-in-50 sample caps the registered output only."""
    t = Tables(spark, sf_dir)
    t.events.createOrReplaceTempView("events_trf")
    return spark.sql(
        """
        SELECT event_type, event_id,
               CAST(n_1h AS BIGINT) AS n_1h,
               CAST(sum_1h AS DOUBLE) AS sum_1h
        FROM (
            SELECT event_type, event_id,
                   COUNT(*) OVER w AS n_1h,
                   SUM(CAST(value AS DECIMAL(18,2))) OVER w AS sum_1h
            FROM events_trf
            WINDOW w AS (PARTITION BY event_type ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                               AND CURRENT ROW)
        )
        WHERE event_id % 50 = 0
        ORDER BY event_type, event_id
        """
    )


def distributed_running_sums(
    df: DataFrame,
    order_cols: list,
    val_cols: list,
    num_parts: int = 32,
) -> DataFrame:
    """Exact inclusive running ``SUM(val) OVER (ORDER BY order_cols)`` for
    each of ``val_cols`` — with NO single-partition window (the prefix-sum
    generalization of `distributed_ntile`, same three moves):

    1. range-repartition on the total-ordering key (contiguous, sorted
       partition ranges);
    2. running sums WITHIN each partition (parallel ``_pid`` windows);
    3. per-partition totals — ``num_parts`` longs per column — collected
       as constant-size model state and prefix-summed into offsets, so
       ``global_cum = offset[pid] + local_cum``.

    Adds one ``cum_<col>`` long column per value column.  ``order_cols``
    must be a total order across rows (here: callers pass a key whose
    rows are unique, e.g. a value-grain aggregate's group key).
    ``localCheckpoint`` pins the partitioning so the totals pass and the
    window pass see identical partitions."""
    parts = (
        df.repartitionByRange(num_parts, *order_cols)
        .withColumn("_pid", F.spark_partition_id())
        # Lazy (r16): materializes inside the immediately-following
        # per-partition aggregate's collect job — one driver job fewer
        # per device call; the range partitioning is still sampled and
        # pinned exactly once, at first materialization.
        .localCheckpoint(eager=False)
    )
    totals = sorted(
        (r["_pid"], tuple(r[f"t_{c}"] for c in val_cols))
        for r in parts.groupBy("_pid")
        .agg(*[F.sum(c).cast("long").alias(f"t_{c}") for c in val_cols])
        .collect()
    )
    offsets: dict[int, tuple] = {}
    acc = [0] * len(val_cols)
    for pid, ts in totals:
        offsets[pid] = tuple(acc)
        acc = [a + t for a, t in zip(acc, ts)]
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = parts
    for i, c in enumerate(val_cols):
        off_map = F.create_map(
            *[F.lit(x) for pid, offs in offsets.items() for x in (pid, offs[i])]
        )
        out = out.withColumn(
            f"cum_{c}",
            (
                F.element_at(off_map, F.col("_pid"))
                + F.sum(c).over(w_local)
            ).cast("long"),
        )
    return out.drop("_pid")


def distributed_adjacent_pairs(
    df: DataFrame,
    key_col: str,
    num_parts: int = 32,
) -> DataFrame:
    """Every ADJACENT pair (k_prev, k) of a sorted key column with NO
    single-partition window — the third member of the range-partition
    device family (`distributed_ntile`: bucket closed form;
    `distributed_running_sums`: broadcast prefix offsets; here: BOUNDARY
    HANDOFF):

    1. range-repartition on the key (contiguous sorted partition ranges);
    2. ``lag`` WITHIN each partition (parallel ``_pid`` windows) sees
       every interior pair;
    3. each partition's (min, max) — ``num_parts`` rows of constant-size
       model state — collects to the driver, and adjacent partitions'
       (max, next min) seam pairs union back in.

    Every adjacent pair is produced exactly once: interior pairs by the
    partitioned lag, seam pairs by the handoff.  ``df`` must be unique on
    ``key_col`` (dedupe first); rows with NULL keys are the caller's
    problem.  Used by `dq_sequence_gaps_scale` and equality-tested
    against the naive global lag on the full pair relation."""
    spark = df.sparkSession
    parts = (
        df.select(key_col)
        .repartitionByRange(num_parts, F.asc(key_col))
        .withColumn("_pid", F.spark_partition_id())
        # Lazy (r16): materializes inside the immediately-following
        # per-partition aggregate's collect job — one driver job fewer
        # per device call; the range partitioning is still sampled and
        # pinned exactly once, at first materialization.
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("_pid").orderBy(key_col)
    interior = parts.select(
        F.lag(key_col).over(w).alias("k_prev"),
        F.col(key_col).alias("k"),
    ).where(F.col("k_prev").isNotNull())
    bounds = sorted(
        (r["_pid"], r["mn"], r["mx"])
        for r in parts.groupBy("_pid")
        .agg(F.min(key_col).alias("mn"), F.max(key_col).alias("mx"))
        .collect()
    )
    seams = [
        (prev_mx, next_mn)
        for (_, _, prev_mx), (_, next_mn, _) in zip(bounds, bounds[1:])
    ]
    if seams:
        # The seam frame's schema derives from the caller's key dtype
        # (ADVICE r13 #4): hardcoding `long` crashed non-integral keys and
        # silently mismatched narrower integrals in the union.
        key_type = df.schema[key_col].dataType
        seam_schema = T.StructType(
            [
                T.StructField("k_prev", key_type, False),
                T.StructField("k", key_type, False),
            ]
        )
        return interior.unionByName(
            spark.createDataFrame(seams, seam_schema)
        )
    return interior
