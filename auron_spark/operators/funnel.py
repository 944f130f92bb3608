"""Funnel / ordered-sequence analysis over the events stream.

A user "converts" when the funnel stages happen in strict time order within
a conversion window: first view, then the first click *after* that view
(within 24 h), then the first purchase *after* that click (within 24 h).
Plain per-type MIN(ts) gets this wrong (a click before the first view must
not count), so each stage conditions on the previous stage's timestamp.
The window keeps all three reach outcomes populated in the fixtures
(sf0.01: 150 viewers -> 60 clickers -> 25 purchasers).

Beyond-reference extension in the same spirit as the as-of join
(`operators/asof.py`): event-sequence analytics the reference's TPC-style
suite doesn't cover but every clickstream deployment needs.

100 TB shape: three aggregations and two joins, all keyed on ``user_id`` —
one hash partitioning carries the whole plan (Spark reuses the exchange),
and stage inputs shrink monotonically (only users who reached stage k are
joined for stage k+1).  No window over full event history, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.registry import query
from auron_spark.tables import Tables


@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, MIN(ts) AS first_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
        SELECT e.user_id, MIN(e.ts) AS first_click
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.first_view
          AND e.ts <= v.first_view + INTERVAL 24 HOUR
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, MIN(e.ts) AS first_purchase
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.first_click
          AND e.ts <= c.first_click + INTERVAL 24 HOUR
        GROUP BY e.user_id
    )
    SELECT v.user_id,
           strftime(v.first_view, '%Y-%m-%d %H:%M:%S.%f') AS first_view,
           strftime(c.first_click, '%Y-%m-%d %H:%M:%S.%f') AS first_click,
           strftime(p.first_purchase, '%Y-%m-%d %H:%M:%S.%f') AS first_purchase,
           c.user_id IS NOT NULL AS reached_click,
           p.user_id IS NOT NULL AS reached_purchase
    FROM v
    LEFT JOIN c ON v.user_id = c.user_id
    LEFT JOIN p ON v.user_id = p.user_id
    ORDER BY v.user_id
    """,
    tags=("events", "funnel", "sequence"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered three-stage funnel with per-stage reach flags.

    The per-stage user-grain frames v and c are localCheckpoint-ed: each
    feeds both the next stage's filter and the final reach join, and
    un-materialized the compiled plan re-derived the events scan 6x
    (round-9 plan sweep).  Materialized, the plan pays exactly one
    events scan per stage filter — the funnel's inherent minimum."""
    t = Tables(spark, sf_dir)
    ev = t.events.select("user_id", "event_type", "ts")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
        .localCheckpoint(eager=False)
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(
            (F.col("ts") > F.col("first_view"))
            & (F.col("ts") <= F.col("first_view") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
        .localCheckpoint(eager=False)
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(
            (F.col("ts") > F.col("first_click"))
            & (F.col("ts") <= F.col("first_click") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    return (
        v.join(c.withColumn("reached_click", F.lit(True)), "user_id", "left")
        .join(p.withColumn("reached_purchase", F.lit(True)), "user_id", "left")
        .select(
            "user_id",
            # timestamps leave as FORMATTED STRINGS: Spark's collect() renders
            # raw TimestampType in the PYTHON PROCESS's local timezone (not
            # the UTC-pinned session TZ), so a raw-timestamp output column
            # hash-diverges under a non-UTC driver host (found by the
            # TZ=America/New_York adversarial sweep, round 3)
            F.date_format("first_view", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "first_view"
            ),
            F.date_format("first_click", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "first_click"
            ),
            F.date_format("first_purchase", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "first_purchase"
            ),
            F.coalesce("reached_click", F.lit(False)).alias("reached_click"),
            F.coalesce("reached_purchase", F.lit(False)).alias("reached_purchase"),
        )
        .orderBy("user_id")
    )


@query(
    "streak_daily_activity",
    oracle="""
    WITH days AS (
        SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
        FROM events
    ), nums AS (
        SELECT user_id, d,
               row_number() OVER (PARTITION BY user_id ORDER BY d) AS rn
        FROM days
    ), isl AS (
        SELECT user_id, d - CAST(rn AS INTEGER) AS grp, COUNT(*) AS len
        FROM nums GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM isl
    GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("events", "sequence", "window"),
)
def streak_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-day activity streak per user — the classic
    gaps-and-islands shape: distinct active days, row_number within user,
    then group by ``day - row_number`` (constant within a consecutive run).

    100 TB shape: the distinct, the window, and both aggregations all key on
    ``user_id``, so after the first shuffle everything is co-partitioned and
    AQE coalesces; per-user state is bounded by days-in-history, never event
    volume.  This is the batch sibling of the streaming sessionization in
    ``streaming/ops.py`` (same islands idea, gap measured in days).
    """
    from pyspark.sql.window import Window

    t = Tables(spark, sf_dir)
    days = t.events.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    nums = days.withColumn("rn", F.row_number().over(w))
    isl = nums.groupBy(
        "user_id", F.date_sub("d", F.col("rn")).alias("grp")
    ).agg(F.count("*").alias("len"))
    return (
        isl.groupBy("user_id")
        .agg(
            F.sum("len").cast("long").alias("n_active_days"),
            F.max("len").cast("long").alias("longest_streak"),
            F.count("*").cast("long").alias("n_streaks"),
        )
        .orderBy("user_id")
    )


_SQL_CHANNEL = (
    "CASE CAST(json_extract_string({p}, '$.k') AS BIGINT) % 4 "
    "WHEN 0 THEN 'organic' WHEN 1 THEN 'paid' "
    "WHEN 2 THEN 'social' ELSE 'email' END"
)


@query(
    "attribution_linear_touch",
    oracle=f"""
    WITH touches AS (
        SELECT user_id, epoch(ts) AS tts,
               {_SQL_CHANNEL.format(p="props")} AS channel
        FROM events WHERE event_type IN ('view', 'click')
    ),
    purchases AS (
        SELECT event_id, user_id, epoch(ts) AS pts,
               CAST(value AS DECIMAL(18,2)) AS value
        FROM events WHERE event_type = 'purchase'
    ),
    matched AS (
        SELECT p.event_id, p.value, t.channel
        FROM purchases p JOIN touches t
          ON t.user_id = p.user_id
         AND t.tts <= p.pts AND t.tts > p.pts - 604800
    ),
    per_purchase AS (
        SELECT event_id, channel,
               CAST(COUNT(*) AS BIGINT) AS c_n,
               CAST(ROUND(CAST(MIN(value) AS DOUBLE) * COUNT(*)
                          / (SUM(COUNT(*)) OVER (PARTITION BY event_id)), 6)
                    AS DECIMAL(28,6)) AS contrib
        FROM matched
        GROUP BY event_id, channel, value
    )
    SELECT channel,
           CAST(SUM(c_n) AS BIGINT) AS n_touches,
           CAST(SUM(contrib) AS DOUBLE) AS attributed_revenue
    FROM per_purchase
    GROUP BY channel
    ORDER BY channel
    """,
    tags=("events", "attribution", "funnel", "range-join"),
)
def attribution_linear_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch revenue attribution: every purchase's value is
    split evenly across the user's view/click touchpoints in the 7-day
    lookback, rolled up by marketing channel (derived from the event
    props).  Complements `asof_join_purchase_click` (last-touch = as-of
    backward): LINEAR attribution needs the full touch SET per
    conversion, i.e. a range join, not an as-of pick.

    Exactness contract: per-(purchase, channel) contributions are
    value * c_n / n in doubles (identical operands both engines), rounded
    to 6 dp and summed as DECIMAL(28,6) so the channel rollup is
    order-insensitive.

    Scale shape: touches and purchases are both event-scale; the match is
    an EQUI-join on user_id with the lookback window as a residual (same
    posture as pit_lookup_join — per-user touch lists are small, so no
    fan-out blowup), then two aggregates whose second input is already
    conversion-sized.  At 100 TB the join co-locates for free if events
    are bucketed by user_id (write_bucketed)."""
    ev = Tables(spark, sf_dir).events
    k = F.get_json_object("props", "$.k").cast("bigint")
    channel = (
        F.when(k % 4 == 0, "organic")
        .when(k % 4 == 1, "paid")
        .when(k % 4 == 2, "social")
        .otherwise("email")
    )
    touches = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").cast("double").alias("tts"),
        channel.alias("channel"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").cast("double").alias("pts"),
        F.col("value").cast("decimal(18,2)").alias("value"),
    )
    matched = purchases.join(
        touches,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("tts") <= F.col("pts"))
        & (F.col("tts") > F.col("pts") - 604800),
    )
    from pyspark.sql import Window

    per_pc = matched.groupBy("event_id", "channel", "value").agg(
        F.count("*").cast("bigint").alias("c_n")
    )
    n_tot = F.sum("c_n").over(Window.partitionBy("event_id"))
    per_pc = per_pc.select(
        "channel",
        "c_n",
        F.round(
            F.col("value").cast("double") * F.col("c_n") / n_tot, 6
        ).cast("decimal(28,6)").alias("contrib"),
    )
    return (
        per_pc.groupBy("channel")
        .agg(
            F.sum("c_n").cast("bigint").alias("n_touches"),
            F.sum("contrib").cast("double").alias("attributed_revenue"),
        )
        .orderBy("channel")
    )


@query(
    "anomaly_mad_events",
    oracle="""
    WITH ranked AS (
        SELECT event_type, value,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    med AS (
        SELECT event_type, value AS med
        FROM ranked
        WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)
    ),
    dev AS (
        SELECT e.event_type, e.value, abs(e.value - m.med) AS adev, m.med
        FROM events e JOIN med m ON m.event_type = e.event_type
    ),
    dranked AS (
        SELECT event_type, adev, med,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY adev) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM dev
    ),
    mad AS (
        SELECT event_type, med, adev AS mad
        FROM dranked
        WHERE rn = CAST(ceil(0.5 * n) AS BIGINT)
    )
    SELECT d.event_type,
           ROUND(m.med, 6) AS med,
           ROUND(m.mad, 6) AS mad,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(*) FILTER (WHERE d.adev > 3 * m.mad) AS BIGINT)
               AS n_outliers
    FROM dev d JOIN mad m ON m.event_type = d.event_type
    GROUP BY d.event_type, m.med, m.mad
    ORDER BY d.event_type
    """,
    tags=("events", "anomaly", "robust-stats", "mad"),
)
def anomaly_mad_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection per event type: median absolute deviation
    (MAD) outlier flagging — |value - median| > 3*MAD — the heavy-tail-
    safe alternative to z-scores (text_zscore_per_source), whose mean/std
    a single extreme value corrupts.  Medians are RANK-BASED (the value
    at row ceil(n/2) with event_id tiebreak), not interpolated, so both
    engines pick the identical element — the same exactness device as
    text_quality_percentile_filter.

    Scale shape: two window passes partitioned by event_type (rank +
    group count share one exchange each), each followed by a broadcast of
    |types| rows back onto the stream; the outlier count rides the final
    rollup.  The deviation pass re-reads events rather than caching —
    at 100 TB a scan is cheaper than materializing the corpus."""
    from pyspark.sql import Window

    ev = Tables(spark, sf_dir).events
    wv = Window.partitionBy("event_type").orderBy("value", "event_id")
    wc = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "value",
        F.row_number().over(wv).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    med = ranked.where(
        F.col("rn") == F.ceil(0.5 * F.col("n")).cast("bigint")
    ).select("event_type", F.col("value").alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
    )
    wd = Window.partitionBy("event_type").orderBy("adev")
    dranked = dev.select(
        "event_type",
        "adev",
        F.row_number().over(wd).alias("rn"),
        F.count("*").over(wc).alias("n"),
    )
    mad = dranked.where(
        F.col("rn") == F.ceil(0.5 * F.col("n")).cast("bigint")
    ).select("event_type", F.col("adev").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.count(F.when(F.col("adev") > 3 * F.col("mad"), 1))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .select(
            "event_type",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n_events",
            "n_outliers",
        )
        .orderBy("event_type")
    )


@query(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    trans AS (
        SELECT event_type AS from_type, next_type AS to_type,
               COUNT(*) AS c
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY from_type, to_type
    )
    SELECT from_type, to_type,
           CAST(c AS BIGINT) AS n,
           ROUND(CAST(c AS DOUBLE)
                 / SUM(c) OVER (PARTITION BY from_type), 6) AS p
    FROM trans
    ORDER BY from_type, to_type
    """,
    tags=("events", "markov", "sequence", "window"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), the behavioral-model fit
    that powers next-action prediction and anomalous-session scoring
    (a session whose transitions are improbable under this matrix is an
    outlier — composable with anomaly_mad_events).

    Scale shape: one lead() window exchange on user_id builds the
    transition stream; counts collapse to a |types|^2 matrix via
    partial/final hash agg; the row normalization windows over that tiny
    matrix, not the corpus.  Exactness: integer counts, one division of
    exact integers per output row."""
    from pyspark.sql import Window

    ev = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    trans = seq.groupBy("from_type", "to_type").agg(F.count("*").alias("c"))
    wrow = Window.partitionBy("from_type")
    return trans.select(
        "from_type",
        "to_type",
        F.col("c").cast("bigint").alias("n"),
        F.round(F.col("c").cast("double") / F.sum("c").over(wrow), 6).alias(
            "p"
        ),
    ).orderBy("from_type", "to_type")


UB_QUERIES = 50  # most-active users used as similarity probes
UB_TOP = 3


@query(
    "user_behavior_similarity",
    oracle=f"""
    WITH vec AS (
        SELECT user_id,
               COUNT(*) FILTER (WHERE event_type = 'view') AS v_view,
               COUNT(*) FILTER (WHERE event_type = 'click') AS v_click,
               COUNT(*) FILTER (WHERE event_type = 'purchase') AS v_purchase,
               COUNT(*) FILTER (WHERE event_type = 'signup') AS v_signup,
               COUNT(*) FILTER (WHERE event_type = 'error') AS v_error,
               COUNT(*) AS n_events
        FROM events GROUP BY user_id
    ),
    probes AS (
        SELECT * FROM vec ORDER BY n_events DESC, user_id LIMIT {UB_QUERIES}
    ),
    scored AS (
        SELECT p.user_id AS query_user, c.user_id AS similar_user,
               (CAST(p.v_view * c.v_view + p.v_click * c.v_click
                     + p.v_purchase * c.v_purchase + p.v_signup * c.v_signup
                     + p.v_error * c.v_error AS DOUBLE))
               / (sqrt(CAST(p.v_view * p.v_view + p.v_click * p.v_click
                            + p.v_purchase * p.v_purchase
                            + p.v_signup * p.v_signup
                            + p.v_error * p.v_error AS DOUBLE))
                * sqrt(CAST(c.v_view * c.v_view + c.v_click * c.v_click
                            + c.v_purchase * c.v_purchase
                            + c.v_signup * c.v_signup
                            + c.v_error * c.v_error AS DOUBLE))) AS cos
        FROM vec c CROSS JOIN probes p
        WHERE c.user_id <> p.user_id
    )
    SELECT query_user, similar_user, ROUND(cos, 6) AS cos_sim,
           CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_user
                                     ORDER BY cos DESC, similar_user) AS rk
        FROM scored
    ) WHERE rk <= {UB_TOP}
    ORDER BY query_user, rk
    """,
    tags=("events", "behavior", "similarity", "pivot"),
)
def user_behavior_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Similar-user retrieval from behavioral count vectors: pivot each
    user's events into a per-type count vector, then find the top-{UB_TOP}
    cosine-most-similar users for the {UB_QUERIES} most active ones —
    the lookalike-audience / collaborative-feature primitive, and the
    bridge between the events family and the ANN family (the same
    query-budget + broadcast + WindowGroupLimit contract, but over
    vectors BUILT by aggregation rather than a stored embedding column).

    Scale shape: the pivot is one partial/final count aggregate to user
    grain; probes are a TakeOrderedAndProject head that broadcasts;
    scoring is map-side integer dot products over the streamed user
    table (exact integers into one double division); per-probe top-k
    prunes through WindowGroupLimit.  A full all-pairs user similarity
    would instead go through the LSH/IVF machinery — this is the
    budgeted exact tier."""
    ev = Tables(spark, sf_dir).events
    counts = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(f"v_{t}")
        for t in ("view", "click", "purchase", "signup", "error")
    ]
    vec = ev.groupBy("user_id").agg(*counts, F.count("*").alias("n_events"))
    probes = vec.orderBy(F.desc("n_events"), "user_id").limit(UB_QUERIES)
    types = ("view", "click", "purchase", "signup", "error")
    p = probes.select(
        F.col("user_id").alias("query_user"),
        *[F.col(f"v_{t}").alias(f"p_{t}") for t in types],
    )
    dotv = sum(
        F.col(f"p_{t}") * F.col(f"v_{t}") for t in types
    ).cast("double")
    pn = F.sqrt(
        sum(F.col(f"p_{t}") * F.col(f"p_{t}") for t in types).cast("double")
    )
    cn = F.sqrt(
        sum(F.col(f"v_{t}") * F.col(f"v_{t}") for t in types).cast("double")
    )
    scored = (
        vec.join(F.broadcast(p))
        .filter(F.col("user_id") != F.col("query_user"))
        .select(
            "query_user",
            F.col("user_id").alias("similar_user"),
            (dotv / (pn * cn)).alias("cos"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_user").orderBy(F.desc("cos"), "similar_user")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= UB_TOP)
        .select(
            "query_user",
            "similar_user",
            F.round("cos", 6).alias("cos_sim"),
            F.col("rk").cast("bigint").alias("rk"),
        )
        .orderBy("query_user", "rk")
    )


@query(
    "dq_audit_events",
    oracle="""
    SELECT 'events' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT(DISTINCT event_id) AS BIGINT)
               AS dup_event_ids,
           CAST(COUNT(*) FILTER (WHERE user_id IS NULL) AS BIGINT)
               AS null_user_ids,
           CAST(COUNT(*) FILTER (WHERE ts IS NULL) AS BIGINT) AS null_ts,
           CAST(COUNT(*) FILTER (WHERE value < 0) AS BIGINT)
               AS negative_values,
           CAST(COUNT(*) FILTER (
               WHERE event_type NOT IN
                     ('view','click','purchase','signup','error')
           ) AS BIGINT) AS unknown_types,
           CAST(COUNT(*) FILTER (
               WHERE ts < TIMESTAMP '2020-01-01'
                  OR ts > TIMESTAMP '2030-01-01'
           ) AS BIGINT) AS out_of_range_ts
    FROM events
    """,
    tags=("events", "data-quality", "audit"),
)
def dq_audit_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit as one query — the dbt-style assertion suite
    (unique key, not-null, accepted-values, range) collapsed into a
    single-pass profile row: duplicate ids, null keys/timestamps,
    negative amounts, unknown enum values, out-of-range timestamps.
    Zero violations is the content contract a pipeline asserts before
    promoting a snapshot; the profile row makes violations COUNTABLE
    (alert thresholds) rather than boolean.

    Scale shape: ONE scan, all checks fused as conditional aggregates in
    the same partial/final hash aggregate (the distinct-count is the
    only two-phase piece); at 100 TB this is strictly cheaper than
    running N separate assertion queries — the auditing pattern the
    incremental-rollup family applies to corpus freshness."""
    ev = Tables(spark, sf_dir).events
    return ev.agg(
        F.lit("events").alias("table_name"),
        F.count("*").cast("bigint").alias("n_rows"),
        (F.count("*") - F.count_distinct("event_id"))
        .cast("bigint")
        .alias("dup_event_ids"),
        F.count(F.when(F.col("user_id").isNull(), 1))
        .cast("bigint")
        .alias("null_user_ids"),
        F.count(F.when(F.col("ts").isNull(), 1)).cast("bigint").alias(
            "null_ts"
        ),
        F.count(F.when(F.col("value") < 0, 1)).cast("bigint").alias(
            "negative_values"
        ),
        F.count(
            F.when(
                ~F.col("event_type").isin(
                    "view", "click", "purchase", "signup", "error"
                ),
                1,
            )
        )
        .cast("bigint")
        .alias("unknown_types"),
        F.count(
            F.when(
                (F.col("ts") < F.lit("2020-01-01").cast("timestamp"))
                | (F.col("ts") > F.lit("2030-01-01").cast("timestamp")),
                1,
            )
        )
        .cast("bigint")
        .alias("out_of_range_ts"),
    )


@query(
    "funnel_time_to_convert",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN epoch(ts) END) AS fv,
               MIN(CASE WHEN event_type = 'purchase' THEN epoch(ts) END) AS fp
        FROM events GROUP BY user_id
    ),
    conv AS (
        SELECT user_id, CAST(floor(fp - fv) AS BIGINT) AS latency_sec
        FROM firsts WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp >= fv
    ),
    binned AS (
        SELECT user_id, latency_sec,
               NTILE(10) OVER (ORDER BY latency_sec, user_id) AS decile
        FROM conv
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(latency_sec) AS BIGINT) AS lo_sec,
           CAST(MAX(latency_sec) AS BIGINT) AS hi_sec
    FROM binned
    GROUP BY decile
    ORDER BY decile
    """,
    tags=("events", "funnel", "latency", "distribution"),
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: time from each user's FIRST view
    to their FIRST purchase, reported as latency deciles with per-decile
    ranges — the 'how long does the funnel take' complement to
    `funnel_view_click_purchase`'s 'how many convert'.  Median time-to-
    convert and the slow tail read directly off the decile table.

    Exactness: conditional-MIN firsts collapse each user to one row;
    latencies floor to integer seconds; the decile cut is key-tiebroken
    NTILE over the converter grain (the same documented global-ntile
    trade as customer_rfm_segments — converters are orders of magnitude
    fewer than events).

    Scale shape: one partial/final aggregate to user grain, a
    converter-grain ntile, and a 10-row rollup."""
    from pyspark.sql import Window

    ev = Tables(spark, sf_dir).events
    es = F.col("ts").cast("double")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", es)).alias("fv"),
        F.min(F.when(F.col("event_type") == "purchase", es)).alias("fp"),
    )
    conv = firsts.where(
        F.col("fv").isNotNull()
        & F.col("fp").isNotNull()
        & (F.col("fp") >= F.col("fv"))
    ).select(
        "user_id",
        F.floor(F.col("fp") - F.col("fv")).cast("bigint").alias("latency_sec"),
    )
    binned = conv.select(
        "latency_sec",
        F.ntile(10)
        .over(Window.orderBy("latency_sec", "user_id"))
        .alias("decile"),
    )
    return (
        binned.groupBy("decile")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.min("latency_sec").cast("bigint").alias("lo_sec"),
            F.max("latency_sec").cast("bigint").alias("hi_sec"),
        )
        .select(F.col("decile").cast("int"), "n_users", "lo_sec", "hi_sec")
        .orderBy("decile")
    )


@query(
    "funnel_time_to_convert_scale",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN epoch(ts) END) AS fv,
               MIN(CASE WHEN event_type = 'purchase' THEN epoch(ts) END) AS fp
        FROM events GROUP BY user_id
    ),
    conv AS (
        SELECT user_id, CAST(floor(fp - fv) AS BIGINT) AS latency_sec
        FROM firsts WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp >= fv
    ),
    binned AS (
        SELECT user_id, latency_sec,
               NTILE(10) OVER (ORDER BY latency_sec, user_id) AS decile
        FROM conv
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(MIN(latency_sec) AS BIGINT) AS lo_sec,
           CAST(MAX(latency_sec) AS BIGINT) AS hi_sec
    FROM binned
    GROUP BY decile
    ORDER BY decile
    """,
    tags=("events", "funnel", "latency", "distribution", "scale-safe"),
)
def funnel_time_to_convert_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """funnel_time_to_convert with NO single-partition window (VERDICT r6
    ask #5): the converter-grain latency decile cut goes through
    `distributed_ntile` (range repartition + parallel ranks + broadcast
    offsets) instead of a global `Window.orderBy`.  Bit-identical to the
    exact twin — (latency_sec, user_id) is a total order.

    Scale shape: events collapse to user grain via partial/final
    conditional-MIN aggregation, then the distributed rank shuffles the
    CONVERTER-grain table twice (range + hash), both 32-way parallel; at
    billions of users no task ever holds the full converter set."""
    from auron_spark.operators.window import distributed_ntile

    ev = Tables(spark, sf_dir).events
    es = F.col("ts").cast("double")
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", es)).alias("fv"),
        F.min(F.when(F.col("event_type") == "purchase", es)).alias("fp"),
    )
    conv = firsts.where(
        F.col("fv").isNotNull()
        & F.col("fp").isNotNull()
        & (F.col("fp") >= F.col("fv"))
    ).select(
        "user_id",
        F.floor(F.col("fp") - F.col("fv")).cast("bigint").alias("latency_sec"),
    )
    binned = distributed_ntile(
        conv, 10, ["latency_sec", "user_id"], "decile"
    )
    return (
        binned.groupBy("decile")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.min("latency_sec").cast("bigint").alias("lo_sec"),
            F.max("latency_sec").cast("bigint").alias("hi_sec"),
        )
        .select(F.col("decile").cast("int"), "n_users", "lo_sec", "hi_sec")
        .orderBy("decile")
    )


@query(
    "events_top_paths",
    oracle="""
    WITH ranked AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events
    ),
    paths AS (
        SELECT user_id,
               string_agg(event_type, '>' ORDER BY rn) AS path
        FROM ranked WHERE rn <= 3 GROUP BY user_id
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_users
    FROM paths GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT 10
    """,
    tags=("events", "paths", "product-analytics", "window"),
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top user journeys: each user's first three events (by time,
    PK-tiebroken) concatenated into a path string, ranked by how many
    users share the path — the entry-path analysis behind onboarding
    funnels, and the sequence-prefix histogram a behavioral-cloning
    pipeline computes before mining templates.

    Scale shape: the rank filter is a per-user WindowGroupLimit (≤3 rows
    per user survive the partitioned sort), paths aggregate at user grain
    (ordered collect of ≤3 strings), the path histogram at |distinct
    paths| grain (bounded by |event_types|^3), and the top-10 is
    TakeOrderedAndProject — no global sort of user rows."""
    ev = Tables(spark, sf_dir).events
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    firsts = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        firsts.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy(F.desc("n_users"), "path")
        .limit(10)
    )


@query(
    "attribution_position_based",
    oracle=f"""
    WITH touches AS (
        SELECT event_id AS tid, user_id, epoch(ts) AS tts,
               {_SQL_CHANNEL.format(p="props")} AS channel
        FROM events WHERE event_type IN ('view', 'click')
    ),
    purchases AS (
        SELECT event_id, user_id, epoch(ts) AS pts,
               CAST(value AS DECIMAL(18,2)) AS value
        FROM events WHERE event_type = 'purchase'
    ),
    matched AS (
        SELECT p.event_id, p.value, t.channel, t.tts, t.tid
        FROM purchases p JOIN touches t
          ON t.user_id = p.user_id
         AND t.tts <= p.pts AND t.tts > p.pts - 604800
    ),
    pos AS (
        SELECT event_id, value, channel,
               ROW_NUMBER() OVER (PARTITION BY event_id
                                  ORDER BY tts, tid) AS rn,
               COUNT(*) OVER (PARTITION BY event_id) AS n
        FROM matched
    ),
    weighted AS (
        SELECT channel,
               CAST(ROUND(CAST(value AS DOUBLE)
                          * CASE WHEN n = 1 THEN 1.0
                                 WHEN n = 2 THEN 0.5
                                 WHEN rn = 1 OR rn = n THEN 0.4
                                 ELSE 0.2 / (n - 2) END, 6)
                    AS DECIMAL(28,6)) AS contrib
        FROM pos
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(contrib) AS DOUBLE) AS attributed_revenue
    FROM weighted
    GROUP BY channel
    ORDER BY channel
    """,
    tags=("events", "attribution", "funnel", "range-join"),
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) multi-touch attribution: 40% of each
    purchase's value to the FIRST touch, 40% to the LAST, the middle 20%
    split evenly across interior touches (1-touch paths take 100%,
    2-touch paths 50/50) — the standard middle ground between
    `asof_join_purchase_click` (last-touch takes all) and
    `attribution_linear_touch` (position-blind), crediting discovery and
    closing more than nurture.

    Exactness: touch positions are a total order (timestamp, touch
    event_id tiebreak); weights are exact decimal fractions chosen by
    integer position; contributions round at 6dp into DECIMAL(28,6) so
    the channel rollup is order-insensitive (the linear-touch contract).

    Scale shape: the same user-key equi-join with lookback residual as
    linear touch; the position window partitions by conversion id
    (per-purchase touch lists are small), then one channel-grain
    aggregate."""
    from pyspark.sql import Window

    ev = Tables(spark, sf_dir).events
    k = F.get_json_object("props", "$.k").cast("bigint")
    channel = (
        F.when(k % 4 == 0, "organic")
        .when(k % 4 == 1, "paid")
        .when(k % 4 == 2, "social")
        .otherwise("email")
    )
    touches = ev.where(F.col("event_type").isin("view", "click")).select(
        F.col("event_id").alias("tid"),
        F.col("user_id").alias("t_user"),
        F.col("ts").cast("double").alias("tts"),
        channel.alias("channel"),
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").cast("double").alias("pts"),
        F.col("value").cast("decimal(18,2)").alias("value"),
    )
    matched = purchases.join(
        touches,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("tts") <= F.col("pts"))
        & (F.col("tts") > F.col("pts") - 604800),
    )
    wp = Window.partitionBy("event_id")
    pos = matched.select(
        "event_id",
        "value",
        "channel",
        F.row_number().over(wp.orderBy("tts", "tid")).alias("rn"),
        F.count("*").over(wp).alias("n"),
    )
    weight = (
        F.when(F.col("n") == 1, 1.0)
        .when(F.col("n") == 2, 0.5)
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), 0.4)
        .otherwise(0.2 / (F.col("n") - 2))
    )
    weighted = pos.select(
        "channel",
        F.round(F.col("value").cast("double") * weight, 6)
        .cast("decimal(28,6)")
        .alias("contrib"),
    )
    return (
        weighted.groupBy("channel")
        .agg(
            F.count("*").cast("bigint").alias("n_touches"),
            F.sum("contrib").cast("double").alias("attributed_revenue"),
        )
        .orderBy("channel")
    )


@query(
    "events_markov_multistep",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    trans AS (
        SELECT event_type AS f, next_type AS t, COUNT(*) AS c
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY f, t
    ),
    p1 AS (
        SELECT f, t, CAST(c AS DOUBLE) / SUM(c) OVER (PARTITION BY f) AS p
        FROM trans
    ),
    p2 AS (
        SELECT a.f, b.t, SUM(a.p * b.p) AS p
        FROM p1 a JOIN p1 b ON b.f = a.t GROUP BY a.f, b.t
    ),
    p4 AS (
        SELECT a.f, b.t, SUM(a.p * b.p) AS p
        FROM p2 a JOIN p2 b ON b.f = a.t GROUP BY a.f, b.t
    ),
    p8 AS (
        SELECT a.f, b.t, SUM(a.p * b.p) AS p
        FROM p4 a JOIN p4 b ON b.f = a.t GROUP BY a.f, b.t
    )
    SELECT f AS from_type,
           ROUND(MAX(CASE WHEN t = 'purchase' THEN p END), 6)
               AS p8_purchase,
           ROUND(MAX(CASE WHEN t = 'error' THEN p END), 6) AS p8_error,
           ROUND(SUM(p), 6) AS row_sum
    FROM p8
    GROUP BY f
    ORDER BY from_type
    """,
    tags=("events", "markov", "sequence", "matrix-power"),
)
def events_markov_multistep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eight-step Markov reachability: P^8 by three relational matrix
    squarings of the `events_markov_transitions` matrix, reporting each
    starting state's probability of sitting in 'purchase' (the
    conversion read: "where do journeys that start at X end up?") and in
    'error' (the failure read), with the row sum as a stochasticity
    audit (= 1 up to rounding).  Matrix power as JOIN + GROUP BY is the
    standard trick that scales squarings to state spaces far beyond
    driver memory — each squaring is an equi-join on the inner index.

    Exactness: P entries are single divisions of exact integers; each
    squaring folds <= |states| = 5 deterministic products per cell
    (second-stage contract as `eval_anova_oneway`), three times; outputs
    round at 6dp.

    Scale shape: one lead() window exchange on user_id builds the
    transition stream (the proven transitions shape); everything after
    lives at |states|^2 = 25-row grain.  The matrix is localCheckpoint-ed
    before the squarings: each squaring references it twice, so the
    un-materialized plan re-derived the corpus window 2^3 = 8 times
    (round-9 plan sweep) — materialized once, the squarings are pure
    25-row joins."""
    from pyspark.sql import Window

    ev = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("f"),
        F.lead("event_type").over(w).alias("t"),
    ).where(F.col("t").isNotNull())
    trans = seq.groupBy("f", "t").agg(F.count("*").alias("c"))
    p = trans.select(
        "f",
        "t",
        (
            F.col("c").cast("double")
            / F.sum("c").over(Window.partitionBy("f"))
        ).alias("p"),
    ).localCheckpoint(eager=False)
    for _ in range(3):  # P -> P^2 -> P^4 -> P^8
        b = p.select(
            F.col("f").alias("bf"), F.col("t").alias("bt"), F.col("p").alias("bp")
        )
        p = (
            p.join(b, F.col("bf") == F.col("t"))
            .groupBy("f", "bt")
            .agg(F.sum(F.col("p") * F.col("bp")).alias("p"))
            .select("f", F.col("bt").alias("t"), "p")
        )
    return (
        p.groupBy("f")
        .agg(
            F.round(
                F.max(F.when(F.col("t") == "purchase", F.col("p"))), 6
            ).alias("p8_purchase"),
            F.round(
                F.max(F.when(F.col("t") == "error", F.col("p"))), 6
            ).alias("p8_error"),
            F.round(F.sum("p"), 6).alias("row_sum"),
        )
        .select(F.col("f").alias("from_type"), "p8_purchase", "p8_error", "row_sum")
        .orderBy("from_type")
    )
