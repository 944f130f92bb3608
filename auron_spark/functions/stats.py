"""Statistical aggregates: moments, correlation, percentiles, mode.

Beyond the reference's aggregate list (min/max/sum/avg/count/first/collect,
SURVEY.md §2.4) — Spark ships stddev/var/corr/covar/skewness/kurtosis/
percentile built in, so an engine user gets them for free.  Cross-engine
oracle exactness is the hard part: streaming variance accumulators are
order-sensitive in the last ulps, so instead of calling each engine's
stddev we aggregate exact DECIMAL power sums (order-insensitive in both
engines) and derive every moment with the identical double expression on
both sides — bit-identical results, no rounding tolerance needed.

Scale: power sums are plain partial-aggregatable SUMs — one shuffle of a few
decimals per group, the same plan as any hash aggregate.  This is also the
100 TB-safe way to compute variance: a single pass, no second scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.registry import query
from auron_spark.tables import Tables

# l_quantity <= 50 with 2 decimals: DECIMAL(9,2); x^2 -> (19,4); (x^2)^2 -> (38,8).
_X = "CAST(l_quantity AS DECIMAL(9,2))"


def _powersums_sql() -> str:
    return f"""
        SELECT l_returnflag,
               COUNT(l_quantity) AS n,
               CAST(SUM({_X}) AS DOUBLE) AS s1,
               CAST(SUM(CAST({_X} * {_X} AS DECIMAL(19,4))) AS DOUBLE) AS s2,
               CAST(SUM(CAST(CAST({_X} * {_X} AS DECIMAL(19,4)) * {_X}
                        AS DECIMAL(29,6))) AS DOUBLE) AS s3,
               CAST(FLOOR(SUM(CAST(CAST({_X} * {_X} AS DECIMAL(19,4))
                             * CAST({_X} * {_X} AS DECIMAL(19,4))
                             AS DECIMAL(38,8)))) AS DOUBLE) AS s4
        FROM lineitem GROUP BY l_returnflag
    """


def _powersums(t: Tables) -> DataFrame:
    x = F.col("l_quantity").cast("decimal(9,2)")
    x2 = (x * x).cast("decimal(19,4)")
    return t.lineitem.groupBy("l_returnflag").agg(
        F.count("l_quantity").alias("n"),
        F.sum(x).cast("double").alias("s1"),
        F.sum(x2).cast("double").alias("s2"),
        F.sum((x2 * x).cast("decimal(29,6)")).cast("double").alias("s3"),
        # s4 floors to an integer before the double cast: DuckDB converts
        # decimal->double as (double)int128 * 10^-scale, which double-rounds
        # once the scaled integer exceeds 2^53.  FLOOR (not a decimal cast —
        # Spark rounds half-up, DuckDB half-down, so casts disagree on ties)
        # is tie-free and the floored integer fits in 53 bits.
        F.floor(F.sum((x2 * x2).cast("decimal(38,8)"))).cast("double").alias("s4"),
    )


@query(
    "agg_stats_moments",
    oracle=f"""
    SELECT l_returnflag, n,
           s1 / n AS mean,
           (s2 - s1 * s1 / n) / (n - 1) AS var_samp,
           sqrt((s2 - s1 * s1 / n) / (n - 1)) AS stddev_samp,
           (s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
             / (sqrt(s2 / n - (s1 / n) * (s1 / n))
                * sqrt(s2 / n - (s1 / n) * (s1 / n))
                * sqrt(s2 / n - (s1 / n) * (s1 / n))) AS skewness,
           (s4 / n - 4 * (s1 / n) * (s3 / n)
            + 6 * (s1 / n) * (s1 / n) * (s2 / n)
            - 3 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n))
             / ((s2 / n - (s1 / n) * (s1 / n))
                * (s2 / n - (s1 / n) * (s1 / n))) - 3 AS kurtosis
    FROM ({_powersums_sql()})
    ORDER BY l_returnflag
    """,
    tags=("agg", "stats"),
    bench=True,
)
def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mean/var_samp/stddev_samp/skewness/excess-kurtosis from exact DECIMAL
    power sums — single-pass, order-insensitive, bit-identical to the oracle
    (the double arithmetic after aggregation is the same expression tree)."""
    t = Tables(spark, sf_dir)
    ps = _powersums(t)
    n, s1, s2, s3, s4 = (F.col(c) for c in ("n", "s1", "s2", "s3", "s4"))
    m = s1 / n
    m2 = s2 / n - m * m  # population variance
    # sd*sd*sd / m2*m2 instead of pow(): JVM Math.pow and DuckDB's libm pow
    # differ in the last ulp; sqrt and multiply are IEEE-exact in both.
    sd = F.sqrt(m2)
    skew = (s3 / n - 3 * m * (s2 / n) + 2 * m * m * m) / (sd * sd * sd)
    kurt = (
        s4 / n - 4 * m * (s3 / n) + 6 * m * m * (s2 / n) - 3 * m * m * m * m
    ) / (m2 * m2) - 3
    return ps.select(
        "l_returnflag",
        "n",
        m.alias("mean"),
        ((s2 - s1 * s1 / n) / (n - 1)).alias("var_samp"),
        F.sqrt((s2 - s1 * s1 / n) / (n - 1)).alias("stddev_samp"),
        skew.alias("skewness"),
        kurt.alias("kurtosis"),
    ).orderBy("l_returnflag")


_Y = "CAST(l_extendedprice AS DECIMAL(18,2))"


@query(
    "agg_corr_covar",
    oracle=f"""
    SELECT l_returnflag, n,
           (sxy - sx * sy / n) / (n - 1) AS covar_samp,
           (sxy - sx * sy / n) / n AS covar_pop,
           (sxy / n - (sx / n) * (sy / n))
             / (sqrt(sxx / n - (sx / n) * (sx / n))
              * sqrt(syy / n - (sy / n) * (sy / n))) AS corr
    FROM (
        SELECT l_returnflag,
               COUNT(*) AS n,
               CAST(SUM({_X}) AS DOUBLE) AS sx,
               CAST(SUM({_Y}) AS DOUBLE) AS sy,
               CAST(SUM(CAST({_X} * {_X} AS DECIMAL(19,4))) AS DOUBLE) AS sxx,
               CAST(FLOOR(SUM(CAST({_Y} * {_Y} AS DECIMAL(37,4)))) AS DOUBLE) AS syy,
               CAST(FLOOR(SUM(CAST({_X} * {_Y} AS DECIMAL(28,4)))) AS DOUBLE) AS sxy
        FROM lineitem GROUP BY l_returnflag
    )
    ORDER BY l_returnflag
    """,
    tags=("agg", "stats"),
)
def agg_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """covar_samp/covar_pop/corr(l_quantity, l_extendedprice) from exact
    DECIMAL cross sums — same single-pass plan as agg_stats_moments."""
    t = Tables(spark, sf_dir)
    x = F.col("l_quantity").cast("decimal(9,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    ps = t.lineitem.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x * x).cast("decimal(19,4)")).cast("double").alias("sxx"),
        # floored to integers before the double cast — same 2^53 + rounding-tie
        # guard as agg_stats_moments' s4
        F.floor(F.sum((y * y).cast("decimal(37,4)"))).cast("double").alias("syy"),
        F.floor(F.sum((x * y).cast("decimal(28,4)"))).cast("double").alias("sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (
        F.col(c) for c in ("n", "sx", "sy", "sxx", "syy", "sxy")
    )
    return ps.select(
        "l_returnflag",
        "n",
        ((sxy - sx * sy / n) / (n - 1)).alias("covar_samp"),
        ((sxy - sx * sy / n) / n).alias("covar_pop"),
        (
            (sxy / n - (sx / n) * (sy / n))
            / (
                F.sqrt(sxx / n - (sx / n) * (sx / n))
                * F.sqrt(syy / n - (sy / n) * (sy / n))
            )
        ).alias("corr"),
    ).orderBy("l_returnflag")


@query(
    "agg_median_percentile",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.25) AS p25,
           quantile_cont(l_quantity, 0.75) AS p75,
           quantile_disc(l_quantity, 0.9) AS p90_disc
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "stats", "percentile"),
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median + continuous/discrete percentiles.  Spark `percentile`
    and DuckDB `quantile_cont` share the SQL-standard interpolation
    definition; inputs are 2-decimal doubles so the interpolated values are
    exact.  Exact percentile sorts within groups — for a 100 TB rollout the
    approx_percentile sketch (see agg_approx) is the scale path."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
            F.expr("percentile(l_quantity, 0.25)").alias("p25"),
            F.expr("percentile(l_quantity, 0.75)").alias("p75"),
            F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY l_quantity)").alias(
                "p90_disc"
            ),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_mode_deterministic",
    oracle="""
    SELECT l_returnflag, modal_qty, modal_n FROM (
        SELECT l_returnflag, l_quantity AS modal_qty, COUNT(*) AS modal_n,
               ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                  ORDER BY COUNT(*) DESC, l_quantity) AS rn
        FROM lineitem
        GROUP BY l_returnflag, l_quantity
    ) WHERE rn = 1
    ORDER BY l_returnflag
    """,
    tags=("agg", "stats", "mode"),
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most frequent value per group with a smallest-value tie-break.
    Built-in `mode()` is nondeterministic on ties in both engines, so the
    engine spells it count-then-rank: two hash aggregates + a
    WindowGroupLimit — every stage partial-aggregatable."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    counts = t.lineitem.groupBy("l_returnflag", "l_quantity").agg(
        F.count("*").alias("modal_n")
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        F.desc("modal_n"), "l_quantity"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag", F.col("l_quantity").alias("modal_qty"), "modal_n"
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_histogram_width_bucket",
    oracle="""
    SELECT bucket, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM (
        SELECT o_totalprice,
               CASE WHEN CAST(o_totalprice AS DOUBLE) < 0 THEN 0
                    WHEN CAST(o_totalprice AS DOUBLE) >= 600000 THEN 21
                    ELSE 1 + CAST(FLOOR(CAST(o_totalprice AS DOUBLE) / 30000.0)
                                  AS BIGINT)
               END AS bucket
        FROM orders
    )
    GROUP BY bucket
    ORDER BY bucket
    """,
    tags=("agg", "histogram", "profiling"),
)
def agg_histogram_width_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-distribution histogram via `width_bucket` (20 equal bins over
    [0, 600000) + the two overflow buckets) — the data-profiling primitive a
    pipeline runs before choosing filters/quantization ranges.  Bucket
    assignment is map-side scalar math; the aggregate is two-phase over at
    most 22 groups, so shuffle bytes are constant regardless of table size.
    The oracle spells out width_bucket's exact semantics (DuckDB lacks the
    function): 0 below range, n+1 above, else 1 + floor(v/width) — all in
    DOUBLE, where both engines compute identical IEEE results."""
    t = Tables(spark, sf_dir)
    v = F.col("o_totalprice").cast("double")
    return (
        t.orders.select(
            "o_totalprice",
            F.width_bucket(v, F.lit(0.0), F.lit(600000.0), F.lit(20)).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total"),
        )
        .orderBy("bucket")
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_distinct_cust
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("agg", "bitmap", "distinct"),
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counting via the bitmap aggregate family
    (Spark 3.5+): keys bucket into fixed-width bitmaps
    (bitmap_bucket_number / bitmap_bit_position), partial groups build
    bitmaps (bitmap_construct_agg), higher levels OR-merge them
    (bitmap_or_agg), and the final count is a sum of bitmap_count — the
    precompute-once, merge-anywhere pattern warehouses use for daily
    distinct-user rollups, where re-scanning raw data per query is
    unaffordable at 100 TB.  Unlike HLL sketches (agg_hll_sketch_mergeable)
    the merge is EXACT; cost is bitmap width instead of sketch error.

    Two merge levels are exercised: (status, priority) partials OR-merged up
    to status.  The oracle is a plain COUNT(DISTINCT) — the bitmap pipeline
    must reproduce it exactly."""
    t = Tables(spark, sf_dir)
    partial = (
        t.orders.select(
            "o_orderstatus",
            "o_orderpriority",
            F.bitmap_bucket_number(F.col("o_custkey")).alias("bkt"),
            F.bitmap_bit_position(F.col("o_custkey")).alias("pos"),
        )
        .groupBy("o_orderstatus", "o_orderpriority", "bkt")
        .agg(F.bitmap_construct_agg(F.col("pos")).alias("bm"))
    )
    merged = partial.groupBy("o_orderstatus", "bkt").agg(
        F.bitmap_or_agg(F.col("bm")).alias("bm")
    )
    return (
        merged.groupBy("o_orderstatus")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_distinct_cust"))
        .orderBy("o_orderstatus")
    )


@query(
    "agg_linear_regression",
    oracle="""
    SELECT o_orderstatus,
           CAST(regr_count(CAST(o_totalprice AS DOUBLE), CAST(o_custkey AS DOUBLE)) AS BIGINT) AS n,
           ROUND(regr_slope(CAST(o_totalprice AS DOUBLE), CAST(o_custkey AS DOUBLE)), 6) AS slope,
           ROUND(regr_intercept(CAST(o_totalprice AS DOUBLE), CAST(o_custkey AS DOUBLE)), 6) AS icept,
           ROUND(regr_r2(CAST(o_totalprice AS DOUBLE), CAST(o_custkey AS DOUBLE)), 6) AS r2,
           ROUND(regr_avgx(CAST(o_totalprice AS DOUBLE), CAST(o_custkey AS DOUBLE)), 6) AS avgx,
           ROUND(regr_avgy(CAST(o_totalprice AS DOUBLE), CAST(o_custkey AS DOUBLE)), 6) AS avgy
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
    tags=("agg", "regression"),
)
def agg_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS regression aggregates (regr_slope/intercept/r2/avgx/avgy/count) —
    single-pass distributed linear fits, the profiling primitive for drift
    detection and feature screening.  Both engines implement the same
    moment-based formulas over doubles; ROUND(·,6) absorbs the one
    double-rounding of different summation orders (the partial-aggregation
    tree differs between engines, so raw last-ulp equality is not
    guaranteed — unlike the DECIMAL-sum money paths).  Two-phase hash
    aggregate; constant state per group."""
    t = Tables(spark, sf_dir)
    y = F.col("o_totalprice").cast("double")
    x = F.col("o_custkey").cast("double")
    return (
        t.orders.groupBy("o_orderstatus")
        .agg(
            F.regr_count(y, x).cast("bigint").alias("n"),
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("icept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
            F.round(F.regr_avgx(y, x), 6).alias("avgx"),
            F.round(F.regr_avgy(y, x), 6).alias("avgy"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "agg_theta_sketch_setops",
    oracle=None,  # sketch binaries are engine-specific; accuracy-tested
    tags=("agg", "sketch", "theta", "rows-only"),
)
def agg_theta_sketch_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta sketches (Spark 4 / Apache DataSketches): mergeable distinct
    SETS supporting union, intersection AND difference cardinalities —
    beyond HLL (union-only, `agg_hll_sketch_mergeable`).  The 100 TB use:
    precompute one tiny sketch per segment/day, answer "distinct users in
    purchase∩click" without ever joining raw events.  Rows-only driver check
    (sketch estimates are engine-specific); accuracy vs exact counts is
    pinned in tests/test_functions.py::test_theta_sketch_setops_accuracy."""
    t = Tables(spark, sf_dir)
    ev = t.events
    sk = (
        ev.where(F.col("event_type").isin("purchase", "click"))
        .groupBy("event_type")
        .agg(F.theta_sketch_agg("user_id").alias("s"))
    )
    p = sk.where(F.col("event_type") == "purchase").select(F.col("s").alias("ps"))
    c = sk.where(F.col("event_type") == "click").select(F.col("s").alias("cs"))
    both = p.join(c)  # 1x1
    return both.select(
        F.round(F.theta_sketch_estimate("ps"), 1).alias("est_purchase_users"),
        F.round(F.theta_sketch_estimate("cs"), 1).alias("est_click_users"),
        F.round(
            F.theta_sketch_estimate(F.theta_union("ps", "cs")), 1
        ).alias("est_union"),
        F.round(
            F.theta_sketch_estimate(F.theta_intersection("ps", "cs")), 1
        ).alias("est_intersect"),
        F.round(
            F.theta_sketch_estimate(F.theta_difference("ps", "cs")), 1
        ).alias("est_purchase_only"),
    )


@query(
    "agg_kll_quantile_sketch",
    oracle=None,  # sketch estimates are rank-approximate; accuracy-tested
    tags=("agg", "sketch", "kll", "rows-only"),
)
def agg_kll_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KLL quantile sketches (Spark 4 / DataSketches): mergeable streaming
    quantiles — precompute per-partition/day sketches, merge them later, ask
    any quantile.  Exercised with TWO merge levels (partials per
    (returnflag, linestatus), kll_merge_agg up to returnflag) exactly like
    the bitmap/HLL families; at 100 TB this replaces a full re-sort per
    percentile query with constant-size state.  Rows-only driver check;
    rank accuracy vs the exact distribution is pinned in
    tests/test_functions.py::test_kll_sketch_quantile_accuracy."""
    t = Tables(spark, sf_dir)
    v = F.col("l_extendedprice").cast("double")
    partial = t.lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.kll_sketch_agg_double(v).alias("s")
    )
    merged = partial.groupBy("l_returnflag").agg(
        F.kll_merge_agg_double(F.col("s")).alias("s")
    )
    return (
        merged.select(
            "l_returnflag",
            F.round(
                F.kll_sketch_get_quantile_double(F.col("s"), F.lit(0.5)), 2
            ).alias("p50"),
            F.round(
                F.kll_sketch_get_quantile_double(F.col("s"), F.lit(0.9)), 2
            ).alias("p90"),
            F.kll_sketch_get_n_double(F.col("s")).alias("n"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_theta_sketch_bounds",
    oracle="""
    WITH u AS (
        SELECT user_id,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS hp,
               MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS hc
        FROM events
        WHERE event_type IN ('purchase', 'click')
        GROUP BY user_id
    )
    SELECT CAST(SUM(hp) AS BIGINT) AS exact_purchase,
           CAST(SUM(hc) AS BIGINT) AS exact_click,
           CAST(COUNT(*) AS BIGINT) AS exact_union,
           CAST(SUM(hp * hc) AS BIGINT) AS exact_intersect,
           CAST(SUM(CASE WHEN hp = 1 AND hc = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS exact_purchase_only,
           TRUE AS ok_purchase, TRUE AS ok_click, TRUE AS ok_union,
           TRUE AS ok_intersect, TRUE AS ok_purchase_only
    FROM u
    """,
    tags=("agg", "sketch", "theta", "accuracy-bound"),
)
def agg_theta_sketch_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-provable accuracy contract for the theta-sketch set ops
    (VERDICT r5 stretch #7): `agg_theta_sketch_setops` itself can only ever
    be a rows-only row (sketch estimates are engine-specific), so this twin
    emits what IS provable — the exact cardinalities (hash-matched against
    DuckDB) plus one boolean per set op asserting the sketch estimate lands
    within ±5% of that exact answer.  A sketch regression flips a boolean
    and the driver sees a hash mismatch; the estimates themselves never
    enter the hash.  Same one-pass shape as the underlying query: sketches
    and exact per-user flags are both tiny aggregate states."""
    t = Tables(spark, sf_dir)
    ev = t.events.where(F.col("event_type").isin("purchase", "click"))
    sk = ev.groupBy("event_type").agg(F.theta_sketch_agg("user_id").alias("s"))
    p = sk.where(F.col("event_type") == "purchase").select(F.col("s").alias("ps"))
    c = sk.where(F.col("event_type") == "click").select(F.col("s").alias("cs"))
    est = p.join(c).select(
        F.theta_sketch_estimate("ps").alias("e_p"),
        F.theta_sketch_estimate("cs").alias("e_c"),
        F.theta_sketch_estimate(F.theta_union("ps", "cs")).alias("e_u"),
        F.theta_sketch_estimate(F.theta_intersection("ps", "cs")).alias("e_i"),
        F.theta_sketch_estimate(F.theta_difference("ps", "cs")).alias("e_d"),
    )
    exact = (
        ev.groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("hp"),
            F.max(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("hc"),
        )
        .agg(
            F.sum("hp").cast("bigint").alias("exact_purchase"),
            F.sum("hc").cast("bigint").alias("exact_click"),
            F.count("*").cast("bigint").alias("exact_union"),
            F.sum(F.col("hp") * F.col("hc")).cast("bigint").alias(
                "exact_intersect"
            ),
            F.sum(
                F.when((F.col("hp") == 1) & (F.col("hc") == 0), 1).otherwise(0)
            ).cast("bigint").alias("exact_purchase_only"),
        )
    )

    def ok(e, x):
        return (
            F.abs(F.col(e) - F.col(x)) <= 0.05 * F.col(x)
        ).alias("ok_" + x.replace("exact_", ""))

    return exact.join(est).select(
        "exact_purchase",
        "exact_click",
        "exact_union",
        "exact_intersect",
        "exact_purchase_only",
        ok("e_p", "exact_purchase"),
        ok("e_c", "exact_click"),
        ok("e_u", "exact_union"),
        ok("e_i", "exact_intersect"),
        ok("e_d", "exact_purchase_only"),
    )


@query(
    "agg_kll_quantile_bounds",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           TRUE AS ok_p50, TRUE AS ok_p90
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "sketch", "kll", "accuracy-bound"),
)
def agg_kll_quantile_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-provable accuracy contract for the KLL quantile sketch
    (VERDICT r5 stretch #7), twin of `agg_kll_quantile_sketch`: per
    l_returnflag, merge the two-level sketch exactly as the underlying
    query does, then measure the EXACT empirical rank of the sketch's
    p50/p90 answers with one more pass over the group and assert the rank
    error stays within ±3% (KLL's k=200 guarantee is ~1.65% at 99%
    confidence).  The hash carries the exact group counts and the bound
    booleans — deterministic pass/fail, no estimate in the hash."""
    t = Tables(spark, sf_dir)
    v = F.col("l_extendedprice").cast("double")
    partial = t.lineitem.groupBy("l_returnflag", "l_linestatus").agg(
        F.kll_sketch_agg_double(v).alias("s")
    )
    est = partial.groupBy("l_returnflag").agg(
        F.kll_merge_agg_double(F.col("s")).alias("s")
    ).select(
        "l_returnflag",
        F.kll_sketch_get_quantile_double(F.col("s"), F.lit(0.5)).alias("q50"),
        F.kll_sketch_get_quantile_double(F.col("s"), F.lit(0.9)).alias("q90"),
    )
    return (
        t.lineitem.select("l_returnflag", v.alias("v"))
        .join(F.broadcast(est), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum((F.col("v") <= F.col("q50")).cast("long")).alias("r50"),
            F.sum((F.col("v") <= F.col("q90")).cast("long")).alias("r90"),
        )
        .select(
            "l_returnflag",
            "n",
            (F.abs(F.col("r50") / F.col("n") - 0.5) <= 0.03).alias("ok_p50"),
            (F.abs(F.col("r90") / F.col("n") - 0.9) <= 0.03).alias("ok_p90"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH w AS (
        SELECT l_returnflag, l_extendedprice AS price,
               CAST(l_quantity AS DECIMAL(18,2)) AS wt,
               l_orderkey, l_linenumber
        FROM lineitem
    ),
    cum AS (
        SELECT l_returnflag, price, wt,
               SUM(wt) OVER (PARTITION BY l_returnflag
                             ORDER BY price, l_orderkey, l_linenumber
                             ROWS UNBOUNDED PRECEDING) AS cw,
               SUM(wt) OVER (PARTITION BY l_returnflag) AS tw
        FROM w
    )
    SELECT l_returnflag,
           ROUND(MIN(price), 6) AS weighted_median_price,
           CAST(MIN(tw) AS DOUBLE) AS total_weight
    FROM cum
    WHERE cw * 2 >= tw
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("agg", "weighted-median", "robust-stats"),
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted median — the quantity-weighted midpoint price per return
    flag: the first value (in deterministic (price, PK) order) whose
    cumulative weight reaches half the total.  Weighted quantiles are
    what inventory/pricing analytics actually need (a 100-unit line
    should move the median 100x more than a 1-unit line), and no engine
    ships them as a builtin.

    Exactness: weights go through DECIMAL so both cumulative and total
    sums are order-insensitive; the picked value is an actual data value
    (rank-based, no interpolation); the crossing test (2*cw >= tw) is
    exact decimal arithmetic.

    Scale shape: one window exchange per flag computes the cumulative
    and total weights together; the crossing filter + MIN rollup ride
    the same partitioning.  Same single-exchange posture as
    feature_quantile_binning."""
    li = Tables(spark, sf_dir).lineitem
    from pyspark.sql import Window

    wt = F.col("l_quantity").cast("decimal(18,2)")
    wc = (
        Window.partitionBy("l_returnflag")
        .orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wp = Window.partitionBy("l_returnflag")
    cum = li.select(
        "l_returnflag",
        F.col("l_extendedprice").alias("price"),
        F.sum(wt).over(wc).alias("cw"),
        F.sum(wt).over(wp).alias("tw"),
    )
    return (
        cum.where(F.col("cw") * 2 >= F.col("tw"))
        .groupBy("l_returnflag")
        .agg(
            F.round(F.min("price"), 6).alias("weighted_median_price"),
            F.min("tw").cast("double").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


# Kendall's tau-b between two per-user aggregates, computed at the joint
# DISCRETIZED-value grain — one shared SQL text for both engines.
_TAU_B_SQL = """
WITH peru AS (
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS x,
           CAST(floor(SUM(CAST(value AS DECIMAL(12,2))) / 10) AS BIGINT) AS y
    FROM events GROUP BY user_id
),
cells AS (
    SELECT x, y, CAST(COUNT(*) AS BIGINT) AS n FROM peru GROUP BY x, y
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS n,
           CAST(COUNT(*) AS BIGINT) AS n_cells
    FROM cells
),
tx AS (SELECT CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS n1
       FROM (SELECT SUM(n) AS t FROM cells GROUP BY x)),
ty AS (SELECT CAST(SUM(t * (t - 1) / 2) AS BIGINT) AS n2
       FROM (SELECT SUM(n) AS t FROM cells GROUP BY y)),
pairs AS (
    SELECT CAST(COALESCE(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                                  THEN a.n * b.n ELSE 0 END), 0) AS BIGINT)
               AS conc,
           CAST(COALESCE(SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                                  THEN a.n * b.n ELSE 0 END), 0) AS BIGINT)
               AS disc
    FROM cells a JOIN cells b
      ON a.x > b.x OR (a.x = b.x AND a.y > b.y)
)
SELECT tot.n AS n_users, tot.n_cells, pairs.conc, pairs.disc,
       tx.n1 AS ties_x, ty.n2 AS ties_y,
       ROUND((pairs.conc - pairs.disc)
             / NULLIF(
                 sqrt((CAST(tot.n AS DOUBLE) * (tot.n - 1) / 2 - tx.n1)
                      * (CAST(tot.n AS DOUBLE) * (tot.n - 1) / 2 - ty.n2)),
                 0.0),
             6) AS tau_b
FROM tot, tx, ty, pairs
"""


@query(
    "stats_kendall_tau_b",
    oracle=_TAU_B_SQL,
    tags=("stats", "correlation", "rank", "ties"),
)
def stats_kendall_tau_b(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall's tau-b between two per-user aggregates (event count vs
    spend in 10-unit buckets) — the tie-corrected rank correlation that
    completes the trio next to `stats_spearman_corr` (midrank Pearson)
    and `stats_kendall_trend` (Mann-Kendall vs time).  tau-b =
    (C - D) / sqrt((n0 - n1)(n0 - n2)) with C/D the concordant and
    discordant pair masses and n1/n2 the tie corrections.

    The device that makes exact pair counting distributable: pairs are
    counted at the JOINT DISCRETIZED-VALUE grain — the entity table
    collapses to (x, y, count) cells, and C/D are cell-pair sums
    weighted by count products, each unordered cell pair visited once
    via the (x, y) lexicographic half-plane condition.  Same-cell pairs
    are tied on both axes and correctly contribute to neither C nor D.
    Counts and tie corrections are exact integers; only the final ratio
    is double.

    Scale shape: one scan to entity grain, one reduce to the cell grain
    (bounded by the discretization: x is a small count, y a bucketed
    amount), then a |cells|^2 self-join on the BOUNDED cell frame —
    at 100 TB the cell count depends on the bucket widths, not the row
    count.  Verified against scipy-free numpy pair counting in the
    twin test."""
    from auron_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(_TAU_B_SQL)


@query(
    "agg_median_distributed_scale",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS median_price
    FROM lineitem
    """,
    tags=("agg", "stats", "percentile", "scale-safe"),
)
def agg_median_distributed_scale(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT global median with NO single-partition sort — the scale
    twin `agg_median_percentile`'s docstring promises ('exact percentile
    sorts within groups; approx_percentile is the scale path') now has
    an exact third option: the k-th order statistic through the
    distributed-rank device.  The corpus collapses to the distinct-VALUE
    grain (v, count), `distributed_running_sums` assigns global
    cumulative counts (range repartition + parallel per-partition
    windows + 32 broadcast offsets), and the median is the value(s)
    whose cumulative interval covers rank (n+1)/2 — for even n the two
    covering rows average, which is exactly quantile_cont(0.5)'s
    interpolation (the 0.5-quantile fraction is always 0 or 1/2).

    Exactness: ranks and counts are integers; the value grain is
    2-decimal doubles so the final average is exact.

    Scale shape: one value-grain reduce (bounded by price cardinality,
    not row count), one 32-way range exchange, then a <=2-row filter +
    scalar aggregate; zero `Exchange SinglePartition` outside scalar
    aggregates (plan-gated with the ntile family)."""
    from auron_spark.operators.window import distributed_running_sums

    t = Tables(spark, sf_dir)
    g = (
        t.lineitem.select(F.col("l_extendedprice").alias("v"))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    cum = distributed_running_sums(g, [F.asc("v")], ["cnt"])
    # n = the LAST inclusive running count — read from `cum`, whose lineage
    # is the localCheckpoint inside distributed_running_sums, so the total
    # costs a scalar agg over the pinned value grain instead of a second
    # lineitem scan through g (ADVICE r13 #3).
    tot = cum.agg(F.max("cum_cnt").cast("long").alias("n"))
    x = cum.join(F.broadcast(tot))
    k1 = F.expr("(n + 1) DIV 2")
    k2 = F.expr("(n + 2) DIV 2")
    lo, hi = F.col("cum_cnt") - F.col("cnt"), F.col("cum_cnt")
    covers1 = (lo < k1) & (hi >= k1)
    covers2 = (lo < k2) & (hi >= k2)
    sel = x.filter(covers1 | covers2)
    return sel.agg(
        F.max("n").cast("bigint").alias("n"),
        F.round(
            (
                F.max(F.when(covers1, F.col("v")))
                + F.max(F.when(covers2, F.col("v")))
            )
            / 2.0,
            6,
        ).alias("median_price"),
    )


_DQ_QS = (0.25, 0.5, 0.75, 0.9)


@query(
    "agg_quantiles_distributed_scale",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25,
           ROUND(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
           ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75,
           ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90
    FROM lineitem
    """,
    tags=("agg", "stats", "percentile", "scale-safe"),
)
def agg_quantiles_distributed_scale(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT global continuous quantiles (p25/p50/p75/p90) with NO
    single-partition sort — the general form of
    `agg_median_distributed_scale`'s covered-rank device: for quantile q
    the SQL-standard interpolation sits at h = (n-1)q + 1, so the answer
    is v_lo + (h - lo) * (v_hi - v_lo) where lo = floor(h) and hi =
    lo + 1 are ROW RANKS.  The corpus collapses to the distinct-value
    grain, `distributed_running_sums` assigns global cumulative counts,
    each quantile's two covering ranks are picked by a cumulative-
    interval filter (<= 8 rows total), and the interpolation is map-side
    arithmetic with the broadcast n.

    Exactness: ranks and counts are integers; h's fractional part is
    exact on small integer ratios; values are 2-decimal doubles —
    matching quantile_cont bit-for-bit.

    Scale shape: one value-grain reduce, one 32-way range exchange, a
    <=8-row filter + 1-row arithmetic; zero `Exchange SinglePartition`
    outside scalar aggregates (plan-gated with the ntile family)."""
    from auron_spark.operators.window import distributed_running_sums

    t = Tables(spark, sf_dir)
    g = (
        t.lineitem.select(F.col("l_extendedprice").alias("v"))
        .groupBy("v")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    cum = distributed_running_sums(g, [F.asc("v")], ["cnt"])
    # n from the pinned cum frame, not a second pass over g (ADVICE r13 #3
    # — see agg_median_distributed_scale).
    tot = cum.agg(F.max("cum_cnt").cast("long").alias("n"))
    x = cum.join(F.broadcast(tot))
    lo, hi = F.col("cum_cnt") - F.col("cnt"), F.col("cum_cnt")

    def h(q: float):
        # h = (n-1)q + 1 as an exact expression; lo_rank = floor(h)
        return (F.col("n") - 1) * F.lit(q) + 1.0

    def covers(rank_expr):
        return (lo < rank_expr) & (hi >= rank_expr)

    conds = []
    for q in _DQ_QS:
        lo_rank = F.floor(h(q)).cast("long")
        conds.append(covers(lo_rank) | covers(lo_rank + 1))
    sel = x.filter(conds[0] | conds[1] | conds[2] | conds[3])
    # The interpolation needs each quantile's v_lo and v_hi TOGETHER, so
    # aggregate the covering values first, then compute map-side on the
    # 1-row frame.
    agg_cols = [F.max("n").cast("bigint").alias("n")]
    for q, name in zip(_DQ_QS, ("p25", "p50", "p75", "p90")):
        lo_rank = F.floor(h(q)).cast("long")
        agg_cols.append(
            F.max(F.when(covers(lo_rank), F.col("v"))).alias(f"vlo_{name}")
        )
        agg_cols.append(
            F.max(F.when(covers(lo_rank + 1), F.col("v"))).alias(
                f"vhi_{name}"
            )
        )
    one = sel.agg(*agg_cols)
    outs = [F.col("n")]
    for q, name in zip(_DQ_QS, ("p25", "p50", "p75", "p90")):
        hq = (F.col("n") - 1) * F.lit(q) + 1.0
        frac = hq - F.floor(hq).cast("double")
        v_lo, v_hi = F.col(f"vlo_{name}"), F.col(f"vhi_{name}")
        # when h is integral the hi rank equals lo rank's successor but
        # frac = 0, so the v_hi term vanishes; COALESCE guards the exact
        # n*q boundary where lo+1 may exceed n (q=1 edge — not used here
        # but kept total).
        outs.append(
            F.round(
                v_lo + frac * (F.coalesce(v_hi, v_lo) - v_lo), 6
            ).alias(name)
        )
    return one.select(*outs)
