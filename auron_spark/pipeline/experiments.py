"""Experiment-analysis operators: the parametric / categorical / causal
statistics an A/B platform computes after `eval_ab_srm_check` admits the
assignment — completing the test family next to the nonparametric
`eval_mannwhitney_u` / `eval_ks_test` (evaluation.py) and the censored
`eval_survival_logrank`.

Exactness contract (the `agg_stats_moments` pattern): every sum over
corpus-sized data is an exact DECIMAL power sum (the fixture's doubles are
2-dp decimals, so the casts are lossless), cast to double only once
aggregated; the statistic is then the SAME double expression tree in Spark
and DuckDB, so the 6-dp rounded outputs agree bit-exactly.

Scale shape: every query is one fact scan + a partial/final aggregate at
group/cell grain (2-25 rows), then scalar arithmetic — nothing but the scan
touches corpus-sized data, and nothing shuffles more than the group-grain
partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from auron_spark.registry import query
from auron_spark.tables import Tables

# Exact decimal view of the events metric (2-dp doubles in the fixture).
_X_DEC = "CAST(value AS DECIMAL(12,2))"
# Mid-corpus experiment start: events span 2024-01-01 .. 2024-01-30.
_CUTOVER = "2024-01-16"
# Deterministic 50/50 arm split — the same md5 assignment eval_ab_srm_check
# proved driver-exact.
_SQL_ARM = """CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                            1, 8) AS BIGINT) % 100 < 50
                   THEN 'A' ELSE 'B' END"""


def _x_dec() -> F.Column:
    return F.col("value").cast("decimal(12,2)")


def _arm() -> F.Column:
    return F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
        < 50,
        "A",
    ).otherwise("B")


def _pow_sums(tag: str) -> list[F.Column]:
    """Exact n / sum(x) / sum(x^2) for rows where event_type == tag."""
    m = F.col("event_type") == tag
    x = F.when(m, _x_dec())
    return [
        F.count(F.when(m, 1)).alias(f"n_{tag[0]}"),
        F.sum(x).cast("double").alias(f"s1_{tag[0]}"),
        F.sum((x * x).cast("decimal(24,4)")).cast("double").alias(f"s2_{tag[0]}"),
    ]


def _sql_pow(tag: str, a: str) -> str:
    """Oracle-side twin of `_pow_sums`: exact decimal n / Σx / Σx²."""
    return f"""
           COUNT(*) FILTER (WHERE event_type = '{tag}') AS n_{a},
           CAST(SUM({_X_DEC}) FILTER (WHERE event_type = '{tag}')
                AS DOUBLE) AS s1_{a},
           CAST(SUM(CAST({_X_DEC} * {_X_DEC} AS DECIMAL(24,4)))
                FILTER (WHERE event_type = '{tag}') AS DOUBLE) AS s2_{a}"""


@query(
    "eval_welch_ttest",
    oracle=f"""
    WITH ps AS (
        SELECT {_sql_pow("purchase", "p")},
               {_sql_pow("click", "c")}
        FROM events
    )
    SELECT CAST(n_p AS BIGINT) AS n_a, CAST(n_c AS BIGINT) AS n_b,
           ROUND(s1_p / n_p, 6) AS mean_a,
           ROUND(s1_c / n_c, 6) AS mean_b,
           ROUND((s2_p - s1_p * s1_p / n_p) / (n_p - 1), 6) AS var_a,
           ROUND((s2_c - s1_c * s1_c / n_c) / (n_c - 1), 6) AS var_b,
           ROUND((s1_p / n_p - s1_c / n_c)
                 / sqrt((s2_p - s1_p * s1_p / n_p) / (n_p - 1) / n_p
                        + (s2_c - s1_c * s1_c / n_c) / (n_c - 1) / n_c), 6)
               AS t_stat,
           ROUND(
             ((s2_p - s1_p * s1_p / n_p) / (n_p - 1) / n_p
              + (s2_c - s1_c * s1_c / n_c) / (n_c - 1) / n_c)
             * ((s2_p - s1_p * s1_p / n_p) / (n_p - 1) / n_p
                + (s2_c - s1_c * s1_c / n_c) / (n_c - 1) / n_c)
             / ( ((s2_p - s1_p * s1_p / n_p) / (n_p - 1) / n_p)
                 * ((s2_p - s1_p * s1_p / n_p) / (n_p - 1) / n_p) / (n_p - 1)
               + ((s2_c - s1_c * s1_c / n_c) / (n_c - 1) / n_c)
                 * ((s2_c - s1_c * s1_c / n_c) / (n_c - 1) / n_c) / (n_c - 1)),
             6) AS df_welch,
           CAST(abs((s1_p / n_p - s1_c / n_c)
                 / sqrt((s2_p - s1_p * s1_p / n_p) / (n_p - 1) / n_p
                        + (s2_c - s1_c * s1_c / n_c) / (n_c - 1) / n_c))
                > 1.96 AS INT) AS reject_05
    FROM ps
    """,
    tags=("pipeline", "evaluation", "ab-test", "parametric"),
)
def eval_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between purchase and click event
    values — the default parametric A/B test (never pooled-variance
    Student's t: arm variances are never equal in practice), with the
    Welch-Satterthwaite effective degrees of freedom and a normal-
    approximation 5% verdict (df is in the thousands here, where
    t ~= z; the df column lets a reader re-check against any table).

    Exactness: both groups' n/Σx/Σx² are exact DECIMAL power sums taken
    in ONE conditional-aggregation pass; every statistic is the same
    double expression tree over those exact inputs in both engines.

    Scale shape: one fact scan -> partial/final scalar aggregate (6
    numbers) -> map-side arithmetic on a 1-row frame."""
    ev = Tables(spark, sf_dir).events
    ps = ev.agg(*_pow_sums("purchase"), *_pow_sums("click"))
    n_a, s1_a, s2_a = F.col("n_p"), F.col("s1_p"), F.col("s2_p")
    n_b, s1_b, s2_b = F.col("n_c"), F.col("s1_c"), F.col("s2_c")
    mean_a, mean_b = s1_a / n_a, s1_b / n_b
    var_a = (s2_a - s1_a * s1_a / n_a) / (n_a - 1)
    var_b = (s2_b - s1_b * s1_b / n_b) / (n_b - 1)
    sea, seb = var_a / n_a, var_b / n_b
    t = (mean_a - mean_b) / F.sqrt(sea + seb)
    df_w = (sea + seb) * (sea + seb) / (
        sea * sea / (n_a - 1) + seb * seb / (n_b - 1)
    )
    return ps.select(
        n_a.cast("bigint").alias("n_a"),
        n_b.cast("bigint").alias("n_b"),
        F.round(mean_a, 6).alias("mean_a"),
        F.round(mean_b, 6).alias("mean_b"),
        F.round(var_a, 6).alias("var_a"),
        F.round(var_b, 6).alias("var_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(df_w, 6).alias("df_welch"),
        (F.abs(t) > 1.96).cast("int").alias("reject_05"),
    )


@query(
    "eval_anova_oneway",
    oracle=f"""
    WITH g AS (
        SELECT event_type,
               COUNT(*) AS n_g,
               CAST(SUM({_X_DEC}) AS DOUBLE) AS s1_g,
               CAST(SUM(CAST({_X_DEC} * {_X_DEC} AS DECIMAL(24,4)))
                    AS DOUBLE) AS s2_g
        FROM events GROUP BY event_type
    ),
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS k,
               CAST(SUM(n_g) AS BIGINT) AS n,
               SUM(s1_g) AS s1,
               SUM(s2_g) AS s2,
               SUM(s1_g * s1_g / n_g) AS sgm
        FROM g
    )
    SELECT k, n,
           ROUND(sgm - s1 * s1 / n, 6) AS ss_between,
           ROUND(s2 - sgm, 6) AS ss_within,
           ROUND((sgm - s1 * s1 / n) / (k - 1)
                 / ((s2 - sgm) / (n - k)), 6) AS f_stat,
           CAST((sgm - s1 * s1 / n) / (k - 1)
                / ((s2 - sgm) / (n - k)) > 2.372 AS INT) AS reject_05
    FROM tot
    """,
    tags=("pipeline", "evaluation", "ab-test", "parametric"),
)
def eval_anova_oneway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test across all five event types — does the metric
    differ across more than two variants?  SS_between / SS_within from
    per-group exact power sums; the 5% verdict uses the F(4, inf)
    critical value 2.372 (n-k is in the thousands; the k/n columns let a
    reader re-check any exact table).

    Exactness: group-grain power sums are exact DECIMAL; the 5-row
    second-stage sums (s1, s2, sgm) add five deterministic doubles whose
    magnitudes make the worst-case order effect ~1e-9 relative — the
    same second-stage contract `eval_mannwhitney_u` proved driver-exact.

    Scale shape: fact scan -> group-grain partial/final aggregate
    (|event_type| = 5 rows) -> scalar fold."""
    ev = Tables(spark, sf_dir).events
    x = _x_dec()
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n_g"),
        F.sum(x).cast("double").alias("s1_g"),
        F.sum((x * x).cast("decimal(24,4)")).cast("double").alias("s2_g"),
    )
    tot = g.agg(
        F.count("*").cast("bigint").alias("k"),
        F.sum("n_g").cast("bigint").alias("n"),
        F.sum("s1_g").alias("s1"),
        F.sum("s2_g").alias("s2"),
        F.sum(F.col("s1_g") * F.col("s1_g") / F.col("n_g")).alias("sgm"),
    )
    ssb = F.col("sgm") - F.col("s1") * F.col("s1") / F.col("n")
    ssw = F.col("s2") - F.col("sgm")
    f_stat = ssb / (F.col("k") - 1) / (ssw / (F.col("n") - F.col("k")))
    return tot.select(
        "k",
        "n",
        F.round(ssb, 6).alias("ss_between"),
        F.round(ssw, 6).alias("ss_within"),
        F.round(f_stat, 6).alias("f_stat"),
        (f_stat > 2.372).cast("int").alias("reject_05"),
    )


@query(
    "eval_chi_square_independence",
    oracle="""
    WITH cells AS (
        SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio,
               COUNT(*) AS obs
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY seg, prio
    ),
    m AS (
        SELECT seg, prio, obs,
               SUM(obs) OVER (PARTITION BY seg) AS row_tot,
               SUM(obs) OVER (PARTITION BY prio) AS col_tot,
               SUM(obs) OVER () AS n
        FROM cells
    ),
    agg AS (
        SELECT CAST(MAX(n) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT seg) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT prio) AS BIGINT) AS n_cols,
               SUM(pow(obs - CAST(row_tot AS DOUBLE) * col_tot / n, 2)
                   / (CAST(row_tot AS DOUBLE) * col_tot / n)) AS chi
        FROM m
    )
    SELECT n, n_rows, n_cols,
           CAST((n_rows - 1) * (n_cols - 1) AS BIGINT) AS df,
           ROUND(chi, 6) AS chi_square,
           ROUND(sqrt(chi / (n * CAST(LEAST(n_rows, n_cols) - 1 AS DOUBLE))),
                 6) AS cramers_v,
           CAST(chi > 26.296 AS INT) AS reject_05
    FROM agg
    """,
    tags=("pipeline", "evaluation", "categorical", "independence"),
)
def eval_chi_square_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between customer market
    segment and order priority (5x5 contingency), with Cramér's V effect
    size — the categorical-association check behind feature screening and
    segment-mix monitoring.  The 5% verdict uses the df=16 critical value
    26.296 (df is emitted for re-checking).

    Exactness: observed cells and marginals are exact integers; expected
    counts and chi terms are deterministic double expressions per cell;
    the final sum folds 25 such terms (second-stage contract as
    `eval_anova_oneway`).

    Scale shape: fact join (customer dim broadcasts) -> cell-grain
    aggregate (25 rows) -> marginal windows over the 25-row grain ->
    scalar fold.  Nothing after the first aggregate is corpus-sized."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    cells = (
        t.orders.join(
            F.broadcast(t.customer),
            t.customer["c_custkey"] == t.orders["o_custkey"],
        )
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(F.count("*").alias("obs"))
    )
    m = (
        cells.withColumn("row_tot", F.sum("obs").over(Window.partitionBy("seg")))
        .withColumn("col_tot", F.sum("obs").over(Window.partitionBy("prio")))
        .withColumn(
            "n", F.sum("obs").over(Window.partitionBy(F.lit(1)))
        )
    )
    exp = F.col("row_tot").cast("double") * F.col("col_tot") / F.col("n")
    agg = m.agg(
        F.max("n").cast("bigint").alias("n"),
        F.countDistinct("seg").cast("bigint").alias("n_rows"),
        F.countDistinct("prio").cast("bigint").alias("n_cols"),
        F.sum(F.pow(F.col("obs") - exp, 2) / exp).alias("chi"),
    )
    return agg.select(
        "n",
        "n_rows",
        "n_cols",
        ((F.col("n_rows") - 1) * (F.col("n_cols") - 1))
        .cast("bigint")
        .alias("df"),
        F.round("chi", 6).alias("chi_square"),
        F.round(
            F.sqrt(
                F.col("chi")
                / (
                    F.col("n")
                    * (F.least("n_rows", "n_cols") - 1).cast("double")
                )
            ),
            6,
        ).alias("cramers_v"),
        (F.col("chi") > 26.296).cast("int").alias("reject_05"),
    )


@query(
    "eval_roc_auc",
    oracle="""
    WITH vg AS (
        SELECT value,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS np_v,
               COUNT(*) AS n_v
        FROM events
        GROUP BY value
    ),
    cum AS (
        SELECT value, np_v, n_v,
               SUM(n_v) OVER (ORDER BY value
                              ROWS UNBOUNDED PRECEDING) - n_v AS cum_before
        FROM vg
    ),
    tot AS (
        SELECT CAST(SUM(np_v) AS BIGINT) AS na,
               CAST(SUM(n_v) - SUM(np_v) AS BIGINT) AS nb
        FROM vg
    ),
    rs AS (
        SELECT SUM(np_v * (cum_before + (n_v + 1) / 2.0)) AS ra FROM cum
    ),
    a AS (
        SELECT na, nb,
               (ra - na * (na + 1) / 2.0) / (na * CAST(nb AS DOUBLE)) AS auc
        FROM rs CROSS JOIN tot
    )
    SELECT na AS n_pos, nb AS n_neg,
           ROUND(auc, 6) AS auc,
           ROUND(2 * auc - 1, 6) AS gini,
           ROUND(sqrt((auc * (1 - auc)
                       + (na - 1) * (auc / (2 - auc) - auc * auc)
                       + (nb - 1) * (2 * auc * auc / (1 + auc) - auc * auc))
                      / (na * CAST(nb AS DOUBLE))), 6) AS se_hanley
    FROM a
    """,
    tags=("pipeline", "evaluation", "ranking", "roc"),
)
def eval_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the logistic scorer (`eval_calibration_bins`'s
    model) for predicting purchases, via the rank-sum identity
    AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg) with midranks for
    ties, plus the Gini coefficient and the Hanley-McNeil standard error.
    The scorer is a strictly increasing transform of `value`, so ranking
    the raw metric gives the identical AUC — no exp() need cross engines.

    Exactness: the rank sum is midrank arithmetic over exact integers
    (every term an integer or half-integer), so AUC is an exact rational;
    Gini and the SE are deterministic double expressions over it.

    Scale shape: value-grain collapse, then the ONLY global ordering runs
    at distinct-value grain through `distributed_running_sums` (no
    single-partition window at any cardinality), then scalar folds —
    the `eval_mannwhitney_u` scaffold pointed at ranking quality."""
    from auron_spark.operators.window import distributed_running_sums

    ev = Tables(spark, sf_dir).events
    vg = ev.groupBy("value").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("np_v"),
        F.count("*").alias("n_v"),
    )
    cum = distributed_running_sums(vg, ["value"], ["n_v"]).withColumn(
        "cum_before", F.col("cum_n_v") - F.col("n_v")
    )
    tot = vg.agg(
        F.sum("np_v").cast("bigint").alias("na"),
        (F.sum("n_v") - F.sum("np_v")).cast("bigint").alias("nb"),
    )
    rs = cum.agg(
        F.sum(
            F.col("np_v") * (F.col("cum_before") + (F.col("n_v") + 1) / 2.0)
        ).alias("ra")
    )
    auc = (F.col("ra") - F.col("na") * (F.col("na") + 1) / 2.0) / (
        F.col("na") * F.col("nb").cast("double")
    )
    a = rs.join(F.broadcast(tot)).select("na", "nb", auc.alias("auc"))
    q1 = F.col("auc") / (2 - F.col("auc"))
    q2 = 2 * F.col("auc") * F.col("auc") / (1 + F.col("auc"))
    se = F.sqrt(
        (
            F.col("auc") * (1 - F.col("auc"))
            + (F.col("na") - 1) * (q1 - F.col("auc") * F.col("auc"))
            + (F.col("nb") - 1) * (q2 - F.col("auc") * F.col("auc"))
        )
        / (F.col("na") * F.col("nb").cast("double"))
    )
    return a.select(
        F.col("na").alias("n_pos"),
        F.col("nb").alias("n_neg"),
        F.round("auc", 6).alias("auc"),
        F.round(2 * F.col("auc") - 1, 6).alias("gini"),
        F.round(se, 6).alias("se_hanley"),
    )


@query(
    "eval_cuped_adjustment",
    oracle=f"""
    WITH per_user AS (
        SELECT user_id,
               CAST(COALESCE(SUM({_X_DEC})
                    FILTER (WHERE ts < TIMESTAMP '{_CUTOVER}'),
                    0) AS DOUBLE) AS pre,
               CAST(COALESCE(SUM({_X_DEC})
                    FILTER (WHERE ts >= TIMESTAMP '{_CUTOVER}'),
                    0) AS DOUBLE) AS post
        FROM events GROUP BY user_id
    ),
    ps AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(pre AS DECIMAL(14,2))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(post AS DECIMAL(14,2))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(CAST(pre AS DECIMAL(14,2))
                             * CAST(pre AS DECIMAL(14,2))
                             AS DECIMAL(30,4))) AS DOUBLE) AS sxx,
               CAST(SUM(CAST(CAST(pre AS DECIMAL(14,2))
                             * CAST(post AS DECIMAL(14,2))
                             AS DECIMAL(30,4))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(CAST(post AS DECIMAL(14,2))
                             * CAST(post AS DECIMAL(14,2))
                             AS DECIMAL(30,4))) AS DOUBLE) AS syy
        FROM per_user
    )
    SELECT CAST(n AS BIGINT) AS n_users,
           ROUND((sxy / n - sx / n * (sy / n))
                 / (sxx / n - sx / n * (sx / n)), 6) AS theta,
           ROUND(syy / n - sy / n * (sy / n), 6) AS var_post,
           ROUND((syy / n - sy / n * (sy / n))
                 - pow(sxy / n - sx / n * (sy / n), 2)
                   / (sxx / n - sx / n * (sx / n)), 6) AS var_cuped,
           ROUND(pow(sxy / n - sx / n * (sy / n), 2)
                 / ((sxx / n - sx / n * (sx / n))
                    * (syy / n - sy / n * (sy / n))), 6)
               AS var_reduction_pct
    FROM ps
    """,
    tags=("pipeline", "evaluation", "ab-test", "variance-reduction"),
)
def eval_cuped_adjustment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance reduction: theta = cov(pre, post) / var(pre) over
    per-user pre-period and post-period metric sums (cutover mid-corpus),
    the adjusted-metric variance var(post) - theta^2 var(pre), and the
    achieved reduction rho^2 — the standard pre-experiment-covariate
    trick that shrinks A/B confidence intervals without more traffic.

    Exactness: per-user pre/post are exact DECIMAL sums (2-dp metric)
    surfacing as exact 2-dp doubles; the covariance power sums re-enter
    DECIMAL at user grain, so theta's inputs are exact; the output is one
    double expression tree, rounded at 6dp.

    Scale shape: fact scan -> user-grain conditional aggregate (the only
    corpus-sized shuffle, on the natural user key) -> scalar power-sum
    fold -> 1-row arithmetic."""
    ev = Tables(spark, sf_dir).events
    cut = F.lit(_CUTOVER).cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("ts") < cut, _x_dec())), F.lit(0)
        )
        .cast("double")
        .alias("pre"),
        F.coalesce(
            F.sum(F.when(F.col("ts") >= cut, _x_dec())), F.lit(0)
        )
        .cast("double")
        .alias("post"),
    )
    xd = F.col("pre").cast("decimal(14,2)")
    yd = F.col("post").cast("decimal(14,2)")
    ps = per_user.agg(
        F.count("*").alias("n"),
        F.sum(xd).cast("double").alias("sx"),
        F.sum(yd).cast("double").alias("sy"),
        F.sum((xd * xd).cast("decimal(30,4)")).cast("double").alias("sxx"),
        F.sum((xd * yd).cast("decimal(30,4)")).cast("double").alias("sxy"),
        F.sum((yd * yd).cast("decimal(30,4)")).cast("double").alias("syy"),
    )
    n = F.col("n")
    cov = F.col("sxy") / n - F.col("sx") / n * (F.col("sy") / n)
    var_x = F.col("sxx") / n - F.col("sx") / n * (F.col("sx") / n)
    var_y = F.col("syy") / n - F.col("sy") / n * (F.col("sy") / n)
    return ps.select(
        n.cast("bigint").alias("n_users"),
        F.round(cov / var_x, 6).alias("theta"),
        F.round(var_y, 6).alias("var_post"),
        F.round(var_y - F.pow(cov, 2) / var_x, 6).alias("var_cuped"),
        F.round(F.pow(cov, 2) / (var_x * var_y), 6).alias(
            "var_reduction_pct"
        ),
    )


@query(
    "eval_diff_in_differences",
    oracle=f"""
    WITH cells AS (
        SELECT {_SQL_ARM} AS arm,
               CASE WHEN ts < TIMESTAMP '{_CUTOVER}' THEN 'pre'
                    ELSE 'post' END AS period,
               COUNT(*) AS n,
               CAST(SUM({_X_DEC}) AS DOUBLE) AS s1
        FROM events
        GROUP BY arm, period
    )
    SELECT MAX(CASE WHEN arm = 'A' AND period = 'pre'
                    THEN CAST(n AS BIGINT) END) AS n_a_pre,
           MAX(CASE WHEN arm = 'B' AND period = 'pre'
                    THEN CAST(n AS BIGINT) END) AS n_b_pre,
           ROUND(MAX(CASE WHEN arm = 'A' AND period = 'pre'
                          THEN s1 / n END), 6) AS mean_a_pre,
           ROUND(MAX(CASE WHEN arm = 'A' AND period = 'post'
                          THEN s1 / n END), 6) AS mean_a_post,
           ROUND(MAX(CASE WHEN arm = 'B' AND period = 'pre'
                          THEN s1 / n END), 6) AS mean_b_pre,
           ROUND(MAX(CASE WHEN arm = 'B' AND period = 'post'
                          THEN s1 / n END), 6) AS mean_b_post,
           ROUND((MAX(CASE WHEN arm = 'B' AND period = 'post'
                           THEN s1 / n END)
                  - MAX(CASE WHEN arm = 'B' AND period = 'pre'
                             THEN s1 / n END))
                 - (MAX(CASE WHEN arm = 'A' AND period = 'post'
                            THEN s1 / n END)
                    - MAX(CASE WHEN arm = 'A' AND period = 'pre'
                               THEN s1 / n END)), 6) AS did_estimate
    FROM cells
    """,
    tags=("pipeline", "evaluation", "ab-test", "causal"),
)
def eval_diff_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimator over the deterministic A/B
    hash split and a mid-corpus cutover: DiD = (B_post - B_pre) -
    (A_post - A_pre), the first causal read when randomization is doubted
    (it nets out both arm-level baseline offsets and the common time
    trend).  Emits the four cell means so the parallel-trends inputs are
    auditable.

    Exactness: cell sums are exact DECIMAL in one conditional-aggregation
    pass; means and the estimator are one double expression tree.

    Scale shape: fact scan -> 4-cell partial/final aggregate -> 1-row
    pivot fold.  The arm is the map-side md5 split proven by
    `eval_ab_srm_check`."""
    ev = Tables(spark, sf_dir).events
    cut = F.lit(_CUTOVER).cast("timestamp")
    cells = ev.groupBy(
        _arm().alias("arm"),
        F.when(F.col("ts") < cut, "pre").otherwise("post").alias("period"),
    ).agg(F.count("*").alias("n"), F.sum(_x_dec()).cast("double").alias("s1"))

    def cell(arm: str, period: str, col: F.Column) -> F.Column:
        return F.max(
            F.when((F.col("arm") == arm) & (F.col("period") == period), col)
        )

    mean = F.col("s1") / F.col("n")
    did = (cell("B", "post", mean) - cell("B", "pre", mean)) - (
        cell("A", "post", mean) - cell("A", "pre", mean)
    )
    return cells.agg(
        cell("A", "pre", F.col("n").cast("bigint")).alias("n_a_pre"),
        cell("B", "pre", F.col("n").cast("bigint")).alias("n_b_pre"),
        F.round(cell("A", "pre", mean), 6).alias("mean_a_pre"),
        F.round(cell("A", "post", mean), 6).alias("mean_a_post"),
        F.round(cell("B", "pre", mean), 6).alias("mean_b_pre"),
        F.round(cell("B", "post", mean), 6).alias("mean_b_post"),
        F.round(did, 6).alias("did_estimate"),
    )


#: Two-sided alpha=.05 and power=.80 normal quantiles (fixed literals so
#: both engines fold the same constants).
_Z_ALPHA = 1.959964
_Z_BETA = 0.841621
_MDE_REL = 0.10  # minimum detectable effect: +10% relative


@query(
    "eval_power_analysis",
    oracle=f"""
    WITH conv AS (
        SELECT user_id, date_trunc('day', ts) AS d,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
        FROM events GROUP BY user_id, d
    ),
    base AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
               CAST(SUM(y) AS DOUBLE) / COUNT(*) AS p1
        FROM conv
    ),
    tr AS (
        SELECT CAST(COUNT(*) AS DOUBLE)
               / COUNT(DISTINCT d) AS daily_units
        FROM conv
    ),
    calc AS (
        SELECT n_units, p1, p1 * (1 + {_MDE_REL}) AS p2, daily_units
        FROM base CROSS JOIN tr
    )
    SELECT n_units,
           ROUND(p1, 6) AS p_baseline,
           ROUND(p2, 6) AS p_target,
           CAST(CEIL(
               pow({_Z_ALPHA} * sqrt(2 * ((p1 + p2) / 2)
                                     * (1 - (p1 + p2) / 2))
                   + {_Z_BETA} * sqrt(p1 * (1 - p1) + p2 * (1 - p2)), 2)
               / pow(p2 - p1, 2)) AS BIGINT) AS n_per_arm,
           ROUND(daily_units, 6) AS avg_daily_units,
           CAST(CEIL(
               2 * CEIL(
                   pow({_Z_ALPHA} * sqrt(2 * ((p1 + p2) / 2)
                                         * (1 - (p1 + p2) / 2))
                       + {_Z_BETA} * sqrt(p1 * (1 - p1) + p2 * (1 - p2)), 2)
                   / pow(p2 - p1, 2))
               / daily_units) AS BIGINT) AS days_required
    FROM calc
    """,
    tags=("pipeline", "evaluation", "ab-test", "power"),
)
def eval_power_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-size calculator fed by the corpus itself: measure the
    baseline USER-DAY purchase conversion (the randomization unit a
    daily-exposure experiment actually assigns; user-level conversion
    saturates to ~1 over a month and cannot power a test), target a +10%
    relative lift, and compute the required units per arm
    (two-proportion z-test, alpha=.05 two-sided, power=.80) plus how many
    days of observed user-day traffic that costs — the pre-experiment
    feasibility check that kills underpowered tests before they run.
    Closes the experiment lifecycle: power (here) -> SRM
    (`eval_ab_srm_check`) -> read (`eval_welch_ttest` /
    `eval_mannwhitney_u`) -> variance reduction
    (`eval_cuped_adjustment`).

    Exactness: p1 is an exact integer ratio; the quantiles are fixed
    literals; the formula is one double expression tree; CEIL lands on
    values far from integer boundaries (p1 is an arbitrary rational), so
    the integer outputs are stable.

    Scale shape: one user-day-grain aggregate on the fact scan, two
    scalar rollups of it, then 1-row arithmetic."""
    ev = Tables(spark, sf_dir).events
    conv = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("y")
    )
    base = conv.agg(
        F.count("*").cast("bigint").alias("n_units"),
        (F.sum("y").cast("double") / F.count("*")).alias("p1"),
    )
    tr = conv.agg(
        (F.count("*").cast("double") / F.countDistinct("d")).alias(
            "daily_units"
        )
    )
    calc = base.join(F.broadcast(tr)).select(
        "n_units",
        "p1",
        (F.col("p1") * (1 + _MDE_REL)).alias("p2"),
        "daily_units",
    )
    pbar = (F.col("p1") + F.col("p2")) / 2
    n_arm = F.ceil(
        F.pow(
            _Z_ALPHA * F.sqrt(2 * pbar * (1 - pbar))
            + _Z_BETA
            * F.sqrt(
                F.col("p1") * (1 - F.col("p1"))
                + F.col("p2") * (1 - F.col("p2"))
            ),
            2,
        )
        / F.pow(F.col("p2") - F.col("p1"), 2)
    )
    return calc.select(
        "n_units",
        F.round("p1", 6).alias("p_baseline"),
        F.round("p2", 6).alias("p_target"),
        n_arm.cast("bigint").alias("n_per_arm"),
        F.round("daily_units", 6).alias("avg_daily_units"),
        F.ceil(2 * n_arm / F.col("daily_units"))
        .cast("bigint")
        .alias("days_required"),
    )


@query(
    "eval_qini_uplift",
    oracle=f"""
    WITH pu AS (
        SELECT user_id,
               {_SQL_ARM} AS arm,
               CAST(COALESCE(SUM({_X_DEC})
                    FILTER (WHERE ts < TIMESTAMP '{_CUTOVER}'),
                    0) AS DOUBLE) AS score,
               MAX(CASE WHEN event_type = 'purchase'
                        AND ts >= TIMESTAMP '{_CUTOVER}'
                        THEN 1 ELSE 0 END) AS y
        FROM events GROUP BY user_id
    ),
    ranked AS (
        SELECT arm, y,
               NTILE(10) OVER (ORDER BY score DESC, user_id) AS decile
        FROM pu
    ),
    cells AS (
        SELECT decile,
               SUM(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS n_t,
               SUM(CASE WHEN arm = 'B' THEN y ELSE 0 END) AS r_t,
               SUM(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS n_c,
               SUM(CASE WHEN arm = 'A' THEN y ELSE 0 END) AS r_c
        FROM ranked GROUP BY decile
    ),
    cum AS (
        SELECT decile,
               SUM(n_t) OVER w AS nt, SUM(r_t) OVER w AS rt,
               SUM(n_c) OVER w AS nc, SUM(r_c) OVER w AS rc
        FROM cells
        WINDOW w AS (ORDER BY decile ROWS UNBOUNDED PRECEDING)
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(nt AS BIGINT) AS n_treat_cum,
           CAST(rt AS BIGINT) AS resp_treat_cum,
           CAST(nc AS BIGINT) AS n_ctrl_cum,
           CAST(rc AS BIGINT) AS resp_ctrl_cum,
           ROUND(rt - CAST(rc AS DOUBLE) * nt / nc, 6) AS qini_uplift
    FROM cum
    ORDER BY decile
    """,
    tags=("pipeline", "evaluation", "ab-test", "uplift", "scale-safe"),
)
def eval_qini_uplift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qini (cumulative uplift) curve: rank users by a targeting score
    (pre-period spend — the model-free proxy every uplift evaluation
    starts from), split into score deciles, and accumulate incremental
    responders rt - rc*nt/nc down the ranking — the curve that answers
    "if I can only treat the top k%, how much incremental conversion do
    I buy?", read next to `eval_cuped_adjustment` (same pre-period
    covariate, opposite use).  A curve hugging zero says the score does
    not identify persuadables (correct for this random split — that
    null read IS the calibration).

    Exactness: scores are exact 2-dp doubles; the decile assignment is
    NTILE over the (score DESC, user_id) total order; all outputs fold
    exact integers, with one division per row.

    Scale shape: user-grain conditional aggregate (the only corpus
    shuffle), then the global ranking runs through `distributed_ntile`
    (range repartition + per-partition ranks + 32 broadcast offsets — no
    single-partition window at any user count); cells and cumulative live
    at decile grain."""
    from pyspark.sql import Window

    from auron_spark.operators.window import distributed_ntile

    ev = Tables(spark, sf_dir).events
    cut = F.lit(_CUTOVER).cast("timestamp")
    pu = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("ts") < cut, _x_dec())), F.lit(0)
        )
        .cast("double")
        .alias("score"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("ts") >= cut), 1
            ).otherwise(0)
        ).alias("y"),
    )
    pu = pu.join(
        ev.select("user_id", _arm().alias("arm")).dropDuplicates(["user_id"]),
        "user_id",
    ).withColumn("neg_score", -F.col("score"))
    ranked = distributed_ntile(
        pu, 10, ["neg_score", "user_id"], "decile"
    )
    cells = ranked.groupBy("decile").agg(
        F.sum(F.when(F.col("arm") == "B", 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(F.col("arm") == "B", F.col("y")).otherwise(0)).alias("r_t"),
        F.sum(F.when(F.col("arm") == "A", 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(F.col("arm") == "A", F.col("y")).otherwise(0)).alias("r_c"),
    )
    w = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = cells.select(
        "decile",
        F.sum("n_t").over(w).alias("nt"),
        F.sum("r_t").over(w).alias("rt"),
        F.sum("n_c").over(w).alias("nc"),
        F.sum("r_c").over(w).alias("rc"),
    )
    return cum.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("nt").cast("bigint").alias("n_treat_cum"),
        F.col("rt").cast("bigint").alias("resp_treat_cum"),
        F.col("nc").cast("bigint").alias("n_ctrl_cum"),
        F.col("rc").cast("bigint").alias("resp_ctrl_cum"),
        F.round(
            F.col("rt") - F.col("rc").cast("double") * F.col("nt") / F.col("nc"),
            6,
        ).alias("qini_uplift"),
    ).orderBy("decile")


@query(
    "eval_ks_two_sample",
    oracle="""
    WITH s AS (
        SELECT value,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS f1,
               CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS f2
        FROM events WHERE event_type IN ('view', 'click')
    ),
    g AS (
        SELECT value, SUM(f1) AS c1, SUM(f2) AS c2 FROM s GROUP BY value
    ),
    cum AS (
        SELECT value,
               SUM(c1) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS a1,
               SUM(c2) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS a2,
               SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2
        FROM g
    ),
    d AS (
        SELECT value,
               abs(CAST(a1 AS DOUBLE) / n1 - CAST(a2 AS DOUBLE) / n2) AS dd,
               n1, n2
        FROM cum
    ),
    best AS (
        SELECT value, dd, n1, n2,
               row_number() OVER (ORDER BY dd DESC, value) AS rk
        FROM d
    )
    SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
           ROUND(dd, 6) AS ks_d,
           ROUND(value, 6) AS at_value,
           ROUND(1.36 * sqrt((n1 + CAST(n2 AS DOUBLE)) / (n1 * CAST(n2 AS DOUBLE))), 6)
               AS crit_05,
           CAST(dd > 1.36 * sqrt((n1 + CAST(n2 AS DOUBLE)) / (n1 * CAST(n2 AS DOUBLE)))
                AS INT) AS reject_05
    FROM best WHERE rk = 1
    """,
    tags=("experiments", "ks-test", "two-sample", "distribution"),
)
def eval_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov test between the 'view' and
    'click' value distributions: D = max |F1(x) - F2(x)| over the pooled
    support, with the location of the maximum gap and the 5% asymptotic
    verdict (c(0.05) = 1.36) — the distribution-shape test that catches
    what mean-based tests miss (`eval_welch_ttest` compares centers,
    `eval_mannwhitney_u` stochastic order, PSI binned shares; KS is the
    sup-norm on the raw CDFs, no binning choice at all).

    Scale shape: one fact scan collapses to VALUE grain (2-dp fixture
    values — bounded support); both empirical CDFs are cumulative
    flag-sums over that grain in one ordered window (the
    `eval_survival_km` single-subtree device: totals are windows over
    the same frame); the argmax is one more frame-ordered pass.

    Exactness: CDFs are exact-integer ratios; D and the argmax value are
    selected on identical doubles with a value tiebreak."""
    from pyspark.sql import Window

    ev = Tables(spark, sf_dir).events.where(
        F.col("event_type").isin("view", "click")
    )
    g = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c2"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    w0 = Window.partitionBy()
    cum = (
        g.withColumn("a1", F.sum("c1").over(w))
        .withColumn("a2", F.sum("c2").over(w))
        .withColumn("n1", F.sum("c1").over(w0))
        .withColumn("n2", F.sum("c2").over(w0))
    )
    dd = F.abs(
        F.col("a1").cast("double") / F.col("n1")
        - F.col("a2").cast("double") / F.col("n2")
    )
    best = (
        cum.withColumn("dd", dd)
        .withColumn(
            "rk",
            F.row_number().over(Window.orderBy(F.desc("dd"), F.asc("value"))),
        )
        .where(F.col("rk") == 1)
    )
    crit = 1.36 * F.sqrt(
        (F.col("n1") + F.col("n2").cast("double"))
        / (F.col("n1") * F.col("n2").cast("double"))
    )
    return best.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.round("dd", 6).alias("ks_d"),
        F.round("value", 6).alias("at_value"),
        F.round(crit, 6).alias("crit_05"),
        (F.col("dd") > crit).cast("int").alias("reject_05"),
    )


_PERM_B = 64  # Monte-Carlo relabelings; b = -1 is the REAL labeling


@query(
    "eval_permutation_test",
    oracle=f"""
    WITH s AS (
        SELECT event_id, CAST(value AS DECIMAL(12,2)) AS x,
               CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g_real
        FROM events WHERE event_type IN ('view', 'click')
    ),
    fan AS (
        SELECT x,
               CASE WHEN b = -1 THEN g_real
                    ELSE CAST('0x' || substr(md5('perm:' || CAST(b AS VARCHAR)
                              || ':' || CAST(event_id AS VARCHAR)), 1, 8)
                         AS BIGINT) % 2
               END AS g,
               b
        FROM s CROSS JOIN (SELECT unnest(range(-1, {_PERM_B})) AS b)
    ),
    per_b AS (
        SELECT b,
               CAST(SUM(CASE WHEN g = 1 THEN x END) AS DOUBLE)
                   / COUNT(CASE WHEN g = 1 THEN 1 END)
               - CAST(SUM(CASE WHEN g = 0 THEN x END) AS DOUBLE)
                   / COUNT(CASE WHEN g = 0 THEN 1 END) AS diff
        FROM fan GROUP BY b
    ),
    withobs AS (
        SELECT b, diff,
               MAX(CASE WHEN b = -1 THEN abs(diff) END) OVER () AS obs_abs,
               MAX(CASE WHEN b = -1 THEN diff END) OVER () AS obs
        FROM per_b
    )
    SELECT ROUND(obs, 6) AS observed_diff,
           CAST({_PERM_B} AS BIGINT) AS n_permutations,
           CAST(SUM(CASE WHEN b >= 0 AND abs(diff) >= obs_abs
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_as_extreme,
           ROUND((1.0 + SUM(CASE WHEN b >= 0 AND abs(diff) >= obs_abs
                                 THEN 1 ELSE 0 END)) / (1.0 + {_PERM_B}), 6)
               AS p_value
    FROM withobs
    GROUP BY obs, obs_abs
    """,
    tags=("experiments", "permutation-test", "randomization"),
)
def eval_permutation_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed randomization test for the view-vs-click mean
    difference: 64 Monte-Carlo relabelings AND the observed statistic
    computed in ONE corpus pass — each event map-side explodes to 65
    (b, pseudo-group) rows, where b = -1 keeps the real labels and
    b >= 0 reassigns by the salted md5-prefix hash of (b, event_id)
    (the `sample_hash_fraction` device, so both engines draw identical
    relabelings); the two-sided p-value is the add-one-smoothed share of
    relabelings at least as extreme.  This is the assumption-free
    companion to `eval_welch_ttest` (no normality, no variance model) —
    the Bernoulli-relabeling Monte-Carlo variant of Fisher's exact
    randomization (group sizes vary binomially across draws, the
    standard approximation at corpus scale).

    Scale shape: the fan-out is map-side (x65 inside one scan, the
    `dq_iqr_outliers` stack posture); everything after lives at the
    65-row b-grain, where the observed row is a window over the SAME
    frame (single-subtree rule — no second corpus aggregate).

    Exactness: per-b sums are exact DECIMAL (2-dp fixture values); means
    and diffs identical doubles; the verdict counts integers."""
    from pyspark.sql import Window

    ev = Tables(spark, sf_dir).events.where(
        F.col("event_type").isin("view", "click")
    )
    perm_g = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("perm:"),
                        F.col("b").cast("string"),
                        F.lit(":"),
                        F.col("event_id").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    fan = (
        ev.select(
            "event_id",
            F.col("value").cast("decimal(12,2)").alias("x"),
            (F.col("event_type") == "view").cast("int").alias("g_real"),
            F.explode(
                F.array(*[F.lit(b) for b in range(-1, _PERM_B)])
            ).alias("b"),
        )
        .select(
            "x",
            "b",
            F.when(F.col("b") == -1, F.col("g_real"))
            .otherwise(perm_g)
            .alias("g"),
        )
    )
    per_b = fan.groupBy("b").agg(
        (
            F.sum(F.when(F.col("g") == 1, F.col("x"))).cast("double")
            / F.count(F.when(F.col("g") == 1, 1))
            - F.sum(F.when(F.col("g") == 0, F.col("x"))).cast("double")
            / F.count(F.when(F.col("g") == 0, 1))
        ).alias("diff")
    )
    w0 = Window.partitionBy()
    withobs = per_b.withColumn(
        "obs_abs",
        F.max(F.when(F.col("b") == -1, F.abs("diff"))).over(w0),
    ).withColumn("obs", F.max(F.when(F.col("b") == -1, F.col("diff"))).over(w0))
    n_ext = F.sum(
        F.when(
            (F.col("b") >= 0) & (F.abs("diff") >= F.col("obs_abs")), 1
        ).otherwise(0)
    )
    return withobs.groupBy("obs", "obs_abs").agg(
        F.round(F.first("obs"), 6).alias("observed_diff"),
        F.lit(_PERM_B).cast("bigint").alias("n_permutations"),
        n_ext.cast("bigint").alias("n_as_extreme"),
        F.round((1.0 + n_ext) / (1.0 + _PERM_B), 6).alias("p_value"),
    ).drop("obs", "obs_abs").select(
        "observed_diff", "n_permutations", "n_as_extreme", "p_value"
    )


# --- round-10 wave: PR-side ranking evaluation -------------------------------


@query(
    "eval_pr_auc",
    oracle="""
    WITH vg AS (
        SELECT value,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS np_v,
               COUNT(*) AS n_v
        FROM events
        GROUP BY value
    ),
    cum AS (
        SELECT value, np_v, n_v,
               SUM(np_v) OVER (ORDER BY value DESC
                               ROWS UNBOUNDED PRECEDING) AS cum_tp,
               SUM(n_v) OVER (ORDER BY value DESC
                              ROWS UNBOUNDED PRECEDING) AS cum_n
        FROM vg
    ),
    tot AS (
        SELECT CAST(SUM(np_v) AS BIGINT) AS p, CAST(SUM(n_v) AS BIGINT) AS n
        FROM vg
    ),
    terms AS (
        SELECT CAST(SUM(CAST(ROUND(
                   np_v * (CAST(cum_tp AS DOUBLE) / cum_n) / tot.p, 9)
               AS DECIMAL(28,9))) AS DOUBLE) AS pr_auc,
               CAST(COUNT(*) AS BIGINT) AS n_thresholds
        FROM cum CROSS JOIN tot
    )
    SELECT tot.p AS n_pos, tot.n AS n_total, terms.n_thresholds,
           ROUND(terms.pr_auc, 6) AS pr_auc,
           ROUND(CAST(tot.p AS DOUBLE) / tot.n, 6) AS prevalence
    FROM terms CROSS JOIN tot
    """,
    tags=("pipeline", "evaluation", "ranking", "precision-recall"),
)
def eval_pr_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall AUC (tie-grouped step integral / average
    precision) for the same score→label setting as `eval_roc_auc`
    (score = value, positive = purchase): AP = Σ_groups Δtp_g ·
    precision(≥ v_g) / P, the quantity that, unlike ROC-AUC, stays
    informative under class imbalance.

    Exactness contract: all cumulatives are integer window sums at score
    grain; each group's double summand is 9-dp-rounded into
    DECIMAL(28,9) so the cross-group sum is order-insensitive (the
    retrieval_eval_map_mrr contract).

    Scale shape: one groupBy to score grain, then the DESC-ordered
    cumulatives run through `distributed_running_sums` (ordered on the
    negated score) — NO single-partition window at any cardinality,
    the same posture as eval_roc_auc, not merely analogous to it."""
    from auron_spark.operators.window import distributed_running_sums

    t = Tables(spark, sf_dir)
    vg = t.events.groupBy("value").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("np_v"),
        F.count("*").alias("n_v"),
    )
    cum = distributed_running_sums(
        vg.withColumn("neg_v", -F.col("value")), ["neg_v"], ["np_v", "n_v"]
    ).select(
        "np_v",
        F.col("cum_np_v").alias("cum_tp"),
        F.col("cum_n_v").alias("cum_n"),
    )
    tot = vg.agg(
        F.sum("np_v").cast("bigint").alias("p"),
        F.sum("n_v").cast("bigint").alias("n"),
    )
    terms = cum.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            F.round(
                F.col("np_v")
                * (F.col("cum_tp").cast("double") / F.col("cum_n"))
                / F.col("p"),
                9,
            ).cast("decimal(28,9)")
        )
        .cast("double")
        .alias("pr_auc"),
        F.count("*").cast("bigint").alias("n_thresholds"),
        F.first("p").alias("p"),
        F.first("n").alias("n"),
    )
    return terms.select(
        F.col("p").alias("n_pos"),
        F.col("n").alias("n_total"),
        "n_thresholds",
        F.round("pr_auc", 6).alias("pr_auc"),
        F.round(F.col("p").cast("double") / F.col("n"), 6).alias(
            "prevalence"
        ),
    )


@query(
    "eval_cumulative_gains",
    oracle="""
    WITH vg AS (
        SELECT value,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS np_v,
               COUNT(*) AS n_v
        FROM events
        GROUP BY value
    ),
    cum AS (
        SELECT value, np_v, n_v,
               SUM(np_v) OVER (ORDER BY value DESC
                               ROWS UNBOUNDED PRECEDING) AS cum_tp,
               SUM(n_v) OVER (ORDER BY value DESC
                              ROWS UNBOUNDED PRECEDING) AS cum_n
        FROM vg
    ),
    tot AS (
        SELECT CAST(SUM(np_v) AS BIGINT) AS p, CAST(SUM(n_v) AS BIGINT) AS n
        FROM vg
    ),
    dec AS (
        SELECT CAST(CEIL(10.0 * cum_n / tot.n) AS BIGINT) AS decile,
               MAX(cum_tp) AS tp_cum, MAX(cum_n) AS n_cum
        FROM cum CROSS JOIN tot
        GROUP BY decile
    )
    SELECT decile,
           CAST(n_cum AS BIGINT) AS n_cum,
           CAST(tp_cum AS BIGINT) AS tp_cum,
           ROUND(CAST(tp_cum AS DOUBLE) / tot.p, 6) AS gain,
           ROUND((CAST(tp_cum AS DOUBLE) / n_cum)
                 / (CAST(tot.p AS DOUBLE) / tot.n), 6) AS lift
    FROM dec CROSS JOIN tot
    ORDER BY decile
    """,
    tags=("pipeline", "evaluation", "ranking", "lift"),
)
def eval_cumulative_gains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative gains / lift table by score decile for the
    score = value, positive = purchase ranking: each score group lands in
    the decile where its cumulative population ENDS (ceil(10·cum_n/N)),
    so decile assignment needs no per-row global NTILE — only integer
    cumulatives at the bounded score grain.

    Scale shape: one score-grain aggregate; the DESC cumulatives run
    through `distributed_running_sums` on the negated score (no
    single-partition window); the decile regroup touches
    |distinct scores| rows.  The per-row global-NTILE formulation this
    replaces is the classic single-partition scale killer."""
    from auron_spark.operators.window import distributed_running_sums

    t = Tables(spark, sf_dir)
    vg = t.events.groupBy("value").agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("np_v"),
        F.count("*").alias("n_v"),
    )
    cum = distributed_running_sums(
        vg.withColumn("neg_v", -F.col("value")), ["neg_v"], ["np_v", "n_v"]
    ).select(
        F.col("cum_np_v").alias("cum_tp"),
        F.col("cum_n_v").alias("cum_n"),
    )
    tot = vg.agg(
        F.sum("np_v").cast("bigint").alias("p"),
        F.sum("n_v").cast("bigint").alias("n"),
    )
    dec = (
        cum.crossJoin(F.broadcast(tot))
        .groupBy(
            F.ceil(F.lit(10.0) * F.col("cum_n") / F.col("n"))
            .cast("bigint")
            .alias("decile")
        )
        .agg(
            F.max("cum_tp").alias("tp_cum"),
            F.max("cum_n").alias("n_cum"),
            F.first("p").alias("p"),
            F.first("n").alias("n"),
        )
    )
    return dec.select(
        "decile",
        F.col("n_cum").cast("bigint").alias("n_cum"),
        F.col("tp_cum").cast("bigint").alias("tp_cum"),
        F.round(F.col("tp_cum").cast("double") / F.col("p"), 6).alias("gain"),
        F.round(
            (F.col("tp_cum").cast("double") / F.col("n_cum"))
            / (F.col("p").cast("double") / F.col("n")),
            6,
        ).alias("lift"),
    ).orderBy("decile")


_TOST_DELTA = 1.0  # equivalence margin on the value scale (fixture ~[0,100])
_Z_05 = 1.645  # one-sided 5% normal critical value (df in the thousands)


@query(
    "eval_tost_equivalence",
    oracle=f"""
    WITH ps AS (
        SELECT {_sql_pow("purchase", "p")},
               {_sql_pow("click", "c")}
        FROM events
    ),
    d AS (
        SELECT CAST(n_p AS BIGINT) AS n_a, CAST(n_c AS BIGINT) AS n_b,
               s1_p / n_p - s1_c / n_c AS diff,
               sqrt((s2_p - s1_p * s1_p / n_p) / (n_p - 1) / n_p
                    + (s2_c - s1_c * s1_c / n_c) / (n_c - 1) / n_c) AS se
        FROM ps
    )
    SELECT n_a, n_b,
           ROUND(diff, 6) AS diff,
           ROUND(se, 6) AS se,
           ROUND((diff + {_TOST_DELTA}) / se, 6) AS t_lower,
           ROUND((diff - {_TOST_DELTA}) / se, 6) AS t_upper,
           CAST((diff + {_TOST_DELTA}) / se >= {_Z_05}
                AND (diff - {_TOST_DELTA}) / se <= -{_Z_05} AS INT)
               AS equivalent_05
    FROM d
    """,
    tags=("pipeline", "evaluation", "ab-test", "equivalence"),
)
def eval_tost_equivalence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOST equivalence test (two one-sided tests) between the purchase
    and click value means at margin ±1.0 value units: the NON-INFERIORITY
    question a model swap or infra migration actually asks — "is the
    difference provably INSIDE the margin?" — which a nonsignificant
    Welch t cannot answer (absence of evidence is not equivalence).
    Equivalence at 5% requires BOTH one-sided rejections:
    (diff+delta)/se >= z and (diff-delta)/se <= -z (the fixture's arms
    differ by ~2.6, so the verdict is correctly 0 here).

    Exactness and scale shape are `eval_welch_ttest`'s: one conditional-
    aggregation pass to exact DECIMAL power sums, then shared double
    arithmetic on a 1-row frame."""
    ev = Tables(spark, sf_dir).events
    ps = ev.agg(*_pow_sums("purchase"), *_pow_sums("click"))
    n_a, s1_a, s2_a = F.col("n_p"), F.col("s1_p"), F.col("s2_p")
    n_b, s1_b, s2_b = F.col("n_c"), F.col("s1_c"), F.col("s2_c")
    diff = s1_a / n_a - s1_b / n_b
    se = F.sqrt(
        (s2_a - s1_a * s1_a / n_a) / (n_a - 1) / n_a
        + (s2_b - s1_b * s1_b / n_b) / (n_b - 1) / n_b
    )
    d = ps.select(
        n_a.cast("bigint").alias("n_a"),
        n_b.cast("bigint").alias("n_b"),
        diff.alias("diff_raw"),
        se.alias("se_raw"),
    )
    dr, ser = F.col("diff_raw"), F.col("se_raw")
    return d.select(
        "n_a",
        "n_b",
        F.round(dr, 6).alias("diff"),
        F.round(ser, 6).alias("se"),
        F.round((dr + _TOST_DELTA) / ser, 6).alias("t_lower"),
        F.round((dr - _TOST_DELTA) / ser, 6).alias("t_upper"),
        (
            ((dr + _TOST_DELTA) / ser >= _Z_05)
            & ((dr - _TOST_DELTA) / ser <= -_Z_05)
        )
        .cast("int")
        .alias("equivalent_05"),
    )
