"""Model-evaluation operators: the offline metrics a training pipeline
computes over scored datasets (calibration, threshold sweeps) — completing
the eval family alongside `retrieval_eval_ndcg` (ranking),
`sim_ann_recall_report` (retrieval recall) and `sim_pq_distortion_report`
(quantization).

The "model score" is a deterministic logistic transform of the events
`value` column (one `exp` call per row on identical double inputs in both
engines, so the 6-dp rounded outputs agree bit-exactly), and the label is
`event_type = 'purchase'` — a synthetic but fully reproducible scored
dataset, which is exactly what an eval harness needs from a fixture.

Scale shape: both operators are one map-side score projection + one
partial/final aggregate at bin/threshold grain (10 rows) — nothing but the
single fact scan touches corpus-sized data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from auron_spark.exprs import R9_DECIMAL
from auron_spark.registry import query
from auron_spark.tables import Tables

# score = sigmoid((value - 50) / 20); fixture `value` spans ~[0, 100]
_SQL_SCORE = "1.0 / (1.0 + exp(-(value - 50.0) / 20.0))"


def _score() -> F.Column:
    return 1.0 / (1.0 + F.exp(-(F.col("value") - 50.0) / 20.0))


@query(
    "eval_calibration_bins",
    oracle=f"""
    WITH scored AS (
        SELECT {_SQL_SCORE} AS p,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    binned AS (
        SELECT LEAST(CAST(floor(p * 10) AS INT), 9) AS bin, p, y
        FROM scored
    )
    SELECT bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(p) / COUNT(*), 6) AS mean_pred,
           ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS frac_pos,
           ROUND(SUM(p) / COUNT(*)
                 - CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS gap
    FROM binned
    GROUP BY bin
    ORDER BY bin
    """,
    tags=("pipeline", "evaluation", "calibration"),
)
def eval_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram (calibration bins): predictions bucketed into
    10 equal-width probability bins, comparing mean predicted probability
    against the empirical positive rate per bin — the standard
    calibration check (and the input to ECE) run after every model
    training round.  `gap` > 0 reads as over-confidence in that bin.

    Exactness: the bin index is integer floor of p*10 (clamped);
    frac_pos is an exact integer ratio; mean_pred is a double SUM of
    well-conditioned [0,1] addends rounded at 6dp — the same
    sum-then-round contract `agg_stats_moments` proved driver-exact
    across engines."""
    ev = Tables(spark, sf_dir).events
    scored = ev.select(
        _score().alias("p"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    binned = scored.select(
        F.least(F.floor(F.col("p") * 10).cast("int"), F.lit(9)).alias("bin"),
        "p",
        "y",
    )
    return (
        binned.groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.sum("p") / F.count("*"), 6).alias("mean_pred"),
            F.round(
                F.sum("y").cast("double") / F.count("*"), 6
            ).alias("frac_pos"),
            F.round(
                F.sum("p") / F.count("*")
                - F.sum("y").cast("double") / F.count("*"),
                6,
            ).alias("gap"),
        )
        .orderBy("bin")
    )


@query(
    "eval_threshold_sweep",
    oracle=f"""
    WITH scored AS (
        SELECT {_SQL_SCORE} AS p,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    th AS (SELECT unnest(range(1, 10)) / 10.0 AS t),
    cells AS (
        SELECT th.t,
               SUM(CASE WHEN p >= th.t AND y = 1 THEN 1 ELSE 0 END) AS tp,
               SUM(CASE WHEN p >= th.t AND y = 0 THEN 1 ELSE 0 END) AS fp,
               SUM(CASE WHEN p < th.t AND y = 1 THEN 1 ELSE 0 END) AS fn
        FROM scored CROSS JOIN th
        GROUP BY th.t
    )
    SELECT ROUND(t, 1) AS threshold,
           CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
           CAST(fn AS BIGINT) AS fn,
           ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fp, 0), 6) AS precision,
           ROUND(CAST(tp AS DOUBLE) / NULLIF(tp + fn, 0), 6) AS recall,
           ROUND(2.0 * tp / NULLIF(2.0 * tp + fp + fn, 0), 6) AS f1
    FROM cells
    ORDER BY threshold
    """,
    tags=("pipeline", "evaluation", "precision-recall"),
)
def eval_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision / recall / F1 across 9 decision thresholds — the sweep
    behind a PR curve and threshold selection, computed in ONE aggregate
    pass: each scored row joins the broadcast 9-row threshold frame and
    contributes conditional counts, so the confusion matrices for every
    threshold materialize together (vs. 9 separate scans).

    Exactness: all confusion cells are exact integers; the metric ratios
    round at 6dp; thresholds are exact decimals k/10.

    Scale shape: one fact scan × 9 broadcast thresholds (bounded row
    expansion), partial/final aggregate at threshold grain — the same
    one-pass multi-config eval trick `sample_kfold_assignment` uses for
    folds."""
    ev = Tables(spark, sf_dir).events
    scored = ev.select(
        _score().alias("p"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    th = spark.range(1, 10).select((F.col("id") / 10.0).alias("t"))
    cells = (
        scored.join(F.broadcast(th))
        .groupBy("t")
        .agg(
            F.sum(
                F.when((F.col("p") >= F.col("t")) & (F.col("y") == 1), 1)
                .otherwise(0)
            ).alias("tp"),
            F.sum(
                F.when((F.col("p") >= F.col("t")) & (F.col("y") == 0), 1)
                .otherwise(0)
            ).alias("fp"),
            F.sum(
                F.when((F.col("p") < F.col("t")) & (F.col("y") == 1), 1)
                .otherwise(0)
            ).alias("fn"),
        )
    )
    return cells.select(
        F.round("t", 1).alias("threshold"),
        F.col("tp").cast("bigint").alias("tp"),
        F.col("fp").cast("bigint").alias("fp"),
        F.col("fn").cast("bigint").alias("fn"),
        F.round(
            F.col("tp").cast("double")
            / F.nullif(F.col("tp") + F.col("fp"), F.lit(0)),
            6,
        ).alias("precision"),
        F.round(
            F.col("tp").cast("double")
            / F.nullif(F.col("tp") + F.col("fn"), F.lit(0)),
            6,
        ).alias("recall"),
        F.round(
            2.0
            * F.col("tp")
            / F.nullif(2.0 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(0)),
            6,
        ).alias("f1"),
    ).orderBy("threshold")


@query(
    "eval_langid_confusion",
    oracle="""
    WITH pred AS (
        SELECT lang AS lang_label,
               CASE
                 WHEN (len(list_filter(string_split(lower(text), ' '), t -> t = 'the')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'a')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'of'))) >= (len(list_filter(string_split(lower(text), ' '), t -> t = 'der')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'die')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'und'))) AND (len(list_filter(string_split(lower(text), ' '), t -> t = 'the')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'a')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'of'))) >= (len(list_filter(string_split(lower(text), ' '), t -> t = 'le')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'la')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'et'))) AND (len(list_filter(string_split(lower(text), ' '), t -> t = 'the')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'a')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'of'))) >= (len(list_filter(string_split(lower(text), ' '), t -> t = 'el')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'los')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'y'))) THEN 'en'
                 WHEN (len(list_filter(string_split(lower(text), ' '), t -> t = 'der')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'die')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'und'))) >= (len(list_filter(string_split(lower(text), ' '), t -> t = 'le')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'la')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'et'))) AND (len(list_filter(string_split(lower(text), ' '), t -> t = 'der')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'die')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'und'))) >= (len(list_filter(string_split(lower(text), ' '), t -> t = 'el')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'los')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'y'))) THEN 'de'
                 WHEN (len(list_filter(string_split(lower(text), ' '), t -> t = 'le')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'la')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'et'))) >= (len(list_filter(string_split(lower(text), ' '), t -> t = 'el')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'los')) + len(list_filter(string_split(lower(text), ' '), t -> t = 'y'))) THEN 'fr'
                 ELSE 'es'
               END AS lang_pred
        FROM documents
    )
    SELECT lang_label, lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred
    GROUP BY lang_label, lang_pred
    ORDER BY lang_label, lang_pred
    """,
    tags=("pipeline", "evaluation", "lang-id", "confusion-matrix"),
)
def eval_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-word language classifier
    (`text_lang_id`) against the documents table's ground-truth `lang`
    column — the per-class eval every classifier in the curation
    pipeline gets before its threshold is trusted.  Long-form
    (label, pred, count); diagonal sums give accuracy, row-normalizing
    gives per-language recall.

    Scale shape: the classifier is a map-side CASE over per-language
    marker-hit counts; the matrix is one partial/final aggregate at
    |langs|² grain."""
    from auron_spark.pipeline.text import _marker_hits

    t = Tables(spark, sf_dir)
    en, de, fr, es = (_marker_hits(lang) for lang in ("en", "de", "fr", "es"))
    pred = (
        F.when((en >= de) & (en >= fr) & (en >= es), "en")
        .when((de >= fr) & (de >= es), "de")
        .when(fr >= es, "fr")
        .otherwise("es")
    )
    return (
        t.documents.select(
            F.col("lang").alias("lang_label"), pred.alias("lang_pred")
        )
        .groupBy("lang_label", "lang_pred")
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy("lang_label", "lang_pred")
    )


@query(
    "eval_ab_srm_check",
    oracle="""
    WITH assign AS (
        SELECT DISTINCT user_id,
               CASE WHEN CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                             1, 8) AS BIGINT) % 100 < 50
                    THEN 'A' ELSE 'B' END AS arm
        FROM events
    ),
    counts AS (
        SELECT COUNT(*) FILTER (WHERE arm = 'A') AS n_a,
               COUNT(*) FILTER (WHERE arm = 'B') AS n_b
        FROM assign
    )
    SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
           ROUND(CAST(n_a AS DOUBLE) / (n_a + n_b), 6) AS ratio_a,
           ROUND(POWER(CAST(n_a AS DOUBLE) - n_b, 2) / (n_a + n_b), 6)
               AS chi_square,
           POWER(CAST(n_a AS DOUBLE) - n_b, 2) / (n_a + n_b) > 10.828
               AS srm_alert
    FROM counts
    """,
    tags=("eval", "ab-test", "srm", "sampling"),
)
def eval_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check for a deterministic 50/50 A/B hash
    split: assign each user by md5(user_id) % 100, count distinct users
    per arm, and compute the 1-df chi-square against the expected equal
    split (alert at the p<0.001 critical value 10.828).  SRM is the first
    gate of every experimentation pipeline — a biased assignment hash or
    a logging loss invalidates the experiment before any metric is read.

    Scale shape: arm assignment is map-side (one md5); the user-distinct
    collapses by user_id; the final chi-square is a 2-value scalar
    aggregate.  Identical md5-derived assignment in the oracle makes the
    whole check deterministic — the driver hashes the statistic itself."""
    t = Tables(spark, sf_dir)
    arm = F.when(
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 100
        < 50,
        "A",
    ).otherwise("B")
    assign = t.events.select("user_id", arm.alias("arm")).dropDuplicates(
        ["user_id"]
    )
    counts = assign.agg(
        F.count(F.when(F.col("arm") == "A", 1)).alias("n_a"),
        F.count(F.when(F.col("arm") == "B", 1)).alias("n_b"),
    )
    chi = F.pow(F.col("n_a").cast("double") - F.col("n_b"), 2) / (
        F.col("n_a") + F.col("n_b")
    )
    return counts.select(
        F.col("n_a").cast("bigint").alias("n_a"),
        F.col("n_b").cast("bigint").alias("n_b"),
        F.round(
            F.col("n_a").cast("double") / (F.col("n_a") + F.col("n_b")), 6
        ).alias("ratio_a"),
        F.round(chi, 6).alias("chi_square"),
        (chi > 10.828).alias("srm_alert"),
    )


# --- bootstrap confidence interval ----------------------------------------

from auron_spark.pipeline.sampling import (  # noqa: E402
    _pois1_weight,
    _sql_bucket,
    _sql_pois1,
    hash_bucket,
)

_N_REPS = 32  # bootstrap replicates; ranks 2 and 31 bracket ~a 90% CI


@query(
    "eval_bootstrap_ci",
    oracle=f"""
    WITH draws AS (
        SELECT r.r,
               CAST(o.o_totalprice AS DECIMAL(18,2)) AS price,
               {_sql_pois1(_sql_bucket("o.o_orderkey || ':' || r.r",
                                       1_000_000))} AS w
        FROM orders o CROSS JOIN (SELECT unnest(range(0, {_N_REPS})) AS r) r
    ),
    rep_means AS (
        SELECT r,
               ROUND(CAST(SUM(w * price) AS DOUBLE) / SUM(w), 6) AS m
        FROM draws GROUP BY r
    ),
    ranked AS (
        SELECT m, ROW_NUMBER() OVER (ORDER BY m, r) AS rn FROM rep_means
    ),
    point AS (
        SELECT ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                     / COUNT(*), 6) AS point_mean
        FROM orders
    )
    SELECT CAST({_N_REPS} AS INT) AS n_replicates,
           point.point_mean,
           MIN(CASE WHEN rn = 2 THEN m END) AS boot_lo,
           MIN(CASE WHEN rn = {_N_REPS - 1} THEN m END) AS boot_hi,
           ROUND(MIN(CASE WHEN rn = {_N_REPS - 1} THEN m END)
                 - MIN(CASE WHEN rn = 2 THEN m END), 6) AS ci_width
    FROM ranked CROSS JOIN point
    GROUP BY point.point_mean
    """,
    tags=("pipeline", "evaluation", "bootstrap", "uncertainty"),
)
def eval_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile-method bootstrap confidence interval for a corpus metric
    (mean order value), built on the Poisson-bootstrap draw
    `sample_poisson_bootstrap` proved driver-exact: 32 replicates each
    reweight every order by an independent deterministic Poisson(1) draw,
    the replicate means are order-ranked, and ranks 2/31 of 32 bracket
    ~a 90% CI.  This is the uncertainty attachment step of a metrics
    pipeline — the spread IS the sampling error, with no closed-form
    variance assumption.

    Exactness: replicate means are exact DECIMAL sums over integer
    weights divided once and rounded at 6dp; ranking 32 such rounded
    doubles (replicate-id tiebreak) is engine-independent; the point
    estimate is the proven DECIMAL-sum mean.

    Scale shape: a constant x32 broadcast row expansion with map-side
    CASE draws, one partial/final aggregate at replicate grain, then a
    32-row (constant, model-state-sized) rank — the corpus is scanned
    once and never reshuffled or resampled into copies."""
    t = Tables(spark, sf_dir)
    reps = spark.range(_N_REPS).select(F.col("id").alias("r"))
    u = hash_bucket(
        F.concat(
            F.col("o_orderkey").cast("string"),
            F.lit(":"),
            F.col("r").cast("string"),
        ),
        1_000_000,
    )
    draws = (
        t.orders.select(
            "o_orderkey", F.col("o_totalprice").cast("decimal(18,2)").alias("price")
        )
        .join(F.broadcast(reps))
        .select("r", "price", _pois1_weight(u).alias("w"))
    )
    rep_means = draws.groupBy("r").agg(
        F.round(
            F.sum(F.col("w") * F.col("price")).cast("double") / F.sum("w"), 6
        ).alias("m")
    )
    from pyspark.sql import Window

    # 32 rows — constant model-state scale, same contract as the
    # per-partition offset collects in `distributed_ntile`.
    ranked = rep_means.withColumn(
        "rn", F.row_number().over(Window.orderBy("m", "r"))
    )
    point = t.orders.agg(
        F.round(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count("*"),
            6,
        ).alias("point_mean")
    )
    return (
        ranked.join(F.broadcast(point))
        .groupBy("point_mean")
        .agg(
            F.min(F.when(F.col("rn") == 2, F.col("m"))).alias("boot_lo"),
            F.min(
                F.when(F.col("rn") == _N_REPS - 1, F.col("m"))
            ).alias("boot_hi"),
        )
        .select(
            F.lit(_N_REPS).cast("int").alias("n_replicates"),
            "point_mean",
            "boot_lo",
            "boot_hi",
            F.round(F.col("boot_hi") - F.col("boot_lo"), 6).alias("ci_width"),
        )
    )


# --- nonparametric two-sample tests ---------------------------------------

# Shared value-grain scaffold: compare the `value` distribution between
# purchase (group A) and click (group B) events.  Collapsing to value grain
# FIRST makes every downstream statistic a function of exact integer counts,
# and the global cumulative runs over |distinct values| rows via the
# distributed prefix-sum — never a per-row single-partition window.
_SQL_VALUE_GRAIN = """
    SELECT value,
           SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS na_v,
           SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS nb_v,
           COUNT(*) AS n_v
    FROM events
    WHERE event_type IN ('purchase', 'click')
    GROUP BY value
"""


def _value_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = Tables(spark, sf_dir).events
    return (
        ev.where(F.col("event_type").isin("purchase", "click"))
        .groupBy("value")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("na_v"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("nb_v"),
            F.count("*").alias("n_v"),
        )
    )


@query(
    "eval_mannwhitney_u",
    oracle=f"""
    WITH vg AS ({_SQL_VALUE_GRAIN}),
    cum AS (
        SELECT value, na_v, nb_v, n_v,
               SUM(n_v) OVER (ORDER BY value
                              ROWS UNBOUNDED PRECEDING) - n_v AS cum_before
        FROM vg
    ),
    tot AS (
        SELECT CAST(SUM(na_v) AS BIGINT) AS na,
               CAST(SUM(nb_v) AS BIGINT) AS nb,
               CAST(SUM(n_v) AS BIGINT) AS n,
               SUM(CAST(n_v AS DOUBLE) * n_v * n_v - n_v) AS tie_term
        FROM vg
    ),
    rs AS (
        SELECT SUM(na_v * (cum_before + (n_v + 1) / 2.0)) AS ra FROM cum
    )
    SELECT na, nb,
           ROUND(ra - na * (na + 1) / 2.0, 1) AS u_a,
           ROUND(na * nb / 2.0, 1) AS mu,
           ROUND((ra - na * (na + 1) / 2.0 - na * nb / 2.0)
                 / sqrt(na * CAST(nb AS DOUBLE) / 12.0
                        * ((n + 1) - tie_term / (n * (n - 1.0)))), 6) AS z
    FROM rs CROSS JOIN tot
    """,
    tags=("pipeline", "evaluation", "ab-test", "nonparametric"),
)
def eval_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) two-sample test — the
    nonparametric A/B significance test run when metric distributions are
    skewed (most revenue/latency metrics): ranks purchase vs click event
    values jointly, with midranks for ties and the tie-corrected normal
    approximation for z.

    Exactness: collapsing to value grain first makes the rank sum
    SUM(na_v * (cum_before + (n_v+1)/2)) — every term an exact
    integer-or-half (midranks), so ra/U/mu are exact doubles; the tie
    term and z are deterministic double expressions over exact integer
    inputs, rounded at 6dp.

    Scale shape: one value-grain aggregate collapses the fact; the ONLY
    global ordering runs at distinct-value grain through
    `distributed_running_sums` (range repartition + parallel `_pid`
    windows + 32 broadcast offsets — `distributed_ntile`'s prefix-sum
    twin), so no single-partition window exists at ANY cardinality; the
    final statistics are scalar aggregates."""
    from auron_spark.operators.window import distributed_running_sums

    vg = _value_grain(spark, sf_dir)
    cum = distributed_running_sums(vg, ["value"], ["n_v"]).withColumn(
        "cum_before", F.col("cum_n_v") - F.col("n_v")
    )
    tot = vg.agg(
        F.sum("na_v").cast("bigint").alias("na"),
        F.sum("nb_v").cast("bigint").alias("nb"),
        F.sum("n_v").cast("bigint").alias("n"),
        F.sum(
            F.col("n_v").cast("double") * F.col("n_v") * F.col("n_v")
            - F.col("n_v")
        ).alias("tie_term"),
    )
    rs = cum.agg(
        F.sum(
            F.col("na_v") * (F.col("cum_before") + (F.col("n_v") + 1) / 2.0)
        ).alias("ra")
    )
    ua = F.col("ra") - F.col("na") * (F.col("na") + 1) / 2.0
    mu = F.col("na") * F.col("nb") / 2.0
    sigma = F.sqrt(
        F.col("na") * F.col("nb").cast("double") / 12.0
        * (
            (F.col("n") + 1)
            - F.col("tie_term") / (F.col("n") * (F.col("n") - 1.0))
        )
    )
    return rs.join(F.broadcast(tot)).select(
        "na",
        "nb",
        F.round(ua, 1).alias("u_a"),
        F.round(mu, 1).alias("mu"),
        F.round((ua - mu) / sigma, 6).alias("z"),
    )


#: KS critical coefficient at alpha=0.05 (two-sided): c(alpha)=1.358.
_KS_C05 = 1.358


@query(
    "eval_ks_test",
    oracle=f"""
    WITH vg AS ({_SQL_VALUE_GRAIN}),
    tot AS (
        SELECT CAST(SUM(na_v) AS BIGINT) AS na,
               CAST(SUM(nb_v) AS BIGINT) AS nb
        FROM vg
    ),
    cum AS (
        SELECT value,
               SUM(na_v) OVER (ORDER BY value
                               ROWS UNBOUNDED PRECEDING) AS cum_na,
               SUM(nb_v) OVER (ORDER BY value
                               ROWS UNBOUNDED PRECEDING) AS cum_nb
        FROM vg
    ),
    gaps AS (
        SELECT value,
               abs(CAST(cum_na AS DOUBLE) / na
                   - CAST(cum_nb AS DOUBLE) / nb) AS gap
        FROM cum CROSS JOIN tot
    ),
    best AS (
        SELECT value AS d_at, gap FROM gaps
        ORDER BY gap DESC, value ASC LIMIT 1
    )
    SELECT na, nb,
           ROUND(gap, 6) AS d_stat,
           d_at,
           ROUND({_KS_C05} * sqrt((na + CAST(nb AS DOUBLE)) / (na * CAST(nb AS DOUBLE))), 6)
               AS d_crit_05,
           CAST(gap > {_KS_C05} * sqrt((na + CAST(nb AS DOUBLE)) / (na * CAST(nb AS DOUBLE)))
               AS INT) AS reject_05
    FROM best CROSS JOIN tot
    """,
    tags=("pipeline", "evaluation", "ab-test", "nonparametric"),
)
def eval_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test: D = max |F_a(v) - F_b(v)| over
    the joint support, with the alpha=0.05 critical value — the
    distribution-shift detector (did the metric's whole shape move, not
    just its mean?) that complements `eval_mannwhitney_u` (location) and
    `dq_psi_drift` (binned population drift).

    Exactness: both empirical CDFs are exact rationals cum/n evaluated as
    single divisions of exact longs — deterministic doubles, so the max
    gap and its argmax (value tiebreak) agree across engines; D and the
    critical value round at 6dp.

    Scale shape: identical to the U test — value-grain collapse, the
    global CDF cumulative via `distributed_running_sums` (no
    single-partition window), and a TakeOrderedAndProject(1) for the
    argmax instead of a global sort."""
    from auron_spark.operators.window import distributed_running_sums

    vg = _value_grain(spark, sf_dir)
    tot = vg.agg(
        F.sum("na_v").cast("bigint").alias("na"),
        F.sum("nb_v").cast("bigint").alias("nb"),
    )
    cum = distributed_running_sums(vg, ["value"], ["na_v", "nb_v"])
    gaps = cum.join(F.broadcast(tot)).select(
        "value",
        "na",
        "nb",
        F.abs(
            F.col("cum_na_v").cast("double") / F.col("na")
            - F.col("cum_nb_v").cast("double") / F.col("nb")
        ).alias("gap"),
    )
    best = gaps.orderBy(F.desc("gap"), F.asc("value")).limit(1)
    crit = F.lit(_KS_C05) * F.sqrt(
        (F.col("na") + F.col("nb").cast("double"))
        / (F.col("na") * F.col("nb").cast("double"))
    )
    return best.select(
        "na",
        "nb",
        F.round("gap", 6).alias("d_stat"),
        F.col("value").alias("d_at"),
        F.round(crit, 6).alias("d_crit_05"),
        (F.col("gap") > crit).cast("int").alias("reject_05"),
    )


# --- survival analysis -----------------------------------------------------

_CHURN_MONTHS = 6  # inactive this long before corpus end = churned (event)


@query(
    "eval_survival_km",
    oracle=f"""
    WITH idx AS (
        SELECT o_custkey,
               MIN(EXTRACT(year FROM o_orderdate) * 12
                   + EXTRACT(month FROM o_orderdate)) AS first_m,
               MAX(EXTRACT(year FROM o_orderdate) * 12
                   + EXTRACT(month FROM o_orderdate)) AS last_m
        FROM orders GROUP BY o_custkey
    ),
    mx AS (
        SELECT MAX(EXTRACT(year FROM o_orderdate) * 12
                   + EXTRACT(month FROM o_orderdate)) AS corpus_m
        FROM orders
    ),
    life AS (
        SELECT last_m - first_m AS t,
               CASE WHEN corpus_m - last_m >= {_CHURN_MONTHS}
                    THEN 1 ELSE 0 END AS churned
        FROM idx CROSS JOIN mx
    ),
    tot AS (SELECT COUNT(*) AS n FROM life),
    grain AS (
        SELECT t, SUM(churned) AS d, COUNT(*) AS c FROM life GROUP BY t
    ),
    cum AS (
        SELECT t, d,
               SUM(c) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) - c
                   AS before
        FROM grain
    )
    SELECT CAST(t AS INT) AS t_months,
           CAST(d AS BIGINT) AS n_churned,
           CAST(n - before AS BIGINT) AS n_at_risk,
           ROUND(exp(SUM(ln(1.0 - CAST(d AS DOUBLE) / (n - before)))
                     OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)), 6)
               AS survival
    FROM cum CROSS JOIN tot
    WHERE d > 0
    ORDER BY t_months
    """,
    tags=("pipeline", "evaluation", "survival", "churn"),
)
def eval_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve with right-censoring — the churn
    analysis every subscription/retention team runs: a customer's
    "lifetime" is months between first and last order, the churn EVENT is
    >= 6 months of inactivity before corpus end, still-active customers
    are CENSORED (they leave the at-risk pool without counting as
    deaths), and S(t) = prod over death times (1 - d_i/n_i).  Completes
    the retention family (`cohort_retention` observes raw rates;
    KM is the estimator that handles censoring correctly).

    Exactness: lifetimes stay in integer month-index space (the
    `sql_recursive_date_spine` convention — no date_diff dialect
    exposure); d/n are exact integers; the running product is computed
    in log space by a FRAME-ORDERED running sum — a sequential fold with
    identical addend order in both engines — then exp + round(6).

    Scale shape: ONE fact scan — the corpus collapses to customer grain
    and immediately to (lifetime, last-month) CELL grain (calendar-
    bounded: <= span^2 cells, ~6400 rows — the
    `timeseries_trend_decompose` contract); the corpus-end month is then
    max(last_m) OVER the cell frame and the at-risk total a window sum
    over the lifetime frame, so neither scalar re-derives the fact
    subtree (the pre-r9 form built mx / tot / grain as separate
    aggregates — four compiled scans, round-9 plan sweep).  The only
    unpartitioned windows run over bounded month-grain relations."""
    from pyspark.sql import Window

    o = Tables(spark, sf_dir).orders
    midx = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    cells = (
        o.groupBy("o_custkey")
        .agg(F.min(midx).alias("first_m"), F.max(midx).alias("last_m"))
        .groupBy(
            (F.col("last_m") - F.col("first_m")).alias("t"), "last_m"
        )
        .agg(F.count("*").alias("c"))
    )
    w0 = Window.partitionBy()
    cells = cells.withColumn("corpus_m", F.max("last_m").over(w0))
    churned_cell = (
        F.col("corpus_m") - F.col("last_m") >= _CHURN_MONTHS
    ).cast("int")
    grain = cells.groupBy("t").agg(
        F.sum(churned_cell * F.col("c")).alias("d"),
        F.sum("c").alias("c"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = grain.withColumn("before", F.sum("c").over(w) - F.col("c")).withColumn(
        "n", F.sum("c").over(w0)
    )
    km = (
        cum.where(F.col("d") > 0)
        .withColumn("at_risk", F.col("n") - F.col("before"))
        .withColumn(
            "survival",
            F.round(
                F.exp(
                    F.sum(
                        F.log(
                            1.0 - F.col("d").cast("double") / F.col("at_risk")
                        )
                    ).over(w)
                ),
                6,
            ),
        )
    )
    return km.select(
        F.col("t").cast("int").alias("t_months"),
        F.col("d").cast("bigint").alias("n_churned"),
        F.col("at_risk").cast("bigint").alias("n_at_risk"),
        "survival",
    ).orderBy("t_months")


@query(
    "eval_survival_logrank",
    oracle=f"""
    WITH idx AS (
        SELECT o_custkey,
               MIN(EXTRACT(year FROM o_orderdate) * 12
                   + EXTRACT(month FROM o_orderdate)) AS first_m,
               MAX(EXTRACT(year FROM o_orderdate) * 12
                   + EXTRACT(month FROM o_orderdate)) AS last_m
        FROM orders GROUP BY o_custkey
    ),
    mx AS (
        SELECT MAX(EXTRACT(year FROM o_orderdate) * 12
                   + EXTRACT(month FROM o_orderdate)) AS corpus_m
        FROM orders
    ),
    life AS (
        SELECT CASE WHEN c.c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS g,
               last_m - first_m AS t,
               CASE WHEN corpus_m - last_m >= {_CHURN_MONTHS}
                    THEN 1 ELSE 0 END AS churned
        FROM idx JOIN customer c ON c.c_custkey = idx.o_custkey
        CROSS JOIN mx
    ),
    grain AS (
        SELECT t, SUM(churned) AS d, COUNT(*) AS c,
               SUM(CASE WHEN g = 1 THEN churned ELSE 0 END) AS d1,
               SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS c1
        FROM life GROUP BY t
    ),
    cum AS (
        SELECT t, d, d1,
               SUM(c) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) - c
                   AS before,
               SUM(c1) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) - c1
                   AS before1
        FROM grain
    ),
    tot AS (
        SELECT COUNT(*) AS n,
               SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS n1tot
        FROM life
    ),
    terms AS (
        SELECT t, d, d1, n - before AS ni, n1tot - before1 AS n1i
        FROM cum CROSS JOIN tot
        WHERE d > 0 AND n - before > 1
    ),
    run AS (
        SELECT t,
               SUM(d1) OVER w AS o1,
               SUM(CAST(n1i AS DOUBLE) * d / ni) OVER w AS e1,
               SUM(CAST(n1i AS DOUBLE) / ni * (1.0 - CAST(n1i AS DOUBLE) / ni)
                   * d * (ni - d) / (ni - 1)) OVER w AS v
        FROM terms
        WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)
    )
    SELECT CAST(o1 AS BIGINT) AS observed_1,
           ROUND(e1, 6) AS expected_1,
           ROUND(v, 6) AS variance,
           ROUND(pow(o1 - e1, 2) / v, 6) AS chi_square,
           CAST(CASE WHEN pow(o1 - e1, 2) / v > 3.841 THEN 1 ELSE 0 END
               AS INT) AS reject_05
    FROM run ORDER BY t DESC LIMIT 1
    """,
    tags=("pipeline", "evaluation", "survival", "ab-test"),
)
def eval_survival_logrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log-rank test — does one customer segment (BUILDING) churn at a
    different rate than the rest?  The survival-curve companion to
    `eval_survival_km`: at every death time, group 1's expected deaths
    under the null are n1_i*d_i/n_i with the hypergeometric variance;
    chi-square = (O-E)^2/V against the 1-df 5% critical value 3.841.
    This is how churn A/B tests are read when lifetimes are censored —
    `eval_mannwhitney_u` cannot handle censoring, KM + log-rank can.

    Exactness: all inputs are exact integers at lifetime grain; the O/E/V
    accumulations are FRAME-ORDERED running sums (identical sequential
    addend order in both engines — stronger than relying on SUM
    round-stability), with the final row selected by the total order.

    Scale shape: ONE fact scan + the customer-dim join — the corpus
    collapses to customer grain and immediately to (lifetime, last-month,
    group) CELL grain (calendar-bounded, the `eval_survival_km`
    single-subtree shape); corpus-end month and the at-risk totals come
    from windows over that bounded frame, so no scalar re-derives the
    fact subtree."""
    from pyspark.sql import Window

    o = Tables(spark, sf_dir).orders
    cust = Tables(spark, sf_dir).customer
    midx = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    idx = o.groupBy("o_custkey").agg(
        F.min(midx).alias("first_m"), F.max(midx).alias("last_m")
    )
    cells = (
        idx.join(cust, idx["o_custkey"] == cust["c_custkey"])
        .groupBy(
            (F.col("last_m") - F.col("first_m")).alias("t"),
            "last_m",
            (F.col("c_mktsegment") == "BUILDING").cast("int").alias("g"),
        )
        .agg(F.count("*").alias("nc"))
    )
    w0 = Window.partitionBy()
    cells = cells.withColumn("corpus_m", F.max("last_m").over(w0))
    churned_cell = (
        F.col("corpus_m") - F.col("last_m") >= _CHURN_MONTHS
    ).cast("int")
    grain = cells.groupBy("t").agg(
        F.sum(churned_cell * F.col("nc")).alias("d"),
        F.sum("nc").alias("c"),
        F.sum(churned_cell * F.col("g") * F.col("nc")).alias("d1"),
        F.sum(F.col("g") * F.col("nc")).alias("c1"),
    )
    w = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        grain.withColumn("before", F.sum("c").over(w) - F.col("c"))
        .withColumn("before1", F.sum("c1").over(w) - F.col("c1"))
        .withColumn("n", F.sum("c").over(w0))
        .withColumn("n1tot", F.sum("c1").over(w0))
    )
    terms = (
        cum.where((F.col("d") > 0) & (F.col("n") - F.col("before") > 1))
        .select(
            "t",
            "d",
            "d1",
            (F.col("n") - F.col("before")).alias("ni"),
            (F.col("n1tot") - F.col("before1")).alias("n1i"),
        )
    )
    frac = F.col("n1i").cast("double") / F.col("ni")
    run = terms.select(
        "t",
        F.sum("d1").over(w).alias("o1"),
        F.sum(frac * F.col("d")).over(w).alias("e1"),
        F.sum(
            frac * (1.0 - frac) * F.col("d") * (F.col("ni") - F.col("d"))
            / (F.col("ni") - 1)
        ).over(w).alias("v"),
    )
    chi = F.pow(F.col("o1") - F.col("e1"), 2) / F.col("v")
    return (
        run.orderBy(F.desc("t"))
        .limit(1)
        .select(
            F.col("o1").cast("bigint").alias("observed_1"),
            F.round("e1", 6).alias("expected_1"),
            F.round("v", 6).alias("variance"),
            F.round(chi, 6).alias("chi_square"),
            (chi > 3.841).cast("int").alias("reject_05"),
        )
    )

# ---------------------------------------------------------------------------
# Paired-classifier agreement: Cohen's kappa and McNemar's test over two
# deterministic rule "raters" on the documents table (a length rater on
# n_chars and a token rater on whitespace word count — the label-audit step
# before any quality-classifier distillation run).  Both statistics are pure
# integer-ratio arithmetic on a 2x2 contingency per language, so the outputs
# are bit-exact across engines with no transcendental involved.

_RATER_A_SQL = "CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END"
_RATER_B_SQL = "CASE WHEN len(string_split(text, ' ')) >= 55 THEN 1 ELSE 0 END"


def _raters() -> tuple[F.Column, F.Column]:
    a = F.when(F.col("n_chars") >= 300, 1).otherwise(0)
    b = F.when(F.size(F.split(F.col("text"), " ")) >= 55, 1).otherwise(0)
    return a, b


_SQL_PAIR_CELLS = f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) FILTER (WHERE ra = 1 AND rb = 1) AS BIGINT) AS n11,
           CAST(COUNT(*) FILTER (WHERE ra = 1 AND rb = 0) AS BIGINT) AS n10,
           CAST(COUNT(*) FILTER (WHERE ra = 0 AND rb = 1) AS BIGINT) AS n01,
           CAST(COUNT(*) FILTER (WHERE ra = 0 AND rb = 0) AS BIGINT) AS n00
    FROM (SELECT lang, {_RATER_A_SQL} AS ra, {_RATER_B_SQL} AS rb
          FROM documents)
    GROUP BY lang
"""


def _pair_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    ra, rb = _raters()
    d = t.parallel("documents", "doc_id").select(
        "lang", ra.alias("ra"), rb.alias("rb")
    )
    cell = lambda a, b: F.count(  # noqa: E731
        F.when((F.col("ra") == a) & (F.col("rb") == b), 1)
    ).cast("bigint")
    return d.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n"),
        cell(1, 1).alias("n11"),
        cell(1, 0).alias("n10"),
        cell(0, 1).alias("n01"),
        cell(0, 0).alias("n00"),
    )


@query(
    "eval_cohens_kappa",
    oracle=f"""
    WITH cells AS ({_SQL_PAIR_CELLS})
    SELECT lang, n, n11, n10, n01, n00,
           ROUND(CAST(n11 + n00 AS DOUBLE) / n, 6) AS po,
           ROUND((CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                  + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                 / (CAST(n AS DOUBLE) * n), 6) AS pe,
           ROUND((CAST(n11 + n00 AS DOUBLE) / n
                  - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                     + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                    / (CAST(n AS DOUBLE) * n))
                 / (1.0 - (CAST(n11 + n10 AS DOUBLE) * (n11 + n01)
                           + CAST(n01 + n00 AS DOUBLE) * (n10 + n00))
                          / (CAST(n AS DOUBLE) * n)), 6) AS kappa
    FROM cells
    ORDER BY lang
    """,
    tags=("pipeline", "evaluation", "agreement"),
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa per language between two deterministic document
    raters (n_chars >= 300 vs word-count >= 55): chance-corrected
    inter-annotator agreement, the label-quality audit run before any
    rater's output is trusted as training signal.  kappa = (po - pe) /
    (1 - pe) over the 2x2 agreement table.

    Scale shape: one documents scan collapses map-side to a 2x2 contingency
    per language (5 x 4 integers) — the partial/final aggregate ships
    constant state per group regardless of corpus size; the statistic is
    integer-ratio arithmetic on the group frame, bit-exact by construction
    (no transcendental, no FP summation order)."""
    cells = _pair_cells(spark, sf_dir)
    n, n11, n10, n01, n00 = (
        F.col("n").cast("double"),
        F.col("n11"),
        F.col("n10"),
        F.col("n01"),
        F.col("n00"),
    )
    po = (n11 + n00).cast("double") / n
    pe = (
        (n11 + n10).cast("double") * (n11 + n01)
        + (n01 + n00).cast("double") * (n10 + n00)
    ) / (n * n)
    return cells.select(
        "lang", "n", "n11", "n10", "n01", "n00",
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.round((po - pe) / (1.0 - pe), 6).alias("kappa"),
    ).orderBy("lang")


@query(
    "eval_mcnemar_test",
    oracle=f"""
    WITH cells AS ({_SQL_PAIR_CELLS})
    SELECT lang, n10 AS b, n01 AS c,
           ROUND(CAST((n10 - n01) * (n10 - n01) AS DOUBLE)
                 / (n10 + n01), 6) AS chi2,
           ROUND((abs(CAST(n10 - n01 AS DOUBLE)) - 1.0)
                 * (abs(CAST(n10 - n01 AS DOUBLE)) - 1.0)
                 / (n10 + n01), 6) AS chi2_cc
    FROM cells
    WHERE n10 + n01 > 0
    ORDER BY lang
    """,
    tags=("pipeline", "evaluation", "agreement"),
)
def eval_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNemar's paired test per language over the same two document
    raters: do the raters disagree SYMMETRICALLY?  chi2 = (b - c)^2 /
    (b + c) on the discordant cells (plus the Edwards continuity-corrected
    variant) — the standard A/B test for two classifiers scored on the
    same examples, where the concordant cells carry no information.

    Scale shape: identical to `eval_cohens_kappa` — one scan, map-side 2x2
    reduction per group, integer-exact statistic arithmetic on the
    5-row frame."""
    cells = _pair_cells(spark, sf_dir)
    diff = (F.col("n10") - F.col("n01")).cast("double")
    denom = (F.col("n10") + F.col("n01")).cast("double")
    return (
        cells.filter(F.col("n10") + F.col("n01") > 0)
        .select(
            "lang",
            F.col("n10").alias("b"),
            F.col("n01").alias("c"),
            F.round(diff * diff / denom, 6).alias("chi2"),
            F.round(
                (F.abs(diff) - 1.0) * (F.abs(diff) - 1.0) / denom, 6
            ).alias("chi2_cc"),
        )
        .orderBy("lang")
    )

# ---------------------------------------------------------------------------
# Bradley-Terry preference-strength fitting (MM algorithm) — the pairwise
# preference / reward-model primitive: every user's per-type value totals
# stage 10 duels, the corpus reduces to a k x k win matrix, and two
# minorization-maximization steps fit the strengths.  Division-only
# arithmetic (no transcendental), so with the ROUND->DECIMAL summation
# contract both engines agree bit-exactly.

_BT_ROUND9 = "CAST(SUM(CAST(ROUND({t}, 9) AS DECIMAL(28,9))) AS DOUBLE)"
_BT_ROUND9_WIN = "CAST(SUM(CAST(ROUND({t}, 9) AS DECIMAL(28,9))) OVER () AS DOUBLE)"


@query(
    "eval_bradley_terry",
    oracle=f"""
    WITH ut AS (
        SELECT user_id, event_type,
               SUM(CAST(value AS DECIMAL(12,2))) AS v
        FROM events GROUP BY user_id, event_type
    ),
    duels AS (
        SELECT a.event_type AS i, b.event_type AS j,
               COUNT(*) AS n,
               SUM(CASE WHEN a.v > b.v THEN 1 ELSE 0 END) AS w
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        WHERE a.v <> b.v
        GROUP BY a.event_type, b.event_type
    ),
    edges AS (
        SELECT i, j, n, w FROM duels
        UNION ALL
        SELECT j AS i, i AS j, n, n - w AS w FROM duels
    ),
    it1 AS (
        SELECT i, CAST(SUM(w) AS BIGINT) AS wins,
               CAST(SUM(n) AS BIGINT) AS matches,
               CAST(SUM(w) AS DOUBLE)
               / (CAST(SUM(n) AS DOUBLE) / 2.0) AS raw
        FROM edges GROUP BY i
    ),
    pi1 AS (
        SELECT i, wins, matches,
               raw / {_BT_ROUND9_WIN.format(t="raw")} AS pi
        FROM it1
    ),
    d2 AS (
        SELECT e.i,
               {_BT_ROUND9.format(t="CAST(e.n AS DOUBLE) / (a.pi + b.pi)")}
                   AS d
        FROM edges e
        JOIN pi1 a ON a.i = e.i
        JOIN pi1 b ON b.i = e.j
        GROUP BY e.i
    ),
    it2 AS (
        SELECT p.i, p.wins, p.matches,
               CAST(p.wins AS DOUBLE) / d.d AS raw
        FROM pi1 p JOIN d2 d ON d.i = p.i
    )
    SELECT i AS event_type, matches AS n_matches, wins,
           ROUND(raw / {_BT_ROUND9_WIN.format(t="raw")}, 6) AS pi,
           CAST(ROW_NUMBER() OVER (ORDER BY raw DESC, i)
                AS BIGINT) AS rnk
    FROM it2
    ORDER BY rnk
    """,
    tags=("pipeline", "evaluation", "preference", "ranking"),
)
def eval_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry preference strengths over the five event types, fit
    with TWO minorization-maximization steps from uniform strengths — the
    pairwise-preference primitive under reward models and ranking
    aggregation.  Each user's per-type value totals stage the duels (10
    per user, ties dropped), so the corpus collapses to a k x k win
    matrix in one user-co-located self-join + aggregate; every MM step is
    then arithmetic on the k-row frame: pi_i <- W_i / sum_j n_ij /
    (pi_i + pi_j), renormalized to sum 1.

    Exactness: division-only (no transcendental); the k-row sums ride the
    ROUND(.,9) -> DECIMAL order-free contract, and normalizers are
    unpartitioned window sums over the k-row frame (single-subtree, no
    crossJoin).  Cross-checked against a numpy MM prototype.

    Scale shape: the user x type aggregate and the duel self-join are
    both keyed on user_id (co-located, no skew — every user stages at
    most C(k,2) duels); the win matrix is k^2 partial-agg state; MM
    iterations touch only k-row frames, so fitting to convergence never
    rescans the corpus."""
    t = Tables(spark, sf_dir)
    ut = t.events.groupBy("user_id", "event_type").agg(
        F.sum(F.col("value").cast("decimal(12,2)")).alias("v")
    )
    a, b = ut.alias("a"), ut.alias("b")
    duels = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .where(F.col("a.v") != F.col("b.v"))
        .groupBy(
            F.col("a.event_type").alias("i"),
            F.col("b.event_type").alias("j"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(F.col("a.v") > F.col("b.v"), 1).otherwise(0)
            ).alias("w"),
        )
        .localCheckpoint(eager=False)
    )
    edges = duels.union(
        duels.selectExpr("j AS i", "i AS j", "n", "n - w AS w")
    )
    it1 = edges.groupBy("i").agg(
        F.expr("CAST(SUM(w) AS BIGINT)").alias("wins"),
        F.expr("CAST(SUM(n) AS BIGINT)").alias("matches"),
        F.expr(
            "CAST(SUM(w) AS DOUBLE) / (CAST(SUM(n) AS DOUBLE) / 2.0)"
        ).alias("raw"),
    )
    w_all = Window.partitionBy()
    norm = lambda: (  # noqa: E731
        F.sum(F.round(F.col("raw"), 9).cast("decimal(28,9)"))
        .over(w_all)
        .cast("double")
    )
    pi1 = it1.select(
        "i", "wins", "matches", (F.col("raw") / norm()).alias("pi")
    ).localCheckpoint(eager=False)
    e = edges.alias("e")
    d2 = (
        e.join(pi1.select("i", "pi").alias("pa"), F.col("e.i") == F.col("pa.i"))
        .join(pi1.select("i", "pi").alias("pb"), F.col("e.j") == F.col("pb.i"))
        .groupBy(F.col("e.i").alias("i"))
        .agg(
            F.sum(
                F.round(
                    F.col("e.n").cast("double")
                    / (F.col("pa.pi") + F.col("pb.pi")),
                    9,
                ).cast("decimal(28,9)")
            )
            .cast("double")
            .alias("d")
        )
    )
    it2 = pi1.join(d2, "i").select(
        "i",
        "wins",
        "matches",
        (F.col("wins").cast("double") / F.col("d")).alias("raw"),
    )
    # Rank by raw (the normalizer is a positive constant, so raw and pi
    # order identically — and a window inside a window's ORDER BY is not
    # portable SQL).
    return (
        it2.select(
            F.col("i").alias("event_type"),
            F.col("matches").alias("n_matches"),
            "wins",
            F.round(F.col("raw") / norm(), 6).alias("pi"),
            F.row_number()
            .over(Window.orderBy(F.col("raw").desc(), "i"))
            .cast("bigint")
            .alias("rnk"),
        )
        .orderBy("rnk")
    )


_RATER_C_SQL = (
    "CASE WHEN len(list_distinct(string_split(lower(text), ' '))) >= 25 "
    "THEN 1 ELSE 0 END"
)


@query(
    "eval_krippendorff_alpha",
    oracle=f"""
    WITH units AS (
        SELECT lang,
               {_RATER_A_SQL} + {_RATER_B_SQL} + {_RATER_C_SQL} AS o
        FROM documents
    ),
    s AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_units,
               CAST(3 * COUNT(*) AS BIGINT) AS n_ratings,
               CAST(SUM(o) AS BIGINT) AS ones,
               CAST(SUM(o * (3 - o)) AS BIGINT) AS disg
        FROM units GROUP BY lang
    )
    SELECT lang, n_units, n_ratings, ones,
           ROUND(1.0 - CAST((n_ratings - 1) * disg AS DOUBLE)
                       / (2.0 * ones * (n_ratings - ones)), 6) AS alpha
    FROM s
    ORDER BY lang
    """,
    tags=("pipeline", "evaluation", "agreement"),
)
def eval_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha per language for THREE deterministic binary
    document raters (the kappa pair plus a distinct-word-count rule) —
    the multi-rater generalization of `eval_cohens_kappa`, and the
    agreement coefficient that remains defined under unequal rater counts
    and missing ratings.  For complete binary data the coincidence-matrix
    definition collapses to the closed form alpha = 1 - (n-1)·D /
    (2·P·(n-P)) with n total ratings, P total positives and D =
    sum_u o_u(m-o_u) the within-unit disagreement mass (verified against
    a brute-force coincidence-matrix construction in the prototype; the
    marginals n_c equal the raw value counts exactly).

    Scale shape: one documents scan reduces map-side to FOUR integers per
    language (units, positives, disagreement, ratings) — constant
    aggregate state; alpha is integer-ratio arithmetic on the 5-row
    frame, bit-exact with no transcendental."""
    t = Tables(spark, sf_dir)
    ra, rb = _raters()
    rc = F.when(
        F.size(F.array_distinct(F.split(F.lower(F.col("text")), " "))) >= 25,
        1,
    ).otherwise(0)
    units = t.parallel("documents", "doc_id").select(
        "lang", (ra + rb + rc).alias("o")
    )
    s = units.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_units"),
        (3 * F.count("*")).cast("bigint").alias("n_ratings"),
        F.sum("o").cast("bigint").alias("ones"),
        F.sum(F.col("o") * (3 - F.col("o"))).cast("bigint").alias("disg"),
    )
    alpha = 1.0 - ((F.col("n_ratings") - 1) * F.col("disg")).cast(
        "double"
    ) / (2.0 * F.col("ones") * (F.col("n_ratings") - F.col("ones")))
    return s.select(
        "lang", "n_units", "n_ratings", "ones",
        F.round(alpha, 6).alias("alpha"),
    ).orderBy("lang")


_DL_R9 = R9_DECIMAL  # shared contract (exprs.py)


@query(
    "eval_auc_delong_ci",
    oracle=f"""
    WITH scored AS (
        SELECT {_SQL_SCORE} AS s,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    ranked AS (
        SELECT y,
               RANK() OVER (ORDER BY s)
               + (COUNT(*) OVER (PARTITION BY s) - 1) / 2.0 AS mr_all,
               RANK() OVER (PARTITION BY y ORDER BY s)
               + (COUNT(*) OVER (PARTITION BY y, s) - 1) / 2.0 AS mr_cls,
               SUM(y) OVER () AS n1,
               COUNT(*) OVER () - SUM(y) OVER () AS n0
        FROM scored
    ),
    placed AS (
        SELECT y,
               CASE WHEN y = 1 THEN (mr_all - mr_cls) / n0
                    ELSE 1.0 - (mr_all - mr_cls) / n1 END AS v
        FROM ranked
    ),
    agg AS (
        SELECT CAST(COUNT(*) FILTER (WHERE y = 1) AS BIGINT) AS n1,
               CAST(COUNT(*) FILTER (WHERE y = 0) AS BIGINT) AS n0,
               CAST(SUM({_DL_R9.format(t="v")}) FILTER (WHERE y = 1)
                    AS DOUBLE) AS sv1,
               CAST(SUM({_DL_R9.format(t="v * v")}) FILTER (WHERE y = 1)
                    AS DOUBLE) AS sq1,
               CAST(SUM({_DL_R9.format(t="v")}) FILTER (WHERE y = 0)
                    AS DOUBLE) AS sv0,
               CAST(SUM({_DL_R9.format(t="v * v")}) FILTER (WHERE y = 0)
                    AS DOUBLE) AS sq0
        FROM placed
    )
    SELECT n1 AS n_pos, n0 AS n_neg,
           ROUND(sv1 / n1, 6) AS auc,
           ROUND(sqrt((sq1 - sv1 * sv1 / n1) / (n1 - 1) / n1
                      + (sq0 - sv0 * sv0 / n0) / (n0 - 1) / n0), 6)
               AS se_delong,
           ROUND(sv1 / n1
                 - 1.96 * sqrt((sq1 - sv1 * sv1 / n1) / (n1 - 1) / n1
                               + (sq0 - sv0 * sv0 / n0) / (n0 - 1) / n0),
                 6) AS ci_lo,
           ROUND(sv1 / n1
                 + 1.96 * sqrt((sq1 - sv1 * sv1 / n1) / (n1 - 1) / n1
                               + (sq0 - sv0 * sv0 / n0) / (n0 - 1) / n0),
                 6) AS ci_hi
    FROM agg
    """,
    tags=("pipeline", "evaluation", "auc", "confidence-interval"),
)
def eval_auc_delong_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AUC with DeLong standard error and 95% CI — the statistically
    honest version of `eval_roc_auc` (a point estimate without its
    sampling error is uninterpretable when comparing models).  Uses the
    fast midrank formulation: each positive's placement value V10 =
    (combined midrank - within-class midrank)/n0, symmetrically V01 for
    negatives; AUC = mean(V10), Var = S10/n1 + S01/n0 with each class's
    sample variance expanded onto 9-dp-rounded DECIMAL power sums
    (order-free; mean(V10) = mean(V01) = AUC, verified in the numpy
    prototype).  Tie-safe by construction (midranks).

    Scale shape: midranks are rank + tie-count windows; the global
    ORDER BY s window is the bounded-eval-set posture (scored EVAL sets,
    not corpora — same stance as the timeseries calendar grain); at
    corpus scale the distributed two-pass rank device
    (`customer_segment_migration_scale`) replaces it with identical
    semantics.  The variance reduction is one conditional aggregate."""
    ev = Tables(spark, sf_dir).events
    scored = ev.select(
        _score().alias("s"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    w_all = Window.partitionBy()
    ranked = scored.select(
        "y",
        (
            F.rank().over(Window.orderBy("s"))
            + (F.count("*").over(Window.partitionBy("s")) - 1) / 2.0
        ).alias("mr_all"),
        (
            F.rank().over(Window.partitionBy("y").orderBy("s"))
            + (F.count("*").over(Window.partitionBy("y", "s")) - 1) / 2.0
        ).alias("mr_cls"),
        F.sum("y").over(w_all).alias("n1"),
        (F.count("*").over(w_all) - F.sum("y").over(w_all)).alias("n0"),
    )
    placed = ranked.select(
        "y",
        F.when(
            F.col("y") == 1,
            (F.col("mr_all") - F.col("mr_cls")) / F.col("n0"),
        )
        .otherwise(
            1.0 - (F.col("mr_all") - F.col("mr_cls")) / F.col("n1")
        )
        .alias("v"),
    )
    r9 = lambda c: F.round(c, 9).cast("decimal(28,9)")  # noqa: E731
    y1, y0 = F.col("y") == 1, F.col("y") == 0
    agg = placed.agg(
        F.count(F.when(y1, 1)).cast("bigint").alias("n1"),
        F.count(F.when(y0, 1)).cast("bigint").alias("n0"),
        F.sum(F.when(y1, r9(F.col("v")))).cast("double").alias("sv1"),
        F.sum(F.when(y1, r9(F.col("v") * F.col("v")))).cast("double").alias("sq1"),
        F.sum(F.when(y0, r9(F.col("v")))).cast("double").alias("sv0"),
        F.sum(F.when(y0, r9(F.col("v") * F.col("v")))).cast("double").alias("sq0"),
    )
    n1, n0 = F.col("n1"), F.col("n0")
    var = (F.col("sq1") - F.col("sv1") * F.col("sv1") / n1) / (n1 - 1) / n1 + (
        F.col("sq0") - F.col("sv0") * F.col("sv0") / n0
    ) / (n0 - 1) / n0
    auc = F.col("sv1") / n1
    return agg.select(
        n1.alias("n_pos"),
        n0.alias("n_neg"),
        F.round(auc, 6).alias("auc"),
        F.round(F.sqrt(var), 6).alias("se_delong"),
        F.round(auc - 1.96 * F.sqrt(var), 6).alias("ci_lo"),
        F.round(auc + 1.96 * F.sqrt(var), 6).alias("ci_hi"),
    )


@query(
    "eval_cronbach_alpha",
    oracle=f"""
    WITH units AS (
        SELECT lang,
               {_RATER_A_SQL} AS ra, {_RATER_B_SQL} AS rb, {_RATER_C_SQL} AS rc
        FROM documents
    ),
    s AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(ra) AS BIGINT) AS s_a,
               CAST(SUM(rb) AS BIGINT) AS s_b,
               CAST(SUM(rc) AS BIGINT) AS s_c,
               CAST(SUM(ra + rb + rc) AS BIGINT) AS st,
               CAST(SUM((ra + rb + rc) * (ra + rb + rc)) AS BIGINT) AS stt
        FROM units GROUP BY lang
    )
    SELECT lang, n,
           ROUND((CAST(s_a AS DOUBLE) * (n - s_a)
                  + CAST(s_b AS DOUBLE) * (n - s_b)
                  + CAST(s_c AS DOUBLE) * (n - s_c)) / (CAST(n AS DOUBLE) * n),
                 6) AS sum_item_var,
           ROUND((stt - CAST(st AS DOUBLE) * st / n) / n, 6) AS total_var,
           ROUND(1.5 * (1.0
                 - (CAST(s_a AS DOUBLE) * (n - s_a)
                    + CAST(s_b AS DOUBLE) * (n - s_b)
                    + CAST(s_c AS DOUBLE) * (n - s_c)) / (CAST(n AS DOUBLE) * n)
                   / ((stt - CAST(st AS DOUBLE) * st / n) / n)), 6) AS alpha
    FROM s
    ORDER BY lang
    """,
    tags=("pipeline", "evaluation", "agreement", "reliability"),
)
def eval_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cronbach's alpha (KR-20 on binary items) per language over the
    same three document raters as `eval_krippendorff_alpha` — internal
    CONSISTENCY rather than chance-corrected agreement: do the three
    rules measure one underlying "quality" trait?  alpha = k/(k-1) *
    (1 - sum(item variances)/variance(total score)) with k=3 and
    population variances p(1-p) per item; everything reduces to seven
    integers per language (n, three item sums, total-score sum and sum
    of squares), so the statistic is exact integer-ratio arithmetic.

    Scale shape: one scan, map-side constant-state reduction per
    language, arithmetic on the 5-row frame — the agreement-family
    posture."""
    t = Tables(spark, sf_dir)
    ra, rb = _raters()
    rc = F.when(
        F.size(F.array_distinct(F.split(F.lower(F.col("text")), " "))) >= 25,
        1,
    ).otherwise(0)
    units = t.parallel("documents", "doc_id").select(
        "lang", ra.alias("ra"), rb.alias("rb"), rc.alias("rc")
    )
    tot = F.col("ra") + F.col("rb") + F.col("rc")
    s = units.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("ra").cast("bigint").alias("s_a"),
        F.sum("rb").cast("bigint").alias("s_b"),
        F.sum("rc").cast("bigint").alias("s_c"),
        F.sum(tot).cast("bigint").alias("st"),
        F.sum(tot * tot).cast("bigint").alias("stt"),
    )
    n = F.col("n")
    item_var = (
        F.col("s_a").cast("double") * (n - F.col("s_a"))
        + F.col("s_b").cast("double") * (n - F.col("s_b"))
        + F.col("s_c").cast("double") * (n - F.col("s_c"))
    ) / (n.cast("double") * n)
    tot_var = (
        F.col("stt") - F.col("st").cast("double") * F.col("st") / n
    ) / n
    return s.select(
        "lang",
        "n",
        F.round(item_var, 6).alias("sum_item_var"),
        F.round(tot_var, 6).alias("total_var"),
        F.round(1.5 * (1.0 - item_var / tot_var), 6).alias("alpha"),
    ).orderBy("lang")


# Platt scaling: 2-parameter logistic recalibration on the score grain.
# Same shared-expression-template device as the GLM family (regression.py):
# both engines evaluate identical strings; sums ride the ROUND->DECIMAL
# order-free contract.
_PLATT_P = "(1.0 / (1.0 + exp(-(b0 + b1 * xd))))"


def _platt_sums(p: str) -> dict[str, str]:
    w = f"(nd * {p} * (1.0 - {p}))"
    r = f"(kd - nd * {p})"
    terms = {
        "s00": w,
        "s01": f"{w} * xd",
        "s11": f"{w} * xd * xd",
        "g0": r,
        "g1": f"{r} * xd",
    }
    return {
        name: f"CAST(SUM(CAST(ROUND({t}, 9) AS DECIMAL(38,9))) AS DOUBLE)"
        for name, t in terms.items()
    }


_PLATT_DET = "(s00 * s11 - s01 * s01)"
_PLATT_D0 = f"(s11 * g0 - s01 * g1) / {_PLATT_DET}"
_PLATT_D1 = f"(s00 * g1 - s01 * g0) / {_PLATT_DET}"

_SQL_PLATT_STEP = """
        SELECT n_rows, brier_raw,
               b0 + {d0} AS b0,
               b1 + {d1} AS b1{extra}
        FROM (
            SELECT n_rows, brier_raw, b0, b1,
               {sums}
            FROM gd, {model}
            GROUP BY n_rows, brier_raw, b0, b1
        )
""".format

_NL = ",\n               "
_PLATT_SUMS_1 = _NL.join(f"{s} AS {n2}" for n2, s in _platt_sums("0.5").items())
_PLATT_SUMS_P = _NL.join(
    f"{s} AS {n2}" for n2, s in _platt_sums(_PLATT_P).items()
)
_PLATT_GRAD = (
    ",\n               ROUND(sqrt(g0 * g0 + g1 * g1), 6) AS grad_norm"
)


@query(
    "feature_platt_scaling",
    oracle=f"""
    WITH gd AS (
        SELECT CAST(x AS DOUBLE) AS xd,
               CAST(COUNT(*) AS DOUBLE) AS nd,
               CAST(SUM(y) AS DOUBLE) AS kd
        FROM (
            SELECT CAST(ROUND({_SQL_SCORE}, 3) AS DECIMAL(4,3)) AS x,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        )
        GROUP BY x
    ),
    init AS (
        SELECT 0.0 AS b0, 0.0 AS b1,
               CAST(SUM(nd) AS BIGINT) AS n_rows,
               ROUND(CAST(SUM(CAST(ROUND(nd * xd * xd - 2 * xd * kd + kd, 9)
                                   AS DECIMAL(38,9))) AS DOUBLE)
                     / SUM(nd), 6) AS brier_raw
        FROM gd
    ),
    m1 AS ({_SQL_PLATT_STEP(d0=_PLATT_D0, d1=_PLATT_D1, extra="",
                            sums=_PLATT_SUMS_1, model="init")}
    ),
    m2 AS ({_SQL_PLATT_STEP(d0=_PLATT_D0, d1=_PLATT_D1, extra="",
                            sums=_PLATT_SUMS_P, model="m1")}
    ),
    m3 AS ({_SQL_PLATT_STEP(d0=_PLATT_D0, d1=_PLATT_D1, extra=_PLATT_GRAD,
                            sums=_PLATT_SUMS_P, model="m2")}
    )
    SELECT n_rows, brier_raw,
           ROUND(b0, 6) AS intercept,
           ROUND(b1, 6) AS slope,
           grad_norm,
           ROUND(CAST(SUM(CAST(ROUND(
                     nd * {_PLATT_P} * {_PLATT_P}
                     - 2 * {_PLATT_P} * kd + kd, 9)
                 AS DECIMAL(38,9))) AS DOUBLE) / SUM(nd), 6) AS brier_platt
    FROM gd, m3
    GROUP BY n_rows, brier_raw, b0, b1, grad_norm
    """,
    tags=("pipeline", "evaluation", "calibration", "glm"),
)
def feature_platt_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Platt scaling — the calibration FIX for what
    `eval_calibration_bins` measures: a 2-parameter logistic
    P(y|s) = sigmoid(b0 + b1·s) refit of the raw score, trained with
    THREE Newton steps entirely as score-grain aggregates (the corpus
    collapses once to <=1001 (rounded-score, n, k) rows; each step is one
    tiny weighted Gram/gradient aggregate + a 2x2 solve on a broadcast
    1-row model frame — the `feature_logreg_newton` device with one
    feature).  Reports the Brier score BEFORE (raw score as probability)
    and AFTER (0.3187 -> 0.1588 on the fixture: the raw score is badly
    calibrated for the purchase label and Platt mostly fixes the base
    rate), plus the final gradient norm as the convergence readout.

    Exactness: the score grain is an exact DECIMAL(4,3) key; all sums
    ride the ROUND(.,9) -> DECIMAL contract; both engines evaluate
    identical expression strings; cross-checked against a numpy IRLS
    prototype.

    Scale shape: one corpus scan to the score grain (constant aggregate
    state), then iteration cost independent of corpus size — calibrating
    on 100 TB of scores costs one scan plus three 1001-row aggregates."""
    t = Tables(spark, sf_dir)
    gd = (
        t.events.select(
            F.round(_score(), 3).cast("decimal(4,3)").alias("x"),
            (F.col("event_type") == "purchase").cast("int").alias("y"),
        )
        .groupBy("x")
        .agg(
            F.count("*").cast("double").alias("nd"),
            F.sum("y").cast("double").alias("kd"),
        )
        .selectExpr("CAST(x AS DOUBLE) AS xd", "nd", "kd")
        .localCheckpoint(eager=False)
    )
    brier = lambda p: (  # noqa: E731
        F.expr(
            f"ROUND(CAST(SUM(CAST(ROUND(nd * {p} * {p} - 2 * {p} * kd + kd,"
            f" 9) AS DECIMAL(38,9))) AS DOUBLE) / SUM(nd), 6)"
        )
    )
    init = gd.agg(
        F.lit(0.0).alias("b0"),
        F.lit(0.0).alias("b1"),
        F.expr("CAST(SUM(nd) AS BIGINT)").alias("n_rows"),
        brier("xd").alias("brier_raw"),
    )

    def step(model: DataFrame, p: str, with_grad: bool) -> DataFrame:
        s = (
            gd.crossJoin(F.broadcast(model))
            .groupBy("n_rows", "brier_raw", "b0", "b1")
            .agg(*[
                F.expr(sql).alias(n2) for n2, sql in _platt_sums(p).items()
            ])
        )
        cols = [
            "n_rows",
            "brier_raw",
            f"b0 + {_PLATT_D0} AS b0",
            f"b1 + {_PLATT_D1} AS b1",
        ]
        if with_grad:
            cols.append("ROUND(sqrt(g0 * g0 + g1 * g1), 6) AS grad_norm")
        return s.selectExpr(*cols)

    m3 = step(step(step(init, "0.5", False), _PLATT_P, False), _PLATT_P, True)
    return (
        gd.crossJoin(F.broadcast(m3))
        .groupBy("n_rows", "brier_raw", "b0", "b1", "grad_norm")
        .agg(brier(_PLATT_P).alias("brier_platt"))
        .selectExpr(
            "n_rows",
            "brier_raw",
            "ROUND(b0, 6) AS intercept",
            "ROUND(b1, 6) AS slope",
            "grad_norm",
            "brier_platt",
        )
    )


@query(
    "eval_expected_calibration_error",
    oracle=f"""
    WITH scored AS (
        SELECT {_SQL_SCORE} AS p,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    binned AS (
        SELECT LEAST(CAST(floor(p * 10) AS INT), 9) AS bin, p, y
        FROM scored
    ),
    bins AS (
        SELECT bin, COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(p, 9) AS DECIMAL(28,9))) AS DOUBLE)
                   / COUNT(*) AS conf,
               CAST(SUM(y) AS DOUBLE) / COUNT(*) AS acc
        FROM binned GROUP BY bin
    )
    SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           ROUND(CAST(SUM(CAST(ROUND(n * abs(acc - conf), 9)
                               AS DECIMAL(38,9))) AS DOUBLE)
                 / SUM(n), 6) AS ece,
           ROUND(MAX(abs(acc - conf)), 6) AS mce
    FROM bins
    """,
    tags=("pipeline", "evaluation", "calibration"),
)
def eval_expected_calibration_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Expected Calibration Error — the single number the reliability
    diagram (`eval_calibration_bins`) summarizes to: the bin-count-
    weighted mean |accuracy - confidence| over 10 equal-width bins, plus
    MCE (the worst bin) — the metric pair every calibration paper
    reports, and the before/after readout for `feature_platt_scaling`.

    Exactness: per-bin confidence sums ride the ROUND->DECIMAL contract
    (tightening `eval_calibration_bins`' plain double sums); accuracy is
    an exact integer ratio; the final weighted sum is again decimal.

    Scale shape: one scan, 10-bin map-side reduction, arithmetic on the
    bin frame."""
    ev = Tables(spark, sf_dir).events
    binned = ev.select(
        _score().alias("p"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    ).select(
        F.least(F.floor(F.col("p") * 10).cast("int"), F.lit(9)).alias("bin"),
        "p",
        "y",
    )
    bins = binned.groupBy("bin").agg(
        F.count("*").alias("n"),
        (
            F.sum(F.round(F.col("p"), 9).cast("decimal(28,9)")).cast("double")
            / F.count("*")
        ).alias("conf"),
        (F.sum("y").cast("double") / F.count("*")).alias("acc"),
    )
    gap = F.abs(F.col("acc") - F.col("conf"))
    return bins.agg(
        F.sum("n").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_bins"),
        F.round(
            F.sum(
                F.round(F.col("n") * gap, 9).cast("decimal(38,9)")
            ).cast("double")
            / F.sum("n"),
            6,
        ).alias("ece"),
        F.round(F.max(gap), 6).alias("mce"),
    )


@query(
    "eval_auc_delong_ci_scale",
    oracle=f"""
    WITH scored AS (
        SELECT {_SQL_SCORE} AS s,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        FROM events
    ),
    ranked AS (
        SELECT y,
               RANK() OVER (ORDER BY s)
               + (COUNT(*) OVER (PARTITION BY s) - 1) / 2.0 AS mr_all,
               RANK() OVER (PARTITION BY y ORDER BY s)
               + (COUNT(*) OVER (PARTITION BY y, s) - 1) / 2.0 AS mr_cls,
               SUM(y) OVER () AS n1,
               COUNT(*) OVER () - SUM(y) OVER () AS n0
        FROM scored
    ),
    placed AS (
        SELECT y,
               CASE WHEN y = 1 THEN (mr_all - mr_cls) / n0
                    ELSE 1.0 - (mr_all - mr_cls) / n1 END AS v
        FROM ranked
    ),
    agg AS (
        SELECT CAST(COUNT(*) FILTER (WHERE y = 1) AS BIGINT) AS n1,
               CAST(COUNT(*) FILTER (WHERE y = 0) AS BIGINT) AS n0,
               CAST(SUM({_DL_R9.format(t="v")}) FILTER (WHERE y = 1)
                    AS DOUBLE) AS sv1,
               CAST(SUM({_DL_R9.format(t="v * v")}) FILTER (WHERE y = 1)
                    AS DOUBLE) AS sq1,
               CAST(SUM({_DL_R9.format(t="v")}) FILTER (WHERE y = 0)
                    AS DOUBLE) AS sv0,
               CAST(SUM({_DL_R9.format(t="v * v")}) FILTER (WHERE y = 0)
                    AS DOUBLE) AS sq0
        FROM placed
    )
    SELECT n1 AS n_pos, n0 AS n_neg,
           ROUND(sv1 / n1, 6) AS auc,
           ROUND(sqrt((sq1 - sv1 * sv1 / n1) / (n1 - 1) / n1
                      + (sq0 - sv0 * sv0 / n0) / (n0 - 1) / n0), 6)
               AS se_delong,
           ROUND(sv1 / n1
                 - 1.96 * sqrt((sq1 - sv1 * sv1 / n1) / (n1 - 1) / n1
                               + (sq0 - sv0 * sv0 / n0) / (n0 - 1) / n0),
                 6) AS ci_lo,
           ROUND(sv1 / n1
                 + 1.96 * sqrt((sq1 - sv1 * sv1 / n1) / (n1 - 1) / n1
                               + (sq0 - sv0 * sv0 / n0) / (n0 - 1) / n0),
                 6) AS ci_hi
    FROM agg
    """,
    tags=("pipeline", "evaluation", "auc", "confidence-interval",
          "scale-safe"),
)
def eval_auc_delong_ci_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`eval_auc_delong_ci` with NO single-partition window (VERDICT r12
    ask #3 — the last corpus-shaped global window without a registered
    distributed twin).  Two observations make it distributable:

    1. Midranks depend only on the score VALUE: every row with score s
       shares mr_all(s) = rows_before(s) + (cnt(s)+1)/2 and likewise
       mr_cls per class, so the whole rank computation collapses to the
       distinct-score grain — (s, cnt_all, cnt_pos, cnt_neg).
    2. rows_before(s) is a global prefix sum, which is exactly
       `distributed_running_sums` (range repartition, parallel per-
       partition windows, broadcast per-partition offsets).

    Placement values and the DeLong variance then become score-grain
    arithmetic with each ROUND(v,9) DECIMAL term weighted by its exact
    tie count — bit-identical to the per-row original (same oracle text)
    because every tied row contributes the identical rounded decimal.

    Scale shape: one score-grain aggregate (|distinct scores| <= n rows),
    one 32-way range exchange + a 32-long offsets collect, then map-side
    arithmetic and one scalar reduction; zero `Exchange SinglePartition`
    except the final scalar aggregate (plan-gated)."""
    from auron_spark.operators.window import distributed_running_sums

    ev = Tables(spark, sf_dir).events
    scored = ev.select(
        _score().alias("s"),
        (F.col("event_type") == "purchase").cast("int").alias("y"),
    )
    g = scored.groupBy("s").agg(
        F.count("*").cast("long").alias("cnt_all"),
        F.sum("y").cast("long").alias("cnt_pos"),
        (F.count("*") - F.sum("y")).cast("long").alias("cnt_neg"),
    )
    cum = distributed_running_sums(
        g, [F.asc("s")], ["cnt_all", "cnt_pos", "cnt_neg"]
    )
    tot = g.agg(
        F.sum("cnt_pos").cast("long").alias("n1_t"),
        F.sum("cnt_neg").cast("long").alias("n0_t"),
    )
    x = cum.join(F.broadcast(tot))
    mr_all = F.col("cum_cnt_all") - F.col("cnt_all") + (F.col("cnt_all") + 1) / 2.0
    mr_pos = F.col("cum_cnt_pos") - F.col("cnt_pos") + (F.col("cnt_pos") + 1) / 2.0
    mr_neg = F.col("cum_cnt_neg") - F.col("cnt_neg") + (F.col("cnt_neg") + 1) / 2.0
    v1 = (mr_all - mr_pos) / F.col("n0_t")
    v0 = 1.0 - (mr_all - mr_neg) / F.col("n1_t")
    # Tie-weighted rounded terms at FULL scale 9: decimal(19,9) x
    # decimal(12,0) -> decimal(32,9) (no precision overflow, so Spark
    # cannot demote the scale — a plain long x decimal(28,9) product is
    # silently reduced to scale 6, breaking the per-row-rounding
    # equivalence with the oracle).  v is in [0,1] so 19,9 is ample;
    # 12,0 holds tie counts past 10^11 rows per score.
    r9w = lambda v, cnt: (  # noqa: E731
        F.round(v, 9).cast("decimal(19,9)")
        * F.col(cnt).cast("decimal(12,0)")
    )
    has_pos, has_neg = F.col("cnt_pos") > 0, F.col("cnt_neg") > 0
    agg = x.agg(
        F.sum("cnt_pos").cast("bigint").alias("n1"),
        F.sum("cnt_neg").cast("bigint").alias("n0"),
        F.sum(F.when(has_pos, r9w(v1, "cnt_pos")))
        .cast("double")
        .alias("sv1"),
        F.sum(F.when(has_pos, r9w(v1 * v1, "cnt_pos")))
        .cast("double")
        .alias("sq1"),
        F.sum(F.when(has_neg, r9w(v0, "cnt_neg")))
        .cast("double")
        .alias("sv0"),
        F.sum(F.when(has_neg, r9w(v0 * v0, "cnt_neg")))
        .cast("double")
        .alias("sq0"),
    )
    n1, n0 = F.col("n1"), F.col("n0")
    var = (F.col("sq1") - F.col("sv1") * F.col("sv1") / n1) / (n1 - 1) / n1 + (
        F.col("sq0") - F.col("sv0") * F.col("sv0") / n0
    ) / (n0 - 1) / n0
    auc = F.col("sv1") / n1
    return agg.select(
        n1.alias("n_pos"),
        n0.alias("n_neg"),
        F.round(auc, 6).alias("auc"),
        F.round(F.sqrt(var), 6).alias("se_delong"),
        F.round(auc - 1.96 * F.sqrt(var), 6).alias("ci_lo"),
        F.round(auc + 1.96 * F.sqrt(var), 6).alias("ci_hi"),
    )


# Before/after ECE on the Platt score grain (VERDICT r12 ask #4): the
# binning device of `eval_expected_calibration_error` applied at the
# <=1001-row rounded-score grain the Platt fit trains on, so "before" and
# "after" are measured on the SAME units and the whole readout costs one
# corpus scan.
_ECE_BIN_SQL = """
        SELECT LEAST(CAST(floor({p} * 10) AS INT), 9) AS bin,
               CAST(SUM(nd) AS DOUBLE) AS n,
               CAST(SUM(CAST(ROUND(nd * {p}, 9) AS DECIMAL(38,9)))
                    AS DOUBLE) / SUM(nd) AS conf,
               SUM(kd) / SUM(nd) AS acc
        FROM {src} GROUP BY 1
""".format

_ECE_REDUCE_SQL = """
        SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
               ROUND(CAST(SUM(CAST(ROUND(n * abs(acc - conf), 9)
                                   AS DECIMAL(38,9))) AS DOUBLE)
                     / SUM(n), 6) AS ece_{tag},
               ROUND(MAX(abs(acc - conf)), 6) AS mce_{tag}
        FROM {src}
""".format


@query(
    "eval_ece_after_platt",
    oracle=f"""
    WITH gd AS (
        SELECT CAST(x AS DOUBLE) AS xd,
               CAST(COUNT(*) AS DOUBLE) AS nd,
               CAST(SUM(y) AS DOUBLE) AS kd
        FROM (
            SELECT CAST(ROUND({_SQL_SCORE}, 3) AS DECIMAL(4,3)) AS x,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        )
        GROUP BY x
    ),
    init AS (
        SELECT 0.0 AS b0, 0.0 AS b1,
               CAST(SUM(nd) AS BIGINT) AS n_rows,
               0.0 AS brier_raw
        FROM gd
    ),
    m1 AS ({_SQL_PLATT_STEP(d0=_PLATT_D0, d1=_PLATT_D1, extra="",
                            sums=_PLATT_SUMS_1, model="init")}
    ),
    m2 AS ({_SQL_PLATT_STEP(d0=_PLATT_D0, d1=_PLATT_D1, extra="",
                            sums=_PLATT_SUMS_P, model="m1")}
    ),
    m3 AS ({_SQL_PLATT_STEP(d0=_PLATT_D0, d1=_PLATT_D1, extra="",
                            sums=_PLATT_SUMS_P, model="m2")}
    ),
    recal AS (
        SELECT xd, nd, kd, {_PLATT_P} AS pc FROM gd, m3
    ),
    bins_b AS ({_ECE_BIN_SQL(p="xd", src="gd")}
    ),
    bins_a AS ({_ECE_BIN_SQL(p="pc", src="recal")}
    ),
    eb AS ({_ECE_REDUCE_SQL(tag="before", src="bins_b")}
    ),
    ea AS ({_ECE_REDUCE_SQL(tag="after", src="bins_a")}
    )
    SELECT eb.n_rows, eb.ece_before, eb.mce_before, ea.ece_after,
           ea.mce_after,
           ROUND(m3.b0, 6) AS intercept, ROUND(m3.b1, 6) AS slope
    FROM eb, ea, m3
    """,
    tags=("pipeline", "evaluation", "calibration", "glm"),
)
def eval_ece_after_platt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed calibration readout `feature_platt_scaling`'s
    docstring promises (VERDICT r12 ask #4): ECE/MCE of the raw score
    AND of the Platt-recalibrated probability sigmoid(b0 + b1*s) in ONE
    frame, with the fitted coefficients alongside.  Both sides bin at
    the <=1001-row rounded-score grain the fit trains on, so before and
    after are measured on identical units (`eval_expected_calibration_
    error` keeps the raw-row "before" as its own registered result); on
    the fixture ece_after < ece_before (0.2898 -> 0.0019 at sf0.01:
    Platt fixes the base-rate miscalibration the Brier pair already
    showed).

    Exactness: the three Newton steps reuse the proven Platt template
    strings; bin confidences weight each grain row's probability by its
    exact count through ROUND(.,9)->DECIMAL; accuracy is an exact ratio
    of grain sums; cross-checked against a numpy IRLS + binning twin.

    Scale shape: one corpus scan to the score grain; the fit and BOTH
    binnings are grain-frame arithmetic (iteration and readout cost
    independent of corpus size) — calibrating and auditing 100 TB of
    scores is one scan plus four <=1001-row aggregates."""
    t = Tables(spark, sf_dir)
    gd = (
        t.events.select(
            F.round(_score(), 3).cast("decimal(4,3)").alias("x"),
            (F.col("event_type") == "purchase").cast("int").alias("y"),
        )
        .groupBy("x")
        .agg(
            F.count("*").cast("double").alias("nd"),
            F.sum("y").cast("double").alias("kd"),
        )
        .selectExpr("CAST(x AS DOUBLE) AS xd", "nd", "kd")
        .localCheckpoint(eager=False)
    )
    init = gd.agg(
        F.lit(0.0).alias("b0"),
        F.lit(0.0).alias("b1"),
        F.expr("CAST(SUM(nd) AS BIGINT)").alias("n_rows"),
        F.lit(0.0).alias("brier_raw"),
    )

    def step(model: DataFrame, p: str) -> DataFrame:
        s = (
            gd.crossJoin(F.broadcast(model))
            .groupBy("n_rows", "brier_raw", "b0", "b1")
            .agg(*[
                F.expr(sql).alias(n2) for n2, sql in _platt_sums(p).items()
            ])
        )
        return s.selectExpr(
            "n_rows",
            "brier_raw",
            f"b0 + {_PLATT_D0} AS b0",
            f"b1 + {_PLATT_D1} AS b1",
        )

    m3 = step(step(step(init, "0.5"), _PLATT_P), _PLATT_P).select("b0", "b1")
    recal = gd.crossJoin(F.broadcast(m3)).selectExpr(
        "xd", "nd", "kd", f"{_PLATT_P} AS pc"
    )

    def ece(src: DataFrame, p: str, tag: str) -> DataFrame:
        bins = (
            src.selectExpr(
                f"LEAST(CAST(floor({p} * 10) AS INT), 9) AS bin",
                "nd",
                "kd",
                f"{p} AS pv",
            )
            .groupBy("bin")
            .agg(
                F.sum("nd").cast("double").alias("n"),
                (
                    F.sum(
                        F.round(F.col("nd") * F.col("pv"), 9).cast(
                            "decimal(38,9)"
                        )
                    ).cast("double")
                    / F.sum("nd")
                ).alias("conf"),
                (F.sum("kd") / F.sum("nd")).alias("acc"),
            )
        )
        gap = F.abs(F.col("acc") - F.col("conf"))
        return bins.agg(
            F.sum("n").cast("bigint").alias("n_rows"),
            F.round(
                F.sum(
                    F.round(F.col("n") * gap, 9).cast("decimal(38,9)")
                ).cast("double")
                / F.sum("n"),
                6,
            ).alias(f"ece_{tag}"),
            F.round(F.max(gap), 6).alias(f"mce_{tag}"),
        )

    eb = ece(gd, "xd", "before")
    ea = ece(recal, "pc", "after").drop("n_rows")
    return (
        eb.join(F.broadcast(ea))
        .join(F.broadcast(m3))
        .selectExpr(
            "n_rows",
            "ece_before",
            "mce_before",
            "ece_after",
            "mce_after",
            "ROUND(b0, 6) AS intercept",
            "ROUND(b1, 6) AS slope",
        )
    )


# Nominal multi-category raters for the Krippendorff generalization:
# three deterministic size-class judges (chars / words / distinct words)
# that correlate but disagree at the boundaries — 4 categories S/M/L/XL.
_KN_CAT_A = (
    "CASE WHEN n_chars < 150 THEN 'S' WHEN n_chars < 300 THEN 'M' "
    "WHEN n_chars < 450 THEN 'L' ELSE 'XL' END"
)
_KN_CAT_B_SQL = (
    "CASE WHEN len(string_split(text, ' ')) < 27 THEN 'S' "
    "WHEN len(string_split(text, ' ')) < 54 THEN 'M' "
    "WHEN len(string_split(text, ' ')) < 81 THEN 'L' ELSE 'XL' END"
)
_KN_CAT_B_SPARK = (
    "CASE WHEN size(split(text, ' ')) < 27 THEN 'S' "
    "WHEN size(split(text, ' ')) < 54 THEN 'M' "
    "WHEN size(split(text, ' ')) < 81 THEN 'L' ELSE 'XL' END"
)
_KN_CAT_C_SQL = (
    "CASE WHEN len(list_distinct(string_split(lower(text), ' '))) < 14 "
    "THEN 'S' "
    "WHEN len(list_distinct(string_split(lower(text), ' '))) < 22 THEN 'M' "
    "WHEN len(list_distinct(string_split(lower(text), ' '))) < 28 THEN 'L' "
    "ELSE 'XL' END"
)
_KN_CAT_C_SPARK = (
    "CASE WHEN size(array_distinct(split(lower(text), ' '))) < 14 THEN 'S' "
    "WHEN size(array_distinct(split(lower(text), ' '))) < 22 THEN 'M' "
    "WHEN size(array_distinct(split(lower(text), ' '))) < 28 THEN 'L' "
    "ELSE 'XL' END"
)


def _kn_units(t: Tables, a: str, b: str, c: str) -> DataFrame:
    """(lang, ca, cb, cc) rater-label frame shared by the nominal alpha,
    Fleiss kappa and (with rank expressions) interval alpha builders —
    one documents scan, checkpointed because two reductions read it."""
    return (
        t.parallel("documents", "doc_id")
        .selectExpr("lang", f"{a} AS ca", f"{b} AS cb", f"{c} AS cc")
        .localCheckpoint(eager=False)
    )


def _kn_cells(u: DataFrame) -> DataFrame:
    """(lang, cat, n_c) marginal rating counts from a rater-label frame —
    the shared second reduction of the agreement family."""
    return (
        u.select("lang", F.explode(F.array("ca", "cb", "cc")).alias("cat"))
        .groupBy("lang", "cat")
        .agg(F.count("*").cast("bigint").alias("n_c"))
    )


def _kn_pair_disagreement(u: DataFrame) -> DataFrame:
    """(lang, n_units, disg) — disagreeing rater-pair count per unit,
    summed per language; the nominal alpha and Fleiss kappa share it."""
    return u.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_units"),
        F.sum(
            (F.col("ca") != F.col("cb")).cast("int")
            + (F.col("ca") != F.col("cc")).cast("int")
            + (F.col("cb") != F.col("cc")).cast("int")
        )
        .cast("bigint")
        .alias("disg"),
    )


@query(
    "eval_krippendorff_nominal",
    oracle=f"""
    WITH u AS (
        SELECT lang,
               {_KN_CAT_A} AS ca,
               {_KN_CAT_B_SQL} AS cb,
               {_KN_CAT_C_SQL} AS cc
        FROM documents
    ),
    s AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_units,
               CAST(SUM(CASE WHEN ca <> cb THEN 1 ELSE 0 END
                        + CASE WHEN ca <> cc THEN 1 ELSE 0 END
                        + CASE WHEN cb <> cc THEN 1 ELSE 0 END) AS BIGINT)
                   AS disg
        FROM u GROUP BY lang
    ),
    m AS (
        SELECT lang, cat, CAST(COUNT(*) AS BIGINT) AS n_c
        FROM (
            SELECT lang, ca AS cat FROM u
            UNION ALL SELECT lang, cb FROM u
            UNION ALL SELECT lang, cc FROM u
        ) GROUP BY lang, cat
    ),
    g AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_categories,
               CAST(SUM(n_c) AS BIGINT) AS n_ratings,
               CAST(SUM(n_c * n_c) AS BIGINT) AS sum_sq
        FROM m GROUP BY lang
    )
    SELECT s.lang, s.n_units, g.n_ratings, g.n_categories, s.disg,
           ROUND(1.0 - CAST((g.n_ratings - 1) * s.disg AS DOUBLE)
                       / NULLIF(g.n_ratings * g.n_ratings - g.sum_sq, 0), 6)
               AS alpha
    FROM s JOIN g ON g.lang = s.lang
    ORDER BY s.lang
    """,
    tags=("pipeline", "evaluation", "agreement"),
)
def eval_krippendorff_nominal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha for NOMINAL multi-category data (VERDICT r12
    stretch #7) — the binary closed form of `eval_krippendorff_alpha`
    generalized to three deterministic 4-category size-class raters.
    For complete data with m raters the coincidence-matrix definition
    reduces to two integer reductions:

        alpha = 1 - (n-1) * sum_u d_u / (n^2 - sum_c n_c^2)

    where d_u = #{disagreeing rater pairs in unit u} (each pair divided
    by m-1 = 2 cancels against the symmetric-coincidence factor 2), n is
    total ratings and n_c the per-category marginal — with binary
    categories this is EXACTLY the proven closed form (n^2 - sum_sq =
    2·P·(n-P)), so the binary query is the special case.  Verified
    against a brute-force coincidence-matrix construction over >= 3
    observed categories in tests/test_property_random.py.

    Scale shape: one documents scan reduces map-side to (a) two integers
    per language and (b) one count per (language, category) — constant
    aggregate state at c <= 4 categories; alpha is exact integer-ratio
    arithmetic on the joined 5-row frame."""
    t = Tables(spark, sf_dir)
    u = _kn_units(t, _KN_CAT_A, _KN_CAT_B_SPARK, _KN_CAT_C_SPARK)
    s = _kn_pair_disagreement(u)
    g = _kn_cells(u).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_categories"),
        F.sum("n_c").cast("bigint").alias("n_ratings"),
        F.sum(F.col("n_c") * F.col("n_c")).cast("bigint").alias("sum_sq"),
    )
    n = F.col("n_ratings")
    # NULLIF degenerate-stratum guard: a language where every rating is
    # one category has zero expected disagreement (n^2 = sum_sq) — alpha
    # is undefined there, and both engines surface NULL instead of a
    # division error (same guard in the oracle text).
    alpha = 1.0 - ((n - 1) * F.col("disg")).cast("double") / F.nullif(
        (n * n - F.col("sum_sq")).cast("double"), F.lit(0.0)
    )
    return (
        s.join(g, "lang")
        .select(
            "lang", "n_units", "n_ratings", "n_categories", "disg",
            F.round(alpha, 6).alias("alpha"),
        )
        .orderBy("lang")
    )


@query(
    "eval_fleiss_kappa",
    oracle=f"""
    WITH u AS (
        SELECT lang,
               {_KN_CAT_A} AS ca,
               {_KN_CAT_B_SQL} AS cb,
               {_KN_CAT_C_SQL} AS cc
        FROM documents
    ),
    s AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_units,
               CAST(SUM(CASE WHEN ca <> cb THEN 1 ELSE 0 END
                        + CASE WHEN ca <> cc THEN 1 ELSE 0 END
                        + CASE WHEN cb <> cc THEN 1 ELSE 0 END) AS BIGINT)
                   AS disg
        FROM u GROUP BY lang
    ),
    m AS (
        SELECT lang, cat, CAST(COUNT(*) AS BIGINT) AS n_c
        FROM (
            SELECT lang, ca AS cat FROM u
            UNION ALL SELECT lang, cb FROM u
            UNION ALL SELECT lang, cc FROM u
        ) GROUP BY lang, cat
    ),
    g AS (
        SELECT lang,
               CAST(SUM(n_c) AS BIGINT) AS n_ratings,
               CAST(SUM(n_c * n_c) AS BIGINT) AS sum_sq
        FROM m GROUP BY lang
    )
    SELECT s.lang, s.n_units,
           ROUND(1.0 - CAST(s.disg AS DOUBLE) / (3.0 * s.n_units), 6)
               AS p_bar,
           ROUND(CAST(g.sum_sq AS DOUBLE)
                 / (CAST(g.n_ratings AS DOUBLE) * g.n_ratings), 6) AS p_e,
           ROUND(((1.0 - CAST(s.disg AS DOUBLE) / (3.0 * s.n_units))
                  - CAST(g.sum_sq AS DOUBLE)
                    / (CAST(g.n_ratings AS DOUBLE) * g.n_ratings))
                 / NULLIF(1.0 - CAST(g.sum_sq AS DOUBLE)
                    / (CAST(g.n_ratings AS DOUBLE) * g.n_ratings), 0.0), 6)
               AS kappa
    FROM s JOIN g ON g.lang = s.lang
    ORDER BY s.lang
    """,
    tags=("pipeline", "evaluation", "agreement"),
)
def eval_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fleiss' kappa per language over the SAME three nominal 4-category
    size-class raters as `eval_krippendorff_nominal` — the fixed-panel
    chance-corrected agreement (expected agreement from the marginal
    category distribution, vs alpha's disagreement-mass formulation; the
    two disagree exactly when the panel is small or marginals are
    skewed, which is why both get reported).  With m=3 raters per unit
    the per-unit agreement collapses onto the SAME two reductions the
    alpha query uses: sum_c n_uc^2 = 9 - 2*d_u gives
    P_bar = 1 - sum_u d_u / (3N), and P_e = sum_c (n_c/3N)^2 =
    sum_sq/(3N)^2; kappa = (P_bar - P_e)/(1 - P_e).

    Exactness: both terms are exact integer ratios (disg, sum_sq, N are
    integers); the final expression is one shared double tree.  Verified
    against a direct per-unit P_u construction in the test twin.

    Scale shape: identical to the alpha query — one scan to two integers
    per language plus one count per (language, category); kappa is
    arithmetic on the joined 5-row frame."""
    t = Tables(spark, sf_dir)
    u = _kn_units(t, _KN_CAT_A, _KN_CAT_B_SPARK, _KN_CAT_C_SPARK)
    s = _kn_pair_disagreement(u)
    g = _kn_cells(u).groupBy("lang").agg(
        F.sum("n_c").cast("bigint").alias("n_ratings"),
        F.sum(F.col("n_c") * F.col("n_c")).cast("bigint").alias("sum_sq"),
    )
    p_bar = 1.0 - F.col("disg").cast("double") / (3.0 * F.col("n_units"))
    p_e = F.col("sum_sq").cast("double") / (
        F.col("n_ratings").cast("double") * F.col("n_ratings")
    )
    return (
        s.join(g, "lang")
        .select(
            "lang",
            "n_units",
            F.round(p_bar, 6).alias("p_bar"),
            F.round(p_e, 6).alias("p_e"),
            # NULLIF degenerate guard: single-category marginals make
            # P_e exactly 1 (sum_sq = n^2, the ratio is FP-exact) and
            # kappa undefined — both engines surface NULL.
            F.round(
                (p_bar - p_e) / F.nullif(1.0 - p_e, F.lit(0.0)), 6
            ).alias("kappa"),
        )
        .orderBy("lang")
    )


# Ordinal ranks for the size classes (S<M<L<XL) — the interval-metric
# alpha weights disagreements by squared rank distance.
_KN_RANK_A = (
    "CASE WHEN n_chars < 150 THEN 1 WHEN n_chars < 300 THEN 2 "
    "WHEN n_chars < 450 THEN 3 ELSE 4 END"
)
_KN_RANK_B_SQL = (
    "CASE WHEN len(string_split(text, ' ')) < 27 THEN 1 "
    "WHEN len(string_split(text, ' ')) < 54 THEN 2 "
    "WHEN len(string_split(text, ' ')) < 81 THEN 3 ELSE 4 END"
)
_KN_RANK_B_SPARK = (
    "CASE WHEN size(split(text, ' ')) < 27 THEN 1 "
    "WHEN size(split(text, ' ')) < 54 THEN 2 "
    "WHEN size(split(text, ' ')) < 81 THEN 3 ELSE 4 END"
)
_KN_RANK_C_SQL = (
    "CASE WHEN len(list_distinct(string_split(lower(text), ' '))) < 14 "
    "THEN 1 "
    "WHEN len(list_distinct(string_split(lower(text), ' '))) < 22 THEN 2 "
    "WHEN len(list_distinct(string_split(lower(text), ' '))) < 28 THEN 3 "
    "ELSE 4 END"
)
_KN_RANK_C_SPARK = (
    "CASE WHEN size(array_distinct(split(lower(text), ' '))) < 14 THEN 1 "
    "WHEN size(array_distinct(split(lower(text), ' '))) < 22 THEN 2 "
    "WHEN size(array_distinct(split(lower(text), ' '))) < 28 THEN 3 "
    "ELSE 4 END"
)


@query(
    "eval_krippendorff_interval",
    oracle=f"""
    WITH u AS (
        SELECT lang,
               {_KN_RANK_A} AS ra,
               {_KN_RANK_B_SQL} AS rb,
               {_KN_RANK_C_SQL} AS rc
        FROM documents
    ),
    s AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_units,
               CAST(SUM((ra - rb) * (ra - rb) + (ra - rc) * (ra - rc)
                        + (rb - rc) * (rb - rc)) AS BIGINT) AS d2
        FROM u GROUP BY lang
    ),
    m AS (
        SELECT lang, cat, CAST(COUNT(*) AS BIGINT) AS n_c
        FROM (
            SELECT lang, ra AS cat FROM u
            UNION ALL SELECT lang, rb FROM u
            UNION ALL SELECT lang, rc FROM u
        ) GROUP BY lang, cat
    ),
    g AS (
        SELECT lang, CAST(SUM(n_c) AS BIGINT) AS n_ratings FROM m
        GROUP BY lang
    ),
    de AS (
        SELECT a.lang,
               CAST(SUM(a.n_c * b.n_c * (a.cat - b.cat) * (a.cat - b.cat))
                    AS BIGINT) AS de_pairs
        FROM m a JOIN m b ON a.lang = b.lang AND a.cat < b.cat
        GROUP BY a.lang
    )
    SELECT s.lang, s.n_units, s.d2, de.de_pairs,
           ROUND(1.0 - CAST((g.n_ratings - 1) AS DOUBLE) * s.d2
                       / NULLIF(2.0 * de.de_pairs, 0.0), 6) AS alpha
    FROM s
    JOIN g ON g.lang = s.lang
    LEFT JOIN de ON de.lang = s.lang
    ORDER BY s.lang
    """,
    tags=("pipeline", "evaluation", "agreement"),
)
def eval_krippendorff_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha with the INTERVAL metric over the ordinal
    size-class ranks (S<M<L<XL mapped to 1..4) — completing the
    metric-alpha family (binary r12, nominal r13 stretch): near-miss
    disagreements (M vs L) now cost less than extreme ones (S vs XL),
    which is the honest coefficient for graded rating scales.  For
    complete data, alpha = 1 - (n-1) * sum_u d2_u / ((m-1) *
    sum_{{c<k}} n_c n_k (c-k)^2) with d2_u the unit's pairwise squared
    rank disagreement — the NOMINAL closed form is the special case
    where every squared distance is 1.

    Exactness: d2_u, the marginal cells and the expected-disagreement
    pair sum are all exact integers (the pair sum is a <=4x4 cell
    self-join per language); only the final ratio is double.  Verified
    against a brute-force weighted-coincidence construction in the twin
    test.

    Scale shape: identical to the nominal query — one scan to two
    integers per language plus one count per (language, rank); the
    expected term is arithmetic on the bounded cell frame."""
    t = Tables(spark, sf_dir)
    # shared unit/cell reductions (cols keep the family's ca/cb/cc names;
    # the values here are ordinal RANKS 1..4 rather than letter labels)
    u = _kn_units(t, _KN_RANK_A, _KN_RANK_B_SPARK, _KN_RANK_C_SPARK)
    d2 = (
        (F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb"))
        + (F.col("ca") - F.col("cc")) * (F.col("ca") - F.col("cc"))
        + (F.col("cb") - F.col("cc")) * (F.col("cb") - F.col("cc"))
    )
    s = u.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_units"),
        F.sum(d2).cast("bigint").alias("d2"),
    )
    m = _kn_cells(u).localCheckpoint(eager=False)
    g = m.groupBy("lang").agg(
        F.sum("n_c").cast("bigint").alias("n_ratings")
    )
    a = m.select(
        F.col("lang").alias("la"), F.col("cat").alias("ca"),
        F.col("n_c").alias("na"),
    )
    b = m.select(
        F.col("lang").alias("lb"), F.col("cat").alias("cb"),
        F.col("n_c").alias("nb"),
    )
    de = (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("ca") < F.col("cb")))
        .groupBy(F.col("la").alias("lang"))
        .agg(
            F.sum(
                F.col("na") * F.col("nb")
                * (F.col("ca") - F.col("cb")) * (F.col("ca") - F.col("cb"))
            )
            .cast("bigint")
            .alias("de_pairs")
        )
    )
    # NULLIF + LEFT JOIN degenerate guard: a single-rank language has no
    # cell pair at all (de row absent) and zero expected disagreement —
    # the row survives with NULL de_pairs/alpha in both engines.
    alpha = 1.0 - (F.col("n_ratings") - 1).cast("double") * F.col(
        "d2"
    ) / F.nullif(2.0 * F.col("de_pairs"), F.lit(0.0))
    return (
        s.join(g, "lang")
        .join(de, "lang", "left")
        .select(
            "lang", "n_units", "d2", "de_pairs",
            F.round(alpha, 6).alias("alpha"),
        )
        .orderBy("lang")
    )


# Ratio-metric delta, integer-scaled: delta(c,k) = ((c-k)/(c+k))^2 over
# ranks 1..4 has denominators (c+k)^2 in {9,16,25,36,49}; multiplying by
# their LCM 176400 = 2^4*3^2*5^2*7^2 makes EVERY pairwise delta an exact
# integer (e.g. (1,2) -> 19600), so both the observed and the expected
# disagreement are exact BIGINT sums (order-free) and the scale factor
# cancels in the final ratio.  The double division is exact too: the
# numerator is < 2^21 and the quotient is integral.
_KN_RATIO_SCALE = 176400


def _kn_ratio_delta(x: str, y: str) -> str:
    return (
        f"CAST({_KN_RATIO_SCALE} * ({x} - {y}) * ({x} - {y})"
        f" / (({x} + {y}) * ({x} + {y})) AS BIGINT)"
    )


@query(
    "eval_krippendorff_ratio",
    oracle=f"""
    WITH u AS (
        SELECT lang,
               {_KN_RANK_A} AS ra,
               {_KN_RANK_B_SQL} AS rb,
               {_KN_RANK_C_SQL} AS rc
        FROM documents
    ),
    s AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_units,
               CAST(SUM({_kn_ratio_delta('ra', 'rb')}
                        + {_kn_ratio_delta('ra', 'rc')}
                        + {_kn_ratio_delta('rb', 'rc')}) AS BIGINT) AS d2r
        FROM u GROUP BY lang
    ),
    m AS (
        SELECT lang, cat, CAST(COUNT(*) AS BIGINT) AS n_c
        FROM (
            SELECT lang, ra AS cat FROM u
            UNION ALL SELECT lang, rb FROM u
            UNION ALL SELECT lang, rc FROM u
        ) GROUP BY lang, cat
    ),
    g AS (
        SELECT lang, CAST(SUM(n_c) AS BIGINT) AS n_ratings FROM m
        GROUP BY lang
    ),
    de AS (
        SELECT a.lang,
               CAST(SUM(a.n_c * b.n_c * {_kn_ratio_delta('a.cat', 'b.cat')})
                    AS BIGINT) AS de_pairs_r
        FROM m a JOIN m b ON a.lang = b.lang AND a.cat < b.cat
        GROUP BY a.lang
    )
    SELECT s.lang, s.n_units, s.d2r, de.de_pairs_r,
           ROUND(1.0 - CAST((g.n_ratings - 1) AS DOUBLE) * s.d2r
                       / NULLIF(2.0 * de.de_pairs_r, 0.0), 6) AS alpha
    FROM s
    JOIN g ON g.lang = s.lang
    LEFT JOIN de ON de.lang = s.lang
    ORDER BY s.lang
    """,
    tags=("pipeline", "evaluation", "agreement"),
)
def eval_krippendorff_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Krippendorff's alpha with the RATIO metric over the size-class
    ranks — completing the metric family (binary r12, nominal/interval
    r13, VERDICT r13 stretch #9): delta(c,k) = ((c-k)/(c+k))^2, the
    honest coefficient for ratio-scale judgments where disagreeing
    between 1 and 2 (a 2x gap) matters more than between 3 and 4.

    Exactness: the metric is integer-scaled by 176400 (the LCM of every
    (c+k)^2 denominator over ranks 1..4 — see `_KN_RATIO_SCALE`), so the
    observed and expected disagreements are exact BIGINT sums and the
    scale cancels in the final ratio; only that last division is double.
    Verified against the textbook weighted-coincidence construction in
    the twin test.

    Scale shape: identical to the nominal/interval queries — one scan to
    two integers per language plus one count per (language, rank); the
    expected term is arithmetic on the bounded <=4x4 cell frame."""
    t = Tables(spark, sf_dir)
    u = _kn_units(t, _KN_RANK_A, _KN_RANK_B_SPARK, _KN_RANK_C_SPARK)
    d2r = (
        F.expr(_kn_ratio_delta("ca", "cb"))
        + F.expr(_kn_ratio_delta("ca", "cc"))
        + F.expr(_kn_ratio_delta("cb", "cc"))
    )
    s = u.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_units"),
        F.sum(d2r).cast("bigint").alias("d2r"),
    )
    m = _kn_cells(u).localCheckpoint(eager=False)
    g = m.groupBy("lang").agg(
        F.sum("n_c").cast("bigint").alias("n_ratings")
    )
    a = m.select(
        F.col("lang").alias("la"), F.col("cat").alias("ca"),
        F.col("n_c").alias("na"),
    )
    b = m.select(
        F.col("lang").alias("lb"), F.col("cat").alias("cb"),
        F.col("n_c").alias("nb"),
    )
    de = (
        a.join(b, (F.col("la") == F.col("lb")) & (F.col("ca") < F.col("cb")))
        .groupBy(F.col("la").alias("lang"))
        .agg(
            F.sum(
                F.col("na") * F.col("nb")
                * F.expr(_kn_ratio_delta("ca", "cb"))
            )
            .cast("bigint")
            .alias("de_pairs_r")
        )
    )
    alpha = 1.0 - (F.col("n_ratings") - 1).cast("double") * F.col(
        "d2r"
    ) / F.nullif(2.0 * F.col("de_pairs_r"), F.lit(0.0))
    return (
        s.join(g, "lang")
        .join(de, "lang", "left")
        .select(
            "lang", "n_units", "d2r", "de_pairs_r",
            F.round(alpha, 6).alias("alpha"),
        )
        .orderBy("lang")
    )


_BD_R9 = "CAST(ROUND({t}, 9) AS DECIMAL(38,9))"


@query(
    "eval_brier_decomposition",
    oracle=f"""
    WITH gd AS (
        SELECT CAST(x AS DOUBLE) AS xd,
               CAST(COUNT(*) AS DOUBLE) AS nd,
               CAST(SUM(y) AS DOUBLE) AS kd
        FROM (
            SELECT CAST(ROUND({_SQL_SCORE}, 3) AS DECIMAL(4,3)) AS x,
                   CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
            FROM events
        )
        GROUP BY x
    ),
    tot AS (
        SELECT CAST(SUM(nd) AS DOUBLE) AS n, CAST(SUM(kd) AS DOUBLE) AS k
        FROM gd
    ),
    terms AS (
        SELECT CAST(SUM({_BD_R9.format(
                   t="nd * xd * xd - 2 * xd * kd + kd")}) AS DOUBLE)
                   AS brier_num,
               CAST(SUM({_BD_R9.format(
                   t="nd * (xd - kd / nd) * (xd - kd / nd)")}) AS DOUBLE)
                   AS rel_num,
               CAST(SUM({_BD_R9.format(
                   t="nd * (kd / nd - t.k / t.n) * (kd / nd - t.k / t.n)")})
                   AS DOUBLE) AS res_num
        FROM gd, tot t
        GROUP BY t.n, t.k
    )
    SELECT CAST(t.n AS BIGINT) AS n_rows,
           ROUND(terms.brier_num / t.n, 6) AS brier,
           ROUND(terms.rel_num / t.n, 6) AS reliability,
           ROUND(terms.res_num / t.n, 6) AS resolution,
           ROUND(t.k / t.n * (1.0 - t.k / t.n), 6) AS uncertainty
    FROM terms, tot t
    """,
    tags=("pipeline", "evaluation", "calibration"),
)
def eval_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Murphy decomposition of the Brier score at the FORECAST grain:
    Brier = reliability - resolution + uncertainty, with bins = distinct
    rounded scores — the grain where forecasts within a bin are constant,
    so the three-term identity is EXACT (equal-width binning leaves
    within-bin variance/covariance residuals; the common dashboards
    quietly drop them).  Reliability is the calibration penalty ECE
    squares, resolution rewards forecasts that separate the base rate,
    uncertainty is the label's own variance — the full answer to 'is
    this score good because it is calibrated or because it is sharp?'.

    Exactness: one score-grain reduction; every term rides the
    ROUND(.,9)->DECIMAL order-free contract; base-rate and readout are
    arithmetic on a 1-row frame.  The identity (brier == rel - res +
    unc) and a numpy replay are pinned in the twin test.

    Scale shape: one corpus scan to the <=1001-row grain, one grain
    aggregate, 1-row arithmetic — the Platt-family posture."""
    t = Tables(spark, sf_dir)
    gd = (
        t.events.select(
            F.round(_score(), 3).cast("decimal(4,3)").alias("x"),
            (F.col("event_type") == "purchase").cast("int").alias("y"),
        )
        .groupBy("x")
        .agg(
            F.count("*").cast("double").alias("nd"),
            F.sum("y").cast("double").alias("kd"),
        )
        .selectExpr("CAST(x AS DOUBLE) AS xd", "nd", "kd")
        .localCheckpoint(eager=False)
    )
    tot = gd.agg(
        F.expr("CAST(SUM(nd) AS DOUBLE)").alias("n"),
        F.expr("CAST(SUM(kd) AS DOUBLE)").alias("k"),
    )
    r9 = lambda e: F.expr(_BD_R9.format(t=e))  # noqa: E731
    terms = (
        gd.crossJoin(F.broadcast(tot))
        .groupBy("n", "k")
        .agg(
            F.sum(r9("nd * xd * xd - 2 * xd * kd + kd"))
            .cast("double")
            .alias("brier_num"),
            F.sum(r9("nd * (xd - kd / nd) * (xd - kd / nd)"))
            .cast("double")
            .alias("rel_num"),
            F.sum(r9("nd * (kd / nd - k / n) * (kd / nd - k / n)"))
            .cast("double")
            .alias("res_num"),
        )
    )
    return terms.selectExpr(
        "CAST(n AS BIGINT) AS n_rows",
        "ROUND(brier_num / n, 6) AS brier",
        "ROUND(rel_num / n, 6) AS reliability",
        "ROUND(res_num / n, 6) AS resolution",
        "ROUND(k / n * (1.0 - k / n), 6) AS uncertainty",
    )


_WSR_PAIR_SQL = """
        SELECT user_id,
               CAST(SUM(CASE WHEN day(ts) <= 15
                             THEN CAST(value AS DECIMAL(12,2)) END)
                    AS DOUBLE)
                 / NULLIF(COUNT(CASE WHEN day(ts) <= 15 THEN 1 END), 0)
                 AS v_before,
               CAST(SUM(CASE WHEN day(ts) > 15
                             THEN CAST(value AS DECIMAL(12,2)) END)
                    AS DOUBLE)
                 / NULLIF(COUNT(CASE WHEN day(ts) > 15 THEN 1 END), 0)
                 AS v_after
        FROM events GROUP BY user_id
"""


@query(
    "eval_wilcoxon_signed_rank",
    oracle=f"""
    WITH pairs AS ({_WSR_PAIR_SQL}),
    d AS (
        SELECT v_after - v_before AS d FROM pairs
        WHERE v_before IS NOT NULL AND v_after IS NOT NULL
          AND v_after <> v_before
    ),
    vg AS (
        SELECT abs(d) AS v, CAST(COUNT(*) AS BIGINT) AS n_v,
               CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS npos_v
        FROM d GROUP BY abs(d)
    ),
    cum AS (
        SELECT v, n_v, npos_v,
               SUM(n_v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - n_v
                   AS cum_before
        FROM vg
    ),
    tot AS (
        SELECT CAST(SUM(n_v) AS BIGINT) AS n,
               SUM(CAST(n_v AS DOUBLE) * n_v * n_v - n_v) AS tie_term
        FROM vg
    ),
    wp AS (
        SELECT SUM(npos_v * (cum_before + (n_v + 1) / 2.0)) AS w_plus
        FROM cum
    )
    SELECT n,
           ROUND(w_plus, 1) AS w_plus,
           ROUND(n * (n + 1) / 4.0, 1) AS mu,
           ROUND((w_plus - n * (n + 1) / 4.0)
                 / sqrt(n * (n + 1.0) * (2 * n + 1) / 24.0
                        - tie_term / 48.0), 6) AS z
    FROM wp CROSS JOIN tot
    """,
    tags=("pipeline", "evaluation", "ab-test", "nonparametric", "paired"),
)
def eval_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilcoxon signed-rank test — the PAIRED sibling of
    `eval_mannwhitney_u` (which compares independent samples): did each
    user's mean event value shift between the first and second half of
    the month?  Zero differences drop (standard), |d| ranks with
    midranks, W+ sums the positive-difference ranks, and z uses the
    tie-corrected normal approximation sigma^2 = n(n+1)(2n+1)/24 -
    sum(t^3 - t)/48.

    Exactness: per-user half-means are exact decimal sums over counts
    (shared expression strings); the |d| value grain makes every
    midrank term an exact integer-or-half; W+/mu exact doubles; z one
    shared expression, 6-dp.

    Scale shape: the corpus collapses to user grain, then to the |d|
    value grain; the ONLY global ordering runs at that grain through
    `distributed_running_sums` (the Mann-Whitney posture) — zero
    single-partition windows at any cardinality."""
    from auron_spark.operators.window import distributed_running_sums

    t = Tables(spark, sf_dir)
    dec = lambda p: F.sum(  # noqa: E731
        F.when(p, F.col("value").cast("decimal(12,2)"))
    ).cast("double")
    cnt = lambda p: F.count(F.when(p, F.lit(1)))  # noqa: E731
    first = F.dayofmonth("ts") <= 15
    pairs = t.events.groupBy("user_id").agg(
        (dec(first) / F.nullif(cnt(first), F.lit(0))).alias("v_before"),
        (dec(~first) / F.nullif(cnt(~first), F.lit(0))).alias("v_after"),
    )
    d = pairs.where(
        "v_before IS NOT NULL AND v_after IS NOT NULL"
        " AND v_after <> v_before"
    ).selectExpr("v_after - v_before AS d")
    vg = d.groupBy(F.abs("d").alias("v")).agg(
        F.count("*").cast("long").alias("n_v"),
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
        .cast("long")
        .alias("npos_v"),
    )
    cum = distributed_running_sums(vg, [F.asc("v")], ["n_v"]).withColumn(
        "cum_before", F.col("cum_n_v") - F.col("n_v")
    )
    tot = vg.agg(
        F.sum("n_v").cast("bigint").alias("n"),
        F.sum(
            F.col("n_v").cast("double") * F.col("n_v") * F.col("n_v")
            - F.col("n_v")
        ).alias("tie_term"),
    )
    wp = cum.agg(
        F.sum(
            F.col("npos_v") * (F.col("cum_before") + (F.col("n_v") + 1) / 2.0)
        ).alias("w_plus")
    )
    n = F.col("n")
    mu = n * (n + 1) / 4.0
    sigma = F.sqrt(
        n * (n + 1.0) * (2 * n + 1) / 24.0 - F.col("tie_term") / 48.0
    )
    return wp.join(F.broadcast(tot)).select(
        "n",
        F.round("w_plus", 1).alias("w_plus"),
        F.round(mu, 1).alias("mu"),
        F.round((F.col("w_plus") - mu) / sigma, 6).alias("z"),
    )


def _friedman_rank(j: str, a: str, b: str) -> str:
    """Midrank of v{j} among the user's three condition values — pure
    CASE arithmetic, shared by both engines."""
    return (
        f"1.0 + (CASE WHEN v{j} > v{a} THEN 1 ELSE 0 END"
        f" + CASE WHEN v{j} > v{b} THEN 1 ELSE 0 END)"
        f" + (CASE WHEN v{j} = v{a} THEN 1 ELSE 0 END"
        f" + CASE WHEN v{j} = v{b} THEN 1 ELSE 0 END) / 2.0"
    )


_FRIEDMAN_THIRD_SQL = """
        SELECT user_id,
               CAST(SUM(CASE WHEN day(ts) <= 10
                             THEN CAST(value AS DECIMAL(12,2)) END)
                    AS DOUBLE)
                 / NULLIF(COUNT(CASE WHEN day(ts) <= 10 THEN 1 END), 0)
                 AS v1,
               CAST(SUM(CASE WHEN day(ts) BETWEEN 11 AND 20
                             THEN CAST(value AS DECIMAL(12,2)) END)
                    AS DOUBLE)
                 / NULLIF(COUNT(CASE WHEN day(ts) BETWEEN 11 AND 20
                                     THEN 1 END), 0) AS v2,
               CAST(SUM(CASE WHEN day(ts) > 20
                             THEN CAST(value AS DECIMAL(12,2)) END)
                    AS DOUBLE)
                 / NULLIF(COUNT(CASE WHEN day(ts) > 20 THEN 1 END), 0)
                 AS v3
        FROM events GROUP BY user_id
"""


@query(
    "eval_friedman_test",
    oracle=f"""
    WITH thirds AS ({_FRIEDMAN_THIRD_SQL}),
    t AS (
        SELECT v1, v2, v3 FROM thirds
        WHERE v1 IS NOT NULL AND v2 IS NOT NULL AND v3 IS NOT NULL
    ),
    r AS (
        SELECT {_friedman_rank('1', '2', '3')} AS r1,
               {_friedman_rank('2', '1', '3')} AS r2,
               {_friedman_rank('3', '1', '2')} AS r3
        FROM t
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(r1) AS rs1, SUM(r2) AS rs2, SUM(r3) AS rs3,
               SUM(r1 * r1 + r2 * r2 + r3 * r3) AS a
        FROM r
    )
    SELECT CAST(n AS BIGINT) AS n,
           CAST(ROUND(rs1, 1) AS DOUBLE) AS rank_sum_1,
           CAST(ROUND(rs2, 1) AS DOUBLE) AS rank_sum_2,
           CAST(ROUND(rs3, 1) AS DOUBLE) AS rank_sum_3,
           ROUND(2.0 * (rs1 * rs1 + rs2 * rs2 + rs3 * rs3
                        - 12.0 * n * n)
                 / NULLIF(a - 12.0 * n, 0.0), 6) AS chi2,
           CAST(2 AS BIGINT) AS df
    FROM s
    """,
    tags=("pipeline", "evaluation", "ab-test", "nonparametric", "paired"),
)
def eval_friedman_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Friedman test — the k-sample PAIRED completion of the
    nonparametric family (Mann-Whitney: 2 independent samples; Wilcoxon
    signed-rank: 2 paired; here k=3 paired conditions): did each user's
    mean event value differ across the three thirds of the month?
    Within-user midranks are pure CASE arithmetic over the user's three
    values (k is a constant, so ranking is MAP-SIDE — no window of any
    kind), and the tie-corrected statistic chi2 = (k-1)(sum R_j^2 -
    n^2 k(k+1)^2/4) / (A - n k(k+1)^2/4) with A = sum r_ij^2 reduces to
    the classic 12/(nk(k+1)) form when ties are absent.

    Exactness: half-month means are exact decimal ratios; midranks are
    integer-or-half; rank sums and A exact doubles; chi2 one shared
    expression with a NULLIF guard for the all-ties degenerate corpus.

    Scale shape: ONE corpus scan to user grain, map-side rank
    arithmetic, one scalar reduction — the strongest posture in the
    family (even the value-grain prefix device is unnecessary)."""
    t = Tables(spark, sf_dir)
    dec = lambda p: F.sum(  # noqa: E731
        F.when(p, F.col("value").cast("decimal(12,2)"))
    ).cast("double")
    cnt = lambda p: F.count(F.when(p, F.lit(1)))  # noqa: E731
    d = F.dayofmonth("ts")
    c1, c2, c3 = d <= 10, (d >= 11) & (d <= 20), d > 20
    thirds = t.events.groupBy("user_id").agg(
        (dec(c1) / F.nullif(cnt(c1), F.lit(0))).alias("v1"),
        (dec(c2) / F.nullif(cnt(c2), F.lit(0))).alias("v2"),
        (dec(c3) / F.nullif(cnt(c3), F.lit(0))).alias("v3"),
    )
    r = thirds.where(
        "v1 IS NOT NULL AND v2 IS NOT NULL AND v3 IS NOT NULL"
    ).selectExpr(
        f"{_friedman_rank('1', '2', '3')} AS r1",
        f"{_friedman_rank('2', '1', '3')} AS r2",
        f"{_friedman_rank('3', '1', '2')} AS r3",
    )
    s = r.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("r1").alias("rs1"),
        F.sum("r2").alias("rs2"),
        F.sum("r3").alias("rs3"),
        F.sum(
            F.col("r1") * F.col("r1")
            + F.col("r2") * F.col("r2")
            + F.col("r3") * F.col("r3")
        ).alias("a"),
    )
    chi2 = (
        2.0
        * (
            F.col("rs1") * F.col("rs1")
            + F.col("rs2") * F.col("rs2")
            + F.col("rs3") * F.col("rs3")
            - 12.0 * F.col("n") * F.col("n")
        )
        / F.nullif(F.col("a") - 12.0 * F.col("n"), F.lit(0.0))
    )
    return s.select(
        "n",
        F.round("rs1", 1).cast("double").alias("rank_sum_1"),
        F.round("rs2", 1).cast("double").alias("rank_sum_2"),
        F.round("rs3", 1).cast("double").alias("rank_sum_3"),
        F.round(chi2, 6).cast("double").alias("chi2"),
        F.lit(2).cast("bigint").alias("df"),
    )


@query(
    "eval_cochran_q",
    oracle=f"""
    WITH u AS (
        SELECT lang,
               {_RATER_A_SQL} AS ra,
               {_RATER_B_SQL} AS rb,
               {_RATER_C_SQL} AS rc
        FROM documents
    ),
    s AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_units,
               CAST(SUM(ra) AS BIGINT) AS c1,
               CAST(SUM(rb) AS BIGINT) AS c2,
               CAST(SUM(rc) AS BIGINT) AS c3,
               CAST(SUM(ra + rb + rc) AS BIGINT) AS r_tot,
               CAST(SUM((ra + rb + rc) * (ra + rb + rc)) AS BIGINT)
                   AS r_sq
        FROM u GROUP BY lang
    )
    SELECT lang, n_units, c1, c2, c3,
           ROUND(CAST(3 * 2 AS DOUBLE)
                 * ((CAST(c1 AS DOUBLE) - r_tot / 3.0)
                    * (CAST(c1 AS DOUBLE) - r_tot / 3.0)
                    + (CAST(c2 AS DOUBLE) - r_tot / 3.0)
                    * (CAST(c2 AS DOUBLE) - r_tot / 3.0)
                    + (CAST(c3 AS DOUBLE) - r_tot / 3.0)
                    * (CAST(c3 AS DOUBLE) - r_tot / 3.0))
                 / NULLIF(3.0 * r_tot - r_sq, 0.0), 6) AS q_stat,
           CAST(2 AS BIGINT) AS df
    FROM s
    ORDER BY lang
    """,
    tags=("pipeline", "evaluation", "agreement", "nonparametric",
          "paired"),
)
def eval_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cochran's Q per language over the three binary document raters —
    the k-sample generalization of `eval_mcnemar_test` (its k=2 special
    case) and the binary companion of `eval_friedman_test`: do the
    three pass/fail rules flag the SAME proportion of documents, or is
    one systematically stricter?  Q = k(k-1) * sum_j (C_j - R/k)^2 /
    (k*R - sum_i R_i^2) with C_j the per-rater pass totals and R_i the
    per-document pass count — asymptotically chi^2 with k-1 df.

    Exactness: everything reduces to six integers per language (unit
    count, three column totals, row-total sum and sum of squares — the
    SAME sufficient statistics as `eval_cronbach_alpha`); Q is one
    shared double expression with a NULLIF guard for the degenerate
    all-pass/all-fail corpus.

    Scale shape: one scan, map-side constant-state reduction per
    language, arithmetic on the 5-row frame — the agreement-family
    posture; no window, no join."""
    t = Tables(spark, sf_dir)
    ra, rb = _raters()
    rc = F.when(
        F.size(F.array_distinct(F.split(F.lower(F.col("text")), " "))) >= 25,
        1,
    ).otherwise(0)
    tot = ra + rb + rc
    s = t.parallel("documents", "doc_id").select(
        "lang", ra.alias("ra"), rb.alias("rb"), rc.alias("rc"),
        tot.alias("rt"),
    ).groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_units"),
        F.sum("ra").cast("bigint").alias("c1"),
        F.sum("rb").cast("bigint").alias("c2"),
        F.sum("rc").cast("bigint").alias("c3"),
        F.sum("rt").cast("bigint").alias("r_tot"),
        F.sum(F.col("rt") * F.col("rt")).cast("bigint").alias("r_sq"),
    )
    mean = F.col("r_tot") / 3.0
    dev = lambda c: (  # noqa: E731
        (F.col(c).cast("double") - mean) * (F.col(c).cast("double") - mean)
    )
    q = (
        6.0
        * (dev("c1") + dev("c2") + dev("c3"))
        / F.nullif(3.0 * F.col("r_tot") - F.col("r_sq"), F.lit(0.0))
    )
    return s.select(
        "lang", "n_units", "c1", "c2", "c3",
        F.round(q, 6).alias("q_stat"),
        F.lit(2).cast("bigint").alias("df"),
    ).orderBy("lang")


@query(
    "eval_page_trend_test",
    oracle=f"""
    WITH thirds AS ({_FRIEDMAN_THIRD_SQL}),
    t AS (
        SELECT v1, v2, v3 FROM thirds
        WHERE v1 IS NOT NULL AND v2 IS NOT NULL AND v3 IS NOT NULL
    ),
    r AS (
        SELECT {_friedman_rank('1', '2', '3')} AS r1,
               {_friedman_rank('2', '1', '3')} AS r2,
               {_friedman_rank('3', '1', '2')} AS r3
        FROM t
    ),
    s AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               SUM(1 * r1 + 2 * r2 + 3 * r3) AS l_stat
        FROM r
    )
    SELECT n,
           CAST(ROUND(l_stat, 1) AS DOUBLE) AS l_stat,
           CAST(ROUND(n * 3 * 16 / 4.0, 1) AS DOUBLE) AS mu,
           ROUND((l_stat - n * 3 * 16 / 4.0)
                 / NULLIF(sqrt(n * 9.0 * 4 * 8 / 144.0), 0.0), 6) AS z
    FROM s
    """,
    tags=("pipeline", "evaluation", "nonparametric", "paired", "trend"),
)
def eval_page_trend_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's L test for ORDERED alternatives over the same per-user
    month-third ranks as `eval_friedman_test`: Friedman asks 'do the
    three periods differ at all?', Page asks the sharper monotone
    question 'does each user's value TREND across the month?' —
    L = sum_j j*R_j weights later periods' ranks more, with
    mu = n*k*(k+1)^2/4 and sigma^2 = n*k^2*(k+1)(k^2-1)/144 for the
    normal approximation (k=3: mu = 12n, sigma^2 = n*288/144 = 2n).

    Exactness: the rank expressions are the shared Friedman CASE
    arithmetic (integer-or-half); L and mu exact doubles; z one shared
    expression with a NULLIF guard for n = 0.

    Scale shape: identical to Friedman — one scan to user grain,
    map-side ranks, one scalar reduction; no window, no join."""
    t = Tables(spark, sf_dir)
    dec = lambda p: F.sum(  # noqa: E731
        F.when(p, F.col("value").cast("decimal(12,2)"))
    ).cast("double")
    cnt = lambda p: F.count(F.when(p, F.lit(1)))  # noqa: E731
    d = F.dayofmonth("ts")
    c1, c2, c3 = d <= 10, (d >= 11) & (d <= 20), d > 20
    thirds = t.events.groupBy("user_id").agg(
        (dec(c1) / F.nullif(cnt(c1), F.lit(0))).alias("v1"),
        (dec(c2) / F.nullif(cnt(c2), F.lit(0))).alias("v2"),
        (dec(c3) / F.nullif(cnt(c3), F.lit(0))).alias("v3"),
    )
    r = thirds.where(
        "v1 IS NOT NULL AND v2 IS NOT NULL AND v3 IS NOT NULL"
    ).selectExpr(
        f"{_friedman_rank('1', '2', '3')} AS r1",
        f"{_friedman_rank('2', '1', '3')} AS r2",
        f"{_friedman_rank('3', '1', '2')} AS r3",
    )
    s = r.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(
            1 * F.col("r1") + 2 * F.col("r2") + 3 * F.col("r3")
        ).alias("l_stat"),
    )
    n = F.col("n")
    mu = n * 12.0
    sigma = F.sqrt(n * 2.0)
    return s.select(
        "n",
        F.round("l_stat", 1).cast("double").alias("l_stat"),
        F.round(mu, 1).cast("double").alias("mu"),
        F.round(
            (F.col("l_stat") - mu) / F.nullif(sigma, F.lit(0.0)), 6
        ).alias("z"),
    )


_CONF_ALPHA = 0.1  # target 90% coverage


@query(
    "eval_conformal_coverage",
    oracle=f"""
    WITH mdl AS (
        SELECT o_orderpriority,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (WHERE o_orderkey % 2 = 0) AS DOUBLE)
               / COUNT(*) FILTER (WHERE o_orderkey % 2 = 0) AS mu
        FROM orders GROUP BY o_orderpriority
    ),
    resid AS (
        SELECT o.o_orderpriority, o.o_orderkey, o.o_orderkey % 2 = 0 AS is_cal,
               abs(CAST(o.o_totalprice AS DOUBLE) - m.mu) AS r
        FROM orders o JOIN mdl m USING (o_orderpriority)
    ),
    cal AS (
        SELECT o_orderpriority, r,
               ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                  ORDER BY r, o_orderkey) AS rk,
               COUNT(*) OVER (PARTITION BY o_orderpriority) AS n_cal
        FROM resid WHERE is_cal
    ),
    qhat AS (
        SELECT o_orderpriority, n_cal,
               CAST(CEIL((1.0 - {_CONF_ALPHA}) * (n_cal + 1)) AS BIGINT)
                   AS k,
               r AS q
        FROM cal
        WHERE rk = CAST(CEIL((1.0 - {_CONF_ALPHA}) * (n_cal + 1)) AS BIGINT)
    ),
    tst AS (
        SELECT t.o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN t.r <= q.q THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_covered
        FROM resid t JOIN qhat q USING (o_orderpriority)
        WHERE NOT t.is_cal
        GROUP BY t.o_orderpriority
    )
    SELECT q.o_orderpriority,
           CAST(q.n_cal AS BIGINT) AS n_cal, q.k, tst.n_test,
           ROUND(q.q, 6) AS qhat,
           ROUND(CAST(tst.n_covered AS DOUBLE) / tst.n_test, 6)
               AS coverage
    FROM qhat q JOIN tst USING (o_orderpriority)
    ORDER BY q.o_orderpriority
    """,
    tags=("pipeline", "evaluation", "conformal", "calibration"),
)
def eval_conformal_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction intervals with GROUP-CONDITIONAL
    (Mondrian) calibration (Vovk et al.; Angelopoulos-Bates 2021) — the
    distribution-free uncertainty wrapper an LLM-pipeline puts around
    any scorer: per priority class, the even-orderkey half calibrates
    (residuals |price - class mean| against the calibration-half mean
    as the 'model'), qhat is the EXACT ceil((1-alpha)(n+1))-th order
    statistic of calibration residuals, and the odd half reports
    empirical coverage of mu +- qhat — the finite-sample >= 1-alpha
    guarantee, group-conditional because each class calibrates alone.

    Exactness: the class means are exact decimal sums as doubles;
    residuals are |double - double| on identical inputs; qhat is an
    ORDER STATISTIC (no interpolation — rank via row_number with a
    deterministic tie order), so both engines pick the identical row;
    coverage is an integer ratio.

    Scale shape: one aggregate to class grain (broadcast model), one
    residual map, the order statistic via a class-partitioned window
    (never global — classes partition; a single-class corpus would
    route through the distributed-rank devices), one coverage
    aggregate.  The fact shuffles once on the class key."""
    t = Tables(spark, sf_dir)
    o = t.orders
    is_cal = F.col("o_orderkey") % 2 == 0
    mdl = o.groupBy("o_orderpriority").agg(
        (
            F.sum(
                F.when(
                    is_cal, F.col("o_totalprice").cast("decimal(18,2)")
                )
            ).cast("double")
            / F.sum(F.when(is_cal, 1).otherwise(0))
        ).alias("mu")
    )
    resid = (
        o.join(F.broadcast(mdl), "o_orderpriority")
        .select(
            "o_orderpriority",
            "o_orderkey",
            is_cal.alias("is_cal"),
            F.abs(
                F.col("o_totalprice").cast("double") - F.col("mu")
            ).alias("r"),
        )
        # resid feeds BOTH the calibration window and the test-side
        # coverage aggregate: without the cut the orders scan + model
        # broadcast re-plan under each branch (r15 review #2 — the
        # 'fact shuffles once' claim needs the reuse to be literal).
        .localCheckpoint(eager=False)
    )
    # ADVICE r15 #1: tie-break the order statistic on a genuinely
    # distinguishing column (o_orderkey), not the constant partition key,
    # so the 'deterministic tie order' claim holds even if a non-r column
    # of the selected row is ever emitted.
    w = Window.partitionBy("o_orderpriority").orderBy("r", "o_orderkey")
    cal = (
        resid.where("is_cal")
        .withColumn("rk", F.row_number().over(w))
        .withColumn(
            "n_cal", F.count("*").over(Window.partitionBy("o_orderpriority"))
        )
    )
    k = F.ceil((1.0 - _CONF_ALPHA) * (F.col("n_cal") + 1)).cast("bigint")
    qhat = (
        cal.where(F.col("rk") == k)
        .select(
            "o_orderpriority",
            F.col("n_cal").cast("bigint").alias("n_cal"),
            k.alias("k"),
            F.col("r").alias("q"),
        )
        # qhat (a |classes|-row model frame) feeds the test-side join AND
        # the final report join — cut once so the rank window subtree is
        # not evaluated twice (r15 review #2).
        .localCheckpoint(eager=False)
    )
    tst = (
        resid.where(~F.col("is_cal"))
        .join(F.broadcast(qhat), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            F.sum(F.when(F.col("r") <= F.col("q"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_covered"),
        )
    )
    return (
        qhat.join(tst, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_cal",
            "k",
            "n_test",
            F.round("q", 6).alias("qhat"),
            F.round(
                F.col("n_covered").cast("double") / F.col("n_test"), 6
            ).alias("coverage"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "eval_conformal_global_scale",
    oracle=f"""
    WITH mdl AS (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    FILTER (WHERE o_orderkey % 2 = 0) AS DOUBLE)
               / COUNT(*) FILTER (WHERE o_orderkey % 2 = 0) AS mu
        FROM orders
    ),
    resid AS (
        SELECT o_orderkey % 2 = 0 AS is_cal,
               abs(CAST(o_totalprice AS DOUBLE) - m.mu) AS r
        FROM orders o CROSS JOIN mdl m
    ),
    cal AS (
        SELECT r,
               ROW_NUMBER() OVER (ORDER BY r) AS rk,
               COUNT(*) OVER () AS n_cal
        FROM resid WHERE is_cal
    ),
    qhat AS (
        SELECT CAST(n_cal AS BIGINT) AS n_cal,
               CAST(CEIL((1.0 - {_CONF_ALPHA}) * (n_cal + 1)) AS BIGINT)
                   AS k,
               r AS q
        FROM cal
        WHERE rk = CAST(CEIL((1.0 - {_CONF_ALPHA}) * (n_cal + 1)) AS BIGINT)
    ),
    tst AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
               CAST(SUM(CASE WHEN t.r <= q.q THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_covered
        FROM resid t CROSS JOIN qhat q
        WHERE NOT t.is_cal
    )
    SELECT q.n_cal, q.k, tst.n_test,
           ROUND(q.q, 6) AS qhat,
           ROUND(CAST(tst.n_covered AS DOUBLE) / tst.n_test, 6) AS coverage
    FROM qhat q CROSS JOIN tst
    """,
    tags=("pipeline", "evaluation", "conformal", "distributed-scale"),
)
def eval_conformal_global_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SINGLE-CLASS split-conformal calibration at the distributed-rank
    grain — the variant `eval_conformal_coverage`'s docstring promises
    (VERDICT r15 stretch #8): with no class to partition by, the qhat
    order statistic would otherwise funnel every calibration residual
    through ONE window task.  Instead the k-th order statistic rides the
    covered-rank device (`agg_median_distributed_scale`'s contract):
    residuals collapse to the distinct-VALUE grain,
    `distributed_running_sums` assigns global cumulative counts (range
    exchange + `_pid` windows + the constant 32-long offset map), and
    qhat is the unique value whose cumulative interval covers
    k = ceil((1-alpha)(n_cal+1)).

    Exactness: mu is an exact decimal sum as double; residuals are
    |double - double| on identical IEEE inputs, so the value grain
    groups bit-identical doubles (Spark-side only — the oracle ranks
    rows directly); k's ceil runs on the same double text; coverage is
    an integer ratio.

    Scale shape: one 1-row model aggregate (broadcast), one residual
    map over the fact (checkpointed once, feeding calibration AND
    test sides), one value-grain reduce, the prefix device, a 1-row
    covered-rank filter broadcast into the test-side count.  Zero
    single-partition windows (plan-gated:
    `test_conformal_global_no_single_partition_window`)."""
    from auron_spark.operators.window import distributed_running_sums

    t = Tables(spark, sf_dir)
    o = t.orders
    is_cal = F.col("o_orderkey") % 2 == 0
    mdl = o.agg(
        (
            F.sum(
                F.when(is_cal, F.col("o_totalprice").cast("decimal(18,2)"))
            ).cast("double")
            / F.sum(F.when(is_cal, 1).otherwise(0))
        ).alias("mu")
    )
    resid = (
        o.join(F.broadcast(mdl))
        .select(
            is_cal.alias("is_cal"),
            F.abs(
                F.col("o_totalprice").cast("double") - F.col("mu")
            ).alias("r"),
        )
        # feeds the calibration value grain AND the test-side coverage
        # count — cut once (the eval_conformal_coverage reuse contract)
        .localCheckpoint(eager=False)
    )
    vg = (
        resid.where("is_cal")
        .groupBy("r")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    cum = distributed_running_sums(vg, [F.asc("r")], ["cnt"])
    tot = cum.agg(F.max("cum_cnt").cast("long").alias("n_cal"))
    x = cum.join(F.broadcast(tot))
    k = F.ceil((1.0 - _CONF_ALPHA) * (F.col("n_cal") + 1)).cast("long")
    covers = (F.col("cum_cnt") - F.col("cnt") < k) & (F.col("cum_cnt") >= k)
    qhat = x.filter(covers).select(
        F.col("n_cal").cast("bigint").alias("n_cal"),
        k.cast("bigint").alias("k"),
        F.col("r").alias("q"),
    )
    tst = (
        resid.where(~F.col("is_cal"))
        .join(F.broadcast(qhat))
        .agg(
            F.count("*").cast("bigint").alias("n_test"),
            F.sum(
                F.when(F.col("r") <= F.col("q"), 1).otherwise(0)
            ).cast("bigint").alias("n_covered"),
        )
    )
    return (
        qhat.join(F.broadcast(tst))
        .select(
            "n_cal", "k", "n_test",
            F.round("q", 6).alias("qhat"),
            F.round(
                F.col("n_covered").cast("double") / F.col("n_test"), 6
            ).alias("coverage"),
        )
    )
