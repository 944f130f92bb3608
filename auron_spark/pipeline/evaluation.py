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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
