"""Distributed closed-form regression: multivariate OLS and ridge by exact
DECIMAL normal equations — the model-fitting pattern that scales to 100 TB
because the data never moves: one partial/final aggregate reduces the corpus
to a handful of cross-moments (a k x k Gram matrix with k=2 features here),
and the solve is constant-time arithmetic on a group-grain frame.  This is
how linear probes, calibration layers and per-segment elasticity models are
fit over warehouse-scale data (the same reduce-to-sufficient-statistics
shape as `sim_kmeans_lloyd`'s k x dim partials).

Extends the single-variable `agg_linear_regression` (functions/stats.py) to
the multivariate case with an explicit Cramer solve, per group.

Exactness contract: all power sums are exact DECIMAL (the lineitem doubles
are 2-dp), with the big cross-products floored to integers before the
double cast (the `agg_corr_covar` 2^53 + rounding-tie guard); the
centered-covariance solve is then the same double expression tree in both
engines, rounded at 6dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.registry import query
from auron_spark.tables import Tables

#: Ridge penalty on the population-covariance scale (documented: lambda is
#: added to the centered Gram diagonal S11/S22, i.e. per-row, not to b0).
_RIDGE_LAMBDA = 0.05

_SQL_POWERSUMS = """
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(9,2))) AS DOUBLE) AS sx1,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sx2,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(9,2))
                         * CAST(l_quantity AS DECIMAL(9,2))
                         AS DECIMAL(19,4))) AS DOUBLE) AS s11,
           CAST(SUM(CAST(CAST(l_discount AS DECIMAL(4,2))
                         * CAST(l_discount AS DECIMAL(4,2))
                         AS DECIMAL(19,4))) AS DOUBLE) AS s22,
           CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(9,2))
                         * CAST(l_discount AS DECIMAL(4,2))
                         AS DECIMAL(19,4))) AS DOUBLE) AS s12,
           CAST(FLOOR(SUM(CAST(CAST(l_quantity AS DECIMAL(9,2))
                               * CAST(l_extendedprice AS DECIMAL(18,2))
                               AS DECIMAL(28,4)))) AS DOUBLE) AS s1y,
           CAST(SUM(CAST(CAST(l_discount AS DECIMAL(4,2))
                         * CAST(l_extendedprice AS DECIMAL(18,2))
                         AS DECIMAL(28,4))) AS DOUBLE) AS s2y,
           CAST(FLOOR(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                               * CAST(l_extendedprice AS DECIMAL(18,2))
                               AS DECIMAL(37,4)))) AS DOUBLE) AS syy
    FROM lineitem
    GROUP BY l_returnflag
"""

# Centered second moments (population scale) and the 2x2 Cramer solve,
# shared verbatim between OLS (lam = 0) and ridge (lam > 0).
_SQL_SOLVE = """
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           s11 / n - (sx1 / n) * (sx1 / n) + {lam} AS c11,
           s22 / n - (sx2 / n) * (sx2 / n) + {lam} AS c22,
           s12 / n - (sx1 / n) * (sx2 / n) AS c12,
           s1y / n - (sx1 / n) * (sy / n) AS c1y,
           s2y / n - (sx2 / n) * (sy / n) AS c2y,
           syy / n - (sy / n) * (sy / n) AS cyy,
           sx1 / n AS mx1, sx2 / n AS mx2, sy / n AS my
    FROM ps
"""

_SQL_COEFS = """
    SELECT l_returnflag, n,
           ROUND((c1y * c22 - c2y * c12)
                 / (c11 * c22 - c12 * c12), 6) AS b_quantity,
           ROUND((c2y * c11 - c1y * c12)
                 / (c11 * c22 - c12 * c12), 6) AS b_discount,
           ROUND(my - (c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) * mx1
                    - (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) * mx2,
                 6) AS intercept,
           ROUND(((c1y * c22 - c2y * c12) / (c11 * c22 - c12 * c12) * c1y
                  + (c2y * c11 - c1y * c12) / (c11 * c22 - c12 * c12) * c2y)
                 / cyy, 6) AS r2
    FROM m
    ORDER BY l_returnflag
"""


def _powersums(t: Tables) -> DataFrame:
    x1 = F.col("l_quantity").cast("decimal(9,2)")
    x2 = F.col("l_discount").cast("decimal(4,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    return t.lineitem.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum(x1).cast("double").alias("sx1"),
        F.sum(x2).cast("double").alias("sx2"),
        F.sum(y).cast("double").alias("sy"),
        F.sum((x1 * x1).cast("decimal(19,4)")).cast("double").alias("s11"),
        F.sum((x2 * x2).cast("decimal(19,4)")).cast("double").alias("s22"),
        F.sum((x1 * x2).cast("decimal(19,4)")).cast("double").alias("s12"),
        F.floor(F.sum((x1 * y).cast("decimal(28,4)"))).cast("double").alias("s1y"),
        F.sum((x2 * y).cast("decimal(28,4)")).cast("double").alias("s2y"),
        F.floor(F.sum((y * y).cast("decimal(37,4)"))).cast("double").alias("syy"),
    )


def _solve(ps: DataFrame, lam: float) -> DataFrame:
    """Centered moments (+ ridge diagonal) and the Cramer 2x2 solve."""
    n = F.col("n")
    c11 = F.col("s11") / n - (F.col("sx1") / n) * (F.col("sx1") / n) + lam
    c22 = F.col("s22") / n - (F.col("sx2") / n) * (F.col("sx2") / n) + lam
    c12 = F.col("s12") / n - (F.col("sx1") / n) * (F.col("sx2") / n)
    c1y = F.col("s1y") / n - (F.col("sx1") / n) * (F.col("sy") / n)
    c2y = F.col("s2y") / n - (F.col("sx2") / n) * (F.col("sy") / n)
    cyy = F.col("syy") / n - (F.col("sy") / n) * (F.col("sy") / n)
    m = ps.select(
        "l_returnflag",
        n.cast("bigint").alias("n"),
        c11.alias("c11"),
        c22.alias("c22"),
        c12.alias("c12"),
        c1y.alias("c1y"),
        c2y.alias("c2y"),
        cyy.alias("cyy"),
        (F.col("sx1") / n).alias("mx1"),
        (F.col("sx2") / n).alias("mx2"),
        (F.col("sy") / n).alias("my"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    # Stage b1/b2 as named columns so the final projection references them
    # instead of inlining the Cramer subtree 6x — same arithmetic, but the
    # analyzed plan stays small (the inlined version cost ~4 s of Catalyst
    # analysis per build at any data size).
    solved = m.select(
        "*",
        ((F.col("c1y") * F.col("c22") - F.col("c2y") * F.col("c12")) / det).alias("b1"),
        ((F.col("c2y") * F.col("c11") - F.col("c1y") * F.col("c12")) / det).alias("b2"),
    )
    return solved.select(
        "l_returnflag",
        "n",
        F.round(F.col("b1"), 6).alias("b_quantity"),
        F.round(F.col("b2"), 6).alias("b_discount"),
        F.round(
            F.col("my") - F.col("b1") * F.col("mx1") - F.col("b2") * F.col("mx2"),
            6,
        ).alias("intercept"),
        F.round(
            (F.col("b1") * F.col("c1y") + F.col("b2") * F.col("c2y"))
            / F.col("cyy"),
            6,
        ).alias("r2"),
    ).orderBy("l_returnflag")


@query(
    "feature_ols_two_var",
    oracle=f"""
    WITH ps AS ({_SQL_POWERSUMS}),
    m AS ({_SQL_SOLVE.format(lam="0.0")})
    {_SQL_COEFS}
    """,
    tags=("pipeline", "features", "regression"),
    bench=True,
)
def feature_ols_two_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-feature OLS per return-flag segment — extendedprice regressed
    on quantity and discount via centered normal equations and an
    explicit Cramer 2x2 solve, with R².  The multivariate extension of
    `agg_linear_regression`: one pass reduces each segment to ten exact
    cross-moments; every coefficient is then arithmetic on a 3-row frame.

    Scale shape: a single partial/final aggregate at segment grain is the
    only corpus-sized work — the Gram reduction ships k(k+3)/2 + 1
    numbers per group regardless of row count, the exact shape that
    survives a 1000-executor 100 TB fit.  No collect, no iteration, no
    driver-side linear algebra."""
    return _solve(_powersums(Tables(spark, sf_dir)), 0.0)


@query(
    "feature_ridge_closed_form",
    oracle=f"""
    WITH ps AS ({_SQL_POWERSUMS}),
    m AS ({_SQL_SOLVE.format(lam=_RIDGE_LAMBDA)})
    {_SQL_COEFS}
    """,
    tags=("pipeline", "features", "regression"),
)
def feature_ridge_closed_form(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ridge regression (L2, lambda on the covariance-scale Gram diagonal,
    intercept unpenalized) in the same one-pass closed form as
    `feature_ols_two_var` — the remedy when features are collinear
    (quantity x discount here are nearly orthogonal, so the shrinkage is
    visible but small, which is itself the correct read).  r2 reports the
    fraction of variance explained by the SHRUNK coefficients — always
    <= the OLS r2, the regularization cost.

    Identical scale shape: sufficient statistics in one aggregate, then
    constant-time arithmetic; retuning lambda re-solves WITHOUT
    rescanning the corpus (the power sums are reusable), which is why
    closed-form ridge sweeps are cheap at any scale."""
    return _solve(_powersums(Tables(spark, sf_dir)), _RIDGE_LAMBDA)


_KF = 5

# Fold power sums stay exact DECIMAL through the complement subtraction
# (train = total - fold), get FLOOR'd to integer units, and only then cast
# to DOUBLE — the same guard `_powersums` uses, applied after the exact
# subtraction so train-side and test-side sums share one contract.
_SQL_FOLD_SUMS = """
    SELECT CAST(('0x' || substr(md5(CAST(l_orderkey * 8 + l_linenumber
                                         AS VARCHAR)), 1, 8)) AS BIGINT)
               % 5 AS fold,
           COUNT(*) AS n,
           SUM(CAST(l_quantity AS DECIMAL(9,2))) AS sx,
           SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
           SUM(CAST(CAST(l_quantity AS DECIMAL(9,2))
                    * CAST(l_quantity AS DECIMAL(9,2))
                    AS DECIMAL(19,4))) AS sxx,
           SUM(CAST(CAST(l_quantity AS DECIMAL(9,2))
                    * CAST(l_extendedprice AS DECIMAL(18,2))
                    AS DECIMAL(28,4))) AS sxy,
           SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_extendedprice AS DECIMAL(18,2))
                    AS DECIMAL(37,4))) AS syy
    FROM lineitem
    GROUP BY 1
"""


@query(
    "eval_kfold_ols_oos",
    oracle=f"""
    WITH fs AS ({_SQL_FOLD_SUMS}),
    tot AS (
        SELECT SUM(n) AS tn, SUM(sx) AS tsx, SUM(sy) AS tsy,
               SUM(sxx) AS tsxx, SUM(sxy) AS tsxy, SUM(syy) AS tsyy
        FROM fs
    ),
    d AS (
        SELECT fold,
               CAST(n AS BIGINT) AS n_test,
               CAST(tn - n AS BIGINT) AS n_train,
               CAST(FLOOR(sx) AS DOUBLE) AS fsx,
               CAST(FLOOR(sy) AS DOUBLE) AS fsy,
               CAST(FLOOR(sxx) AS DOUBLE) AS fsxx,
               CAST(FLOOR(sxy) AS DOUBLE) AS fsxy,
               CAST(FLOOR(syy) AS DOUBLE) AS fsyy,
               CAST(tn - n AS DOUBLE) AS cn,
               CAST(FLOOR(tsx - sx) AS DOUBLE) AS csx,
               CAST(FLOOR(tsy - sy) AS DOUBLE) AS csy,
               CAST(FLOOR(tsxx - sxx) AS DOUBLE) AS csxx,
               CAST(FLOOR(tsxy - sxy) AS DOUBLE) AS csxy
        FROM fs, tot
    ),
    coef AS (
        SELECT fold, n_test, n_train, fsx, fsy, fsxx, fsxy, fsyy,
               CAST(n_test AS DOUBLE) AS fn,
               (cn * csxy - csx * csy) / (cn * csxx - csx * csx) AS b,
               (csy - (cn * csxy - csx * csy) / (cn * csxx - csx * csx)
                      * csx) / cn AS a
        FROM d
    )
    SELECT fold, n_train, n_test,
           ROUND(b, 6) AS slope,
           ROUND(a, 6) AS intercept,
           ROUND(sqrt((fsyy - 2 * a * fsy - 2 * b * fsxy
                       + fn * a * a + 2 * a * b * fsx + b * b * fsxx) / fn),
                 6) AS oos_rmse
    FROM coef
    ORDER BY fold
    """,
    tags=("pipeline", "evaluation", "regression", "cross-validation"),
    bench=True,
)
def eval_kfold_ols_oos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-fold cross-validated OLS (extendedprice ~ quantity) with
    out-of-fold RMSE — the model-selection loop, run WITHOUT 5 training
    passes: one aggregate reduces the corpus to per-fold sufficient
    statistics (n, Σx, Σy, Σx², Σxy, Σy²), each fold's training moments
    are total-minus-fold, the closed-form solve is constant-time, and the
    held-out SSE expands algebraically onto the SAME fold sums
    (Σ(y-a-bx)² = Σy² - 2aΣy - 2bΣxy + na² + 2abΣx + b²Σx²), so
    evaluation needs no second data pass either.  One corpus scan total,
    for a 5-model cross-validation — the pattern that makes CV free at
    100 TB.

    Folds are md5-hash-assigned on the lineitem PK (deterministic, both
    engines identical); all sums are exact DECIMAL through the complement
    subtraction, FLOOR'd to integer units, then one double expression
    tree shared with the oracle."""
    t = Tables(spark, sf_dir)
    x = F.col("l_quantity").cast("decimal(9,2)")
    y = F.col("l_extendedprice").cast("decimal(18,2)")
    fold = (
        F.conv(
            F.substring(
                F.md5((F.col("l_orderkey") * 8 + F.col("l_linenumber")).cast("string")),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % _KF
    )
    fs = t.lineitem.groupBy(fold.alias("fold")).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * x).cast("decimal(19,4)")).alias("sxx"),
        F.sum((x * y).cast("decimal(28,4)")).alias("sxy"),
        F.sum((y * y).cast("decimal(37,4)")).alias("syy"),
    )
    # Totals as unpartitioned window sums over the 5-row fold frame: the
    # single-subtree formulation — a crossJoin with fs.agg(...) would make
    # Catalyst duplicate the corpus scan (plan-gated to exactly one scan).
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    fs = fs.select(
        "fold", "n", "sx", "sy", "sxx", "sxy", "syy",
        F.sum("n").over(w_all).alias("tn"),
        F.sum("sx").over(w_all).alias("tsx"),
        F.sum("sy").over(w_all).alias("tsy"),
        F.sum("sxx").over(w_all).alias("tsxx"),
        F.sum("sxy").over(w_all).alias("tsxy"),
        F.sum("syy").over(w_all).alias("tsyy"),
    )
    d = fs.select(
        "fold",
        F.col("n").cast("bigint").alias("n_test"),
        (F.col("tn") - F.col("n")).cast("bigint").alias("n_train"),
        F.floor(F.col("sx")).cast("double").alias("fsx"),
        F.floor(F.col("sy")).cast("double").alias("fsy"),
        F.floor(F.col("sxx")).cast("double").alias("fsxx"),
        F.floor(F.col("sxy")).cast("double").alias("fsxy"),
        F.floor(F.col("syy")).cast("double").alias("fsyy"),
        (F.col("tn") - F.col("n")).cast("double").alias("cn"),
        F.floor(F.col("tsx") - F.col("sx")).cast("double").alias("csx"),
        F.floor(F.col("tsy") - F.col("sy")).cast("double").alias("csy"),
        F.floor(F.col("tsxx") - F.col("sxx")).cast("double").alias("csxx"),
        F.floor(F.col("tsxy") - F.col("sxy")).cast("double").alias("csxy"),
    )
    cn, csx, csy, csxx, csxy = (
        F.col("cn"), F.col("csx"), F.col("csy"), F.col("csxx"), F.col("csxy")
    )
    b = (cn * csxy - csx * csy) / (cn * csxx - csx * csx)
    coef = d.select(
        "fold", "n_test", "n_train", "fsx", "fsy", "fsxx", "fsxy", "fsyy",
        F.col("n_test").cast("double").alias("fn"),
        b.alias("b"),
        ((csy - b * csx) / cn).alias("a"),
    )
    a_, b_, fn = F.col("a"), F.col("b"), F.col("fn")
    sse = (
        F.col("fsyy")
        - 2 * a_ * F.col("fsy")
        - 2 * b_ * F.col("fsxy")
        + fn * a_ * a_
        + 2 * a_ * b_ * F.col("fsx")
        + b_ * b_ * F.col("fsxx")
    )
    return coef.select(
        "fold",
        "n_train",
        "n_test",
        F.round(b_, 6).alias("slope"),
        F.round(a_, 6).alias("intercept"),
        F.round(F.sqrt(sse / fn), 6).alias("oos_rmse"),
    ).orderBy("fold")

# ---------------------------------------------------------------------------
# Newton / IRLS logistic regression via contingency-grain sufficient
# statistics.  Reference parity: the reference's agg framework fits models
# through the same PARTIAL/FINAL reduction its UDAF lifecycle exposes
# (native-engine/datafusion-ext-plans/src/agg/mod.rs); here the whole GLM fit
# is expressed as two grain-level aggregates.

# Both engines evaluate the IDENTICAL expression strings (Spark `F.expr` /
# DuckDB SQL share these templates verbatim), so the double trees agree
# bit-for-bit; every sum is a per-row 9-dp-rounded DECIMAL(38,9) — exact and
# summation-order-free (the `text_word_entropy` transcendental contract).
_LOGREG_GRAIN_COLS = """
    CAST(n AS DOUBLE) AS nd, CAST(k AS DOUBLE) AS kd,
    CAST(x1 AS DOUBLE) AS xd1, CAST(x2 AS DOUBLE) AS xd2
"""


def _glm_sums(w: str, r: str) -> dict[str, str]:
    """Weighted Gram / gradient sums for one Newton/IRLS step of ANY GLM:
    `w` is the per-grain working weight and `r` the per-grain working
    residual (SQL expressions over the grain columns and, after the first
    step, the model columns b0/b1/b2).  Bernoulli (`_logreg_sums`) and
    Poisson (`feature_poisson_glm`) differ only in these two strings."""
    terms = {
        "s00": w,
        "s01": f"{w} * xd1",
        "s02": f"{w} * xd2",
        "s11": f"{w} * xd1 * xd1",
        "s12": f"{w} * xd1 * xd2",
        "s22": f"{w} * xd2 * xd2",
        "g0": r,
        "g1": f"{r} * xd1",
        "g2": f"{r} * xd2",
    }
    return {
        name: f"CAST(SUM(CAST(ROUND({t}, 9) AS DECIMAL(38,9))) AS DOUBLE)"
        for name, t in terms.items()
    }


def _logreg_sums(p: str) -> dict[str, str]:
    """Bernoulli specialization: working weight n·p(1-p), residual k-n·p
    at success probability `p` (an SQL expression over nd/kd/xd1/xd2 and,
    for iteration 2, the model columns b0/b1/b2)."""
    return _glm_sums(f"(nd * {p} * (1.0 - {p}))", f"(kd - nd * {p})")


# Symmetric 3x3 Newton step via the explicit adjugate (cofactors of the
# Hessian [[s00,s01,s02],[s01,s11,s12],[s02,s12,s22]]); delta_j is then
# (adj row_j . gradient) / det — constant-time arithmetic on a 1-row frame.
_LOGREG_DET = (
    "(s00 * (s11 * s22 - s12 * s12) - s01 * (s01 * s22 - s12 * s02)"
    " + s02 * (s01 * s12 - s11 * s02))"
)
_LOGREG_DELTAS = {
    "d0": "((s11 * s22 - s12 * s12) * g0 + (s02 * s12 - s01 * s22) * g1"
          f" + (s01 * s12 - s11 * s02) * g2) / {_LOGREG_DET}",
    "d1": "((s02 * s12 - s01 * s22) * g0 + (s00 * s22 - s02 * s02) * g1"
          f" + (s01 * s02 - s00 * s12) * g2) / {_LOGREG_DET}",
    "d2": "((s01 * s12 - s11 * s02) * g0 + (s01 * s02 - s00 * s12) * g1"
          f" + (s00 * s11 - s01 * s01) * g2) / {_LOGREG_DET}",
}

# Iteration 2's per-group success probability under the iteration-1 model.
_LOGREG_P2 = "(1.0 / (1.0 + exp(-(b0 + b1 * xd1 + b2 * xd2))))"

_SQL_LOGREG_SUMS_1 = ",\n           ".join(
    f"{sql} AS {name}" for name, sql in _logreg_sums("0.5").items()
)
_SQL_LOGREG_SUMS_2 = ",\n           ".join(
    f"{sql} AS {name}" for name, sql in _logreg_sums(_LOGREG_P2).items()
)
_SQL_LOGREG_FINAL = f"""
    SELECT CAST(n_rows AS BIGINT) AS n_rows,
           ROUND(b0 + {_LOGREG_DELTAS['d0']}, 6) AS intercept,
           ROUND(b1 + {_LOGREG_DELTAS['d1']}, 6) AS b_quantity,
           ROUND(b2 + {_LOGREG_DELTAS['d2']}, 6) AS b_discount,
           ROUND(sqrt(g0 * g0 + g1 * g1 + g2 * g2), 6) AS grad_norm
    FROM s2
"""


@query(
    "feature_logreg_newton",
    oracle=f"""
    WITH g AS (
        SELECT CAST(l_quantity AS INT) AS x1,
               CAST(l_discount AS DECIMAL(4,2)) AS x2,
               COUNT(*) AS n,
               COUNT(*) FILTER (WHERE l_returnflag = 'R') AS k
        FROM lineitem GROUP BY 1, 2
    ),
    gd AS (SELECT {_LOGREG_GRAIN_COLS} FROM g),
    s1 AS (
        SELECT CAST(SUM(nd) AS DOUBLE) AS n_rows,
           {_SQL_LOGREG_SUMS_1}
        FROM gd
    ),
    b1 AS (
        SELECT n_rows,
               {_LOGREG_DELTAS['d0']} AS b0,
               {_LOGREG_DELTAS['d1']} AS b1,
               {_LOGREG_DELTAS['d2']} AS b2
        FROM s1
    ),
    s2 AS (
        SELECT n_rows, b0, b1, b2,
           {_SQL_LOGREG_SUMS_2}
        FROM gd, b1
        GROUP BY n_rows, b0, b1, b2
    )
    {_SQL_LOGREG_FINAL}
    """,
    tags=("pipeline", "features", "regression", "classification"),
    bench=True,
)
def feature_logreg_newton(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression (return-flag=R ~ quantity + discount) fit by TWO
    Newton/IRLS steps from beta=0, entirely as sufficient-statistic
    aggregates — the quality-classifier training pattern at 100 TB: the
    corpus collapses ONCE to its (quantity, discount-cents) contingency
    grain (<= 561 rows: exact integer counts n and successes k), and every
    Newton iteration is then one weighted Gram/gradient aggregate over that
    grain plus a constant-time symmetric 3x3 adjugate solve on a 1-row
    model frame.  No per-row sigmoid ever touches corpus-sized data, no
    collect, no driver-side linear algebra; iterating to convergence costs
    one tiny aggregate per step, never a rescan.

    Exactness: iteration 1 (p=0.5) is pure rational arithmetic; iteration
    2's sigmoid terms follow the `text_word_entropy` transcendental
    contract (per-row ROUND(.,9) -> DECIMAL(38,9) sums, order-free), and
    both engines evaluate the SAME expression strings (shared templates via
    `F.expr`), so the 6-dp coefficients agree bit-exactly.  Prototype
    cross-check: numpy IRLS on the same grain gives (-0.695, -0.000240,
    0.2378) at iteration 2 — reproduced by both engines.
    """
    t = Tables(spark, sf_dir)
    g = (
        t.lineitem.groupBy(
            F.col("l_quantity").cast("int").alias("x1"),
            F.col("l_discount").cast("decimal(4,2)").alias("x2"),
        )
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("k"),
        )
        # Consumed by BOTH Newton iterations: pin the grain frame so the
        # corpus aggregate compiles and runs once (single-subtree rule).
        .localCheckpoint(eager=False)
    )
    gd = g.selectExpr(*[c.strip() for c in _LOGREG_GRAIN_COLS.split(",")])
    s1 = gd.agg(
        F.expr("CAST(SUM(nd) AS DOUBLE)").alias("n_rows"),
        *[F.expr(sql).alias(n) for n, sql in _logreg_sums("0.5").items()],
    )
    b1 = s1.selectExpr(
        "n_rows",
        f"{_LOGREG_DELTAS['d0']} AS b0",
        f"{_LOGREG_DELTAS['d1']} AS b1",
        f"{_LOGREG_DELTAS['d2']} AS b2",
    )
    # 1-row model frame: broadcast is bounded by construction (the model).
    s2 = (
        gd.crossJoin(F.broadcast(b1))
        .groupBy("n_rows", "b0", "b1", "b2")
        .agg(*[
            F.expr(sql).alias(n)
            for n, sql in _logreg_sums(_LOGREG_P2).items()
        ])
    )
    return s2.selectExpr(
        "CAST(n_rows AS BIGINT) AS n_rows",
        f"ROUND(b0 + {_LOGREG_DELTAS['d0']}, 6) AS intercept",
        f"ROUND(b1 + {_LOGREG_DELTAS['d1']}, 6) AS b_quantity",
        f"ROUND(b2 + {_LOGREG_DELTAS['d2']}, 6) AS b_discount",
        "ROUND(sqrt(g0 * g0 + g1 * g1 + g2 * g2), 6) AS grad_norm",
    )


# Poisson-GLM working terms under the current model (log link): the mean is
# mu = exp(eta), the Newton weight IS mu and the residual y - mu.
_POIS_MU = "exp(b0 + b1 * xd1 + b2 * xd2)"

_SQL_POIS_SUMS = ",\n           ".join(
    f"{sql} AS {name}"
    for name, sql in _glm_sums(_POIS_MU, f"(yd - {_POIS_MU})").items()
)

# Deviance of the final model: 2 * sum(y ln(y/mu) - (y - mu)), each term
# 9-dp-rounded into DECIMAL (order-free; y >= 1 at daily grain).
_SQL_POIS_DEV = (
    "2.0 * CAST(SUM(CAST(ROUND(yd * ln(yd / ({mu})) - (yd - ({mu})), 9) "
    "AS DECIMAL(38,9))) AS DOUBLE)"
).format(mu=_POIS_MU)


@query(
    "feature_poisson_glm",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(ts AS DATE) AS d,
               CAST(COUNT(*) AS DOUBLE) AS yd,
               CASE WHEN isodow(CAST(ts AS DATE)) >= 6
                    THEN 1.0 ELSE 0.0 END AS xd1
        FROM events GROUP BY CAST(ts AS DATE)
    ),
    gd0 AS (
        SELECT yd, xd1,
               CAST(date_diff('day', MIN(d) OVER (), d) AS DOUBLE) AS dd
        FROM daily
    ),
    gd AS (SELECT yd, xd1, dd - AVG(dd) OVER () AS xd2 FROM gd0),
    init AS (
        SELECT ln(SUM(yd) / COUNT(*)) AS b0, 0.0 AS b1, 0.0 AS b2,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM gd
    ),
    s1 AS (
        SELECT n_days, b0, b1, b2,
           {_SQL_POIS_SUMS}
        FROM gd, init
        GROUP BY n_days, b0, b1, b2
    ),
    m1 AS (
        SELECT n_days,
               b0 + {_LOGREG_DELTAS['d0']} AS b0,
               b1 + {_LOGREG_DELTAS['d1']} AS b1,
               b2 + {_LOGREG_DELTAS['d2']} AS b2
        FROM s1
    ),
    s2 AS (
        SELECT n_days, b0, b1, b2,
           {_SQL_POIS_SUMS}
        FROM gd, m1
        GROUP BY n_days, b0, b1, b2
    ),
    m2 AS (
        SELECT n_days,
               b0 + {_LOGREG_DELTAS['d0']} AS b0,
               b1 + {_LOGREG_DELTAS['d1']} AS b1,
               b2 + {_LOGREG_DELTAS['d2']} AS b2,
               ROUND(sqrt(g0 * g0 + g1 * g1 + g2 * g2), 6) AS grad_norm
        FROM s2
    )
    SELECT n_days,
           ROUND(b0, 6) AS intercept,
           ROUND(b1, 6) AS b_weekend,
           ROUND(b2, 6) AS b_trend,
           grad_norm,
           ROUND({_SQL_POIS_DEV}, 6) AS deviance
    FROM gd, m2
    GROUP BY n_days, b0, b1, b2, grad_norm
    """,
    tags=("pipeline", "features", "regression", "glm"),
)
def feature_poisson_glm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson regression (log link) of the daily event count on a
    weekend indicator and a centered linear trend, fit by TWO Newton/IRLS
    steps from the log-mean intercept — completing the GLM family next to
    OLS/ridge (`feature_ols_two_var`) and the Bernoulli
    `feature_logreg_newton`: the count-data model behind traffic
    forecasting and exposure-rate fitting.  The working weight is the
    model mean itself (W = mu) and the residual y - mu, so each step
    reuses the SAME shared Gram/gradient template (`_glm_sums`) and 3x3
    adjugate solve as the logistic fit; the log-mean init makes two steps
    effectively convergent (prototype grad-norm 147.9 -> 0.53).  Reports
    the model deviance 2*sum(y ln(y/mu) - (y - mu)) as the GLM
    goodness-of-fit.

    Exactness: the calendar grain is exact integer counts; mu terms ride
    the ROUND(.,9) -> DECIMAL order-free contract and both engines
    evaluate identical expression strings; init ln() sees the identical
    exact ratio in both engines.

    Scale shape: the only corpus-sized stage is the map-side reduction to
    calendar grain (<= 366 rows/year); iterations are one tiny aggregate
    each over the broadcast model row — per-entity Poisson fits would
    partition the grain by entity key, same as every GLM here."""
    t = Tables(spark, sf_dir)
    daily = t.events.groupBy(F.col("ts").cast("date").alias("d")).agg(
        F.count("*").cast("double").alias("yd"),
        F.max(
            F.when(F.weekday(F.col("ts").cast("date")) >= 5, 1.0).otherwise(0.0)
        ).alias("xd1"),
    )
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    gd0 = daily.select(
        "yd",
        "xd1",
        F.datediff(F.col("d"), F.min("d").over(w_all))
        .cast("double")
        .alias("dd"),
    )
    gd = gd0.select(
        "yd", "xd1", (F.col("dd") - F.avg("dd").over(w_all)).alias("xd2")
    ).localCheckpoint(eager=False)
    init = gd.agg(
        F.expr("ln(SUM(yd) / COUNT(*))").alias("b0"),
        F.lit(0.0).alias("b1"),
        F.lit(0.0).alias("b2"),
        F.count("*").cast("bigint").alias("n_days"),
    )

    def newton_step(model: DataFrame, with_grad: bool) -> DataFrame:
        s = (
            gd.crossJoin(F.broadcast(model))
            .groupBy("n_days", "b0", "b1", "b2")
            .agg(*[
                F.expr(sql).alias(n)
                for n, sql in _glm_sums(
                    _POIS_MU, f"(yd - {_POIS_MU})"
                ).items()
            ])
        )
        cols = [
            "n_days",
            f"b0 + {_LOGREG_DELTAS['d0']} AS b0",
            f"b1 + {_LOGREG_DELTAS['d1']} AS b1",
            f"b2 + {_LOGREG_DELTAS['d2']} AS b2",
        ]
        if with_grad:
            cols.append(
                "ROUND(sqrt(g0 * g0 + g1 * g1 + g2 * g2), 6) AS grad_norm"
            )
        return s.selectExpr(*cols)

    m2 = newton_step(newton_step(init, False), True)
    return (
        gd.crossJoin(F.broadcast(m2))
        .groupBy("n_days", "b0", "b1", "b2", "grad_norm")
        .agg(F.expr(_SQL_POIS_DEV).alias("dev"))
        .selectExpr(
            "n_days",
            "ROUND(b0, 6) AS intercept",
            "ROUND(b1, 6) AS b_weekend",
            "ROUND(b2, 6) AS b_trend",
            "grad_norm",
            "ROUND(dev, 6) AS deviance",
        )
    )


# Fit-quality readout for the Bernoulli GLM: grouped log-likelihood of the
# fitted model (transcendental contract: per-grain ROUND(.,9)->DECIMAL) and
# the closed-form null log-likelihood from the global (K, N) pair.
_LOGREG_LL_TERM = (
    f"kd * ln({_LOGREG_P2}) + (nd - kd) * ln(1.0 - {_LOGREG_P2})"
)
_SQL_LOGREG_LL = (
    f"CAST(SUM(CAST(ROUND({_LOGREG_LL_TERM}, 9) AS DECIMAL(38,9))) "
    "AS DOUBLE)"
)
_SQL_LL_NULL = (
    "(ktot * ln(ktot / ntot) + (ntot - ktot) * ln(1.0 - ktot / ntot))"
)


@query(
    "feature_logreg_fit_quality",
    oracle=f"""
    WITH g AS (
        SELECT CAST(l_quantity AS INT) AS x1,
               CAST(l_discount AS DECIMAL(4,2)) AS x2,
               COUNT(*) AS n,
               COUNT(*) FILTER (WHERE l_returnflag = 'R') AS k
        FROM lineitem GROUP BY 1, 2
    ),
    gd AS (SELECT {_LOGREG_GRAIN_COLS} FROM g),
    s1 AS (
        SELECT CAST(SUM(nd) AS DOUBLE) AS n_rows,
           {_SQL_LOGREG_SUMS_1}
        FROM gd
    ),
    b1 AS (
        SELECT n_rows,
               {_LOGREG_DELTAS['d0']} AS b0,
               {_LOGREG_DELTAS['d1']} AS b1,
               {_LOGREG_DELTAS['d2']} AS b2
        FROM s1
    ),
    s2 AS (
        SELECT n_rows, b0, b1, b2,
           {_SQL_LOGREG_SUMS_2}
        FROM gd, b1
        GROUP BY n_rows, b0, b1, b2
    ),
    m2 AS (
        SELECT n_rows,
               b0 + {_LOGREG_DELTAS['d0']} AS b0,
               b1 + {_LOGREG_DELTAS['d1']} AS b1,
               b2 + {_LOGREG_DELTAS['d2']} AS b2
        FROM s2
    ),
    ll AS (
        SELECT n_rows, {_SQL_LOGREG_LL} AS ll_m
        FROM gd, m2
        GROUP BY n_rows, b0, b1, b2
    ),
    nullm AS (
        SELECT CAST(SUM(kd) AS DOUBLE) AS ktot,
               CAST(SUM(nd) AS DOUBLE) AS ntot
        FROM gd
    )
    SELECT CAST(ll.n_rows AS BIGINT) AS n_rows,
           ROUND({_SQL_LL_NULL}, 6) AS ll_null,
           ROUND(ll.ll_m, 6) AS ll_model,
           ROUND(2.0 * (ll.ll_m - {_SQL_LL_NULL}), 6) AS lr_stat,
           ROUND(1.0 - ll.ll_m / {_SQL_LL_NULL}, 6) AS mcfadden_r2
    FROM ll, nullm
    """,
    tags=("pipeline", "features", "regression", "goodness-of-fit"),
)
def feature_logreg_fit_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fit-quality readout for `feature_logreg_newton` (the model-audit
    half a GLM trainer needs next to its coefficients): grouped Bernoulli
    log-likelihood of the 2-step model, the closed-form null
    log-likelihood (intercept-only model: p0 = K/N, so ll_0 =
    K ln p0 + (N-K) ln(1-p0) needs NO grain sum), the likelihood-ratio
    statistic 2*(ll_model - ll_null) (asymptotically chi^2_2 under the
    null — the 'is this model better than the base rate' test), and
    McFadden's pseudo-R^2 = 1 - ll_model/ll_null.

    Exactness: the Newton chain reuses the proven logreg template
    strings verbatim; the model log-likelihood rides the transcendental
    contract (per-grain ROUND(.,9)->DECIMAL, order-free); the null term
    is a two-number closed form.  Sigmoid output is never exactly 0/1,
    so the logs are total.  Numpy twin in the fuzzer file.

    Scale shape: same as the trainer — one corpus collapse to the <=561
    contingency cells, then model-frame arithmetic; the audit adds ONE
    grain aggregate, not a corpus pass."""
    t = Tables(spark, sf_dir)
    g = (
        t.lineitem.groupBy(
            F.col("l_quantity").cast("int").alias("x1"),
            F.col("l_discount").cast("decimal(4,2)").alias("x2"),
        )
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("k"),
        )
        .localCheckpoint(eager=False)
    )
    gd = g.selectExpr(*[c.strip() for c in _LOGREG_GRAIN_COLS.split(",")])
    s1 = gd.agg(
        F.expr("CAST(SUM(nd) AS DOUBLE)").alias("n_rows"),
        *[F.expr(sql).alias(n) for n, sql in _logreg_sums("0.5").items()],
    )
    b1 = s1.selectExpr(
        "n_rows",
        f"{_LOGREG_DELTAS['d0']} AS b0",
        f"{_LOGREG_DELTAS['d1']} AS b1",
        f"{_LOGREG_DELTAS['d2']} AS b2",
    )
    s2 = (
        gd.crossJoin(F.broadcast(b1))
        .groupBy("n_rows", "b0", "b1", "b2")
        .agg(*[
            F.expr(sql).alias(n)
            for n, sql in _logreg_sums(_LOGREG_P2).items()
        ])
    )
    m2 = s2.selectExpr(
        "n_rows",
        f"b0 + {_LOGREG_DELTAS['d0']} AS b0",
        f"b1 + {_LOGREG_DELTAS['d1']} AS b1",
        f"b2 + {_LOGREG_DELTAS['d2']} AS b2",
    )
    ll = (
        gd.crossJoin(F.broadcast(m2))
        .groupBy("n_rows", "b0", "b1", "b2")
        .agg(F.expr(_SQL_LOGREG_LL).alias("ll_m"))
    )
    nullm = gd.agg(
        F.expr("CAST(SUM(kd) AS DOUBLE)").alias("ktot"),
        F.expr("CAST(SUM(nd) AS DOUBLE)").alias("ntot"),
    )
    return ll.join(F.broadcast(nullm)).selectExpr(
        "CAST(n_rows AS BIGINT) AS n_rows",
        f"ROUND({_SQL_LL_NULL}, 6) AS ll_null",
        "ROUND(ll_m, 6) AS ll_model",
        f"ROUND(2.0 * (ll_m - {_SQL_LL_NULL}), 6) AS lr_stat",
        f"ROUND(1.0 - ll_m / {_SQL_LL_NULL}, 6) AS mcfadden_r2",
    )
