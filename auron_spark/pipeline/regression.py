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
