"""Decimal arithmetic semantics.

The reference supports 64-bit decimals natively (precision ≤ 18,
`NativeConverters.scala:104-107`) with Spark's precision-widening rules
(`decimal.arithOp`, `spark_check_overflow.rs`, `spark_make_decimal.rs`); wider
decimals fall back to JVM Spark.  Here the full 38-digit Spark decimal engine
is first-class; this module pins the arithmetic semantics against the oracle
(+, -, × are exact in any engine; ÷ result *scale* is engine-specific, so the
cross-engine check divides in double and the Spark-specific scale rule is
asserted in tests/test_functions.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.registry import query
from auron_spark.tables import Tables


@query(
    "fn_decimal_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                + CAST(l_tax AS DECIMAL(18,2)) AS DOUBLE) AS dec_add,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                - CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS dec_sub,
           CAST(CAST(l_quantity AS DECIMAL(18,2))
                * CAST(l_discount AS DECIMAL(18,2)) AS DOUBLE) AS dec_mul,
           ROUND(CAST(l_extendedprice AS DOUBLE) / CAST(l_quantity AS DOUBLE), 9)
             AS div_dbl,
           CAST(-CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS dec_neg,
           CAST(ABS(CAST(l_discount AS DECIMAL(18,2))
                    - CAST(l_tax AS DECIMAL(18,2))) AS DOUBLE) AS dec_absdiff,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE)
             AS dec_round1,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) % 100 AS DOUBLE) AS dec_mod
    FROM lineitem
    WHERE l_orderkey < 300
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("function", "decimal"),
)
def fn_decimal_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DECIMAL +, -, ×, unary minus, abs, round, mod — exact in both engines;
    division is checked in double (see module docstring)."""
    t = Tables(spark, sf_dir)
    ep = F.col("l_extendedprice").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    return (
        t.lineitem.filter(F.col("l_orderkey") < 300)
        .select(
            "l_orderkey",
            "l_linenumber",
            (ep + tax).cast("double").alias("dec_add"),
            (ep - disc).cast("double").alias("dec_sub"),
            (qty * disc).cast("double").alias("dec_mul"),
            F.round(
                F.col("l_extendedprice").cast("double")
                / F.col("l_quantity").cast("double"),
                9,
            ).alias("div_dbl"),
            (-ep).cast("double").alias("dec_neg"),
            F.abs(disc - tax).cast("double").alias("dec_absdiff"),
            F.round(ep, 1).cast("double").alias("dec_round1"),
            (ep % 100).cast("double").alias("dec_mod"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "fn_decimal_agg_overflow_guard",
    oracle="""
    SELECT l_returnflag,
           -- round to scale 2 before the double cast: duckdb's int128->double
           -- at scale 10 double-rounds in the last ulp; at scale 2 the cast
           -- is exact (value*100 < 2^53)
           CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(38,10))), 2) AS DOUBLE)
             AS sum_wide,
           CAST(MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS min_d,
           CAST(MAX(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS max_d
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("function", "decimal", "agg"),
)
def fn_decimal_agg_overflow_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregation over wide DECIMAL(38,10) — past the reference's native
    64-bit bound (it would fall back to JVM Spark; here it is the same
    engine).  Exact in both engines."""
    t = Tables(spark, sf_dir)
    wide = F.col("l_extendedprice").cast("decimal(38,10)")
    d2 = F.col("l_extendedprice").cast("decimal(18,2)")
    return (
        t.lineitem.groupBy("l_returnflag")
        .agg(
            F.round(F.sum(wide), 2).cast("double").alias("sum_wide"),
            F.min(d2).cast("double").alias("min_d"),
            F.max(d2).cast("double").alias("max_d"),
        )
        .orderBy("l_returnflag")
    )
