"""Subquery surface: scalar, correlated, IN/EXISTS/NOT EXISTS, CTEs, HAVING.

Reference: subqueries execute on the JVM and are injected as literals into the
native plan (`NativeConverters.scala:462-474,1536-1550`,
`spark_scalar_subquery_wrapper.rs`) — i.e. the reference's answer is "let
Spark do it".  Ours too, except Spark *is* the engine: Catalyst decorrelates
and plans these as joins.  The queries are TPC-H shapes adapted to the fixture
schema, which makes them double as end-to-end multi-operator coverage.

Scale: every decorrelated subquery becomes a broadcast or shuffled join that
AQE sizes; scalar subqueries evaluate once (single-row exchange), never
per-row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.exprs import SQL_DISC_PRICE, disc_price
from auron_spark.registry import query
from auron_spark.tables import Tables


def _views(t: Tables, spark: SparkSession, *names: str) -> None:
    for n in names:
        getattr(t, n).createOrReplaceTempView(n)


@query(
    "q6_forecast_revenue",
    oracle=f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
    tags=("scan", "filter", "agg"),
    bench=True,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+agg — the pushdown stress test (all four
    predicates reach the parquet reader)."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.filter(
            (F.col("l_shipdate") >= "1996-01-01 00:00:00")
            & (F.col("l_shipdate") < "1997-01-01 00:00:00")
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q4_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-07-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity > 45)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("subquery", "exists", "semi"),
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: correlated EXISTS → decorrelated to a left-semi join."""
    t = Tables(spark, sf_dir)
    _views(t, spark, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate < TIMESTAMP '1997-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    SELECT s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supplier s2
                         WHERE s2.s_nationkey = s.s_nationkey)
    ORDER BY s.s_suppkey
    """,
    tags=("subquery", "correlated", "scalar"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 core shape: correlated scalar subquery (per-group minimum) —
    Catalyst decorrelates to an aggregate + join."""
    t = Tables(spark, sf_dir)
    _views(t, spark, "supplier")
    return spark.sql(
        """
        SELECT s.s_suppkey, s.s_name, s.s_acctbal
        FROM supplier s
        WHERE s.s_acctbal = (SELECT MIN(s2.s_acctbal) FROM supplier s2
                             WHERE s2.s_nationkey = s.s_nationkey)
        ORDER BY s.s_suppkey
        """
    )


@query(
    "q11_important_stock",
    oracle=f"""
    SELECT l_partkey,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS part_value
    FROM lineitem
    GROUP BY l_partkey
    HAVING SUM({SQL_DISC_PRICE}) >
           (SELECT SUM({SQL_DISC_PRICE}) * 0.001 FROM lineitem)
    ORDER BY part_value DESC, l_partkey
    """,
    tags=("subquery", "scalar", "having"),
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: HAVING against an uncorrelated scalar subquery (global
    fraction threshold).  The scalar evaluates once and broadcasts."""
    t = Tables(spark, sf_dir)
    _views(t, spark, "lineitem")
    return spark.sql(
        f"""
        SELECT l_partkey,
               CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS part_value
        FROM lineitem
        GROUP BY l_partkey
        HAVING SUM({SQL_DISC_PRICE}) >
               (SELECT SUM({SQL_DISC_PRICE}) * 0.001 FROM lineitem)
        ORDER BY part_value DESC, l_partkey
        """
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("join", "agg", "nested"),
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: left join + double aggregation (count-of-counts)."""
    t = Tables(spark, sf_dir)
    per_cust = (
        t.customer.join(
            t.orders.filter(F.col("o_orderpriority") != "1-URGENT"),
            t.customer.c_custkey == F.col("o_custkey"),
            "left",
        )
        .groupBy(t.customer.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q14_promo_effect",
    oracle=f"""
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {SQL_DISC_PRICE}
                                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1997-02-01'
    """,
    tags=("join", "agg", "conditional"),
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: conditional aggregation ratio over a broadcast join."""
    t = Tables(spark, sf_dir)
    li = t.lineitem.filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1997-02-01 00:00:00")
    )
    dp = disc_price()
    return (
        li.join(t.part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                (
                    100.0
                    * F.sum(
                        F.when(F.col("p_type") == "PROMO", dp).otherwise(
                            F.lit(0).cast("decimal(18,2)")
                        )
                    ).cast("double")
                )
                / F.sum(dp).cast("double")
            ).alias("promo_revenue")
        )
    )


@query(
    "q15_top_supplier_cte",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM({SQL_DISC_PRICE}) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    tags=("cte", "subquery", "scalar"),
)
def q15_top_supplier_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: CTE reused twice (join input + scalar max) — exercises
    Spark's CTE reuse / exchange reuse machinery."""
    t = Tables(spark, sf_dir)
    _views(t, spark, "lineitem", "supplier")
    return spark.sql(
        f"""
        WITH revenue AS (
            SELECT l_suppkey AS supplier_no,
                   SUM({SQL_DISC_PRICE}) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate < TIMESTAMP '1997-04-01'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
        ORDER BY s_suppkey
        """
    )


@query(
    "q17_small_quantity_parts",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
             AS avg_yearly
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand = 'Brand#1'
      AND l.l_quantity < (SELECT 0.5 * CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                                 / COUNT(*) FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
    """,
    tags=("subquery", "correlated", "scalar"),
)
def q17_small_quantity_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar AVG subquery against the fact table —
    decorrelates to a per-part aggregate joined back to lineitem."""
    t = Tables(spark, sf_dir)
    _views(t, spark, "lineitem", "part")
    return spark.sql(
        """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
                 AS avg_yearly
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        WHERE p.p_brand = 'Brand#1'
          AND l.l_quantity < (SELECT 0.5 * CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                                     / COUNT(*) FROM lineitem l2
                              WHERE l2.l_partkey = l.l_partkey)
        """
    )


@query(
    "q18_large_volume_customer",
    oracle="""
    SELECT c_custkey, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
    GROUP BY c_custkey, o_orderkey, o_totalprice
    ORDER BY totalprice DESC, o_orderkey
    """,
    tags=("subquery", "in", "having", "join"),
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: IN over an aggregated subquery (semi join against a
    grouped HAVING)."""
    t = Tables(spark, sf_dir)
    _views(t, spark, "customer", "orders", "lineitem")
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey,
               CAST(o_totalprice AS DOUBLE) AS totalprice,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey
                             HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 250)
        GROUP BY c_custkey, o_orderkey, o_totalprice
        ORDER BY totalprice DESC, o_orderkey
        """
    )


@query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 21)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
    tags=("join", "filter", "disjunction"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunction of conjunctions spanning both join sides — the
    optimizer must still extract the common equi-key."""
    t = Tables(spark, sf_dir)
    li = t.lineitem
    p = t.part
    cond = (
        (p.p_brand == "Brand#1")
        & p.p_size.between(1, 15)
        & li.l_quantity.between(1, 21)
    ) | (
        (p.p_brand == "Brand#2")
        & p.p_size.between(10, 30)
        & li.l_quantity.between(10, 30)
    ) | (
        (p.p_brand == "Brand#3")
        & p.p_size.between(20, 50)
        & li.l_quantity.between(20, 40)
    )
    return li.join(p, li.l_partkey == p.p_partkey).filter(cond).agg(
        F.sum(disc_price()).cast("double").alias("revenue")
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                / COUNT(*)
                         FROM customer c2 WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("subquery", "not-exists", "anti", "scalar"),
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: scalar subquery threshold + NOT EXISTS anti join."""
    t = Tables(spark, sf_dir)
    _views(t, spark, "customer", "orders")
    return spark.sql(
        """
        SELECT c_nationkey, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer c
        WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                                    / COUNT(*)
                             FROM customer c2 WHERE c2.c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_nationkey
        ORDER BY c_nationkey
        """
    )
