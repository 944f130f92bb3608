"""Scan → filter → project → aggregate → sort pipelines (TPC-H-shaped).

Covers the reference operators ParquetScan (`parquet_exec.rs:70`), Filter
(`filter_exec.rs:44`), Projection (`project_exec.rs:48`), AggExec partial/final
(`agg_exec.rs:59`), Sort (`sort_exec.rs:86`) and shuffle exchange
(`shuffle_writer_exec.rs:51`) — expressed declaratively so Catalyst plans
pushdown, partial aggregation and AQE shuffle sizing for us.

Scale notes: every query here is a scan-side filter + map-side partial agg +
one shuffle on the group keys; group-key cardinality is tiny relative to input,
so the plan holds at 100 TB (the shuffle moves only partial aggregates).
Q3/Q5/Q10 join a fact table against dimensions — the dimension sides are
broadcast (explicitly hinted where Catalyst's size estimate might not see it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.exprs import (
    SQL_CHARGE,
    SQL_DISC_PRICE,
    charge,
    disc_price,
    money_avg,
    money_sum,
    sql_money_avg,
    sql_money_sum,
)
from auron_spark.registry import query
from auron_spark.tables import Tables


@query(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_money_sum('l_quantity', 'sum_qty')},
           {sql_money_sum('l_extendedprice', 'sum_base_price')},
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS sum_disc_price,
           CAST(SUM({SQL_CHARGE}) AS DOUBLE) AS sum_charge,
           {sql_money_avg('l_quantity', 'avg_qty')},
           {sql_money_avg('l_extendedprice', 'avg_price')},
           {sql_money_avg('l_discount', 'avg_disc')},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("scan", "filter", "project", "agg", "sort"),
    bench=True,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: the minimum end-to-end slice (SURVEY.md §7)."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            money_sum("l_quantity", "sum_qty"),
            money_sum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price()).cast("double").alias("sum_disc_price"),
            F.sum(charge()).cast("double").alias("sum_charge"),
            money_avg("l_quantity", "avg_qty"),
            money_avg("l_extendedprice", "avg_price"),
            money_avg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    tags=("join", "agg", "topk"),
    bench=True,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: fact⋈fact join + broadcast dim filter + aggregate top-k.

    customer broadcasts via the session threshold + AQE, NOT a hard hint —
    customer grows linearly with SF (150k x SF), so a forced broadcast that
    is fine at test scale OOMs executors at 100 TB; Spark's size-driven
    selection falls back to shuffle exactly when it must.  orders⋈lineitem
    co-partitions on the order key (a shuffle each — unavoidable, AQE-sized).
    """
    t = Tables(spark, sf_dir)
    cust = t.customer.filter(F.col("c_mktsegment") == "BUILDING")
    orders = t.orders.filter(F.col("o_orderdate") < "1998-03-15 00:00:00")
    li = t.lineitem.filter(F.col("l_shipdate") > "1998-03-15 00:00:00")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
    tags=("join", "agg", "sort"),
    bench=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join; dimension sides broadcast, fact side streams.

    Hard broadcast hints only on constant-size frames (nation=25, region=5);
    customer/supplier scale with SF, so their broadcast is left to the
    session threshold + AQE (forced hints don't fall back and OOM at scale).
    """
    t = Tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1997-01-01 00:00:00")
    )
    asia_nations = (
        t.nation.join(
            F.broadcast(t.region.filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    return (
        t.lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            t.supplier,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(asia_nations), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           CAST(SUM({SQL_DISC_PRICE}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    tags=("join", "agg", "topk"),
    bench=True,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (trimmed): returned-item revenue ranking, top 20 customers."""
    t = Tables(spark, sf_dir)
    orders = t.orders.filter(
        (F.col("o_orderdate") >= "1997-01-01 00:00:00")
        & (F.col("o_orderdate") < "1997-04-01 00:00:00")
    )
    li = t.lineitem.filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "scan_projection_pushdown",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n
    FROM lineitem
    WHERE l_quantity > 45
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("scan", "filter"),
)
def scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimal scan exercising predicate pushdown + column pruning: the scan
    should read only (l_quantity, l_returnflag) with the filter pushed to
    parquet (verified in tests/test_plans.py)."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.filter(F.col("l_quantity") > 45)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .orderBy("l_returnflag")
    )


@query(
    "scan_file_provenance",
    oracle="""
    SELECT 'documents.parquet' AS file_name,
           COUNT(*) AS n_rows,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    ORDER BY file_name
    """,
    tags=("scan", "metadata", "provenance"),
)
def scan_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source-file lineage via the hidden `_metadata` struct — the
    provenance every training-data pipeline must carry (which shard did this
    example come from?).  `_metadata.file_name` is populated by the scan
    itself at zero I/O cost; no UDF, no input_file_name() (which breaks under
    whole-stage codegen fusion in subtle ways — the metadata column is the
    supported replacement).

    The fixture table is a single file, so the oracle pins the one expected
    (basename, row-count, sum) row; on a real multi-file table the same query
    yields one row per shard.  Map-side + one small aggregate; groups scale
    with file count, not rows."""
    t = Tables(spark, sf_dir)
    return (
        t.documents.select(F.col("_metadata.file_name").alias("file_name"), "n_chars")
        .groupBy("file_name")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("file_name")
    )
