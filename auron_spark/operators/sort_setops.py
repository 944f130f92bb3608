"""Sort / limit / offset / top-k / set operations / exchange surface.

Reference: Sort (`sort_exec.rs:86` — external sort with spill + loser-tree
merge), TakeOrderedAndProject (`NativeTakeOrderedBase.scala:142-146`),
Local/GlobalLimit with offset (`limit_exec.rs:42-126`), Union
(`union_exec.rs:39`), and the shuffle exchange partitioning modes hash /
round-robin / range / single (`auron.proto:683-709`).

Intersect/Except have no native operator in the reference — Catalyst rewrites
them to joins (SURVEY.md §2.7) — and the same happens here.

Scale: global sorts use range partitioning (sampled bounds) under the hood —
`orderBy` on a 100 TB table is a repartitionByRange + per-partition sort, which
Spark plans automatically; top-k never materializes a full sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.registry import query
from auron_spark.tables import Tables


@query(
    "sort_nulls_ordering",
    oracle="""
    SELECT p_partkey,
           CASE WHEN p_size > 45 THEN NULL ELSE p_size END AS sz,
           p_brand
    FROM part
    ORDER BY sz DESC NULLS FIRST, p_brand ASC, p_partkey
    LIMIT 50
    """,
    tags=("sort", "nulls"),
)
def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-column sort with explicit null ordering (reference sort key spec
    `auron.proto:671-681`: asc/desc × nulls first/last)."""
    t = Tables(spark, sf_dir)
    return (
        t.part.select(
            "p_partkey",
            F.when(F.col("p_size") > 45, F.lit(None)).otherwise(F.col("p_size")).alias("sz"),
            "p_brand",
        )
        .orderBy(F.col("sz").desc_nulls_first(), F.col("p_brand").asc(), F.col("p_partkey"))
        .limit(50)
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_orderkey
    LIMIT 25 OFFSET 100
    """,
    tags=("limit", "offset"),
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global limit with offset (`limit_exec.rs`; Spark 3.4+ `df.offset`)."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", "o_totalprice").orderBy("o_orderkey").offset(100).limit(25)
    )


@query(
    "take_ordered_topk",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
    FROM orders
    ORDER BY price DESC, o_orderkey
    LIMIT 15
    """,
    tags=("sort", "topk"),
)
def take_ordered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orderBy + limit → Spark plans TakeOrderedAndProject (per-partition
    top-k + merge, no global sort) — the reference lowers the same pattern to
    SortExec with a fetch limit (`NativeTakeOrderedBase.scala:142-146`)."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.select("o_orderkey", F.col("o_totalprice").cast("double").alias("price"))
        .orderBy(F.desc("price"), "o_orderkey")
        .limit(15)
    )


@query(
    "set_union_all",
    oracle="""
    SELECT k, name FROM (
        SELECT s_suppkey AS k, s_name AS name FROM supplier WHERE s_acctbal > 9990
        UNION ALL
        SELECT c_custkey AS k, c_name AS name FROM customer WHERE c_acctbal > 9990
    )
    ORDER BY k, name
    """,
    tags=("union",),
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (`union_exec.rs:39`) — no shuffle, partition concatenation."""
    t = Tables(spark, sf_dir)
    a = t.supplier.filter(F.col("s_acctbal") > 9990).select(
        F.col("s_suppkey").alias("k"), F.col("s_name").alias("name")
    )
    b = t.customer.filter(F.col("c_acctbal") > 9990).select(
        F.col("c_custkey").alias("k"), F.col("c_name").alias("name")
    )
    return a.unionAll(b).orderBy("k", "name")


@query(
    "set_union_distinct",
    oracle="""
    SELECT nk FROM (
        SELECT s_nationkey AS nk FROM supplier
        UNION
        SELECT c_nationkey AS nk FROM customer
    )
    ORDER BY nk
    """,
    tags=("union", "distinct"),
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT — union + dedup-by-grouping (the reference gets the
    distinct from Spark's rewrite to Aggregate)."""
    t = Tables(spark, sf_dir)
    a = t.supplier.select(F.col("s_nationkey").alias("nk"))
    b = t.customer.select(F.col("c_nationkey").alias("nk"))
    return a.union(b).distinct().orderBy("nk")


@query(
    "set_intersect",
    oracle="""
    SELECT s_nationkey AS nk FROM supplier WHERE s_acctbal > 5000
    INTERSECT
    SELECT c_nationkey FROM customer WHERE c_acctbal > 5000
    ORDER BY nk
    """,
    tags=("intersect",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT → Catalyst rewrites to left-semi join + distinct
    (SURVEY.md §2.7: no native operator in the reference either)."""
    t = Tables(spark, sf_dir)
    a = t.supplier.filter(F.col("s_acctbal") > 5000).select(F.col("s_nationkey").alias("nk"))
    b = t.customer.filter(F.col("c_acctbal") > 5000).select(F.col("c_nationkey").alias("nk"))
    return a.intersect(b).orderBy("nk")


@query(
    "set_except",
    oracle="""
    SELECT n_nationkey AS nk FROM nation
    EXCEPT
    SELECT s_nationkey FROM supplier
    ORDER BY nk
    """,
    tags=("except",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT → left-anti join + distinct; nations with no supplier.

    `subtract` is Spark's EXCEPT DISTINCT.  `exceptAll(b).distinct()` is NOT
    equivalent when the left side has duplicates that the right only partially
    cancels (a 2x row minus 1x leaves a survivor that EXCEPT drops)."""
    t = Tables(spark, sf_dir)
    a = t.nation.select(F.col("n_nationkey").alias("nk"))
    b = t.supplier.select(F.col("s_nationkey").alias("nk"))
    return a.subtract(b).orderBy("nk")


@query(
    "distinct_dropduplicates",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority
    FROM orders
    ORDER BY o_orderstatus, o_orderpriority
    """,
    tags=("distinct",),
)
def distinct_dropduplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.orders.select("o_orderstatus", "o_orderpriority")
        .dropDuplicates()
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@query(
    "exchange_repartition",
    oracle="""
    SELECT l_suppkey,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY l_suppkey
    ORDER BY l_suppkey
    """,
    tags=("exchange", "repartition"),
)
def exchange_repartition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit hash repartition on the aggregation key before grouping —
    exercises the shuffle exchange (`shuffle_writer_exec.rs:51`, hash
    partitioning `auron.proto:683-709`).  The aggregate then reuses the
    partitioning (no second shuffle — asserted in tests/test_plans.py)."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.repartition(32, "l_suppkey")
        .groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty"),
        )
        .orderBy("l_suppkey")
    )


@query(
    "exchange_range_partition",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_totalprice > 440000
    ORDER BY o_orderkey
    """,
    tags=("exchange", "range"),
)
def exchange_range_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """repartitionByRange + sortWithinPartitions — the range-partitioning
    shuffle mode with sampled bounds (`auron.proto:683-709`); produces a
    globally ordered layout like the reference's range repartitioner."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.filter(F.col("o_totalprice") > 440000)
        .select("o_orderkey", "o_totalprice")
        .repartitionByRange(8, "o_orderkey")
        .sortWithinPartitions("o_orderkey")
    )
