"""Multi-dimensional data layout: Z-order (Morton) clustering keys.

The lakehouse data-skipping trick (Delta OPTIMIZE ZORDER BY, Iceberg
sort-order z-order) in pure Spark expressions: interleave the bits of two
quantized columns so that sorting by the key co-locates rows that are close
in BOTH dimensions.  Files written from a z-ordered sort carry narrow
min/max ranges on *each* dimension, so parquet row-group stats prune scans
filtered on either column — a linear sort gives that for one dimension only.

All bit math is built-in bitwise expressions (codegen; shiftleft/or chains),
map-side only; the sort before write is the same range-partition sort any
large write performs.  Exact DuckDB oracle — bit operators agree between
engines on non-negative BIGINTs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.registry import query
from auron_spark.tables import Tables

Z_BITS = 10  # per-dimension bits; key fits comfortably in a BIGINT


def zorder_key(a: Column, b: Column, bits: int = Z_BITS) -> Column:
    """Morton-interleave two non-negative ints (each masked to ``bits``):
    bit i of ``a`` lands at position 2i, bit i of ``b`` at 2i+1."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def _sql_zkey(a: str, b: str, bits: int = Z_BITS) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@query(
    "layout_zorder_key",
    oracle=f"""
    SELECT p_partkey, a, b, zkey FROM (
        SELECT p_partkey,
               p_partkey % 1024 AS a,
               CAST('0x' || substr(md5(CAST(p_partkey AS VARCHAR)), 1, 8) AS BIGINT) % 1024 AS b,
               {_sql_zkey("(p_partkey % 1024)", "(CAST('0x' || substr(md5(CAST(p_partkey AS VARCHAR)), 1, 8) AS BIGINT) % 1024)")} AS zkey
        FROM part
    )
    ORDER BY zkey, p_partkey
    LIMIT 100
    """,
    tags=("layout", "zorder", "data-skipping"),
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order key over two dimensions of `part` + the z-sorted head (the
    write order an OPTIMIZE ZORDER pass would use).  The locality property
    this buys — every file narrow in BOTH dimensions — is asserted in
    `tests/test_plans.py::test_zorder_layout_improves_both_dim_locality`."""
    t = Tables(spark, sf_dir)
    a = (F.col("p_partkey") % 1024).cast("long")
    # second dimension from a hash: every numeric column in the TPC-H part
    # fixture is a deterministic function of p_partkey (retailprice formula),
    # so a raw column pair is correlated and any sort looks "local" — the
    # hash gives an independent axis, like (user_id, event_time) in practice
    b = (
        F.conv(F.substring(F.md5(F.col("p_partkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1024
    )
    return (
        t.part.select(
            "p_partkey",
            a.alias("a"),
            b.alias("b"),
            zorder_key(a, b).alias("zkey"),
        )
        .orderBy("zkey", "p_partkey")
        .limit(100)
    )
