"""Shared expression helpers for oracle-exact arithmetic.

All monetary fixture columns carry exactly two decimal digits (stored as
doubles).  Aggregating doubles is order-sensitive at the ulp level, which would
make a cross-engine value-hash flaky; the reference side-steps this because its
correctness bar is "same engine, two executions" (Spark vs Spark+native).  Ours
is cross-engine (Spark vs DuckDB), so we aggregate in DECIMAL — exact and
order-insensitive — and cast to DOUBLE at the end.  The same pattern is emitted
on both sides (PySpark Column here, SQL text in ``sql_*``).

The DECIMAL(18,2) bound intentionally matches the reference's native decimal
support limit (precision ≤ 18, ``NativeConverters.scala:104-107``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------- Spark side


def dec2(col: str | Column) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(18,2)")


def money_sum(col: str | Column, alias: str) -> Column:
    return F.sum(dec2(col)).cast("double").alias(alias)


def money_avg(col: str | Column, alias: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(dec2(c)).cast("double") / F.count(c)).alias(alias)


def one_minus(col: str | Column) -> Column:
    """(1 - x) for a 2-decimal column, kept in a tight DECIMAL(4,2)."""
    return (F.lit(1) - dec2(col)).cast("decimal(4,2)")


def one_plus(col: str | Column) -> Column:
    return (F.lit(1) + dec2(col)).cast("decimal(4,2)")


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount) — exact DECIMAL(23,4)."""
    return dec2("l_extendedprice") * one_minus("l_discount")


def charge() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax) — exact DECIMAL(28,6)."""
    return disc_price() * one_plus("l_tax")


# ----------------------------------------------------------------- SQL side


# The order-free double-sum contract shared by the ALS / DeLong / PCA
# families: round each addend to 9 dp, sum as DECIMAL (associative and
# order-insensitive), cast back to DOUBLE at the edge.  DECIMAL(28,9)
# leaves 19 integer digits of headroom; keep any multiplication BY A LONG
# outside the decimal (the known Spark scale-demotion pitfall).  One
# definition — per-module copies drifted three ways before r14.
R9_DECIMAL = "CAST(ROUND({t}, 9) AS DECIMAL(28,9))"


def sql_dec2(col: str) -> str:
    return f"CAST({col} AS DECIMAL(18,2))"


def sql_money_sum(col: str, alias: str) -> str:
    return f"CAST(SUM({sql_dec2(col)}) AS DOUBLE) AS {alias}"


def sql_money_avg(col: str, alias: str) -> str:
    return f"CAST(SUM({sql_dec2(col)}) AS DOUBLE) / COUNT({col}) AS {alias}"


def sql_one_minus(col: str) -> str:
    return f"CAST(1 - {sql_dec2(col)} AS DECIMAL(4,2))"


def sql_one_plus(col: str) -> str:
    return f"CAST(1 + {sql_dec2(col)} AS DECIMAL(4,2))"


SQL_DISC_PRICE = f"{sql_dec2('l_extendedprice')} * {sql_one_minus('l_discount')}"
SQL_CHARGE = f"{SQL_DISC_PRICE} * {sql_one_plus('l_tax')}"
