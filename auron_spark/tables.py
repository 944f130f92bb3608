"""Table catalog over the driver-generated parquet fixtures.

Scans are plain ``spark.read.parquet`` — Spark's vectorized parquet reader with
predicate pushdown / column pruning plays the role of the reference's native
ParquetScan (``native-engine/datafusion-ext-plans/src/parquet_exec.rs:70``,
converter ``AuronConverters.scala:478-533``): pruning predicates, projection
and partition values are all handled by Catalyst + the DataSource V2 scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}")
    if name == "events":
        # Ensure the ns-as-long read works even on a driver-provided session
        # that did not go through session.get_spark().
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS); Spark reads it as raw long
        # (spark.sql.legacy.parquet.nanosAsLong, session.py).  Truncate to µs
        # exactly like DuckDB's ns→µs cast.  Integer `div` keeps full int64
        # precision (a double division would lose low bits of the epoch-nanos).
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


class Tables:
    """Lazy attribute access: ``t = Tables(spark, sf_dir); t.lineitem``."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self._spark = spark
        self._sf_dir = sf_dir
        self._cache: dict[str, DataFrame] = {}

    def __getattr__(self, name: str) -> DataFrame:
        if name.startswith("_"):
            raise AttributeError(name)
        if name not in self._cache:
            self._cache[name] = table(self._spark, self._sf_dir, name)
        return self._cache[name]


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views (for the SQL entry point)."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
