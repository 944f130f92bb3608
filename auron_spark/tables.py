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
    # Every query goes through here, so this is the one reliable hook for
    # runtime-settable conf the engine depends on even when the session is
    # driver-provided (bypassing session.get_spark): timestamps must be UTC
    # (epoch/unix_timestamp semantics match DuckDB's naive-as-UTC reading).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # Legacy-fixture compatibility: only affects parquet TIMESTAMP(NANOS)
        # columns (read as bigint); a no-op on the current TIMESTAMP(MICROS)
        # fixtures, which Spark reads natively as timestamp.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to TIMESTAMP regardless of fixture generation.

    Fixture schema has drifted across driver regens: older fixtures wrote
    parquet TIMESTAMP(NANOS), which (with nanosAsLong) Spark reads as a raw
    bigint of epoch-nanos; current fixtures write TIMESTAMP(MICROS), read
    natively as timestamp / timestamp_ntz.  Guard each conversion on the read
    dtype so every generation works — the reference gates timestamp-typed
    scans the same way (AuronConverters.scala:506-527).

    Used by both the batch catalog (:func:`table`) and the streaming file
    source (tests/test_streaming.py), which must agree exactly for the
    stream-equals-batch contracts to hold.
    """
    from pyspark.sql import functions as F

    ts_dtype = dict(df.dtypes)["ts"]
    if ts_dtype == "bigint":
        # Integer `div` keeps full int64 precision (a double division would
        # lose low bits of the epoch-nanos).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_dtype == "timestamp_ntz":
        # NTZ → LTZ.  Session tz is pinned to UTC (table()), so the cast is
        # value-preserving and matches DuckDB's naive-as-UTC reading;
        # downstream code (epoch casts, range frames, windows) uniformly
        # sees TIMESTAMP.
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def parallel_table(
    spark: SparkSession, sf_dir: str, name: str, key: str | None = None
) -> DataFrame:
    """Scan with a minimum-parallelism guarantee for CPU-dense consumers.

    Parquet scan parallelism is bounded by row groups; a source written as few
    large row groups would otherwise pin an expensive map stage (hashing,
    vector folds) to a handful of cores.  If the scan already yields at least
    the session's parallelism (the normal case at scale, where files ≫ cores),
    this is a no-op — no exchange is added.  Otherwise repartition once:
    keyed when the consumer aggregates/joins on ``key`` (the later shuffle is
    then already satisfied), round-robin for purely map-side work.
    """
    df = table(spark, sf_dir, name)
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    from pyspark.sql import functions as F

    return df.repartition(target, F.col(key)) if key else df.repartition(target)


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

    def parallel(self, name: str, key: str | None = None) -> DataFrame:
        """See :func:`parallel_table` — scan with minimum parallelism for
        CPU-dense consumers (hashing, vector folds)."""
        return parallel_table(self._spark, self._sf_dir, name, key)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views (for the SQL entry point)."""
    for name in TABLE_NAMES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
