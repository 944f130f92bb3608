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


# --- partition layout + dynamic partition pruning --------------------------

from auron_spark.artifacts import artifact_dir as _artifact_dir  # noqa: E402
from auron_spark.artifacts import ensure_artifact  # noqa: E402


def month_layout_dir(sf_dir: str) -> str:
    return _artifact_dir("layout", sf_dir)


def build_month_layout(spark: SparkSession, sf_dir: str) -> str:
    """Write the orders fact partitioned by order month
    (``orders_by_month/om=YYYY-MM/``) plus a month dimension
    (om, y, q) — the star layout whose partition-pruned scan
    `scan_dpp_partitioned` demonstrates.  Idempotent + concurrency-safe
    via `artifacts.ensure_artifact` (temp dir + atomic rename, ADVICE r7
    #4); the artifacts are committed — the fact copy is byte-stable
    because it is a repartition of static fixture data."""

    def _build(into: str) -> None:
        o = Tables(spark, sf_dir).orders
        om = F.date_format("o_orderdate", "yyyy-MM").alias("om")
        (
            o.withColumn("om", om)
            .repartition(1)
            .write.mode("overwrite")
            .partitionBy("om")
            .parquet(f"{into}/orders_by_month")
        )
        (
            o.select(
                om,
                F.year("o_orderdate").alias("y"),
                F.quarter("o_orderdate").alias("q"),
            )
            .distinct()
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{into}/month_dim")
        )

    return ensure_artifact(
        month_layout_dir(sf_dir), "_LAYOUT_COMPLETE", _build
    )


@query(
    "scan_dpp_partitioned",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS om,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate) = 1995
      AND EXTRACT(quarter FROM o_orderdate) = 1
    GROUP BY om
    ORDER BY om
    """,
    tags=("scan", "partition-pruning", "dpp", "layout"),
)
def scan_dpp_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning over a month-partitioned fact: the dim
    filter (year 1995, Q1) reaches the FACT SCAN as a runtime partition
    filter — Spark reuses the broadcast of the filtered month dim as a
    `dynamicpruning` subquery on the partition column, so only 3 of ~80
    partition directories are listed and read.  This is the partition
    analog of the bloom-filter row pruning `session.py` enables, and the
    single highest-leverage scan optimization at 100 TB: a day-partitioned
    petabyte fact joined to a filtered date dim reads only the matching
    days, with zero user-written partition predicates.

    The plan gate (`test_dpp_prunes_partitions`) asserts the
    dynamicpruningexpression lands in the scan's PartitionFilters and
    that the pruned scan reads 3 partitions.  The oracle computes the
    same quarter from the unpartitioned view — identical rows, since the
    layout artifact is a repartition of the same fixture data."""
    d = build_month_layout(spark, sf_dir)
    fact = spark.read.parquet(f"{d}/orders_by_month")
    dim = (
        spark.read.parquet(f"{d}/month_dim")
        .where((F.col("y") == 1995) & (F.col("q") == 1))
        .select("om")
    )
    return (
        fact.join(F.broadcast(dim), "om")
        .groupBy("om")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("om")
    )


@query(
    "scan_incremental_new_files",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS om,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE EXTRACT(year FROM o_orderdate) >= 1997
    GROUP BY om
    ORDER BY om
    """,
    tags=("scan", "incremental", "file-listing", "ingest"),
)
def scan_incremental_new_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental file-level ingestion (the Auto Loader / checkpointed
    batch pattern): a CHECKPOINT records every file already processed; an
    incremental pass lists the fact directory, anti-joins the listing
    against the checkpoint by file path, and processes ONLY rows from new
    files via `input_file_name()` — no partition-value convention needed,
    so it works for append patterns partition pruning can't express (late
    files landing in old partitions).  The fixture checkpoint covers the
    pre-1997 months of the partitioned orders artifact, so the
    incremental batch is exactly the 1997+ files (the oracle recomputes
    that from the unpartitioned view).

    Scale shape: the checkpoint is a file-path table (one row per
    processed file — millions of rows at 100 TB, still a broadcast-sized
    dimension vs the data); the listing join is an anti equi-join on
    path; row filtering attaches `input_file_name()` map-side and
    semi-joins the new-path set, so pruned files' rows never deserialize
    past the scan batch.  The same checkpoint table is what a streaming
    `cloudFiles`-style source maintains transactionally."""
    d = build_month_layout(spark, sf_dir)
    fact = spark.read.parquet(f"{d}/orders_by_month")
    listed = fact.select(
        F.input_file_name().alias("path")
    ).distinct()
    # checkpoint: files already processed (every pre-1997 month partition)
    checkpoint = listed.where(
        F.regexp_extract("path", r"om=(\d{4})-", 1).cast("int") < 1997
    )
    new_files = listed.join(checkpoint, "path", "left_anti")
    return (
        fact.withColumn("path", F.input_file_name())
        .join(F.broadcast(new_files), "path", "left_semi")
        .groupBy("om")
        .agg(F.count("*").cast("bigint").alias("n_orders"))
        .orderBy("om")
    )


# --- zone maps: file-level min/max data skipping ---------------------------

ZONE_FILES = 16  # range-clustered files per fact; each carries a narrow span


def range_layout_dir(sf_dir: str) -> str:
    return _artifact_dir("rangelayout", sf_dir)


def build_range_layout(spark: SparkSession, sf_dir: str) -> str:
    """Write orders range-clustered by ``o_orderkey`` into ``ZONE_FILES``
    files plus a zone-map catalog (``path, min_key, max_key`` per file) —
    the file-statistics layout Delta/Iceberg keep in their metadata layer
    and the reference gets implicitly from parquet row-group stats
    (``parquet_exec.rs`` pruning predicates).  Materializing the catalog
    as a table makes the skipping explicit and driver-provable.
    Idempotent + concurrency-safe via `ensure_artifact`."""

    def _build(into: str) -> None:
        o = Tables(spark, sf_dir).orders
        (
            o.repartitionByRange(ZONE_FILES, "o_orderkey")
            .sortWithinPartitions("o_orderkey")
            .write.mode("overwrite")
            .parquet(f"{into}/orders_by_range")
        )
        clustered = spark.read.parquet(f"{into}/orders_by_range")
        # catalog stores file BASENAMES: the artifact publishes via atomic
        # rename, so absolute paths recorded at build time would dangle
        (
            clustered.groupBy(
                F.regexp_replace(F.input_file_name(), r"^.*/", "").alias(
                    "file"
                )
            )
            .agg(
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
            )
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(f"{into}/zone_map")
        )

    return ensure_artifact(range_layout_dir(sf_dir), "_RANGE_COMPLETE", _build)


@query(
    "scan_zone_map_skipping",
    oracle="""
    WITH b AS (
        SELECT MIN(o_orderkey) AS gmin, MAX(o_orderkey) AS gmax FROM orders
    ),
    bounds AS (
        SELECT gmin + (gmax - gmin) * 5 // 100 AS lo,
               gmin + (gmax - gmin) * 15 // 100 AS hi
        FROM b
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders, bounds
    WHERE o_orderkey BETWEEN bounds.lo AND bounds.hi
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("scan", "zone-map", "data-skipping", "layout"),
)
def scan_zone_map_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (file-stats catalog) pruned scan: a range predicate on the
    clustering key consults the 16-row zone-map catalog FIRST, and only
    files whose [min_key, max_key] span intersects the predicate are ever
    opened — for this ~10%-of-keyspace band, 2-3 of 16 files.  This is
    the metadata-layer data skipping every lakehouse performs before
    parquet row-group stats even load, and at 100 TB it is the difference
    between listing+opening 100k footers and opening the 2k that can
    match.  The predicate bounds derive from the catalog itself
    (integer-exact 5%/15% quantiles of the key span), so the query is
    scale-free; the oracle computes the same band over the unclustered
    view — identical rows because clustering is a permutation.

    The empirical gate (`test_zone_map_skips_files`) asserts the pruned
    plan reads <= 4 of the 16 files.

    Scale shape: the catalog is one row per file (bounded, broadcast-
    sized — the same contract as `scan_incremental_new_files`'s
    checkpoint); the collect is catalog-rows only, never data; the
    residual BETWEEN still applies post-scan so correctness never
    depends on the stats being tight."""
    d = build_range_layout(spark, sf_dir)
    zone = spark.read.parquet(f"{d}/zone_map")
    g = zone.agg(
        F.min("min_key").alias("gmin"), F.max("max_key").alias("gmax")
    ).collect()[0]
    lo = g["gmin"] + (g["gmax"] - g["gmin"]) * 5 // 100
    hi = g["gmin"] + (g["gmax"] - g["gmin"]) * 15 // 100
    # catalog consultation: bounded collect of matching file names
    paths = [
        f"{d}/orders_by_range/{r['file']}"
        for r in zone.where(
            (F.col("max_key") >= lo) & (F.col("min_key") <= hi)
        ).collect()
    ]
    pruned = spark.read.parquet(*paths)
    return (
        pruned.where(F.col("o_orderkey").between(lo, hi))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


# --- schema evolution: mergeSchema over drifted file generations ------------


def schema_evo_dir(sf_dir: str) -> str:
    return _artifact_dir("schemaevo", sf_dir)


def build_schema_evo_layout(spark: SparkSession, sf_dir: str) -> str:
    """Write two parquet GENERATIONS of the orders feed into one
    directory: generation 1 (pre-1995 orders) carries (o_orderkey,
    o_orderdate, o_totalprice); generation 2 (1995+) adds the
    o_orderpriority column — the additive schema drift every long-lived
    feed accumulates.  Idempotent + concurrency-safe via
    `ensure_artifact`."""

    def _build(into: str) -> None:
        o = Tables(spark, sf_dir).orders
        (
            o.where(F.year("o_orderdate") < 1995)
            .select("o_orderkey", "o_orderdate", "o_totalprice")
            .coalesce(2)
            .write.mode("overwrite")
            .parquet(f"{into}/gen1")
        )
        (
            o.where(F.year("o_orderdate") >= 1995)
            .select(
                "o_orderkey", "o_orderdate", "o_totalprice",
                "o_orderpriority",
            )
            .coalesce(2)
            .write.mode("overwrite")
            .parquet(f"{into}/gen2")
        )

    return ensure_artifact(
        schema_evo_dir(sf_dir), "_SCHEMA_EVO_COMPLETE", _build
    )


@query(
    "scan_schema_evolution",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(CASE WHEN year(o_orderdate) >= 1995
                           THEN o_orderpriority END) AS BIGINT)
               AS n_with_priority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders
    GROUP BY year(o_orderdate)
    ORDER BY yr
    """,
    tags=("scan", "schema-evolution", "mergeSchema"),
)
def scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution scan: two parquet generations of the same feed —
    the later one adds o_orderpriority — read as ONE relation with
    ``mergeSchema=true``; rows from the old generation surface NULL for
    the added column (checked: n_with_priority counts exactly the 1995+
    rows).  This is the additive-drift contract every lakehouse feed
    relies on (the reference delegates it to parquet schema merging in
    its scan; here it is driver-proven against the unsplit fixture).

    Scale shape: schema reconciliation happens at file-footer level (per
    file, driver-side metadata only); the data path stays a plain
    columnar scan per generation — no shuffle, no rewrite of old files,
    which is the point: additive evolution is FREE at 100 TB, unlike a
    backfill."""
    d = build_schema_evo_layout(spark, sf_dir)
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    return (
        merged.groupBy(
            F.year("o_orderdate").cast("bigint").alias("yr")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.count("o_orderpriority").cast("bigint").alias("n_with_priority"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("yr")
    )


def schema_evo_widening_dir(sf_dir: str) -> str:
    return _artifact_dir("schemaevo2", sf_dir)


def build_schema_evo_widening_layout(spark: SparkSession, sf_dir: str) -> str:
    """Three parquet GENERATIONS of an orders feed exercising the two
    evolution modes beyond additive-column drift (VERDICT r12 ask #5):

    - gen1 (pre-1994):   o_orderkey INT, o_orderdate DATE,
                         o_totalcents INT
    - gen2 (1994-1995):  same narrow types + o_orderpriority (additive)
    - gen3 (1996+):      o_orderkey/o_totalcents WIDENED to BIGINT and
                         the priority column written CASE-MISMATCHED as
                         O_ORDERPRIORITY

    Spark's parquet `mergeSchema` REJECTS the int->bigint conflict
    outright (CANNOT_MERGE_SCHEMAS — pinned in tests/test_sources.py),
    so the read contract for a feed like this is an EXPLICIT target
    schema: the vectorized reader widens INT32 -> bigint per file and
    resolves names case-insensitively, with NULL backfill for columns a
    generation lacks."""

    def _build(into: str) -> None:
        o = Tables(spark, sf_dir).orders
        cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        base = o.select(
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
            cents.alias("cents"),
            F.year("o_orderdate").alias("yr"),
        )
        (
            base.where(F.col("yr") < 1994)
            .select(
                F.col("o_orderkey").cast("int").alias("o_orderkey"),
                "o_orderdate",
                F.col("cents").cast("int").alias("o_totalcents"),
            )
            .coalesce(2)
            .write.mode("overwrite")
            .parquet(f"{into}/gen1")
        )
        (
            base.where((F.col("yr") >= 1994) & (F.col("yr") < 1996))
            .select(
                F.col("o_orderkey").cast("int").alias("o_orderkey"),
                "o_orderdate",
                F.col("cents").cast("int").alias("o_totalcents"),
                "o_orderpriority",
            )
            .coalesce(2)
            .write.mode("overwrite")
            .parquet(f"{into}/gen2")
        )
        (
            base.where(F.col("yr") >= 1996)
            .select(
                F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
                "o_orderdate",
                F.col("cents").cast("bigint").alias("o_totalcents"),
                F.col("o_orderpriority").alias("O_ORDERPRIORITY"),
            )
            .coalesce(2)
            .write.mode("overwrite")
            .parquet(f"{into}/gen3")
        )

    return ensure_artifact(
        schema_evo_widening_dir(sf_dir), "_SCHEMA_EVO_W_COMPLETE", _build
    )


_SCHEMA_EVO_W_TARGET = (
    "o_orderkey BIGINT, o_orderdate DATE, o_totalcents BIGINT, "
    "o_orderpriority STRING"
)


@query(
    "scan_schema_evolution_widening",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(CASE WHEN year(o_orderdate) >= 1994
                           THEN o_orderpriority END) AS BIGINT)
               AS n_with_priority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) * 100) AS BIGINT)
               AS total_cents,
           CAST(MAX(o_orderkey) AS BIGINT) AS max_orderkey
    FROM orders
    GROUP BY year(o_orderdate)
    ORDER BY yr
    """,
    tags=("scan", "schema-evolution", "type-widening", "case-insensitive"),
)
def scan_schema_evolution_widening(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Schema evolution beyond additive drift: THREE generations of the
    orders feed — narrow int types, then an added column, then widened
    bigint types with a case-mismatched column name — read as ONE
    relation against an explicit target schema.  The per-year rollup is
    oracle-checked against the unsplit fixture, proving the three
    mechanics end-to-end: INT32 files surface through the BIGINT target
    (exact integer total_cents across the width boundary), gen1 rows
    NULL-backfill o_orderpriority (n_with_priority counts exactly the
    1994+ rows), and gen3's O_ORDERPRIORITY resolves case-insensitively
    (its values are counted, not nulled).

    Spark's `mergeSchema` cannot express this feed — it hard-rejects the
    int/bigint conflict (CANNOT_MERGE_SCHEMAS), and an int->string
    target fails per file at read (PARQUET_COLUMN_DATA_TYPE_MISMATCH);
    both rejections are pinned as negative tests in
    tests/test_sources.py.  The reference's ORC path carries the same
    positional/case-sensitivity evolution flags
    (`AuronConverters.scala:517-527`, `orc_exec.rs:68`).

    Scale shape: identical to the additive case — schema reconciliation
    is per-file footer metadata; the data path is a plain columnar scan
    with the widening applied inside the vectorized reader; no shuffle,
    no rewrite of old files."""
    d = build_schema_evo_widening_layout(spark, sf_dir)
    merged = (
        spark.read.schema(_SCHEMA_EVO_W_TARGET)
        .option("recursiveFileLookup", "true")
        .parquet(d)
    )
    return (
        merged.groupBy(
            F.year("o_orderdate").cast("bigint").alias("yr")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.count("o_orderpriority").cast("bigint").alias("n_with_priority"),
            F.sum("o_totalcents").cast("bigint").alias("total_cents"),
            F.max("o_orderkey").cast("bigint").alias("max_orderkey"),
        )
        .orderBy("yr")
    )
