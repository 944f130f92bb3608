"""Readers and writers: parquet / ORC / CSV / JSON, plus partitioned and
dynamic-partition writes.

Reference: ParquetScan/OrcScan (`parquet_exec.rs:70`, `orc_exec.rs:68`),
ParquetSink with dynamic partitions (`parquet_sink_exec.rs:55`,
`num_dyn_parts` in `AuronConverters.scala:1160-1167`), OrcSink
(`orc_sink_exec.rs:54`).  Lakehouse connectors (Iceberg/Paimon/Hudi,
`thirdparty/auron-*`) need external jars not present in this container —
`read_lakehouse` gates them behind a capability check instead of failing at
import time.

Scale: writers default to zstd-compressed parquet and partitioned layout;
`write_partitioned` repartitions by the partition columns first so each task
writes one file per partition value (no small-file explosion — the same
problem the reference's `num_dyn_parts` solves natively).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import col as F_col


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_csv(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    reader = spark.read.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)  # never inferSchema in production paths
    else:
        reader = reader.option("inferSchema", "true")
    return reader.csv(path)


def read_json(spark: SparkSession, path: str, schema: str | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("compression", "zstd").parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("compression", "zstd").orc(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    rebalance: bool = False,
) -> None:
    """Dynamic-partition parquet write: repartition on the partition columns so
    every output partition is written by one task → one file per partition
    value instead of tasks × partitions small files.

    ``rebalance=True`` swaps the hash repartition for a REBALANCE hint: AQE
    then splits oversized partition-values across tasks and merges small ones
    (`optimizeSkewsInRebalancePartitions`).  Prefer it when partition values
    are skewed — a plain repartition writes the hottest value with ONE task
    at any scale (gate: `test_rebalance_hint_for_write_path`)."""
    staged = (
        df.hint("rebalance", *partition_cols)
        if rebalance
        else df.repartition(*partition_cols)
    )
    (
        staged.write.mode(mode)
        .partitionBy(*partition_cols)
        .option("compression", "zstd")
        .parquet(path)
    )


_LAKEHOUSE_FORMATS = ("iceberg", "delta", "hudi", "paimon")


def lakehouse_available(spark: SparkSession, fmt: str) -> bool:
    """True if the connector jars for ``fmt`` are on the classpath."""
    if fmt not in _LAKEHOUSE_FORMATS:
        return False
    try:
        spark.read.format(fmt).load("/nonexistent-probe-path")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        # Missing DataSource class -> connector absent; path errors -> present.
        return "Failed to find" not in msg and "ClassNotFound" not in msg
    return True


def read_lakehouse(spark: SparkSession, fmt: str, path_or_table: str) -> DataFrame:
    """Iceberg/Delta/Hudi/Paimon scan — reference parity for the thirdparty
    connectors (`thirdparty/auron-iceberg/.../NativeIcebergTableScanExec.scala`,
    SPI `AuronConverters.scala:130-137,219-222`); requires the respective jars
    on the classpath.  Environment-blocked in this container (no network / no
    pip / no jars) — the gate below is pinned by tests and COVERAGE.md."""
    if not lakehouse_available(spark, fmt):
        raise NotImplementedError(
            f"{fmt} connector jars are not on the classpath; add the connector "
            f"package to spark.jars.packages to enable this source"
        )
    return spark.read.format(fmt).load(path_or_table)


def write_lakehouse(df: DataFrame, fmt: str, path_or_table: str) -> None:
    """Lakehouse sink twin of :func:`read_lakehouse` — same capability gate."""
    if not lakehouse_available(df.sparkSession, fmt):
        raise NotImplementedError(
            f"{fmt} connector jars are not on the classpath; add the connector "
            f"package to spark.jars.packages to enable this sink"
        )
    df.write.format(fmt).mode("append").save(path_or_table)


def _require_unique_keys(new_df: DataFrame, keys: list[str]) -> None:
    """MERGE precondition: the source batch must have at most one row per
    key.  A CDC micro-batch with two changes for one key would otherwise
    anti-join away the old row and union BOTH new rows, silently duplicating
    the key; real MERGE implementations (Delta, Iceberg) raise on ambiguous
    source matches, and so do we.  Callers with multi-change batches should
    first reduce to last-change-per-key (e.g. a row_number window over a
    change-sequence column).  Cost: one aggregation over the batch — batch-
    sized, not table-sized.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    any_null = reduce(lambda a, b: a | b, [F_col(k).isNull() for k in keys])
    row = new_df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(*[F_col(k) for k in keys]).alias("d"),
        F.sum(any_null.cast("int")).alias("nulls"),
    ).first()
    if (row["nulls"] or 0) > 0:
        raise ValueError(
            f"upsert source batch has {row['nulls']} rows with NULL in "
            f"{keys}: a null merge key never matches and cannot be updated "
            f"later — fix the batch upstream"
        )
    if row["n"] != row["d"]:
        raise ValueError(
            f"upsert source batch has duplicate keys on {keys}: "
            f"{row['n']} rows but {row['d']} distinct keys; reduce the batch "
            f"to one change per key (last-write-wins) before merging"
        )


def upsert_parquet(
    spark: SparkSession, new_df: DataFrame, path: str, keys: list[str]
) -> None:
    """MERGE-style upsert into an unpartitioned parquet table without a
    lakehouse format: rows of ``new_df`` replace existing rows with the same
    key; all other existing rows survive.  The survivor set is
    existing LEFT ANTI new (on ``keys``) UNION new.  ``new_df`` must be
    unique per key (validated; see :func:`_require_unique_keys`).

    Spark cannot safely overwrite a path it is lazily reading (the scan
    would see its own deletes), so the merged result is staged to
    ``path + "__stage"`` and swapped in with two renames — the standard
    plain-filesystem pattern; lakehouse formats exist precisely to make
    this swap transactional (see ``read_lakehouse``'s gate).

    Crash recovery: the swap is not transactional.  If ``__stage`` or
    ``__old`` already exists, a previous invocation died mid-swap and we
    fail fast rather than guess.  To recover: if ``path`` exists, delete the
    leftover ``__stage``/``__old`` dirs (the table is intact — a crash
    before the first rename leaves only ``__stage``; after the second
    leaves only ``__old``).  If ``path`` is MISSING, the crash hit between
    the renames: ``__stage`` holds the complete merged table — rename it to
    ``path`` — and ``__old`` holds the pre-merge table as a fallback.

    Intended for dimension/metadata-sized tables.  For fact-scale data use
    :func:`upsert_parquet_partitioned`, which touches only the partitions
    the new batch lands in.
    """
    import os
    import shutil

    stage = path.rstrip("/") + "__stage"
    old = path.rstrip("/") + "__old"
    leftover = [p for p in (stage, old) if os.path.exists(p)]
    if leftover:
        raise RuntimeError(
            f"unfinished upsert swap detected ({leftover}); recover per the "
            f"upsert_parquet docstring before retrying"
        )
    _require_unique_keys(new_df, keys)
    existing = spark.read.parquet(path)
    survivors = existing.join(new_df.select(keys), keys, "left_anti")
    merged = survivors.unionByName(new_df)
    merged.write.mode("overwrite").option("compression", "zstd").parquet(stage)
    os.rename(path, old)
    os.rename(stage, path)
    shutil.rmtree(old)


def upsert_parquet_partitioned(
    spark: SparkSession,
    new_df: DataFrame,
    path: str,
    keys: list[str],
    partition_col: str,
) -> None:
    """Partition-scoped MERGE: upsert ``new_df`` into a hive-partitioned
    parquet table rewriting ONLY the partitions the new batch touches.

    Dynamic partition overwrite (``partitionOverwriteMode=dynamic``) replaces
    exactly the partitions present in the written frame, so the merge reads
    the existing data pruned to the affected partition values (a small IN
    filter — the values come from the new batch, collected once; they are
    partition keys, constant-bounded, not data), anti-joins the new keys,
    unions the batch, and writes back.  Untouched partitions are never read,
    never rewritten — at 100 TB an upsert costs O(affected partitions), not
    O(table).  The reference's lakehouse connectors get this from table
    formats; this is the same contract on plain parquet layout.

    ``new_df`` must be unique per key (validated) and ``partition_col`` must
    be non-null in the batch: a null partition value would land in hive's
    ``__HIVE_DEFAULT_PARTITION__``, but the ``isin`` prune below can never
    match NULL, so existing null-partition survivors would be silently
    dropped when dynamic overwrite rewrites that partition.  We raise
    instead of special-casing — a null partition key in a CDC batch is a
    data bug upstream, not a merge policy.
    """
    _require_unique_keys(new_df, keys)
    parts = [r[0] for r in new_df.select(partition_col).distinct().collect()]
    if any(p is None for p in parts):
        raise ValueError(
            f"upsert batch contains NULL {partition_col!r} values; the "
            f"partition prune cannot match hive's null partition, so the "
            f"merge would drop existing null-partition rows — fix or filter "
            f"the batch upstream"
        )
    existing = spark.read.parquet(path).filter(
        F_col(partition_col).isin(parts)
    )
    survivors = existing.join(new_df.select(keys), keys, "left_anti")
    # Materialize the merge BEFORE the write job: the plan reads the same
    # partitions the dynamic overwrite will replace, and Spark's
    # read-your-own-overwrite protection is not guaranteed to catch (or
    # allow) every such plan.  The checkpointed state is bounded by the
    # affected partitions, not the table.
    merged = survivors.unionByName(
        new_df.select(existing.columns)
    ).localCheckpoint()
    (
        merged.repartition(partition_col)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .option("compression", "zstd")
        .partitionBy(partition_col)
        .parquet(path)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    n_buckets: int,
    keys: list[str],
) -> None:
    """Write a hash-bucketed, bucket-sorted table — the layout that makes
    repeated joins/aggregations on ``keys`` shuffle-free: each bucket file
    holds one hash partition of the key space, so a join of two tables
    bucketed the same way reads co-located buckets and Spark plans NO
    exchange on either side (see
    ``tests/test_sources.py::test_bucketed_join_is_shuffle_free``).

    At 100 TB this is the difference between re-shuffling the fact table
    on every join and shuffling it exactly once at write time — the plain
    open-layout analog of the reference's lakehouse table-distribution
    support.  Registered as an external table (data lives at ``path``);
    ``n_buckets`` should match the cluster's target parallelism for the
    key's volume.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
        .option("path", path)
        .option("compression", "zstd")
        .format("parquet")
        .saveAsTable(table)
    )


# --- driver-provable CSV / JSON-lines scans over committed artifacts ------

from pyspark.sql import functions as F  # noqa: E402

from auron_spark.artifacts import ORACLE_SF_DIR as _ORACLE_SF_DIR  # noqa: E402
from auron_spark.artifacts import artifact_dir as _artifact_dir  # noqa: E402
from auron_spark.artifacts import ensure_artifact  # noqa: E402
from auron_spark.registry import query  # noqa: E402
from auron_spark.tables import Tables  # noqa: E402


def textfmt_dir(sf_dir: str) -> str:
    return _artifact_dir("textfmt", sf_dir)


def build_textfmt_files(spark: SparkSession, sf_dir: str) -> str:
    """Materialize CSV (nation, region) and JSON-lines (supplier) copies
    of fixture dims as committed artifacts — the real files behind the
    `scan_csv_typed` / `scan_json_lines` queries, so the CSV/JSON source
    paths get DRIVER-provable coverage, not just pytest round trips.
    Columns are restricted to key/name/numeric fields (no freeform
    comment text) so both engines' parsers see the same trivial quoting.
    Idempotent + concurrency-safe via `ensure_artifact`."""
    t = Tables(spark, sf_dir)

    def _build(into: str) -> None:
        (
            t.nation.select("n_nationkey", "n_name", "n_regionkey")
            .coalesce(1)
            .write.mode("overwrite")
            .option("header", True)
            .csv(f"{into}/nation_csv")
        )
        (
            t.region.select("r_regionkey", "r_name")
            .coalesce(1)
            .write.mode("overwrite")
            .option("header", True)
            .csv(f"{into}/region_csv")
        )
        (
            t.supplier.select(
                "s_suppkey", "s_name", "s_nationkey", "s_acctbal"
            )
            .coalesce(1)
            .write.mode("overwrite")
            .json(f"{into}/supplier_json")
        )

    return ensure_artifact(textfmt_dir(sf_dir), "_TEXTFMT_COMPLETE", _build)


_TEXTFMT_ART = textfmt_dir(_ORACLE_SF_DIR)


@query(
    "scan_csv_typed",
    oracle=f"""
    WITH n AS (
        SELECT * FROM read_csv('{_TEXTFMT_ART}/nation_csv/*.csv',
            header = true,
            columns = {{'n_nationkey': 'BIGINT', 'n_name': 'VARCHAR',
                        'n_regionkey': 'BIGINT'}})
    ),
    r AS (
        SELECT * FROM read_csv('{_TEXTFMT_ART}/region_csv/*.csv',
            header = true,
            columns = {{'r_regionkey': 'BIGINT', 'r_name': 'VARCHAR'}})
    )
    SELECT r.r_name, COUNT(*) AS n_nations,
           MIN(n.n_name) AS first_nation
    FROM n JOIN r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
    tags=("scan", "csv", "source", "serving"),
)
def scan_csv_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-typed CSV scan through Spark's csv source over REAL files
    (committed artifact): nation x region from headers + explicit schema,
    joined and aggregated; the oracle parses the SAME files with DuckDB's
    read_csv.  'serving' tag = the oracle path pins to ORACLE_SF_DIR at
    import (same contract as the ANN serve queries).

    Scale shape: CSV scans split by file/line ranges exactly like
    parquet; the explicit schema avoids the inference pass (a full extra
    read at 100 TB)."""
    d = build_textfmt_files(spark, sf_dir)
    n = spark.read.schema(
        "n_nationkey long, n_name string, n_regionkey long"
    ).option("header", True).csv(f"{d}/nation_csv")
    r = spark.read.schema("r_regionkey long, r_name string").option(
        "header", True
    ).csv(f"{d}/region_csv")
    return (
        n.join(r, n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name")
        .agg(
            F.count("*").alias("n_nations"),
            F.min("n_name").alias("first_nation"),
        )
        .orderBy("r_name")
    )


@query(
    "scan_json_lines",
    oracle=f"""
    SELECT s_nationkey, COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS total_acctbal
    FROM read_json('{_TEXTFMT_ART}/supplier_json/*.json',
        format = 'newline_delimited',
        columns = {{'s_suppkey': 'BIGINT', 's_name': 'VARCHAR',
                    's_nationkey': 'BIGINT', 's_acctbal': 'DOUBLE'}})
    GROUP BY s_nationkey
    ORDER BY s_nationkey
    """,
    tags=("scan", "json", "source", "serving"),
)
def scan_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-typed JSON-lines scan over REAL files (committed artifact):
    supplier balances aggregated per nation through Spark's json source;
    the oracle parses the SAME files with DuckDB's read_json.  Doubles
    round-trip exactly (writers emit shortest-round-trip decimal strings,
    both parsers reconstruct the identical double), and the money sum
    goes through DECIMAL per repo convention.

    Scale shape: newline-delimited JSON splits by line ranges; explicit
    schema skips inference.  The JSON parse-once rewrite
    (`plans/json_once.py`) covers the expression-level JSON surface; this
    covers the SOURCE level."""
    d = build_textfmt_files(spark, sf_dir)
    s = spark.read.schema(
        "s_suppkey long, s_name string, s_nationkey long, s_acctbal double"
    ).json(f"{d}/supplier_json")
    return (
        s.groupBy("s_nationkey")
        .agg(
            F.count("*").alias("n_suppliers"),
            F.sum(F.col("s_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
        .orderBy("s_nationkey")
    )


# --- XML source (built-in since Spark 4.0, SPARK-44265) --------------------


def xmlfmt_dir(sf_dir: str) -> str:
    return _artifact_dir("xmlfmt", sf_dir)


def build_xmlfmt_files(spark: SparkSession, sf_dir: str) -> str:
    """Materialize an XML copy of the customer dim (key/name/nation/
    balance) as a committed artifact — the real files behind
    `scan_xml_rowtag`.  Idempotent + concurrency-safe via
    `ensure_artifact`."""
    t = Tables(spark, sf_dir)

    def _build(into: str) -> None:
        (
            t.customer.select(
                "c_custkey", "c_name", "c_nationkey", "c_acctbal"
            )
            .coalesce(1)
            .write.mode("overwrite")
            .option("rowTag", "customer")
            .option("rootTag", "customers")
            .xml(f"{into}/customer_xml")
        )

    return ensure_artifact(xmlfmt_dir(sf_dir), "_XMLFMT_COMPLETE", _build)


@query(
    "scan_xml_rowtag",
    oracle="""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           MIN(c_name) AS first_name,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS total_acctbal
    FROM customer
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
    tags=("scan", "xml", "source"),
)
def scan_xml_rowtag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML source scan (Spark 4's built-in XML data source, the former
    spark-xml package — SPARK-44265): customer balances aggregated per
    nation from REAL row-tagged XML files (committed artifact written
    from the same fixture).  DuckDB has no XML reader, so the oracle
    aggregates the ORIGINAL customer view — the artifact write is a pure
    projection of it, making the comparison a full write->parse->read
    round-trip proof: element escaping, double formatting (Java shortest
    round-trip toString, reparsed exactly) and explicit schema-on-read
    all have to be lossless for the hash to match.

    Scale shape: XML files split like any text source; the explicit
    schema (rowTag streaming parse) avoids schema inference's extra full
    read.  The XML surface completes the text-format source family
    (CSV `scan_csv_typed`, JSON `scan_json_lines`)."""
    d = build_xmlfmt_files(spark, sf_dir)
    c = (
        spark.read.schema(
            "c_custkey long, c_name string, c_nationkey long, c_acctbal double"
        )
        .option("rowTag", "customer")
        .xml(f"{d}/customer_xml")
    )
    return (
        c.groupBy("c_nationkey")
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.min("c_name").alias("first_name"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "join_bucketed_colocated",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM customer JOIN orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("join", "bucketed", "layout", "zero-exchange"),
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-free co-located join over hash-bucketed layouts: both sides
    are written bucketed+sorted on the join key (8 buckets), so the
    sort-merge join reads co-located buckets with NO exchange on either
    side — the shuffle was paid ONCE at write time, the open-layout
    analog of lakehouse table distribution.  The plan gate
    (`test_bucketed_query_join_has_no_join_key_exchange`) asserts no
    hashpartitioning exchange on either join key feeds the SMJ.

    The bucketed write happens in-query (catalog bucketing metadata is
    session-scoped), which keeps the query self-contained for the driver;
    at 100 TB the write is the one-time layout job and every subsequent
    join of the co-bucketed facts runs exchange-free.

    Oracle: the identical join/aggregate over the unbucketed views —
    bucketing is a pure layout permutation."""
    import tempfile

    t = Tables(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="bucketed_")
    write_bucketed(
        t.customer.select("c_custkey", "c_mktsegment"),
        "bkt_customer",
        f"{base}/customer",
        8,
        ["c_custkey"],
    )
    write_bucketed(
        t.orders.select("o_custkey", "o_totalprice"),
        "bkt_orders",
        f"{base}/orders",
        8,
        ["o_custkey"],
    )
    # hint forces SMJ (the small side would otherwise broadcast at fixture
    # scale, which hides the co-location this query demonstrates)
    c = spark.table("bkt_customer").hint("merge")
    o = spark.table("bkt_orders")
    return (
        c.join(o, c["c_custkey"] == o["o_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


# --- Avro source/sink (external module since Spark 2.4) --------------------


def avro_available(spark: SparkSession) -> bool:
    """True if the spark-avro DataSource module is on the classpath (the
    avro-core jars ship with pyspark, but the `avro` format lives in the
    separate spark-avro module)."""
    try:
        spark.read.format("avro").load("/nonexistent-probe-path")
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        return "Failed to find" not in msg and "ClassNotFound" not in msg
    return True


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan — environment-blocked in this container (no spark-avro
    jar, no network/pip to fetch it); the gate is pinned by
    `test_sources.py::test_avro_gated` and flips to a real scan the
    moment the module jar is present (`spark.jars.packages
    org.apache.spark:spark-avro_2.13:<ver>`)."""
    if not avro_available(spark):
        raise NotImplementedError(
            "spark-avro module jar is not on the classpath; add "
            "org.apache.spark:spark-avro to spark.jars.packages to enable "
            "this source"
        )
    return spark.read.format("avro").load(path)


def write_avro(df: DataFrame, path: str) -> None:
    """Avro sink twin of :func:`read_avro` — same capability gate."""
    if not avro_available(df.sparkSession):
        raise NotImplementedError(
            "spark-avro module jar is not on the classpath; add "
            "org.apache.spark:spark-avro to spark.jars.packages to enable "
            "this sink"
        )
    df.write.format("avro").mode("overwrite").save(path)
