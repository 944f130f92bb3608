"""Kafka source with JSON decode — reference parity surface.

Reference: the Flink extension's native Kafka scan
(`native-engine/datafusion-ext-plans/src/flink/kafka_scan_exec.rs:81`) with
JSON deserialization (`flink/serde/json_deserializer.rs`) and startup modes
GROUP_OFFSET / EARLIEST / LATEST / TIMESTAMP (`auron.proto:780-802`).

Spark-native equivalent: `readStream.format("kafka")` + `from_json` over the
value bytes.  The Kafka connector jars are not in this container, so the
builder is capability-gated like the lakehouse scans; the *decode stage* —
the part with real logic — is a plain DataFrame transformation, so
`decode_json_values` is fully testable by feeding it any DataFrame with a
binary `value` column (tests/test_streaming.py drives it without a broker).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: reference startup modes (auron.proto:780-802) -> Kafka option value
STARTING_OFFSETS = {
    "EARLIEST": "earliest",
    "LATEST": "latest",
    "GROUP_OFFSET": "earliest",  # Spark manages offsets per checkpoint, not group
    "TIMESTAMP": None,  # needs startingOffsetsByTimestamp
}


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark.readStream.format("kafka").option(
            "kafka.bootstrap.servers", "probe:9092"
        ).option("subscribe", "probe").load()
    except Exception as e:  # noqa: BLE001
        return "Failed to find" not in str(e) and "ClassNotFound" not in str(e)
    return True


def decode_json_values(raw: DataFrame, schema: str, value_col: str = "value") -> DataFrame:
    """The JSON decode stage: binary value → typed columns.

    Parses once per row (`from_json` into a struct, then a single star
    expansion — the reference's parse-once design,
    `json_deserializer.rs` / SURVEY.md §4)."""
    parsed = F.from_json(F.col(value_col).cast("string"), schema)
    return raw.withColumn("_parsed", parsed).select(
        *[c for c in raw.columns if c != value_col], "_parsed.*"
    )


def startup_options(
    topic: str, startup_mode: str = "EARLIEST", timestamp_ms: int | None = None
) -> dict[str, str]:
    """Reference startup mode → Spark Kafka reader options (pure function —
    unit-tested without a broker; `auron.proto:780-802` modes):

    - EARLIEST/LATEST → ``startingOffsets``;
    - GROUP_OFFSET → ``earliest`` (Spark tracks offsets per checkpoint, not
      per consumer group — the checkpoint IS the group state);
    - TIMESTAMP → ``startingOffsetsByTimestamp`` with the -1 partition
      wildcard."""
    if startup_mode not in STARTING_OFFSETS:
        raise ValueError(f"unknown startup mode {startup_mode!r}")
    if startup_mode == "TIMESTAMP":
        if timestamp_ms is None:
            raise ValueError("TIMESTAMP startup mode requires timestamp_ms")
        return {
            "startingOffsetsByTimestamp": f'{{"{topic}": {{"-1": {timestamp_ms}}}}}'
        }
    return {"startingOffsets": STARTING_OFFSETS[startup_mode]}


def read_kafka_json(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema: str,
    startup_mode: str = "EARLIEST",
    timestamp_ms: int | None = None,
) -> DataFrame:
    """Kafka topic → decoded streaming DataFrame (requires connector jars)."""
    opts = startup_options(topic, startup_mode, timestamp_ms)
    if not kafka_available(spark):
        raise NotImplementedError(
            "spark-sql-kafka connector jars are not on the classpath; add "
            "org.apache.spark:spark-sql-kafka-0-10_2.13 to spark.jars.packages"
        )
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    return decode_json_values(reader.load(), schema)


def protobuf_available() -> bool:
    """The spark-protobuf module ships separately from pyspark; gate on it."""
    try:
        from pyspark.sql.protobuf.functions import from_protobuf  # noqa: F401
    except ImportError:
        return False
    return True


def decode_protobuf_values(
    raw: DataFrame,
    message_name: str,
    descriptor_file: str,
    value_col: str = "value",
) -> DataFrame:
    """PROTOBUF decode stage — the reference Kafka source's second codec
    (`auron.proto:780-802` lists JSON and PROTOBUF; deserializer
    `flink/serde/`).  Spark-native spelling: `from_protobuf(value,
    message_name, descFilePath)` then star-expand, exactly parallel to
    `decode_json_values`.  Requires the spark-protobuf jar + a compiled
    descriptor set; gated here because neither ships in this container."""
    if not protobuf_available():
        raise NotImplementedError(
            "protobuf decode needs the spark-protobuf module "
            "(pyspark.sql.protobuf); not available in this environment"
        )
    from pyspark.sql.protobuf.functions import from_protobuf

    parsed = from_protobuf(F.col(value_col), message_name, descFilePath=descriptor_file)
    return raw.withColumn("_parsed", parsed).select(
        *[c for c in raw.columns if c != value_col], "_parsed.*"
    )
