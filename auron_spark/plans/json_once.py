"""JSON parse-once rewrite.

The reference rewrites repeated `get_json_object(col, path_i)` into one
`Spark_ParseJson` + N `Spark_GetParsedJsonObject` so the JSON string is parsed
a single time (`NativeConverters.scala:1213-1232`, `spark_get_json_object.rs`).
SURVEY.md §4 flags this as the one optimization Catalyst does NOT do for us.

The idiomatic Spark equivalent: parse once with `from_json` into a struct,
then project struct fields.  `json_extract_paths` below is that rewrite as API
sugar — same observable semantics as N× get_json_object, one parse per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.registry import query
from auron_spark.tables import Tables


def json_extract_paths(
    df: DataFrame, json_col: str, fields: dict[str, str]
) -> DataFrame:
    """Extract multiple top-level JSON fields with a single parse.

    ``fields`` maps output column name -> "name type" of the top-level JSON
    key (e.g. ``{"k_val": "k string"}``).  Equivalent to N
    `get_json_object($json_col, '$.name')` calls but parses once.  The same
    key may be requested under several output names/types; it is parsed as
    string once and cast per request.
    """
    keys = {spec.split()[0] for spec in fields.values()}
    schema = ", ".join(f"{k} string" for k in sorted(keys))
    parsed = F.from_json(F.col(json_col), schema)
    cols: list[Column] = [F.col(c) for c in df.columns]
    for out_name, spec in fields.items():
        key, typ = spec.split()
        extracted = parsed.getField(key)
        if typ != "string":
            extracted = extracted.cast(typ)
        cols.append(extracted.alias(out_name))
    return df.select(*cols)


@query(
    "json_parse_once",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           length(json_extract_string(props, '$.k')) AS k_len
    FROM events
    WHERE user_id <= 15
    ORDER BY event_id
    """,
    tags=("json", "rewrite"),
)
def json_parse_once(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three extractions, one parse — equivalent by the oracle to three
    independent get_json_object calls."""
    t = Tables(spark, sf_dir)
    base = t.events.filter(F.col("user_id") <= 15).select("event_id", "props")
    out = json_extract_paths(base, "props", {"k_str": "k string", "k_num2": "k long"})
    return out.select(
        "event_id",
        "k_str",
        F.col("k_num2").alias("k_num"),
        F.length("k_str").alias("k_len"),
    ).orderBy("event_id")


@query(
    "fn_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 AS k_mod
    FROM events
    WHERE user_id <= 15
    ORDER BY event_id
    """,
    tags=("json", "variant"),
)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VariantType path (Spark 4): `parse_json` once into a variant,
    `variant_get` per extraction — the engine-native successor to the
    reference's parse-once rewrite (`NativeConverters.scala:1213-1232`):
    the variant is a parsed binary representation, so repeated extractions
    never re-parse the JSON text."""
    t = Tables(spark, sf_dir)
    v = F.parse_json(F.col("props"))
    return (
        t.events.filter(F.col("user_id") <= 15)
        .select(
            "event_id",
            F.variant_get(v, "$.k", "long").alias("k_num"),
            F.variant_get(v, "$.k", "string").alias("k_str"),
            (F.variant_get(v, "$.k", "long") % 7).alias("k_mod"),
        )
        .orderBy("event_id")
    )
