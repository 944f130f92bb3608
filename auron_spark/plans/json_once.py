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

import re

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.registry import query
from auron_spark.tables import Tables

_IDX = re.compile(r"\[(\d+)\]")


def _parse_path(path: str) -> list[tuple[str, list[int]]]:
    """``"user.id"`` → [(user, []), (id, [])]; ``"vals[1]"`` → [(vals, [1])]."""
    segs = []
    for part in path.split("."):
        name = part.split("[", 1)[0]
        if not name:
            raise ValueError(f"bad JSON path segment {part!r} in {path!r}")
        segs.append((name, [int(i) for i in _IDX.findall(part)]))
    return segs


def _merge_into_tree(tree: dict, segs, leaf_arr: int) -> None:
    for depth, (name, idxs) in enumerate(segs):
        last = depth == len(segs) - 1
        node = tree.setdefault(name, {"arr": 0, "children": {}, "leaf": False})
        node["arr"] = max(node["arr"], len(idxs), leaf_arr if last else 0)
        # A path that terminates at a node some OTHER path descends through
        # (e.g. "user" alongside "user.id") cannot be served by one schema:
        # the struct-typed extraction would silently differ from
        # get_json_object's JSON-text result.  Fail loudly instead.
        if last:
            node["leaf"] = True
        if (last and node["children"]) or (not last and node["leaf"]):
            raise ValueError(
                f"JSON path conflict at {name!r}: requested both as a leaf "
                "and as a parent of deeper paths — extract the parent with a "
                "separate get_json_object call"
            )
        if not last:
            tree = node["children"]


def _tree_schema(tree: dict, top: bool = False) -> str:
    # DDL grammar: top level is "name type, ..."; nested struct fields use
    # the "name:type" form inside struct<...>.
    parts = []
    for name, node in sorted(tree.items()):
        inner = (
            f"struct<{_tree_schema(node['children'])}>"
            if node["children"]
            else "string"
        )
        for _ in range(node["arr"]):
            inner = f"array<{inner}>"
        parts.append(f"{name} {inner}" if top else f"{name}:{inner}")
    return ", ".join(parts) if top else ",".join(parts)


def json_extract_paths(
    df: DataFrame, json_col: str, fields: dict[str, str]
) -> DataFrame:
    """Extract multiple JSON paths with a SINGLE parse — the engine-level
    rewrite of N× ``get_json_object(col, path_i)`` (reference:
    `NativeConverters.scala:1213-1232` + `spark_get_json_object.rs`; SURVEY §4
    flags this as the one optimization Catalyst does not perform).

    ``fields`` maps output column name -> ``"path type"``.  Paths may be
    nested (``"user.id"``) and use array indices (``"vals[1]"``, 0-based like
    ``get_json_object``); ``type`` is the cast applied after extraction
    (``string`` = none; ``array<string>`` requests the whole array, e.g. to
    take its size).  All requested paths merge into one ``from_json`` schema,
    leaves parsed as string and cast per request — so repeated extraction of
    one column costs exactly one parse per row.
    """
    tree: dict = {}
    for spec in fields.values():
        path, typ = spec.rsplit(" ", 1)
        _merge_into_tree(tree, _parse_path(path), 1 if typ.startswith("array") else 0)
    # Materialize the parsed struct in its OWN projection: referencing the
    # from_json expression directly from every output column would let the
    # JSON schema-pruning rule split it into per-column parses with different
    # pruned schemas, which codegen CSE can no longer deduplicate.  As a
    # multiply-referenced non-cheap alias, CollapseProject keeps it un-inlined
    # → exactly one from_json in the plan (pinned in test_plans.py).
    parsed_col = f"__parsed_{json_col}"
    staged = df.select(
        "*", F.from_json(F.col(json_col), _tree_schema(tree, top=True)).alias(parsed_col)
    )
    cols: list[Column] = [F.col(c) for c in df.columns]
    for out_name, spec in fields.items():
        path, typ = spec.rsplit(" ", 1)
        extracted: Column = F.col(parsed_col)
        for name, idxs in _parse_path(path):
            extracted = extracted.getField(name)
            for i in idxs:
                extracted = extracted.getItem(i)
        if typ != "string" and not typ.startswith("array"):
            extracted = extracted.cast(typ)
        cols.append(extracted.alias(out_name))
    return staged.select(*cols)


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
