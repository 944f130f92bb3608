"""Generate operator family: explode / posexplode (+outer), json_tuple.

Reference: GenerateExec (`generate_exec.rs:50`) with explode/posexplode
(`generate/explode.rs`), json_tuple (`generate/json_tuple.rs`) and UDTF
wrappers, incl. the `outer` flag (proto `auron.proto:604-628`, converter
`AuronConverters.scala:1107-1121`).

Generators multiply rows map-side — no shuffle is introduced; at 100 TB the
only concern is output row-width amplification, which stays bounded here
(≤ words-per-name elements per input row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.registry import query
from auron_spark.tables import Tables


@query(
    "gen_explode",
    oracle="""
    SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word
    FROM part
    ORDER BY p_partkey, word
    """,
    tags=("generate", "explode"),
)
def gen_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode over an array column (split product names)."""
    t = Tables(spark, sf_dir)
    return (
        t.part.select("p_partkey", F.explode(F.split("p_name", " ")).alias("word"))
        .orderBy("p_partkey", "word")
    )


@query(
    "gen_posexplode",
    oracle="""
    SELECT p_partkey, u.pos AS pos, u.word AS word
    FROM (
        SELECT p_partkey,
               unnest(list_transform(range(1, len(w) + 1),
                                     i -> struct_pack(pos := i - 1, word := w[i]))) AS u
        FROM (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part)
    )
    ORDER BY p_partkey, pos
    """,
    tags=("generate", "posexplode"),
)
def gen_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — element with its 0-based position."""
    t = Tables(spark, sf_dir)
    return (
        t.part.select("p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos", "word"))
        .orderBy("p_partkey", "pos")
    )


@query(
    "gen_explode_outer",
    oracle="""
    SELECT p_partkey, unnest(CASE WHEN len(w) = 0 THEN [NULL] ELSE w END) AS word
    FROM (
        SELECT p_partkey,
               CASE WHEN p_size <= 5 THEN [] ELSE string_split(p_name, ' ') END AS w
        FROM part
    )
    ORDER BY p_partkey, word NULLS FIRST
    """,
    tags=("generate", "explode", "outer"),
)
def gen_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer: rows with empty arrays survive with NULL output (the
    reference's `outer` flag, `auron.proto:627`)."""
    t = Tables(spark, sf_dir)
    arr = F.when(F.col("p_size") <= 5, F.array().cast("array<string>")).otherwise(
        F.split("p_name", " ")
    )
    return (
        t.part.select("p_partkey", F.explode_outer(arr).alias("word"))
        .orderBy("p_partkey", F.col("word").asc_nulls_first())
    )


@query(
    "gen_json_tuple",
    oracle="""
    SELECT event_id, json_extract_string(props, '$.k') AS k
    FROM events
    WHERE user_id <= 10
    ORDER BY event_id
    """,
    tags=("generate", "json_tuple"),
)
def gen_json_tuple(spark: SparkSession, sf_dir: str) -> DataFrame:
    """json_tuple generator (`generate/json_tuple.rs`)."""
    t = Tables(spark, sf_dir)
    return (
        t.events.filter(F.col("user_id") <= 10)
        .select("event_id", F.json_tuple("props", "k").alias("k"))
        .orderBy("event_id")
    )


@query(
    "gen_python_udtf",
    oracle="""
    SELECT p_partkey, unnest(string_split(p_name, ' ')) AS tok
    FROM part
    WHERE p_size >= 48
    ORDER BY p_partkey, tok
    """,
    tags=("generate", "udtf"),
)
def gen_python_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 3.5+) — the rebuild's analogue of the reference's
    SparkUDTFWrapperContext FFI loop (`SparkUDTFWrapperContext.scala:95-144`).
    Tokenizes names; equivalent by construction to explode(split())."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="tok: string")
    class Tokenize:
        def eval(self, name: str):  # noqa: ANN001
            for tok in (name or "").split(" "):
                yield (tok,)

    t = Tables(spark, sf_dir)
    t.part.filter(F.col("p_size") >= 48).createOrReplaceTempView("udtf_part")
    spark.udtf.register("tokenize_udtf", Tokenize)
    return spark.sql(
        """
        SELECT p_partkey, t.tok AS tok
        FROM udtf_part, LATERAL tokenize_udtf(p_name) t
        ORDER BY p_partkey, tok
        """
    )


@query(
    "gen_inline",
    oracle="""
    SELECT p_partkey, metric, val FROM (
        SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val FROM part
        UNION ALL
        SELECT p_partkey, 'price' AS metric, p_retailprice AS val FROM part
    )
    ORDER BY p_partkey, metric
    """,
    tags=("generate", "inline"),
)
def gen_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inline(array<struct>) — explodes an array of structs into columns in
    one generator step.  Not a distinct native op in the reference (its
    Generate covers explode/json_tuple only, `auron.proto:604-628`); free in
    Spark.  Map-side, bounded 2× amplification."""
    t = Tables(spark, sf_dir)
    return (
        t.part.select(
            "p_partkey",
            F.inline(
                F.array(
                    F.struct(
                        F.lit("size").alias("metric"),
                        F.col("p_size").cast("double").alias("val"),
                    ),
                    F.struct(
                        F.lit("price").alias("metric"),
                        F.col("p_retailprice").alias("val"),
                    ),
                )
            ),
        )
        .orderBy("p_partkey", "metric")
    )


@query(
    "gen_python_udtf_analyze",
    oracle="""
    SELECT p_partkey,
           string_split(p_name, ' ')[1] AS w0,
           string_split(p_name, ' ')[2] AS w1,
           string_split(p_name, ' ')[3] AS w2
    FROM part
    WHERE p_size >= 48
    ORDER BY p_partkey
    """,
    tags=("generate", "udtf", "polymorphic"),
)
def gen_python_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic Python UDTF (Spark 4 `analyze()`): the OUTPUT SCHEMA is
    computed at plan time from a literal argument — here `n` pivot columns
    w0..w{n-1} — the Python-native counterpart of the reference's
    schema-carrying UDTF FFI (`SparkUDTFWrapperContext.scala:95-144`, which
    ships a fixed schema across the boundary; analyze() makes it dynamic).
    Called with n=3; the oracle pins the first three words per part name."""
    from pyspark.sql.functions import AnalyzeArgument, AnalyzeResult, lit, udtf
    from pyspark.sql.types import StringType, StructType

    @udtf
    class FirstWords:
        @staticmethod
        def analyze(name: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            for i in range(n.value):
                schema = schema.add(f"w{i}", StringType())
            return AnalyzeResult(schema=schema)

        def eval(self, name: str, n: int):  # noqa: ANN001
            words = (name or "").split(" ")
            yield tuple(words[i] if i < len(words) else None for i in range(n))

    t = Tables(spark, sf_dir)
    t.part.filter(F.col("p_size") >= 48).createOrReplaceTempView("udtf_part2")
    spark.udtf.register("first_words_udtf", FirstWords)
    return spark.sql(
        """
        SELECT p_partkey, t.w0, t.w1, t.w2
        FROM udtf_part2, LATERAL first_words_udtf(p_name, 3) t
        ORDER BY p_partkey
        """
    )


@query(
    "gen_stack",
    oracle="""
    SELECT p_partkey, 'retail' AS metric, CAST(p_retailprice AS DOUBLE) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
    ORDER BY p_partkey, metric
    """,
    tags=("generate", "stack", "unpivot"),
)
def gen_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `stack(n, ...)` generator — the row-expanding unpivot variant
    (vs `unpivot_part_metrics`' relational Unpivot node): each part row
    emits one (metric, val) row per measure.  Completes the generator
    family (explode / posexplode / inline / json_tuple / UDTF / stack).

    Scale shape: pure map-side row expansion inside whole-stage codegen —
    no shuffle until a downstream aggregate asks for one."""
    t = Tables(spark, sf_dir)
    return (
        t.part.select(
            "p_partkey",
            F.expr(
                "stack(2, 'retail', CAST(p_retailprice AS DOUBLE), "
                "'size', CAST(p_size AS DOUBLE)) AS (metric, val)"
            ),
        )
        .orderBy("p_partkey", "metric")
    )
