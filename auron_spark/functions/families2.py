"""Second function-family batch: higher-order array lambdas, map builders,
bitwise ops, null handling, intervals, nested JSON, to_json, ordered listagg.

Completes the §2.9 conversion-case inventory (`NativeConverters.scala:411-1246`)
plus the higher-order function surface the reference routes to its UDF
fallback wrapper — here they are first-class Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.registry import query
from auron_spark.tables import Tables


@query(
    "fn_higher_order",
    oracle="""
    SELECT p_partkey,
           array_to_string(list_transform(w, x -> upper(x)), ',') AS upped,
           -- duckdb: array_to_string of an empty filtered list yields NULL
           coalesce(array_to_string(list_filter(w, x -> length(x) > 4), ','), '')
             AS longs,
           len(list_filter(w, x -> contains(x, 'e'))) > 0 AS has_e,
           len(list_filter(w, x -> length(x) >= 3)) = len(w) AS all_ge3,
           list_reduce(list_transform(w, x -> length(x)), (a, b) -> a + b) AS tot_len,
           array_to_string(w[2:], ',') AS tail_slice,
           array_to_string(range(1, 4), ',') AS seq13,
           list_position(w, 'widget') AS widget_pos,
           w[-1] AS last_el,
           list_min(list_transform(w, x -> length(x))) AS min_len,
           list_max(list_transform(w, x -> length(x))) AS max_len
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part)
    ORDER BY p_partkey
    """,
    tags=("function", "higher-order", "array"),
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform/filter/exists/forall/aggregate/slice/sequence/array_position/
    element_at(-1)/min/max over arrays — Catalyst higher-order functions (the
    reference would fall back to its UDF wrapper for all of these)."""
    t = Tables(spark, sf_dir)
    w = F.split("p_name", " ")
    return t.part.select(
        "p_partkey",
        F.array_join(F.transform(w, lambda x: F.upper(x)), ",").alias("upped"),
        F.array_join(F.filter(w, lambda x: F.length(x) > 4), ",").alias("longs"),
        F.exists(w, lambda x: x.contains("e")).alias("has_e"),
        F.forall(w, lambda x: F.length(x) >= 3).alias("all_ge3"),
        F.aggregate(
            F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, b: a + b
        ).alias("tot_len"),
        F.array_join(F.slice(w, 2, 1000), ",").alias("tail_slice"),
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.lit(3)), lambda x: x.cast("string")),
            ",",
        ).alias("seq13"),
        F.array_position(w, "widget").alias("widget_pos"),
        F.element_at(w, -1).alias("last_el"),
        F.array_min(F.transform(w, lambda x: F.length(x))).alias("min_len"),
        F.array_max(F.transform(w, lambda x: F.length(x))).alias("max_len"),
    ).orderBy("p_partkey")


@query(
    "fn_map_builders",
    oracle="""
    SELECT s_suppkey,
           map_from_entries([{'k': 'bal', 'v': CAST(s_acctbal AS DOUBLE)},
                             {'k': 'key', 'v': CAST(s_suppkey AS DOUBLE)}])['bal'][1]
             AS from_entries_bal,
           map(['n'], [s_nationkey])['n'][1] AS from_arrays_n,
           CAST(map_from_entries([{'k': 'a', 'v': 1}, {'k': 'b', 'v': 2}])['b'][1]
                AS INTEGER) AS concat_b,
           len(map_keys(map(['x', 'y'], [1, 2]))) AS n_keys
    FROM supplier
    ORDER BY s_suppkey
    """,
    tags=("function", "map"),
)
def fn_map_builders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_from_arrays / map_from_entries / map_concat / map_keys + key access
    (`NativeConverters.scala:968-976`, `get_map_value.rs`).  Scalar outputs
    keep the cross-engine hash type-stable."""
    t = Tables(spark, sf_dir)
    m_entries = F.map_from_entries(
        F.array(
            F.struct(F.lit("bal").alias("k"), F.col("s_acctbal").cast("double").alias("v")),
            F.struct(F.lit("key").alias("k"), F.col("s_suppkey").cast("double").alias("v")),
        )
    )
    m_arrays = F.map_from_arrays(F.array(F.lit("n")), F.array(F.col("s_nationkey")))
    m_concat = F.map_concat(
        F.create_map(F.lit("a"), F.lit(1)), F.create_map(F.lit("b"), F.lit(2))
    )
    return t.supplier.select(
        "s_suppkey",
        m_entries.getItem("bal").alias("from_entries_bal"),
        m_arrays.getItem("n").alias("from_arrays_n"),
        m_concat.getItem("b").alias("concat_b"),
        F.size(F.map_keys(F.create_map(F.lit("x"), F.lit(1), F.lit("y"), F.lit(2)))).alias(
            "n_keys"
        ),
    ).orderBy("s_suppkey")


@query(
    "fn_bitwise",
    oracle="""
    SELECT p_partkey,
           p_size & 12 AS b_and,
           p_size | 3 AS b_or,
           xor(p_size, 21) AS b_xor,
           p_size << 2 AS b_shl,
           p_size >> 1 AS b_shr,
           ~p_size AS b_not,
           bit_count(CAST(p_size AS BIGINT)) AS b_cnt
    FROM part
    ORDER BY p_partkey
    """,
    tags=("function", "bitwise"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """& | ^ << >> ~ bit_count (`NativeConverters.scala:583-780` bitwise arm)."""
    t = Tables(spark, sf_dir)
    s = F.col("p_size")
    return t.part.select(
        "p_partkey",
        s.bitwiseAND(12).alias("b_and"),
        s.bitwiseOR(3).alias("b_or"),
        s.bitwiseXOR(21).alias("b_xor"),
        F.shiftleft(s, 2).alias("b_shl"),
        F.shiftright(s, 1).alias("b_shr"),
        F.bitwise_not(s).alias("b_not"),
        F.bit_count(s.cast("bigint")).alias("b_cnt"),
    ).orderBy("p_partkey")


@query(
    "fn_null_handling",
    oracle="""
    SELECT c_custkey,
           coalesce(b, -1.0) AS nvl_bal,
           CASE WHEN b IS NULL THEN 'missing' ELSE 'present' END AS nvl2_tag,
           coalesce(b, 0.0) IS NOT DISTINCT FROM b AS nullsafe_self,
           b IS DISTINCT FROM NULL AS distinct_from_null,
           isnan(CASE WHEN c_acctbal < -999 THEN 'nan'::DOUBLE ELSE 1.0 END) AS is_nan,
           CASE WHEN isnan(CASE WHEN c_acctbal < -999 THEN 'nan'::DOUBLE
                                ELSE c_acctbal END)
                THEN 0.0 ELSE c_acctbal END AS nanvl_bal
    FROM (SELECT c_custkey, c_acctbal,
                 CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS b
          FROM customer)
    ORDER BY c_custkey
    """,
    tags=("function", "null"),
)
def fn_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nvl/nvl2/null-safe equality (<=>)/isnan/nanvl
    (`NativeConverters.scala:944,982,846,879,1069-1071,1140-1143`)."""
    t = Tables(spark, sf_dir)
    base = t.customer.select(
        "c_custkey",
        "c_acctbal",
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal")).alias("b"),
    )
    nan_col = F.when(F.col("c_acctbal") < -999, F.lit(float("nan"))).otherwise(F.lit(1.0))
    nan_bal = F.when(F.col("c_acctbal") < -999, F.lit(float("nan"))).otherwise(
        F.col("c_acctbal")
    )
    return base.select(
        "c_custkey",
        F.nvl(F.col("b"), F.lit(-1.0)).alias("nvl_bal"),
        F.nvl2(F.col("b"), F.lit("present"), F.lit("missing")).alias("nvl2_tag"),
        F.coalesce(F.col("b"), F.lit(0.0)).eqNullSafe(F.col("b")).alias("nullsafe_self"),
        F.col("b").isNotNull().alias("distinct_from_null"),
        F.isnan(nan_col).alias("is_nan"),
        F.nanvl(nan_bal, F.lit(0.0)).alias("nanvl_bal"),
    ).orderBy("c_custkey")


@query(
    "fn_interval",
    oracle="""
    SELECT o_orderkey,
           strftime(CAST(o_orderdate + INTERVAL 90 MINUTE AS TIMESTAMP),
                    '%Y-%m-%d %H:%M:%S') AS plus_90m,
           strftime(CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP),
                    '%Y-%m-%d %H:%M:%S') AS plus_3mo,
           strftime(CAST(o_orderdate - INTERVAL 1 DAY AS TIMESTAMP),
                    '%Y-%m-%d %H:%M:%S') AS minus_1d,
           date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS dd_days,
           date_diff('month', TIMESTAMP '1995-01-01', o_orderdate) AS dd_months,
           o_orderdate + INTERVAL 1 DAY > o_orderdate AS interval_cmp
    FROM orders
    WHERE o_orderkey < 1500
    ORDER BY o_orderkey
    """,
    tags=("function", "interval", "datetime"),
)
def fn_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YearMonth + DayTime interval arithmetic (`auron.proto:861-865,933-934`
    scalar interval enum; full interval types here).  Outputs leave as
    FORMATTED STRINGS, not raw timestamps: collect() renders TimestampType
    in the Python process's LOCAL timezone, so raw-timestamp columns
    hash-diverge under a non-UTC driver host (round-3 TZ sweep)."""
    t = Tables(spark, sf_dir)
    d = F.col("o_orderdate")
    return (
        t.orders.filter(F.col("o_orderkey") < 1500)
        .select(
            "o_orderkey",
            F.date_format(d + F.expr("INTERVAL 90 MINUTE"), "yyyy-MM-dd HH:mm:ss").alias("plus_90m"),
            F.date_format(d + F.expr("INTERVAL 3 MONTH"), "yyyy-MM-dd HH:mm:ss").alias("plus_3mo"),
            F.date_format(d - F.expr("INTERVAL 1 DAY"), "yyyy-MM-dd HH:mm:ss").alias("minus_1d"),
            F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("dd_days"),
            (
                (F.year(d) - 1995) * 12 + F.month(d) - 1
            ).alias("dd_months"),
            ((d + F.expr("INTERVAL 1 DAY")) > d).alias("interval_cmp"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "fn_json_nested",
    oracle="""
    SELECT event_id,
           json_extract_string(j, '$.user.id') AS uid,
           json_extract_string(j, '$.vals[1]') AS second_val,
           json_extract_string(j, '$.user.missing') AS missing,
           json_array_length(j, '$.vals') AS n_vals
    FROM (
        SELECT event_id,
               '{"user":{"id":"' || CAST(user_id AS VARCHAR) ||
               '"},"vals":[' || CAST(event_id % 7 AS VARCHAR) || ',' ||
               CAST(event_id % 5 AS VARCHAR) || ']}' AS j
        FROM events WHERE user_id <= 10
    )
    ORDER BY event_id
    """,
    tags=("function", "json"),
)
def fn_json_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-path and array-index JSON extraction + json array length —
    the deep-path surface of `spark_get_json_object.rs`.  Three of the four
    extractions share ONE from_json parse via the nested-path parse-once
    rewrite; one raw deep-path get_json_object remains to keep that kernel
    covered."""
    from auron_spark.plans.json_once import json_extract_paths

    t = Tables(spark, sf_dir)
    j = F.concat(
        F.lit('{"user":{"id":"'),
        F.col("user_id").cast("string"),
        F.lit('"},"vals":['),
        (F.col("event_id") % 7).cast("string"),
        F.lit(","),
        (F.col("event_id") % 5).cast("string"),
        F.lit("]}"),
    )
    base = t.events.filter(F.col("user_id") <= 10).select("event_id", j.alias("j"))
    out = json_extract_paths(
        base,
        "j",
        {
            "second_val": "vals[1] string",
            "missing": "user.missing string",
            "vals_arr": "vals array<string>",
        },
    )
    return (
        out.select(
            "event_id",
            F.get_json_object("j", "$.user.id").alias("uid"),
            "second_val",
            "missing",
            F.size("vals_arr").alias("n_vals"),
        )
        .orderBy("event_id")
    )


@query(
    "fn_to_json_roundtrip",
    oracle="""
    SELECT r_regionkey,
           '{"key":' || CAST(r_regionkey AS VARCHAR) || ',"name":"' || r_name || '"}'
             AS js,
           r_name AS back_name
    FROM region
    ORDER BY r_regionkey
    """,
    tags=("function", "json", "to_json"),
)
def fn_to_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """to_json(struct) then from_json back — serialization round trip with
    the oracle checking the canonical JSON text."""
    t = Tables(spark, sf_dir)
    js = F.to_json(
        F.struct(F.col("r_regionkey").alias("key"), F.col("r_name").alias("name"))
    )
    return t.region.select(
        "r_regionkey",
        js.alias("js"),
        F.from_json(js, "key int, name string").getField("name").alias("back_name"),
    ).orderBy("r_regionkey")


@query(
    "agg_listagg_ordered",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    ORDER BY n_regionkey
    """,
    tags=("agg", "listagg"),
)
def agg_listagg_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (listagg/string_agg) via
    sort_array(collect_list) — deterministic concatenation."""
    t = Tables(spark, sf_dir)
    return (
        t.nation.groupBy("n_regionkey")
        .agg(F.array_join(F.sort_array(F.collect_list("n_name")), ",").alias("nations"))
        .orderBy("n_regionkey")
    )


@query(
    "fn_reference_tail",
    oracle="""
    SELECT o_orderkey,
           ROUND((year(o_orderdate) - 1995) * 12 + (month(o_orderdate) - 6)
                 + CASE WHEN day(o_orderdate) = 15 THEN 0.0
                        ELSE (day(o_orderdate) - 15) / 31.0 END, 8) AS mb,
           make_date(2020, month(o_orderdate), 15) AS md,
           chr(65 + CAST(o_orderkey % 26 AS INTEGER)) AS ch,
           octet_length(encode(o_orderpriority)) AS ol,
           CASE o_orderstatus WHEN 'O' THEN 1 WHEN 'F' THEN 2 WHEN 'P' THEN 3
                ELSE 0 END AS fis,
           CAST(factorial(CAST(o_orderkey % 10 AS INTEGER)) AS BIGINT) AS fact,
           ROUND(exp(CAST(o_orderkey % 3 AS DOUBLE)) - 1, 9) AS em
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("function", "math", "datetime", "string"),
)
def fn_reference_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining reference kernels: months_between (`spark_dates.rs`),
    make_date, chr, octet_length, find_in_set, factorial, expm1
    (`NativeConverters.scala:830-1082`).  The oracle re-derives Spark's
    months_between 31-day-fraction rule (DuckDB has no equivalent) and uses
    exp(x)-1 for expm1 (equal at 9-digit rounding for these inputs)."""
    t = Tables(spark, sf_dir)
    return t.orders.select(
        "o_orderkey",
        F.months_between(F.col("o_orderdate"), F.lit("1995-06-15").cast("timestamp")).alias("mb"),
        F.make_date(F.lit(2020), F.month("o_orderdate"), F.lit(15)).alias("md"),
        F.chr(F.lit(65) + F.col("o_orderkey") % 26).alias("ch"),
        F.octet_length("o_orderpriority").alias("ol"),
        F.find_in_set(F.col("o_orderstatus"), F.lit("O,F,P")).alias("fis"),
        F.factorial((F.col("o_orderkey") % 10).cast("int")).alias("fact"),
        F.round(F.expm1((F.col("o_orderkey") % 3).cast("double")), 9).alias("em"),
    ).orderBy("o_orderkey")


@query(
    "fn_try_arithmetic",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           CASE WHEN l_discount = 0 THEN NULL
                ELSE l_extendedprice / l_discount END AS safe_ratio,
           CASE WHEN l_quantity = l_quantity THEN NULL END AS div_zero,
           TRY_CAST(l_returnflag AS INTEGER) AS bad_cast,
           CASE WHEN l_orderkey > 0 THEN NULL
                ELSE 9223372036854775807 + l_orderkey END AS add_overflow
    FROM lineitem
    ORDER BY l_orderkey, l_linenumber, l_quantity
    """,
    tags=("function", "try", "ansi"),
)
def fn_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_divide/try_cast/try_add — NULL-on-error arithmetic (ANSI-safe
    variants).  The reference's TryCast path is `NativeConverters.scala:476-511`;
    the try_* arithmetic family is Spark-native.  The oracle spells each
    failure case explicitly since DuckDB errors where Spark yields NULL."""
    t = Tables(spark, sf_dir)
    return t.lineitem.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.try_divide(F.col("l_extendedprice"), F.col("l_discount")).alias("safe_ratio"),
        F.try_divide(F.col("l_quantity"), F.col("l_quantity") - F.col("l_quantity"))
        .alias("div_zero"),
        F.try_to_number(F.col("l_returnflag"), F.lit("999")).cast("int").alias("bad_cast"),
        F.try_add(F.lit(9223372036854775807), F.col("l_orderkey")).alias("add_overflow"),
    ).orderBy("l_orderkey", "l_linenumber", "l_quantity")


@query(
    "fn_binary_map_tail",
    oracle="""
    SELECT p_partkey,
           bit_length(p_name) AS bl,
           CAST(unhex(hex(encode(p_name))) AS VARCHAR) AS roundtrip,
           p_brand AS m_brand,
           CAST(p_size AS VARCHAR) AS m_size,
           array_to_string(flatten([string_split(p_name, ' '),
                                    string_split(p_type, ' ')]), '|') AS flat
    FROM part
    ORDER BY p_partkey
    """,
    tags=("function", "binary", "map"),
)
def fn_binary_map_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bit_length, hex/unhex roundtrip, str_to_map, flatten — the last §2.9
    kernels (`NativeConverters.scala:917-1082,948`, `spark_strings.rs`)."""
    t = Tables(spark, sf_dir)
    m = F.str_to_map(
        F.concat(F.lit("brand:"), F.col("p_brand"), F.lit(",size:"), F.col("p_size"))
    )
    return t.part.select(
        "p_partkey",
        F.bit_length("p_name").alias("bl"),
        F.decode(F.unhex(F.hex(F.encode(F.col("p_name"), "utf-8"))), "utf-8").alias(
            "roundtrip"
        ),
        m.getItem("brand").alias("m_brand"),
        m.getItem("size").alias("m_size"),
        F.array_join(
            F.flatten(F.array(F.split("p_name", " "), F.split("p_type", " "))), "|"
        ).alias("flat"),
    ).orderBy("p_partkey")


@query(
    "fn_datetime_tail",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate AS DATE) - 7 AS minus_week,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3m,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           CAST(floor(epoch(o_orderdate)) AS BIGINT) AS unix_ts,
           strftime(make_timestamp(CAST(floor(epoch(o_orderdate)) AS BIGINT) * 1000000),
                    '%Y-%m-%d %H:%M:%S') AS from_unix,
           CAST(o_orderdate AS DATE) AS as_date,
           CAST(o_orderdate AS DATE)
             + CAST(CASE WHEN (1 - dayofweek(o_orderdate) + 7) % 7 = 0 THEN 7
                         ELSE (1 - dayofweek(o_orderdate) + 7) % 7
                    END AS INTEGER) AS next_monday
    FROM orders
    ORDER BY o_orderkey
    """,
    tags=("function", "datetime"),
)
def fn_datetime_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_sub / add_months / dayofyear / unix_timestamp / from_unixtime /
    to_date / next_day — the remaining `spark_dates.rs` surface.  `plus_3m`
    casts to DATE on both sides; `next_day('Mo')` is re-derived in the oracle
    from dayofweek arithmetic (DuckDB has no next_day)."""
    t = Tables(spark, sf_dir)
    d = F.to_date("o_orderdate")
    return t.orders.select(
        "o_orderkey",
        F.date_sub(d, 7).alias("minus_week"),
        F.add_months(d, 3).alias("plus_3m"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.unix_timestamp("o_orderdate").alias("unix_ts"),
        F.from_unixtime(F.unix_timestamp("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias(
            "from_unix"
        ),
        d.alias("as_date"),
        F.next_day(d, "Mon").alias("next_monday"),
    ).orderBy("o_orderkey")


@query(
    "fn_array_set_ops",
    oracle="""
    SELECT p_partkey,
           array_to_string(list_sort(list_distinct(nw || tw)), '|') AS u,
           COALESCE(array_to_string(list_sort(list_distinct(
               list_filter(nw, x -> list_contains(tw, x)))), '|'), '') AS i,
           COALESCE(array_to_string(list_sort(list_distinct(
               list_filter(nw, x -> NOT list_contains(tw, x)))), '|'), '') AS e,
           array_to_string(list_filter(nw, x -> x <> 'small'), '|') AS removed,
           len(nw) + len(tw) AS zip_len,
           CAST(list_position(nw, 'small') AS INTEGER) AS pos_small,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           len(regexp_extract_all(p_name, '[aeiou]')) AS n_vowels,
           split_part(p_type, ' ', 1) AS first_type_word
    FROM (
        SELECT p_partkey, p_name, p_type,
               string_split(p_name, ' ') AS nw,
               string_split(p_type, ' ') AS tw
        FROM part
    )
    ORDER BY p_partkey
    """,
    tags=("function", "array", "regexp"),
)
def fn_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array_union/intersect/except/remove, arrays_zip length, array_position,
    regexp_extract / regexp_count, substring_index — the remaining array and
    regex kernels (`NativeConverters.scala:948,968-976,1144-1199`; DataFusion
    regex exprs).  Set-op outputs are sorted+joined so ordering differences
    between engines' set implementations cannot flake the hash."""
    t = Tables(spark, sf_dir)
    base = t.part.select(
        "p_partkey",
        "p_name",
        "p_type",
        F.split("p_name", " ").alias("nw"),
        F.split("p_type", " ").alias("tw"),
    )
    return base.select(
        "p_partkey",
        F.array_join(F.array_sort(F.array_union("nw", "tw")), "|").alias("u"),
        F.array_join(F.array_sort(F.array_intersect("nw", "tw")), "|").alias("i"),
        F.array_join(F.array_sort(F.array_except("nw", "tw")), "|").alias("e"),
        F.array_join(F.array_remove("nw", "small"), "|").alias("removed"),
        (F.size(F.arrays_zip("nw", "nw")) + F.size("tw")).alias("zip_len"),
        F.array_position("nw", "small").cast("int").alias("pos_small"),
        F.regexp_extract("p_name", r"([a-z]+)$", 1).alias("last_word"),
        F.regexp_count("p_name", F.lit("[aeiou]")).cast("int").alias("n_vowels"),
        F.substring_index("p_type", " ", 1).alias("first_type_word"),
    ).orderBy("p_partkey")


@query(
    "fn_mask_redact",
    oracle="""
    SELECT p_partkey,
           regexp_replace(regexp_replace(regexp_replace(
               p_name || ' #' || CAST(p_partkey AS VARCHAR) || ' Qty9',
               '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
             AS masked,
           regexp_replace(p_name, '[a-z]', '*', 'g') AS masked_lower_star
    FROM part
    WHERE p_partkey < 200
    ORDER BY p_partkey
    """,
    tags=("string", "mask", "pii"),
)
def fn_mask_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`mask()` — the built-in data-masking scalar (upper→X, lower→x,
    digit→n by default; per-class overrides) used for PII-safe previews of
    sensitive columns; complements the regex scrubbing in text_pii_redact.
    The oracle re-derives the masking with portable character-class
    replaces.  Map-side codegen scalar."""
    t = Tables(spark, sf_dir)
    mixed = F.concat(
        F.col("p_name"), F.lit(" #"), F.col("p_partkey").cast("string"), F.lit(" Qty9")
    )
    return (
        t.part.where(F.col("p_partkey") < 200)
        .select(
            "p_partkey",
            F.mask(mixed).alias("masked"),
            F.mask(
                F.col("p_name"),
                upperChar=F.lit(None).cast("string"),
                lowerChar=F.lit("*"),
                digitChar=F.lit(None).cast("string"),
                otherChar=F.lit(None).cast("string"),
            ).alias("masked_lower_star"),
        )
        .orderBy("p_partkey")
    )


@query(
    "fn_xml_xpath",
    oracle="""
    WITH xml AS (
        SELECT doc_id,
               '<doc id="' || CAST(doc_id AS VARCHAR) || '"><lang>' || lang
               || '</lang><src>' || source || '</src><n>'
               || CAST(n_chars AS VARCHAR) || '</n></doc>' AS x
        FROM documents WHERE doc_id < 200
    )
    SELECT doc_id,
           regexp_extract(x, '<lang>([^<]*)</lang>', 1) AS lang_x,
           regexp_extract(x, '<src>([^<]*)</src>', 1) AS src_x,
           CAST(regexp_extract(x, '<n>([0-9]+)</n>', 1) AS BIGINT) AS n_x,
           regexp_extract(x, 'id="([^"]*)"', 1) AS id_attr
    FROM xml
    ORDER BY doc_id
    """,
    tags=("xml", "xpath", "generate"),
)
def fn_xml_xpath(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML extraction via the xpath_* scalar family — the third
    semi-structured format next to JSON (fn_json*) and variant
    (fn_variant_json); feed ingestion (RSS/sitemaps/MathML corpora) needs
    it.  Spark evaluates real XPath (elements + attributes); the oracle
    re-derives the same fields with portable regexes over deterministic
    synthetic XML (regex-safe by construction — no nesting of the extracted
    tags).  Map-side codegen scalars."""
    t = Tables(spark, sf_dir)
    x = F.concat(
        F.lit('<doc id="'), F.col("doc_id").cast("string"), F.lit('"><lang>'),
        F.col("lang"), F.lit("</lang><src>"), F.col("source"),
        F.lit("</src><n>"), F.col("n_chars").cast("string"), F.lit("</n></doc>"),
    )
    return (
        t.documents.where(F.col("doc_id") < 200)
        .select(
            "doc_id",
            F.xpath_string(x, F.lit("/doc/lang")).alias("lang_x"),
            F.xpath_string(x, F.lit("/doc/src")).alias("src_x"),
            F.xpath_long(x, F.lit("/doc/n")).alias("n_x"),
            F.xpath_string(x, F.lit("/doc/@id")).alias("id_attr"),
        )
        .orderBy("doc_id")
    )


@query(
    "fn_csv_parse",
    oracle="""
    WITH line AS (
        SELECT p_partkey,
               CAST(p_partkey AS VARCHAR) || ',' || p_brand || ','
                 || CAST(p_size AS VARCHAR) AS csv_line
        FROM part WHERE p_partkey < 300
    )
    SELECT p_partkey,
           string_split(csv_line, ',')[1] AS f_key,
           string_split(csv_line, ',')[2] AS f_brand,
           CAST(string_split(csv_line, ',')[3] AS BIGINT) AS f_size
    FROM line
    ORDER BY p_partkey
    """,
    tags=("csv", "parse"),
)
def fn_csv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_csv: schema-directed parsing of CSV-encoded string columns (the
    embedded-CSV cousin of from_json) — common in log ingestion where a
    field carries a delimited payload.  Round-trips through to_csv upstream
    of the parse so both directions are exercised; the oracle splits the
    same deterministic line.  Map-side codegen."""
    t = Tables(spark, sf_dir)
    line = t.part.where(F.col("p_partkey") < 300).select(
        "p_partkey",
        F.to_csv(
            F.struct(
                F.col("p_partkey").cast("string").alias("k"),
                F.col("p_brand").alias("b"),
                F.col("p_size").cast("string").alias("s"),
            )
        ).alias("csv_line"),
    )
    parsed = line.select(
        "p_partkey",
        F.from_csv(
            "csv_line", F.lit("f_key string, f_brand string, f_size bigint")
        ).alias("p"),
    )
    return parsed.select(
        "p_partkey", "p.f_key", "p.f_brand", "p.f_size"
    ).orderBy("p_partkey")


@query(
    "fn_map_higher_order",
    oracle="""
    SELECT o_orderkey,
           'a+1:' || CAST(o_orderkey % 7 AS VARCHAR)
             || ',b+1:' || CAST(o_orderkey % 11 AS VARCHAR) AS keys_up,
           'a:' || CAST((o_orderkey % 7) * 2 AS VARCHAR)
             || ',b:' || CAST((o_orderkey % 11) * 2 AS VARCHAR) AS vals_doubled,
           'a:' || CAST((o_orderkey % 7) + (o_orderkey % 5) AS VARCHAR)
             || ',b:' || CAST((o_orderkey % 11) + (o_orderkey % 3) AS VARCHAR)
             AS zipped_sum,
           CASE WHEN o_orderkey % 7 > 3 AND o_orderkey % 11 > 3 THEN 'a,b'
                WHEN o_orderkey % 7 > 3 THEN 'a'
                WHEN o_orderkey % 11 > 3 THEN 'b'
                ELSE '' END AS big_keys
    FROM orders
    WHERE o_orderkey < 500
    ORDER BY o_orderkey
    """,
    tags=("map", "higher-order"),
)
def fn_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map higher-order functions — transform_keys / transform_values /
    map_zip_with / map_filter — closing the §2.9 higher-order family beyond
    the array lambdas (fn_higher_order).  Maps are built deterministically
    from orderkey residues; outputs serialize entries in fixed key order so
    the oracle (which lacks map lambdas and re-derives the arithmetic
    directly) compares as plain strings."""
    t = Tables(spark, sf_dir)
    m1 = F.create_map(
        F.lit("a"), F.col("o_orderkey") % 7, F.lit("b"), F.col("o_orderkey") % 11
    )
    m2 = F.create_map(
        F.lit("a"), F.col("o_orderkey") % 5, F.lit("b"), F.col("o_orderkey") % 3
    )

    def ser(m) -> "F.Column":
        # fixed-order serialization: a then b (map iteration order is
        # insertion order for create_map, but be explicit anyway)
        return F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.map_keys(m)),
                lambda k: F.concat(k, F.lit(":"), F.element_at(m, k).cast("string")),
            ),
        )

    keys_up = F.transform_keys(m1, lambda k, v: F.concat(k, F.lit("+1")))
    vals_doubled = F.transform_values(m1, lambda k, v: v * 2)
    zipped = F.map_zip_with(m1, m2, lambda k, v1, v2: v1 + v2)
    big = F.map_filter(m1, lambda k, v: v > 3)
    return (
        t.orders.where(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.map_keys(keys_up)),
                    lambda k: F.concat(
                        k, F.lit(":"), F.element_at(keys_up, k).cast("string")
                    ),
                ),
            ).alias("keys_up"),
            ser(vals_doubled).alias("vals_doubled"),
            ser(zipped).alias("zipped_sum"),
            F.concat_ws(",", F.array_sort(F.map_keys(big))).alias("big_keys"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "fn_math_trig",
    oracle="""
    SELECT p_partkey,
           ROUND(sin(CAST(p_size AS DOUBLE) / 10.0), 6) AS sin_v,
           ROUND(cos(CAST(p_size AS DOUBLE) / 10.0), 6) AS cos_v,
           ROUND(atan2(CAST(p_size AS DOUBLE),
                       CAST(p_partkey % 17 + 1 AS DOUBLE)), 6) AS atan2_v,
           ROUND(degrees(atan(CAST(p_size AS DOUBLE) / 25.0)), 6) AS deg_v,
           ROUND(cbrt(CAST(p_partkey AS DOUBLE)), 6) AS cbrt_v,
           ROUND(log10(CAST(p_partkey + 1 AS DOUBLE)), 6) AS log10_v
    FROM part
    WHERE p_partkey < 1000
    ORDER BY p_partkey
    """,
    tags=("function", "math", "trig"),
)
def fn_math_trig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trigonometric / transcendental tail of the math family (sin, cos,
    atan2, degrees, cbrt, log10) — closing the last uncovered scalar corner.
    These go through libm on both engines; ROUND(·,6) absorbs the possible
    last-ulp divergence, and because fixture inputs are fixed and both
    libm implementations are deterministic, a green sweep at all three SFs
    (verified round 3) means the comparison is stable, not probabilistic."""
    t = Tables(spark, sf_dir)
    sz = F.col("p_size").cast("double")
    return (
        t.part.where(F.col("p_partkey") < 1000)
        .select(
            "p_partkey",
            F.round(F.sin(sz / 10.0), 6).alias("sin_v"),
            F.round(F.cos(sz / 10.0), 6).alias("cos_v"),
            F.round(
                F.atan2(sz, (F.col("p_partkey") % 17 + 1).cast("double")), 6
            ).alias("atan2_v"),
            F.round(F.degrees(F.atan(sz / 25.0)), 6).alias("deg_v"),
            F.round(F.cbrt(F.col("p_partkey").cast("double")), 6).alias("cbrt_v"),
            F.round(F.log10((F.col("p_partkey") + 1).cast("double")), 6).alias(
                "log10_v"
            ),
        )
        .orderBy("p_partkey")
    )


# --- Spark 4 surface tail: collation + native listagg ----------------------


@query(
    "fn_collation_lcase",
    oracle="""
    WITH d AS (
        SELECT CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment
               ELSE upper(substr(c_mktsegment, 1, 1))
                    || lower(substr(c_mktsegment, 2)) END AS seg
        FROM customer
    )
    SELECT CAST(SUM(CASE WHEN lower(seg) = lower('BUILDING')
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_ci,
           CAST(SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END)
               AS BIGINT) AS n_cs,
           CAST(SUM(CASE WHEN lower(seg) LIKE lower('Build') || '%'
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_prefix_ci
    FROM d
    """,
    tags=("functions", "collation", "spark4"),
)
def fn_collation_lcase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware string semantics (Spark 4 COLLATE, SPARK-46830):
    case-insensitive equality and prefix matching via the UTF8_LCASE
    collation — the engine-level answer to lower()-wrapping every
    comparison (the collation participates in codegen, pushdown and join
    keys; the reference has no collation support at all).  The fixture's
    segments are re-cased half-and-half so both variants exist; the
    oracle computes the same three counts with explicit lower() —
    identical semantics for ASCII data, which is the contract being
    proven.

    Scale shape: map-side comparisons + one scalar aggregate."""
    t = Tables(spark, sf_dir)
    t.customer.createOrReplaceTempView("cust_coll")
    return spark.sql(
        """
        WITH d AS (
            SELECT CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment
                   ELSE initcap(lower(c_mktsegment)) END AS seg
            FROM cust_coll
        )
        SELECT CAST(SUM(CASE WHEN seg COLLATE UTF8_LCASE = 'BUILDING'
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_ci,
               CAST(SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_cs,
               CAST(SUM(CASE WHEN startswith(seg COLLATE UTF8_LCASE,
                                             'Build')
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_prefix_ci
        FROM d
        """
    )


@query(
    "agg_listagg_native",
    oracle="""
    SELECT c_mktsegment,
           string_agg(DISTINCT n_name, ',' ORDER BY n_name) AS nations,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    tags=("agg", "listagg", "spark4"),
)
def agg_listagg_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``listagg(DISTINCT ...) WITHIN GROUP (ORDER BY ...)``
    (Spark 4.0, SPARK-42746) — the SQL-standard ordered string aggregate,
    previously emulated via array_join(array_sort(collect_set))
    (`agg_listagg_ordered`); this proves the engine's own aggregate
    against DuckDB's string_agg with the same DISTINCT + ORDER BY
    modifiers.

    Scale shape: partial/final aggregate at group grain; state is the
    distinct set per group (bounded by |nations|)."""
    t = Tables(spark, sf_dir)
    t.customer.createOrReplaceTempView("cust_la")
    t.nation.createOrReplaceTempView("nation_la")
    return spark.sql(
        """
        SELECT c_mktsegment,
               listagg(DISTINCT n_name, ',')
                   WITHIN GROUP (ORDER BY n_name) AS nations,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM cust_la JOIN nation_la ON c_nationkey = n_nationkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
        """
    )


@query(
    "fn_url_parse",
    oracle="""
    WITH urls AS (
        SELECT doc_id, lang,
               'https://' || source || '.Example.COM/docs/'
                 || CAST(doc_id AS VARCHAR)
                 || '?utm_source=feed&lang=' || lang || '&utm_campaign=x'
                 AS url
        FROM documents
    )
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS lang_param,
           replace(replace(replace('q=a b&lang=' || lang, ' ', '+'),
                           '&', '%26'), '=', '%3D') AS encoded,
           'q=a b&lang=' || lang AS decoded
    FROM urls
    ORDER BY doc_id
    """,
    tags=("functions", "url", "string"),
)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL function family: `parse_url` component extraction (HOST / PATH
    / QUERY / named query parameter) plus the `url_encode` /
    `url_decode` round trip — Spark's java.net-backed built-ins, proven
    against a regexp/replace oracle (DuckDB has no parse_url or
    url_encode, so the oracle spells out RFC-1738 form-encoding for the
    exercised alphabet: space -> '+', '&' -> %26, '=' -> %3D).

    The URLs are synthesized deterministically from document metadata
    (the `text_url_canonicalize` pattern).  All functions are map-side
    codegen expressions; the only plan cost is the scan + sort."""
    t = Tables(spark, sf_dir)
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".Example.COM/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_source=feed&lang="),
        F.col("lang"),
        F.lit("&utm_campaign=x"),
    )
    plain = F.concat(F.lit("q=a b&lang="), F.col("lang"))
    return (
        t.documents.select("doc_id", "lang", url.alias("url"), plain.alias("plain"))
        .select(
            "doc_id",
            F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
            F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
            F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
            F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias(
                "lang_param"
            ),
            F.url_encode(F.col("plain")).alias("encoded"),
            F.url_decode(F.url_encode(F.col("plain"))).alias("decoded"),
        )
        .orderBy("doc_id")
    )
