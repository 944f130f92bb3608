"""Per-family scalar-function unit queries.

Reference surface: `NativeConverters.scala:411-1246` + function registry
`native-engine/datafusion-ext-functions/src/lib.rs:50-101`.  Every function the
reference implements as a Rust kernel maps to a built-in
`pyspark.sql.functions` call (JVM-side, codegen'd) — the whole point of the
Spark-first rebuild: nothing below leaves the JVM.

Each query projects one family over a fixture table, aliased identically to the
DuckDB oracle.  Engine-specific spellings differ (e.g. Spark `instr` ↔ DuckDB
`strpos`, Spark `sha2(x,256)` ↔ DuckDB `sha256`) — the point of the oracle is
semantic equivalence, not syntax.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.registry import query
from auron_spark.tables import Tables


@query(
    "fn_string_basic",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up,
           lower(p_type) AS lo,
           length(p_name) AS len,
           substr(p_name, 2, 3) AS sub,
           concat_ws('|', p_brand, p_type) AS cw,
           reverse(p_name) AS rev,
           ascii(p_name) AS asc_first,
           strpos(p_name, ' ') AS sp_pos,
           repeat(p_brand, 2) AS rep,
           trim('  ' || p_name || ' ') AS trimmed,
           replace(p_name, ' ', '_') AS repl
    FROM part
    ORDER BY p_partkey
    """,
    tags=("function", "string"),
)
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/length/substring/concat_ws/reverse/ascii/instr/repeat/trim/
    replace (reference kernels in `spark_strings.rs`)."""
    t = Tables(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_type").alias("lo"),
        F.length("p_name").alias("len"),
        F.substring("p_name", 2, 3).alias("sub"),
        F.concat_ws("|", "p_brand", "p_type").alias("cw"),
        F.reverse("p_name").alias("rev"),
        F.ascii("p_name").alias("asc_first"),
        F.instr("p_name", " ").alias("sp_pos"),
        F.repeat("p_brand", 2).alias("rep"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("trimmed"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("repl"),
    ).orderBy("p_partkey")


@query(
    "fn_string_pad_case",
    oracle="""
    SELECT p_partkey,
           lpad(p_brand, 12, '*') AS lp,
           rpad(p_brand, 12, '#') AS rp,
           ltrim('xxabc', 'x') AS lt,
           rtrim('abcyy', 'y') AS rt,
           translate(p_name, 'aeiou', 'AEIOU') AS tr,
           levenshtein(p_name, 'red widget') AS lev,
           starts_with(p_name, 'red') AS sw,
           ends_with(p_name, 'bolt') AS ew,
           contains(p_name, 'wid') AS ct,
           array_to_string(
             list_transform(string_split(p_name, ' '),
                            w -> upper(w[1]) || w[2:]), ' ') AS ini,
           split_part(p_name, ' ', 1) AS first_word,
           repeat(' ', 2) || p_brand AS spaced,
           left(p_type, 3) AS l3,
           right(p_type, 3) AS r3
    FROM part
    ORDER BY p_partkey
    """,
    tags=("function", "string"),
)
def fn_string_pad_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lpad/rpad/ltrim/rtrim/translate/levenshtein/starts/ends/contains/
    initcap/split-element/space/left/right.  DuckDB has no initcap or space —
    the oracle emulates them, proving semantics rather than names."""
    t = Tables(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.lpad("p_brand", 12, "*").alias("lp"),
        F.rpad("p_brand", 12, "#").alias("rp"),
        F.ltrim(F.lit("xxabc"), F.lit("x")).alias("lt"),
        F.rtrim(F.lit("abcyy"), F.lit("y")).alias("rt"),
        F.translate("p_name", "aeiou", "AEIOU").alias("tr"),
        F.levenshtein("p_name", F.lit("red widget")).alias("lev"),
        F.startswith("p_name", F.lit("red")).alias("sw"),
        F.endswith("p_name", F.lit("bolt")).alias("ew"),
        F.contains("p_name", F.lit("wid")).alias("ct"),
        F.initcap("p_name").alias("ini"),
        F.split("p_name", " ").getItem(0).alias("first_word"),
        F.concat(F.lit("  "), F.col("p_brand")).alias("spaced"),
        F.substring("p_type", 1, 3).alias("l3"),
        F.col("p_type").substr(F.length("p_type") - 2, F.lit(3)).alias("r3"),
    ).orderBy("p_partkey")


@query(
    "fn_regexp_like",
    oracle="""
    SELECT p_partkey,
           p_name LIKE '%wid%' AS like_wid,
           p_name LIKE 'b%' AS like_b,
           regexp_matches(p_name, '^[a-z]+ (ring|bolt)$') AS re_match,
           regexp_extract(p_name, '([a-z]+)$', 1) AS last_word,
           regexp_replace(p_name, '[aeiou]', '.', 'g') AS re_repl
    FROM part
    ORDER BY p_partkey
    """,
    tags=("function", "regexp", "like"),
)
def fn_regexp_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE (native kernel `spark_strings.rs`) + regexp match/extract/replace
    (DataFusion RegexpMatch/Replace in the reference)."""
    t = Tables(spark, sf_dir)
    return t.part.select(
        "p_partkey",
        F.col("p_name").like("%wid%").alias("like_wid"),
        F.col("p_name").like("b%").alias("like_b"),
        F.col("p_name").rlike("^[a-z]+ (ring|bolt)$").alias("re_match"),
        F.regexp_extract("p_name", "([a-z]+)$", 1).alias("last_word"),
        F.regexp_replace("p_name", "[aeiou]", ".").alias("re_repl"),
    ).orderBy("p_partkey")


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sqrt(l_quantity), 9) AS sq,
           abs(l_quantity - 25) AS ab,
           CAST(floor(l_extendedprice) AS BIGINT) AS fl,
           CAST(ceil(l_extendedprice) AS BIGINT) AS ce,
           round(l_extendedprice, 1) AS rnd,
           round_even(l_quantity / 2, 0) AS brnd,
           round(exp(l_discount), 9) AS ex,
           round(ln(l_quantity), 9) AS lg,
           round(log2(l_quantity), 9) AS lg2,
           round(log(l_quantity), 9) AS lg10,
           round(power(l_discount, 2), 9) AS pw,
           CAST(sign(l_quantity - 25) AS DOUBLE) AS sg,
           greatest(l_quantity, 25.0) AS gr,
           least(l_discount, 0.05) AS le,
           l_orderkey % 7 AS md,
           CAST(l_quantity AS BIGINT) // 7 AS intdiv
    FROM lineitem
    WHERE l_partkey < 200
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("function", "math"),
)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt/abs/floor/ceil/round/bround/exp/ln/log2/log10/pow/signum/
    greatest/least/mod/intdiv (`NativeConverters.scala:830-912`).
    Transcendentals are rounded to 9 digits — both engines call the same libm
    functions on doubles, identical inputs give identical doubles, rounding
    guards the hash against any platform variance."""
    t = Tables(spark, sf_dir)
    q = F.col("l_quantity")
    return (
        t.lineitem.filter(F.col("l_partkey") < 200)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(F.sqrt(q), 9).alias("sq"),
            F.abs(q - 25).alias("ab"),
            F.floor("l_extendedprice").alias("fl"),
            F.ceil("l_extendedprice").alias("ce"),
            F.round(F.col("l_extendedprice"), 1).alias("rnd"),
            F.bround(q / 2, 0).alias("brnd"),
            F.round(F.exp("l_discount"), 9).alias("ex"),
            F.round(F.log(q), 9).alias("lg"),
            F.round(F.log2(q), 9).alias("lg2"),
            F.round(F.log10(q), 9).alias("lg10"),
            F.round(F.pow("l_discount", F.lit(2)), 9).alias("pw"),
            F.signum(q - 25).alias("sg"),
            F.greatest(q, F.lit(25.0)).alias("gr"),
            F.least(F.col("l_discount"), F.lit(0.05)).alias("le"),
            (F.col("l_orderkey") % 7).alias("md"),
            (q.cast("bigint") / 7).cast("bigint").alias("intdiv"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "fn_datetime",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dy,
           dayofweek(o_orderdate) + 1 AS dow,
           weekofyear(o_orderdate) AS woy,
           quarter(o_orderdate) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS mon_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS mon_end,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS plus30,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
           strftime(o_orderdate, '%Y-%m-%d') AS iso
    FROM orders
    WHERE o_orderkey < 2000
    ORDER BY o_orderkey
    """,
    tags=("function", "datetime"),
)
def fn_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """year/month/day/dayofweek/weekofyear/quarter/date_trunc/last_day/
    date_add/datediff/date_format (`spark_dates.rs`,
    `NativeConverters.scala:925-1009`).  Spark dayofweek is 1-based Sunday;
    DuckDB 0-based — oracle shifts by one."""
    t = Tables(spark, sf_dir)
    d = F.col("o_orderdate")
    return (
        t.orders.filter(F.col("o_orderkey") < 2000)
        .select(
            "o_orderkey",
            F.year(d).alias("yr"),
            F.month(d).alias("mo"),
            F.dayofmonth(d).alias("dy"),
            F.dayofweek(d).alias("dow"),
            F.weekofyear(d).alias("woy"),
            F.quarter(d).alias("qtr"),
            F.date_trunc("month", d).cast("date").alias("mon_start"),
            F.last_day(d.cast("date")).alias("mon_end"),
            F.date_add(d.cast("date"), 30).alias("plus30"),
            F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).alias("days_since"),
            F.date_format(d, "yyyy-MM-dd").alias("iso"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "fn_hash_crypto",
    oracle="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           md5(source || ':' || lang) AS h_key
    FROM documents
    ORDER BY doc_id
    """,
    tags=("function", "hash"),
)
def fn_hash_crypto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5/sha2 (`spark_crypto.rs`).  Spark's murmur3 `hash()` and `xxhash64`
    have no DuckDB twin — covered by property tests instead
    (tests/test_functions.py)."""
    t = Tables(spark, sf_dir)
    return t.documents.select(
        "doc_id",
        F.md5("text").alias("h_md5"),
        F.sha2("text", 256).alias("h_sha256"),
        F.md5(F.concat_ws(":", "source", "lang")).alias("h_key"),
    ).orderBy("doc_id")


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int,
           json_extract_string(props, '$.missing') AS k_missing,
           json_valid(props) AS is_json
    FROM events
    WHERE user_id <= 10
    ORDER BY event_id
    """,
    tags=("function", "json"),
)
def fn_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction + typed cast + missing-path null semantics
    (`spark_get_json_object.rs`).  The three key extractions go through ONE
    from_json parse (the reference's parse-once rewrite,
    `NativeConverters.scala:1213-1232`, applied at the source instead of N
    re-parses); the single raw get_json_object keeps the whole-document
    `'$'` kernel surface covered — from_json cannot express it (PERMISSIVE
    mode yields an all-null struct for invalid JSON, not NULL)."""
    from auron_spark.plans.json_once import json_extract_paths

    t = Tables(spark, sf_dir)
    base = t.events.filter(F.col("user_id") <= 10).select("event_id", "props")
    out = json_extract_paths(
        base,
        "props",
        {"k_str": "k string", "k_int": "k bigint", "k_missing": "missing string"},
    )
    return (
        out.select(
            "event_id",
            "k_str",
            "k_int",
            "k_missing",
            F.get_json_object("props", "$").isNotNull().alias("is_json"),
        )
        .orderBy("event_id")
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'debt'
                WHEN c_acctbal < 5000 THEN 'low'
                ELSE 'high' END AS bal_band,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg,
           CASE WHEN c_acctbal >= 0 THEN c_acctbal ELSE 0.0 END AS pos_bal,
           c_nationkey IN (1, 3, 5) AS in_set,
           c_acctbal IS NULL AS bal_null,
           (c_acctbal > 0) AND (c_nationkey < 10) AS both_ok,
           (c_acctbal > 9990) OR (c_nationkey = 0) OR (c_custkey = 1) AS any_ok
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("function", "conditional"),
)
def fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """case/when, coalesce, nullif, IN-list, is-null, short-circuit AND/OR
    (`NativeConverters.scala:1084-1118`, short-circuit `auron.proto:92-93`)."""
    t = Tables(spark, sf_dir)
    bal = F.col("c_acctbal")
    return t.customer.select(
        "c_custkey",
        F.when(bal < 0, "debt").when(bal < 5000, "low").otherwise("high").alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg"
        ),
        F.when(bal >= 0, bal).otherwise(F.lit(0.0)).alias("pos_bal"),
        F.col("c_nationkey").isin(1, 3, 5).alias("in_set"),
        bal.isNull().alias("bal_null"),
        ((bal > 0) & (F.col("c_nationkey") < 10)).alias("both_ok"),
        ((bal > 9990) | (F.col("c_nationkey") == 0) | (F.col("c_custkey") == 1)).alias(
            "any_ok"
        ),
    ).orderBy("c_custkey")


@query(
    "fn_cast",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_quantity AS INTEGER) AS q_int,
           CAST(CAST(l_quantity AS DECIMAL(18,0)) AS VARCHAR) AS q_str,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE) AS p_dec,
           CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS p_str,
           CAST(l_linenumber AS DOUBLE) AS ln_dbl,
           CAST(l_shipdate AS DATE) AS ship_date,
           CAST(l_returnflag = 'R' AS INTEGER) AS flag_int,
           TRY_CAST(l_returnflag AS INTEGER) AS bad_int
    FROM lineitem
    WHERE l_orderkey < 500
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("function", "cast"),
)
def fn_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cast / try_cast across numeric, string, decimal, date and boolean —
    the reference's Spark-specific cast kernels (`datafusion-ext-exprs/src/
    cast.rs`).  try_cast of a non-numeric string yields NULL in both engines.

    Note `q_str`: doubles format as '1.0' in Spark vs '1.0' in DuckDB only for
    integral doubles cast via DECIMAL first — we cast the exact decimal."""
    t = Tables(spark, sf_dir)
    return (
        t.lineitem.filter(F.col("l_orderkey") < 500)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("int").alias("q_int"),
            F.col("l_quantity").cast("decimal(18,0)").cast("string").alias("q_str"),
            # p_dec compared as DOUBLE on both sides — DuckDB's result frame
            # decays DECIMAL to DOUBLE, so a typed compare needs the explicit
            # cast; the decimal cast itself stays under test via p_str.
            F.col("l_extendedprice").cast("decimal(18,2)").cast("double").alias("p_dec"),
            F.col("l_extendedprice").cast("decimal(18,2)").cast("string").alias("p_str"),
            F.col("l_linenumber").cast("double").alias("ln_dbl"),
            F.col("l_shipdate").cast("date").alias("ship_date"),
            (F.col("l_returnflag") == "R").cast("int").alias("flag_int"),
            F.col("l_returnflag").try_cast("int").alias("bad_int"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "fn_array_ops",
    oracle="""
    SELECT p_partkey,
           len(w) AS n_words,
           array_to_string(list_sort(w), ',') AS sorted_words,
           array_to_string(list_reverse(w), ',') AS rev_words,
           w[1] AS first_el,
           list_contains(w, 'widget') AS has_widget,
           array_to_string(list_sort(list_distinct(list_concat(w, w))), ',') AS dedup2,
           array_to_string(['x', 'y'], ',') AS lit_arr
    FROM (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part)
    ORDER BY p_partkey
    """,
    tags=("function", "array"),
)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """array size/sort/reverse/element-access/contains/distinct/concat/literal
    (`NativeConverters.scala:948,968-976,1144-1199`; get_indexed_field).
    Arrays are serialized to CSV strings for a type-stable cross-engine hash.

    Note: DuckDB list_distinct does not preserve order, so dedup2 sorts after
    distinct on both sides... (kept sorted via list_sort of distinct)."""
    t = Tables(spark, sf_dir)
    w = F.split("p_name", " ")
    return t.part.select(
        "p_partkey",
        F.size(w).alias("n_words"),
        F.array_join(F.sort_array(w), ",").alias("sorted_words"),
        F.array_join(F.reverse(w), ",").alias("rev_words"),
        w.getItem(0).alias("first_el"),
        F.array_contains(w, "widget").alias("has_widget"),
        F.array_join(F.sort_array(F.array_distinct(F.concat(w, w))), ",").alias("dedup2"),
        F.array_join(F.array(F.lit("x"), F.lit("y")), ",").alias("lit_arr"),
    ).orderBy("p_partkey")


@query(
    "fn_struct_map",
    oracle="""
    SELECT s_suppkey,
           struct_pack(name := s_name, bal := s_acctbal).name AS st_name,
           struct_pack(name := s_name, bal := s_acctbal).bal AS st_bal,
           map(['nation', 'supp'], [s_nationkey, CAST(s_suppkey AS INTEGER)])['nation'][1]
             AS m_nation
    FROM supplier
    ORDER BY s_suppkey
    """,
    tags=("function", "struct", "map"),
)
def fn_struct_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """named_struct + field access (`named_struct.rs`, `get_indexed_field.rs`)
    and map literal + key access (`get_map_value.rs`).  Scalar projections of
    the nested values keep the output hashable in both engines."""
    t = Tables(spark, sf_dir)
    st = F.named_struct(F.lit("name"), F.col("s_name"), F.lit("bal"), F.col("s_acctbal"))
    mp = F.create_map(
        F.lit("nation"),
        F.col("s_nationkey"),
        F.lit("supp"),
        F.col("s_suppkey").cast("int"),
    )
    return t.supplier.select(
        "s_suppkey",
        st.getField("name").alias("st_name"),
        st.getField("bal").alias("st_bal"),
        mp.getItem("nation").alias("m_nation"),
    ).orderBy("s_suppkey")
