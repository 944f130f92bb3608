"""Sequence-pattern matching and recursive SQL — the row-pattern surface.

Two capabilities SQL:2016 standardized that most engines (including the
reference — its operator inventory stops at joins/aggs/windows, see
``spark-extension/.../NativeWindowBase.scala`` for the window ceiling) do not
execute natively at scale:

- ``events_pattern_regex``: MATCH_RECOGNIZE-style row-pattern detection,
  re-expressed as per-entity symbol sequences + regex — each user's ordered
  event stream collapses to a compact symbol string, and the pattern
  (``v[ce]*p``: view, any clicks/errors, purchase) is evaluated by the
  engine's regex machinery map-side at sequence grain.  This is how
  production Spark pipelines implement funnels-with-gaps, fraud motifs and
  session grammars without a per-row NFA operator.
- ``sql_recursive_date_spine``: a genuine recursive CTE (Spark 4.1's
  ``WITH RECURSIVE``, SPARK-24497) generating the month spine between the
  fact's min and max dates, left-joined to monthly aggregates so silent
  calendar gaps surface as explicit zero rows — the canonical
  reporting-spine pattern that previously needed driver-side date loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.registry import query
from auron_spark.tables import Tables, register_views

# Row-pattern over event-type symbols (first letter: c=click, e=error,
# p=purchase, s=signup, v=view).  Constants shared verbatim with the oracle.
_CONV_PAT = "v[ce]*p"  # view, then any clicks/errors, then purchase
_ERR_PAT = "ee+"  # a burst of >= 2 consecutive errors


@query(
    "events_pattern_regex",
    oracle=f"""
    WITH seqs AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
                   AS seq
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS INT) AS seq_len,
           CAST(len(regexp_extract_all(seq, '{_CONV_PAT}')) AS INT)
               AS n_conversions,
           CAST(CASE WHEN len(regexp_extract_all(seq, '{_CONV_PAT}')) > 0
                THEN length(regexp_replace(seq, '{_CONV_PAT}.*', '', 'g')) + 1
                ELSE 0 END AS INT) AS first_conv_pos,
           CAST(len(regexp_extract_all(seq, '{_ERR_PAT}')) AS INT)
               AS n_error_runs
    FROM seqs
    ORDER BY user_id
    """,
    tags=("events", "pattern", "match-recognize", "sequence"),
)
def events_pattern_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATCH_RECOGNIZE-style row-pattern detection per user: the ordered
    event stream becomes a symbol string (one char per event, (ts,
    event_id)-ordered via the `events_top_paths`-proven sorted-struct
    collect), then the conversion pattern ``v[ce]*p`` and the error-burst
    pattern ``ee+`` are counted with non-overlapping leftmost regex
    matches.  `first_conv_pos` (1-based symbol index of the first
    conversion start) uses the prefix-erase trick —
    ``length(regexp_replace(seq, PAT.*, ''))`` — which both engines
    evaluate identically because the leftmost match extent of a
    greedy-but-disjoint alphabet pattern is unambiguous.

    Scale shape: sequences aggregate at user grain (one shuffle, state
    bounded by per-user event count — the same bound any sessionizer
    carries; mega-users would be split by session first, see
    `sessionize_gap`); every pattern evaluation is a map-side regex on
    the collapsed string, ~100 bytes/user, NOT a per-event operator.
    At 100 TB the symbol table is |users| rows — three orders of
    magnitude smaller than the event fact it summarizes."""
    ev = Tables(spark, sf_dir).events
    seqs = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "ts",
                            "event_id",
                            F.substring("event_type", 1, 1).alias("s"),
                        )
                    )
                ),
                lambda x: x["s"],
            ),
            "",
        ).alias("seq")
    )
    n_conv = F.regexp_count("seq", F.lit(_CONV_PAT))
    return (
        seqs.select(
            "user_id",
            F.length("seq").alias("seq_len"),
            n_conv.alias("n_conversions"),
            F.when(
                n_conv > 0,
                F.length(F.regexp_replace("seq", _CONV_PAT + ".*", "")) + 1,
            )
            .otherwise(0)
            .cast("int")
            .alias("first_conv_pos"),
            F.regexp_count("seq", F.lit(_ERR_PAT)).alias("n_error_runs"),
        )
        .orderBy("user_id")
    )


# Recursion bound: 100 anchor+steps covers any fixture span up to 100 months
# (current fixtures span 80); Spark's default cteRecursionLevelLimit is 100.
_SPINE_STEPS = 99


@query(
    "sql_recursive_date_spine",
    oracle=f"""
    WITH RECURSIVE nums(k) AS (
        SELECT 0 UNION ALL SELECT k + 1 FROM nums WHERE k < {_SPINE_STEPS}
    ),
    b AS (
        SELECT (EXTRACT(year FROM MIN(o_orderdate)) * 12
                + EXTRACT(month FROM MIN(o_orderdate)) - 1) AS lo,
               (EXTRACT(year FROM MAX(o_orderdate)) * 12
                + EXTRACT(month FROM MAX(o_orderdate)) - 1) AS hi
        FROM orders
    ),
    spine AS (SELECT lo + k AS mi FROM nums CROSS JOIN b WHERE lo + k <= hi),
    monthly AS (
        SELECT EXTRACT(year FROM o_orderdate) * 12
               + EXTRACT(month FROM o_orderdate) - 1 AS mi,
               COUNT(*) AS n_orders,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
        FROM orders GROUP BY 1
    )
    SELECT CAST(s.mi // 12 AS VARCHAR) || '-'
               || lpad(CAST(s.mi % 12 + 1 AS VARCHAR), 2, '0') AS om,
           CAST(COALESCE(m.n_orders, 0) AS BIGINT) AS n_orders,
           CAST(COALESCE(m.rev, 0) AS DOUBLE) AS revenue,
           CAST(CASE WHEN m.mi IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
    FROM spine s LEFT JOIN monthly m ON s.mi = m.mi
    ORDER BY om
    """,
    tags=("sql", "recursive-cte", "date-spine", "calendar"),
)
def sql_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE month spine (Spark 4.1 ``WITH RECURSIVE``): generate
    every month index between the fact's min and max order date by
    recursion, LEFT JOIN the monthly revenue rollup, and flag calendar
    gaps as explicit `is_gap` zero rows — the reporting date-spine every
    dashboard needs so a month with no orders reads as 0, not as a
    silently missing row.  Month arithmetic stays in integer month-index
    space (`year*12 + month - 1`, formatted with integer DIV/lpad) so no
    date/interval type semantics cross engines.

    Scale shape: the recursion materializes <= 100 single-row steps
    driver-side (constant work, like any dimension build); the fact
    contributes one partial/final month-grain aggregate; the spine join
    broadcasts ~100 rows.  Recursion depth is bounded and documented
    against `spark.sql.cteRecursionLevelLimit` (default 100)."""
    register_views(spark, sf_dir)
    return spark.sql(
        f"""
        WITH RECURSIVE nums(k) AS (
            SELECT 0 UNION ALL SELECT k + 1 FROM nums WHERE k < {_SPINE_STEPS}
        ),
        b AS (
            SELECT (year(MIN(o_orderdate)) * 12
                    + month(MIN(o_orderdate)) - 1) AS lo,
                   (year(MAX(o_orderdate)) * 12
                    + month(MAX(o_orderdate)) - 1) AS hi
            FROM orders
        ),
        spine AS (
            SELECT lo + k AS mi FROM nums CROSS JOIN b WHERE lo + k <= hi
        ),
        monthly AS (
            SELECT year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mi,
                   COUNT(*) AS n_orders,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
            FROM orders GROUP BY 1
        )
        SELECT CAST(s.mi DIV 12 AS STRING) || '-'
                   || lpad(CAST(s.mi % 12 + 1 AS STRING), 2, '0') AS om,
               CAST(COALESCE(m.n_orders, 0) AS BIGINT) AS n_orders,
               CAST(COALESCE(m.rev, 0) AS DOUBLE) AS revenue,
               CAST(CASE WHEN m.mi IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
        FROM spine s LEFT JOIN monthly m ON s.mi = m.mi
        ORDER BY om
        """
    )


@query(
    "sql_group_order_by_all",
    oracle="""
    SELECT yr, priority, n_orders, revenue,
           revenue / n_orders AS raw_avg,
           ROUND(raw_avg, 6) AS avg_revenue
    FROM (
        SELECT EXTRACT(year FROM o_orderdate) AS yr,
               o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM orders
        GROUP BY ALL
    )
    ORDER BY ALL
    """,
    tags=("sql", "surface", "group-by-all", "lateral-alias"),
)
def sql_group_order_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modern SQL sugar surface — GROUP BY ALL (group by every
    non-aggregate select item), ORDER BY ALL (deterministic total order
    over the full select list), and a LATERAL COLUMN ALIAS chain
    (`avg_revenue` references `raw_avg`, itself defined from `revenue` /
    `n_orders` in the SAME select, SPARK-27561) — in one statement, run
    through `spark.sql` over the registered views.  DuckDB implements
    all three with identical semantics, so the oracle is the SAME
    statement text: the surface itself is what's under test.  (The
    lateral alias lives in the outer block: Spark 4.1 still rejects
    lateral references combined with GROUP BY ALL in one block —
    UNSUPPORTED_FEATURE.LATERAL_COLUMN_ALIAS_IN_GROUP_BY — the split is
    the documented workaround.)

    Beyond the reference: its SQL surface is whatever vanilla Spark
    parses (the extension replaces physical operators, not the parser);
    this pins the Spark-4 sugar working end-to-end over our tables.

    Scale shape / exactness: one scan, one hash aggregate at
    (year, priority) grain (~35 cells); DECIMAL revenue, 6-dp division
    of exact inputs."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT yr, priority, n_orders, revenue,
               revenue / n_orders AS raw_avg,
               ROUND(raw_avg, 6) AS avg_revenue
        FROM (
            SELECT year(o_orderdate) AS yr,
                   o_orderpriority AS priority,
                   CAST(COUNT(*) AS BIGINT) AS n_orders,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS revenue
            FROM orders
            GROUP BY ALL
        )
        ORDER BY ALL
        """
    )


@query(
    "sql_parameterized_identifier",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM orders
    WHERE o_orderdate >= DATE '1997-01-01'
      AND o_totalprice > 1000.0
    GROUP BY o_orderpriority
    ORDER BY priority
    """,
    tags=("sql", "surface", "parameterized", "identifier", "session-variable"),
)
def sql_parameterized_identifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 programmatic-SQL surface in one statement: NAMED PARAMETER
    MARKERS (`:cutoff`, `:minprice` bound via `spark.sql(..., args=)` —
    injection-safe literals, SPARK-44140), the IDENTIFIER() clause
    (table name as a bound parameter instead of string interpolation,
    SPARK-43205), and a SESSION VARIABLE (`DECLARE` / `SET VAR`,
    SPARK-42849) consumed in the same query.  The oracle is the
    fully-bound equivalent — the binding machinery itself is what's
    under test, so a wrong binding shows as a hash mismatch.

    Beyond the reference: its SQL surface is vanilla Spark's parser;
    this pins the Spark-4 programmatic-parameter features working over
    our tables.  Scale/exactness: one scan, priority-grain aggregate,
    exact DECIMAL revenue."""
    register_views(spark, sf_dir)
    spark.sql("DECLARE OR REPLACE VARIABLE min_price DOUBLE")
    spark.sql("SET VAR min_price = 1000.0")
    return spark.sql(
        """
        SELECT o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM IDENTIFIER(:tbl)
        WHERE o_orderdate >= :cutoff
          AND o_totalprice > min_price
        GROUP BY o_orderpriority
        ORDER BY priority
        """,
        args={"tbl": "orders", "cutoff": "1997-01-01"},
    )


@query(
    "sql_scalar_udf",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(round(
                    CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1.0 - CAST(l_discount AS DECIMAL(4,2)))
                    * (1.0 + CAST(l_tax AS DECIMAL(4,2))), 2)
                AS DECIMAL(18,2))) AS DOUBLE) AS charged
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
    tags=("sql", "surface", "sql-udf"),
)
def sql_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language scalar UDF (SPARK-46246, Spark 4's CREATE FUNCTION
    ... RETURNS ... RETURN <expr>): the charged-amount business rule is
    DECLARED once as a catalog function and reused by name — unlike a
    Python UDF this stays entirely inside Catalyst (the body is inlined
    into the plan, codegen and pushdown apply), which is the right way
    to package scalar business logic at 100 TB.  The oracle is the
    inlined expression — what's under test is that the engine's SQL-UDF
    registration/inlining machinery produces exactly the declared
    semantics.

    Exactness: the body rounds to DECIMAL(18,2) per row, so the sum is
    order-free; one scan, flag-grain aggregate."""
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION charged_amount(
            price DOUBLE, disc DOUBLE, tax DOUBLE
        ) RETURNS DECIMAL(18,2)
        RETURN CAST(round(
            CAST(price AS DECIMAL(18,2))
            * (1.0 - CAST(disc AS DECIMAL(4,2)))
            * (1.0 + CAST(tax AS DECIMAL(4,2))), 2) AS DECIMAL(18,2))
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(charged_amount(l_extendedprice, l_discount, l_tax))
                    AS DOUBLE) AS charged
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


@query(
    "sql_table_udf",
    oracle="""
    WITH top_cust AS (
        SELECT c_custkey, c_name, c_acctbal
        FROM customer WHERE c_nationkey = 5
        ORDER BY c_acctbal DESC, c_custkey LIMIT 5
    ),
    top_cust2 AS (
        SELECT c_custkey, c_name, c_acctbal
        FROM customer WHERE c_nationkey = 9
        ORDER BY c_acctbal DESC, c_custkey LIMIT 5
    )
    SELECT CAST(5 AS INT) AS nation_key, c_custkey, c_name,
           ROUND(c_acctbal, 2) AS acctbal
    FROM top_cust
    UNION ALL
    SELECT CAST(9 AS INT), c_custkey, c_name, ROUND(c_acctbal, 2)
    FROM top_cust2
    ORDER BY nation_key, acctbal DESC, c_custkey
    """,
    tags=("sql", "surface", "sql-udf", "table-function"),
)
def sql_table_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-language TABLE function (Spark 4's CREATE FUNCTION ...
    RETURNS TABLE ... RETURN <query>) — the table-valued sibling of
    `sql_scalar_udf`: a parameterized top-k-customers-per-nation report
    is DECLARED once as a catalog function and invoked per argument in
    the FROM clause.  Like the scalar form it inlines into Catalyst (the
    executed plan is plain Filter -> TakeOrderedAndProject over the
    scan, with the predicate pushed — plan-gated: no Python eval node,
    pushdown intact), which is the right packaging for parameterized
    relational snippets at 100 TB; the reference has no equivalent
    surface (its UDF story is JNI-wrapped scalar expressions).

    Exactness: deterministic top-k (balance DESC, key tiebreak), 2-dp
    rounding; the oracle is the inlined query text per argument."""
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION nation_top_customers(nkey INT)
        RETURNS TABLE (c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE)
        RETURN SELECT c_custkey, c_name, c_acctbal
               FROM {tbl} WHERE c_nationkey = nkey
               ORDER BY c_acctbal DESC, c_custkey LIMIT 5
        """.replace("{tbl}", "customer")
    )
    return spark.sql(
        """
        SELECT CAST(5 AS INT) AS nation_key, c_custkey, c_name,
               ROUND(c_acctbal, 2) AS acctbal
        FROM nation_top_customers(5)
        UNION ALL
        SELECT CAST(9 AS INT), c_custkey, c_name, ROUND(c_acctbal, 2)
        FROM nation_top_customers(9)
        ORDER BY nation_key, acctbal DESC, c_custkey
        """
    )
