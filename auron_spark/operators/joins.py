"""Join operator family — all 7 join types × strategy selection.

Reference: SortMergeJoin (`sort_merge_join_exec.rs:57`), ShuffledHashJoin
(`planner.rs:211`), BroadcastHashJoin incl. null-aware anti join
(`broadcast_join_exec.rs:82`), BroadcastNestedLoopJoin (broadcast join with
empty keys, `AuronConverters.scala:773-811`); join types INNER/LEFT/RIGHT/
FULL/SEMI/ANTI/EXISTENCE (`auron.proto:515-523`).  Non-equi conditions are
residual filters on INNER joins (`AuronConverters.scala:699-709`).

In Spark the join *type* is the `how=` argument and the *strategy* is chosen by
Catalyst (broadcast below threshold, else shuffled hash / sort-merge), steered
where needed with hints — exactly the surface the reference accelerates.

Scale: dimension sides (region/nation/customer/supplier at TPC-H ratios) are
broadcast; fact⋈fact joins shuffle on the key with AQE skew splitting.  The
non-equi and cross joins are deliberately bounded (dimension×dimension).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.registry import query
from auron_spark.tables import Tables


@query(
    "join_inner_smj",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_name
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_totalprice > 400000
    ORDER BY o_orderkey
    """,
    tags=("join", "inner"),
)
def join_inner_smj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join forced to sort-merge via hint (reference SMJ,
    `sort_merge_join_exec.rs:57`)."""
    t = Tables(spark, sf_dir)
    return (
        t.orders.hint("merge")
        .join(t.customer, F.col("o_custkey") == F.col("c_custkey"))
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey", "o_totalprice", "c_name")
        .orderBy("o_orderkey")
    )


@query(
    "join_inner_shuffle_hash",
    oracle="""
    SELECT l_orderkey, l_linenumber, s_name
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
    WHERE s_acctbal < -900 AND l_quantity >= 49
    ORDER BY l_orderkey, l_linenumber
    """,
    tags=("join", "inner", "shuffle-hash"),
)
def join_inner_shuffle_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffled hash join via hint — the reference's forceShuffledHashJoin
    path (`AuronConverters.scala:638-697`)."""
    t = Tables(spark, sf_dir)
    supp = t.supplier.filter(F.col("s_acctbal") < -900).hint("shuffle_hash")
    return (
        t.lineitem.filter(F.col("l_quantity") >= 49)
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_orderkey", "l_linenumber", "s_name")
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT n_name, COUNT(*) AS n_cust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
    tags=("join", "broadcast"),
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast hash join (`broadcast_join_exec.rs:82`) — explicit
    `F.broadcast` on the dimension side."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(F.broadcast(t.nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_cust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("sum_bal"),
        )
        .orderBy("n_name")
    )


@query(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 450000
    WHERE c_custkey < 200
    ORDER BY c_custkey, o_orderkey NULLS FIRST
    """,
    tags=("join", "left"),
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER with an extra join-side predicate (kept in the ON clause —
    different semantics from a WHERE filter, a classic correctness trap)."""
    t = Tables(spark, sf_dir)
    orders = t.orders
    cust = t.customer.filter(F.col("c_custkey") < 200)
    return (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_totalprice > 450000),
            "left",
        )
        .select("c_custkey", "c_name", "o_orderkey")
        .orderBy("c_custkey", F.col("o_orderkey").asc_nulls_first())
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT s_suppkey, s_name, n_name
    FROM nation RIGHT JOIN supplier ON n_nationkey = s_nationkey AND n_regionkey = 2
    ORDER BY s_suppkey
    """,
    tags=("join", "right"),
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = Tables(spark, sf_dir)
    return (
        t.nation.join(
            t.supplier,
            (F.col("n_nationkey") == F.col("s_nationkey")) & (F.col("n_regionkey") == 2),
            "right",
        )
        .select("s_suppkey", "s_name", "n_name")
        .orderBy("s_suppkey")
    )


@query(
    "join_full_outer",
    oracle="""
    WITH hi_cust AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000),
         big_ord AS (SELECT o_custkey, COUNT(*) AS n_ord
                     FROM orders WHERE o_totalprice > 300000 GROUP BY o_custkey)
    SELECT COALESCE(c_custkey, o_custkey) AS custkey,
           CAST(c_acctbal AS DOUBLE) AS acctbal,
           n_ord
    FROM hi_cust FULL OUTER JOIN big_ord ON c_custkey = o_custkey
    ORDER BY custkey
    """,
    tags=("join", "full"),
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (`joins/smj/full_join.rs:34`) with unmatched rows on
    both sides."""
    t = Tables(spark, sf_dir)
    hi_cust = t.customer.filter(F.col("c_acctbal") > 9000).select("c_custkey", "c_acctbal")
    big_ord = (
        t.orders.filter(F.col("o_totalprice") > 300000)
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_ord"))
    )
    return (
        hi_cust.join(big_ord, hi_cust.c_custkey == big_ord.o_custkey, "full")
        .select(
            F.coalesce("c_custkey", "o_custkey").alias("custkey"),
            F.col("c_acctbal").cast("double").alias("acctbal"),
            "n_ord",
        )
        .orderBy("custkey")
    )


@query(
    "join_left_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
    ORDER BY c_custkey
    """,
    tags=("join", "semi"),
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (`joins/smj/semi_join.rs`) — customers with at least one big
    order."""
    t = Tables(spark, sf_dir)
    big = t.orders.filter(F.col("o_totalprice") > 400000)
    return (
        t.customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_left_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
    tags=("join", "anti"),
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI — customers with no orders at all."""
    t = Tables(spark, sf_dir)
    return (
        t.customer.join(t.orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_null_aware_anti",
    oracle="""
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_nationkey NOT IN
          (SELECT CASE WHEN n_regionkey = 99 THEN NULL ELSE n_nationkey END
           FROM nation WHERE n_regionkey <= 1)
    ORDER BY s_suppkey
    """,
    tags=("join", "anti", "null-aware"),
)
def join_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-aware anti join (NOT IN with nullable build side) — the
    reference's NAAJ special case (`broadcast_join_exec.rs`, SURVEY.md §2.3).
    Expressed in SQL so Catalyst plans the null-aware variant.  The build
    expression is nullable-typed but never null at runtime: a runtime NULL
    would (correctly) empty the result — NOT IN three-valued logic — which the
    empty-build case below would not distinguish from a planning bug."""
    t = Tables(spark, sf_dir)
    t.supplier.createOrReplaceTempView("naaj_supplier")
    t.nation.createOrReplaceTempView("naaj_nation")
    return spark.sql(
        """
        SELECT s_suppkey, s_name
        FROM naaj_supplier
        WHERE s_nationkey NOT IN
              (SELECT CASE WHEN n_regionkey = 99 THEN NULL ELSE n_nationkey END
               FROM naaj_nation WHERE n_regionkey <= 1)
        ORDER BY s_suppkey
        """
    )


@query(
    "join_existence",
    oracle="""
    SELECT c_custkey,
           (c_acctbal < 0 OR c_custkey IN
             (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)) AS flagged
    FROM customer
    ORDER BY c_custkey
    """,
    tags=("join", "existence"),
)
def join_existence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTENCE join (`joins/smj/existence_join.rs`) — an IN-subquery under a
    disjunction forces Catalyst to plan ExistenceJoin rather than semi."""
    t = Tables(spark, sf_dir)
    t.customer.createOrReplaceTempView("ex_customer")
    t.orders.createOrReplaceTempView("ex_orders")
    return spark.sql(
        """
        SELECT c_custkey,
               (c_acctbal < 0 OR c_custkey IN
                 (SELECT o_custkey FROM ex_orders WHERE o_totalprice > 400000)) AS flagged
        FROM ex_customer
        ORDER BY c_custkey
        """
    )


@query(
    "join_cross",
    oracle="""
    SELECT r1.r_name AS from_region, r2.r_name AS to_region
    FROM region r1 CROSS JOIN region r2
    WHERE r1.r_regionkey <> r2.r_regionkey
    ORDER BY from_region, to_region
    """,
    tags=("join", "cross", "nested-loop"),
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join + residual inequality — the reference lowers this to a
    BroadcastNestedLoopJoin with empty keys (`AuronConverters.scala:773-811`)."""
    t = Tables(spark, sf_dir)
    r1 = t.region.select(F.col("r_name").alias("from_region"), F.col("r_regionkey").alias("k1"))
    r2 = t.region.select(F.col("r_name").alias("to_region"), F.col("r_regionkey").alias("k2"))
    return (
        r1.crossJoin(F.broadcast(r2))
        .filter(F.col("k1") != F.col("k2"))
        .select("from_region", "to_region")
        .orderBy("from_region", "to_region")
    )


@query(
    "join_nonequi_inner",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey
    FROM supplier s JOIN customer c
      ON s.s_nationkey = c.c_nationkey AND s.s_acctbal > c.c_acctbal + 9000
    ORDER BY s_suppkey, c_custkey
    """,
    tags=("join", "non-equi"),
)
def join_nonequi_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key join with a non-equi residual condition — the only theta shape
    the reference supports natively (INNER + residual filter,
    `AuronConverters.scala:699-709`)."""
    t = Tables(spark, sf_dir)
    s = t.supplier
    c = t.customer
    return (
        s.join(
            c,
            (s.s_nationkey == c.c_nationkey) & (s.s_acctbal > c.c_acctbal + 9000),
        )
        .select("s_suppkey", "c_custkey")
        .orderBy("s_suppkey", "c_custkey")
    )


@query(
    "join_range_bands",
    oracle="""
    SELECT band,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events e
    JOIN (VALUES (0.0, 10.0, 'low'), (10.0, 100.0, 'mid'),
                 (100.0, 1000000.0, 'high')) b(lo, hi, band)
      ON e.value >= b.lo AND e.value < b.hi
    GROUP BY band
    ORDER BY band
    """,
    tags=("join", "range", "non-equi", "broadcast"),
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-band join: facts matched to non-uniform value bands via a pure
    range predicate — a BroadcastNestedLoopJoin over a tiny banded dimension
    (the reference has no range join at all, SURVEY.md §2.3; its BNLJ is
    `AuronConverters.scala:773-811`).  Scale: the band table is broadcast, the
    fact side streams map-side — no shuffle until the final tiny group-by.
    For UNIFORM bands the engine move is `floor(value/width)` + equi-join;
    this query keeps the general non-uniform form."""
    t = Tables(spark, sf_dir)
    bands = spark.createDataFrame(
        [(0.0, 10.0, "low"), (10.0, 100.0, "mid"), (100.0, 1e6, "high")],
        "lo double, hi double, band string",
    )
    return (
        t.events.join(
            F.broadcast(bands),
            (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .orderBy("band")
    )


@query(
    "join_interval_overlap",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
        SELECT user_id,
               SUM(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_seq,
               epoch(ts) AS es
        FROM marked
    ),
    iv AS (
        SELECT user_id, session_seq, MIN(es) AS ss, MAX(es) AS se
        FROM sess GROUP BY user_id, session_seq
    )
    SELECT CAST(floor(greatest(a.ss, b.ss) / 3600) AS BIGINT) AS overlap_hour,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(floor(least(a.se, b.se) - greatest(a.ss, b.ss)))
                AS BIGINT) AS overlap_sec
    FROM iv a JOIN iv b
      ON a.user_id < b.user_id AND a.ss <= b.se AND b.ss <= a.se
    GROUP BY 1
    ORDER BY overlap_hour
    """,
    tags=("join", "interval", "range", "binned"),
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap self-join — find concurrent sessions across users
    (per hour: how many cross-user session pairs overlap in time, and
    their total overlap seconds).  Spark has no native interval join, and
    the naive formulation is a cartesian range predicate; this uses the
    standard BINNING decomposition (as in DataFusion's and Timescale's
    range joins): explode each interval into the hour bins it covers,
    equi-join on bin, apply the overlap predicate as a residual, and
    count each pair exactly once by attributing it to the bin containing
    the overlap START (bin == floor(greatest(ss, ss')/3600)).

    The DuckDB oracle runs the direct quadratic range join (its IEJoin
    handles it); Spark runs the linearized binned plan — same result,
    scale-viable shape.

    Scale shape: sessions shrink events by ~10x before any pairing; the
    bin explode fans out by interval-span-in-hours (sessions are
    gap-bounded, so spans are small); the pair join is an EQUI-join on
    bin (shuffled hash/SMJ — never a nested loop), with per-bin cost
    quadratic only in that bin's concurrency.  Hot hours are the skew
    knob: at higher event rates, shrink the bin width to re-linearize —
    the plan is unchanged.  Epoch doubles and floored sums keep both
    engines bit-identical."""
    from pyspark.sql import Window

    ev = Tables(spark, sf_dir).events
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    es = F.col("ts").cast("double")
    gap = es - F.lag(es).over(w)
    sess = (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            F.when(gap.isNull() | (gap > 1800), 1).otherwise(0).alias("ns"),
        )
        .select(
            "user_id",
            es.alias("es"),
            F.sum("ns")
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("session_seq"),
        )
        .groupBy("user_id", "session_seq")
        .agg(F.min("es").alias("ss"), F.max("es").alias("se"))
    )
    binned = sess.select(
        "user_id",
        "ss",
        "se",
        F.explode(
            F.sequence(
                F.floor(F.col("ss") / 3600), F.floor(F.col("se") / 3600)
            )
        ).alias("bin"),
    )
    a, b = binned.alias("a"), binned.alias("b")
    start = F.greatest(F.col("a.ss"), F.col("b.ss"))
    pairs = a.join(
        b,
        (F.col("a.bin") == F.col("b.bin"))
        & (F.col("a.user_id") < F.col("b.user_id"))
        & (F.col("a.ss") <= F.col("b.se"))
        & (F.col("b.ss") <= F.col("a.se"))
        & (F.col("a.bin") == F.floor(start / 3600)),
    )
    return (
        pairs.groupBy(
            F.floor(start / 3600).cast("bigint").alias("overlap_hour")
        )
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum(
                F.floor(
                    F.least(F.col("a.se"), F.col("b.se")) - start
                )
            ).cast("bigint").alias("overlap_sec"),
        )
        .orderBy("overlap_hour")
    )


@query(
    "join_lateral_topk",
    oracle="""
    SELECT n.n_name, c.c_custkey, c.c_acctbal
    FROM nation n,
    LATERAL (SELECT c_custkey,
                    ROUND(CAST(c_acctbal AS DOUBLE), 2) AS c_acctbal
             FROM customer
             WHERE c_nationkey = n.n_nationkey
             ORDER BY CAST(c_acctbal AS DOUBLE) DESC, c_custkey
             LIMIT 2) c
    ORDER BY n.n_name, c.c_custkey
    """,
    tags=("join", "lateral", "correlated", "topk"),
)
def join_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery join (SQL:1999 LATERAL, Spark 3.4+):
    for each nation, the top-2 customers by account balance — the
    per-outer-row subquery shape that rewrites a dependent loop into a
    relational plan.  Spark decorrelates the LATERAL LIMIT into a
    partitioned rank filter, so the plan is the same WindowGroupLimit
    top-k a hand-written window would give — the optimizer, not the
    user, removes the O(outer × inner) loop.

    Scale shape: decorrelation turns per-row probing into one keyed join
    + per-key group limit; no nested-loop over the outer side survives
    in the physical plan."""
    t = Tables(spark, sf_dir)
    t.nation.createOrReplaceTempView("nation")
    t.customer.createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT n.n_name, c.c_custkey, c.c_acctbal
        FROM nation n,
        LATERAL (SELECT c_custkey,
                        ROUND(CAST(c_acctbal AS DOUBLE), 2) AS c_acctbal
                 FROM customer
                 WHERE c_nationkey = n.n_nationkey
                 ORDER BY CAST(c_acctbal AS DOUBLE) DESC, c_custkey
                 LIMIT 2) c
        ORDER BY n.n_name, c.c_custkey
        """
    )
