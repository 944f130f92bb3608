"""Collaborative-filtering primitives: item-item co-occurrence similarity —
the classic "customers who bought X also bought Y" built purely from basket
structure (the within-group pair join `market_basket_pairs` introduced,
upgraded into a normalized similarity ranking with cosine and lift).

Scale shape: the pair fan-out is an EQUI self-join on the order key, so
it co-locates per order and is bounded by basket size squared (baskets are
small and bounded; never an item-item cartesian); item frequencies are a
catalog-grain aggregate that broadcasts.  This is the shape ALS/co-visit
pipelines use to build candidate generators at billions of interactions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.exprs import R9_DECIMAL
from auron_spark.registry import query
from auron_spark.tables import Tables

_MIN_CO = 2  # support floor: pairs must co-occur in >= 2 orders
_TOP_K = 20


@query(
    "rec_item_cooccurrence",
    oracle=f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (SELECT COUNT(DISTINCT l_orderkey) AS n FROM op),
    item AS (SELECT l_partkey, COUNT(*) AS n_item FROM op GROUP BY l_partkey),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS n_co
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY part_a, part_b
    )
    SELECT part_a, part_b,
           CAST(n_co AS BIGINT) AS n_co,
           CAST(ia.n_item AS BIGINT) AS n_a,
           CAST(ib.n_item AS BIGINT) AS n_b,
           ROUND(n_co / sqrt(ia.n_item * CAST(ib.n_item AS DOUBLE)), 6)
               AS cosine,
           ROUND(n_co * CAST(n.n AS DOUBLE)
                 / (ia.n_item * CAST(ib.n_item AS DOUBLE)), 6) AS lift
    FROM pairs
    JOIN item ia ON ia.l_partkey = part_a
    JOIN item ib ON ib.l_partkey = part_b
    CROSS JOIN n_orders n
    WHERE n_co >= {_MIN_CO}
    ORDER BY n_co DESC,
             n_co / sqrt(ia.n_item * CAST(ib.n_item AS DOUBLE)) DESC,
             part_a, part_b
    LIMIT {_TOP_K}
    """,
    tags=("pipeline", "recommend", "cooccurrence"),
)
def rec_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 item-item associations by basket co-occurrence, scored
    with cosine (co-count normalized by item popularity) and lift
    (observed / expected-under-independence) — the candidate-generation
    stage of an item-to-item recommender and the statistical upgrade of
    `market_basket_pairs` (raw pair counts conflate popularity with
    affinity; lift > 1 is actual association).

    Exactness: all counts are exact integers at (order, part) grain
    (dedup first — fixture orders repeat a part across lines); cosine and
    lift are identical double expressions, and the top-k ordering ends in
    the (part_a, part_b) total order.

    Scale shape: the pair join co-locates on l_orderkey (basket-bounded
    fan-out, the `market_basket_pairs` contract); item frequencies are
    catalog-grain and broadcast into the pair relation; the final ranking
    is TakeOrderedAndProject, never a global sort.  The distinct basket
    table is materialized once — four consumers otherwise re-run the
    distinct shuffle (the `market_basket_pairs` note)."""
    li = Tables(spark, sf_dir).lineitem
    op = (
        li.select("l_orderkey", "l_partkey")
        .dropDuplicates()
        .localCheckpoint(eager=False)
    )
    n_orders = op.agg(F.countDistinct("l_orderkey").alias("n"))
    item = op.groupBy("l_partkey").agg(F.count("*").alias("n_item"))
    b = op.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        op.join(
            b,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_partkey") < F.col("part_b")),
        )
        .groupBy(F.col("l_partkey").alias("part_a"), "part_b")
        .agg(F.count("*").alias("n_co"))
        .where(F.col("n_co") >= _MIN_CO)
    )
    ia = item.select(
        F.col("l_partkey").alias("ka"), F.col("n_item").alias("n_a")
    )
    ib = item.select(
        F.col("l_partkey").alias("kb"), F.col("n_item").alias("n_b")
    )
    scored = (
        pairs.join(F.broadcast(ia), F.col("part_a") == F.col("ka"))
        .join(F.broadcast(ib), F.col("part_b") == F.col("kb"))
        .join(F.broadcast(n_orders))
    )
    cosine = F.col("n_co") / F.sqrt(F.col("n_a") * F.col("n_b").cast("double"))
    lift = (
        F.col("n_co")
        * F.col("n").cast("double")
        / (F.col("n_a") * F.col("n_b").cast("double"))
    )
    return (
        scored.select(
            "part_a",
            "part_b",
            F.col("n_co").cast("bigint").alias("n_co"),
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(cosine, 6).alias("cosine"),
            F.round(lift, 6).alias("lift"),
            cosine.alias("_ord"),
        )
        .orderBy(F.desc("n_co"), F.desc("_ord"), "part_a", "part_b")
        .limit(_TOP_K)
        .drop("_ord")
    )


_SERVE_USERS = 3
_SERVE_K = 5


@query(
    "rec_user_item_serve",
    oracle=f"""
    WITH op AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    item AS (SELECT l_partkey, COUNT(*) AS n_item FROM op GROUP BY l_partkey),
    pairs AS (
        SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
               COUNT(*) AS n_co
        FROM op a JOIN op b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY part_a, part_b
        HAVING COUNT(*) >= {_MIN_CO}
    ),
    sims AS (
        SELECT part_a AS i, part_b AS j,
               n_co / sqrt(ia.n_item * CAST(ib.n_item AS DOUBLE)) AS cos
        FROM pairs
        JOIN item ia ON ia.l_partkey = part_a
        JOIN item ib ON ib.l_partkey = part_b
        UNION ALL
        SELECT part_b AS i, part_a AS j,
               n_co / sqrt(ia.n_item * CAST(ib.n_item AS DOUBLE)) AS cos
        FROM pairs
        JOIN item ia ON ia.l_partkey = part_a
        JOIN item ib ON ib.l_partkey = part_b
    ),
    hist AS (
        SELECT DISTINCT o_custkey AS u, l_partkey AS j
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    probes AS (
        SELECT u FROM hist GROUP BY u
        ORDER BY COUNT(*) DESC, u LIMIT {_SERVE_USERS}
    ),
    cand AS (
        SELECT h.u, s.i,
               COUNT(*) AS n_contributing,
               CAST(SUM(CAST(ROUND(s.cos, 9) AS DECIMAL(28,9))) AS DOUBLE)
                   AS score
        FROM hist h
        JOIN probes p ON p.u = h.u
        JOIN sims s ON s.j = h.j
        WHERE NOT EXISTS (
            SELECT 1 FROM hist h2 WHERE h2.u = h.u AND h2.j = s.i
        )
        GROUP BY h.u, s.i
    )
    SELECT u AS custkey, i AS partkey,
           CAST(n_contributing AS BIGINT) AS n_contributing,
           ROUND(score, 6) AS score
    FROM (
        SELECT *, row_number() OVER (PARTITION BY u
                       ORDER BY ROUND(score, 9) DESC, i) AS rk
        FROM cand
    ) WHERE rk <= {_SERVE_K}
    ORDER BY custkey, ROUND(score, 9) DESC, partkey
    """,
    tags=("pipeline", "recommend", "serve"),
)
def rec_user_item_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-to-item recommender SERVE path: for the 3 heaviest buyers,
    score every not-yet-bought part by the sum of its cooccurrence-cosine
    similarity to the parts in the user's history, and return each
    user's top-5 — the second stage that turns `rec_item_cooccurrence`'s
    model table into per-user recommendations (candidate generation by
    neighbor expansion -> anti-join own history -> rank).

    Scale shape: the sim table build is the basket-colocated pair join
    (model-table-sized output); serving joins the PROBE users' small
    histories against the sim table on the history item key, anti-joins
    the same history, aggregates at (user, candidate) grain and takes a
    per-user WindowGroupLimit top-5 — probe cost is history x neighbors,
    independent of corpus width.

    Exactness: similarity contributions are 9-dp-rounded into DECIMAL
    before the (order-insensitive) sum; ranking orders by the rounded
    score with a part tiebreak.

    Single-subtree note (round-9 plan sweep): `op` is referenced three
    times, `half` twice (the symmetric union) and `hist` three times —
    un-materialized, the compiled plan re-derived the basket scan 16x.
    Each is localCheckpoint-ed once; in production the sims table is a
    prebuilt artifact (the `sim_ivfpq_serve` train-once posture) and
    serving pays only the probe joins."""
    t = Tables(spark, sf_dir)
    op = (
        t.lineitem.select("l_orderkey", "l_partkey")
        .dropDuplicates()
        .localCheckpoint(eager=False)
    )
    item = op.groupBy("l_partkey").agg(F.count("*").alias("n_item"))
    b = op.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("part_b")
    )
    pairs = (
        op.join(
            b,
            (F.col("l_orderkey") == F.col("o2"))
            & (F.col("l_partkey") < F.col("part_b")),
        )
        .groupBy(F.col("l_partkey").alias("part_a"), "part_b")
        .agg(F.count("*").alias("n_co"))
        .where(F.col("n_co") >= _MIN_CO)
    )
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b"))
    half = (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .select(
            "part_a",
            "part_b",
            (
                F.col("n_co")
                / F.sqrt(F.col("n_a") * F.col("n_b").cast("double"))
            ).alias("cos"),
        )
        .localCheckpoint(eager=False)
    )
    sims = half.select(
        F.col("part_a").alias("i"), F.col("part_b").alias("j"), "cos"
    ).unionAll(
        half.select(
            F.col("part_b").alias("i"), F.col("part_a").alias("j"), "cos"
        )
    )
    hist = (
        t.orders.join(
            t.lineitem, F.col("o_orderkey") == F.col("l_orderkey")
        )
        .select(F.col("o_custkey").alias("u"), F.col("l_partkey").alias("j"))
        .dropDuplicates()
        .localCheckpoint(eager=False)
    )
    probes = (
        hist.groupBy("u")
        .agg(F.count("*").alias("h"))
        .orderBy(F.desc("h"), "u")
        .limit(_SERVE_USERS)
        .select("u")
    )
    ph = hist.join(F.broadcast(probes), "u")
    cand = (
        ph.join(sims, "j")
        .join(
            ph.select("u", F.col("j").alias("i")),
            ["u", "i"],
            "left_anti",
        )
        .groupBy("u", "i")
        .agg(
            F.count("*").alias("n_contributing"),
            F.sum(F.round(F.col("cos"), 9).cast("decimal(28,9)"))
            .cast("double")
            .alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("u").orderBy(F.desc(F.round("score", 9)), "i")
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= _SERVE_K)
        .select(
            F.col("u").alias("custkey"),
            F.col("i").alias("partkey"),
            F.col("n_contributing").cast("bigint").alias("n_contributing"),
            F.round("score", 6).alias("score"),
        )
        .orderBy("custkey", F.desc(F.round("score", 9)), "partkey")
    )


_ALS_LAMBDA = 0.1
_ALS_R9 = R9_DECIMAL  # shared contract (exprs.py)


@query(
    "rec_als_user_step",
    oracle=f"""
    WITH r AS (
        SELECT user_id, event_type,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(*) / 100.0 AS r
        FROM events GROUP BY user_id, event_type
    ),
    q AS (
        SELECT DISTINCT event_type,
               (CAST(('0x' || substr(md5(event_type), 1, 4)) AS BIGINT)
                % 1000) / 1000.0 AS q1,
               (CAST(('0x' || substr(md5(event_type), 5, 4)) AS BIGINT)
                % 1000) / 1000.0 AS q2
        FROM r
    ),
    j AS (
        SELECT r.user_id, r.r, q.q1, q.q2
        FROM r JOIN q ON q.event_type = r.event_type
    ),
    s AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM({_ALS_R9.format(t="q1 * q1")}) AS DOUBLE) AS s00,
               CAST(SUM({_ALS_R9.format(t="q1 * q2")}) AS DOUBLE) AS s01,
               CAST(SUM({_ALS_R9.format(t="q2 * q2")}) AS DOUBLE) AS s11,
               CAST(SUM({_ALS_R9.format(t="q1 * r")}) AS DOUBLE) AS b0,
               CAST(SUM({_ALS_R9.format(t="q2 * r")}) AS DOUBLE) AS b1
        FROM j GROUP BY user_id
    ),
    p AS (
        SELECT user_id, n_items,
               ((s11 + {_ALS_LAMBDA}) * b0 - s01 * b1)
               / ((s00 + {_ALS_LAMBDA}) * (s11 + {_ALS_LAMBDA})
                  - s01 * s01) AS p1,
               ((s00 + {_ALS_LAMBDA}) * b1 - s01 * b0)
               / ((s00 + {_ALS_LAMBDA}) * (s11 + {_ALS_LAMBDA})
                  - s01 * s01) AS p2
        FROM s
    )
    SELECT CAST(COUNT(DISTINCT j.user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_ratings,
           ROUND(sqrt(CAST(SUM({_ALS_R9.format(
               t="(j.r - (p.p1 * j.q1 + p.p2 * j.q2))"
                 " * (j.r - (p.p1 * j.q1 + p.p2 * j.q2))")})
               AS DOUBLE) / COUNT(*)), 6) AS rmse_after,
           ROUND(CAST(SUM({_ALS_R9.format(t="p.p1")}) AS DOUBLE)
                 / COUNT(*), 6) AS mean_p1,
           ROUND(CAST(SUM({_ALS_R9.format(t="p.p2")}) AS DOUBLE)
                 / COUNT(*), 6) AS mean_p2
    FROM j JOIN p ON p.user_id = j.user_id
    """,
    tags=("pipeline", "recommendation", "als", "factorization"),
)
def rec_als_user_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact ALS user-step — the distributed matrix-factorization
    training primitive: with the rank-2 item factors FIXED (deterministic
    md5-derived vectors standing in for the previous iteration's
    broadcast), every user's factors solve an independent closed-form
    ridge (Q_u^T Q_u + lambda I)^{-1} Q_u^T r_u — per-user 2x2 adjugate
    arithmetic over grouped sufficient statistics, which is EXACTLY how
    production ALS scales: the item matrix broadcasts, the user solves
    are embarrassingly parallel at user grain, and one aggregate per
    half-step is the only shuffle.  Reports the post-step global RMSE
    and mean factors (rating-weighted over the join, both engines
    identical).

    Exactness: ratings are rational (decimal sum / count / 100), factors
    rational (md5-derived integers / 1000) — NO transcendental anywhere;
    per-user and global sums ride the ROUND(.,9) -> DECIMAL order-free
    contract; the solve is a shared rational expression tree.

    Scale shape: ratings aggregate at (user, item) grain; the factor
    join is a broadcast (items << users); the per-user reduction ships
    five doubles + a count per user; the solve and residuals are
    map-side.  The item half-step is the same shape transposed."""
    t = Tables(spark, sf_dir)
    r = t.events.groupBy("user_id", "event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
            / F.count("*")
            / 100.0
        ).alias("r")
    )
    # conv(hex, 16, 10) is the Spark spelling of DuckDB's '0x' cast — the
    # same md5-nibble integers in both engines (the `_arm` device in
    # pipeline/experiments.py).
    q = r.select("event_type").distinct().selectExpr(
        "event_type",
        "(CAST(conv(substr(md5(event_type), 1, 4), 16, 10) AS BIGINT)"
        " % 1000) / 1000.0 AS q1",
        "(CAST(conv(substr(md5(event_type), 5, 4), 16, 10) AS BIGINT)"
        " % 1000) / 1000.0 AS q2",
    )
    j = r.join(F.broadcast(q), "event_type").select(
        "user_id", "r", "q1", "q2"
    ).localCheckpoint(eager=False)
    r9 = lambda e: F.expr(_ALS_R9.format(t=e))  # noqa: E731
    s = j.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.sum(r9("q1 * q1")).cast("double").alias("s00"),
        F.sum(r9("q1 * q2")).cast("double").alias("s01"),
        F.sum(r9("q2 * q2")).cast("double").alias("s11"),
        F.sum(r9("q1 * r")).cast("double").alias("b0"),
        F.sum(r9("q2 * r")).cast("double").alias("b1"),
    )
    lam = _ALS_LAMBDA
    det = f"((s00 + {lam}) * (s11 + {lam}) - s01 * s01)"
    p = s.selectExpr(
        "user_id",
        f"((s11 + {lam}) * b0 - s01 * b1) / {det} AS p1",
        f"((s00 + {lam}) * b1 - s01 * b0) / {det} AS p2",
    )
    e = "(r - (p1 * q1 + p2 * q2)) * (r - (p1 * q1 + p2 * q2))"
    return (
        j.join(p, "user_id")
        .agg(
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
            F.count("*").cast("bigint").alias("n_ratings"),
            F.round(
                F.sqrt(F.sum(r9(e)).cast("double") / F.count("*")), 6
            ).alias("rmse_after"),
            F.round(
                F.sum(r9("p1")).cast("double") / F.count("*"), 6
            ).alias("mean_p1"),
            F.round(
                F.sum(r9("p2")).cast("double") / F.count("*"), 6
            ).alias("mean_p2"),
        )
    )


# --- round 13: item half-step + full alternating round (VERDICT r12 #2) ---
#
# Shared SQL fragments for the DuckDB oracles below.  The user half-step
# (`rec_als_user_step`, artifact-proven r12) is left byte-identical; these
# constants restate its CTE chain so the alternating round can extend it
# without touching the proven text.

_ALS_RATINGS_SQL = """
    r AS (
        SELECT user_id, event_type,
               CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE)
               / COUNT(*) / 100.0 AS r
        FROM events GROUP BY user_id, event_type
    )"""

_ALS_Q0_SQL = """
    q AS (
        SELECT DISTINCT event_type,
               (CAST(('0x' || substr(md5(event_type), 1, 4)) AS BIGINT)
                % 1000) / 1000.0 AS q1,
               (CAST(('0x' || substr(md5(event_type), 5, 4)) AS BIGINT)
                % 1000) / 1000.0 AS q2
        FROM r
    )"""

_ALS_P0_SQL = """
    pu AS (
        SELECT DISTINCT user_id,
               (CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 4))
                AS BIGINT) % 1000) / 1000.0 AS p1,
               (CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 5, 4))
                AS BIGINT) % 1000) / 1000.0 AS p2
        FROM r
    )"""

_ALS_DET = (
    f"((s00 + {_ALS_LAMBDA}) * (s11 + {_ALS_LAMBDA}) - s01 * s01)"
)


def _als_ratings(t: Tables) -> DataFrame:
    """(user_id, event_type, r) rating matrix — rational mean value."""
    return t.events.groupBy("user_id", "event_type").agg(
        (
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double")
            / F.count("*")
            / 100.0
        ).alias("r")
    )


def _md5_factors(df: DataFrame, key_expr: str, a: str, b: str) -> DataFrame:
    """Deterministic md5-nibble rank-2 factors for a key column —
    conv(hex,16,10) is the Spark spelling of DuckDB's '0x' cast (the
    `_arm` device in pipeline/experiments.py)."""
    return df.selectExpr(
        "*",
        f"(CAST(conv(substr(md5({key_expr}), 1, 4), 16, 10) AS BIGINT)"
        f" % 1000) / 1000.0 AS {a}",
        f"(CAST(conv(substr(md5({key_expr}), 5, 4), 16, 10) AS BIGINT)"
        f" % 1000) / 1000.0 AS {b}",
    )


def _ridge_solve(
    grouped: DataFrame, key: str, f1: str, f2: str, keep: tuple[str, ...] = ()
) -> DataFrame:
    """Closed-form rank-2 ridge from grouped sufficient statistics
    (s00,s01,s11,b0,b1) — 2x2 adjugate arithmetic, map-side."""
    lam = _ALS_LAMBDA
    det = f"((s00 + {lam}) * (s11 + {lam}) - s01 * s01)"
    return grouped.selectExpr(
        key,
        *keep,
        f"((s11 + {lam}) * b0 - s01 * b1) / {det} AS {f1}",
        f"((s00 + {lam}) * b1 - s01 * b0) / {det} AS {f2}",
    )


def _als_sums(
    j: DataFrame, key: str, f1: str, f2: str
) -> DataFrame:
    """Per-key Gram/gradient sufficient statistics over the ratings join —
    the ONLY shuffle of a half-step: five ROUND(.,9)->DECIMAL order-free
    doubles plus a count per key."""
    r9 = lambda e: F.expr(_ALS_R9.format(t=e))  # noqa: E731
    return j.groupBy(key).agg(
        F.count("*").cast("bigint").alias("n_obs"),
        F.sum(r9(f"{f1} * {f1}")).cast("double").alias("s00"),
        F.sum(r9(f"{f1} * {f2}")).cast("double").alias("s01"),
        F.sum(r9(f"{f2} * {f2}")).cast("double").alias("s11"),
        F.sum(r9(f"{f1} * r")).cast("double").alias("b0"),
        F.sum(r9(f"{f2} * r")).cast("double").alias("b1"),
    )


@query(
    "rec_als_item_step",
    oracle=f"""
    WITH {_ALS_RATINGS_SQL},
    {_ALS_P0_SQL},
    j AS (
        SELECT r.event_type, r.r, pu.p1, pu.p2
        FROM r JOIN pu ON pu.user_id = r.user_id
    ),
    s AS (
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_obs,
               CAST(SUM({_ALS_R9.format(t="p1 * p1")}) AS DOUBLE) AS s00,
               CAST(SUM({_ALS_R9.format(t="p1 * p2")}) AS DOUBLE) AS s01,
               CAST(SUM({_ALS_R9.format(t="p2 * p2")}) AS DOUBLE) AS s11,
               CAST(SUM({_ALS_R9.format(t="p1 * r")}) AS DOUBLE) AS b0,
               CAST(SUM({_ALS_R9.format(t="p2 * r")}) AS DOUBLE) AS b1
        FROM j GROUP BY event_type
    ),
    qn AS (
        SELECT event_type, n_obs,
               ((s11 + {_ALS_LAMBDA}) * b0 - s01 * b1) / {_ALS_DET} AS q1,
               ((s00 + {_ALS_LAMBDA}) * b1 - s01 * b0) / {_ALS_DET} AS q2
        FROM s
    )
    SELECT j.event_type,
           CAST(qn.n_obs AS BIGINT) AS n_users,
           ROUND(qn.q1, 6) AS q1_new,
           ROUND(qn.q2, 6) AS q2_new,
           ROUND(sqrt(CAST(SUM({_ALS_R9.format(
               t="(j.r - (j.p1 * qn.q1 + j.p2 * qn.q2))"
                 " * (j.r - (j.p1 * qn.q1 + j.p2 * qn.q2))")})
               AS DOUBLE) / COUNT(*)), 6) AS rmse_item
    FROM j JOIN qn ON qn.event_type = j.event_type
    GROUP BY j.event_type, qn.n_obs, qn.q1, qn.q2
    ORDER BY j.event_type
    """,
    tags=("pipeline", "recommendation", "als", "factorization"),
)
def rec_als_item_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ALS ITEM half-step — `rec_als_user_step` transposed, closing
    the docstring promise its r12 row left open: with the user factors
    FIXED (deterministic md5-derived vectors standing in for the previous
    iteration's solve), every item's factors solve an independent
    closed-form ridge (P_i^T P_i + lambda I)^{-1} P_i^T r_i.  Reports the
    new per-item factors and per-item RMSE.

    Scale shape — the TRANSPOSED posture matters: at 100 TB the item
    matrix broadcasts but the user matrix does NOT (millions of rows), so
    the user-factor attach is an equi-join co-partitioned on user_id (the
    ratings' native grain — no extra shuffle), and the per-item reduction
    ships five doubles + a count per item.  Exactness: same rational
    ROUND(.,9)->DECIMAL order-free device as the user step."""
    t = Tables(spark, sf_dir)
    r = _als_ratings(t)
    pu = _md5_factors(
        r.select("user_id").distinct(), "CAST(user_id AS STRING)", "p1", "p2"
    )
    # User-grain equi-join: ratings are already keyed by user_id, so this
    # co-partitions without a broadcast (users are the BIG side at scale).
    j = r.join(pu, "user_id").select(
        "event_type", "r", "p1", "p2"
    ).localCheckpoint(eager=False)
    qn = _ridge_solve(
        _als_sums(j, "event_type", "p1", "p2"),
        "event_type", "q1", "q2", keep=("n_obs",),
    )
    r9 = lambda e: F.expr(_ALS_R9.format(t=e))  # noqa: E731
    e = "(r - (p1 * q1 + p2 * q2)) * (r - (p1 * q1 + p2 * q2))"
    return (
        j.join(F.broadcast(qn), "event_type")
        .groupBy("event_type", "n_obs", "q1", "q2")
        .agg(
            F.round(
                F.sqrt(F.sum(r9(e)).cast("double") / F.count("*")), 6
            ).alias("rmse_item"),
        )
        .select(
            "event_type",
            F.col("n_obs").cast("bigint").alias("n_users"),
            F.round("q1", 6).alias("q1_new"),
            F.round("q2", 6).alias("q2_new"),
            "rmse_item",
        )
        .orderBy("event_type")
    )


@query(
    "rec_als_alternating_round",
    oracle=f"""
    WITH {_ALS_RATINGS_SQL},
    {_ALS_Q0_SQL},
    j AS (
        SELECT r.user_id, r.event_type, r.r, q.q1, q.q2
        FROM r JOIN q ON q.event_type = r.event_type
    ),
    su AS (
        SELECT user_id,
               CAST(SUM({_ALS_R9.format(t="q1 * q1")}) AS DOUBLE) AS s00,
               CAST(SUM({_ALS_R9.format(t="q1 * q2")}) AS DOUBLE) AS s01,
               CAST(SUM({_ALS_R9.format(t="q2 * q2")}) AS DOUBLE) AS s11,
               CAST(SUM({_ALS_R9.format(t="q1 * r")}) AS DOUBLE) AS b0,
               CAST(SUM({_ALS_R9.format(t="q2 * r")}) AS DOUBLE) AS b1
        FROM j GROUP BY user_id
    ),
    p AS (
        SELECT user_id,
               ((s11 + {_ALS_LAMBDA}) * b0 - s01 * b1) / {_ALS_DET} AS p1,
               ((s00 + {_ALS_LAMBDA}) * b1 - s01 * b0) / {_ALS_DET} AS p2
        FROM su
    ),
    j2 AS (
        SELECT j.user_id, j.event_type, j.r, j.q1, j.q2, p.p1, p.p2
        FROM j JOIN p ON p.user_id = j.user_id
    ),
    si AS (
        SELECT event_type,
               CAST(SUM({_ALS_R9.format(t="p1 * p1")}) AS DOUBLE) AS s00,
               CAST(SUM({_ALS_R9.format(t="p1 * p2")}) AS DOUBLE) AS s01,
               CAST(SUM({_ALS_R9.format(t="p2 * p2")}) AS DOUBLE) AS s11,
               CAST(SUM({_ALS_R9.format(t="p1 * r")}) AS DOUBLE) AS b0,
               CAST(SUM({_ALS_R9.format(t="p2 * r")}) AS DOUBLE) AS b1
        FROM j2 GROUP BY event_type
    ),
    qn AS (
        SELECT event_type,
               ((s11 + {_ALS_LAMBDA}) * b0 - s01 * b1) / {_ALS_DET} AS q1n,
               ((s00 + {_ALS_LAMBDA}) * b1 - s01 * b0) / {_ALS_DET} AS q2n
        FROM si
    ),
    j3 AS (
        SELECT j2.*, qn.q1n, qn.q2n
        FROM j2 JOIN qn ON qn.event_type = j2.event_type
    ),
    np AS (SELECT CAST(SUM({_ALS_R9.format(t="p1 * p1 + p2 * p2")})
                  AS DOUBLE) AS v FROM p),
    nq0 AS (SELECT CAST(SUM({_ALS_R9.format(t="q1 * q1 + q2 * q2")})
                   AS DOUBLE) AS v FROM q),
    nq1 AS (SELECT CAST(SUM({_ALS_R9.format(t="q1n * q1n + q2n * q2n")})
                   AS DOUBLE) AS v FROM qn),
    se AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_items,
               CAST(COUNT(*) AS BIGINT) AS n_ratings,
               CAST(SUM({_ALS_R9.format(
                   t="(r - (p1 * q1 + p2 * q2))"
                     " * (r - (p1 * q1 + p2 * q2))")}) AS DOUBLE) AS se_u,
               CAST(SUM({_ALS_R9.format(
                   t="(r - (p1 * q1n + p2 * q2n))"
                     " * (r - (p1 * q1n + p2 * q2n))")}) AS DOUBLE) AS se_i
        FROM j3
    )
    SELECT se.n_users, se.n_items, se.n_ratings,
           ROUND(sqrt(se.se_u / se.n_ratings), 6) AS rmse_user_step,
           ROUND(sqrt(se.se_i / se.n_ratings), 6) AS rmse_item_step,
           ROUND(se.se_u + {_ALS_LAMBDA} * (np.v + nq0.v), 6)
               AS obj_user_step,
           ROUND(se.se_i + {_ALS_LAMBDA} * (np.v + nq1.v), 6)
               AS obj_item_step
    FROM se CROSS JOIN np CROSS JOIN nq0 CROSS JOIN nq1
    """,
    tags=("pipeline", "recommendation", "als", "factorization"),
    bench=True,  # the iterative-trainer representative of the ALS family
)
def rec_als_alternating_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One FULL ALS alternating round — user half-step then item
    half-step chained on live intermediate factors, which is what makes
    it ALS and not arithmetic: starting from the deterministic md5 item
    factors Q0, solve every user's closed-form ridge (P1), then with P1
    fixed solve every item's ridge (Q1), and report RMSE and the
    regularized objective J = SE + lambda*(|P|^2 + |Q|^2) after EACH
    half-step.  Because the item step exactly minimizes J over Q with P1
    fixed, obj_item_step <= obj_user_step is a THEOREM (pinned in
    tests/test_property_random.py along with the fixture's RMSE
    non-increase).

    Scale shape: two shuffles per round, each a sufficient-statistics
    reduction (five doubles + count per entity); item factors broadcast
    both times (items << users); the user-factor attach rides the
    ratings' native user_id partitioning.  Exactness: every sum is
    ROUND(.,9)->DECIMAL order-free; solves are shared rational
    expression trees on exact-decimal-derived doubles."""
    t = Tables(spark, sf_dir)
    r = _als_ratings(t)
    q0 = _md5_factors(
        r.select("event_type").distinct(), "event_type", "q1", "q2"
    )
    j = r.join(F.broadcast(q0), "event_type").localCheckpoint(eager=False)
    p = _ridge_solve(_als_sums(j, "user_id", "q1", "q2"), "user_id", "p1", "p2")
    j2 = j.join(p, "user_id").localCheckpoint(eager=False)
    qn = _ridge_solve(
        _als_sums(j2, "event_type", "p1", "p2"), "event_type", "q1n", "q2n"
    )
    j3 = j2.join(F.broadcast(qn), "event_type")
    r9 = lambda e: F.expr(_ALS_R9.format(t=e))  # noqa: E731
    np_ = p.agg(F.sum(r9("p1 * p1 + p2 * p2")).cast("double").alias("np_v"))
    nq0 = q0.agg(F.sum(r9("q1 * q1 + q2 * q2")).cast("double").alias("nq0_v"))
    nq1 = qn.agg(
        F.sum(r9("q1n * q1n + q2n * q2n")).cast("double").alias("nq1_v")
    )
    eu = "(r - (p1 * q1 + p2 * q2)) * (r - (p1 * q1 + p2 * q2))"
    ei = "(r - (p1 * q1n + p2 * q2n)) * (r - (p1 * q1n + p2 * q2n))"
    se = j3.agg(
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.count_distinct("event_type").cast("bigint").alias("n_items"),
        F.count("*").cast("bigint").alias("n_ratings"),
        F.sum(r9(eu)).cast("double").alias("se_u"),
        F.sum(r9(ei)).cast("double").alias("se_i"),
    )
    lam = _ALS_LAMBDA
    return (
        se.join(F.broadcast(np_))
        .join(F.broadcast(nq0))
        .join(F.broadcast(nq1))
        .select(
            "n_users",
            "n_items",
            "n_ratings",
            F.round(F.sqrt(F.col("se_u") / F.col("n_ratings")), 6).alias(
                "rmse_user_step"
            ),
            F.round(F.sqrt(F.col("se_i") / F.col("n_ratings")), 6).alias(
                "rmse_item_step"
            ),
            F.round(
                F.col("se_u") + lam * (F.col("np_v") + F.col("nq0_v")), 6
            ).alias("obj_user_step"),
            F.round(
                F.col("se_i") + lam * (F.col("np_v") + F.col("nq1_v")), 6
            ).alias("obj_item_step"),
        )
    )


_ALS_IMPL_ALPHA = 10  # implicit-feedback confidence: c = 1 + alpha * r


@query(
    "rec_als_implicit_step",
    oracle=f"""
    WITH {_ALS_RATINGS_SQL},
    {_ALS_Q0_SQL},
    gram AS (
        SELECT CAST(SUM({_ALS_R9.format(t="q1 * q1")}) AS DOUBLE) AS g00,
               CAST(SUM({_ALS_R9.format(t="q1 * q2")}) AS DOUBLE) AS g01,
               CAST(SUM({_ALS_R9.format(t="q2 * q2")}) AS DOUBLE) AS g11
        FROM q
    ),
    j AS (
        SELECT r.user_id, r.r, q.q1, q.q2
        FROM r JOIN q ON q.event_type = r.event_type
    ),
    s AS (
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_obs,
               CAST(SUM({_ALS_R9.format(
                   t=f"{_ALS_IMPL_ALPHA} * r * q1 * q1")}) AS DOUBLE) AS c00,
               CAST(SUM({_ALS_R9.format(
                   t=f"{_ALS_IMPL_ALPHA} * r * q1 * q2")}) AS DOUBLE) AS c01,
               CAST(SUM({_ALS_R9.format(
                   t=f"{_ALS_IMPL_ALPHA} * r * q2 * q2")}) AS DOUBLE) AS c11,
               CAST(SUM({_ALS_R9.format(
                   t=f"(1 + {_ALS_IMPL_ALPHA} * r) * q1")}) AS DOUBLE) AS b0,
               CAST(SUM({_ALS_R9.format(
                   t=f"(1 + {_ALS_IMPL_ALPHA} * r) * q2")}) AS DOUBLE) AS b1
        FROM j GROUP BY user_id
    ),
    a AS (
        SELECT user_id, n_obs,
               g.g00 + c00 + {_ALS_LAMBDA} AS s00,
               g.g01 + c01 AS s01,
               g.g11 + c11 + {_ALS_LAMBDA} AS s11,
               b0, b1
        FROM s CROSS JOIN gram g
    ),
    p AS (
        SELECT user_id, n_obs,
               (s11 * b0 - s01 * b1) / (s00 * s11 - s01 * s01) AS p1,
               (s00 * b1 - s01 * b0) / (s00 * s11 - s01 * s01) AS p2
        FROM a
    )
    SELECT CAST(COUNT(DISTINCT j.user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_obs_pairs,
           ROUND(CAST(SUM({_ALS_R9.format(t="p.p1")}) AS DOUBLE)
                 / COUNT(*), 6) AS mean_p1,
           ROUND(CAST(SUM({_ALS_R9.format(t="p.p2")}) AS DOUBLE)
                 / COUNT(*), 6) AS mean_p2,
           ROUND(CAST(SUM({_ALS_R9.format(
               t="p.p1 * j.q1 + p.p2 * j.q2")}) AS DOUBLE)
                 / COUNT(*), 6) AS mean_pref_obs
    FROM j JOIN p ON p.user_id = j.user_id
    """,
    tags=("pipeline", "recommendation", "als", "implicit-feedback"),
)
def rec_als_implicit_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact IMPLICIT-feedback ALS user-step (Hu-Koren-Volinsky):
    every observed interaction becomes preference p=1 with confidence
    c = 1 + alpha*r, every UNOBSERVED (user, item) pair is a p=0
    observation with confidence 1 — naively a users x catalog dense
    problem.  The trick that makes it tractable at scale, implemented
    here exactly: A_u = Q^T Q + Q_obs^T (C_u - I) Q_obs + lambda*I,
    where Q^T Q is ONE catalog-grain Gram (a k x k aggregate over the
    item table, broadcast to every user) and the correction term touches
    only the user's OBSERVED rows — per-user cost is O(observed), never
    O(catalog).  b_u = Q_obs^T C_u p similarly touches observed rows
    only.  Reports mean fitted factors and the mean predicted preference
    on observed pairs (should pull toward 1).

    Exactness: r, q and alpha*r are rational; every sum rides the
    ROUND(.,9)->DECIMAL order-free contract; the 2x2 solve is a shared
    rational expression tree — oracle bit-exact, no transcendental.

    Scale shape: the Gram is a 1-row broadcast; the per-user reduction
    ships five doubles + a count; solves are map-side.  This is how
    production implicit ALS (Spark MLlib's own implementation included)
    scales to billions of interactions."""
    t = Tables(spark, sf_dir)
    r = _als_ratings(t)
    q0 = _md5_factors(
        r.select("event_type").distinct(), "event_type", "q1", "q2"
    )
    r9 = lambda e: F.expr(_ALS_R9.format(t=e))  # noqa: E731
    gram = q0.agg(
        F.sum(r9("q1 * q1")).cast("double").alias("g00"),
        F.sum(r9("q1 * q2")).cast("double").alias("g01"),
        F.sum(r9("q2 * q2")).cast("double").alias("g11"),
    )
    j = r.join(F.broadcast(q0), "event_type").select(
        "user_id", "r", "q1", "q2"
    ).localCheckpoint(eager=False)
    al = _ALS_IMPL_ALPHA
    s = j.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_obs"),
        F.sum(r9(f"{al} * r * q1 * q1")).cast("double").alias("c00"),
        F.sum(r9(f"{al} * r * q1 * q2")).cast("double").alias("c01"),
        F.sum(r9(f"{al} * r * q2 * q2")).cast("double").alias("c11"),
        F.sum(r9(f"(1 + {al} * r) * q1")).cast("double").alias("b0"),
        F.sum(r9(f"(1 + {al} * r) * q2")).cast("double").alias("b1"),
    )
    lam = _ALS_LAMBDA
    a = s.join(F.broadcast(gram)).selectExpr(
        "user_id",
        "n_obs",
        f"g00 + c00 + {lam} AS s00",
        "g01 + c01 AS s01",
        f"g11 + c11 + {lam} AS s11",
        "b0",
        "b1",
    )
    p = a.selectExpr(
        "user_id",
        "(s11 * b0 - s01 * b1) / (s00 * s11 - s01 * s01) AS p1",
        "(s00 * b1 - s01 * b0) / (s00 * s11 - s01 * s01) AS p2",
    )
    return (
        j.join(p, "user_id")
        .agg(
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
            F.count("*").cast("bigint").alias("n_obs_pairs"),
            F.round(
                F.sum(r9("p1")).cast("double") / F.count("*"), 6
            ).alias("mean_p1"),
            F.round(
                F.sum(r9("p2")).cast("double") / F.count("*"), 6
            ).alias("mean_p2"),
            F.round(
                F.sum(r9("p1 * q1 + p2 * q2")).cast("double") / F.count("*"),
                6,
            ).alias("mean_pref_obs"),
        )
    )


_ALS_ROUNDS = 3


def _als_convergence_sql(rounds: int = _ALS_ROUNDS) -> str:
    """Generate the DuckDB oracle for `rec_als_convergence`: the one-round
    CTE chain of `rec_als_alternating_round` unrolled `rounds` times, all
    from the same shared expression templates."""
    r9 = _ALS_R9.format
    lam = _ALS_LAMBDA

    def usums(src: str, q: str) -> str:
        return f"""(
        SELECT user_id,
               CAST(SUM({r9(t=f"{q}1 * {q}1")}) AS DOUBLE) AS s00,
               CAST(SUM({r9(t=f"{q}1 * {q}2")}) AS DOUBLE) AS s01,
               CAST(SUM({r9(t=f"{q}2 * {q}2")}) AS DOUBLE) AS s11,
               CAST(SUM({r9(t=f"{q}1 * r")}) AS DOUBLE) AS b0,
               CAST(SUM({r9(t=f"{q}2 * r")}) AS DOUBLE) AS b1
        FROM {src} GROUP BY user_id
    )"""

    def isums(src: str, p: str) -> str:
        return f"""(
        SELECT event_type,
               CAST(SUM({r9(t=f"{p}1 * {p}1")}) AS DOUBLE) AS s00,
               CAST(SUM({r9(t=f"{p}1 * {p}2")}) AS DOUBLE) AS s01,
               CAST(SUM({r9(t=f"{p}2 * {p}2")}) AS DOUBLE) AS s11,
               CAST(SUM({r9(t=f"{p}1 * r")}) AS DOUBLE) AS b0,
               CAST(SUM({r9(t=f"{p}2 * r")}) AS DOUBLE) AS b1
        FROM {src} GROUP BY event_type
    )"""

    def solve(key: str, f1: str, f2: str, src: str) -> str:
        return f"""(
        SELECT {key},
               ((s11 + {lam}) * b0 - s01 * b1) / {_ALS_DET} AS {f1},
               ((s00 + {lam}) * b1 - s01 * b0) / {_ALS_DET} AS {f2}
        FROM {src}
    )"""

    parts = [f"WITH {_ALS_RATINGS_SQL},", _ALS_Q0_SQL.strip() + ","]
    # q is q0 with factor cols (q1, q2); per round k we create pk / qk.
    rows = []
    prev_q, prev_qc = "q", "q"  # CTE name, column prefix is q1/q2 always
    for k in range(1, rounds + 1):
        parts.append(
            f"ju{k} AS (SELECT r.user_id, r.event_type, r.r, "
            f"{prev_q}.q1, {prev_q}.q2 FROM r JOIN {prev_q} "
            f"ON {prev_q}.event_type = r.event_type),"
        )
        parts.append(f"su{k} AS {usums(f'ju{k}', 'q')},")
        parts.append(f"p{k} AS {solve('user_id', 'p1', 'p2', f'su{k}')},")
        parts.append(
            f"ji{k} AS (SELECT r.user_id, r.event_type, r.r, "
            f"p{k}.p1, p{k}.p2 FROM r JOIN p{k} "
            f"ON p{k}.user_id = r.user_id),"
        )
        parts.append(f"si{k} AS {isums(f'ji{k}', 'p')},")
        parts.append(f"q{k} AS {solve('event_type', 'q1', 'q2', f'si{k}')},")
        # norms
        parts.append(
            f"np{k} AS (SELECT CAST(SUM({r9(t='p1 * p1 + p2 * p2')}) "
            f"AS DOUBLE) AS v FROM p{k}),"
        )
        parts.append(
            f"nq{k} AS (SELECT CAST(SUM({r9(t='q1 * q1 + q2 * q2')}) "
            f"AS DOUBLE) AS v FROM q{k}),"
        )
        if k == 1:
            parts.append(
                f"nq0 AS (SELECT CAST(SUM({r9(t='q1 * q1 + q2 * q2')}) "
                "AS DOUBLE) AS v FROM q),"
            )
        # squared errors: user step vs prev_q, item step vs qk
        eu = (
            "(j.r - (pk.p1 * j.q1 + pk.p2 * j.q2))"
            " * (j.r - (pk.p1 * j.q1 + pk.p2 * j.q2))"
        )
        parts.append(
            f"seu{k} AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_ratings, "
            f"CAST(SUM({r9(t=eu)}) AS DOUBLE) AS se "
            f"FROM ju{k} j JOIN p{k} pk ON pk.user_id = j.user_id),"
        )
        ei = (
            "(j.r - (j.p1 * qk.q1 + j.p2 * qk.q2))"
            " * (j.r - (j.p1 * qk.q1 + j.p2 * qk.q2))"
        )
        parts.append(
            f"sei{k} AS (SELECT CAST(SUM({r9(t=ei)}) AS DOUBLE) AS se "
            f"FROM ji{k} j JOIN q{k} qk ON qk.event_type = j.event_type),"
        )
        prev_nq = "nq0" if k == 1 else f"nq{k - 1}"
        rows.append(
            f"SELECT {k} AS round,\n"
            f"  ROUND(sqrt(seu{k}.se / seu{k}.n_ratings), 6)"
            " AS rmse_user_step,\n"
            f"  ROUND(sqrt(sei{k}.se / seu{k}.n_ratings), 6)"
            " AS rmse_item_step,\n"
            f"  ROUND(seu{k}.se + {lam} * (np{k}.v + {prev_nq}.v), 6)"
            " AS obj_user_step,\n"
            f"  ROUND(sei{k}.se + {lam} * (np{k}.v + nq{k}.v), 6)"
            " AS obj_item_step\n"
            f"FROM seu{k}, sei{k}, np{k}, nq{k}, {prev_nq}"
        )
        prev_q = f"q{k}"
    body = "\n    ".join(parts).rstrip(",")
    # strip the trailing comma of the final CTE
    if body.endswith(","):
        body = body[:-1]
    union = "\n    UNION ALL\n    ".join(rows)
    return f"{body}\n    {union}\n    ORDER BY round"


@query(
    "rec_als_convergence",
    oracle=_als_convergence_sql(),
    tags=("pipeline", "recommendation", "als", "factorization",
          "iterative"),
)
def rec_als_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THREE full ALS alternating rounds with the objective trajectory —
    the registered form of the family's 'iterating to convergence never
    rescans the corpus' claim: per round, RMSE and the regularized
    objective J = SE + lambda*(|P|^2+|Q|^2) after the user and after the
    item half-step.  Every one of the six half-steps exactly minimizes J
    over its factor block, so the SIX-value objective sequence is
    non-increasing BY THEOREM (pinned in tests/test_property_random.py
    together with a numpy replay of the full trajectory).

    Exactness: the chain composes the proven one-round devices — every
    aggregate rides ROUND(.,9)->DECIMAL, every solve is a shared
    rational expression tree, so even after six chained solves the 6-dp
    outputs agree bit-exactly across engines.

    Scale shape: two sufficient-statistics shuffles per round (five
    doubles + count per entity), item factors broadcast, user factors
    attach on the ratings' native user_id grain; each round's rating
    join frames are localCheckpointed so lineage stays flat instead of
    exponential."""
    t = Tables(spark, sf_dir)
    r = _als_ratings(t).localCheckpoint(eager=False)
    q_prev = _md5_factors(
        r.select("event_type").distinct(), "event_type", "q1", "q2"
    )
    r9 = lambda e: F.expr(_ALS_R9.format(t=e))  # noqa: E731
    lam = _ALS_LAMBDA
    norm = lambda df, a, b: df.agg(  # noqa: E731
        F.sum(r9(f"{a} * {a} + {b} * {b}")).cast("double").alias("v")
    )
    nq_prev = norm(q_prev, "q1", "q2")
    out = []
    for k in range(1, _ALS_ROUNDS + 1):
        ju = r.join(F.broadcast(q_prev), "event_type").localCheckpoint(
            eager=False
        )
        p = _ridge_solve(_als_sums(ju, "user_id", "q1", "q2"),
                         "user_id", "p1", "p2").localCheckpoint(eager=False)
        ji = r.join(p, "user_id").localCheckpoint(eager=False)
        qn = _ridge_solve(_als_sums(ji, "event_type", "p1", "p2"),
                          "event_type", "q1", "q2").localCheckpoint(
            eager=False
        )
        eu = (
            "(r - (p1 * q1 + p2 * q2)) * (r - (p1 * q1 + p2 * q2))"
        )
        # se_u from ji (already user-joined) + broadcast q_prev — joining
        # ju with p would re-shuffle two corpus-sized frames per round for
        # the identical rows (review r13 #3); items broadcast, order-free
        # decimal sums make the two formulations bit-equal.
        seu = ji.join(
            F.broadcast(q_prev.select("event_type", "q1", "q2")),
            "event_type",
        ).agg(
            F.count("*").cast("bigint").alias("n_ratings"),
            F.sum(r9(eu)).cast("double").alias("se_u"),
        )
        sei = ji.join(F.broadcast(qn), "event_type").agg(
            F.sum(r9(eu)).cast("double").alias("se_i"),
        )
        np_ = norm(p, "p1", "p2")
        nq = norm(qn, "q1", "q2")
        row = (
            seu.join(F.broadcast(sei))
            .join(F.broadcast(np_.selectExpr("v AS np_v")))
            .join(F.broadcast(nq.selectExpr("v AS nq_v")))
            .join(F.broadcast(nq_prev.selectExpr("v AS nq_prev_v")))
            .selectExpr(
                f"{k} AS round",
                "ROUND(sqrt(se_u / n_ratings), 6) AS rmse_user_step",
                "ROUND(sqrt(se_i / n_ratings), 6) AS rmse_item_step",
                f"ROUND(se_u + {lam} * (np_v + nq_prev_v), 6)"
                " AS obj_user_step",
                f"ROUND(se_i + {lam} * (np_v + nq_v), 6) AS obj_item_step",
            )
        )
        out.append(row)
        q_prev, nq_prev = qn, nq
    res = out[0]
    for row in out[1:]:
        res = res.unionByName(row)
    return res.orderBy("round")


# --- round 14: rank-k ALS (VERDICT r13 ask #6) ---------------------------
#
# The r13 family hardwired k=2 via explicit 2x2 adjugate algebra; production
# ALS is rank 16-128.  The generalization keeps the sufficient-statistics
# posture — one shuffle of a k x k Gram upper triangle + k gradient sums per
# entity — and replaces the adjugate with an UNROLLED LDL^T ridge solve
# emitted as a shared rational expression tree (lateral column aliases, no
# sqrt, no matrix library): both engines evaluate the identical text, so
# the chained IEEE arithmetic agrees bit-for-bit, and Spark keeps the whole
# solve inside whole-stage codegen (a pandas-UDF Cholesky would leave the
# JVM for a per-user batch hop; the expression tree is strictly better at
# every k the optimizer's 64KB codegen budget admits — k=8 compiles fine).

_ALS_K = 8  # md5 yields 32 hex chars = 8 x 4-nibble factors per key


def _rk_pairs(k: int) -> list[tuple[int, int]]:
    return [(i, j) for i in range(k) for j in range(i, k)]


def _rk_factor_exprs(key_expr: str, k: int, prefix: str,
                     duck: bool) -> list[str]:
    """Deterministic md5-nibble rank-k factors — 4 hex chars per dimension.
    `duck` picks the engine spelling of hex->int ('0x' cast vs conv).

    One md5 digest supplies exactly 8 four-nibble factors; past that the
    substr would be empty and the engines DIVERGE silently (Spark
    conv('') yields NULL, DuckDB '0x' cast throws), so ranks past 8 CHAIN
    salted digests — factor f reads digest f//8, which is md5(key) for
    the first eight and md5(key || ':<d>') after (VERDICT r14 ask #6;
    dimensions <= 8 keep their exact r13/r14-proven text).  `||` and md5
    spell identically in both engines, so the chained factors stay
    engine-identical.  The sufficient-statistics + LDL^T solve device
    itself is rank-agnostic; the 64 cap (8 digests) is arbitrary fixture
    hygiene, not a device limit."""
    if not 1 <= k <= 64:
        raise ValueError(
            f"md5 fixture factors support k in [1, 64], got k={k}"
        )
    out = []
    for f in range(k):
        d, within = divmod(f, 8)
        src = key_expr if d == 0 else f"({key_expr}) || ':{d}'"
        sub = f"substr(md5({src}), {1 + 4 * within}, 4)"
        n = (f"CAST(('0x' || {sub}) AS BIGINT)" if duck
             else f"CAST(conv({sub}, 16, 10) AS BIGINT)")
        out.append(f"({n} % 1000) / 1000.0 AS {prefix}{f}")
    return out


def _rk_stat_exprs(k: int, fac: str, duck: bool) -> list[str]:
    """Per-entity sufficient statistics: the Gram upper triangle s_i_j =
    SUM(f_i * f_j) and the gradient b_i = SUM(f_i * r), every sum on the
    ROUND(.,9)->DECIMAL order-free contract."""
    del duck  # identical text in both engines
    out = [
        f"CAST(SUM({_ALS_R9.format(t=f'{fac}{i} * {fac}{j}')}) AS DOUBLE)"
        f" AS s_{i}_{j}"
        for i, j in _rk_pairs(k)
    ]
    out += [
        f"CAST(SUM({_ALS_R9.format(t=f'{fac}{i} * r')}) AS DOUBLE)"
        f" AS b_{i}"
        for i in range(k)
    ]
    return out


def _rk_ldlt_layers(k: int, lam: float, out_prefix: str) -> list[list[str]]:
    """The unrolled LDL^T solve of (S + lam*I) x = b as PROJECTION LAYERS
    (one list of `expr AS alias` per dependency level): LDL^T needs NO
    sqrt — d_j, l_ij, the forward solve y, and the back solve x are all
    +,-,*,/ on the previous layers' columns, so the tree is rational and
    bit-deterministic, and S + lam*I is PD so every d_j > 0.  Layering
    matters: a single SELECT of chained lateral column aliases INLINES
    each reference (both engines), which is exponential in k — at k=8
    neither engine finishes analysis; as ~3k stacked projections every
    intermediate is a materialized column reference, linear in k."""
    layers: list[list[str]] = []
    for j in range(k):
        lay = []
        t = [f"s_{j}_{j} + {lam}"]
        t += [f"- l_{j}_{m} * l_{j}_{m} * d_{m}" for m in range(j)]
        lay.append(f"{' '.join(t)} AS d_{j}")
        for i in range(j + 1, k):
            t = [f"s_{j}_{i}"]
            t += [f"- l_{i}_{m} * l_{j}_{m} * d_{m}" for m in range(j)]
            lay.append(f"({' '.join(t)}) / (s_{j}_{j} + {lam}"
                       + "".join(f" - l_{j}_{m} * l_{j}_{m} * d_{m}"
                                 for m in range(j))
                       + f") AS l_{i}_{j}")
        layers.append(lay)
    for i in range(k):
        t = [f"b_{i}"] + [f"- l_{i}_{m} * y_{m}" for m in range(i)]
        layers.append([f"{' '.join(t)} AS y_{i}"])
    for i in reversed(range(k)):
        t = [f"y_{i} / d_{i}"]
        t += [f"- l_{m}_{i} * {out_prefix}{m}" for m in range(i + 1, k)]
        layers.append([f"{' '.join(t)} AS {out_prefix}{i}"])
    return layers


def _rk_dot(a: str, b: str, k: int) -> str:
    return " + ".join(f"{a}{f} * {b}{f}" for f in range(k))


def _rk_nest_layers(base: str, layers: list[list[str]]) -> str:
    """Nest the solve layers as subqueries over `base` (oracle side) —
    each layer is `SELECT *, <level exprs> FROM <inner>`, so every
    intermediate is a plain column reference to the layer below."""
    sql = base
    for lay in layers:
        sql = f"(SELECT *, {', '.join(lay)} FROM {sql})"
    return sql


def _rank_k_oracle(k: int) -> str:
    dot = _rk_dot("j.p_", "j.q_", k)
    return f"""
    WITH {_ALS_RATINGS_SQL},
    q AS (
        SELECT DISTINCT event_type,
               {', '.join(_rk_factor_exprs('event_type', k, 'q_', True))}
        FROM r
    ),
    jq AS (
        SELECT r.user_id, r.r, {', '.join(f'q.q_{f}' for f in range(k))}
        FROM r JOIN q ON q.event_type = r.event_type
    ),
    s AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_items,
               {', '.join(_rk_stat_exprs(k, 'q_', True))}
        FROM jq GROUP BY user_id
    ),
    p AS (
        SELECT user_id, {', '.join(f'p_{f}' for f in range(k))}
        FROM {_rk_nest_layers('s', _rk_ldlt_layers(k, _ALS_LAMBDA, 'p_'))}
    ),
    j AS (
        SELECT jq.*, {', '.join(f'p.p_{f}' for f in range(k))}
        FROM jq JOIN p ON p.user_id = jq.user_id
    )
    SELECT CAST(COUNT(DISTINCT j.user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_ratings,
           ROUND(sqrt(CAST(SUM({_ALS_R9.format(
               t=f'(j.r - ({dot})) * (j.r - ({dot}))')})
               AS DOUBLE) / COUNT(*)), 6) AS rmse_after,
           {', '.join(
               f"ROUND(CAST(SUM({_ALS_R9.format(t=f'j.p_{f}')}) AS DOUBLE)"
               f" / COUNT(*), 6) AS mean_p{f}" for f in range(k))}
    FROM j
    """


def _rank_k_user_step(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    t = Tables(spark, sf_dir)
    r = _als_ratings(t)
    q = r.select("event_type").distinct().selectExpr(
        "event_type", *_rk_factor_exprs("event_type", k, "q_", False)
    )
    jq = r.join(F.broadcast(q), "event_type").select(
        "user_id", "r", *[f"q_{f}" for f in range(k)]
    ).localCheckpoint(eager=False)
    r9 = lambda e: F.expr(_ALS_R9.format(t=e))  # noqa: E731
    s = jq.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_items"),
        *[F.expr(e) for e in _rk_stat_exprs(k, "q_", False)],
    )
    p = s
    for lay in _rk_ldlt_layers(k, _ALS_LAMBDA, "p_"):
        p = p.selectExpr("*", *lay)
    p = p.select("user_id", *[f"p_{f}" for f in range(k)])
    dot = _rk_dot("p_", "q_", k)
    return jq.join(p, "user_id").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.count("*").cast("bigint").alias("n_ratings"),
        F.round(
            F.sqrt(
                F.sum(r9(f"(r - ({dot})) * (r - ({dot}))")).cast("double")
                / F.count("*")
            ),
            6,
        ).alias("rmse_after"),
        *[
            F.round(
                F.sum(r9(f"p_{f}")).cast("double") / F.count("*"), 6
            ).alias(f"mean_p{f}")
            for f in range(k)
        ],
    )


@query(
    "rec_als_rank_k",
    oracle=_rank_k_oracle(_ALS_K),
    tags=("pipeline", "recommendation", "als", "factorization", "rank-k"),
)
def rec_als_rank_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ALS user-step at PRODUCTION RANK (k=8 here; the device is
    k-parametric) — the r13 family's closed-form solves hardwired k=2 via
    2x2 adjugate algebra; this generalizes the sufficient-statistics
    device to a k x k Gram per user: the per-user shuffle ships the Gram
    upper triangle (k(k+1)/2 sums) + k gradient sums + a count, and the
    ridge solve (Q_u^T Q_u + lambda I) p_u = b_u runs as an UNROLLED
    LDL^T expression tree (no sqrt — pure +,-,*,/ on lateral column
    aliases), so both engines evaluate the identical rational text
    bit-for-bit and Spark keeps the whole solve inside whole-stage
    codegen rather than a pandas-UDF matrix hop.  The k=2 specialization
    is equality-pinned to the proven `rec_als_user_step` adjugate and
    the solve to numpy's LAPACK in tests/test_property_random.py.

    Scale shape: identical to the k=2 step — item factors broadcast
    (items << users), ONE sufficient-statistics shuffle of
    k(k+1)/2 + k + 1 values per user (44 + count at k=8; at k=128 that
    is ~8.3k doubles per user — still orders under the ratings), solve
    and residuals map-side.  Plan-gated: broadcast factor attach,
    partial/final Gram aggregate, zero Python eval nodes."""
    return _rank_k_user_step(spark, sf_dir, _ALS_K)


_ALS_K16 = 16  # two chained md5 digests (VERDICT r14 ask #6)


@query(
    "rec_als_rank16_chained",
    oracle=_rank_k_oracle(_ALS_K16),
    tags=("pipeline", "recommendation", "als", "factorization", "rank-k"),
)
def rec_als_rank16_chained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ALS user-step at k=16 via CHAINED md5 digests (VERDICT r14
    ask #6): the single-digest fixture source caps at 8 four-nibble
    factors, so dimensions 8-15 read a second salted digest
    md5(event_type || ':1') — proving the sufficient-statistics +
    layered LDL^T device at a production rank beyond what one digest
    can seed.  Dimensions 0-7 keep the exact factor text the
    r13/r14-proven k=8 queries use, so any divergence isolates to the
    chaining.

    The k=16 solve is 136 Gram sums + 16 gradients per user and ~48
    stacked projection layers — the layered emission is what keeps
    analysis LINEAR in k where chained lateral aliases are exponential
    in both engines (the rec_als_rank_k lesson); the solve stays
    whole-stage-codegen JVM expressions (same EvalPython-free plan
    gate as k=8: `test_als_rank16_chained_jvm_solve`).

    Scale shape: identical to k=8 — item factors broadcast, ONE
    sufficient-statistics shuffle of k(k+1)/2 + k + 1 = 153 doubles
    per user (still orders under the ratings), solve and residuals
    map-side."""
    return _rank_k_user_step(spark, sf_dir, _ALS_K16)


def _rk_norm(prefix: str, k: int) -> str:
    return " + ".join(f"{prefix}{f} * {prefix}{f}" for f in range(k))


def _rank_k_round_oracle(k: int) -> str:
    lam = _ALS_LAMBDA
    dot0 = _rk_dot("p_", "q_", k)
    dotn = _rk_dot("p_", "qn_", k)
    return f"""
    WITH {_ALS_RATINGS_SQL},
    q AS (
        SELECT DISTINCT event_type,
               {', '.join(_rk_factor_exprs('event_type', k, 'q_', True))}
        FROM r
    ),
    j AS (
        SELECT r.user_id, r.event_type, r.r,
               {', '.join(f'q.q_{f}' for f in range(k))}
        FROM r JOIN q ON q.event_type = r.event_type
    ),
    su AS (
        SELECT user_id, {', '.join(_rk_stat_exprs(k, 'q_', True))}
        FROM j GROUP BY user_id
    ),
    p AS (
        SELECT user_id, {', '.join(f'p_{f}' for f in range(k))}
        FROM {_rk_nest_layers('su', _rk_ldlt_layers(k, lam, 'p_'))}
    ),
    j2 AS (
        SELECT j.*, {', '.join(f'p.p_{f}' for f in range(k))}
        FROM j JOIN p ON p.user_id = j.user_id
    ),
    si AS (
        SELECT event_type, {', '.join(_rk_stat_exprs(k, 'p_', True))}
        FROM j2 GROUP BY event_type
    ),
    qn AS (
        SELECT event_type, {', '.join(f'qn_{f}' for f in range(k))}
        FROM {_rk_nest_layers('si', _rk_ldlt_layers(k, lam, 'qn_'))}
    ),
    j3 AS (
        SELECT j2.*, {', '.join(f'qn.qn_{f}' for f in range(k))}
        FROM j2 JOIN qn ON qn.event_type = j2.event_type
    ),
    np AS (SELECT CAST(SUM({_ALS_R9.format(t=_rk_norm('p_', k))})
                  AS DOUBLE) AS v FROM p),
    nq0 AS (SELECT CAST(SUM({_ALS_R9.format(t=_rk_norm('q_', k))})
                   AS DOUBLE) AS v FROM q),
    nq1 AS (SELECT CAST(SUM({_ALS_R9.format(t=_rk_norm('qn_', k))})
                   AS DOUBLE) AS v FROM qn),
    se AS (
        SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
               CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_items,
               CAST(COUNT(*) AS BIGINT) AS n_ratings,
               CAST(SUM({_ALS_R9.format(
                   t=f'(r - ({dot0})) * (r - ({dot0}))')}) AS DOUBLE)
                   AS se_u,
               CAST(SUM({_ALS_R9.format(
                   t=f'(r - ({dotn})) * (r - ({dotn}))')}) AS DOUBLE)
                   AS se_i
        FROM j3
    )
    SELECT se.n_users, se.n_items, se.n_ratings,
           ROUND(sqrt(se.se_u / se.n_ratings), 6) AS rmse_user_step,
           ROUND(sqrt(se.se_i / se.n_ratings), 6) AS rmse_item_step,
           ROUND(se.se_u + {lam} * (np.v + nq0.v), 6) AS obj_user_step,
           ROUND(se.se_i + {lam} * (np.v + nq1.v), 6) AS obj_item_step
    FROM se CROSS JOIN np CROSS JOIN nq0 CROSS JOIN nq1
    """


def _rank_k_round(spark: SparkSession, sf_dir: str, k: int) -> DataFrame:
    lam = _ALS_LAMBDA
    r9 = lambda e: F.expr(_ALS_R9.format(t=e))  # noqa: E731
    t = Tables(spark, sf_dir)
    r = _als_ratings(t)
    q0 = r.select("event_type").distinct().selectExpr(
        "event_type", *_rk_factor_exprs("event_type", k, "q_", False)
    )
    j = r.join(F.broadcast(q0), "event_type").localCheckpoint(eager=False)
    su = j.groupBy("user_id").agg(
        *[F.expr(e) for e in _rk_stat_exprs(k, "q_", False)]
    )
    p = su
    for lay in _rk_ldlt_layers(k, lam, "p_"):
        p = p.selectExpr("*", *lay)
    p = p.select("user_id", *[f"p_{f}" for f in range(k)])
    j2 = j.join(p, "user_id").localCheckpoint(eager=False)
    si = j2.groupBy("event_type").agg(
        *[F.expr(e) for e in _rk_stat_exprs(k, "p_", False)]
    )
    qn = si
    for lay in _rk_ldlt_layers(k, lam, "qn_"):
        qn = qn.selectExpr("*", *lay)
    qn = qn.select("event_type", *[f"qn_{f}" for f in range(k)])
    j3 = j2.join(F.broadcast(qn), "event_type")
    np_ = p.agg(F.sum(r9(_rk_norm("p_", k))).cast("double").alias("np_v"))
    nq0 = q0.agg(F.sum(r9(_rk_norm("q_", k))).cast("double").alias("nq0_v"))
    nq1 = qn.agg(F.sum(r9(_rk_norm("qn_", k))).cast("double").alias("nq1_v"))
    dot0, dotn = _rk_dot("p_", "q_", k), _rk_dot("p_", "qn_", k)
    se = j3.agg(
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.count_distinct("event_type").cast("bigint").alias("n_items"),
        F.count("*").cast("bigint").alias("n_ratings"),
        F.sum(r9(f"(r - ({dot0})) * (r - ({dot0}))")).cast("double")
        .alias("se_u"),
        F.sum(r9(f"(r - ({dotn})) * (r - ({dotn}))")).cast("double")
        .alias("se_i"),
    )
    return (
        se.join(F.broadcast(np_))
        .join(F.broadcast(nq0))
        .join(F.broadcast(nq1))
        .selectExpr(
            "n_users", "n_items", "n_ratings",
            "ROUND(sqrt(se_u / n_ratings), 6) AS rmse_user_step",
            "ROUND(sqrt(se_i / n_ratings), 6) AS rmse_item_step",
            f"ROUND(se_u + {lam} * (np_v + nq0_v), 6) AS obj_user_step",
            f"ROUND(se_i + {lam} * (np_v + nq1_v), 6) AS obj_item_step",
        )
    )


@query(
    "rec_als_rank_k_round",
    oracle=_rank_k_round_oracle(_ALS_K),
    tags=("pipeline", "recommendation", "als", "factorization", "rank-k"),
)
def rec_als_rank_k_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One FULL ALS alternating round at PRODUCTION RANK (k=8,
    k-parametric) — `rec_als_alternating_round` lifted from the 2x2
    adjugate to the k x k LDL^T device: user solves from the broadcast
    md5 item factors Q0, item solves from the live P1, RMSE and the
    regularized objective J = SE + lambda*(|P|^2 + |Q|^2) after each
    half-step.  The item step exactly minimizes J over Q with P1 fixed,
    so obj_item_step <= obj_user_step stays a THEOREM at every rank
    (pinned in tests alongside the k=2 equality to the proven round).

    Exactness: both solve chains are the shared layered rational text
    (no sqrt), every sum rides ROUND(.,9)->DECIMAL — bit-identical
    across engines through TWO chained k=8 solves.

    Scale shape: unchanged from k=2 — two sufficient-statistics
    shuffles (now k(k+1)/2 + k + 1 values per entity), item factors
    broadcast both times, user factors ride the ratings' native
    user_id grain, rating joins localCheckpointed so lineage stays
    flat."""
    return _rank_k_round(spark, sf_dir, _ALS_K)


def _rk_implicit_stat_exprs(k: int) -> list[str]:
    """Per-user HKV correction statistics: c_i_j = SUM(alpha*r * q_i*q_j)
    (the confidence-weighted Gram correction — only OBSERVED pairs) and
    b_i = SUM((1 + alpha*r) * q_i), on the order-free decimal contract."""
    a = _ALS_IMPL_ALPHA
    out = [
        f"CAST(SUM({_ALS_R9.format(t=f'{a} * r * q_{i} * q_{j}')})"
        f" AS DOUBLE) AS c_{i}_{j}"
        for i, j in _rk_pairs(k)
    ]
    out += [
        f"CAST(SUM({_ALS_R9.format(t=f'(1 + {a} * r) * q_{i}')})"
        f" AS DOUBLE) AS b_{i}"
        for i in range(k)
    ]
    return out


def _rk_gram_exprs(k: int) -> list[str]:
    """Global item-factor Gram (the HKV 'everything is a zero' term):
    g_i_j = SUM(q_i * q_j) over the DISTINCT item factors."""
    return [
        f"CAST(SUM({_ALS_R9.format(t=f'q_{i} * q_{j}')}) AS DOUBLE)"
        f" AS g_{i}_{j}"
        for i, j in _rk_pairs(k)
    ]


def _rank_k_implicit_oracle(k: int) -> str:
    dot = _rk_dot("j.p_", "j.q_", k)
    sums = ", ".join(
        f"g_{i}_{j} + c_{i}_{j} AS s_{i}_{j}" for i, j in _rk_pairs(k)
    )
    return f"""
    WITH {_ALS_RATINGS_SQL},
    q AS (
        SELECT DISTINCT event_type,
               {', '.join(_rk_factor_exprs('event_type', k, 'q_', True))}
        FROM r
    ),
    gram AS (SELECT {', '.join(_rk_gram_exprs(k))} FROM q),
    jq AS (
        SELECT r.user_id, r.r, {', '.join(f'q.q_{f}' for f in range(k))}
        FROM r JOIN q ON q.event_type = r.event_type
    ),
    s AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_obs,
               {', '.join(_rk_implicit_stat_exprs(k))}
        FROM jq GROUP BY user_id
    ),
    a AS (
        SELECT user_id, n_obs, {sums},
               {', '.join(f'b_{i}' for i in range(k))}
        FROM s CROSS JOIN gram
    ),
    p AS (
        SELECT user_id, {', '.join(f'p_{f}' for f in range(k))}
        FROM {_rk_nest_layers('a', _rk_ldlt_layers(k, _ALS_LAMBDA, 'p_'))}
    ),
    j AS (
        SELECT jq.*, {', '.join(f'p.p_{f}' for f in range(k))}
        FROM jq JOIN p ON p.user_id = jq.user_id
    )
    SELECT CAST(COUNT(DISTINCT j.user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_obs_pairs,
           ROUND(CAST(SUM({_ALS_R9.format(t=f'{dot}')}) AS DOUBLE)
                 / COUNT(*), 6) AS mean_pref_obs,
           {', '.join(
               f"ROUND(CAST(SUM({_ALS_R9.format(t=f'j.p_{f}')}) AS DOUBLE)"
               f" / COUNT(*), 6) AS mean_p{f}" for f in range(k))}
    FROM j
    """


def _rank_k_implicit_step(
    spark: SparkSession, sf_dir: str, k: int
) -> DataFrame:
    r9 = lambda e: F.expr(_ALS_R9.format(t=e))  # noqa: E731
    t = Tables(spark, sf_dir)
    r = _als_ratings(t)
    q = r.select("event_type").distinct().selectExpr(
        "event_type", *_rk_factor_exprs("event_type", k, "q_", False)
    ).localCheckpoint(eager=False)
    gram = q.agg(*[F.expr(e) for e in _rk_gram_exprs(k)])
    jq = r.join(F.broadcast(q), "event_type").select(
        "user_id", "r", *[f"q_{f}" for f in range(k)]
    ).localCheckpoint(eager=False)
    s = jq.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_obs"),
        *[F.expr(e) for e in _rk_implicit_stat_exprs(k)],
    )
    a = s.join(F.broadcast(gram)).selectExpr(
        "user_id",
        "n_obs",
        *[f"g_{i}_{j} + c_{i}_{j} AS s_{i}_{j}" for i, j in _rk_pairs(k)],
        *[f"b_{i}" for i in range(k)],
    )
    p = a
    for lay in _rk_ldlt_layers(k, _ALS_LAMBDA, "p_"):
        p = p.selectExpr("*", *lay)
    p = p.select("user_id", *[f"p_{f}" for f in range(k)])
    dot = _rk_dot("p_", "q_", k)
    return jq.join(p, "user_id").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_users"),
        F.count("*").cast("bigint").alias("n_obs_pairs"),
        F.round(
            F.sum(r9(dot)).cast("double") / F.count("*"), 6
        ).alias("mean_pref_obs"),
        *[
            F.round(
                F.sum(r9(f"p_{f}")).cast("double") / F.count("*"), 6
            ).alias(f"mean_p{f}")
            for f in range(k)
        ],
    )


@query(
    "rec_als_rank_k_implicit",
    oracle=_rank_k_implicit_oracle(_ALS_K),
    tags=("pipeline", "recommendation", "als", "implicit-feedback",
          "rank-k"),
)
def rec_als_rank_k_implicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IMPLICIT-feedback (Hu-Koren-Volinsky) ALS user-step at
    PRODUCTION RANK (k=8, k-parametric) — completing the rank-k trilogy
    (user step, alternating round, implicit step): every observed
    interaction is preference 1 with confidence 1 + alpha*r, every
    unobserved pair preference 0 with confidence 1, and the naive
    users x catalog dense system collapses through the HKV identity
    A_u = Q^T Q + Q_u^T diag(alpha*r) Q_u + lambda I — the GLOBAL k x k
    Gram (one broadcast row, the 'all the zeros' term) plus a
    per-user correction over OBSERVED pairs only, so the step is
    O(observed), never O(users x items).  The solve is the same layered
    LDL^T rational text as the explicit rank-k step.

    Exactness: Gram, corrections and gradients all ride
    ROUND(.,9)->DECIMAL; the k=2 specialization is equality-pinned to
    the proven `rec_als_implicit_step` 2x2 adjugate in tests.

    Scale shape: one sufficient-statistics shuffle of k(k+1)/2 + k + 1
    values per user; the Gram is a single broadcast row (k x k doubles);
    item factors broadcast; solve and preference residuals map-side."""
    return _rank_k_implicit_step(spark, sf_dir, _ALS_K)
