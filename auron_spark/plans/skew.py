"""Skew mitigation: salted joins.

At 100 TB a zipf-skewed join key (events.user_id in the fixtures) puts one
key's rows in one task.  Two levers:

1. AQE skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on by
   default in session.py) — handles sort-merge joins automatically.
2. Manual salting (this module) for the cases AQE cannot split (e.g.
   aggregations on the hot key, or joins AQE does not see as skewed): the
   fact side gets a deterministic salt in [0, n); the dimension side is
   exploded n×; the join key becomes (key, salt), spreading each hot key over
   n tasks.

The salt is derived from a stable row attribute (not rand()) so results are
reproducible and retries deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.registry import query
from auron_spark.tables import Tables


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_src: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `fact ⋈ dim` on `key`, salted `n_salts` ways.

    `salt_src` must be a deterministic fact-side column (e.g. a PK) — it is
    hashed into [0, n_salts).  The dimension is replicated n_salts× (explode),
    so keep it dimension-sized."""
    fact_s = fact.withColumn("_salt", F.pmod(F.hash(salt_src), F.lit(n_salts)))
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    joined = fact_s.join(dim_s, [key, "_salt"], how)
    return joined.drop("_salt")


@query(
    "skew_aqe_join",
    oracle="""
    WITH per_user AS (
        SELECT user_id, COUNT(*) AS n_events
        FROM events GROUP BY user_id
    )
    SELECT e.user_id,
           COUNT(*) AS n,
           MAX(p.n_events) AS user_events,
           CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e JOIN per_user p ON e.user_id = p.user_id
    WHERE e.user_id < 50
    GROUP BY e.user_id
    ORDER BY e.user_id
    """,
    tags=("join", "skew", "aqe"),
    bench=True,
)
def skew_aqe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AQE twin of skew_salted_join: a fact-fact shuffle join on the
    zipf-skewed events.user_id with NO manual salting — mitigation is left to
    AQE's runtime skew-join splitting (`skewJoin.enabled`, on in session.py),
    which subdivides oversized partitions after seeing real map-output sizes.
    `tests/test_plans.py::test_aqe_skew_join_split_triggers` proves the
    mechanism actually fires (skew=true on the SMJ) under production-shaped
    thresholds; this query keeps the same plan shape on the bench clock.

    100 TB: salting (manual, pre-planned) and AQE splitting (automatic,
    runtime) are the two levers SCALE.md documents; benching both twins keeps
    their relative cost visible round over round."""
    t = Tables(spark, sf_dir)
    ev = t.events
    per_user = ev.groupBy("user_id").agg(F.count("*").alias("n_events"))
    return (
        ev.join(per_user, "user_id")
        .where(F.col("user_id") < 50)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            F.max("n_events").alias("user_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("user_id")
    )


@query(
    "skew_salted_join",
    oracle="""
    WITH user_dim AS (
        SELECT user_id,
               CASE WHEN user_id < 10 THEN 'whale' ELSE 'regular' END AS tier
        FROM (SELECT DISTINCT user_id FROM events)
    )
    SELECT tier,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e JOIN user_dim d ON e.user_id = d.user_id
    GROUP BY tier
    ORDER BY tier
    """,
    tags=("join", "skew", "salting"),
    bench=True,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-skewed fact (events.user_id) joined to a user dimension through
    the salted-join helper — same answer as the plain join, hot keys spread
    over 8 tasks."""
    t = Tables(spark, sf_dir)
    ev = t.events
    user_dim = (
        ev.select("user_id")
        .distinct()
        .withColumn(
            "tier", F.when(F.col("user_id") < 10, "whale").otherwise("regular")
        )
    )
    joined = salted_join(ev, user_dim, "user_id", F.col("event_id"), n_salts=8)
    return (
        joined.groupBy("tier")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .orderBy("tier")
    )


@query(
    "skew_key_stats",
    oracle="""
    WITH c AS (
        SELECT o_custkey AS key, COUNT(*) AS n FROM orders GROUP BY o_custkey
    ),
    s AS (
        SELECT COUNT(*) AS n_keys, SUM(n) AS total, MAX(n) AS max_n,
               CAST(SUM(n) AS DOUBLE) / COUNT(*) AS avg_n
        FROM c
    )
    SELECT CAST(c.key AS BIGINT) AS key, CAST(c.n AS BIGINT) AS n,
           ROUND(c.n / CAST(s.total AS DOUBLE), 9) AS share,
           ROUND(s.max_n / s.avg_n, 6) AS skew_ratio
    FROM c, s
    ORDER BY c.n DESC, c.key
    LIMIT 10
    """,
    tags=("plans", "skew", "diagnostics"),
)
def skew_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profiler — the measurement that DECIDES between the
    repo's two skew mitigations (`skew_aqe_join`'s runtime splitting vs
    `skew_salted_join`'s explicit salting): top-10 heaviest keys with
    their share of the table and the global max/avg skew ratio.  Run it
    on a join key before shipping the join; a skew_ratio near 1 means
    leave AQE alone, a hot key with percent-level share means salt.

    Scale shape: one partial/final count aggregation (keys-sized state),
    a 1-row global stats frame broadcast back, TakeOrderedAndProject for
    the top-10 — no full sort, nothing corpus-sized on the wire."""
    t = Tables(spark, sf_dir)
    c = t.orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").alias("n")
    )
    s = c.agg(
        F.sum("n").alias("total"),
        F.max("n").alias("max_n"),
        (F.sum("n").cast("double") / F.count("*")).alias("avg_n"),
    )
    return (
        c.join(F.broadcast(s))
        .select(
            F.col("key").cast("bigint"),
            F.col("n").cast("bigint"),
            F.round(F.col("n") / F.col("total").cast("double"), 9).alias(
                "share"
            ),
            F.round(F.col("max_n") / F.col("avg_n"), 6).alias("skew_ratio"),
        )
        .orderBy(F.desc("n"), "key")
        .limit(10)
    )
