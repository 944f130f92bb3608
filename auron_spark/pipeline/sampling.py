"""Deterministic sampling, splitting and shuffle-ordering for training-data
pipelines.

Beyond-reference capability (the reference engine has no sampling operators;
its role is filled by Spark's own `sample`, which is seed-dependent and NOT
reproducible across partitionings).  Every operator here keys off a content
hash of the row's stable id, so the result is a pure function of the data:

- identical across runs, cluster sizes, partition counts and engines (the
  DuckDB oracles compute the same assignment bit-for-bit);
- stable under incremental appends — adding documents never reassigns an
  existing document's sample/split/epoch position, the property that keeps
  train/test splits leak-free as a 100 TB corpus grows.

All assignments are map-side built-ins (md5 prefix → bigint, one digest per
row); nothing shuffles except the explicitly-aggregating queries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.registry import query
from auron_spark.tables import Tables

#: Salt so the sampling hash is independent of any content hash used elsewhere.
_SALT = "sample:"


def hash_bucket(id_col: Column, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from a stable id: 32-bit md5
    prefix of the salted id — identical in DuckDB via the same formula."""
    x = F.conv(
        F.substring(F.md5(F.concat(F.lit(_SALT), id_col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return x % n_buckets


def _sql_bucket(id_expr: str, n_buckets: int = 100) -> str:
    return (
        f"CAST('0x' || substr(md5('{_SALT}' || CAST({id_expr} AS VARCHAR)), 1, 8) "
        f"AS BIGINT) % {n_buckets}"
    )


@query(
    "sample_hash_fraction",
    oracle=f"""
    SELECT doc_id, source, n_chars
    FROM documents
    WHERE {_sql_bucket("doc_id")} < 10
    ORDER BY doc_id
    """,
    tags=("pipeline", "sampling"),
)
def sample_hash_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10% deterministic sample: bucket(doc_id) < 10.  Unlike df.sample(),
    the selection is a pure function of doc_id — reproducible anywhere and
    stable under appends.  Pure map-side filter; at 100 TB this is a scan
    with the predicate evaluated inline, no shuffle, no state."""
    t = Tables(spark, sf_dir)
    return (
        t.documents
        .filter(hash_bucket(F.col("doc_id")) < 10)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


@query(
    "split_train_val_test",
    oracle=f"""
    SELECT source, split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
        SELECT source, n_chars,
               CASE WHEN {_sql_bucket("doc_id")} < 80 THEN 'train'
                    WHEN {_sql_bucket("doc_id")} < 90 THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    )
    GROUP BY source, split
    ORDER BY source, split
    """,
    tags=("pipeline", "sampling", "split"),
)
def split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test assignment by hash bucket, summarized per
    source.  The assignment column is map-side; the only shuffle is the
    summary aggregate (which a real pipeline replaces with a partitioned
    write of the assigned rows)."""
    t = Tables(spark, sf_dir)
    b = hash_bucket(F.col("doc_id"))
    split = (
        F.when(b < 80, "train").when(b < 90, "val").otherwise("test").alias("split")
    )
    return (
        t.documents
        .select("source", "n_chars", split)
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("source", "split")
    )


@query(
    "sample_stratified_per_group",
    oracle=f"""
    SELECT source, doc_id, n_chars FROM (
        SELECT source, doc_id, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5('{_SALT}' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rn
        FROM documents
    ) WHERE rn <= 5
    ORDER BY source, doc_id
    """,
    tags=("pipeline", "sampling", "stratified"),
)
def sample_stratified_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five deterministic documents per source: rank by salted content hash
    within each group (an unbiased, reproducible draw), keep rank <= 5.
    Plans as WindowGroupLimit — partial top-k pruning BEFORE the shuffle, so
    each group moves at most k rows per input partition regardless of group
    size (pinned in test_plans.py)."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    h = F.md5(F.concat(F.lit(_SALT), F.col("doc_id").cast("string")))
    w = Window.partitionBy("source").orderBy(h, "doc_id")
    return (
        t.documents
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("source", "doc_id", "n_chars")
        .orderBy("source", "doc_id")
    )


@query(
    "shuffle_epoch_order",
    oracle=f"""
    SELECT doc_id, source
    FROM documents
    ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id
    LIMIT 100
    """,
    tags=("pipeline", "sampling", "shuffle-order"),
)
def shuffle_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training shuffle: order by md5(epoch || id).
    Each epoch seed is a fresh, reproducible permutation of the corpus.  The
    head-of-epoch LIMIT plans as TakeOrderedAndProject (per-partition top-k,
    no global sort); a full-epoch materialization would instead range-
    partition on the same key and sort within partitions."""
    t = Tables(spark, sf_dir)
    key = F.md5(F.concat(F.lit("epoch0:"), F.col("doc_id").cast("string")))
    return (
        t.documents
        .orderBy(key, "doc_id")
        .select("doc_id", "source")
        .limit(100)
    )


@query(
    "sample_mixture_weights",
    oracle=f"""
    WITH assigned AS (
        SELECT source, n_chars,
               {_sql_bucket("doc_id")} AS bucket,
               10 + (CAST(substr(source, 4) AS BIGINT) % 4) * 20 AS keep_pct
        FROM documents
    )
    SELECT source,
           MIN(keep_pct) AS keep_pct,
           COUNT(*) FILTER (WHERE bucket < keep_pct) AS n_kept,
           COUNT(*) AS n_total,
           CAST(SUM(n_chars) FILTER (WHERE bucket < keep_pct) AS BIGINT)
               AS kept_chars
    FROM assigned
    GROUP BY source
    ORDER BY source
    """,
    tags=("pipeline", "sampling", "mixture"),
)
def sample_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted mixture sampling — the data-mixing step of a training
    pipeline: each source gets its own keep rate (here 10/30/50/70% derived
    deterministically from the source id; in production a broadcast weights
    table from the mixture spec), applied through the same append-stable hash
    bucket as sample_hash_fraction.

    The per-row decision is map-side (hash + comparison against the row's own
    source rate) — at 100 TB this is a scan-with-predicate whose selectivity
    differs per source, no shuffle except the summary aggregate (a real run
    writes the kept rows partitioned by source instead).  Upsampling (rate >
    1) composes with shuffle_epoch_order by drawing per-epoch with different
    salts."""
    t = Tables(spark, sf_dir)
    bucket = hash_bucket(F.col("doc_id"))
    keep_pct = (
        F.lit(10) + (F.substring("source", 4, 10).cast("bigint") % 4) * F.lit(20)
    ).alias("keep_pct")
    assigned = t.documents.select("source", "n_chars", bucket.alias("bucket"), keep_pct)
    kept = F.col("bucket") < F.col("keep_pct")
    return (
        assigned.groupBy("source")
        .agg(
            F.min("keep_pct").alias("keep_pct"),
            F.count(F.when(kept, 1)).alias("n_kept"),
            F.count("*").alias("n_total"),
            F.sum(F.when(kept, F.col("n_chars"))).cast("bigint").alias("kept_chars"),
        )
        .orderBy("source")
    )


K_WEIGHTED = 200  # sample size for the weighted draw
_WSALT = "wsample:"  # independent of the bucket salt


@query(
    "sample_weighted_topk",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               ROUND(POWER(
                   (CAST('0x' || substr(md5('{_WSALT}' ||
                        CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 1)
                       / 4294967296.0,
                   1.0 / GREATEST(n_chars, 1)), 9) AS k
        FROM documents
    )
    SELECT doc_id, source, n_chars FROM (
        SELECT doc_id, source, n_chars,
               ROW_NUMBER() OVER (ORDER BY k DESC, doc_id) AS rn
        FROM keyed
    ) WHERE rn <= {K_WEIGHTED}
    ORDER BY doc_id
    """,
    tags=("pipeline", "sampling", "weighted"),
)
def sample_weighted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis-Spirakis
    exponential-keys method): each document draws key = u^(1/w) from a
    deterministic uniform u = (md5_32(salted doc_id)+1)/2^32 and weight
    w = n_chars (length-proportional — the 'sample by token count' mixture
    op); the K_WEIGHTED largest keys ARE a weight-proportional sample
    without replacement.  Like every sampler here, the draw is a pure
    function of doc_id: reproducible across engines/partitionings and
    append-stable (new docs can enter the sample but never re-key existing
    ones).

    Keys are rounded to 9 dp before ranking so Spark and DuckDB order
    identically despite pow() being non-correctly-rounded in general
    (sub-ulp divergence would need to cross a 1e-9 boundary to reorder;
    ties broken by doc_id).

    Scale shape: key assignment is map-side; selection is
    TakeOrderedAndProject (per-partition top-K heads merged once — no
    global sort, no full shuffle).  At 100 TB with K bounded this is a
    scan plus a K-row merge."""
    t = Tables(spark, sf_dir)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(_WSALT), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        + 1
    ) / F.lit(4294967296.0)
    key = F.round(
        F.pow(u, F.lit(1.0) / F.greatest(F.col("n_chars"), F.lit(1))), 9
    )
    return (
        t.documents.select("doc_id", "source", "n_chars", key.alias("k"))
        .orderBy(F.desc("k"), "doc_id")
        .limit(K_WEIGHTED)
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


@query(
    "split_group_integrity",
    oracle="""
    WITH g AS (
        SELECT source,
               CAST('0x' || substr(md5('grpsplit#' || source), 1, 8)
                    AS BIGINT) AS h
        FROM (SELECT DISTINCT source FROM documents)
    ),
    a AS (
        SELECT source,
               CASE WHEN h / 4294967296.0 < 0.8 THEN 'train'
                    WHEN h / 4294967296.0 < 0.9 THEN 'val'
                    ELSE 'test' END AS split
        FROM g
    ),
    d AS (
        SELECT doc.doc_id, doc.source, a.split
        FROM documents doc JOIN a ON a.source = doc.source
    ),
    leak AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_leaked FROM (
            SELECT source FROM d GROUP BY source
            HAVING COUNT(DISTINCT split) > 1)
    )
    SELECT d.split, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT d.source) AS BIGINT) AS n_groups,
           leak.n_leaked
    FROM d, leak
    GROUP BY d.split, leak.n_leaked
    ORDER BY d.split
    """,
    tags=("pipeline", "sampling", "split", "leakage"),
)
def split_group_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-integral train/val/test split — the leakage-safe variant of
    `split_train_val_test`: the split is a function of the GROUP key
    (source), not the row, so every document of a source lands in the
    same split.  Row-hash splits leak near-duplicate documents from one
    source across train and test, inflating eval; group-hash splits are
    how production pipelines split by domain / site / author.  Output is
    per-split sizes plus n_leaked — the count of groups straddling
    splits, structurally 0 here and the invariant a reviewer checks.

    Scale shape: the group table is distinct-keys-sized; assignment is a
    deterministic md5 bucket (append-stable: adding documents never
    reassigns an existing source); the doc-side join broadcasts the
    group assignment.  No corpus shuffle beyond the final per-split
    count."""
    t = Tables(spark, sf_dir)
    g = t.documents.select("source").distinct().select(
        "source",
        F.conv(
            F.substring(F.md5(F.concat(F.lit("grpsplit#"), F.col("source"))), 1, 8),
            16,
            10,
        ).cast("bigint").alias("h"),
    )
    a = g.select(
        "source",
        F.when(F.col("h") / 4294967296.0 < 0.8, "train")
        .when(F.col("h") / 4294967296.0 < 0.9, "val")
        .otherwise("test")
        .alias("split"),
    )
    d = t.documents.select("doc_id", "source").join(F.broadcast(a), "source")
    leak = (
        d.groupBy("source")
        .agg(F.count_distinct("split").alias("ns"))
        .agg(
            F.sum(F.when(F.col("ns") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_leaked")
        )
    )
    return (
        d.groupBy("split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.count_distinct("source").cast("bigint").alias("n_groups"),
        )
        .join(F.broadcast(leak))
        .select("split", "n_docs", "n_groups", "n_leaked")
        .orderBy("split")
    )


@query(
    "sample_temperature_mixture",
    oracle=f"""
    WITH counts AS (
        SELECT source, COUNT(*) AS n_docs,
               CAST(ROUND(sqrt(COUNT(*)), 6) AS DECIMAL(28,6)) AS w
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT CAST(SUM(w) AS DOUBLE) AS z,
               CAST(SUM(n_docs) AS DOUBLE) AS n_total
        FROM counts
    ),
    rates AS (
        SELECT c.source, c.n_docs,
               least(1.0, (0.5 * t.n_total) * (CAST(c.w AS DOUBLE) / t.z)
                          / c.n_docs) AS rate
        FROM counts c CROSS JOIN tot t
    )
    SELECT r.source,
           CAST(r.n_docs AS BIGINT) AS n_docs,
           CAST(ROUND(r.rate * 10000) AS BIGINT) AS threshold,
           CAST(COUNT(*) FILTER (
               WHERE {_sql_bucket("d.doc_id", 10000)}
                     < CAST(ROUND(r.rate * 10000) AS BIGINT)
           ) AS BIGINT) AS n_kept
    FROM documents d JOIN rates r ON r.source = d.source
    GROUP BY r.source, r.n_docs, r.rate
    ORDER BY r.source
    """,
    tags=("pipeline", "sampling", "mixture", "temperature"),
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain rebalancing (the multilingual-LM recipe:
    sample source s proportionally to n_s^alpha, alpha = 0.5 here, so
    small domains are upweighted relative to their raw share).  Target
    budget is half the corpus; per-source keep rates are capped at 1 and
    materialize as deterministic hash thresholds, so the selection is a
    pure function of doc_id — reproducible and append-stable like every
    sampler in this module.

    Exactness contract: alpha = 0.5 makes the weight sqrt(n) — IEEE
    guarantees sqrt is correctly rounded, unlike pow — and weights are
    6-dp-rounded DECIMALs summed exactly, so the normalizer is
    order-insensitive; the remaining rate arithmetic is deterministic
    double ops on identical operands in both engines.

    Scale shape: one count aggregate (|sources| rows), two scalar
    broadcasts, then a map-side threshold filter over the corpus and the
    per-source summary rollup.  At 100 TB the decision plane is a
    broadcast of |sources| thresholds; nothing else shuffles except the
    summary (a real run writes kept rows instead)."""
    t = Tables(spark, sf_dir)
    counts = t.documents.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.sqrt(F.count("*")), 6).cast("decimal(28,6)").alias("w"),
    )
    tot = counts.agg(
        F.sum("w").cast("double").alias("z"),
        F.sum("n_docs").cast("double").alias("n_total"),
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        F.least(
            F.lit(1.0),
            (0.5 * F.col("n_total"))
            * (F.col("w").cast("double") / F.col("z"))
            / F.col("n_docs"),
        ).alias("rate"),
    )
    thr = F.round(F.col("rate") * 10000).cast("bigint")
    return (
        t.documents.join(F.broadcast(rates), "source")
        .groupBy(
            "source",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            thr.alias("threshold"),
        )
        .agg(
            F.count(
                F.when(hash_bucket(F.col("doc_id"), 10000) < thr, 1)
            ).cast("bigint").alias("n_kept")
        )
        .orderBy("source")
    )


KCENTER_K = 4  # selected coreset size (unrolled in the SQL oracle)


def _sql_kc_dist(c: str) -> str:
    return (
        "list_sum(list_transform(range(1, 65), i -> "
        f"(CAST(e.embedding[i] AS DOUBLE) - {c}.ce[i]) * "
        f"(CAST(e.embedding[i] AS DOUBLE) - {c}.ce[i])))"
    )


def _sql_kc_round(r: int) -> str:
    """Round r (r >= 2): min distance to the r-1 already-selected centers,
    then the farthest point becomes selection r."""
    joins = " ".join(f"CROSS JOIN s{i} c{i}" for i in range(1, r))
    dists = ", ".join(_sql_kc_dist(f"c{i}") for i in range(1, r))
    dmin = f"least({dists})" if r > 2 else dists
    return f"""
    d{r} AS (
        SELECT e.vec_id, {dmin} AS d,
               list_transform(e.embedding, v -> CAST(v AS DOUBLE)) AS ce
        FROM embeddings e {joins}
    ),
    s{r} AS (
        SELECT vec_id, d, ce FROM d{r} ORDER BY d DESC, vec_id LIMIT 1
    )"""


@query(
    "sample_kcenter_coreset",
    oracle="WITH s1 AS (SELECT vec_id, 0.0 AS d, "
    "list_transform(embedding, v -> CAST(v AS DOUBLE)) AS ce "
    "FROM embeddings ORDER BY vec_id LIMIT 1),"
    + ",".join(_sql_kc_round(r) for r in range(2, KCENTER_K + 1))
    + f"""
    SELECT step, vec_id, ROUND(radius, 6) AS radius FROM (
        {" UNION ALL ".join(
            f"SELECT {r} AS step, vec_id, d AS radius FROM s{r}"
            for r in range(1, KCENTER_K + 1)
        )}
    )
    ORDER BY step
    """,
    tags=("pipeline", "sampling", "coreset", "kcenter", "iterative"),
)
def sample_kcenter_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez's farthest-point
    traversal — the data-selection primitive behind diversity-maximizing
    subset pickers and the 2-approximation to the k-center cover):
    start from the lowest vec_id, then KCENTER_K - 1 times add the point
    farthest from the current selection.  Output is (step, vec_id,
    radius) — radius being the chosen point's distance when selected, a
    non-increasing sequence that IS the coverage-radius curve.

    Scale shape: the selected set is model state (<= K rows) that folds
    into one broadcast row per round; the per-round scan computes each
    vector's min-distance-to-selection MAP-SIDE (array_min over the
    broadcast list) and the argmax is TakeOrderedAndProject — one corpus
    scan per round, zero corpus shuffles, the same posture as `_lloyd`
    but with no aggregation exchange at all.  Arithmetic: index-ordered
    double folds and order-insensitive min/least, so DuckDB's unrolled
    rounds are bit-identical.
    """
    t = Tables(spark, sf_dir)
    emb = t.embeddings.select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("e"),
    )

    def sqd(e, c):
        return F.aggregate(
            F.zip_with(e, c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    sel = emb.orderBy("vec_id").limit(1)
    out = sel.select(
        F.lit(1).alias("step"), "vec_id", F.lit(0.0).alias("radius")
    )
    selected = sel
    for r in range(2, KCENTER_K + 1):
        sels_row = selected.agg(
            F.collect_list(F.struct("vec_id", "e")).alias("sels")
        )
        scored = emb.join(F.broadcast(sels_row)).select(
            "vec_id",
            "e",
            F.array_min(
                F.transform("sels", lambda s: sqd(F.col("e"), s["e"]))
            ).alias("d"),
        )
        nxt = scored.orderBy(F.desc("d"), "vec_id").limit(1)
        out = out.unionAll(
            nxt.select(
                F.lit(r).alias("step"), "vec_id", F.round("d", 6).alias("radius")
            )
        )
        selected = selected.unionAll(nxt.select("vec_id", "e"))
    return out.orderBy("step")


@query(
    "sample_class_balance",
    oracle=f"""
    WITH kept AS (
        SELECT event_id, event_type, user_id
        FROM events
        WHERE event_type = 'purchase'
           OR (event_type IN ('view', 'click')
               AND {_sql_bucket("event_id")} < 10)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM kept
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("pipeline", "sampling", "class-balance"),
)
def sample_class_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-imbalance correction for training-data extraction (the CTR
    recipe): keep EVERY positive (purchase) and a deterministic 10%
    hash-sample of the dominant negatives (view/click), summarized per
    class.  The negative downsampling rate becomes the class weight at
    training time; keying the hash on event_id keeps the sample
    append-stable like every sampler in this module.

    Scale shape: a single scan with the keep decision as a map-side
    disjunctive predicate (pushed to the scan for the event_type leg),
    then the class rollup.  At 100 TB the kept rows stream straight to a
    partitioned write; no shuffle precedes the decision."""
    ev = Tables(spark, sf_dir).events
    keep = (F.col("event_type") == "purchase") | (
        F.col("event_type").isin("view", "click")
        & (hash_bucket(F.col("event_id")) < 10)
    )
    return (
        ev.where(keep)
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_kept"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
        .orderBy("event_type")
    )


@query(
    "split_kfold_assignment",
    oracle=f"""
    SELECT fold, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
        SELECT CAST({_sql_bucket("doc_id", 5)} AS INT) AS fold,
               source, n_chars
        FROM documents
    )
    GROUP BY fold, source
    ORDER BY fold, source
    """,
    tags=("pipeline", "sampling", "split", "kfold"),
)
def split_kfold_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-fold cross-validation assignment (k=5) by salted hash bucket,
    summarized per (fold, source) — the CV counterpart of
    split_train_val_test, with the same contracts: a pure function of
    doc_id, so folds are reproducible across runs/engines and stable
    under appends (new documents never reshuffle existing folds — the
    property that lets fold models be cached and only incrementally
    refreshed).  Per-source sizes expose fold balance at a glance.

    Scale shape: map-side assignment, one rollup; a real run writes the
    assignment column (or trains k models each reading 'fold <> i' —
    a map-side predicate on the same hash)."""
    docs = Tables(spark, sf_dir).documents
    return (
        docs.select(
            hash_bucket(F.col("doc_id"), 5).cast("int").alias("fold"),
            "source",
            "n_chars",
        )
        .groupBy("fold", "source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
        .orderBy("fold", "source")
    )


# Poisson(1) CDF cutoffs scaled to 1e6 (exact integer thresholds shared
# verbatim with the SQL oracle, so the draw is identical in both engines).
_POIS1_CUTS = (367879, 735758, 919698, 981011, 996340, 999405, 999916)


def _pois1_weight(u: Column) -> Column:
    """Inverse-CDF Poisson(1) draw from an integer uniform in [0, 1e6)."""
    w = F.lit(7)
    for k in reversed(range(len(_POIS1_CUTS))):
        w = F.when(u < _POIS1_CUTS[k], F.lit(k)).otherwise(w)
    return w


def _sql_pois1(u_expr: str) -> str:
    branches = "".join(
        f" WHEN {u_expr} < {c} THEN {k}"
        for k, c in enumerate(_POIS1_CUTS)
    )
    return f"CASE{branches} ELSE 7 END"


@query(
    "sample_poisson_bootstrap",
    oracle=f"""
    WITH draws AS (
        SELECT r.r, d.n_chars,
               {_sql_pois1(_sql_bucket("d.doc_id || ':' || r.r", 1_000_000))}
                   AS w
        FROM documents d CROSS JOIN (SELECT unnest(range(0, 5)) AS r) r
    )
    SELECT CAST(r AS BIGINT) AS replicate,
           CAST(SUM(w) AS BIGINT) AS n_effective,
           ROUND(CAST(SUM(w * n_chars) AS DOUBLE) / SUM(w), 6)
               AS mean_chars
    FROM draws
    GROUP BY r
    ORDER BY replicate
    """,
    tags=("pipeline", "sampling", "bootstrap", "uncertainty"),
)
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap (the streaming-scale bootstrap: each row draws an
    independent Poisson(1) replication weight per replicate instead of
    resampling n-of-n, so uncertainty estimation needs NO global
    coordination): five bootstrap replicates of the corpus mean document
    length, each a deterministic per-(doc, replicate) inverse-CDF draw
    from the salted md5 uniform — reproducible anywhere, append-stable,
    and identical in the oracle because the CDF cutoffs are shared
    integer constants.

    The spread across `mean_chars` replicates IS the bootstrap standard
    error of the mean — the cheap uncertainty a 100 TB metrics pipeline
    attaches to every aggregate.

    Scale shape: a constant ×5 broadcast row expansion, a map-side CASE
    draw, one partial/final aggregate at replicate grain.  No shuffle of
    corpus rows, no resampled copies materialized."""
    t = Tables(spark, sf_dir)
    reps = spark.range(5).select(F.col("id").alias("r"))
    u = hash_bucket(
        F.concat(F.col("doc_id").cast("string"), F.lit(":"),
                 F.col("r").cast("string")),
        1_000_000,
    )
    draws = (
        t.documents.select("doc_id", "n_chars")
        .join(F.broadcast(reps))
        .select("r", "n_chars", _pois1_weight(u).alias("w"))
    )
    return (
        draws.groupBy("r")
        .agg(
            F.sum("w").cast("bigint").alias("n_effective"),
            F.round(
                F.sum(F.col("w") * F.col("n_chars")).cast("double")
                / F.sum("w"),
                6,
            ).alias("mean_chars"),
        )
        .select(F.col("r").cast("bigint").alias("replicate"),
                "n_effective", "mean_chars")
        .orderBy("replicate")
    )


PACK_CONTEXT = 4096  # characters per packed context (stand-in for tokens)


@query(
    "pack_shelf_contexts",
    oracle=f"""
    WITH ordered AS (
        SELECT doc_id, n_chars,
               {_sql_bucket("doc_id", 32)} AS packer,
               SUM(n_chars) OVER (
                   PARTITION BY {_sql_bucket("doc_id", 32)}
                   ORDER BY n_chars DESC, doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM documents
        WHERE n_chars <= {PACK_CONTEXT}
    ),
    binned AS (
        SELECT packer, CAST((cum - 1) // {PACK_CONTEXT} AS BIGINT) AS shelf,
               n_chars
        FROM ordered
    ),
    shelves AS (
        SELECT packer, shelf, COUNT(*) AS n_docs, SUM(n_chars) AS fill
        FROM binned GROUP BY packer, shelf
    )
    SELECT CAST(packer AS BIGINT) AS packer,
           CAST(COUNT(*) AS BIGINT) AS n_shelves,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(fill) AS DOUBLE)
                 / (COUNT(*) * {PACK_CONTEXT}), 6) AS fill_ratio
    FROM shelves
    GROUP BY packer
    ORDER BY packer
    """,
    tags=("pipeline", "packing", "sequence", "context-window"),
)
def pack_shelf_contexts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing into fixed context windows by SHELF packing: docs
    are hash-assigned to 32 independent packers, each packer sorts its
    docs length-descending and cuts the running total into
    PACK_CONTEXT-char shelves (shelf = floor((cum-1)/C)) — the
    deterministic, window-expressible approximation of first-fit-
    decreasing a training-data pipeline actually runs (true FFD is
    sequentially stateful; the cumulative cut loses only the bin-level
    backfill).  Over-long docs are excluded (chunking is
    `text_chunk_windows`' job).  Output is the per-packer packing report:
    shelves used, docs packed, mean fill ratio.

    Scale shape: the hash-partitioned packers are the scale story — each
    shelf sort is a PARTITIONED window (no global sort), packers never
    communicate, and adding executors just adds packers.  Shuffle is one
    hash exchange of (doc_id, n_chars) pairs."""
    t = Tables(spark, sf_dir)
    from pyspark.sql import Window

    docs = t.documents.where(F.col("n_chars") <= PACK_CONTEXT).select(
        "doc_id", "n_chars", hash_bucket(F.col("doc_id"), 32).alias("packer")
    )
    w = (
        Window.partitionBy("packer")
        .orderBy(F.desc("n_chars"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    binned = docs.withColumn(
        "shelf",
        F.floor((F.sum("n_chars").over(w) - 1) / PACK_CONTEXT).cast("bigint"),
    )
    shelves = binned.groupBy("packer", "shelf").agg(
        F.count("*").alias("n_docs"), F.sum("n_chars").alias("fill")
    )
    return (
        shelves.groupBy("packer")
        .agg(
            F.count("*").cast("bigint").alias("n_shelves"),
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.round(
                F.sum("fill").cast("double")
                / (F.count("*") * PACK_CONTEXT),
                6,
            ).alias("fill_ratio"),
        )
        .select(F.col("packer").cast("bigint"), "n_shelves", "n_docs",
                "fill_ratio")
        .orderBy("packer")
    )


_EPOCH_CAP = 4.0  # max repeats of any one source (the standard repeat guard)


@query(
    "pipeline_mixture_epoch_plan",
    oracle="""
    WITH tok AS (
        SELECT source,
               COUNT(*) AS n_docs,
               SUM(len(string_split(lower(text), ' '))
                   - len(list_filter(string_split(lower(text), ' '),
                                     x -> x = ''))) AS n_tokens
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n_docs, n_tokens,
               CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE)), 6)
                    AS DECIMAL(28,6)) AS wt
        FROM tok
    ),
    tots AS (
        SELECT source, n_docs, n_tokens,
               CAST(wt AS DOUBLE) / CAST(SUM(wt) OVER () AS DOUBLE)
                   AS target_share,
               CAST(SUM(n_tokens) OVER () AS DOUBLE) AS total_tokens
        FROM w
    ),
    plan AS (
        SELECT source, n_docs, n_tokens,
               CAST(n_tokens AS DOUBLE) / total_tokens AS raw_share,
               target_share,
               LEAST(4.0, target_share * total_tokens / n_tokens) AS epochs
        FROM tots
    )
    SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(raw_share, 6) AS raw_share,
           ROUND(target_share, 6) AS target_share,
           ROUND(epochs, 6) AS epochs,
           CAST(ROUND(epochs * n_tokens) AS BIGINT) AS planned_tokens
    FROM plan
    ORDER BY source
    """,
    tags=("pipeline", "sampling", "mixture", "epochs", "planning"),
)
def pipeline_mixture_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture EPOCH plan: given per-source token counts and a
    temperature-0.5 target mixture (sqrt upweighting of small sources),
    the per-source repeat factor (epochs, capped at 4 — the standard
    repeat guard against memorizing small domains) and the planned token
    budget per source — the planning table a data-mixing run publishes
    BEFORE any sampling job executes, capstone of the mixture family
    (`sample_mixture_weights` applies per-row rates,
    `sample_temperature_mixture` materializes the kept set; this plans
    the token economy).

    Scale shape: one corpus scan aggregates token counts to |sources|
    rows; the mixture normalizer and total budget are windows over that
    tiny frame (single-subtree rule); everything else is row-local
    arithmetic on the plan rows.

    Exactness: token counts are exact integers (whitespace split,
    empties excluded); sqrt weights are 6-dp DECIMALs summed exactly
    (the `sample_temperature_mixture` device); shares and epochs are
    identical double trees, 6-dp at the edge."""
    from pyspark.sql import Window

    t = Tables(spark, sf_dir)
    toks = (
        t.documents.select(
            "source",
            F.size(
                F.filter(
                    F.split(F.lower("text"), " "), lambda x: x != ""
                )
            ).alias("ntok"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("ntok").alias("n_tokens"),
        )
        .withColumn(
            "wt",
            F.round(F.sqrt(F.col("n_tokens").cast("double")), 6).cast(
                "decimal(28,6)"
            ),
        )
    )
    w0 = Window.partitionBy()
    plan = (
        toks.withColumn(
            "target_share",
            F.col("wt").cast("double") / F.sum("wt").over(w0).cast("double"),
        )
        .withColumn(
            "total_tokens", F.sum("n_tokens").over(w0).cast("double")
        )
        .withColumn(
            "raw_share",
            F.col("n_tokens").cast("double") / F.col("total_tokens"),
        )
        .withColumn(
            "epochs",
            F.least(
                F.lit(_EPOCH_CAP),
                F.col("target_share")
                * F.col("total_tokens")
                / F.col("n_tokens"),
            ),
        )
    )
    return plan.select(
        "source",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.round("raw_share", 6).alias("raw_share"),
        F.round("target_share", 6).alias("target_share"),
        F.round("epochs", 6).alias("epochs"),
        F.round(F.col("epochs") * F.col("n_tokens"))
        .cast("bigint")
        .alias("planned_tokens"),
    ).orderBy("source")


_NEYMAN_BUDGET = 100  # total sample budget allocated across strata


@query(
    "sample_neyman_allocation",
    oracle=f"""
    WITH s AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_h,
               sqrt((CAST(SUM(n_chars * n_chars) AS DOUBLE)
                     - CAST(SUM(n_chars) AS DOUBLE) * SUM(n_chars)
                       / COUNT(*)) / COUNT(*)) AS sd_h
        FROM documents GROUP BY source
    ),
    t AS (
        SELECT source, n_h, sd_h,
               CAST(SUM(CAST(ROUND(n_h * sd_h, 9) AS DECIMAL(28,9)))
                    OVER () AS DOUBLE) AS z,
               CAST(SUM(n_h) OVER () AS DOUBLE) AS n_tot
        FROM s
    )
    SELECT source, n_h,
           ROUND(sd_h, 6) AS sd_chars,
           ROUND({_NEYMAN_BUDGET} * n_h / n_tot, 6) AS alloc_proportional,
           ROUND({_NEYMAN_BUDGET} * n_h * sd_h / z, 6) AS alloc_neyman
    FROM t
    ORDER BY source
    """,
    tags=("pipeline", "sampling", "stratified", "design"),
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling DESIGN: for a fixed eval budget, the optimal
    (Neyman) per-stratum allocation n_h ∝ N_h·σ_h against the naive
    proportional n_h ∝ N_h — high-variance sources earn more than their
    headcount share, which is how an eval set gets minimum-variance mean
    estimates for the same labeling budget.  Per-source σ of n_chars
    comes from exact integer power sums; the normalizer is an order-free
    decimal window sum.  The actual draw then rides the existing
    deterministic samplers (`sample_stratified_per_group` takes these
    counts as its per-stratum quota).

    Scale shape: one scan to per-stratum power sums (constant state),
    arithmetic on the 20-row strata frame — a design computation whose
    cost is independent of corpus size."""
    t = Tables(spark, sf_dir)
    s = t.parallel("documents", "doc_id").groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_h"),
        F.sqrt(
            (
                # Wide-DECIMAL power sum (ADVICE r12 #1): Spark's SUM over
                # long is non-ANSI modular and can silently wrap at corpus
                # scale, while the DuckDB oracle promotes SUM(BIGINT) to
                # exact HUGEINT — cast the squared term into DECIMAL first,
                # the posture the adjacent power-sum queries already use.
                F.sum(
                    (F.col("n_chars") * F.col("n_chars")).cast("decimal(28,0)")
                ).cast("double")
                - F.sum("n_chars").cast("double")
                * F.sum("n_chars")
                / F.count("*")
            )
            / F.count("*")
        ).alias("sd_h"),
    )
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    tt = s.select(
        "source",
        "n_h",
        "sd_h",
        F.sum(
            F.round(F.col("n_h") * F.col("sd_h"), 9).cast("decimal(28,9)")
        )
        .over(w_all)
        .cast("double")
        .alias("z"),
        F.sum("n_h").over(w_all).cast("double").alias("n_tot"),
    )
    return tt.select(
        "source",
        "n_h",
        F.round("sd_h", 6).alias("sd_chars"),
        F.round(_NEYMAN_BUDGET * F.col("n_h") / F.col("n_tot"), 6).alias(
            "alloc_proportional"
        ),
        F.round(
            _NEYMAN_BUDGET * F.col("n_h") * F.col("sd_h") / F.col("z"), 6
        ).alias("alloc_neyman"),
    ).orderBy("source")
