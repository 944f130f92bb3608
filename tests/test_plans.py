"""Physical-plan quality gates — the 100 TB posture, checked at sf0.01.

These mirror the reference's plan-stability goldens
(`dev/auron-it/.../PlanStabilityChecker.scala`) but assert *properties* rather
than exact plans: filters reach the parquet scan, scans prune columns,
dimensions broadcast, rank-filters use WindowGroupLimit, and repartition+agg
reuses one shuffle.  A regression in any of these is invisible at test scale
and catastrophic at 100 TB.
"""

from __future__ import annotations

import os

import pytest

from auron_spark.registry import load_all
from tests.conftest import SF_DIR

SPECS = load_all()


def _plan(spark, name: str, final: bool = False) -> str:
    df = SPECS[name].build(spark, SF_DIR)
    if final:
        df.collect()  # AQE: materialize so the final adaptive plan exists
    return df._jdf.queryExecution().executedPlan().toString()


def _explain(spark, name: str, mode: str = "codegen") -> str:
    df = SPECS[name].build(spark, SF_DIR)
    return spark._jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), mode
    )


def test_q1_filter_pushdown_and_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    # filter pushed to the scan
    assert "l_shipdate" in scan.split("DataFilters")[1]
    # column pruning: unused columns must not be read
    assert "l_orderkey" not in scan
    assert "l_partkey" not in scan
    # two-phase aggregation (map-side partial combine)
    assert "partial_sum" in plan


def test_scan_reads_only_needed_columns(spark):
    plan = _plan(spark, "scan_projection_pushdown")
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    cols = scan.split("]")[0].split("[", 1)[1]
    assert set(c.split("#")[0] for c in cols.split(",")) == {
        "l_quantity",
        "l_returnflag",
    }


@pytest.mark.parametrize(
    "name", ["join_broadcast", "q5_local_supplier_volume", "q10_returned_items"]
)
def test_dimension_joins_broadcast(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast join"


def test_q5_no_cartesian(spark):
    assert "CartesianProduct" not in _plan(spark, "q5_local_supplier_volume")


def test_topk_uses_window_group_limit(spark):
    plan = _plan(spark, "window_top_k_per_group")
    assert "WindowGroupLimit" in plan
    # both partial (pre-shuffle) and final pruning
    assert plan.count("WindowGroupLimit") >= 2


def test_take_ordered_not_global_sort(spark):
    plan = _plan(spark, "take_ordered_topk")
    assert "TakeOrderedAndProject" in plan


def test_repartition_agg_single_shuffle(spark):
    plan = _plan(spark, "exchange_repartition")
    # repartition(32, key) then groupBy(key): the aggregate must reuse the
    # exchange — exactly one hash-partitioning exchange in the plan
    n_hash_exchanges = sum(
        1 for l in plan.splitlines() if "Exchange hashpartitioning" in l
    )
    assert n_hash_exchanges == 1, plan


def test_semi_anti_plan_shapes(spark):
    semi = _plan(spark, "join_left_semi")
    anti = _plan(spark, "join_left_anti")
    assert "LeftSemi" in semi
    assert "LeftAnti" in anti


def test_null_aware_anti_join(spark):
    plan = _plan(spark, "join_null_aware_anti")
    # Catalyst plans NOT IN over a nullable build side as a BroadcastHashJoin
    # LeftAnti with the isNullAwareAntiJoin flag (trailing `true`) — the
    # reference's NAAJ special case
    assert "LeftAnti, BuildRight, true" in plan, plan


def test_existence_join_planned(spark):
    assert "ExistenceJoin" in _plan(spark, "join_existence")


def test_q1_wholestage_codegen(spark):
    # the scan→filter→project→partial-agg pipeline must be inside codegen
    assert "WholeStageCodegen" in _explain(spark, "q1_pricing_summary", "codegen")


def test_knn_broadcasts_queries(spark):
    plan = _plan(spark, "sim_knn_bruteforce")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the corpus side must NOT be exchanged for the join itself
    assert "CartesianProduct" not in plan
    # the broadcast query side is capped to a CONSTANT budget (not a corpus
    # fraction): the cap predicate must reach the query-side scan, bounding
    # the broadcast at any corpus size
    from auron_spark.pipeline.similarity import QUERY_BUDGET, QUERY_MOD

    assert f"LessThan(vec_id,{QUERY_MOD * QUERY_BUDGET})" in plan, plan


@pytest.mark.parametrize(
    "name", ["q7_volume_shipping", "q8_market_share", "q9_product_type_profit"]
)
def test_tpch_multiway_joins_broadcast_dims(spark, name):
    """Q7/Q8/Q9: every dimension leg broadcasts; no cartesian ever forms and
    the only hash exchanges are the fact-fact join + final aggregate."""
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan, f"{name} lost its broadcast joins"
    assert "CartesianProduct" not in plan
    n_hash_exchanges = sum(
        1 for l in plan.splitlines() if "Exchange hashpartitioning" in l
    )
    assert n_hash_exchanges <= 2, plan


def test_q21_self_joins_share_shuffle_key(spark):
    """Q21's lineitem self-joins (EXISTS + NOT EXISTS) are all keyed on
    l_orderkey — the plan must contain semi and anti joins and no cartesian."""
    plan = _plan(spark, "q21_waiting_supplier")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_ivf_probe_broadcasts(spark):
    """IVF search: the centroid table and the probe set broadcast; the corpus
    is only ever equi-joined on the cluster id (no cartesian against the
    corpus)."""
    plan = _plan(spark, "sim_knn_ivf")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_stats_single_pass_partial_agg(spark):
    """Moment sums must be one scan + two-phase hash aggregate — a single
    hash exchange of partial sums, never a second pass over the data."""
    plan = _plan(spark, "agg_stats_moments")
    assert "partial_sum" in plan
    n_scans = plan.count("FileScan parquet")
    assert n_scans == 1, plan
    n_hash_exchanges = sum(
        1 for l in plan.splitlines() if "Exchange hashpartitioning" in l
    )
    assert n_hash_exchanges == 1, plan


def test_bucketed_join_no_shuffle(spark, tmp_path_factory):
    """Co-located join via bucketing: both sides bucketed(8) on the join key →
    the join plans with ZERO exchanges.  This is the 100 TB lever for repeated
    fact⋈fact joins (pay one bucketed write, join shuffle-free forever after);
    the reference gets the same effect only through its shuffle machinery."""
    import pyspark.sql.functions as F

    from auron_spark.tables import table

    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    orders = table(spark, SF_DIR, "orders").select("o_orderkey", "o_orderpriority")
    for df, name, key in ((li, "li_bkt", "l_orderkey"), (orders, "o_bkt", "o_orderkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # external table path: the session's warehouse dir is static conf
        df.write.mode("overwrite").option("path", f"{warehouse}/{name}").bucketBy(
            8, key
        ).sortBy(key).saveAsTable(name)
    joined = (
        spark.table("li_bkt")
        .hint("merge")  # pin SMJ: broadcast would hide the co-location proof
        .join(spark.table("o_bkt"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    scan_to_join = plan.split("HashAggregate")[-1]  # below the agg: the join subtree
    assert "SortMergeJoin" in plan
    assert "Exchange" not in scan_to_join, plan
    # and the result is right
    got = {r["o_orderpriority"]: r["n"] for r in joined.collect()}
    want = {
        r["o_orderpriority"]: r["n"]
        for r in li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_coalesce_no_shuffle(spark):
    """coalesce(n) must narrow partitions without an exchange — the cheap
    way down in partition count (vs repartition's full shuffle)."""
    import pyspark.sql.functions as F

    from auron_spark.tables import table

    df = table(spark, SF_DIR, "lineitem").repartition(16).coalesce(2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Coalesce 2" in plan
    # exactly the one explicit repartition exchange, none added by coalesce
    assert plan.count("Exchange") == 1, plan
    assert df.rdd.getNumPartitions() == 2


def test_udaf_partial_merge_shuffles_states_only(spark):
    """Two-level UDAF (mapInPandas partial -> builtin merge): the exchange
    must carry merged partial states, not raw rows — i.e. the builtin merge
    agg itself is two-phase (partial_sum below the exchange) and there is
    exactly one hash exchange."""
    plan = _plan(spark, "udaf_partial_merge_stats")
    assert "MapInPandas" in plan, plan
    assert "partial_sum" in plan, plan
    n_hash_exchanges = sum(
        1 for l in plan.splitlines() if "Exchange hashpartitioning" in l
    )
    assert n_hash_exchanges == 1, plan


@pytest.mark.parametrize(
    "name,n_parses",
    [("json_parse_once", 1), ("fn_json", 1), ("fn_json_nested", 1)],
)
def test_json_single_parse(spark, name, n_parses):
    """Parse-once rewrite pinned in the plan: a multi-extraction query plans
    exactly ONE from_json of the JSON column (the reference rewrites N x
    get_json_object into parse-once + N cheap accesses; json_extract_paths is
    our equivalent)."""
    plan = _plan(spark, name)
    assert plan.count("from_json") == n_parses, plan


def test_runtime_bloom_filter_join_pruning(spark):
    """Runtime bloom-filter join pruning (reference agg/bloom_filter.rs +
    bloom_filter_might_contain.rs; Spark's InjectRuntimeFilter): a selective
    dim filter on one side of a shuffle join injects might_contain on the
    fact side, pruning shuffle input at scale.  Injection requires the fact
    scan to exceed a 10GB threshold AND the dim side to NOT be broadcastable
    (a broadcast join already prunes better) — i.e. it fires exactly in the
    100 TB regime.  Simulate that regime at test scale by zeroing the scan
    threshold and disabling broadcast, restore after."""
    import pyspark.sql.functions as F

    from auron_spark.tables import table

    scan_key = (
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    bcast_key = "spark.sql.autoBroadcastJoinThreshold"
    old_scan, old_bcast = spark.conf.get(scan_key), spark.conf.get(bcast_key)
    spark.conf.set(scan_key, "0")
    spark.conf.set(bcast_key, "-1")
    try:
        orders = table(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
        joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan, plan
    finally:
        spark.conf.set(scan_key, old_scan)
        spark.conf.set(bcast_key, old_bcast)


def test_object_hash_aggregate_sort_fallback(spark):
    """collect_list plans as ObjectHashAggregate; when the in-memory hash map
    exceeds the fallback threshold it switches to sort-based aggregation
    mid-execution — Spark's equivalent of the reference's partial-agg
    spill/skip behavior (agg_exec.rs:231-267, auron.partialAggSkipping.*).
    Results must be identical either way."""
    import pyspark.sql.functions as F

    from auron_spark.tables import table

    def run():
        df = (
            table(spark, SF_DIR, "orders")
            .groupBy("o_orderpriority")
            .agg(F.sort_array(F.collect_list("o_orderstatus")).alias("statuses"))
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ObjectHashAggregate" in plan, plan
        return {r["o_orderpriority"]: r["statuses"] for r in df.collect()}

    normal = run()
    key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    old = spark.conf.get(key)
    spark.conf.set(key, "1")  # force the sort-based fallback on every task
    try:
        assert run() == normal
    finally:
        spark.conf.set(key, old)


def test_stratified_sample_uses_window_group_limit(spark):
    """Per-group sampling must prune to k rows per partition BEFORE the
    shuffle (WindowGroupLimit partial + final), and the epoch-order head must
    be TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, "sample_stratified_per_group")
    assert plan.count("WindowGroupLimit") >= 2, plan
    plan2 = _plan(spark, "shuffle_epoch_order")
    assert "TakeOrderedAndProject" in plan2, plan2


def test_hash_sample_is_map_side(spark):
    """The deterministic sample is a pure scan+filter — zero exchanges."""
    plan = _plan(spark, "sample_hash_fraction")
    assert "Exchange hashpartitioning" not in plan, plan


def test_quantized_ann_no_cartesian(spark):
    """sim_quantize_int8 / sim_pq_codes: candidate scoring must be an
    equi-join (block key / broadcast codebook), never a cartesian product."""
    from auron_spark.pipeline.similarity import QUERY_CAP

    for name in ("sim_quantize_int8", "sim_pq_codes"):
        plan = _plan(spark, name)
        assert "CartesianProduct" not in plan, name
    # the PQ codebook is tiny and must broadcast
    assert "BroadcastHashJoin" in _plan(spark, "sim_pq_codes")
    # int8 NN: the query side is a CONSTANT-budget prefix, so scoring is
    # O(|queries| x block), never all-pairs-in-block — the cap predicate must
    # reach the query-side scan
    assert f"LessThan(vec_id,{QUERY_CAP})" in _plan(spark, "sim_quantize_int8")


def test_pq_adc_lut_is_capped(spark):
    """sim_pq_adc_topk: the per-query ADC lookup table broadcasts, so its
    query set must carry the constant QUERY_BUDGET cap — a corpus-fraction
    LUT would grow the broadcast linearly with scale."""
    from auron_spark.pipeline.similarity import QUERY_CAP

    plan = _plan(spark, "sim_pq_adc_topk")
    assert "CartesianProduct" not in plan
    assert f"LessThan(vec_id,{QUERY_CAP})" in plan, plan


def test_funnel_stages_join_on_user_id(spark):
    """Funnel: every join/agg keys on user_id — no cartesian, no broadcast
    of the (scale-growing) event stream on the probe side."""
    plan = _plan(spark, "funnel_view_click_purchase")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_aqe_skew_join_split_triggers(spark):
    """AQE skew-join splitting must actually FIRE, not just be enabled: a
    deliberately hot-keyed fact side (90% of events on one user_id) joined
    under skew-shaped thresholds ends with SortMergeJoin(skew=true) in the
    final adaptive plan.

    Two scale lessons encoded here: (1) splitting works at MAP-OUTPUT
    granularity, and the fixture parquet is a single row group = one map
    chunk, which AQE cannot split — so the fact side is spread over 16 map
    tasks first (at 100 TB there are always many mappers; a single giant
    unsplittable map output would be the same pathology); (2) thresholds are
    scaled down in proportion to the sf0.01 fixture so the *mechanism* is
    exercised — production keeps the defaults (256MB threshold)."""
    import pyspark.sql.functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1kb",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "512b",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
        hot = ev.repartition(16).select(
            F.when(F.col("event_id") % 10 != 0, 0)
            .otherwise(F.col("user_id"))
            .alias("user_id"),
            "value",
        )
        probe = ev.filter(F.col("event_id") % 50 == 0).select(
            "user_id", F.col("event_id").alias("probe_id")
        )
        df = hot.join(probe, "user_id").select(F.count("*").alias("n"))
        assert df.collect()[0].n > 0
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning(spark, tmp_path):
    """Dynamic partition pruning — the partition-level runtime filter that
    complements the bloom-filter row gate: a selective dim predicate must
    reach the partitioned fact scan as a dynamicpruning subquery, so at
    100 TB only the matching partition directories are listed and read.
    Static pruning (literal partition filter) is covered in test_sources."""
    import pyspark.sql.functions as F

    from auron_spark.sources import io
    from auron_spark.tables import table

    orders = table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_p")
    io.write_partitioned(orders, path, ["o_orderpriority"])
    fact = spark.read.parquet(path)
    dim = (
        orders.select("o_orderpriority")
        .distinct()
        .filter(F.col("o_orderpriority").startswith("1"))
    )
    j = fact.join(dim, "o_orderpriority").agg(F.count("*").alias("n"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    assert j.collect()[0].n > 0


def test_retrieval_broadcasts_vocab_and_stats(spark):
    """TF-IDF / BM25: the vocabulary DF table and the scalar stats row
    broadcast back onto the token stream — the corpus-sized side must never
    be the build side and no cartesian may form (the 1-row stats join is a
    broadcast nested loop by construction, which is fine)."""
    for name in ("tfidf_top_terms", "bm25_single_term"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan, name
        assert "CartesianProduct" not in plan, name
    # BM25's probe-term filter must land BEFORE the tf aggregate's exchange:
    # the filter appears under the scan, not after a shuffle
    bm25 = _plan(spark, "bm25_single_term")
    scan_lines = [l for l in bm25.splitlines() if "FileScan parquet" in l]
    assert scan_lines, bm25


def test_parquet_aggregate_pushdown(spark):
    """MIN/MAX/COUNT over a parquet scan push into the scan itself (answered
    from footer statistics — zero data pages read) under the v2 reader.
    session.py enables spark.sql.parquet.aggregatePushdown; this pins that
    the capability actually engages.  At 100 TB a COUNT(*)/MIN/MAX audit
    query is metadata-only I/O instead of a full-table scan."""
    import pyspark.sql.functions as F

    saved = spark.conf.get("spark.sql.sources.useV1SourceList", None)
    try:
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        agg = df.agg(
            F.count("*").alias("n"),
            F.min("o_orderkey").alias("mn"),
            F.max("o_orderkey").alias("mx"),
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation" in plan, plan
        row = agg.collect()[0]
        assert row.n > 0 and row.mn == 0
    finally:
        if saved is None:
            spark.conf.unset("spark.sql.sources.useV1SourceList")
        else:
            spark.conf.set("spark.sql.sources.useV1SourceList", saved)


def test_observation_metrics_single_pass(spark):
    """df.observe: pipeline health metrics (row counts, null rates, filter
    selectivity) collected as accumulators DURING the one real pass — the
    100 TB observability pattern; a separate metrics query would double the
    scan.  The metrics row must match a direct computation."""
    import pyspark.sql.functions as F
    from pyspark.sql import Observation

    from auron_spark.tables import table

    docs = table(spark, SF_DIR, "documents")
    obs = Observation("ingest_metrics")
    observed = docs.observe(
        obs,
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.count(F.when(F.col("n_chars") > 300, 1)).alias("n_long"),
    )
    n_kept = observed.filter(F.col("n_chars") > 300).count()  # the real job
    m = obs.get
    assert m["n_docs"] == docs.count()
    assert m["n_long"] == n_kept
    assert m["total_chars"] > 0


def test_aqe_coalesces_small_shuffle_partitions(spark):
    """AQE partition coalescing must actually fire: a small aggregate's 32
    shuffle partitions collapse into few post-shuffle tasks (AQEShuffleRead
    coalesced).  At 100 TB the same mechanism right-sizes every stage to
    advisoryPartitionSizeInBytes instead of the static shuffle.partitions."""
    import pyspark.sql.functions as F

    from auron_spark.tables import table

    agg = table(spark, SF_DIR, "orders").groupBy("o_orderpriority").count()
    agg.collect()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead coalesced" in plan, plan


def test_rebalance_hint_for_write_path(spark):
    """The write-path skew lever: REBALANCE(cols) produces even output tasks
    (AQE splits oversized and merges undersized partitions — unlike
    repartition(cols), which inherits the key skew).  Gate that the hint
    survives to the optimized plan; write_partitioned documents when to
    prefer it."""
    from auron_spark.tables import table

    df = table(spark, SF_DIR, "orders").hint("rebalance", "o_orderpriority")
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    assert "rebalance" in optimized.lower(), optimized


def test_zorder_layout_improves_both_dim_locality(spark):
    """The point of z-ordering: split the z-sorted table into 8 contiguous
    'files' and BOTH dimensions stay narrow within each file, so parquet
    min/max stats prune on either filter column.  A linear sort by `a`
    leaves dimension `b` spanning ~the full range in every file."""
    import pyspark.sql.functions as F
    from pyspark.sql.window import Window

    from auron_spark.plans.layout import zorder_key
    from auron_spark.tables import table

    part = table(spark, SF_DIR, "part")
    a = (F.col("p_partkey") % 1024).cast("long")
    b = (
        F.conv(F.substring(F.md5(F.col("p_partkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 1024
    )
    keyed = part.select(a.alias("a"), b.alias("b"), zorder_key(a, b).alias("zkey"))

    def mean_span(df, order_col):
        w = Window.orderBy(order_col, "a", "b")
        bucketed = df.withColumn("bucket", F.ntile(8).over(w))
        spans = (
            bucketed.groupBy("bucket")
            .agg(
                (F.max("a") - F.min("a")).alias("sa"),
                (F.max("b") - F.min("b")).alias("sb"),
            )
            .agg(F.avg("sa").alias("ma"), F.avg("sb").alias("mb"))
            .collect()[0]
        )
        return spans.ma, spans.mb

    za, zb = mean_span(keyed, "zkey")
    la, lb = mean_span(keyed, "a")
    # linear sort: a-spans tiny, b-spans ~full range.  z-order: both bounded.
    assert lb > 900, lb
    assert za < 700 and zb < 700, (za, zb)
    assert max(za, zb) < lb * 0.75


# test_no_cartesian_product_anywhere moved to tests/test_sweep_global.py
# (whole-registry sweep, its own partest worker — r15 rebalance).


def test_weighted_sample_zero_exchange(spark):
    """sample_weighted_topk's scale claim: scan + TakeOrderedAndProject,
    NO exchange — per-partition top-K heads merged once, never a full
    shuffle or global sort."""
    plan = _plan(spark, "sample_weighted_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan, plan


def test_canonical_selection_broadcasts_reps(spark):
    """dedup_canonical_selection's final doc->representative map must be a
    broadcast hash join (reps << corpus); a shuffled join here would
    re-exchange the whole corpus at 100 TB."""
    plan = _plan(spark, "dedup_canonical_selection")
    assert "BroadcastHashJoin" in plan, plan


def test_percentile_filter_single_window_exchange(spark):
    """text_quality_percentile_filter computes rank AND group size in one
    window pass: exactly one hashpartitioning exchange on source feeds the
    Window; the threshold join must broadcast."""
    plan = _plan(spark, "text_quality_percentile_filter")
    assert "BroadcastHashJoin" in plan, plan
    lines = plan.splitlines()
    win_idx = [i for i, l in enumerate(lines) if "Window [" in l]
    assert len(win_idx) == 2, plan  # count-over + row_number
    between = lines[min(win_idx) : max(win_idx) + 1]
    assert not any("Exchange" in l for l in between), plan  # one shared shuffle


def test_trained_ivf_probe_is_map_side(spark):
    """sim_knn_ivf_trained's probe selection (array_sort + slice over the
    broadcast codebook) must plan NO window function — probing that
    shuffles per query defeats the IVF contract."""
    plan = _plan(spark, "sim_knn_ivf_trained")
    # the only window COMPUTE allowed is the final per-query top-k re-rank
    # (WindowGroupLimit partial/final pruning nodes are the optimization we
    # want and don't count)
    n_windows = sum(1 for line in plan.splitlines() if "Window [" in line)
    assert n_windows == 1, plan
    assert "WindowGroupLimit" in plan, plan  # top-k pruned before the sort


def test_ivfpq_encode_is_map_side(spark):
    """sim_ivfpq_trained's corpus-side work — list assignment, residuals
    and PQ encoding — must all be map-side folds over broadcast state: the
    only windows allowed are the bounded serving stages (ADC shortlist and
    final top-k re-rank), never a per-(vec_id, sub) argmin shuffle of the
    corpus."""
    plan = _plan(spark, "sim_ivfpq_trained")
    n_windows = sum(1 for line in plan.splitlines() if "Window [" in line)
    assert n_windows == 2, plan
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_cdc_changelog_single_key_exchange(spark):
    """cdc_apply_changelog: the rank filter AND the per-key count must ride
    ONE hash exchange on the key (the count window has no ordering, so the
    rank window's partitioning satisfies it) — a second corpus exchange
    would double the cost of changelog compaction at scale."""
    plan = _plan(spark, "cdc_apply_changelog")
    n_hash = plan.count("Exchange hashpartitioning")
    assert n_hash == 1, plan


def test_scd2_single_window_pass(spark):
    """scd2_history: row_number and both leads must fold into ONE Window
    node over ONE hash exchange — the one-pass history build contract."""
    plan = _plan(spark, "scd2_history")
    n_windows = sum(1 for line in plan.splitlines() if "Window [" in line)
    assert n_windows == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_pit_lookup_is_keyed_equi_join(spark):
    """pit_lookup_join must plan an equi-join on the dimension key with the
    [valid_from, valid_to) range as a residual predicate — a nested-loop
    or cartesian plan here would make point-in-time lookups O(probes x
    history) at scale."""
    plan = _plan(spark, "pit_lookup_join")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    joins = [
        line
        for line in plan.splitlines()
        if "HashJoin" in line or "SortMergeJoin" in line
    ]
    assert any("user_id" in j for j in joins), plan


def test_bpe_train_vocab_sized_rounds(spark):
    """text_bpe_train's scale claims (r16 checkpointed shape): the
    trainer's state is cut at lazy checkpoints — the final plan unions
    three MATERIALIZED 1-row winners with ZERO FileScans (the corpus is
    scanned exactly once, inside the word-table checkpoint's lineage,
    instead of riding ReusedExchange through a 2^r-compounding plan) —
    and each round's composed plan selects its winner by
    TakeOrderedAndProject over the vocab-sized pair table (never a
    global sort), rides the 1-row merge broadcast as a
    BroadcastNestedLoopJoin (O(vocab) for a single-row build side) and
    starts from the checkpointed word table, not a corpus re-scan."""
    plan = _plan(spark, "text_bpe_train", final=True)
    assert "FileScan" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    from auron_spark.pipeline import bpe

    tops, words = bpe._train(spark, SF_DIR)
    assert len(tops) == bpe.BPE_MERGES
    round_plan = (
        bpe._top_pair(bpe._pair_support(words))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in round_plan, round_plan
    assert "BroadcastNestedLoopJoin" in round_plan, round_plan
    assert "CartesianProduct" not in round_plan, round_plan
    # lineage cut: the round reads materialized state, never the corpus
    assert "Scan parquet" not in round_plan, round_plan


def test_bpe_encode_map_side_corpus_pass(spark):
    """text_bpe_encode's corpus pass must be map-side: the trained merges
    reach the encode fold via a broadcast single row, and the only
    corpus-sized exchange is the final per-source aggregate's."""
    plan = _plan(spark, "text_bpe_encode", final=True)
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_temperature_mixture_broadcasts_rates(spark):
    """sample_temperature_mixture's decision plane (per-source thresholds)
    must broadcast — the corpus-side work is a map-side filter plus the
    summary rollup, never a shuffled join on source."""
    plan = _plan(spark, "sample_temperature_mixture")
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_word_entropy_two_level_aggregate(spark):
    """text_word_entropy is exactly the two-level count shape: one
    exchange on (doc_id, word), one on doc_id over the reduced counts —
    no window functions, no third corpus exchange."""
    plan = _plan(spark, "text_word_entropy")
    assert "Window" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan


def test_interval_overlap_is_binned_equi_join(spark):
    """join_interval_overlap must pair sessions via an EQUI-join on the
    hour bin with the overlap predicate as a residual — a cartesian or
    broadcast-nested-loop plan here is the O(n^2) interval join this
    operator exists to avoid."""
    plan = _plan(spark, "join_interval_overlap")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    joins = [
        line
        for line in plan.splitlines()
        if "HashJoin" in line or "SortMergeJoin" in line
    ]
    assert any("bin" in j for j in joins), plan


def test_semantic_dedup_blocked_pairs(spark):
    """sim_semantic_dedup's pair search must be an equi-join on the
    learned cluster id (quadratic only within a cluster), with the
    codebook reaching assignment via broadcast — a cartesian pair plan
    is the O(n^2) scan SemDeDup's clustering exists to avoid."""
    plan = _plan(spark, "sim_semantic_dedup")
    assert "CartesianProduct" not in plan, plan
    joins = [
        line
        for line in plan.splitlines()
        if "HashJoin" in line or "SortMergeJoin" in line
    ]
    assert any("cid" in j for j in joins), plan


def test_rrf_fusion_broadcast_queries(spark):
    """retrieval_rrf_fusion: the dense side must broadcast the |queries|
    probe vectors (BroadcastNestedLoopJoin over a bounded build side) and
    rank through WindowGroupLimit; no CartesianProduct may form."""
    plan = _plan(spark, "retrieval_rrf_fusion")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_split_leakage_map_side_labels(spark):
    """split_leakage_audit recomputes split labels map-side from the
    doc_id hash: the ONLY joins in the plan are the LSH band equi-join
    (and signature internals) — an assignment-table join would shuffle
    the corpus a second time for information the hash already carries."""
    plan = _plan(spark, "split_leakage_audit")
    assert "CartesianProduct" not in plan, plan
    joins = [
        line
        for line in plan.splitlines()
        if "SortMergeJoin" in line or "ShuffledHashJoin" in line
    ]
    assert all("band" in j for j in joins), plan


def test_attribution_keyed_range_join(spark):
    """attribution_linear_touch must match purchases to touches via an
    equi-join on user_id with the lookback as residual — nested-loop here
    would be O(purchases x touches) at scale."""
    plan = _plan(spark, "attribution_linear_touch")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    joins = [
        line
        for line in plan.splitlines()
        if "HashJoin" in line or "SortMergeJoin" in line
    ]
    assert any("user" in j for j in joins), plan


def test_ahash_dedup_banded_equi_join(spark):
    """mm_image_ahash_dedup: candidate pairs must come from the banded
    equi-join on (band_idx, band_val) — never an all-pairs plan — and the
    decode/hash stage must be Arrow-batched Python (MapInPandas), not a
    row-at-a-time UDF.  Since round 9 both stages are localCheckpoint-ed
    (the decode otherwise re-ran 4x), so the shapes are asserted on the
    factored pre-materialization builders and the no-all-pairs contract
    on the full serving plan."""
    from auron_spark.pipeline.multimodal import (
        ahash_hash_frame,
        ahash_pair_frame,
    )
    from auron_spark.tables import Tables

    t = Tables(spark, SF_DIR)
    hashes = ahash_hash_frame(t)
    hplan = hashes._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in hplan, hplan
    pplan = (
        ahash_pair_frame(hashes)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    joins = [
        line
        for line in pplan.splitlines()
        if "HashJoin" in line or "SortMergeJoin" in line
    ]
    assert any("band_idx" in j and "band_val" in j for j in joins), pplan
    for plan in (hplan, pplan, _plan(spark, "mm_image_ahash_dedup")):
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan


def test_containment_pairs_only_shingle_join(spark):
    """dedup_minhash_containment: intersection counting must join shingles
    for CANDIDATE pairs only (banded LSH upstream) — no cartesian, no
    nested loop against the shingle stream."""
    plan = _plan(spark, "dedup_minhash_containment")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_market_basket_keyed_self_join(spark):
    """market_basket_pairs: pair generation is a self-EQUI-join on the
    order key (fan-out bounded by basket size), per-part counts broadcast,
    and the top-20 goes through TakeOrderedAndProject."""
    plan = _plan(spark, "market_basket_pairs")
    assert "CartesianProduct" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    joins = [
        line
        for line in plan.splitlines()
        if "HashJoin" in line or "SortMergeJoin" in line
    ]
    assert any("ok" in j or "l_orderkey" in j for j in joins), plan


def test_mad_anomaly_windows_share_exchanges(spark):
    """anomaly_mad_events: each median pass is one window exchange on
    event_type (rank + count share it); the per-type med/MAD frames
    broadcast back — the corpus must never be re-exchanged for them."""
    plan = _plan(spark, "anomaly_mad_events")
    assert "CartesianProduct" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_gaps_islands_single_window_exchange(spark):
    """window_gaps_islands: the row_number window and both rollups must
    ride ONE hash exchange on user_id (the island grouping is a prefix
    re-key of the window partitioning)."""
    plan = _plan(spark, "window_gaps_islands")
    n_hash_exchanges = sum(
        1 for l in plan.splitlines() if "Exchange hashpartitioning" in l
    )
    assert n_hash_exchanges == 1, plan


def test_bigram_perplexity_keyed_model_joins(spark):
    """text_bigram_perplexity: the occurrence stream joins the bigram and
    context model tables by key (hash/merge equi-joins), the vocab scalar
    broadcasts, and no cartesian forms."""
    plan = _plan(spark, "text_bigram_perplexity")
    assert "CartesianProduct" not in plan, plan
    joins = [
        line
        for line in plan.splitlines()
        if "HashJoin" in line or "SortMergeJoin" in line
    ]
    assert any("w1" in j for j in joins), plan


def test_markov_single_corpus_window(spark):
    """events_markov_transitions: one lead() window exchange on user_id
    over the corpus; the row-normalization window runs on the tiny
    |types|^2 matrix AFTER aggregation, so it may not touch corpus-scale
    data (counts collapse first — partial_count must appear)."""
    plan = _plan(spark, "events_markov_transitions")
    assert "partial_count" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_rfm_windows_run_at_customer_grain(spark):
    """customer_rfm_segments: the three global ntiles are deliberate but
    must run at CUSTOMER grain — the orders fact table has to collapse
    through a partial/final hash aggregate before any window sees it."""
    plan = _plan(spark, "customer_rfm_segments")
    lines = plan.splitlines()
    first_window = min(i for i, l in enumerate(lines) if "Window" in l)
    # reading the plan bottom-up: the aggregate node must appear BELOW
    # (after, in toString order) the window nodes it feeds
    assert any("HashAggregate" in l for l in lines[first_window:]), plan
    assert "partial_sum" in plan, plan


def test_kcenter_zero_corpus_shuffles(spark):
    """sample_kcenter_coreset: every round is a map-side min-distance scan
    over the broadcast selection plus a TakeOrderedAndProject argmax — the
    plan may contain NO hash-partitioning exchange of the corpus at all."""
    plan = _plan(spark, "sample_kcenter_coreset")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_wav_segments_frames_from_arrow_stage(spark):
    """mm_wav_activity_segments: frame energies must enter the plan from
    an Arrow-batched MapInPandas stage, and the segmentation windows must
    partition by doc_id (no global single-partition window)."""
    plan = _plan(spark, "mm_wav_activity_segments")
    assert "MapInPandas" in plan, plan
    assert "CartesianProduct" not in plan, plan
    for line in plan.splitlines():
        if "Window [" in line:
            assert "doc_id" in line, line


def test_shot_detection_clip_local_window(spark):
    """mm_video_shot_detection: frame lumas come from an Arrow MapInPandas
    stage and the lag window partitions by clip (doc_id) — never global."""
    plan = _plan(spark, "mm_video_shot_detection")
    assert "MapInPandas" in plan, plan
    for line in plan.splitlines():
        if "Window [" in line:
            assert "doc_id" in line, line


def test_silhouette_map_side_scoring(spark):
    """sim_silhouette_simplified: scoring must be map-side over the
    broadcast codebook — the only window functions allowed are inside
    training's checkpointed lineage; the scoring stage itself plans no
    per-vector window and no cartesian."""
    plan = _plan(spark, "sim_silhouette_simplified")
    assert "CartesianProduct" not in plan, plan
    n_windows = sum(1 for l in plan.splitlines() if "Window [" in l)
    assert n_windows == 0, plan


def test_multimodal_curation_fuses_three_arrow_stages(spark):
    """pipeline_multimodal_curation: one plan must contain all three
    modality decode stages (image hash, audio framing, video luma — three
    distinct MapInPandas nodes) joined on the asset key, with no
    cartesian anywhere."""
    plan = _plan(spark, "pipeline_multimodal_curation")
    assert plan.count("MapInPandas") >= 3, plan
    assert "CartesianProduct" not in plan, plan


def test_hard_negatives_budgeted_broadcast(spark):
    """sim_hard_negatives: the query side must broadcast under the
    constant QUERY_BUDGET cap (pushed to its scan) and the per-query
    top-k must prune through WindowGroupLimit — the brute-force family's
    contract."""
    from auron_spark.pipeline.similarity import QUERY_BUDGET, QUERY_MOD

    plan = _plan(spark, "sim_hard_negatives")
    assert "CartesianProduct" not in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert f"LessThan(vec_id,{QUERY_MOD * QUERY_BUDGET})" in plan, plan


def test_behavior_similarity_probes_broadcast(spark):
    """user_behavior_similarity: the probe head must be a
    TakeOrderedAndProject that broadcasts; scoring is map-side over the
    streamed user table with WindowGroupLimit top-k."""
    plan = _plan(spark, "user_behavior_similarity")
    assert "TakeOrderedAndProject" in plan, plan
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_asof_nearest_no_pairwise_join(spark):
    """asof_join_nearest: both directions resolve via window passes over
    the union stream — the plan must contain NO join operator at all
    (the oracle uses range joins; the engine never does)."""
    plan = _plan(spark, "asof_join_nearest")
    assert "Join" not in plan, plan
    assert "Window" in plan, plan


def test_running_distinct_shares_user_exchange(spark):
    """window_running_distinct: the (user, type) first-seen window and
    the user running sum must share one corpus exchange (the pair
    partitioning extends the user partitioning)."""
    plan = _plan(spark, "window_running_distinct")
    n_hash_exchanges = sum(
        1 for l in plan.splitlines() if "Exchange hashpartitioning" in l
    )
    assert n_hash_exchanges <= 2, plan
    assert "CartesianProduct" not in plan, plan


def test_sweepline_window_at_date_grain(spark):
    """sweepline_open_orders: the global running sum must run AFTER the
    date-grain aggregation (partial_sum present below it) — the
    single-partition window is calendar-bounded by construction."""
    plan = _plan(spark, "sweepline_open_orders")
    assert "partial_sum" in plan or "partial_count" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ann_recall_report_bounded_overlap_join(spark):
    """sim_ann_recall_report: the tier-overlap join runs on top-k-sized
    inputs (both sides end in WindowGroupLimit pruning) — no cartesian,
    no corpus-scale join."""
    plan = _plan(spark, "sim_ann_recall_report")
    assert "CartesianProduct" not in plan, plan
    assert "WindowGroupLimit" in plan, plan


def test_dq_audit_single_scan(spark):
    """dq_audit_events: every assertion fuses into ONE scan of events —
    a second FileScan would mean the checks re-read the table."""
    plan = _plan(spark, "dq_audit_events")
    assert plan.count("FileScan parquet") == 1, plan


def test_pareto_windows_at_reduced_grain(spark):
    """pareto_revenue_share: the fact table must collapse to customer
    grain before the global ntile, and the cumulative window runs over
    the 10-row decile table — partial aggregation must appear below the
    first window."""
    plan = _plan(spark, "pareto_revenue_share")
    lines = plan.splitlines()
    first_window = min(i for i, l in enumerate(lines) if "Window" in l)
    assert any("HashAggregate" in l for l in lines[first_window:]), plan
    assert "partial_sum" in plan, plan


def test_time_to_convert_user_grain_first(spark):
    """funnel_time_to_convert: events must collapse to user grain
    (partial/final conditional-MIN aggregate) before the converter-grain
    ntile — the global window never sees event-scale data."""
    plan = _plan(spark, "funnel_time_to_convert")
    lines = plan.splitlines()
    first_window = min(i for i, l in enumerate(lines) if "Window" in l)
    assert any("HashAggregate" in l for l in lines[first_window:]), plan
    assert "partial_min" in plan, plan


def test_incremental_neardup_split_reaches_scans(spark):
    """dedup_incremental_neardup: the new/old split must reach the band
    sides as scan predicates (the corpus side is a persisted probe index
    at scale), and the pair join stays a band equi-join — no cartesian,
    no new x new pairing."""
    plan = _plan(spark, "dedup_incremental_neardup")
    assert "CartesianProduct" not in plan, plan
    from auron_spark.pipeline.dedup import INCR_BATCH_FROM

    assert f"GreaterThanOrEqual(doc_id,{INCR_BATCH_FROM})" in plan, plan
    assert f"LessThan(doc_id,{INCR_BATCH_FROM})" in plan, plan


def test_pq_distortion_broadcast_codebook(spark):
    """sim_pq_distortion_report: codeword scoring rides the broadcast
    codebook; the only window is the bounded per-(vec, sub) argmin."""
    plan = _plan(spark, "sim_pq_distortion_report")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_rolling_median_bounded_frame(spark):
    """window_rolling_median: one window exchange on event_type; the
    collected frame is bounded ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING
    (state O(frame), not O(stream))."""
    plan = _plan(spark, "window_rolling_median")
    n_hash_exchanges = sum(
        1 for l in plan.splitlines() if "Exchange hashpartitioning" in l
    )
    assert n_hash_exchanges == 1, plan
    assert "collect_list" in plan and "3" in plan, plan


def test_weighted_median_single_flag_exchange(spark):
    """agg_weighted_median: cumulative and total weights ride ONE window
    exchange per flag; the crossing filter + rollup reuse it."""
    plan = _plan(spark, "agg_weighted_median")
    n_hash_exchanges = sum(
        1 for l in plan.splitlines() if "Exchange hashpartitioning" in l
    )
    assert n_hash_exchanges == 1, plan


def test_class_balance_map_side_decision(spark):
    """sample_class_balance: the keep decision is a map-side predicate on
    one scan — no join, no window, no second pass."""
    plan = _plan(spark, "sample_class_balance")
    assert plan.count("FileScan parquet") == 1, plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan


def test_trend_decompose_month_grain_window(spark):
    """timeseries_trend_decompose: the fact table collapses to month
    grain before the calendar-bounded global window (partial aggregation
    below the window node)."""
    plan = _plan(spark, "timeseries_trend_decompose")
    lines = plan.splitlines()
    first_window = min(i for i, l in enumerate(lines) if "Window" in l)
    assert any("HashAggregate" in l for l in lines[first_window:]), plan
    assert "partial_sum" in plan, plan


def test_kfold_map_side_assignment(spark):
    """split_kfold_assignment: fold assignment is map-side (no join, no
    window); only the summary rollup shuffles."""
    plan = _plan(spark, "split_kfold_assignment")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert plan.count("FileScan parquet") == 1, plan


def test_dq_audit_lineitem_single_scan(spark):
    """dq_audit_lineitem: all assertions fuse into one FileScan."""
    plan = _plan(spark, "dq_audit_lineitem")
    assert plan.count("FileScan parquet") == 1, plan


def test_degree_distribution_banded_candidates(spark):
    """dedup_degree_distribution: candidates must come from the banded
    equi-join — no cartesian; output aggregations are pairs- then
    degree-sized."""
    plan = _plan(spark, "dedup_degree_distribution")
    assert "CartesianProduct" not in plan, plan


@pytest.mark.parametrize(
    "name",
    [
        "customer_rfm_segments_scale",
        "pareto_revenue_share_scale",
        "funnel_time_to_convert_scale",
        "customer_segment_migration_scale",
        # round 13: the DeLong AUC variance through the same device —
        # midranks collapse to the distinct-score grain, prefix sums via
        # distributed_running_sums (VERDICT r12 ask #3).
        "eval_auc_delong_ci_scale",
        # round 13: exact global median as a covered-rank lookup over
        # value-grain distributed prefix counts, and the generalized
        # multi-quantile interpolating form.
        "agg_median_distributed_scale",
        "agg_quantiles_distributed_scale",
    ],
)
def test_scale_ntile_no_single_partition_window(spark, name):
    """VERDICT r6 ask #5: the scale-safe ntile variants must never sort
    entity-grain data in one task.  Every Window node must partition by
    the range-partition id (`_pid`), and any `Exchange SinglePartition`
    that remains may feed only a scalar aggregate (keys=[], a
    #partitions->1-row rollup), never a Window or Sort."""
    plan = _plan(spark, name)
    lines = plan.splitlines()
    for line in lines:
        if "Window [" in line:
            assert "_pid" in line, line
    marker = ("WholeStageCodegen", "InputAdapter", "AQEShuffleRead",
              "ReusedExchange", "ShuffleQueryStage", "Project")
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            # walk up to the nearest real operator line (skipping codegen/
            # AQE wrapper nodes) — that parent must be a scalar aggregate
            j = i - 1
            while j >= 0 and (
                not lines[j].strip(" :+-*()")
                or any(m in lines[j] for m in marker)
            ):
                j -= 1
            assert j >= 0 and "HashAggregate(keys=[]" in lines[j], plan


def test_scale_ntile_matches_exact_twin(spark):
    """The distributed rank is bit-identical to the global-window ntile:
    every (_scale, exact) pair returns identical segment tables."""
    from tests.conftest import normalize

    for scale, exact in [
        ("customer_rfm_segments_scale", "customer_rfm_segments"),
        ("pareto_revenue_share_scale", "pareto_revenue_share"),
        ("funnel_time_to_convert_scale", "funnel_time_to_convert"),
        ("customer_segment_migration_scale", "customer_segment_migration"),
        ("eval_auc_delong_ci_scale", "eval_auc_delong_ci"),
    ]:
        got = normalize(SPECS[scale].build(spark, SF_DIR).toPandas())
        want = normalize(SPECS[exact].build(spark, SF_DIR).toPandas())
        assert got == want, f"{scale} != {exact}"


def test_ivfpq_serve_reads_artifact_not_trainer(spark):
    """sim_ivfpq_serve (VERDICT r6 ask #4): the serving plan must read the
    persisted parquet index — scans over artifacts/ivfpq — and contain NO
    training stages: no Lloyd rounds (posexplode of corpus dims) and no
    corpus encode (the codes come from disk, not an argmin over residuals).
    """
    plan = _plan(spark, "sim_ivfpq_serve")
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert any("artifacts/ivfpq" in s for s in scans), plan
    assert "posexplode" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_ivfpq_serve_equals_trained(spark):
    """The persisted-index serve path is bit-identical to the end-to-end
    inline trainer — train-once/serve-many changes cost, not results."""
    from tests.conftest import normalize

    got = normalize(SPECS["sim_ivfpq_serve"].build(spark, SF_DIR).toPandas())
    want = normalize(
        SPECS["sim_ivfpq_trained"].build(spark, SF_DIR).toPandas()
    )
    assert got == want


def test_window_group_limit_prunes_heaviest_skew_key(spark):
    """VERDICT r6 stretch #8: tie the skew profiler to the optimizer
    behavior it informs.  The zipf-skewed events table has a hot user_id
    (skew_key_stats' top row); a rank<=k filter over the full table must
    plan as WindowGroupLimit partial/final so the hot key's partition is
    pruned to k rows BEFORE the per-partition sort.  Gate: (a) the
    rewrite fires with the default threshold and disappears at
    threshold=-1; (b) both plans agree on the hot key's rows; (c) warm
    timing with pruning is not slower than without (1.5x slack for box
    noise — the win grows with the hot partition, which is the point)."""
    import time

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from auron_spark.tables import Tables

    ev = Tables(spark, SF_DIR).events
    hot = (
        ev.groupBy("user_id").count().orderBy(F.desc("count")).limit(1)
    ).collect()[0]["user_id"]

    def topk():
        w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
        return (
            ev.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= 3)
            .select("user_id", "event_id", "value")
        )

    key = "spark.sql.optimizer.windowGroupLimitThreshold"
    default = spark.conf.get(key)
    # Under partest (SPARK_GRAFT_TEST_SHARD set) the wall comparison below
    # is skipped, so don't pay for its six timed runs either — one run per
    # plan mode feeds the plan-shape and row-equality asserts.
    timed = os.environ.get("SPARK_GRAFT_TEST_SHARD") is None

    def run():
        df = topk()
        plan = df._jdf.queryExecution().executedPlan().toString()
        rows = sorted(
            (r.event_id, r.value)
            for r in df.filter(F.col("user_id") == hot).collect()
        )
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return plan, rows, time.perf_counter() - t0

    try:
        plan_on, rows_on, t_on1 = run()
        t_on2 = run()[2] if timed else t_on1  # warm
        t_on3 = run()[2] if timed else t_on1
        spark.conf.set(key, "-1")
        plan_off, rows_off, t_off1 = run()
        t_off2 = run()[2] if timed else t_off1  # warm
        t_off3 = run()[2] if timed else t_off1
    finally:
        spark.conf.set(key, default)

    assert "WindowGroupLimit" in plan_on, plan_on
    assert "WindowGroupLimit" not in plan_off, plan_off
    assert rows_on == rows_off and len(rows_on) == 3
    # min-of-three absorbs GC/JIT noise (both plans finish in ~100 ms at
    # this SF, so a single background-task hiccup is the same order as the
    # measurement); 3x margin keeps the gate a pruning-regression tripwire,
    # not a microbenchmark — the plan-shape asserts above are the real gate.
    # Under partest (SPARK_GRAFT_TEST_SHARD set) 10 concurrent JVMs share
    # the box and sub-second walls measure scheduler weather, not pruning:
    # the suite's ONLY timing assert was its only flake (VERDICT r13 #1),
    # so the wall comparison runs in serial/isolated sessions only.
    if timed:
        assert min(t_on1, t_on2, t_on3) <= min(t_off1, t_off2, t_off3) * 3.0, (
            t_on1, t_on2, t_on3, t_off1, t_off2, t_off3,
        )


def test_feature_encodings_broadcast_model(spark):
    """feature_target_encoding / feature_woe_iv: the category model must
    BROADCAST back onto the fact side (no shuffled join of orders against
    a 5-row frame), and the category aggregate must partial/final."""
    for name in ("feature_target_encoding", "feature_woe_iv"):
        plan = _plan(spark, name)
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
        assert "partial_sum" in plan or "partial_count" in plan, plan
        assert "SortMergeJoin" not in plan, plan


def test_rolling_active_collapses_before_explode(spark):
    """events_rolling_active: the x7 contribution explode must run on the
    (user, day) PRESENCE grain, after the distinct collapse — the plan
    must show the partial distinct aggregate below the Generate node."""
    plan = _plan(spark, "events_rolling_active")
    lines = plan.splitlines()
    gen = min(i for i, l in enumerate(lines) if "Generate explode" in l)
    assert any("HashAggregate" in l for l in lines[gen:]), plan
    assert "CartesianProduct" not in plan, plan


def test_locf_resample_partitioned_window_only(spark):
    """timeseries_locf_resample: the forward-fill window must partition by
    user_id — never a global ordered window — and the per-day aggregate
    must combine map-side."""
    plan = _plan(spark, "timeseries_locf_resample")
    for line in plan.splitlines():
        if "Window [" in line:
            assert "user_id" in line, line
    assert "partial_max" in plan, plan


def test_top_paths_uses_window_group_limit(spark):
    """events_top_paths: the first-3 filter must prune through
    WindowGroupLimit before the per-user sort; the top-10 must be
    TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, "events_top_paths")
    assert "WindowGroupLimit" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_topn_other_no_driver_vocabulary(spark):
    """pivot_topn_other_bucket: the bucket map must reach the fact table
    as a broadcast join (the top-N frame), with the category rank running
    at category grain — no shuffled join, no cartesian."""
    plan = _plan(spark, "pivot_topn_other_bucket")
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_dpp_prunes_partitions(spark):
    """scan_dpp_partitioned: the filtered month dim must reach the fact
    scan as a dynamicpruning PartitionFilter (broadcast reuse), and the
    EXECUTED scan must actually read only the 3 matching partition dirs —
    checked empirically by task counts (a plan-text-only gate would pass
    even if the runtime filter fell back to reading all ~80 dirs)."""
    df = SPECS["scan_dpp_partitioned"].build(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    fact_scan = next(
        l for l in plan.splitlines()
        if "FileScan parquet" in l and "orders_by_month" in l
    )
    assert "dynamicpruningexpression" in fact_scan, plan
    # empirical task-count gate: execution stages are named "collect at";
    # directory-listing jobs are named "parquet at" and may legitimately
    # run one task per partition dir.  A pruned fact scan launches 3 tasks
    # (one per surviving partition file); an unpruned one launches ~80.
    sc = spark.sparkContext
    st = sc.statusTracker()
    jobs_before = set(st.getJobIdsForGroup(None) or [])
    df.collect()
    st = sc.statusTracker()
    counts = []
    for j in set(st.getJobIdsForGroup(None) or []) - jobs_before:
        ji = st.getJobInfo(j)
        if ji is None:
            continue
        for sid in ji.stageIds:
            si = st.getStageInfo(sid)
            if si and "collect" in si.name:
                counts.append(si.numTasks)
    assert counts and max(counts) <= 3, counts
    assert 3 in counts, counts


def test_bloom_prefilter_builds_distributed_bitmap(spark):
    """dedup_bloom_prefilter: the bloom must build as a partial/final
    bit_or aggregate (commutative bitset state) and reach the batch as a
    broadcast; the exact-verify join must be an equi-join, not a
    cartesian.  Since round 9 the bitmap is localCheckpoint-ed (the 2 KB
    model state was otherwise re-derived by both probe branches), so the
    bit_or shape is asserted on the factored pre-materialization builder
    and the broadcast/no-cartesian contract on the serving plan."""
    from pyspark.sql import functions as F

    from auron_spark.pipeline.dedup import bloom_bitmap_row
    from auron_spark.tables import Tables

    corpus = (
        Tables(spark, SF_DIR).documents
        .where(F.col("doc_id") % 10 != 0)
        .select("text")
    )
    build = (
        bloom_bitmap_row(corpus)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "bit_or" in build, build
    assert "partial_bit_or" in build, build
    plan = _plan(spark, "dedup_bloom_prefilter")
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_lateral_topk_decorrelates(spark):
    """join_lateral_topk: Spark must decorrelate the LATERAL LIMIT into a
    keyed join + WindowGroupLimit — no nested loop over the outer side."""
    plan = _plan(spark, "join_lateral_topk")
    assert "WindowGroupLimit" in plan, plan
    assert "NestedLoop" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_late_cutoff_no_single_partition_window(spark):
    """VERDICT r7 ask #2: `stream_late_data_cutoff` must no longer run a
    running-max window over the whole events table in ONE task.  Same
    contract as the scale-ntile gate: every Window node partitions by the
    range-partition id (`_pid`), and any remaining `Exchange
    SinglePartition` may feed only a scalar aggregate (the final COUNT),
    never a Window or Sort."""
    plan = _plan(spark, "stream_late_data_cutoff")
    lines = plan.splitlines()
    assert any("Window [" in l for l in lines), plan
    for line in lines:
        if "Window [" in line:
            assert "_pid" in line, line
    marker = ("WholeStageCodegen", "InputAdapter", "AQEShuffleRead",
              "ReusedExchange", "ShuffleQueryStage", "Project")
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            j = i - 1
            while j >= 0 and (
                not lines[j].strip(" :+-*()")
                or any(m in lines[j] for m in marker)
            ):
                j -= 1
            assert j >= 0 and "HashAggregate(keys=[]" in lines[j], plan


def test_late_cutoff_matches_exact_twin(spark):
    """The distributed prefix-max count is identical to the naive global
    running-window count at fixture scale."""
    from auron_spark.streaming.ops import _late_data_cutoff_exact
    from tests.conftest import normalize

    got = normalize(
        SPECS["stream_late_data_cutoff"].build(spark, SF_DIR).toPandas()
    )
    want = normalize(_late_data_cutoff_exact(spark, SF_DIR).toPandas())
    assert got == want


@pytest.mark.parametrize(
    "name",
    [
        "join_set_similarity_prefix",
        "join_edit_distance_qgram",
        "dedup_simhash_hamming_pairs",
    ],
)
def test_exact_simjoin_no_quadratic(spark, name):
    """pipeline/simjoin.py: the exact similarity joins must get their
    candidates from equi-joins on prefix shingles / q-grams / band bytes —
    never a cartesian or nested loop — and the only global windows allowed
    are per-doc (partitioned)."""
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan or "join_edit" in name, plan
    for line in plan.splitlines():
        if "Window [" in line:
            assert "doc_id" in line, line


def test_edit_distance_short_band_broadcasts(spark):
    """The length<=5 safety band in join_edit_distance_qgram must reach
    the non-equi join as a broadcast (it is bounded), never a shuffled
    nested loop."""
    plan = _plan(spark, "join_edit_distance_qgram")
    if "NestedLoopJoin" in plan:
        assert "BroadcastNestedLoopJoin" in plan, plan


def test_countmin_constant_sketch_state(spark):
    """agg_countmin_frequency: the sketch build must be ONE partial/final
    aggregate to d*w counters (partial_count present), the probe join must
    broadcast the counter table, and nothing may go cartesian."""
    plan = _plan(spark, "agg_countmin_frequency")
    assert "partial_count" in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_hashing_trick_no_vocabulary_join(spark):
    """feature_hashing_trick: the whole vectorizer is map-side hash +
    one groupBy — NO join (a vocabulary join is exactly what the hashing
    trick exists to avoid) and no window."""
    plan = _plan(spark, "feature_hashing_trick")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan


def test_srm_scalar_aggregate_only(spark):
    """eval_ab_srm_check: assignment is map-side; after the per-user
    distinct the remaining plan is a scalar aggregate (keys=[]) — no join,
    no window."""
    plan = _plan(spark, "eval_ab_srm_check")
    assert "Join" not in plan, plan
    assert "HashAggregate(keys=[]" in plan, plan


def test_srp_lsh_mapside_buckets_no_cartesian(spark):
    """sim_knn_srp_lsh: bucket keys must be computed map-side (no join or
    shuffle before the candidate equi-join), the capped query side must
    broadcast, and nothing may go cartesian."""
    plan = _plan(spark, "sim_knn_srp_lsh")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastExchange" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_zone_map_skips_files(spark):
    """scan_zone_map_skipping: the 16-file range-clustered layout must
    exist, and the pruned scan must open <= 4 of the 16 files for the
    ~10%-of-keyspace band (checked empirically via input_file_name over
    the same pruned reader the query builds — file-level skipping is a
    metadata decision, so the gate counts files, not tasks)."""
    import os

    from auron_spark.plans.layout import ZONE_FILES, build_range_layout

    d = build_range_layout(spark, SF_DIR)
    all_files = [
        f for f in os.listdir(f"{d}/orders_by_range") if f.endswith(".parquet")
    ]
    assert len(all_files) == ZONE_FILES, all_files
    df = SPECS["scan_zone_map_skipping"].build(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the pruned FileScan must enumerate fewer paths than the full layout:
    # count distinct files actually read by re-deriving the pruned reader
    from pyspark.sql import functions as F

    zone = spark.read.parquet(f"{d}/zone_map")
    g = zone.agg(
        F.min("min_key").alias("gmin"), F.max("max_key").alias("gmax")
    ).collect()[0]
    lo = g["gmin"] + (g["gmax"] - g["gmin"]) * 5 // 100
    hi = g["gmin"] + (g["gmax"] - g["gmin"]) * 15 // 100
    pruned_files = [
        r["file"]
        for r in zone.where(
            (F.col("max_key") >= lo) & (F.col("min_key") <= hi)
        ).collect()
    ]
    assert 1 <= len(pruned_files) <= 4, pruned_files
    # and the final plan reads exactly the pruned files, residual intact
    assert "orders_by_range" in plan, plan


def test_pattern_regex_single_user_shuffle(spark):
    """events_pattern_regex: the sequence build is ONE user-grain
    aggregate; every pattern evaluation is a map-side projection on the
    collapsed string — no join, no window, no second data shuffle."""
    plan = _plan(spark, "events_pattern_regex")
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan


def test_recursive_spine_is_bounded_and_broadcast(spark):
    """sql_recursive_date_spine: the recursion must appear as a bounded
    UnionLoop/recursive node, and the spine side must BROADCAST into the
    join with the month-grain aggregate (never shuffle the fact to the
    spine)."""
    plan = _plan(spark, "sql_recursive_date_spine")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


@pytest.mark.parametrize(
    "name", ["eval_mannwhitney_u", "eval_ks_test", "eval_roc_auc"]
)
def test_nonparametric_tests_no_single_partition_window(spark, name):
    """The rank-based tests' global CDF/rank cumulatives run through
    `distributed_running_sums`: every Window partitions by `_pid`, and
    any remaining SinglePartition exchange feeds only a scalar aggregate
    (same policy walker as the scale-safe ntile family)."""
    plan = _plan(spark, name)
    lines = plan.splitlines()
    for line in lines:
        if "Window [" in line:
            assert "_pid" in line, line
    marker = ("WholeStageCodegen", "InputAdapter", "AQEShuffleRead",
              "ReusedExchange", "ShuffleQueryStage", "Project")
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            j = i - 1
            while j >= 0 and (
                not lines[j].strip(" :+-*()")
                or any(m in lines[j] for m in marker)
            ):
                j -= 1
            assert j >= 0 and "HashAggregate(keys=[]" in lines[j], plan


def test_distributed_running_sums_matches_global_window(spark):
    """`distributed_running_sums` is bit-identical to the naive
    single-partition running sum on the same value-grain input (the
    prefix-sum analog of `test_scale_ntile_matches_exact_twin`)."""
    from pyspark.sql import Window, functions as F

    from auron_spark.operators.window import distributed_running_sums
    from auron_spark.pipeline.evaluation import _value_grain

    vg = _value_grain(spark, SF_DIR)
    got = {
        r["value"]: (r["cum_n_v"], r["cum_na_v"])
        for r in distributed_running_sums(
            vg, ["value"], ["n_v", "na_v"]
        ).collect()
    }
    w = Window.orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        r["value"]: (r["c1"], r["c2"])
        for r in vg.select(
            "value",
            F.sum("n_v").over(w).cast("long").alias("c1"),
            F.sum("na_v").over(w).cast("long").alias("c2"),
        ).collect()
    }
    assert got == want


def test_bucketed_query_join_has_no_join_key_exchange(spark):
    """join_bucketed_colocated: both sides read bucketed layouts, so the
    forced SMJ must see NO hashpartitioning exchange on either join key —
    the shuffle was paid once at write time."""
    plan = _plan(spark, "join_bucketed_colocated")
    assert "SortMergeJoin" in plan, plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "c_custkey" not in line and "o_custkey" not in line, line


def test_heavy_hitters_candidates_broadcast_not_shuffled(spark):
    """agg_heavy_hitters_mg: the exact re-count pass must join the token
    stream against the BOUNDED candidate set via broadcast (the whole point
    — the vocabulary-sized shuffle of a plain groupBy is replaced by a
    |candidates|-key count).  r16: the mapInPandas summary pass is
    materialized once (checkpoint) because BOTH the candidate set and the
    sentinel N row consume it, so the FINAL plan reads the summaries as an
    ExistingRDD scan and touches parquet exactly ONCE (the exact re-count)
    — the query's corpus-pass floor of two, down from three."""
    plan = _plan(spark, "agg_heavy_hitters_mg", final=True)
    final_section = plan.split("== Initial Plan ==")[0]
    assert "Scan ExistingRDD" in final_section, plan
    assert final_section.count("FileScan parquet") == 1, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_abc_xyz_pareto_cumulative_is_distributed(spark):
    """parts_abc_xyz_matrix: the Pareto cumulative runs through
    `distributed_running_sums` — every Window partitions by `_pid`; any
    SinglePartition exchange feeds only a scalar aggregate (the ntile-family
    policy walker)."""
    plan = _plan(spark, "parts_abc_xyz_matrix")
    lines = plan.splitlines()
    for line in lines:
        if "Window [" in line:
            assert "_pid" in line, line
    marker = ("WholeStageCodegen", "InputAdapter", "AQEShuffleRead",
              "ReusedExchange", "ShuffleQueryStage", "Project")
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" in line:
            j = i - 1
            while j >= 0 and (
                not lines[j].strip(" :+-*()")
                or any(m in lines[j] for m in marker)
            ):
                j -= 1
            assert j >= 0 and "HashAggregate(keys=[]" in lines[j], plan


def test_geo_radius_join_is_equi_join(spark):
    """geo_radius_join: the 3x3 grid pruning must surface as a real
    equi-join on (cell_x, cell_y) — never a nested-loop / cartesian
    fallback, which is what an unpruned spatial join degrades to."""
    plan = _plan(spark, "geo_radius_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "cell_x" in plan and "cell_y" in plan


def test_kfold_cv_is_single_scan(spark):
    """eval_kfold_ols_oos trains and evaluates 5 models from ONE corpus
    pass: the plan must contain exactly one lineitem FileScan (the 5-row
    fold frame and its total re-aggregate reuse the same exchange)."""
    plan = _plan(spark, "eval_kfold_ols_oos")
    scans = [l for l in plan.splitlines() if "Scan parquet" in l]
    assert len(scans) == 1, plan


@pytest.mark.parametrize(
    "name,max_scans",
    [("dq_join_explosion_audit", 2), ("split_temporal_holdout", 1)],
)
def test_audit_queries_scan_each_fact_once(spark, name, max_scans):
    """The DQ/split audits follow the single-subtree rule: each fact is
    scanned exactly once (explosion audit: events + orders = 2 scans;
    temporal holdout: events = 1).  A crossJoin-of-scalar-aggregates
    formulation silently re-scans the corpus per output column."""
    plan = _plan(spark, name)
    scans = [l for l in plan.splitlines() if "Scan parquet" in l]
    assert len(scans) == max_scans, plan


@pytest.mark.parametrize(
    "name,n_scans",
    [
        # 0 = every reused frame is localCheckpoint-ed, so the compiled
        # plan references only in-memory relations (the corpus scan runs
        # exactly once, inside the checkpointed lineage).  Non-zero counts
        # are the query's inherent pass structure: IQR pays the exact-
        # quantile pass + the fence pass; HHI scans lineitem + part once
        # each; the funnel's remaining scan is the purchase-stage filter;
        # log-rank scans orders + customer once each.
        ("sim_mmr_diversify", 0),  # was 402 before the round-9 sweep
        ("events_markov_multistep", 0),  # was 2^3 = 8
        ("rec_user_item_serve", 0),  # was 16
        ("retrieval_eval_ndcg", 0),  # was 8
        ("retrieval_eval_map_mrr", 0),  # was 8
        ("market_basket_pairs", 0),  # was 4
        ("rec_item_cooccurrence", 0),  # was 4
        ("timeseries_acf", 0),  # was 5
        ("timeseries_snaive_backtest", 0),  # was 3
        ("dq_completeness_profile", 1),  # was 6
        ("dq_psi_drift", 1),  # was 4
        ("eval_survival_km", 1),  # was 4
        ("funnel_view_click_purchase", 1),  # was 6
        ("dq_iqr_outliers", 2),  # was 6
        ("parts_supplier_hhi", 2),  # was 4
        ("eval_survival_logrank", 2),  # was 6
        ("text_pmi_collocations", 0),  # was 5 (index frames checkpointed)
        ("text_kneser_ney_bigram", 0),  # was 4 (bigram TYPE table)
        ("text_bigram_perplexity", 2),  # was 4 (c1 derived FROM c2)
        ("dedup_bloom_prefilter", 1),  # was 5 (bitmap + verdicts pinned)
        ("mm_image_ahash_dedup", 0),  # was 5 (decode+hash index pinned)
        ("orders_cohort_ltv", 1),  # was 3 (acquisition dim pinned)
    ],
)
def test_single_subtree_scan_counts(spark, name, n_scans):
    """Round-9 plan-sweep regressions stay fixed: queries that re-derived
    a shared subtree (greedy loops nesting the un-materialized pool,
    unions of per-column aggregates, scalar totals re-aggregating the
    corpus) now compile to exactly their inherent number of parquet
    scans."""
    plan = _plan(spark, name)
    scans = [l for l in plan.splitlines() if "Scan parquet" in l]
    assert len(scans) == n_scans, f"{name}: {len(scans)} scans\n{plan}"


def test_bm25_serve_reads_index_with_partition_pruning(spark):
    """retrieval_bm25_serve: the serving plan must read the persisted
    inverted index (scans over artifacts/bm25) with the probe-term filter
    reaching the letter-PARTITIONED postings layout as a partition
    filter, and contain NO tokenization (no Generate/explode of the
    corpus) and NO corpus aggregate — serve cost is probe-sized."""
    plan = _plan(spark, "retrieval_bm25_serve")
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert any("artifacts/bm25" in s for s in scans), plan
    postings = next(s for s in scans if "postings" in s)
    assert "PartitionFilters: [" in postings and "tb#" in postings, postings
    assert "Generate" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bm25_serve_equals_inline(spark):
    """The persisted-index BM25 serve path returns exactly the inline
    bm25_single_term result — same statistics, now read from parquet."""
    from tests.conftest import normalize

    got = normalize(
        SPECS["retrieval_bm25_serve"].build(spark, SF_DIR).toPandas()
    )
    want = normalize(SPECS["bm25_single_term"].build(spark, SF_DIR).toPandas())
    assert got == want


# --- TPC-DS-shaped battery (operators/tpcds_shapes.py) -----------------------


_DS_NAMES = [
    "ds_rollup_margin_rank", "ds_channel_union_rollup", "ds_yoy_brand_delta",
    "ds_rollup_topk_brand", "ds_cross_period_customers",
    "ds_monthly_moving_avg", "ds_grouping_sets_mix", "ds_demand_variability",
    "ds_monthly_deviation_rank", "ds_cumulative_channel_share",
    "ds_segment_revenue_quartiles", "ds_repeat_purchase_pairs",
    "ds_best_customer_sales", "ds_rollup_topk_hierarchy",
]


@pytest.mark.parametrize("name", _DS_NAMES)
def test_ds_shapes_plan_hygiene(spark, name):
    """The TPC-DS-shaped battery must plan like its TPC-H siblings: no
    cartesian/nested-loop joins, every rollup/grouping-sets query goes
    through ONE Expand (not repeated scans per grouping set), and dims
    (part/customer/nation) broadcast under the size threshold."""
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    if name in ("ds_rollup_margin_rank", "ds_channel_union_rollup",
                "ds_rollup_topk_brand", "ds_grouping_sets_mix"):
        assert plan.count("Expand") == 1, plan
    if name in ("ds_rollup_margin_rank", "ds_yoy_brand_delta",
                "ds_rollup_topk_brand", "ds_demand_variability"):
        assert "BroadcastHashJoin" in plan, plan


def test_ds_topk_uses_window_group_limit(spark):
    """ds_rollup_topk_brand's rk <= 5 filter must plan as WindowGroupLimit
    (per-partition pruning before the rank sort materializes) — the same
    gate window_top_k_per_group carries."""
    plan = _plan(spark, "ds_rollup_topk_brand")
    assert "WindowGroupLimit" in plan, plan


def test_ds_cumulative_share_keeps_full_outer(spark):
    """ds_cumulative_channel_share's lead filter runs on the MAX-OVER
    carried values AFTER the window, so the FULL OUTER join on the date
    axis must SURVIVE in the plan — the round-10 review found the
    original formulation (WHERE cum_a > cum_b directly on the join
    output) was null-rejecting, letting the optimizer silently degrade
    the battery's one full-outer shape to an inner join."""
    plan = _plan(spark, "ds_cumulative_channel_share")
    assert "FullOuter" in plan, plan


def test_ds_margin_rank_partitions_by_parent(spark):
    """ds_rollup_margin_rank's rank must partition detail rows BY THEIR
    PARENT nation (TPC-DS Q36's CASE WHEN grouping = 0 THEN parent key) —
    the review found the CASE inverted (g_seg = 1), which collapsed every
    detail row into one global rank partition.  Gate on the semantics:
    each nation's best detail segment ranks 1, so there must be exactly
    as many rank-1 detail rows as nations."""
    from auron_spark.registry import load_all
    from tests.conftest import SF_DIR

    rows = load_all()["ds_rollup_margin_rank"].build(spark, SF_DIR).collect()
    detail = [r for r in rows if r.lochierarchy == 0]
    nations = {r.n_name for r in detail}
    rank1 = [r for r in detail if r.rank_within_parent == 1]
    assert len(rank1) == len(nations) > 1, (len(rank1), len(nations))
    # and the subtotal level ranks nations AGAINST EACH OTHER: exactly one
    # rank-1 row among the nation subtotals, not one per nation
    subtot = [r for r in rows if r.lochierarchy == 1]
    assert sum(1 for r in subtot if r.rank_within_parent == 1) == 1


def test_ds_channel_union_single_pass(spark):
    """ds_channel_union_rollup's three channel legs partition the priority
    domain of ONE table; the plan must stay a plan-level union of pushed-
    down filter scans — no join, no shuffle beyond the final aggregate's."""
    plan = _plan(spark, "ds_channel_union_rollup")
    assert "Join" not in plan, plan
    for line in plan.splitlines():
        if "Scan parquet" in line:
            assert "orders.parquet" in line, line


# --- TPC-DS battery: semantic invariants (ADVICE r10) ------------------------
#
# Every ds_* query runs ONE shared SQL text on both engines, so the DuckDB
# oracle proves engine parity only — a logic bug yields the same wrong answer
# twice (the round-10 review found exactly two such bugs).  These tests gate
# INTENT: each query's result is cross-checked against an INDEPENDENTLY
# WORDED DataFrame aggregate over the same fixtures, or against an internal
# consistency law the report must satisfy (subtotals reconcile to grand
# totals, ranks are dense per partition, cumulative series are monotone).


def _ds_rows(spark, name):
    return SPECS[name].build(spark, SF_DIR).collect()


def test_ds_channel_union_reconciles_to_orders(spark):
    """The three channel legs PARTITION orders by priority, so the rollup's
    grand-total row must equal an independently-worded full-table aggregate,
    and the channel subtotals must sum to it exactly."""
    import pyspark.sql.functions as F

    from auron_spark.exprs import dec2
    from auron_spark.tables import Tables

    rows = _ds_rows(spark, "ds_channel_union_rollup")
    ind = (
        Tables(spark, SF_DIR)
        .orders.agg(
            F.count("*").alias("n"),
            F.sum(dec2("o_totalprice")).cast("double").alias("rev"),
        )
        .collect()[0]
    )
    grand = [r for r in rows if r.g_channel == 1 and r.g_yr == 1]
    assert len(grand) == 1
    assert grand[0].n_orders == ind.n
    assert grand[0].revenue == ind.rev
    chan = [r for r in rows if r.g_channel == 0 and r.g_yr == 1]
    assert {r.channel for r in chan} == {"priority", "standard", "economy"}
    assert sum(r.n_orders for r in chan) == ind.n
    # year detail rows reconcile within each channel
    for c in chan:
        detail = [
            r for r in rows
            if r.g_yr == 0 and r.g_channel == 0 and r.channel == c.channel
        ]
        assert sum(r.n_orders for r in detail) == c.n_orders


def test_ds_yoy_delta_matches_independent_agg(spark):
    """Each (brand, yr) revenue equals an independently-worded DataFrame
    aggregate, prev_revenue is the SAME series shifted by one year, and
    yoy_delta is their difference."""
    import pyspark.sql.functions as F

    from auron_spark.exprs import disc_price
    from auron_spark.tables import Tables

    t = Tables(spark, SF_DIR)
    ind = {
        (r.p_brand, r.yr): r.rev
        for r in (
            t.lineitem.join(t.part, F.col("p_partkey") == F.col("l_partkey"))
            .filter(F.year("l_shipdate").between(1996, 1999))
            .groupBy("p_brand", F.year("l_shipdate").cast("bigint").alias("yr"))
            .agg(F.round(F.sum(disc_price()).cast("double"), 2).alias("rev"))
            .collect()
        )
    }
    rows = _ds_rows(spark, "ds_yoy_brand_delta")
    assert rows, "empty yoy report"
    for r in rows:
        assert r.revenue == ind[(r.p_brand, r.yr)], r
        # LAG gives the previous EXISTING year for the brand (not
        # necessarily yr-1 — a brand may skip a year in some fixture)
        prev_years = [y for b, y in ind if b == r.p_brand and y < r.yr]
        assert prev_years, r
        assert r.prev_revenue == ind[(r.p_brand, max(prev_years))], r
        # yoy_delta is rounded from the UNROUNDED difference, so it may sit
        # one cent off the difference of the two rounded revenues
        assert abs(r.yoy_delta - round(r.revenue - r.prev_revenue, 2)) <= 0.011


def test_ds_topk_ranks_dense_and_grand_total_exact(spark):
    """Per (g_brand, g_type) level: ranks start at 1, stay <= 5 and are
    dense up to ties (RANK ties at the 5-boundary may legitimately keep
    more than 5 rows); the grand-total level has exactly one row whose
    sales equal an independently-worded SUM over lineitem⋈part."""
    import pyspark.sql.functions as F

    from auron_spark.exprs import dec2
    from auron_spark.tables import Tables

    rows = _ds_rows(spark, "ds_rollup_topk_brand")
    by_level: dict[tuple, list] = {}
    for r in rows:
        by_level.setdefault((r.g_brand, r.g_type), []).append(r)
    assert set(by_level) == {(0, 0), (0, 1), (1, 1)}
    for level, rs in by_level.items():
        rks = sorted(r.rk for r in rs)
        assert rks[0] == 1 and rks[-1] <= 5, level
        # dense up to ties: every rank value <= its index position + 1
        assert all(rk <= i + 1 for i, rk in enumerate(rks)), level
    t = Tables(spark, SF_DIR)
    total = (
        t.lineitem.join(t.part, F.col("p_partkey") == F.col("l_partkey"))
        .agg(F.round(F.sum(dec2("l_extendedprice")).cast("double"), 2)
             .alias("s"))
        .collect()[0]
        .s
    )
    grand = by_level[(1, 1)]
    assert len(grand) == 1 and grand[0].sales == total
    # detail rank-1 row(s) carry the maximum independently-computed
    # (brand, type) sales
    best = (
        t.lineitem.join(t.part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.sum(dec2("l_extendedprice")).cast("double").alias("s"))
        .agg(F.round(F.max("s"), 2).alias("m"))
        .collect()[0]
        .m
    )
    assert max(r.sales for r in by_level[(0, 0)]) == best


def test_ds_cross_period_matches_independent_semi_join(spark):
    """Segment counts equal an independently-worded plan: per-customer
    distinct order years, kept iff {1996,1997,1998} ⊆ years — no INTERSECT
    involved."""
    import pyspark.sql.functions as F

    from auron_spark.tables import Tables

    t = Tables(spark, SF_DIR)
    active = (
        t.orders.filter(F.year("o_orderdate").isin(1996, 1997, 1998))
        .groupBy("o_custkey")
        .agg(F.countDistinct(F.year("o_orderdate")).alias("ny"))
        .filter(F.col("ny") == 3)
    )
    ind = {
        r.c_mktsegment: r.n
        for r in t.customer.join(
            active, F.col("o_custkey") == F.col("c_custkey")
        )
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rows = _ds_rows(spark, "ds_cross_period_customers")
    assert {r.segment: r.n_customers for r in rows} == ind
    assert sum(ind.values()) > 0


def test_ds_moving_avg_is_true_centered_mean(spark):
    """For every interior month of a brand, moving_avg equals the mean of
    the (prev, cur, next) revenues FROM THE OUTPUT ITSELF (the frame is
    over the report's own series), edges average 2 rows, and ratio is
    rev/mavg."""
    rows = _ds_rows(spark, "ds_monthly_moving_avg")
    by_brand: dict[str, list] = {}
    for r in rows:
        by_brand.setdefault(r.p_brand, []).append(r)
    checked = 0
    for series in by_brand.values():
        series.sort(key=lambda r: r.mon)
        for i, r in enumerate(series):
            lo, hi = max(0, i - 1), min(len(series), i + 2)
            frame = [series[j].revenue for j in range(lo, hi)]
            assert abs(r.moving_avg - round(sum(frame) / len(frame), 2)) \
                <= 0.011, r
            if r.moving_avg:
                assert abs(r.ratio - round(r.revenue / r.moving_avg, 6)) \
                    <= 1e-4, r
            checked += 1
    assert checked >= 100


def test_ds_grouping_sets_marginals_reconcile(spark):
    """All four grouping-set levels describe the SAME join result: the
    full-cross level, each single-dimension marginal, and the grand total
    must all sum n_orders to one independently-worded join count."""
    import pyspark.sql.functions as F

    from auron_spark.tables import Tables

    t = Tables(spark, SF_DIR)
    ind = (
        t.orders.join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .count()
    )
    rows = _ds_rows(spark, "ds_grouping_sets_mix")
    levels = {
        (0, 0): 0, (0, 1): 0, (1, 0): 0, (1, 1): 0,
    }
    for r in rows:
        levels[(r.g_seg, r.g_pri)] += r.n_orders
    assert all(v == ind for v in levels.values()), (levels, ind)


def test_ds_demand_variability_matches_numpy(spark):
    """Per-brand mean/variance/CV recomputed independently (numpy over the
    raw per-row quantities, textbook two-pass formula — no power sums)
    agree with the report to its own rounding."""
    import numpy as np
    import pyspark.sql.functions as F

    from auron_spark.tables import Tables

    t = Tables(spark, SF_DIR)
    raw: dict[str, list] = {}
    for r in (
        t.lineitem.join(t.part, F.col("p_partkey") == F.col("l_partkey"))
        .select("p_brand", "l_quantity")
        .collect()
    ):
        raw.setdefault(r.p_brand, []).append(float(r.l_quantity))
    rows = _ds_rows(spark, "ds_demand_variability")
    assert rows
    seen = set()
    for r in rows:
        q = np.array(raw[r.p_brand])
        assert r.n == len(q) >= 20
        assert abs(r.mean_qty - q.mean()) < 1e-6, r
        assert abs(r.var_qty - q.var(ddof=1)) < 1e-5, r
        assert abs(r.cv - q.std(ddof=1) / q.mean()) < 1e-6, r
        seen.add(r.p_brand)
    # the n >= 20 filter kept exactly the qualifying brands
    assert seen == {b for b, q in raw.items() if len(q) >= 20}


def test_ds_monthly_deviation_band_is_correct_filter(spark):
    """The deviation report keeps EXACTLY the months outside the ±30% band
    around the brand-year monthly mean, judged against an independently-
    worded aggregate of ALL months (not just the surviving ones)."""
    import pyspark.sql.functions as F

    from auron_spark.exprs import disc_price
    from auron_spark.tables import Tables

    t = Tables(spark, SF_DIR)
    monthly = [
        ((r.p_brand, r.yr, r.mo), r.rev)
        for r in (
            t.lineitem.join(t.part, F.col("p_partkey") == F.col("l_partkey"))
            .filter(F.year("l_shipdate").between(1996, 1998))
            .groupBy(
                "p_brand",
                F.year("l_shipdate").cast("bigint").alias("yr"),
                F.month("l_shipdate").cast("bigint").alias("mo"),
            )
            .agg(F.sum(disc_price()).cast("double").alias("rev"))
            .collect()
        )
    ]
    by_by: dict[tuple, dict] = {}
    for (b, y, m), rev in monthly:
        by_by.setdefault((b, y), {})[m] = rev
    expect = set()
    for (b, y), months in by_by.items():
        avg = sum(months.values()) / len(months)
        for m, rev in months.items():
            if abs(rev - avg) > 0.3 * avg:
                expect.add((b, y, m))
    got = {(r.p_brand, r.yr, r.mo) for r in
           _ds_rows(spark, "ds_monthly_deviation_rank")}
    assert got == expect and len(got) > 0


def test_ds_cumulative_share_monotone_and_bounded(spark):
    """Both carried cumulative series are nondecreasing over the report's
    date axis, every surviving row satisfies the lead predicate, and the
    final BUILDING cumulative never exceeds the independently-computed
    segment-year total (it EQUALS it iff the last lead-day is the year's
    last active day)."""
    import pyspark.sql.functions as F

    from auron_spark.exprs import dec2
    from auron_spark.tables import Tables

    rows = sorted(_ds_rows(spark, "ds_cumulative_channel_share"),
                  key=lambda r: r.d)
    assert rows
    prev_a, prev_b = float("-inf"), float("-inf")
    for r in rows:
        assert r.cum_building > (r.cum_machinery or 0.0), r
        assert r.cum_building >= prev_a
        prev_a = r.cum_building
        if r.cum_machinery is not None:
            assert r.cum_machinery >= prev_b
            prev_b = r.cum_machinery
    t = Tables(spark, SF_DIR)
    total_building = (
        t.orders.join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("c_mktsegment") == "BUILDING")
            & (F.year("o_orderdate") == 1997)
        )
        .agg(F.round(F.sum(dec2("o_totalprice")).cast("double"), 2)
             .alias("s"))
        .collect()[0]
        .s
    )
    assert rows[-1].cum_building <= total_building + 0.01


def test_ds_quartiles_balanced_and_reconcile(spark):
    """NTILE(4) law: within each segment the four quartile sizes differ by
    at most 1 and sum to the segment's independently-counted ordering
    customers; quartile revenues sum to the segment's total."""
    import pyspark.sql.functions as F

    from auron_spark.exprs import dec2
    from auron_spark.tables import Tables

    t = Tables(spark, SF_DIR)
    ind = {
        r.c_mktsegment: (r.n, r.rev)
        for r in (
            t.orders.join(t.customer, F.col("c_custkey") == F.col("o_custkey"))
            .groupBy("c_mktsegment")
            .agg(
                F.countDistinct("c_custkey").alias("n"),
                F.sum(dec2("o_totalprice")).cast("double").alias("rev"),
            )
            .collect()
        )
    }
    rows = _ds_rows(spark, "ds_segment_revenue_quartiles")
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r.segment, []).append(r)
    assert set(by_seg) == set(ind)
    for seg, rs in by_seg.items():
        assert sorted(r.quartile for r in rs) == [1, 2, 3, 4]
        sizes = [r.n_customers for r in rs]
        assert max(sizes) - min(sizes) <= 1, (seg, sizes)
        assert sum(sizes) == ind[seg][0]
        assert abs(sum(r.revenue for r in rs) - ind[seg][1]) < 1e-6


def test_ds_repeat_purchase_is_shuffle_fact_fact_join(spark):
    """ds_repeat_purchase_pairs's Q64-shape contract: the two period legs
    collapse to (cust, part) grain BEFORE the self-join (two pre-join
    HashAggregates), and that join is a key-partitioned shuffle join —
    never a cartesian/BNLJ.  (At fixture scale AQE may still broadcast
    one side; the gate accepts any EQUI join but the aggregate-before-
    join ordering is structural.)"""
    plan = _plan(spark, "ds_repeat_purchase_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert plan.count("HashAggregate") >= 4  # 2 legs x partial/final


def test_ds_repeat_purchase_matches_independent_build(spark):
    """Brand-level repeat-purchase counts equal an independently-worded
    DataFrame plan (per-year (cust,part) sets intersected in Python —
    no SQL join involved)."""
    import pyspark.sql.functions as F

    from auron_spark.tables import Tables

    t = Tables(spark, SF_DIR)
    fact = t.lineitem.join(
        t.orders, F.col("o_orderkey") == F.col("l_orderkey")
    )
    pairs = {}
    for yr in (1996, 1997):
        pairs[yr] = {
            (r.o_custkey, r.l_partkey)
            for r in fact.filter(F.year("o_orderdate") == yr)
            .select("o_custkey", "l_partkey")
            .distinct()
            .collect()
        }
    repeat = pairs[1996] & pairs[1997]
    brand = {
        r.l_partkey: r.p_brand
        for r in t.part.select(
            F.col("p_partkey").alias("l_partkey"), "p_brand"
        ).collect()
    }
    expect_pairs: dict[str, int] = {}
    expect_custs: dict[str, set] = {}
    for cust, pk in repeat:
        b = brand[pk]
        expect_pairs[b] = expect_pairs.get(b, 0) + 1
        expect_custs.setdefault(b, set()).add(cust)
    rows = _ds_rows(spark, "ds_repeat_purchase_pairs")
    assert {r.p_brand: r.n_repeat_pairs for r in rows} == expect_pairs
    assert {r.p_brand: r.n_repeat_customers for r in rows} == {
        b: len(s) for b, s in expect_custs.items()
    }
    assert sum(expect_pairs.values()) > 0


def test_ds_best_customers_matches_independent_build(spark):
    """The Q23 report equals an independently-worded composition: best
    customers / frequent parts computed as DataFrame aggregates and
    applied as Python-set membership on the 1997 fact rows."""
    import pyspark.sql.functions as F

    from auron_spark.exprs import dec2, disc_price
    from auron_spark.tables import Tables

    t = Tables(spark, SF_DIR)
    csales = (
        t.orders.groupBy("o_custkey")
        .agg(F.sum(dec2("o_totalprice")).cast("double").alias("c"))
        .collect()
    )
    cmax = max(r.c for r in csales)
    best = {r.o_custkey for r in csales if r.c > 0.5 * cmax}
    fact = t.lineitem.join(
        t.orders, F.col("o_orderkey") == F.col("l_orderkey")
    )
    freq = {
        r.l_partkey
        for r in fact.groupBy("l_partkey")
        .agg(F.countDistinct(F.to_date("o_orderdate")).alias("nd"))
        .filter(F.col("nd") >= 4)
        .collect()
    }
    per_mo: dict[int, list] = {}
    for r in (
        fact.filter(F.year("o_orderdate") == 1997)
        .select(
            F.month("o_orderdate").alias("mo"),
            "o_custkey",
            "l_partkey",
            disc_price().cast("double").alias("rev"),
        )
        .collect()
    ):
        if r.o_custkey in best and r.l_partkey in freq:
            per_mo.setdefault(r.mo, []).append(r.rev)
    rows = _ds_rows(spark, "ds_best_customer_sales")
    assert {r.mo: r.n_lineitems for r in rows} == {
        m: len(v) for m, v in per_mo.items()
    }
    for r in rows:
        assert abs(r.revenue - sum(per_mo[r.mo])) < 1e-4, r
    assert len(rows) > 0


def test_ds_topk_hierarchy_prunes_map_side(spark):
    """ds_rollup_topk_hierarchy's rank cutoff must reach BOTH WindowGroupLimit
    phases — Partial BEFORE the (level, parent) shuffle and Final after — so
    at scale each map task forwards at most k+ties rows per parent instead of
    the whole rollup output; the rollup itself must stay one Expand."""
    plan = _plan(spark, "ds_rollup_topk_hierarchy")
    assert plan.count("Expand") == 1, plan
    assert "WindowGroupLimit" in plan, plan
    assert ", 5, Partial" in plan and ", 5, Final" in plan, plan


def test_ds_topk_hierarchy_rank_laws_and_reconcile(spark):
    """Independently-worded gates for the Q67 chain (rollup x rank-within-
    parent x post-window rank filter):

    - parent partitions rebuilt from the OUTPUT rows obey the rank law:
      ranks are exactly 1..m (the full tie-break makes RANK collision-free)
      with m <= 5, and sales never increase as rank grows;
    - the filter genuinely cuts every stratum: level 2 keeps 5 of the 6
      p_type subtotals, level 1 keeps exactly 5 brands per surviving type;
    - the grand-total row equals an independently-built DataFrame aggregate,
      and each type's rank-1 brand subtotal equals that type's true maximum
      (type, brand) revenue computed without rollup or windows."""
    import pyspark.sql.functions as F

    from auron_spark.exprs import dec2, disc_price
    from auron_spark.tables import Tables

    rows = _ds_rows(spark, "ds_rollup_topk_hierarchy")
    assert {r.lochierarchy for r in rows} == {0, 1, 2, 3}

    def parent(r):
        if r.lochierarchy == 0:
            return (0, r.p_type, r.p_brand)
        if r.lochierarchy == 1:
            return (1, r.p_type, None)
        return (r.lochierarchy, None, None)

    parts: dict[tuple, list] = {}
    for r in rows:
        parts.setdefault(parent(r), []).append(r)
    for key, rs in parts.items():
        rs.sort(key=lambda r: r.rank_within_parent)
        assert [r.rank_within_parent for r in rs] == list(
            range(1, len(rs) + 1)
        ), key
        assert len(rs) <= 5, key
        sales = [r.sumsales for r in rs]
        assert sales == sorted(sales, reverse=True), key

    t = Tables(spark, SF_DIR)
    fact = (
        t.lineitem.join(t.orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(t.part, F.col("p_partkey") == F.col("l_partkey"))
        .select("p_type", "p_brand", disc_price().alias("net"))
    )
    n_types = t.part.select("p_type").distinct().count()
    lvl2 = [r for r in rows if r.lochierarchy == 2]
    assert n_types == 6 and len(lvl2) == 5  # the cutoff drops one type
    lvl1 = [r for r in rows if r.lochierarchy == 1]
    per_type: dict[str, int] = {}
    for r in lvl1:
        per_type[r.p_type] = per_type.get(r.p_type, 0) + 1
    assert set(per_type.values()) == {5}  # 5 of 25 brands kept per type

    grand = [r for r in rows if r.lochierarchy == 3]
    total = fact.agg(
        F.round(F.sum("net"), 2).cast("double").alias("s")
    ).collect()[0].s
    assert len(grand) == 1 and grand[0].sumsales == total

    best_by_type = {
        r.p_type: r.m
        for r in fact.groupBy("p_type", "p_brand")
        .agg(F.sum("net").alias("s"))
        .groupBy("p_type")
        .agg(F.round(F.max("s"), 2).cast("double").alias("m"))
        .collect()
    }
    for r in lvl1:
        if r.rank_within_parent == 1:
            assert r.sumsales == best_by_type[r.p_type], r


def test_logreg_newton_grain_reduction(spark):
    """feature_logreg_newton's 100 TB claim: the corpus collapses ONCE to
    the pinned contingency grain — the final plan aggregates the
    checkpointed grain RDD (no parquet re-scan per Newton iteration), and
    the only nested-loop join is the broadcast of the 1-row model frame."""
    plan = _plan(spark, "feature_logreg_newton")
    scans = [l for l in plan.splitlines() if "Scan parquet" in l]
    assert len(scans) == 0, plan  # grain pinned; corpus scan happens once
    assert "Scan ExistingRDD" in plan
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan


def test_agreement_tests_single_scan_map_side(spark):
    """eval_cohens_kappa / eval_mcnemar_test reduce map-side to a 2x2
    contingency per language: exactly one documents scan, partial
    aggregation before the exchange, and no join of any kind."""
    for name in ("eval_cohens_kappa", "eval_mcnemar_test"):
        plan = _plan(spark, name)
        scans = [l for l in plan.splitlines() if "Scan parquet" in l]
        assert len(scans) == 1, (name, plan)
        assert "Join" not in plan, (name, plan)
        assert "partial" in plan.lower(), (name, plan)


def test_perplexity_buckets_window_partitioned_by_source(spark):
    """text_perplexity_buckets' NTILE must be a per-source partitioned
    window (no global sort of the scored corpus): the Window operator's
    partition spec names `source`, and the plan carries no
    Exchange SinglePartition feeding a Window (the vocab scalar's single
    partition is an aggregate, not a sort)."""
    plan = _plan(spark, "text_perplexity_buckets")
    win_lines = [l for l in plan.splitlines() if "Window" in l and "ntile" in l]
    assert win_lines and all("source" in l for l in win_lines), plan
    assert "CartesianProduct" not in plan


def test_time_band_counts_single_scan(spark):
    """ds_time_band_counts (Q88 shape) folds 8 band counts into ONE events
    pass: exactly one scan, no join (the literal-SQL anti-pattern is 8
    cross-joined scalar subqueries = 8 scans)."""
    plan = _plan(spark, "ds_time_band_counts")
    scans = [l for l in plan.splitlines() if "Scan parquet" in l]
    assert len(scans) == 1, plan
    assert "Join" not in plan, plan


def test_changepoint_per_type_windows_partitioned(spark):
    """timeseries_changepoint_per_type's scale claim: every window
    partitions by event_type — NO single-partition exchange anywhere in
    the plan (the single-series twin documents this as the per-entity
    posture; here it is the plan)."""
    plan = _plan(spark, "timeseries_changepoint_per_type")
    assert "Exchange SinglePartition" not in plan, plan
    win_lines = [l for l in plan.splitlines() if "Window" in l]
    assert win_lines and all("event_type" in l for l in win_lines), plan


def test_sql_udf_inlines_into_codegen(spark):
    """sql_scalar_udf's SQL-language function must INLINE into the plan
    (no Python evaluation node — the body becomes Catalyst expressions,
    keeping codegen and pushdown) — the property that makes SQL UDFs the
    right packaging for scalar business logic at scale."""
    plan = _plan(spark, "sql_scalar_udf")
    assert "EvalPython" not in plan, plan
    assert "HashAggregate" in plan


def test_als_round_factor_joins_broadcast(spark):
    """rec_als_alternating_round: the item-factor attaches and the 1-row
    norm/model frames must all enter as broadcasts — no shuffle ever
    carries a factor matrix (items are the small side by construction,
    norms are scalars), and nothing degrades to a CartesianProduct."""
    plan = _plan(spark, "rec_als_alternating_round")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_als_implicit_gram_is_broadcast(spark):
    """rec_als_implicit_step: the catalog-grain Gram (the HKV trick's
    whole point) must reach the per-user frame as a broadcast 1-row
    join, never a shuffle or cartesian."""
    plan = _plan(spark, "rec_als_implicit_step")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastExchange" in plan, plan


def test_qgram_scaled_candidates_equi_join(spark):
    """join_edit_distance_qgram_scaled: the candidate generation must be
    a REAL equi-join on the bigram key (the pruning theorem's carrier) —
    the only nested-loop allowed is the bounded short-name broadcast
    sweep, and levenshtein must not appear below the candidate join
    (verify pays |candidates|, never |names|^2)."""
    plan = _plan(spark, "join_edit_distance_qgram_scaled")
    assert "CartesianProduct" not in plan, plan
    assert "bg" in plan, plan
    joins = [
        l for l in plan.splitlines()
        if ("SortMergeJoin" in l or "ShuffledHashJoin" in l
            or "BroadcastHashJoin" in l)
    ]
    assert any("bg" in l for l in joins), plan


def test_sql_table_udf_inlines_into_catalyst(spark):
    """sql_table_udf: the SQL table function must inline — no Python
    eval node anywhere, and the per-invocation top-k must compile to
    TakeOrderedAndProject over a pushed-filter scan (the function body's
    WHERE reaches the parquet scan)."""
    plan = _plan(spark, "sql_table_udf")
    assert "EvalPython" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "PushedFilters" in plan or "Filter" in plan, plan


def test_sequence_gaps_no_single_partition_window(spark):
    """dq_sequence_gaps_scale: the adjacent-difference must run in
    per-partition (_pid) windows with the seam handoff — never a global
    single-partition lag; the top-5 head must be TakeOrderedAndProject,
    not a global sort."""
    plan = _plan(spark, "dq_sequence_gaps_scale")
    for line in plan.splitlines():
        if "Window [" in line:
            assert "_pid" in line, line
    assert "TakeOrderedAndProject" in plan, plan


def test_frequent_items_best_customers_reuses_cte_exchanges(spark):
    """ds_frequent_items_best_customers (TPC-DS Q23 shape): cust_sales is
    referenced by BOTH the best-customers filter and its scalar-MAX
    subquery, and the channel union's two branches share the fact
    exchange and both key-list broadcasts — the multi-CTE reuse must
    surface as ReusedExchange nodes, the key lists must reach the fact
    as semi-joins, and there is no cartesian anywhere."""
    plan = _plan(spark, "ds_frequent_items_best_customers", final=True)
    assert plan.count("ReusedExchange") >= 3, plan
    assert plan.count("LeftSemi") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    # the month window and the disjoint priority bands push to the scans
    assert "1997-01-01" in plan, plan


def test_yoy_ratio_reuses_dim_exchange(spark):
    """ds_yoy_ratio_customers (TPC-DS Q4/Q11 shape): the four CTE
    probes are inlined (Spark inlines deterministic CTEs) with their
    disjoint (year, channel) quarters pushed below each aggregate, and
    the genuinely shared input — the customer dim broadcast — must
    surface as ReusedExchange on at least three of the four probes;
    the two-year window must push to the orders scans; growth ratios
    join as equi-joins on the customer grain, never cartesian."""
    plan = _plan(spark, "ds_yoy_ratio_customers", final=True)
    assert plan.count("ReusedExchange") >= 3, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "1996-01-01" in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_als_rank16_chained_jvm_solve(spark):
    """rec_als_rank16_chained: the k=16 chained-digest variant must keep
    the k=8 contract — broadcast factor attach, map-side partial Gram,
    and the ~48-layer LDL^T solve entirely in JVM expressions (no
    Python eval node, no cartesian)."""
    plan = _plan(spark, "rec_als_rank16_chained")
    assert "BroadcastHashJoin" in plan, plan
    assert "partial_sum" in plan, plan
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_inventory_shortfall_dim_before_fact_join(spark):
    """ds_inventory_shortfall (TPC-DS Q72 shape): the join-order
    lesson — the filtered part dim must collapse the demand side
    BELOW the item-keyed fact-fact join (no unfiltered fact-fact
    build), both fact legs must push their date windows to the scans,
    and the residuals ride the equi-join as post-match conditions
    (never a cartesian)."""
    import re

    plan = _plan(spark, "ds_inventory_shortfall")
    lines = plan.splitlines()
    fact_join = next(
        i for i, l in enumerate(lines)
        if re.search(r"Join \[item#\d+L?\], \[item#\d+L?\]", l)
    )
    part_join = next(
        i for i, l in enumerate(lines) if "], [p_partkey#" in l
    )
    assert part_join > fact_join, plan  # dim collapse below the item join
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "1996-01-01" in plan, plan  # date windows reach the scans
    assert "(p_size" in plan, plan  # dim filter pushed
    assert "TakeOrderedAndProject" in plan, plan


def test_spearman_global_no_single_partition_window(spark):
    """stats_spearman_global_scale: a truly GLOBAL rank with no
    single-partition stage — every Window in the plan must partition by
    the prefix device's _pid (the dq_sequence_gaps_scale contract), and
    the freq rank map must attach as a broadcast."""
    plan = _plan(spark, "stats_spearman_global_scale")
    for line in plan.splitlines():
        if "Window [" in line:
            assert "_pid" in line, line
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_gini_no_single_partition_window(spark):
    """stats_gini_concentration_scale: the global rank accumulation must
    ride the prefix device — every Window partitions by _pid, no global
    sort of the value grain, no Python."""
    plan = _plan(spark, "stats_gini_concentration_scale")
    for line in plan.splitlines():
        if "Window [" in line:
            assert "_pid" in line, line
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_conformal_coverage_class_partitioned(spark):
    """eval_conformal_coverage: the order-statistic window must
    partition by the priority class (never a global single-partition
    rank), the class model must attach as a broadcast, and nothing
    routes through Python."""
    plan = _plan(spark, "eval_conformal_coverage")
    for line in plan.splitlines():
        if "Window [" in line:
            assert "o_orderpriority" in line, line
    assert "BroadcastHashJoin" in plan, plan
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_jl_projection_map_side(spark):
    """feature_jl_projection: the projection itself is ONE higher-order
    expression per row — no explode (Generate), no Python eval; the
    only joins are the sampled-pair self-join and the 1-row count
    broadcast."""
    plan = _plan(spark, "feature_jl_projection")
    assert "Generate" not in plan, plan
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_jl_projection_sample_bounded(spark):
    """VERDICT r15 wrong #2 closed: the distortion-report sample must be
    a CONSTANT-size deterministic top-k — planned as
    TakeOrderedAndProject(limit=_JL_SAMPLE) (per-partition top-k, no
    global range-shuffle Sort) — so the pair stage is O(1)-bounded at
    any corpus size instead of O(n^2/400) on the r15 proportional
    sample."""
    from auron_spark.pipeline.features import _JL_SAMPLE

    assert _JL_SAMPLE <= 1024  # the bound the verdict asked to pin
    plan = _plan(spark, "feature_jl_projection")
    assert f"TakeOrderedAndProject(limit={_JL_SAMPLE}" in plan, plan
    # no global sort of the corpus anywhere (TakeOrdered replaces it)
    assert "rangepartitioning" not in plan.lower(), plan


def test_except_chain_set_op_joins(spark):
    """ds_except_chain_customers (TPC-DS Q87/Q38 shape): the EXCEPT
    chain must plan as distinct-aggregated LeftAnti joins and the
    INTERSECT triple as LeftSemi joins on the composite (cust, month)
    tuple — never a cartesian/BNLJ."""
    plan = _plan(spark, "ds_except_chain_customers")
    assert plan.count("LeftAnti") >= 2, plan
    assert plan.count("LeftSemi") >= 2, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "HashAggregate" in plan, plan  # the set-op distinct


def test_or_exists_double_existence_join(spark):
    """ds_or_exists_segments (TPC-DS Q10/Q35 shape): the anchor EXISTS
    must decorrelate to a LeftSemi and the DISJUNCT pair must plan as
    two ExistenceJoin marker columns (an OR'd EXISTS cannot be a plain
    semi join) filtered as exists#a OR exists#b — never a cartesian or
    a per-row subquery."""
    plan = _plan(spark, "ds_or_exists_segments")
    assert plan.count("ExistenceJoin") >= 2, plan
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "1996-01-01" in plan, plan  # anchor window pushed to its scan


def test_multi_supplier_unreturned_decorrelates(spark):
    """ds_multi_supplier_unreturned (TPC-DS Q95 shape): the EXISTS over
    the fact self-join must decorrelate to a semi join and the NOT
    EXISTS returns gate to an anti join — never a per-row subquery or a
    cartesian — with the six-month window pushed to the orders scan and
    the returnflag filter pushed to the returns leg."""
    plan = _plan(spark, "ds_multi_supplier_unreturned")
    assert "LeftSemi" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "1996-01-01" in plan, plan
    assert "EqualTo(l_returnflag,R)" in plan, plan


def test_inventory_cv_pairs_single_fact_reduce(spark):
    """ds_inventory_cv_pairs (TPC-DS Q39 shape): the variance statistics
    must reduce the fact ONCE behind a partial/final aggregate (the
    consecutive-month pairing then joins two rows of the same bounded
    grain), with the year window pushed to the scan and no engine-native
    stddev anywhere (the exact power-sum contract)."""
    plan = _plan(spark, "ds_inventory_cv_pairs")
    assert "partial_sum" in plan, plan
    assert plan.count("FileScan parquet") <= 2, plan  # one logical reduce
    assert "stddev" not in plan.lower(), plan
    assert "CartesianProduct" not in plan, plan
    assert "1996-01-01" in plan, plan


def test_als_rank_k_broadcast_and_jvm_solve(spark):
    """rec_als_rank_k: the item-factor attach must broadcast (items <<
    users), the Gram/gradient reduction must combine map-side
    (partial_sum), and the unrolled LDL^T solve must stay JVM-side —
    no Python eval node, no cartesian, no sort-merge join of the
    factor attach."""
    plan = _plan(spark, "rec_als_rank_k")
    assert "BroadcastHashJoin" in plan, plan
    assert "partial_sum" in plan, plan
    assert "EvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_cumulative_crossover_partitioned_windows_only(spark):
    """ds_cumulative_crossover (TPC-DS Q51 shape): all four windows
    (two cumulatives, two forward fills) must partition by item — never
    a global ordered window — the channel full-outer join must be an
    equi-join (SMJ/SHJ, no BNLJ/cartesian), and the top-20 must be
    TakeOrderedAndProject, not a global sort."""
    plan = _plan(spark, "ds_cumulative_crossover")
    for line in plan.splitlines():
        if "Window [" in line:
            assert "item" in line, line
    assert "FullOuter" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan


def test_cross_channel_intersect_semi_joins(spark):
    """ds_cross_channel_intersect (TPC-DS Q14 shape): the INTERSECT must
    compile to distinct + LeftSemi equi-joins (never a cartesian or
    nested-loop), the cross_items key-list must reach the union as a
    semi-join, the disjoint priority filters must push to the scans, and
    the top-30 must be TakeOrderedAndProject."""
    plan = _plan(spark, "ds_cross_channel_intersect", final=True)
    assert plan.count("LeftSemi") >= 3, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "1-URGENT" in plan, plan


def test_return_ratio_ranks_window_group_limit(spark):
    """ds_return_ratio_ranks (TPC-DS Q49 shape): the rank<=10 filter
    must prune through WindowGroupLimit below the channel-partitioned
    window (never a global window), and the date filter must push to
    the orders scan."""
    plan = _plan(spark, "ds_return_ratio_ranks")
    assert "WindowGroupLimit" in plan, plan
    for line in plan.splitlines():
        if "Window [" in line:
            assert "channel" in line, line
    assert "1996-01-01" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_returns_excluded_ratio_join_shapes(spark):
    """ds_returns_excluded_ratio (TPC-DS Q78 shape): the returns
    exclusion must be an equi-join on the (order, line) key pair —
    either the literal null-filtered LEFT JOIN or the optimizer's
    anti-join rewrite, never a cartesian/BNLJ — with the returnflag
    filter pushed to the returns-fact scan, and the top-25 as
    TakeOrderedAndProject."""
    plan = _plan(spark, "ds_returns_excluded_ratio")
    assert "LeftAnti" in plan or "LeftOuter" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    # the returnflag = 'R' predicate must reach a scan's pushed filters —
    # bare substring checks ('R' / column name) match any plan vacuously
    assert "EqualTo(l_returnflag,R)" in plan, plan


def test_pca_covariance_build_single_exchange(spark):
    """The PCA covariance BUILD stage (VERDICT r14 wrong #1): the
    moment reduce must be a row-local Generate + partial/final
    HashAggregate — NO join of any kind (the r14 text self-joined the
    exploded corpus on vec_id, which planned as a corpus-sized
    BroadcastExchange below the threshold and a double-shuffle SMJ
    above it), and exactly ONE exchange, which carries only the
    <=2,144-row per-task partials."""
    from auron_spark.pipeline.features import pca_moment_reduce
    from auron_spark.tables import Tables

    df = pca_moment_reduce(Tables(spark, SF_DIR))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastExchange" not in plan, plan
    assert "Join" not in plan, plan  # no join operator of any flavor
    assert "Generate explode" in plan, plan
    assert "partial_sum" in plan, plan  # map-side combine before the wire
    # Exactly one post-Generate exchange, and it carries the aggregated
    # partials (ENSURE_REQUIREMENTS hash on (i,j)); the only other
    # exchange permitted is Tables.parallel's fixture-spreading
    # round-robin BELOW the Generate (a no-op at scale).
    exchanges = [l for l in plan.splitlines() if "Exchange" in l]
    ensure = [l for l in exchanges if "ENSURE_REQUIREMENTS" in l]
    assert len(ensure) == 1, plan
    assert all(
        "ENSURE_REQUIREMENTS" in l or "REPARTITION_BY_NUM" in l
        for l in exchanges
    ), plan
    gen_at = plan.index("Generate explode")
    assert plan.index(ensure[0].strip()) < gen_at, plan  # partials above
    for l in exchanges:
        if "REPARTITION_BY_NUM" in l:
            assert plan.index(l.strip()) > gen_at, plan  # spreading below


def test_pca_top_m_one_corpus_pass(spark):
    """feature_pca_top_m (VERDICT r14 ask #7): deflation runs on the
    bounded covariance frame, so the FINAL plan — three components,
    24 matvec rounds, two rank-1 deflations — must contain ZERO file
    scans and no cartesian: adding components costs zero corpus I/O
    beyond the single checkpointed moment reduce."""
    plan = _plan(spark, "feature_pca_top_m")
    assert "FileScan" not in plan, plan
    assert "ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_pca_power_iteration_never_rescans_corpus(spark):
    """feature_pca_power_iteration: the final plan must contain ZERO
    file scans — the corpus reduces once into the checkpointed
    component/covariance frames and all 8 iterations run on bounded
    ExistingRDD model state (the iterate-without-rescan contract the
    trainer family carries)."""
    plan = _plan(spark, "feature_pca_power_iteration")
    assert "FileScan" not in plan, plan
    assert "ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_moving_avg_neighbors_one_window_exchange(spark):
    """ds_moving_avg_neighbors (TPC-DS Q47/Q57 shape): the rank + lag +
    lead constellation must share ONE Window node (same spec), the
    year-average window must ride the SAME (brand, nation) exchange (its
    finer (brand, nation, yr) clustering is satisfied by the coarser
    hash), the top-50 must be TakeOrderedAndProject (never a global
    sort), and the brand-prefix filter must reach the part scan."""
    import re

    plan = _plan(spark, "ds_moving_avg_neighbors")
    assert plan.count("Window [") == 2, plan  # rank/lag/lead + year-avg
    window_exchanges = re.findall(
        r"Exchange hashpartitioning\(brand#\d+, nation#\d+, \d+\)", plan
    )
    assert len(window_exchanges) == 1, plan  # both windows, one exchange
    assert "TakeOrderedAndProject(limit=50" in plan, plan
    assert "StartsWith(p_brand" in plan, plan  # pushed to the part scan
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_before_after_event_pushed_dates(spark):
    """ds_before_after_event_split (TPC-DS Q21/Q40 shape): the +-30-day
    observation window must push to the sales-side lineitem scan as date
    bounds, the R-flag must push to the returns-side scan, the
    fact-to-fact line-identity join must stay an equi LEFT OUTER (never
    a cartesian), and the brand prefixes must reach the part scan."""
    # formatted explain: toString truncates long PushedFilters lists
    expl = _explain(spark, "ds_before_after_event_split", "formatted")
    assert "GreaterThanOrEqual(l_shipdate" in expl, expl
    assert "LessThanOrEqual(l_shipdate" in expl, expl
    plan = _plan(spark, "ds_before_after_event_split")
    assert "EqualTo(l_returnflag,R)" in plan, plan
    assert "StartsWith(p_brand" in plan, plan
    assert "LeftOuter" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_lsh_serve_reads_index_with_partition_pruning(spark):
    """dedup_lsh_serve: the serving plan must read the persisted band
    index (artifacts/lsh) with the probe batch's band buckets reaching
    the bucket-PARTITIONED layout as a dynamicpruning PartitionFilter,
    and must scan documents exactly ONCE per subtree role (the batch
    side) — the corpus is never re-signatured at serve time."""
    plan = _plan(spark, "dedup_lsh_serve")
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    idx_scans = [s for s in scans if "artifacts/lsh" in s]
    assert idx_scans, plan
    assert any("dynamicpruningexpression" in s for s in idx_scans), plan
    # every documents scan is the batch side (probe-sized serve cost):
    # the doc_id % 10 = 0 filter must be present on each (the scan may
    # appear again inside the reused DPP subquery broadcast)
    doc_scans = [s for s in scans if "documents.parquet" in s]
    assert doc_scans, plan
    for s in doc_scans:
        assert "% 10) = 0" in s, s
    assert "CartesianProduct" not in plan, plan


def test_conformal_global_no_single_partition_window(spark):
    """eval_conformal_global_scale (VERDICT r15 stretch #8): the
    single-class qhat order statistic must ride the covered-rank device
    — every Window in the plan partitions by the prefix device's _pid,
    never a global single-partition rank — with the 1-row model/qhat
    frames attached as broadcasts."""
    plan = _plan(spark, "eval_conformal_global_scale")
    for line in plan.splitlines():
        if "Window [" in line:
            assert "_pid" in line, line
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_theil_sen_global_no_single_partition_window(spark):
    """stats_theil_sen_global_scale (VERDICT r15 stretch #9): the pooled
    pair-slope median must ride the covered-rank device — every Window
    partitions by the prefix device's _pid — with the calendar-grain
    pair join a broadcast and no cartesian anywhere."""
    plan = _plan(spark, "stats_theil_sen_global_scale")
    for line in plan.splitlines():
        if "Window [" in line:
            assert "_pid" in line, line
    # the hint-broadcast pair join sits above the device's checkpoint cut
    # (invisible here, like the Spearman spend map); what must hold in the
    # visible plan: only 1-row-broadcast BNLJs, no cartesian, no SMJ sort
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "EvalPython" not in plan, plan


def test_lsh_serve_verified_pruned_verification(spark):
    """dedup_lsh_serve_verified: the exact-Jaccard verification must be
    CANDIDATE-bounded — the candidate ids reach the doc-bucket-PARTITIONED
    shingle layout as a dynamicpruning PartitionFilter (and the band
    probe keeps its bucket pruning) — with every documents scan being the
    batch side and no cartesian."""
    plan = _plan(spark, "dedup_lsh_serve_verified")
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    sh_scans = [s for s in scans if "lsh" in s and "shingles" in s]
    assert sh_scans, plan
    assert any("dynamicpruningexpression" in s for s in sh_scans), plan
    band_scans = [s for s in scans if "lsh" in s and "/bands" in s]
    assert band_scans, plan
    assert any("dynamicpruningexpression" in s for s in band_scans), plan
    for s in scans:
        if "documents.parquet" in s:
            assert "% 10) = 0" in s, s
    assert "CartesianProduct" not in plan, plan
