#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output protocol (VERDICT r6 asks #2/#3 — the r6 single-line payload outgrew
the driver's tail-capture window and parsed as null):
- several leading JSON lines carry the bulky sections (`{"section": "cold",
  ...}`, `{"section": "sf2", ...}`, `{"section": "groups", ...}`,
  `{"section": "shards", ...}`, `{"section": "variance", ...}`,
  `{"section": "index_build", ...}`, `{"section": "adjudication", ...}`);
- the LAST printed line is the compact headline
  `{"metric", "value", "unit", "queries", "sf"}` — always complete inside a
  tail-capture window, so the driver can parse it.

Isolation (VERDICT r6 ask #3): queries run in three session GROUPS, each in
its own subprocess (fresh JVM), ordered light→heavy:
  1. `relational` — TPC-H shapes, windows, skew joins, stats;
  2. `pipeline`   — text/dedup/retrieval/multimodal map-side pipelines;
  3. `trainers`   — iterative heavyweights (Lloyd, IVF-PQ, SemDeDup, CC).
Round 6 ran all 24 queries alphabetically in ONE JVM, so the TPC-H shapes
inherited JIT/GC pollution from the trainers and read 2.5-3.7× worse than r5
while plan goldens were unchanged.  Per-group subtotals make round-over-round
comparison apples-to-apples.

Sharded fixtures (VERDICT r7 ask #4 — measurement honesty, not gaming): the
driver fixtures are single-row-group parquet, so every scan is ONE task and
every query pays a serial-scan + JIT floor that masks plan quality; at 100 TB
every scan has thousands of splits.  Unless SPARK_GRAFT_BENCH_SHARD=0, the
harness first rewrites each table into `.bench_shards/<sf>/<table>.parquet/`
with multiple part files (32 for facts, fewer for dims — layout-only; rows,
values and read-schema are identical, and correctness runs still read the
untouched originals) and benches against the sharded copy.  The one-time
build cost is reported in its own `shards` section, never in the headline.

Variance guard (VERDICT r7 ask #3): each query runs cold + TWO warm passes;
the headline warm number is the MIN of the two (steady-state, box-weather
suppressed) and the `variance` section carries both, so a real plan
regression (both runs move) is distinguishable from box noise (one run
spikes) round-over-round.

Train-once visibility (VERDICT r7 ask #5): the trainers group also times a
forced IVF-PQ index rebuild into a scratch dir — the `index_build` section —
so the train-once cost the serve queries amortize is tracked explicitly
instead of invisibly.  Round 10 adds the BM25 inverted-index build next to
it (VERDICT r9 ask #6) — both persisted indexes now report build cost.

Text-scale group (VERDICT r9 ask #3): the driver's documents fixture is 500
rows at EVERY SF, so the text/dedup/simjoin families were never timed above
500 docs — a constant-factor regression in the shingle/verify stages would
be invisible.  The `text_scale` section runs the flagship text queries over
a deterministic synthetic corpus (default 65,536 docs, zipf-skewed 10k-word
vocab, planted exact + near duplicates; override with SPARK_GRAFT_TEXT_DOCS,
0 disables).  Correctness is untouched — oracle runs still read the driver
fixture; this group exists purely to time the scale path, so its numbers
live in their own section and group subtotal, never in the headline series.

Methodology: the headline `value` / `queries` numbers are warm times: at
100 TB the one-shot compile costs amortize to zero, so warm is the number
that scales.

Self-adjudication (VERDICT r13 ask #5): the box shows up to 2x same-day
variance with byte-stable plans, concentrated in single group JVMs (the
r13 record's trainers group read 79.4 s vs isolated brackets of 36.5-37.4
s, polluting the round headline).  `bench_brackets.json` commits each
group's BEST OBSERVED warm subtotal AND per-query bests (min-merged
across runs while the group's query set is unchanged — the
partest_walls.json device).  When a group's subtotal exceeds 1.5x its
bracket, OR any single query exceeds 2.5x its per-query best (VERDICT
r14 wrong #4: r14's sim_knn_ivf_serve spiked 2.69x on a byte-stable
plan while its group stayed at 1.25x — invisible to the group
trigger), the harness automatically re-runs that group in a fresh
child JVM, takes the per-query min of the two passes for the headline
(the existing min-warm protocol, one more sample), and records BOTH
subtotals plus the spiking queries in an `adjudication` section — so a
noise spike can neither hide nor silently pollute the round-over-round
series.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Iterative trainers: multi-round jobs whose localCheckpoint/JIT footprint
# pollutes anything sharing their JVM.  Run last, in their own session.
_TRAINERS = {
    "sim_kmeans_lloyd",
    "sim_kmeans_lloyd_arrow",
    "sim_knn_ivf_trained",
    "sim_ivfpq_trained",
    "sim_ivfpq_trained_arrow",
    "sim_semantic_dedup",
    "sim_semantic_dedup_arrow",
    "dedup_canonical_selection",
}
# Light relational shapes: the round-over-round comparable set.  "ds_"
# joined in round 10 — the TPC-DS flagships are pure relational
# join+rollup+window shapes and belong in the relational subtotal, not
# in pipeline's (which their weight would otherwise distort).
_RELATIONAL_PREFIXES = ("window_", "skew_", "agg_", "join_", "sort_", "ds_")
_TPCH_RE = __import__("re").compile(r"^q\d+_")
# Name-prefix exceptions: heavyweight pipeline ops whose names collide with
# the relational prefixes — keeping them out of `relational` preserves the
# round-over-round comparability of the TPC-H-era subtotal.
_PIPELINE_OVERRIDES = {"join_set_similarity_prefix", "agg_heavy_hitters_mg"}

# Layout-only resharding: facts get full scan parallelism, dims stay small
# (32 one-row files for region would be silly).  Unlisted tables default 8.
_SHARD_SPLITS = {
    "lineitem": 32, "orders": 32, "events": 32, "documents": 32,
    "embeddings": 32, "customer": 8, "part": 8, "supplier": 8,
    "nation": 1, "region": 1,
}
_SHARD_ROOT = f"{_REPO}/.bench_shards"

# Flagship text/dedup queries timed over the synthetic scale corpus (their
# builders read ONLY the documents table, so a corpus dir with a single
# documents.parquet serves as sf_dir).  Not bench-tagged in the registry —
# membership here is the bench contract for the scale leg.
_TEXT_SCALE_QUERIES = (
    "join_set_similarity_prefix",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_hamming_pairs",
    "text_kneser_ney_bigram",
    "text_gopher_filters",
    "text_bpe_train",
)

# Flagship vector/ANN queries timed over the synthetic embedding corpus
# (their builders read ONLY the embeddings table).  The driver fixture is
# 500-2000 vectors at every SF, so without this leg the trainer family's
# 100 TB posture is never timed above 2k vectors — the same blind-spot
# class text_scale closed for the text family.  The four k-means-backed
# queries run with k ∝ corpus size (k = n/256, the SemDeDup/IVF block-size
# knob their docstrings advertise); registered-query semantics (k = KM_K)
# are untouched.
_VECTOR_SCALE_QUERIES = (
    "sim_knn_bruteforce_arrow",
    "dedup_embedding_cosine",
)
# The quadratic F.aggregate FOLD twin is GC-bound at 32k vectors and runs
# warm-slower-than-cold when it shares a JVM with the trainers (r12
# session-pollution diagnosis; VERDICT r12 ask #6b).  Stabilization
# decision: it measures in its OWN child JVM (fresh session, nothing
# before it), while the Arrow serving kernel stays the in-series row —
# the fold exists as the oracle-provable twin, not the serve path.  Its
# numbers still merge into the vector_scale section/subtotal so the
# round-over-round series keeps its membership.
_VECTOR_FOLD_QUERIES = ("sim_knn_bruteforce",)
_VECTOR_SCALE_KSCALED = (
    "sim_kmeans_lloyd",
    "sim_kmeans_lloyd_arrow",
    "sim_knn_ivf_trained",
    "sim_ivfpq_trained",
    "sim_ivfpq_trained_arrow",
    "sim_semantic_dedup",
    "sim_semantic_dedup_arrow",
)


_BRACKETS_PATH = f"{_REPO}/bench_brackets.json"
_ADJUDICATE_FACTOR = 1.5
# Per-query trigger (VERDICT r14 wrong #4): a single-query spike can sail
# under the GROUP trigger when the rest of its group reads fast (r14's
# sim_knn_ivf_serve ran 2.69x its best while the pipeline subtotal stayed
# at 1.25x).  Any query exceeding this factor times its committed best
# also forces the isolated rerun.  Looser than the group factor because
# single-query wall times are noisier than 8-22-query subtotals; floored
# so sub-100ms queries can't trip on scheduler jitter.
_PER_QUERY_FACTOR = 2.5
_PER_QUERY_FLOOR_SEC = 0.25


def _load_brackets(scale_key: dict) -> dict:
    """Load the committed bracket record, DISCARDING it when the run's
    scale knobs (sf dir, text/vector corpus sizes) differ — subtotals at
    another SF would spuriously trip (or never trip) every trigger."""
    try:
        rec = json.loads(Path(_BRACKETS_PATH).read_text())
    except (OSError, ValueError):
        return {"_scale": scale_key}
    if rec.get("_scale") != scale_key:
        return {"_scale": scale_key}
    return rec


def _persist_brackets(brackets: dict) -> bool:
    """Write the min-merged bracket record — UNLESS the file on disk was
    recorded at a different `_scale` (VERDICT r16 wrong #4: an sf0.01 /
    reduced-corpus run must never overwrite the committed sf0.1 record;
    r16 caught that relapse by review, this makes it impossible).  The
    in-memory record still adjudicated this run; it just doesn't persist.
    Returns whether the write happened."""
    try:
        on_disk = json.loads(Path(_BRACKETS_PATH).read_text())
    except (OSError, ValueError):
        on_disk = None
    if (
        on_disk is not None
        and on_disk.get("_scale") != brackets.get("_scale")
    ):
        return False
    Path(_BRACKETS_PATH).write_text(
        json.dumps(brackets, indent=1, sort_keys=True) + "\n"
    )
    return True


def _adjudicate(group: str, res: dict, brackets: dict,
                rerun) -> tuple[dict, dict | None]:
    """If this group's warm subtotal exceeds the committed best-observed
    bracket by _ADJUDICATE_FACTOR, OR any single query exceeds
    _PER_QUERY_FACTOR times its committed per-query best (VERDICT r14
    wrong #4 — the group trigger is blind to one-query spikes), re-run
    the group in a fresh child JVM and per-query-min the two passes;
    always min-merge the adopted subtotal AND per-query bests back into
    the bracket record (reset when the query set changes)."""
    names = sorted(res["warm"])
    subtotal = round(sum(res["warm"].values()), 3)
    rec = brackets.get(group)
    verdict = None
    same_set = bool(rec) and rec.get("queries") == names
    # ADVICE r15 #3: a set change must not discard the per-query bests of
    # the names still present — previously best_q reset to {} and the
    # first run after a reset seeded the committed floor verbatim, so one
    # noise spike inflated the 2.5x trigger threshold until later runs
    # min-merged it down.  Only the SUBTOTAL bracket (not comparable
    # across sets) resets; newly added names still seed from this run's
    # min-of-warm-runs and are refined by the next pass's min-merge.
    best_q = {
        n: v
        for n, v in (rec or {}).get("best_queries", {}).items()
        if n in names
    }
    spiked = sorted(
        n for n in names
        if n in best_q
        and res["warm"][n] > max(
            _PER_QUERY_FACTOR * best_q[n], _PER_QUERY_FLOOR_SEC
        )
    )
    subtotal_trip = same_set and (
        subtotal > _ADJUDICATE_FACTOR * rec["best_subtotal"]
    )
    if subtotal_trip or spiked:
        first_subtotal = subtotal
        first_spiked = {n: res["warm"][n] for n in spiked}
        second = rerun()
        re_subtotal = round(sum(second["warm"].values()), 3)
        for n in names:
            res["warm"][n] = min(res["warm"][n], second["warm"][n])
            res["warm_runs"][n] = res["warm_runs"][n] + second["warm_runs"][n]
        subtotal = round(sum(res["warm"].values()), 3)
        verdict = {
            "group": group,
            "trigger": "subtotal" if subtotal_trip else "per_query",
            "per_query_spikes": {
                n: {"first": first_spiked[n], "adopted": res["warm"][n],
                    "bracket": best_q[n]}
                for n in spiked
            },
            "first_subtotal": first_subtotal,
            "rerun_subtotal": re_subtotal,
            "adopted_subtotal": subtotal,
            "bracket": rec["best_subtotal"] if same_set else None,
        }
    best = subtotal
    if same_set:
        best = min(best, rec["best_subtotal"])
    brackets[group] = {
        "best_subtotal": best,
        "queries": names,
        "best_queries": {
            n: round(min(res["warm"][n], best_q.get(n, res["warm"][n])), 3)
            for n in names
        },
    }
    return res, verdict


def _group_of(name: str) -> str:
    if name in _TRAINERS:
        return "trainers"
    if name in _PIPELINE_OVERRIDES:
        return "pipeline"
    if _TPCH_RE.match(name) or name.startswith(_RELATIONAL_PREFIXES):
        return "relational"
    return "pipeline"


def _shard_dir_for(sf_dir: str) -> str:
    return f"{_SHARD_ROOT}/{Path(sf_dir.rstrip('/')).name}"


def _build_shards(dirs: list[str]) -> dict:
    """Child mode: reshard each fixture dir into .bench_shards (idempotent
    + atomic via ensure_artifact); returns per-dir build seconds."""
    from auron_spark.artifacts import ensure_artifact
    from auron_spark.session import get_spark
    from auron_spark.tables import TABLE_NAMES, table

    spark = get_spark("auron-spark-bench-shard")
    spark.sparkContext.setLogLevel("WARN")
    out: dict[str, float] = {}
    for sf_dir in dirs:
        dest = _shard_dir_for(sf_dir)
        t0 = time.perf_counter()

        def _build(into: str, src: str = sf_dir) -> None:
            for name in TABLE_NAMES:
                # table() normalizes physical quirks (ns timestamps) once;
                # the sharded copy is then uniform for every reader.
                df = table(spark, src, name)
                df.repartition(_SHARD_SPLITS.get(name, 8)).write.mode(
                    "overwrite"
                ).parquet(f"{into}/{name}.parquet")

        ensure_artifact(dest, "_SHARDS_COMPLETE", _build)
        out[dest] = round(time.perf_counter() - t0, 3)
    spark.stop()
    return out


def _build_text_corpus(dest: str, n_docs: int) -> dict:
    """Child mode: synthesize the deterministic text-scale corpus (same
    5-column schema as the driver's documents fixture) entirely Spark-side:
    no driver-side text generation, no randomness — every token is a pure
    function of (base_id, position) via xxhash64, so the corpus is
    byte-stable across rebuilds.  Vocabulary is 10k words with a zipf-like
    skew (cube of a uniform hash: the top ~10 words carry ~10% of tokens,
    the tail is rare), which is what makes prefix-filtering / BM25 df
    statistics behave like real text instead of like the fixture's ~20-word
    vocab.  Planted duplicates: every doc_id % 40 == 39 is an EXACT copy of
    its predecessor, every doc_id % 40 == 19 a NEAR-dup (one appended
    marker word), so the dedup queries have a known-positive signal."""
    from auron_spark.artifacts import ensure_artifact
    from auron_spark.session import get_spark

    spark = get_spark("auron-spark-bench-textcorpus")
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.perf_counter()

    def _build(into: str) -> None:
        vocab = 10_000
        words = (
            "transform(sequence(1, 30 + pmod(xxhash64(base_id, 7), 90)), "
            "j -> concat('w', CAST(CAST("
            f"pow(pmod(xxhash64(base_id, j), 1000000) / 1000000.0, 3.0) "
            f"* {vocab} AS BIGINT) AS STRING)))"
        )
        (
            spark.range(n_docs)
            .selectExpr(
                "id AS doc_id",
                "CASE WHEN id % 20 = 19 THEN id - 1 ELSE id END AS base_id",
                "id % 40 = 19 AS near_dup",
            )
            .selectExpr(
                "doc_id", f"array_join({words}, ' ') AS base_text", "near_dup"
            )
            .selectExpr(
                "doc_id",
                "CASE WHEN near_dup THEN concat(base_text, ' dupmarkerword') "
                "ELSE base_text END AS text",
            )
            .selectExpr(
                "doc_id",
                "text",
                "'en' AS lang",
                "concat('src', CAST(pmod(doc_id, 10) AS STRING)) AS source",
                "CAST(length(text) AS BIGINT) AS n_chars",
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{into}/documents.parquet")
        )

    ensure_artifact(dest, "_CORPUS_COMPLETE", _build)
    spark.stop()
    return {"corpus": dest, "n_docs": n_docs,
            "build_sec": round(time.perf_counter() - t0, 3)}


def _build_vector_corpus(dest: str, n_vecs: int) -> dict:
    """Child mode: synthesize the deterministic vector-scale corpus (same
    3-column schema as the driver's embeddings fixture: vec_id BIGINT,
    embedding ARRAY<FLOAT> (64-dim), label INT) entirely Spark-side via
    xxhash64 — byte-stable across rebuilds, no driver-side generation.

    Structure: 128 planted clusters; vector = centroid(cluster) + 2.5x
    per-vector noise, so within-cluster cosine sits near 0.14 (below the
    0.3 near-dup threshold) and k-means has a real signal to find without
    the threshold queries drowning in positives.  ``label`` = the planted
    cluster, giving `dedup_embedding_cosine` ~n/128-row blocks and the PQ
    codebook 128 codewords per subquantizer (production-shaped, vs the
    fixture's handful of labels).  Planted near-dups: every vec_id % 40 ==
    39 shares its predecessor's noise seed plus a 0.02-weight perturbation
    (cosine ~0.999), so the dedup queries have a known-positive signal."""
    from auron_spark.artifacts import ensure_artifact
    from auron_spark.session import get_spark

    spark = get_spark("auron-spark-bench-veccorpus")
    spark.sparkContext.setLogLevel("WARN")
    t0 = time.perf_counter()

    def _build(into: str) -> None:
        n_clusters = 128
        # uniform [-1, 1] components from xxhash64(seed, salt)
        unit = "((pmod(xxhash64({s}, {salt} + j), 2001) - 1000) / 1000.0)"
        comp = (
            unit.format(s="cluster", salt=2000)
            + " + 2.5 * " + unit.format(s="base_id", salt=3000)
            + " + CASE WHEN is_dup THEN 0.02 * "
            + unit.format(s="vec_id", salt=4000)
            + " ELSE 0.0 END"
        )
        (
            spark.range(n_vecs)
            .selectExpr(
                "id AS vec_id",
                "CASE WHEN id % 40 = 39 THEN id - 1 ELSE id END AS base_id",
                "id % 40 = 39 AS is_dup",
            )
            .selectExpr(
                "vec_id",
                "base_id",
                "is_dup",
                f"pmod(xxhash64(base_id, 1001), {n_clusters}) AS cluster",
            )
            .selectExpr(
                "vec_id",
                f"transform(sequence(1, 64), j -> CAST({comp} AS FLOAT)) "
                "AS embedding",
                "CAST(cluster AS INT) AS label",
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(f"{into}/embeddings.parquet")
        )

    ensure_artifact(dest, "_CORPUS_COMPLETE", _build)
    spark.stop()
    return {"corpus": dest, "n_vecs": n_vecs,
            "build_sec": round(time.perf_counter() - t0, 3)}


def _run_group(group: str, sf_dir: str, second: str,
               rerun: bool = False) -> dict:
    """Child mode: run one group's queries in this process's own JVM.
    ``rerun`` marks an adjudication re-measurement: only the warm numbers
    are adopted by `_adjudicate`, so the sf2 leg and the index builds —
    which the caller would discard — are skipped (review r14 #4)."""
    # Size the bench JVM heap to its 32 concurrent tasks (round-13 text_scale
    # diagnosis): at the session default 8g, 32 string-heavy tasks GC-thrash —
    # the leg read 30.8-38.0 s with uniform inflation and huge run-to-run
    # variance, while the identical leg at 24g reads 24.8 s with every
    # component inside the r11/r12 brackets.  This is the local mirror of
    # sizing executor memory to concurrent task state at 100 TB; tests keep
    # the 8g default (their per-query data is fixture-small).
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    from auron_spark.registry import bench_queries, load_all
    from auron_spark.session import get_spark
    from auron_spark.tables import Tables  # noqa: F401 (registry import)

    all_specs = load_all()
    k_scaled: int | None = None
    if group == "text_scale":
        specs = {n: all_specs[n] for n in _TEXT_SCALE_QUERIES}
    elif group == "vector_fold":
        specs = {n: all_specs[n] for n in _VECTOR_FOLD_QUERIES}
    elif group == "vector_scale":
        from types import SimpleNamespace

        from auron_spark.pipeline import similarity as _sim

        n_vecs = int(os.environ.get("SPARK_GRAFT_VECTOR_VECS", "32768"))
        # Single source of truth for the knob; main() reports this value.
        k_scaled = sk = max(_sim.KM_K, n_vecs // 256)
        specs = {n: all_specs[n] for n in _VECTOR_SCALE_QUERIES}
        for n in _VECTOR_SCALE_KSCALED:
            fn = getattr(_sim, n)
            specs[f"{n}_kscaled"] = SimpleNamespace(
                build=lambda s, w, fn=fn: fn(s, w, sk)
            )
    else:
        specs = {
            n: s for n, s in bench_queries().items() if _group_of(n) == group
        }
    spark = get_spark(f"auron-spark-bench-{group}")
    spark.sparkContext.setLogLevel("WARN")

    def run(spec, where: str) -> float:
        t0 = time.perf_counter()
        spec.build(spark, where).write.format("noop").mode("overwrite").save()
        elapsed = round(time.perf_counter() - t0, 3)
        # Outside the timed window: release driver-side refs so the
        # ContextCleaner drops localCheckpoint RDDs now, not mid-measurement.
        import gc

        gc.collect()
        spark._jvm.System.gc()
        return elapsed

    cold: dict[str, float] = {}
    warm_runs: dict[str, list[float]] = {}
    warm2: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        cold[name] = run(spec, sf_dir)
        # Two warm passes EVERYWHERE (VERDICT r10 ask #3): the scale legs
        # are now a round-over-round series like the headline set, so they
        # carry the same two-pass variance bracket.
        warm_runs[name] = [run(spec, sf_dir) for _ in range(2)]
    if not rerun and second and os.path.isdir(second) and second != sf_dir:
        for name, spec in sorted(specs.items()):
            warm2[name] = run(spec, second)

    index_build: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_INDEX_BUILDS", "1") == "0":
        # Quick mode (low-core scaling leg): skip the train-once index
        # rebuild timings — they are their own section, never headline rows.
        spark.stop()
        return {
            "warm": {n: min(r) for n, r in warm_runs.items()},
            "warm_runs": warm_runs,
            "cold": cold,
            "sf2": warm2,
            "index_build": index_build,
            "k_scaled": k_scaled,
        }
    if group == "trainers" and not rerun:
        from auron_spark.pipeline.retrieval import build_bm25_index
        from auron_spark.pipeline.similarity import build_ivfpq_index

        scratch = f"{_SHARD_ROOT}/.scratch_ivfpq-{os.getpid()}"
        t0 = time.perf_counter()
        build_ivfpq_index(spark, sf_dir, force=True, out_dir=scratch)
        index_build["ivfpq_sec"] = round(time.perf_counter() - t0, 3)
        shutil.rmtree(scratch, ignore_errors=True)
        # BM25 inverted-index build next to ivfpq's (VERDICT r9 ask #6):
        # both persisted serve indexes now report their train-once cost.
        scratch = f"{_SHARD_ROOT}/.scratch_bm25-{os.getpid()}"
        t0 = time.perf_counter()
        build_bm25_index(spark, sf_dir, force=True, out_dir=scratch)
        index_build["bm25_sec"] = round(time.perf_counter() - t0, 3)
        shutil.rmtree(scratch, ignore_errors=True)
    if group == "text_scale" and not rerun:
        # The scale corpus is where the BM25 build cost is actually visible
        # (the driver fixture is 500 docs at every SF).
        from auron_spark.pipeline.retrieval import build_bm25_index

        scratch = f"{_SHARD_ROOT}/.scratch_bm25s-{os.getpid()}"
        t0 = time.perf_counter()
        build_bm25_index(spark, sf_dir, force=True, out_dir=scratch)
        index_build["bm25_scale_sec"] = round(time.perf_counter() - t0, 3)
        shutil.rmtree(scratch, ignore_errors=True)

    spark.stop()
    return {
        "warm": {n: min(r) for n, r in warm_runs.items()},
        "warm_runs": warm_runs,
        "cold": cold,
        "sf2": warm2,
        "index_build": index_build,
        "k_scaled": k_scaled,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    second = os.environ.get(
        "SPARK_GRAFT_BENCH_SECOND_SF", "/root/testdata/sf0.01"
    )
    # Quick mode (VERDICT r16 next #3: the 8-core scaling leg timed out at
    # rc=124 because the full run — scale corpora + scale legs + sf2 legs +
    # index rebuilds — is a ~53 min wall at 32 cores, far past the driver
    # budget at 8).  When the core count is low the run keeps the ENTIRE
    # headline query set with the identical cold + 2-warm min methodology
    # (so per-query scaling ratios are apples-to-apples with the 32-core
    # run) and drops only the extra sections that never feed the headline
    # line: the second-SF pass, the text/vector scale legs, and the index
    # rebuild timings.  Explicit override: SPARK_GRAFT_BENCH_QUICK=0/1.
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    quick = os.environ.get("SPARK_GRAFT_BENCH_QUICK")
    quick = (cpus < 16) if quick is None else (quick == "1")
    if quick:
        second = ""
        os.environ.setdefault("SPARK_GRAFT_TEXT_DOCS", "0")
        os.environ.setdefault("SPARK_GRAFT_VECTOR_VECS", "0")
        os.environ["SPARK_GRAFT_BENCH_INDEX_BUILDS"] = "0"

    if len(sys.argv) > 1 and sys.argv[1] == "--group":
        # Child: print this group's result as the last line and exit.
        print(json.dumps(_run_group(
            sys.argv[2], sys.argv[3], sys.argv[4],
            rerun=len(sys.argv) > 5 and sys.argv[5] == "rerun",
        )))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--shard":
        print(json.dumps(_build_shards(sys.argv[2:])))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--textcorpus":
        print(json.dumps(_build_text_corpus(sys.argv[2], int(sys.argv[3]))))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--veccorpus":
        print(json.dumps(_build_vector_corpus(sys.argv[2], int(sys.argv[3]))))
        return

    def _child(args: list[str]) -> dict:
        proc = subprocess.run(
            [sys.executable, __file__, *args],
            capture_output=True,
            text=True,
            cwd=_REPO,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise SystemExit(f"bench child {args[0]} failed rc={proc.returncode}")
        return json.loads(proc.stdout.strip().splitlines()[-1])

    shard_sec: dict[str, float] = {}
    run_dir, second_dir = sf_dir, second
    if os.environ.get("SPARK_GRAFT_BENCH_SHARD", "1") != "0":
        want = [d for d in (sf_dir, second) if d and os.path.isdir(d)]
        shard_sec = _child(["--shard", *want])
        run_dir = _shard_dir_for(sf_dir)
        if second and os.path.isdir(second):
            second_dir = _shard_dir_for(second)

    warm: dict[str, float] = {}
    warm_runs: dict[str, list[float]] = {}
    cold: dict[str, float] = {}
    warm2: dict[str, float] = {}
    subtotals: dict[str, float] = {}
    index_build: dict[str, float] = {}
    brackets = _load_brackets({
        "sf_dir": sf_dir,
        "text_docs": int(os.environ.get("SPARK_GRAFT_TEXT_DOCS", "65536")),
        "vector_vecs": int(os.environ.get("SPARK_GRAFT_VECTOR_VECS", "32768")),
    })
    adjudications: list[dict] = []
    for group in ("relational", "pipeline", "trainers"):
        res = _child(["--group", group, run_dir, second_dir])
        res, verdict = _adjudicate(
            group, res, brackets,
            lambda g=group: _child(["--group", g, run_dir, "", "rerun"]),
        )
        if verdict:
            adjudications.append(verdict)
        warm.update(res["warm"])
        warm_runs.update(res["warm_runs"])
        cold.update(res["cold"])
        warm2.update(res["sf2"])
        index_build.update(res.get("index_build", {}))
        subtotals[group] = round(sum(res["warm"].values()), 3)

    # Text-scale leg: flagship text/dedup queries over the synthetic corpus.
    # Separate section + subtotal; NEVER merged into the headline series
    # (which stays round-over-round comparable on the driver fixtures).
    text_docs = int(os.environ.get("SPARK_GRAFT_TEXT_DOCS", "65536"))
    text_scale: dict = {}
    if text_docs > 0:
        corpus = f"{_SHARD_ROOT}/textcorpus_{text_docs}"
        built = _child(["--textcorpus", corpus, str(text_docs)])
        res = _child(["--group", "text_scale", corpus, ""])
        index_build.update(res.get("index_build", {}))
        res, verdict = _adjudicate(
            "text_scale", res, brackets,
            lambda: _child(["--group", "text_scale", corpus, "", "rerun"]),
        )
        if verdict:
            adjudications.append(verdict)
        subtotals["text_scale"] = round(sum(res["warm"].values()), 3)
        text_scale = {
            "n_docs": text_docs,
            "corpus_build_sec": built["build_sec"],
            "queries_warm": res["warm"],
            "warm_runs": res["warm_runs"],
            "queries_cold": res["cold"],
        }

    # Vector-scale leg: flagship ANN/dedup queries over the synthetic
    # embedding corpus, k-means-backed ones at k = n/256.  Same contract as
    # text_scale: separate section, never merged into the headline series.
    vec_vecs = int(os.environ.get("SPARK_GRAFT_VECTOR_VECS", "32768"))
    vector_scale: dict = {}
    if vec_vecs > 0:
        vcorpus = f"{_SHARD_ROOT}/veccorpus_{vec_vecs}"
        vbuilt = _child(["--veccorpus", vcorpus, str(vec_vecs)])
        # The quadratic fold twin first, alone in a fresh JVM (see
        # _VECTOR_FOLD_QUERIES), then the in-series group.
        fold = _child(["--group", "vector_fold", vcorpus, ""])
        res = _child(["--group", "vector_scale", vcorpus, ""])
        for key in ("warm", "warm_runs", "cold"):
            res[key].update(fold[key])

        def _rerun_vector() -> dict:
            f2 = _child(["--group", "vector_fold", vcorpus, "", "rerun"])
            r2 = _child(["--group", "vector_scale", vcorpus, "", "rerun"])
            for key in ("warm", "warm_runs", "cold"):
                r2[key].update(f2[key])
            return r2

        res, verdict = _adjudicate(
            "vector_scale", res, brackets, _rerun_vector
        )
        if verdict:
            adjudications.append(verdict)
        subtotals["vector_scale"] = round(sum(res["warm"].values()), 3)
        vector_scale = {
            "n_vecs": vec_vecs,
            "k_scaled": res["k_scaled"],
            "corpus_build_sec": vbuilt["build_sec"],
            "fold_isolated": sorted(_VECTOR_FOLD_QUERIES),
            "queries_warm": res["warm"],
            "warm_runs": res["warm_runs"],
            "queries_cold": res["cold"],
        }

    sf2 = float(second.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in second else -1.0
    # Bulky sections lead; the compact headline is the LAST line so a
    # tail-capture of stdout always contains one complete parseable JSON.
    if shard_sec:
        print(json.dumps({"section": "shards", "build_sec": shard_sec,
                          "run_dir": run_dir,
                          "splits": _SHARD_SPLITS}))
    print(json.dumps({"section": "cold", "queries_cold": cold,
                      "total_cold": round(sum(cold.values()), 3)}))
    if warm2:
        print(json.dumps({"section": "sf2", "sf2": sf2, "queries_sf2": warm2,
                          "total_sf2": round(sum(warm2.values()), 3)}))
    print(json.dumps({"section": "variance", "warm_runs": warm_runs}))
    if text_scale:
        print(json.dumps({"section": "text_scale", **text_scale}))
    if vector_scale:
        print(json.dumps({"section": "vector_scale", **vector_scale}))
    if index_build:
        print(json.dumps({"section": "index_build", **index_build}))
    # Persist min-merged brackets (refused on a cross-scale record — see
    # _persist_brackets), then report this run's adjudications — an empty
    # list is itself the record that no group tripped its bracket.
    persisted = _persist_brackets(brackets)
    print(json.dumps({"section": "adjudication", "factor": _ADJUDICATE_FACTOR,
                      "per_query_factor": _PER_QUERY_FACTOR,
                      "brackets_persisted": persisted,
                      "reruns": adjudications}))
    print(json.dumps({"section": "groups", "warm_subtotals": subtotals,
                      "quick_mode": quick, "cpus": cpus}))
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": round(sum(warm.values()), 3),
        "unit": "sec",
        "queries": warm,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
