#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output protocol (VERDICT r6 asks #2/#3 — the r6 single-line payload outgrew
the driver's tail-capture window and parsed as null):
- several leading JSON lines carry the bulky sections (`{"section": "cold",
  ...}`, `{"section": "sf2", ...}`, `{"section": "groups", ...}`);
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

Methodology: each query runs twice and BOTH times are reported — `cold`
(first execution: file listing + whole-stage-codegen + JIT) and `warm`
(steady state).  The headline `value` / `queries` numbers are the warm times:
at 100 TB the one-shot compile costs amortize to zero, so warm is the number
that scales.
"""

from __future__ import annotations

import json
import os
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
    "sim_knn_ivf_trained",
    "sim_ivfpq_trained",
    "sim_semantic_dedup",
    "dedup_canonical_selection",
}
# Light relational shapes: the round-over-round comparable set.
_RELATIONAL_PREFIXES = ("window_", "skew_", "agg_", "join_", "sort_")
_TPCH_RE = __import__("re").compile(r"^q\d+_")


def _group_of(name: str) -> str:
    if name in _TRAINERS:
        return "trainers"
    if _TPCH_RE.match(name) or name.startswith(_RELATIONAL_PREFIXES):
        return "relational"
    return "pipeline"


def _run_group(group: str, sf_dir: str, second: str) -> dict:
    """Child mode: run one group's queries in this process's own JVM."""
    from auron_spark.registry import bench_queries, load_all
    from auron_spark.session import get_spark

    load_all()
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

    warm: dict[str, float] = {}
    cold: dict[str, float] = {}
    warm2: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        cold[name] = run(spec, sf_dir)
        warm[name] = run(spec, sf_dir)
    if second and os.path.isdir(second) and second != sf_dir:
        for name, spec in sorted(specs.items()):
            warm2[name] = run(spec, second)
    spark.stop()
    return {"warm": warm, "cold": cold, "sf2": warm2}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    second = os.environ.get(
        "SPARK_GRAFT_BENCH_SECOND_SF", "/root/testdata/sf0.01"
    )

    if len(sys.argv) > 1 and sys.argv[1] == "--group":
        # Child: print this group's result as the last line and exit.
        print(json.dumps(_run_group(sys.argv[2], sf_dir, second)))
        return

    warm: dict[str, float] = {}
    cold: dict[str, float] = {}
    warm2: dict[str, float] = {}
    subtotals: dict[str, float] = {}
    for group in ("relational", "pipeline", "trainers"):
        proc = subprocess.run(
            [sys.executable, __file__, "--group", group],
            capture_output=True,
            text=True,
            cwd=_REPO,
        )
        if proc.returncode != 0:
            sys.stderr.write(proc.stderr[-4000:])
            raise SystemExit(f"bench group {group} failed rc={proc.returncode}")
        last = proc.stdout.strip().splitlines()[-1]
        res = json.loads(last)
        warm.update(res["warm"])
        cold.update(res["cold"])
        warm2.update(res["sf2"])
        subtotals[group] = round(sum(res["warm"].values()), 3)

    sf2 = float(second.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in second else -1.0
    # Bulky sections lead; the compact headline is the LAST line so a
    # tail-capture of stdout always contains one complete parseable JSON.
    print(json.dumps({"section": "cold", "queries_cold": cold,
                      "total_cold": round(sum(cold.values()), 3)}))
    if warm2:
        print(json.dumps({"section": "sf2", "sf2": sf2, "queries_sf2": warm2,
                          "total_sf2": round(sum(warm2.values()), 3)}))
    print(json.dumps({"section": "groups", "warm_subtotals": subtotals}))
    print(json.dumps({
        "metric": "headline_queries_total_wall",
        "value": round(sum(warm.values()), 3),
        "unit": "sec",
        "queries": warm,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
