#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line with per-query wall times.

Queries are forced end-to-end with a `noop`-format write (full computation,
no driver-side collect — the honest way to time a distributed plan).

Methodology: each query runs twice and BOTH times are reported — `cold`
(first execution: pays file listing + whole-stage-codegen compilation + JIT)
and `warm` (steady state).  The headline `value` / `queries` numbers are the
warm times: at 100 TB the one-shot compile costs amortize to zero, so warm is
the number that scales (measured 3.3 s cold vs 0.98 s warm for the minhash
query at sf0.1).  Keeping cold alongside warm makes round-over-round deltas
separate plan improvements from JIT amortization.  (History: BENCH_r01 was
cold-only; BENCH_r02 was warm-only — produced after the warm-up change landed
mid-round-2; BENCH_r03+ carry both.)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from auron_spark.registry import bench_queries, load_all  # noqa: E402
from auron_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else -1.0
    load_all()
    specs = bench_queries()
    spark = get_spark("auron-spark-bench")
    spark.sparkContext.setLogLevel("WARN")

    def run(spec, where=None) -> float:
        t0 = time.perf_counter()
        spec.build(spark, where or sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        elapsed = round(time.perf_counter() - t0, 3)
        # Outside the timed window: release the query's driver-side refs so
        # ContextCleaner can drop its localCheckpoint RDDs NOW instead of
        # mid-way through a later query's measurement (the iterative
        # trainers checkpoint per round; before this, their leftovers made
        # a later query's warm run measure slower than its cold run).
        import gc

        gc.collect()
        spark._jvm.System.gc()
        return elapsed

    warm: dict[str, float] = {}
    cold: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        cold[name] = run(spec)
        warm[name] = run(spec)

    total = round(sum(warm.values()), 3)
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": warm,
        "queries_cold": cold,
        "total_cold": round(sum(cold.values()), 3),
        "sf": sf,
    }

    # Second-scale pass (VERDICT r4 ask #6): re-time the same headline set at
    # a second SF so scale-sensitivity is tracked round-over-round alongside
    # SCALE.md's multi-SF robustness claims.  Warm-only (plans/JIT already
    # compiled), folded into the SAME single JSON line.  Opt out with
    # SPARK_GRAFT_BENCH_SECOND_SF=""; defaults to sf0.01 when present.
    second = os.environ.get(
        "SPARK_GRAFT_BENCH_SECOND_SF", "/root/testdata/sf0.01"
    )
    if second and os.path.isdir(second) and second != sf_dir:
        warm2 = {}
        for name, spec in sorted(specs.items()):
            warm2[name] = run(spec, where=second)
        payload["sf2"] = (
            float(second.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in second else -1.0
        )
        payload["queries_sf2"] = warm2
        payload["total_sf2"] = round(sum(warm2.values()), 3)

    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
