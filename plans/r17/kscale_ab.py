#!/usr/bin/env python
"""Isolated A/B for the bench vector_scale leg's k-scaled trainers
(measurement tool only): fresh JVM, 32k-vector corpus, k = n/256 = 128 —
exactly bench.py's `_run_group("vector_scale")` shape (noop sink, cold +
N warm, min-warm).  Usage: python plans/r17/kscale_ab.py [name ...]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[2])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

CORPUS = f"{_REPO}/.bench_shards/veccorpus_32768"
DEFAULT = (
    "sim_kmeans_lloyd_arrow",
    "sim_ivfpq_trained_arrow",
    "sim_semantic_dedup_arrow",
    "sim_kmeans_lloyd",
    "sim_ivfpq_trained",
    "sim_knn_ivf_trained",
    "sim_semantic_dedup",
)


def main() -> None:
    names = sys.argv[1:] or list(DEFAULT)
    warm_n = int(os.environ.get("SPARK_GRAFT_ISO_WARM", "2"))

    from auron_spark.pipeline import similarity as _sim
    from auron_spark.session import get_spark

    k = max(_sim.KM_K, 32768 // 256)
    spark = get_spark("kscale-ab-r17")
    spark.sparkContext.setLogLevel("WARN")

    def run(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, CORPUS, k).write.format("noop").mode("overwrite").save()
        el = round(time.perf_counter() - t0, 3)
        gc.collect()
        spark._jvm.System.gc()
        return el

    for name in names:
        fn = getattr(_sim, name)
        cold = run(fn)
        warm = [run(fn) for _ in range(warm_n)]
        print(json.dumps({name: {"cold": cold, "warm": warm,
                                 "min_warm": min(warm)}}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
