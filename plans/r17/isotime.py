#!/usr/bin/env python
"""Isolated same-day A/B timer for the optimization round: run the named
queries in ONE fresh JVM (bench session conf: 24g driver, sharded sf0.1
fixtures), cold + N warm passes each, print per-query cold/min-warm JSON.

Usage: python plans/r17/isotime.py q1 q2 ...          # default 3 warm
       SPARK_GRAFT_ISO_WARM=5 python plans/r17/isotime.py q1

Mirrors bench.py `_run_group` methodology exactly (noop sink, gc between
runs) so numbers are comparable to the bench's warm series on the same box
same day.  Measurement tool only — never invoked by the driver contract.
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

SHARDED = f"{_REPO}/.bench_shards/sf0.1"


def main() -> None:
    names = sys.argv[1:]
    warm_n = int(os.environ.get("SPARK_GRAFT_ISO_WARM", "3"))
    where = os.environ.get("SPARK_GRAFT_ISO_DIR", SHARDED)

    from auron_spark.registry import load_all
    from auron_spark.session import get_spark

    specs = load_all()
    spark = get_spark("iso-ab-r17")
    spark.sparkContext.setLogLevel("WARN")

    def run(spec, grp: str) -> tuple[float, int, int]:
        sc = spark.sparkContext
        sc.setJobGroup(grp, grp)
        t0 = time.perf_counter()
        spec.build(spark, where).write.format("noop").mode("overwrite").save()
        el = round(time.perf_counter() - t0, 3)
        st = sc.statusTracker()
        jobs = st.getJobIdsForGroup(grp)
        n_stages = sum(
            len(st.getJobInfo(j).stageIds) for j in jobs if st.getJobInfo(j)
        )
        sc.setJobGroup("idle", "idle")
        gc.collect()
        spark._jvm.System.gc()
        return el, len(jobs), n_stages

    out = {}
    seq = 0
    for name in names:
        spec = specs[name]
        seq += 1
        cold, cj, cs = run(spec, f"{name}-cold-{seq}")
        warm, jobs, stages = [], [], []
        for i in range(warm_n):
            el, j, s = run(spec, f"{name}-warm-{seq}-{i}")
            warm.append(el)
            jobs.append(j)
            stages.append(s)
        out[name] = {"cold": cold, "warm": warm, "min_warm": min(warm),
                     "jobs": jobs, "stages": stages}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"total_min_warm": round(
        sum(v["min_warm"] for v in out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
