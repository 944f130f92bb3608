#!/usr/bin/env python
"""Per-job wall profiler for the trainer family (measurement tool only).

Runs the named queries (fresh bench-conf JVM, sharded sf0.1 by default,
noop sink) and dumps every Spark job's [submit..complete] wall plus the
GAP before it (driver-side time: planning, collects, py4j round trips)
from the local UI REST API — the evidence base for the r17 per-round
overhead work (VERDICT r16 next #1).

Usage: python plans/r17/phaseprof.py sim_ivfpq_trained [more ...]
       SPARK_GRAFT_PROF_DIR=.bench_shards/veccorpus_32768 \
       SPARK_GRAFT_PROF_K=128 python plans/r17/phaseprof.py sim_ivfpq_trained
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from datetime import datetime, timezone
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[2])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")


def _ts(s: str) -> float:
    return datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%f%Z").replace(
        tzinfo=timezone.utc
    ).timestamp()


def main() -> None:
    names = sys.argv[1:]
    where = os.environ.get(
        "SPARK_GRAFT_PROF_DIR", f"{_REPO}/.bench_shards/sf0.1"
    )
    k_override = os.environ.get("SPARK_GRAFT_PROF_K")

    from auron_spark.registry import load_all
    from auron_spark.session import get_spark

    specs = load_all()
    spark = get_spark("phaseprof-r17")
    spark.sparkContext.setLogLevel("WARN")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def jobs_after(t0: float) -> list[dict]:
        url = f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"
        rows = json.loads(urllib.request.urlopen(url).read())
        out = []
        for r in rows:
            sub = _ts(r["submissionTime"])
            if sub < t0:
                continue
            out.append(
                {
                    "jobId": r["jobId"],
                    "sub": sub,
                    "dur": round(_ts(r["completionTime"]) - sub, 3),
                    "desc": (r.get("description") or r["name"])[:110],
                    "stages": len(r["stageIds"]),
                    "tasks": r["numTasks"],
                }
            )
        return sorted(out, key=lambda x: x["jobId"])

    for name in names:
        for run in ("cold", "warm"):
            t0 = time.time()
            tb0 = time.perf_counter()
            if k_override:
                import auron_spark.pipeline.similarity as _sim

                df = getattr(_sim, name)(spark, where, int(k_override))
            else:
                df = specs[name].build(spark, where)
            build_s = round(time.perf_counter() - tb0, 3)
            te0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            exec_s = round(time.perf_counter() - te0, 3)
            rows = jobs_after(t0)
            print(f"\n=== {name} [{run}] build={build_s}s exec={exec_s}s "
                  f"jobs={len(rows)}")
            prev_end = t0
            gap_total = 0.0
            for r in rows:
                gap = round(r["sub"] - prev_end, 3)
                gap_total += max(gap, 0.0)
                prev_end = r["sub"] + r["dur"]
                print(f"  j{r['jobId']:>4} gap={gap:>7.3f} dur={r['dur']:>7.3f} "
                      f"st={r['stages']:>2} tk={r['tasks']:>4} {r['desc']}")
            tail = round(t0 + build_s + exec_s - prev_end, 3)
            print(f"  total_gap={round(gap_total, 3)}s tail={tail}s "
                  f"job_dur_sum={round(sum(r['dur'] for r in rows), 3)}s")
    spark.stop()


if __name__ == "__main__":
    main()
