"""Parallel test runner (VERDICT r11 stretch #8): same coverage as
``pytest tests/ -q``, split across concurrent worker PROCESSES, each with
its own SparkSession and DuckDB connection.

pytest-xdist is not in this frozen environment, so the split is explicit:
the 420+-query oracle battery — the suite's longest serial leg — shards
round-robin via ``SPARK_GRAFT_ORACLE_SHARD=i/n`` (tests/test_oracle_all.py),
and the remaining files group into workers balanced by measured wall.
Concurrency safety relies on contracts the suite already carries: artifact
builds publish with one atomic rename (`artifacts.ensure_artifact`), the
bucketed-join query writes external tables into per-call tempdirs, and the
single timing-gated test (window-group-limit pruning) keeps its
min-of-three/3x margin and runs inside the plans worker alongside
plan-shape asserts that are the real gate.

Each worker runs ``local[N]`` with N = cpu_count // workers (floor 4) so
the box is shared instead of 6x oversubscribed.  Exit code is non-zero if
any worker fails; per-worker tails print on failure.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)

# Worker plan: (label, pytest args, extra env).  The oracle battery is
# three shards; the rest split by measured wall at round 12 (plans ~5 min,
# fuzzers ~4 min, misc ~4 min, oracle ~3 min/shard at 8 cpus).
_WORKERS: list[tuple[str, list[str], dict[str, str]]] = [
    ("oracle-0", ["tests/test_oracle_all.py"], {"SPARK_GRAFT_ORACLE_SHARD": "0/3"}),
    ("oracle-1", ["tests/test_oracle_all.py"], {"SPARK_GRAFT_ORACLE_SHARD": "1/3"}),
    ("oracle-2", ["tests/test_oracle_all.py"], {"SPARK_GRAFT_ORACLE_SHARD": "2/3"}),
    ("plans", ["tests/test_plans.py", "tests/test_plan_stability.py"], {}),
    ("fuzzers", ["tests/test_property_random.py"], {}),
    (
        "misc",
        [
            "tests/test_functions.py",
            "tests/test_sources.py",
            "tests/test_streaming.py",
            "tests/test_harness.py",
        ],
        {},
    ),
]


def main() -> int:
    cpus = os.cpu_count() or 32
    per_worker = max(4, cpus // len(_WORKERS))
    logdir = Path(_REPO) / ".partest"
    logdir.mkdir(exist_ok=True)
    t0 = time.perf_counter()
    procs = []
    for label, args, extra in _WORKERS:
        env = dict(os.environ, SPARK_GRAFT_CPUS=str(per_worker), **extra)
        log = (logdir / f"{label}.log").open("w")
        procs.append(
            (
                label,
                subprocess.Popen(
                    [sys.executable, "-m", "pytest", "-q", *args],
                    cwd=_REPO,
                    env=env,
                    stdout=log,
                    stderr=subprocess.STDOUT,
                ),
                log,
            )
        )
    rc = 0
    for label, proc, log in procs:
        code = proc.wait()
        log.close()
        tail = (logdir / f"{label}.log").read_text().strip().splitlines()
        summary = tail[-1] if tail else "(no output)"
        print(f"[{label}] rc={code} {summary}")
        if code != 0:
            rc = 1
            print("\n".join(tail[-30:]))
    print(f"total wall: {time.perf_counter() - t0:.1f}s rc={rc}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
