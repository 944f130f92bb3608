#!/usr/bin/env python
"""Capture `.explain("formatted")` for every bench-tagged query (plus any
names passed on the CLI) into plans/r17/<query>_<suffix>.txt — the
judge-checkable record of the optimization round's plan claims.

Usage: python plans/r17/capture_plans.py before [name ...]
       python plans/r17/capture_plans.py after  [name ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parents[2])
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.1"
OUT = Path(_REPO) / "plans" / "r17"


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    from auron_spark.registry import load_all
    from auron_spark.session import get_spark

    spark = get_spark("plan-capture-r17")
    spark.sparkContext.setLogLevel("ERROR")
    specs = load_all()
    names = [
        n for n, s in sorted(specs.items())
        if (n in only) or (not only and s.bench)
    ]
    for name in names:
        try:
            df = specs[name].build(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            plan = f"ERROR building plan: {type(e).__name__}: {e}\n"
        (OUT / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
