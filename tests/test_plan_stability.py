"""Plan-stability goldens for the bench set — parity with the reference's
`dev/auron-it/.../PlanStabilityChecker.scala`, which diffs physical plans
against checked-in goldens so a silent planner regression (lost broadcast,
extra exchange, cartesian) fails CI even when results stay correct.

We pin the *operator shape* (the sequence of physical operator names with
exprIds/paths/sizes stripped), not the full plan text — stable across runs
and data sizes at fixed SF, sensitive to exactly the regressions that matter
at 100 TB (join strategy flips, added exchanges, lost pushdown).

Regenerate after an INTENTIONAL plan change:
    PLAN_GOLDEN_REGEN=1 python -m pytest tests/test_plan_stability.py -q
then review the golden diff in git like any other code change.
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path

import pytest

from auron_spark.registry import load_all
from tests.conftest import SF_DIR

GOLDEN_PATH = Path(__file__).parent / "plan_goldens.json"

_OP_RE = re.compile(r"^[\s:+\-*()0-9]*([A-Za-z][A-Za-z0-9_.]*)")


def plan_shape(plan: str) -> list[str]:
    """Physical operator-name sequence, normalized: exprIds, plan ids, paths,
    codegen ids and statistics stripped."""
    ops = []
    for line in plan.splitlines():
        if "== Initial Plan ==" in line:
            break  # AQE: shape of the current plan only
        m = _OP_RE.match(line)
        if not m:
            continue
        name = m.group(1)
        # skip detail/continuation lines (scan options, ReadSchema, etc.)
        if name in {"file", "Location", "ReadSchema", "PushedFilters",
                    "DataFilters", "PartitionFilters", "Format", "Batched",
                    "Arguments", "Output", "Input", "Condition", "Results",
                    "Functions", "Keys", "Aggregate"}:
            continue
        ops.append(name)
    return ops


def _bench_shapes(spark) -> dict[str, list[str]]:
    specs = load_all()
    shapes = {}
    for name, spec in sorted(specs.items()):
        if not spec.bench:
            continue
        df = spec.build(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        shapes[name] = plan_shape(plan)
    return shapes


def test_bench_plan_shapes_stable(spark):
    shapes = _bench_shapes(spark)
    if os.environ.get("PLAN_GOLDEN_REGEN") == "1" or not GOLDEN_PATH.exists():
        GOLDEN_PATH.write_text(json.dumps(shapes, indent=1, sort_keys=True) + "\n")
        pytest.skip(f"plan goldens (re)generated at {GOLDEN_PATH}")
    golden = json.loads(GOLDEN_PATH.read_text())
    assert set(shapes) == set(golden), (
        f"bench set changed: +{set(shapes) - set(golden)} "
        f"-{set(golden) - set(shapes)} — regen goldens"
    )
    diffs = {
        n: (golden[n], shapes[n]) for n in shapes if shapes[n] != golden[n]
    }
    assert not diffs, (
        "physical plan shape drifted (join strategy / exchange / pushdown "
        "regression?) for: " + ", ".join(sorted(diffs)) +
        " — if intentional, PLAN_GOLDEN_REGEN=1 and review the diff"
    )
