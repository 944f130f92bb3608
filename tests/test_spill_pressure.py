"""Spill-under-memory-pressure battery (VERDICT r13 ask #2).

The reference's test layer this mirrors: `datafusion-ext-plans/src/
agg_exec.rs:804-817` and `sort_exec.rs:390-436` run their operators with a
tiny memory budget, force mid-operator spills, and re-check answers after
the spill merge.  Spark's equivalents are the UnsafeExternalSorter /
ExternalAppendOnlyUnsafeRowArray spill paths inside sort, sort-merge join,
window and (object-)hash aggregate — exercised here DETERMINISTICALLY via
the force-spill thresholds rather than flaky OOM pressure:

- ``spark.shuffle.spill.numElementsForceSpillThreshold`` — every external
  sorter spills after N rows (sort, shuffle writer, hash-agg fallback);
- ``spark.sql.sortMergeJoinExec.buffer.spill.threshold`` — the SMJ match
  buffer spills;
- ``spark.sql.windowExec.buffer.spill.threshold`` — the window frame
  buffer spills;
- ``spark.sql.objectHashAggregate.sortBased.fallbackThreshold=1`` — the
  collect_list/collect_set aggregate falls back to sort-based after one
  hash-map entry;
plus a deliberately small driver heap and 3 shuffle partitions so the
per-partition buffers are corpus-sized.

The battery runs five registered queries covering the spilling operator
families (external sort, SMJ, object hash agg, hash agg, window) in a
CHILD JVM with those confs, asserts via the Spark status REST API that
bytes actually spilled, and hash-compares every row set against the same
queries in this process's NORMAL session — answers must survive the spill
merge bit-for-bit.
"""

from __future__ import annotations

import hashlib
import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

from auron_spark.registry import load_all
from tests.conftest import SF_DIR

# One per spilling operator family: external sort, sort-merge join,
# object-hash-agg sort fallback, hash agg + global sort, window buffer.
SPILL_QUERIES = (
    "sort_nulls_ordering",
    "join_inner_smj",
    "agg_collect",
    "q1_pricing_summary",
    "window_time_range_frame",
)

# Iterative-trainer leg (VERDICT r14 ask #8): a multi-round Lloyd training
# loop under the same force-spill confs PLUS threshold broadcasts disabled
# (autoBroadcastJoinThreshold=-1), so every non-hinted join the trainer's
# aggregation state flows through plans as a spilling SMJ instead of a
# broadcast — proving the per-round partial/final codebook aggregates and
# the assignment join survive the spill merge across iterations.  Runs in
# its OWN child JVM: the broadcast kill would change the five operator
# legs' plans.
TRAINER_SPILL_QUERIES = ("sim_kmeans_lloyd",)
# The trainer's exchanges carry map-side-reduced partials by design (the
# k x 64 codebook state), so the 2000-element thresholds the operator legs
# use never trip at fixture scale — push them down to 200 so the
# corpus-side shuffles (the initial spread, the SMJ legs the broadcast
# kill creates) genuinely cross the spill path.
_TRAINER_EXTRA_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.shuffle.spill.numElementsForceSpillThreshold": "200",
    "spark.sql.sortMergeJoinExec.buffer.spill.threshold": "200",
}

_CHILD = r"""
import json, sys, urllib.request
from pyspark.sql import SparkSession

sf_dir, names = sys.argv[1], sys.argv[2].split(",")
extra = json.loads(sys.argv[3]) if len(sys.argv) > 3 else {}
builder = (
    SparkSession.builder.master("local[4]")
    .appName("spill-pressure")
    .config("spark.driver.memory", "1500m")
    .config("spark.sql.shuffle.partitions", "3")
    .config("spark.shuffle.spill.numElementsForceSpillThreshold", "2000")
    .config("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "2000")
    .config("spark.sql.windowExec.buffer.spill.threshold", "2000")
    .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", "0")
)
for k, v in extra.items():
    builder = builder.config(k, v)
spark = builder.getOrCreate()
from auron_spark.registry import load_all

specs = load_all()
out = {}
for name in names:
    rows = sorted(repr(tuple(r)) for r in specs[name].build(spark, sf_dir).collect())
    out[name] = {"rows": len(rows), "sha": __import__("hashlib").sha256("\n".join(rows).encode()).hexdigest()}

# Spark status REST API: per-stage spill totals for this very app.
ui = spark.sparkContext.uiWebUrl
app = spark.sparkContext.applicationId
stages = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages"))
out["_spill"] = {
    "disk_bytes": sum(s.get("diskBytesSpilled", 0) for s in stages),
    "memory_bytes": sum(s.get("memoryBytesSpilled", 0) for s in stages),
    "stages_spilled": sum(1 for s in stages if s.get("diskBytesSpilled", 0) > 0),
}
print("SPILL_JSON:" + json.dumps(out))
"""


def _run_spill_child(names: tuple[str, ...], extra_confs: dict) -> dict:
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_CPUS", None)
    proc = subprocess.run(
        [sys.executable, "-c", _CHILD, SF_DIR, ",".join(names),
         json.dumps(extra_confs)],
        cwd=str(Path(__file__).resolve().parent.parent),
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("SPILL_JSON:")]
    assert line, proc.stdout[-3000:]
    return json.loads(line[-1][len("SPILL_JSON:"):])


@pytest.fixture(scope="module")
def spill_run():
    return _run_spill_child(SPILL_QUERIES, {})


@pytest.fixture(scope="module")
def trainer_spill_run():
    return _run_spill_child(TRAINER_SPILL_QUERIES, _TRAINER_EXTRA_CONFS)


def test_spill_actually_occurred(spill_run):
    """The force-spill confs must make the battery REALLY spill — the
    REST status totals prove the external-sorter/buffer spill paths ran
    (a battery that never spills would be vacuous)."""
    spill = spill_run["_spill"]
    assert spill["disk_bytes"] > 0, spill
    assert spill["stages_spilled"] >= 2, spill


@pytest.mark.parametrize("name", SPILL_QUERIES)
def test_spill_pressure_answers_survive(spark, spill_run, name):
    """Each query's full row set under forced spills must hash-equal the
    normal-session answer — the spill merge may not lose, duplicate, or
    reorder-within-sort any row."""
    rows = sorted(
        repr(tuple(r)) for r in load_all()[name].build(spark, SF_DIR).collect()
    )
    sha = hashlib.sha256("\n".join(rows).encode()).hexdigest()
    assert spill_run[name]["rows"] == len(rows), (
        name, spill_run[name]["rows"], len(rows),
    )
    assert spill_run[name]["sha"] == sha, name


def test_trainer_spill_actually_occurred(trainer_spill_run):
    """The trainer leg must really spill too — the broadcast kill turns
    the non-hinted joins into spilling SMJs and the per-round aggregates
    hit the force-spill thresholds across iterations."""
    spill = trainer_spill_run["_spill"]
    assert spill["disk_bytes"] > 0 or spill["memory_bytes"] > 0, spill


@pytest.mark.parametrize("name", TRAINER_SPILL_QUERIES)
def test_trainer_spill_answers_survive(spark, trainer_spill_run, name):
    """The iterative trainer's full row set under forced spills AND
    disabled threshold broadcasts must hash-equal the normal-session
    answer — the training loop's codebook state survives spill merges
    in every round (VERDICT r14 ask #8)."""
    rows = sorted(
        repr(tuple(r)) for r in load_all()[name].build(spark, SF_DIR).collect()
    )
    sha = hashlib.sha256("\n".join(rows).encode()).hexdigest()
    assert trainer_spill_run[name]["rows"] == len(rows), (
        name, trainer_spill_run[name]["rows"], len(rows),
    )
    assert trainer_spill_run[name]["sha"] == sha, name
