"""Committed parquet artifacts — trained models and partition layouts.

One place for the repo-relative artifact layout shared by the trained-ANN
index (`pipeline/similarity.py::build_ivfpq_index`), the partitioned month
layout (`plans/layout.py::build_month_layout`) and the binaryFile PPM
fixtures (`pipeline/multimodal.py::build_ppm_files`):

    artifacts/<kind>/<sf-name>/...

Artifacts are COMMITTED (training/layout generation is deterministic, so
rebuilds are byte-stable) and builders are idempotent behind a marker file —
the train-once/serve-many contract.

ORACLE_SF_DIR: the serve queries' DuckDB oracles must embed a literal
artifact path at registration time (a static SQL string cannot follow the
builder's runtime ``sf_dir``), so they pin to the scale factor the oracle
harness runs at — `SPARK_GRAFT_TEST_SF_DIR`, defaulting to the driver's
comparison scale sf0.01, the same resolution `tests/conftest.py` uses.
Comparing a serve query against its oracle at any OTHER scale requires
setting that env var before import; the Spark side always serves the
runtime ``sf_dir``'s artifact.
"""

from __future__ import annotations

import os
from pathlib import Path

ARTIFACT_ROOT = str(Path(__file__).resolve().parents[1] / "artifacts")

ORACLE_SF_DIR = os.environ.get(
    "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01"
)


def artifact_dir(kind: str, sf_dir: str) -> str:
    """``artifacts/<kind>/<sf-name>`` for a testdata scale directory."""
    return f"{ARTIFACT_ROOT}/{kind}/{Path(sf_dir.rstrip('/')).name}"
