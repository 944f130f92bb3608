"""Differential test: every registered query vs its DuckDB oracle at sf0.01 —
the local mirror of the driver's CORRECTNESS gate.

``SPARK_GRAFT_ORACLE_SHARD=i/n`` restricts collection to the queries
whose md5(name) is congruent to i mod n, so ``partest.py`` can split
this battery — by far the suite's longest serial leg — across
concurrent worker processes.  HASH-STABLE dealing (r15): a query's
shard depends only on its own name, so registering new queries never
re-deals existing members and the committed per-worker walls stay
honest.  Unset (the default, and CI) collects everything."""

from __future__ import annotations

import hashlib
import os

import pytest

from auron_spark.registry import load_all
from tests.conftest import (
    SF_DIR,
    assert_matches_oracle,
    assert_oracle_scale_consistent,
)

SPECS = load_all()

_NAMES = sorted(SPECS)
_SHARD = os.environ.get("SPARK_GRAFT_ORACLE_SHARD")
if _SHARD:
    _i, _n = (int(x) for x in _SHARD.split("/"))
    _NAMES = [
        q for q in _NAMES
        if int(hashlib.md5(q.encode()).hexdigest(), 16) % _n == _i
    ]


@pytest.mark.parametrize("name", _NAMES)
def test_query_vs_oracle(name, spark, oracle):
    spec = SPECS[name]
    assert_oracle_scale_consistent(spec, SF_DIR)
    df = spec.build(spark, SF_DIR)
    if spec.oracle is None:
        # rows-only check: runs, has a stable schema, returns >= 0 rows
        rows = df.collect()
        assert rows is not None
        assert len(df.columns) > 0
    else:
        assert_matches_oracle(df, oracle, spec.oracle, name)
