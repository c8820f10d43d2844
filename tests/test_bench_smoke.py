"""Every bench query must BUILD and EXECUTE at tiny scale: bench.py is the
driver's per-round measurement surface, so a broken query there would
otherwise only surface in the recorded round artifact, not in CI."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import CALIB, QUERIES  # noqa: E402


@pytest.mark.parametrize("name", sorted(QUERIES) + sorted(CALIB))
def test_bench_query_runs(spark, sf_dir, name, monkeypatch):
    # the jvm-scan probe's aggregate runs its FULL range regardless of the
    # limit(5) below — shrink it so the smoke test stays a smoke test
    monkeypatch.setenv("SPARK_GRAFT_CALIB_ROWS", "1000000")
    df = (QUERIES.get(name) or CALIB[name])(spark, sf_dir)
    # execute a bounded slice end-to-end (schema resolution + first tasks)
    rows = df.limit(5).collect()
    assert len(df.columns) > 0
    assert rows is not None
