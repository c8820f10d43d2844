"""North-rule launch path: the engine runs via ``spark-submit --py-files``
with the library shipped as a zip — the cluster deployment form (each
executor unpacks the zip onto its PYTHONPATH; no repo checkout assumed).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def test_spark_submit_py_files_runs_registered_query(tmp_path):
    spark_submit = shutil.which("spark-submit") or str(
        Path(sys.executable).parent / "spark-submit"
    )
    if not Path(spark_submit).exists():
        import pytest

        pytest.skip("spark-submit not on PATH in this environment")

    zip_path = tmp_path / "gcs.zip"
    pkg = REPO / "gstools_core_spark"
    with zipfile.ZipFile(zip_path, "w") as zf:
        for p in pkg.rglob("*.py"):
            zf.write(p, p.relative_to(REPO))

    out = subprocess.run(
        [
            spark_submit,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", str(zip_path),
            str(REPO / "tools" / "submit_job.py"),
            "--query", "rasterize",
            "--sf-dir", "/root/testdata/sf0.001",
            "--out", str(tmp_path / "raster_out"),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        # drop the repo from PYTHONPATH/cwd so the import can ONLY come
        # from the shipped zip
        cwd=str(tmp_path),
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
    )
    assert out.returncode == 0, out.stderr[-3000:]
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    res = json.loads(line)
    assert res["query"] == "rasterize" and res["rows"] > 0
    # the parquet sink is real output, not just a count
    assert any((tmp_path / "raster_out").glob("*.parquet"))
