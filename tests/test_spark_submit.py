"""The north-rule submission clause, proven end-to-end: the packaged
zip alone (``spark-submit --py-files dist/dstlr_spark.zip``) carries
the package to the driver AND the Python workers — no repo checkout on
sys.path anywhere. Reference analog: the sbt-assembly jar the
reference submits (README.md quickstart); our ``--py-files`` zip is
the PySpark equivalent.
"""

import os
import shutil
import subprocess
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def _spark_submit() -> str | None:
    for cand in (
        shutil.which("spark-submit"),
        "/opt/spark/bin/spark-submit",
    ):
        if cand and Path(cand).exists():
            return cand
    return None


def test_spark_submit_py_files_from_foreign_cwd(tmp_path):
    """Build a FRESH dist zip, copy only it + the job file into a tmp
    dir, strip PYTHONPATH, and run a query whose plan includes an
    Arrow ``mapInPandas`` extraction stage (kg_mentions) — so the
    WORKER processes must import dstlr_spark from the shipped zip, not
    from any path leak. A stale-zip failure mode is impossible because
    the zip is rebuilt by the test itself."""
    import pytest

    submit = _spark_submit()
    if submit is None:
        pytest.skip("spark-submit not on this host")

    subprocess.run(
        ["bash", "scripts/package.sh"],
        cwd=REPO, check=True, capture_output=True,
    )
    shutil.copy(REPO / "dist/dstlr_spark.zip", tmp_path / "dstlr_spark.zip")
    shutil.copy(REPO / "jobs/query.py", tmp_path / "query.py")

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [
            submit, "--master", "local[4]",
            "--py-files", "dstlr_spark.zip", "query.py",
            "--name", "kg_mentions",
            "--sf-dir", "/root/testdata/sf0.001",
            "--output", str(tmp_path / "out"),
        ],
        capture_output=True, text=True, cwd=tmp_path, env=env,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "query kg_mentions:" in out.stdout and "rows ->" in out.stdout
    n = int(out.stdout.split("query kg_mentions:")[1].split()[0])
    assert n > 0
