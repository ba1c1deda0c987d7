"""spark-submit --py-files launch path (north rule): the engine must run
as a submitted job on real executor JVMs that receive the code only
through the --py-files archive."""

import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit"
)


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not available")
def test_spark_submit_pyfiles(tmp_path):
    zip_path = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "submit_job.py"), "--make-pyfiles"],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    assert zip_path.endswith("pda_spark.zip") and os.path.exists(zip_path)

    out_dir = str(tmp_path / "q41_out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the archive must be self-contained
    r = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local-cluster[2,2,2048]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_job.py"),
            "--query", "q41_pip_join",
            "--sf-dir", "/root/testdata/sf0.001",
            "--output", out_dir,
        ],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "RESULT_ROWS=5" in r.stdout, r.stdout[-2000:]
