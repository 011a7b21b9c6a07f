"""The north rule's submit path, exercised for real: package
``oblate_spark`` into a zip and run ``spark-submit --py-files`` against
a parquet image table in a fresh JVM whose working directory does NOT
contain the repo — so the import genuinely resolves from the zip, the
same way a cluster executor would see it."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_py_files_package(spark, tmp_path):
    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    # package exactly like cluster/submit_validation.py documents
    zip_path = str(tmp_path / "oblate_spark.zip")
    pkg_root = os.path.join(REPO, "oblate_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    zf.write(full, os.path.relpath(full, REPO))

    # small image table via the session spark (fixture defects included)
    from oblate_spark.fixtures import build_images_df

    table = str(tmp_path / "images")
    build_images_df(spark, 400, partitions=4).write.mode("overwrite").parquet(table)

    out = str(tmp_path / "run_out")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "cluster", "submit_validation.py"),
            "--table", table,
            "--out", out,
            "--group-size", "2",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # NOT the repo: import must come from the zip
        env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "completed 2/2 groups" in proc.stdout, proc.stdout[-2000:]
    # the run left a manifest + violation output behind
    assert os.path.isdir(out)
    assert any("manifest" in f or "violations" in f for f in os.listdir(out)), os.listdir(out)
