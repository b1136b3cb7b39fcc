"""north_rule deployment path: ``spark-submit --py-files <pkg.zip>
run_crawl.py`` must run a resumable crawl with ONLY the zipped package on
the python path (the multi-executor-cluster ship shape; reference analog:
``python scan.py <site>``, scan.py:77-124)."""

from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import zipfile

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="spark-submit not installed"
)
def test_spark_submit_py_files_crawl(tmp_path):
    zip_path = str(tmp_path / "colymer_acquirers_spark.zip")
    pkg = os.path.join(REPO, "colymer_acquirers_spark")
    with zipfile.ZipFile(zip_path, "w") as z:
        for root, _, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    # neutral stage dir: run_crawl.py's sys.path points at the stage, so
    # the package resolves ONLY through --py-files
    stage = tmp_path / "stage"
    stage.mkdir()
    shutil.copy(os.path.join(REPO, "run_crawl.py"), stage / "run_crawl.py")
    wd = str(tmp_path / "wd")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [
            SPARK_SUBMIT, "--master", "local[2]", "--py-files", zip_path,
            str(stage / "run_crawl.py"), "--synth", "150",
            "--workdir", wd, "--rounds", "2", "--fast-metrics",
        ],
        cwd=str(stage), env=env, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])

    # committed rounds with monotone global ranks, readable without Spark
    manifests = sorted(glob.glob(os.path.join(wd, "rounds", "*", "manifest.json")))
    assert len(manifests) == 2, manifests
    for m in manifests:
        assert json.load(open(m)).get("round") is not None
    orders = glob.glob(os.path.join(wd, "rounds", "*", "crawl_order", "*.parquet"))
    assert orders
    ranks = [
        row[0]
        for row in duckdb.sql(
            f"SELECT rank FROM read_parquet({orders!r}) ORDER BY rank"
        ).fetchall()
    ]
    assert ranks == list(range(len(ranks))) and len(ranks) > 0
