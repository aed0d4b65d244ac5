"""North-rule launch path: `spark-submit --py-files gcs.zip main.py ...`.

Everything else in the suite drives the engine in-process; this test pins
the production launch shape — the package imported from a --py-files zip
(not from the repo checkout), a fresh driver JVM, the CLI, and the
published output tables. Runs a tiny synthetic crawl end-to-end.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _zip_package(dest: str) -> None:
    pkg = os.path.join(REPO, "go_crawler_spark")
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for fn in files:
                if fn.endswith(".pyc"):
                    continue
                full = os.path.join(root, fn)
                zf.write(full, os.path.relpath(full, REPO))


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_spark_submit_pyfiles_crawl(tmp_path):
    zip_path = str(tmp_path / "gcs.zip")
    _zip_package(zip_path)
    out_dir = str(tmp_path / "out")

    env = dict(os.environ)
    # the package must resolve from the --py-files zip, not the checkout:
    # strip PYTHONPATH AND run a COPY of main.py from tmp_path — python
    # puts the primary script's directory on sys.path, so submitting
    # REPO/main.py would silently let driver-side imports fall back to
    # the checkout and a broken zip would go unnoticed
    env.pop("PYTHONPATH", None)
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    shutil.copy(os.path.join(REPO, "main.py"), str(tmp_path / "main.py"))

    pr = subprocess.run(
        [
            "spark-submit",
            "--master", "local[2]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zip_path,
            str(tmp_path / "main.py"),
            "--synthetic-pages", "48",
            "--max-count", "30",
            "--output", out_dir,
        ],
        cwd=str(tmp_path),  # NOT the repo: imports must come from the zip
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert pr.returncode == 0, pr.stderr[-4000:]

    summary = json.loads(
        [l for l in pr.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert summary["urls_scheduled"] > 0
    assert summary["pages_fetched"] > 0

    import duckdb

    con = duckdb.connect()
    n_sched = con.sql(
        f"SELECT count(*) FROM read_parquet('{out_dir}/schedule/*.parquet')"
    ).fetchone()[0]
    assert n_sched == summary["urls_scheduled"]
    # seq is the contiguous global FIFO order (Q3)
    lo, hi, n = con.sql(
        f"SELECT min(seq), max(seq), count(DISTINCT seq) "
        f"FROM read_parquet('{out_dir}/schedule/*.parquet')"
    ).fetchone()
    assert (lo, hi, n) == (0, n_sched - 1, n_sched)
