"""North-rule delivery path: ``spark-submit --py-files dist/engine.zip``.

Proves the zip built by tools/package.py is self-contained: crawl.py and
engine.zip are copied into an EMPTY temp dir (the repo root is not
importable from there, and PYTHONPATH is stripped), and a short demo crawl
runs end-to-end under the real ``spark-submit`` launcher — the exact
delivery path named by BASELINE.json for multi-executor clusters.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pyspark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_spark_submit_py_files_zip(tmp_path):
    # build dist zip into the temp dir (never dirties the repo)
    build_out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "package.py")],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    zip_src = build_out.stdout.strip().splitlines()[-1]
    shutil.copy(zip_src, tmp_path / "engine.zip")
    shutil.copy(os.path.join(REPO, "crawl.py"), tmp_path / "crawl.py")

    spark_submit = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY import source
    proc = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--driver-memory", "4g",
            "--py-files", "engine.zip",
            "crawl.py",
            "--demo", "--pages-n", "300", "--max-rounds", "3",
            "--root", str(tmp_path / "root"), "--cores", "4",
        ],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (proc.stdout[-1000:], proc.stderr[-3000:])
    json_lines = [
        ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")
    ]
    assert json_lines, proc.stdout[-1000:]
    result = json.loads(json_lines[-1])
    assert result["rounds"] >= 1 and result["fetched"] > 0
    # the crawl actually committed snapshot tables under --root
    assert (tmp_path / "root" / "results").exists()
