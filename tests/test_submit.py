"""spark-submit --py-files packaging (north rule: "the whole job runs
via spark-submit --py-files"): the KG pipeline must run from the zipped
package under a real spark-submit, with the master taken from the
submit command line, not hardcoded (session.get_spark defers to the
gateway when PYSPARK_GATEWAY_PORT is set)."""

from __future__ import annotations

import os
import shutil
import subprocess

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
)
def test_submit_pipeline_py_files(tmp_path):
    workdir = tmp_path / "kg_run"
    env = dict(os.environ)
    env.update(
        SPARK_GRAFT_MASTER="local[4]",
        SPARK_GRAFT_SHUFFLE="8",
        # tiny corpus: this is a packaging test, not a perf test
    )
    proc = subprocess.run(
        [
            os.path.join(REPO, "scripts", "submit_pipeline.sh"),
            "--n-files",
            "200",
            "--workdir",
            str(workdir),
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    # resumable-run evidence: every stage checkpointed data + manifest
    for stage in ("10_extract", "20_link", "30_canonicalize"):
        assert (workdir / stage / "manifest.json").exists(), stage
        assert (workdir / stage / "data").exists(), stage
    assert (workdir / "40_materialize" / "data").exists()
    assert (workdir / "40_materialize" / "frames").exists()
