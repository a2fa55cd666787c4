"""CLI entrypoint tests: ``python -m np_data_validation_spark`` exercises
arg parsing, session bring-up, the batch plan, the JSON summary contract,
and checkpointed resume; test_spark_submit_py_files_end_to_end drives the
SAME surface through a real ``spark-submit --py-files npdv.zip`` with the
repo stripped from PYTHONPATH, so packaging (zipimport on driver and
workers) is driver-signed evidence, not a manual claim."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(args: list[str]) -> dict:
    env = {**os.environ, "PYTHONPATH": REPO}
    p = subprocess.run(
        [sys.executable, "-m", "np_data_validation_spark", *args],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd="/tmp",  # outside the repo: packaging must come from PYTHONPATH
    )
    assert p.returncode == 0, p.stderr[-3000:]
    return json.loads(p.stdout.strip().splitlines()[-1])


def test_cli_batch_then_resume(synth_dataset, tmp_path):
    root, labels = synth_dataset
    out = str(tmp_path / "out")
    cmd = [
        "--master", "local[4]",
        "--snapshot", os.path.join(root, "sequences"),
        "--manifest", os.path.join(root, "manifest"),
        "--out", out,
    ]
    s1 = _run_cli(cmd)
    assert s1["mode"] == "batch"
    assert sorted(s1["validated"]) == sorted(labels["source"].unique())
    assert s1["rows"] == labels["doc_id"].nunique()
    assert all(m["partition_status"] in ("pass", "fail") for m in s1["metrics"].values())
    # second submit of the SAME command: checkpoint resume validates nothing
    s2 = _run_cli(cmd)
    assert s2["validated"] == []
    assert sorted(s2["skipped"]) == sorted(s1["validated"])


def test_spark_submit_py_files_end_to_end(synth_dataset, tmp_path):
    """The north-rule deployment surface, end to end and automated: build
    npdv.zip exactly as the README documents, copy the entry file OUT of
    the repo, strip the repo from PYTHONPATH, and drive a full batch
    validation through a real ``spark-submit --py-files`` — the package
    must come from the zip on both the driver (spark-submit prepends
    --py-files to the driver's sys.path) and the python workers. Skipped
    where no spark-submit binary exists."""
    import shutil
    import zipfile

    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        import pytest

        pytest.skip("no spark-submit on PATH")

    pkg_dir = os.path.join(REPO, "np_data_validation_spark")
    zip_path = str(tmp_path / "npdv.zip")
    with zipfile.ZipFile(zip_path, "w") as z:
        for dirpath, _, files in os.walk(pkg_dir):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))
    entry = str(tmp_path / "entry.py")
    shutil.copy(os.path.join(pkg_dir, "__main__.py"), entry)

    root, labels = synth_dataset
    out = str(tmp_path / "out")
    env = {
        k: v for k, v in os.environ.items() if k != "PYTHONPATH"
    }  # the repo must NOT be importable except through the zip
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    p = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--py-files", zip_path,
            entry,
            "--master", "inherit",
            "--snapshot", os.path.join(root, "sequences"),
            "--manifest", os.path.join(root, "manifest"),
            "--out", out,
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(tmp_path),  # outside the repo: no cwd fallback import
    )
    assert p.returncode == 0, (p.stderr[-3000:], p.stdout[-1000:])
    summary = json.loads(p.stdout.strip().splitlines()[-1])
    assert summary["mode"] == "batch"
    assert sorted(summary["validated"]) == sorted(labels["source"].unique())
    assert summary["rows"] == labels["doc_id"].nunique()
    assert all(
        m["partition_status"] in ("pass", "fail")
        for m in summary["metrics"].values()
    )
