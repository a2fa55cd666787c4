"""CLI entrypoint tests: ``python -m np_data_validation_spark`` — the same
surface spark-submit drives (verified manually with
``spark-submit --py-files npdv.zip np_data_validation_spark/__main__.py``;
the subprocess here exercises arg parsing, session bring-up, the batch
plan, the JSON summary contract, and checkpointed resume)."""

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
