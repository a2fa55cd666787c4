"""Checkpoint/resume tests — FIXTURES.md resume fixture: kill between
partitions, re-run, identical results, no rescan of done partitions."""

import json
import os

import pytest
from pyspark.sql import functions as F

from np_data_validation_spark.plans import checkpoint as CP
from np_data_validation_spark.plans import engine as E


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "out")


def paths(synth_dataset):
    root, labels = synth_dataset
    return os.path.join(root, "sequences"), os.path.join(root, "manifest"), labels


def test_full_run_then_noop_resume(spark, synth_dataset, out_dir):
    snap_p, man_p, labels = paths(synth_dataset)
    r1 = E.run_validation(spark, snap_p, man_p, out_dir)
    assert sorted(r1.validated_partitions) == sorted(labels["source"].unique())
    # rollup is per distinct (doc_id, source) subject: duplicates collapse
    assert r1.total_rows == labels["doc_id"].nunique()
    # all partitions done -> resume validates nothing
    r2 = E.run_validation(spark, snap_p, man_p, out_dir)
    assert r2.validated_partitions == []
    assert sorted(r2.skipped_partitions) == sorted(r1.validated_partitions)


def test_partial_run_resumes_pending_only(spark, synth_dataset, out_dir):
    snap_p, man_p, labels = paths(synth_dataset)
    all_parts = sorted(labels["source"].unique())

    # simulate a killed run: mark 2 of 4 partitions done by hand, with the
    # true input fingerprints (as a crashed-after-2-commits run would have)
    snapshot = spark.read.parquet(snap_p)
    fps = CP.input_fingerprints(snapshot)
    CP.write_state_rows(
        spark,
        out_dir,
        [
            {"partition": p, "status": "done",
             "metrics": {"rows": -1},
             "lineage": {"input_fingerprint": fps[p],
                         "code_version": E.CODE_VERSION}}
            for p in all_parts[:2]
        ],
    )
    r = E.run_validation(spark, snap_p, man_p, out_dir)
    assert sorted(r.validated_partitions) == all_parts[2:]
    assert sorted(r.skipped_partitions) == all_parts[:2]


def test_changed_input_invalidates_checkpoint(spark, synth_dataset, out_dir):
    snap_p, man_p, labels = paths(synth_dataset)
    all_parts = sorted(labels["source"].unique())
    CP.write_state_rows(
        spark,
        out_dir,
        [{"partition": all_parts[0], "status": "done",
          "metrics": {}, "lineage": {"input_fingerprint": "stale:0:0"}}],
    )
    r = E.run_validation(spark, snap_p, man_p, out_dir)
    # stale fingerprint -> partition re-validated despite 'done' status
    assert all_parts[0] in r.validated_partitions


def test_resume_produces_identical_results(spark, synth_dataset, tmp_path):
    snap_p, man_p, _ = paths(synth_dataset)
    out_a, out_b = str(tmp_path / "a"), str(tmp_path / "b")
    E.run_validation(spark, snap_p, man_p, out_a)  # one shot
    E.run_validation(spark, snap_p, man_p, out_b, commit_batch=1)  # 4 commits
    va = spark.read.parquet(os.path.join(out_a, "violations"))
    vb = spark.read.parquet(os.path.join(out_b, "violations"))
    a = sorted((r["doc_id"], r["violation"]) for r in va.collect())
    b = sorted((r["doc_id"], r["violation"]) for r in vb.collect())
    assert a == b
    ra = spark.read.parquet(os.path.join(out_a, "verdicts"))
    rb = spark.read.parquet(os.path.join(out_b, "verdicts"))
    assert sorted(
        (r["doc_id"], r["final_verdict_code"]) for r in ra.collect()
    ) == sorted((r["doc_id"], r["final_verdict_code"]) for r in rb.collect())


def test_content_aware_resume_sees_in_place_corruption(spark, synth_dataset, tmp_path):
    """In-place token corruption (same rows, same lengths, same doc_ids) is
    invisible to the metadata-cheap fingerprint but must re-validate under
    content_aware=True (the reference's re-checksum doctrine,
    /root/reference/data_validation.py:487-496)."""
    import glob
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    root, _ = synth_dataset
    snap_p = str(tmp_path / "sequences")
    shutil.copytree(os.path.join(root, "sequences"), snap_p)
    man_p = os.path.join(root, "manifest")
    out_plain, out_ca = str(tmp_path / "plain"), str(tmp_path / "ca")
    E.run_validation(spark, snap_p, man_p, out_plain)
    E.run_validation(spark, snap_p, man_p, out_ca, content_aware=True)

    # flip one token in one partition file, preserving length and ids
    f = sorted(glob.glob(os.path.join(snap_p, "source=*", "*.parquet")))[0]
    part = os.path.basename(os.path.dirname(f)).split("=", 1)[1]
    tbl = pq.read_table(f)
    toks = tbl.column("tokens").to_pylist()
    i = next(i for i, t in enumerate(toks) if t)
    toks[i] = [toks[i][0] ^ 1] + toks[i][1:]
    tbl = tbl.set_column(
        tbl.schema.get_field_index("tokens"),
        "tokens",
        pa.array(toks, type=tbl.schema.field("tokens").type),
    )
    pq.write_table(tbl, f)

    r_plain = E.run_validation(spark, snap_p, man_p, out_plain)
    assert r_plain.validated_partitions == []  # cheap fingerprint blind to it
    r_ca = E.run_validation(spark, snap_p, man_p, out_ca, content_aware=True)
    assert r_ca.validated_partitions == [part]  # payload hash catches it


def test_state_metrics_recorded(spark, synth_dataset, out_dir):
    snap_p, man_p, labels = paths(synth_dataset)
    E.run_validation(spark, snap_p, man_p, out_dir)
    state = CP.read_state(spark, out_dir).collect()
    assert len(state) == labels["source"].nunique()
    for row in state:
        m = json.loads(row["metrics"])
        lin = json.loads(row["lineage"])
        assert m["rows"] > 0
        assert m["partition_status"] in ("pass", "fail")
        assert ":" in lin["input_fingerprint"]
        assert lin["code_version"] == E.CODE_VERSION
    # every partition has faults injected -> all should fail
    assert all(json.loads(r["metrics"])["partition_status"] == "fail" for r in state)


def test_manifest_audit_written(spark, synth_dataset, out_dir):
    snap_p, man_p, labels = paths(synth_dataset)
    E.run_validation(spark, snap_p, man_p, out_dir)
    mv = spark.read.parquet(os.path.join(out_dir, "manifest_violations"))
    classes = {r["violation"] for r in mv.select("violation").distinct().collect()}
    assert classes == {"INCONSISTENT_GROUP", "MISSING_IN_SNAPSHOT"}
