"""Per-partition validation state: lineage + metrics + resume gate.

The reference resumes by re-running and skipping inserts that already have a
SELF match (dedup-on-insert, /root/reference/data_validation.py:728-734) —
idempotent but it still RESCANS everything. Here state is explicit: one row
per (partition, run) appended to ``<out>/_validation_state``; at startup the
pending set = all partitions minus those whose latest state is ``done`` with
a matching input fingerprint. Pruned partitions are never scanned (the
``source IN (pending)`` predicate hits the hive-partition layout).

Atomicity without Iceberg transactions (SURVEY.md §7.3 hard part 4): result
parquet is written FIRST (dynamic partition overwrite, so a re-run of a
failed partition replaces its output), the ``done`` state row is appended
LAST. A crash between the two re-runs the partition; output overwrite makes
that idempotent.

Iceberg deployment shape (design note — the sandbox has no
iceberg-spark-runtime jar and no network to fetch one, so this seam is
documented rather than integration-tested; everything below is plain
public Iceberg-on-Spark usage):

* Catalog: ``spark.sql.catalog.val = org.apache.iceberg.spark.SparkCatalog``
  with a hive/glue/rest catalog impl; tables ``val.verdicts`` and
  ``val.violations`` partitioned by ``_part`` (identity transform on the
  snapshot's ``source``), ``val.state`` unpartitioned, ordered by
  ``partition``.
* Results commit — one atomic, snapshot-isolated replacement per table,
  which subsumes BOTH halves of the parquet path's
  ``_clear_partitions`` + dynamic-overwrite dance (an Iceberg partition
  overwrite that writes zero rows for a partition still drops that
  partition's old files)::

      rolled.writeTo("val.verdicts").overwritePartitions()
      violations.writeTo("val.violations").overwritePartitions()

* State commit — latest-row-per-partition becomes a keyed upsert instead
  of append-then-window (read_state's window collapses away)::

      MERGE INTO val.state s
      USING batch_state b            -- one row per partition in the batch
      ON s.partition = b.partition
      WHEN MATCHED THEN UPDATE SET
        status = b.status, run_id = b.run_id, metrics = b.metrics,
        lineage = b.lineage, finished_at = b.finished_at
      WHEN NOT MATCHED THEN INSERT *

* Cross-table atomicity: OSS Spark SQL has no multi-table Iceberg
  transaction, so the engine KEEPS its results-first / state-last
  ordering and idempotent-replay contract — each commit is now
  individually atomic (no torn parquet directories), and a crash between
  the verdicts commit and the state MERGE replays the batch exactly as
  today. Where stronger coupling is wanted, the write-audit-publish
  pattern applies unchanged: stage all three writes on a branch
  (``spark.wap.branch``), validate, then fast-forward the branch to main
  as the single publish step.
* Resume reads ``val.state``'s current snapshot (one keyed scan, no
  window); the superseded states the parquet path keeps as history are
  recovered via snapshot time-travel instead
  (``VERSION AS OF``), which also gives the audit trail a retention knob
  (``expire_snapshots``) in place of _prune_audit_dirs.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from np_data_validation_spark.schema import VALIDATION_STATE

STATE_DIR = "_validation_state"


def state_path(out_dir: str) -> str:
    return os.path.join(out_dir, STATE_DIR)


def read_state(spark: SparkSession, out_dir: str) -> DataFrame:
    """Latest state row per partition (empty frame if no state yet)."""
    path = state_path(out_dir)
    try:
        raw = spark.read.schema(VALIDATION_STATE).parquet(path)
    except Exception:
        return spark.createDataFrame([], VALIDATION_STATE)
    w = Window.partitionBy("partition").orderBy(F.col("finished_at").desc())
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def done_partitions(
    spark: SparkSession,
    out_dir: str,
    fingerprints: dict[str, str] | None = None,
    code_version: str | None = None,
) -> set[str]:
    """Partitions whose latest state is done — and, when fingerprints of the
    current input are supplied, whose recorded input fingerprint still
    matches (changed input invalidates the checkpoint, reference X4
    memoization semantics). When ``code_version`` is supplied, the recorded
    lineage must match it too: bumping engine.CODE_VERSION re-runs every
    checkpoint written under older verdict/constraint semantics."""
    rows = read_state(spark, out_dir).filter(F.col("status") == "done").collect()
    done = set()
    for r in rows:
        if fingerprints is not None or code_version is not None:
            try:
                lineage = json.loads(r["lineage"] or "{}")
            except json.JSONDecodeError:
                continue
            if fingerprints is not None and lineage.get(
                "input_fingerprint"
            ) != fingerprints.get(r["partition"]):
                continue
            if code_version is not None and lineage.get("code_version") != code_version:
                continue
        done.add(r["partition"])
    return done


def write_state_rows(
    spark: SparkSession,
    out_dir: str,
    rows: list[dict],
    run_id: str | None = None,
) -> str:
    """Append state rows (one commit per call — the LAST step of a batch)."""
    run_id = run_id or uuid.uuid4().hex
    df = spark.createDataFrame(
        [
            {
                "partition": r["partition"],
                "status": r.get("status", "done"),
                "run_id": run_id,
                "metrics": json.dumps(r.get("metrics", {}), sort_keys=True),
                "lineage": json.dumps(r.get("lineage", {}), sort_keys=True),
            }
            for r in rows
        ],
        schema="partition string, status string, run_id string, metrics string, lineage string",
    ).withColumn("finished_at", F.current_timestamp())
    df.write.mode("append").parquet(state_path(out_dir))
    return run_id


def input_fingerprints(
    snapshot: DataFrame,
    content_aware: bool = False,
    hash_method: str = "pandas_udf",
) -> dict[str, str]:
    """Per-partition input fingerprint for resume gating.

    Default (cheap): row count + n_tok sum + doc_id hash-sum — one aggregate
    scan, NO token payload read (column pruning keeps the parquet scan to 3
    light columns). LIMITATION: an in-place content-only token corruption
    (same rows, same lengths, same ids — the engine's primary detection
    target) leaves this fingerprint unchanged, so a resumed run skips the
    partition as done. Set ``content_aware=True`` to fold a payload hash
    into the fingerprint (one full payload scan — roughly the cost of the
    validation pass itself); use it when checkpoints must be invalidated by
    silent payload mutation rather than by new/changed rows.

    The content component is ``bit_xor(xxhash64(doc_id, tok_hash))`` with
    ``tok_hash`` being the engine's OWN validation hash of the token array:

    * identity and content are hashed JOINTLY, so a silent cross-row SWAP of
      token payloads within a partition (every per-column aggregate
      unchanged) still changes the fingerprint — a content-only xor
      (``bit_xor(xxhash64(tokens))``) is permutation-blind;
    * the exact same value is derivable from the one-pass plan's written
      identity table (``fingerprints_from_identities``), so a first run
      records content-aware fingerprints with ZERO extra payload scans —
      the validation pass itself is the fingerprint scan.
    """
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.sum("n_tok").alias("s"),
        # xor-fold: order-independent, overflow-free under ANSI mode
        F.expr("bit_xor(xxhash64(doc_id))").alias("h"),
    ]
    src = snapshot
    if content_aware:
        from np_data_validation_spark.functions.hashing import with_tok_hash

        src = with_tok_hash(snapshot, method=hash_method)
        aggs.append(F.expr("bit_xor(xxhash64(doc_id, tok_hash))").alias("c"))
    rows = src.groupBy("source").agg(*aggs).collect()
    if content_aware:
        return {r["source"]: f"{r['n']}:{r['s']}:{r['h']}:{r['c']}" for r in rows}
    return {r["source"]: f"{r['n']}:{r['s']}:{r['h']}" for r in rows}


def content_fingerprints(
    snapshot: DataFrame, partitions: list[str], hash_method: str = "pandas_udf"
) -> dict[str, str]:
    """Content-aware fingerprints for a SUBSET of partitions (partition-
    pruned payload scan). Resume gating only re-hashes partitions that have
    a plausible 'done' checkpoint; everything else is validated anyway and
    gets its fingerprint for free from the pair table."""
    sub = snapshot.filter(F.col("source").isin(list(partitions)))
    return input_fingerprints(sub, content_aware=True, hash_method=hash_method)


def fingerprints_from_identities(ids: DataFrame) -> dict[str, str]:
    """Post-validation content-aware fingerprints derived from the one-pass
    identity table (doc_id, source, n_tok, tok_hash, s_mult) — ZERO payload
    rescan (round-3 advice: content-aware first runs previously paid two
    full payload scans, one for the fingerprint and one for validation).

    Exactly equals ``input_fingerprints(content_aware=True)`` on the same
    input: a value xor-folded over raw rows equals the xor over identities
    of that value taken when s_mult is ODD (even multiplicities cancel in
    xor; identities sharing a hashed value compose associatively)."""
    mult = F.col("s_mult")
    rows = (
        ids.groupBy("source")
        .agg(
            F.sum(mult).alias("n"),
            F.sum(F.col("n_tok").cast("long") * mult).alias("s"),
            F.expr(
                "bit_xor(CASE WHEN s_mult % 2 = 1 THEN xxhash64(doc_id) ELSE 0L END)"
            ).alias("h"),
            F.expr(
                "bit_xor(CASE WHEN s_mult % 2 = 1"
                " THEN xxhash64(doc_id, tok_hash) ELSE 0L END)"
            ).alias("c"),
        )
        .collect()
    )
    return {r["source"]: f"{r['n']}:{r['s']}:{r['h']}:{r['c']}" for r in rows}


def recorded_lineage(spark: SparkSession, out_dir: str) -> dict[str, dict]:
    """Latest 'done' lineage dict per partition (empty on no/bad state)."""
    rows = read_state(spark, out_dir).filter(F.col("status") == "done").collect()
    out: dict[str, dict] = {}
    for r in rows:
        try:
            out[r["partition"]] = json.loads(r["lineage"] or "{}")
        except json.JSONDecodeError:
            continue
    return out
