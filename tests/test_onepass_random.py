"""Randomized one-pass vs validate_batch equivalence sweep.

The labeled fixture is shaped: every fault class appears, but only in the
combinations synth injects. ADVICE r2 found two real bugs precisely in
shapes the fixture lacked (mixed-identity duplicate groups; null identity
columns through the probe). This sweep generates adversarially dense random
tables — heavy doc_id collisions, null tokens / null n_tok, wrong n_tok,
renamed + cross-content manifest rows, random hash noise — and asserts the
one-pass plan equals the two-stage reference plan row for row on rolled
verdicts AND violations. Seeds are fixed: failures reproduce exactly.
"""

from __future__ import annotations

import numpy as np
import pytest

from np_data_validation_spark.functions.hashing import with_tok_hash
from np_data_validation_spark.plans import onepass
from np_data_validation_spark.plans.engine import validate_batch


def _rand_tables(spark, seed: int):
    rng = np.random.default_rng(seed)
    n = 300
    doc_pool = [f"d{i}" for i in range(120)]  # ~2.5x collisions per doc_id
    srcs = ["s1", "s2"]
    rows = []
    for _ in range(n):
        doc = doc_pool[int(rng.integers(len(doc_pool)))]
        src = srcs[int(rng.integers(2))]
        if rng.random() < 0.10:
            toks = None
        else:
            # tiny arrays over a tiny vocab: cross-subject content collisions
            # are common, exercising probe/collision branches hard
            toks = [int(v) for v in rng.integers(0, 50, size=int(rng.integers(1, 6)))]
        r = rng.random()
        if r < 0.15:
            n_tok = None
        elif r < 0.85 and toks is not None:
            n_tok = len(toks)
        else:
            n_tok = int(rng.integers(1, 8))
        rows.append((doc, toks, n_tok, src))
    snap = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string"
    )

    hashed = with_tok_hash(snap).select("doc_id", "source", "n_tok", "tok_hash").collect()
    man_rows = []
    for r in hashed:
        if rng.random() < 0.35:
            continue  # missing counterpart
        doc = r["doc_id"] + ("_r" if rng.random() < 0.2 else "")
        src = r["source"] if rng.random() < 0.5 else "s3"
        if rng.random() < 0.8:
            ntk = r["n_tok"]
        else:
            ntk = None if rng.random() < 0.3 else int(rng.integers(1, 8))
        if rng.random() < 0.8:
            h = r["tok_hash"]
        else:
            h = None if rng.random() < 0.3 else int(rng.integers(-(2**40), 2**40))
        man_rows.append((doc, ntk, h, src))
    man = spark.createDataFrame(
        man_rows, "doc_id string, n_tok int, tok_hash long, source string"
    )
    return snap, man


def _key(df, cols):
    return sorted(
        tuple((v is None, v) for v in (r[c] for c in cols)) for r in df.collect()
    )


@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_onepass_equivalence_random(spark, tmp_path, seed):
    snap, man = _rand_tables(spark, seed)
    res = onepass.validate_onepass(spark, snap, man, str(tmp_path / f"w{seed}"))
    rolled_ref, viols_ref, _ = validate_batch(snap, man, persist=True)
    cols = onepass.ROLLED_PUBLIC_COLS
    assert _key(res.rolled, cols) == _key(rolled_ref.select(*cols), cols)
    vcols = ["doc_id", "source", "violation", "detail"]
    assert _key(res.violations, vcols) == _key(viols_ref.select(*vcols), vcols)


@pytest.mark.parametrize("seed", [515, 626])
def test_probe_salted_equivalence_random(spark, tmp_path, seed):
    """The salted probe join (manifest-side skew guard) must be
    pair-multiset identical to the plain shuffle join on adversarially
    dense inputs — hash collisions, null hashes, renamed counterparts —
    not just the labeled mass-dup fixture."""
    from np_data_validation_spark.operators import verdicts as V

    snap, man = _rand_tables(spark, seed)
    s1_path = str(tmp_path / f"s1_{seed}")
    onepass.pairs_stage1(snap, man).write.parquet(s1_path)
    s1 = spark.read.parquet(s1_path)
    forced = V.PROBE_BROADCAST_MAX + 1  # force the shuffle branch
    salted, _, sflag = onepass.probe_pairs_from(
        spark, s1, man, n_miss=forced, manifest_hot=True
    )
    plain, _, pflag = onepass.probe_pairs_from(
        spark, s1, man, n_miss=forced, manifest_hot=False
    )
    assert sflag and not pflag
    cols = onepass.PAIR_COLS
    assert _key(salted, cols) == _key(plain, cols)
