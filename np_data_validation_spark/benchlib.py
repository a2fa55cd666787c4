"""Shared benchmark plumbing: cached synthetic dataset + the timed
full-constraint validation job (the BASELINE.json headline metric).

The bench dataset is generated once per parameter set into /tmp and reused
across runs and parallelism levels, so local[8] vs local[32] time the SAME
bytes (scaling-efficiency evidence requires identical input).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import SparkSession

BENCH_ROWS = int(os.environ.get("NPDV_BENCH_ROWS", "8000000"))
BENCH_MIN_LEN = 8
BENCH_MAX_LEN = 64
BENCH_SEED = 42
BENCH_DATA_VERSION = "v4"  # v4: synth adds duplicate_mixed + renamed_null_ntok


def bench_data_dir(rows: int | None = None) -> str:
    rows = rows or BENCH_ROWS
    tag = f"{BENCH_DATA_VERSION}_{rows}_{BENCH_MIN_LEN}_{BENCH_MAX_LEN}_{BENCH_SEED}"
    return os.path.join("/tmp", f"npdv_bench_{tag}")


def ensure_bench_data(rows: int | None = None) -> str:
    """Generate (once) the deterministic snapshot+manifest at input_hint
    schema. Chunked generation keeps peak memory bounded."""
    rows = rows or BENCH_ROWS
    root = bench_data_dir(rows)
    marker = os.path.join(root, "_COMPLETE")
    if os.path.exists(marker):
        return root
    import numpy as np
    import pyarrow.parquet as pq

    from np_data_validation_spark import synth

    os.makedirs(root, exist_ok=True)
    chunk = 1_000_000
    n_chunks = (rows + chunk - 1) // chunk
    for part in ("sequences", "manifest"):
        os.makedirs(os.path.join(root, part), exist_ok=True)
    for ci in range(n_chunks):
        n = min(chunk, rows - ci * chunk)
        seq, man, _ = synth.generate(
            n_rows=n,
            seed=BENCH_SEED + ci,
            min_len=BENCH_MIN_LEN,
            max_len=BENCH_MAX_LEN,
            id_offset=ci * chunk,
        )
        # one file pair per chunk per source -> plenty of input splits
        for tbl, part in ((seq, "sequences"), (man, "manifest")):
            col = tbl.column("source").to_numpy(zero_copy_only=False)
            for val in np.unique(col):
                import pyarrow as pa

                sub = tbl.filter(pa.array(col == val)).drop_columns(["source"])
                pdir = os.path.join(root, part, f"source={val}")
                os.makedirs(pdir, exist_ok=True)
                # small row groups -> file splitting works at high parallelism
                pq.write_table(sub, os.path.join(pdir, f"chunk-{ci}.parquet"), row_group_size=131072)
    with open(marker, "w") as f:
        json.dump({"rows": rows}, f)
    return root


def run_validation_reps(
    spark: SparkSession,
    data_root: str,
    reps: int = 4,
    hash_method: str = "pandas_udf",
) -> list[dict]:
    """``reps`` in-JVM repetitions of the full validation job with inter-rep
    hygiene (clearCache so plan-matched cache reuse can't fake repeats;
    explicit System.gc() so the ContextCleaner reclaims dead tmpfs shuffle
    files between reps). The FIRST rep of a fresh JVM pays JIT/codegen
    warmup that a steady-state 10^12-row job amortizes in its first seconds
    (measured ~1.7x here) — report a statistic over reps[1:], never rep 0
    alone (the round-3 committed 'regression' was exactly that artifact)."""
    import time as _time

    results = []
    for _ in range(reps):
        results.append(run_validation_job(spark, data_root, hash_method=hash_method))
        spark.catalog.clearCache()
        spark._jvm.System.gc()
        _time.sleep(1)
    return results


def warm_median(results: list[dict]) -> dict:
    """Median-by-throughput rep among the warm reps (all but the first);
    falls back to the only rep when reps == 1."""
    import statistics as _st

    warm = results[1:] or results
    by_rps = sorted(warm, key=lambda r: r["rows_per_sec"])
    med = by_rps[len(by_rps) // 2]
    med = dict(med)
    med["rows_per_sec"] = _st.median(r["rows_per_sec"] for r in warm)
    med["sec"] = _st.median(r["sec"] for r in warm)
    med["all_sec"] = [round(r["sec"], 3) for r in results]
    med["cold_sec"] = round(results[0]["sec"], 3)
    return med


def run_validation_job(
    spark: SparkSession, data_root: str, hash_method: str = "pandas_udf"
) -> dict:
    """One full constraint pass (the metric's 'validated sequences/sec'):
    fingerprint -> manifest join + content probe -> verdict CASE -> rollup +
    violations (verdict/uniqueness/schema) + per-partition stats, all
    materialized via the one-pass plan (plans.onepass): ONE shuffle per
    input side, ONE wide write; probe/violations/stats derive from the
    small rolled table. This IS the production plan — no bench-only
    shortcuts (the probe pays its miss count; uniqueness and schema checks
    included)."""
    import shutil
    import tempfile

    from np_data_validation_spark.plans.onepass import validate_onepass
    from np_data_validation_spark.schema import MANIFEST, SEQUENCES

    # explicit schemas: parquet footer inference is driver-serial fixed
    # cost per job (production jobs declare their table schemas anyway)
    snapshot = spark.read.schema(SEQUENCES).parquet(os.path.join(data_root, "sequences"))
    manifest = spark.read.schema(MANIFEST).parquet(os.path.join(data_root, "manifest"))

    # NPDV_BENCH_WORKDIR lets the scaling bench place job output on tmpfs
    # (a real cluster writes results to a distributed FS whose bandwidth
    # scales with executors; the sandbox's one shared spindle does not).
    out = tempfile.mkdtemp(
        prefix="npdv_job_", dir=os.environ.get("NPDV_BENCH_WORKDIR")
    )
    from concurrent.futures import ThreadPoolExecutor

    t0 = time.time()
    phases = {}
    t = time.time()
    res = validate_onepass(spark, snapshot, manifest, out, hash_method=hash_method)
    phases["rolled_write"] = round(time.time() - t, 2)
    t = time.time()
    # violations and stats are independent reads of the written pair/identity
    # tables — run them concurrently (serial driver-side derive phases are
    # fixed cost that erodes high-parallelism scaling efficiency)
    with ThreadPoolExecutor(max_workers=2) as pool:
        vf = pool.submit(res.violations.count)
        sf = pool.submit(res.stats.count)
        n_viol, stats_rows = vf.result(), sf.result()
    phases["derive"] = round(time.time() - t, 2)
    dt = time.time() - t0
    n_rows = res.n_rows
    shutil.rmtree(out, ignore_errors=True)
    return {
        "rows": n_rows,
        "violations": n_viol,
        "stats_rows": stats_rows,
        "sec": dt,
        "rows_per_sec": n_rows / dt,
        "hash_method": hash_method,
        "phases": phases,
    }
