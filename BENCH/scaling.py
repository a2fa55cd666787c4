"""Scaling-efficiency evidence for BASELINE.json's north rule.

The rule's two-cluster-size criterion (>=0.8 efficiency from N to 4N
executors) cannot use a real cluster in this sandbox; per SURVEY.md §6 the
evidence is the SAME job on the SAME input at local[N] and local[4N],
reporting throughput at both plus
    eff = rows_per_sec(4N) / (4 * rows_per_sec(N)).

Statistic (round-3 hardening): each ROUND runs a fresh JVM per level with
several in-JVM repetitions (the first ~3 pay JIT/codegen warmup a
steady-state 10^12-row job amortizes in its first seconds); the round's
estimate is its best warm run. The REPORTED number is the MEDIAN of the
per-round bests across >=3 interleaved rounds — robust to one lucky or one
unlucky round, unlike the previous global best-of. All per-run times, GC
deltas and tmpfs deltas are printed and committed in BENCH/BASELINE.md.

Steal qualification (round-6 hardening, VERDICT r5 task #1): this sandbox
is a shared VM where CPU steal arrives in multi-minute waves that suppress
whichever level happens to be running (r5 measured 2.6-4.9 host cores
stolen during its FAIL-reading runs). Each rep therefore records its own
/proc/stat steal delta; the round's estimate is its best rep WITHIN the
steal budget (benchlib.STEAL_BUDGET_FRAC, default 5% of wall), a
level-round with no qualifying rep is discarded and re-run (bounded
--steal-retries), and BASELINE.md is only ever written from a run whose
every round is steal-qualified — a degraded run writes BASELINE_SMOKE.md
and leaves the standing gate evidence untouched.

Each parallelism level runs in a fresh subprocess (Spark fixes master/conf
at the first getOrCreate per JVM). Results land in BENCH/BASELINE.md.

Crash resumability: a full gate run is ~100 minutes of measurements and the
sandbox can kill the process tree between operator sessions (three round-6
launches died mid-run this way, losing every completed level-round). Each
completed level-round is therefore appended to a JSONL state file keyed by
the run configuration; a relaunch with the same configuration skips the
rounds already measured (each level-round is an independent fresh-JVM
subprocess, so resuming changes nothing about the statistic). Delete the
state file (or pass --fresh) to force a from-scratch run.

Usage:  python BENCH/scaling.py [--n 4 --xn 16 --runs 3 --reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Qualification floor for committing BENCH/BASELINE.md: below either bound
#: the job is fixed-cost dominated (the round-3 failure mode was a 2M-row
#: --runs 1 smoke run committed OVER the gate evidence, reading 0.270) and
#: the result measures nothing. Non-qualifying runs write BASELINE_SMOKE.md.
GATE_MIN_ROWS = 48_000_000
GATE_MIN_RUNS = 3

WORKER = """
import json, os, shutil, sys, time
sys.path.insert(0, {repo!r})
os.environ.setdefault("NPDV_BENCH_WORKDIR", "/dev/shm")
from np_data_validation_spark import benchlib
from np_data_validation_spark.benchlib import _dir_mb as dir_mb
from np_data_validation_spark.benchlib import _steal_ms as steal_ms
from np_data_validation_spark.session import get_spark
cpus = int(sys.argv[1])
reps = int(sys.argv[2])
# Config scales with the level exactly as a real N -> 4N executor cluster
# would: heap and shuffle partitions proportional to cores (each "executor"
# is fixed-size; 4x executors = 4x memory and 4x default parallelism). AQE
# stays ON at both levels — skew splitting + partition coalescing are part
# of the measured production configuration (north_rule). Shuffle goes to
# tmpfs: on a real cluster shuffle lands on per-executor local SSDs whose
# aggregate bandwidth grows with the executor count; a single shared spindle
# under-models BOTH levels and its fixed bandwidth would dominate the
# comparison.
shuffle_dir = f"/dev/shm/npdv_shuffle_{{cpus}}"
spark = get_spark(app_name=f"npdv-scaling-{{cpus}}", cpus=cpus,
                  shuffle_partitions=4 * cpus,
                  extra_conf={{
                      # 32m splits: enough tasks for the high level (the
                      # bench input is written as many small files), without
                      # the per-task driver dispatch cost of 8m splits
                      # growing into a serial term at both levels
                      "spark.sql.files.maxPartitionBytes": "32m",
                      "spark.driver.memory": f"{{2 * cpus}}g",
                      "spark.local.dir": shuffle_dir,
                      # keep ~4 waves of post-shuffle tasks at each level:
                      # default AQE coalescing floors at defaultParallelism
                      # (= cores), leaving a 1-wave tail-imbalance at the
                      # high level
                      "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m",
                  }})
spark.range(1000).count()  # JVM warmup

def gc_ms():
    total = 0
    for b in spark._jvm.java.lang.management.ManagementFactory.getGarbageCollectorMXBeans():
        total += b.getCollectionTime()
    return int(total)

root = benchlib.ensure_bench_data()
results = []
for i in range(reps):
    # memory-bandwidth canary BEFORE the rep: steal telemetry can't see
    # co-tenant bandwidth pollution; an inflated canary_sec beside a low
    # steal_ms attributes a qualified-but-slow rep (VERDICT r6 task #2)
    c0 = benchlib.memory_canary_sec()
    g0, s0, t0 = gc_ms(), steal_ms(), time.time()
    r = benchlib.run_validation_job(spark, root)
    r["canary_sec"] = round(c0, 3) if c0 is not None else None
    r["gc_ms"] = gc_ms() - g0
    s1 = steal_ms()
    r["steal_ms"] = (s1 - s0) if (s0 is not None and s1 is not None) else None
    r["shm_mb_after"] = dir_mb(shuffle_dir)
    r["steal_qualified"] = benchlib.steal_qualified(r)
    results.append(r)
    spark.catalog.clearCache()  # plan-matched cache reuse would fake repeat runs
    # Inter-run hygiene: shuffle files on tmpfs are only reclaimed when the
    # ContextCleaner notices the shuffle objects are garbage — at a 32g heap
    # young-gen GC is rare, so without this nudge dead shuffle files from
    # earlier reps pile up on /dev/shm (memory pressure that a steady-state
    # cluster, whose executors GC continuously, does not see).
    spark._jvm.System.gc()
    time.sleep(1)
# second qualification budget (VERDICT r7 task #3): bandwidth canaries
# bracket each rep (pre-canary + the next rep's pre-canary / a trailing
# probe) and the rep is bandwidth-vetoed only when BOTH sides blew the
# 1.15x-calm budget — see benchlib.canary_qualified for the sandwich
# rationale; qualification is therefore computed after the loop
c_end = benchlib.memory_canary_sec()
for i, r in enumerate(results):
    if i + 1 < len(results):
        r["canary_after_sec"] = results[i + 1]["canary_sec"]
    else:
        r["canary_after_sec"] = round(c_end, 3) if c_end is not None else None
    r["canary_qualified"] = benchlib.canary_qualified(r)
    r["qualified"] = r["steal_qualified"] and r["canary_qualified"]
# The round's estimate is its best STEAL-QUALIFIED rep: a rep whose
# host-steal exceeded the budget ran against fewer cores than it was
# pinned to and measures the host, not the engine (VERDICT r5 task #1).
# If no rep qualified, fall back to the plain best, flagged — main()
# treats a non-qualified round as disqualified and re-runs it.
qualified = [r for r in results if r["qualified"]]
best = max(qualified or results, key=lambda r: r["rows_per_sec"])
# name kept for state-file continuity; since r8 it means BOTH budgets
# (steal AND bandwidth canary) were met by >=1 rep
best["round_steal_qualified"] = bool(qualified)
best["all_sec"] = [round(r["sec"], 2) for r in results]
best["all_gc_ms"] = [r["gc_ms"] for r in results]
best["all_steal_ms"] = [r["steal_ms"] for r in results]
best["all_canary_sec"] = [r["canary_sec"] for r in results]
best["all_canary_after_sec"] = [r["canary_after_sec"] for r in results]
best["all_shm_mb"] = [r["shm_mb_after"] for r in results]
best["all_qualified"] = [r["qualified"] for r in results]
best["all_steal_qualified"] = [r["steal_qualified"] for r in results]
best["all_canary_qualified"] = [r["canary_qualified"] for r in results]
best["steal_budget_frac"] = benchlib.STEAL_BUDGET_FRAC
best["steal_budget_floor_ms"] = benchlib.STEAL_BUDGET_FLOOR_MS
best["canary_budget_sec"] = round(benchlib.canary_budget_sec(), 3)
benchlib.release_canary()
print("RESULT " + json.dumps(best))
spark.stop()
"""


def run_level_once(cpus: int, reps: int) -> dict:
    # taskset pins the WHOLE process tree (JVM + pandas-UDF python workers)
    # to exactly `cpus` cores — a local[N] JVM without pinning lets the
    # python workers overflow onto extra host cores, silently inflating the
    # low-parallelism level (a real N-core executor's python workers share
    # the executor's N cores).
    pin = f"0-{cpus - 1}"
    out = subprocess.run(
        ["taskset", "-c", pin, sys.executable, "-c", WORKER.format(repo=REPO), str(cpus), str(reps)],
        capture_output=True,
        text=True,
        cwd=REPO,
        env={**os.environ},
        timeout=5400,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed (cpus={cpus}):\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def run_level(cpus: int, reps: int, retries: int) -> dict:
    """Run one parallelism level; if NO rep met the steal budget (the whole
    JVM ran in a degraded host window), discard and re-run up to
    ``retries`` times (VERDICT r5 task #1: a steal-polluted round measures
    the host, not the engine). The final attempt is kept either way,
    flagged via ``round_steal_qualified`` so main() can refuse to stamp
    BASELINE.md from it."""
    attempt = 0
    while True:
        attempt += 1
        r = run_level_once(cpus, reps)
        r["attempts"] = attempt
        if r.get("round_steal_qualified", True) or attempt > retries:
            return r
        print(
            f"  level {cpus}c attempt {attempt}: no rep under steal budget "
            f"(steal_ms {r.get('all_steal_ms')}, sec {r.get('all_sec')}) — "
            f"re-running ({retries - attempt + 1} retries left)",
            file=sys.stderr,
        )


def load_gate_state(state_path: str, budget_frac: float | None = None) -> dict:
    """Load completed level-rounds from a crash-resume state file.

    Returns ``{(level, round_idx): result}`` for the rounds worth reusing:
    a saved round that exhausted its steal-budget retries
    (``round_steal_qualified`` false) is a degraded-window measurement and
    is dropped so a resume re-measures it instead of locking the final run
    into SMOKE status. A round qualified under a DIFFERENT steal budget
    than the current run's is also dropped — the state filename keys the
    run shape but not NPDV_STEAL_BUDGET_FRAC, so without this check a
    resume could silently mix rounds qualified under a looser budget into
    a run that reports a stricter one (ADVICE r6 scaling:249). Tolerates
    a truncated trailing line (the writer may have been killed
    mid-append)."""
    from np_data_validation_spark import benchlib

    completed: dict[tuple[int, int], dict] = {}
    if not os.path.exists(state_path):
        return completed
    with open(state_path) as f:
        for line in f:
            try:
                entry = json.loads(line)
            except json.JSONDecodeError:
                continue  # torn final append from a killed writer
            res = entry["result"]
            if not res.get("round_steal_qualified", True):
                continue
            saved_frac = res.get("steal_budget_frac")
            if (
                budget_frac is not None
                and saved_frac is not None
                and abs(saved_frac - budget_frac) > 1e-12
            ):
                continue  # qualified under a different budget — re-measure
            # The absolute budget floor (NPDV_STEAL_BUDGET_FLOOR_MS) also
            # changes qualification, so it is compared too. Entries written
            # before the floor existed qualified under the pure fraction —
            # strictly tighter than any floor for minutes-long gate reps —
            # so a missing value is treated as the library default rather
            # than re-measured.
            saved_floor = res.get(
                "steal_budget_floor_ms", benchlib.STEAL_BUDGET_FLOOR_MS
            )
            if abs(saved_floor - benchlib.STEAL_BUDGET_FLOOR_MS) > 1e-9:
                continue  # qualified under a different floor — re-measure
            # Since r8 rounds also qualify against the bandwidth-canary
            # budget (VERDICT r7 task #3). An entry saved WITHOUT one was
            # qualified under steal alone — strictly weaker — so it is
            # re-measured (this is also how pre-canary 4-core rounds get
            # their canary coverage backfilled), as is an entry qualified
            # under a different canary budget.
            saved_canary_budget = res.get("canary_budget_sec")
            # the worker records the budget rounded to 3 decimals —
            # compare against the same rounding
            if saved_canary_budget is None or (
                abs(saved_canary_budget - round(benchlib.canary_budget_sec(), 3))
                > 1e-9
            ):
                continue
            completed[(entry["level"], entry["round"])] = res
    return completed


def append_gate_state(state_path: str, level: int, round_idx: int, result: dict) -> None:
    with open(state_path, "a") as f:
        f.write(json.dumps({"level": level, "round": round_idx, "result": result}) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    ap.add_argument("--xn", type=int, default=16)
    ap.add_argument("--runs", type=int, default=3, help="interleaved rounds (fresh JVMs)")
    ap.add_argument("--reps", type=int, default=5, help="in-JVM repetitions per round")
    ap.add_argument("--rows", type=int, default=48_000_000)
    ap.add_argument(
        "--steal-retries",
        type=int,
        default=2,
        help="re-runs allowed per level-round when no rep meets the steal budget",
    )
    ap.add_argument(
        "--fresh",
        action="store_true",
        help="ignore (and overwrite) any saved level-round state for this config",
    )
    args = ap.parse_args()
    # bigger input than bench.py's default so the scalable phase dominates
    # fixed per-job overheads at the high parallelism level
    os.environ.setdefault("NPDV_BENCH_ROWS", str(args.rows))

    from np_data_validation_spark import benchlib

    print(f"preparing bench data ({benchlib.BENCH_ROWS} rows)...", file=sys.stderr)
    benchlib.ensure_bench_data()

    # Crash-resume state: one JSONL line per completed level-round, keyed by
    # the full run configuration so stale state from a different shape can
    # never be mixed in.
    state_path = os.path.join(
        REPO,
        "BENCH",
        f"gate_state_{args.rows}_{args.n}_{args.xn}_{args.runs}_{args.reps}.jsonl",
    )
    if args.fresh and os.path.exists(state_path):
        os.remove(state_path)
    completed = load_gate_state(state_path, benchlib.STEAL_BUDGET_FRAC)
    if completed:
        print(
            f"resuming: {len(completed)} completed level-round(s) loaded "
            f"from {state_path}",
            file=sys.stderr,
        )

    def measure(level: int, round_idx: int) -> dict:
        key = (level, round_idx)
        if key in completed:
            return completed[key]
        r = run_level(level, args.reps, args.steal_retries)
        append_gate_state(state_path, level, round_idx, r)
        return r

    # Interleave levels (fresh JVM per round per level) so time-correlated
    # host noise — this sandbox is a shared VM — hits both levels equally.
    # Keep each round's best warm run; report the MEDIAN across rounds.
    lo_rounds: list[dict] = []
    hi_rounds: list[dict] = []
    for i in range(args.runs):
        lo_r = measure(args.n, i)
        hi_r = measure(args.xn, i)
        lo_rounds.append(lo_r)
        hi_rounds.append(hi_r)
        print(
            f"round {i + 1}/{args.runs}: {args.n}c best {lo_r['sec']:.1f}s "
            f"(all {lo_r['all_sec']}, gc_ms {lo_r['all_gc_ms']}, "
            f"steal_ms {lo_r.get('all_steal_ms')}, "
            f"qualified {lo_r.get('all_qualified')}) / "
            f"{args.xn}c best {hi_r['sec']:.1f}s "
            f"(all {hi_r['all_sec']}, gc_ms {hi_r['all_gc_ms']}, "
            f"steal_ms {hi_r.get('all_steal_ms')}, "
            f"qualified {hi_r.get('all_qualified')})",
            file=sys.stderr,
        )

    def med(rounds: list[dict]) -> dict:
        by_rps = sorted(rounds, key=lambda r: r["rows_per_sec"])
        m = by_rps[len(by_rps) // 2]  # median round (odd n); upper-median (even)
        return m

    lo, hi = med(lo_rounds), med(hi_rounds)
    lo_rps = statistics.median(r["rows_per_sec"] for r in lo_rounds)
    hi_rps = statistics.median(r["rows_per_sec"] for r in hi_rounds)
    eff = hi_rps / (args.xn / args.n * lo_rps)
    eff_best = max(r["rows_per_sec"] for r in hi_rounds) / (
        args.xn / args.n * max(r["rows_per_sec"] for r in lo_rounds)
    )

    all_rounds_qualified = all(
        r.get("round_steal_qualified", False) for r in lo_rounds + hi_rounds
    )
    result = {
        "rows": lo["rows"],
        "rounds": args.runs,
        "reps_per_round": args.reps,
        f"local[{args.n}]_round_best_sec": [round(r["sec"], 2) for r in lo_rounds],
        f"local[{args.xn}]_round_best_sec": [round(r["sec"], 2) for r in hi_rounds],
        f"local[{args.n}]_median_rows_per_sec": round(lo_rps, 1),
        f"local[{args.xn}]_median_rows_per_sec": round(hi_rps, 1),
        "scaling_efficiency_median": round(eff, 3),
        "scaling_efficiency_best": round(eff_best, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
        "steal_budget_frac": lo.get("steal_budget_frac"),
        "all_rounds_steal_qualified": all_rounds_qualified,
    }
    print(json.dumps(result))

    def runs_block(tag: str, rounds: list[dict]) -> str:
        lines = []
        for i, r in enumerate(rounds):
            lines.append(
                f"  * {tag} round {i + 1} (attempt {r.get('attempts', 1)}): "
                f"sec {r['all_sec']}, gc_ms {r['all_gc_ms']}, "
                f"host-steal ms {r.get('all_steal_ms')}, "
                f"steal-qualified {r.get('all_steal_qualified', r.get('all_qualified'))}, "
                f"bandwidth-canary sec {r.get('all_canary_sec')}, "
                f"canary-qualified {r.get('all_canary_qualified')}, "
                f"both-qualified {r.get('all_qualified')}, "
                f"shuffle-tmpfs MB after each rep {r['all_shm_mb']}"
            )
        return "\n".join(lines)

    md = f"""# BENCH/BASELINE.md — measured scaling evidence

Metric (BASELINE.json): validated sequences/sec (full constraint pass:
xxhash64 pandas-UDF fingerprint -> manifest join + content probe -> verdict
CASE -> per-subject rollup + violations + per-partition stats), identical
deterministic synthetic input at the input_hint schema, two parallelism
levels standing in for N and 4N executors.

| config | rows | median round-best sec | median validated seq/sec |
|---|---|---|---|
| local[{args.n}] (N) | {lo['rows']:,} | {statistics.median(r['sec'] for r in lo_rounds):.2f} | {lo_rps:,.0f} |
| local[{args.xn}] (4N) | {hi['rows']:,} | {statistics.median(r['sec'] for r in hi_rounds):.2f} | {hi_rps:,.0f} |

**Scaling efficiency (median of per-round bests, {args.runs} rounds)** =
{hi_rps:,.0f} / ({args.xn // args.n} x {lo_rps:,.0f}) = **{eff:.3f}**
(target >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"}); best-of-all-rounds
efficiency for reference: {eff_best:.3f}.

**Steal qualification**: every round's estimate is its best rep whose
host-wide CPU steal stayed within {lo.get('steal_budget_frac', 0.05):.0%} of
its wall time (/proc/stat delta per rep, SC_CLK_TCK-scaled); a level-round
with NO qualifying rep is discarded and re-run (bounded retries). This run:
all rounds steal-qualified = {all_rounds_qualified}. Per-rep steal_ms and
qualification flags are listed under "All measured runs" below.

**Bandwidth canary (second qualification budget since r8)**: each rep is
preceded by a fixed single-core memory-bound microbenchmark
({benchlib.CANARY_PASSES} streaming sums over a {benchlib.CANARY_MB} MiB
array; `canary_sec` per rep below). Steal telemetry cannot see co-tenant
memory-bandwidth pollution, so a rep qualifies only if its canary is within
{benchlib.CANARY_BUDGET_RATIO}x the calm baseline
({benchlib.CANARY_CALM_SEC:.2f} s on this host ->
budget {benchlib.canary_budget_sec():.3f} s); per-rep steal and canary
qualification flags are listed separately below.

Median-round phase breakdown (sec): local[{args.n}] {lo.get('phases')},
local[{args.xn}] {hi.get('phases')}

Input: {lo['rows']:,} sequences, token lengths {benchlib.BENCH_MIN_LEN}-{benchlib.BENCH_MAX_LEN},
seeded fault injection (every verdict class present), hive-partitioned
parquet with one file per (source, chunk) so both levels have enough input
splits; `spark.sql.files.maxPartitionBytes=32m`, AQE advisory 8m.

Methodology (honest N vs 4N executor modeling on one host):
* each level is pinned with `taskset -c 0-(cores-1)` so the pandas-UDF
  python workers share the level's cores exactly as they would share a real
  executor's cores (unpinned, the low level silently borrows extra host
  cores and the ratio is meaningless);
* heap and shuffle partitions scale with the level (fixed-size executors:
  4x executors = 4x memory and 4x default parallelism); AQE on at both;
* shuffle on tmpfs (per-executor local SSDs scale with cluster size; one
  shared spindle would put a fixed-bandwidth term under both levels), with
  an explicit System.gc() between in-JVM reps so dead shuffle files are
  reclaimed (at a 32g heap the ContextCleaner otherwise lets them pile up
  on /dev/shm — the round-2 local[16] 70-303s variance);
* {args.runs} interleaved rounds (fresh JVM per level per round), {args.reps}
  in-JVM reps per round — the first ~3 reps pay JIT/codegen warmup that a
  steady-state 10^12-row job amortizes in its first seconds; the statistic
  is the MEDIAN across rounds of each round's best warm rep (robust to a
  single lucky/unlucky round, unlike a global best-of).

All measured runs:
{runs_block(f'local[{args.n}]', lo_rounds)}
{runs_block(f'local[{args.xn}]', hi_rounds)}

Reproduce: `python BENCH/scaling.py --rows {args.rows} --n {args.n} --xn {args.xn} --runs {args.runs} --reps {args.reps} --steal-retries {args.steal_retries}`
(bench data cached under /tmp).
"""
    # Prior qualified runs (with their host-condition attribution) live in
    # BENCH/HISTORY.md and ride along as an appendix of whatever file this
    # run writes — the gate evidence leads, history never overwrites it.
    hist_path = os.path.join(REPO, "BENCH", "HISTORY.md")
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            md += "\n---\n\n" + f.read()

    size_ok = args.runs >= GATE_MIN_RUNS and lo["rows"] >= GATE_MIN_ROWS
    if not size_ok or not all_rounds_qualified:
        # Refuse to stamp the gate evidence from a smoke-sized OR
        # steal-degraded run (VERDICT r5 what's-wrong #1: a degraded run
        # must never overwrite the standing qualified evidence).
        reason = (
            f"runs={args.runs} < {GATE_MIN_RUNS} or rows={lo['rows']:,} < {GATE_MIN_ROWS:,}"
            if not size_ok
            else "a level-round exhausted its steal-budget retries (degraded host window)"
        )
        md = (
            "# BENCH/BASELINE_SMOKE.md — NON-QUALIFYING run "
            f"({reason}); NOT gate evidence — see BASELINE.md\n\n" + md
        )
        with open(os.path.join(REPO, "BENCH", "BASELINE_SMOKE.md"), "w") as f:
            f.write(md)
        print(
            f"non-qualifying run ({reason}): wrote BENCH/BASELINE_SMOKE.md; "
            "BASELINE.md untouched",
            file=sys.stderr,
        )
        # Keep the state file: a relaunch with the same config reuses the
        # qualified level-rounds and re-measures only the degraded ones
        # (load_gate_state drops non-qualified rounds). Deleting here would
        # force a full re-run after every steal-degraded window.
        return
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print("wrote BENCH/BASELINE.md (steal-qualified gate evidence)", file=sys.stderr)
    if os.path.exists(state_path):
        os.remove(state_path)  # run completed; state is now in the md


if __name__ == "__main__":
    main()
