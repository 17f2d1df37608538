"""Scaling-efficiency study: the same CDC replay at several local[k]
parallelism levels (the sandbox proxy for N vs 4N executors — no real
cluster exists here).

Protocol (documented in BENCH/BASELINE.md):
  * identical deterministic input at every level (seeded generator);
  * each level runs in a FRESH JVM (subprocess) so sessions don't share
    JIT/GC state;
  * levels are interleaved across repetitions and the per-level MEDIAN
    is reported — this VM shows ±30% run-to-run variance;
  * a pure-codegen reference job (xxhash64 fold over spark.range, no
    shuffle, no I/O) is measured at the same levels to establish the
    HARDWARE parallel-scaling ceiling of the box; engine efficiency is
    reported both raw and relative to that ceiling.

Usage: python BENCH/scaling_bench.py [events] [reps]
Writes results JSON to stdout; paste into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys, time, tempfile, shutil
sys.path.insert(0, %(repo)r)
import pyspark.sql.functions as F
from data_pipeline_spark.session import get_spark

cpus = int(sys.argv[1]); mode = sys.argv[2]; n_events = int(sys.argv[3])
spark = get_spark(f"scale_{mode}_{cpus}", master=f"local[{cpus}]",
                  shuffle_partitions=cpus,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

if mode == "cpu":
    df = spark.range(0, 20_000_000_000, 1, cpus * 4)
    df.limit(1).count()  # warm
    t0 = time.perf_counter()
    df.select(F.bit_xor(F.xxhash64("id")).alias("h")).collect()
    print("RESULT", time.perf_counter() - t0)
else:
    from data_pipeline_spark.gen import gen_event_log
    from data_pipeline_spark.icebox.table import IceboxTable
    from data_pipeline_spark.cdc.apply import replay_log
    import __spark_entry__ as E
    work = tempfile.mkdtemp(prefix=f"scale{cpus}_")
    try:
        ev_dir = os.path.join(work, "ev")
        gen_event_log(spark, n_events, n_events // 10,
                      batch_size=n_events // 4, hot_frac=0.10
                      ).write.partitionBy("batch_id").parquet(ev_dir)
        table = IceboxTable.create(spark, os.path.join(work, "t"),
                                   E.BASE_SCHEMA, n_buckets=64)
        log = spark.read.parquet(ev_dir)
        # "apply" = the steady-state merge-on-read ingest path;
        # "apply_cow" = the copy-on-write broadcast-join path (r01 protocol)
        strategy = "delta" if mode == "apply" else "auto"
        t0 = time.perf_counter()
        table = replay_log(table, log, merge_strategy=strategy)
        el = time.perf_counter() - t0
        assert table.read().count() > 0
        print("RESULT", el)
    finally:
        shutil.rmtree(work, ignore_errors=True)
"""


def run_once(cpus: int, mode: str, n_events: int) -> float:
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO}, str(cpus), mode, str(n_events)],
        capture_output=True,
        text=True,
        env=env,
        timeout=3600,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT"):
            return float(line.split()[1])
    raise RuntimeError(f"worker failed (cpus={cpus} mode={mode}):\n{out.stderr[-2000:]}")


def main() -> None:
    n_events = int(sys.argv[1]) if len(sys.argv) > 1 else 16_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    levels = [2, 8, 32]

    apply_t: dict[int, list[float]] = {k: [] for k in levels}
    cow_t: dict[int, list[float]] = {k: [] for k in levels}
    cpu_t: dict[int, list[float]] = {k: [] for k in levels}
    for r in range(reps):
        for k in levels:  # interleave levels within each repetition
            el = run_once(k, "apply", n_events)
            apply_t[k].append(el)
            print(f"rep {r} local[{k}] apply(mor): {el:.1f}s "
                  f"({n_events/el:,.0f} ev/s)", file=sys.stderr)
        for k in levels:
            el = run_once(k, "cpu", n_events)
            cpu_t[k].append(el)
            print(f"rep {r} local[{k}] cpu-ref: {el:.1f}s", file=sys.stderr)
        if r == 0:  # one CoW comparison pass (the r01 protocol path)
            for k in levels:
                el = run_once(k, "apply_cow", n_events)
                cow_t[k].append(el)
                print(f"rep {r} local[{k}] apply(cow): {el:.1f}s "
                      f"({n_events/el:,.0f} ev/s)", file=sys.stderr)

    med = {k: statistics.median(v) for k, v in apply_t.items()}
    cmed = {k: statistics.median(v) for k, v in cpu_t.items()}
    tp = {k: n_events / med[k] for k in levels}

    def eff(lo, hi):
        return (tp[hi] / tp[lo]) / (hi / lo)

    def hw_speedup(lo, hi):
        return cmed[lo] / cmed[hi]

    result = {
        "n_events": n_events,
        "reps": reps,
        "merge_strategy": "delta (merge-on-read, steady-state path)",
        "cow_apply_sec": {str(k): [round(x, 2) for x in v] for k, v in cow_t.items()},
        "apply_sec_median": {str(k): round(med[k], 2) for k in levels},
        "apply_events_per_sec": {str(k): round(tp[k], 1) for k in levels},
        "apply_sec_all": {str(k): [round(x, 2) for x in v] for k, v in apply_t.items()},
        "cpu_ref_sec_median": {str(k): round(cmed[k], 2) for k in levels},
        "efficiency_2_to_8": round(eff(2, 8), 3),
        "efficiency_8_to_32": round(eff(8, 32), 3),
        "hw_ceiling_speedup_2_to_8": round(hw_speedup(2, 8), 2),
        "hw_ceiling_speedup_8_to_32": round(hw_speedup(8, 32), 2),
        "efficiency_2_to_8_vs_hw": round(
            (tp[8] / tp[2]) / hw_speedup(2, 8), 3
        ),
        "efficiency_8_to_32_vs_hw": round(
            (tp[32] / tp[8]) / max(hw_speedup(8, 32), 1e-9), 3
        ),
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
