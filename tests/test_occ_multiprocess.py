"""Cross-PROCESS optimistic-concurrency rebase through the full ingest
path (VERDICT r4, next-round #3): two real OS processes, each with its
OWN SparkSession and its OWN table handle loaded at the SAME snapshot,
both drive `apply_batch(..., retry_on_conflict=...)` on disjoint keys.

`tests/test_occ_retry.py` proves the rebase MATH with two stale handles
inside one process; `tests/test_commit_race.py` races two processes on
the raw manifest swap. This closes the remaining gap: the rebase logic
executing end-to-end (dedup → merge → parquet write → publish loop)
across process boundaries, where the loser only discovers the winner
through the filesystem.

Interleaving is made deterministic with a filesystem handshake:

  * both workers load the table at snapshot S and confirm via a
    `loaded_{i}` marker (so neither can observe the other's commit at
    load time);
  * worker 0 commits first and drops `done_0`;
  * worker 1 waits for `done_0`, THEN commits through its now-stale
    handle — a guaranteed manifest collision whose only good exit is
    the OCC rebase (retry_on_conflict), landing at snapshot S+2.

The semantics being upgraded are the reference's idempotent-overwrite
discipline (/root/reference/footprint-res/resolve-footprints.scala:207):
instead of "last job wins by overwriting the output dir", concurrent
writers serialize through atomic snapshot swaps and replay on top.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

from data_pipeline_spark.icebox import IceboxTable

from .test_cdc_apply import BASE_SCHEMA

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
from data_pipeline_spark.session import get_spark
from data_pipeline_spark.icebox import IceboxTable
from data_pipeline_spark.cdc import apply_batch

root, idx, sync = sys.argv[1], int(sys.argv[2]), sys.argv[3]
spark = get_spark(f"occ_mp_{idx}", master="local[2]", shuffle_partitions=2,
                  extra_conf={"spark.ui.showConsoleProgress": "false"})
spark.sparkContext.setLogLevel("ERROR")

table = IceboxTable.load(spark, root)
loaded_snapshot = table.snapshot_id
open(os.path.join(sync, f"loaded_{idx}"), "w").write(str(loaded_snapshot))
# both workers must hold handles at the SAME snapshot before either
# commits — otherwise worker 1 could load AFTER worker 0's commit and
# never conflict at all
deadline = time.time() + 120
while not all(os.path.exists(os.path.join(sync, f"loaded_{i}")) for i in (0, 1)):
    assert time.time() < deadline, "peer never loaded"
    time.sleep(0.05)

# key set: default disjoint synthetic prefixes; a keys_{idx}.json in the
# sync dir overrides (the CoW test pins keys to disjoint BUCKETS there)
keys_file = os.path.join(sync, f"keys_{idx}.json")
if os.path.exists(keys_file):
    docs = json.load(open(keys_file))
else:
    docs = [f"w{idx}_doc_{i:03d}" for i in range(40)]
rows = [(1000 * (idx + 1) + i, "upsert", d, [idx, i], 2, f"writer{idx}")
        for i, d in enumerate(docs)]
batch = spark.createDataFrame(
    rows,
    "lsn long, op string, doc_id string, tokens array<int>, n_tok int, source string",
)

if idx == 1:
    # guarantee staleness: only commit once the winner has published
    while not os.path.exists(os.path.join(sync, "done_0")):
        assert time.time() < deadline, "writer 0 never committed"
        time.sleep(0.05)

strategy = os.environ.get("OCC_MP_STRATEGY", "delta")
t2 = apply_batch(table, batch, f"w{idx}", merge_strategy=strategy,
                 retry_on_conflict=5)
open(os.path.join(sync, f"done_{idx}"), "w").write("")
json.dump(
    {"loaded": loaded_snapshot, "landed": t2.snapshot_id},
    open(os.path.join(sync, f"result_{idx}.json"), "w"),
)
"""


def test_two_process_apply_batch_occ_rebase(spark, tdir):
    root = os.path.join(tdir, "t")
    sync = os.path.join(tdir, "sync")
    os.makedirs(sync)
    t0 = IceboxTable.create(spark, root, BASE_SCHEMA, n_buckets=4)
    base_snap = t0.snapshot_id

    env = dict(os.environ)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER % {"repo": REPO}, root, str(i), sync],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            outs.append(p.communicate(timeout=300))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"

    res = {
        i: json.load(open(os.path.join(sync, f"result_{i}.json")))
        for i in (0, 1)
    }
    # both loaded the same pristine snapshot: neither saw the other early
    assert res[0]["loaded"] == base_snap
    assert res[1]["loaded"] == base_snap
    # writer 0 won cleanly at S+1; writer 1 committed through a stale
    # handle and can only be at S+2 via the cross-process OCC rebase
    assert res[0]["landed"] == base_snap + 1
    assert res[1]["landed"] == base_snap + 2

    final = IceboxTable.load(spark, root)
    assert final.snapshot_id == base_snap + 2
    assert final.has_tag("batch:w0") and final.has_tag("batch:w1")
    state = {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
        for r in final.read().collect()
    }
    assert len(state) == 80  # 40 disjoint docs per writer, all landed
    for i in (0, 1):
        for j in range(40):
            assert state[f"w{i}_doc_{j:03d}"] == ([i, j], 2, f"writer{i}")


def test_two_process_cow_rebase_disjoint_buckets(spark, tdir):
    """Cross-process OCC for the COPY-ON-WRITE path: a CoW rewrite may
    only rebase across a winner that provably touched DISJOINT buckets
    (the rewrite's contents were computed from the loser's snapshot).
    Pin each writer's keys to its own bucket pair, force the join (CoW)
    merge, stage the loser behind the winner — the rebase must re-publish
    the loser's already-written files on top without moving data.
    In-process twin: test_occ_retry::test_rewrite_retry_disjoint_buckets."""
    from data_pipeline_spark.icebox.table import bucket_expr

    root = os.path.join(tdir, "t")
    sync = os.path.join(tdir, "sync")
    os.makedirs(sync)
    t0 = IceboxTable.create(spark, root, BASE_SCHEMA, n_buckets=4)
    base_snap = t0.snapshot_id

    cand = spark.createDataFrame(
        [(f"doc_{i:04d}",) for i in range(200)], "doc_id string"
    ).select("doc_id", bucket_expr(4).alias("_b"))
    by_bucket: dict[int, list[str]] = {}
    for r in cand.collect():
        by_bucket.setdefault(int(r["_b"]), []).append(r["doc_id"])
    assert set(by_bucket) == {0, 1, 2, 3}
    json.dump(
        (by_bucket[0] + by_bucket[1])[:20],
        open(os.path.join(sync, "keys_0.json"), "w"),
    )
    json.dump(
        (by_bucket[2] + by_bucket[3])[:20],
        open(os.path.join(sync, "keys_1.json"), "w"),
    )

    env = dict(os.environ, OCC_MP_STRATEGY="join")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER % {"repo": REPO}, root, str(i), sync],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
        )
        for i in (0, 1)
    ]
    outs = []
    for p in procs:
        try:
            outs.append(p.communicate(timeout=300))
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"

    res = {
        i: json.load(open(os.path.join(sync, f"result_{i}.json")))
        for i in (0, 1)
    }
    assert res[0]["loaded"] == res[1]["loaded"] == base_snap
    assert res[0]["landed"] == base_snap + 1
    assert res[1]["landed"] == base_snap + 2  # only reachable via rebase

    final = IceboxTable.load(spark, root)
    assert final.snapshot_id == base_snap + 2
    assert final.has_tag("batch:w0") and final.has_tag("batch:w1")
    # CoW path: both commits are rewrites — no delta entries survive
    assert not final.manifest.get("deltas")
    state = {r["doc_id"]: r["source"] for r in final.read().collect()}
    assert len(state) == 40
    for d in json.load(open(os.path.join(sync, "keys_0.json"))):
        assert state[d] == "writer0"
    for d in json.load(open(os.path.join(sync, "keys_1.json"))):
        assert state[d] == "writer1"


def test_two_process_occ_replay_is_idempotent(spark, tdir):
    """Crash-replay across processes: re-running worker 1's batch AFTER
    both landed must be a tag no-op (same snapshot, same state) even
    from a fresh process — exactly-once survives the process boundary."""
    root = os.path.join(tdir, "t")
    sync = os.path.join(tdir, "sync")
    os.makedirs(sync)
    IceboxTable.create(spark, root, BASE_SCHEMA, n_buckets=4)

    # sequential runs (marker files pre-created so neither worker waits)
    open(os.path.join(sync, "loaded_0"), "w").write("")
    open(os.path.join(sync, "loaded_1"), "w").write("")
    open(os.path.join(sync, "done_0"), "w").write("")
    for i in (0, 1):
        p = subprocess.run(
            [sys.executable, "-c", WORKER % {"repo": REPO}, root, str(i), sync],
            capture_output=True,
            text=True,
            timeout=300,
        )
        assert p.returncode == 0, f"worker failed:\n{p.stderr[-3000:]}"

    snap_before = IceboxTable.load(spark, root).snapshot_id
    # replay worker 1 from a brand-new process against the landed table
    os.remove(os.path.join(sync, "result_1.json"))
    p = subprocess.run(
        [sys.executable, "-c", WORKER % {"repo": REPO}, root, "1", sync],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert p.returncode == 0, f"replay worker failed:\n{p.stderr[-3000:]}"
    res = json.load(open(os.path.join(sync, "result_1.json")))
    assert res["landed"] == snap_before  # tag no-op: no new snapshot
    final = IceboxTable.load(spark, root)
    assert final.snapshot_id == snap_before
    assert final.read().count() == 80
