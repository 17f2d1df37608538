"""True multi-process commit race: two OS processes publish the SAME
next-snapshot manifest through IceboxTable._write_manifest; the os.link
exclusive-create arbiter must let exactly one win, and the loser's
reload-and-retry must land cleanly on top (VERDICT r2, next-round #6).

The children never touch Spark — the commit arbiter is pure filesystem
(that is the point: it must hold across processes/executors that share
only the table directory, like Iceberg's atomic swap)."""

from __future__ import annotations

import json
import multiprocessing as mp
import os

import pytest


def _load_manifest(root: str) -> dict:
    meta = os.path.join(root, "metadata")
    with open(os.path.join(meta, "CURRENT")) as f:
        name = f.read().strip()
    with open(os.path.join(meta, name)) as f:
        return json.load(f)


def _next_manifest(cur: dict, tag: str) -> dict:
    return {
        **cur,
        "snapshot_id": cur["snapshot_id"] + 1,
        "parent_id": cur["snapshot_id"],
        "tag": tag,
        "committed_tags": cur["committed_tags"] + [tag],
        "summary": {"operation": "race-test", "writer": tag},
    }


def _race_writer(root: str, idx: int, barrier) -> None:
    # runs in a child process; spark handle unused by _write_manifest
    from data_pipeline_spark.icebox.table import ConcurrentCommitError, IceboxTable

    tag = f"w{idx}"
    t = IceboxTable(None, root, _load_manifest(root))
    new = _next_manifest(t.manifest, tag)
    barrier.wait()  # line both writers up on the same snapshot id
    outcome = None
    try:
        t._write_manifest(new)
        outcome = "won"
    except ConcurrentCommitError:
        # loser path: reload the winner's state and re-apply on top.
        # IceboxTable.load rolls CURRENT forward to the newest published
        # snapshot, covering the window where the winner has linked its
        # manifest but not yet swapped CURRENT; a second collision is
        # still possible in that window, so retry the reload+commit loop.
        for _ in range(20):
            t2 = IceboxTable.load(None, root)
            try:
                t2._write_manifest(_next_manifest(t2.manifest, tag))
                outcome = "retried"
                break
            except ConcurrentCommitError:
                continue
        assert outcome == "retried"
    with open(os.path.join(root, f"result_{idx}.txt"), "w") as f:
        f.write(outcome)


@pytest.mark.parametrize("round_", range(3))
def test_multiprocess_commit_race_single_winner(tmp_path, round_):
    root = str(tmp_path / "t")
    meta = os.path.join(root, "metadata")
    os.makedirs(meta)
    os.makedirs(os.path.join(root, "data"))
    manifest = {
        "snapshot_id": 0,
        "parent_id": None,
        "tag": None,
        "committed_tags": [],
        "key": "doc_id",
        "n_buckets": 4,
        "current_schema_id": 0,
        "schemas": {"0": "{}"},
        "buckets": {},
        "deltas": [],
        "lineage_paths": [],
        "summary": {"operation": "create"},
    }
    with open(os.path.join(meta, "snap-00000000.json"), "w") as f:
        json.dump(manifest, f)
    with open(os.path.join(meta, "CURRENT"), "w") as f:
        f.write("snap-00000000.json")

    ctx = mp.get_context("fork")  # children never touch the JVM
    barrier = ctx.Barrier(2)
    ps = [
        ctx.Process(target=_race_writer, args=(root, i, barrier)) for i in range(2)
    ]
    for p in ps:
        p.start()
    for p in ps:
        p.join(timeout=60)
        assert p.exitcode == 0

    results = []
    for i in range(2):
        with open(os.path.join(root, f"result_{i}.txt")) as f:
            results.append(f.read())
    # exactly one clean winner; the other detected the collision and
    # retried on top — never two processes both believing they own snap 1
    assert sorted(results) == ["retried", "won"], results

    final = _load_manifest(root)
    assert final["snapshot_id"] == 2
    assert sorted(final["committed_tags"]) == ["w0", "w1"]
    # the chain is linear and complete: snap-1 is the winner's, snap-2
    # the retrier's, each parented correctly
    with open(os.path.join(meta, "snap-00000002.json")) as f:
        assert json.load(f)["parent_id"] == 1
