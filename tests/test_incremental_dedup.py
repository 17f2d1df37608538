"""Incremental near-dup dedup against a standing corpus
(operators/incremental_dedup.py): match semantics, exactly-once replay,
probe partition-pruning, and the compaction bound on probe I/O.

The scale claim under test (VERDICT r3 'Next round' #1): per-batch probe
cost must NOT grow with corpus size — the probe reads only the index
partitions the batch's band-bucket keys hash into, and after compact()
that is one file set per touched partition regardless of how many
batches built the index.
"""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from data_pipeline_spark.operators.incremental_dedup import IncrementalDeduper

BASE = (
    "the quick brown fox jumps over the lazy dog while the band plays on "
    "and the caravan moves along the dusty road toward the distant hills "
) * 3
OTHER = (
    "completely different content about catalyst optimizers arrow batches "
    "shuffle partitions and adaptive query execution in distributed engines "
) * 3


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _deduper(spark, root, **kw):
    args = dict(k=8, bands=4, shingle=5, n_parts=16, cap=8, min_agree=4)
    args.update(kw)
    return IncrementalDeduper(spark, root, **args)


def _apply(ded, spark, rows, bid):
    return {
        r["doc_id"]: r["rep_id"]
        for r in ded.apply_batch(_docs(spark, rows), bid).collect()
    }


def test_incremental_match_semantics(spark, tdir):
    """Clones map to the FIRST-SEEN doc's rep across batches; unrelated
    docs map to themselves; a batch-2 clone chains to the batch-0 rep
    through the index's stored assignment (not to its batch-1 sibling's
    raw id)."""
    ded = _deduper(spark, os.path.join(tdir, "idx"))
    a0 = _apply(ded, spark, [(1, BASE), (2, OTHER)], 0)
    assert a0 == {1: 1, 2: 2}
    a1 = _apply(ded, spark, [(11, BASE + " zz"), (12, "short unrelated words " * 8)], 1)
    assert a1[11] == 1  # probed the standing index, matched the master doc
    assert a1[12] == 12
    a2 = _apply(ded, spark, [(21, BASE + " zz yy")], 2)
    # matches both 1 (rep 1) and 11 (stored rep 1) → min of stored reps = 1
    assert a2[21] == 1


def test_within_batch_peers_first_seen_wins(spark, tdir):
    """Two near-dups arriving in the SAME batch: the smaller id wins,
    exactly like the one-hop minhash_lsh_rep contract."""
    ded = _deduper(spark, os.path.join(tdir, "idx"))
    a = _apply(ded, spark, [(5, BASE), (7, BASE + " zz"), (9, OTHER)], 0)
    assert a == {5: 5, 7: 5, 9: 9}


def test_exactly_once_replay(spark, tdir):
    """Replaying an applied batch_id returns the STORED assignment and
    appends nothing to the index."""
    ded = _deduper(spark, os.path.join(tdir, "idx"))
    a0 = _apply(ded, spark, [(1, BASE), (2, OTHER)], 0)
    segs_before = list(ded._state["segments"])
    a0_replay = _apply(ded, spark, [(1, BASE), (2, OTHER)], 0)
    assert a0 == a0_replay
    assert ded._state["segments"] == segs_before
    # a fresh handle over the same root sees the same state (restart)
    ded2 = _deduper(spark, os.path.join(tdir, "idx"))
    assert _apply(ded2, spark, [(1, BASE), (2, OTHER)], 0) == a0


def test_probe_reads_only_touched_partitions(spark, tdir):
    """The probe path list is pruned driver-side to the pb partitions the
    batch's band-bucket keys hash into: a 1-doc batch (4 band keys) probes
    at most 4 of the 16 partitions per segment — never the whole index."""
    root = os.path.join(tdir, "idx")
    ded = _deduper(spark, root)
    rows = [(i, f"{OTHER} filler {i} " + "pad words here " * (i % 5)) for i in range(40)]
    for b in range(4):
        _apply(ded, spark, rows[b * 10 : (b + 1) * 10], b)
    _apply(ded, spark, [(900, BASE)], 99)
    probed = ded.last_probe_paths
    all_pb_dirs = [
        d
        for seg in ded._state["segments"][:-1]  # segments existing at probe time
        for d in glob.glob(os.path.join(root, seg, "pb=*"))
    ]
    assert probed, "probe path list must be observable"
    # ≤ bands pb-values × segments visible at probe time (4 segments)
    assert len(probed) <= 4 * 4
    assert len(probed) < len(all_pb_dirs), (
        f"probe read {len(probed)} dirs of {len(all_pb_dirs)} — no pruning"
    )
    pbs = {os.path.basename(p) for p in probed}
    assert len(pbs) <= 4  # one batch doc → at most `bands` distinct buckets


def test_compaction_bounds_probe_io(spark, tdir):
    """After compact(), probe I/O for a fixed batch is ONE file set per
    touched partition — independent of how many batches built the index
    — and match results are unchanged."""
    root = os.path.join(tdir, "idx")
    ded = _deduper(spark, root)
    _apply(ded, spark, [(1, BASE), (2, OTHER)], 0)
    _apply(ded, spark, [(3, OTHER + " xx"), (4, "totally new words " * 8)], 1)
    _apply(ded, spark, [(5, "more filler content here " * 8)], 2)
    n_folded = ded.compact()
    assert n_folded == 3
    assert len(ded._state["segments"]) == 1
    a = _apply(ded, spark, [(100, BASE + " zz")], 3)
    assert a[100] == 1  # index content survived compaction
    probed = ded.last_probe_paths
    seg = ded._state["segments"][0]
    assert all(f"{os.sep}{seg}{os.sep}" in p for p in probed)
    # one dir per touched pb, each holding exactly one parquet file
    assert len(probed) <= 4
    for d in probed:
        files = [f for f in os.listdir(d) if f.endswith(".parquet")]
        assert len(files) == 1, f"{d} not compacted: {files}"


def test_cdc_spine_integration(spark, tdir):
    """The deduper rides the CDC batch loop: each applied binlog batch's
    non-delete LWW winners (token CSV as the near-dup text) flow through
    apply_batch with the same batch tag — per-batch near-dup detection
    over the change stream, no corpus recompute."""
    from data_pipeline_spark.cdc.apply import lww_dedup
    from data_pipeline_spark.gen import gen_event_log_portable

    ev = gen_event_log_portable(spark, 600, 60, batch_size=200, hot_pct=10)
    ded = _deduper(spark, os.path.join(tdir, "idx"), min_agree=8)
    seen = 0
    for b in range(3):
        batch = ev.filter(F.col("batch_id") == b)
        winners = lww_dedup(batch, key="doc_id", strategy="agg").filter(
            F.col("op") != "delete"
        )
        docs = winners.select(
            F.col("doc_id"), F.concat_ws(" ", "tokens").alias("text")
        )
        out = ded.apply_batch(docs, b)
        n_docs = docs.count()
        assert out.count() == n_docs  # one assignment per winner
        seen += n_docs
    assert seen > 0
    # every batch is recorded exactly once
    assert sorted(ded._state["batches"]) == ["0", "1", "2"]


def test_run_stream_maintains_dedup_index_exactly_once(spark, tdir):
    """Full streaming integration: run_stream(dedup_index=...) maintains
    the band index per epoch alongside the icebox apply. Restarting the
    stream from the same checkpoint replays epochs as no-ops on BOTH the
    table (tags) and the index (STATE) — segments, batch records, and
    assignments are all unchanged after the rerun."""
    from data_pipeline_spark.cdc.stream import run_stream
    from data_pipeline_spark.gen import gen_event_log
    from data_pipeline_spark.icebox import IceboxTable

    from .test_cdc_apply import BASE_SCHEMA
    from .test_checkpoint_resume import EV_SCHEMA

    events_dir = os.path.join(tdir, "events")
    gen_event_log(
        spark, n_events=2000, n_docs=200, batch_size=500, partitions=4
    ).write.partitionBy("batch_id").parquet(events_dir)

    root = os.path.join(tdir, "table")
    ckpt = os.path.join(tdir, "ckpt")
    IceboxTable.create(spark, root, BASE_SCHEMA, n_buckets=8)
    ded = _deduper(spark, os.path.join(tdir, "idx"))
    run_stream(
        spark, events_dir, EV_SCHEMA, root, ckpt,
        query_name="ded", max_files_per_trigger=2, dedup_index=ded,
    )
    epochs = sorted(ded._state["batches"])
    assert len(epochs) >= 2  # small triggers forced multiple epochs
    assert all(t.startswith("stream:ded:") for t in epochs)
    segments = list(ded._state["segments"])
    assign0 = {
        t: sorted(
            (r["doc_id"], r["rep_id"]) for r in ded._read_assign(t).collect()
        )
        for t in epochs
    }
    assert all(assign0[t] for t in epochs)  # every epoch assigned docs

    # restart from the same checkpoint: nothing new to process → the
    # index is byte-identical (exactly-once across the restart)
    ded2 = _deduper(spark, os.path.join(tdir, "idx"))
    run_stream(
        spark, events_dir, EV_SCHEMA, root, ckpt,
        query_name="ded", max_files_per_trigger=2, dedup_index=ded2,
    )
    assert sorted(ded2._state["batches"]) == epochs
    assert ded2._state["segments"] == segments
    for t in epochs:
        got = sorted(
            (r["doc_id"], r["rep_id"]) for r in ded2._read_assign(t).collect()
        )
        assert got == assign0[t]


def test_run_stream_dedup_index_compaction_knob(spark, tdir):
    """dedup_compact_segments folds the index LSM inside the stream:
    segment count stays bounded by the knob no matter how many epochs
    ran, and every epoch's stored assignment remains readable."""
    from data_pipeline_spark.cdc.stream import run_stream
    from data_pipeline_spark.gen import gen_event_log
    from data_pipeline_spark.icebox import IceboxTable

    from .test_cdc_apply import BASE_SCHEMA
    from .test_checkpoint_resume import EV_SCHEMA

    events_dir = os.path.join(tdir, "events")
    gen_event_log(
        spark, n_events=1200, n_docs=120, batch_size=300, partitions=4
    ).write.partitionBy("batch_id").parquet(events_dir)

    root = os.path.join(tdir, "table")
    IceboxTable.create(spark, root, BASE_SCHEMA, n_buckets=8)
    ded = _deduper(spark, os.path.join(tdir, "idx"))
    run_stream(
        spark, events_dir, EV_SCHEMA, root, os.path.join(tdir, "ckpt"),
        query_name="dc", max_files_per_trigger=1,
        dedup_index=ded, dedup_compact_segments=2,
    )
    epochs = sorted(ded._state["batches"])
    assert len(epochs) >= 3  # one file per trigger forced many epochs
    assert len(ded._state["segments"]) <= 2  # LSM stayed folded
    for t in epochs:  # assignments survive compaction
        assert ded._read_assign(t).count() > 0


def test_compact_reclaims_crash_orphans(spark, tdir):
    """Dirs left by a crash between the segment write and the STATE swap
    (segment + assign orphans, absent from STATE) must be reclaimed by
    compact() once past the grace window — otherwise a long-running
    stream leaks disk without bound."""
    import shutil

    root = os.path.join(tdir, "dd")
    d = _deduper(spark, root)
    d.apply_batch(_docs(spark, [(1, BASE), (2, OTHER)]), 0)
    d.apply_batch(_docs(spark, [(3, BASE + " tail")]), 1)

    # fake a crashed apply: segment + assign dirs on disk, not in STATE
    live_seg = d._state["segments"][0]
    orphan_seg = os.path.join(root, "seg-99-deadbeef")
    shutil.copytree(os.path.join(root, live_seg), orphan_seg)
    orphan_assign = os.path.join(root, "assign", "seg-99-deadbeef")
    shutil.copytree(
        os.path.join(root, d._state["batches"]["0"]), orphan_assign
    )

    # inside the grace window nothing is touched
    d.compact(orphan_grace=3600.0)
    assert os.path.isdir(orphan_seg) and os.path.isdir(orphan_assign)

    # past the grace window both orphans are reclaimed, committed
    # segments/assignments survive, and probes still work
    d.compact(orphan_grace=0.0)
    assert not os.path.exists(orphan_seg)
    assert not os.path.exists(orphan_assign)
    a0 = {r["doc_id"]: r["rep_id"] for r in d.apply_batch(None, 0).collect()}
    assert a0 == {1: 1, 2: 2}
    out = d.apply_batch(_docs(spark, [(4, BASE + " more")]), 2)
    assert {r["doc_id"]: r["rep_id"] for r in out.collect()} == {4: 1}
