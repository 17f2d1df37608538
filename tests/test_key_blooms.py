"""Manifest key blooms: no false negatives ever (every committed key
probes as present), real delta skipping where key bounds cannot help
(interleaved key ranges), conservative degradation, and stat travel
through compaction."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from data_pipeline_spark.cdc import apply_batch, apply_batch_partial
from data_pipeline_spark.icebox import IceboxTable
from data_pipeline_spark.icebox.table import (
    _bloom_positions,
    bloom_might_contain,
    pack_key_blooms,
)

from .test_cdc_apply import BASE_SCHEMA
from .test_partial_update import EV_DDL


def _batch(spark, bid, keys, lsn0):
    rows = [
        (lsn0 + i, bid, "insert", k, [i % 7], i % 30, "s")
        for i, k in enumerate(keys)
    ]
    return spark.createDataFrame(rows, EV_DDL)


def _interleaved_table(spark, tdir, n_batches=8, per_batch=40):
    """Each batch's keys interleave across the whole doc_XXXX space, so
    every delta's per-bucket [min, max] covers nearly everything and
    range pruning is useless — only the bloom can skip."""
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), BASE_SCHEMA, n_buckets=2)
    for b in range(n_batches):
        keys = [f"doc_{k:04d}" for k in range(b, n_batches * per_batch, n_batches)]
        t = apply_batch(
            t, _batch(spark, b, keys, lsn0=b * 10_000), b, merge_strategy="delta"
        )
    return t


def test_no_false_negatives_and_lookup_correct(spark, tdir):
    t = _interleaved_table(spark, tdir)
    # every delta entry recorded a bloom for its buckets
    for d in t.manifest["deltas"]:
        assert set(d["key_blooms"]) == set(d["bucket_rows"])
    # every committed key must probe as present in its own batch's bloom
    for b, d in enumerate(t.manifest["deltas"]):
        keys = [f"doc_{k:04d}" for k in range(b, 8 * 40, 8)]
        live = t.prune_delta_buckets(keys=[keys[0]])
        assert live[b], "own batch pruned — false negative"
    # point lookups stay exact
    got = t.lookup(["doc_0013"]).collect()
    assert len(got) == 1 and got[0]["doc_id"] == "doc_0013"
    assert t.lookup(["doc_9999"]).collect() == []


def test_bloom_skips_deltas_bounds_cannot(spark, tdir):
    t = _interleaved_table(spark, tdir)
    probe = ["doc_0013"]  # lives in batch 5 (13 % 8)
    # bounds alone: every delta's range contains doc_0013 → nothing skips
    stripped = IceboxTable(
        spark,
        t.root,
        {
            **t.manifest,
            "deltas": [
                {k: v for k, v in d.items() if k != "key_blooms"}
                for d in t.manifest["deltas"]
            ],
        },
    )
    bounds_live = sum(1 for s in stripped.prune_delta_buckets(keys=probe) if s)
    assert bounds_live == 8, "interleaving should defeat range pruning"
    # blooms: only the owning delta (plus ≤2 false positives) survives
    bloom_live = [bool(s) for s in t.prune_delta_buckets(keys=probe)]
    assert bloom_live[13 % 8]
    assert sum(bloom_live) <= 3


def test_partial_engine_records_blooms(spark, tdir):
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), BASE_SCHEMA, n_buckets=2)
    t = apply_batch_partial(t, _batch(spark, 0, ["a", "b", "c"], 1), 0)
    (d,) = t.manifest["deltas"]
    assert set(d["key_blooms"]) == set(d["bucket_rows"])
    assert [bool(s) for s in t.prune_delta_buckets(keys=["a"])] == [True]
    assert [bool(s) for s in t.prune_delta_buckets(keys=["zzz"])] == [False]


def test_conservative_degradation():
    pos = _bloom_positions(["k1"])
    assert bloom_might_contain(None, pos) is True  # pre-bloom manifests
    assert bloom_might_contain("!!!notb64!!!", pos) is True
    assert bloom_might_contain("AAAA", pos) is True  # wrong length
    # unportable key types disable the bloom, never mis-skip
    assert _bloom_positions([1.5]) is None
    assert _bloom_positions([True]) is None
    assert bloom_might_contain("AAAA", None) is True
    # int keys hash like their Spark string cast
    assert _bloom_positions([42]) == _bloom_positions(["42"])


def test_pack_skips_rows_without_bloom_cols():
    assert pack_key_blooms([{"_b": 0, "n": 3}]) == {}


def test_blooms_travel_through_compaction(spark, tdir):
    t = _interleaved_table(spark, tdir, n_batches=4, per_batch=20)
    n_before = len(t.manifest["deltas"])
    assert n_before == 4
    tc = t.compact_if_needed(ratio=0.0)
    # full compaction folds every delta into base — blooms go with them
    assert not any(d.get("key_blooms") for d in tc.manifest.get("deltas") or [])
    got = tc.lookup(["doc_0007"]).collect()
    assert len(got) == 1
    # and a post-compaction delta starts recording again
    tc = apply_batch(
        tc, _batch(spark, 9, ["doc_9001"], 90_000), 9, merge_strategy="delta"
    )
    (d,) = tc.manifest["deltas"]
    assert d["key_blooms"]
    assert [bool(s) for s in tc.prune_delta_buckets(keys=["doc_9001"])] == [True]
    assert [bool(s) for s in tc.prune_delta_buckets(keys=["doc_0007"])] == [False]
