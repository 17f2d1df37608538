"""Incremental inverted index (index.InvertedIndex): the postings table
refreshed from the change feed after every batch must equal a
from-scratch explode(distinct tokens) over the source's final state —
including under deletes (postings retracted), token-set-changing
updates (stale terms removed, new added), crash-redelivery at the
apply/ack boundary, and compaction. Prefix bucketing must co-locate
every posting of a term in one bucket."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from data_pipeline_spark.cdc import apply_batch
from data_pipeline_spark.gen import gen_event_log
from data_pipeline_spark.icebox import IceboxTable
from data_pipeline_spark.index import InvertedIndex

from .oracle import replay_oracle
from .test_cdc_apply import BASE_SCHEMA, PAYLOAD

EV_DDL = (
    "lsn long, op string, doc_id string, tokens array<int>, "
    "n_tok int, source string"
)


def _oracle_pairs(log_pdf, upto_batch):
    """From-scratch {(term, doc_id)} over the final LWW state."""
    st = replay_oracle(log_pdf[log_pdf["batch_id"] <= upto_batch], PAYLOAD)
    pairs = set()
    for row in st.itertuples(index=False):
        toks = row.tokens
        if toks is None:
            continue
        for t in set(list(toks)):
            pairs.add((str(t), row.doc_id))
    return pairs


def _got_pairs(idx):
    return {(r["term"], r["doc_id"]) for r in idx.read().collect()}


def _setup(spark, tdir, n_events=3000, n_docs=300, batch_size=1000):
    log = gen_event_log(
        spark, n_events, n_docs, batch_size=batch_size, hot_frac=0.2,
        delete_frac=0.15,
    )
    log_pdf = log.toPandas()
    t = IceboxTable.create(
        spark, os.path.join(tdir, "src"), BASE_SCHEMA, n_buckets=8
    )
    idx = InvertedIndex(
        spark, t, os.path.join(tdir, "idx"), name="toks", n_buckets=16
    )
    return log, log_pdf, t, idx


def _batches(log):
    return sorted(
        r["batch_id"] for r in log.select("batch_id").distinct().collect()
    )


def test_refresh_per_batch_equals_recompute(spark, tdir):
    log, log_pdf, t, idx = _setup(spark, tdir)
    for b in _batches(log):
        t = apply_batch(t, log.filter(F.col("batch_id") == b), b)
        idx.source = t
        idx.refresh()
        assert _got_pairs(idx) == _oracle_pairs(log_pdf, b)


def test_update_retracts_stale_postings(spark, tdir):
    t = IceboxTable.create(
        spark, os.path.join(tdir, "src"), BASE_SCHEMA, n_buckets=4
    )
    ev = spark.createDataFrame(
        [(1, "insert", "d1", [1, 2, 2], 3, "a"),
         (2, "insert", "d2", [2, 5], 2, "a")],
        EV_DDL,
    )
    t = apply_batch(t, ev, 0)
    idx = InvertedIndex(spark, t, os.path.join(tdir, "idx"), n_buckets=4)
    idx.refresh()
    assert _got_pairs(idx) == {
        ("1", "d1"), ("2", "d1"), ("2", "d2"), ("5", "d2")
    }
    # d1's token set changes {1,2} -> {2,3}: posting (1,d1) must retract
    ev2 = spark.createDataFrame(
        [(3, "update", "d1", [2, 3], 2, "a")], EV_DDL
    )
    t = apply_batch(t, ev2, 1)
    idx.source = t
    idx.refresh()
    assert _got_pairs(idx) == {
        ("2", "d1"), ("3", "d1"), ("2", "d2"), ("5", "d2")
    }
    # d2 deleted: both its postings retract; d1 untouched
    ev3 = spark.createDataFrame(
        [(4, "delete", "d2", None, None, None)], EV_DDL
    )
    t = apply_batch(t, ev3, 2)
    idx.source = t
    idx.refresh()
    assert _got_pairs(idx) == {("2", "d1"), ("3", "d1")}


def test_crash_between_apply_and_ack_is_exactly_once(spark, tdir):
    """Apply committed, ack lost, source advances while down: recovery
    must fast-forward past the applied prefix, never double-fold."""
    log, log_pdf, t, idx = _setup(spark, tdir)
    bs = _batches(log)
    t = apply_batch(t, log.filter(F.col("batch_id") == bs[0]), bs[0])
    idx.source = t
    real_ack = idx.cursor.ack
    idx.cursor.ack = lambda sid: None
    idx.refresh()
    idx.cursor.ack = real_ack
    assert idx.cursor.position == 0
    assert _got_pairs(idx) == _oracle_pairs(log_pdf, bs[0])

    for b in bs[1:]:
        t = apply_batch(t, log.filter(F.col("batch_id") == b), b)
    idx2 = InvertedIndex(
        spark, t, os.path.join(tdir, "idx"), name="toks", n_buckets=16
    )
    idx2.refresh()
    assert _got_pairs(idx2) == _oracle_pairs(log_pdf, bs[-1])


def test_posting_less_interval_commits_nothing(spark, tdir):
    """A source interval with no term-set changes (compaction-only
    commit, or an update touching only non-token columns) must advance
    the cursor WITHOUT minting an empty index snapshot."""
    t = IceboxTable.create(
        spark, os.path.join(tdir, "src"), BASE_SCHEMA, n_buckets=4
    )
    ev = spark.createDataFrame(
        [(1, "insert", "d1", [1, 2], 2, "a")], EV_DDL
    )
    t = apply_batch(t, ev, 0, merge_strategy="delta")
    idx = InvertedIndex(spark, t, os.path.join(tdir, "idx"), n_buckets=4)
    idx.refresh()
    sid = idx.view.snapshot_id
    pos = idx.cursor.position

    # compaction-only source commit: data-less change interval
    t = t.compact_if_needed(ratio=0.0)
    # update that changes ONLY the source column — term set unchanged
    ev2 = spark.createDataFrame(
        [(2, "update", "d1", [1, 2], 2, "b")], EV_DDL
    )
    t = apply_batch(t, ev2, 1, merge_strategy="delta")
    idx.source = t
    idx.refresh()
    assert idx.view.snapshot_id == sid  # no empty commit
    assert idx.cursor.position > pos    # but the position advanced
    assert _got_pairs(idx) == {("1", "d1"), ("2", "d1")}


def test_stop_terms_gate_and_retroactive_cleanup(spark, tdir):
    """Hot-term skew control: stopped terms are never indexed (adds AND
    removes filtered, so later updates leave no dangling maintenance);
    terms stopped AFTER being indexed are purged retroactively with a
    plain delete_where over the index view."""
    from data_pipeline_spark.cdc.delete import delete_where

    t = IceboxTable.create(
        spark, os.path.join(tdir, "src"), BASE_SCHEMA, n_buckets=4
    )
    ev = spark.createDataFrame(
        [(1, "insert", "d1", [2, 7], 2, "a"),
         (2, "insert", "d2", [2, 9], 2, "a")],
        EV_DDL,
    )
    t = apply_batch(t, ev, 0)
    idx = InvertedIndex(
        spark, t, os.path.join(tdir, "idx"), n_buckets=4, stop_terms=[2]
    )
    idx.refresh()
    assert _got_pairs(idx) == {("7", "d1"), ("9", "d2")}
    # an update touching the stopped term stays a clean no-op for it
    ev2 = spark.createDataFrame(
        [(3, "update", "d1", [2, 8], 2, "a")], EV_DDL
    )
    t = apply_batch(t, ev2, 1)
    idx.source = t
    idx.refresh()
    assert _got_pairs(idx) == {("8", "d1"), ("9", "d2")}

    # retroactive: an index built WITHOUT the stop list purges via
    # delete_where on its own view (tagged, O(matched))
    idx2 = InvertedIndex(
        spark, t, os.path.join(tdir, "idx2"), name="all", n_buckets=4
    )
    idx2.refresh()
    assert ("2", "d2") in _got_pairs(idx2)
    idx2.view = delete_where(idx2.view, "term = '2'", op_id="stop:2")
    assert _got_pairs(idx2) == {("8", "d1"), ("9", "d2")}
    # the detector that would have found it: df rollup
    idx3 = InvertedIndex(
        spark, t, os.path.join(tdir, "idx3"), name="df", n_buckets=4
    )
    idx3.refresh()
    dfm = {r["term"]: r["df"] for r in idx3.term_frequencies().collect()}
    assert dfm["2"] == 2 and dfm["8"] == 1
    assert {r["term"] for r in idx3.term_frequencies(min_df=2).collect()} == {"2"}


def test_ngram_index_incremental_contamination_probe(spark, tdir):
    """term_fn=ngram_hash_terms(3): the index maintains 3-gram hash
    postings incrementally; a benchmark gram (computed independently
    with the portable h64_py twin) probes the standing corpus across
    batches, and an update that drops the window retracts its posting."""
    from data_pipeline_spark.index import ngram_hash_py, ngram_hash_terms

    def gram(*toks):
        return ngram_hash_py(toks)

    t = IceboxTable.create(
        spark, os.path.join(tdir, "src"), BASE_SCHEMA, n_buckets=4
    )
    t = apply_batch(
        t,
        spark.createDataFrame(
            [(1, "insert", "d1", [1, 2, 3, 4], 4, "a"),
             (2, "insert", "dshort", [7, 8], 2, "a"),
             # null-position collision guard: these two windows must
             # hash to DIFFERENT grams (a null-skipping join would
             # conflate both to "5_7")
             (3, "insert", "dnull_a", [5, None, 7], 3, "a"),
             (4, "insert", "dnull_b", [5, 7, None], 3, "a")],
            EV_DDL,
        ),
        0,
    )
    idx = InvertedIndex(
        spark, t, os.path.join(tdir, "idx"), n_buckets=4,
        term_fn=ngram_hash_terms(3),
    )
    idx.refresh()
    assert _got_pairs(idx) == {
        (gram(1, 2, 3), "d1"), (gram(2, 3, 4), "d1"),
        (gram(5, None, 7), "dnull_a"), (gram(5, 7, None), "dnull_b"),
    }  # short doc contributes nothing; null positions don't collide
    assert gram(5, None, 7) != gram(5, 7, None)
    assert {
        r["doc_id"] for r in idx.docs_with([gram(5, None, 7)]).collect()
    } == {"dnull_a"}
    # batch 2: a new doc shares the (2,3,4) window — the standing-corpus
    # probe finds both
    t = apply_batch(
        t,
        spark.createDataFrame(
            [(3, "insert", "d2", [9, 2, 3, 4], 4, "a")], EV_DDL
        ),
        1,
    )
    idx.source = t
    idx.refresh()
    hits = {
        (r["term"], r["doc_id"])
        for r in idx.docs_with([gram(2, 3, 4)]).collect()
    }
    assert hits == {(gram(2, 3, 4), "d1"), (gram(2, 3, 4), "d2")}
    # d1 truncated to [1,2,3]: its (2,3,4) posting retracts
    t = apply_batch(
        t,
        spark.createDataFrame(
            [(4, "update", "d1", [1, 2, 3], 3, "a")], EV_DDL
        ),
        2,
    )
    idx.source = t
    idx.refresh()
    hits = {
        r["doc_id"] for r in idx.docs_with([gram(2, 3, 4)]).collect()
    }
    assert hits == {"d2"}


def test_streaming_spine_maintains_index(spark, tdir):
    """run_stream(materialized_views=[InvertedIndex], view_compact_ratio=):
    the index folds forward per epoch; final postings equal the oracle;
    restart from the same checkpoint is a no-op on BOTH table and index;
    view_compact_ratio keeps the index's delta count bounded."""
    from data_pipeline_spark.cdc.stream import run_stream

    log, log_pdf, t, idx = _setup(spark, tdir, n_events=2000, n_docs=200,
                                  batch_size=500)
    ev = os.path.join(tdir, "ev")
    log.write.partitionBy("batch_id").parquet(ev)
    schema = spark.read.parquet(ev).drop("batch_id").schema
    run_stream(
        spark, ev, schema, t.root, os.path.join(tdir, "ckpt"),
        max_files_per_trigger=1, merge_strategy="delta",
        materialized_views=[idx], view_compact_ratio=0.5,
        lineage_max_paths=2,
    )
    want = _oracle_pairs(log_pdf, _batches(log)[-1])
    assert _got_pairs(idx) == want
    # the fold actually ran: deltas bounded, not one per epoch
    assert len(idx.view.manifest["deltas"]) < len(_batches(log))
    # lineage maintenance bounded the manifest's path list on the spine
    t_after = IceboxTable.load(spark, t.root)
    assert len(t_after.manifest["lineage_paths"]) <= 3
    assert t_after.read_lineage().count() > 0
    sid_t = IceboxTable.load(spark, t.root).snapshot_id
    sid_i = idx.view.snapshot_id
    run_stream(
        spark, ev, schema, t.root, os.path.join(tdir, "ckpt"),
        max_files_per_trigger=1, merge_strategy="delta",
        materialized_views=[idx], view_compact_ratio=0.5,
    )
    assert IceboxTable.load(spark, t.root).snapshot_id == sid_t
    assert idx.view.snapshot_id == sid_i
    assert _got_pairs(idx) == want


def test_docs_with_probes_only_term_buckets_and_compaction(spark, tdir):
    log, log_pdf, t, idx = _setup(spark, tdir, n_events=2000, n_docs=200)
    for b in _batches(log):
        t = apply_batch(t, log.filter(F.col("batch_id") == b), b)
        idx.source = t
        idx.refresh()
    want = _oracle_pairs(log_pdf, _batches(log)[-1])
    probe = sorted({term for term, _ in want})[:5]
    got = {
        (r["term"], r["doc_id"]) for r in idx.docs_with(probe).collect()
    }
    assert got == {(tm, d) for tm, d in want if tm in set(probe)}
    assert got  # the probe actually returned postings

    # the probe read a strict subset of buckets
    reads = []
    real_read = idx.view.read
    idx.view.read = lambda **kw: (reads.append(kw), real_read(**kw))[1]
    idx.docs_with(probe[:1]).collect()
    idx.view.read = real_read
    assert len(reads[0]["buckets"]) == 1  # one term -> one bucket

    # prefix bucketing: every posting of a term lives in ONE bucket
    per_term = (
        idx.view.read()
        .withColumn("_b", idx.view.bucket_of())
        .groupBy("term")
        .agg(F.countDistinct("_b").alias("nb"))
        .agg(F.max("nb").alias("mx"))
        .first()
    )
    assert per_term["mx"] == 1

    # compaction folds the per-refresh deltas without changing content
    assert idx.view.manifest["deltas"]
    idx.maintain(compact_ratio=10_000)  # force: ratio huge -> no-op
    idx.view = idx.view.compact_if_needed(ratio=0.0)  # force fold
    assert not idx.view.manifest["deltas"]
    assert _got_pairs(idx) == want
