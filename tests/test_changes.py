"""Incremental change feed (IceboxTable.changes): net row-level diff
between two snapshots vs an independent pandas state-diff oracle, for
both MoR-delta and CoW intervals; no-op intervals (compaction) emit
nothing and schedule no scan of unrelated data; rollback forces the
safe full diff; schema evolution conforms pre-images; the fast path
provably reads only the touched buckets' files."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from data_pipeline_spark.cdc import apply_batch, replay_log
from data_pipeline_spark.gen import gen_event_log
from data_pipeline_spark.icebox import IceboxTable

from .oracle import replay_oracle
from .test_cdc_apply import BASE_SCHEMA, PAYLOAD


def _state(log_pdf, upto_batch):
    """Oracle state dict after replaying batches <= upto_batch."""
    ev = log_pdf[log_pdf["batch_id"] <= upto_batch]
    st = replay_oracle(ev, PAYLOAD)
    return {
        r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
        for _, r in st.iterrows()
    }


def _expected_diff(pre, post, include_pre=True):
    """Oracle change set: {(doc_id, change_type): payload-tuple}."""
    out = {}
    for k in post.keys() - pre.keys():
        out[(k, "insert")] = post[k]
    for k in pre.keys() - post.keys():
        out[(k, "delete")] = pre[k]
    for k in pre.keys() & post.keys():
        if pre[k] != post[k]:
            if include_pre:
                out[(k, "update_pre")] = pre[k]
            out[(k, "update_post")] = post[k]
    return out


def _got_diff(chg_df):
    return {
        (r["doc_id"], r["_change_type"]): (
            list(r["tokens"]),
            r["n_tok"],
            r["source"],
        )
        for r in chg_df.collect()
    }


def _replay_to(spark, tdir, log, stops, merge_strategy="delta"):
    """Apply batches in order; record snapshot ids after each batch id
    in `stops`. Returns (table, {batch_id: snapshot_id})."""
    t = IceboxTable.create(
        spark, os.path.join(tdir, "t"), BASE_SCHEMA, n_buckets=8
    )
    sids = {}
    for b in sorted(r["batch_id"] for r in log.select("batch_id").distinct().collect()):
        t = apply_batch(
            t, log.filter(F.col("batch_id") == b), b,
            merge_strategy=merge_strategy,
        )
        if b in stops:
            sids[b] = t.snapshot_id
    return t, sids


def test_changes_match_state_diff_delta(spark, tdir):
    log = gen_event_log(
        spark, n_events=1600, n_docs=200, batch_size=400,
        delete_frac=0.2, partitions=4,
    )
    pdf = log.toPandas()
    t, sids = _replay_to(spark, tdir, log, stops={0, 1, 3})
    for a, b in [(0, 1), (0, 3), (1, 3)]:
        got = _got_diff(t.changes(sids[a], sids[b]))
        want = _expected_diff(_state(pdf, a), _state(pdf, b))
        assert got == want, f"interval batches {a}->{b}"


def test_changes_match_state_diff_cow(spark, tdir):
    """CoW merges fold keys into base files — changes() must detect the
    recorded bucket ids and fall back to a bucket-restricted state diff
    (candidate semi-join unavailable), same answer."""
    log = gen_event_log(
        spark, n_events=1200, n_docs=150, batch_size=400,
        delete_frac=0.25, partitions=4,
    )
    pdf = log.toPandas()
    t, sids = _replay_to(spark, tdir, log, stops={0, 2}, merge_strategy="shuffle")
    got = _got_diff(t.changes(sids[0], sids[2]))
    assert got == _expected_diff(_state(pdf, 0), _state(pdf, 2))


def test_changes_default_to_and_include_pre_false(spark, tdir):
    log = gen_event_log(spark, n_events=800, n_docs=100, batch_size=400, partitions=4)
    pdf = log.toPandas()
    t, sids = _replay_to(spark, tdir, log, stops={0})
    got = _got_diff(t.changes(sids[0], include_pre=False))  # to = current
    assert got == _expected_diff(_state(pdf, 0), _state(pdf, 1), include_pre=False)


def test_changes_net_collapse_insert_then_delete(spark, tdir):
    """A key born and deleted inside the interval must emit nothing."""
    rows = [
        # (lsn, op, doc_id, tokens, n_tok, source, batch_id)
        (1, "insert", "keep", [1], 1, "s", 0),
        (2, "insert", "ghost", [2], 1, "s", 1),
        (3, "update", "keep", [1, 2], 2, "s", 1),
        (4, "delete", "ghost", None, None, None, 2),
    ]
    log = spark.createDataFrame(
        rows,
        "lsn long, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string, batch_id int",
    )
    t, sids = _replay_to(spark, tdir, log, stops={0})
    got = _got_diff(t.changes(sids[0]))
    assert set(got) == {("keep", "update_pre"), ("keep", "update_post")}


def test_changes_compaction_only_interval_is_statically_empty(spark, tdir):
    log = gen_event_log(spark, n_events=800, n_docs=100, batch_size=400, partitions=4)
    t, sids = _replay_to(spark, tdir, log, stops={1})
    t = t.compact_if_needed(ratio=0.0)
    assert t.snapshot_id > sids[1]  # compaction actually committed
    chg = t.changes(sids[1])
    assert chg.count() == 0
    # the no-op interval is recognized driver-side: nothing is scanned
    assert chg.inputFiles() == []
    assert chg.columns == [*[f.name for f in t.schema.fields], "_change_type"]


def test_changes_across_maintenance_commits_stays_incremental(spark, tdir):
    """Spine maintenance (z-order rewrite, analyze, lineage fold) moves
    no logical rows: an interval containing them plus ONE real delta
    batch must diff exactly that batch AND stay on the fast path —
    reading the interval's delta files, never both full snapshots.
    (Regression: any op missing from changes()'s whitelist silently
    degrades every incremental consumer to the full-state diff.)"""
    log = gen_event_log(spark, n_events=800, n_docs=150, batch_size=400,
                        partitions=4)
    log_pdf = log.toPandas()
    t, sids = _replay_to(spark, tdir, log, stops={0, 1})  # batches 0,1
    # maintenance storm between the cursor's two polls
    t = t.rewrite_clustered(["n_tok"], files_per_bucket=2)
    t = t.analyze()
    t = t.compact_lineage(max_paths=1)
    assert t.manifest["summary"]["operation"] == "compact_lineage"
    # tiny real batch after the maintenance storm: touches few buckets
    ev = spark.createDataFrame(
        [(10_000_000, "update", "doc_%08d" % 1, [42], 1, "web"),
         (10_000_001, "delete", "doc_%08d" % 2, None, None, None)],
        "lsn long, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string",
    )
    t = apply_batch(t, ev, 99, merge_strategy="delta")
    log2 = __import__("pandas").concat(
        [log_pdf[log_pdf["batch_id"] <= 1],
         __import__("pandas").DataFrame(
             {"lsn": [10_000_000, 10_000_001], "batch_id": [99, 99],
              "op": ["update", "delete"],
              "doc_id": ["doc_%08d" % 1, "doc_%08d" % 2],
              "tokens": [[42], None], "n_tok": [1, None],
              "source": ["web", None]})]
    )
    chg = t.changes(sids[1])
    assert _got_diff(chg) == _expected_diff(
        _state(log_pdf, 1), _state(log2, 99)
    )
    # fast path held: bucket-pruned reads (2 touched buckets of 8) —
    # a full_diff would scan EVERY bucket of both snapshots
    files = chg.inputFiles()
    assert files
    full = len(t.read().inputFiles()) + len(
        IceboxTable.load(spark, t.root, sids[1]).read().inputFiles()
    )
    assert len(files) < full, (len(files), full)


def test_changes_across_rollback_full_diff_correct(spark, tdir):
    log = gen_event_log(
        spark, n_events=1200, n_docs=150, batch_size=400,
        delete_frac=0.2, partitions=4,
    )
    pdf = log.toPandas()
    t, sids = _replay_to(spark, tdir, log, stops={0, 1, 2})
    t = t.rollback(sids[1])  # state jumps back to batch-1 state
    got = _got_diff(t.changes(sids[0]))
    # net effect of (apply b1, apply b2, rollback-to-b1) since A = b0→b1
    assert got == _expected_diff(_state(pdf, 0), _state(pdf, 1))


def test_changes_schema_evolution_conforms_pre_images(spark, tdir):
    from pyspark.sql.types import (
        ArrayType, IntegerType, StringType, StructField, StructType,
    )

    narrow = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("tokens", ArrayType(IntegerType())),
            StructField("n_tok", IntegerType()),
        ]
    )
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), narrow, n_buckets=4)
    b0 = gen_event_log(spark, n_events=300, n_docs=60, batch_size=300,
                       with_source=False, partitions=2)
    t = apply_batch(t, b0, 0)
    a_sid = t.snapshot_id
    b1 = (
        gen_event_log(spark, n_events=300, n_docs=60, batch_size=300,
                      with_source=True, partitions=2)
        .withColumn("lsn", F.col("lsn") + F.lit(300))
        .withColumn("batch_id", F.lit(1))
    )
    t = apply_batch(t, b1, 1)
    chg = t.changes(a_sid)
    assert "source" in chg.columns  # B-schema output
    pre = chg.filter(F.col("_change_type") == "update_pre")
    assert pre.count() > 0
    # pre-images predate the column: conformed to typed null
    assert pre.filter(F.col("source").isNotNull()).count() == 0
    post_null = chg.filter(
        (F.col("_change_type") == "update_post") & F.col("source").isNull()
    )
    assert post_null.count() == 0


def test_changes_fast_path_reads_only_touched_buckets(spark, tdir):
    """With one small delta commit in the interval, the diff must scan
    only the touched buckets' base files + the interval's delta files —
    never the whole table."""
    log = gen_event_log(spark, n_events=2000, n_docs=400, batch_size=2000, partitions=4)
    # batch 0 as CoW so the table HAS a hive-partitioned base layout to
    # prune (a delta-only table keeps every row in unpartitioned delta
    # files and the bucket-prune evidence would be vacuous)
    t, sids = _replay_to(spark, tdir, log, stops={0}, merge_strategy="shuffle")
    # a surgical second batch: 3 docs updated
    upd = spark.createDataFrame(
        [
            (9001, "update", "doc_%06d" % i, [7, 7], 2, "s", 1)
            for i in (1, 2, 3)
        ],
        "lsn long, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string, batch_id int",
    )
    t = apply_batch(t, upd, 1, merge_strategy="delta")
    chg = t.changes(sids[0])
    touched = {
        int(r["_b"])
        for r in upd.select(t.bucket_of().alias("_b")).collect()
    }
    files = chg.inputFiles()
    assert files  # fast path still reads something
    base_files = [f for f in files if "_b=" in f]
    assert base_files, "bucket-pruned base reads must be hive-partitioned paths"
    for f in base_files:
        b = int(f.split("_b=")[1].split("/")[0])
        assert b in touched, f"scanned untouched bucket {b}: {f}"
    # and the scan is a strict subset of the full-table read
    assert len(files) < len(t.read().inputFiles()) + len(
        IceboxTable.load(spark, t.root, sids[0]).read().inputFiles()
    )
    import pandas as pd

    pdf = pd.concat([log.toPandas(), upd.toPandas()], ignore_index=True)
    assert _got_diff(chg) == _expected_diff(_state(pdf, 0), _state(pdf, 1))


def test_register_changes_sql_surface(spark, tdir):
    """table_changes-TVF analog: the registered view answers SQL over
    the change feed."""
    from data_pipeline_spark.sql import register_changes

    log = gen_event_log(spark, n_events=800, n_docs=100, batch_size=400, partitions=4)
    pdf = log.toPandas()
    t, sids = _replay_to(spark, tdir, log, stops={0})
    register_changes(t, "t_changes", sids[0])
    got = {
        (r["_change_type"], int(r["n"]))
        for r in spark.sql(
            "SELECT _change_type, count(*) AS n FROM t_changes GROUP BY 1"
        ).collect()
    }
    want = {}
    for (_, typ) in _expected_diff(_state(pdf, 0), _state(pdf, 1)):
        want[typ] = want.get(typ, 0) + 1
    assert got == {(k, v) for k, v in want.items()}


def test_change_cursor_poll_ack_exactly_once(spark, tdir):
    """Consumer protocol: poll delivers the interval since the last
    ack; a crash between poll and ack (simulated by re-creating the
    cursor without acking) redelivers the IDENTICAL interval; after
    ack the next poll starts where the last one ended; a stale ack is
    rejected."""
    import pytest

    from data_pipeline_spark.icebox import ChangeCursor

    log = gen_event_log(
        spark, n_events=1200, n_docs=150, batch_size=400,
        delete_frac=0.2, partitions=4,
    )
    pdf = log.toPandas()
    t, sids = _replay_to(spark, tdir, log, stops={0, 1, 2})
    cdir = os.path.join(tdir, "cursors")

    # bootstrap: position 0 delivers the whole current state as inserts
    cur = ChangeCursor(t, cdir, name="ix")
    chg, to_sid = cur.poll()
    assert to_sid == sids[2]
    got = _got_diff(chg)
    assert got == {
        (k, "insert"): v for k, v in _state(pdf, 2).items()
    }

    # crash before ack: a fresh cursor redelivers the same interval
    cur2 = ChangeCursor(t, cdir, name="ix")
    chg2, to2 = cur2.poll()
    assert to2 == to_sid and _got_diff(chg2) == got

    cur2.ack(to2)
    assert ChangeCursor(t, cdir, name="ix").position == to2
    with pytest.raises(ValueError):
        cur2.ack(sids[0])  # backwards ack rejected

    # nothing new: statically-empty poll
    chg3, to3 = cur2.poll()
    assert to3 == to2 and chg3.count() == 0 and chg3.inputFiles() == []

    # new commit after ack: next poll delivers exactly that interval
    upd = spark.createDataFrame(
        [(9001, "update", "doc_000001", [9], 1, "s", 3)],
        "lsn long, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string, batch_id int",
    )
    t = apply_batch(t, upd, 3, merge_strategy="delta")
    chg4, to4 = cur2.poll()
    assert to4 == t.snapshot_id
    types = {r["_change_type"] for r in chg4.collect()}
    assert types <= {"update_pre", "update_post", "insert"}
    assert chg4.filter(F.col("doc_id") == "doc_000001").count() > 0


def test_filtered_cdf_is_diff_of_filtered_views(spark, tdir):
    """changes(where=P) == the net diff of the FILTERED views: rows
    updated into P emit insert, updated out of P emit delete — what a
    consumer maintaining a derived `SELECT * WHERE P` copy applies."""
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), BASE_SCHEMA,
                           n_buckets=4)
    mk = lambda rows, b: spark.createDataFrame(  # noqa: E731
        rows,
        "lsn long, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string, batch_id int",
    )
    t = apply_batch(t, mk([
        (1, "insert", "a", [1], 1, "web", 0),
        (2, "insert", "b", [2], 2, "book", 0),
        (3, "insert", "c", [3], 3, "web", 0),
    ], 0), 0, merge_strategy="delta")
    a_sid = t.snapshot_id
    # b moves INTO web, c moves OUT (delete), a updates within web
    t = apply_batch(t, mk([
        (10, "update", "a", [1, 1], 2, "web", 1),
        (11, "update", "b", [2, 2], 2, "web", 1),
        (12, "delete", "c", None, None, None, 1),
    ], 1), 1, merge_strategy="delta")

    where = [("source", "=", "web")]
    got = _got_diff(t.changes(a_sid, where=where))
    assert got == {
        ("a", "update_pre"): ([1], 1, "web"),
        ("a", "update_post"): ([1, 1], 2, "web"),
        ("b", "insert"): ([2, 2], 2, "web"),
        ("c", "delete"): ([3], 3, "web"),
    }
    # equivalence with the filtered-view diff, directly
    pre = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
           for r in IceboxTable.load(spark, t.root, a_sid)
           .read(where=where).collect()}
    post = {r["doc_id"]: (list(r["tokens"]), r["n_tok"], r["source"])
            for r in t.read(where=where).collect()}
    assert got == _expected_diff(pre, post)


def test_filtered_cdf_survives_interval_rename(spark, tdir):
    """A rename inside the interval: the predicate names B's column; the
    A side filters post-conform (pushability guard) and the feed is
    still the filtered-view diff."""
    t = IceboxTable.create(spark, os.path.join(tdir, "t"), BASE_SCHEMA,
                           n_buckets=2)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows,
        "lsn long, op string, doc_id string, tokens array<int>, "
        "n_tok int, source string, batch_id int",
    )
    t = apply_batch(t, mk([(1, "insert", "a", [1], 1, "web", 0),
                           (2, "insert", "b", [2], 2, "book", 0)]), 0,
                    merge_strategy="delta")
    a_sid = t.snapshot_id
    t = t.rename_column("source", "origin")
    upd = spark.createDataFrame(
        [(10, "update", "a", [9], 1, "web", 1)],
        "lsn long, op string, doc_id string, tokens array<int>, "
        "n_tok int, origin string, batch_id int",
    )
    t = apply_batch(t, upd, 1, merge_strategy="delta")
    got = _got_diff_origin(t.changes(a_sid, where=[("origin", "=", "web")]))
    assert got == {
        ("a", "update_pre"): ([1], 1, "web"),
        ("a", "update_post"): ([9], 1, "web"),
    }


def _got_diff_origin(chg_df):
    return {
        (r["doc_id"], r["_change_type"]): (
            list(r["tokens"]), r["n_tok"], r["origin"],
        )
        for r in chg_df.collect()
    }
