"""As-of join: correctness vs a naive per-row reference, edge cases, and
the single-shuffle plan contract."""

from __future__ import annotations

import random

import pyspark.sql.functions as F

from data_pipeline_spark.operators.asof import asof_join


def _naive_asof(probe, build, direction="backward", allow_exact=True):
    """O(n*m) reference: for each probe row pick the matching build row."""
    out = []
    for k, pts, pid in probe:
        best = None
        for bk, bts, bv in build:
            if bk != k or bts is None or pts is None:
                continue  # null probe ts matches nothing (checked FIRST:
                # the comparison below would TypeError on None)
            if direction == "backward":
                ok = bts <= pts if allow_exact else bts < pts
            else:
                ok = bts >= pts if allow_exact else bts > pts
            if not ok:
                continue
            if best is None:
                best = (bts, bv)
            elif direction == "backward" and (
                bts > best[0] or (bts == best[0] and bv > best[1])
            ):
                best = (bts, bv)
            elif direction == "forward" and (
                bts < best[0] or (bts == best[0] and bv > best[1])
            ):
                best = (bts, bv)
        out.append((k, pts, pid, best[0] if best else None, best[1] if best else None))
    return sorted(out)


def _run(spark, probe_rows, build_rows, **kw):
    p = spark.createDataFrame(probe_rows, "k int, ts int, pid int")
    b = spark.createDataFrame(build_rows, "k int, ts int, bv int")
    res = asof_join(p, b, on="k", probe_ts="ts", tiebreak="bv", **kw)
    return sorted(
        (r.k, r.ts, r.pid, r.ts_asof, r.bv_asof)
        for r in res.collect()
    )


def test_backward_basic(spark):
    probe = [(1, 5, 100), (1, 10, 101), (2, 3, 102)]
    build = [(1, 5, 7), (1, 9, 8), (2, 99, 9)]
    assert _run(spark, probe, build) == _naive_asof(probe, build)
    # explicit expectations: exact-instant match, latest-preceding, no match
    assert _run(spark, probe, build) == [
        (1, 5, 100, 5, 7),
        (1, 10, 101, 9, 8),
        (2, 3, 102, None, None),
    ]


def test_strict_inequality_excludes_exact_instant(spark):
    probe = [(1, 5, 100)]
    build = [(1, 5, 7), (1, 4, 6)]
    assert _run(spark, probe, build, allow_exact=False) == [(1, 5, 100, 4, 6)]


def test_forward_direction(spark):
    probe = [(1, 5, 100), (1, 10, 101), (2, 3, 102)]
    build = [(1, 5, 7), (1, 9, 8), (2, 1, 9)]
    got = _run(spark, probe, build, direction="forward")
    assert got == _naive_asof(probe, build, direction="forward")
    assert got == [(1, 5, 100, 5, 7), (1, 10, 101, None, None), (2, 3, 102, None, None)]


def test_equal_ts_build_rows_largest_tiebreak_wins(spark):
    probe = [(1, 10, 100)]
    build = [(1, 7, 3), (1, 7, 9), (1, 7, 5)]
    assert _run(spark, probe, build) == [(1, 10, 100, 7, 9)]


def test_randomized_parity_vs_naive(spark):
    rng = random.Random(42)
    keys = [1, 2, 3]
    probe = [
        (rng.choice(keys), rng.randrange(0, 50), i) for i in range(120)
    ]
    build = [
        (rng.choice(keys), rng.randrange(0, 50), i) for i in range(80)
    ]
    for direction in ("backward", "forward"):
        for allow_exact in (True, False):
            got = _run(
                spark, probe, build, direction=direction, allow_exact=allow_exact
            )
            want = _naive_asof(
                probe, build, direction=direction, allow_exact=allow_exact
            )
            assert got == want, (direction, allow_exact)


def test_null_probe_ts_yields_no_match(spark):
    probe = [(1, None, 100)]
    build = [(1, 5, 7)]
    assert _run(spark, probe, build) == [(1, None, 100, None, None)]


def test_single_shuffle_plan(spark):
    """The whole as-of join is ONE hashpartitioning exchange + one Window —
    the scale contract the docstring promises."""
    p = spark.range(100).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("ts"), F.col("id").alias("pid")
    )
    b = spark.range(50).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 2).alias("ts"), F.col("id").alias("bv")
    )
    plan = asof_join(p, b, on="k", probe_ts="ts")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" in plan
    assert "Join" not in plan  # never a pairwise join


def test_asof_enrichment_on_streaming_spine(spark, tdir):
    """Dimension enrichment on the CDC spine: event_transform asof-joins
    each change event to the dimension version in effect AT ITS LSN (the
    feature-store lookup made in-stream). The merged table then carries
    the dimension column; exactly-once still holds because the tag
    guards the commit, and the transform is deterministic."""
    import os

    import pyspark.sql.functions as F
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from data_pipeline_spark.cdc.stream import run_stream
    from data_pipeline_spark.icebox import IceboxTable

    # slowly-changing dimension: source weight re-versioned at LSNs 0/40/80
    dim = spark.createDataFrame(
        [("src0", 0, 10), ("src0", 40, 11), ("src0", 80, 12),
         ("src1", 0, 20), ("src1", 50, 21)],
        "source string, lsn long, dim_v int",
    )

    raw_schema = StructType([
        StructField("lsn", LongType()),
        StructField("op", StringType()),
        StructField("doc_id", StringType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
        StructField("source", StringType()),
    ])
    rows = [
        (lsn, "upsert", f"d{lsn % 7}", [lsn, lsn + 1], 2,
         "src0" if lsn % 2 == 0 else "src1")
        for lsn in range(100)
    ]
    ev = spark.createDataFrame(rows, raw_schema).withColumn(
        "batch_id", (F.col("lsn") / 25).cast("int")
    )
    ev_dir = os.path.join(tdir, "events")
    ev.write.partitionBy("batch_id").parquet(ev_dir)

    table_schema = StructType([
        StructField("doc_id", StringType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
        StructField("source", StringType()),
        StructField("dim_v", IntegerType()),
    ])

    def enrich(df):
        out = asof_join(df, dim, on="source", probe_ts="lsn",
                        build_cols=["dim_v"])
        return out.withColumn("dim_v", F.col("dim_v_asof")).drop(
            "dim_v_asof", "lsn_asof"
        )

    root = os.path.join(tdir, "t")
    ckpt = os.path.join(tdir, "ck")
    IceboxTable.create(spark, root, table_schema, n_buckets=4)
    run_stream(spark, ev_dir, raw_schema, root, ckpt, query_name="enrich",
               max_files_per_trigger=2, merge_strategy="delta",
               event_transform=enrich)

    t = IceboxTable.load(spark, root)
    got = {r["doc_id"]: r for r in t.read().collect()}
    assert len(got) == 7
    # LWW winner per doc is its max lsn; dim version = latest <= that lsn
    def want_dim(lsn, src):
        vers = [(l, v) for s, l, v in
                [("src0", 0, 10), ("src0", 40, 11), ("src0", 80, 12),
                 ("src1", 0, 20), ("src1", 50, 21)] if s == src and l <= lsn]
        return max(vers)[1]

    for d, r in got.items():
        win_lsn = max(l for l in range(100) if f"d{l % 7}" == d)
        src = "src0" if win_lsn % 2 == 0 else "src1"
        assert r["dim_v"] == want_dim(win_lsn, src), (d, win_lsn, r)

    # replay: no new snapshots, same content
    sid = t.snapshot_id
    run_stream(spark, ev_dir, raw_schema, root, ckpt, query_name="enrich2",
               max_files_per_trigger=2, merge_strategy="delta",
               event_transform=enrich)
    assert IceboxTable.load(spark, root).snapshot_id == sid


def test_null_build_payload_does_not_fall_through(spark):
    """A build row whose payload value is legitimately NULL must win as a
    whole row: the probe gets (matched ts, NULL), never that one column
    from an older build row (the per-column-fill mixing bug)."""
    probe = [(1, 10, 100)]
    build = [(1, 5, 5), (1, 9, None)]
    assert _run(spark, probe, build) == [(1, 10, 100, 9, None)]
