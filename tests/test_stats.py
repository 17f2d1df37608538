"""Corpus stats: exact path vs DuckDB, sketch path within error bounds,
and the epoch-order curation stage."""

from __future__ import annotations

import duckdb
import pandas as pd
import pyspark.sql.functions as F

from data_pipeline_spark.operators.curation import epoch_order, write_epoch
from data_pipeline_spark.operators.stats import (
    corpus_stats,
    corpus_stats_approx,
    corpus_stats_checked,
    stats_checked_sql,
    stats_sql,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_exact_stats_match_duckdb(spark):
    got = corpus_stats(_docs(spark)).toPandas().sort_values("source").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.execute(stats_sql()).df().sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], want[sorted(want.columns)],
                                  check_dtype=False)


def test_approx_stats_within_sketch_bounds(spark):
    docs = _docs(spark)
    exact = {r["source"]: r for r in corpus_stats(docs).collect()}
    approx = {r["source"]: r for r in corpus_stats_approx(docs).collect()}
    assert set(exact) == set(approx)
    for s, e in exact.items():
        a = approx[s]
        # counts/sums/min/max/mean are exact in both paths
        for c in ("n_docs", "total", "vmin", "vmax", "vmean"):
            assert a[c] == e[c], (s, c)
        # percentile_approx: rank error <= n/accuracy -> with accuracy 10k
        # and n<<10k the sketch is exact up to interpolation (it returns a
        # data value, the exact path interpolates between two)
        span = e["vmax"] - e["vmin"]
        assert abs(a["p50"] - e["p50"]) <= max(span * 0.05, 1.0), s
        assert abs(a["p95"] - e["p95"]) <= max(span * 0.05, 1.0), s
        # HLL++ at rsd=0.02 on tiny cardinalities is exact-ish; allow 5%
        assert abs(a["n_distinct"] - e["n_distinct"]) <= max(1, 0.05 * e["n_distinct"]), s


def test_checked_stats_sketch_family_collapses_to_exact(spark):
    """The driver-row composition: with sketches in bounds (they are at
    this scale — test_approx_stats_within_sketch_bounds), the
    part='sketch' family must emit EXACTLY the exact family's values —
    that is the collapse the DuckDB twin (stats_checked_sql) relies on.
    A sketch drifting out of bounds would surface here (and as a driver
    value mismatch) as a sketch-vs-exact difference."""
    out = corpus_stats_checked(_docs(spark)).toPandas()
    assert set(out["part"]) == {"exact", "sketch"}
    ex = out[out["part"] == "exact"].drop(columns="part")
    sk = out[out["part"] == "sketch"].drop(columns="part")
    ex = ex.sort_values("source").reset_index(drop=True)
    sk = sk.sort_values("source").reset_index(drop=True)
    pd.testing.assert_frame_equal(ex, sk, check_dtype=False)
    # and the twin agrees row-for-row, stringified (driver-hash style)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    want = con.execute(stats_checked_sql()).df()
    got_k = sorted(out.apply(lambda r: tuple(str(x) for x in r[sorted(out.columns)]), axis=1))
    want_k = sorted(want.apply(lambda r: tuple(str(x) for x in r[sorted(want.columns)]), axis=1))
    assert got_k == want_k


def test_approx_stats_plan_is_partial_aggregated(spark):
    """The sketch path must map-side combine — only sketches cross the
    exchange (the 100 TB contract)."""
    plan = (
        corpus_stats_approx(_docs(spark))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "partial_percentile_approx" in plan, plan
    assert "partial_approx_count_distinct" in plan, plan


def test_epoch_order_is_deterministic_and_epoch_varying(spark):
    docs = _docs(spark).limit(200)
    a = epoch_order(docs, epoch=0, n_shards=4).select("doc_id", "order_key", "shard")
    b = epoch_order(docs, epoch=0, n_shards=4).select("doc_id", "order_key", "shard")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    c = epoch_order(docs, epoch=1, n_shards=4)
    # different epoch -> different permutation (orders disagree somewhere)
    joined = a.alias("a").join(c.alias("c"), "doc_id").filter(
        F.col("a.order_key") != F.col("c.order_key")
    )
    assert joined.count() > 150  # hash flips almost every key


def test_epoch_order_shards_cover_and_balance(spark):
    docs = _docs(spark)
    n = docs.count()
    per = (
        epoch_order(docs, epoch=3, n_shards=8)
        .groupBy("shard").count().collect()
    )
    assert sorted(r["shard"] for r in per) == list(range(8))
    for r in per:
        assert abs(r["count"] - n / 8) < 4 * (n / 8) ** 0.5 + 10, per


def test_write_epoch_shards_sorted(spark, tdir):
    docs = _docs(spark).limit(300)
    path = f"{tdir}/epoch0"
    write_epoch(docs, path, epoch=0, n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == 300
    # one directory per shard; every file internally sorted by order_key
    import glob

    dirs = glob.glob(f"{path}/shard=*")
    assert len(dirs) == 4, dirs
    files = glob.glob(f"{path}/shard=*/*.parquet")
    for f in files:
        pdf = pd.read_parquet(f)
        assert pdf["order_key"].is_monotonic_increasing
