"""Z-order clustering: key parity across engines, multi-column file
pruning vs linear sort, and content preservation through
rewrite_clustered."""

from __future__ import annotations

import hashlib
import os

import duckdb
import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from data_pipeline_spark.functions.zorder import zkey, zkey_py, zkey_sql
from data_pipeline_spark.icebox import IceboxTable

SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("x", LongType()),
        StructField("y", LongType()),
    ]
)


def _u(i: int, salt: str, mod: int = 1000) -> int:
    h = hashlib.md5(f"{salt}:{i}".encode()).hexdigest()
    return int(h[:12], 16) % mod


def _rows(n: int):
    return [(f"doc_{i:05d}", _u(i, "x"), _u(i, "y")) for i in range(n)]


# ------------------------------------------------------------- parity


def test_zkey_three_way_parity(spark):
    vals = [(float(_u(i, "a", 500) - 250), float(_u(i, "b", 997)))
            for i in range(300)]
    # include exact bounds and degenerate positions
    vals += [(-250.0, 0.0), (249.0, 996.0), (0.0, 500.0)]
    bounds = [(-250.0, 249.0), (0.0, 996.0)]
    df = spark.createDataFrame(vals, ["a", "b"])
    got = [
        r["z"]
        for r in df.select(zkey(["a", "b"], bounds).alias("z"))
        .collect()
    ]
    want_py = [zkey_py([a, b], bounds) for a, b in vals]
    assert got == want_py
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame(vals, columns=["a", "b"]))
    want_sql = [
        r[0]
        for r in con.execute(
            f"SELECT {zkey_sql(['a', 'b'], bounds)} FROM t"
        ).fetchall()
    ]
    assert got == want_sql


def test_zkey_nulls_three_dims_and_overflow_guard(spark):
    bounds3 = [(0.0, 10.0)] * 3
    df = spark.createDataFrame(
        [(1.0, 2.0, None), (5.0, 5.0, 5.0)], ["a", "b", "c"]
    )
    got = [
        r["z"]
        for r in df.select(
            zkey(["a", "b", "c"], bounds3).alias("z")
        ).collect()
    ]
    assert got[0] is None
    assert got[1] == zkey_py([5.0, 5.0, 5.0], bounds3)
    with pytest.raises(ValueError):
        zkey(["a", "b"], bounds3[:2], bits=40)  # 80 bits > int64


def test_zkey_is_pure_codegen(spark):
    df = spark.createDataFrame([(1.0, 2.0)], ["a", "b"])
    plan = (
        df.select(zkey(["a", "b"], [(0.0, 1.0), (0.0, 1.0)]).alias("z"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


# --------------------------------------------- pruning vs linear sort


def _file_bounds(t: IceboxTable, col: str):
    """[(lo, hi)] of `col` per data file at the current snapshot."""
    import pyarrow.parquet as pq

    out = []
    for b, e in t.manifest["buckets"].items():
        if e.get("path") is None:
            continue
        d = os.path.join(t.root, e["path"])
        for f in os.listdir(d):
            if not f.endswith(".parquet"):
                continue
            md = pq.read_metadata(os.path.join(d, f))
            lo = hi = None
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for ci in range(rg.num_columns):
                    c = rg.column(ci)
                    if c.path_in_schema == col:
                        st = c.statistics
                        lo = st.min if lo is None else min(lo, st.min)
                        hi = st.max if hi is None else max(hi, st.max)
            out.append((lo, hi))
    return out


def _hit_frac(bounds, lo, hi):
    n = sum(1 for a, b in bounds if not (b < lo or a > hi))
    return n / len(bounds)


def test_zorder_prunes_both_dims_linear_only_first(spark, tdir):
    n = 8000
    df = spark.createDataFrame(_rows(n), SCHEMA)

    lin = IceboxTable.create(
        spark, os.path.join(tdir, "lin"), SCHEMA, n_buckets=4
    ).overwrite_all(df).rewrite_clustered(["x"], files_per_bucket=16)
    zt = IceboxTable.create(
        spark, os.path.join(tdir, "z"), SCHEMA, n_buckets=4
    ).overwrite_all(df).rewrite_clustered(["x", "y"], files_per_bucket=16)

    # the range split actually produced multiple files per bucket
    assert len(_file_bounds(lin, "x")) >= 32
    assert len(_file_bounds(zt, "x")) >= 32

    band = (450, 549)  # ~10% slice of the 0..999 domain
    lin_x = _hit_frac(_file_bounds(lin, "x"), *band)
    lin_y = _hit_frac(_file_bounds(lin, "y"), *band)
    z_x = _hit_frac(_file_bounds(zt, "x"), *band)
    z_y = _hit_frac(_file_bounds(zt, "y"), *band)

    # linear: first column razor-sharp, second column blind
    assert lin_x <= 0.35, lin_x
    assert lin_y >= 0.9, lin_y
    # z-order: BOTH columns prune (each resolved to a few cells/file)
    assert z_x <= 0.7, z_x
    assert z_y <= 0.7, z_y


def test_rewrite_clustered_preserves_content_and_reads(spark, tdir):
    df = spark.createDataFrame(_rows(500), SCHEMA)
    t = IceboxTable.create(
        spark, os.path.join(tdir, "t"), SCHEMA, n_buckets=4
    ).overwrite_all(df)
    before = sorted(map(tuple, t.read().collect()))
    sid = t.snapshot_id
    t = t.rewrite_clustered(["x", "y"], files_per_bucket=8)
    assert t.snapshot_id == sid + 1
    assert t.manifest["summary"]["operation"] == "rewrite_clustered"
    assert sorted(map(tuple, t.read().collect())) == before
    # zone-map read path still correct post-rewrite
    want = sorted(
        r["doc_id"] for r in df.filter("y >= 900").collect()
    )
    got = sorted(
        r["doc_id"] for r in t.read(where=[("y", ">=", 900)]).collect()
    )
    assert got == want
    # deltas fold in: rewrite after a delta commit keeps the LWW winner
    up = spark.createDataFrame([("doc_00007", 1, 1)], SCHEMA)
    deltas = (
        up.withColumn("_lsn", F.lit(10 ** 6).cast("long"))
        .withColumn("_tombstone", F.lit(False))
        .withColumn("_b", t.bucket_of())
    )
    b7 = deltas.select("_b").collect()[0][0]
    t = t.commit_delta(deltas, {b7: 1})
    t = t.rewrite_clustered(["x", "y"], files_per_bucket=4)
    assert not t.manifest["deltas"]
    assert t.read(keys=["doc_00007"]).collect()[0]["x"] == 1


def test_rewrite_clustered_rejects_bad_columns(spark, tdir):
    t = IceboxTable.create(
        spark, os.path.join(tdir, "t"), SCHEMA, n_buckets=2
    )
    with pytest.raises(ValueError):
        t.rewrite_clustered(["nope"])
    # empty table: no-op
    assert t.rewrite_clustered(["x"]) is t


# --------------------------------------- categorical (string) z-order


def test_dict_cells_rank_semantics(spark):
    from data_pipeline_spark.functions.zorder import dict_cells

    vals = ["ar", "de", "en", "fr"]
    df = spark.createDataFrame(
        [("en",), ("ar",), ("fr",), (None,), ("zz",)], ["s"]
    )
    got = [
        r["c"] for r in df.select(dict_cells("s", vals, 4).alias("c"))
        .collect()
    ]
    # 4 values over 2^4 cells -> step 4: ranks 0,1,2,3 -> cells 0,4,8,12
    assert got[0] == 8 and got[1] == 0 and got[2] == 12
    assert got[3] is None  # NULL clusters with NULLs
    assert got[4] is None  # stale-dictionary value -> NULL, not a crash
    # DuckDB twin computes the identical cells (incl. NULL/unknown)
    from data_pipeline_spark.functions.zorder import dict_cells_sql

    con = duckdb.connect()
    con.register(
        "t",
        __import__("pandas").DataFrame(
            {"s": ["en", "ar", "fr", None, "zz"]}
        ),
    )
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {dict_cells_sql('s', vals, 4)} FROM t"
        ).fetchall()
    ]
    assert got == want


def test_zorder_string_categorical_prunes_raw_column(spark, tdir):
    """Cluster on (source-string, y): dictionary-rank cells keep the
    RAW string column's parquet min/max selective — an equality probe
    on one category touches a fraction of files, while a y-linear sort
    leaves the string column blind."""
    schema = StructType(
        [
            StructField("doc_id", StringType()),
            StructField("src", StringType()),
            StructField("y", LongType()),
        ]
    )
    cats = [f"src_{i:02d}" for i in range(8)]
    rows = [
        (f"doc_{i:05d}", cats[_u(i, "s", 8)], _u(i, "y"))
        for i in range(8000)
    ]
    df = spark.createDataFrame(rows, schema)
    lin = IceboxTable.create(
        spark, os.path.join(tdir, "lin"), schema, n_buckets=4
    ).overwrite_all(df).rewrite_clustered(["y"], files_per_bucket=16)
    zt = IceboxTable.create(
        spark, os.path.join(tdir, "z"), schema, n_buckets=4
    ).overwrite_all(df).rewrite_clustered(
        ["src", "y"], files_per_bucket=16
    )
    assert zt.manifest["summary"]["dicts"]["src"] == cats
    probe = ("src_03", "src_03")
    lin_s = _hit_frac(_file_bounds(lin, "src"), *probe)
    z_s = _hit_frac(_file_bounds(zt, "src"), *probe)
    z_y = _hit_frac(_file_bounds(zt, "y"), 450, 549)
    assert lin_s >= 0.9, lin_s       # linear-on-y: string blind
    assert z_s <= 0.45, z_s          # z: one category -> few files
    assert z_y <= 0.7, z_y           # ...and y still prunes
    # content preserved + zone-map string read stays correct
    want = sorted(r["doc_id"] for r in df.filter("src = 'src_03'").collect())
    got = sorted(
        r["doc_id"]
        for r in zt.read(where=[("src", "=", "src_03")]).collect()
    )
    assert got == want


def test_dict_cells_sql_escapes_quotes(spark):
    from data_pipeline_spark.functions.zorder import dict_cells, dict_cells_sql

    vals = ["O'Brien", "plain"]
    df = spark.createDataFrame([("O'Brien",), ("plain",)], ["s"])
    got = [
        r["c"] for r in df.select(dict_cells("s", vals, 4).alias("c"))
        .collect()
    ]
    con = duckdb.connect()
    con.register(
        "t", __import__("pandas").DataFrame({"s": ["O'Brien", "plain"]})
    )
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {dict_cells_sql('s', vals, 4)} FROM t"
        ).fetchall()
    ]
    assert got == want


def test_zorder_all_null_column_does_not_void_other_dims(spark, tdir):
    """A degenerate (all-NULL) clustering column must contribute a
    CONSTANT cell — a NULL cell would NULL every interleaved key and
    destroy clustering on the healthy columns."""
    import pyspark.sql.functions as FF

    df = spark.createDataFrame(_rows(4000), SCHEMA).withColumn(
        "x", FF.lit(None).cast("long")
    )
    t = IceboxTable.create(
        spark, os.path.join(tdir, "t"), SCHEMA, n_buckets=2
    ).overwrite_all(df).rewrite_clustered(["x", "y"], files_per_bucket=8)
    # y still prunes: the z-key degenerates to a pure y sort
    yb = _file_bounds(t, "y")
    assert len(yb) >= 8
    assert _hit_frac(yb, 450, 549) <= 0.5
    assert t.read().count() == 4000


def test_zorder_string_high_cardinality_rejected(spark, tdir):
    df = spark.createDataFrame(_rows(300), SCHEMA)
    t = IceboxTable.create(
        spark, os.path.join(tdir, "t"), SCHEMA, n_buckets=2
    ).overwrite_all(df)
    with pytest.raises(ValueError, match="distinct"):
        t.rewrite_clustered(["doc_id", "x"], max_dict=64)


def test_streaming_cluster_maintenance(spark, tdir):
    """run_stream(cluster_cols=): the spine re-clusters every
    cluster_every epochs; final state equals the native replay and the
    last maintenance commit is a z-order rewrite with multi-file
    buckets. Restart stays a tag no-op (no epochs -> no re-cluster)."""
    from data_pipeline_spark.cdc.apply import replay_log
    from data_pipeline_spark.cdc.stream import run_stream
    from data_pipeline_spark.gen import gen_event_log

    log = gen_event_log(
        spark, n_events=2000, n_docs=300, batch_size=500, partitions=4
    )
    ev = os.path.join(tdir, "ev")
    log.write.partitionBy("batch_id").parquet(ev)
    schema = spark.read.parquet(ev).drop("batch_id").schema
    root = os.path.join(tdir, "t")
    table_schema = StructType(
        [f for f in schema.fields if f.name not in ("lsn", "op")]
    )
    IceboxTable.create(spark, root, table_schema, n_buckets=4)
    run_stream(
        spark, ev, schema, root, os.path.join(tdir, "ckpt"),
        max_files_per_trigger=1, merge_strategy="delta",
        cluster_cols=["n_tok"], cluster_every=2,
        cluster_files_per_bucket=4,
    )
    t = IceboxTable.load(spark, root)
    ops = [
        r["operation"]
        for r in t.snapshots().select("operation").collect()
    ]
    assert "rewrite_clustered" in ops
    assert not t.manifest["deltas"]  # the rewrite folded them
    assert len(_file_bounds(t, "n_tok")) > 4  # z-range split happened
    want = IceboxTable.create(
        spark, os.path.join(tdir, "native"), table_schema, n_buckets=4
    )
    want = replay_log(want, log, merge_strategy="delta")
    assert sorted(map(tuple, t.read().collect())) == sorted(
        map(tuple, want.read().collect())
    )
    sid = t.snapshot_id
    run_stream(
        spark, ev, schema, root, os.path.join(tdir, "ckpt"),
        max_files_per_trigger=1, merge_strategy="delta",
        cluster_cols=["n_tok"], cluster_every=2,
    )
    assert IceboxTable.load(spark, root).snapshot_id == sid
