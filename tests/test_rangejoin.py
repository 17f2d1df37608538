"""Interval join: randomized parity vs a naive O(n*m) reference,
exactly-once pair emission, the loud wide-interval guard, and the
no-cartesian plan contract."""

from __future__ import annotations

import random

import pytest

from data_pipeline_spark.operators.rangejoin import (
    interval_join,
    interval_overlap_join,
)


def _naive_pip(points, intervals):
    out = []
    for k, t, pid in points:
        for ik, s, e, iid in intervals:
            if ik == k and s <= t <= e:
                out.append((k, pid, iid))
    return sorted(out)


def _naive_overlap(left, right):
    out = []
    for k, ls, le, lid in left:
        for rk, rs, re_, rid in right:
            if rk == k and ls <= re_ and rs <= le:
                out.append((k, lid, rid))
    return sorted(out)


def test_point_in_interval_randomized_parity(spark):
    rng = random.Random(7)
    points = [(rng.randrange(3), rng.randrange(0, 5000), i) for i in range(300)]
    ivs = []
    for i in range(120):
        s = rng.randrange(0, 5000)
        ivs.append((rng.randrange(3), s, s + rng.randrange(0, 900), i))
    p = spark.createDataFrame(points, "k int, ts long, pid int")
    b = spark.createDataFrame(ivs, "k int, start long, end long, iid int")
    for width in (100, 600, 4000):
        got = sorted(
            (r.k, r.pid, r.iid)
            for r in interval_join(p, b, on="k", width=width)
            .select("k", "pid", "iid").collect()
        )
        assert got == _naive_pip(points, ivs), width


def test_overlap_join_randomized_parity_and_exactly_once(spark):
    rng = random.Random(11)
    def mk(n):
        rows = []
        for i in range(n):
            s = rng.randrange(0, 3000)
            rows.append((rng.randrange(2), s, s + rng.randrange(0, 1200), i))
        return rows

    lrows, rrows = mk(150), mk(130)
    l = spark.createDataFrame(lrows, "k int, start long, end long, lid int")
    r = spark.createDataFrame(rrows, "k int, r_start long, r_end long, rid int")
    for width in (200, 600):
        rows = (
            interval_overlap_join(l, r, on="k", width=width)
            .select("k", "lid", "rid").collect()
        )
        got = sorted((x.k, x.lid, x.rid) for x in rows)
        # parity AND no duplicates (each pair exactly once, no distinct)
        assert got == _naive_overlap(lrows, rrows), width
        assert len(got) == len(set(got))


def test_wide_interval_guard_raises(spark):
    p = spark.createDataFrame([(1, 50, 0)], "k int, ts long, pid int")
    b = spark.createDataFrame(
        [(1, 0, 10_000_000, 0)], "k int, start long, end long, iid int"
    )
    with pytest.raises(Exception, match="grid cells"):
        interval_join(p, b, on="k", width=10, max_cells=100).collect()


def test_plan_has_no_cartesian_or_nested_loop(spark):
    import pyspark.sql.functions as F

    p = spark.range(1000).select(
        (F.col("id") % 5).alias("k"), F.col("id").alias("ts"),
        F.col("id").alias("pid"),
    )
    b = spark.range(200).select(
        (F.col("id") % 5).alias("k"), (F.col("id") * 7).alias("start"),
        (F.col("id") * 7 + 400).alias("end"), F.col("id").alias("iid"),
    )
    plan = (
        interval_join(p, b, on="k", width=500)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the join is a genuine equi-join on (k, _cell)
    assert "_cell" in plan
