"""Grid-bucketed interval (range) join — the second classic operator
Spark lacks natively (the first is operators/asof.py).

Joins points to the intervals containing them (point-in-interval), or two
interval sets on overlap, WITHOUT a nested-loop/cartesian plan: the value
axis is cut into fixed-width grid cells, intervals explode to the cells
they touch, and the join becomes an ordinary equi-join on
(keys…, cell) + a cheap post-filter. This is the same shifted-grid
decomposition the reference uses for its spatial candidate pairing
(/root/reference/footprint-res/resolve-footprints.scala:135-168 buckets
geometries by grid cell before any pairwise test); here the grid is 1-D
over timestamps/offsets instead of 2-D over lon/lat.

Scale contract: with grid width W ≈ the typical interval length, an
interval lands in O(1 + len/W) cells, so the exploded build side stays
O(|intervals|); the join is hash/sort-merge on a uniform composite key —
no all-pairs stage exists in the plan (plan-asserted in test_rangejoin).
Every pair is emitted EXACTLY ONCE without a distinct: a point lives in
one cell, and an overlapping interval pair is reported only in the cell
containing the overlap's left edge (the standard report-at-first-cell
dedup — a filter, not a shuffle).

Skew: a pathologically long interval touching k cells costs k replicas
(bounded by max_cells to fail loudly rather than explode); a
pathologically hot cell behaves like any hot join key (AQE skew-join or
salting on the cell id).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _cells(start_col, end_col, width: int):
    return F.sequence(
        F.floor(F.col(start_col) / width).cast("long"),
        F.floor(F.col(end_col) / width).cast("long"),
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str] | str | None,
    point_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    width: int = 600,
    max_cells: int = 10_000,
) -> DataFrame:
    """Inner point-in-interval join: every (point, interval) pair with
    ``start <= point <= end`` (and equal `on` keys, if given).

    width: grid cell size in the value's units — pick ≈ the typical
    interval length (too small replicates long intervals across many
    cells; too large packs unrelated intervals into one cell and shifts
    work to the post-filter).
    """
    on = [on] if isinstance(on, str) else list(on or [])
    # loud guard, not silent truncation: an interval spanning > max_cells
    # cells means width is wrong for this data
    n_cells = F.floor(F.col(end_col) / width) - F.floor(F.col(start_col) / width) + 1
    cells = F.when(
        n_cells <= F.lit(max_cells), _cells(start_col, end_col, width)
    ).otherwise(
        F.raise_error(
            F.lit(f"interval spans more than {max_cells} grid cells at "
                  f"width {width}; raise width or max_cells")
        )
    )
    b = intervals.withColumn("_cell", F.explode(cells))
    p = points.withColumn(
        "_cell", F.floor(F.col(point_col) / width).cast("long")
    )
    cond = (F.col(point_col) >= F.col(start_col)) & (
        F.col(point_col) <= F.col(end_col)
    )
    out = p.join(b, on + ["_cell"]).where(cond).drop("_cell")
    return out


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str | None,
    left_cols: tuple[str, str] = ("start", "end"),
    right_cols: tuple[str, str] = ("r_start", "r_end"),
    width: int = 600,
    max_cells: int = 4096,
) -> DataFrame:
    """Inner interval-overlap join: pairs whose ranges intersect
    (``l.start <= r.end AND r.start <= l.end``). Each pair emits exactly
    once — only in the grid cell holding the overlap's left edge.
    Like interval_join, an interval spanning more than `max_cells` grid
    cells raises instead of silently exploding the replicate side."""
    on = [on] if isinstance(on, str) else list(on or [])
    ls, le = left_cols
    rs, re_ = right_cols

    def _guarded(s, e):
        n = F.floor(F.col(e) / width) - F.floor(F.col(s) / width) + 1
        return F.when(n <= F.lit(max_cells), _cells(s, e, width)).otherwise(
            F.raise_error(
                F.lit(f"interval spans more than {max_cells} grid cells "
                      f"at width {width}; raise width or max_cells")
            )
        )

    l = left.withColumn("_cell", F.explode(_guarded(ls, le)))
    r = right.withColumn("_cell", F.explode(_guarded(rs, re_)))
    overlap = (F.col(ls) <= F.col(re_)) & (F.col(rs) <= F.col(le))
    first_cell = F.floor(F.greatest(F.col(ls), F.col(rs)) / width).cast("long")
    return (
        l.join(r, on + ["_cell"])
        .where(overlap & (F.col("_cell") == first_cell))
        .drop("_cell")
    )
