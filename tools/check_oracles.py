"""Emulate the driver's correctness gate locally: run every
__spark_entry__.queries() entry on Spark and its oracle_sql() twin on
DuckDB at the same sf, compare row count, column names, and values
(order-insensitive, exact).

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

from data_pipeline_spark.session import get_spark  # noqa: E402
from data_pipeline_spark.sources.tables import TABLES  # noqa: E402


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
            )
    key = df.apply(lambda r: tuple(str(x) for x in r), axis=1)
    return df.loc[key.sort_values().index].reset_index(drop=True)


def _eq(a, b) -> tuple[bool, str]:
    if a.shape != b.shape:
        return False, f"shape {a.shape} vs {b.shape}"
    if list(a.columns) != list(b.columns):
        return False, f"cols {list(a.columns)} vs {list(b.columns)}"
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        for i in range(len(av)):
            x, y = av[i], bv[i]
            if isinstance(x, tuple) or isinstance(y, tuple):
                # NULL array and empty array are DIFFERENT values — a
                # bare `x or ()` would conflate them and hide exactly
                # the empty-vs-null bug class the CSV helpers elsewhere
                # exist to distinguish
                xn = x is None or (isinstance(x, float) and math.isnan(x))
                yn = y is None or (isinstance(y, float) and math.isnan(y))
                if xn or yn:
                    if xn != yn:
                        return False, f"col {c} row {i}: {x} vs {y} (null)"
                elif tuple(x) != tuple(y):
                    return False, f"col {c} row {i}: {str(x)[:60]} vs {str(y)[:60]}"
                elif tuple(map(str, x)) != tuple(map(str, y)):
                    # values equal but element types drift (e.g. int vs
                    # float) — the driver hashes stringified cells, so
                    # this WOULD fail remotely (VERDICT r4 #1 class)
                    return False, (
                        f"col {c} row {i}: stringified drift "
                        f"{str(x)[:60]} vs {str(y)[:60]}"
                    )
            elif isinstance(x, float) or isinstance(y, float):
                xn = x is None or (isinstance(x, float) and math.isnan(x))
                yn = y is None or (isinstance(y, float) and math.isnan(y))
                if xn or yn:
                    if xn != yn:
                        return False, f"col {c} row {i}: {x} vs {y} (null)"
                elif x != y:
                    d = abs(x - y)
                    return False, f"col {c} row {i}: {x!r} vs {y!r} (diff {d:.2e})"
                elif str(x) != str(y):
                    # numerically equal but e.g. int 73327 vs float
                    # 73327.0 — the driver hashes str(cell), so a type
                    # drift between the Spark result and the DuckDB twin
                    # fails remotely even when values match (the exact
                    # corpus_stats r4 bug). Fail it here too.
                    return False, (
                        f"col {c} row {i}: stringified drift {x!r} vs {y!r}"
                        " (driver hashes str(cell) — align result types)"
                    )
            else:
                if (x is None) != (y is None) or (x is not None and x != y):
                    return False, f"col {c} row {i}: {x!r} vs {y!r}"
                if x is not None and str(x) != str(y):
                    return False, (
                        f"col {c} row {i}: stringified drift {x!r} vs {y!r}"
                    )
    return True, "ok"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry

    spark = get_spark("check_oracles", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, os_ = entry.queries(), entry.oracle_sql()
    # coverage-decay guard (VERDICT r3 item 2): the driver's correctness
    # file records at most DRIVER_QUERY_CAP entries — registering more
    # silently drops the tail. queries() asserts the cap itself; here we
    # also require every registered query to carry an oracle twin.
    assert len(qs) <= entry.DRIVER_QUERY_CAP, (
        f"{len(qs)} queries > driver cap {entry.DRIVER_QUERY_CAP}"
    )
    no_oracle = sorted(set(qs) - set(os_))
    assert not no_oracle, f"queries without an oracle twin: {no_oracle}"
    # a typo'd name in the subset filter must fail loudly — silently
    # matching nothing would print ALL OK having compared nothing
    unknown = sorted(only - set(qs))
    assert not unknown, f"unknown query names: {unknown}"
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:300]}")
            n_fail += 1
            continue
        t1 = time.time()
        sql = os_.get(name)
        if sql is None:
            print(f"SKIP  {name}: no oracle (rows={len(sdf)}, {t1-t0:.1f}s)")
            continue
        try:
            ddf = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            n_fail += 1
            continue
        ok, msg = _eq(_canon(sdf), _canon(ddf))
        status = "OK  " if ok else "FAIL"
        if not ok:
            n_fail += 1
        print(
            f"{status}  {name}: rows {len(sdf)}/{len(ddf)} spark={t1-t0:.1f}s"
            + ("" if ok else f" — {msg}")
        )
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
