"""Z-order (Morton) interleaved sort keys — multi-column data
clustering for zone-map / row-group pruning.

The table's hash-bucketing serves the MERGE (co-locating every version
of a key); WITHIN a bucket, rows are physically ordered by the sort key
at rewrite time, and that order is what parquet row-group statistics —
and the manifest's per-file zone maps — turn into skipped IO. A linear
sort clusters ONE column; slice reads over a training lake filter on
several (source + n_tok, quality band + length, ...). The classic
answer is a space-filling curve: normalize each clustering column to a
``bits``-wide integer cell, interleave the bits, sort by the result.
Every cell then maps to a contiguous z-range, so a file holding a
z-range covers a small axis-aligned box in ALL clustered dimensions at
once — min/max stats become selective for every column, not just the
first.

Pure built-in expressions (cast/floor/shift/and/or — whole-stage
codegen; ~2·bits ALU ops per row, no Python anywhere), with a DuckDB
SQL twin (`zkey_sql`) and a driver-side Python twin (`zkey_py`)
computing the SAME key bit-for-bit: normalization is IEEE-double
arithmetic with an identical operation order in all three engines.

At 100 TB: the rewrite is the same one-exchange copy-on-write pass a
compaction already does (rewrite_clustered IS a compaction — it folds
deltas); the key adds constant per-row ALU work and zero extra
shuffles. The payoff multiplies with file count: a 1000-executor scan
with a two-column predicate skips the files whose z-range misses the
query box driver-side (manifest zone maps) and the row groups inside
surviving files reader-side (parquet stats), instead of reading every
row of every bucket the way a single-column sort order would for the
second column.

Reference parity note: the reference clusters its output by a grid code
string (resolve-footprints.scala:205 orderBy(grid)) — a one-dimensional
prefix curve. Z-order is the n-dimensional generalization, re-expressed
as Spark built-ins.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def _cells(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Value -> integer cell in [0, 2^bits): floor((x-lo)*2^bits/span),
    clamped. Degenerate span (lo==hi) -> cell 0. NULL stays NULL."""
    n = float(1 << bits)
    if hi <= lo:
        return F.when(col.isNotNull(), F.lit(0).cast("bigint"))
    scaled = F.floor(
        (col.cast("double") - F.lit(float(lo))) * F.lit(n)
        / F.lit(float(hi) - float(lo))
    )
    clamped = F.least(
        F.greatest(scaled, F.lit(0)), F.lit((1 << bits) - 1)
    ).cast("bigint")
    # greatest/least IGNORE nulls (both engines) — propagate explicitly
    return F.when(col.isNotNull(), clamped)


def _cells_sql(expr: str, lo: float, hi: float, bits: int) -> str:
    n = float(1 << bits)
    if hi <= lo:
        return f"CASE WHEN {expr} IS NOT NULL THEN CAST(0 AS BIGINT) END"
    scaled = (
        f"floor((CAST({expr} AS DOUBLE) - {float(lo)!r}) * {n!r}"
        f" / {float(hi) - float(lo)!r})"
    )
    return (
        f"CASE WHEN {expr} IS NOT NULL THEN "
        f"CAST(least(greatest({scaled}, 0), {(1 << bits) - 1}) AS BIGINT)"
        f" END"
    )


def default_bits(n_cols: int) -> int:
    """Per-dimension resolution: 16 bits or whatever keeps the
    interleaved key inside a positive int64."""
    if n_cols < 1:
        raise ValueError("need at least one column")
    return min(16, 63 // n_cols)


def zkey_cells(cells: list[Column], bits: int) -> Column:
    """Interleave pre-built integer cell columns (each in [0, 2^bits)).
    cells[0] takes the most-significant bit at every interleave level.
    NULL in any cell -> NULL key (sorts first, clusters together)."""
    d = len(cells)
    if bits * d > 63:
        raise ValueError(f"{d} cols x {bits} bits overflows int64")
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j in range(d):
            bit = F.shiftright(cells[j], i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * d + (d - 1 - j)))
    return z


def dict_cells(col: Column | str, values: list, bits: int) -> Column:
    """Cell index for a LOW-CARDINALITY (string/categorical) column:
    sorted `values` get ranks spread evenly over [0, 2^bits) — rank
    order IS lexicographic order, so file min/max stats on the raw
    column stay selective after the z-sort. Unknown values (possible
    only if the dictionary is stale) and NULLs map to NULL (cluster
    together at the front). One literal map, zero joins."""
    c = F.col(col) if isinstance(col, str) else col
    n = max(len(values), 1)
    step = (1 << bits) // n if n <= (1 << bits) else 1
    pairs = []
    for r, v in enumerate(sorted(values)):
        pairs += [F.lit(v), F.lit(min(r * step, (1 << bits) - 1))]
    if not pairs:
        return F.lit(None).cast("bigint")
    return F.element_at(F.create_map(*pairs), c).cast("bigint")


def zkey(
    cols: list[Column | str],
    bounds: list[tuple[float, float]],
    bits: int | None = None,
) -> Column:
    """Interleaved z-key over numeric `cols`, each normalized to its
    (lo, hi) range. NULL in any column -> NULL key."""
    d = len(cols)
    if len(bounds) != d:
        raise ValueError("bounds must match cols")
    b = default_bits(d) if bits is None else bits
    return zkey_cells(
        [
            _cells(F.col(c) if isinstance(c, str) else c, lo, hi, b)
            for c, (lo, hi) in zip(cols, bounds)
        ],
        b,
    )


def dict_cells_sql(expr: str, values: list, bits: int) -> str:
    """DuckDB twin of dict_cells — identical cell for identical input
    (unknown value / NULL -> NULL in both engines)."""
    n = max(len(values), 1)
    step = (1 << bits) // n if n <= (1 << bits) else 1
    whens = " ".join(
        "WHEN {} = '{}' THEN CAST({} AS BIGINT)".format(
            expr, str(v).replace("'", "''"),
            min(r * step, (1 << bits) - 1),
        )
        for r, v in enumerate(sorted(values))
    )
    if not whens:
        return "CAST(NULL AS BIGINT)"
    return f"(CASE {whens} END)"


def zkey_cells_sql(cells: list[str], bits: int) -> str:
    """DuckDB twin of zkey_cells: interleave pre-built cell exprs."""
    d = len(cells)
    terms = []
    for i in range(bits):
        for j in range(d):
            terms.append(
                f"((({cells[j]} >> {i}) & 1) << {i * d + (d - 1 - j)})"
            )
    return "(" + " | ".join(terms) + ")"


def zkey_sql(
    exprs: list[str],
    bounds: list[tuple[float, float]],
    bits: int | None = None,
) -> str:
    """DuckDB twin of zkey — identical value for identical input."""
    d = len(exprs)
    b = default_bits(d) if bits is None else bits
    return zkey_cells_sql(
        [_cells_sql(e, lo, hi, b) for e, (lo, hi) in zip(exprs, bounds)],
        b,
    )


def zkey_py(
    vals: list[float | None],
    bounds: list[tuple[float, float]],
    bits: int | None = None,
) -> int | None:
    """Driver-side Python twin (tests / golden values)."""
    import math

    d = len(vals)
    b = default_bits(d) if bits is None else bits
    cells = []
    for v, (lo, hi) in zip(vals, bounds):
        if v is None:
            return None
        if hi <= lo:
            cells.append(0)
            continue
        c = math.floor((float(v) - float(lo)) * float(1 << b)
                       / (float(hi) - float(lo)))
        cells.append(max(0, min(c, (1 << b) - 1)))
    z = 0
    for i in range(b):
        for j in range(d):
            z |= ((cells[j] >> i) & 1) << (i * d + (d - 1 - j))
    return z
