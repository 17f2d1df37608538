"""Portable deterministic expressions: every builder has a Spark Column
form and a DuckDB SQL twin that computes the SAME values bit-for-bit.

This is the engine's scalar-function layer (SURVEY.md §2.8). The
reference hand-rolls its key derivations in JS (quickHash,
/root/reference/grid-and-attrs/footprint.js:12-28; UBID encode,
footprint.js:31-67) and tests them with exact golden values
(footprint.test.js:22-34). We keep that contract — deterministic,
engine-independent values — by deriving every hash from md5, which both
Spark and DuckDB expose with identical semantics, instead of
engine-private hashes (xxhash64 exists only in Spark).

Parity verified in tests/test_portable_parity.py for unicode, empty and
short strings.

All Spark forms are built-in JVM expressions (whole-stage codegen,
no Python UDFs anywhere on this path).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# ---------------------------------------------------------------- h64
# 60-bit deterministic hash: first 15 hex chars of md5, parsed base-16.
# 15 chars keeps it positive in a signed int64 in both engines.


def h64(col: Column | str, salt: str | None = None) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    if salt is not None:
        c = F.concat(F.lit(salt + ":"), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def h64_sql(expr: str, salt: str | None = None) -> str:
    if salt is not None:
        expr = f"concat('{salt}:', {expr})"
    return f"CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def h64_py(s: str, salt: str | None = None) -> int:
    """Driver-side Python twin of h64 — identical value for the same
    string input (Spark's cast-to-string of int/bigint equals str());
    lets the driver test manifest bloom filters with zero Spark jobs."""
    import hashlib

    if salt is not None:
        s = f"{salt}:{s}"
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


# ------------------------------------------------------------ shingles
# character k-grams of a string, position order, duplicates kept.
# Guard: Spark's sequence(1,0) DESCENDS ([1,0]); emit [] for short strings.
# CONTRACT: pass a STAGED column attribute, never a computed expression —
# the lambda reads `c` per element, so an inlined expression (or one
# substituted back by predicate pushdown) is re-evaluated per shingle
# (quadratic; see operators/text.py fingerprint + repetition notes).


def shingles(col: Column | str, k: int = 5) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) >= k,
        F.transform(
            F.sequence(F.lit(1), F.length(c) - F.lit(k - 1)),
            lambda i: F.substring(c, i, k),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles_sql(expr: str, k: int = 5) -> str:
    return (
        f"CASE WHEN length({expr}) >= {k} "
        f"THEN [substr({expr}, i, {k}) for i in range(1, length({expr}) - {k - 1} + 1)] "
        f"ELSE [] END"
    )


# --------------------------------------------------------------- words
# whitespace tokenization after trim; '' → [''] in both engines (callers
# filter on length(text)>0 where that matters).


def words(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def words_sql(expr: str) -> str:
    return f"regexp_split_to_array(trim({expr}), '\\s+')"


# ----------------------------------------------------- text normalizer
# fingerprint normalization: lowercase, strip non [a-z0-9 ] ASCII,
# collapse whitespace runs to single spaces, trim.


def norm_text(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(c)
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def norm_text_sql(expr: str) -> str:
    return (
        f"trim(regexp_replace(regexp_replace(lower({expr}), "
        f"'[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
    )
