"""Similarity search over an embedding column (array<float>).

Two paths, mirroring the reference's two spatial-lookup paths — indexed
grid probe (/root/reference/grid-and-attrs/footprint.js:134-144) vs
exhaustive scan fallback (footprint.js:146-158):

  * brute-force cosine top-k: the correctness baseline. All-pairs join +
    exact cosine, deterministic tie-break. O(n·m) — fine for a query set
    against a corpus, never for corpus×corpus at 100 TB.
  * LSH-bucketed (random hyperplanes): the scale path. Sign-bit sketch
    buckets co-locate similar vectors; candidate generation is a bucket
    equi-join (shuffle on a uniform key), exact cosine re-rank inside
    buckets only. Multiple independent tables (rotations) trade recall
    for cost — the same trick as the reference's 4 shifted grids
    (resolve-footprints.scala:128-133).

Dot products / norms use built-in higher-order functions (zip_with +
aggregate) — JVM-side, no Python. Hyperplane coefficients are
h64-derived pseudo-randoms, so plans are reproducible and computable by
any engine (the DuckDB oracle recomputes them exactly).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

from ..functions.portable import h64
from .util import ensure_parallelism


def dot(a: Column, b: Column) -> Column:
    """Sequential fold — bit-identical to an equivalent left-to-right sum
    in the oracle engine."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _as_double(col: str) -> Column:
    return F.col(col).cast("array<double>")


def cosine_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors of each query vector (excluding itself).

    queries: (id_col, vec_col) — typically a small selection, broadcast.
    Output: (query_id, neighbor_id, cos, rank). Ties broken by neighbor
    id ascending (deterministic).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv")
    )
    c = ensure_parallelism(emb).select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("nv")
    )
    pairs = c.crossJoin(F.broadcast(q)).filter(F.col("neighbor_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("nv")).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
    )


def _lsh_candidates(
    v: DataFrame,
    id_col: str,
    dim: int,
    n_planes: int,
    n_tables: int,
    max_bucket_size: int | None,
    left_name: str = "query_id",
    right_name: str = "neighbor_id",
) -> DataFrame:
    """Shared LSH candidate generation: per-table sign-bit buckets,
    hot-bucket cap on the neighbor side (see lsh_bucket_topk docstring),
    bucket equi-join, distinct (left_name, right_name) pairs.
    `v` must carry (id_col, v:array<double>)."""
    tables = [
        v.select(
            id_col,
            F.lit(t).alias("tbl"),
            lsh_bits(F.col("v"), dim, n_planes, table=t).alias("bucket"),
        )
        for t in range(n_tables)
    ]
    bb = tables[0]
    for t in tables[1:]:
        bb = bb.unionByName(t)
    rb = bb
    if max_bucket_size is not None:
        # portable pseudo-random ranking (h64, not Spark-private xxhash64)
        # so an external oracle can replay the cap decision exactly
        wb = Window.partitionBy("tbl", "bucket").orderBy(
            h64(F.col(id_col).cast("string"), salt="cap"), F.col(id_col)
        )
        rb = (
            bb.withColumn("_r", F.row_number().over(wb))
            .filter(F.col("_r") <= max_bucket_size)
            .drop("_r")
        )
    return (
        bb.alias("l")
        .join(rb.alias("r"), ["tbl", "bucket"])
        .filter(F.col(f"l.{id_col}") != F.col(f"r.{id_col}"))
        .select(
            F.col(f"l.{id_col}").alias(left_name),
            F.col(f"r.{id_col}").alias(right_name),
        )
        .distinct()
    )


def embed_cosine_dedup(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    all_pairs: bool = False,
    n_planes: int = 8,
    n_tables: int = 2,
    dim: int = 64,
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """Embedding-cosine near-duplicate clustering, one LSH hop:
    rep_id = min(id) over {self} ∪ {ids with cosine ≥ threshold}.

    The embedding twin of minhash_lsh_rep (same contract: rep_id == id
    means "no near-duplicate found"). all_pairs=True is the exact
    brute-force baseline (broadcast nested loop — correctness oracle and
    small inputs only); the default path generates candidates from LSH
    buckets (equi-join, hot-bucket capped) and verifies with exact
    cosine, so no all-pairs stage ever runs at scale.
    """
    v = ensure_parallelism(emb).select(F.col(id_col), _as_double(vec_col).alias("v"))
    # stage each vector's norm ONCE (a deterministic function of the
    # vector, so dot/(na·nb) is bit-identical to dot/(norm(a)·norm(b))
    # computed per pair — but ~3× fewer array ops on the pair hot path)
    vn = v.select(id_col, "v", norm(F.col("v")).alias("_n"))
    pair_cos = (dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
        "cos"
    )
    va = vn.select(
        F.col(id_col).alias("id_a"), F.col("v").alias("va"), F.col("_n").alias("na")
    )
    vb = vn.select(
        F.col(id_col).alias("id_b"), F.col("v").alias("vb"), F.col("_n").alias("nb")
    )
    if all_pairs:
        pairs = va.crossJoin(F.broadcast(vb)).filter(F.col("id_a") != F.col("id_b"))
        scored = pairs.select("id_a", "id_b", pair_cos)
    else:
        cand = _lsh_candidates(
            v, id_col, dim, n_planes, n_tables, max_bucket_size,
            left_name="id_a", right_name="id_b",
        )
        scored = cand.join(va, "id_a").join(vb, "id_b").select(
            "id_a", "id_b", pair_cos
        )
    near = scored.filter(F.col("cos") >= threshold)
    return (
        v.select(F.col(id_col))
        .join(near.select(F.col("id_a").alias(id_col), "id_b"), id_col, "left")
        .groupBy(id_col)
        .agg(F.min("id_b").alias("_mn"))
        .select(
            id_col,
            F.least(F.coalesce("_mn", F.col(id_col)), F.col(id_col)).alias("rep_id"),
        )
    )


def ivf_assign(
    emb: DataFrame,
    n_pivots: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest pivot.

    Pivots are the first `n_pivots` vectors by id — a deterministic,
    engine-independent choice (disclosed simplification of k-means
    training; the INDEX structure and probe path are the real thing).
    Plan shape: broadcast(pivots) nested-loop over the corpus + map-side
    top-1 (WindowGroupLimit) — the corpus never shuffles more than one
    exchange, pivots are O(n_pivots · dim) broadcast bytes.

    Output: (id, pivot_id, cos) — the inverted-file table; cluster
    sizes are what a probe reads instead of the corpus.
    """
    v = ensure_parallelism(emb).select(F.col(id_col), _as_double(vec_col).alias("v"))
    pivots = v.filter(F.col(id_col) < n_pivots).select(
        F.col(id_col).alias("pivot_id"), F.col("v").alias("pv")
    )
    scored = v.crossJoin(F.broadcast(pivots)).select(
        id_col, "pivot_id", cosine(F.col("v"), F.col("pv")).alias("cos")
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cos").desc(), F.col("pivot_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(id_col, "pivot_id", F.round("cos", 6).alias("cos"))
    )


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 3,
    n_pivots: int = 64,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF probe search: exact cosine only against vectors whose pivot is
    among the query's `n_probe` nearest pivots.

    Cost per query ≈ n_probe/n_pivots of the corpus (vs the brute-force
    crossJoin baseline); recall < 1 is the approximation, measured in
    tests against cosine_topk. The probe join is an equi-join on
    pivot_id — shuffle-friendly, no all-pairs stage anywhere.
    """
    assign = ivf_assign(emb, n_pivots=n_pivots, id_col=id_col, vec_col=vec_col)
    v = emb.select(F.col(id_col), _as_double(vec_col).alias("v"))
    pivots = v.filter(F.col(id_col) < n_pivots).select(
        F.col(id_col).alias("pivot_id"), F.col("v").alias("pv")
    )
    q = queries.select(F.col(id_col).alias("query_id"), _as_double(vec_col).alias("qv"))
    qp = q.crossJoin(F.broadcast(pivots)).select(
        "query_id", "pivot_id", cosine(F.col("qv"), F.col("pv")).alias("pcos")
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("pcos").desc(), F.col("pivot_id"))
    probes = (
        qp.withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("query_id", "pivot_id")
    )
    cand = probes.join(assign.select(id_col, "pivot_id"), "pivot_id").select(
        "query_id", F.col(id_col).alias("neighbor_id")
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    nv = v.select(F.col(id_col).alias("neighbor_id"), F.col("v").alias("nv"))
    scored = cand.join(q, "query_id").join(nv, "neighbor_id").select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
    )


def lsh_bits(
    vec: Column, dim: int, n_planes: int = 8, table: int = 0
) -> Column:
    """Random-hyperplane sign sketch → bigint bucket id.

    bit p = 1 iff dot(vec, plane_p) >= 0, plane_p[i] derived from
    h64(f'{table}:{p}:{i}') — reproducible anywhere.
    """
    import hashlib

    def coef(p: int, i: int) -> float:
        # identical to h64 of the same string (first 15 md5 hex chars):
        # precomputed in Python so the plan carries plain float literals
        # instead of dim×planes md5 expression nodes (codegen-size win)
        h = int(hashlib.md5(f"{table}:{p}:{i}".encode()).hexdigest()[:15], 16)
        return (h % 2001 - 1000) / 1000.0

    bits = []
    for p in range(n_planes):
        coefs = F.array(*[F.lit(coef(p, i)) for i in range(dim)])
        bit = F.when(dot(vec, coefs) >= 0, F.lit(1).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        bits.append(F.shiftleft(bit, p))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_bucket_topk(
    emb: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 2,
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """Approximate all-neighbors top-k: candidates share an LSH bucket in
    any table; exact cosine re-rank within candidates.

    Output: (query_id, neighbor_id, cos, rank) — rank over FOUND
    candidates (recall < 1 vs cosine_topk is expected; that gap is the
    approximation, not a bug).

    Skew containment: clustered embeddings pile into one hot bucket, and
    an uncapped self-join yields m² candidate pairs there. The NEIGHBOR
    side of the join is therefore capped at `max_bucket_size` members per
    (table, bucket), chosen by a deterministic pseudo-random ranking
    (h64-style hash of the id) — every vector still queries its full
    bucket, so per-query fan-out is ≤ max_bucket_size per table and total
    pairs are O(m · cap), never O(m²). Pass None to disable.
    """
    v = ensure_parallelism(emb).select(F.col(id_col), _as_double(vec_col).alias("v"))
    cand = _lsh_candidates(v, id_col, dim, n_planes, n_tables, max_bucket_size)
    qv = v.select(F.col(id_col).alias("query_id"), F.col("v").alias("qv"))
    nv = v.select(F.col(id_col).alias("neighbor_id"), F.col("v").alias("nv"))
    scored = cand.join(qv, "query_id").join(nv, "neighbor_id").select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("nv")).alias("cos")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rank")
    )
