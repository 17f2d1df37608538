"""Deduplication operators for a training-data pipeline, Spark-first.

Exact, MinHash+LSH, SimHash, and n-gram-Jaccard dedup over a document
table (id + text). All hot-path expressions are built-in JVM functions
(md5/conv/transform/aggregate — whole-stage codegen); there is no Python
UDF anywhere in this module.

Lineage to the reference: its one dedup is `dropDuplicates("hash")` on a
content hash (/root/reference/footprint-res/resolve-footprints.scala:96,
hash built at /root/reference/grid-and-attrs/footprint.js:121-124) and
its near-duplicate detection is a bucket-join + exact-verify cascade
(shifted-grid equi-join then polygon intersect,
resolve-footprints.scala:128-175). MinHash-LSH below is exactly that
cascade re-expressed for text: cheap bucket join (LSH bands) to generate
candidates, exact verify (Jaccard) on the survivors.

Scale notes (100 TB):
  * every groupBy/join here keys on a hash-derived column — uniformly
    distributed by construction, no skew salting needed;
  * signatures are O(k) ints per doc regardless of doc size; the
    band-explode multiplies rows by #bands (small constant), not by doc
    length;
  * candidate pairs are generated per-bucket: cost ~ sum(bucket²) which
    LSH keeps near-linear; a global all-pairs join never happens.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.portable import h64, shingles, words
from .util import ensure_parallelism


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct text: canonical id = min(id) per content hash.

    Output: (content_hash, canonical_id, n_dupes). The reference keeps an
    arbitrary winner (dropDuplicates, resolve-footprints.scala:96); min-id
    makes it deterministic.
    """
    return (
        df.select(F.col(id_col), h64(text_col).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
    )


# universal-hash mixing: h' = (a_j * (h mod P) + b_j) mod P with P the
# Mersenne prime 2^31-1. P must be SMALL relative to the products so the
# outer modulo actually wraps — with a larger P the map a*x+b is monotone
# in x and every "permutation" would pick the same argmin shingle.
# Bounds keep products within signed int64 under ANSI mode in BOTH
# engines: a_j < 2^28 (odd), h mod P < 2^31 → product < 2^59.
MINHASH_P = (1 << 31) - 1


def minhash_consts(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_j, b_j) permutation constants, md5-derived in
    Python (hashlib md5 == Spark md5 == DuckDB md5 on UTF-8), embedded as
    plain literals on both engine sides."""
    import hashlib

    def c(tag: str, j: int) -> int:
        return int(hashlib.md5(f"mh:{tag}:{j}".encode()).hexdigest()[:7], 16)

    return [(c("a", j) | 1, c("b", j)) for j in range(k)]


def minhash_signature(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    shingle: int = 5,
) -> DataFrame:
    """k-permutation MinHash signature as an array<bigint> column `sig`.

    One md5 per shingle (staged as a real column so Catalyst does not
    re-inline it into every permutation — SPARK-36718 keeps non-cheap
    multi-referenced projections staged), then k cheap universal-hash
    mixes: sig[j] = min over shingles s of (a_j*(h64(s) mod M)+b_j) mod P.
    Pure column expressions — no shuffle, no UDF.
    """
    hs = F.transform(shingles(F.col(text_col), k=shingle), lambda s: h64(s))
    staged = ensure_parallelism(df).select(F.col(id_col), hs.alias("_hs"))

    def _mix(a: int, b: int):
        return lambda h: (F.lit(a) * F.pmod(h, F.lit(MINHASH_P)) + F.lit(b)) % F.lit(
            MINHASH_P
        )

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("_hs"), _mix(a, b)))
            for a, b in minhash_consts(k)
        ]
    )
    return staged.select(F.col(id_col), sig.alias("sig"))


def minhash_lsh_rep(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    shingle: int = 5,
) -> DataFrame:
    """Near-dup clustering, one LSH hop: rep_id = min(id) over all docs
    sharing at least one band bucket (docs with identical band signatures
    collapse; rep_id == id means "no near-duplicate found").

    band bucket = h64 of the band's joined signature values. This is the
    reference's shifted-grid candidate generation
    (resolve-footprints.scala:128-141) with LSH bands as the grids.
    """
    exploded = _lsh_band_rows(df, id_col, text_col, k, bands, shingle)
    reps = exploded.groupBy("band", "bucket").agg(F.min(id_col).alias("bucket_rep"))
    return (
        exploded.join(reps, ["band", "bucket"])
        .groupBy(id_col)
        .agg(F.min("bucket_rep").alias("rep_id"))
    )


def _lsh_band_rows(
    df: DataFrame, id_col: str, text_col: str, k: int, bands: int, shingle: int
) -> DataFrame:
    """(id, band, bucket) — one row per (doc, band), the LSH candidate
    graph's bipartite edge list (shared by the one-hop rep and the
    connected-components closure)."""
    rows = k // bands
    sig_df = minhash_signature(df, id_col, text_col, k=k, shingle=shingle)
    band_cols = []
    for b in range(bands):
        vals = [F.element_at("sig", b * rows + r + 1).cast("string") for r in range(rows)]
        band_cols.append(
            F.struct(
                F.lit(b).alias("band"),
                h64(F.concat_ws(",", *vals)).alias("bucket"),
            )
        )
    return sig_df.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, "bb.band", "bb.bucket")


def minhash_lsh_components(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 16,
    bands: int = 4,
    shingle: int = 5,
    max_rounds: int = 12,
) -> DataFrame:
    """TRANSITIVE closure of the LSH candidate graph: rep_id = min(id)
    over the whole connected component, computed by iterated min-label
    propagation over (doc ↔ band-bucket) edges to a fixpoint.

    One LSH hop (minhash_lsh_rep) is the right contract for candidate
    collapse, but NOT for leakage-safe splits: docs A~B and B~C can get
    different one-hop reps even though A and C are chained through B —
    and then A and C land in different train/eval splits. The closure
    makes every chained group share one rep (classic label-propagation
    connected components, e.g. Kiveris et al. "Connected Components in
    MapReduce and Beyond", SoCC'14).

    100 TB shape: each round is one bucket-hop (two shuffles over the
    O(docs × bands) edge list) PLUS one pointer-jump (rep := rep[rep], a
    self-join of the narrow rep frame) — the jump composes the mapping
    with itself, so path lengths roughly halve per round and convergence
    is O(log diameter) rounds, not O(diameter) (the pointer-jumping /
    star-contraction idea from MapReduce connected-components
    literature). Convergence is detected by an order-independent
    fingerprint aggregate (bit_xor of xxhash64(id, rep) — map-side
    combined, no extra shuffle). Raises after `max_rounds` instead of
    silently returning a partial closure; any converged schedule yields
    the same fixpoint (the per-component min), which is what the DuckDB
    twin's plain unrolled bucket-hops reproduce.
    """
    edges = _lsh_band_rows(df, id_col, text_col, k, bands, shingle).persist()

    def _fp(r):
        row = r.select(
            F.bit_xor(F.xxhash64(F.col(id_col), F.col("rep_id"))).alias("f"),
            F.count(F.lit(1)).alias("n"),
        ).first()
        return (row["f"], row["n"])

    try:
        bucket_rep = edges.groupBy("band", "bucket").agg(
            F.min(id_col).alias("_bm")
        )
        rep = (
            edges.join(bucket_rep, ["band", "bucket"])
            .groupBy(id_col)
            .agg(F.min("_bm").alias("rep_id"))
            .persist()
        )
        prev = _fp(rep)
        for _ in range(max_rounds):
            bmin = edges.join(rep, id_col).groupBy("band", "bucket").agg(
                F.min("rep_id").alias("_bm")
            )
            hop = (
                edges.join(bmin, ["band", "bucket"])
                .groupBy(id_col)
                .agg(F.min("_bm").alias("rep_id"))
            )
            # pointer jump: follow the rep chain one more level in the
            # SAME round (left join: a rep that is its own rep — or a
            # doc absent as a key — keeps its current label)
            new = (
                hop.join(
                    hop.select(
                        F.col(id_col).alias("rep_id"),
                        F.col("rep_id").alias("_rr"),
                    ),
                    "rep_id",
                    "left",
                )
                .select(
                    F.col(id_col),
                    F.coalesce("_rr", F.col("rep_id")).alias("rep_id"),
                )
                .persist()
            )
            cur = _fp(new)
            rep.unpersist()
            rep = new
            if cur == prev:
                return rep
            prev = cur
        raise RuntimeError(
            f"LSH component closure did not converge in {max_rounds} rounds "
            "— pathological chain structure; raise max_rounds explicitly"
        )
    finally:
        edges.unpersist()


def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 16,
) -> DataFrame:
    """SimHash over whitespace words (duplicates weighted by count).

    bit b of the output is 1 iff sum over words w of
    (±1 according to bit b of h64(w)) is >= 0. Computed as explode →
    per-(doc, bit) signed counts → bit-OR reassembly; every step is a
    plain groupBy (hash-partitioned map-side-combined agg).
    """
    wh = ensure_parallelism(df).select(
        F.col(id_col), F.explode(words(text_col)).alias("w")
    ).select(id_col, h64("w").alias("h"))
    per_bit = (
        wh.select(id_col, "h", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"))
        .groupBy(id_col, "b")
        .agg(
            F.sum(
                F.when(F.expr("shiftright(h, b) & 1") == 1, 1).otherwise(-1)
            ).alias("s")
        )
    )
    return per_bit.groupBy(id_col).agg(
        F.sum(
            F.when(F.col("s") >= 0, F.expr("shiftleft(CAST(1 AS BIGINT), b)")).otherwise(
                F.lit(0).cast("bigint")
            )
        ).alias("simhash")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = 5,
    threshold: float = 0.8,
    k: int = 16,
    bands: int = 4,
    all_pairs: bool = False,
) -> DataFrame:
    """Near-dup PAIRS with exact n-gram Jaccard, LSH-cascaded.

    Stage 1 (cheap): candidate pairs = docs sharing an LSH band bucket
    (the reference's distance-band prefilter before the exact polygon
    test, resolve-footprints.scala:126,174-175). all_pairs=True skips the
    prefilter — exact brute force, for small inputs / recall baselines.
    Stage 2 (exact): Jaccard over DISTINCT shingle sets; keep
    jaccard >= threshold. Output (id_a, id_b, jaccard), id_a < id_b.
    """
    cand = None
    if not all_pairs:
        rows = k // bands
        sig_df = minhash_signature(df, id_col, text_col, k=k, shingle=shingle)
        band_structs = []
        for b in range(bands):
            vals = [F.element_at("sig", b * rows + r + 1).cast("string") for r in range(rows)]
            band_structs.append(
                F.struct(F.lit(b).alias("band"), h64(F.concat_ws(",", *vals)).alias("bucket"))
            )
        bb = sig_df.select(F.col(id_col), F.explode(F.array(*band_structs)).alias("x")).select(
            id_col, "x.band", "x.bucket"
        )
        cand = (
            bb.alias("l")
            .join(bb.alias("r"), ["band", "bucket"])
            .filter(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .select(
                F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b")
            )
            .distinct()
        )
    # exact verify on candidates only: restrict the shingle table to docs
    # that appear in a candidate pair BEFORE the shingle self-join, so the
    # join's size is bounded by the candidates, not the corpus (and a
    # globally-common shingle can't create a hot key over non-candidates).
    # parallelize the SCAN input, not the joined frame: probing a plan
    # with exchanges would execute them (see ensure_parallelism docstring)
    wide = ensure_parallelism(df)
    if cand is not None:
        cand_ids = cand.select(F.col("id_a").alias("cid")).union(
            cand.select(F.col("id_b").alias("cid"))
        ).distinct()
        base = wide.join(cand_ids, wide[id_col] == F.col("cid"), "left_semi")
    else:
        base = wide
    sh = base.select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), k=shingle))).alias("s"),
    )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    inter = (
        sh.withColumnRenamed(id_col, "id_a")
        .join(sh.withColumnRenamed(id_col, "id_b"), "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    if cand is not None:
        inter = inter.join(cand, ["id_a", "id_b"], "left_semi")
    na = sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("n", "na")
    nb = sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("n", "nb")
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def contamination(
    df: DataFrame,
    bench: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    broadcast_bench: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    n-gram with a held-out benchmark set — the standard train/test
    contamination gate (13-gram overlap in GPT-3 appendix C; default 8
    here to suit short docs; parameterizable).

    Output: (id_col, n_overlap_grams, contaminated) for EVERY corpus doc
    (zero-hit docs included).

    Scale shape: each side reduces to DISTINCT h64 gram hashes — O(words)
    per doc, 8 bytes per gram. The benchmark side is tiny relative to a
    100 TB corpus (a benchmark suite is MBs), so it broadcasts and the
    probe is a map-side broadcast join + one hash agg on uniformly
    distributed doc ids; the corpus never shuffles on gram. With
    broadcast_bench=False it degrades to a shuffled equi-join on the
    gram hash (uniform by construction). Same cheap-candidate shape as
    the reference's bucket-join cascade
    (/root/reference/footprint-res/resolve-footprints.scala:128-175),
    but against an external reference set instead of self-join.
    """

    def gram_hashes(frame: DataFrame, col: str, keep: list[str]) -> DataFrame:
        staged = frame.select(*keep, words(col).alias("_w"))
        n_w = F.size("_w")
        grams = F.when(
            n_w >= n,
            F.transform(
                F.sequence(F.lit(1), n_w - F.lit(n - 1)),
                lambda i: h64(F.concat_ws(" ", F.slice("_w", i, n))),
            ),
        ).otherwise(F.array().cast("array<bigint>"))
        return staged.select(*keep, F.explode(grams).alias("_g")).drop_duplicates(
            [*keep, "_g"]
        )

    doc_grams = gram_hashes(ensure_parallelism(df), text_col, [id_col])
    bench_grams = gram_hashes(
        ensure_parallelism(bench), bench_text_col, []
    ).drop_duplicates(["_g"])
    if broadcast_bench:
        bench_grams = F.broadcast(bench_grams)
    hits = (
        doc_grams.join(bench_grams, "_g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_overlap_grams"))
    )
    return (
        df.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_overlap_grams"), F.lit(0)).cast("long").alias(
                "n_overlap_grams"
            ),
            (F.coalesce(F.col("n_overlap_grams"), F.lit(0)) > 0).alias("contaminated"),
        )
    )
