"""Corpus curation operators: leakage-safe splits, deterministic
quality-weighted sampling, and domain (source) mixing.

These are the selection stages a training-data pipeline runs AFTER the
cleaning gates (dedup / repetition / decontamination, operators/dedup.py
and operators/text.py) and BEFORE packing (operators/tokens.py):

* ``leakage_safe_split`` — train/val/test assignment keyed on the
  near-duplicate CLUSTER representative, not the document id, so two
  near-duplicate documents can never land in different splits (the
  standard eval-leakage failure mode). Cluster = the CONNECTED COMPONENT
  of the MinHash/LSH candidate graph (operators/dedup.py
  minhash_lsh_components — iterated label propagation to a fixpoint;
  one hop is not enough: chained near-dups would straddle splits), the
  reference's shifted-grid candidate collapse
  (resolve-footprints.scala:128-141) closed transitively and re-used as
  the grouping key instead of the dedup key.
* ``quality_weighted_sample`` — keep a document with probability
  ``rate × quality`` using a salted deterministic uniform, so the sample
  is reproducible, resumable, and identical on any cluster size (no RNG
  state, no seed-per-partition coupling).
* ``domain_mix`` — rebalance sources to a target mixture: the largest
  total consistent with the targets is computed from per-source counts
  (min over sources of n_s / frac_s), then each source is thinned
  deterministically to its share. One count aggregate over (source) —
  low cardinality — and one broadcast join of the O(#sources) rate frame.
* ``stratified_take`` — EXACT per-stratum budgets (min(k, |group|) rows
  per group) by salted-hash rank; map-side top-k contained
  (WindowGroupLimit).
* ``epoch_order`` / ``write_epoch`` — per-epoch deterministic
  training-order permutation + shard materialization.

Every operator is pure column expressions over the portable hash
(functions/portable.py h64 — identical in Spark and DuckDB), so each has
an exact DuckDB twin and no Python executes per row. At 100 TB: the split
adds one LSH banding pass plus O(component diameter) label-propagation
rounds over the edge list (2 shuffles each, no all-pairs — near-dup
chains are shallow); sampling is a stateless filter riding the scan;
domain_mix shuffles only the O(#sources) count frame.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

from ..functions.portable import h64, h64_sql
from .dedup import minhash_lsh_components

# deterministic uniform resolution: u = (h64(key) mod M) / M.
# M = 1e6 keeps the quantization error (1e-6) far below any sampling rate
# while the integer mod stays exactly portable across engines.
_U_MOD = 1_000_000


def u01(col, salt: str):
    """Deterministic uniform in [0, 1): salted portable hash, mod'd and
    scaled. h64 is non-negative (15 hex digits < 2^60), so pmod == %."""
    return F.pmod(h64(col, salt), F.lit(_U_MOD)) / F.lit(float(_U_MOD))


def u01_sql(expr: str, salt: str) -> str:
    return f"(({h64_sql(expr, salt)}) % {_U_MOD}) / {float(_U_MOD)}"


def leakage_safe_split(
    df: DataFrame,
    fractions: tuple[float, ...] = (0.8, 0.1, 0.1),
    names: tuple[str, ...] = ("train", "val", "test"),
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "split",
    k: int = 16,
    bands: int = 4,
    shingle: int = 5,
) -> DataFrame:
    """Assign every document to a split by hashing its near-dup cluster
    representative. Cluster = the TRANSITIVE closure of the LSH
    candidate graph (minhash_lsh_components), not one hop: with one hop,
    chained near-dups A~B~C could get different reps (rep(A)=rep(B)=A
    but rep(C)=B) and straddle train/eval — exactly the leakage this
    function exists to prevent. All members of a component share rep_id,
    hence share u and the split.

    Returns (id_col, rep_id, split). Documents with no near-duplicate
    are their own representative (rep_id == id), so singletons still
    split at the requested fractions.
    """
    if len(fractions) != len(names) or abs(sum(fractions) - 1.0) > 1e-9:
        raise ValueError("fractions must match names and sum to 1")
    reps = minhash_lsh_components(df, id_col=id_col, text_col=text_col,
                                  k=k, bands=bands, shingle=shingle)
    u = u01(F.col("rep_id").cast("string"), salt)
    expr, acc = None, 0.0
    for frac, name in zip(fractions[:-1], names[:-1]):
        acc += frac
        cond = u < F.lit(acc)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    split = (expr.otherwise(names[-1]) if expr is not None
             else F.lit(names[-1]))
    return reps.select(F.col(id_col), F.col("rep_id"), split.alias("split"))


def quality_weighted_sample(
    df: DataFrame,
    rate: float = 0.5,
    id_col: str = "doc_id",
    quality_col: str = "quality",
    salt: str = "sample",
) -> DataFrame:
    """Keep each row with probability ``rate × quality`` (clamped to 1),
    deterministically: keep iff u01(id) < rate × quality. Reproducible
    across runs, partitionings, and cluster sizes; a stateless filter
    that rides the scan (no shuffle). Expects quality ∈ [0, 1]
    (operators/text.py quality_score). Returns the kept rows with the
    keep-probability as ``keep_p``.
    """
    # keep_p stays the RAW double product: rate and quality are identical
    # doubles in any engine, so the product is bitwise identical — while
    # round-to-6 differs between engines when the 7th digit is exactly 5
    # (Spark BigDecimal HALF_UP vs DuckDB multiply-round-divide).
    p = F.least(F.lit(rate) * F.col(quality_col), F.lit(1.0))
    kept = u01(F.col(id_col).cast("string"), salt) < p
    return df.withColumn("keep_p", p).filter(kept)


def domain_mix(
    df: DataFrame,
    targets: dict[str, float],
    id_col: str = "doc_id",
    domain_col: str = "source",
    salt: str = "mix",
) -> DataFrame:
    """Thin each domain to a target mixture. With per-source counts n_s
    and target fractions f_s, the largest achievable total is
    T = min_s(n_s / f_s); source s keeps f_s·T of its n_s rows
    (keep_rate_s = f_s·T / n_s ≤ 1, and the max-constraining source keeps
    everything). Sources absent from `targets` are dropped.

    Plan: one hash aggregate on the low-cardinality domain column
    (map-side combined), the O(#sources) rate frame broadcast back, then
    the deterministic per-row filter. Returns kept rows plus the
    per-source ``keep_rate``.
    """
    if not targets or abs(sum(targets.values()) - 1.0) > 1e-9:
        raise ValueError("target fractions must sum to 1")
    tgt = df.sparkSession.createDataFrame(
        [(s, float(f)) for s, f in targets.items()], f"{domain_col} string, _f double"
    )
    counts = (
        df.groupBy(domain_col).count()
        .join(F.broadcast(tgt), domain_col)  # inner: untargeted sources drop
        .withColumn("_cap", F.col("count") / F.col("_f"))
    )
    # a targeted source with ZERO corpus rows makes the mixture
    # unachievable (T = min_s n_s/f_s = 0); silently computing T over
    # the present sources only would return a corpus with the WRONG
    # domain balance — fail loudly instead (O(#sources) driver check)
    present = {r[domain_col] for r in counts.select(domain_col).collect()}
    missing = sorted(set(targets) - present)
    if missing:
        raise ValueError(
            f"domain_mix targets name sources absent from the corpus: "
            f"{missing} — the requested mixture is unachievable "
            "(drop them from targets or fix the corpus)"
        )
    # T = min over sources of n_s / f_s — an O(#sources) frame; computed
    # with an un-partitioned window over that tiny frame, NOT the corpus
    # keep_rate is a RAW double (see quality_weighted_sample: round-to-6
    # is not portable at exact half-digits, and the filter must use the
    # same value the output reports)
    rates = counts.select(
        domain_col,
        (F.col("_f") * F.min("_cap").over(Window.partitionBy()) / F.col("count"))
        .alias("keep_rate"),
    )
    out = df.join(F.broadcast(rates), domain_col)
    kept = u01(F.col(id_col).cast("string"), salt) < F.col("keep_rate")
    return out.filter(kept)


def epoch_order(
    df: DataFrame,
    epoch: int,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "order",
) -> DataFrame:
    """Deterministic training-order shuffle + shard assignment for one
    epoch: ``order_key = h64(id, salt:epoch)``, ``shard = order_key mod
    n_shards``. Reading shard s ordered by order_key IS the epoch's
    global random permutation restricted to that shard — so a trainer
    with n_shards data loaders sees a reshuffled corpus every epoch with
    NO shuffle service, no RNG state, and bit-identical order on any
    cluster size (the property the epoch-varying salt inherits from the
    portable hash; same construction as quality_weighted_sample above).

    The reference's analog is the per-state file fan-out its training
    consumers read (county-splits/app.js one-file-per-county); the
    epoch-salted hash upgrades that static layout to a per-epoch
    permutation without rewriting data.

    At 100 TB: this projection rides the scan; materializing an epoch is
    ONE repartition(n_shards, shard) + sortWithinPartitions(order_key)
    write — a single shuffle, and only when the trainer wants physical
    files (write_epoch). Hash collisions across doc_ids are broken by
    the id tiebreak in write_epoch's sort, keeping the order total and
    reproducible.
    """
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    key = h64(F.col(id_col).cast("string"), f"{salt}:{epoch}")
    return df.select(
        "*",
        key.alias("order_key"),
        F.pmod(key, F.lit(n_shards)).cast("int").alias("shard"),
    )


def write_epoch(
    df: DataFrame,
    path: str,
    epoch: int,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "order",
) -> None:
    """Materialize one epoch's training order: one directory per shard
    (`shard=k/`), each file internally sorted by the epoch's permutation
    key. One shuffle. repartition hashes the shard VALUE, so two shards
    may share a task — partitionBy still lands them in separate
    directories, and the (shard, order_key) task sort keeps every
    output file sorted."""
    ordered = epoch_order(df, epoch, n_shards, id_col=id_col, salt=salt)
    (
        ordered.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "order_key", id_col)
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )


def stratified_take(
    df: DataFrame,
    k: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "take",
    keep_rank: str | None = None,
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, deterministically: rows
    rank by the salted portable hash of their id (id as tie-break), so
    the same k rows are chosen on any cluster size, any partitioning,
    any run — a reservoir sample without RNG state, and resumable.

    Complements quality_weighted_sample (probabilistic rate) and
    domain_mix (fractional targets) with the third selection contract a
    curation pipeline needs: per-stratum EXACT budgets ("at most 100k
    docs per domain in the eval slice").

    At 100 TB: one exchange on the group key; Spark's rank-limit pushes
    the top-k BEFORE the exchange (WindowGroupLimit Partial — each map
    task forwards at most k rows per group it sees), so a huge stratum
    never funnels through one reducer unfiltered. Same automatic hot-key
    containment the LWW window relies on (PLANS.md window_lww).

    `keep_rank` optionally exposes the 1-based within-group rank as an
    output column (for oracle lockstep / downstream ordering).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    w = Window.partitionBy(group_col).orderBy(
        h64(F.col(id_col).cast("string"), salt).asc(), F.col(id_col).asc()
    )
    out = df.withColumn("_rk", F.row_number().over(w)).filter(
        F.col("_rk") <= k
    )
    if keep_rank is None:
        return out.drop("_rk")
    return out.withColumnRenamed("_rk", keep_rank)
