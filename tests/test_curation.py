"""Corpus curation: leakage-safe splits, quality-weighted sampling,
domain mixing (operators/curation.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.operators.curation import (
    domain_mix,
    leakage_safe_split,
    quality_weighted_sample,
)
from data_pipeline_spark.operators.text import quality_score


def _word(i: int, j: int) -> str:
    import hashlib

    return hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:6]


def _docs(spark, n=200, n_dup_pairs=20):
    """n base docs with genuinely DISTINCT texts (hash-derived words, so
    shingle overlap between different docs is negligible), plus
    n_dup_pairs near-duplicate copies (one-word edit of the original)
    appended with ids >= n."""
    base = [
        (i, " ".join(_word(i, j) for j in range(30)), f"src{i % 4}")
        for i in range(n)
    ]
    dups = [
        (n + j, base[j][1].replace(_word(j, 7), "editedw"), base[j][2])
        for j in range(n_dup_pairs)
    ]
    return spark.createDataFrame(base + dups, "doc_id long, text string, source string")


def test_split_has_no_near_dup_leakage(spark):
    docs = _docs(spark)
    out = leakage_safe_split(docs).collect()
    split_of = {r["doc_id"]: r["split"] for r in out}
    rep_of = {r["doc_id"]: r["rep_id"] for r in out}
    # every near-dup pair clusters together and therefore shares a split
    paired = 0
    for j in range(20):
        if rep_of[j] == rep_of[200 + j]:
            paired += 1
            assert split_of[j] == split_of[200 + j]
    # MinHash/LSH at k=16,bands=4 catches nearly all one-word edits
    assert paired >= 15
    # and a doc-id-hash split WOULD have leaked some of those pairs
    # (sanity that the property is non-vacuous)
    assert len({split_of[j] for j in range(20)}) > 1


def test_split_closes_transitive_chains(spark):
    """The no-leakage promise must hold for CHAINS, not just pairs:
    A~B and B~C near-dup (two different one-word edits of B's text) with
    A and C two edits apart. One LSH hop can give rep(A)=rep(B)≠rep(C);
    the component closure must put all three in one split."""
    base = " ".join(_word(999, j) for j in range(30))
    chains = []
    for c in range(12):  # 12 independent A-B-C chains
        b_txt = base.replace(_word(999, 0), f"chain{c}w0")
        a_txt = b_txt.replace(_word(999, 7), "editA")
        c_txt = b_txt.replace(_word(999, 22), "editC")
        chains += [(c * 3, a_txt, "s"), (c * 3 + 1, b_txt, "s"),
                   (c * 3 + 2, c_txt, "s")]
    # plus distinct background docs so the split isn't degenerate
    bg = [(1000 + i, " ".join(_word(i, j) for j in range(30)), "s")
          for i in range(60)]
    docs = spark.createDataFrame(chains + bg,
                                 "doc_id long, text string, source string")
    out = leakage_safe_split(docs).collect()
    rep_of = {r["doc_id"]: r["rep_id"] for r in out}
    split_of = {r["doc_id"]: r["split"] for r in out}
    closed = 0
    for c in range(12):
        a, b, cc = c * 3, c * 3 + 1, c * 3 + 2
        # chains whose A~B and B~C edges the LSH caught must be FULLY
        # closed: one rep, one split — even when A and C share no bucket
        if rep_of[a] == rep_of[b] and rep_of[b] == rep_of[cc]:
            closed += 1
        assert len({split_of[a], split_of[b], split_of[cc]}) == 1 or (
            rep_of[a] != rep_of[b] and rep_of[b] != rep_of[cc]
        )
    assert closed >= 9  # LSH catches nearly all one-edit neighbors


def test_split_fractions_and_determinism(spark):
    docs = _docs(spark, n=400, n_dup_pairs=0)
    out = leakage_safe_split(docs, fractions=(0.8, 0.1, 0.1)).collect()
    counts = {}
    for r in out:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert counts["train"] / len(out) == pytest.approx(0.8, abs=0.08)
    again = leakage_safe_split(docs, fractions=(0.8, 0.1, 0.1)).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    with pytest.raises(ValueError):
        leakage_safe_split(docs, fractions=(0.5, 0.2), names=("a", "b", "c"))


def test_quality_sample_deterministic_and_weighted(spark):
    docs = _docs(spark, n=300, n_dup_pairs=0)
    q = quality_score(docs)
    kept = quality_weighted_sample(q, rate=0.6)
    a = {r["doc_id"] for r in kept.collect()}
    b = {r["doc_id"] for r in quality_weighted_sample(q, rate=0.6).collect()}
    assert a == b and 0 < len(a) < 300
    # monotone in rate: raising the rate never drops a previously-kept doc
    more = {r["doc_id"] for r in quality_weighted_sample(q, rate=0.9).collect()}
    assert a <= more
    # keep_p column is rate x quality clamped
    row = (
        kept.select("doc_id", "keep_p")
        .join(q.select("doc_id", "quality"), "doc_id")
        .first()
    )
    assert row["keep_p"] == pytest.approx(min(0.6 * row["quality"], 1.0))


def test_domain_mix_hits_targets(spark):
    # skewed corpus: 600/200/100 docs of a/b/c
    rows = [(i, f"text {i}", "a" if i < 600 else "b" if i < 800 else "c")
            for i in range(900)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = domain_mix(docs, {"a": 0.4, "b": 0.4, "c": 0.2})
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # T = min(600/.4, 200/.4, 100/.2) = 500 -> targets 200/200/100
    assert got["c"] == 100  # constraining source keeps everything
    assert got["a"] == pytest.approx(200, abs=30)
    assert got["b"] == pytest.approx(200, abs=30)
    # untargeted sources are dropped entirely
    out2 = domain_mix(docs, {"a": 0.5, "b": 0.5})
    assert out2.filter(F.col("source") == "c").count() == 0
    with pytest.raises(ValueError):
        domain_mix(docs, {"a": 0.4})


def test_stratified_take_exact_budget_and_determinism(spark):
    import duckdb

    from data_pipeline_spark.functions.portable import h64_sql
    from data_pipeline_spark.operators.curation import stratified_take

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = stratified_take(docs, 30).select("doc_id", "source")
    rows = sorted((r["doc_id"], r["source"]) for r in got.collect())
    # exact per-group budget
    per = {}
    for _, s in rows:
        per[s] = per.get(s, 0) + 1
    sizes = {r["source"]: r["n"] for r in
             docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {s: min(30, n) for s, n in sizes.items() if min(30, n) > 0}
    # same set regardless of partitioning
    again = stratified_take(docs.repartition(13), 30).select("doc_id", "source")
    assert sorted((r["doc_id"], r["source"]) for r in again.collect()) == rows
    # DuckDB lockstep: identical chosen set
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    want = con.execute(f"""
        SELECT doc_id, source FROM (
          SELECT doc_id, source, row_number() OVER (
            PARTITION BY source
            ORDER BY {h64_sql("CAST(doc_id AS VARCHAR)", "take")}, doc_id
          ) AS rk FROM documents) WHERE rk <= 30
        ORDER BY doc_id
    """).fetchall()
    assert rows == sorted((d, s) for d, s in want)


def test_stratified_take_plan_has_mapside_group_limit(spark):
    from data_pipeline_spark.operators.curation import stratified_take

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        stratified_take(docs, 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan, plan
