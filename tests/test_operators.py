"""Unit tests for the training-data-pipeline operators: dedup (exact /
MinHash-LSH / SimHash / n-gram Jaccard), similarity search, text
analysis, multimodal plumbing.

Style follows the reference's golden/structural tests
(/root/reference/grid-and-attrs/footprint.test.js): tiny deterministic
fixtures, planted duplicates, exact expectations.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from data_pipeline_spark.operators import dedup as D
from data_pipeline_spark.operators import multimodal as M
from data_pipeline_spark.operators import similarity as S
from data_pipeline_spark.operators import text as T

BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest to find some tasty food for the winter"
)
NEAR = BASE.replace("tasty", "yummy")  # one-word edit → near-duplicate
OTHER = (
    "completely different content about spark shuffles partitions and "
    "catalyst optimizer rules rewriting logical plans into physical ones"
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, NEAR),  # near dup of 0
        (3, OTHER),
        (4, "short"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    out = {r["canonical_id"]: r["n_dupes"] for r in D.exact_dedup(docs).collect()}
    assert out[0] == 2  # docs 0 and 1 collapse
    assert sum(out.values()) == 6
    assert len(out) == 5


def test_minhash_lsh_groups_exact_and_near_dups(docs):
    rep = {r["doc_id"]: r["rep_id"] for r in D.minhash_lsh_rep(docs).collect()}
    assert rep[1] == 0  # exact dup must share every band
    assert rep[2] == 0  # one-word edit shares most shingles → some band
    assert rep[3] == 3  # unrelated text stays its own rep
    assert rep[0] == 0


def test_simhash_near_dup_is_close(docs):
    sh = {r["doc_id"]: r["simhash"] for r in D.simhash(docs, bits=16).collect()}
    assert sh[0] == sh[1]
    ham = bin(sh[0] ^ sh[2]).count("1")
    ham_other = bin(sh[0] ^ sh[3]).count("1")
    assert ham <= 4
    assert ham < ham_other


def test_ngram_jaccard_pairs(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert 0.5 <= pairs[(0, 2)] < 1.0
    assert (0, 3) not in pairs


def test_lsh_jaccard_matches_brute_force(docs):
    lsh = D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    brute = D.ngram_jaccard_pairs(docs, threshold=0.5, all_pairs=True).collect()
    # at this threshold LSH candidates must include every true pair
    assert {(r["id_a"], r["id_b"]) for r in lsh} == {
        (r["id_a"], r["id_b"]) for r in brute
    }


# --------------------------------------------------------------- similarity


@pytest.fixture(scope="module")
def vectors(spark):
    # 3 clusters along axes + one duplicate of vec 0
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.01, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.98, 0.02, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
        (5, [1.0, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_cosine_topk_exact(vectors):
    out = S.cosine_topk(vectors, vectors.filter(F.col("vec_id") == 0), k=2)
    rows = {r["rank"]: (r["neighbor_id"], r["cos"]) for r in out.collect()}
    assert rows[1][0] == 5 and rows[1][1] == pytest.approx(1.0)
    assert rows[2][0] == 1


def test_lsh_topk_finds_identical_vector(vectors):
    out = S.lsh_bucket_topk(vectors, k=2, dim=4, n_planes=4, n_tables=2)
    got = {
        (r["query_id"], r["rank"]): r["neighbor_id"] for r in out.collect()
    }
    # identical vectors land in identical buckets in EVERY table
    assert got[(0, 1)] == 5
    assert got[(5, 1)] == 0


# --------------------------------------------------------------------- text


def test_lang_id_stopword_profiles(spark):
    rows = [
        (0, "the cat and the dog of a house is it that for"),
        (1, "der Hund und die Katze ist ein Tier zu den mit von"),
        (2, "le chat et la maison est un une des du que"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["lang_pred"] for r in T.lang_id(df).collect()}
    assert out == {0: "en", 1: "de", 2: "fr"}


def test_quality_score_features(spark):
    df = spark.createDataFrame(
        [(0, "the cat sat. on the mat!")], "doc_id long, text string"
    )
    r = T.quality_score(df).collect()[0]
    assert r["n_words"] == 6
    assert r["n_punct"] == 2
    assert r["n_chars"] == 24
    assert 0.0 < r["quality"] <= 1.0


def test_repetition_stats_golden(spark):
    """Gopher-style repetition gates: hand-computed duplicate fractions
    and the combined keep/drop flag."""
    docs = [
        ("clean", "one two three four five\nsix seven eight nine ten"),
        ("dup_lines", "same line\nsame line\nsame line\nunique line"),
        ("dup_words", "spam spam spam spam spam spam spam ham"),
        ("empty", ""),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r["doc_id"]: r.asDict() for r in T.repetition_stats(df).collect()}
    assert got["clean"]["dup_line_frac"] == 0.0
    assert got["clean"]["keep_doc"]
    # 4 lines, 2 distinct -> 0.5 duplicate fraction, over the 0.30 gate
    assert got["dup_lines"]["dup_line_frac"] == 0.5
    assert not got["dup_lines"]["keep_doc"]
    # 8 words, 2 distinct -> 0.75, over the 0.70 word gate
    assert got["dup_words"]["dup_word_frac"] == 0.75
    assert not got["dup_words"]["keep_doc"]
    # empty doc: nothing repeats, kept
    assert got["empty"]["dup_word_frac"] == 0.0
    assert got["empty"]["keep_doc"]


def test_token_counts(spark):
    df = spark.createDataFrame([(0, "ab 12 c!d")], "doc_id long, text string")
    r = T.token_counts(df).collect()[0]
    assert r["n_ws_tokens"] == 3
    assert r["n_bpe_tokens"] == 5  # ab | 12 | c | ! | d


def test_fingerprint_normalization_invariance(spark):
    df = spark.createDataFrame(
        [
            (0, "Hello,   World! This is Fine."),
            (1, "hello world this is fine"),
            (2, "something else entirely here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["fp_norm"], r["fp_winnow"]) for r in T.fingerprint(df).collect()}
    assert out[0] == out[1]  # punctuation/case/whitespace-invariant
    assert out[0] != out[2]


# --------------------------------------------------------------- multimodal


def test_multimodal_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, 640, 480), (2, 128, 72)], "id long, w int, h int"
    )
    media = M.pack_fake_media(df, "id", "w", "h", kind="image")
    out = {r["id"]: r for r in M.decode_metadata(media).collect()}
    assert (out[1]["width"], out[1]["height"]) == (640, 480)
    assert (out[2]["width"], out[2]["height"]) == (128, 72)
    assert out[1]["n_bytes"] == 13
    assert out[1]["n_frames"] == 1


def test_multimodal_frame_sample_shape(spark):
    df = spark.createDataFrame([(1, 64, 64)], "id long, w int, h int")
    media = M.pack_fake_media(df, "id", "w", "h", kind="video")
    frames = M.frame_sample(media, every_n=1).collect()
    assert len(frames) == 1
    assert frames[0]["frame_no"] == 0


def test_decode_stub_rejects_real_formats():
    # PNG-signature bytes now route to the stdlib codec tier, which
    # rejects a corrupt body loudly rather than guessing
    with pytest.raises(ValueError, match="corrupt PNG"):
        M._decode_stub(b"\x89PNG\r\n\x1a\n....")
    # JPEG now routes to the stdlib SOFn walk (r5): a corrupt body is a
    # loud ValueError, not a silent guess
    with pytest.raises(ValueError):
        M._decode_stub(b"\xff\xd8\xff\xe0....JFIF....")
    # GIF routes to the stdlib block walk (r5): same loud-rejection rule
    with pytest.raises(ValueError, match="corrupt GIF"):
        M._decode_stub(b"GIF87a" + bytes(16))
    # formats with no stdlib codec still hit the disclosed boundary
    with pytest.raises(NotImplementedError):
        M._decode_stub(b"BM" + bytes(20))


def test_ivf_topk_recall_vs_brute_force(spark):
    """IVF probe search: with enough probes, top-1 recall vs exact brute
    force must be high; with n_probe == n_pivots it must be exact."""
    import math
    import random

    rnd = random.Random(3)
    rows = []
    for i in range(300):
        base = [0.0] * 8
        base[i % 8] = 1.0
        vec = [x + rnd.uniform(-0.05, 0.05) for x in base]
        rows.append((i, vec))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = vecs.filter(F.col("vec_id").between(100, 119))

    exact = {
        r["query_id"]: r["neighbor_id"]
        for r in S.cosine_topk(vecs, queries, k=1).collect()
    }
    # full probe = exact (every cluster searched)
    full = {
        r["query_id"]: r["neighbor_id"]
        for r in S.ivf_topk(vecs, queries, k=1, n_pivots=16, n_probe=16).collect()
    }
    assert full == exact
    # partial probe: high recall at a fraction of the scan
    part = {
        r["query_id"]: r["neighbor_id"]
        for r in S.ivf_topk(vecs, queries, k=1, n_pivots=16, n_probe=4).collect()
    }
    recall = sum(part.get(q) == n for q, n in exact.items()) / len(exact)
    assert recall >= 0.8, recall


def test_ivf_assign_is_argmax(vectors):
    out = {r["vec_id"]: r["pivot_id"] for r in S.ivf_assign(vectors, n_pivots=3).collect()}
    # vec 5 duplicates vec 0 → pivot 0; vec 3 is nearest pivot 2 (y-axis)
    assert out[5] == 0 and out[3] == 2 and out[0] == 0


def test_embed_cosine_dedup_exact_and_cascaded(spark):
    """Exact brute-force near-dup clustering finds the planted duplicate
    pairs; the LSH-cascaded scale path agrees on a clustered corpus
    (identical vectors always share every LSH bucket)."""
    import random

    rnd = random.Random(5)
    rows = []
    for i in range(120):
        base = [0.0] * 8
        base[i % 4] = 1.0
        vec = [x + rnd.uniform(-0.3, 0.3) for x in base]
        rows.append((i, vec))
    # plant exact duplicates: 100↔0, 101↔1
    rows[100] = (100, rows[0][1])
    rows[101] = (101, rows[1][1])
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    exact = {
        r["vec_id"]: r["rep_id"]
        for r in S.embed_cosine_dedup(vecs, threshold=0.999, all_pairs=True).collect()
    }
    assert exact[100] == 0 and exact[101] == 1 and exact[0] == 0
    assert sum(1 for k, v in exact.items() if v != k) == 2

    casc = {
        r["vec_id"]: r["rep_id"]
        for r in S.embed_cosine_dedup(
            vecs, threshold=0.999, dim=8, n_planes=4, n_tables=2
        ).collect()
    }
    assert casc == exact


def test_multimodal_resize_and_feature_pipeline(spark):
    """Media pipeline end-to-end: pack → resize → decode (new dims) →
    feature-extract → embedding dedup finds the duplicate payloads."""
    from data_pipeline_spark.operators import multimodal as M

    # (w,h) cycles with period lcm(3,4)=12 < 20, so ids 12..19 are EXACT
    # payload duplicates of ids 0..7 — the dedup half below has real
    # duplicates to find (a 7×5 cycle had period 35 > 20: zero dups, and
    # the dedup assertion was vacuously true for any rep assignment)
    d = spark.range(20).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3 * 10 + 10).cast("int").alias("w"),
        (F.col("id") % 4 * 10 + 10).cast("int").alias("h"),
    )
    media = M.pack_fake_media(d, "doc_id", "w", "h")
    resized = M.resize_media(media, width=64, height=48)
    meta = M.decode_metadata(resized, id_col="id", media_col="media")
    assert {(r["width"], r["height"]) for r in meta.collect()} == {(64, 48)}

    # identical payloads (same original w,h) → identical fake features
    feats = M.extract_features(media, dim=8)
    reps = {
        r["vec_id"]: r["rep_id"]
        for r in S.embed_cosine_dedup(
            feats.withColumnRenamed("id", "vec_id"),
            threshold=0.999,
            all_pairs=True,
        ).collect()
    }
    # planted duplicates resolve to the first-seen twin; the first cycle
    # keeps itself as representative
    for i in range(12, 20):
        assert reps[i] == i - 12, (i, reps[i])
    for i in range(12):
        assert reps[i] == i, (i, reps[i])
    assert feats.count() == 20


def test_pii_scrub_golden(spark):
    docs = [
        (0, "mail bob.smith+x@corp.example.org then call 555-123-4567 at 10.0.0.42 ok"),
        (1, "nothing sensitive here at all"),
        (2, "version 1.2.3.4 of the spec"),  # IPv4-shaped -> redacted (by design)
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in T.pii_scrub(df).collect()}
    assert (got[0]["n_email"], got[0]["n_phone"], got[0]["n_ip"]) == (1, 1, 1)
    assert got[0]["clean_text"] == "mail <EMAIL> then call <PHONE> at <IP> ok"
    assert got[0]["has_pii"]
    assert not got[1]["has_pii"]
    assert got[1]["clean_text"] == docs[1][1]
    # the narrow-pattern contract: anything IPv4-shaped is scrubbed
    assert got[2]["n_ip"] == 1 and got[2]["clean_text"] == "version <IP> of the spec"


def test_contamination_golden(spark):
    corpus = [
        (0, "alpha beta gamma delta epsilon zeta"),          # = benchmark doc
        (1, "alpha beta gamma delta epsilon ZETA prime"),    # shares one 5-gram
        (2, "one two three four five six seven"),            # disjoint
        (3, "too short"),                                     # < n words -> 0 grams
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_overlap_grams"], r["contaminated"])
        for r in D.contamination(df, bench, n=5).collect()
    }
    # doc 0: its two 5-grams both appear in the benchmark
    assert got[0] == (2, True)
    # doc 1: only "alpha beta gamma delta epsilon" overlaps (ZETA != zeta)
    assert got[1] == (1, True)
    assert got[2] == (0, False)
    assert got[3] == (0, False)


def test_rarity_stats_golden(spark):
    """Hand-computed corpus document frequencies: 'shared' appears in 3
    docs (common), 'solo'/'unique'/'rare' in one each (rare at df<=2)."""
    docs = [
        (0, "shared solo"),
        (1, "shared unique"),
        (2, "shared rare shared"),  # duplicate word counts once for DF
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in T.rarity_stats(df).collect()}
    assert got[0] == {"doc_id": 0, "n_distinct_words": 2, "n_rare_words": 1, "min_df": 1}
    assert got[1] == {"doc_id": 1, "n_distinct_words": 2, "n_rare_words": 1, "min_df": 1}
    assert got[2] == {"doc_id": 2, "n_distinct_words": 2, "n_rare_words": 1, "min_df": 1}


def test_lm_score_golden(spark):
    """Hand-computed add-k bigram model on a 3-doc corpus: repeated
    transitions score cheaper than one-off ones, short docs get NULL."""
    import math

    docs = [
        (0, "a b a b"),
        (1, "a b"),
        (2, "c"),  # one word: no bigrams
        (3, ""),  # '' tokenizes to [''] — a single pseudo-word
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in T.lm_score(df, k=0.5).collect()}
    # corpus bigrams: doc0 (a,b),(b,a),(a,b); doc1 (a,b)
    # C(a,b)=3, C(b,a)=1; C(a·)=3, C(b·)=1; V = |{a,b,c,''}| = 4
    p_ab = (3 + 0.5) / (3 + 0.5 * 4)
    p_ba = (1 + 0.5) / (1 + 0.5 * 4)
    nll0 = -(2 * math.log2(p_ab) + math.log2(p_ba)) / 3
    nll1 = -math.log2(p_ab)
    assert got[0]["n_bigrams"] == 3 and abs(got[0]["lm_nll"] - nll0) < 1e-3
    assert got[1]["n_bigrams"] == 1 and abs(got[1]["lm_nll"] - nll1) < 1e-3
    # doc1's single shared transition is more probable than doc0's mix
    assert got[1]["lm_nll"] < got[0]["lm_nll"]
    assert got[2] == {"doc_id": 2, "n_bigrams": 0, "lm_nll": None}
    assert got[3] == {"doc_id": 3, "n_bigrams": 0, "lm_nll": None}


def test_url_stats_golden(spark):
    docs = [
        (0, "read https://a.example/x and http://b.example/y?q=1 now"),
        (1, "plain text no links"),
        (2, "bad http://tracker.example/pixel here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r.asDict() for r in T.url_stats(df).collect()}
    assert got[0]["n_urls"] == 2
    assert got[0]["hosts"] == "a.example,b.example"
    assert not got[0]["has_blocked_url"]
    assert got[1] == {"doc_id": 1, "n_urls": 0, "hosts": "", "has_blocked_url": False}
    assert got[2]["has_blocked_url"]
