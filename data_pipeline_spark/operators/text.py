"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All built-in JVM expressions — no Python UDFs.

The reference's analog is its per-row enrichment stage: derive key,
grid, area, county for every footprint
(/root/reference/grid-and-attrs/footprint.js:86-178) — here the derived
columns are language, quality, token counts, fingerprint for every
document. Like the reference's counters
(/root/reference/grid-and-attrs/app.js:136-141), everything is exact,
deterministic, and cheap enough to run inline with a scan.

Every function here has an exact DuckDB-SQL twin in __spark_entry__
(oracle-checked); that is the engine-independence contract the
reference's golden-value tests set (footprint.test.js:22-34).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.portable import h64, norm_text, words
from .util import ensure_parallelism

# tiny per-language stopword profiles (public common function words).
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu", "den", "mit", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "du", "que"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "de", "que"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "人", "这"],
}
LANGS = sorted(STOPWORDS)

# BPE-ish token pattern: word pieces, digit runs, punctuation runs.
# Kept to constructs with identical semantics in Java regex and RE2.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """N-gram/stopword heuristic language ID.

    score(lang) = #words of the doc found in lang's stopword list
    (duplicates counted). Winner = argmax, ties broken alphabetically.
    Output: (id, lang_pred, lang_score).
    """
    w = F.transform(words(text_col), lambda x: F.lower(x))

    def _in_stopwords(lng: str):
        # closure factory — a multi-param lambda would get (element, index)
        return lambda x: x.isin(STOPWORDS[lng])

    scores = [
        F.size(F.filter(w, _in_stopwords(lng))).alias(f"s_{lng}") for lng in LANGS
    ]
    scored = ensure_parallelism(df).select(F.col(id_col), *scores)
    best = F.greatest(*[F.col(f"s_{lng}") for lng in LANGS])
    pick = F.coalesce(
        *[F.when(F.col(f"s_{lng}") == best, F.lit(lng)) for lng in LANGS]
    )
    return scored.select(
        F.col(id_col),
        pick.alias("lang_pred"),
        best.cast("int").alias("lang_score"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic quality features + a combined [0,1] score.

    Features: n_chars, n_words, mean word length, punctuation ratio,
    stopword(en) ratio. Combined score = product of clamped feature
    scores (every term expressible identically in any SQL engine).
    """
    w = words(text_col)
    n_words = F.size(w)
    n_chars = F.length(F.col(text_col))
    mean_wlen = (
        F.aggregate(w, F.lit(0.0), lambda acc, x: acc + F.length(x)) / n_words
    )
    n_punct = F.size(F.split(F.col(text_col), "[.,;:!?]")) - 1
    stop_en = F.size(
        F.filter(F.transform(w, lambda x: F.lower(x)), lambda x: x.isin(STOPWORDS["en"]))
    )
    stop_ratio = stop_en / n_words
    punct_ratio = n_punct / F.greatest(n_words, F.lit(1))
    len_score = F.least(n_words / F.lit(20.0), F.lit(1.0))
    score = len_score * (F.lit(0.5) + F.lit(0.5) * F.least(stop_ratio * 5, F.lit(1.0)))
    return ensure_parallelism(df).select(
        F.col(id_col),
        n_chars.cast("long").alias("n_chars"),
        n_words.cast("int").alias("n_words"),
        F.round(mean_wlen, 6).alias("mean_wlen"),
        n_punct.cast("int").alias("n_punct"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(score, 6).alias("quality"),
    )


def token_counts(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count + chars/token."""
    n_ws = F.size(words(text_col))
    n_bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_PATTERN), 0))
    return ensure_parallelism(df).select(
        F.col(id_col),
        n_ws.cast("int").alias("n_ws_tokens"),
        n_bpe.cast("int").alias("n_bpe_tokens"),
        F.round(F.length(text_col) / F.greatest(n_bpe, F.lit(1)), 6).alias("chars_per_token"),
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dup_line_max: float = 0.30,
    dup_word_max: float = 0.70,
    dup_2gram_max: float = 0.60,
) -> DataFrame:
    """Intra-document repetition filters (Gopher-style, Rae et al. 2021
    §A1.1): fraction of duplicate lines, duplicate words, and duplicate
    word 2-grams within each document, plus a combined keep/drop flag —
    the standard "repetitious document" gate in LLM training-data
    pipelines (boilerplate, keyword stuffing, degenerate generations).

    All pure array HOFs over one scan — no explode, no shuffle, no UDF:
    dup_frac(xs) = 1 - |distinct xs| / |xs|. Empty/short docs score 0
    (nothing repeats). Fractions rounded to 6 places for cross-engine
    parity; the DuckDB twin computes identical values.

    Follows the reference's inline per-row enrichment posture
    (/root/reference/grid-and-attrs/footprint.js:86-178): derived
    columns cheap enough to ride along with the scan.
    """
    # STAGE the arrays as real columns, and build 2-grams with zip_with
    # over two slices instead of element_at(w, i) inside transform(): a
    # lambda that references the outer array re-evaluates it PER ELEMENT
    # once predicate pushdown substitutes the staged column back in
    # (filters aren't protected by SPARK-36718 staging) — measured 36×
    # slower on repetition_stats(df).filter("keep_doc").
    arrays = ensure_parallelism(df).select(
        F.col(id_col),
        F.split(F.col(text_col), "\n", -1).alias("_lines"),
        words(text_col).alias("_w"),
    )
    w = F.col("_w")
    n_w = F.size(w)
    grams2 = F.when(
        n_w >= 2,
        F.zip_with(
            F.slice(w, 1, n_w - 1),
            F.slice(w, 2, n_w - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))

    def dup_frac(arr):
        n = F.size(arr)
        return F.when(
            n > 0, F.lit(1.0) - F.size(F.array_distinct(arr)) / n
        ).otherwise(F.lit(0.0))

    staged = arrays.select(
        F.col(id_col),
        F.round(dup_frac(F.col("_lines")), 6).alias("dup_line_frac"),
        F.round(dup_frac(w), 6).alias("dup_word_frac"),
        F.round(dup_frac(grams2), 6).alias("dup_2gram_frac"),
    )
    keep = (
        (F.col("dup_line_frac") <= dup_line_max)
        & (F.col("dup_word_frac") <= dup_word_max)
        & (F.col("dup_2gram_frac") <= dup_2gram_max)
    )
    return staged.withColumn("keep_doc", keep)


# PII patterns, kept to constructs with identical semantics in Java
# regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround. Redaction
# order is fixed (email -> phone -> ip) so both engines produce
# byte-identical clean text even when patterns could overlap (an IPv4
# inside a non-TLD email-like string is redacted as IP in both).
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_scrub(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """PII redaction — the standard pre-training scrub stage (emails,
    phone numbers, IPv4 addresses replaced by typed tokens), plus
    per-type match counts and a has_pii flag.

    Counts are computed on the ORIGINAL text; redaction is sequential in
    PII_PATTERNS order. Pure regexp built-ins inline with the scan — no
    UDFs, no shuffle. Patterns are deliberately narrow/deterministic
    (this is the distributed plumbing; swapping in heavier recognizers
    is a pattern-list change).
    """
    staged = ensure_parallelism(df)
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).cast("int").alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    clean = F.col(text_col)
    for _, pat, token in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, token)
    out = staged.select(F.col(id_col), *counts, clean.alias("clean_text"))
    has = None
    for name, _, _ in PII_PATTERNS:
        c = F.col(f"n_{name}") > 0
        has = c if has is None else (has | c)
    return out.withColumn("has_pii", has)


def pii_scrub_sql(table: str = "documents", id_col: str = "doc_id",
                  text_expr: str = "text") -> str:
    """DuckDB twin of pii_scrub (RE2; 'g' flag for global replace)."""
    counts = ",\n  ".join(
        f"CAST(length(regexp_extract_all({text_expr}, '{pat}')) AS INT) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    clean = text_expr
    for _, pat, token in PII_PATTERNS:
        clean = f"regexp_replace({clean}, '{pat}', '{token}', 'g')"
    flag = " OR ".join(f"n_{name} > 0" for name, _, _ in PII_PATTERNS)
    return f"""
SELECT {id_col}, n_email, n_phone, n_ip, clean_text, ({flag}) AS has_pii
FROM (SELECT {id_col},
  {counts},
  {clean} AS clean_text
FROM {table})
"""


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprints:

    * fp_norm  — h64 of whitespace/punct-normalized text (robust exact-dup
      key, the engine's quickHash analog,
      /root/reference/grid-and-attrs/footprint.js:12-28);
    * fp_winnow — min h64 over the normalized text's 8-gram shingles
      (a 1-hash winnowing sketch: stable under local edits).
    """
    from ..functions.portable import shingles

    # stage the normalized text and the shingle array as real columns:
    # inlining them would re-run the regex chain once PER SHINGLE ELEMENT
    # inside the transform lambda (quadratic — measured 130s vs ~2s on
    # 5k docs). SPARK-36718 keeps non-cheap multi-referenced projections
    # from collapsing back in.
    staged = ensure_parallelism(df).select(
        F.col(id_col), norm_text(text_col).alias("_nrm")
    ).select(
        F.col(id_col), F.col("_nrm"), shingles(F.col("_nrm"), k=8).alias("_sh")
    )
    return staged.select(
        F.col(id_col),
        h64(F.col("_nrm")).alias("fp_norm"),
        F.when(
            F.size("_sh") > 0, F.array_min(F.transform("_sh", lambda x: h64(x)))
        ).alias("fp_winnow"),
    )


def rarity_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rare_df_max: int = 2,
) -> DataFrame:
    """Corpus-level word rarity per document — the two-pass statistic
    behind rare-word/gibberish filtering (a doc whose vocabulary is
    mostly corpus-rare words is OCR noise, lorem ipsum, or another
    language): per doc, its distinct-word count, how many of those words
    have corpus document-frequency ≤ rare_df_max, and the minimum DF.

    All-integer aggregates (counts, min) — exactly reproducible
    cross-engine, no float-summation order sensitivity.

    Scale shape: the exploded (doc, word) pairs cross ONE exchange, keyed
    on _word. HashPartitioning(_word) satisfies the (doc, word) dedup
    aggregate's clustered-distribution requirement (partitioning keys ⊆
    grouping keys), the document-frequency aggregate groups on _word
    itself, and the dw⋈dfreq equi-join is co-partitioned on _word — so
    dedup, DF, and the join all reuse that single exchange; the only
    other shuffle is the final per-doc rollup on doc_id. Both keys are
    high-cardinality and uniform; nothing collects, nothing broadcasts a
    corpus-sized set. (Plan-asserted in PLANS.md: the (doc, word)-scale
    data crosses exactly 2 exchanges.)
    """
    staged = ensure_parallelism(df).select(F.col(id_col), words(text_col).alias("_w"))
    dw = (
        staged.select(F.col(id_col), F.explode("_w").alias("_word"))
        .repartition("_word")
        .drop_duplicates([id_col, "_word"])
    )
    dfreq = dw.groupBy("_word").agg(F.count(F.lit(1)).alias("_df"))
    per_doc = (
        dw.join(dfreq, "_word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_distinct_words"),
            F.sum((F.col("_df") <= rare_df_max).cast("long")).alias("n_rare_words"),
            F.min("_df").alias("min_df"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_distinct_words"), F.lit(0)).cast("long").alias(
                "n_distinct_words"
            ),
            F.coalesce(F.col("n_rare_words"), F.lit(0)).cast("long").alias(
                "n_rare_words"
            ),
            F.col("min_df").cast("long").alias("min_df"),
        )
    )


def lm_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 0.5,
) -> DataFrame:
    """Corpus-trained bigram language-model scoring — the n-gram-LM
    quality gate (the CCNet/KenLM filtering pattern: a document whose
    word transitions are improbable under a model of the corpus is
    boilerplate, gibberish, or another language). Trains add-k-smoothed
    bigram probabilities ON the input corpus in the same job, then
    scores every document's mean negative log2 transition probability:
    P(v|u) = (C(u,v) + k) / (C(u) + k·V), V = corpus vocabulary size,
    C(u) = bigram-context count. Output: (doc_id, n_bigrams, lm_nll)
    with lm_nll rounded to 4 decimals (cross-engine float-sum-order
    tolerance, same discipline as the pricing aggregates) and NULL for
    documents with fewer than two words.

    Scale shape: bigram extraction is pure codegen (slice + zip_with on
    the word array into a (u, v) STRUCT — a typed key, so words are
    never string-concatenated and no delimiter can collide); the
    (doc, bigram) occurrence stream crosses one exchange keyed on the
    bigram, the count and context tables are both bigram-type-scale
    (cbg enriched with its context sum BEFORE rejoining the occurrence
    stream — the corpus-scale rows never reshuffle on the context
    word), V rides a 1-row broadcast, and the per-doc rollup is the
    only other shuffle. A swap to a pre-trained LM is the same plan
    with the count tables read instead of built.
    """
    staged = ensure_parallelism(df).select(
        F.col(id_col), words(text_col).alias("_w")
    )
    bg = staged.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size("_w") >= 2,
                F.zip_with(
                    F.slice("_w", 1, F.size("_w") - 1),
                    F.slice("_w", 2, F.size("_w") - 1),
                    lambda u, v: F.struct(u.alias("u"), v.alias("v")),
                ),
            ).otherwise(F.array().cast("array<struct<u: string, v: string>>"))
        ).alias("_bg"),
    ).repartition("_bg")
    cbg = bg.groupBy("_bg").agg(F.count(F.lit(1)).alias("_c"))
    ctx = (
        cbg.select(F.col("_bg.u").alias("_u"), "_c")
        .groupBy("_u")
        .agg(F.sum("_c").alias("_cu"))
    )
    # enrich the bigram-type-scale table first so the corpus-scale
    # occurrence stream joins exactly once, on its existing _bg keying
    cbg = cbg.withColumn("_u", F.col("_bg.u")).join(ctx, "_u").drop("_u")
    vocab = staged.select(F.explode("_w").alias("_word")).agg(
        F.count_distinct("_word").alias("_v")
    )
    nll = -F.log2(
        (F.col("_c") + F.lit(k)) / (F.col("_cu") + F.lit(k) * F.col("_v"))
    )
    per_doc = (
        bg.join(cbg, "_bg")
        .join(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum(nll) / F.count(F.lit(1)), 4).alias("lm_nll"),
        )
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias(
                "n_bigrams"
            ),
            F.col("lm_nll").cast("double").alias("lm_nll"),
        )
    )


# URL pattern, Java-regex/RE2-portable (group 1 = host). [^\s]* eats the
# path so counts see one match per URL, not per path segment. (?i) makes
# the scheme AND host match case-insensitively in both engines (URLs are
# case-insensitive in scheme/host per RFC 3986); extracted hosts are
# lowercased before the blocklist comparison for the same reason.
URL_PATTERN = r"(?i)https?://([A-Za-z0-9.-]+)[^\s]*"


def url_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    blocked_domains: tuple = ("tracker.example", "spam.example"),
) -> DataFrame:
    """URL/domain gate — the standard pre-training link hygiene stage:
    per doc, the URL count, the distinct extracted hosts (sorted,
    CSV-joined for engine-portable output), and a blocklist flag (exact
    host match against `blocked_domains`).

    Pure regexp built-ins inline with the scan; the blocklist is a
    literal array (a real deployment broadcasts a blocklist table and
    joins on host — the contamination() operator shows that shape).
    """
    hosts = F.array_distinct(
        F.transform(
            F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 1),
            lambda h: F.lower(h),
        )
    )
    blocked = F.arrays_overlap(
        hosts, F.array(*[F.lit(d) for d in blocked_domains])
    )
    return ensure_parallelism(df).select(
        F.col(id_col),
        F.regexp_count(F.col(text_col), F.lit(URL_PATTERN)).cast("int").alias("n_urls"),
        F.concat_ws(",", F.array_sort(hosts)).alias("hosts"),
        F.coalesce(blocked, F.lit(False)).alias("has_blocked_url"),
    )


def url_stats_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_expr: str = "text",
    blocked_domains: tuple = ("tracker.example", "spam.example"),
) -> str:
    """DuckDB twin of url_stats."""
    blist = ", ".join(f"'{d}'" for d in blocked_domains)
    pat = URL_PATTERN
    lhosts = (
        f"list_transform(regexp_extract_all({text_expr}, '{pat}', 1), "
        "x -> lower(x))"
    )
    return f"""
SELECT {id_col},
  CAST(length(regexp_extract_all({text_expr}, '{pat}')) AS INT) AS n_urls,
  coalesce(array_to_string(list_sort(list_distinct({lhosts})), ','), '') AS hosts,
  len(list_intersect(list_distinct({lhosts}), [{blist}])) > 0 AS has_blocked_url
FROM {table}
"""
