"""Duplicated-passage detection — exact substring-level dedup, the
span-granular complement to the document-level operators in dedup.py.

Document-level near-dup (MinHash/SimHash) misses the common real-world
case of training corpora: distinct documents sharing long verbatim
passages (boilerplate headers, license blocks, syndicated paragraphs,
quoted chunks). The published treatment (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better") finds duplicated ≥50-token
substrings with a suffix array — a single-machine data structure. The
Spark-native re-expression here is windowed fingerprinting:

  1. per doc, fingerprint every `window`-word span at `stride`-word
     steps — computed INSIDE the array domain with one `transform` over
     the staged word array (one row per doc; never an exploded row
     carrying the whole array, which would be O(words²) materialized);
  2. posexplode to (doc, start, fp) — O(words/stride) rows of three
     scalars;
  3. a fingerprint duplicated across ≥ min_docs distinct docs marks its
     windows — document frequency computed as a window aggregate over a
     single fp-partitioned pass (one exchange, no groupBy+probe-join,
     corpus fingerprinted exactly once);
  4. per doc, overlapping/adjacent duplicated windows collapse to spans
     by the gaps-and-islands trick (start/stride - row_number is
     constant within a run).

The reference's analog is its content-hash collision detection on whole
geometries (grid-and-attrs/footprint.js:121-124) — here narrowed from
whole-payload identity to every fixed-length span of the payload.

100 TB shape: window volume is O(total_words/stride) rows of
(int64, id, int) — `stride` is the explicit volume/recall knob (stride=1
catches every duplicated window of length ≥ window; stride=k shrinks
the shuffle k× and still catches spans ≥ window+k-1 words, since some
window at offset < k lands inside any such span... more precisely every
duplicated region of length ≥ window + stride - 1 contains an aligned
window in BOTH copies only when the copies' offsets agree mod stride —
production setting: stride 1 for exactness, stride>1 as a sampling
prefilter feeding an exact re-check). Fingerprint keys are uniform by
construction; nothing broadcasts a corpus-sized set; per-doc state never
leaves the array domain.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from ..functions.portable import h64, words
from .util import ensure_parallelism

_SALT = "pw"


def window_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    stride: int = 1,
) -> DataFrame:
    """(id, start, fp): the h64 fingerprint of each window-word span at
    stride steps (word start index, 0-based). Spans shorter than
    `window` words emit nothing."""
    staged = ensure_parallelism(df).select(
        F.col(id_col), words(text_col).alias("_w")
    )
    starts = F.sequence(
        F.lit(0), F.size("_w") - F.lit(window), F.lit(stride)
    )
    fps = F.transform(
        starts,
        lambda s: h64(
            F.concat_ws(" ", F.slice("_w", s + F.lit(1), F.lit(window))),
            salt=_SALT,
        ),
    )
    return (
        staged.filter(F.size("_w") >= window)
        .select(F.col(id_col), F.posexplode(fps).alias("_pos", "_fp"))
        .select(
            F.col(id_col),
            (F.col("_pos") * stride).alias("start"),
            F.col("_fp").alias("fp"),
        )
    )


def duplicate_passages(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    stride: int = 1,
    min_docs: int = 2,
) -> DataFrame:
    """Per-doc duplicated spans: (id, span_start, span_end, n_windows,
    max_docs) — word-index spans (inclusive) covered by window-word
    fingerprints that occur in ≥ min_docs DISTINCT documents; runs of
    consecutive duplicated windows merge into one span. max_docs is the
    widest document-frequency among the span's windows (how viral the
    passage is); n_windows the number of duplicated windows merged.

    Plan shape: document frequency is a window aggregate over ONE
    fp-partitioned pass (`size(collect_set(id)) OVER (PARTITION BY fp)`)
    rather than a groupBy + self-join — the corpus is fingerprinted
    exactly once and the whole operator is two exchanges total (fp for
    the doc-frequency, id for the span merge). A groupBy+join shape
    would scan/fingerprint twice: column pruning specializes the two
    subtrees so ReuseExchange cannot deduplicate them. Per-fp state is
    the distinct-doc set of one fingerprint group — bounded by how
    viral that single passage is, and partial-deduped nothing: callers
    with adversarial hot fingerprints (corpus-wide boilerplate) should
    pre-filter those fps or raise `stride`."""
    wins = window_fingerprints(
        df, id_col=id_col, text_col=text_col, window=window, stride=stride
    )
    w_fp = Window.partitionBy("fp")
    marked = wins.withColumn(
        "_nd", F.size(F.collect_set(F.col(id_col)).over(w_fp))
    ).filter(F.col("_nd") >= min_docs)
    w = Window.partitionBy(id_col).orderBy("start")
    grp = (F.col("start") / stride - F.row_number().over(w)).alias("_g")
    return (
        marked.select(F.col(id_col), "start", "_nd", grp)
        .groupBy(id_col, "_g")
        .agg(
            F.min("start").alias("span_start"),
            (F.max("start") + window - 1).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
            F.max("_nd").alias("max_docs"),
        )
        .drop("_g")
    )


def duplicate_passages_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 8,
    stride: int = 1,
    min_docs: int = 2,
    where: str = "TRUE",
) -> str:
    """DuckDB twin of duplicate_passages — identical values bit-for-bit
    (portable md5-based fingerprints, integer window arithmetic)."""
    w_expr = f"regexp_split_to_array(trim({text_col}), '\\s+')"
    span = f"array_to_string(w[s + 1 : s + {window}], ' ')"
    fp = f"CAST('0x' || substr(md5('{_SALT}:' || {span}), 1, 15) AS BIGINT)"
    return f"""
WITH d AS (
  SELECT {id_col}, {w_expr} AS w FROM {table}
  WHERE ({where}) AND len({w_expr}) >= {window}
),
wins AS (
  SELECT {id_col},
         unnest(range(0, len(w) - {window} + 1, {stride}))::BIGINT AS s,
         w
  FROM d
),
fps AS (SELECT {id_col}, s AS start, {fp} AS fp FROM wins),
dup AS (
  SELECT fp, count(DISTINCT {id_col}) AS nd
  FROM fps GROUP BY fp HAVING count(DISTINCT {id_col}) >= {min_docs}
),
m AS (
  SELECT f.{id_col}, f.start, d.nd,
         f.start / {stride} - row_number()
           OVER (PARTITION BY f.{id_col} ORDER BY f.start) AS g
  FROM fps f JOIN dup d USING (fp)
)
SELECT {id_col},
       min(start) AS span_start,
       max(start) + {window} - 1 AS span_end,
       count(*) AS n_windows,
       max(nd) AS max_docs
FROM m GROUP BY {id_col}, g
"""
