"""End-to-end corpus → training-table pipeline: the composition that
turns raw documents into the engine's own input shape.

``tokenize_corpus`` chains the LLM-data operators into one deterministic
pass and lands the result in an icebox table of pre-tokenized sequences
— exactly the (doc_id, tokens, n_tok, source) table the CDC spine
ingests (BASELINE.json input_hint), plus a leakage-safe ``split`` label:

  1. optional quality gate  — deterministic quality-weighted sampling
     (operators/curation.py; salted-hash, no RNG);
  2. BPE                    — train on the kept corpus (ONE corpus-scale
     word-count pass, driver loop on the bounded histogram), encode with
     the Arrow-batched broadcast-ranks UDF (operators/bpe.py);
  3. split                  — train/val/test keyed on the MinHash/LSH
     near-dup cluster representative so near-duplicates never straddle
     splits (operators/curation.py);
  4. land                   — one merge-on-read delta commit into a new
     icebox table (exactly-once tag; re-running the pipeline against the
     same root is a no-op), source declared IMMUTABLE so zone-map reads
     can skip delta commits on source predicates.

Every stage is shuffle-accounted: word histogram (1 exchange on words),
LSH banding (2 exchanges on band buckets / ids), quality gate (0 — rides
the scan), encode (0), the landing commit (1 on doc_id buckets). Nothing
is O(corpus) on the driver; the BPE histogram cap is the one disclosed
driver-memory bound.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from .icebox.table import IceboxTable
from .operators.bpe import (
    bpe_encode,
    bpe_train,
    model_from_portable,
    model_to_portable,
)
from .operators.curation import leakage_safe_split, quality_weighted_sample
from .operators.text import quality_score

TRAIN_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
        StructField("source", StringType()),
        StructField("split", StringType()),
    ]
)


def tokenize_corpus(
    spark: SparkSession,
    docs: DataFrame,
    table_root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    n_merges: int = 200,
    max_words: int = 200_000,
    quality_rate: float | None = None,
    fractions: tuple[float, ...] = (0.9, 0.05, 0.05),
    n_buckets: int = 32,
    tag: str = "tokenize-corpus-v1",
) -> tuple[IceboxTable, dict]:
    """Run the corpus→training-table pipeline; returns (table, bpe_model).

    The landed table is immediately consumable by the CDC spine: later
    document changes arrive as change events and merge into it via
    apply_batch/run_stream. `tag` makes the landing exactly-once — a
    crashed/re-run pipeline never double-writes: an existing root is
    LOADED (not re-created), and a root whose `tag` already committed
    returns immediately with the model persisted in that commit's
    summary (no corpus pass at all on replay).
    """
    model_path = os.path.join(table_root, "bpe_model.json")
    if os.path.exists(os.path.join(table_root, "metadata")):
        t = IceboxTable.load(spark, table_root)
        if t.has_tag(tag):
            if os.path.exists(model_path):
                with open(model_path) as f:
                    model = model_from_portable(json.load(f))
            else:  # sidecar lost — retrain (deterministic, same corpus)
                model = bpe_train(docs, n_merges=n_merges,
                                  text_col=text_col, max_words=max_words)
            return t, model
        # created but the landing never committed (crash between create
        # and commit_delta): fall through and land into the loaded table
    else:
        t = None

    kept = docs
    if quality_rate is not None:
        q = quality_score(docs, id_col=id_col, text_col=text_col)
        kept_ids = quality_weighted_sample(
            q.select(id_col, "quality"), rate=quality_rate, id_col=id_col
        ).select(id_col)
        kept = docs.join(kept_ids, id_col)

    model = bpe_train(kept, n_merges=n_merges, text_col=text_col,
                      max_words=max_words)
    enc = bpe_encode(kept, model, text_col=text_col, out_col="tokens")
    splits = leakage_safe_split(kept, fractions=fractions,
                                id_col=id_col, text_col=text_col)

    if t is None:
        t = IceboxTable.create(
            spark, table_root, TRAIN_SCHEMA, n_buckets=n_buckets,
            key="doc_id", immutable_cols=["source"],
        )
    # sidecar BEFORE the commit: a crash between them leaves an orphan
    # file the retry overwrites; after the tag commits, replays read the
    # model back instead of re-running the corpus pass
    with open(model_path, "w") as f:
        json.dump(model_to_portable(model), f)
    out = (
        enc.select(
            F.col(id_col).cast("string").alias("doc_id"),
            F.col("tokens"),
            F.size("tokens").cast("int").alias("n_tok"),
            F.col(source_col).cast("string").alias("source"),
        )
        .join(
            splits.select(
                F.col(id_col).cast("string").alias("doc_id"), "split"
            ),
            "doc_id",
        )
        .withColumn("_lsn", F.lit(0).cast("long"))
        .withColumn("_tombstone", F.lit(False))
        .withColumn("_b", t.bucket_of())
    )
    bucket_rows = {
        r["_b"]: r["n"]
        for r in out.groupBy("_b").agg(F.count("*").alias("n")).collect()
    }
    t = t.commit_delta(
        out, bucket_rows, tag=tag, collect_stats=True,
        summary={"operation": "tokenize_corpus", "merges": len(model["merges"])},
    )
    return t, model
