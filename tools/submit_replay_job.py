"""spark-submit job: tiny deterministic CDC replay, self-verifying.

Run via tools/package_and_submit.sh — the script zips data_pipeline_spark
and ships it with --py-files, proving the engine deploys as a plain
spark-submit package (the north rule's packaging requirement) with NO
reliance on a repo checkout on the executors' PYTHONPATH.

The job replays a generated binlog through the MERGE path and verifies
the final state against an in-job window-LWW oracle computed directly
from the same event DataFrame (independent of the icebox/merge code
under test). Exits 0 and prints SUBMIT_REPLAY_OK on success.
"""

from __future__ import annotations

import os
import sys
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import SparkSession, Window
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# imported from the --py-files zip, not a repo checkout
from data_pipeline_spark.cdc.apply import OP_RANK, replay_log
from data_pipeline_spark.gen import gen_event_log
from data_pipeline_spark.icebox.table import IceboxTable

BASE_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
        StructField("source", StringType()),
    ]
)


def main() -> int:
    spark = SparkSession.builder.appName("submit_replay").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    n_events, n_docs = 20_000, 2_000

    work = tempfile.mkdtemp(prefix="submit_replay_")
    ev = gen_event_log(
        spark, n_events, n_docs, batch_size=n_events // 4, hot_frac=0.2
    ).persist()

    table = IceboxTable.create(
        spark, os.path.join(work, "t"), BASE_SCHEMA, n_buckets=16
    )
    table = replay_log(table, ev, merge_strategy="delta")
    table = table.compact_if_needed(ratio=0.5)
    got = table.read().select("doc_id", "tokens", "n_tok", "source")

    rank = F.create_map(
        *[x for k, v in OP_RANK.items() for x in (F.lit(k), F.lit(v))]
    )[F.col("op")]
    w = Window.partitionBy("doc_id").orderBy(F.col("lsn").desc(), rank.desc())
    want = (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col("op") != "delete"))
        .select("doc_id", "tokens", "n_tok", "source")
    )

    n_got, n_want = got.count(), want.count()
    csv = F.concat_ws(",", "tokens")
    diff = (
        got.withColumn("tokens", csv).exceptAll(want.withColumn("tokens", csv))
    ).count()
    if n_got == n_want and n_got > 0 and diff == 0:
        print(f"SUBMIT_REPLAY_OK rows={n_got}")
        return 0
    print(f"SUBMIT_REPLAY_FAIL got={n_got} want={n_want} diff={diff}")
    return 1


if __name__ == "__main__":
    sys.exit(main())
