"""Parquet table loaders for the driver testdata star schema.

One file per table under an sf dir (TESTDATA.md). Views are registered
under their bare names so queries can go through spark.sql — the
engine's analog of the reference's external-table DDL
(/root/reference/athena-schema/buildings.sql:1-25), minus the manual
ADD PARTITION bookkeeping a real table format owns.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None) -> dict[str, DataFrame]:
    out = {}
    for n in names or TABLES:
        df = load_table(spark, sf_dir, n)
        df.createOrReplaceTempView(n)
        out[n] = df
    return out
