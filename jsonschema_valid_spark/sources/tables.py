"""Table sources: Iceberg-first seam with parquet fallback.

At deploy scale the input is an Iceberg table of pre-tokenized training
sequences (BASELINE.json input_hint) read via ``spark.table(name)`` /
``spark.read.format("iceberg")`` — partition pruning and min/max file
skipping come from Iceberg metadata. The sandbox has no Iceberg runtime jar
(SURVEY.md §7), so the default implementation reads parquet; the seam keeps
call sites identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table. ``SPARK_GRAFT_TABLE_FORMAT=iceberg`` switches to the
    catalog path (``spark.table``); default is parquet files under sf_dir."""
    fmt = os.environ.get("SPARK_GRAFT_TABLE_FORMAT", "parquet")
    if fmt == "iceberg":
        return spark.table(name)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str,
                names=TABLES, register_views: bool = True) -> dict[str, DataFrame]:
    out = {}
    for name in names:
        df = read_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
