"""Parquet table loaders for the driver-generated testdata.

The reference's sources are MongoDB collection scans with time-range
predicates and projections (/root/reference/src/EnvAbacRuleMiner.py:67,
/root/reference/src/RbacRuleMiner.py:33 — SURVEY.md §2.1 S1/S2).  Here the
source is columnar Parquet, so predicate pushdown, partition pruning and
column pruning are done by Catalyst (checked in tests via the explain
plan).  An Iceberg catalog would be a drop-in (`spark.read.format
("iceberg")`) but no iceberg-spark-runtime jar ships in this sandbox, so
plain Parquet with the same layout is the documented fallback.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
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
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
