"""Fixture catalog: load the driver's parquet tables and register views.

The reference registers Delta tables in a Hive metastore
(reference: Sourcecode/spark/metadata.py:41-65); here the same role is
played by temp views over parquet so every operator can be expressed
either via the DataFrame API or ``spark.sql``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
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

# (sf_dir, table) -> inferred StructType. Parquet schema inference is a
# driver-side footer read on every spark.read.parquet call (~0.1 s per
# table); a star query touching 5 tables pays ~0.5 s of pure planning
# before any executor works. The fixture files are immutable, so infer
# once per process and pass the schema explicitly afterwards — the
# production analogue is a metastore-backed table whose schema ships
# with the catalog entry instead of being re-read from footers.
_SCHEMA_CACHE: dict = {}


def load_table(
    spark: SparkSession, sf_dir: str, name: str, *, fanout: bool = False
) -> DataFrame:
    """Columnar scan of one fixture table (vectorized parquet reader;
    Catalyst pushes filters/projections into the scan).

    ``fanout=True`` round-robins the rows across all cores before a
    CPU-heavy per-row pipeline (shingling, hashing, regex). The local
    fixture files are single-row-group parquet, so the scan yields ONE
    input split and an explode-heavy stage would otherwise run on one
    core (measured 7× slower at sf0.1). At production scale a 100 TB
    table has thousands of splits and the extra round-robin Exchange
    is unnecessary — but it is also proportionally free (it ships the
    compact pre-explode rows, never the exploded stream), so the same
    plan is correct at both ends."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    cached = _SCHEMA_CACHE.get((sf_dir, name))
    if cached is not None:
        df = spark.read.schema(cached).parquet(path)
    else:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[(sf_dir, name)] = df.schema
    if name == "events":
        # The fixture's ts encoding has varied across driver versions:
        # TIMESTAMP(NANOS) (long under nanosAsLong) or TIMESTAMP(MICROS,
        # isAdjustedToUTC=false) (TIMESTAMP_NTZ in Spark 4). Normalize to
        # session-UTC TIMESTAMP_LTZ so unix_micros/window/watermark code
        # sees one type; with session tz UTC this matches DuckDB's naive
        # epoch() semantics exactly.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType

        if isinstance(df.schema["ts"].dataType, LongType):
            # integer div — a float div would round at 2^60 magnitude
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(df.schema["ts"].dataType, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    if fanout:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Load tables and register each as a temp view for spark.sql use."""
    dfs = load_tables(spark, sf_dir, names)
    for n, df in dfs.items():
        df.createOrReplaceTempView(n)
    return dfs
