"""Batch sources (SURVEY.md §2.1 S2/S4/S5/S7).

S2 Delta scan -> parquet/delta scan (delta gated: not in this env).
S4/S7 driver-side ingest -> createDataFrame with explicit casts and
null defaulting (reference: Sourcecode/utils.py:8-32,
Sourcecode/spark/udf.py:88-97).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Table-snapshot scan. ``fmt='delta'`` works when delta-spark is on
    the classpath (reference: streaming_pipeline.py:32); parquet is the
    test-env format."""
    return spark.read.format(fmt).load(path)


def csv_scan(
    spark: SparkSession, path: str, header: bool = True, infer: bool = True
) -> DataFrame:
    """S5: CSV scan (reference: Garch_v1.ipynb cell 1 bitcoin_df.csv)."""
    return spark.read.csv(path, header=header, inferSchema=infer)


def rest_ingest(
    spark: SparkSession,
    fetch: Callable[[], Sequence[dict]],
    casts: dict[str, str],
    null_defaults: dict[str, object] | None = None,
) -> DataFrame:
    """S7: external-API list-of-dicts -> typed DataFrame.

    ``fetch`` is injected (tests pass a deterministic fake; production
    passes an HTTP client). Mirrors the reference's CoinCap ingest:
    driver-side fetch, explicit casts, null defaulting
    (utils.py:8-32, populate_dim.py:65).
    Driver-side by design: API payloads are dim-sized. Large external
    feeds belong on the streaming path, not here.
    """
    rows = list(fetch())
    df = spark.createDataFrame(rows)  # type: ignore[arg-type]
    for col, dtype in casts.items():
        df = df.withColumn(col, F.col(col).cast(dtype))
    for col, default in (null_defaults or {}).items():
        df = df.withColumn(col, F.coalesce(F.col(col), F.lit(default)))
    return df
