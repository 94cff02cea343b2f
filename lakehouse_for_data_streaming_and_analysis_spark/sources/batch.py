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
from pyspark.sql import types as T


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
    # Infer the schema driver-side (payloads are plain JSON scalars) —
    # createDataFrame without a schema runs an RDD sampling job just to
    # discover types, which dwarfs the actual work for dim-sized feeds.
    keys: list[str] = []
    for r in rows:
        for k in r:
            if k not in keys:
                keys.append(k)
    missing = (set(casts) | set(null_defaults or {})) - set(keys)
    if missing:
        raise ValueError(f"cast/default columns absent from payload: {sorted(missing)}")

    def py_type(k: str) -> T.DataType:
        v = next((r[k] for r in rows if r.get(k) is not None), None)
        if isinstance(v, bool):
            return T.BooleanType()
        if isinstance(v, int):
            return T.LongType()
        if isinstance(v, float):
            return T.DoubleType()
        return T.StringType()

    # Build the rows as Catalyst literals instead of createDataFrame:
    # parallelizing local rows schedules defaultParallelism tasks (and
    # spins up a Python worker per slice) for what is dim-sized data.
    # A literal inline(array(struct(...))) stays JVM-side as a single
    # local projection — no RDD, no Python workers, one task.
    types = {k: py_type(k) for k in keys}
    structs = [
        F.struct(*[F.lit(r.get(k)).cast(types[k]).alias(k) for k in keys])
        for r in rows
    ]
    df = spark.range(0, 1, numPartitions=1).select(F.inline(F.array(*structs)))
    exprs = []
    for k in keys:
        c = F.col(k)
        if k in casts:
            c = c.cast(casts[k])
        if k in (null_defaults or {}):
            c = F.coalesce(c, F.lit((null_defaults or {})[k]))
        exprs.append(c.alias(k))
    return df.select(*exprs)
