"""Fact layer: bronze stream -> enriched star-schema fact rows
(SURVEY.md §3.1 step 3; reference: etl.py:53-78).

Per tick: date_id/time_id surrogate keys, broadcast-join the coin
dimension (stream-static J1), market_cap = price * supply,
change_percent vs an injected last_price scalar, created_at stamp,
8-column projection, partitioned append.

The reference freezes last_price and the dim at startup (T9);
``last_price`` is therefore an explicit *parameter* here — callers
choose frozen (reference-faithful) or per-batch refresh. The clock is
injected for determinism (SURVEY §7.3 requires it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.datetime_fns import created_at, date_id, time_id


def enrich_fact(
    bronze: DataFrame,
    dim: DataFrame,
    price_col: str,
    join_on: Column,
    last_price: float,
    clock: Column | None = None,
    time_col: str = "timestamp",
) -> DataFrame:
    """Build the 8-column fact projection (etl.py:53-70)."""
    clock = clock if clock is not None else F.current_timestamp()
    joined = bronze.join(F.broadcast(dim), join_on, "left")
    change = (
        (F.col(price_col) - F.lit(last_price)) / F.lit(last_price)
        if last_price
        else F.lit(None).cast("double")
    )
    return joined.select(
        F.col("coin_id").cast("int").alias("coin_id"),
        date_id(time_col).alias("date_id"),
        time_id(time_col).alias("time_id"),
        F.col(price_col).alias("price"),
        (F.col(price_col) * F.col("supply")).alias("market_cap"),
        change.alias("change_percent_last_day"),
        F.col("average_1minute"),
        created_at(clock).alias("created_at"),
    )


def start_fact_query(
    bronze_stream: DataFrame,
    dim: DataFrame,
    price_col: str,
    join_on: Column,
    last_price: float,
    out_path: str,
    checkpoint_dir: str,
    watermark: str = "2 minutes",
    trigger: dict | None = None,
    clock: Column | None = None,
):
    """Delta-style partitioned append sink (K1: etl.py:73-78) over
    parquet: partitionBy(coin_id), 2-minute watermark on the re-read
    stream (T2), 1 s processing trigger by default (T5)."""
    fact = enrich_fact(
        bronze_stream.withWatermark("timestamp", watermark),
        dim,
        price_col,
        join_on,
        last_price,
        clock=clock,
    )
    w = (
        fact.coalesce(2)
        .writeStream.format("parquet")
        .outputMode("append")
        .partitionBy("coin_id")
        .option("checkpointLocation", checkpoint_dir)
        .option("path", out_path)
    )
    w = w.trigger(**(trigger or {"processingTime": "1 second"}))
    return w.start()
