"""Bronze layer: tick stream -> 1-minute windowed aggregate
(SURVEY.md §2.5 A1, §2.10 T1/T3/T4).

Reference semantics (etl.py:30-48): 1-minute tumbling window with a
1-minute watermark, agg = avg(price), last(price), last(timestamp),
written in *update* mode — so bronze holds one row per window per
refinement (duplicates per window are part of the spec, SURVEY §7.3).
``last()`` here is made deterministic as max_by over an arrival id.

Scale: windowed agg state is keyed by window (+ coin) in the state
store; watermark bounds state size. Partial aggregation happens
map-side before the keyed shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_tick_agg(
    ticks: DataFrame,
    price_col: str,
    time_col: str = "timestamp",
    window_len: str = "1 minute",
    watermark: str = "1 minute",
    order_col: str | None = None,
) -> DataFrame:
    """watermark -> tumbling window -> avg/last/last (etl.py:34-41).

    ``order_col`` (e.g. an event id) makes `last` deterministic via
    max_by; None reproduces the reference's arrival-order `last`.
    """
    last_price: Column
    last_ts: Column
    if order_col is not None:
        last_price = F.max_by(price_col, order_col)
        last_ts = F.max_by(time_col, order_col)
    else:
        last_price = F.last(price_col)
        last_ts = F.last(time_col)
    return (
        ticks.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window_len).alias("win"))
        .agg(
            F.avg(price_col).alias(f"avg_{price_col}"),
            last_price.alias(price_col),
            last_ts.alias(time_col),
        )
        .select(
            price_col,
            time_col,
            F.col(f"avg_{price_col}").alias("average_1minute"),
        )
    )


def start_bronze_query(
    ticks: DataFrame,
    price_col: str,
    sink_fn,
    checkpoint_dir: str,
    output_mode: str = "update",
    order_col: str | None = None,
    trigger: dict | None = None,
):
    """writeStream.outputMode(update).foreachBatch(sink) (etl.py:43-46,
    K2). ``trigger`` e.g. {'availableNow': True} for deterministic
    drain-the-source runs, {'processingTime': '1 second'} for live."""
    agg = windowed_tick_agg(ticks, price_col, order_col=order_col)
    w = (
        agg.writeStream.outputMode(output_mode)
        .foreachBatch(sink_fn)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger:
        w = w.trigger(**trigger)
    return w.start()
