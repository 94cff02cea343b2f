"""Window-function operators (SURVEY.md §2.6).

The reference's two window idioms, rebuilt scale-safe:
  - last_per_group: row_number over partition+desc order
    (reference: udf.py:27-46 'last tick of previous day')
  - surrogate_keys: dense consecutive IDs. The reference uses
    row_number over a GLOBAL Window.orderBy (populate_dim.py:91-94) —
    a single-partition plan. Fine for 1e4-row dims; for large tables
    use surrogate_keys_distributed (partition-counted offsets, no
    global sort collapse).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def last_per_group(
    df: DataFrame,
    partition: Sequence,
    order_desc: Sequence[str],
    rn_col: str = "__rn",
) -> DataFrame:
    """Keep the first row per partition under desc order (W1)."""
    w = Window.partitionBy(*partition).orderBy(*[F.desc(c) for c in order_desc])
    return (
        df.withColumn(rn_col, F.row_number().over(w))
        .filter(F.col(rn_col) == 1)
        .drop(rn_col)
    )


def surrogate_keys(
    df: DataFrame, order_by: Sequence[str], key_col: str = "surrogate_key", offset: int = 0
) -> DataFrame:
    """Dense consecutive IDs by global order (reference semantics,
    populate_dim.py:91-94,150). Single-partition window — use only for
    dim-sized inputs; tests pin determinism via unique order keys."""
    # bounded-grain: caller contract is dim-sized input (SCD dims, few k
    # rows); unbounded inputs use surrogate_keys_distributed below
    w = Window.orderBy(*order_by)
    return df.withColumn(key_col, (F.row_number().over(w) + offset).cast("long"))


def surrogate_keys_distributed(
    df: DataFrame, order_by: Sequence[str], key_col: str = "surrogate_key", offset: int = 0
) -> DataFrame:
    """Scale-safe dense IDs: sort-partition by the key range, count rows
    per partition, prefix-sum the counts on the driver (tiny), then
    assign id = partition_offset + local row_number. Same output as
    ``surrogate_keys`` for unique order keys, but no single-partition
    collapse: the wide sort is a range exchange, offsets are O(#parts).
    """
    ordered = df.repartitionByRange(*order_by).sortWithinPartitions(*order_by)
    # spark_partition_id is stable after repartitionByRange+sort
    with_pid = ordered.withColumn("__pid", F.spark_partition_id())
    counts = {
        r["__pid"]: r["cnt"]
        for r in with_pid.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets = {}
    acc = offset
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    omap = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("__pid").orderBy(*order_by)
    return (
        with_pid.withColumn(
            key_col, (F.row_number().over(w) + omap[F.col("__pid")]).cast("long")
        )
        .drop("__pid")
    )
