"""Query streaming state stores as DataFrames (Spark 4 state reader).

The reference treats streaming state as opaque; Spark 4 exposes every
checkpoint's state store as a readable data source, which turns state
debugging ("why is this window still open?", "how big is the dedup
set?") into plain SQL. This module wraps the two built-in formats:

* ``state_store(spark, ckpt)`` — the key/value rows of one operator's
  store, optionally AT a historical batch (state time travel) or for a
  specific store/join side.
* ``state_metadata(spark, ckpt)`` — the operator directory: which
  stateful operators exist, their store names, partition counts, and
  the batch range still replayable from this checkpoint.
* ``state_summary(spark, ckpt)`` — one-line-per-operator health
  rollup (keys, partitions with state, batch span) for dashboards.

Reads are batch scans of checkpoint files — safe to run against a
LIVE query's checkpoint (snapshot semantics; no locks touched).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_store(
    spark: SparkSession,
    checkpoint: str,
    batch_id: int | None = None,
    operator_id: int = 0,
    store_name: str | None = None,
    join_side: str | None = None,
) -> DataFrame:
    """Key/value state rows of one operator's store.

    ``batch_id`` time-travels to the state AS OF that micro-batch
    (default: latest committed); ``store_name``/``join_side`` select
    among a stream-stream join's four stores ("left"/"right")."""
    r = spark.read.format("statestore").option("operatorId", operator_id)
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    if store_name is not None:
        r = r.option("storeName", store_name)
    if join_side is not None:
        r = r.option("joinSide", join_side)
    return r.load(checkpoint)


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator directory of a checkpoint: operator ids/names, store
    names, partition counts, replayable batch range."""
    return spark.read.format("state-metadata").load(checkpoint)


def state_summary(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Per-operator health rollup: total keys, partitions holding
    state, and the replayable batch span."""
    md = state_metadata(spark, checkpoint).collect()
    parts = []
    for op in md:
        try:
            rows = state_store(
                spark,
                checkpoint,
                operator_id=op.operatorId,
                store_name=None
                if op.stateStoreName == "default"
                else op.stateStoreName,
            )
            rows.schema  # force analysis so failures surface here
        except Exception:
            # operators whose stores need extra selectors (e.g. a
            # stream-stream join's four per-side stores want joinSide)
            # still get a directory row; inspect them directly with
            # state_store(..., store_name=..., join_side=...)
            empty = spark.createDataFrame(
                [(-1, -1)], "n_keys long, partitions_with_state long"
            )
            parts.append(
                empty.select(
                    F.lit(op.operatorId).alias("operator_id"),
                    F.lit(op.operatorName).alias("operator_name"),
                    "n_keys",
                    "partitions_with_state",
                    F.lit(int(op.minBatchId)).alias("min_batch_id"),
                    F.lit(int(op.maxBatchId)).alias("max_batch_id"),
                )
            )
            continue
        agg = rows.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.countDistinct("partition_id").alias("partitions_with_state"),
        )
        parts.append(
            agg.select(
                F.lit(op.operatorId).alias("operator_id"),
                F.lit(op.operatorName).alias("operator_name"),
                "n_keys",
                "partitions_with_state",
                F.lit(int(op.minBatchId)).alias("min_batch_id"),
                F.lit(int(op.maxBatchId)).alias("max_batch_id"),
            )
        )
    if not parts:
        # a stateless query's checkpoint has no operator rows; an
        # empty summary beats an IndexError
        return spark.createDataFrame(
            [],
            "operator_id long, operator_name string, n_keys long, "
            "partitions_with_state long, min_batch_id long, "
            "max_batch_id long",
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
