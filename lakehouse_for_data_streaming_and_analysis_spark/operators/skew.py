"""Skew and co-location tools for joins at scale (SURVEY.md §4;
100 TB design notes).

The reference never needed these (its dims are tiny and always
broadcast, streaming_pipeline.py:33), but a 100 TB fact-to-fact join
does: a handful of hot keys serialize into a few straggler tasks, and
repeated co-partitioned joins should not re-shuffle every time.

- ``salted_join``: classic key-salting — replicate the (smaller) right
  side N ways, scatter the left side across the N replicas with a
  deterministic per-row salt, join on (key, salt). Turns one
  straggler partition into N even ones. AQE's skew-join splitting
  (enabled in the session factory) handles moderate skew
  automatically; salting is for the pathological keys AQE can't split
  (single-key hash aggregation downstream, stateful streaming joins).
- ``write_bucketed`` / ``bucketed_join_ready``: persist both sides
  bucketed+sorted on the join key so subsequent joins are
  Exchange-free — the batch-layer answer to "reuse a partitioning
  across stages".
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the right side replicated ``n_salts`` ways.

    The left row's salt is derived from ``monotonically_increasing_id``
    (uniform, deterministic within a run, independent of the join key —
    which is exactly what spreads a hot key). Correctness: every left
    row meets every right row of its key exactly once, because the
    right side carries each salt value exactly once per row.
    """
    on = list(on)
    l_salted = left.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    r_salted = right.withColumn(
        "_salt",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long"))
        ),
    )
    return l_salted.join(r_salted, on + ["_salt"], how).drop("_salt")


def top_hot_keys(df: DataFrame, on: Sequence[str], k: int = 10) -> DataFrame:
    """Diagnostic: the k heaviest join keys and their share — decide
    whether AQE suffices or salting/broadcast-isolation is needed."""
    on = list(on)
    total = df.count()
    return (
        df.groupBy(*on)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / F.lit(total), 6))
        .orderBy(F.desc("n_rows"), *on)
        .limit(k)
    )


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    path: str | None = None,
) -> None:
    """Persist bucketed + sorted on the join key. Two tables written
    with the same (cols, n_buckets) join with ZERO Exchange nodes —
    the shuffle is paid once at write time, then amortized over every
    subsequent join/aggregation on that key."""
    cols = list(bucket_cols)
    w = df.write.format("parquet").mode("overwrite")
    if path:
        w = w.option("path", path)
    w.bucketBy(n_buckets, *cols).sortBy(*cols).saveAsTable(table)


def bucketed_join_ready(
    spark: SparkSession, left_table: str, right_table: str, on: Sequence[str]
) -> DataFrame:
    """Join two same-bucketed catalog tables; with bucketing enabled the
    plan must contain no shuffle on either side."""
    return spark.table(left_table).join(spark.table(right_table), list(on))


def two_stage_agg(
    df: DataFrame,
    keys: Sequence[str],
    n_salts: int = 16,
    **named_aggs,
):
    """Skew-safe aggregation for hot grouping keys: group once on
    (keys, salt) — spreading each hot key over ``n_salts`` reducers —
    then combine the partials per key. Only valid for aggregates with
    a partial/final decomposition; supported here: sum, count, min,
    max, avg (combined as sum-of-sums / sum-of-counts).

    ``named_aggs`` maps output column -> (fn, col) with fn in
    {'sum','count','min','max','avg'}. Spark's own partial aggregation
    handles per-partition combining already; this adds a REDUCER-level
    spread for the case where one key's partials overwhelm a single
    reduce task (billions of rows on one key at 100 TB).
    """
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    partial_exprs = []
    final_exprs = []
    for out, (fn, col) in named_aggs.items():
        if fn == "sum":
            partial_exprs.append(F.sum(col).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
            final_exprs.append(F.sum(f"_p_{out}").cast("long").alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(f"_p_{out}"))
            final_exprs.append(F.min(f"_p_{out}").alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(f"_p_{out}"))
            final_exprs.append(F.max(f"_p_{out}").alias(out))
        elif fn == "avg":
            partial_exprs.append(F.sum(col).alias(f"_ps_{out}"))
            partial_exprs.append(F.count(col).alias(f"_pc_{out}"))
            final_exprs.append(
                (F.sum(f"_ps_{out}") / F.sum(f"_pc_{out}")).alias(out)
            )
        else:
            raise ValueError(f"unsupported agg {fn!r}")
    partial = salted.groupBy(*list(keys), "_salt").agg(*partial_exprs)
    return partial.groupBy(*list(keys)).agg(*final_exprs)
