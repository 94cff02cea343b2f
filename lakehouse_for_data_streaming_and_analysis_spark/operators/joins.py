"""Join operators (SURVEY.md §2.4).

Scale stance: the enrich/broadcast joins never shuffle the big side;
anti-joins against small targets broadcast; the as-of join (the
idiomatic replacement for the reference's window+collect "last price
of previous day", SURVEY §2.4 note) is a union-window composition that
shuffles each side once on the series key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def broadcast_enrich(
    big: DataFrame, dim: DataFrame, on: Column, how: str = "left"
) -> DataFrame:
    """Stream-static style enrichment: big ⋈ broadcast(dim)
    (reference: streaming_pipeline.py:33 + etl.py:58). Works identically
    for batch DataFrames and streaming ones (stream-static join)."""
    return big.join(F.broadcast(dim), on, how)


def new_rows(src: DataFrame, tgt: DataFrame, on: Sequence[str]) -> DataFrame:
    """Left-anti join: rows of src absent from tgt
    (reference: populate_dim.py:84-88,139-144 — new-coin detection)."""
    return src.join(F.broadcast(tgt.select(*on).distinct()), list(on), "leftanti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_vals: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_time <= left_time (direction='backward') within the same key.

    Composition (no Spark built-in): union both sides tagged, one
    window pass ordered by time carrying last_value(right_vals) forward,
    keep left rows. One shuffle per side on the key — at 100 TB this is
    the minimal-movement plan (a range-join would rescan; a crossjoin
    explodes).
    """
    assert direction == "backward", "only backward as-of implemented"
    l_tagged = left.withColumn("__t", F.col(left_time).cast("timestamp")).withColumn(
        "__is_left", F.lit(1)
    )
    r_tagged = right.select(
        *on,
        F.col(right_time).cast("timestamp").alias("__t"),
        *[F.col(c) for c in right_vals],
    ).withColumn("__is_left", F.lit(0))
    # union pads each side's missing columns with nulls
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    # at equal timestamps, right rows sort first (__is_left asc) so a
    # tick at exactly t sees the right row at t
    w = (
        Window.partitionBy(*on)
        .orderBy("__t", "__is_left")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        *left.columns,
        "__is_left",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in right_vals],
    )
    return filled.filter(F.col("__is_left") == 1).drop("__is_left")


def star_join(
    fact: DataFrame, dims: Sequence[tuple[DataFrame, Column]]
) -> DataFrame:
    """Chain broadcast equi-joins of small dims onto a fact
    (reference: dashboard JSON:329 4-way star)."""
    out = fact
    for dim, cond in dims:
        out = out.join(F.broadcast(dim), cond)
    return out
