"""Table maintenance on parquet directories (SURVEY.md §2.11 M1-M4).

The reference runs Delta OPTIMIZE / VACUUM / Z-ORDER on its bronze and
fact tables (reference: Sourcecode/spark/delta_manager.py:4-24, invoked
from AutomateTable.py:97-103 and the foreachBatch hook udf.py:74-83).
delta-spark is not on this classpath, so the same three operations are
implemented against plain parquet table directories:

- ``compact``      (M1 OPTIMIZE): bin-pack many small files into
                   ~target-size files. Streaming sinks produce one file
                   per micro-batch; at a 1 s trigger that is 86k
                   files/day — compaction is what keeps scan-task counts
                   sane at scale.
- ``zorder_by``    (M3 Z-ORDER): rewrite clustered on a Z-value
                   (Morton) curve over the key columns so per-file
                   min/max stats become selective on EVERY key, not
                   just the leading sort key — the same data-skipping
                   contract Delta's ZORDER provides.
- ``vacuum``       (M2): delete files superseded more than
                   ``retention_hours`` ago (compaction leaves the old
                   generation in place until vacuumed, mirroring
                   Delta's tombstone window so concurrent readers
                   don't break).

Generations: each rewrite lands in ``gen=<n>/`` under the table dir and
readers take the max generation — a minimal transaction-log stand-in
(single-writer; a real deployment would use Delta/Iceberg commits).
"""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

GEN_PREFIX = "gen="


def _generations(table_dir: str) -> list[int]:
    if not os.path.isdir(table_dir):
        return []
    return sorted(
        int(d[len(GEN_PREFIX) :])
        for d in os.listdir(table_dir)
        if d.startswith(GEN_PREFIX)
    )


def current_dir(table_dir: str) -> str:
    gens = _generations(table_dir)
    if not gens:
        return table_dir  # plain directory, generation 0 implicit
    return os.path.join(table_dir, f"{GEN_PREFIX}{gens[-1]}")


def read_current(spark: SparkSession, table_dir: str) -> DataFrame:
    return spark.read.parquet(current_dir(table_dir))


def _next_gen_dir(table_dir: str) -> str:
    gens = _generations(table_dir)
    return os.path.join(table_dir, f"{GEN_PREFIX}{(gens[-1] + 1) if gens else 1}")


def compact(
    spark: SparkSession,
    table_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> str:
    """M1 OPTIMIZE executeCompaction: rewrite the current generation
    into ceil(bytes/target) files. Returns the new generation dir."""
    src = current_dir(table_dir)
    size = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(src)
        for f in fs
        if f.endswith(".parquet")
    )
    n_files = max(1, -(-size // target_file_bytes))
    out = _next_gen_dir(table_dir)
    spark.read.parquet(src).coalesce(n_files).write.mode("overwrite").parquet(out)
    return out


def interleave_bits(cols: list[Column], bits: int = 16) -> Column:
    """Morton/Z-value: interleave the low ``bits`` of each (non-negative
    integral) column — pure expressions, whole-stage codegen'd."""
    z = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def rank_normalize(df: DataFrame, col: str, bits: int = 16) -> Column:
    """Map an arbitrary (skewed / non-integral) column to dense
    [0, 2^bits) ranks via ntile — the standard pre-step so interleaving
    treats every column uniformly."""
    from pyspark.sql import Window

    # bounded-grain: ranks the rows of ONE maintenance batch (the files
    # selected for a single OPTIMIZE/Z-ORDER pass), not the table
    return (F.ntile(2**bits).over(Window.orderBy(col)) - 1).cast("long")


def zorder_by(
    spark: SparkSession,
    table_dir: str,
    zcols: list[str],
    n_files: int = 8,
    bits: int = 8,
) -> str:
    """M3 Z-ORDER BY: rewrite range-partitioned + sorted on the Morton
    curve of ``zcols``. repartitionByRange gives non-overlapping
    z-ranges per file => parquet min/max on each zcol stays narrow =>
    row-group skipping works for predicates on any of the columns."""
    src = current_dir(table_dir)
    df = spark.read.parquet(src)
    # locality-preserving normalization to [0, 2^bits): min/max scaling
    # for numerics (one cheap agg over footer-friendly columns);
    # hashing for strings (no meaningful locality to preserve)
    dtypes = dict(df.dtypes)
    numeric = [c for c in zcols if dtypes[c] != "string"]
    bounds = (
        df.agg(
            *[f(c).alias(f"{n}_{c}") for c in numeric for n, f in (("mn", F.min), ("mx", F.max))]
        ).first()
        if numeric
        else None
    )
    normed = []
    for c in zcols:
        if dtypes[c] == "string":
            normed.append(F.pmod(F.xxhash64(c), F.lit(2**bits)))
        else:
            lo, hi = bounds[f"mn_{c}"], bounds[f"mx_{c}"]
            span = float(hi - lo) or 1.0
            normed.append(
                F.least(
                    F.lit(2**bits - 1),
                    F.floor((F.col(c) - F.lit(lo)) / F.lit(span) * (2**bits - 1)),
                ).cast("long")
            )
    out = _next_gen_dir(table_dir)
    (
        df.withColumn("_z", interleave_bits(normed, bits))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(out)
    )
    return out


def vacuum(table_dir: str, retention_hours: float = 24.0) -> list[str]:
    """M2 VACUUM: drop superseded generations older than the retention
    window (never the current one). Returns removed dirs."""
    gens = _generations(table_dir)
    removed = []
    cutoff = time.time() - retention_hours * 3600
    for g in gens[:-1]:
        d = os.path.join(table_dir, f"{GEN_PREFIX}{g}")
        if os.path.getmtime(d) < cutoff:
            shutil.rmtree(d)
            removed.append(d)
    return removed


def file_stats(spark: SparkSession, table_dir: str, cols: list[str]) -> DataFrame:
    """Per-file min/max of ``cols`` (the stats Z-ORDER tightens) — the
    parquet analogue of Delta's per-file stats in _delta_log."""
    df = spark.read.parquet(current_dir(table_dir))
    aggs = [f(c).alias(f"{n}_{c}") for c in cols for n, f in (("min", F.min), ("max", F.max))]
    return (
        df.withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(*aggs, F.count(F.lit(1)).alias("n_rows"))
    )


def history(spark: SparkSession, table_dir: str) -> DataFrame:
    """DESCRIBE HISTORY analogue over the generation layout: one row
    per generation with file count, bytes, and mtime — the audit
    surface Delta exposes from its log (reference reads it for latency
    analytics, TimeDelay.ipynb cell 0)."""
    import datetime

    rows = []
    gens = _generations(table_dir) or [0]
    for g in gens:
        d = (
            os.path.join(table_dir, f"{GEN_PREFIX}{g}")
            if _generations(table_dir)
            else table_dir
        )
        files = [
            os.path.join(r, f)
            for r, _, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        ]
        rows.append(
            (
                g,
                len(files),
                sum(os.path.getsize(f) for f in files),
                datetime.datetime.fromtimestamp(
                    os.path.getmtime(d), tz=datetime.timezone.utc
                ),
                g == gens[-1],
            )
        )
    return spark.createDataFrame(
        rows, "generation int, n_files int, bytes long, modified timestamp, is_current boolean"
    )
