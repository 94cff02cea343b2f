"""Unified exact/approx summary operators (VERDICT r7 ask #6).

The registry grew parallel query families — exact quantiles
(``exact_quantiles_by_type``) beside DDSketch estimates
(``ddsketch_quantiles_gate``), exact COUNT(DISTINCT) beside HLL
(``sketch_cardinalities``), exact top-k beside count-min
(``countmin_heavy_hitters_gate``). This module exposes ONE operator
per statistic with an ``exact=`` switch and an IDENTICAL output
schema in both modes, so the 100 TB path is a one-line swap:

* ``quantiles(df, keys, col, qs, exact=)`` — exact interpolated
  percentile vs DDSketch (relative-error α=1 %; bucket-count state,
  mergeable by additive union);
* ``distinct_count(df, keys, col, exact=)`` — COUNT(DISTINCT) vs
  HyperLogLog (m=256 registers; ``hll_state``/``hll_merge``/
  ``hll_estimate`` expose the mergeable register table for
  sketch-per-day-then-union topologies);
* ``heavy_hitters(df, key, k, exact=)`` — exact groupBy top-k vs a
  count-min estimate (d=3, w=1024 cells, mergeable by cell-wise
  addition) probed over a candidate set.

Why sketches at all, when groupBy already map-side-combines: the
sketch state is CONSTANT-SIZE PER GROUP (256 registers / 3×1024
cells / O(log_γ range) buckets) regardless of key cardinality, and it
MERGES — per-day or per-partition summaries union into the global
answer without re-touching the data. At 100 TB with billions of
distinct users, the exact paths shuffle the key universe; the sketch
paths shuffle kilobytes per group.

Accuracy is GATED, not assumed: ``tests/test_sketch_unification.py``
runs every sketch against its exact twin at the bench fixture and
enforces the published error bound (DDSketch ≤ 2α relative, CM
never-undercount and ≤ 3N/w overcount, HLL ≤ 3·1.04/√m relative).

The hash/bucket algebra matches ``queries/sketches.py`` /
``queries/datapipe.py`` (md5-derived, engine-portable, DuckDB-
reproducible) rather than private JVM hashing, so oracle SQL can
reproduce estimates bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------- DDSketch

GAMMA = 101.0 / 99.0  # relative accuracy alpha = 1%
ALPHA = (GAMMA - 1) / (GAMMA + 1)


def dd_bucket(col):
    """DDSketch bucket index ceil(log_gamma(x)), x > 0."""
    return F.ceil(F.log(col) / F.log(F.lit(GAMMA))).cast("long")


def dd_estimate(bucket_col):
    """Geometric bucket midpoint 2·γ^i/(γ+1) — the value whose
    relative distance to anything in the bucket is ≤ α."""
    g = F.lit(GAMMA)
    return F.lit(2.0) * F.pow(g, bucket_col) / (g + F.lit(1.0))


def dd_state(df: DataFrame, key_cols: Sequence[str], value_col: str) -> DataFrame:
    """Mergeable DDSketch state: (keys, bucket, count). Sketches from
    disjoint slices merge by summing counts per (keys, bucket)."""
    return (
        df.filter(F.col(value_col) > 0)
        .withColumn("bucket", dd_bucket(F.col(value_col)))
        .groupBy(*key_cols, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("bucket_count"))
    )


def dd_merge(*states: DataFrame) -> DataFrame:
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("bucket_count",)]
    return out.groupBy(*keys).agg(
        F.sum("bucket_count").cast("long").alias("bucket_count")
    )


def quantiles(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    qs: Sequence[float],
    exact: bool = False,
) -> DataFrame:
    """Per-key quantiles of ``value_col`` (> 0) at each q in ``qs``.
    Output schema (both modes): *key_cols, q double, value double.

    Both modes use RANK (``percentile_disc``) semantics — the value at
    rank ⌈q·n⌉ — because that is the quantity DDSketch's published
    guarantee bounds (within α of the item AT the rank); interpolated
    (``percentile_cont``) answers differ from ANY sketch by the local
    order-statistic gap in sparse tails, which no sketch parameter
    controls. ``exact=True``: a full per-group sort, the small-data
    scaffold. ``exact=False``: DDSketch — one groupBy onto O(log_γ
    range) buckets, rank lookup via a cumulative window."""
    keys = list(key_cols)
    pos = df.filter(F.col(value_col) > 0)
    if exact:
        out = None
        for q in qs:
            p = pos.groupBy(*keys).agg(
                F.expr(
                    f"percentile_disc({q!r}) WITHIN GROUP (ORDER BY {value_col})"
                ).alias("value")
            ).select(*keys, F.lit(float(q)).alias("q"), "value")
            out = p if out is None else out.unionByName(p)
        return out
    sk = dd_state(pos, keys, value_col)
    wcum = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sk = sk.withColumn("cum", F.sum("bucket_count").over(wcum)).withColumn(
        "n", F.sum("bucket_count").over(Window.partitionBy(*keys))
    )
    out = None
    for q in qs:
        r = F.ceil(F.lit(float(q)) * F.col("n")).cast("long")
        p = (
            sk.filter(F.col("cum") >= r)
            .groupBy(*keys)
            .agg(F.min("bucket").alias("pb"))
            .select(
                *keys,
                F.lit(float(q)).alias("q"),
                dd_estimate(F.col("pb")).alias("value"),
            )
        )
        out = p if out is None else out.unionByName(p)
    return out


# ------------------------------------------------------- HyperLogLog

HLL_M = 256  # registers; standard error 1.04/sqrt(m) ~ 6.5%
_HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
_HLL_NUMER = _HLL_ALPHA * float(HLL_M * HLL_M) * float(2**53)


def _hll_rank(col):
    """Position of the first 1-bit in a 52-bit md5-derived suffix,
    computed from the hex string so any engine reproduces it."""
    sig = F.expr(
        f"trim(LEADING '0' FROM substring(md5(cast({col} as string)), 3, 13))"
    )
    d1 = F.substring(sig, 1, 1)
    return F.when(F.length(sig) == 0, F.lit(53)).otherwise(
        4 * (13 - F.length(sig))
        + F.when(d1 == "1", 3)
        .when(d1.isin("2", "3"), 2)
        .when(d1.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
        + 1
    )


def hll_state(
    df: DataFrame, key_cols: Sequence[str], value_col: str
) -> DataFrame:
    """Mergeable HLL state: (keys, register, max_rank) — ≤ m rows per
    group no matter how many distinct values the group holds."""
    bucket = (
        F.conv(F.substring(F.md5(F.col(value_col).cast("string")), 1, 2), 16, 10)
        .cast("int")
        .alias("register")
    )
    return (
        df.select(*key_cols, bucket, _hll_rank(value_col).alias("rank"))
        .groupBy(*key_cols, "register")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_merge(*states: DataFrame) -> DataFrame:
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    keys = [c for c in out.columns if c not in ("max_rank",)]
    return out.groupBy(*keys).agg(F.max("max_rank").alias("max_rank"))


def hll_estimate(state: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Cardinality estimate from a register table, with HLL's
    small-range linear-counting branch. Output: *key_cols,
    est_distinct double."""
    keys = list(key_cols)
    a = state.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("int").alias("n_hit"),
        F.sum(F.expr("shiftleft(1L, 53 - max_rank)")).alias("s_hit"),
    )
    raw = F.lit(_HLL_NUMER) / (
        F.col("s_hit")
        + (F.lit(HLL_M) - F.col("n_hit")).cast("long") * F.lit(2**53)
    ).cast("double")
    lin = F.lit(float(HLL_M)) * F.log(
        F.lit(float(HLL_M)) / (F.lit(HLL_M) - F.col("n_hit")).cast("double")
    )
    return a.select(
        *keys,
        F.round(
            F.when(
                (raw <= F.lit(2.5 * HLL_M)) & (F.col("n_hit") < HLL_M), lin
            ).otherwise(raw),
            2,
        ).alias("est_distinct"),
    )


def distinct_count(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    exact: bool = False,
) -> DataFrame:
    """Per-key distinct count of ``value_col``. Output schema (both
    modes): *key_cols, est_distinct double.

    ``exact=True`` shuffles the distinct key universe; ``exact=False``
    shuffles ≤ m=256 registers per group and merges across slices."""
    keys = list(key_cols)
    if exact:
        return df.groupBy(*keys).agg(
            F.countDistinct(value_col).cast("double").alias("est_distinct")
        )
    return hll_estimate(hll_state(df, keys, value_col), keys)


# --------------------------------------------------------- count-min

CM_D = 3
CM_W = 1024


def _cm_bucket(i_col, key_col):
    return F.pmod(
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        i_col.cast("string"),
                        F.lit(":"),
                        key_col.cast("string"),
                    )
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("int"),
        F.lit(CM_W),
    )


def cm_state(df: DataFrame, key_col: str) -> DataFrame:
    """Mergeable count-min state: (i, bucket, c) — exactly d×w cells
    regardless of key cardinality; merge = cell-wise addition."""
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(CM_D)])
    ).alias("i")
    return (
        df.select(F.col(key_col), rows)
        .select("i", _cm_bucket(F.col("i"), F.col(key_col)).alias("bucket"))
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def cm_merge(*states: DataFrame) -> DataFrame:
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy("i", "bucket").agg(F.sum("c").cast("long").alias("c"))


def cm_estimate(
    state: DataFrame, candidates: DataFrame, key_col: str
) -> DataFrame:
    """min-over-rows estimate for each candidate key. ``state`` is
    tiny (d×w cells) and broadcasts; candidates never shuffle."""
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(CM_D)])
    ).alias("i")
    probes = candidates.select(F.col(key_col), rows).select(
        key_col, "i", _cm_bucket(F.col("i"), F.col(key_col)).alias("bucket")
    )
    return (
        probes.join(F.broadcast(state), ["i", "bucket"])
        .groupBy(key_col)
        .agg(F.min("c").alias("est_count"))
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    exact: bool = False,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Top-k keys by frequency. Output schema (both modes): key_col,
    est_count long.

    ``exact=True``: groupBy count + top-k — already map-side-combined,
    but the reduced table is O(distinct keys). ``exact=False``: a
    d×w count-min table estimates any candidate's frequency without
    holding per-key state; ``candidates`` defaults to the union of
    each input partition's local top-4k keys (the Misra-Gries-style
    pre-pass: any key with global frequency above n/(k+1) is a local
    heavy hitter in at least one partition w.h.p., so the true top-k
    survive the prune while the candidate set stays O(partitions·k)
    instead of O(distinct keys)). Pass an explicit candidate frame to
    replace the heuristic."""
    if exact:
        return (
            df.groupBy(key_col)
            .agg(F.count(F.lit(1)).cast("long").alias("est_count"))
            .orderBy(F.desc("est_count"), key_col)
            .limit(k)
        )
    if candidates is None:
        local = df.groupBy(
            F.spark_partition_id().alias("__p"), F.col(key_col)
        ).agg(F.count(F.lit(1)).alias("__c"))
        w = Window.partitionBy("__p").orderBy(
            F.desc("__c"), F.col(key_col)
        )
        candidates = (
            local.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= 4 * k)
            .select(key_col)
            .distinct()
        )
    est = cm_estimate(cm_state(df, key_col), candidates, key_col)
    return est.orderBy(F.desc("est_count"), key_col).limit(k)
