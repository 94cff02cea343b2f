"""Advanced analytics breadth: per-group linear regression, time-range
window frames, fixed-bucket histograms, gap-filling (date spine +
forward fill), INTERSECT, scalar-subquery rewrites, blocked fuzzy
matching, per-dimension vector profiles, value-window suites, and
boolean/conditional aggregates.

All queries here are DuckDB-oracle-backed. Shared determinism rules:

- Monetary sums go through DECIMAL(18,2) before the double conversion
  (exact, order-insensitive).
- Epoch seconds are floored to whole BIGINT seconds on both engines
  (Spark `unix_timestamp` floors; the oracle uses FLOOR(epoch(ts))).
- Float aggregates (avg/stddev/regression moments) are ROUND()ed on
  both sides; bucket arithmetic uses identical IEEE double expressions
  so bucket assignment matches bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@q(
    "regr_value_trend",
    """SELECT event_type,
              regr_count(value, xs) AS n,
              ROUND(regr_slope(value, xs) * 86400, 6) AS slope_per_day,
              ROUND(regr_intercept(value, xs), 2) AS intercept,
              ROUND(regr_r2(value, xs), 6) AS r2
       FROM (SELECT event_type, value,
                    CAST(FLOOR(epoch(ts)) AS BIGINT) AS xs
             FROM events)
       GROUP BY 1""",
)
def regr_value_trend(spark, sf_dir):
    """Per-group ordinary-least-squares trend line entirely in JVM
    aggregates (regr_slope/intercept/r2) — the distributed replacement
    for a driver-side sklearn fit. Single shuffle on the group key;
    slope reported per-day so the rounding scale is meaningful."""
    ev = load_table(spark, sf_dir, "events")
    xs = F.unix_timestamp("ts").alias("xs")
    base = ev.select("event_type", "value", xs)
    return base.groupBy("event_type").agg(
        F.regr_count("value", "xs").alias("n"),
        F.round(F.regr_slope("value", "xs") * 86400, 6).alias("slope_per_day"),
        F.round(F.regr_intercept("value", "xs"), 2).alias("intercept"),
        F.round(F.regr_r2("value", "xs"), 6).alias("r2"),
    )


@q(
    "time_range_rolling_avg",
    """SELECT event_id,
              event_type,
              ROUND(avg(value) OVER w, 4) AS roll_avg,
              COUNT(*) OVER w AS roll_n
       FROM events
       WINDOW w AS (PARTITION BY event_type
                    ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
                    RANGE BETWEEN 600 PRECEDING AND CURRENT ROW)""",
)
def time_range_rolling_avg(spark, sf_dir):
    """Trailing 10-minute average per event type using a RANGE frame
    keyed on event-time seconds — unlike a ROWS frame this is
    data-density independent (the frame is a time interval, not a row
    count), and peer rows at the same timestamp share one frame, so
    the result is deterministic under shuffle reordering."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-600, 0)
    )
    return ev.select(
        "event_id",
        "event_type",
        F.round(F.avg("value").over(w), 4).alias("roll_avg"),
        F.count(F.lit(1)).over(w).alias("roll_n"),
    )


@q(
    "histogram_fixed_buckets",
    """WITH b AS (SELECT min(value) AS lo, max(value) AS hi FROM events)
       SELECT bucket,
              ROUND(lo + bucket * (hi - lo) / 20, 4) AS bucket_lo,
              n
       FROM (SELECT LEAST(CAST(FLOOR((value - lo) / ((hi - lo) / 20)) AS BIGINT),
                          19) AS bucket,
                    lo, hi, COUNT(*) AS n
             FROM events, b GROUP BY 1, 2, 3)""",
)
def histogram_fixed_buckets(spark, sf_dir):
    """Equi-width 20-bucket histogram as two passes: a 1-row bounds
    aggregate broadcast back over the scan, then a groupBy on the
    computed bucket. Bucket arithmetic is the identical IEEE double
    expression on both engines so assignment matches exactly; the max
    value clamps into the last bucket."""
    ev = load_table(spark, sf_dir, "events")
    b = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    j = ev.crossJoin(F.broadcast(b))
    bucket = F.least(
        F.floor((F.col("value") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 20)),
        F.lit(19),
    ).alias("bucket")
    return (
        j.groupBy(bucket, "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            F.round(
                F.col("lo") + F.col("bucket") * (F.col("hi") - F.col("lo")) / 20, 4
            ).alias("bucket_lo"),
            "n",
        )
    )


@q(
    "gap_fill_forward_daily",
    """WITH f AS (SELECT * FROM events WHERE value > 250),
       daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
                        ROUND(arg_max(value, event_id), 4) AS v
                 FROM f GROUP BY 1, 2),
       b AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
       spine AS (SELECT t.event_type, s.d
                 FROM (SELECT DISTINCT event_type FROM daily) t,
                      (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS d
                       FROM b) s),
       j AS (SELECT spine.event_type, spine.d, daily.v
             FROM spine LEFT JOIN daily
               ON spine.event_type = daily.event_type AND spine.d = daily.d)
       SELECT event_type, d,
              last_value(v IGNORE NULLS)
                OVER (PARTITION BY event_type ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
              (v IS NULL) AS is_gap
       FROM j""",
)
def gap_fill_forward_daily(spark, sf_dir):
    """Gap-filled daily series: a generated date spine cross-joined
    with the observed group keys, left-joined to the sparse daily
    aggregate, then forward-filled with last(ignorenulls) over an
    unbounded-preceding frame. The spine is built from explode(
    sequence(...)) — rows are generated distributed, never on the
    driver. Daily value keyed on the unique event_id (max_by) so the
    pre-fill aggregate is tie-free."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("value") > 250)
        .groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.round(F.max_by("value", "event_id"), 4).alias("v"))
    )
    bounds = daily.agg(F.min("d").alias("lo"), F.max("d").alias("hi"))
    spine = (
        daily.select("event_type")
        .distinct()
        .crossJoin(
            F.broadcast(bounds).select(
                F.explode(F.sequence("lo", "hi")).alias("d")
            )
        )
    )
    j = spine.join(daily, ["event_type", "d"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "event_type",
        "d",
        F.last("v", ignorenulls=True).over(w).alias("filled"),
        F.col("v").isNull().alias("is_gap"),
    )


@q(
    "intersect_repeat_customers",
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
       INTERSECT
       SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996""",
)
def intersect_repeat_customers(spark, sf_dir):
    """Customers active in both 1995 and 1996 via INTERSECT (distinct
    set semantics). Catalyst plans this as a left-semi aggregate —
    one shuffle per side on the key, no row explosion."""
    o = load_table(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = o.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    return y95.intersect(y96)


@q(
    "customers_above_nation_avg",
    """WITH na AS (SELECT c_nationkey,
                          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                            / COUNT(*) AS nat_avg
                   FROM customer GROUP BY 1)
       SELECT c_custkey, c.c_nationkey, c_acctbal, nat_avg
       FROM customer c JOIN na ON c.c_nationkey = na.c_nationkey
       WHERE c_acctbal > nat_avg""",
)
def customers_above_nation_avg(spark, sf_dir):
    """Scalar correlated subquery ("above my group's average")
    decorrelated into a tiny per-nation aggregate broadcast back to
    the fact side — one scan-side shuffle total instead of a
    per-row subquery. The comparison average is computed from an
    exact DECIMAL sum so the > boundary is order-insensitive; it is
    emitted UNROUNDED because the double is bit-identical on both
    engines while ROUND() tie-breaking (half-up vs half-away) is
    not."""
    c = load_table(spark, sf_dir, "customer")
    na = c.groupBy("c_nationkey").agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("nat_avg")
    )
    return (
        c.join(F.broadcast(na), "c_nationkey")
        .filter(F.col("c_acctbal") > F.col("nat_avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal", "nat_avg")
    )


@q(
    "fuzzy_part_pairs",
    """SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
              levenshtein(a.p_name, b.p_name) AS dist
       FROM part a JOIN part b
         ON a.p_brand = b.p_brand AND a.p_size = b.p_size
        AND a.p_partkey < b.p_partkey
       WHERE levenshtein(a.p_name, b.p_name) <= 12""",
)
def fuzzy_part_pairs(spark, sf_dir):
    """Blocked fuzzy matching: candidate pairs restricted to the same
    (brand, size) block via an equi shuffle join, then the quadratic
    levenshtein only inside each small block — the standard
    record-linkage shape that keeps edit-distance dedup from going
    O(n^2) over the whole table."""
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size", "p_name"
    )
    a = p.alias("a")
    b = p.alias("b")
    dist = F.levenshtein(F.col("a.p_name"), F.col("b.p_name"))
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_size") == F.col("b.p_size"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .filter(dist <= 12)
        .select(
            F.col("a.p_partkey").alias("part_a"),
            F.col("b.p_partkey").alias("part_b"),
            dist.alias("dist"),
        )
    )


@q(
    "vector_dim_profile",
    """SELECT dim, COUNT(*) AS n,
              ROUND(avg(val), 4) AS mean,
              ROUND(stddev_samp(val), 4) AS sd,
              ROUND(min(val), 4) AS vmin,
              ROUND(max(val), 4) AS vmax
       FROM (SELECT generate_subscripts(embedding, 1) AS dim,
                    unnest(embedding) AS val
             FROM embeddings)
       GROUP BY 1""",
)
def vector_dim_profile(spark, sf_dir):
    """Per-dimension distribution profile of the embedding space
    (feature-drift monitoring): posexplode to (dim, value) rows, one
    groupBy on the 64 dimension keys. At scale the explode is
    map-side only and the shuffle carries 64 partial-agg rows per
    task, not the exploded data."""
    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(F.posexplode("embedding").alias("pos", "val"))
    return (
        flat.groupBy((F.col("pos") + 1).alias("dim"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("val"), 4).alias("mean"),
            F.round(F.stddev_samp("val"), 4).alias("sd"),
            F.round(F.min("val"), 4).alias("vmin"),
            F.round(F.max("val"), 4).alias("vmax"),
        )
    )


@q(
    "order_value_window_suite",
    """SELECT o_custkey, o_orderkey,
              first_value(o_totalprice) OVER w AS first_price,
              last_value(o_totalprice) OVER w AS last_price,
              nth_value(o_totalprice, 2) OVER w AS second_price
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND UNBOUNDED FOLLOWING)""",
)
def order_value_window_suite(spark, sf_dir):
    """first/last/nth value navigation over an explicit full-partition
    frame — the frame is stated (not the default to-current-row) so
    last_value means the partition's last row, and the order key is
    the unique o_orderkey so every navigation target is tie-free."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@q(
    "nation_balance_flags",
    """SELECT c_nationkey,
              COUNT(*) AS n,
              count_if(c_acctbal < 0) AS n_neg,
              bool_and(c_acctbal > -1000) AS all_above_floor,
              bool_or(c_acctbal < 0) AS any_neg,
              ROUND(median(c_acctbal), 4) AS med
       FROM customer GROUP BY 1""",
)
def nation_balance_flags(spark, sf_dir):
    """Conditional and boolean aggregates (count_if / bool_and /
    bool_or) plus exact interpolated median, one JVM pass per
    nation."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(F.col("c_acctbal") < 0).alias("n_neg"),
        F.bool_and(F.col("c_acctbal") > -1000).alias("all_above_floor"),
        F.bool_or(F.col("c_acctbal") < 0).alias("any_neg"),
        F.round(F.median("c_acctbal"), 4).alias("med"),
    )
