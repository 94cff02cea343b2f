"""Oracle matches + semantic invariants for the product-analytics
queries (queries/product.py): funnel, retention, MAD, chi-square."""

from __future__ import annotations

import pytest

from lakehouse_for_data_streaming_and_analysis_spark.queries import product

from .conftest import SF_DIR
from .util import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(product.ORACLES))
def test_product_oracle(spark, duck, name):
    assert_matches_oracle(
        product.QUERIES[name](spark, SF_DIR), duck, product.ORACLES[name]
    )


def test_funnel_monotone(spark):
    """Each funnel step can only lose users, and conversion time is
    positive when anyone converts."""
    r = product.funnel_view_click_purchase(spark, SF_DIR).collect()[0]
    assert r["n_view"] >= r["n_click"] >= r["n_purchase"] >= 0
    if r["n_purchase"] > 0:
        assert r["avg_seconds_to_convert"] > 0


def test_funnel_order_matters(spark):
    """A synthetic user whose purchase precedes the first view must
    not count as converted; one with the right order must."""
    rows = [
        # user 1: purchase BEFORE view -> views but never converts
        (1, "2024-01-01 00:00:01", "purchase"),
        (1, "2024-01-01 00:00:02", "view"),
        (1, "2024-01-01 00:00:03", "click"),
        # user 2: view -> click -> purchase, strictly increasing
        (2, "2024-01-01 00:00:01", "view"),
        (2, "2024-01-01 00:00:02", "click"),
        (2, "2024-01-01 00:00:03", "purchase"),
        # user 3: click at the SAME second as view -> strict 'after'
        # fails, no click credit
        (3, "2024-01-01 00:00:01", "view"),
        (3, "2024-01-01 00:00:01", "click"),
    ]
    import os
    import tempfile

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, ts, u, t) for i, (u, ts, t) in enumerate(rows)],
        ["event_id", "ts_s", "user_id", "event_type"],
    ).select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
        F.lit(1.0).alias("value"),
        F.lit("{}").alias("props"),
    )
    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.parquet(os.path.join(d, "events.parquet"))
        r = product.funnel_view_click_purchase(spark, d).collect()[0]
    assert r["n_view"] == 3  # users 1, 2, 3 all viewed eventually
    assert r["n_click"] == 2  # users 1 and 2 (user 3's click is same-second)
    assert r["n_purchase"] == 1  # only user 2 in order


def test_retention_triangle_shape(spark):
    """Offset-0 cell contains every cohort member; later offsets can
    only shrink relative to cohort size."""
    rows = product.retention_cohorts(spark, SF_DIR).collect()
    by_cohort = {}
    for r in rows:
        by_cohort.setdefault(r["cohort"], {})[r["week_offset"]] = r["active_users"]
    for cohort, offs in by_cohort.items():
        assert 0 in offs, cohort
        for off, n in offs.items():
            assert n <= offs[0], (cohort, off)


def test_mad_robust_to_outlier(spark):
    """MAD must not move when one extreme outlier is injected, while
    stddev does — the point of the operator."""
    from pyspark.sql import functions as F

    from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events").select("event_type", "value")
    base = ev.filter(F.col("event_type") == "click")
    spiked = base.unionByName(
        spark.createDataFrame([("click", 1e12)], ["event_type", "value"])
    )

    def mad_of(df):
        med = df.agg(F.median("value").alias("m")).first()["m"]
        return df.agg(
            F.median(F.abs(F.col("value") - F.lit(med))).alias("mad")
        ).first()["mad"]

    m0, m1 = mad_of(base), mad_of(spiked)
    s0 = base.agg(F.stddev_samp("value")).first()[0]
    s1 = spiked.agg(F.stddev_samp("value")).first()[0]
    # one injected row can shift the interpolated median by at most
    # ~half a rank — a few percent here — while stddev explodes
    assert abs(m1 - m0) / m0 < 0.05
    assert s1 > 100 * s0
