"""Independent-formulation cross-checks for algorithmically subtle
queries: the implementation under test is the registry entry; the
referee is a brute-force or library reimplementation of the SAME
semantics on the SAME data."""

from __future__ import annotations

import numpy as np

from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table
from lakehouse_for_data_streaming_and_analysis_spark.queries import olap, relational

from .conftest import SF_DIR


def test_skyline_window_trick_equals_brute_force(spark):
    """The 2D skyline's one-window formulation (keep a row iff its
    order count beats the running max of everything richer) must
    equal the O(n^2) Pareto definition: no other row in the nation
    dominates on BOTH axes (>= on both, > on at least one)."""
    got = {
        (r.c_nationkey, r.c_custkey)
        for r in relational.QUERIES["skyline_customers_2d"](
            spark, SF_DIR
        ).collect()
    }
    import pyspark.sql.functions as F

    customer = load_table(spark, SF_DIR, "customer")
    orders = load_table(spark, SF_DIR, "orders")
    per = (
        customer.join(orders, orders["o_custkey"] == customer["c_custkey"])
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2
            )
            .cast("double")
            .alias("spend"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    by_nation: dict = {}
    for r in per:
        by_nation.setdefault(r.c_nationkey, []).append(r)
    expected = set()
    for nk, rows in by_nation.items():
        for r in rows:
            dominated = any(
                o.spend >= r.spend
                and o.n >= r.n
                and (o.spend > r.spend or o.n > r.n)
                for o in rows
                if o.c_custkey != r.c_custkey
            )
            if not dominated:
                expected.add((nk, r.c_custkey))
    assert got == expected


def test_percentile_audit_matches_numpy_conventions(spark):
    """The explicit rank arithmetic must reproduce numpy's two
    canonical definitions on the same values: disc = the
    'inverted_cdf' quantile (ceil(q*n)-th order statistic), cont =
    the default 'linear' interpolation at (n-1)*q."""
    rows = {
        r.event_type: r
        for r in olap.QUERIES["percentile_disc_cont_audit"](
            spark, SF_DIR
        ).collect()
    }
    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", "value"
    ).collect()
    vals: dict = {}
    for r in ev:
        vals.setdefault(r.event_type, []).append(r.value)
    for et, v in vals.items():
        a = np.sort(np.asarray(v, dtype=np.float64))
        got = rows[et]
        assert abs(got.p50_cont - round(float(np.percentile(a, 50)), 4)) < 1e-9
        assert abs(got.p90_cont - round(float(np.percentile(a, 90)), 4)) < 1e-9
        disc50 = float(a[int(np.ceil(0.5 * len(a))) - 1])
        disc90 = float(a[int(np.ceil(0.9 * len(a))) - 1])
        assert abs(got.p50_disc - round(disc50, 4)) < 1e-9
        assert abs(got.p90_disc - round(disc90, 4)) < 1e-9
