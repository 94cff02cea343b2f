"""Approximate aggregates — the 100 TB substitutes for exact
count-distinct / percentile (SURVEY.md §2.5 A4 'approx_count_distinct
at scale'). Tolerance-checked against exact values; no driver oracle
because DuckDB's sketches differ bit-wise by design."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table

from .conftest import SF_DIR, SF_DIR_01


def test_approx_count_distinct_within_rsd(spark):
    ev = load_table(spark, SF_DIR_01, "events")
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    approx = ev.select(F.approx_count_distinct("user_id", rsd=0.02)).first()[0]
    assert abs(approx - exact) / exact < 0.06  # 3x the configured rsd


def test_approx_percentile_within_accuracy(spark):
    ev = load_table(spark, SF_DIR_01, "events")
    exact = ev.select(
        F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("p")
    ).first()["p"]
    approx = ev.select(
        F.expr("approx_percentile(value, array(0.5, 0.9, 0.99), 10000)").alias("p")
    ).first()["p"]
    spread = ev.select(F.max("value") - F.min("value")).first()[0]
    for e, a in zip(exact, approx):
        assert abs(e - a) <= 0.01 * spread + 1e-9


def test_hll_sketch_mergeability(spark):
    """Sketches must merge across partitions/days — the property that
    lets a 100 TB rollup pre-aggregate per partition and union."""
    ev = load_table(spark, SF_DIR_01, "events")
    per_day = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = per_day.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n")
    ).first()["n"]
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    assert abs(merged - exact) / exact < 0.06


def test_sketch_cardinalities_error_bound(spark):
    """The portable explicit-HLL query (m=256, rsd ~6.5%) stays within
    4x rsd of exact distinct counts at both fixture scales and never
    reports more hit buckets than distinct users."""
    from lakehouse_for_data_streaming_and_analysis_spark.queries.datapipe import (
        sketch_cardinalities,
    )

    for sf_dir in (SF_DIR, SF_DIR_01):
        got = {
            r["event_type"]: r
            for r in sketch_cardinalities(spark, sf_dir).collect()
        }
        ev = load_table(spark, sf_dir, "events")
        exact = {
            r["event_type"]: r
            for r in ev.groupBy("event_type")
            .agg(
                F.count_distinct("user_id").alias("users"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        }
        assert set(got) == set(exact)
        for k, e in exact.items():
            g = got[k]
            assert abs(g["approx_users"] - e["users"]) / e["users"] < 0.26, (
                sf_dir, k, g, e,
            )
            assert g["n_buckets_hit"] <= min(256, e["users"])
            assert g["n_rows"] == e["n"]
