"""Oracle matches + semantic invariants for the market time-series
queries (queries/timeseries.py) and the LM quality-signal queries
(queries/lmstats.py)."""

from __future__ import annotations

import math

import pytest

from lakehouse_for_data_streaming_and_analysis_spark.queries import lmstats, timeseries

from .conftest import SF_DIR
from .util import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(timeseries.ORACLES))
def test_timeseries_oracle(spark, duck, name):
    assert_matches_oracle(
        timeseries.QUERIES[name](spark, SF_DIR), duck, timeseries.ORACLES[name]
    )


@pytest.mark.parametrize("name", sorted(lmstats.ORACLES))
def test_lmstats_oracle(spark, duck, name):
    assert_matches_oracle(
        lmstats.QUERIES[name](spark, SF_DIR), duck, lmstats.ORACLES[name]
    )


def test_twap_bounded_by_minmax(spark):
    """A time-weighted mean can never leave the observed value range,
    and interval spans must be positive."""
    from pyspark.sql import functions as F

    from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table

    rows = timeseries.twap_daily(spark, SF_DIR).collect()
    assert rows
    ev = load_table(spark, SF_DIR, "events")
    bounds = ev.agg(F.min("value"), F.max("value")).first()
    for r in rows:
        assert r["span_s"] > 0
        assert bounds[0] - 1e-9 <= r["twap"] <= bounds[1] + 1e-9


def test_drawdown_nonnegative_and_frac_bounded(spark):
    for r in timeseries.max_drawdown_by_type(spark, SF_DIR).collect():
        assert r["max_drawdown"] >= 0
        assert 0 <= r["max_drawdown_frac"] <= 1


def test_ewma_matches_pandas_reference(spark):
    """EWMA fold must equal pandas ewm(alpha=.2, adjust=False) on the
    same rounded daily series."""
    import pandas as pd
    from pyspark.sql import functions as F

    from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table

    ev = load_table(spark, SF_DIR, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("d"))
        .agg(F.round(F.avg("value"), 6).alias("v"))
        .orderBy("event_type", "d")
        .toPandas()
    )
    got = {
        r["event_type"]: r["ewma"]
        for r in timeseries.ewma_daily_value(spark, SF_DIR).collect()
    }
    for etype, grp in daily.groupby("event_type"):
        want = grp["v"].ewm(alpha=0.2, adjust=False).mean().iloc[-1]
        assert math.isclose(got[etype], round(want, 6), abs_tol=1e-6)


def test_surprisal_positive_and_repetition_low(spark):
    """MLE surprisal is >= 0 (P <= 1); a degenerate fully-repetitive
    doc would score ~0 — real corpus docs must average well above."""
    rows = lmstats.bigram_lm_surprisal(spark, SF_DIR).collect()
    assert rows
    assert all(r["avg_surprisal"] >= 0 for r in rows)
    assert sum(r["avg_surprisal"] for r in rows) / len(rows) > 0.5


def test_char_entropy_bounded(spark):
    """Entropy over 4 classes lies in [0, ln 4]; shares in [0, 1]."""
    for r in lmstats.char_class_entropy(spark, SF_DIR).collect():
        assert 0 <= r["avg_entropy"] <= math.log(4) + 1e-9
        assert 0 <= r["avg_alpha_share"] <= 1
        assert 0 <= r["avg_digit_share"] <= 1


def test_incremental_merge_equals_direct(spark):
    """The merged partial states must equal a single-pass groupBy on
    the whole table (lossless state merge)."""
    from pyspark.sql import functions as F

    from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table
    from lakehouse_for_data_streaming_and_analysis_spark.queries import advanced

    got = {
        r["l_returnflag"]: (r["n"], r["total_price"], r["min_qty"], r["max_qty"])
        for r in advanced.incremental_agg_merge(spark, SF_DIR).collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    direct = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("s"),
        F.min("l_quantity").alias("mn"),
        F.max("l_quantity").alias("mx"),
    )
    for r in direct.collect():
        assert got[r["l_returnflag"]] == (r["n"], r["s"], r["mn"], r["mx"])


def test_compression_ratio_matches_zlib_replay(spark):
    """The mapInPandas deflate path must reproduce a driver-local
    zlib replay exactly: same per-source counts, same rounded ratio
    aggregates, same bucket counts."""
    import zlib

    import pyarrow.parquet as pq

    got = {
        r["source"]: r
        for r in lmstats.compression_ratio_quality(spark, SF_DIR).collect()
    }
    pdf = pq.read_table(f"{SF_DIR}/documents.parquet").to_pandas()
    pdf["__raw"] = pdf["text"].fillna("").str.encode("utf-8")
    pdf["__ratio"] = (
        pdf["__raw"].map(lambda b: len(zlib.compress(b, 6)))
        / pdf["__raw"].str.len().clip(lower=1)
    ).round(6)
    for src, grp in pdf.groupby("source"):
        r = got[src]
        assert r["n_docs"] == len(grp)
        assert math.isclose(r["avg_ratio"], round(grp["__ratio"].mean(), 4), abs_tol=1e-9)
        assert r["min_ratio"] == round(grp["__ratio"].min(), 4)
        assert r["max_ratio"] == round(grp["__ratio"].max(), 4)
        assert r["n_repetitive"] == int((grp["__ratio"] < 0.35).sum())
        assert r["n_incompressible"] == int((grp["__ratio"] > 0.9).sum())
    assert set(got) == set(pdf["source"].unique())
