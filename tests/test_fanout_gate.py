"""r11 (VERDICT r10 #3): the fanout round-robin must fire only when
the backing parquet scan is effectively serial (fewer row groups than
cores). Single-row-group fixture -> RoundRobinPartitioning present;
many-row-group input -> no repartition node at all."""

from __future__ import annotations

import os

import pytest

from lakehouse_for_data_streaming_and_analysis_spark.catalog import (
    _scan_row_groups,
    load_table,
)

from .conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_fixture_single_row_group_still_fans_out(spark):
    # the driver fixtures are single-row-group files: the gate must
    # keep the round-robin exchange (the r10 measured 7x win)
    path = os.path.join(SF_DIR, "documents.parquet")
    assert _scan_row_groups(path) < spark.sparkContext.defaultParallelism
    df = load_table(spark, SF_DIR, "documents", fanout=True)
    assert "RoundRobinPartitioning" in _plan(df)


def test_wide_scan_skips_fanout(spark, tmp_path):
    par = spark.sparkContext.defaultParallelism
    sf_dir = str(tmp_path)
    dest = os.path.join(sf_dir, "documents.parquet")
    # one row group per part file -> row groups >= parallelism
    src = load_table(spark, SF_DIR, "documents")
    src.repartition(par).write.mode("overwrite").parquet(dest)
    assert _scan_row_groups(dest) >= par
    df = load_table(spark, sf_dir, "documents", fanout=True)
    plan = _plan(df)
    assert "RoundRobinPartitioning" not in plan
    assert "Exchange" not in plan
    # gated and ungated forms read identical rows
    assert df.count() == src.count()


def test_row_group_count_matches_pyarrow(spark, tmp_path):
    import pyarrow.parquet as pq

    sf_dir = str(tmp_path)
    dest = os.path.join(sf_dir, "nation.parquet")
    load_table(spark, SF_DIR, "nation").repartition(3).write.mode(
        "overwrite"
    ).parquet(dest)
    files = [
        os.path.join(dest, f)
        for f in os.listdir(dest)
        if f.endswith(".parquet")
    ]
    expect = sum(pq.ParquetFile(f).num_row_groups for f in files)
    assert _scan_row_groups(dest) == expect
