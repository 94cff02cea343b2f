"""M6 semantic chart layer + M4 observability + multimodal plumbing:
oracle matches and builder-level unit checks."""

from __future__ import annotations

import pytest

from lakehouse_for_data_streaming_and_analysis_spark.queries import (
    charts,
    datapipe,
    observability,
)
from lakehouse_for_data_streaming_and_analysis_spark.semantic import (
    ChartQuery,
    Metric,
)

from .conftest import SF_DIR
from .util import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(charts.ORACLES))
def test_chart_oracle(spark, duck, name):
    assert_matches_oracle(
        charts.QUERIES[name](spark, SF_DIR), duck, charts.ORACLES[name]
    )


@pytest.mark.parametrize("name", sorted(observability.ORACLES))
def test_observability_oracle(spark, duck, name):
    assert_matches_oracle(
        observability.QUERIES[name](spark, SF_DIR), duck, observability.ORACLES[name]
    )


@pytest.mark.parametrize(
    "name", ["multimodal_decode_meta", "multimodal_frame_sample"]
)
def test_multimodal_oracle(spark, duck, name):
    assert_matches_oracle(
        datapipe.QUERIES[name](spark, SF_DIR), duck, datapipe.ORACLES[name]
    )


def test_chart_builder_compiles_both_ways(spark):
    """One spec -> identical column names in the DataFrame plan and the
    generated SQL (the property the driver's hash-compare needs)."""
    spec = ChartQuery(
        metrics=(
            Metric("m1", "MAX", "value", round_to=4),
            Metric("n", "COUNT"),
        ),
        groupby=("event_type",),
        time_col="ts",
        time_grain="P1D",
        order_desc_by="m1",
        limit=5,
    )
    from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table

    df = spec.to_df(load_table(spark, SF_DIR, "events"))
    assert df.columns == ["event_type", "__timestamp", "m1", "n"]
    sql = spec.to_sql("events")
    for frag in ('AS "m1"', 'AS "n"', "GROUP BY", "ORDER BY", "LIMIT 5"):
        assert frag in sql
    assert len(df.take(6)) == 5


def test_chart_filters_push_into_scan(spark):
    """Adhoc equality filters must reach the parquet scan as pushed
    filters, not sit above the aggregate."""
    plan = charts.QUERIES["chart_change_percent"](spark, SF_DIR)
    explained = plan._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" not in explained or "ts" not in explained.split(
        "PushedFilters"
    )  # no filter expected for this slice; smoke only
    gauge = charts.coin_dim(spark, SF_DIR).filter("is_current = 'Y'")
    phys = gauge._jdf.queryExecution().executedPlan().toString()
    assert "Scan parquet" in phys or "FileScan" in phys


def test_decode_media_batch_contract(spark):
    """mapInPandas decode: one output row per input row, deterministic
    sha-256, schema as declared."""
    from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table
    from lakehouse_for_data_streaming_and_analysis_spark.functions import multimodal

    docs = load_table(spark, SF_DIR, "documents").limit(20)
    out = multimodal.decode_media(multimodal.attach_payload(docs))
    rows = out.collect()
    assert len(rows) == 20
    assert out.columns == ["doc_id", "n_bytes", "width", "height", "channels", "sha_hex"]
    import hashlib

    texts = {r.doc_id: r.text for r in docs.collect()}
    for r in rows:
        assert r.sha_hex == hashlib.sha256(texts[r.doc_id].encode()).hexdigest()
        assert 1 <= r.width <= 64 and 1 <= r.height <= 64 and r.channels == 3


def test_decode_image_real_is_gated():
    from lakehouse_for_data_streaming_and_analysis_spark.functions import multimodal

    if not multimodal.HAVE_PIL:
        with pytest.raises(NotImplementedError):
            multimodal.decode_image_real(b"\x89PNG")


def test_exact_substring_dup_coverage_oracle(spark, duck):
    assert_matches_oracle(
        datapipe.QUERIES["exact_substring_dup_coverage"](spark, SF_DIR),
        duck,
        datapipe.ORACLES["exact_substring_dup_coverage"],
    )


def test_exact_substring_dup_coverage_bounded(spark):
    """Merged-island coverage can never exceed the document: share in
    [0, 1], dup-heavy docs bounded by doc count."""
    for r in datapipe.QUERIES["exact_substring_dup_coverage"](
        spark, SF_DIR
    ).collect():
        assert 0.0 <= r["avg_dup_share"] <= 1.0
        assert 0 <= r["n_dup_heavy"] <= r["n_docs"]


def test_semdedup_cluster_prune_oracle(spark, duck):
    assert_matches_oracle(
        datapipe.QUERIES["semdedup_cluster_prune"](spark, SF_DIR),
        duck,
        datapipe.ORACLES["semdedup_cluster_prune"],
    )


def test_semdedup_invariants(spark):
    """Every vector lands in exactly one cluster; dropped never exceeds
    cluster size minus the surviving representative; kept+dropped
    partitions the cluster."""
    rows = datapipe.QUERIES["semdedup_cluster_prune"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["n_kept"] + r["n_dropped"] == r["n_vectors"]
        assert 0 <= r["n_dropped"] < r["n_vectors"] or r["n_vectors"] == 0


def test_quality_threshold_sweep_monotone(spark):
    """Raising the cutoff can only shrink the kept set: n_kept,
    kept_share and kept_tokens must be non-increasing in t_pct, and
    the grid must cover all 9 points."""
    rows = sorted(
        datapipe.QUERIES["quality_threshold_sweep"](spark, SF_DIR).collect(),
        key=lambda r: r["t_pct"],
    )
    assert [r["t_pct"] for r in rows] == list(range(30, 75, 5))
    for a, b in zip(rows, rows[1:]):
        assert b["n_kept"] <= a["n_kept"]
        assert b["kept_tokens"] <= a["kept_tokens"]
        assert b["kept_share"] <= a["kept_share"] + 1e-9
