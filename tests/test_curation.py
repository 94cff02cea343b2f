"""Oracle matches + semantic invariants for the corpus-curation
queries (queries/curation.py): PII scrubbing, deterministic splits,
leakage detection, contamination overlap, stratified sampling, quality
gates, corpus shuffling, label profiles."""

from __future__ import annotations

import pytest

from lakehouse_for_data_streaming_and_analysis_spark.queries import curation

from .conftest import SF_DIR
from .util import assert_matches_oracle

ORACLE_KEYS = sorted(curation.ORACLES)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_curation_oracle(spark, duck, name):
    assert_matches_oracle(
        curation.QUERIES[name](spark, SF_DIR), duck, curation.ORACLES[name]
    )


def test_split_proportions_sane(spark):
    """Hash split must land near 80/10/10 overall and cover every doc
    exactly once."""
    from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table

    rows = curation.train_val_test_split(spark, SF_DIR).collect()
    total = sum(r["n_docs"] for r in rows)
    assert total == load_table(spark, SF_DIR, "documents").count()
    by_split = {}
    for r in rows:
        by_split[r["split"]] = by_split.get(r["split"], 0) + r["n_docs"]
    assert set(by_split) == {"train", "val", "test"}
    assert 0.7 < by_split["train"] / total < 0.9
    assert by_split["val"] / total < 0.2 and by_split["test"] / total < 0.2


def test_leakage_detects_injected_duplicates(spark):
    """The corpus has every-7th doc duplicated across a hash split —
    some of those copies must land on opposite sides, and every leaked
    eval doc is counted within the eval total."""
    row = curation.cross_split_leakage(spark, SF_DIR).collect()[0]
    assert row["leaked_fingerprints"] > 0
    assert 0 < row["leaked_eval_docs"] <= row["total_eval_docs"]


def test_quality_gate_counts_consistent(spark):
    """passed <= n_docs and every per-gate failure count is bounded by
    the group size; totals cover the whole table."""
    from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table

    rows = curation.doc_quality_gates(spark, SF_DIR).collect()
    assert sum(r["n_docs"] for r in rows) == load_table(
        spark, SF_DIR, "documents"
    ).count()
    for r in rows:
        assert 0 <= r["passed"] <= r["n_docs"]
        for g in ("fail_len", "fail_tok", "fail_rep", "fail_sw"):
            assert 0 <= r[g] <= r["n_docs"]
        # a doc that fails no gate is passed: passed >= n_docs - sum(fails)
        assert r["passed"] >= r["n_docs"] - (
            r["fail_len"] + r["fail_tok"] + r["fail_rep"] + r["fail_sw"]
        )


def test_shuffle_positions_contiguous_and_deterministic(spark):
    rows = curation.corpus_shuffle_shards(spark, SF_DIR).collect()
    positions = sorted(r["pos"] for r in rows)
    assert positions == list(range(1, len(rows) + 1))
    assert all(r["shard"] == (r["pos"] - 1) % 8 for r in rows)
    again = curation.corpus_shuffle_shards(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_stratified_rates_close_to_target(spark):
    for r in curation.stratified_sample_rates(spark, SF_DIR).collect():
        assert 0 < r["n_sampled"] < r["n_total"]
        # hash-uniformity: achieved within ±60% relative of target at
        # small sf (hundreds of docs per stratum)
        assert abs(r["achieved_rate"] - r["target_rate"]) < 0.6 * r["target_rate"]


def test_sequence_packing_invariants(spark):
    """Packing conservation: offsets are a gapless concat layout —
    consecutive docs in layout order satisfy next_start = start + n_tok
    (reconstructed from shard*4096 + pos), non-straddling docs fit
    inside their shard, straddling docs provably cross the boundary."""
    from lakehouse_for_data_streaming_and_analysis_spark.queries import curation

    rows = curation.QUERIES["sequence_packing_map"](spark, SF_DIR).collect()
    assert rows
    laid = sorted(
        ((r["shard"] * 4096 + r["pos"]), r["n_tok"], r["straddles"])
        for r in rows
    )
    # gapless: each doc starts exactly where the previous ended
    off = 0
    for start, n_tok, straddles in laid:
        assert start == off
        in_shard = start % 4096
        assert straddles == (in_shard + n_tok > 4096)
        off = start + n_tok
    assert off == sum(n for _, n, _ in laid)


def test_dsir_target_scores_highest(spark):
    """The target domain must score itself highest: src0's mean
    importance weight and target-like count top every other source."""
    rows = {
        r["source"]: r
        for r in curation.QUERIES["dsir_importance_weights"](
            spark, SF_DIR
        ).collect()
    }
    others = [r for s, r in rows.items() if s != "src0"]
    assert all(rows["src0"]["avg_weight"] > r["avg_weight"] for r in others)


def test_temperature_mixing_upsamples_tail(spark):
    """alpha < 1 must pull shares toward uniform: every language rarer
    than average gets factor > 1, every more-common one factor < 1,
    and the temperature shares still sum to 1."""
    rows = curation.QUERIES["temperature_mixture_weights"](
        spark, SF_DIR
    ).collect()
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-4
    mean_share = 1.0 / len(rows)
    for r in rows:
        if r["natural_share"] < mean_share - 1e-9:
            assert r["sampling_factor"] > 1.0
        elif r["natural_share"] > mean_share + 1e-9:
            assert r["sampling_factor"] < 1.0
