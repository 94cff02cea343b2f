"""Smoke + oracle tests for the driver contract (__spark_entry__)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod

from .util import assert_matches_oracle

QUERY_NAMES = sorted(entrymod.queries().keys())


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == [
        "nation",
        "region",
        "month",
        "revenue",
        "max_order_value",
        "n_lineitems",
    ]


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    fn = entrymod.queries()[name]
    oracles = entrymod.oracle_sql()
    df = fn(spark, sf_dir)
    if name in oracles:
        assert_matches_oracle(df, duck, oracles[name])
    else:
        assert df.count() >= 0


def test_every_query_has_oracle_or_is_flagged():
    """Every queries() entry should carry an oracle unless explicitly
    non-SQL-expressible (driver then records a weaker rows-only check)."""
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    missing = sorted(set(qs) - set(oracles))
    allowed_rows_only = set(getattr(entrymod, "ROWS_ONLY", ()))
    assert set(missing) <= allowed_rows_only, missing


def test_queries_md_in_sync(tmp_path):
    """QUERIES.md is generated from the live registry and must not
    drift from it."""
    from lakehouse_for_data_streaming_and_analysis_spark import inventory

    generated = inventory.generate(str(tmp_path / "QUERIES.md"))
    with open("/root/repo/QUERIES.md") as f:
        committed = f.read()
    assert generated == committed, "run python -m lakehouse_for_data_streaming_and_analysis_spark.inventory"


def test_driver_sim_crashes_on_list_typed_outputs():
    """Sim-fidelity pin (r4 lesson): the driver canonicalizes with
    pandas sort_values over RAW columns, which raises on list cells.
    ``tools.driver_sim._frame_key`` must reproduce that crash so
    array/map/struct output columns fail the pre-flight instead of
    burning a driver window slot (``user_event_profile``, r4)."""
    import pandas as pd
    import pytest as _pytest

    from tools.driver_sim import _frame_key

    scalar = pd.DataFrame({"a": [2, 1], "b": ["y", "x"]})
    cols, rows = _frame_key(scalar)
    assert cols == ("a", "b")
    assert rows == sorted(rows)

    listy = pd.DataFrame({"a": [1, 2], "arr": [["x"], ["y", "z"]]})
    with _pytest.raises(TypeError):
        _frame_key(listy)
