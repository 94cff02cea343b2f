"""Smoke + oracle tests for the driver contract (__spark_entry__)."""

from __future__ import annotations

import __spark_entry__ as entrymod

from .util import assert_matches_oracle


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


def test_all_queries_match_oracles(spark, duck, sf_dir):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        if name in oracles:
            assert_matches_oracle(df, duck, oracles[name])
        else:
            assert df.count() >= 0, name
