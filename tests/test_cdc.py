"""CDC apply semantics (operators/cdc.cdc_apply): latest-change-wins,
deletes drop, inserts land, untouched rows pass through, and the
driver query's oracle match is covered via test_entry's sweep."""

from __future__ import annotations

from lakehouse_for_data_streaming_and_analysis_spark.operators import cdc


def test_cdc_apply_semantics(spark):
    snap = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        ["id", "name", "val"],
    )
    changes = spark.createDataFrame(
        [
            # id 2: two updates — only seq 5 applies
            (2, "b2", 21.0, "U", 4),
            (2, "b3", 22.0, "U", 5),
            # id 3: update then delete at higher seq — row must vanish
            (3, "c2", 31.0, "U", 1),
            (3, "c2", 31.0, "D", 2),
            # id 4: delete then REINSERT at higher seq — row must exist
            (4, "d0", 40.0, "D", 1),
            (4, "d1", 41.0, "I", 2),
            # id 5: plain insert
            (5, "e", 50.0, "I", 1),
        ],
        ["id", "name", "val", "op", "seq"],
    )
    got = {
        r["id"]: (r["name"], r["val"])
        for r in cdc.cdc_apply(snap, changes, keys=["id"]).collect()
    }
    assert got == {
        1: ("a", 10.0),  # untouched
        2: ("b3", 22.0),  # latest update wins
        4: ("d1", 41.0),  # delete-then-insert resurrects
        5: ("e", 50.0),  # insert
    }
