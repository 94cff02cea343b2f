"""Data-quality constraint engine (operators/quality.py): injected
violations must flip exactly the right constraints, and the whole
suite must stay a single aggregate pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_for_data_streaming_and_analysis_spark.operators import quality as dq


def _report(df, checks):
    return {
        r["constraint_name"]: (r["metric"], r["passed"])
        for r in dq.run_checks(df, checks).collect()
    }


def test_clean_frame_passes_all(spark):
    df = spark.createDataFrame(
        [(1, "A", 10.0), (2, "B", 20.0), (3, "A", 30.0)], ["id", "cat", "v"]
    )
    rep = _report(
        df,
        [
            dq.completeness("id"),
            dq.uniqueness("id"),
            dq.in_set("cat", ("A", "B")),
            dq.non_negative("v"),
        ],
    )
    assert all(passed for _, passed in rep.values()), rep


def test_injected_violations_flip_right_constraints(spark):
    df = spark.createDataFrame(
        [
            (1, "A", 10.0),
            (1, "B", -5.0),  # duplicate id + negative value
            (None, "Z", 30.0),  # null id + out-of-domain cat
            (4, "A", 40.0),
        ],
        ["id", "cat", "v"],
    )
    rep = _report(
        df,
        [
            dq.completeness("id"),
            dq.uniqueness("id"),
            dq.in_set("cat", ("A", "B")),
            dq.non_negative("v"),
        ],
    )
    assert rep["completeness(id)"] == (0.75, False)
    # 3 non-null ids, 2 distinct -> 2/3
    assert rep["uniqueness(id)"][1] is False
    assert rep["in_set(cat)"] == (0.75, False)
    assert rep["non_negative(v)"] == (0.75, False)


def test_threshold_allows_tolerance(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], ["v"])
    rep = _report(df, [dq.bounds("v", 0, 89, min_frac=0.9)])
    assert rep["bounds(v)"] == (0.9, True)
    rep = _report(df, [dq.bounds("v", 0, 88, min_frac=0.9)])
    assert rep["bounds(v)"] == (0.89, False)


def test_referential_integrity_counts_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,)], ["fk"])
    parent = spark.createDataFrame([(1,), (2,), (3,)], ["pk"])
    row = dq.referential_integrity(child, "fk", parent, "pk").collect()[0]
    assert row["passed"] is False
    assert abs(row["metric"] - 2 / 3) < 1e-6
    clean = dq.referential_integrity(
        child.filter(F.col("fk") < 3), "fk", parent, "pk"
    ).collect()[0]
    assert clean["passed"] is True and clean["metric"] == 1.0


def test_single_pass_plan(spark):
    """N constraints must compile to one aggregate over one scan."""
    from .conftest import SF_DIR

    from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table

    o = load_table(spark, SF_DIR, "orders")
    df = dq.run_checks(
        o,
        [
            dq.completeness("o_custkey"),
            dq.uniqueness("o_orderkey"),
            dq.non_negative("o_totalprice"),
        ],
    )
    p = df._jdf.queryExecution().executedPlan().toString()
    assert p.count("FileScan") == 1, p
