"""Aggregate-navigation correctness (plans/aggnav.py): covering
summaries answer requests losslessly, non-covering requests fall back
to the fact table, and a materialized summary is what the physical
plan actually scans."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table
from lakehouse_for_data_streaming_and_analysis_spark.plans import aggnav

from .conftest import SF_DIR


def _direct(fact, group_cols, measures):
    aggs = []
    for m in measures:
        if m.kind == "count":
            aggs.append(F.count(F.lit(1)).alias(m.name))
        elif m.kind == "avg":
            aggs.append(F.avg(m.source).alias(m.name))
        else:
            aggs.append(getattr(F, m.kind)(m.source).alias(m.name))
    return fact.groupBy(*group_cols).agg(*aggs)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(round(r[c], 6) if isinstance(r[c], float) else r[c] for c in cols)
        for r in df.collect()
    )


def test_navigated_equals_direct_all_kinds(spark):
    o = load_table(spark, SF_DIR, "orders").withColumn("yr", F.year("o_orderdate"))
    summary = aggnav.build_summary(
        "s1", o, ["o_orderpriority", "yr"], [("sum", "o_totalprice"),
                                             ("min", "o_totalprice"),
                                             ("max", "o_totalprice")]
    )
    measures = [
        aggnav.Measure("count", "", "n"),
        aggnav.Measure("sum", "o_totalprice", "s"),
        aggnav.Measure("avg", "o_totalprice", "a"),
        aggnav.Measure("min", "o_totalprice", "mn"),
        aggnav.Measure("max", "o_totalprice", "mx"),
    ]
    for grain in (["o_orderpriority"], ["yr"], ["o_orderpriority", "yr"]):
        out, used = aggnav.plan_aggregate(o, grain, measures, [summary])
        assert used == "s1"
        assert _rows(out) == _rows(_direct(o, grain, measures))


def test_fallback_on_uncovered_grain_or_measure(spark):
    o = load_table(spark, SF_DIR, "orders").withColumn("yr", F.year("o_orderdate"))
    summary = aggnav.build_summary(
        "s1", o, ["o_orderpriority"], [("sum", "o_totalprice")]
    )
    # grain outside the summary's group-set -> fact
    out, used = aggnav.plan_aggregate(
        o, ["o_orderstatus"], [aggnav.Measure("count", "", "n")], [summary]
    )
    assert used is None
    # measure state missing (min never materialized) -> fact
    out, used = aggnav.plan_aggregate(
        o,
        ["o_orderpriority"],
        [aggnav.Measure("min", "o_totalprice", "mn")],
        [summary],
    )
    assert used is None
    # holistic measure -> fact, always
    out, used = aggnav.plan_aggregate(
        o,
        ["o_orderpriority"],
        [aggnav.Measure("median", "o_totalprice", "md")],
        [summary],
    )
    assert used is None


def test_prefers_coarser_covering_summary(spark):
    o = load_table(spark, SF_DIR, "orders").withColumn("yr", F.year("o_orderdate"))
    fine = aggnav.build_summary(
        "fine", o, ["o_orderpriority", "yr"], [("sum", "o_totalprice")]
    )
    coarse = aggnav.build_summary(
        "coarse", o, ["o_orderpriority"], [("sum", "o_totalprice")]
    )
    _, used = aggnav.plan_aggregate(
        o,
        ["o_orderpriority"],
        [aggnav.Measure("sum", "o_totalprice", "s")],
        [fine, coarse],
    )
    assert used == "coarse"


def test_materialized_summary_is_what_gets_scanned(spark, tmp_path):
    """Persist the summary; the navigated plan must scan the summary
    parquet and never the fact table's files."""
    o = load_table(spark, SF_DIR, "orders").withColumn("yr", F.year("o_orderdate"))
    s = aggnav.build_summary(
        "gold", o, ["o_orderpriority", "yr"], [("sum", "o_totalprice")]
    )
    path = str(tmp_path / "gold_summary")
    s.df.write.mode("overwrite").parquet(path)
    gold = aggnav.Summary(
        name="gold",
        df=spark.read.parquet(path),
        group_cols=s.group_cols,
        states=s.states,
    )
    out, used = aggnav.plan_aggregate(
        o,
        ["o_orderpriority"],
        [aggnav.Measure("sum", "o_totalprice", "s"),
         aggnav.Measure("count", "", "n")],
        [gold],
    )
    assert used == "gold"
    plan = out._jdf.queryExecution().toString()
    # the only FileScan reads summary-state columns — the fact table's
    # files and columns appear nowhere (paths are elided in toString,
    # so the scan schema is the reliable signal)
    assert "orders.parquet" not in plan, plan
    assert "sum_o_totalprice" in plan, plan
    assert "o_orderdate" not in plan, plan
    # and it is still correct
    assert _rows(out) == _rows(
        _direct(
            o,
            ["o_orderpriority"],
            [aggnav.Measure("sum", "o_totalprice", "s"),
             aggnav.Measure("count", "", "n")],
        )
    )
