"""Aggregate navigation: answer a grouped-aggregate request from a
registered pre-aggregated summary ("materialized view") whenever the
summary's grain and measures cover it, falling back to the fact table
otherwise.

This is the engine-side half of what the reference delegates to its
BI layer (Superset virtual datasets re-aggregate a saved dataset's
result grid — reference `data/dashboard/*.json` virtual dataset SQL);
here it is a first-class planner step with a correctness guarantee:
re-aggregation is only attempted for distributive/algebraic measures
(SUM/COUNT/MIN/MAX, AVG as SUM÷COUNT), never for holistic ones
(DISTINCT, MEDIAN), and only when the requested group-set is a subset
of the summary's group-set.

Scale rationale: a 100 TB fact scanned once into a few summary
tables at common grains turns every dashboard query into a scan of
megabytes. The navigator makes that transparent — queries state their
logical request; whether it hits gold/silver/fact is a planner
decision, exactly like Catalyst choosing an index.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Re-aggregable measure kinds: how partial states merge upward.
_REAGG = {
    "sum": F.sum,
    "count": F.sum,  # counts re-aggregate by summing
    "min": F.min,
    "max": F.max,
}


@dataclass(frozen=True)
class Measure:
    """A requested output measure.

    kind: 'sum' | 'count' | 'min' | 'max' | 'avg'
    source: fact column it aggregates ('' for count)
    name:   output column name
    """

    kind: str
    source: str
    name: str


@dataclass
class Summary:
    """A registered pre-aggregated table.

    group_cols: the summary's grain.
    states: measure-state columns present, keyed by (kind, source) —
            e.g. {('sum','l_extendedprice'): 'sum_price',
                  ('count',''): 'n_rows'}.
    """

    name: str
    df: DataFrame
    group_cols: frozenset[str]
    states: dict[tuple[str, str], str] = field(default_factory=dict)


def build_summary(
    name: str,
    fact: DataFrame,
    group_cols: list[str],
    measures: list[tuple[str, str]],
) -> Summary:
    """Materialize partial aggregate states at ``group_cols`` grain.
    ``measures`` is [(kind, source)] with kind in sum/count/min/max;
    a count state is always included (it is what lets AVG and COUNT
    re-derive upward)."""
    wanted = list(dict.fromkeys([("count", "")] + measures))
    states: dict[tuple[str, str], str] = {}
    aggs = []
    for kind, source in wanted:
        col = f"{kind}_{source}" if source else "n_rows"
        states[(kind, source)] = col
        if kind == "count":
            aggs.append(F.count(F.lit(1)).alias(col))
        else:
            aggs.append(getattr(F, kind)(source).alias(col))
    df = fact.groupBy(*group_cols).agg(*aggs)
    return Summary(name=name, df=df, group_cols=frozenset(group_cols), states=states)


def _covers(summary: Summary, group_cols: list[str], measures: list[Measure]) -> bool:
    if not set(group_cols) <= summary.group_cols:
        return False
    for m in measures:
        if m.kind in ("sum", "min", "max", "count"):
            key = (m.kind, m.source if m.kind != "count" else "")
            if key not in summary.states:
                return False
        elif m.kind == "avg":
            if ("sum", m.source) not in summary.states or (
                "count",
                "",
            ) not in summary.states:
                return False
        else:  # holistic — never navigable
            return False
    return True


def plan_aggregate(
    fact: DataFrame,
    group_cols: list[str],
    measures: list[Measure],
    summaries: list[Summary] = (),
) -> tuple[DataFrame, str | None]:
    """Answer the request from the smallest covering summary, else the
    fact table. Returns (result, summary_name | None)."""
    best = None
    for s in summaries:
        if _covers(s, group_cols, measures):
            # fewer grain columns == coarser == smaller: prefer it
            if best is None or len(s.group_cols) < len(best.group_cols):
                best = s
    if best is None:
        aggs = []
        for m in measures:
            if m.kind == "count":
                aggs.append(F.count(F.lit(1)).alias(m.name))
            elif m.kind == "avg":
                aggs.append(F.avg(m.source).alias(m.name))
            else:
                aggs.append(getattr(F, m.kind)(m.source).alias(m.name))
        return fact.groupBy(*group_cols).agg(*aggs), None

    aggs = []
    for m in measures:
        if m.kind == "avg":
            s_col = best.states[("sum", m.source)]
            c_col = best.states[("count", "")]
            # pin the double division path: a DECIMAL sum state would
            # otherwise hit Spark's decimal-division scale rules, which
            # no other engine mirrors digit-for-digit
            aggs.append(
                (F.sum(s_col).cast("double") / F.sum(c_col)).alias(m.name)
            )
        elif m.kind == "count":
            aggs.append(F.sum(best.states[("count", "")]).alias(m.name))
        else:
            aggs.append(
                _REAGG[m.kind](best.states[(m.kind, m.source)]).alias(m.name)
            )
    return best.df.groupBy(*group_cols).agg(*aggs), best.name
