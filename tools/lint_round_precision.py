#!/usr/bin/env python3
"""Fleet lint: cross-engine float-rounding precision hazards.

The round-7 driver red (``dow_seasonality_strength``) shipped because an
oracle emitted ``ROUND(VAR_POP(v), 6)`` on a ~3e6-magnitude variance:
six decimals on a 10^6 double demands ~13 significant digits, beyond
what float64 summation-order determinism guarantees across engines and
thread schedules, so DuckDB's different accumulation order flipped the
6th decimal and the typed hash went red — while the builder's own sim
canon (9 significant digits) was exactly blind to it (VERDICT r7,
"What's wrong #1").

Round 9's full-registry sf1 sim then showed the budget was calibrated
at the wrong scale: four queries passed the sf0.01 lint and flipped
their last rounded digit at sf1 magnitudes.  Two of the gaps are
structural and round 10 closes both (VERDICT r9 ask #5):

* **sf1 extrapolation** — magnitudes are measured at BOTH sf0.001 and
  the lint fixture (sf0.01) and extrapolated two decades up
  (``mag * growth^2``), so a column that grows with data volume is
  budgeted at the scale where it will actually be hashed.  Columns
  whose aliasing oracle expression is DECIMAL-accumulated are exempt
  from the extrapolated gate: an exact decimal sum is
  order-independent, so its magnitude is not a float-determinism
  hazard (the ``o_totalprice`` audit pattern).
* **syntactic tie scan** — ``ROUND(expr / 10^k, d)`` with ``k > d``
  is the DECISIONS §50 tie generator (``ROUND(us/1e6, 3)``: a µs diff
  ending in exactly 500 sits ON the rounding half-boundary, which the
  two engines break differently).  These are flagged from the emitted
  oracle SQL *and* the package's ``F.round`` call sites regardless of
  observed magnitudes, because the class is magnitude-independent.
  The fix is the integer half-up carrier
  (``floor((us+500)/1000)/1000``), never double-ROUND.

A column is HAZARDOUS when ``mag * 10**d_obs`` (d_obs = effective
decimals present in the values) exceeds the threshold (default 1e12 ≈
the float64 determinism budget with ~3 digits of margin) at the lint
fixture, or at the extrapolated sf1 magnitude for non-decimal-backed
columns.  Fix by lowering the ROUND precision, emitting a scale-free
ratio, or accumulating in DECIMAL before rounding.

Columns that no ``d ≤ 9`` reproduces are reported as ``unrounded`` —
they only fail when their magnitude alone exceeds the threshold.

Usage::

    python tools/lint_round_precision.py            # whole registry
    python tools/lint_round_precision.py name1 ...  # subset
    SPARK_GRAFT_LINT_THRESHOLD=1e11 python tools/lint_round_precision.py

Exit 1 on any hazardous column or syntactic tie pattern.  Consumed by
``tests/test_oracle_dtypes.py`` as a fleet regression gate and part of
the round-close checklist.
"""

from __future__ import annotations

import math
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SIM_SF_DIR", "/root/testdata/sf0.01")
SF_SMALL = os.environ.get("SPARK_GRAFT_LINT_SMALL_SF_DIR", "/root/testdata/sf0.001")
THRESHOLD = float(os.environ.get("SPARK_GRAFT_LINT_THRESHOLD", "1e12"))

# query.column -> why high apparent precision is safe there.  The lint's
# hazard model is two engines independently re-accumulating floats; a column is
# exempt when the oracle does NOT independently recompute it — e.g. the
# fixture-literal oracles (DECISIONS.md §14), whose values come from the
# same deterministic Python recursion both sides run over a
# DECIMAL-pinned stage boundary, so they are bit-identical by
# construction rather than by rounding headroom.
ALLOW = {
    "garch_volatility.omega": (
        "oracle embeds grid-QMLE literals from the identical recursion "
        "over the DECIMAL(18,2)-pinned hourly stage (analytics.py "
        "HOURLY_SQL); driver-green r4"
    ),
}
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

_ROUND_OPEN = re.compile(r"\bROUND\s*\(", re.I)
_DIV_POW10 = re.compile(r"/\s*(?:1e(\d+)|1(0{3,})(?:\.0*)?)\b", re.I)
_LAST_ARG_INT = re.compile(r",\s*(\d+)\s*$")


def _round_call_args(text: str):
    """Yield the parenthesized argument text of each ROUND( / F.round( /
    .round( call in ``text`` (paren-balanced, ignores nesting)."""
    for mt in _ROUND_OPEN.finditer(text):
        depth = 0
        start = mt.end() - 1
        for i in range(start, len(text)):
            ch = text[i]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    yield text[start + 1 : i]
                    break


def scan_tie_patterns(text: str):
    """DECISIONS §50 syntactic scan: ROUND(expr / 10^k, d) with k > d —
    the quotient's decimal grid is finer than the rounding grain, so an
    exact value can sit ON the half boundary and the two engines'
    double-ROUND tie-breaks diverge (the ROUND(us/1e6, 3) class).
    Returns the offending argument snippets."""
    bad = []
    for arg in _round_call_args(text):
        m_d = _LAST_ARG_INT.search(arg.strip())
        if not m_d:
            continue
        d = int(m_d.group(1))
        for m_k in _DIV_POW10.finditer(arg):
            k = int(m_k.group(1)) if m_k.group(1) else len(m_k.group(2))
            if k > d:
                bad.append((" ".join(arg.split())[:100], k, d))
                break
    return bad


def _alias_expressions(sql: str, col: str):
    """Extract each expression aliased ``AS col`` (backwards paren-
    balanced scan to the enclosing comma / SELECT at depth 0)."""
    out = []
    for mt in re.finditer(rf"\bAS\s+{re.escape(col)}\b", sql, re.I):
        depth = 0
        j = mt.start() - 1
        start = 0
        while j >= 0:
            ch = sql[j]
            if ch == ")":
                depth += 1
            elif ch == "(":
                if depth == 0:
                    start = j + 1
                    break
                depth -= 1
            elif ch == "," and depth == 0:
                start = j + 1
                break
            j -= 1
        out.append(sql[start : mt.start()])
    return out


# tokens never chased as column references when walking an aliasing
# expression back to its accumulation site (SQL keywords / type names —
# "CAST(x AS DOUBLE)" must not make 'DOUBLE' a chase target)
_NO_CHASE = {
    "AS", "CAST", "ROUND", "SUM", "AVG", "MIN", "MAX", "COUNT", "OVER",
    "PARTITION", "BY", "ORDER", "ROWS", "RANGE", "BETWEEN", "PRECEDING",
    "FOLLOWING", "CURRENT", "ROW", "AND", "OR", "NOT", "CASE", "WHEN",
    "THEN", "ELSE", "END", "IN", "IS", "NULL", "COALESCE", "NULLIF",
    "DOUBLE", "INT", "INTEGER", "BIGINT", "HUGEINT", "SMALLINT",
    "VARCHAR", "DATE", "TIMESTAMP", "BOOLEAN", "DECIMAL", "FLOOR",
    "CEIL", "ABS", "GREATEST", "LEAST", "DISTINCT", "FILTER", "WHERE",
}


def _decimal_backed(sql: str, col: str, _seen: frozenset = frozenset()) -> bool:
    """True when the output column ``col`` is DECIMAL-accumulated —
    exact in both engines, so magnitude is not a float-determinism
    hazard (order-independent by construction).  Chases identifier
    indirection so the house two-stage shape
    (``SUM(CAST(x AS DECIMAL(18,2))) AS tp`` then
    ``CAST(ROUND(tp, 2) AS DOUBLE) AS total_price``) is recognized.
    At the output column every aliasing site must be backed; a chased
    intermediate counts as backed when ANY of its aliasing sites is
    (UNION branches / qualified t.p re-aliases make per-site textual
    attribution ambiguous — the sf1 sim remains the value backstop)."""
    if col in _seen or len(_seen) > 6:
        return False
    exprs = _alias_expressions(sql, col)
    if not exprs:
        return False

    def expr_backed(e: str) -> bool:
        if "DECIMAL" in e.upper():
            return True
        idents = {
            t for t in re.findall(r"[A-Za-z_]\w*", e)
            if t.upper() not in _NO_CHASE
        }
        return any(_decimal_backed(sql, t, _seen | {col}) for t in idents)

    if _seen:  # chased intermediate: any backed site suffices
        return any(expr_backed(e) for e in exprs)
    return all(expr_backed(e) for e in exprs)


def _effective_decimals(values) -> int | None:
    """Smallest d in 0..9 with round(v, d) == v for all values, else None."""
    vals = [float(v) for v in values if v is not None and v == v and math.isfinite(float(v))]
    if not vals:
        return 0
    for d in range(10):
        if all(round(v, d) == v for v in vals):
            return d
    return None


def _column_stats(con, sql):
    rel = con.execute(sql)
    cols = [d[0] for d in rel.description]
    rows = rel.fetchall()
    stats = {}
    if not rows:
        return stats
    for ci, col in enumerate(cols):
        vals = [r[ci] for r in rows]
        floats = [v for v in vals if isinstance(v, float)]
        if not floats or len(floats) < sum(v is not None for v in vals):
            continue
        mag = max(
            (abs(v) for v in floats if v == v and math.isfinite(v)), default=0.0
        )
        stats[col] = (mag, _effective_decimals(floats))
    return stats


def _connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def lint(names=None):
    import __spark_entry__ as entrymod

    con = _connect(SF_DIR)
    con_small = _connect(SF_SMALL) if os.path.isdir(SF_SMALL) else None
    oracles = entrymod.oracle_sql()
    targets = names or sorted(oracles)
    hazards, unrounded, errors, ties = [], [], [], []
    for name in targets:
        sql = oracles.get(name)
        if sql is None:
            errors.append((name, "no oracle"))
            continue
        for snippet, k, d in scan_tie_patterns(sql):
            ties.append((name, f"oracle ROUND(../1e{k}, {d}): {snippet}"))
        try:
            stats = _column_stats(con, sql)
        except Exception as exc:  # noqa: BLE001
            errors.append((name, f"{type(exc).__name__}: {exc}"))
            continue
        stats_small = {}
        if con_small is not None and stats:
            try:
                stats_small = _column_stats(con_small, sql)
            except Exception:  # noqa: BLE001
                stats_small = {}
        for col, (mag, d) in stats.items():
            if f"{name}.{col}" in ALLOW:
                continue
            if d is None:
                if mag > THRESHOLD:
                    hazards.append((name, col, mag, "raw"))
                else:
                    unrounded.append((name, col, mag))
                continue
            demand = mag * 10**d
            if demand > THRESHOLD:
                hazards.append((name, col, mag, f"{d}dp→{demand:.1e}"))
                continue
            # sf1 extrapolation: two decades above the small fixture at
            # the column's own observed per-decade growth; DECIMAL-
            # accumulated columns are exact and exempt from this gate
            small = stats_small.get(col)
            if small and small[0] > 0:
                growth = max(mag / small[0], 1.0)
                demand_sf1 = mag * growth * growth * 10**d
                if demand_sf1 > THRESHOLD and not _decimal_backed(sql, col):
                    hazards.append(
                        (name, col, mag,
                         f"{d}dp sf1-extrapolated→{demand_sf1:.1e} "
                         f"(growth {growth:.1f}x/decade, float-accumulated)")
                    )
    ties.extend(scan_spark_sources())
    return hazards, unrounded, errors, ties


def scan_spark_sources(pkg_dir=None):
    """Run the §50 tie scan over the package's Python sources too —
    F.round((a - b) / 1e6, 3) on the Spark side is the same generator."""
    pkg_dir = pkg_dir or os.path.join(
        REPO, "lakehouse_for_data_streaming_and_analysis_spark"
    )
    ties = []
    for root, _dirs, files in os.walk(pkg_dir):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(root, fn)
            with open(path, encoding="utf-8") as fh:
                # strip # comments: the house convention documents the
                # anti-pattern ("not ROUND(x/1e6,3)") next to each fix
                text = "\n".join(
                    line.split("#", 1)[0] for line in fh.read().splitlines()
                )
            rel = os.path.relpath(path, REPO)
            for snippet, k, d in scan_tie_patterns(text):
                ties.append((rel, f"F.round(../1e{k}, {d}): {snippet}"))
    return ties


def main() -> int:
    names = sys.argv[1:] or None
    hazards, unrounded, errors, ties = lint(names)
    for name, col, mag, why in hazards:
        print(f"HAZARD  {name}.{col}: |max|={mag:.4g} {why} "
              f"(> {THRESHOLD:.0e} sig-digit budget)")
    for name, why in ties:
        print(f"TIE     {name}: {why} — use the integer half-up carrier "
              f"(DECISIONS 50)")
    for name, col, mag in unrounded:
        print(f"note    {name}.{col}: unrounded float output (|max|={mag:.4g})")
    for name, err in errors:
        print(f"ERROR   {name}: {err}")
    n = "all" if names is None else len(names)
    print(
        f"checked {n} oracles @ {SF_DIR} (extrapolated from {SF_SMALL}): "
        f"{len(hazards)} hazardous, {len(ties)} tie-pattern, "
        f"{len(unrounded)} unrounded-note, {len(errors)} errors"
    )
    return 1 if hazards or ties or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
