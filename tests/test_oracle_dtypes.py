"""Fleet-wide output-dtype gate (DECISIONS.md §8).

The driver's correctness check hashes *typed* results, so any query
whose Spark output schema diverges from its DuckDB oracle's output
types fails ``hash_match`` even when every value is equal (round-1
post-mortem: 7 such failures, all aggregate-widening — DuckDB
``SUM(INTEGER)``→HUGEINT / ``SUM(DECIMAL(18,2))``→DECIMAL(38,2) vs
Spark BIGINT / DECIMAL(28,2)).  This test binds every oracle in DuckDB
(plan only) and analyzes every Spark query (no job execution), and
fails on ANY canonical-type divergence, so the whole inventory stays
hash-portable by construction.
"""

from __future__ import annotations

from tools.lint_oracle_dtypes import lint


def test_all_oracle_output_dtypes_match_spark():
    problems = lint()
    assert not problems, "\n".join(problems)


def test_all_oracle_round_precision_within_float64_budget():
    """Fleet rounding-precision gate (r7 post-mortem: ROUND(VAR_POP, 6)
    on a ~3e6 variance demanded 13 significant digits and hash-flipped
    across engines; r9 post-mortem: four sf0.01-green queries flipped
    at sf1 magnitudes). Executes every oracle at the test fixture,
    extrapolates float-accumulated magnitudes two decades up, and
    fails any column whose demanded precision exceeds the float64
    cross-engine reproducibility budget, plus any syntactic
    ROUND(x/10^k, d) tie pattern (DECISIONS 50)."""
    from tools.lint_round_precision import lint

    # the lint reads SPARK_GRAFT_SIM_SF_DIR (default sf0.01) — the
    # same fixture grain the driver hashes at
    hazards, _unrounded, errors, ties = lint()
    assert not errors, errors
    assert not hazards, hazards
    assert not ties, ties


def test_tie_pattern_scan_catches_reintroduced_duration_round():
    """The DECISIONS 50 class must stay structurally un-reintroducible:
    a deliberately planted ROUND(us/1e6, 3) (and its Spark F.round /
    divisor-as-zeros spellings) goes red, while the sanctioned integer
    half-up carrier and coarser-divisor roundings stay green."""
    from tools.lint_round_precision import scan_tie_patterns

    # the r9 sessionize red, verbatim shape
    assert scan_tie_patterns(
        "SELECT ROUND((epoch_us(p.ts) - epoch_us(c.ts)) / 1e6, 3) AS lag"
    )
    # Spark-side spelling
    assert scan_tie_patterns(
        "F.round((F.unix_micros('a') - F.unix_micros('b')) / 1e6, 3)"
    )
    # zeros literal spelling
    assert scan_tie_patterns("ROUND(us / 1000000, 3)")
    # ms at 2dp: divisor grid finer than the grain — still the class
    assert scan_tie_patterns("ROUND(ms / 1000, 2)")
    # sanctioned integer half-up carrier: no ROUND at all
    assert not scan_tie_patterns(
        "CAST((us + 500) // 1000 AS DOUBLE) / 1000"
    )
    # rounding FINER than the divisor grid cannot tie (market_cap shape)
    assert not scan_tie_patterns(
        "ROUND((p_retailprice - 1000) / 1000 * 100, 6)"
    )
