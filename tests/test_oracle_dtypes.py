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
    across engines). Executes every oracle at the test fixture and
    fails any float output column whose magnitude x 10^decimals
    exceeds the float64 cross-engine reproducibility budget."""
    from tools.lint_round_precision import lint

    # the lint reads SPARK_GRAFT_SIM_SF_DIR (default sf0.01) — the
    # same fixture grain the driver hashes at
    hazards, _unrounded, errors = lint()
    assert not errors, errors
    assert not hazards, hazards
