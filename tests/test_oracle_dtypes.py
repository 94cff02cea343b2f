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
    import os

    from tools.lint_round_precision import lint

    prev = os.environ.get("SPARK_GRAFT_SIM_SF_DIR")
    # the lint defaults to sf0.01; run it at the suite's fixture so
    # this gate stays cheap, and rely on the round-close sf0.01 run
    # for the full-magnitude check
    try:
        hazards, _unrounded, errors = lint()
    finally:
        if prev is not None:
            os.environ["SPARK_GRAFT_SIM_SF_DIR"] = prev
    assert not errors, errors
    assert not hazards, hazards
