"""SCD Type-2 dimension toolkit (SURVEY.md §2.4 J3/J4, §7.1 M2).

Reference choreography (populate_dim.py:112-171):
  1. build hashed candidates from the source snapshot
     (sha2(concat_ws("~", tracked...)) change-detection hash);
  2. left-anti join against current rows -> genuinely new versions;
  3. expire matched-but-changed current rows (is_current='N',
     end_date=today)  [Delta MERGE in the reference];
  4. assign surrogate keys above the current max and append.

This rebuild expresses the merge as pure DataFrame algebra returning
the *next dimension state* — storage-agnostic (write it to Delta with
DeltaTable.merge when available, or overwrite parquet). The whole
step is one shuffle on the business key; with Delta the expire
becomes an in-place MERGE.

Idempotency: applying the same snapshot twice is a no-op (the
anti-join on (key, hash) finds nothing new) — pinned by tests.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import row_hash
from ..operators.windows import surrogate_keys


def hash_candidates(
    snapshot: DataFrame, business_key: str, tracked: Sequence[str]
) -> DataFrame:
    """Step 1: candidate rows with the change-detection hash
    (populate_dim.py:112-129)."""
    return snapshot.withColumn(
        "hash", row_hash([F.col(c).cast("string") for c in tracked])
    )


def empty_dim(candidates: DataFrame, as_of: str) -> DataFrame:
    """First-run seed: every candidate becomes a current row
    (populate_dim.py:97-109 except-branch semantics)."""
    keyed = surrogate_keys(candidates, [candidates.columns[0], "hash"])
    return keyed.select(
        "surrogate_key",
        *candidates.columns,
        F.lit(as_of).cast("date").alias("start_date"),
        F.lit("9999-12-31").cast("date").alias("end_date"),
        F.lit("Y").alias("is_current"),
    )


def scd2_apply(
    dim: DataFrame,
    candidates: DataFrame,
    business_key: str,
    as_of: str,
) -> DataFrame:
    """Steps 2-4 as one transformation: returns the next dim state.

    - current rows whose (key) matches a candidate with a *different*
      hash are expired (J4 merge semantics: whenMatchedUpdate with
      hash <> updates.hash, populate_dim.py:153-163);
    - candidates whose (key, hash) is absent from current rows are
      appended as new current versions keyed above max surrogate
      (populate_dim.py:139-151);
    - history rows pass through untouched.
    """
    cur = dim.filter(F.col("is_current") == "Y")
    hist = dim.filter(F.col("is_current") != "Y")

    cand_keys = candidates.select(
        F.col(business_key).alias("__bk"), F.col("hash").alias("__hash")
    )
    # expire: current row whose key matches but hash changed
    expired_flag = cur.join(
        F.broadcast(cand_keys),
        (cur[business_key] == F.col("__bk")) & (cur["hash"] != F.col("__hash")),
        "left_semi",
    )
    expired = expired_flag.withColumn(
        "end_date", F.lit(as_of).cast("date")
    ).withColumn("is_current", F.lit("N"))
    unchanged = cur.join(
        F.broadcast(expired_flag.select(business_key)), [business_key], "left_anti"
    )

    # new versions: candidate (key, hash) not present among current rows
    new_rows = candidates.join(
        cur.select(business_key, "hash"), [business_key, "hash"], "left_anti"
    )
    max_key = (dim.agg(F.max("surrogate_key")).collect()[0][0]) or 0
    new_keyed = surrogate_keys(new_rows, [business_key, "hash"], offset=max_key).select(
        "surrogate_key",
        *candidates.columns,
        F.lit(as_of).cast("date").alias("start_date"),
        F.lit("9999-12-31").cast("date").alias("end_date"),
        F.lit("Y").alias("is_current"),
    )
    cols = dim.columns
    return (
        hist.select(cols)
        .unionByName(expired.select(cols))
        .unionByName(unchanged.select(cols))
        .unionByName(new_keyed.select(cols))
    )


def scd2_apply_delta(table, candidates: DataFrame, business_key: str, as_of: str):
    """The reference's ACTUAL two-step SCD-2 choreography against the
    real transaction log (populate_dim.py:153-171): one in-place MERGE
    expiring matched-but-changed current rows (whenMatchedUpdate SET
    end_date/is_current with a hash-differs condition), then an append
    of the new versions keyed above the current max surrogate. Two
    commits — an auditor sees MERGE + WRITE in DESCRIBE HISTORY, as
    they would on Delta. Equivalence with the single-shot DataFrame
    algebra (``scd2_apply``) is pinned in tests/test_deltalog.py.

    ``table`` is a delta.DeltaishTable holding the dimension.
    """
    dim = table.read()
    cur = dim.filter(F.col("is_current") == "Y")
    table.merge(
        candidates.select(business_key, "hash"),
        [business_key],
        matched_update={
            "end_date": F.lit(as_of).cast("date"),
            "is_current": F.lit("N"),
        },
        matched_condition=(F.col("t.hash") != F.col("s.hash"))
        & (F.col("t.is_current") == F.lit("Y")),
        insert=False,
    )
    new_rows = candidates.join(
        cur.select(business_key, "hash"), [business_key, "hash"], "left_anti"
    )
    max_key = (dim.agg(F.max("surrogate_key")).collect()[0][0]) or 0
    new_keyed = surrogate_keys(
        new_rows, [business_key, "hash"], offset=max_key
    ).select(
        "surrogate_key",
        *candidates.columns,
        F.lit(as_of).cast("date").alias("start_date"),
        F.lit("9999-12-31").cast("date").alias("end_date"),
        F.lit("Y").alias("is_current"),
    )
    table.append(new_keyed.select(*dim.columns))
    return table.read()
