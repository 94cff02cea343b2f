"""SCD-2 dimension toolkit tests (SURVEY.md M2): seed, change
detection, expiry, re-keying, idempotency."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_for_data_streaming_and_analysis_spark.dims import scd2


def _snapshot(spark, sf_dir, perturb=frozenset()):
    from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table

    n = load_table(spark, sf_dir, "nation")
    snap = n.select(
        F.col("n_nationkey").alias("coin_id"),
        F.col("n_name").alias("name"),
        (F.col("n_nationkey") * 1000.0).alias("supply"),
    )
    if perturb:
        snap = snap.withColumn(
            "supply",
            F.when(F.col("coin_id").isin(*perturb), F.col("supply") + 1).otherwise(
                F.col("supply")
            ),
        )
    return scd2.hash_candidates(snap, "coin_id", ["coin_id", "name", "supply"])


def test_seed_and_idempotency(spark, sf_dir):
    cand = _snapshot(spark, sf_dir)
    dim = scd2.empty_dim(cand, "2024-01-01")
    assert dim.count() == 25
    assert dim.filter(F.col("is_current") == "Y").count() == 25
    keys = [r[0] for r in dim.select("surrogate_key").orderBy("surrogate_key").collect()]
    assert keys == list(range(1, 26))

    # same snapshot again -> no change
    dim2 = scd2.scd2_apply(dim, cand, "coin_id", "2024-01-02")
    assert sorted(map(tuple, dim2.collect())) == sorted(map(tuple, dim.collect()))


def test_change_detection_and_expiry(spark, sf_dir):
    cand = _snapshot(spark, sf_dir)
    dim = scd2.empty_dim(cand, "2024-01-01")
    changed = {1, 2, 3, 4, 5}
    cand2 = _snapshot(spark, sf_dir, perturb=changed)

    dim2 = scd2.scd2_apply(dim, cand2, "coin_id", "2024-02-01")
    assert dim2.count() == 30  # 25 original + 5 new versions
    cur = dim2.filter(F.col("is_current") == "Y")
    assert cur.count() == 25
    expired = dim2.filter(F.col("is_current") == "N")
    assert sorted(r["coin_id"] for r in expired.collect()) == sorted(changed)
    assert all(str(r["end_date"]) == "2024-02-01" for r in expired.collect())
    # new versions keyed above the previous max (populate_dim.py:150)
    new_keys = [
        r["surrogate_key"]
        for r in dim2.join(expired.select("coin_id"), "coin_id")
        .filter(F.col("is_current") == "Y")
        .collect()
    ]
    assert sorted(new_keys) == list(range(26, 31))

    # applying the perturbed snapshot again is a no-op
    dim3 = scd2.scd2_apply(dim2, cand2, "coin_id", "2024-03-01")
    assert sorted(map(tuple, dim3.collect())) == sorted(map(tuple, dim2.collect()))
