"""End-to-end medallion pipeline on the REAL transaction log — the
reference's full wiring (streaming_pipeline.py): tick stream ->
bronze Deltaish table (exactly-once txn sink) -> bronze re-read as a
stream -> star-schema fact enrichment (dim broadcast join,
date_id/time_id keys) -> partitioned fact Deltaish table -> TimeDelay
latency surface read from the fact's own _delta_log."""

from __future__ import annotations

from pyspark.sql import functions as F

from lakehouse_for_data_streaming_and_analysis_spark.catalog import load_table
from lakehouse_for_data_streaming_and_analysis_spark.delta import DeltaishTable, commit_stats_df
from lakehouse_for_data_streaming_and_analysis_spark.streaming.fact import enrich_fact

from .conftest import SF_DIR


def _ticks(spark):
    """Tick stream shaped like the reference's coin feed: two coins,
    price, event-time, and the 1-minute average the bronze schema
    carries (etl.py:34-46)."""
    ev = load_table(spark, SF_DIR, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    w_avg = (
        ev.groupBy(
            F.col("event_type"), F.window("ts", "1 minute").alias("w")
        )
        .agg(F.avg("value").alias("average_1minute"))
        .select(
            F.col("event_type").alias("w_type"),
            F.col("w.start").alias("w_start"),
            "average_1minute",
        )
    )
    return (
        ev.join(
            w_avg,
            (F.col("event_type") == F.col("w_type"))
            & (F.date_trunc("minute", "ts") == F.col("w_start")),
        )
        .select(
            F.when(F.col("event_type") == "click", "bitcoin")
            .otherwise("ethereum")
            .alias("coin"),
            F.col("value").alias("price"),
            F.col("ts").alias("timestamp"),
            "average_1minute",
        )
    )


def test_full_medallion_pipeline_on_real_log(spark, tmp_path):
    ticks = _ticks(spark)
    n_ticks = ticks.count()
    src_dir = str(tmp_path / "feed")
    ticks.repartition(3).write.parquet(src_dir)

    # ---- bronze: stream -> Deltaish append-only table, exactly-once
    bronze = DeltaishTable.create(
        spark, str(tmp_path / "bronze"), ticks.limit(0)
    )
    stream = (
        spark.readStream.schema(ticks.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            bronze.streaming_sink(txn_app_id="bronze_writer")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt_bronze"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    assert bronze.read().count() == n_ticks
    assert bronze.version >= 3  # one commit per micro-batch

    # ---- dim: SCD-2-style current coin dimension
    dim = spark.createDataFrame(
        [(1, "bitcoin", 19_000_000.0), (2, "ethereum", 120_000_000.0)],
        "coin_id int, name string, supply double",
    )

    # ---- fact: bronze re-read AS A STREAM -> enrichment -> partitioned
    # fact table, exactly-once
    fact_schema_df = enrich_fact(
        bronze.read(),
        dim,
        price_col="price",
        join_on=F.col("coin") == F.col("name"),
        last_price=50.0,
        clock=F.lit("2024-06-18 10:00:00").cast("timestamp"),
    )
    fact = DeltaishTable.create(
        spark,
        str(tmp_path / "fact"),
        fact_schema_df.limit(0),
        partition_by=("coin_id",),
    )

    def fact_batch(batch_df, batch_id):
        enriched = enrich_fact(
            batch_df,
            dim,
            price_col="price",
            join_on=F.col("coin") == F.col("name"),
            last_price=50.0,
            clock=F.lit("2024-06-18 10:00:00").cast("timestamp"),
        )
        if not enriched.isEmpty():
            fact.append(
                enriched, txn_app_id="fact_writer", txn_version=batch_id
            )

    q2 = (
        bronze.as_stream()
        .writeStream.foreachBatch(fact_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt_fact"))
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(300)

    got = fact.read()
    assert got.count() == n_ticks
    assert got.columns == [
        "coin_id", "date_id", "time_id", "price", "market_cap",
        "change_percent_last_day", "average_1minute", "created_at",
    ]
    # star keys and measures hold tick-for-tick
    sample = got.filter(F.col("coin_id") == 1)
    assert sample.count() == ticks.filter(F.col("coin") == "bitcoin").count()
    assert (
        sample.filter(
            F.col("market_cap") != F.col("price") * 19_000_000.0
        ).count()
        == 0
    )
    # partition pruning through the log's partitionValues
    pruned = fact.files_matching("coin_id", 1, 1)
    assert 0 < len(pruned) < len(fact._snapshot().files)

    # ---- observability: the TimeDelay surface over the REAL _delta_log
    stats = commit_stats_df(spark, fact.path, "time_id")
    data_commits = stats.filter(F.col("numRecords") > 0)
    assert data_commits.count() >= 1
    assert (
        data_commits.filter(F.col("min_event").isNull()).count() == 0
    ), "per-commit minValues must be present for latency analytics"
    total = stats.agg(F.sum("numRecords")).collect()[0][0]
    assert total == n_ticks


def test_modern_features_compose_on_silver(spark, tmp_path):
    """The round-4 features COMPOSE on one silver table: row
    tracking + change data feed + in-commit timestamps + liquid
    clustering + a CHECK constraint, all active while MERGE batches
    stream in. Verifies the cross-feature invariants no single-feature
    test sees: (a) row ids stay stable across merge + clustering
    OPTIMIZE, (b) the change feed attributes each merge while the
    clustering rewrite emits NO feed rows (dataChange=false), (c)
    incremental-fold of the feed equals the final snapshot, (d) ICT
    keeps version timestamps strictly increasing throughout."""
    from lakehouse_for_data_streaming_and_analysis_spark.delta import DeltaishTable
    from lakehouse_for_data_streaming_and_analysis_spark.delta import log as dlog

    silver = DeltaishTable.create(
        spark,
        str(tmp_path / "silver"),
        spark.createDataFrame(
            [(i, float(i), "init") for i in range(20)],
            "k long, v double, src string",
        ),
    )
    silver.enable_change_data_feed()
    silver.enable_in_commit_timestamps()
    silver.enable_row_tracking()
    silver.cluster_by(["k", "v"])
    silver.add_check_constraint("v_nonneg", "v >= 0")
    v_setup = silver.version

    ids0 = {
        r.k: r._row_id for r in silver.read_with_row_ids().collect()
    }
    # three merge micro-batches: updates overlap, inserts extend
    for batch, lo in enumerate((0, 10, 20)):
        silver.merge(
            spark.createDataFrame(
                [(k, float(k) + 100.0 * (batch + 1), f"b{batch}")
                 for k in range(lo, lo + 10)],
                "k long, v double, src string",
            ),
            ["k"],
        )
    v_merges = silver.version
    silver.optimize()  # liquid clustering rewrite
    assert silver.version == v_merges + 1

    # (a) ids stable for every pre-existing key
    ids1 = {
        r.k: r._row_id for r in silver.read_with_row_ids().collect()
    }
    assert all(ids1[k] == ids0[k] for k in ids0)
    assert len(set(ids1.values())) == 30

    # (b) feed covers the merges; the OPTIMIZE emits nothing
    feed = silver.read_change_feed(v_setup, silver.version)
    assert feed.filter(
        F.col("_commit_version") > v_merges
    ).count() == 0
    by_type = {
        r["_change_type"]: r["n"]
        for r in feed.groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert by_type["insert"] == 10  # keys 20-29
    assert by_type["update_preimage"] == by_type["update_postimage"] == 20

    # (c) signed fold of the feed == final snapshot state
    folded = (
        feed.withColumn(
            "w",
            F.when(
                F.col("_change_type").isin("insert", "update_postimage"),
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )
        .groupBy("k")
        .agg(F.sum(F.col("v") * F.col("w")).alias("dv"))
    )
    base = silver.read(version=v_setup).groupBy("k").agg(
        F.sum("v").alias("bv")
    )
    final = silver.read().groupBy("k").agg(F.sum("v").alias("fv"))
    joined = (
        final.join(base, "k", "left")
        .join(folded, "k", "left")
        .select(
            "k",
            (
                F.coalesce("bv", F.lit(0.0))
                + F.coalesce("dv", F.lit(0.0))
                - F.col("fv")
            ).alias("err"),
        )
    )
    assert joined.filter(F.abs(F.col("err")) > 1e-9).count() == 0

    # (d) ICT strictly increasing across every commit since enable
    icts = []
    for v in range(2, silver.version + 1):
        for a in dlog.read_commit(str(tmp_path / "silver"), v):
            if "commitInfo" in a and "inCommitTimestamp" in a["commitInfo"]:
                icts.append(a["commitInfo"]["inCommitTimestamp"])
    assert len(icts) == silver.version - 1
    assert all(b > a for a, b in zip(icts, icts[1:]))

    # CHECK constraint still bites through the whole stack
    import pytest as _pytest

    with _pytest.raises(ValueError, match="v_nonneg"):
        silver.append(
            spark.createDataFrame(
                [(99, -1.0, "bad")], "k long, v double, src string"
            )
        )
