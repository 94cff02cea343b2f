"""Streaming sources (SURVEY.md §2.1 S1/S3/S8 + test harness).

kafka_ticks: the reference's exact source shape — Kafka JSON payloads
  {"<coin>": "<price>", "timestamp": <unix-sec>} decoded to typed
  columns (reference: etl.py:16-25, streaming_pipeline.py:41-42).
file_replay: deterministic parquet-directory stream for tests — one
  file per micro-batch (maxFilesPerTrigger=1), standing in for the
  Kafka producer (S8) which is out of engine scope.
rate_ticks: synthetic tick stream from the rate source for soak tests.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def tick_schema(coin: str) -> T.StructType:
    """Hardcoded JSON schema, as the reference declares it
    (etl.py:16-19): price arrives as a *string*."""
    return T.StructType(
        [
            T.StructField(coin, T.StringType()),
            T.StructField("timestamp", T.DoubleType()),
        ]
    )


def kafka_reader_options(
    topic: str,
    brokers: str = "localhost:9092",
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
    group_id_prefix: str | None = None,
) -> dict[str, str]:
    """The full Kafka source option surface as a pure dict, so the
    contract is unit-testable without the spark-sql-kafka jar on the
    classpath. Keys are the documented spark-kafka source options:
      - startingOffsets: "latest" | "earliest" | per-partition JSON —
        where a NEW query begins (restarts resume from the checkpoint).
      - maxOffsetsPerTrigger: per-micro-batch record cap, the
        backpressure knob that bounds batch latency at 100 TB/day
        ingest (reference runs uncapped; streaming_pipeline.py:41-42).
      - failOnDataLoss: false tolerates aged-out offsets after long
        downtime instead of poisoning the query.
      - groupIdPrefix: stable consumer-group naming for lag monitoring.
    """
    opts = {
        "kafka.bootstrap.servers": brokers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if group_id_prefix is not None:
        opts["groupIdPrefix"] = group_id_prefix
    return opts


def kafka_ticks(
    spark: SparkSession,
    topic: str,
    coin: str,
    brokers: str = "localhost:9092",
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = True,
) -> DataFrame:
    """S1 + P1-P3: Kafka source -> decode -> from_json -> typed columns.
    Requires the spark-sql-kafka package on the classpath (not in the
    test env — the option contract is pinned via kafka_reader_options
    and the decode path via parse_ticks on file streams)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(
        topic,
        brokers,
        starting_offsets,
        max_offsets_per_trigger,
        fail_on_data_loss,
    ).items():
        reader = reader.option(k, v)
    return parse_ticks(reader.load(), coin)


def parse_ticks(raw: DataFrame, coin: str) -> DataFrame:
    """P1-P3 on any frame with a binary/string ``value`` column:
    cast -> from_json -> flatten -> typed price + event-time
    (etl.py:20-25; tz localization is the caller's choice)."""
    return (
        raw.selectExpr("CAST(value AS STRING) AS json_str")
        .select(F.from_json("json_str", tick_schema(coin)).alias("data"))
        .select("data.*")
        .withColumn(coin, F.col(coin).cast("double"))
        .withColumn(
            "timestamp", F.to_timestamp(F.from_unixtime(F.col("timestamp")))
        )
    )


def file_replay(
    spark: SparkSession, dir_path: str, schema: T.StructType, files_per_trigger: int = 1
) -> DataFrame:
    """Deterministic replay: a parquet dir pre-split into N files,
    streamed ``files_per_trigger`` per micro-batch in filename order."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(dir_path)
    )


def write_replay_batches(dfs: list[DataFrame], dir_path: str) -> None:
    """Write each frame as ONE parquet file with strictly increasing
    mtimes and ordered names, so the file source delivers exactly one
    frame per micro-batch, in list order. (FileStreamSource admits
    files oldest-mtime-first; back-to-back writes can tie, so mtimes
    are pinned explicitly.) Test-harness utility — driver-side."""
    import glob
    import shutil
    import tempfile

    os.makedirs(dir_path, exist_ok=True)
    base = 1_600_000_000
    for i, df in enumerate(dfs):
        tmp = tempfile.mkdtemp(dir=dir_path)
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        dest = os.path.join(dir_path, f"{i:05d}.parquet")
        shutil.move(part, dest)
        shutil.rmtree(tmp, ignore_errors=True)
        os.utime(dest, (base + i, base + i))


def write_replay_files(df: DataFrame, dir_path: str, n_files: int, order_col: str) -> None:
    """Split a batch frame into n sorted chunks replayed one per
    micro-batch in ``order_col`` order. Test-harness utility."""
    rows = df.orderBy(order_col).collect()
    chunk = max(1, (len(rows) + n_files - 1) // n_files)
    spark = df.sparkSession
    dfs = [
        spark.createDataFrame(rows[i : i + chunk], df.schema)
        for i in range(0, len(rows), chunk)
    ]
    write_replay_batches(dfs, dir_path)


def rate_ticks(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """Synthetic tick stream: rate source -> price walk keyed by value.
    Stands in for the reference's 1-msg/3s WebSocket producer."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .select(
            F.col("timestamp"),
            (100.0 + F.pmod(F.col("value") * 7, F.lit(50)).cast("double")).alias(
                "price"
            ),
            F.pmod(F.col("value"), F.lit(2)).cast("int").alias("coin_id"),
        )
    )


def parse_with_quarantine(
    raw: DataFrame,
    payload_col: str,
    declared: str | T.StructType,
    quarantine_col: str = "quarantine",
) -> DataFrame:
    """Schema-on-read against a DECLARED payload schema with drift
    QUARANTINE (VERDICT r8 ask #6): the reference's parse surface is a
    fixed StructType (Sourcecode/spark/etl.py:16-19), which fails or
    silently nulls when real bronze payloads drift. This wrapper keeps
    the declared typed columns AND routes drifted rows into a struct
    column instead of failing the stream:

    * undeclared keys    -> reason 'undeclared_keys:<sorted names>'
    * declared-field type conflict (key present, value non-null, cast
      to the declared type fails) -> reason 'type_conflict:<fields>'
    * payload the string-map census cannot represent at all (nested
      object/array values, malformed JSON, non-object document) ->
      reason 'unparseable_payload' — without this branch the NULL
      probe map made size(undeclared) NULL and such rows slipped
      through as "clean" with all-null declared fields (ADVICE r9)

    Clean rows carry ``quarantine = NULL``; drifted rows carry
    ``struct(reason, payload)`` with the RAW payload preserved for
    replay/repair, while their still-parseable declared fields remain
    populated. Pure column expressions (one from_json to MAP for the
    census, one to the declared struct) — streaming-safe, no Python,
    no extra shuffle; the batch-side census twin is
    queries/observability.schema_drift_audit.
    """
    schema = (
        T._parse_datatype_string(declared)
        if isinstance(declared, str)
        else declared
    )
    fields = [f.name for f in schema.fields]
    payload = F.col(payload_col)
    probe = F.from_json(payload, "map<string,string>")
    typed = F.from_json(payload, schema)
    undeclared = F.array_sort(
        F.filter(
            F.map_keys(probe),
            lambda k: ~k.isin(*fields) if fields else F.lit(True),
        )
    )
    conflicts = F.array_sort(
        F.array_compact(
            F.array(
                *[
                    F.when(
                        F.map_contains_key(probe, f.name)
                        & F.element_at(probe, F.lit(f.name)).isNotNull()
                        & typed.getField(f.name).isNull(),
                        F.lit(f.name),
                    )
                    for f in schema.fields
                ]
            )
        )
    )
    reason = F.concat_ws(
        ";",
        F.when(
            F.size(undeclared) > 0,
            F.concat(
                F.lit("undeclared_keys:"), F.array_join(undeclared, ",")
            ),
        ),
        F.when(
            F.size(conflicts) > 0,
            F.concat(F.lit("type_conflict:"), F.array_join(conflicts, ",")),
        ),
    )
    quarantine = F.when(
        payload.isNotNull() & probe.isNull(),
        F.struct(
            F.lit("unparseable_payload").alias("reason"),
            payload.alias("payload"),
        ),
    ).when(
        (F.size(undeclared) > 0) | (F.size(conflicts) > 0),
        F.struct(reason.alias("reason"), payload.alias("payload")),
    )
    keep = [c for c in raw.columns if c != payload_col]
    return raw.select(
        *keep,
        *[typed.getField(f).alias(f) for f in fields],
        quarantine.alias(quarantine_col),
    )
