"""SparkSession factory.

Re-expresses the reference's session config surface
(reference: data/notebooks/Sourcecode/AutomateTable.py:35-70) as a
plain factory: AQE on, tuned shuffle partitions, fair scheduling for
concurrent streaming queries, Arrow for pandas interop. The
MinIO/S3A/metastore/Delta-jar specifics of the reference are
deployment config, not engine capability, and are omitted; a real
cluster deployment would add them via ``extra_conf``.

Scale notes (100 TB design):
  - shuffle partitions default to cores locally; on a cluster set
    ``spark.sql.shuffle.partitions`` ~ 2-3x total cores (or let AQE
    coalesce from a high initial number).
  - AQE handles skew-join splitting + partition coalescing at runtime.
  - ``spark.sql.files.maxPartitionBytes`` left at 128m: at 100 TB that
    is ~800k input splits, which is the right granularity for a
    1000-executor cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def _default_driver_mem() -> str:
    """24g where the host affords it, else half of physical RAM (min
    2g). The 24g figure is measured (see the GC note at the config
    site); halving leaves room for the OS, Python workers, and Arrow
    buffers on smaller machines."""
    try:
        total_gib = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES") / (1 << 30)
    except (ValueError, OSError, AttributeError):
        return "8g"
    return f"{max(2, min(24, int(total_gib // 2)))}g"


def get_spark(
    app_name: str = "lakehouse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    streaming: bool = False,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's config surface."""
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_CPUS
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # fixture events.parquet carries TIMESTAMP(NANOS); read as long and
        # convert in the catalog (Spark has no ns timestamp type)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # INT96 (the Spark default) is deprecated AND carries no
        # footer min/max statistics, which would blind timestamp-based
        # file skipping (delta/table.file_footer_stats, TimeDelay-style
        # commit stats). Standard µs timestamps restore both.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.ui.enabled", "false")
        # r11 (ADVICE r10 #1): the outer/full-outer attribution drains
        # rely on the engine's automatic no-data micro-batch under
        # availableNow to flush buffered outer rows after the last
        # sentinel advanced the watermark. That batch is governed by
        # this conf (default true today, but config/version-contingent)
        # — pin it explicitly so a changed default can never silently
        # drop unmatched rows; the drains additionally assert at least
        # one null-side row was flushed (queries/pipeline.py).
        .config("spark.sql.streaming.noDataMicroBatches.enabled", "true")
        # r10 OPT (guide §1.2 per-task work, fleet-wide): the codegen
        # class cache is a STATIC conf defaulting to 100 entries; a
        # 380-query inventory churns far past that, so every query —
        # and every iteration of literal-parameterized iterative
        # queries — recompiled generated classes Janino had already
        # built (observed: JIT-flagged queries ran no faster warm than
        # cold). 2000 entries keeps the working set resident; the cost
        # is bounded driver memory for class metadata, the same trade a
        # long-lived production driver makes. Results are unaffected —
        # this caches compiled code, never data.
        .config(
            "spark.sql.codegen.cache.maxEntries",
            os.environ.get("SPARK_GRAFT_CODEGEN_CACHE", "2000"),
        )
        # r10 OPT (guide §6 / §1.2): the transaction-log audits issue
        # many small parquet write jobs (table lifecycles are their
        # semantics). Committer algorithm v2 commits task output by a
        # single rename at task commit instead of v1's task->job->final
        # double rename pass (the job-commit pass is sequential on the
        # driver), and nothing in this engine reads _SUCCESS markers.
        # Both are the standard settings for filesystems with atomic
        # rename; object-store deployments would override via
        # extra_conf (documented in OPTIMIZATION_r10.md).
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version",
            "2",
        )
        .config(
            "spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs",
            "false",
        )
        # local[N] hosts all executor threads inside the driver JVM, so
        # the single heap must be sized for N concurrent tasks: at 8g/32
        # threads, full-suite runs showed 20 s GC stalls hitting random
        # queries (measured 190 s -> 93 s total moving 8g -> 24g). On a
        # real cluster this is spark.executor.memory instead. The 24g
        # target is capped at half of physical RAM so smaller hosts
        # neither fail JVM startup nor swap (ADVICE r01).
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()),
        )
    )
    if streaming:
        # Reference runs 4 concurrent streaming queries under a FAIR pool
        # (AutomateTable.py:64-66, fairscheduler.xml).
        b = b.config("spark.scheduler.mode", "FAIR")
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
