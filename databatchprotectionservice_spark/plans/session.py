"""SparkSession construction tuned for the engine.

Defaults are sized for the test rig (local[N] with N from
``SPARK_GRAFT_CPUS``) but every knob is chosen for cluster scale:

* AQE on (runtime re-planning, skew-join splitting, partition coalescing)
  so plans survive 100x data growth without manual retuning.
* ``spark.sql.shuffle.partitions`` defaults to the core count locally; on a
  real cluster AQE coalesces from a high initial number, so we set the
  initial high-ish and let AQE shrink.
* Arrow execution enabled — every protect/unprotect UDF crosses the
  JVM<->Python boundary as Arrow batches, never row-by-row pickling.
* Timezone pinned to UTC so timestamp semantics match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "databatchprotectionservice_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    # executor python workers must be able to import this package: export
    # its parent directory on PYTHONPATH before the session starts (UDF
    # closures are pickled by reference to the module)
    pkg_parent = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_parent}{os.pathsep}{existing}" if existing else pkg_parent
        )

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # r15 audit: size-based coalescing (parallelismFirst=false +
        # advisory target) was measured with a corrected interleaved
        # A/B (scripts/ab_conf.py: cache cleared between sides, order
        # alternated per rep) and came out NEUTRAL at sf0.1 (0.99-1.02x
        # over 16 queries) — the dramatic first-pass "wins" were one
        # side riding the other's internal .cache().  Keeping Spark's
        # parallelism-first default; on a production cluster with
        # GB-TB shuffles set advisoryPartitionSizeInBytes=64m..256m
        # per the tuning guide (extra_conf / spark-defaults).
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet carries TIMESTAMP(NANOS); Spark has no nanos type,
        # so read them as raw long and convert at the query layer
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Spark 4.1's ChecksumCheckpointFileManager spawns a 64-thread
        # pool PER CHECKPOINT LOCATION and never shuts it down when a
        # short availableNow query stops; this engine's streaming
        # queries use a fresh temp checkpoint per run, so the pools
        # accumulate (~64 threads/run, idle-expiry ~1 min) and a dense
        # run of streaming queries degrades late TWS starts by ~2x —
        # the r11 bench bimodality, root-caused in
        # scripts/tws_leak_probe.py (TWS_LEAK_PROBE_r12.json: 576
        # leaked threads after 9 runs; timings pin to the ~5.5 s floor
        # with the checksum manager off).  Checkpoint-file checksums
        # detect corruption on LONG-LIVED checkpoints; for throwaway
        # availableNow checkpoints they buy nothing.  Re-enable per
        # session for durable production checkpoints.
        .config(
            "spark.sql.streaming.checkpoint.fileChecksum.enabled",
            "false",
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # pin python workers to this interpreter for reproducibility
        .config("spark.pyspark.python", os.environ.get("PYSPARK_PYTHON", "python3"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
