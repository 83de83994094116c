"""SparkSession factory.

Local-mode settings tuned for the driver harness (local[32], single
JVM); every setting here is also the right default on a real cluster
except ``spark.driver.memory`` (cluster: set executor memory/cores via
the submit config instead).

Scale notes (100 TB design):
- AQE on: runtime shuffle-partition coalescing + skew-join splitting.
- ``spark.sql.shuffle.partitions`` is a *starting* number; AQE coalesces
  down. On a 1000-executor cluster you'd raise the initial value to
  ~2-3x total cores and let AQE trim.
- UTC session timezone pins timestamp semantics to the oracle's
  (DuckDB is UTC-naive).
- Arrow enabled: pandas UDF / toPandas paths are vectorized.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def tmp_dir() -> str:
    """Scratch root for sinks, stream sources, bucketed-table warehouse
    and streaming checkpoints. Defaults to tmpfs (/dev/shm): the local
    stand-in for what is cluster object storage in production — the
    data under it is all derivable, so volatility is fine and the
    page-cache-speed writes keep the harness measuring the engine, not
    the VM's disk."""
    return os.environ.get("SPARKCLIF_TMP", "/dev/shm/sparkclif")


def get_spark(app_name: str = "sparkclif", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    # Tuning escape hatches (default = cluster-right settings). AQE's
    # stage re-planning costs ~40-70 ms per query in local mode, which
    # matters for sub-second harness queries but is noise at cluster
    # query durations.
    aqe = os.environ.get("SPARKCLIF_AQE", "true")
    parts = os.environ.get("SPARKCLIF_SHUFFLE_PARTITIONS") or str(max(cpus, 8))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", parts)
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bigger Arrow batches amortize the per-batch JVM<->Python
        # framing for mapInPandas/applyInPandas kernels (measured -13%
        # on a 600k-row passthrough vs the 10k default); memory per
        # batch stays modest at testbed/cluster row widths
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Arrow-serialize row-at-a-time Python UDFs/UDTFs too: batches
        # cross the JVM<->Python boundary columnar instead of pickled
        # row-by-row (pure transport change — per-row call semantics,
        # and therefore results, are unchanged)
        .config("spark.sql.execution.pythonUDF.arrow.enabled", "true")
        .config("spark.sql.execution.pythonUDTF.arrow.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # v2 commits task output by direct rename into the destination
        # (v1 double-renames via the job attempt dir) — the standard
        # HDFS-era perf setting; on S3A-style object stores use the
        # cloud-native committers instead
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # local scratch sinks: skip the _SUCCESS marker job-commit file
        # and Hadoop's client-side .crc shadow files (ChecksumFileSystem
        # wraps every file: write goes through a CRC stream and creates
        # a second file per output — pure overhead on tmpfs, and
        # irrelevant on a cluster where sinks target hdfs:// or s3://
        # schemes that this file:// setting never touches). Measured
        # -30% on the 10 MB parquet roundtrip sink.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        # NOTE: session-global — disables client-side CRC generation
        # AND verification for EVERY file:// read/write (warehouse,
        # checkpoints, testdata), not just scratch sinks. Right for
        # the tmpfs testbed; a durable local sink would want this
        # gated or a checksummed write scheme (ADVICE r5).
        .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # testbed events.ts is parquet TIMESTAMP(NANOS); Spark has no
        # nanos timestamp — read as long, converted in io.table()
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # bucketed-table sink (c_join_bucketed) needs a warehouse dir
        .config("spark.sql.warehouse.dir", tmp_dir() + "/warehouse")
        # local harness: streaming checkpoints on tmpfs — the per-batch
        # offset/commit fsync cycle is pure latency here. On a cluster
        # this MUST point at durable shared storage (HDFS/S3) instead;
        # tmpfs checkpoints lose exactly-once recovery across restarts.
        .config("spark.sql.streaming.checkpointLocation", tmp_dir() + "/checkpoints")
        .config("spark.sql.streaming.forceDeleteTempCheckpointLocation", "true")
    )
    return builder.getOrCreate()
