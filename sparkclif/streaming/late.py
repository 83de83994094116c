"""Watermarked windowed aggregation under LATE data — the
Structured-Streaming late-data contract, made checkable:

``withWatermark(ts, delay)`` + a tumbling-window count in APPEND mode
means (1) a window's row is emitted exactly once, after the watermark
passes its end, and (2) rows arriving for a window whose state has
been EVICTED are dropped (measured precisely: a late row whose window
state still lives MERGES — that is the allowed-lateness contract; the
drop begins at eviction, which follows the watermark passing the
window end by one micro-batch — see
tests/test_streaming.py::test_window_agg_drops_late_and_holds_open_windows).
The harness feeds a time-ordered file stream whose last micro-batch
carries rows displaced from the very start of the stream
(``write_time_chunks(displace_rows=...)``) — by then the watermark
sits near the stream's end, so a conforming engine must drop exactly
that displaced set, and windows still open at stream end are never
emitted. Both effects are deterministic functions of the input, which
is what the SQL oracle restates.

At 100 TB the watermark IS the state bound: without it the window
state grows with stream lifetime; with it, state is (windows inside
the delay horizon) × (group keys) regardless of how much history the
stream has seen.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkclif.streaming.source import run_append_stream


def stream_window_counts(
    spark: SparkSession,
    source_dir: str,
    schema,
    watermark: str = "10 minutes",
    window: str = "1 hour",
    out_dir: str | None = None,
) -> DataFrame:
    """Run the watermarked tumbling-window count over ``source_dir``
    (one file per trigger) and return the accumulated append-mode
    output as a batch DataFrame: (window_start, event_type, n)."""
    if out_dir is None:
        out_dir = source_dir.rstrip("/") + "_late_out"
    shutil.rmtree(out_dir, ignore_errors=True)

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            F.col("n").cast("long").alias("n"),
        )
    )
    # run_append_stream handles the still-open-windows case (append
    # mode emits nothing => empty frame with the contract schema).
    return run_append_stream(
        spark, stream, out_dir,
        "window_start timestamp, event_type string, n long",
    )
