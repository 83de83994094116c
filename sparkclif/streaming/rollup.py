"""Streaming continuous aggregate — the OHLC rollup as a watermarked
tumbling-window stream (the hypertable "continuous aggregate" in
Structured Streaming form).

The batch twin is ``queries/group_r7.ohlc_plan``: same open/close =
first/last by the (ts, event_id) total order, same high/low/count.
Here the bars build INCREMENTALLY: ``min_by``/``max_by`` are
declarative aggregates, so each micro-batch folds its rows into the
window state as a single (value, key) pair per bound — state per open
window is O(1), bounded by the watermark horizon exactly like the
plain windowed count (late.py). Append mode emits each bar once, when
the watermark passes the window end — the exactly-once bar-closing
semantics a downstream consumer (feature store, chart) needs.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkclif.streaming.source import run_append_stream


def stream_ohlc_bars(
    spark: SparkSession,
    source_dir: str,
    schema,
    watermark: str = "10 minutes",
    window: str = "1 hour",
    out_dir: str | None = None,
) -> DataFrame:
    """Run the watermarked OHLC rollup over ``source_dir`` (one file
    per trigger) and return the accumulated append-mode output as a
    batch DataFrame:
    (window_start, event_type, n, open, high, low, close)."""
    if out_dir is None:
        out_dir = source_dir.rstrip("/") + "_ohlc_out"
    shutil.rmtree(out_dir, ignore_errors=True)

    key = F.struct(F.col("ts"), F.col("event_id"))
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(F.min_by("value", key), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", key), 4).alias("close"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "open",
            "high",
            "low",
            "close",
        )
    )
    return run_append_stream(
        spark, stream, out_dir,
        "window_start timestamp, event_type string, n long, "
        "open double, high double, low double, close double",
    )
