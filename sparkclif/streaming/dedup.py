"""Streaming exact deduplication: watermarked ``dropDuplicates`` over
a file-source micro-batch stream — the exactly-once projection of an
at-least-once delivery (producer retries emit bit-identical duplicate
rows; the dedup state drops every copy after the first, across
micro-batch boundaries).

Determinism contract: injected duplicates are FULL-ROW identical
(``write_time_chunks(echo_rows=...)``), so whichever physical copy the
state keeps, the emitted row is the same — the output is exactly the
distinct event set, which is what the SQL oracle states.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession

from sparkclif.streaming.source import run_append_stream

DEDUP_COLS = ["event_id", "ts", "user_id", "event_type", "value"]


def stream_dedup_events(
    spark: SparkSession,
    source_dir: str,
    schema,
    watermark: str = "1 hour",
    out_dir: str | None = None,
) -> DataFrame:
    """Run a real Structured Streaming dedup over ``source_dir`` (one
    file per trigger) and return the accumulated output as a batch
    DataFrame.

    Plan: file source -> withWatermark(ts) -> dropDuplicates on
    (event_id, ts) -> append-mode foreachBatch writing each batch's
    fresh rows to a parquet sink. The event-time column is part of the
    dedup key so Spark bounds the state store by the watermark horizon
    (without it, seen-key state grows forever — the 100 TB concern);
    event_id is unique, so the key extension changes state eviction,
    not semantics. The duplicate echoes sit AT the watermark frontier
    of their original batch, so they are always dropped by state
    lookup — never silently age-filtered.
    """
    if out_dir is None:
        out_dir = source_dir.rstrip("/") + "_dedup_out"
    shutil.rmtree(out_dir, ignore_errors=True)

    # dedup already happens upstream in the stateful operator; the
    # sink is a plain append of each batch's first-seen rows
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
        .select(*DEDUP_COLS)
        .withWatermark("ts", watermark)
        .dropDuplicates(["event_id", "ts"])
    )
    out = run_append_stream(
        spark,
        stream,
        out_dir,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )
    return out.select(*DEDUP_COLS)
