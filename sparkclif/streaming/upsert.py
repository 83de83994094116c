"""Streaming last-wins upsert — the engine's replacement for the
reference's racy whole-file JSON rewrite per mutation (state.py:70-90,
SURVEY.md §3.1 step 5).

Pattern: file-source micro-batches -> watermark + dropDuplicates
(exactly-once-ish event dedup) -> foreachBatch MERGE into the status
table. Here the MERGE target is an in-memory accumulator (local
harness); on a cluster it is a Delta/Iceberg MERGE INTO keyed on
(user_id, event_type) — the interface is the batch_merge callback.

Determinism: last-wins resolved by (ts, event_id) — the same explicit
tiebreak the batch upsert uses (f_distinct), so batch/stream parity is
testable row-for-row.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def last_wins(df: DataFrame, keys: list[str], order: list[str]) -> DataFrame:
    """Deterministic keep-newest dedup (the MERGE-less upsert pattern,
    SURVEY.md §4.2): one row per key, max (order) wins."""
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def stream_upsert_events(
    spark: SparkSession,
    source_dir: str,
    schema,
    watermark: str = "1 hour",
) -> pd.DataFrame:
    """Run a real Structured Streaming query over a file source and
    fold micro-batches into a last-wins state table.

    Returns the final state as pandas (the local stand-in for the
    MERGE-target table). One file per trigger => multiple genuine
    micro-batches, exercising cross-batch upsert semantics.

    Late-data policy: withWatermark + dropDuplicates evicts dedup
    STATE but (verified empirically on Spark 4.x) does not filter
    watermark-late input rows for the dedup operator — only windowed
    aggregations do that. The engine therefore enforces the horizon
    explicitly at the MERGE: rows older than (max event time of PRIOR
    batches - watermark) are dropped, matching Spark's one-batch-lag
    watermark semantics exactly (tests/test_streaming.py)."""
    state: dict[tuple, tuple] = {}
    amount, unit = watermark.split()
    delta_us = int(amount) * {
        "second": 1,
        "seconds": 1,
        "minute": 60,
        "minutes": 60,
        "hour": 3600,
        "hours": 3600,
    }[unit] * 1_000_000
    horizon: dict[str, int | None] = {"max_us": None}

    def batch_merge(batch_df: DataFrame, epoch_id: int) -> None:
        deduped = last_wins(batch_df, ["user_id", "event_type"], ["ts", "event_id"])
        rows = deduped.collect()
        us = lambda t: int(t.timestamp() * 1_000_000)  # noqa: E731
        cutoff = None if horizon["max_us"] is None else horizon["max_us"] - delta_us
        batch_max = max((us(r.ts) for r in rows), default=None)
        if batch_max is not None:
            horizon["max_us"] = (
                batch_max
                if horizon["max_us"] is None
                else max(horizon["max_us"], batch_max)
            )
        for r in rows:
            if cutoff is not None and us(r.ts) < cutoff:
                continue  # beyond the watermark horizon: dropped
            key = (r.user_id, r.event_type)
            prev = state.get(key)
            cand = (r.ts, r.event_id, r.value)
            if prev is None or cand[:2] > prev[:2]:
                state[key] = cand

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
        .withWatermark("ts", watermark)
        # event-time column INCLUDED in the dedup keys: Spark's
        # streaming dedup only drops watermark-late rows (and evicts
        # state) when the watermark attribute is part of the keys;
        # event_id is unique so the dedup semantics are unchanged
        .dropDuplicates(["event_id", "ts"])
    )
    from sparkclif.streaming.source import stream_shuffle

    with stream_shuffle(spark):
        q = stream.writeStream.foreachBatch(batch_merge).outputMode("update").start()
        q.processAllAvailable()
        q.stop()

    rows = [
        {"user_id": k[0], "event_type": k[1], "ts": v[0], "event_id": v[1], "value": v[2]}
        for k, v in sorted(state.items())
    ]
    return pd.DataFrame(rows)
