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
    state_box: dict[str, pd.DataFrame | None] = {"df": None}

    def batch_merge(batch_df: DataFrame, epoch_id: int) -> None:
        # batch-local last-wins BEFORE leaving Spark bounds the sink
        # transfer to one row per touched key (at scale this whole sink
        # is a MERGE INTO and nothing reaches the driver); the transfer
        # itself is one Arrow batch, not row-by-row pickling.
        # max_by(struct) instead of a row_number window: partial
        # aggregation combines map-side, one shuffle of one row per
        # touched key, no per-batch full sort. (ts, event_id) struct
        # comparison is lexicographic = the window's ORDER BY.
        deduped = (
            batch_df.groupBy("user_id", "event_type")
            .agg(
                F.max_by(
                    F.struct("ts", "event_id", "value"),
                    F.struct("ts", "event_id"),
                ).alias("__r")
            )
            .select(
                "user_id",
                "event_type",
                F.col("__r.ts").alias("ts"),
                F.col("__r.event_id").alias("event_id"),
                F.col("__r.value").alias("value"),
            )
        )
        pdf = deduped.toPandas()
        if len(pdf) == 0:
            return
        pdf = pdf.assign(ts_us=pdf["ts"].astype("int64") // 1000)
        cutoff = None if horizon["max_us"] is None else horizon["max_us"] - delta_us
        batch_max = int(pdf["ts_us"].max())
        horizon["max_us"] = (
            batch_max if horizon["max_us"] is None else max(horizon["max_us"], batch_max)
        )
        if cutoff is not None:
            pdf = pdf[pdf["ts_us"] >= cutoff]  # beyond the horizon: dropped
        merged = pdf if state_box["df"] is None else pd.concat(
            [state_box["df"], pdf], ignore_index=True
        )
        # vectorized last-wins on (ts, event_id). drop_duplicates keeps
        # the whole newest ROW; groupby(...).last() would take the last
        # non-NaN PER COLUMN, stitching fields of different events into
        # a chimera when the newest row has a null field.
        merged = merged.sort_values(["ts_us", "event_id"], kind="stable")
        state_box["df"] = merged.drop_duplicates(
            subset=["user_id", "event_type"], keep="last"
        ).reset_index(drop=True)

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

    final = state_box["df"]
    if final is None:
        return pd.DataFrame(
            columns=["user_id", "event_type", "ts", "event_id", "value"]
        )
    return (
        final.sort_values(["user_id", "event_type"])
        .loc[:, ["user_id", "event_type", "ts", "event_id", "value"]]
        .reset_index(drop=True)
    )
