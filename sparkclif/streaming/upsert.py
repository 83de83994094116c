"""Streaming last-wins upsert — the engine's replacement for the
reference's racy whole-file JSON rewrite per mutation (state.py:70-90,
SURVEY.md §3.1 step 5).

Pattern: file-source micro-batches -> watermark + dropDuplicates
(exactly-once-ish event dedup) -> foreachBatch MERGE into a
SPARK-SIDE last-wins parquet state table (versioned directory swap —
the copy-on-write MERGE INTO pattern of Delta/Iceberg, minus the
transaction log the container doesn't ship). No event row ever lives
on the driver: the only driver-held state is the watermark horizon
(one integer) and the current-version path. On a cluster the
batch_merge callback body is a real MERGE INTO keyed on
(user_id, event_type) — the seam is unchanged.

Determinism: last-wins resolved by (ts, event_id) — the same explicit
tiebreak the batch upsert uses (f_distinct), so batch/stream parity is
testable row-for-row.
"""

from __future__ import annotations

import shutil

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


_DELAY_UNITS_S = {
    "microsecond": 1e-6, "millisecond": 1e-3, "second": 1,
    "minute": 60, "hour": 3600, "day": 86400, "week": 604800,
}


def _delay_us(watermark: str) -> int:
    """Parse a Spark delay-threshold string ("1 hour", "1 day 6 hours",
    "90 seconds") into microseconds — the same grammar withWatermark
    accepts (repeated "<amount> <unit>" pairs, plural or singular), so
    a delay Spark would take can never crash the horizon bookkeeping
    here. Unknown units raise a ValueError naming the accepted set."""
    toks = watermark.split()
    if not toks or len(toks) % 2:
        raise ValueError(f"malformed delay threshold: {watermark!r}")
    total_s = 0.0
    for amount, unit in zip(toks[::2], toks[1::2]):
        # removesuffix, not rstrip: strip at most ONE plural 's' so
        # junk like "hourss" fails loudly instead of parsing (ADVICE r8)
        u = unit.lower().removesuffix("s")
        if u not in _DELAY_UNITS_S:
            raise ValueError(
                f"unknown delay unit {unit!r} in {watermark!r}; accepted: "
                f"{sorted(_DELAY_UNITS_S)} (singular or plural)"
            )
        total_s += float(amount) * _DELAY_UNITS_S[u]
    return int(total_s * 1_000_000)


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
    state_dir: str | None = None,
) -> pd.DataFrame:
    """Run a real Structured Streaming query over a file source and
    fold micro-batches into a Spark-side last-wins parquet state
    table (versioned dir per epoch, copy-on-write swap; the previous
    version is the read side of the merge and is deleted once the new
    version is fully written). One file per trigger => multiple
    genuine micro-batches, exercising cross-batch upsert semantics.
    Returns the FINAL state as pandas (presentation collect only —
    per-batch state never touches the driver).

    Late-data policy: withWatermark + dropDuplicates evicts dedup
    STATE but (verified empirically on Spark 4.x) does not filter
    watermark-late input rows for the dedup operator — only windowed
    aggregations do that. The engine therefore enforces the horizon
    explicitly at the MERGE: rows older than (max event time of PRIOR
    batches - watermark) are dropped, matching Spark's one-batch-lag
    watermark semantics exactly (tests/test_streaming.py)."""
    delta_us = _delay_us(watermark)
    if state_dir is None:
        state_dir = source_dir.rstrip("/") + "_state"
    horizon: dict[str, int | None] = {"max_us": None}
    current: dict[str, str | None] = {"path": None}

    def batch_merge(batch_df: DataFrame, epoch_id: int) -> None:
        # batch-local last-wins bounds the merge input to one row per
        # touched key. max_by(struct) instead of a row_number window:
        # partial aggregation combines map-side, one shuffle of one row
        # per touched key, no per-batch full sort. (ts, event_id)
        # struct comparison is lexicographic = the window's ORDER BY.
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
        # deduped feeds TWO actions (the batch-max probe and the state
        # write) — persisted so the per-batch aggregation runs once,
        # not once per action, in the hot streaming loop
        deduped = deduped.persist()
        try:
            # the only driver-bound bytes per batch: one max timestamp
            # (the watermark bookkeeping a cluster keeps anyway). Dedup
            # keeps each key's max ts, so this equals the raw batch max.
            batch_max = deduped.agg(
                F.max(F.unix_micros("ts")).alias("m")
            ).first()["m"]
            if batch_max is None:
                return  # empty batch
            cutoff = None if horizon["max_us"] is None else horizon["max_us"] - delta_us
            horizon["max_us"] = (
                batch_max if horizon["max_us"] is None else max(horizon["max_us"], batch_max)
            )
            valid = deduped
            if cutoff is not None:
                # beyond the horizon of PRIOR batches: dropped
                valid = valid.filter(F.unix_micros("ts") >= cutoff)
            prev = current["path"]
            merged = valid
            if prev is not None:
                merged = spark.read.parquet(prev).unionByName(valid)
            new_state = last_wins(
                merged, ["user_id", "event_type"], ["ts", "event_id"]
            )
            new_path = f"{state_dir}/v{epoch_id}"
            new_state.write.mode("overwrite").parquet(new_path)
            current["path"] = new_path
            if prev is not None:
                shutil.rmtree(prev, ignore_errors=True)
        finally:
            deduped.unpersist()

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
    from sparkclif.streaming.source import stream_shuffle, suppress_no_data_batches

    # the MERGE consumes data batches only — the trailing no-data
    # batch's whole effect here was one wasted full-aggregation job
    # (batch_max == None early return). Output-identical (verified),
    # 3.59 -> 3.05 s warm at sf0.1 (optimization r12).
    with stream_shuffle(spark), suppress_no_data_batches(spark):
        q = stream.writeStream.foreachBatch(batch_merge).outputMode("update").start()
        try:
            q.processAllAvailable()
        finally:
            # a failing batch must not leave a zombie StreamingQuery
            # registered on the shared session
            q.stop()

    if current["path"] is None:
        return pd.DataFrame(
            columns=["user_id", "event_type", "ts", "event_id", "value"]
        )
    final = (
        spark.read.parquet(current["path"])
        .select("user_id", "event_type", "ts", "event_id", "value")
        .toPandas()
    )
    return (
        final.sort_values(["user_id", "event_type"])
        .reset_index(drop=True)
    )
