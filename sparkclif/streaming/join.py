"""Stream-stream join: the remaining major Structured Streaming
operator family (after windowed aggs, stateful sessions, MERGE
upserts, and watermarked dedup) — two watermarked event streams
inner-joined on a key plus an event-time RANGE condition.

Spark derives the join-state retention bound from the time-range
predicate plus both watermarks: a left row can only match right rows
in [ts, ts + window], so once the right watermark passes ts + window
the left row's state is evicted — bounded state at 100 TB, which an
unconstrained stream-stream join (no time bound) cannot have.
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkclif.streaming.source import run_append_stream


def stream_range_join_events(
    spark: SparkSession,
    source_dir: str,
    schema,
    window_s: int = 1800,
    watermark: str = "1 hour",
    out_dir: str | None = None,
) -> DataFrame:
    """Join every event to the SAME user's strictly-later events
    within ``window_s`` seconds, as a genuine stream-stream inner
    self-join (two file-source streams over the same chunk sequence,
    one file per trigger — matches can span micro-batches, so the
    join state machinery is really exercised).

    Output: (id_a, id_b, user_id, gap_us) for a.ts < b.ts <= a.ts +
    window. Inner append-mode semantics: the accumulated output
    equals the batch theta join row-for-row (time-ordered source, so
    nothing is ever beyond the watermark horizon) — which is exactly
    what the SQL oracle states.
    """
    if out_dir is None:
        out_dir = source_dir.rstrip("/") + "_join_out"
    shutil.rmtree(out_dir, ignore_errors=True)

    # ONE readStream self-joined (optimization r12): the two sides
    # used to be two INDEPENDENT file-source streams over the same
    # chunk sequence — two source logs, two listings and two offset
    # trackers advancing in lockstep. A single source aliased twice
    # is the same join (both sides see the same file per trigger,
    # which is exactly what the two lockstepped sources saw) with
    # half the source bookkeeping; outputs verified row-identical,
    # 3.57 → 3.40 s min warm at sf0.1 (all reps improved).
    base = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
    )

    def one_side(alias: str) -> DataFrame:
        return base.select(
            F.col("event_id").alias(f"{alias}_id"),
            F.col("user_id").alias(f"{alias}_user"),
            F.col("ts").alias(f"{alias}_ts"),
        ).withWatermark(f"{alias}_ts", watermark)

    left, right = one_side("a"), one_side("b")
    joined = left.join(
        right,
        (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {window_s} SECONDS")),
    ).select(
        F.col("a_id").alias("id_a"),
        F.col("b_id").alias("id_b"),
        F.col("a_user").alias("user_id"),
        (F.unix_micros("b_ts") - F.unix_micros("a_ts")).alias("gap_us"),
    )

    return run_append_stream(
        spark,
        joined,
        out_dir,
        "id_a long, id_b long, user_id long, gap_us long",
        # an INNER stream-stream join emits only as data batches match
        # rows; the trailing no-data batch evicts state without output
        # (outer joins would emit there — this one must stay inner).
        # Output-identical (verified), saves a full two-state-store
        # batch cycle: 4.30 -> 3.54 s warm at sf0.1 (optimization r12)
        no_data_batches=False,
    )
