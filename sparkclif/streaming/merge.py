"""Streaming accumulating MERGE into a BUCKETED state table — the
continuous-ingest shape of a 100 TB last-wins store (reference
state.py's per-mutation rewrite, re-expressed as the foreachBatch
MERGE every lakehouse runs; SURVEY.md §3.1 step 5 + §4.2).

Composes two pieces the engine already proves separately:
``h_stream_upsert``'s foreachBatch versioned-swap merge and
``c_join_bucketed``'s co-located layout. The point of bucketing the
STATE side: each micro-batch's MERGE is a full-outer join of
(giant state) x (small delta) on the merge key, and with the state
stored CLUSTERED BY (key) the join reads it with NO exchange — only
the delta (one aggregated row per touched key) shuffles, which is the
asymptotic requirement for continuous ingest: per-batch work must be
O(delta), never O(state), in shuffle bytes. The state parquet is
rewritten per epoch (copy-on-write swap, the Delta/Iceberg MERGE
pattern minus the transaction log this container doesn't ship); on a
real deployment the rewrite is partition-scoped so write volume is
also O(touched partitions), not O(state) — see SCALE.md round-8
notes.

The merge here ACCUMULATES (n_events := state.n + delta.n) as well as
resolving last-wins by (ts, event_id) — i.e. a genuine
``MERGE ... WHEN MATCHED THEN UPDATE SET n = s.n + d.n, ...`` rather
than a pure replace, so the final state is checkable against plain
relational aggregates over the full input.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATE_BUCKETS = 8

STATE_COLS = ["user_id", "n_events", "ts", "last_event_id", "last_value"]


def _delta(batch_df: DataFrame) -> DataFrame:
    """One aggregated row per touched key: event count + the batch's
    last-wins payload by (ts, event_id). max_by(struct) keeps the
    aggregation map-side combinable — one shuffle of one row per
    touched key, no per-batch sort."""
    return (
        batch_df.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.max_by(
                F.struct("ts", "event_id", "value"), F.struct("ts", "event_id")
            ).alias("__r"),
        )
        .select(
            "user_id",
            "n_events",
            F.col("__r.ts").alias("ts"),
            F.col("__r.event_id").alias("last_event_id"),
            F.col("__r.value").alias("last_value"),
        )
    )


def merge_into_state(state: DataFrame, delta: DataFrame) -> DataFrame:
    """The MERGE body: full-outer on the key; counts add, the newer
    (ts, last_event_id) payload wins (struct comparison = the same
    lexicographic order every last-wins site in the engine uses).
    Pure plan builder — shared by the streaming loop and the
    plan-shape test that asserts the bucketed side joins without an
    exchange."""
    s = state.select(*[F.col(c).alias(f"s_{c}") for c in STATE_COLS])
    d = delta.select(*[F.col(c).alias(f"d_{c}") for c in STATE_COLS])
    newer = F.col("s_user_id").isNull() | (
        F.struct("d_ts", "d_last_event_id") >= F.struct("s_ts", "s_last_event_id")
    )
    # plain == (not eqNullSafe): user_id is the events PK side and
    # never NULL, and a null-safe condition would de-pattern the
    # bucketed-scan-side exchange elimination this operator exists for
    return s.join(
        d, F.col("s_user_id") == F.col("d_user_id"), "full_outer"
    ).select(
        F.coalesce("s_user_id", "d_user_id").alias("user_id"),
        (
            F.coalesce("s_n_events", F.lit(0)) + F.coalesce("d_n_events", F.lit(0))
        ).cast("long").alias("n_events"),
        F.when(F.col("d_user_id").isNull() | ~newer, F.col("s_ts"))
        .otherwise(F.col("d_ts"))
        .alias("ts"),
        F.when(F.col("d_user_id").isNull() | ~newer, F.col("s_last_event_id"))
        .otherwise(F.col("d_last_event_id"))
        .cast("long")
        .alias("last_event_id"),
        F.when(F.col("d_user_id").isNull() | ~newer, F.col("s_last_value"))
        .otherwise(F.col("d_last_value"))
        .alias("last_value"),
    )


def stream_merge_bucketed(
    spark: SparkSession,
    source_dir: str,
    schema,
    buckets: int = STATE_BUCKETS,
) -> pd.DataFrame:
    """Run a real Structured Streaming query (file source, one file
    per trigger) folding micro-batches into a bucketed state table
    via the accumulating MERGE above. Returns the FINAL state as
    pandas (presentation collect only — per-batch state never touches
    the driver) and drops the scratch tables.

    Versioning: each epoch writes ``<name>_v{epoch}`` with
    ``bucketBy(buckets, user_id)`` and drops the prior version after
    the new one commits — the same copy-on-write swap as
    streaming/upsert.py, but through the catalog because bucket
    metadata lives there. Table names are content-addressed from
    ``source_dir`` so concurrent harness runs in one warehouse can't
    collide."""
    tag = hashlib.sha256(source_dir.encode()).hexdigest()[:12]
    name = f"stream_merge_state_{tag}"
    current: dict[str, str | None] = {"table": None}

    def batch_merge(batch_df: DataFrame, epoch_id: int) -> None:
        delta = _delta(batch_df)
        prev = current["table"]
        if prev is None:
            merged = delta
        else:
            merged = merge_into_state(spark.table(prev), delta)
        new_tbl = f"{name}_v{epoch_id}"
        spark.sql(f"DROP TABLE IF EXISTS {new_tbl}")
        (
            merged.write.bucketBy(buckets, "user_id")
            .sortBy("user_id")
            .mode("overwrite")
            .saveAsTable(new_tbl)
        )
        current["table"] = new_tbl
        if prev is not None:
            spark.sql(f"DROP TABLE IF EXISTS {prev}")

    from sparkclif.streaming.source import stream_shuffle

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
    )
    with stream_shuffle(spark):
        q = stream.writeStream.foreachBatch(batch_merge).outputMode("update").start()
        try:
            q.processAllAvailable()
        finally:
            # a failing merge must not leave a zombie StreamingQuery
            # registered on the shared session
            q.stop()

    if current["table"] is None:
        return pd.DataFrame(columns=STATE_COLS)
    final = spark.table(current["table"]).select(*STATE_COLS).toPandas()
    spark.sql(f"DROP TABLE IF EXISTS {current['table']}")
    return final.sort_values("user_id").reset_index(drop=True)
