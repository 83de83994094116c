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


def run_versioned_merge_stream(
    spark: SparkSession,
    source_dir: str,
    schema,
    delta_fn,
    merge_fn,
    state_cols: "list[str]",
    key_col: str,
    name_prefix: str,
    buckets: int = STATE_BUCKETS,
    stream_transform=None,
) -> pd.DataFrame:
    """The ONE versioned-bucketed-MERGE streaming lifecycle (round-12
    extraction — the ANN-index harness would otherwise have copied
    this loop, the exact drift the round-10 run_append_stream
    extraction exists to prevent): run a real Structured Streaming
    query (file source, one file per trigger); per micro-batch,
    ``delta_fn(batch_df)`` folds the batch to one row per touched
    key and ``merge_fn(state_df, delta_df)`` produces the new state,
    which is written as ``<name>_v{epoch}`` CLUSTERED BY
    ``bucketBy(buckets, key_col)`` and swapped in after commit (the
    copy-on-write Delta/Iceberg MERGE pattern minus the transaction
    log this container doesn't ship). Returns the FINAL state as
    pandas, key-sorted (presentation collect only — per-batch state
    never touches the driver) and drops the scratch tables. Table
    names are content-addressed from ``source_dir`` so concurrent
    harness runs in one warehouse can't collide.

    The bucketed layout is the 100 TB point: each batch's merge join
    reads the O(state) side co-located — only the O(delta) side
    shuffles (asserted for both callers in tests).

    ``stream_transform``: optional STATELESS transformation applied to
    the streaming DataFrame itself (scan-side projections/explodes —
    no aggregation or other stateful op). Expression-heavy per-row
    work (e.g. a PQ encode against large frozen literals) belongs
    here, not in ``delta_fn``: the streaming plan is built and
    analyzed ONCE at query start, while everything inside
    ``delta_fn`` is re-built through py4j and re-analyzed on EVERY
    micro-batch (measured 0.37 s of driver time per epoch for the ANN
    encode — guide §7.3's planning-cost class; optimization r13).
    ``delta_fn`` keeps the per-batch aggregation, which cannot ride a
    stream without becoming a stateful operator."""
    tag = hashlib.sha256(source_dir.encode()).hexdigest()[:12]
    name = f"{name_prefix}_{tag}"
    current: dict[str, str | None] = {"table": None}

    def batch_merge(batch_df: DataFrame, epoch_id: int) -> None:
        delta = delta_fn(batch_df)
        prev = current["table"]
        if prev is None:
            merged = delta
        else:
            merged = merge_fn(spark.table(prev), delta)
        new_tbl = f"{name}_v{epoch_id}"
        # no guard DROP: mode("overwrite") saveAsTable drops and
        # recreates an existing table itself, including a changed
        # bucket spec (verified) — the explicit DROP was one redundant
        # catalog round-trip per epoch (optimization r12)
        (
            merged.write.bucketBy(buckets, key_col)
            .sortBy(key_col)
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
    if stream_transform is not None:
        stream = stream_transform(stream)
    with stream_shuffle(spark):
        q = stream.writeStream.foreachBatch(batch_merge).outputMode("update").start()
        try:
            q.processAllAvailable()
        finally:
            # a failing merge must not leave a zombie StreamingQuery
            # registered on the shared session
            q.stop()

    if current["table"] is None:
        return pd.DataFrame(columns=state_cols)
    final = spark.table(current["table"]).select(*state_cols).toPandas()
    spark.sql(f"DROP TABLE IF EXISTS {current['table']}")
    return final.sort_values(key_col).reset_index(drop=True)


def stream_merge_bucketed(
    spark: SparkSession,
    source_dir: str,
    schema,
    buckets: int = STATE_BUCKETS,
) -> pd.DataFrame:
    """The accumulating per-user MERGE over the generic lifecycle
    above: counts add, newer (ts, event_id) payload wins. Behavior
    and plans identical to the pre-extraction form (round-12
    refactor; the per-batch join shape is pinned by
    tests/test_r8_queries.py)."""
    return run_versioned_merge_stream(
        spark,
        source_dir,
        schema,
        delta_fn=_delta,
        merge_fn=merge_into_state,
        state_cols=STATE_COLS,
        key_col="user_id",
        name_prefix="stream_merge_state",
        buckets=buckets,
    )
