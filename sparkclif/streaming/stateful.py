"""Custom stateful streaming operator — incremental sessionization via
``applyInPandasWithState`` (the arbitrary-state API the engine uses
where built-in ``session_window`` can't express the semantics, e.g.
emitting per-session running snapshots or custom merge rules).

Shape (100 TB regime): the state key is a USER-HASH BUCKET, its state
the open-session accumulators of that bucket's active users (parallel
arrays — one small struct per bucket in the state store, RocksDB at
scale). Grouped-state APIs pay a fixed cost per (key, micro-batch)
invocation, so keying directly on user_id (1 user ≈ a few events per
batch) drowns in per-key overhead — measured 2x wall-clock at bench
scale; bucket count is tuned to ~2-4x the state-store partition count.
Closed sessions leave state immediately, so state size is O(active
users per bucket). Event-time ordering within a key is guaranteed here
by the time-split file source; a production deployment adds a
watermark and drops late events at ingestion (same policy as
stream_upsert).

Semantics pinned to the batch oracle (group_h.h_session): a gap of
EXACTLY 30 minutes starts a new session; first/last_event are min/max
event_id within the session.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

SESSION_GAP_US = 30 * 60 * 1_000_000
# 4x the state-store partition count — the module docstring's own
# sizing rule, now derived instead of a stale constant: the previous
# literal 64 was 16x the 4 stream partitions, paying 16 grouped-state
# kernel invocations per partition per batch (optimization r13:
# 3.08 -> 2.82 s at 32 cores, output bit-identical; 8 and 16 buckets
# measured equal, 64 the outlier). Scales with the deployment's
# stream-partition setting by construction.
from sparkclif.streaming.source import STREAM_SHUFFLE_PARTITIONS

N_BUCKETS = 4 * STREAM_SHUFFLE_PARTITIONS

OUTPUT_SCHEMA = (
    "user_id long, session_start_us long, n_events long, "
    "first_event long, last_event long"
)
# parallel arrays: the open session per active user of this bucket
STATE_SCHEMA = (
    "user_ids array<long>, starts array<long>, lasts array<long>, "
    "ns array<long>, fes array<long>, les array<long>"
)


def session_update(key: Tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    """Per-bucket incremental sessionizer, fully vectorized: each open
    session carried in state becomes one synthetic weighted row
    (weight = accumulated n_events, ts = the session's LAST event time
    so the gap test against the first new event is exact), then the
    batch is standard gaps-and-islands in pandas — no per-row Python
    loop. Emits one final row per session CLOSED this batch plus one
    snapshot row per session still open among this batch's touched
    users; later snapshots supersede earlier ones (fold last-wins on
    (user_id, start))."""
    import numpy as np

    ev = pd.concat(list(pdfs))
    batch = pd.DataFrame(
        {
            "user_id": ev["user_id"].astype("int64"),
            "ts": ev["ts_us"].astype("int64"),
            "start": ev["ts_us"].astype("int64"),
            "n": np.ones(len(ev), dtype="int64"),
            "fe": ev["event_id"].astype("int64"),
            "le": ev["event_id"].astype("int64"),
        }
    )
    frames = [batch]
    if state.exists:
        uids, starts, lasts, ns, fes, les = state.get
        carried = pd.DataFrame(
            {
                "user_id": pd.Series(uids, dtype="int64"),
                "ts": pd.Series(lasts, dtype="int64"),
                "start": pd.Series(starts, dtype="int64"),
                "n": pd.Series(ns, dtype="int64"),
                "fe": pd.Series(fes, dtype="int64"),
                "le": pd.Series(les, dtype="int64"),
            }
        )
        # untouched users must keep their state verbatim; only carry
        # rows for users present in this batch, merge the rest back in
        touched_mask = carried["user_id"].isin(batch["user_id"].unique())
        untouched = carried[~touched_mask]
        frames.insert(0, carried[touched_mask])
    else:
        untouched = pd.DataFrame(columns=batch.columns)

    rows = pd.concat(frames, ignore_index=True)
    if len(rows) == 0:
        yield pd.DataFrame(
            columns=["user_id", "session_start_us", "n_events", "first_event", "last_event"]
        )
        return
    # carried rows sort before same-timestamp batch rows via stable
    # mergesort on (user, ts): a carried row's ts is its last event
    # time, and the file source guarantees batch events are >= it
    rows = rows.sort_values(["user_id", "ts"], kind="stable", ignore_index=True)
    uid = rows["user_id"].to_numpy()
    ts = rows["ts"].to_numpy()
    new_user = np.empty(len(rows), dtype=bool)
    new_user[0] = True
    new_user[1:] = uid[1:] != uid[:-1]
    gap = np.empty(len(rows), dtype=bool)
    gap[0] = True
    gap[1:] = (ts[1:] - ts[:-1]) >= SESSION_GAP_US
    # a carried (stateful) row never starts a new session itself
    sess_id = np.cumsum(new_user | gap)
    g = rows.groupby(sess_id, sort=True)
    agg = pd.DataFrame(
        {
            "user_id": g["user_id"].first(),
            "session_start_us": g["start"].min(),
            "n_events": g["n"].sum(),
            "first_event": g["fe"].min(),
            "last_event": g["le"].max(),
            "last_ts": g["ts"].max(),
        }
    )
    # the LAST session of each user stays open; everything before it
    # in this bucket's sorted order is closed (emit final rows)
    is_open = ~agg["user_id"].duplicated(keep="last")
    out = agg[["user_id", "session_start_us", "n_events", "first_event", "last_event"]]

    still_open = pd.concat(
        [
            untouched.rename(
                columns={
                    "start": "session_start_us",
                    "n": "n_events",
                    "fe": "first_event",
                    "le": "last_event",
                    "ts": "last_ts",
                }
            )[
                [
                    "user_id",
                    "session_start_us",
                    "n_events",
                    "first_event",
                    "last_event",
                    "last_ts",
                ]
            ],
            agg[is_open],
        ],
        ignore_index=True,
    )
    state.update(
        (
            still_open["user_id"].tolist(),
            still_open["session_start_us"].tolist(),
            still_open["last_ts"].tolist(),
            still_open["n_events"].tolist(),
            still_open["first_event"].tolist(),
            still_open["last_event"].tolist(),
        )
    )
    yield out.reset_index(drop=True)


def stream_sessionize(spark, source_dir: str, schema):
    """Run the stateful sessionizer as a REAL streaming query over a
    file source (one file per micro-batch) and fold the emitted
    snapshots into the final session table. Returns a DataFrame.

    Snapshot fold: within one session, n_events only grows,
    first_event only shrinks, last_event only grows across snapshots,
    so last-wins == (max n, min fe, max le) per (user, start) — no
    epoch bookkeeping. (A memory-sink variant was measured slower
    than the foreachBatch+Arrow sink here: the memory sink collects
    InternalRows row-at-a-time; Arrow batches win.)"""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from sparkclif.streaming.source import stream_shuffle

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(source_dir)
        .select(
            "user_id",
            F.unix_micros(F.col("ts")).alias("ts_us"),
            "event_id",
            F.pmod(F.hash("user_id"), F.lit(N_BUCKETS)).alias("__bucket"),
        )
        .groupBy("__bucket")
        .applyInPandasWithState(
            session_update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
    snapshots: list[pd.DataFrame] = []

    def sink(batch_df, epoch_id: int) -> None:
        snapshots.append(batch_df.toPandas())

    with stream_shuffle(spark):
        q = stream.writeStream.foreachBatch(sink).outputMode("update").start()
        try:
            q.processAllAvailable()
        finally:
            # a failing sink must not leave a zombie StreamingQuery
            # registered on the shared session
            q.stop()

    if not snapshots:
        # zero micro-batches (empty/invisible source): empty session
        # table, not a pd.concat([]) ValueError
        return spark.createDataFrame(
            [], OUTPUT_SCHEMA
        )
    all_rows = pd.concat(snapshots, ignore_index=True)
    folded = all_rows.groupby(
        ["user_id", "session_start_us"], as_index=False, sort=False
    ).agg(
        n_events=("n_events", "max"),
        first_event=("first_event", "min"),
        last_event=("last_event", "max"),
    )
    return spark.createDataFrame(
        folded, "user_id long, session_start_us long, n_events long, "
        "first_event long, last_event long"
    )
