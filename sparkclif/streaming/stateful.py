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
N_BUCKETS = 64

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
    """Per-bucket incremental sessionizer. Emits one final row per
    session CLOSED this batch plus one snapshot row per session still
    open among this batch's touched users; an open session's later
    snapshots supersede earlier ones (fold last-wins on
    (user_id, start))."""
    open_sessions: dict[int, list[int]] = {}
    if state.exists:
        uids, starts, lasts, ns, fes, les = state.get
        for i, u in enumerate(uids):
            open_sessions[u] = [starts[i], lasts[i], ns[i], fes[i], les[i]]
    ev = pd.concat(list(pdfs)).sort_values(["user_id", "ts_us", "event_id"])
    out = []
    touched = set()
    for u, ts, eid in zip(ev["user_id"], ev["ts_us"], ev["event_id"]):
        u, ts, eid = int(u), int(ts), int(eid)
        touched.add(u)
        s = open_sessions.get(u)
        if s is None:
            open_sessions[u] = [ts, ts, 1, eid, eid]
        elif ts - s[1] >= SESSION_GAP_US:
            out.append((u, s[0], s[2], s[3], s[4]))  # closed — final row
            open_sessions[u] = [ts, ts, 1, eid, eid]
        else:
            s[1] = ts
            s[2] += 1
            s[3] = min(s[3], eid)
            s[4] = max(s[4], eid)
    for u in sorted(touched):  # open-session snapshots
        s = open_sessions[u]
        out.append((u, s[0], s[2], s[3], s[4]))
    state.update(
        tuple(
            [list(open_sessions)]
            + [[s[i] for s in open_sessions.values()] for i in range(5)]
        )
    )
    yield pd.DataFrame(
        out,
        columns=["user_id", "session_start_us", "n_events", "first_event", "last_event"],
    )


def stream_sessionize(spark, source_dir: str, schema) -> pd.DataFrame:
    """Run the stateful sessionizer as a REAL streaming query over a
    file source (one file per micro-batch) and fold the emitted
    snapshots into the final session table."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from sparkclif.streaming.source import stream_shuffle

    snapshots: list[pd.DataFrame] = []

    def sink(batch_df, epoch_id: int) -> None:
        snapshots.append(batch_df.toPandas().assign(__epoch=epoch_id))

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
    with stream_shuffle(spark):
        q = stream.writeStream.foreachBatch(sink).outputMode("update").start()
        q.processAllAvailable()
        q.stop()

    all_rows = pd.concat(snapshots, ignore_index=True)
    # last-wins per (user, session start): snapshots only ever grow
    folded = (
        all_rows.sort_values(["__epoch", "n_events"])
        .groupby(["user_id", "session_start_us"], as_index=False)
        .last()
        .drop(columns="__epoch")
    )
    return folded.sort_values(["user_id", "session_start_us"]).reset_index(drop=True)
