"""Custom stateful streaming operator — incremental sessionization via
``applyInPandasWithState`` (the arbitrary-state API the engine uses
where built-in ``session_window`` can't express the semantics, e.g.
emitting per-session running snapshots or custom merge rules).

Shape (100 TB regime): state is per-key (user_id) and O(1) — just the
open session accumulator — held in the state store (RocksDB at scale).
Each micro-batch touches only keys present in the batch; closed
sessions leave state immediately. Event-time ordering within a key is
guaranteed here by the time-split file source; a production deployment
adds a watermark and drops late events at ingestion (same policy as
stream_upsert).

Semantics pinned to the batch oracle (group_h.h_session): a gap of
EXACTLY 30 minutes starts a new session; first/last_event are min/max
event_id within the session.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

SESSION_GAP_US = 30 * 60 * 1_000_000

OUTPUT_SCHEMA = (
    "user_id long, session_start_us long, n_events long, "
    "first_event long, last_event long"
)
STATE_SCHEMA = "start_us long, last_us long, n long, first_event long, last_event long"


def session_update(key: Tuple, pdfs: Iterator[pd.DataFrame], state) -> Iterator[pd.DataFrame]:
    """Per-user incremental sessionizer. Emits one snapshot row per
    session touched this batch; an open session's later snapshots
    supersede earlier ones (fold last-wins on (user_id, start))."""
    (user_id,) = key
    start = last = n = fe = le = None
    if state.exists:
        start, last, n, fe, le = state.get
    ev = pd.concat(list(pdfs)).sort_values(["ts_us", "event_id"])
    out = []
    for ts, eid in zip(ev["ts_us"], ev["event_id"]):
        ts = int(ts)
        eid = int(eid)
        if start is None:
            start, last, n, fe, le = ts, ts, 1, eid, eid
        elif ts - last >= SESSION_GAP_US:
            out.append((user_id, start, n, fe, le))  # closed — final row
            start, last, n, fe, le = ts, ts, 1, eid, eid
        else:
            last = ts
            n += 1
            fe = min(fe, eid)
            le = max(le, eid)
    out.append((user_id, start, n, fe, le))  # open-session snapshot
    state.update((start, last, n, fe, le))
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
            "user_id", F.unix_micros(F.col("ts")).alias("ts_us"), "event_id"
        )
        .groupBy("user_id")
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
