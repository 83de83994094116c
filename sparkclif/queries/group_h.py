"""Group H — streaming (SURVEY.md §2.2 group H). Window semantics are
oracle-checked in batch (identical expressions run under readStream);
h_stream_upsert runs a REAL Structured Streaming query with file-source
micro-batches.

Reference tie: R36 (the socket-mode event loop) and R21/R31 (status
upserts) — the engine replaces the reference's in-process mutation
with watermarked micro-batch MERGE.

Scale notes: tumbling/session windows shuffle on (window, key) with
partial aggregation; state store (RocksDB at scale) holds only open
windows past the watermark horizon.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkclif.io import table
from sparkclif.registry import register
from sparkclif.session import tmp_dir

# ONE definition of the 30-minute gaps-and-islands session oracle —
# h_session (built-in session_window) and h_stateful_sessions (the
# custom applyInPandasWithState operator) must verify against
# IDENTICAL semantics; a one-sided edit would silently fork them.
SESSION_ORACLE = """
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, event_id,
               sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, epoch_us(min(ts)) AS session_start_us,
           count(*) AS n_events,
           min(event_id) AS first_event, max(event_id) AS last_event
    FROM numbered
    GROUP BY user_id, session_id
    """


@register(
    "h_tumbling",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def h_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window counts/sums (batch-equivalent of the
    streaming agg; window() is the same expression under readStream)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "h_sliding",
    oracle="""
    SELECT (floor(epoch(ts) / 900) * 900 - k * 900)::BIGINT
               AS window_start_s,
           count(*) AS n,
           round(sum(value), 4) AS sum_value
    FROM events CROSS JOIN (SELECT unnest(range(4)) AS k)
    GROUP BY 1
    """,
)
def h_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 15 minutes — each event lands in 4
    overlapping windows (the oracle generates the same 4 offsets).

    Window starts are emitted as BIGINT epoch seconds on both sides
    (same tz-sidestep as h_session's epoch_us): DuckDB's to_timestamp
    returns TIMESTAMPTZ while Spark's window.start is a plain
    timestamp, which the driver's schema compare rejects."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.unix_seconds(F.col("window.start")).alias("window_start_s"),
            "n",
            "sum_value",
        )
    )


@register(
    "h_session",
    oracle=SESSION_ORACLE,
)
def h_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows, 30-minute gap, per user — session_window() in
    Spark, gaps-and-islands (lag + cumulative sum) as the oracle.
    Boundary pinned: a gap of exactly 30min starts a NEW session in
    both formulations."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("event_id").alias("first_event"),
            F.max("event_id").alias("last_event"),
            F.unix_micros(F.min("ts")).alias("session_start_us"),
        )
        .select("user_id", "session_start_us", "n_events", "first_event", "last_event")
    )


@register(
    "h_stream_upsert",
    cache_plan=False,
    # The stream's final state is SQL-checkable: the source chunks are
    # time-ordered, so no row is ever beyond the watermark horizon and
    # the folded state equals a plain relational last-wins over all
    # events. (Late-data DROP behavior is exercised separately with
    # crafted out-of-order chunks in tests/test_streaming.py.)
    # oracle_in_bench=False: the engine runs a genuine multi-micro-batch
    # stream (source splitting, state-store commits, per-batch MERGE);
    # the oracle's one-shot batch dedup is not a comparable plan shape
    # for baseline timing. Correctness stays hash-checked at sf0.01.
    oracle_in_bench=False,
    oracle="""
    SELECT user_id, event_type,
           event_id AS kept_event_id,
           round(value, 4) AS kept_value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def h_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming: events split into 3 time-ordered
    files -> file source, one file per micro-batch -> watermark +
    dropDuplicates -> foreachBatch last-wins MERGE. Returns the final
    state table (per (user_id, event_type) latest value). Batch/stream
    parity with f_distinct is asserted in tests/test_streaming.py."""
    from sparkclif.streaming.source import write_time_chunks
    from sparkclif.streaming.upsert import stream_upsert_events

    src = tmp_dir() + "/stream_src"
    ev = table(spark, sf_dir, "events")
    write_time_chunks(ev, src, n_chunks=3, key=f"{sf_dir}/events")
    state = stream_upsert_events(spark, src, ev.schema)
    # explicit schema: the empty-state fallback is a dtype-less pandas
    # frame that createDataFrame cannot infer from
    out = spark.createDataFrame(
        state,
        "user_id long, event_type string, ts timestamp, event_id long, value double",
    )
    return out.select(
        "user_id",
        "event_type",
        F.col("event_id").alias("kept_event_id"),
        F.round("value", 4).alias("kept_value"),
    )


@register(
    "h_stateful_sessions",
    cache_plan=False,
    # Same gaps-and-islands oracle as the batch h_session: the
    # incremental stateful operator's folded snapshots must equal the
    # relational sessionization row-for-row — a strictly stronger
    # check than the rows-only smoke it replaced.
    # oracle_in_bench=False: the engine runs a genuine 3-micro-batch
    # applyInPandasWithState stream; the oracle's one-shot batch
    # windowing is not a comparable plan shape for baseline timing.
    oracle_in_bench=False,
    oracle=SESSION_ORACLE,
)
def h_stateful_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator: incremental per-user
    sessionization via applyInPandasWithState (O(1) state per key —
    the open-session accumulator). Snapshots fold last-wins; result
    matches the batch h_session gaps-and-islands output row-for-row
    (asserted in tests/test_streaming.py)."""
    from sparkclif.streaming.source import write_time_chunks
    from sparkclif.streaming.stateful import stream_sessionize

    src = tmp_dir() + "/stateful_src"
    ev = table(spark, sf_dir, "events")
    write_time_chunks(ev, src, n_chunks=3, key=f"{sf_dir}/events")
    return stream_sessionize(spark, src, ev.schema).select(
        "user_id", "session_start_us", "n_events", "first_event", "last_event"
    )


@register(
    "h_stream_dedup",
    cache_plan=False,
    # The stream's output is SQL-checkable: injected duplicates are
    # FULL-ROW identical (producer-retry echoes), so the dedup output
    # is exactly the distinct event set regardless of which physical
    # copy the state keeps.
    # oracle_in_bench=False: the engine runs a genuine 3-micro-batch
    # stateful stream (state-store lookups, cross-batch dedup); the
    # oracle's plain scan is not a comparable plan for baseline timing.
    oracle_in_bench=False,
    oracle="""
    SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
           round(value, 4) AS value
    FROM events
    """,
)
def h_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup under at-least-once delivery: events split
    into 3 time-ordered files, each file re-appending the previous
    file's 64 newest rows as bit-identical duplicate echoes (producer
    retries) -> watermarked dropDuplicates keyed on (event_id, ts) so
    state is horizon-bounded -> append sink. Output = each event exactly
    once; the echoes are dropped by cross-batch STATE (they sit at the
    watermark frontier, so age-filtering can never mask a state bug)."""
    from sparkclif.streaming.dedup import stream_dedup_events
    from sparkclif.streaming.source import write_time_chunks

    src = tmp_dir() + "/stream_dedup_src"
    ev = table(spark, sf_dir, "events")
    write_time_chunks(ev, src, n_chunks=3, key=f"{sf_dir}/events", echo_rows=64)
    out = stream_dedup_events(spark, src, ev.select(
        "event_id", "ts", "user_id", "event_type", "value"
    ).schema)
    return out.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        F.round("value", 4).alias("value"),
    )


@register(
    "h_stream_join",
    cache_plan=False,
    # Inner stream-stream join over a time-ordered source folds to the
    # batch theta join row-for-row; the oracle states that join.
    # oracle_in_bench=False: the engine runs a genuine two-source
    # micro-batch stream-stream join (state store per side, cross-batch
    # matches); the oracle's one-shot batch join is not a comparable
    # plan shape for baseline timing.
    oracle_in_bench=False,
    oracle="""
    SELECT a.event_id AS id_a, b.event_id AS id_b,
           a.user_id AS user_id,
           epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
    FROM events a
    JOIN events b
      ON b.user_id = a.user_id
         AND b.ts > a.ts
         AND b.ts <= a.ts + INTERVAL 30 MINUTE
    """,
)
def h_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner self-join with an event-time range
    condition: each event joined to the same user's strictly-later
    events within 30 minutes, across micro-batch boundaries. The
    time bound + both watermarks give Spark a finite state-retention
    horizon — the only way a stream-stream join is runnable at
    100 TB. Output equals the batch theta join (oracle)."""
    from sparkclif.streaming.join import stream_range_join_events
    from sparkclif.streaming.source import write_time_chunks

    src = tmp_dir() + "/stream_join_src"
    ev = table(spark, sf_dir, "events")
    write_time_chunks(ev, src, n_chunks=3, key=f"{sf_dir}/events")
    out = stream_range_join_events(
        spark, src, ev.select("event_id", "user_id", "ts").schema, window_s=1800
    )
    return out.select("id_a", "id_b", "user_id", "gap_us")


@register(
    "h_stream_late",
    cache_plan=False,
    # oracle_in_bench=False: the engine runs a genuine 3-micro-batch
    # watermarked stream; the oracle's one-shot filtered agg is not a
    # comparable plan for baseline timing.
    oracle_in_bench=False,
    # Exact restatement of the late-data contract: the 200 displaced
    # rows (the stream's oldest, by (ts, event_id)) arrive in the last
    # micro-batch with the watermark near stream end -> DROPPED before
    # aggregation; append mode emits a window once the watermark
    # REACHES its end (non-strict — measured: a final watermark landing
    # exactly ON a window end emits that window), so windows ending
    # after max(ts) - 10 min are never emitted. Both effects are pure
    # functions of the input.
    oracle="""
    WITH late AS (
        SELECT event_id FROM events ORDER BY ts, event_id LIMIT 200
    ),
    wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events)
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*)::BIGINT AS n
    FROM events, wm
    WHERE event_id NOT IN (SELECT event_id FROM late)
      AND date_trunc('hour', ts) + INTERVAL 1 HOUR <= wm.w
    GROUP BY 1, 2
    """,
)
def h_stream_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark late-data semantics, driven end-to-end: a tumbling
    1-hour count stream whose LAST micro-batch carries the 200 oldest
    events displaced to the end of the stream. The 10-minute watermark
    has advanced ~a month past their event times by then, so a
    conforming engine drops exactly that displaced set, and append
    mode emits each surviving window once, after the watermark passes
    its end (streaming/late.py; the state bound at 100 TB is the
    point — window state is delay-horizon × keys, not stream
    lifetime)."""
    from sparkclif.streaming.late import stream_window_counts
    from sparkclif.streaming.source import write_time_chunks

    src = tmp_dir() + "/stream_late_src"
    ev = table(spark, sf_dir, "events")
    write_time_chunks(
        ev, src, n_chunks=3, key=f"{sf_dir}/events", displace_rows=200
    )
    out = stream_window_counts(
        spark,
        src,
        ev.select("event_id", "ts", "user_id", "event_type", "value").schema,
        watermark="10 minutes",
        window="1 hour",
    )
    return out


@register(
    "h_stream_ohlc",
    cache_plan=False,
    # oracle_in_bench=False: the engine runs a genuine 3-micro-batch
    # watermarked stream; the oracle's one-shot windowed agg is not a
    # comparable plan for baseline timing.
    oracle_in_bench=False,
    # Exact restatement of the continuous-aggregate contract: append
    # mode emits a bar once the final watermark (max(ts) - 10 min)
    # reaches its window end (non-strict — the h_stream_late measured
    # convention); open/close follow the (ts, event_id) total order
    # within each emitted bar.
    oracle="""
    WITH wm AS (SELECT max(ts) - INTERVAL 10 MINUTE AS w FROM events),
    o AS (
        SELECT event_type, date_trunc('hour', ts) AS window_start, value,
               row_number() OVER (
                   PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (
                   PARTITION BY event_type, date_trunc('hour', ts)
                   ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT window_start, event_type,
           count(*)::BIGINT AS n,
           round(max(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
           round(max(value), 4) AS high,
           round(min(value), 4) AS low,
           round(max(CASE WHEN rn_d = 1 THEN value END), 4) AS close
    FROM o, wm
    WHERE window_start + INTERVAL 1 HOUR <= wm.w
    GROUP BY 1, 2
    """,
)
def h_stream_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CONTINUOUS-AGGREGATE form of e_resample_ohlc: hourly OHLC
    bars maintained incrementally by a watermarked tumbling-window
    stream. min_by/max_by are declarative aggregates, so each
    micro-batch folds into O(1) state per open bar (one (value, key)
    pair per bound — the same watermark-horizon state bound as the
    windowed count); append mode emits each bar exactly once, when
    the watermark passes its end — bar-closing semantics a feature
    store or chart consumer needs. The oracle restates both the bar
    contents (total (ts, event_id) order) and the emission rule
    (window end <= final watermark) as pure functions of the input
    (streaming/rollup.py)."""
    from sparkclif.streaming.rollup import stream_ohlc_bars
    from sparkclif.streaming.source import write_time_chunks

    src = tmp_dir() + "/stream_ohlc_src"
    ev = table(spark, sf_dir, "events")
    write_time_chunks(ev, src, n_chunks=3, key=f"{sf_dir}/events")
    return stream_ohlc_bars(
        spark,
        src,
        ev.select("event_id", "ts", "event_type", "value").schema,
        watermark="10 minutes",
        window="1 hour",
    )
