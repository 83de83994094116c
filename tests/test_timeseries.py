"""Edge cases for the resample + gap-fill operator that the fixed
testbed data cannot be relied on to hit: multi-bucket gaps, in-bucket
ties on the timestamp, single-event keys, and bucket-boundary
timestamps. The oracle parity test (e_win_gapfill) checks the operator
against DuckDB on real data; this file pins the semantics on crafted
rows where the expected output is hand-computable.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from sparkclif.operators.timeseries import resample_gapfill

HOUR_US = 3_600_000_000


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (uid, datetime(2024, 1, 1, h, m), eid, float(v))
            for uid, h, m, eid, v in rows
        ],
        "user_id long, ts timestamp, event_id long, value double",
    )


def _run(spark, rows):
    out = resample_gapfill(_ev(spark, rows)).orderBy("user_id", "hour_us")
    return [
        (r.user_id, r.hour_us, r.n_events, r.filled_value) for r in out.collect()
    ]


def test_multi_bucket_gap_forward_fills(spark):
    # events at 00:xx and 03:xx — buckets 01 and 02 must materialize
    # with zero events and carry hour-00's last value forward
    base = datetime(2024, 1, 1).timestamp() * 1_000_000
    rows = [(1, 0, 10, 100, 1.5), (1, 0, 40, 101, 2.5), (1, 3, 0, 102, 9.0)]
    got = _run(spark, rows)
    assert got == [
        (1, int(base) + 0 * HOUR_US, 2, 2.5),
        (1, int(base) + 1 * HOUR_US, 0, 2.5),
        (1, int(base) + 2 * HOUR_US, 0, 2.5),
        (1, int(base) + 3 * HOUR_US, 1, 9.0),
    ]


def test_single_event_key_yields_one_bucket(spark):
    got = _run(spark, [(7, 5, 30, 1, 4.25)])
    assert len(got) == 1
    assert got[0][2:] == (1, 4.25)


def test_equal_ts_tie_breaks_by_event_id(spark):
    # same user, identical timestamp: the higher event_id's value must
    # win the bucket's "last observation" regardless of input order
    rows = [(2, 1, 0, 201, 8.0), (2, 1, 0, 200, 3.0)]
    got = _run(spark, rows)
    assert got == [(2, got[0][1], 2, 8.0)]


def test_boundary_timestamp_lands_in_its_own_bucket(spark):
    # event exactly at 02:00 belongs to bucket 02, not 01
    rows = [(3, 1, 59, 300, 1.0), (3, 2, 0, 301, 2.0)]
    got = _run(spark, rows)
    assert [g[2] for g in got] == [1, 1]
    assert got[1][1] - got[0][1] == HOUR_US


def test_keys_are_independent(spark):
    # a second key's span must not widen the first key's grid
    rows = [(1, 0, 0, 1, 1.0), (2, 0, 0, 2, 2.0), (2, 9, 0, 3, 3.0)]
    got = _run(spark, rows)
    per_key = {}
    for uid, *_ in got:
        per_key[uid] = per_key.get(uid, 0) + 1
    assert per_key == {1: 1, 2: 10}


def test_no_python_udf_in_plan(spark):
    df = resample_gapfill(_ev(spark, [(1, 0, 0, 1, 1.0)]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_randomized_against_pandas_model(spark):
    # random event sets vs a pure-pandas reference model of the
    # contract: per-key hourly grid over [first, last] bucket, event
    # counts, last-(ts, event_id) value forward-filled
    import random

    rng = random.Random(20260814)
    rows = []
    eid = 0
    for uid in range(1, 7):
        for _ in range(rng.randint(1, 25)):
            rows.append(
                (
                    uid,
                    rng.randrange(0, 24),
                    rng.randrange(0, 60),
                    eid,
                    round(rng.uniform(-50, 50), 4),
                )
            )
            eid += 1
    got = _run(spark, rows)

    want = []
    for uid in sorted({r[0] for r in rows}):
        evs = [r for r in rows if r[0] == uid]
        base = int(datetime(2024, 1, 1).timestamp() * 1_000_000)
        h0 = min(e[1] for e in evs)
        h1 = max(e[1] for e in evs)
        filled = None
        for h in range(h0, h1 + 1):
            bucket = [e for e in evs if e[1] == h]
            if bucket:
                filled = max(bucket, key=lambda e: (e[2], e[3]))[4]
            want.append((uid, base + h * HOUR_US, len(bucket), filled))
    assert got == want


def test_ewma_matches_python_recurrence(spark):
    """The fold == the plain Python recurrence, including equal-ts
    ordering by event_id and the first-observation seed."""
    import datetime as dt

    from sparkclif.operators.timeseries import ewma_last

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 10, 4.0),
        (1, t0 + dt.timedelta(seconds=5), 11, 8.0),
        (1, t0 + dt.timedelta(seconds=5), 12, 2.0),   # tie -> after 11
        (2, t0, 13, 7.0),                              # single obs
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    got = {
        r["user_id"]: (r["n_events"], r["ewma"])
        for r in ewma_last(ev, alpha=0.5).collect()
    }
    # user 1: seed 4.0 -> 0.5*8+0.5*4=6.0 -> 0.5*2+0.5*6=4.0
    assert got == {1: (3, 4.0), 2: (1, 7.0)}
