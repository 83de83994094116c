"""funnel_stages / cohort_retention (operators/sequence.py): the
state-machine semantics the synthetic stream never isolates —
strict-after at equal timestamps, the anchor-once rule, conversion-
window cutoff, and out-of-order step arrivals."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from sparkclif.operators.sequence import cohort_retention, funnel_stages

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    """rows: (user_id, seconds_offset, event_type, event_id)"""
    data = [
        (u, T0 + dt.timedelta(seconds=s), t, i) for (u, s, t, i) in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, ts timestamp, event_type string, event_id long"
    )


def _run(spark, rows, window_us=None):
    ev = _events(spark, rows)
    return {
        r["user_id"]: (r["stage"], r["t0_us"], r["t1_us"], r["t2_us"])
        for r in funnel_stages(
            ev, ["view", "click", "purchase"], window_us=window_us
        ).collect()
    }


def test_funnel_strict_after_at_equal_ts(spark):
    # click at the EXACT view timestamp does not advance; a later one does
    out = _run(
        spark,
        [
            (1, 0, "view", 1),
            (1, 0, "click", 2),   # same instant -> no
            (1, 5, "click", 3),   # later -> yes
            (2, 0, "view", 4),
            (2, 0, "click", 5),   # only the same-instant click -> stuck
        ],
    )
    assert out[1][0] == 2
    assert out[2] == (1, us(0), None, None)


def us(seconds):
    return int((T0 + dt.timedelta(seconds=seconds)).timestamp() * 1_000_000)


def test_funnel_anchor_once_no_retry(spark):
    # user 1: first view's window expires before the click; a SECOND
    # view inside range must NOT re-anchor (anchor-once contract)
    W = 10 * 1_000_000
    out = _run(
        spark,
        [
            (1, 0, "view", 1),
            (1, 100, "view", 2),
            (1, 105, "click", 3),  # within 10s of view#2, not view#1
        ],
        window_us=W,
    )
    assert out[1] == (1, us(0), None, None)


def test_funnel_window_cutoff_from_anchor_not_prev_stage(spark):
    # click at t=8 (inside), purchase at t=11 — inside 10s of the
    # CLICK but outside 10s of the ANCHOR -> funnel stops at stage 2
    W = 10 * 1_000_000
    out = _run(
        spark,
        [
            (1, 0, "view", 1),
            (1, 8, "click", 2),
            (1, 11, "purchase", 3),
        ],
        window_us=W,
    )
    assert out[1] == (2, us(0), us(8), None)


def test_funnel_out_of_order_steps_dont_count(spark):
    # purchase BEFORE the click never advances stage 3
    out = _run(
        spark,
        [
            (1, 0, "view", 1),
            (1, 2, "purchase", 2),
            (1, 5, "click", 3),
            (2, 0, "click", 4),  # click with no prior view -> stage 0
        ],
    )
    assert out[1][0] == 2
    assert out[2] == (0, None, None, None)


def test_funnel_users_without_step_events_absent(spark):
    ev = _events(spark, [(1, 0, "error", 1), (2, 0, "view", 2)])
    got = funnel_stages(ev, ["view", "click", "purchase"]).collect()
    assert [r["user_id"] for r in got] == [2]


def test_cohort_retention_model(spark):
    # user 1 first event week 0, active weeks 0 and 2
    # user 2 first event week 1, active week 1 only
    day = 86_400
    ev = _events(
        spark,
        [
            (1, 0, "view", 1),
            (1, 2 * day, "view", 2),        # same week
            (1, 14 * day, "view", 3),       # week 2
            (2, 7 * day, "view", 4),        # week 1 cohort
        ],
    )
    got = {
        (r["cohort_week"], r["week_k"]): r["n_active"]
        for r in cohort_retention(ev, max_weeks=3).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_session_transitions_respect_boundaries(spark):
    from sparkclif.operators.sequence import session_transitions

    ev = _events(
        spark,
        [
            (1, 0, "view", 1),
            (1, 60, "click", 2),            # view->click (same session)
            (1, 60 + 31 * 60, "purchase", 3),  # 31 min gap: NO click->purchase
            (1, 60 + 31 * 60 + 10, "view", 4),  # purchase->view
            (2, 0, "view", 5),              # lone event, no transition
        ],
    )
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in session_transitions(ev, gap_minutes=30).collect()
    }
    assert got == {("view", "click"): 1, ("purchase", "view"): 1}


def test_session_transitions_equal_ts_order_by_event_id(spark):
    from sparkclif.operators.sequence import session_transitions

    ev = _events(
        spark,
        [(1, 0, "b", 2), (1, 0, "a", 1)],  # same ts: order by event_id -> a->b
    )
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in session_transitions(ev).collect()
    }
    assert got == {("a", "b"): 1}
