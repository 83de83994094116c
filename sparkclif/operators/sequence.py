"""Event-sequence analytics: funnel progression and cohort retention —
the MATCH_RECOGNIZE-shaped query family, expressed Spark-first.

Spark has no MATCH_RECOGNIZE; the funnel operator instead collects
each user's events into one ordered array (a single shuffle) and runs
the state machine as an ``F.aggregate`` fold over that array — pure
JVM higher-order expressions inside whole-stage codegen, no Python,
no per-user iterative joins. This is the right 100 TB shape: per-user
event counts are bounded (activity skew caps out far below partition
size), the fold is O(events) per user, and the only shuffle is the
per-user grouping. The step-per-join SQL formulation (the oracle)
needs one self-join per funnel stage — fine for 3 stages in an
optimizer, but the fold generalizes to arbitrary patterns without
multiplying scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    window_us: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    seq_col: str = "event_id",
) -> DataFrame:
    """Ordered funnel progression per user: stage ``i`` is reached
    when an event of type ``steps[i]`` occurs STRICTLY after the event
    that reached stage ``i-1`` (the classic conversion-funnel rule —
    a click at the exact view timestamp does not count as 'after'),
    and — when ``window_us`` is set — within ``window_us`` of the
    stage-0 anchor (the conversion window; the funnel anchors ONCE at
    the user's first step-0 event, it does not re-try later anchors).
    Returns one row per user: ``(user, stage, t0_us .. tN_us)`` with
    the reach-times as exact epoch microseconds (NULL for unreached
    stages) and ``stage`` = number of steps completed.

    Plan: filter to the step types scan-side (pushed to the scan —
    other event types never shuffle), ONE groupBy(user) building the
    (ts, seq, type) array via sort_array(collect_list(...)), then a
    JVM fold that advances the stage machine. The fold's transitions
    compare strictly on ``ts``, so its result is independent of how
    equal-timestamp events tie-sort; ``seq_col`` in the sort keys
    makes the array itself deterministic anyway.
    """
    if not steps:
        # argless create_map()/isin() would fail analysis with a
        # cryptic type error — make the precondition explicit
        raise ValueError("funnel_stages requires at least one step type")
    n = len(steps)
    type_to_idx = F.create_map(
        *[x for i, s in enumerate(steps) for x in (F.lit(s), F.lit(i))]
    )
    evs = events.where(F.col(type_col).isin(*steps)).select(
        F.col(user_col),
        F.struct(
            F.unix_micros(F.col(ts_col)).alias("t"),
            F.col(seq_col).alias("q"),
            type_to_idx[F.col(type_col)].alias("s"),
        ).alias("e"),
    )
    grouped = evs.groupBy(user_col).agg(
        F.sort_array(F.collect_list("e")).alias("__evs")
    )
    # fold state: (stage, times array). An event advances the machine
    # iff it is the NEXT step and strictly after the previous reach
    # time (stage 0 needs no predecessor).
    zero = F.struct(
        F.lit(0).cast("int").alias("stage"),
        F.array(*[F.lit(None).cast("long") for _ in range(n)]).alias("times"),
    )

    def step(acc, e):
        # CaseWhen evaluates branches lazily — element_at(times, 0)
        # would raise under ANSI, so the stage-0 case must short-
        # circuit through when(), not through a bare OR
        after_prev = F.when(acc["stage"] == 0, F.lit(True)).otherwise(
            e["t"] > F.element_at(acc["times"], F.greatest(acc["stage"], F.lit(1)))
        )
        advance = (e["s"] == acc["stage"]) & after_prev
        if window_us is not None:
            in_window = F.when(acc["stage"] == 0, F.lit(True)).otherwise(
                e["t"] <= F.element_at(acc["times"], 1) + F.lit(window_us)
            )
            advance = advance & in_window
        return F.when(
            advance & (acc["stage"] < n),
            F.struct(
                (acc["stage"] + 1).cast("int").alias("stage"),
                F.transform(
                    acc["times"],
                    (lambda t, i: F.when(i == acc["stage"], e["t"]).otherwise(t)),
                ).alias("times"),
            ),
        ).otherwise(acc)

    folded = grouped.select(
        user_col, F.aggregate("__evs", zero, step).alias("__st")
    )
    return folded.select(
        user_col,
        F.col("__st.stage").alias("stage"),
        *[
            F.element_at("__st.times", i + 1).alias(f"t{i}_us")
            for i in range(n)
        ],
    )


def cohort_retention(
    events: DataFrame,
    max_weeks: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention: users are cohorted by the Monday week
    of their FIRST event; for each cohort and week offset
    ``k = 0..max_weeks``, count the cohort users active (any event)
    in cohort-week + k. Returns ``(cohort_week, week_k, n_active)``
    with ``cohort_week`` as an ISO 'yyyy-MM-dd' string (a plain DATE
    round-trips as datetime.date vs datetime64 across engines and
    breaks a stringifying hash compare; the ISO string is portable).

    Plan: collapse the stream to DISTINCT (user, week) FIRST — one
    map-side-combinable dedup over the raw scan; date_trunc is
    monotone, so week(min ts) = min(week ts) and the cohort week is a
    plain min() over that already-tiny relation, which then
    self-joins on the unique user key. Everything after the first
    dedup is (users × active-weeks)-sized, never event-stream-sized
    — the dedupe-before-join shape that matters at 100 TB (the
    earlier formulation joined the full event scan and deduped
    after). The counting agg is a plain count (partial-combinable):
    rows are already distinct per (user, cohort, k). The k arithmetic
    is integer day-diffs div 7 — exact cross-engine.
    """
    # NOTE: callers pass the event stream to cohort on — e.g. a
    # deterministic hash-sampled slice when the raw stream is so dense
    # that every user's first event lands in week 0 (see
    # queries/group_events.py).
    weeks = events.select(
        user_col, F.date_trunc("week", ts_col).cast("date").alias("__wk")
    ).dropDuplicates([user_col, "__wk"])
    first = weeks.groupBy(user_col).agg(F.min("__wk").alias("__first_wk"))
    marked = (
        weeks.join(first, user_col)
        .select(
            user_col,
            F.date_format("__first_wk", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff("__wk", "__first_wk") / 7).cast("long").alias("week_k"),
        )
        .where(F.col("week_k") <= max_weeks)
    )
    return marked.groupBy("cohort_week", "week_k").agg(
        F.count("*").cast("long").alias("n_active")
    )


def session_transitions(
    events: DataFrame,
    gap_minutes: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    seq_col: str = "event_id",
) -> DataFrame:
    """Corpus-wide event-type transition counts WITHIN sessions — the
    first-order Markov model of user behavior (the input to next-action
    prediction and anomaly scoring). Sessions are the standard
    gaps-and-islands: a new session starts at a gap >= ``gap_minutes``;
    transitions never cross a session boundary. Returns
    ``(from_type, to_type, n)``.

    Plan: ONE shuffle (hash partition by user) feeds every window —
    the gap flag, the session-id running sum, and the lag() that pairs
    each event with its predecessor all share the same
    ``(user)`` partitioning with ``(ts, seq)`` ordering, so Catalyst
    plans them in a single Window stage chain without re-exchanging.
    Per-user partitions are bounded by activity skew (the same
    argument as funnel_stages). The final count agg is map-side
    combined over a type² key space — tiny at any scale.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, seq_col)
    gap = F.lag(ts_col).over(w)
    new_session = (
        gap.isNull()
        | (
            F.unix_micros(F.col(ts_col)) - F.unix_micros(gap)
            >= gap_minutes * 60 * 1_000_000
        )
    ).cast("long")
    with_sess = events.select(
        user_col,
        ts_col,
        seq_col,
        F.col(type_col),
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("__sess"),
    )
    w_sess = Window.partitionBy(user_col, "__sess").orderBy(ts_col, seq_col)
    paired = with_sess.select(
        F.lag(type_col).over(w_sess).alias("from_type"),
        F.col(type_col).alias("to_type"),
    ).where(F.col("from_type").isNotNull())
    return paired.groupBy("from_type", "to_type").agg(
        F.count("*").cast("long").alias("n")
    )
