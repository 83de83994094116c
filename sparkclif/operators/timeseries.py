"""Time-series resample + gap-fill — the hypertable-style rollup:
bucket an event stream to a fixed grid per key, materialize the empty
buckets, and forward-fill the last observation across gaps.

Plan shape: per-key bounds aggregation (map-side combined) -> grid
explode (scan-side sequence over the key's own time span — never a
global calendar cross join) -> left join of the bucketed aggregates ->
one per-key ordered window for the forward fill. Grid size is
sum over keys of (key's active span / step): sparse keys cost
proportionally to THEIR span, and a hot key's grid is bounded by the
calendar, not its event count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_gapfill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    step: str = "1 hour",
    unit: str = "hour",
) -> DataFrame:
    """Resample ``events`` to one row per (key, ``unit`` bucket) over
    each key's [first, last] bucket span, with event counts (0 in
    gaps) and the last observed value forward-filled across gaps.
    "Last" within a bucket breaks ties by (ts, id) — deterministic
    under any partitioning.

    Plan (gap-run expansion): aggregate to the OCCUPIED buckets, run
    the forward-fill window and ``lead`` over that compressed
    relation, then explode each entry's run of grid buckets up to the
    next occupied one — every gap bucket inherits the entry's filled
    value, so no grid relation is ever built or joined. Two exchanges
    total (bucket agg, per-key window); the old grid-join shape paid
    four-plus (bounds agg, grid x hourly join re-shuffles, window)
    and shuffled the FULL grid — at 100 TB the grid is the largest
    relation in the query and here it only ever exists as generator
    output inside a scan stage. Per-row explode length is bounded by
    the longest per-key gap, not the span."""
    h = F.date_trunc(unit, F.col(ts_col))
    hourly = events.groupBy(F.col(key_col), h.alias("__h")).agg(
        F.count("*").cast("long").alias("__n"),
        F.max_by(
            F.round(value_col, 4), F.struct(ts_col, id_col)
        ).alias("__lastv"),
    )
    w = Window.partitionBy(key_col).orderBy("__h")
    wf = w.rowsBetween(Window.unboundedPreceding, 0)
    run = hourly.select(
        key_col,
        "__h",
        "__n",
        F.last("__lastv", ignorenulls=True).over(wf).alias("__fv"),
        F.lead("__h").over(w).alias("__next"),
    )
    # run covers [this entry, next entry): the entry bucket itself,
    # then its trailing gap buckets (count 0, value forward-filled);
    # the last entry per key has no next and emits just itself. The
    # greatest() guard keeps the sequence bounds ordered when ``step``
    # exceeds the spacing of adjacent occupied buckets (e.g. step='2
    # hours' over hour buckets 01:00, 02:00): the run then degenerates
    # to the entry bucket alone instead of a negative-range error.
    grid_run = F.sequence(
        F.col("__h"),
        F.greatest(
            F.coalesce(F.col("__next") - F.expr(f"interval {step}"), F.col("__h")),
            F.col("__h"),
        ),
        F.expr(f"interval {step}"),
    )
    r = run.select(key_col, "__n", "__fv", "__h", F.explode(grid_run).alias("__gh"))
    return r.select(
        key_col,
        F.unix_micros("__gh").alias("hour_us"),
        F.when(F.col("__gh") == F.col("__h"), F.col("__n"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_events"),
        F.col("__fv").alias("filled_value"),
    )


def resample_interpolate(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
    step: str = "1 hour",
    unit: str = "hour",
) -> DataFrame:
    """LINEAR-interpolation resample — the other half of the
    hypertable gap-fill story (``resample_gapfill`` forward-fills;
    this draws the line between neighboring observations, the
    ``interpolate()`` of timescale-style rollups). One row per (key,
    ``unit`` bucket) over each key's [first, last] occupied-bucket
    span: occupied buckets carry their own last-in-bucket value
    (ties by (ts, id), the gapfill convention); each gap bucket gets
    ``v0 + (v1 - v0) * (t - t0)/(t1 - t0)``.

    Anchor rule (round-11 review): the lerp anchors on the nearest
    buckets with OBSERVED (non-NULL) values — a bucket whose events
    all carry NULL values is a real bucket (it emits its own NULL and
    bounds the grid) but is NOT an interpolation anchor; the line is
    drawn straight through it, the hypertable ``interpolate()``
    semantics. (The first cut anchored on the ADJACENT occupied
    bucket regardless of NULLness — value-identical on the NULL-free
    testbed, divergent from the IGNORE NULLS oracle on real data:
    exactly the latent class ADVICE r9/r10 flagged for i_dedup_url.)
    A gap with no non-NULL anchor on one side interpolates to NULL —
    never extrapolates.

    Exactness: anchors are epoch-microsecond BIGINTs and the anchor
    values are round(value, 4) doubles; the interpolation is stated
    as the ONE expression ``v0 + (v1 - v0) * (double(t - t0) /
    double(t1 - t0))`` on both engines — exact integer-valued
    operands into each IEEE op, so the unrounded double is
    bit-identical (the i_quality_classifier discipline). Occupied
    buckets take their own value via the CASE, never via frac = 0,
    so no reliance on ``x + y*0.0 == x``.

    Plan: the resample_gapfill gap-run expansion verbatim — bucket
    agg, ONE per-key window operator (lead of the next occupied
    bucket plus IGNORE-NULLS last/first frames for the four lerp
    anchors — different frames, same partition+order, one sort),
    per-entry grid-run explode. Two exchanges total; the grid only
    ever exists as generator output inside a scan stage; per-row
    explode length is bounded by the longest per-key gap, not the
    span."""
    h = F.date_trunc(unit, F.col(ts_col))
    hourly = events.groupBy(F.col(key_col), h.alias("__h")).agg(
        F.count("*").cast("long").alias("__n"),
        F.max_by(
            F.round(value_col, 4), F.struct(ts_col, id_col)
        ).alias("__v"),
    )
    w = Window.partitionBy(key_col).orderBy("__h")
    wb = w.rowsBetween(Window.unboundedPreceding, 0)
    wf = w.rowsBetween(1, Window.unboundedFollowing)
    obs_h = F.when(F.col("__v").isNotNull(), F.col("__h"))
    run = hourly.select(
        key_col,
        "__h",
        "__n",
        "__v",
        F.lead("__h").over(w).alias("__next"),
        # non-NULL lerp anchors: last observed at-or-before this entry,
        # first observed strictly after it (every gap bucket in this
        # entry's run shares them — no occupied bucket lies between)
        F.last("__v", ignorenulls=True).over(wb).alias("__v0"),
        F.last(obs_h, ignorenulls=True).over(wb).alias("__t0"),
        F.first("__v", ignorenulls=True).over(wf).alias("__v1"),
        F.first(obs_h, ignorenulls=True).over(wf).alias("__t1"),
    )
    # same [this entry, next entry) run as resample_gapfill, same
    # degenerate-run guard for step > bucket spacing
    grid_run = F.sequence(
        F.col("__h"),
        F.greatest(
            F.coalesce(F.col("__next") - F.expr(f"interval {step}"), F.col("__h")),
            F.col("__h"),
        ),
        F.expr(f"interval {step}"),
    )
    r = run.select(
        key_col,
        "__n",
        "__v",
        "__h",
        "__v0",
        "__t0",
        "__v1",
        "__t1",
        F.explode(grid_run).alias("__gh"),
    )
    # __t0 < gap bucket < __t1 whenever both anchors exist (they are
    # distinct observed buckets on opposite sides), so the denominator
    # is strictly positive; a missing anchor NULLs the lerp through
    # ordinary NULL arithmetic — the declared no-extrapolation result
    frac = (
        (F.unix_micros("__gh") - F.unix_micros("__t0")).cast("double")
        / (F.unix_micros("__t1") - F.unix_micros("__t0")).cast("double")
    )
    lerp = F.col("__v0") + (F.col("__v1") - F.col("__v0")) * frac
    return r.select(
        key_col,
        F.unix_micros("__gh").alias("hour_us"),
        F.when(F.col("__gh") == F.col("__h"), F.col("__n"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_events"),
        F.when(F.col("__gh") == F.col("__h"), F.col("__v"))
        .otherwise(lerp)
        .alias("interp_value"),
    )


def cusum_page(
    events,
    target: int = 5000,
    slack: int = 1000,
    threshold: int = 20000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    val_col: str = "value",
):
    """Two-sided CUSUM drift detector (Page 1954) per key, in an exact
    integer basis — the sequential change-point statistic behind
    metric-drift alarms (where e_win_zscore flags single outliers,
    CUSUM accumulates SMALL persistent shifts until they cross a
    decision threshold):

        sp_i = max(0, sp_{i-1} + (q_i − target − slack))     (upward)
        sn_i = max(0, sn_{i-1} + (target − q_i − slack))     (downward)
        alarm when sp_i > threshold or sn_i > threshold, then BOTH
        statistics reset to 0 (the standard restart — each alarm
        opens a fresh detection cycle).

    ``q`` is the value in integer centi-units (floor(v·100 + 0.5)), so
    every step is BIGINT arithmetic and the SQL restatement folds the
    identical sequence — no float accumulation anywhere. Returns per
    key: ``(key, n_events, cusum_pos, cusum_neg, max_pos, n_alarms)``
    with ``max_pos`` the running maximum of the PRE-reset upward
    statistic (the peak drift evidence ever accumulated).

    Plan: the ewma_last funnel — a recurrence with max-clamping cannot
    be restated as a window prefix-sum (the clamp is order-dependent),
    so: ONE groupBy(key) shuffle collecting the (ts, seq, q) array,
    one whole-stage-codegen F.aggregate fold. No window recursion, no
    Python; per-key arrays bounded by activity skew (see
    sequence.funnel_stages).

    NULL hygiene: a row with a NULL value or NULL time is NOT an
    observation and is dropped before the fold (the standard CUSUM
    treatment). Folding it instead would silently RESET both
    statistics — greatest(0, NULL) is 0 in both engines, erasing
    accumulated drift evidence with no alarm — and a NULL time would
    fold at the FRONT of Spark's sort_array but the BACK of DuckDB's
    ORDER BY (nulls-last), diverging the order-dependent recurrence.
    Keys whose every row is dropped vanish (consistently with the
    oracle's post-filter GROUP BY)."""
    events = events.filter(
        F.col(val_col).isNotNull() & F.col(ts_col).isNotNull()
    )
    q = F.floor(F.col(val_col) * 100 + F.lit(0.5)).cast("long")
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.unix_micros(F.col(ts_col)).alias("t"),
                F.col(seq_col).alias("s"),
                q.alias("q"),
            )
        )
    )
    grouped = events.groupBy(user_col).agg(arr.alias("__a"))
    zero = F.struct(
        F.lit(0).cast("long").alias("sp"),
        F.lit(0).cast("long").alias("sn"),
        F.lit(0).cast("long").alias("mx"),
        F.lit(0).cast("long").alias("al"),
    )

    def step(acc, e):
        sp1 = F.greatest(
            F.lit(0).cast("long"), acc["sp"] + e["q"] - F.lit(target + slack)
        )
        sn1 = F.greatest(
            F.lit(0).cast("long"), acc["sn"] + F.lit(target - slack) - e["q"]
        )
        alarm = (sp1 > threshold) | (sn1 > threshold)
        return F.struct(
            F.when(alarm, F.lit(0).cast("long")).otherwise(sp1).alias("sp"),
            F.when(alarm, F.lit(0).cast("long")).otherwise(sn1).alias("sn"),
            F.greatest(acc["mx"], sp1).alias("mx"),
            (acc["al"] + alarm.cast("long")).alias("al"),
        )

    folded = F.aggregate("__a", zero, step)
    return grouped.select(
        user_col,
        F.size("__a").cast("long").alias("n_events"),
        folded["sp"].alias("cusum_pos"),
        folded["sn"].alias("cusum_neg"),
        folded["mx"].alias("max_pos"),
        folded["al"].alias("n_alarms"),
    )


def ewma_last(
    events,
    alpha: float = 0.5,
    user_col: str = "user_id",
    ts_col: str = "ts",
    seq_col: str = "event_id",
    val_col: str = "value",
):
    """Per-key exponentially-weighted moving average (final smoothed
    value after the last observation): EWMA_t = α·x_t + (1-α)·EWMA_{t-1},
    seeded with the first observation — the standard online smoother
    for metric streams. Returns ``(key, n_events, ewma)``.

    A recurrence is inherently sequential, so the plan is the funnel
    shape: ONE groupBy(key) shuffle collecting the time-ordered value
    array, then a whole-stage-codegen F.aggregate fold — no window
    recursion, no Python. Determinism: both engines fold the SAME
    sequence with the SAME IEEE doubles, so the result is bit-identical
    before the output rounding (α = 0.5 makes every coefficient an
    exact power of two, but any α folds identically — the parsed
    double literal is shared). Per-key arrays are bounded by activity
    skew (see sequence.funnel_stages).
    """
    from pyspark.sql import functions as F

    from sparkclif.operators.expr import bind

    a = float(alpha)
    arr = F.sort_array(
        F.collect_list(
            F.struct(
                F.unix_micros(F.col(ts_col)).alias("t"),
                F.col(seq_col).alias("q"),
                F.col(val_col).cast("double").alias("v"),
            )
        )
    )
    grouped = events.groupBy(user_col).agg(arr.alias("__a"))

    def fold(vals):
        return F.aggregate(
            F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
            F.element_at(vals, 1),
            lambda acc, x: F.lit(a) * x + F.lit(1.0 - a) * acc,
        )

    return grouped.select(
        user_col,
        F.size("__a").cast("long").alias("n_events"),
        F.round(
            bind(F.transform("__a", lambda e: e["v"]), fold), 4
        ).alias("ewma"),
    )
