"""As-of join — each left row matched to the latest right row with
right_time <= left_time for the same key (SURVEY.md §2.2 c_join_asof;
the longitudinal-ICU alignment pattern the reference consortium's data
format exists for).

Spark has no native ASOF JOIN. Four variants, one shared plan shape:

1. ``asof_join`` (default, the scale path): the union-sort trick.
   Tag right rows 0 / left rows 1, union, then one window pass per key
   ordered by (time, tag, tiebreak) carrying the last non-null right
   payload forward. Cost: ONE shuffle of (|L|+|R|) rows on the key +
   a per-partition sort — no row blowup, no skew amplification, works
   at any |matches-per-key| (a plain join+filter+rank would materialize
   |L|x|R| per key first). This is the plan you want at 100 TB.

2. Backward as-of WITH TOLERANCE (max staleness) composes on top of
   the same single-shuffle pass (``tolerance=``): the latest prior
   right is carried exactly as before, then nulled when older than
   the bound — correct because any OTHER candidate is older still, so
   "latest within tolerance" == "latest, if within tolerance". This
   is the ICU-alignment guard (a vitals reading matched to the most
   recent lab value only if that lab is fresh enough) and pandas'
   ``merge_asof(tolerance=)``; no second pass, no row blowup.

3. NEAREST-direction as-of (``asof_join_nearest``, late r8): each
   left row matched to the right row with the smallest |right_time −
   left_time| (ties → the backward side, pandas
   ``merge_asof(direction='nearest')``'s convention). Implemented as
   TWO window carries over the SAME union — one ascending (latest
   right <= t, the backward pass above) and one descending (earliest
   right > t) — which share the single ``__key`` exchange
   (EnsureRequirements: the second window adds a sort, never a
   shuffle), then an arithmetic pick of the closer side. This deletes
   the "needs a pandas kernel" limitation the r5 version of this
   docstring declared: the carry trick composes, it doesn't have to
   run once.

4. FORWARD-direction as-of (``asof_join_forward``, round 10 — closes
   the family): earliest right with right_time >= left_time
   (inclusive, min-tiebreak, optional look-ahead tolerance) via one
   DESCENDING carry window over the same tag-union.

Determinism: ties on right_time break by descending ``tiebreak``
(largest wins; the forward variant mirrors to ascending/min), matching
the oracle's
``row_number() OVER (... ORDER BY time DESC, tiebreak DESC) = 1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tag_union(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    tiebreak: str,
    r_seq,
    l_seq,
    cast_time: bool = False,
) -> "tuple[DataFrame, DataFrame]":
    """Shared tag-union scaffolding for every as-of variant: rights and
    lefts projected onto one schema (__key, __t, __seq, __is_left,
    __tb, __payload, <left columns>), ready to union and window.

    NULL hygiene, applied ONCE for all variants:
    - a NULL right_time can never satisfy any time predicate, but asc
      ordering puts NULLs FIRST where the carry window would hand the
      row to every left as a bogus "earliest" match — excluded;
    - a NULL right_key can never equi-match a left key (the oracle's
      JOIN never matches NULL = NULL), but partitionBy groups NULL
      keys into ONE partition where NULL-key lefts would "match" them
      — excluded. A NULL-key LEFT row then sits in a partition with no
      rights and reports no match, exactly the equi-join semantics.

    ``cast_time``: cast __t and the carried __rt to timestamp (the
    nearest variant needs microsecond arithmetic; the backward variant
    keeps native types so its interval comparison sees the original).

    The right time rides inside the carried struct so downstream
    checks (tolerance, distance) can compare it against the LEFT row's
    own __t after the carry."""
    lcols = left.columns

    def t(c):
        col = F.col(c)
        return col.cast("timestamp") if cast_time else col

    tagged_r = right.filter(
        F.col(right_time).isNotNull() & F.col(right_key).isNotNull()
    ).select(
        F.col(right_key).alias("__key"),
        t(right_time).alias("__t"),
        r_seq.cast("long").alias("__seq"),
        F.lit(0).alias("__is_left"),
        F.col(tiebreak).alias("__tb"),
        F.struct(
            t(right_time).alias("__rt"), *[F.col(p) for p in payload]
        ).alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    tagged_l = left.select(
        F.col(left_key).alias("__key"),
        t(left_time).alias("__t"),
        l_seq.cast("long").alias("__seq"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("__tb"),
        F.lit(None)
        .cast(tagged_r.schema["__payload"].dataType)
        .alias("__payload"),
        *[F.col(c) for c in lcols],
    )
    return tagged_r, tagged_l


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    tiebreak: str,
    prefix: str = "asof_",
    left_seq: str | None = None,
    right_seq: str | None = None,
    tolerance: str | None = None,
) -> DataFrame:
    """Backward as-of join, union-sort implementation (single shuffle).

    Returns ``left`` with ``prefix + p`` columns for each ``p`` in
    ``payload``, taken from the latest right row (right_time <=
    left_time, inclusive) per key; NULL when no prior right row exists.

    ``tolerance`` (optional): a SQL interval body (e.g. ``"30 DAYS"``)
    bounding staleness — the carried match is kept only when
    ``right_time >= left_time - INTERVAL tolerance`` (inclusive).
    Applied AFTER the carry, which is exact: the carried row is the
    latest prior right, and every other candidate is older, so a
    too-stale carry means no within-tolerance match exists.

    ``left_seq``/``right_seq`` (both or neither): a LOG-ORDER sequence
    (e.g. event_id) that refines time ties — a right row at the same
    time as the left applies only if its sequence is SMALLER, matching
    sequential replay of an event log. Without them, all equal-time
    rights apply (plain inclusive <=).
    """
    if (left_seq is None) != (right_seq is None):
        raise ValueError("left_seq and right_seq must be given together")
    # Strictness encoding: the documented contract is that an
    # equal-time right applies only if its sequence is strictly
    # SMALLER than the left's. Bare (__seq, __is_left) ordering would
    # also apply a right whose sequence EQUALS the left's (rights sort
    # first at equal keys), so sequences are doubled with rights
    # offset +1: right sorts before left iff 2r+1 < 2l iff r < l.
    # Without seqs the defaults (r=0 -> 1, l=1 -> 2) keep every right
    # before every equal-time left — the plain inclusive <=. (Doubling
    # assumes |seq| < 2^62 — true for any real event id.)
    r_seq = (2 * F.col(right_seq).cast("long") + 1) if right_seq else F.lit(1)
    l_seq = (2 * F.col(left_seq).cast("long")) if left_seq else F.lit(2)
    lcols = left.columns
    tagged_r, tagged_l = _tag_union(
        left, right,
        left_key=left_key, right_key=right_key,
        left_time=left_time, right_time=right_time,
        payload=payload, tiebreak=tiebreak,
        r_seq=r_seq, l_seq=l_seq,
    )
    # Rights sort before the left row at equal time (__is_left 0 < 1)
    # => inclusive <=; among equal-time rights the max tiebreak sorts
    # last => carried value is the max-tiebreak row. NULL tiebreaks
    # sort FIRST (nulls_first) so they LOSE to any non-null — max()
    # semantics; nulls_last would invert that and let a NULL-tiebreak
    # row beat the real maximum.
    # __seq defaults to 0 for rights / 1 for lefts, reproducing the
    # plain inclusive-<= ordering; with real sequences, a right at the
    # same time applies only when its sequence precedes the left's.
    w = (
        Window.partitionBy("__key")
        .orderBy(
            F.col("__t"),
            F.col("__seq"),
            F.col("__is_left"),
            F.col("__tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged_r.unionByName(tagged_l).withColumn(
        "__carried", F.last("__payload", ignorenulls=True).over(w)
    )
    lefts = carried.filter(F.col("__is_left") == 1)
    if tolerance is None:
        picked = [F.col(f"__carried.{p}") for p in payload]
    else:
        fresh = F.col("__carried.__rt") >= (
            F.col("__t") - F.expr(f"INTERVAL {tolerance}")
        )
        picked = [F.when(fresh, F.col(f"__carried.{p}")) for p in payload]
    return lefts.select(
        *lcols,
        *[c.alias(f"{prefix}{p}") for c, p in zip(picked, payload)],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    tiebreak: str,
    prefix: str = "asof_",
    tolerance: str | None = None,
) -> DataFrame:
    """Forward as-of join (round 10 — closes the direction family:
    backward/tolerance/nearest exist since r5/r8): each left row gets
    the EARLIEST right row with ``right_time >= left_time`` (inclusive,
    pandas ``merge_asof(direction='forward')``'s convention) for its
    key; ties on right_time resolve to the MIN ``tiebreak`` (the
    backward variant's max-tiebreak mirror); NULL when no later right
    exists.

    Plan: the same single-shuffle tag-union as ``asof_join``, carried
    by ONE DESCENDING window — traversing each key's timeline from the
    future backward, the running ``last`` non-null right payload at a
    left row is exactly the earliest right at-or-after it. Identical
    cost profile to the backward variant: one exchange of (|L|+|R|)
    rows on the key + a per-partition sort, no row blowup.

    ``tolerance`` (optional): a SQL interval body bounding how far
    ahead the match may be — kept only when ``right_time <= left_time
    + INTERVAL tolerance``. Applied AFTER the carry, which is exact by
    the mirrored staleness argument: the carried row is the EARLIEST
    later right, every other candidate is later still.
    """
    lcols = left.columns
    tagged_r, tagged_l = _tag_union(
        left, right,
        left_key=left_key, right_key=right_key,
        left_time=left_time, right_time=right_time,
        payload=payload, tiebreak=tiebreak,
        r_seq=F.lit(1), l_seq=F.lit(2),
    )
    # Descending traversal, INCLUSIVE >=: rights sort BEFORE the left
    # at equal time (__is_left asc keeps 0 < 1 even under __t desc), so
    # an equal-time right IS in the left's frame — the inclusive
    # boundary (the nearest variant's w_f flips __is_left desc to get
    # its exclusive > instead). Among equal-time rights desc_nulls_first
    # puts NULL tiebreaks first (they lose to any non-null) and the MIN
    # tiebreak last => carried = min-tiebreak row, the backward mirror.
    w = (
        Window.partitionBy("__key")
        .orderBy(
            F.col("__t").desc(),
            F.col("__is_left").asc(),
            F.col("__tb").desc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = tagged_r.unionByName(tagged_l).withColumn(
        "__carried", F.last("__payload", ignorenulls=True).over(w)
    )
    lefts = carried.filter(F.col("__is_left") == 1)
    # A NULL left_time can never satisfy rt >= t — but the DESCENDING
    # sort puts NULL __t LAST (desc default nulls_last), where the
    # frame spans every right and the carry would leak a spurious
    # "earliest" match (the ascending backward variant gets this guard
    # for free from nulls_first). Same guard as asof_join_nearest.
    matchable = F.col("__t").isNotNull()
    if tolerance is None:
        picked = [
            F.when(matchable, F.col(f"__carried.{p}")) for p in payload
        ]
    else:
        near = F.col("__carried.__rt") <= (
            F.col("__t") + F.expr(f"INTERVAL {tolerance}")
        )
        picked = [
            F.when(matchable & near, F.col(f"__carried.{p}"))
            for p in payload
        ]
    return lefts.select(
        *lcols,
        *[c.alias(f"{prefix}{p}") for c, p in zip(picked, payload)],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    payload: list[str],
    tiebreak: str,
    prefix: str = "asof_",
) -> DataFrame:
    """Nearest-direction as-of join, single shuffle: each left row gets
    the right row minimizing |right_time − left_time| for its key.

    Conventions (stated identically in every oracle of this operator):
    - the backward side is INCLUSIVE (right_time <= left_time), the
      forward side exclusive — an equal-time right is a backward match
      with distance 0;
    - a distance tie between the sides resolves BACKWARD (pandas
      ``merge_asof(direction='nearest')``);
    - within a side, ties on right_time resolve to the MAX ``tiebreak``
      backward and the MIN forward (each side mirrors the other); a
      NULL tiebreak loses to any non-null on both sides.

    Plan: the same tag-union as ``asof_join``, then TWO running-carry
    windows over the one ``__key`` partitioning — ascending for the
    latest prior right, descending for the earliest later right. Both
    windows satisfy their distribution from ONE exchange
    (EnsureRequirements adds only the second sort), so the cost over
    backward as-of is one extra per-partition sort, not a pass over
    the data. Distances are exact integer microseconds (UTC session
    timezone; DATE right_times promote to midnight, the convention the
    backward/tolerance variants already hash-check).

    Returns ``left`` plus ``prefix+p`` for each payload column,
    ``prefix+side`` ('backward' | 'forward' | NULL) and
    ``prefix+dist_us`` (BIGINT microseconds, NULL when unmatched).
    """
    lcols = left.columns
    tagged_r, tagged_l = _tag_union(
        left, right,
        left_key=left_key, right_key=right_key,
        left_time=left_time, right_time=right_time,
        payload=payload, tiebreak=tiebreak,
        r_seq=F.lit(1), l_seq=F.lit(2),
        cast_time=True,
    )
    # Backward: rights sort BEFORE the left at equal time (inclusive
    # <=); among equal-time rights the max tiebreak sorts last and is
    # carried (asc_nulls_first => NULL tiebreaks lose) — exactly
    # asof_join's ordering, minus the seq refinement.
    w_b = (
        Window.partitionBy("__key")
        .orderBy(
            F.col("__t").asc(),
            F.col("__is_left").asc(),
            F.col("__tb").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # Forward (descending traversal): at equal time the LEFT sorts
    # first (is_left desc) so an equal-time right is NOT in its frame —
    # the exclusive > boundary; among equal-time rights desc_nulls_first
    # puts NULLs first and small tiebreaks last => carried = min
    # tiebreak, the backward mirror.
    w_f = (
        Window.partitionBy("__key")
        .orderBy(
            F.col("__t").desc(),
            F.col("__is_left").desc(),
            F.col("__tb").desc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        tagged_r.unionByName(tagged_l)
        .withColumn("__b", F.last("__payload", ignorenulls=True).over(w_b))
        .withColumn("__f", F.last("__payload", ignorenulls=True).over(w_f))
    )
    lefts = carried.filter(F.col("__is_left") == 1)
    t_us = F.unix_micros("__t")
    dist_b = t_us - F.unix_micros(F.col("__b.__rt"))
    dist_f = F.unix_micros(F.col("__f.__rt")) - t_us
    # A NULL left_time has no distance to anything => no nearest match
    # (mirrors backward as-of, where a NULL left time can never satisfy
    # rt <= t). Without this guard the DESCENDING window puts the NULL
    # row's frame over every right (desc nulls-last) and it would leak
    # a spurious earliest-right 'forward' match with a NULL distance.
    matchable = F.col("__t").isNotNull()
    pick_b = matchable & F.col("__b").isNotNull() & (
        F.col("__f").isNull() | (dist_b <= dist_f)
    )
    chosen = F.when(pick_b, F.col("__b")).when(matchable, F.col("__f"))
    side = F.when(pick_b, F.lit("backward")).when(
        matchable & F.col("__f").isNotNull(), F.lit("forward")
    )
    dist = F.when(pick_b, dist_b).when(
        matchable & F.col("__f").isNotNull(), dist_f
    )
    return lefts.select(
        *lcols,
        *[chosen.getField(p).alias(f"{prefix}{p}") for p in payload],
        side.alias(f"{prefix}side"),
        dist.cast("long").alias(f"{prefix}dist_us"),
    )
