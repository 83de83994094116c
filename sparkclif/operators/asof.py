"""As-of join — each left row matched to the latest right row with
right_time <= left_time for the same key (SURVEY.md §2.2 c_join_asof;
the longitudinal-ICU alignment pattern the reference consortium's data
format exists for).

Spark has no native ASOF JOIN. Two implementations:

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

3. A per-group ``merge_asof`` pandas kernel would be the fallback for
   semantics Spark expressions can't carry (e.g. nearest-direction);
   not needed for backward as-of, so not implemented here.

Determinism: ties on right_time break by descending ``tiebreak``
(largest wins), matching the oracle's
``row_number() OVER (... ORDER BY time DESC, tiebreak DESC) = 1``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
    lcols = left.columns
    # A NULL right_time can never satisfy right_time <= left_time, but
    # asc ordering puts NULLs FIRST, where the carry window would hand
    # the row to every left as a bogus "earliest" match — exclude it.
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
    # the right time rides inside the carried struct so the tolerance
    # check can compare it against the LEFT row's own __t downstream
    tagged_r = right.filter(F.col(right_time).isNotNull()).select(
        F.col(right_key).alias("__key"),
        F.col(right_time).alias("__t"),
        r_seq.cast("long").alias("__seq"),
        F.lit(0).alias("__is_left"),
        F.col(tiebreak).alias("__tb"),
        F.struct(
            F.col(right_time).alias("__rt"), *[F.col(p) for p in payload]
        ).alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    tagged_l = left.select(
        F.col(left_key).alias("__key"),
        F.col(left_time).alias("__t"),
        l_seq.cast("long").alias("__seq"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(right.schema[tiebreak].dataType).alias("__tb"),
        F.lit(None)
        .cast(tagged_r.schema["__payload"].dataType)
        .alias("__payload"),
        *[F.col(c) for c in lcols],
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
