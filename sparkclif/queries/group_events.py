"""Event-sequence analytics queries (SURVEY.md §2.2 group E/D
extensions, round 4): conversion funnels and cohort retention — the
MATCH_RECOGNIZE-shaped family every analytics engine ends up needing,
expressed as a single-shuffle JVM array fold (operators/sequence.py)
instead of one self-join per funnel stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkclif.io import table
from sparkclif.registry import register

# 12-hour conversion window, in microseconds.
FUNNEL_WINDOW_US = 12 * 3600 * 1_000_000


@register(
    "e_funnel_steps",
    # Exact restatement as the classic one-join-per-stage SQL: anchor
    # at min(view), first click strictly after the anchor within the
    # window, first purchase strictly after that click within the
    # SAME window-from-anchor. The fold and the min-joins agree
    # because events are folded in timestamp order, so "first
    # qualifying" = "min qualifying". All times exact epoch micros.
    oracle=f"""
    WITH su AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type IN ('view', 'click', 'purchase')
    ),
    v AS (
        SELECT user_id, min(epoch_us(ts)) AS t0
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t1
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t0
          AND epoch_us(e.ts) <= v.t0 + {FUNNEL_WINDOW_US}
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS t2
        FROM events e JOIN c USING (user_id) JOIN v USING (user_id)
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t1
          AND epoch_us(e.ts) <= v.t0 + {FUNNEL_WINDOW_US}
        GROUP BY e.user_id
    )
    SELECT su.user_id,
           CAST(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END
              + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS stage,
           t0 AS t0_us, t1 AS t1_us, t2 AS t2_us
    FROM su
    LEFT JOIN v USING (user_id)
    LEFT JOIN c USING (user_id)
    LEFT JOIN p USING (user_id)
    """,
)
def e_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase conversion funnel, 12 h window from the
    first-view anchor: per user the stage reached and exact reach
    times. One shuffle (groupBy user) + a JVM array fold — no
    per-stage self-joins, no Python (operators/sequence.py)."""
    from sparkclif.operators.sequence import funnel_stages

    ev = table(spark, sf_dir, "events")
    return funnel_stages(
        ev, ["view", "click", "purchase"], window_us=FUNNEL_WINDOW_US
    )


@register(
    "d_agg_retention",
    # Exact restatement: the 3% deterministic event slice (portable
    # md5 bucket — hashing.py contract), Monday-week cohort of each
    # user's first sliced event, integer day-diff div 7 offsets,
    # distinct-(user, cohort, k) collapse before a plain count.
    oracle="""
    WITH s AS (
        SELECT * FROM events
        WHERE ('0x' || substr(md5(event_id::VARCHAR), 25, 8))::UBIGINT
              % 100 < 3
    ),
    f AS (SELECT user_id, min(ts) AS fts FROM s GROUP BY user_id),
    m AS (
        SELECT DISTINCT s.user_id,
               strftime(date_trunc('week', f.fts), '%Y-%m-%d') AS cohort_week,
               date_diff('day', date_trunc('week', f.fts)::DATE,
                         date_trunc('week', s.ts)::DATE) // 7 AS week_k
        FROM s JOIN f USING (user_id)
    )
    SELECT cohort_week, CAST(week_k AS BIGINT) AS week_k,
           count(*)::BIGINT AS n_active
    FROM m WHERE week_k <= 3 GROUP BY cohort_week, week_k
    """,
)
def d_agg_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over a 3% deterministic hash-slice of
    the event stream (the dense synthetic stream puts every user's
    first RAW event in week 0; the slice is the md5-bucket sample, so
    both engines cohort identical rows). first-event min() agg +
    unique-key join back + distinct-collapse before a partial-
    combinable count — no count(distinct) expand."""
    from sparkclif.operators.sampling import portable_bucket
    from sparkclif.operators.sequence import cohort_retention

    ev = table(spark, sf_dir, "events")
    sparse = ev.where(portable_bucket(F.col("event_id")) < 3)
    return cohort_retention(sparse, max_weeks=3)


@register(
    "e_session_transitions",
    # Exact restatement: gaps-and-islands sessionization (identical
    # semantics to group_h's SESSION_ORACLE: new session at gap >= 30
    # min, (ts, event_id) ordering), lag within session, type-pair
    # counts.
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, event_id, event_type,
               sum(new_session) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    ),
    paired AS (
        SELECT lag(event_type) OVER (PARTITION BY user_id, session_id
                                     ORDER BY ts, event_id) AS from_type,
               event_type AS to_type
        FROM numbered
    )
    SELECT from_type, to_type, count(*)::BIGINT AS n
    FROM paired WHERE from_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
)
def e_session_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session event-type transition counts (first-order Markov
    model of user behavior): gaps-and-islands sessionization and the
    predecessor lag share ONE user-partitioned shuffle; the count agg
    is map-side combined over a type² key space."""
    from sparkclif.operators.sequence import session_transitions

    ev = table(spark, sf_dir, "events")
    return session_transitions(ev, gap_minutes=30)


@register(
    "e_win_ewma",
    # Exact restatement: DuckDB's list_reduce folds the SAME
    # time-ordered sequence with the SAME IEEE doubles (alpha = 0.5:
    # every coefficient an exact power of two); seeded with the first
    # observation on both sides.
    oracle="""
    SELECT user_id, count(*)::BIGINT AS n_events,
           round(list_reduce(list(value::DOUBLE ORDER BY ts, event_id),
                             (acc, x) -> 0.5::DOUBLE * x + 0.5::DOUBLE * acc),
                 4) AS ewma
    FROM events GROUP BY user_id
    """,
)
def e_win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA (alpha 0.5) of the value stream — the online
    smoothing recurrence as a single-shuffle codegen fold (no window
    recursion, no Python; operators/timeseries.py ewma_last)."""
    from sparkclif.operators.timeseries import ewma_last

    ev = table(spark, sf_dir, "events")
    return ewma_last(ev, alpha=0.5)
