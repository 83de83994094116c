"""Group E — window functions (SURVEY.md §2.2 group E).

Reference ties: R7/R8 (nth-non-blank-line extraction = row_number),
R16 (last-wins POC upsert = row_number desc), R22 (per-column layout).

Scale notes: every window partitions on a real key (custkey/user_id)
=> one hash shuffle then per-partition sort; no global sort, no
unbounded partition (the largest partition is one customer/user's
history). Deterministic tiebreakers everywhere (oracle discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkclif.io import table
from sparkclif.registry import register


@register(
    "e_win_rank",
    oracle="""
    SELECT o_orderkey, o_custkey,
           row_number() OVER w AS rn,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER w AS tile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def e_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank/ntile per customer by totalprice
    (reference R7/R8 nth-match extraction, relationally)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("tile"),
    )


@register(
    "e_win_analytic",
    oracle="""
    SELECT event_id, user_id,
           round(lag(value)  OVER w, 4) AS prev_value,
           round(lead(value) OVER w, 4) AS next_value,
           first_value(event_id) OVER w AS first_event,
           last_value(event_id)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
               AS last_event
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def e_win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value/last_value over per-user event time — the
    longitudinal-delta pattern."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.lag("value").over(w), 4).alias("prev_value"),
        F.round(F.lead("value").over(w), 4).alias("next_value"),
        F.first("event_id").over(w).alias("first_event"),
        F.last("event_id").over(wfull).alias("last_event"),
    )


@register(
    "e_win_frame_rows",
    oracle="""
    SELECT event_id, user_id,
           round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
               AS moving_avg,
           round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
               AS moving_sum
    FROM events
    """,
)
def e_win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moving aggregate over a ROWS frame (trailing 3)."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 4).alias("moving_avg"),
        F.round(F.sum("value").over(w), 4).alias("moving_sum"),
    )


@register(
    "e_win_frame_range",
    oracle="""
    SELECT o_orderkey, o_custkey,
           count(*) OVER w AS n_in_band,
           round(sum(o_totalprice) OVER w, 4) AS band_sum
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice
                 RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
    """,
)
def e_win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame on a numeric ordering (value-band aggregate; peers
    included => deterministic without a tiebreak)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.count("*").over(w).alias("n_in_band"),
        F.round(F.sum("o_totalprice").over(w), 4).alias("band_sum"),
    )


@register(
    "e_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS totalprice, rn
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def e_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — window + filter. Catalyst/AQE pushes
    the rank filter into the sort (no full materialization per group);
    the reference analog is dashboard truncation (R22/R33)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey",
            "o_orderkey",
            F.round("o_totalprice", 4).alias("totalprice"),
            "rn",
        )
    )


@register(
    "e_win_distribution",
    # percent_rank/cume_dist are exact ratios of window-frame integers;
    # round(4) guards the double formatting, not the arithmetic.
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(percent_rank() OVER w, 4) AS pct_rank,
           round(cume_dist()    OVER w, 4) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
    """,
)
def e_win_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions (percent_rank, cume_dist) per
    customer — the remaining rank-family members beyond e_win_rank's
    row_number/rank/dense_rank/ntile. Same single (custkey) hash
    shuffle + per-partition sort shape."""
    orders = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice"), F.col("o_orderkey"))
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )


@register(
    "e_win_gapfill",
    # Exact restatement: per-user hourly grid over [first, last] hour,
    # bucket counts (0 in gaps), last-in-bucket value by (ts, event_id)
    # forward-filled with last_value IGNORE NULLS.
    oracle="""
    WITH b AS (
        SELECT user_id, date_trunc('hour', min(ts)) AS h0,
               date_trunc('hour', max(ts)) AS h1
        FROM events GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        FROM b
    ),
    lastrow AS (
        SELECT user_id, date_trunc('hour', ts) AS h, round(value, 4) AS lastv
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
                                   ORDER BY ts DESC, event_id DESC) = 1
    ),
    hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS h, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT g.user_id, epoch_us(g.h) AS hour_us,
           CAST(coalesce(n, 0) AS BIGINT) AS n_events,
           last_value(lastv IGNORE NULLS) OVER (
               PARTITION BY g.user_id ORDER BY g.h
               ROWS UNBOUNDED PRECEDING) AS filled_value
    FROM grid g
    LEFT JOIN hourly USING (user_id, h)
    LEFT JOIN lastrow USING (user_id, h)
    """,
)
def e_win_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap-fill (the hypertable rollup): one
    row per (user, hour) over each user's active span, empty buckets
    materialized with n_events = 0 and the last observed value
    forward-filled (last-in-bucket ties broken by (ts, event_id)).
    Grid explode is per-key span — never a global calendar cross
    join (operators/timeseries.py)."""
    from sparkclif.operators.timeseries import resample_gapfill

    ev = table(spark, sf_dir, "events")
    return resample_gapfill(ev)
