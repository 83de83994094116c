"""Round-8 surface additions (SURVEY.md §2.2 growth set): bounded-
staleness temporal alignment and continuous ingest into a co-located
layout — the two shapes VERDICT r7 item 8 named.

- ``c_join_asof_tolerance`` — backward as-of join WITH a max-staleness
  bound (pandas ``merge_asof(tolerance=)``; the ICU-alignment guard:
  a reading matches the latest prior order only if that order is
  fresh enough). Same single-shuffle union-sort operator as
  ``c_join_asof`` (operators/asof.py) — the tolerance is a post-carry
  null-out, exact because any non-latest candidate is staler still.
- ``h_stream_merge_bucketed`` — REAL Structured Streaming foreachBatch
  running an ACCUMULATING MERGE (n := s.n + d.n, newer payload wins)
  into a state table stored CLUSTERED BY the merge key
  (streaming/merge.py): per-batch shuffle bytes are O(delta), never
  O(state) — the 100 TB continuous-ingest contract, composing
  ``h_stream_upsert``'s versioned-swap merge with
  ``c_join_bucketed``'s layout.

Reference ties: the as-of family is the longitudinal alignment
pattern of the reference consortium's data format (SURVEY.md §2.2
c_join_asof); the merge is the reference's state-store upsert
(state.py:70-90, R13-R15) at continuous-ingest scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkclif.io import table
from sparkclif.operators.asof import asof_join
from sparkclif.registry import register
from sparkclif.session import tmp_dir


@register(
    "c_join_asof_tolerance",
    # Same ranked-CTE restatement as c_join_asof, with the staleness
    # bound applied to the rn=1 match: a too-stale latest match means
    # NO within-tolerance match exists (every other candidate is
    # older), so CASE-ing the winner is exact. Inclusive boundary
    # (>=) stated identically on both sides; date <= timestamp
    # comparisons promote the date to midnight in both engines (the
    # convention c_join_asof already hash-passes on).
    oracle="""
    WITH ranked AS (
        SELECT e.event_id, o.o_orderkey, o.o_totalprice, o.o_orderdate,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
               ) AS rn
        FROM events e
        JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT e.event_id, e.user_id,
           CASE WHEN m.o_orderdate >= e.ts - INTERVAL 30 DAY
                THEN m.o_orderkey END AS asof_o_orderkey,
           CASE WHEN m.o_orderdate >= e.ts - INTERVAL 30 DAY
                THEN round(m.o_totalprice, 4) END AS asof_price,
           CASE WHEN m.o_orderdate >= e.ts - INTERVAL 30 DAY
                THEN date_diff('day', m.o_orderdate, CAST(e.ts AS DATE))
                END AS asof_age_days
    FROM events e
    LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) m USING (event_id)
    """,
)
def c_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join with a 30-day staleness bound: each event
    matched to its user's latest prior order ONLY if that order is at
    most 30 days old at event time; otherwise NULL (a staler fallback
    would be wrong — the bound is a freshness contract, not a
    preference). ONE shuffle of |events|+|orders| rows on the user
    key (operators/asof.py union-sort; the tolerance adds zero plan
    nodes beyond a null-out projection), vs the oracle's
    join-all-priors + rank which materializes |matches-per-key| rows
    first — the asymptotic gap that makes the operator, not the SQL,
    the 100 TB plan. ``asof_age_days`` reports the match's staleness
    in days (NULL when unmatched)."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = table(spark, sf_dir, "orders")
    joined = asof_join(
        ev,
        o,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload=["o_orderkey", "o_totalprice", "o_orderdate"],
        tiebreak="o_orderkey",
        tolerance="30 DAYS",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_o_orderkey"),
        F.round("asof_o_totalprice", 4).alias("asof_price"),
        F.datediff(F.to_date("ts"), F.col("asof_o_orderdate"))
        .cast("long")
        .alias("asof_age_days"),
    )


@register(
    "h_stream_merge_bucketed",
    cache_plan=False,
    # The final state is SQL-checkable because the merge ACCUMULATES
    # exact relational aggregates: n_events is a plain per-user count
    # and the payload is last-wins by (ts, event_id) — both stated
    # directly over the full input. oracle_in_bench=False: the engine
    # runs a genuine multi-micro-batch stream with a per-batch
    # bucketed table swap; the oracle's one-shot aggregation is not a
    # comparable plan shape for baseline timing.
    oracle_in_bench=False,
    oracle="""
    WITH c AS (
        SELECT user_id, count(*) AS n_events
        FROM events GROUP BY user_id
    ),
    l AS (
        SELECT user_id, event_id AS last_event_id,
               round(value, 4) AS last_value
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) = 1
    )
    SELECT user_id, n_events, last_event_id, last_value
    FROM c JOIN l USING (user_id)
    """,
)
def h_stream_merge_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming: events split into 3 time-ordered
    files -> file source, one file per micro-batch -> foreachBatch
    accumulating MERGE into a bucketed state table
    (streaming/merge.py). Returns the final state (per-user event
    count + last-wins payload). The state side of every per-batch
    merge join is read bucket-co-located — no exchange on the
    O(state) relation, asserted in tests/test_streaming.py — which is
    the property that separates continuous ingest from re-shuffling
    the world each batch."""
    from sparkclif.streaming.merge import stream_merge_bucketed
    from sparkclif.streaming.source import write_time_chunks

    src = tmp_dir() + "/stream_merge_src"
    ev = table(spark, sf_dir, "events")
    write_time_chunks(ev, src, n_chunks=3, key=f"{sf_dir}/events")
    state = stream_merge_bucketed(spark, src, ev.schema)
    out = spark.createDataFrame(
        state,
        "user_id long, n_events long, ts timestamp, last_event_id long, "
        "last_value double",
    )
    return out.select(
        "user_id",
        "n_events",
        "last_event_id",
        F.round("last_value", 4).alias("last_value"),
    )
