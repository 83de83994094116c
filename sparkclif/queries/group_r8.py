"""Round-8 surface additions (SURVEY.md §2.2 growth set): bounded-
staleness temporal alignment, continuous ingest into a co-located
layout, and partitioned distinct-sketch union — the three shapes
VERDICT r7 item 8 named.

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
- ``d_agg_theta_union`` — KMV / Theta-style bottom-k distinct sketch
  per group, built per key-disjoint shard and UNION-merged (the
  sketch algebra a cluster uses to count distincts without a global
  dedup shuffle); portable md5 basis makes sketch STATE, kth order
  statistic, and the integer KMV estimate all hash-checkable — the
  operators/sketch.py discipline.

Reference ties: the as-of family is the longitudinal alignment
pattern of the reference consortium's data format (SURVEY.md §2.2
c_join_asof); the merge is the reference's state-store upsert
(state.py:70-90, R13-R15) at continuous-ingest scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkclif.io import table
from sparkclif.operators.asof import asof_join
from sparkclif.operators.hashing import md5_bits
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
    O(state) relation, asserted in tests/test_r8_queries.py — which is
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


KMV_K = 64
# hash space: 14 hex chars = 16^14 = 2^56: (k-1)*H = 63*2^56 ~ 4.5e18
# stays under 2^63 (15 chars would overflow the estimator multiply)
KMV_H = 16**14


def theta_union_plan(
    li: DataFrame, k: int = KMV_K, n_shards: int = 8, force: str | None = None
) -> DataFrame:
    """KMV / Theta-style bottom-k distinct sketch per group, built as
    a two-level SHARD -> UNION rollup (the partitioned-build + merge
    algebra of Theta sketches, stated exactly):

    1. items hash to 56-bit md5 values; the hash's residue class
       (``h % n_shards``) assigns each DISTINCT item to exactly one
       shard — key-disjoint by construction (the union never sees a
       cross-shard dup) and ONE md5 per row. ``n_shards`` is THE scale knob: the
       per-shard bottom-k window sorts one shard's distinct hashes,
       so shard count must grow with the data (on a cluster, ~the
       partition count; the registered query pins 8 for the fixed
       oracle — an 8x-keys probe shows the fixed-shard sort growing
       linearly, and the same probe at n_shards=64 staying flat,
       SCALE.md round-8);
    2. per (group, shard): the k smallest distinct hashes. Agg state
       is BOUNDED at k: a row_number window over the deduped
       (g, shard, h) relation keeps only rank <= k BEFORE any
       collect, so no buffer ever holds a shard's full distinct set
       (Spark 4 pushes the rank filter map-side as WindowGroupLimit,
       so even the shuffle carries <= k rows per (g, shard) per task);
    3. per group: merge = k smallest of the concatenated shard
       sketches (k-min of union == k-min over union of per-part
       k-mins — the Theta union identity).

    Cost dispatch (force=None): below rank.SMALL_INPUT_BYTES the
    shard/merge scaffolding costs more stages than it bounds, so the
    small path FUSES the whole build into one aggregation —
    ``k-min(array_sort(collect_set(h)))`` with ``n_shards`` restated
    as ``size(collect_set(shard))`` — result-identical BY the same
    union identity (the shards partition the distinct hash set, so
    the k smallest distinct hashes survive any shard split). One
    exchange instead of three; the collect_set buffer holds a group's
    full distinct set, which is exactly what the bound certifies is
    affordable. Above the bound (and under
    ``spark.sparkclif.forceDistributed``) the sharded window build is
    the default — no buffer beyond k. ``force=`` ("merge" | "fused")
    pins a path for tests.

    Estimate: (k-1)·H div kth_hash (the classic KMV estimator in
    exact integer arithmetic — 63·2^60 < 2^63, no overflow); groups
    with fewer than k distinct items report their EXACT count (the
    sketch is lossless below k). The full merged state is fingerprinted
    (md5 over the comma-joined hash list) so the driver hash-checks
    the SKETCH, not just the estimate — the d_agg_hll_registers
    discipline."""
    from sparkclif.operators.rank import (
        SMALL_INPUT_BYTES,
        plan_size_bytes,
        validate_force,
    )

    validate_force(force, {"merge", "fused"})
    hkey = F.concat(F.lit("kmv|"), F.col("l_partkey").cast("string"))
    # shard derives FROM the hash (low bits, uniform and independent
    # of the bottom-k ORDER which is decided by the full value):
    # exactly ONE md5 per row — the hash is the scan's dominant cost
    # NULL item keys hash to NULL and contribute NOTHING to a distinct
    # sketch (the DataSketches convention) — filtered ONCE here so the
    # two dispatch paths cannot diverge on them (collect_set silently
    # drops NULLs, the sharded build would keep a NULL-shard group — the
    # ADVICE-r7 d_agg_distinct class of path divergence). A group whose
    # every key is NULL vanishes rather than reporting 0, consistently
    # on both paths (tests/test_r8_queries.py pins this).
    proj = li.select(
        F.col("l_returnflag").alias("g"),
        md5_bits(hkey, 1, 14).alias("h"),
    ).where(F.col("h").isNotNull())
    if force is None:
        force = "fused" if plan_size_bytes(proj) <= SMALL_INPUT_BYTES else "merge"
    hdf = proj.withColumn("shard", F.pmod("h", F.lit(n_shards)))
    if force == "fused":
        m = hdf.groupBy("g").agg(
            F.size(F.collect_set("shard")).cast("long").alias("n_shards"),
            F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("merged"),
        )
    else:
        dedup = hdf.groupBy("g", "shard", "h").agg(F.lit(1).alias("__one"))
        w = Window.partitionBy("g", "shard").orderBy("h")
        topk = dedup.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") <= k
        )
        sk = topk.groupBy("g", "shard").agg(
            F.sort_array(F.collect_list("h")).alias("s")
        )
        m = sk.groupBy("g").agg(
            F.count("*").cast("long").alias("n_shards"),
            F.slice(F.sort_array(F.flatten(F.collect_list("s"))), 1, k).alias(
                "merged"
            ),
        )
    return m.select(
        F.col("g").alias("l_returnflag"),
        "n_shards",
        F.size("merged").cast("long").alias("n_state"),
        F.when(F.size("merged") >= k, F.element_at("merged", k)).alias(
            "kth_hash"
        ),
        F.expr(
            f"CASE WHEN size(merged) >= {k} THEN "
            f"({k - 1}L * {KMV_H}L) div element_at(merged, {k}) "
            f"ELSE size(merged) END"
        )
        .cast("long")
        .alias("est_distinct"),
        F.md5(
            F.array_join(F.transform("merged", lambda x: x.cast("string")), ",")
        ).alias("state_md5"),
    )


@register(
    "d_agg_theta_union",
    # Exact restatement: same md5 hash/shard split; the oracle states
    # the per-shard k-min as list_slice over the sorted distinct list
    # (result-identical to the engine's bounded row_number build) and
    # the union as k-min of the flattened shard lists.
    oracle=f"""
    WITH h0 AS (
        SELECT l_returnflag AS g,
               CAST(('0x' || substr(md5('kmv|' || CAST(l_partkey AS VARCHAR)),
                                    1, 14))::UBIGINT AS BIGINT) AS h
        FROM lineitem
    ),
    h AS (SELECT g, h, h % 8 AS shard FROM h0),
    sk AS (
        SELECT g, shard,
               list_slice(list_sort(list_distinct(list(h))), 1, {KMV_K}) AS s
        FROM h GROUP BY g, shard
    ),
    m AS (
        SELECT g, count(*) AS n_shards,
               list_slice(list_sort(flatten(list(s))), 1, {KMV_K}) AS merged
        FROM sk GROUP BY g
    )
    SELECT g AS l_returnflag,
           CAST(n_shards AS BIGINT) AS n_shards,
           CAST(len(merged) AS BIGINT) AS n_state,
           CASE WHEN len(merged) >= {KMV_K} THEN merged[{KMV_K}] END
               AS kth_hash,
           CAST(CASE WHEN len(merged) >= {KMV_K}
                     THEN ({KMV_K - 1} * {KMV_H}) // merged[{KMV_K}]
                     ELSE len(merged) END AS BIGINT) AS est_distinct,
           md5(array_to_string(merged, ',')) AS state_md5
    FROM m
    """,
)
def d_agg_theta_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch-style distinct-union over partitions (VERDICT r7
    item 8's third candidate): bottom-k (KMV) distinct sketches built
    per key-disjoint shard, then UNION-merged per group — the sketch
    algebra a 1000-executor cluster uses to count distincts without a
    global dedup shuffle of the item stream. The whole pipeline is
    exact given the portable md5 basis, so the driver hash-checks the
    merged sketch STATE (md5 fingerprint), the kth order statistic,
    AND the integer-arithmetic KMV estimate — the only engine-seeded
    thing in a real deployment (the hash family) is pinned, exactly
    like the CMS/HLL/bloom family (operators/sketch.py). Build-side
    memory is bounded at k per (group, shard) via a pre-collect
    row_number window; the merge input is <= shards x k rows per
    group."""
    return theta_union_plan(table(spark, sf_dir, "lineitem"))
