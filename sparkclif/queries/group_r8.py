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

Late-r8 additions (first driver rows land in the r9 window — see
queries/__init__ for the rotation argument):

- ``c_join_asof_nearest`` — nearest-direction as-of (two window
  carries over ONE key shuffle; operators/asof.py), completing the
  as-of family and deleting the r5 "needs a pandas kernel" claim.
- ``i_dedup_url`` — URL-canonicalization dedup (scan-side
  ``canonical_url`` + the dedup_exact window shape;
  operators/dedup.py) — the crawl-side dedup modality.
- ``e_win_cusum`` — Page's two-sided CUSUM drift detector, exact
  integer basis (funnel fold; operators/timeseries.py) — the
  sequential complement to e_win_zscore's point detector.

Reference ties: the as-of family is the longitudinal alignment
pattern of the reference consortium's data format (SURVEY.md §2.2
c_join_asof); the merge is the reference's state-store upsert
(state.py:70-90, R13-R15) at continuous-ingest scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkclif.io import table
from sparkclif.operators.asof import asof_join, asof_join_nearest
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


@register(
    "c_join_asof_nearest",
    # Exact restatement of the nearest conventions: candidates ranked
    # by (abs microsecond distance, backward-first, max-orderkey
    # backward / min-orderkey forward); backward is inclusive
    # (orderdate-midnight <= ts, the same DATE->TIMESTAMP promotion
    # the backward/tolerance variants hash-check). LEFT join restores
    # events whose user has no orders at all.
    oracle="""
    WITH cand AS (
        SELECT e.event_id, o.o_orderkey, o.o_totalprice,
               abs(epoch_us(CAST(o.o_orderdate AS TIMESTAMP))
                   - epoch_us(e.ts)) AS dist,
               CASE WHEN CAST(o.o_orderdate AS TIMESTAMP) <= e.ts
                    THEN 0 ELSE 1 END AS is_fwd
        FROM events e
        JOIN orders o ON o.o_custkey = e.user_id
        WHERE e.ts IS NOT NULL
    ),
    m AS (
        SELECT event_id, o_orderkey, o_totalprice, dist, is_fwd
        FROM cand
        QUALIFY row_number() OVER (
            PARTITION BY event_id
            ORDER BY dist, is_fwd,
                     CASE WHEN is_fwd = 1 THEN o_orderkey
                          ELSE -o_orderkey END) = 1
    )
    SELECT e.event_id, e.user_id,
           m.o_orderkey AS near_o_orderkey,
           round(m.o_totalprice, 4) AS near_price,
           CASE WHEN m.o_orderkey IS NULL THEN NULL
                WHEN m.is_fwd = 1 THEN 'forward'
                ELSE 'backward' END AS near_side,
           CAST(m.dist AS BIGINT) AS near_dist_us
    FROM events e LEFT JOIN m USING (event_id)
    """,
)
def c_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of: each event matched to its user's order
    CLOSEST in time, either side (ties -> backward; exact integer
    microsecond distances; see operators/asof.py asof_join_nearest for
    the full tie conventions). Completes the as-of family
    (backward / backward+tolerance / nearest) and deletes the r5
    docstring's 'nearest needs a pandas kernel' claim: ONE shuffle of
    |events|+|orders| rows on the user key with TWO in-partition
    window carries (ascending + descending share the exchange), vs the
    oracle's join-all-candidates + rank which materializes every
    (event, same-user order) pair first — the same asymptotic gap as
    the backward variant, with both directions for free."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = table(spark, sf_dir, "orders")
    joined = asof_join_nearest(
        ev,
        o,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
        prefix="near_",
    )
    return joined.select(
        "event_id",
        "user_id",
        "near_o_orderkey",
        F.round("near_o_totalprice", 4).alias("near_price"),
        "near_side",
        "near_dist_us",
    )


@register(
    "i_dedup_url",
    # The oracle synthesizes the IDENTICAL five messy variants, then
    # states the same canonicalization rules with regexp/list
    # functions (scheme fold, www/default-port strip, fragment drop,
    # utm_*/ref= filter + param sort, trailing-slash trim) and the
    # same keep-lowest-id window.
    oracle=r"""
    WITH u AS (
        SELECT doc_id,
               CASE (doc_id // 100) % 5
                 WHEN 0 THEN 'https://' || source || '.example.com/docs/'
                      || CAST(doc_id % 100 AS VARCHAR) || '?lang=' || lang || '&v=2'
                 WHEN 1 THEN 'HTTPS://' || upper(source) || '.EXAMPLE.COM/docs/'
                      || CAST(doc_id % 100 AS VARCHAR) || '/?v=2&lang=' || lang
                 WHEN 2 THEN 'https://www.' || source || '.example.com/docs/'
                      || CAST(doc_id % 100 AS VARCHAR) || '?lang=' || lang
                      || '&utm_source=feed&v=2'
                 WHEN 3 THEN 'https://' || source || '.example.com:443/docs/'
                      || CAST(doc_id % 100 AS VARCHAR) || '?lang=' || lang
                      || '&v=2#sec1'
                 ELSE 'http://' || source || '.example.com/docs/'
                      || CAST(doc_id % 100 AS VARCHAR) || '?lang=' || lang
                      || '&v=2&ref=mirror'
               END AS url
        FROM documents
    ),
    parts AS (
        SELECT doc_id, url,
               lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme_raw,
               regexp_extract(regexp_replace(url, '^[A-Za-z]+://', ''),
                              '^([^/?#]*)', 1) AS auth,
               regexp_replace(
                   regexp_extract(regexp_replace(url, '^[A-Za-z]+://', ''),
                                  '^[^/?#]*([^?#]*)', 1), '/+$', '') AS path,
               regexp_extract(url, '\?([^#]*)', 1) AS q
        FROM u
    ),
    canon AS (
        SELECT doc_id, url,
               (CASE WHEN scheme_raw = 'http' THEN 'https' ELSE scheme_raw END)
               || '://'
               || regexp_replace(regexp_replace(lower(auth), ':[0-9]+$', ''),
                                 '^www\.', '')
               || (CASE WHEN regexp_extract(auth, ':([0-9]+)$', 1) <> ''
                         AND NOT ((scheme_raw = 'https'
                                   AND regexp_extract(auth, ':([0-9]+)$', 1) = '443')
                              OR (scheme_raw = 'http'
                                   AND regexp_extract(auth, ':([0-9]+)$', 1) = '80'))
                        THEN ':' || regexp_extract(auth, ':([0-9]+)$', 1)
                        ELSE '' END)
               || path
               || (CASE WHEN array_to_string(list_sort(list_filter(
                            string_split(q, '&'),
                            p -> p <> '' AND NOT starts_with(p, 'utm_')
                                 AND NOT starts_with(p, 'ref='))), '&') <> ''
                        THEN '?' || array_to_string(list_sort(list_filter(
                            string_split(q, '&'),
                            p -> p <> '' AND NOT starts_with(p, 'utm_')
                                 AND NOT starts_with(p, 'ref='))), '&')
                        ELSE '' END) AS canon_url
        FROM parts
    )
    SELECT doc_id, url, canon_url,
           CAST(count(*) OVER (PARTITION BY canon_url) AS BIGINT) AS group_size,
           CAST(min(doc_id) OVER (PARTITION BY canon_url) AS BIGINT) AS keeper_id,
           CAST(CASE WHEN doc_id = min(doc_id) OVER (PARTITION BY canon_url)
                     THEN 1 ELSE 0 END AS BIGINT) AS kept
    FROM canon
    """,
)
def i_dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the web-corpus dedup modality the
    group-I family was missing (exact/minhash/simhash/semantic dedup
    compare CONTENT; a crawl dedups by URL first, and raw URLs of one
    resource differ in scheme case, www, default ports, tracking
    params, param order, fragments, trailing slashes). Five messy
    variants are synthesized per doc from its fields (the g_url_funcs
    convention — documents carry no URL column), such that all five
    canonicalize to ``https://{source}.example.com/docs/{doc_id%100}
    ?lang={lang}&v=2`` — so docs agreeing on (source, doc_id%100,
    lang) are URL-dups across DIFFERENT raw strings, exercising every
    rule. Canonicalization is pure scan-side expression
    (operators/dedup.py canonical_url); the dedup is the dedup_exact
    window shape, ONE shuffle carrying (canon, id, url)."""
    docs = table(spark, sf_dir, "documents")
    from sparkclif.operators.dedup import dedup_url

    base = F.col("doc_id") % 100
    mk = [
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
            base.cast("string"), F.lit("?lang="), F.col("lang"), F.lit("&v=2"),
        ),
        F.concat(
            F.lit("HTTPS://"), F.upper("source"), F.lit(".EXAMPLE.COM/docs/"),
            base.cast("string"), F.lit("/?v=2&lang="), F.col("lang"),
        ),
        F.concat(
            F.lit("https://www."), F.col("source"), F.lit(".example.com/docs/"),
            base.cast("string"), F.lit("?lang="), F.col("lang"),
            F.lit("&utm_source=feed&v=2"),
        ),
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com:443/docs/"),
            base.cast("string"), F.lit("?lang="), F.col("lang"),
            F.lit("&v=2#sec1"),
        ),
        F.concat(
            F.lit("http://"), F.col("source"), F.lit(".example.com/docs/"),
            base.cast("string"), F.lit("?lang="), F.col("lang"),
            F.lit("&v=2&ref=mirror"),
        ),
    ]
    # the variant derives from doc_id DIV 100, the collision key from
    # doc_id MOD 100 — orthogonal by construction, so one canonical
    # group spans DIFFERENT raw variants (doc 20 is plain, 120 is
    # upper-cased+trailing-slash, 220 is www+utm, ...) and the dedup
    # actually crosses every canonicalization rule (doc_id % 5 would
    # correlate with the mod-100 key and never mix variants)
    m = F.expr("doc_id div 100") % 5
    url = F.when(m == 0, mk[0]).when(m == 1, mk[1]).when(m == 2, mk[2]).when(
        m == 3, mk[3]
    ).otherwise(mk[4])
    u = docs.select("doc_id", url.alias("url"))
    return dedup_url(u).select(
        "doc_id", "url", "canon_url", "group_size", "keeper_id", "kept"
    )


@register(
    "e_win_cusum",
    # Exact restatement: DuckDB list_reduce folds the SAME
    # (ts, event_id)-ordered integer sequence with the SAME clamped
    # recurrence. The accumulator is ONE bit-packed BIGINT
    # (sp·2^48 + sn·2^33 + mx·2^12 + al; field widths sp:15, sn:15,
    # mx:21, al:12) rather than a struct: DuckDB v1.0.0 evaluates
    # struct-lambda fields SEQUENTIALLY, so a later field reading
    # acc.x sees the ALREADY-UPDATED x (repro in
    # tests/test_r8_queries.py::test_duckdb_struct_lambda_quirk), and
    # the sp<->sn alarm coupling cannot be field-ordered around that;
    # a single-scalar fold is evaluation-order-proof. Pack bounds,
    # stated precisely (tests pin a value-2000 spike parity-green):
    # stored sp, sn <= threshold = 20000 < 2^15 (an over-threshold
    # statistic always resets before storing); the only transient ever
    # STORED is mx = max sp1 <= threshold + q_max - 6000, within 2^21
    # for q_max <= 2,083,151, i.e. value <= ~20,831 (input max here is
    # 560.21; the engine-side fold is exact regardless — exceeding the
    # bound breaks only the oracle and surfaces as a parity mismatch,
    # never silent engine corruption); alarms <= n_events < 2^12 at
    # every tested sf. list_reduce has no init, so 0 is prepended; elements are
    # the raw q values (same BIGINT type as the state — the fold's
    # (acc, e) are asymmetric by position, not type). Constants:
    # target 5000, slack 1000 (=> +q-6000 / +4000-q), threshold
    # 20000, centi-unit quantization floor(v*100 + 0.5).
    oracle="""
    WITH folded AS (
        SELECT user_id, count(*)::BIGINT AS n_events,
               list_reduce(
                   list_prepend(0::BIGINT,
                       list(CAST(floor(value * 100 + 0.5) AS BIGINT)
                            ORDER BY ts, event_id)),
                   (acc, e) ->
                     (CASE WHEN greatest(0::BIGINT, (acc // 281474976710656) + e - 6000) > 20000
                             OR greatest(0::BIGINT, ((acc // 8589934592) % 32768) + 4000 - e) > 20000
                           THEN 0::BIGINT
                           ELSE greatest(0::BIGINT, (acc // 281474976710656) + e - 6000)
                      END) * 281474976710656
                   + (CASE WHEN greatest(0::BIGINT, (acc // 281474976710656) + e - 6000) > 20000
                             OR greatest(0::BIGINT, ((acc // 8589934592) % 32768) + 4000 - e) > 20000
                           THEN 0::BIGINT
                           ELSE greatest(0::BIGINT, ((acc // 8589934592) % 32768) + 4000 - e)
                      END) * 8589934592
                   + greatest((acc // 4096) % 2097152,
                              greatest(0::BIGINT, (acc // 281474976710656) + e - 6000)) * 4096
                   + (acc % 4096)
                   + (CASE WHEN greatest(0::BIGINT, (acc // 281474976710656) + e - 6000) > 20000
                             OR greatest(0::BIGINT, ((acc // 8589934592) % 32768) + 4000 - e) > 20000
                           THEN 1::BIGINT ELSE 0::BIGINT END)
               ) AS f,
               max(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS q_max
        FROM events
        WHERE value IS NOT NULL AND ts IS NOT NULL
        GROUP BY user_id
    )
    SELECT user_id, n_events,
           f // 281474976710656 AS cusum_pos,
           (f // 8589934592) % 32768 AS cusum_neg,
           (f // 4096) % 2097152 AS max_pos,
           f % 4096 AS n_alarms
    FROM folded
    -- ADVICE r8: the bit-pack bounds (al:12 bits, mx:21 bits) would
    -- silently corrupt adjacent fields past them; fail LOUDLY instead
    -- of as an opaque parity diff (the engine-side fold is exact
    -- regardless -- only this oracle packs).
    WHERE CASE WHEN n_events >= 4096 OR q_max > 2083151
               THEN error('e_win_cusum oracle: bit-pack bounds exceeded '
                          || '(n_events >= 4096 or quantized value > 2083151); '
                          || 'the packed-BIGINT fold is only valid under them')
               ELSE TRUE END
    """,
)
def e_win_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM change-point detector per user (Page 1954)
    over the value stream, exact integer basis — accumulates small
    persistent drifts that single-point detectors (e_win_zscore) never
    flag, with alarm-and-restart semantics. See
    operators/timeseries.cusum_page for the recurrence and the
    funnel-plan argument (a max-clamped recurrence cannot be a window
    prefix-sum; one groupBy shuffle + codegen fold)."""
    from sparkclif.operators.timeseries import cusum_page

    ev = table(spark, sf_dir, "events")
    return cusum_page(ev, target=5000, slack=1000, threshold=20000)


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
    # TWO-LEVEL BUILD (optimization r13, guide §2.3 aggregate-before-
    # shuffle): a distinct sketch is duplicate-insensitive, so the
    # md5 runs over the DISTINCT (group, key) pairs, not the item
    # stream — at sf0.1 that is 600k rows -> ~60k pairs (10x less
    # hashing; measured 1.49 -> 1.17 s at 32c, state md5-identical),
    # and at any scale the occurrence/vocabulary ratio is the win.
    # The pre-aggregation is a plain map-side-combined groupBy whose
    # partials are vocab-bounded per task. (The md5 projection between
    # the two aggregates keeps RemoveRedundantAggregates from
    # collapsing the pre-agg under the duplicate-agnostic collect_set
    # — pinned by a plan test, the d_agg_bloom discipline.)
    keys = (
        li.select(
            F.col("l_returnflag").alias("g"),
            F.col("l_partkey").alias("__pk"),
        )
        .groupBy("g", "__pk")
        .agg(F.count("*").alias("__w"))
    )
    hkey = F.concat(F.lit("kmv|"), F.col("__pk").cast("string"))
    # shard derives FROM the hash (low bits, uniform and independent
    # of the bottom-k ORDER which is decided by the full value):
    # exactly ONE md5 per DISTINCT key — the hash is the scan's
    # dominant cost.
    # NULL item keys hash to NULL and contribute NOTHING to a distinct
    # sketch (the DataSketches convention) — filtered ONCE here so the
    # two dispatch paths cannot diverge on them (collect_set silently
    # drops NULLs, the sharded build would keep a NULL-shard group — the
    # ADVICE-r7 d_agg_distinct class of path divergence). A group whose
    # every key is NULL vanishes rather than reporting 0, consistently
    # on both paths (tests/test_r8_queries.py pins this).
    proj = keys.select(
        "g",
        md5_bits(hkey, 1, 14).alias("h"),
    ).where(F.col("h").isNotNull())
    if force is None:
        # dispatch certificate unchanged: the bound is about the
        # collect_set buffer (a group's full distinct set), proxied by
        # the SCAN-side projection size exactly as before the
        # two-level change — the vocab-sized post-agg estimate would
        # re-level the threshold
        dispatch_src = li.select(
            F.col("l_returnflag").alias("g"),
            md5_bits(
                F.concat(F.lit("kmv|"), F.col("l_partkey").cast("string")), 1, 14
            ).alias("h"),
        ).where(F.col("h").isNotNull())
        force = (
            "fused" if plan_size_bytes(dispatch_src) <= SMALL_INPUT_BYTES else "merge"
        )
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
        WHERE l_partkey IS NOT NULL
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
