"""Crafted-input tests for round 8: the population z-score fix (the
flag must actually fire at >2 sigma — ADVICE r7), the -0.0
normalization on BOTH engines (the r7 driver hash-fail class), the
null-safe group join in d_agg_distinct's small dispatch path (ADVICE
r7 — NULL group keys must survive both paths identically), and the
round-8 growth operators: tolerance as-of boundary semantics and the
bucketed streaming MERGE (accumulation, tie-break, state-side
no-exchange plan, cross-batch fold).
"""

from __future__ import annotations

import datetime
import math
import re

import duckdb
import pandas as pd

from pyspark.sql import functions as F


def _events_df(spark, vals):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), 1, v) for i, v in enumerate(vals)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


def test_zscore_flag_fires_at_three_sigma(spark):
    """Nine 10s then a 40: population z of the spike is exactly 3.0,
    so |z|>2 flags it. (The pre-r8 sqrt(n)-damped statistic gave
    3/sqrt(10) ~ 0.95 and never flagged — the ADVICE r7 defect.)"""
    from sparkclif.queries.group_r7 import zscore_plan

    out = {
        r["event_id"]: (r["z"], r["flagged"])
        for r in zscore_plan(_events_df(spark, [10.0] * 9 + [40.0])).collect()
    }
    # zero-variance prefix: NULL z, unflagged
    for i in range(9):
        assert out[i] == (None, 0)
    z, flagged = out[9]
    assert abs(z - 3.0) < 1e-9
    assert flagged == 1


def test_zscore_positive_zero_both_engines(spark):
    """A deviation of -1 cent-unit in a wide frame rounds to zero from
    below; both the Spark plan and the DuckDB oracle must emit +0.0
    (the driver's hash stringifies cells, so '-0.0' != '0.0')."""
    from sparkclif.queries.group_r7 import zscore_plan
    from sparkclif.registry import all_queries

    # q = [1000000, 3000000, 1999999]: at row 2, n*q - s1 = -2 and
    # sqrt(det) ~ 2.45e6, so z ~ -8.2e-7 -> rounds to (-)0.0
    vals = [100.0, 300.0, 199.9999]
    sdf = zscore_plan(_events_df(spark, vals))
    row = {r["event_id"]: r["z"] for r in sdf.collect()}
    assert row[2] == 0.0 and math.copysign(1.0, row[2]) > 0

    pdf = pd.DataFrame(
        {
            "event_id": [0, 1, 2],
            "user_id": [1, 1, 1],
            "ts": pd.to_datetime(
                [datetime.datetime(2024, 1, 1, 0, 0, s) for s in range(3)]
            ),
            "value": vals,
        }
    )
    con = duckdb.connect()
    try:
        con.register("events", pdf)
        odf = con.execute(all_queries()["e_win_zscore"].oracle).fetchdf()
    finally:
        con.close()
    oz = odf.set_index("event_id")["z"][2]
    assert oz == 0.0 and math.copysign(1.0, oz) > 0


# ------------------------------------------------- as-of with tolerance


def test_asof_tolerance_boundary_and_miss(spark):
    """Inclusive 30-day bound: a match exactly at left_time - 30 days
    is kept, one second staler is nulled, and a keyless left stays
    NULL — while the same join WITHOUT tolerance keeps the stale
    match (the two operators must differ only in the null-out)."""
    from sparkclif.operators.asof import asof_join

    t = datetime.datetime(2024, 3, 31, 0, 0, 0)
    left = spark.createDataFrame(
        [(1, 10, t), (2, 20, t), (3, 30, t)],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, datetime.date(2024, 3, 1), 100.0),   # exactly 30 days
            (20, datetime.date(2024, 2, 29), 200.0),  # 31 days: stale
        ],
        "k long, d date, p double",
    )
    kw = dict(
        left_key="user_id", right_key="k", left_time="ts", right_time="d",
        payload=["p"], tiebreak="k",
    )
    with_tol = {
        r["event_id"]: r["asof_p"]
        for r in asof_join(left, right, tolerance="30 DAYS", **kw).collect()
    }
    assert with_tol == {1: 100.0, 2: None, 3: None}
    without = {
        r["event_id"]: r["asof_p"]
        for r in asof_join(left, right, **kw).collect()
    }
    assert without == {1: 100.0, 2: 200.0, 3: None}


# --------------------------------------------- bucketed streaming merge


def test_merge_into_state_accumulates_and_keeps_newer(spark):
    from sparkclif.streaming.merge import merge_into_state

    t1 = datetime.datetime(2024, 1, 1, 10, 0, 0)
    t2 = datetime.datetime(2024, 1, 1, 11, 0, 0)
    schema = (
        "user_id long, n_events long, ts timestamp, last_event_id long, "
        "last_value double"
    )
    state = spark.createDataFrame(
        [(1, 2, t2, 5, 1.0), (2, 1, t1, 3, 3.0)], schema
    )
    delta = spark.createDataFrame(
        [
            (1, 1, t1, 9, 9.0),   # OLDER than state: count adds, payload stays
            (2, 2, t2, 8, 8.0),   # newer: count adds, payload replaced
            (7, 1, t1, 7, 7.0),   # brand-new key: inserted
        ],
        schema,
    )
    got = {
        r["user_id"]: (r["n_events"], r["last_event_id"], r["last_value"])
        for r in merge_into_state(state, delta).collect()
    }
    assert got == {1: (3, 5, 1.0), 2: (3, 8, 8.0), 7: (1, 7, 7.0)}


def test_merge_equal_ts_resolves_by_event_id(spark):
    from sparkclif.streaming.merge import merge_into_state

    t = datetime.datetime(2024, 1, 1)
    schema = (
        "user_id long, n_events long, ts timestamp, last_event_id long, "
        "last_value double"
    )
    state = spark.createDataFrame([(1, 1, t, 5, 5.0)], schema)
    delta_hi = spark.createDataFrame([(1, 1, t, 6, 6.0)], schema)
    delta_lo = spark.createDataFrame([(1, 1, t, 4, 4.0)], schema)
    hi = merge_into_state(state, delta_hi).collect()[0]
    lo = merge_into_state(state, delta_lo).collect()[0]
    assert (hi["last_event_id"], hi["last_value"]) == (6, 6.0)
    assert (lo["last_event_id"], lo["last_value"]) == (5, 5.0)


def test_merge_state_side_joins_without_exchange(spark, tmp_path):
    """THE property the operator exists for: the bucketed state side
    of the per-batch MERGE join carries no Exchange — only the
    (delta-sized) other side shuffles. One Exchange total against an
    in-memory delta proves the O(state) relation stayed put."""
    from sparkclif.plans import formatted_plan
    from sparkclif.streaming.merge import STATE_BUCKETS, merge_into_state

    t = datetime.datetime(2024, 1, 1)
    schema = (
        "user_id long, n_events long, ts timestamp, last_event_id long, "
        "last_value double"
    )
    rows = [(i, 1, t, i, float(i)) for i in range(100)]
    tbl = "t_r8_merge_state_plan"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        spark.createDataFrame(rows, schema)
        .write.bucketBy(STATE_BUCKETS, "user_id")
        .sortBy("user_id")
        .mode("overwrite")
        .saveAsTable(tbl)
    )
    try:
        delta = spark.createDataFrame(rows[:7], schema)
        plan = formatted_plan(merge_into_state(spark.table(tbl), delta))
        assert "Bucketed: true" in plan, "state scan must be bucket-aware"
        # count numbered operator entries, not raw substring hits (each
        # node appears once in the tree and once in the detail section)
        n_exchanges = len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))
        assert n_exchanges == 1, (
            "exactly one shuffle Exchange (the delta side); a second "
            "means the O(state) side shuffled:\n" + plan
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_stream_merge_bucketed_accumulates_across_batches(spark, tmp_path):
    from sparkclif.streaming.merge import stream_merge_bucketed
    from sparkclif.streaming.source import write_time_chunks

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), 1 + (i % 2), "c", float(i))
        for i in range(8)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    src = str(tmp_path / "src")
    write_time_chunks(df, src, n_chunks=2, key=src)
    state = stream_merge_bucketed(spark, src, df.schema)
    got = {
        int(r.user_id): (int(r.n_events), int(r.last_event_id), float(r.last_value))
        for r in state.itertuples()
    }
    # counts span BOTH micro-batches; payload is the per-user latest
    assert got == {1: (4, 6, 6.0), 2: (4, 7, 7.0)}


def test_d_agg_distinct_small_path_keeps_null_group(spark, tmp_path):
    """The small dispatch path joins two single-distinct aggregates on
    the group key; with a plain equi-join a NULL group would vanish
    (NULL != NULL). eqNullSafe keeps both paths result-identical."""
    from sparkclif.registry import all_queries

    pdf = pd.DataFrame(
        {
            "l_returnflag": ["A", "A", None, None, "R"],
            "l_partkey": [1, 2, 3, 3, 9],
            "l_suppkey": [7, 7, 8, 9, 1],
        }
    )
    pdf.to_parquet(tmp_path / "lineitem.parquet")
    out = all_queries()["d_agg_distinct"].fn(spark, str(tmp_path))
    got = {
        r["l_returnflag"]: (r["n_parts"], r["n_supps"], r["n_lines"])
        for r in out.collect()
    }
    assert got == {"A": (2, 1, 2), None: (1, 2, 2), "R": (1, 1, 1)}


def test_stream_merge_bucketed_empty_source(spark, tmp_path):
    """No input files => no micro-batches => an EMPTY typed state
    frame (the createDataFrame-with-explicit-schema seam the query
    relies on), not a crash."""
    from sparkclif.streaming.merge import STATE_COLS, stream_merge_bucketed

    src = tmp_path / "empty_src"
    src.mkdir()
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double"
    )
    empty = spark.createDataFrame([], schema)
    state = stream_merge_bucketed(spark, str(src), empty.schema)
    assert list(state.columns) == STATE_COLS
    assert len(state) == 0


# ------------------------------------------------ nearest-direction as-of


def _nearest(spark, left_rows, right_rows):
    import datetime as dt

    from sparkclif.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [(i, k, dt.datetime(2024, 1, 1, 0, 0, s)) for i, k, s in left_rows],
        "lid long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [(k, dt.datetime(2024, 1, 1, 0, 0, s), v) for k, s, v in right_rows],
        "k long, rt timestamp, v long",
    )
    out = asof_join_nearest(
        left, right, left_key="k", right_key="k", left_time="t",
        right_time="rt", payload=["v"], tiebreak="v",
    )
    return {r["lid"]: (r["asof_v"], r["asof_side"], r["asof_dist_us"])
            for r in out.collect()}


def test_asof_nearest_picks_closer_side(spark):
    """Backward at 3 s vs forward at 1 s -> forward wins; backward at
    1 s vs forward at 3 s -> backward wins; unmatched key -> NULLs."""
    got = _nearest(
        spark,
        [(0, 1, 10), (1, 2, 10), (2, 99, 10)],
        [(1, 7, 100), (1, 11, 200), (2, 9, 300), (2, 13, 400)],
    )
    assert got[0] == (200, "forward", 1_000_000)
    assert got[1] == (300, "backward", 1_000_000)
    assert got[2] == (None, None, None)


def test_asof_nearest_tie_resolves_backward(spark):
    """Equal 2 s distance on both sides -> backward (the pandas
    direction='nearest' convention); an equal-time right is a backward
    match at distance 0."""
    got = _nearest(
        spark,
        [(0, 1, 10), (1, 2, 10)],
        [(1, 8, 100), (1, 12, 200), (2, 10, 300), (2, 11, 400)],
    )
    assert got[0] == (100, "backward", 2_000_000)
    assert got[1] == (300, "backward", 0)


def test_asof_nearest_within_side_tiebreaks_mirror(spark):
    """Equal-time rights: MAX tiebreak wins backward, MIN forward."""
    got = _nearest(
        spark,
        [(0, 1, 10), (1, 2, 10)],
        [(1, 9, 100), (1, 9, 150), (2, 12, 300), (2, 12, 250)],
    )
    assert got[0] == (150, "backward", 1_000_000)
    assert got[1] == (250, "forward", 2_000_000)


def test_asof_nearest_single_exchange(spark, sf_dir):
    """Both window carries must share the one key shuffle — the plan
    carries exactly ONE Exchange (the property that makes nearest cost
    the same shuffle as backward)."""
    from sparkclif.plans import formatted_plan, plan_metrics
    from sparkclif.registry import all_queries

    m = plan_metrics(
        formatted_plan(all_queries()["c_join_asof_nearest"].fn(spark, sf_dir))
    )
    assert m["exchanges"] == 1, m


# ------------------------------------------------ URL-canonicalization dedup


def test_canonical_url_rules(spark):
    """Every canonicalization rule, one assert each: scheme fold +
    case, www strip, default-port strip vs NON-default kept, fragment
    drop, utm_*/ref= filter + param sort, trailing-slash trim."""
    from sparkclif.operators.dedup import canonical_url

    cases = [
        ("HTTP://WWW.Ex.COM/a/?b=2&a=1#frag", "https://ex.com/a?a=1&b=2"),
        ("https://ex.com:443/a?a=1", "https://ex.com/a?a=1"),
        ("http://ex.com:80/a", "https://ex.com/a"),
        # non-default port is semantic and survives
        ("https://ex.com:8443/a", "https://ex.com:8443/a"),
        # http's default-port rule judges the ORIGINAL scheme: :443 on
        # http is non-default and survives the scheme fold
        ("http://ex.com:443/a", "https://ex.com:443/a"),
        ("https://ex.com/a?utm_source=x&ref=y&z=1", "https://ex.com/a?z=1"),
        ("https://ex.com/a?utm_source=x", "https://ex.com/a"),
        ("https://ex.com//", "https://ex.com"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r["c"] for r in df.select(canonical_url("url").alias("c")).collect()]
    for (u, want), g in zip(cases, got):
        assert g == want, f"{u!r}: {g!r} != {want!r}"


def test_dedup_url_groups_cross_variants(spark, sf_dir):
    """The synthesized corpus must contain canonical groups whose raw
    URLs DIFFER (the whole point: doc_id div 100 picks the mess, doc_id
    mod 100 the collision key); keeper is the min id; kept XOR dup."""
    from sparkclif.registry import all_queries

    out = all_queries()["i_dedup_url"].fn(spark, sf_dir)
    rows = out.collect()
    by_canon = {}
    for r in rows:
        by_canon.setdefault(r["canon_url"], []).append(r)
    mixed = [
        g for g in by_canon.values()
        if len(g) >= 2 and len({r["url"] for r in g}) >= 2
    ]
    assert mixed, "no cross-variant dup groups — synthesis regressed"
    for g in by_canon.values():
        keeper = min(r["doc_id"] for r in g)
        for r in g:
            assert r["keeper_id"] == keeper and r["group_size"] == len(g)
            assert r["kept"] == (1 if r["doc_id"] == keeper else 0)


def test_dedup_url_malformed_urls_are_singletons(spark):
    """Two identical MALFORMED urls (NULL canonical) must NOT dedup
    against each other — unparseable means unknown identity, so each
    keeps its own singleton group; well-formed rows still group."""
    from sparkclif.operators.dedup import dedup_url

    df = spark.createDataFrame(
        [(0, "not a url"), (1, "not a url"),
         (2, "https://ex.com/a"), (3, "HTTPS://EX.COM/a/")],
        "doc_id long, url string",
    )
    rows = {r["doc_id"]: r for r in dedup_url(df).collect()}
    for i in (0, 1):
        assert rows[i]["canon_url"] is None
        assert rows[i]["group_size"] == 1 and rows[i]["kept"] == 1
        assert rows[i]["keeper_id"] == i
    assert rows[2]["group_size"] == 2 and rows[3]["keeper_id"] == 2
    assert rows[3]["kept"] == 0


# ------------------------------------------------ CUSUM drift detector


def _cusum_model(qs, target=5000, slack=1000, h=20000):
    sp = sn = mx = al = 0
    for q in qs:
        sp1 = max(0, sp + q - target - slack)
        sn1 = max(0, sn + target - slack - q)
        alarm = sp1 > h or sn1 > h
        mx = max(mx, sp1)
        al += 1 if alarm else 0
        sp, sn = (0, 0) if alarm else (sp1, sn1)
    return sp, sn, mx, al


def _cusum_run(spark, vals):
    import datetime as dt

    from sparkclif.operators.timeseries import cusum_page

    rows = [
        (i, dt.datetime(2024, 1, 1, 0, 0, 0, 0) + dt.timedelta(seconds=i), 7, v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    r = cusum_page(df).collect()[0]
    return (r["cusum_pos"], r["cusum_neg"], r["max_pos"], r["n_alarms"])


def test_cusum_alarm_resets_and_peak_is_pre_reset(spark):
    """An alarm resets BOTH statistics but max_pos keeps the pre-reset
    peak; a later larger drift raises the peak again (the exact trace
    the DuckDB struct-lambda quirk got wrong — see
    test_duckdb_struct_lambda_quirk)."""
    vals = [360.00, 61.00, 65.00, 70.00, 61.00, 360.00, 61.00]
    got = _cusum_run(spark, vals)
    qs = [36000, 6100, 6500, 7000, 6100, 36000, 6100]
    # trace: alarm@1 (peak 30000, reset), small drift to sp=1700, then
    # alarm@6 at peak 1700+30000=31700 (> the first peak), final sp
    # from the trailing 6100 = 100
    assert got == _cusum_model(qs) == (100, 0, 31700, 2)


def test_cusum_small_persistent_drift_alarms(spark):
    """20 quiet points then a +25-unit persistent shift: no single
    point is extreme, but the accumulated drift crosses the threshold
    — the semantics zscore cannot express."""
    vals = [50.0] * 20 + [85.0] * 12
    got = _cusum_run(spark, vals)
    model = _cusum_model([5000] * 20 + [8500] * 12)
    assert got == model
    assert got[3] == 1 and got[2] > 20000


def test_cusum_null_observations_dropped_not_resetting(spark):
    """A NULL value (or NULL ts) is not an observation: the fold must
    skip it, NOT reset the statistics (greatest(0, NULL) = 0 would
    silently erase accumulated drift in both engines). Drift built
    before a NULL must carry straight through it."""
    import datetime as dt

    from sparkclif.operators.timeseries import cusum_page

    base = [(i, dt.datetime(2024, 1, 1, 0, 0, i), 7, v)
            for i, v in enumerate([85.0] * 6)]
    with_null = base[:3] + [(99, dt.datetime(2024, 1, 1, 0, 0, 3, 500000), 7,
                             None)] + base[3:]
    schema = "event_id long, ts timestamp, user_id long, value double"
    clean = cusum_page(spark.createDataFrame(base, schema)).collect()[0]
    dirty = cusum_page(spark.createDataFrame(with_null, schema)).collect()[0]
    assert (clean["cusum_pos"], clean["max_pos"], clean["n_alarms"]) == (
        dirty["cusum_pos"], dirty["max_pos"], dirty["n_alarms"])
    assert clean["n_events"] == dirty["n_events"] == 6
    assert clean["cusum_pos"] == 6 * 2500  # drift never reset


def test_cusum_matches_python_model_random(spark):
    """Random value series == the Python reference fold (both engines'
    parity with each other is the oracle's job; this pins Spark to the
    abstract recurrence)."""
    import random

    rng = random.Random(8)
    vals = [round(rng.uniform(0, 490), 2) for _ in range(200)]
    got = _cusum_run(spark, vals)
    assert got == _cusum_model([int(v * 100 + 0.5) for v in vals])


def test_asof_nearest_null_left_time_has_no_match(spark):
    """A left row with a NULL time has no distance to anything: all
    match columns NULL (mirrors backward as-of's NULL-time semantics).
    Without the guard the descending carry window would leak the
    key's earliest right as a spurious 'forward' match."""
    import datetime as dt

    from sparkclif.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [(0, 1, None), (1, 1, dt.datetime(2024, 1, 1, 0, 0, 10))],
        "lid long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 0, 9), 100),
         (1, dt.datetime(2024, 1, 1, 0, 0, 12), 200)],
        "k long, rt timestamp, v long",
    )
    out = {r["lid"]: (r["asof_v"], r["asof_side"], r["asof_dist_us"])
           for r in asof_join_nearest(
               left, right, left_key="k", right_key="k", left_time="t",
               right_time="rt", payload=["v"], tiebreak="v").collect()}
    assert out[0] == (None, None, None)
    assert out[1] == (100, "backward", 1_000_000)


def test_asof_null_keys_never_match(spark):
    """NULL join keys must behave like the oracle's equi-join (NULL
    never matches NULL): a NULL-key left row gets no match even when
    NULL-key rights exist, on BOTH the backward and nearest variants.
    Without the _tag_union right-key filter, partitionBy lumps the
    NULL keys into one partition where they 'match'."""
    import datetime as dt

    from sparkclif.operators.asof import asof_join, asof_join_nearest

    t = dt.datetime(2024, 1, 1, 0, 0, 10)
    left = spark.createDataFrame(
        [(0, None, t), (1, 1, t)], "lid long, k long, t timestamp"
    )
    right = spark.createDataFrame(
        [(None, dt.datetime(2024, 1, 1, 0, 0, 5), 666),
         (1, dt.datetime(2024, 1, 1, 0, 0, 5), 100)],
        "k long, rt timestamp, v long",
    )
    kw = dict(left_key="k", right_key="k", left_time="t",
              right_time="rt", payload=["v"], tiebreak="v")
    back = {r["lid"]: r["asof_v"] for r in asof_join(left, right, **kw).collect()}
    assert back == {0: None, 1: 100}
    near = {r["lid"]: (r["asof_v"], r["asof_side"])
            for r in asof_join_nearest(left, right, **kw).collect()}
    assert near == {0: (None, None), 1: (100, "backward")}


def test_lm_score_null_text_keeps_row(spark):
    """A NULL-text doc behaves as an empty doc: its row survives with
    n_bigrams = 0 and a NULL score (the text_col coalesce feeding the
    shared toks relation — pinned because the short-doc union rewrite
    made this path load-bearing)."""
    from sparkclif.operators.corpus import bigram_lm_score

    docs = spark.createDataFrame(
        [(0, None), (1, "a b a"), (2, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: (r["n_bigrams"], r["lm_score_bp"])
            for r in bigram_lm_score(docs).collect()}
    assert rows[0] == (0, None) and rows[2] == (0, None)
    assert rows[1][0] == 2


def test_cusum_oracle_pack_survives_large_spike(spark):
    """The bit-packed oracle accumulator must not corrupt on a value
    far beyond the stream's range: a 2000.00 spike drives the stored
    transient peak to ~214k, which overflowed the r8-initial 17-bit mx
    field (silent cusum_neg corruption) and fits the widened 21-bit
    layout. Engine fold and a direct DuckDB oracle run must agree
    exactly."""
    import datetime as dt

    import duckdb
    import pandas as pd

    from sparkclif.operators.timeseries import cusum_page
    from sparkclif.registry import all_queries

    rows = [(i, dt.datetime(2024, 1, 1, 0, 0, i), 7,
             2000.00 if i == 3 else 40.00 + i) for i in range(8)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {tuple(r) for r in cusum_page(df).select(
        "user_id", "n_events", "cusum_pos", "cusum_neg", "max_pos",
        "n_alarms").collect()}

    events = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "value"]
    )
    con = duckdb.connect()
    con.register("events", events)
    osql = all_queries()["e_win_cusum"].oracle
    want = {tuple(r) for r in con.execute(osql).fetchall()}
    assert got == want
    (r,) = got
    assert r[5] == 1 and r[4] > 2**17  # peak exceeds the old field


def test_duckdb_struct_lambda_quirk():
    """Pin the DuckDB v1.0.0 behavior that forced e_win_cusum's oracle
    to a bit-packed scalar accumulator: struct-lambda fields evaluate
    SEQUENTIALLY, so a later field reading acc.x sees the UPDATED x
    (here 'mx' sees the new running sum: 22, not the 12 a simultaneous
    binding would give). If this test ever fails, DuckDB fixed the
    quirk and the oracle may return to a struct accumulator."""
    import duckdb

    (res,) = duckdb.sql(
        """
        SELECT list_reduce(
          [{'q': x::BIGINT, 'run': 0::BIGINT, 'mx': 0::BIGINT}
           for x in [0, 5, -3, 10, -2]],
          (acc, e) -> {'q': 0::BIGINT, 'run': acc.run + e.q,
                       'mx': greatest(acc.mx, acc.run + e.q)})
        """
    ).fetchall()[0]
    assert res["run"] == 10
    assert res["mx"] == 22  # simultaneous-binding semantics would give 12


# ------------------------------------------------ KMV theta-union sketch


def test_theta_union_merge_equals_direct_bottom_k(spark):
    """The Theta union identity the operator is built on: k smallest
    of the union == k smallest over the union of per-shard bottom-k
    sketches. Verified against a direct global bottom-k on the same
    hash stream."""
    from sparkclif.operators.hashing import md5_bits
    from sparkclif.queries.group_r8 import KMV_K, theta_union_plan

    li = spark.range(5000).select(
        F.lit("G").alias("l_returnflag"), F.col("id").alias("l_partkey")
    )
    out = theta_union_plan(li).collect()[0]
    hkey = F.concat(F.lit("kmv|"), F.col("l_partkey").cast("string"))
    direct = (
        li.select(md5_bits(hkey, 1, 14).alias("h"))
        .distinct()
        .orderBy("h")
        .limit(KMV_K)
        .collect()
    )
    assert out["n_state"] == KMV_K
    assert out["kth_hash"] == direct[-1]["h"]
    assert out["n_shards"] == 8


def test_theta_union_exact_below_k(spark):
    """Fewer than k distinct items => the sketch is lossless and the
    estimate IS the exact distinct count (duplicates collapse)."""
    from sparkclif.queries.group_r8 import theta_union_plan

    li = spark.createDataFrame(
        [("G", i % 10) for i in range(200)], "l_returnflag string, l_partkey long"
    )
    out = theta_union_plan(li).collect()[0]
    assert out["n_state"] == 10
    assert out["kth_hash"] is None
    assert out["est_distinct"] == 10


def test_theta_union_estimate_within_tolerance(spark):
    """KMV estimator sanity: relative error ~ 1/sqrt(k-2) (~13% at
    k=64); assert within 4 sigma so the test is deterministic-stable
    for this fixed hash family."""
    from sparkclif.queries.group_r8 import theta_union_plan

    n = 20000
    li = spark.range(n).select(
        F.lit("G").alias("l_returnflag"), F.col("id").alias("l_partkey")
    )
    out = theta_union_plan(li).collect()[0]
    assert abs(out["est_distinct"] - n) / n < 0.52


def test_theta_union_state_bounded_at_k_before_collect(spark, sf_dir):
    """No collect buffer ever holds a shard's full distinct set on the
    SCALE path: the pre-collect row_number filter caps every collected
    list at k. Asserted structurally — the filter sits BELOW the first
    collect_list in the plan. (force='merge' pins the scale path; the
    cost dispatcher would pick the fused single-agg below
    SMALL_INPUT_BYTES.)"""
    from sparkclif.plans import formatted_plan
    from sparkclif.queries.group_r8 import theta_union_plan
    from sparkclif.io import table

    plan = formatted_plan(
        theta_union_plan(table(spark, sf_dir, "lineitem"), force="merge")
    )
    assert "row_number" in plan
    # the rank filter must appear (Filter on __rn <= 64)
    assert "__rn" in plan and "64" in plan


def test_theta_union_fused_equals_merge(spark):
    """The cost dispatcher's two paths are result-identical — the
    Theta union identity that justifies the fused small path: k-min
    over per-shard k-min sketches == k-min over all distinct hashes.
    Checked on a mixed-group input with duplicates, a below-k group,
    and an all-NULL-key group (which must vanish identically on both
    paths — NULL keys contribute nothing to a distinct sketch), every
    output column including the state fingerprint."""
    from sparkclif.queries.group_r8 import theta_union_plan

    li = spark.createDataFrame(
        [("A", i % 700) for i in range(3000)]
        + [("B", i) for i in range(20)]
        + [("C", None)],
        "l_returnflag string, l_partkey long",
    )
    cols = ["l_returnflag", "n_shards", "n_state", "kth_hash",
            "est_distinct", "state_md5"]
    merge = {tuple(r) for r in
             theta_union_plan(li, force="merge").select(*cols).collect()}
    fused = {tuple(r) for r in
             theta_union_plan(li, force="fused").select(*cols).collect()}
    assert merge == fused and len(merge) == 2
    assert {r[0] for r in merge} == {"A", "B"}


def test_theta_union_force_validated(spark):
    """A mistyped force= raises instead of silently picking a path."""
    import pytest

    from sparkclif.queries.group_r8 import theta_union_plan

    li = spark.createDataFrame([("A", 1)], "l_returnflag string, l_partkey long")
    with pytest.raises(ValueError, match="force"):
        theta_union_plan(li, force="fsued")


def test_stream_merge_bucketed_out_of_order_arrival(spark, tmp_path):
    """Displaced chunks: the stream's OLDEST rows arrive in the LAST
    micro-batch. The accumulating merge has no watermark (counts are
    a total, not a window), so late rows still count — and the
    last-wins payload must NOT regress to the late-arriving older
    event (the ~newer branch of merge_into_state, exercised through
    the real streaming path)."""
    from sparkclif.streaming.merge import stream_merge_bucketed
    from sparkclif.streaming.source import write_time_chunks

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (i, t0 + datetime.timedelta(minutes=i), 1, "c", float(i))
        for i in range(10)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )
    src = str(tmp_path / "src_ooo")
    # 3 oldest rows (events 0-2) arrive AFTER everything else
    write_time_chunks(df, src, n_chunks=3, key=src, displace_rows=3)
    state = stream_merge_bucketed(spark, src, df.schema)
    assert len(state) == 1
    r = state.iloc[0]
    assert int(r.n_events) == 10           # late rows still counted
    assert int(r.last_event_id) == 9       # payload did not regress
    assert float(r.last_value) == 9.0


def test_percentile_paths_agree_on_null_group(spark):
    """The d_agg_distinct ADVICE class, swept to the other dispatcher
    (r8): a NULL group key must produce the SAME row in every
    percentile path — the distributed path's group-key joins were
    plain equi-joins and silently dropped it."""
    from sparkclif.operators.rank import exact_percentiles

    rows = [("A", float(v)) for v in range(100)] + [
        (None, float(v * 2)) for v in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, v double")
    specs = [("v", 0.5, "p50"), ("v", 0.95, "p95")]
    outs = {}
    for force in ("array", "kernel", "window", "bracket", "distributed"):
        got = {
            r["g"]: (r["p50"], r["p95"])
            for r in exact_percentiles(df, "g", specs, force=force).collect()
        }
        outs[force] = got
    base = outs["array"]
    assert None in base and base[None][0] is not None
    for force, got in outs.items():
        assert got == base, f"{force} diverged: {got} vs {base}"


def test_theta_union_two_level_preagg_survives(spark, sf_dir):
    """The r13 two-level build hashes DISTINCT (group, key) pairs, not
    the item stream; collect_set is duplicate-agnostic, so if
    RemoveRedundantAggregates ever learns to look through the md5
    projection it would collapse the pre-aggregation and silently put
    the md5 back on every occurrence. Pin: the plan keeps a plain
    hash aggregation (the key pre-agg) UNDER the ObjectHashAggregate
    (collect_set) on the fused path."""
    from sparkclif.io import table
    from sparkclif.queries.group_r8 import theta_union_plan

    df = theta_union_plan(table(spark, sf_dir, "lineitem"), force="fused")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    plain = plan.count("HashAggregate") // 2 - plan.count("ObjectHashAggregate") // 2
    assert plain >= 2, f"key pre-aggregation collapsed:\n{plan}"
