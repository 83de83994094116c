"""Property-based tests (SURVEY.md §5.2 layer 3, Hypothesis).

A 20-line Python dict model of the reference's StatusStore
(state.py:26-143) is the executable spec: applying a random command
log through the engine's append + last-wins-window path must equal
applying it through the model. The pivot property: for any sparse
status set, pivot(long) -> unpivot == dense original + defaults.

Examples are kept small (Spark round-trip per example); the point is
the random structure, not volume.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sparkclif.clif.fixtures import STATUS_DEFAULT
from sparkclif.clif.status_store import current_pocs, current_site_status

SITES = ["site_a", "site_b", "site_c"]
REPOS = ["r1", "r2"]
STATUSES = ["✅", "🛠", "❌", STATUS_DEFAULT]

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

status_command = st.tuples(
    st.sampled_from(REPOS), st.sampled_from(SITES), st.sampled_from(STATUSES)
)


@given(log=st.lists(status_command, min_size=0, max_size=12))
@_settings
def test_upsert_log_matches_dict_model(spark, log):
    """Engine append-log + last-wins window == reference dict semantics
    (state.py:141-143: plain last-write-wins per (repo, site))."""
    model: dict[tuple[str, str], str] = {}
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for i, (repo, site, status) in enumerate(log):
        model[(repo, site)] = status
        rows.append((repo, site, status, t0 + dt.timedelta(seconds=i)))
    schema = "repo_url string, site_name string, status string, updated_at timestamp"
    df = spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
    got = {
        (r.repo_url, r.site_name): r.status for r in current_site_status(df).collect()
    }
    assert got == model


poc_command = st.tuples(
    st.sampled_from(["u1", "u2", "u3"]),
    st.sampled_from(SITES),
    st.sampled_from(["projX", None]),
)


@given(log=st.lists(poc_command, min_size=0, max_size=10))
@_settings
def test_poc_upsert_matches_dict_model(spark, log):
    """One site per user, last-wins (state.py:93-105) + 'General'
    default for a missing project (state.py:100-103)."""
    model: dict[str, tuple[str, str]] = {}
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for i, (user, site, project) in enumerate(log):
        model[user] = (site, project or "General")
        rows.append((user, site, project or "General", t0 + dt.timedelta(seconds=i)))
    schema = "user_id string, site_name string, project string, assigned_at timestamp"
    df = spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
    got = {r.user_id: (r.site_name, r.project) for r in current_pocs(df).collect()}
    assert got == model


sparse_cells = st.dictionaries(
    st.tuples(st.sampled_from(SITES), st.sampled_from(["p1", "p2", "p3"])),
    st.sampled_from(STATUSES),
    max_size=9,
)


@given(cells=sparse_cells)
@_settings
def test_pivot_unpivot_roundtrip(spark, cells):
    """pivot(long) with defaults -> unpivot == dense(original+default)
    — the R22 dashboard matrix invariant."""
    projects = ["p1", "p2", "p3"]
    rows = [(s, p, v) for (s, p), v in cells.items()]
    schema = "site_name string, project string, status string"
    long_df = (
        spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
    )
    sites_df = spark.createDataFrame([(s,) for s in SITES], "site_name string")
    wide = (
        sites_df.join(long_df, "site_name", "left")
        .groupBy("site_name")
        .pivot("project", projects)
        .agg(F.first("status"))
        .fillna(STATUS_DEFAULT, subset=projects)
    )
    unpivoted = wide.unpivot("site_name", projects, "project", "status")
    got = {
        (r.site_name, r.project): r.status
        for r in unpivoted.collect()
        if r.status is not None
    }
    want = {
        (s, p): cells.get((s, p), STATUS_DEFAULT) for s in SITES for p in projects
    }
    assert got == want


# ---- round-4 sequence / dedup / sampling operators ------------------

_ev_types = st.sampled_from(["view", "click", "purchase", "error"])
_funnel_event = st.tuples(
    st.integers(min_value=1, max_value=3),      # user
    st.integers(min_value=0, max_value=5000),   # seconds offset
    _ev_types,
)


@given(log=st.lists(_funnel_event, min_size=0, max_size=16))
@_settings
def test_funnel_fold_matches_python_model(spark, log):
    """The JVM fold == a 10-line Python state machine over the sorted
    stream, for random (user, ts, type) logs including equal
    timestamps (the strict-after rule) and window cutoffs."""
    from sparkclif.operators.sequence import funnel_stages

    steps = ["view", "click", "purchase"]
    window_us = 1200 * 1_000_000  # 20 min
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (u, t0 + dt.timedelta(seconds=s), ty, i)
        for i, (u, s, ty) in enumerate(log)
    ]
    schema = "user_id long, ts timestamp, event_type string, event_id long"
    df = (
        spark.createDataFrame(rows, schema)
        if rows
        else spark.createDataFrame([], schema)
    )

    # model: fold in (ts, event_id) order; strictly-after + window
    model: dict[int, list] = {}
    for u, ts, ty, eid in sorted(rows, key=lambda r: (r[1], r[3])):
        if ty not in steps:
            continue
        t_us = int(ts.timestamp() * 1_000_000)
        stage, times = model.setdefault(u, [0, [None, None, None]])
        s_idx = steps.index(ty)
        ok = s_idx == stage and stage < 3
        if ok and stage > 0:
            ok = t_us > times[stage - 1] and t_us <= times[0] + window_us
        if ok:
            times[stage] = t_us
            model[u][0] = stage + 1
    got = {
        r["user_id"]: (r["stage"], r["t0_us"], r["t1_us"], r["t2_us"])
        for r in funnel_stages(df, steps, window_us=window_us).collect()
    }
    want = {
        u: (stage, times[0], times[1], times[2])
        for u, (stage, times) in model.items()
    }
    assert got == want


_batch_doc = st.tuples(
    st.integers(min_value=0, max_value=20),
    st.sampled_from(["alpha", "beta", "gamma", "delta"]),
)


@given(
    batch=st.lists(_batch_doc, min_size=0, max_size=10, unique_by=lambda d: d[0]),
    store_texts=st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta"]), max_size=4
    ),
)
@_settings
def test_incremental_dedup_matches_set_model(spark, batch, store_texts):
    """dedup_incremental == the obvious two-set Python model: store
    membership wins, then first-in-batch by min id, else kept."""
    import hashlib as _hl

    from sparkclif.operators.dedup import dedup_incremental, fingerprint_sha256

    bdf = (
        spark.createDataFrame(batch, "doc_id long, text string")
        if batch
        else spark.createDataFrame([], "doc_id long, text string")
    )
    sdf = (
        spark.createDataFrame([(t,) for t in store_texts], "text string")
        if store_texts
        else spark.createDataFrame([], "text string")
    ).select(fingerprint_sha256("text").alias("content_hash"))

    def _h(t):
        return _hl.sha256(t.encode()).hexdigest()

    store = {_h(t) for t in store_texts}
    first = {}
    for i, t in sorted(batch):
        first.setdefault(_h(t), i)
    want = {}
    for i, t in sorted(batch):
        h = _h(t)
        want[i] = (
            "dup_store" if h in store else ("kept" if first[h] == i else "dup_batch")
        )
    got = {
        r["doc_id"]: r["status"] for r in dedup_incremental(bdf, sdf).collect()
    }
    assert got == want


@given(
    weights=st.lists(
        st.integers(min_value=0, max_value=10_000), min_size=0, max_size=12
    )
)
@_settings
def test_pps_selection_matches_python_model(spark, weights):
    """pps_sample_topk's selected SET and order == the hashlib model
    under arbitrary weights (including zeros -> clamp to 1)."""
    import hashlib as _hl

    from sparkclif.operators.sampling import pps_sample_topk

    rows = [(i, w) for i, w in enumerate(weights)]
    df = (
        spark.createDataFrame(rows, "doc_id long, w long")
        if rows
        else spark.createDataFrame([], "doc_id long, w long")
    )
    k = 5
    model = sorted(
        (
            (int(_hl.md5(f"pps|{i}".encode()).hexdigest()[17:24], 16) + 1)
            / max(w, 1),
            i,
        )
        for i, w in rows
    )[:k]
    want = [i for _, i in model]
    got = [r["doc_id"] for r in pps_sample_topk(df, "doc_id", "w", k=k).collect()]
    assert got == want


_trans_event = st.tuples(
    st.integers(min_value=1, max_value=2),
    st.integers(min_value=0, max_value=7200),
    st.sampled_from(["a", "b", "c"]),
)


@given(log=st.lists(_trans_event, min_size=0, max_size=14))
@_settings
def test_session_transitions_matches_python_model(spark, log):
    """Gaps-and-islands + lag == a plain Python pass over the sorted
    stream, for random logs with 30-min session gaps and equal-ts
    ties broken by event_id."""
    from sparkclif.operators.sequence import session_transitions

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (u, t0 + dt.timedelta(seconds=s), ty, i)
        for i, (u, s, ty) in enumerate(log)
    ]
    schema = "user_id long, ts timestamp, event_type string, event_id long"
    df = (
        spark.createDataFrame(rows, schema)
        if rows
        else spark.createDataFrame([], schema)
    )
    model: dict[tuple[str, str], int] = {}
    by_user: dict[int, list] = {}
    for u, ts, ty, eid in sorted(rows, key=lambda r: (r[0], r[1], r[3])):
        by_user.setdefault(u, []).append((ts, ty))
    for evs in by_user.values():
        prev_ts, prev_ty = None, None
        for ts, ty in evs:
            if prev_ts is not None and (ts - prev_ts).total_seconds() < 1800:
                k = (prev_ty, ty)
                model[k] = model.get(k, 0) + 1
            prev_ts, prev_ty = ts, ty
    got = {
        (r["from_type"], r["to_type"]): r["n"]
        for r in session_transitions(df, gap_minutes=30).collect()
    }
    assert got == model


@given(
    vals=st.lists(st.sampled_from(["p", "q", "r", "s"]), min_size=0, max_size=20)
)
@_settings
def test_countmin_weighted_equals_occurrences(spark, vals):
    """count_min over raw occurrences == count_min over the
    pre-aggregated (value, count) table via weight_col — the identity
    d_agg_countmin_topk's single-pass rewrite relies on."""
    from pyspark.sql import functions as F

    from sparkclif.operators.sketch import count_min

    raw = (
        spark.createDataFrame([(v,) for v in vals], "item string")
        if vals
        else spark.createDataFrame([], "item string")
    )
    counted = raw.groupBy("item").agg(F.count("*").cast("long").alias("w"))
    a = sorted(tuple(r) for r in count_min(raw).collect())
    b = sorted(
        tuple(r) for r in count_min(counted, weight_col="w").collect()
    )
    assert a == b


pack_rows = st.lists(
    st.tuples(st.integers(0, 10**6), st.integers(0, 50)),
    min_size=0,
    max_size=24,
    unique_by=lambda t: t[0],
)


@given(rows=pack_rows, budget=st.integers(1, 64))
@_settings
def test_pack_sequences_paths_match_model(spark, rows, budget):
    """Both cost-dispatch paths of pack_sequences == the plain Python
    running sum, for random (order, count) inputs — the dual-path
    guarantee beyond the fixed testbed corpus."""
    from sparkclif.operators.sampling import pack_sequences

    run, model = 0, {}
    for k, c in sorted(rows):
        model[k] = run // budget
        run += c
    schema = "k long, c long"
    df = (
        spark.createDataFrame(rows, schema)
        if rows
        else spark.createDataFrame([], schema)
    )
    for force, n_part in (("window", None), ("distributed", None), ("distributed", 3)):
        got = {
            r["k"]: r["shard_id"]
            for r in pack_sequences(
                df, "k", "c", budget=budget, num_partitions=n_part, force=force
            ).collect()
        }
        assert got == model, (force, n_part)


rank_rows = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 1000)),
    min_size=0,
    max_size=24,
    unique_by=lambda t: (t[0], t[1]),
)


@given(rows=rank_rows)
@_settings
def test_grouped_rank_paths_match_model(spark, rows):
    """Both cost-dispatch paths of grouped_rank == per-group sorted
    1-based positions, for random (group, order) inputs."""
    from sparkclif.operators.sampling import grouped_rank

    model = {}
    for g in {g for g, _ in rows}:
        for i, o in enumerate(sorted(o for gg, o in rows if gg == g)):
            model[(g, o)] = i + 1
    schema = "g string, o long"
    df = (
        spark.createDataFrame(rows, schema)
        if rows
        else spark.createDataFrame([], schema)
    )
    for force, n_part in (("window", None), ("distributed", None), ("distributed", 2)):
        got = {
            (r["g"], r["o"]): r["pos"]
            for r in grouped_rank(
                df, "g", "o", num_partitions=n_part, force=force
            ).collect()
        }
        assert got == model, (force, n_part)


seg_docs = st.lists(
    st.tuples(
        st.integers(0, 100),
        st.lists(st.sampled_from(["aa", "bb", "cc"]), max_size=9).map(" ".join),
    ),
    min_size=0,
    max_size=8,
    unique_by=lambda t: t[0],
)


@given(docs=seg_docs)
@_settings
def test_segment_dedup_paths_agree(spark, docs):
    """The window and join paths of segment_dedup must emit identical
    rows for random tiny corpora — repeated segments across and
    within documents, empty docs, remnant tails."""
    from sparkclif.operators.corpus import segment_dedup

    schema = "doc_id long, text string"
    df = (
        spark.createDataFrame(docs, schema)
        if docs
        else spark.createDataFrame([], schema)
    )
    a = sorted(tuple(r) for r in segment_dedup(df, width=2, force="window").collect())
    b = sorted(tuple(r) for r in segment_dedup(df, width=2, force="join").collect())
    assert a == b


corpus_docs = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50),
        st.sampled_from(["web", "book", None]),
        st.one_of(
            st.none(),
            st.text(
                alphabet="ab c", min_size=0, max_size=30
            ),  # tiny vocab -> real bigram/df collisions
        ),
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda t: t[0],
)


@given(docs=corpus_docs)
@_settings
def test_checkpoint_dispatch_paths_agree(spark, docs):
    """maybe_local_checkpoint's two paths (skip below
    MATERIALIZE_INPUT_BYTES vs checkpoint above, forced via
    spark.sparkclif.forceDistributed) must leave every consumer's
    results identical — exercised here through bigram_lm_score and
    rarity_score on random corpora; the third call site (i_corpus_mix's
    histogram) is covered by the companion test below."""
    from sparkclif.operators.corpus import bigram_lm_score, rarity_score

    schema = "doc_id long, source string, text string"
    df = (
        spark.createDataFrame(docs, schema)
        if docs
        else spark.createDataFrame([], schema)
    )

    def both(build):
        spark.conf.set("spark.sparkclif.forceDistributed", "false")
        a = sorted(tuple(r) for r in build().collect())
        spark.conf.set("spark.sparkclif.forceDistributed", "true")
        try:
            b = sorted(tuple(r) for r in build().collect())
        finally:
            spark.conf.set("spark.sparkclif.forceDistributed", "false")
        return a, b

    a, b = both(lambda: bigram_lm_score(df))
    assert a == b
    a, b = both(lambda: rarity_score(df))
    assert a == b


def test_corpus_mix_invariant_under_force_distributed(spark):
    """i_corpus_mix's r7 rewrite deleted its maybe_local_checkpoint
    call site (one window+agg pipeline, no shared consumers), so
    forceDistributed must now be a NO-OP for it — kept as a regression
    guard that the fleet-wide override can't change this query's
    results (it never should: every dispatcher is result-identical off
    the cosine family)."""
    from sparkclif.registry import all_queries

    fn = all_queries()["i_corpus_mix"].fn
    spark.conf.set("spark.sparkclif.forceDistributed", "false")
    a = sorted(tuple(r) for r in fn(spark, "/root/testdata/sf0.001").collect())
    spark.conf.set("spark.sparkclif.forceDistributed", "true")
    try:
        b = sorted(tuple(r) for r in fn(spark, "/root/testdata/sf0.001").collect())
    finally:
        spark.conf.set("spark.sparkclif.forceDistributed", "false")
    assert a == b and a


@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from(["g", "h"]),
            st.integers(min_value=0, max_value=50).map(float),  # value
            st.integers(min_value=1, max_value=9).map(float),   # weight
        ),
        min_size=1,
        max_size=20,
    )
)
@_settings
def test_weighted_median_matches_python_model(spark, rows):
    """weighted_median_plan == the brute-force model: expand each value
    weight-many times, take the LOWER median of the expanded multiset."""
    from sparkclif.queries.group_r7 import weighted_median_plan

    df = spark.createDataFrame(
        rows, "l_returnflag string, l_extendedprice double, l_quantity double"
    )
    want = {}
    for g in {r[0] for r in rows}:
        expanded = sorted(
            v for grp, v, w in rows for _ in range(int(w)) if grp == g
        )
        # lower median: element at index ceil(n/2) - 1
        want[g] = expanded[(len(expanded) + 1) // 2 - 1]
    # BOTH dispatch paths must match the model (r9: the small path is
    # a one-exchange sorted-array fold, the large path the window
    # cumsum — the dispatcher may never change the answer)
    for force in ("array", "window"):
        got = {
            r["l_returnflag"]: r["wmedian_price"]
            for r in weighted_median_plan(df, force=force).collect()
        }
        assert got == want, force


@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=1000).map(lambda x: x / 10.0),
        min_size=1,
        max_size=12,
    )
)
@_settings
def test_zscore_matches_python_model_property(spark, vals):
    """zscore_plan == the integer power-sum model for any small value
    series (one user, trailing-20 frame covers the whole series)."""
    import datetime as _dt
    import math

    from sparkclif.queries.group_r7 import zscore_plan

    t0 = _dt.datetime(2024, 1, 1)
    rows = [
        (i, t0 + _dt.timedelta(seconds=i), 7, v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    got = {r["event_id"]: (r["z"], r["flagged"]) for r in zscore_plan(df).collect()}

    qs = [math.floor(v * 10000 + 0.5) for v in vals]
    for i in range(len(vals)):
        lo = max(0, i - 19)
        win = qs[lo : i + 1]
        n, s1, s2 = len(win), sum(win), sum(x * x for x in win)
        det = n * s2 - s1 * s1
        if det > 0:
            # population z: (n*q - s1)/sqrt(det); + 0.0 mirrors the
            # plan's -0.0 normalization (r8)
            z = (n * qs[i] - s1) / math.sqrt(det)
            assert got[i] == (round(z, 4) + 0.0, 1 if abs(z) > 2.0 else 0)
        else:
            assert got[i] == (None, 0)


@given(
    keys=st.lists(
        st.tuples(st.sampled_from(["A", "B"]), st.integers(0, 5000)),
        min_size=0,
        max_size=120,
    )
)
@_settings
def test_theta_union_matches_python_model_property(spark, keys):
    """theta_union_plan == a direct Python KMV model for any random
    multiset of (group, key) items, on BOTH dispatch paths: n_shards =
    shards touched by the distinct hash set, merged state = k smallest
    distinct hashes, estimate = exact count below k else the integer
    KMV formula. Proves the union identity and the fused/merge
    equivalence at property scale (the sf-table tests only ever see
    the fixed corpus)."""
    import hashlib

    from sparkclif.queries.group_r8 import KMV_H, KMV_K, theta_union_plan

    df = spark.createDataFrame(
        [(g, k) for g, k in keys] or [("Z", 0)],
        "l_returnflag string, l_partkey long",
    )
    model: dict[str, set[int]] = {}
    for g, k in keys or [("Z", 0)]:
        h = int(hashlib.md5(f"kmv|{k}".encode()).hexdigest()[:14], 16)
        model.setdefault(g, set()).add(h)
    for force in ("merge", "fused"):
        rows = {r["l_returnflag"]: r
                for r in theta_union_plan(df, force=force).collect()}
        assert set(rows) == set(model)
        for g, hs in model.items():
            merged = sorted(hs)[:KMV_K]
            r = rows[g]
            assert r["n_shards"] == len({h % 8 for h in hs})
            assert r["n_state"] == len(merged)
            if len(hs) >= KMV_K:
                assert r["kth_hash"] == merged[-1]
                assert r["est_distinct"] == (KMV_K - 1) * KMV_H // merged[-1]
            else:
                assert r["kth_hash"] is None
                assert r["est_distinct"] == len(hs)


@given(
    lefts=st.lists(st.integers(0, 120), min_size=1, max_size=12),
    rights=st.lists(
        st.tuples(st.integers(0, 120), st.integers(0, 5)),
        min_size=0,
        max_size=15,
    ),
)
@_settings
def test_asof_nearest_matches_pandas_merge_asof(spark, lefts, rights):
    """asof_join_nearest == pandas merge_asof(direction='nearest') on
    random single-key data — an INDEPENDENT reference implementation
    (not the SQL oracle restatement). Convention alignment verified:
    pandas resolves side ties backward, duplicate right times to the
    last sorted row backward (= our max tiebreak) and the first
    forward (= our min tiebreak), and matches equal times backward —
    provided rights are pre-sorted by (time, tiebreak)."""
    import datetime as dt

    import pandas as pd

    from sparkclif.operators.asof import asof_join_nearest

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(i, 1, ts(s)) for i, s in enumerate(lefts)],
        "lid long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts(s), v) for s, v in rights] or [(2, ts(0), 0)],
        "k long, rt timestamp, v long",
    )
    got = {
        r["lid"]: r["asof_v"]
        for r in asof_join_nearest(
            left, right, left_key="k", right_key="k", left_time="t",
            right_time="rt", payload=["v"], tiebreak="v",
        ).collect()
    }
    pl = pd.DataFrame(
        {"lid": range(len(lefts)), "t": [ts(s) for s in lefts]}
    ).sort_values(["t", "lid"])
    pr = pd.DataFrame(
        [(ts(s), v) for s, v in rights], columns=["rt", "v"]
    ).sort_values(["rt", "v"])
    if len(pr):
        m = pd.merge_asof(pl, pr, left_on="t", right_on="rt",
                          direction="nearest")
        want = {
            int(r.lid): (None if pd.isna(r.v) else int(r.v))
            for r in m.itertuples()
        }
    else:
        want = {i: None for i in range(len(lefts))}
    assert got == want


@given(
    lefts=st.lists(st.integers(0, 120), min_size=1, max_size=12),
    rights=st.lists(
        st.tuples(st.integers(0, 120), st.integers(0, 5)),
        min_size=0,
        max_size=15,
    ),
)
@_settings
def test_asof_forward_matches_pandas_merge_asof(spark, lefts, rights):
    """asof_join_forward == pandas merge_asof(direction='forward') on
    random single-key data — the independent reference implementation,
    mirroring the nearest-direction property test above. Convention
    alignment: pandas matches equal times (allow_exact_matches default
    => inclusive >=) and duplicate right times resolve to the FIRST
    sorted row (= our min tiebreak) provided rights are pre-sorted by
    (time, tiebreak)."""
    import datetime as dt

    import pandas as pd

    from sparkclif.operators.asof import asof_join_forward

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(i, 1, ts(s)) for i, s in enumerate(lefts)],
        "lid long, k long, t timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts(s), v) for s, v in rights] or [(2, ts(0), 0)],
        "k long, rt timestamp, v long",
    )
    got = {
        r["lid"]: r["asof_v"]
        for r in asof_join_forward(
            left, right, left_key="k", right_key="k", left_time="t",
            right_time="rt", payload=["v"], tiebreak="v",
        ).collect()
    }
    pl = pd.DataFrame(
        {"lid": range(len(lefts)), "t": [ts(s) for s in lefts]}
    ).sort_values(["t", "lid"])
    pr = pd.DataFrame(
        [(ts(s), v) for s, v in rights], columns=["rt", "v"]
    ).sort_values(["rt", "v"])
    if len(pr):
        m = pd.merge_asof(pl, pr, left_on="t", right_on="rt",
                          direction="forward")
        want = {
            int(r.lid): (None if pd.isna(r.v) else int(r.v))
            for r in m.itertuples()
        }
    else:
        want = {i: None for i in range(len(lefts))}
    assert got == want
