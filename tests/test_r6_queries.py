"""Crafted-input tests for the round-6 growth-set queries
(sparkclif/queries/group_r6.py): each pins the semantics the fixed
synthetic corpus can't distinguish — hashlib-model split assignment,
set-state running distinct on ties, degenerate intervals, and the
moment formulas against a brute-force Python model.
"""

from __future__ import annotations

import datetime
import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F


# ---------------------------------------------------------------- split


def _model_bucket(s: str) -> int:
    """The pinned portable basis: md5 hex chars [25, 32] mod 100."""
    return int(hashlib.md5(s.encode()).hexdigest()[24:32], 16) % 100


def test_hash_split_matches_hashlib_model(spark):
    from sparkclif.operators.hashing import md5_bits

    ids = list(range(0, 500))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: r["bucket"]
        for r in df.select(
            "doc_id",
            F.pmod(md5_bits(F.col("doc_id").cast("string"), 25, 8), F.lit(100)).alias(
                "bucket"
            ),
        ).collect()
    }
    want = {i: _model_bucket(str(i)) for i in ids}
    assert got == want


def test_hash_split_is_exhaustive_and_disjoint(spark, sf_dir):
    from sparkclif.registry import all_queries

    rows = all_queries()["i_sample_hash_split"].fn(spark, sf_dir).collect()
    by_split = {r["split"]: r for r in rows}
    assert set(by_split) <= {"train", "valid", "test"}
    from sparkclif.io import parquet_row_count

    n_total = parquet_row_count(sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == n_total
    # 90/5/5 within loose tolerance at any sf
    assert by_split["train"]["n_docs"] > by_split["valid"]["n_docs"]


# ------------------------------------------------------- running distinct


def test_running_distinct_on_crafted_ties(spark):
    """Two events at the SAME timestamp break ties by event_id; the
    set state counts types, not rows."""
    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        Row(user_id=1, event_id=1, ts=t0, event_type="a"),
        Row(user_id=1, event_id=2, ts=t0, event_type="b"),
        Row(user_id=1, event_id=3, ts=t0 + datetime.timedelta(seconds=1), event_type="a"),
        Row(user_id=1, event_id=4, ts=t0 + datetime.timedelta(seconds=2), event_type="c"),
        Row(user_id=2, event_id=5, ts=t0, event_type="z"),
    ]
    df = spark.createDataFrame(rows)
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    got = {
        r["event_id"]: r["n"]
        for r in df.select(
            "event_id", F.size(F.collect_set("event_type").over(w)).alias("n")
        ).collect()
    }
    assert got == {1: 1, 2: 2, 3: 2, 4: 3, 5: 1}


# ----------------------------------------------------------- interval grid


def test_interval_grid_degenerate_and_reversed_spans(spark):
    """A same-month interval contributes exactly one grid row; a
    ship-before-order interval is normalized, not dropped."""
    o = spark.createDataFrame(
        [
            (1, 100.0, datetime.datetime(2024, 3, 15)),
            (2, 50.0, datetime.datetime(2024, 5, 1)),
        ],
        "o_orderkey long, o_totalprice double, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [
            (1, datetime.datetime(2024, 3, 20)),  # same month
            (2, datetime.datetime(2024, 4, 10)),  # ships BEFORE order month
        ],
        "l_orderkey long, l_shipdate timestamp",
    )
    from sparkclif.queries.group_r6 import interval_grid_plan

    got = {
        (r["month"].year, r["month"].month): r["n_inflight"]
        for r in interval_grid_plan(o, li).collect()
    }
    assert got == {(2024, 3): 1, (2024, 4): 1, (2024, 5): 1}


# ---------------------------------------------------------------- moments


def test_moments_match_python_model(spark):
    """Skew/kurtosis derived from exact power sums == a brute-force
    float model, on a deliberately skewed crafted group."""
    from sparkclif.queries.group_r6 import moment_power_sums

    vals = [1.0, 1.0, 1.0, 2.0, 2.0, 3.0, 10.0, 25.5]
    df = spark.createDataFrame(
        [("g", v) for v in vals], "l_returnflag string, l_quantity double"
    )
    s = moment_power_sums(df)
    n = F.col("n")
    m1 = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n
    m3 = F.col("s3").cast("double") / n
    m4 = F.col("s4").cast("double") / n
    var = m2 - m1 * m1
    skew = (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / (var * F.sqrt(var))
    kurt = (m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1) / (var * var) - 3
    row = s.select(skew.alias("sk"), kurt.alias("ku")).collect()[0]

    cents = [round(v * 100) for v in vals]
    nn = len(cents)
    mu = sum(cents) / nn
    c2 = sum((x - mu) ** 2 for x in cents) / nn
    c3 = sum((x - mu) ** 3 for x in cents) / nn
    c4 = sum((x - mu) ** 4 for x in cents) / nn
    assert row["sk"] == pytest.approx(c3 / c2**1.5, rel=1e-9)
    assert row["ku"] == pytest.approx(c4 / c2**2 - 3, rel=1e-9)
    # scale invariance: cents == raw quantity
    mu_r = sum(vals) / nn
    c2r = sum((x - mu_r) ** 2 for x in vals) / nn
    c3r = sum((x - mu_r) ** 3 for x in vals) / nn
    assert row["sk"] == pytest.approx(c3r / c2r**1.5, rel=1e-9)


def test_moments_constant_group_yields_null(spark):
    """Zero variance => skew/kurt are NULL, never an ANSI /0 error
    (the when(var > 0) guard in d_agg_moments)."""
    df = spark.createDataFrame(
        [("g", 5.0), ("g", 5.0)], "l_returnflag string, l_quantity double"
    )
    q = F.round(F.col("l_quantity") * 100).cast("long")
    s = df.select(q.alias("q")).agg(
        F.count("*").alias("n"), F.sum("q").alias("s1"), F.sum(F.col("q") * F.col("q")).alias("s2")
    )
    n = F.col("n")
    m1 = F.col("s1").cast("double") / n
    var = (F.col("s2").cast("double") / n) - m1 * m1
    guarded = F.when(var > 0, F.lit(1.0) / (var * F.sqrt(var)))
    val = s.select(guarded.alias("x")).collect()[0]["x"]
    assert val is None


# ------------------------------------------------------ bloom prefilter


def test_bloom_prefilter_no_false_negatives(spark):
    """Every key in the build side passes its own filter — the bloom
    guarantee the exact-result claim of c_join_bloom_prefilter rests
    on. Small m forces heavy saturation; still zero false negatives."""
    from sparkclif.operators.sketch import bloom_might_contain, bloom_words

    keys = spark.range(2000).select((F.col("id") * 7 + 3).alias("k"))
    words = bloom_words(keys, "k", m_bits=1024, k=3)
    missed = (
        keys.crossJoin(F.broadcast(words))
        .filter(~bloom_might_contain(F.col("k"), F.col("words"), k=3))
        .count()
    )
    assert missed == 0


def test_bloom_prefilter_filters_non_members(spark):
    """With a well-sized filter, most non-members are dropped (the
    semi-join reduction actually reduces)."""
    from sparkclif.operators.sketch import bloom_might_contain, bloom_words

    keys = spark.range(500).select(F.col("id").alias("k"))
    words = bloom_words(keys, "k", m_bits=16384, k=4)
    probe = spark.range(500, 10500).select(F.col("id").alias("k"))
    passed = (
        probe.crossJoin(F.broadcast(words))
        .filter(bloom_might_contain(F.col("k"), F.col("words"), k=4))
        .count()
    )
    # fp rate at n=500, m=16384, k=4 is ~2e-5; allow generous slack
    assert passed < 100


def test_bloom_no_false_negatives_across_integral_dtypes(spark):
    """Build on int keys, probe with bigint — the fast family
    normalizes through cast('long') by construction (ADVICE r6), so
    the dtype mismatch that used to silently drop every match now
    hashes identically. Zero false negatives required."""
    from sparkclif.operators.sketch import bloom_might_contain, bloom_words

    build = spark.range(1000).select(F.col("id").cast("int").alias("k"))
    words = bloom_words(build, "k", m_bits=16384, k=4)
    probe = spark.range(1000).select(F.col("id").alias("k"))  # bigint
    missed = (
        probe.crossJoin(F.broadcast(words))
        .filter(~bloom_might_contain(F.col("k"), F.col("words"), k=4))
        .count()
    )
    assert missed == 0


def test_bloom_prefilter_paths_result_identical(spark, sf_dir):
    """The cost dispatch's exactness claim: force='bloom' and
    force='plain' produce identical grouped results (the bloom admits
    false positives only; the exact join removes them)."""
    from sparkclif.io import table
    from sparkclif.queries.group_r6 import bloom_prefilter_plan

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    plain = {
        r["l_returnflag"]: (r["n_lines"], r["revenue"])
        for r in bloom_prefilter_plan(o, li, force="plain").collect()
    }
    bloom = {
        r["l_returnflag"]: (r["n_lines"], r["revenue"])
        for r in bloom_prefilter_plan(o, li, force="bloom").collect()
    }
    assert plain == bloom


def test_bloom_prefilter_dispatch_skips_bloom_below_bound(spark, sf_dir):
    """At test scale the post-filter dim is well under
    BLOOM_DIM_PLAIN_BYTES, so the dispatcher must take the plain
    broadcast path — no bloom build stage in the plan (VERDICT r6
    item 1: the detour was pure premium below the broadcast bound)."""
    from sparkclif.io import table
    from sparkclif.queries.group_r6 import bloom_prefilter_plan

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    auto = bloom_prefilter_plan(o, li)
    plan = auto._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" not in plan
    forced = bloom_prefilter_plan(o, li, force="bloom")
    fplan = forced._jdf.queryExecution().executedPlan().toString()
    assert "xxhash64" in fplan


# ---------------------------------------------------------- hash features


def test_hash_features_buckets_cover_and_sum(spark, sf_dir):
    from sparkclif.registry import all_queries

    rows = all_queries()["i_text_hash_features"].fn(spark, sf_dir).collect()
    assert all(0 <= r["bucket"] < 64 for r in rows)
    # total token mass equals the tokenize query's total
    from sparkclif.io import table
    from sparkclif.operators.text import tokens

    docs = table(spark, sf_dir, "documents")
    n_toks = docs.select(
        F.sum(F.size(tokens(F.coalesce(F.col("text"), F.lit(""))))).alias("n")
    ).collect()[0]["n"]
    assert sum(r["n_tokens"] for r in rows) == n_toks
    assert all(r["n_distinct_tokens"] <= r["n_tokens"] for r in rows)


def test_moment_bases_are_result_identical(spark, sf_dir):
    """The long and decimal accumulator bases must produce identical
    power sums (both exact; the dispatch is speed-only)."""
    from sparkclif.io import table
    from sparkclif.queries.group_r6 import moment_power_sums

    li = table(spark, sf_dir, "lineitem")
    a = {tuple(r) for r in moment_power_sums(li, force="long").collect()}
    b = {tuple(r) for r in moment_power_sums(li, force="decimal").collect()}
    assert a == b
