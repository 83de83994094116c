"""Deterministic sketches (operators/sketch.py): hashlib-pinned
register/counter models, the Count-Min overestimate guarantee, and
HLL estimate accuracy at a cardinality where the raw formula is in
its calibrated range."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sparkclif.operators.sketch import (
    HLL_SUFFIX_BITS,
    bloom_filter,
    count_min,
    hll_estimate,
    hll_sketch,
)


def _items(spark, values):
    return spark.createDataFrame([(v,) for v in values], "item string")


def test_count_min_matches_hashlib_model(spark):
    vals = ["a", "b", "a", "c", "a", "b"]
    got = {
        (r["row"], r["col"]): r["cnt"]
        for r in count_min(_items(spark, vals), depth=4, width=64).collect()
    }
    want: dict[tuple[int, int], int] = {}
    for v in vals:
        for r in range(4):
            col = int(hashlib.md5(f"cms{r}|{v}".encode()).hexdigest()[24:32], 16) % 64
            want[(r, col)] = want.get((r, col), 0) + 1
    assert got == want


def test_count_min_point_estimate_never_underestimates(spark):
    vals = [f"tok{i % 37}" for i in range(500)]
    cells = {
        (r["row"], r["col"]): r["cnt"]
        for r in count_min(_items(spark, vals), depth=4, width=64).collect()
    }
    # per-row totals all equal the stream length (each occurrence
    # lands in exactly one cell per row)
    for r in range(4):
        assert sum(c for (rr, _), c in cells.items() if rr == r) == 500
    # CM guarantee: min over rows >= true count, for every key
    from collections import Counter

    true = Counter(vals)
    for v, n in true.items():
        est = min(
            cells.get(
                (r, int(hashlib.md5(f"cms{r}|{v}".encode()).hexdigest()[24:32], 16) % 64),
                0,
            )
            for r in range(4)
        )
        assert est >= n, (v, est, n)


def test_hll_registers_match_hashlib_model(spark):
    vals = [f"v{i}" for i in range(200)]
    got = {
        r["reg"]: r["max_rho"] for r in hll_sketch(_items(spark, vals)).collect()
    }
    want = {reg: 0 for reg in range(64)}
    for v in vals:
        h = hashlib.md5(f"hll|{v}".encode()).hexdigest()
        reg = int(h[0:2], 16) % 64
        suffix = int(h[2:8], 16)
        rho = (
            HLL_SUFFIX_BITS + 1
            if suffix == 0
            else HLL_SUFFIX_BITS + 1 - suffix.bit_length()
        )
        want[reg] = max(want[reg], rho)
    assert got == want


def test_hll_estimate_accuracy_in_range(spark):
    """m=64 raw HLL: relative error ~1.04/sqrt(64) = 13%; check a
    20k-cardinality stream (with duplicates) lands within 3 sigma."""
    ids = spark.range(60_000).select(
        (F.col("id") % 20_000).cast("string").alias("item")
    )
    est = hll_estimate(hll_sketch(ids)).collect()[0]["est_distinct"]
    assert abs(est - 20_000) / 20_000 < 0.39, est


def test_hll_duplicates_do_not_move_registers(spark):
    once = hll_sketch(_items(spark, [f"x{i}" for i in range(50)])).collect()
    tripled = hll_sketch(
        _items(spark, [f"x{i}" for i in range(50)] * 3)
    ).collect()
    assert sorted(map(tuple, once)) == sorted(map(tuple, tripled))


def test_bloom_matches_hashlib_model_and_membership(spark):
    vals = [f"tok{i}" for i in range(40)]
    got = {
        r["word"]: r["bits_value"]
        for r in bloom_filter(_items(spark, vals * 2), m_bits=512, k=4).collect()
    }
    want = {w: 0 for w in range(16)}
    bit_set = set()
    for v in set(vals):
        for j in range(4):
            b = int(hashlib.md5(f"bloom{j}|{v}".encode()).hexdigest()[24:32], 16) % 512
            bit_set.add(b)
    for b in bit_set:
        want[b // 32] |= 1 << (b % 32)
    assert got == want
    # no false negatives: every member's bits are all set
    for v in vals:
        for j in range(4):
            b = int(hashlib.md5(f"bloom{j}|{v}".encode()).hexdigest()[24:32], 16) % 512
            assert want[b // 32] >> (b % 32) & 1

def test_hll_weight_path_matches_plain_and_keeps_preagg(spark):
    """The weight_col (pre-aggregated vocabulary) path must produce
    bit-identical registers AND actually keep the pre-aggregation in
    the plan: a bare distinct under max() is removed by
    RemoveRedundantAggregates, silently putting the hash work back on
    the occurrence stream (optimization r13 — the encoded-long max
    exists exactly to block that)."""
    vals = [f"x{i % 23}" for i in range(300)]
    plain = hll_sketch(_items(spark, vals)).collect()
    counted = (
        _items(spark, vals)
        .groupBy("item")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    weighted_df = hll_sketch(counted, weight_col="cnt")
    assert sorted(map(tuple, plain)) == sorted(
        map(tuple, weighted_df.collect())
    )
    # two aggregations must survive optimization: the vocabulary
    # pre-agg (keyed on item) and the register max. explain lists each
    # HashAggregate node twice (tree + details).
    plan = weighted_df._sc._jvm.PythonSQLUtils.explainString(
        weighted_df._jdf.queryExecution(), "formatted"
    )
    n_hash_aggs = plan.count("HashAggregate") // 2
    assert n_hash_aggs >= 4, f"pre-aggregation collapsed:\n{plan}"
    assert "SortAggregate" not in plan, "weight path must stay hash-aggregable"


def test_hll_weight_cap_is_safe_for_huge_counts(spark):
    """Counts above 2^33-1 are capped before encoding so rho stays the
    strictly dominant term of the encoded max (a count overflowing
    into rho's bits would corrupt a register)."""
    counted = _items(spark, ["a", "b"]).withColumn(
        "cnt", F.lit((1 << 40)).cast("long")
    )
    plain = hll_sketch(_items(spark, ["a", "b"])).collect()
    weighted = hll_sketch(counted, weight_col="cnt").collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, weighted))
