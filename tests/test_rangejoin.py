"""Bucketized range join (operators/rangejoin.py): exactness against
a brute-force pair count (including window-edge timestamps, which sit
exactly one bucket apart) and the no-theta-join plan guarantee."""

from __future__ import annotations

from itertools import combinations

from sparkclif.operators.rangejoin import self_range_neighbors

W = 100  # window, in the same units as t


def _brute(rows):
    n = {i: 0 for i, _, _ in rows}
    for (ia, ka, ta), (ib, kb, tb) in combinations(rows, 2):
        if ka == kb and abs(ta - tb) <= W:
            n[ia] += 1
            n[ib] += 1
    return n


def test_range_join_matches_brute_force_with_edges(spark):
    rows = [
        (0, 1, 0),
        (1, 1, 100),  # exactly W from id 0 -> inclusive edge pair
        (2, 1, 101),  # 101 from id 0 (out), 1 from id 1 (in)
        (3, 1, 250),
        (4, 2, 100),  # other key: never pairs with key 1
        (5, 2, 301),
        (6, 2, 99),  # dt=1 with id 4; dt=202 with id 5 (out)
        (7, 3, 50),  # alone on its key -> zero, row must survive
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, t long")
    out = self_range_neighbors(
        df, key_col="user_id", time_us_col="t", id_col="event_id", window_us=W
    )
    got = {r["event_id"]: r["n_near"] for r in out.collect()}
    assert got == _brute(rows)


def test_range_join_pairs_counted_exactly_once(spark):
    # two rows in the SAME bucket and also within W: the 3-replica
    # explode must not double-count them
    rows = [(0, 1, 10), (1, 1, 20)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, t long")
    out = self_range_neighbors(
        df, key_col="user_id", time_us_col="t", id_col="event_id", window_us=W
    )
    assert {r["event_id"]: r["n_near"] for r in out.collect()} == {0: 1, 1: 1}


def test_range_join_plan_has_no_nested_loop(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", F.monotonically_increasing_id().alias("t"))
    )
    out = self_range_neighbors(
        ev, key_col="user_id", time_us_col="t", id_col="event_id", window_us=1000
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_randomized_against_model(spark):
    """One seeded random dataset (clustered timestamps so windows
    genuinely overlap) checked row-for-row against the brute-force
    model — catches bucket-boundary arithmetic errors no handpicked
    case covers."""
    import random

    rng = random.Random(0xC1F)
    rows = [
        (i, rng.randrange(5), rng.randrange(0, 1000))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, t long")
    out = self_range_neighbors(
        df, key_col="user_id", time_us_col="t", id_col="event_id", window_us=W
    )
    got = {r["event_id"]: r["n_near"] for r in out.collect()}
    assert got == _brute(rows)
