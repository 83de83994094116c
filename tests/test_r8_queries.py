"""Crafted-input tests for the round-8 fixes: the population z-score
semantics (ADVICE r7 — the flag must actually fire at >2 sigma), the
-0.0 normalization on BOTH engines (the r7 driver hash-fail class),
and the null-safe group join in d_agg_distinct's small dispatch path
(ADVICE r7 — NULL group keys must survive both paths identically).
"""

from __future__ import annotations

import datetime
import math

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
