"""exact_percentiles: the window, bracket, and distributed
formulations must agree exactly (the dispatch threshold must never
change results), and all must match DuckDB quantile_cont."""

from __future__ import annotations

import duckdb

from sparkclif.io import table
from sparkclif.operators.rank import exact_percentiles

SPECS = [
    ("l_extendedprice", 0.5, "p50_price"),
    ("l_extendedprice", 0.95, "p95_price"),
    ("l_discount", 0.5, "med_discount"),
]


def test_window_and_distributed_paths_agree(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount"
    )
    a = sorted(map(tuple, exact_percentiles(li, "l_returnflag", SPECS, force="window").collect()))
    b = sorted(map(tuple, exact_percentiles(li, "l_returnflag", SPECS, force="distributed").collect()))
    c = sorted(map(tuple, exact_percentiles(li, "l_returnflag", SPECS, force="bracket").collect()))
    d = sorted(map(tuple, exact_percentiles(li, "l_returnflag", SPECS, force="kernel").collect()))
    e = sorted(map(tuple, exact_percentiles(li, "l_returnflag", SPECS, force="array").collect()))
    assert a == b
    assert a == c
    assert a == d
    assert a == e


def test_bracket_path_tiny_sample_falls_back(spark, sf_dir):
    """Groups whose sample is below the minimum get a full-range
    bracket (still exact); a degenerate overall sample falls back to
    the window path. Exercised by sampling at a fraction that leaves
    every group under the 1000-row minimum."""
    from sparkclif.operators.rank import _bracket_percentiles

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount"
    )
    a = sorted(map(tuple, exact_percentiles(li, "l_returnflag", SPECS, force="window").collect()))
    c = sorted(
        map(
            tuple,
            _bracket_percentiles(li, "l_returnflag", SPECS, 4, fraction=0.001).collect(),
        )
    )
    assert a == c


def test_all_paths_agree_on_pathological_shapes(spark):
    """Selection algorithms break on ties, constant columns, and
    tiny/singleton groups — pin every path to DuckDB quantile_cont on
    exactly those shapes."""
    import duckdb

    rows = (
        # g0: constant column (every quantile = the constant)
        [("g0", 7.0)] * 50
        # g1: singleton group (pos interpolation degenerate)
        + [("g1", 3.5)]
        # g2: two rows (every quantile interpolates the same pair)
        + [("g2", 1.0), ("g2", 2.0)]
        # g3: heavy ties around the median
        + [("g3", float(v)) for v in ([1] * 40 + [2] * 40 + [3] * 20)]
        # g4: huge dynamic range
        + [("g4", float(10**i)) for i in range(-3, 9)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    specs = [("v", 0.5, "p50"), ("v", 0.95, "p95"), ("v", 0.01, "p01")]
    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame(rows, columns=["g", "v"]))
    want = sorted(
        map(
            tuple,
            con.sql(
                "SELECT g, round(quantile_cont(v, 0.5), 4), "
                "round(quantile_cont(v, 0.95), 4), "
                "round(quantile_cont(v, 0.01), 4) FROM t GROUP BY g"
            ).fetchall(),
        )
    )
    for force in ("array", "kernel", "window", "bracket", "distributed"):
        got = sorted(
            map(tuple, exact_percentiles(df, "g", specs, force=force).collect())
        )
        assert got == want, f"path {force} diverged"


def test_distributed_path_matches_duckdb(spark, sf_dir):
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount"
    )
    got = sorted(
        map(tuple, exact_percentiles(li, "l_returnflag", SPECS, force="distributed").collect())
    )
    want = sorted(
        map(
            tuple,
            duckdb.sql(
                f"""
                SELECT l_returnflag,
                       round(quantile_cont(l_extendedprice, 0.5), 4),
                       round(quantile_cont(l_extendedprice, 0.95), 4),
                       round(median(l_discount), 4)
                FROM '{sf_dir}/lineitem.parquet'
                GROUP BY l_returnflag
                """
            ).fetchall(),
        )
    )
    assert got == want
