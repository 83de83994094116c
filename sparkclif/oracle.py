"""Local differential-oracle harness — mimics the driver's check
(SURVEY.md §5.2 layer 1) so parity failures surface before the driver
runs: row-count + column-name set + order-insensitive value comparison
between a Spark query and its DuckDB oracle SQL.
"""

from __future__ import annotations

import datetime as _dt
import math
from typing import Any

import duckdb
import numpy as np
import pandas as pd

from sparkclif.io import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _norm_cell(v: Any) -> Any:
    """Canonicalize a cell, PRESERVING type class.

    The driver's value-hash stringifies cells, so int64 2758 and float64
    2758.0 hash differently (this caught g_date_funcs/g_math_funcs in
    round 1 while a Python ``==`` compare passed them). Tag each cell
    with its broad type class so the local sim is at least as strict.
    """
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        if math.isnan(v):
            return None
        # Final guard: parity rounding already happened query-side.
        # Compare the repr STRING, not the float: the driver's hash
        # stringifies cells, so -0.0 and 0.0 hash differently there
        # while Python == calls them equal (this let e_win_zscore pass
        # locally and fail the round-7 driver check). repr of equal
        # floats is identical; repr(-0.0) == '-0.0' keeps the sign.
        return ("f", repr(round(float(v), 4)))
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        # Keep tzinfo: the driver's hash stringifies cells, so a
        # tz-aware DuckDB TIMESTAMPTZ ('... +00:00') differs from a
        # naive Spark timestamp even when the instant is identical
        # (this caught h_sliding in round 2).
        ts = v.to_pydatetime() if isinstance(v, pd.Timestamp) else v
        return ("t", str(ts))
    if isinstance(v, _dt.date):
        return ("d", str(v))
    if isinstance(v, (list, tuple, np.ndarray)):
        return ("a", tuple(_norm_cell(x) for x in v))
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    return ("s", str(v))


def canonical_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = []
    for row in df[cols].itertuples(index=False, name=None):
        out.append(tuple(_norm_cell(v) for v in row))
    out.sort(key=lambda r: tuple((x is None, str(x)) for x in r))
    return out


def _dtype_class(dtype) -> str:
    """Broad dtype class for the schema check. Distinguishes tz-aware
    from naive datetimes — the driver's schema compare does."""
    if isinstance(dtype, pd.DatetimeTZDtype):
        return "datetime-tz"
    kind = getattr(dtype, "kind", "O")
    return {
        "b": "bool",
        "i": "int",
        "u": "int",
        "f": "float",
        "M": "datetime",
        "m": "timedelta",
    }.get(kind, "object")


def compare(spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == parity)."""
    problems: list[str] = []
    spark_pdf = spark_df.toPandas()
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(
            f"columns differ: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}"
        )
        return problems
    for c in sorted(spark_pdf.columns):
        sc, oc = _dtype_class(spark_pdf[c].dtype), _dtype_class(oracle_pdf[c].dtype)
        # object covers strings/arrays/decimals where pandas loses the
        # real type; the value compare still catches class drift there.
        if sc != oc and "object" not in (sc, oc):
            problems.append(f"dtype class differs on {c!r}: spark={sc} oracle={oc}")
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"row count differs: spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    a, b = canonical_rows(spark_pdf), canonical_rows(oracle_pdf)
    if a != b:
        # Counter (multiset) difference, sets hoisted ONCE: a plain
        # set diff rebuilt per element was O(n*m) — a failing 100k-row
        # parity looked hung for minutes before reporting — and lost
        # multiplicity, so a duplicate-count-only mismatch (join
        # fan-out, dropped dedup) printed two EMPTY example lists.
        from collections import Counter

        ca, cb = Counter(a), Counter(b)
        diff_a = list((ca - cb).keys())[:3]
        diff_b = list((cb - ca).keys())[:3]
        problems.append(f"values differ; spark-only={diff_a} oracle-only={diff_b}")
    return problems
