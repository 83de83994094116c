"""Null / tie semantics regressions (round-3 review findings): every
percentile path must agree with quantile_cont's null-dropping, the
as-of join must never match NULL right times, last-wins upserts must
keep whole rows (no per-column NaN stitching), and similarity top-k
must break k-boundary ties by neighbor id."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F


def test_percentile_paths_drop_nulls_consistently(spark):
    from sparkclif.operators.rank import exact_percentiles

    rows = [("a", None), ("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", None), ("b", 10.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    specs = [("v", 0.5, "p50")]
    want = {"a": 2.0, "b": 10.0}  # quantile_cont ignores NULLs
    for path in ("array", "kernel", "window", "bracket", "distributed"):
        got = {
            r["g"]: r["p50"]
            for r in exact_percentiles(df, "g", specs, force=path).collect()
        }
        assert got == want, f"path={path}: {got}"


def test_asof_ignores_null_right_time_and_null_tiebreak_loses(spark):
    from sparkclif.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100), (1, 200)], "k long, t long")
    right = spark.createDataFrame(
        [
            (1, None, 9, "null-time"),   # must never match
            (1, 150, 1, "early"),
            (1, 150, None, "null-tb"),   # ties at t=150: loses to tb=1
        ],
        "k long, t long, tb long, tag string",
    )
    out = {
        r["t"]: r["asof_tag"]
        for r in asof_join(
            left, right, left_key="k", right_key="k",
            left_time="t", right_time="t", payload=["tag"], tiebreak="tb",
        ).collect()
    }
    assert out[100] is None, "left row before any real right must get NULL"
    assert out[200] == "early", "max non-null tiebreak must beat NULL tiebreak"


def test_cosine_topk_tie_boundary_prefers_low_ids(spark):
    from sparkclif.operators.similarity import cosine_topk

    base = [1.0] + [0.0] * 7
    # ids 2..5 are identical vectors (cosine 1.0 with each other);
    # id 1 is orthogonal. For any query among 2..5, the 3 neighbors
    # tied at 1.0 are 3 of the other dups — the set must be the
    # LOWEST ids, not whatever argpartition kept.
    rows = [(1, [0.0] * 7 + [1.0])] + [(i, base) for i in range(2, 6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        q: sorted(r for (qq, r) in pairs)
        for q, pairs in __group(
            (r["vec_id"], r["neighbor_id"])
            for r in cosine_topk(df, k=3).collect()
        ).items()
    }
    assert got[5] == [2, 3, 4]
    assert got[2] == [3, 4, 5]


def __group(pairs):
    out = {}
    for q, n in pairs:
        out.setdefault(q, []).append((q, n))
    return out


def test_stream_upsert_keeps_whole_rows(spark, tmp_path):
    """Newest event with a NULL value must yield (new ts, NULL value),
    not a chimera of the new ts and the OLD value."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkclif.streaming.upsert import stream_upsert_events

    src = str(tmp_path / "chimera_src")
    os.makedirs(src)
    base = 1_700_000_000_000_000
    chunks = [
        [(1, base, 7, "click", 5.0)],
        [(2, base + 1_000_000, 7, "click", None)],  # newer, NULL value
    ]
    for i, rows in enumerate(chunks):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[2] for r in rows], pa.int64()),
                "event_type": pa.array([r[3] for r in rows], pa.string()),
                "value": pa.array([r[4] for r in rows], pa.float64()),
            }
        )
        path = f"{src}/chunk-{i:04d}.parquet"
        pq.write_table(tbl, path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    state = stream_upsert_events(spark, src, schema, watermark="1 hour")
    row = state[(state["user_id"] == 7)].iloc[0]
    assert int(row["event_id"]) == 2
    assert np.isnan(row["value"]) or row["value"] is None


def test_distributed_percentiles_keep_all_null_groups(spark):
    """Round-4 fix (ADVICE r3): a group whose values are ALL NULL must
    survive every dispatch path with a NULL percentile — the
    distributed path used to drop it at the isNotNull filter. Also
    covers the mixed case: all-NULL in ONE value column but not the
    other must NULL only that column."""
    from sparkclif.operators.rank import exact_percentiles

    rows = [
        ("a", 1.0, 10.0),
        ("a", 3.0, 20.0),
        ("allnull", None, 30.0),  # v all-NULL, u has values
        ("allnull", None, 40.0),
        ("bothnull", None, None),
    ]
    df = spark.createDataFrame(rows, "g string, v double, u double")
    specs = [("v", 0.5, "p50_v"), ("u", 0.5, "p50_u")]
    want = {
        "a": (2.0, 15.0),
        "allnull": (None, 35.0),
        "bothnull": (None, None),
    }
    for path in ("array", "kernel", "window", "bracket", "distributed"):
        got = {
            r["g"]: (r["p50_v"], r["p50_u"])
            for r in exact_percentiles(df, "g", specs, force=path).collect()
        }
        assert got == want, f"path={path}: {got}"


def test_asof_equal_time_right_applies_only_if_seq_strictly_smaller(spark):
    """Round-4 fix (ADVICE r3): with log-order sequences, an
    equal-time right row applies only when its sequence PRECEDES the
    left's — sequential replay of an event log. A right at the same
    (time, seq>=left_seq) must not be visible."""
    from sparkclif.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, 5), (1, 100, 2), (1, 200, 9)], "k long, t long, seq long"
    )
    right = spark.createDataFrame(
        [
            (1, 100, 2, "seq2"),  # visible to left seq>2 only
            (1, 100, 5, "seq5"),  # equal to left seq=5: NOT visible to it
            (1, 150, 7, "mid"),
        ],
        "k long, t long, seq long, tag string",
    )
    out = {
        (r["t"], r["seq"]): r["asof_tag"]
        for r in asof_join(
            left, right, left_key="k", right_key="k",
            left_time="t", right_time="t", payload=["tag"], tiebreak="seq",
            left_seq="seq", right_seq="seq",
        ).collect()
    }
    assert out[(100, 2)] is None, "right at same (t, seq) must not apply"
    assert out[(100, 5)] == "seq2", "only the strictly-preceding right applies"
    assert out[(200, 9)] == "mid"


def test_grouped_rank_paths_agree_on_null_and_bool_keys(spark):
    """The distributed path's offset-map probe must agree with the
    window path for NULL and boolean group keys (a bare concat_ws
    SKIPPED the NULL key and Python str(True) != Spark cast 'true' —
    every rank of such groups came back NULL on one path only)."""
    from pyspark.sql import functions as F

    from sparkclif.operators.sampling import grouped_rank

    df = spark.createDataFrame(
        [(None, 1), (None, 2), (True, 3), (True, 4), (False, 5)],
        "g boolean, o long",
    )
    win = {(r["g"], r["o"]): r["rk"]
           for r in grouped_rank(df, "g", "o", "rk", force="window").collect()}
    dist = {(r["g"], r["o"]): r["rk"]
            for r in grouped_rank(df, "g", "o", "rk", force="distributed").collect()}
    assert win == dist
    assert None not in win.values()


def test_pps_fractional_weights_not_flattened(spark):
    """Sub-unit weights are legitimate PPS weights: only NULL/zero/
    negative clamp to 1 (the old greatest(w,1) silently made every
    w in (0,1) uniform)."""
    from sparkclif.operators.sampling import pps_sample_topk

    df = spark.createDataFrame(
        [(1, 0.5), (2, 0.5), (3, None), (4, -2.0)],
        "k long, w double",
    )
    out = {r["k"]: r["priority"]
           for r in pps_sample_topk(df, "k", "w", k=4).collect()}
    # fractional weight doubles the priority vs the clamped-to-1 rows'
    # u; recompute u per key to assert the exact division
    import hashlib

    for k in (1, 2):
        u = int(hashlib.md5(f"pps|{k}".encode()).hexdigest()[17:24], 16) + 1
        assert out[k] == round(u / 0.5, 4)
    for k in (3, 4):
        u = int(hashlib.md5(f"pps|{k}".encode()).hexdigest()[17:24], 16) + 1
        assert out[k] == round(u / 1.0, 4)


def test_percentile_paths_agree_on_nan_values(spark):
    """NaN values normalize to NULL before dispatch, so every path
    returns the same quantile (Spark ordering previously kept NaN as
    the LARGEST value on the JVM paths while the Arrow kernel's
    dropna discarded it)."""
    from sparkclif.operators.rank import exact_percentiles

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", float("nan")), ("a", 3.0)],
        "g string, v double",
    )
    specs = [("v", 0.5, "p50")]
    got = {
        f: exact_percentiles(df, "g", specs, force=f).collect()[0]["p50"]
        for f in ("array", "kernel", "window", "bracket", "distributed")
    }
    assert set(got.values()) == {2.0}, got


def test_bracket_percentiles_all_null_group_yields_null(spark):
    """A group whose value column is entirely NULL gets a NULL
    quantile on the bracket path (previously its impossible bracket
    check silently re-ran the whole input through the single-task
    window path)."""
    from sparkclif.operators.rank import exact_percentiles

    rows = [("a", float(i)) for i in range(2000)] + [("b", None)] * 50
    df = spark.createDataFrame(rows, "g string, v double")
    out = {r["g"]: r["p50"] for r in
           exact_percentiles(df, "g", [("v", 0.5, "p50")],
                             force="bracket").collect()}
    assert out["b"] is None and out["a"] == 999.5


def test_sketch_parameter_validation():
    """Degenerate sketch parameters raise instead of silently
    corrupting: HLL p outside [4,8] (register index only has 8 digest
    bits), bloom m_bits not a multiple of 32 (ragged tail word would
    be dropped => false negatives)."""
    import pytest

    from sparkclif.operators.sketch import _hll_check_p

    assert _hll_check_p(6) == 64
    with pytest.raises(ValueError, match="p must be"):
        _hll_check_p(9)
    with pytest.raises(ValueError, match="p must be"):
        _hll_check_p(3)


def test_bloom_m_bits_must_be_word_aligned(spark):
    import pytest

    from sparkclif.operators.sketch import bloom_filter

    df = spark.createDataFrame([("x",)], "item string")
    with pytest.raises(ValueError, match="multiple of 32"):
        bloom_filter(df, m_bits=500)
