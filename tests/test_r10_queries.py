"""Crafted/model tests for the round-10 growth surface:
c_join_asof_forward (operators/asof.asof_join_forward),
i_embed_normalize (queries/group_r10.embed_normalize_plan) and
h_stream_dedup_store (streaming/dedup.stream_dedup_against_store).
Driver-style oracle parity for the registered queries lives in
tests/test_oracle_parity.py; these tests pin the SEMANTICS on inputs
the testbed cannot produce (NULLs, ties, tolerance bounds, all-batch
dup layouts)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sparkclif.operators.asof import asof_join_forward

TS = "2024-01-01 12:00:00"


def _ts(s):
    return f"2024-01-01 {s}"


@pytest.fixture()
def fwd_frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, _ts("12:00:00")),   # equal-time right applies (inclusive)
            (2, 10, _ts("12:30:00")),   # strictly-later right
            (3, 10, _ts("23:00:00")),   # nothing later -> no match
            (4, 99, _ts("12:00:00")),   # key with no rights
            (5, None, _ts("12:00:00")),  # NULL key never equi-matches
            (6, 10, None),              # NULL left time -> no match
        ],
        "event_id long, user_id long, ts string",
    ).select("event_id", "user_id", F.col("ts").cast("timestamp").alias("ts"))
    right = spark.createDataFrame(
        [
            (100, 10, _ts("12:00:00"), 1.0),   # equal-time, tie on time with 101
            (101, 10, _ts("12:00:00"), 2.0),   # tie -> MIN orderkey (100) wins
            (102, 10, _ts("13:00:00"), 3.0),
            (103, None, _ts("14:00:00"), 4.0),  # NULL key excluded
            (104, 10, None, 5.0),               # NULL time excluded
        ],
        "o_orderkey long, o_custkey long, o_orderdate string, o_totalprice double",
    ).select(
        "o_orderkey",
        "o_custkey",
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        "o_totalprice",
    )
    return left, right


def _fwd(left, right, **kw):
    return {
        r["event_id"]: r
        for r in asof_join_forward(
            left,
            right,
            left_key="user_id",
            right_key="o_custkey",
            left_time="ts",
            right_time="o_orderdate",
            payload=["o_orderkey", "o_totalprice"],
            tiebreak="o_orderkey",
            prefix="f_",
            **kw,
        ).collect()
    }


def test_asof_forward_inclusive_min_tiebreak_and_null_hygiene(fwd_frames):
    left, right = fwd_frames
    got = _fwd(left, right)
    assert len(got) == 6                      # every left row survives
    # inclusive >=: the equal-time right matches; tie at 12:00 -> MIN
    # orderkey (the backward variant's max-tiebreak mirror)
    assert got[1]["f_o_orderkey"] == 100
    # earliest at-or-after 12:30 is the 13:00 row
    assert got[2]["f_o_orderkey"] == 102
    # no later right / no rights for key / NULL key / NULL left time
    for eid in (3, 4, 5, 6):
        assert got[eid]["f_o_orderkey"] is None, eid
        assert got[eid]["f_o_totalprice"] is None, eid


def test_asof_forward_tolerance_bounds_lookahead(fwd_frames):
    left, right = fwd_frames
    got = _fwd(left, right, tolerance="10 MINUTES")
    # equal-time match has distance 0: always within tolerance
    assert got[1]["f_o_orderkey"] == 100
    # 12:30 -> 13:00 is 30 min ahead: beyond the 10-min bound
    assert got[2]["f_o_orderkey"] is None
    got_wide = _fwd(left, right, tolerance="45 MINUTES")
    assert got_wide[2]["f_o_orderkey"] == 102


def test_asof_forward_matches_backward_on_reversed_time(spark):
    """Direction duality: forward over t equals backward over -t with
    the tiebreak sign flipped (min becomes max) — a property the two
    window orderings must satisfy by construction. Random-ish crafted
    data, exact row-by-row equality."""
    from sparkclif.operators.asof import asof_join

    lrows = [(i, i % 5, ((i * 37) % 100)) for i in range(60)]
    rrows = [(1000 + j, j % 5, ((j * 53) % 100)) for j in range(40)]
    left = spark.createDataFrame(lrows, "event_id long, k long, t long")
    right = spark.createDataFrame(rrows, "rid long, k long, t long")
    fwd = asof_join_forward(
        left, right, left_key="k", right_key="k", left_time="t",
        right_time="t", payload=["rid"], tiebreak="rid", prefix="x_",
    )
    left_r = left.select("event_id", "k", (-F.col("t")).alias("t"))
    right_r = right.select(
        (-F.col("rid")).alias("rid"), "k", (-F.col("t")).alias("t")
    )
    bwd = asof_join(
        left_r, right_r, left_key="k", right_key="k", left_time="t",
        right_time="t", payload=["rid"], tiebreak="rid", prefix="x_",
    )
    f = {r["event_id"]: r["x_rid"] for r in fwd.collect()}
    b = {r["event_id"]: (-r["x_rid"] if r["x_rid"] is not None else None)
         for r in bwd.collect()}
    assert f == b


def test_embed_normalize_matches_numpy_model(spark):
    """embed_normalize_plan against a straight numpy restatement of the
    integer-basis moments: exact columns equal exactly, z0 equal as
    IEEE doubles (both sides compute (n*q0 - s1) / sqrt(n*s2 - s1^2)
    from exact integers)."""
    import numpy as np

    from sparkclif.queries.group_r10 import embed_normalize_plan

    rng = [
        [round(math.sin(i * 7 + j) * 0.3, 6) for j in range(4)]
        for i in range(9)
    ]
    rng.append([0.5, 0.5, 0.5, 0.5])
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng)],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r for r in embed_normalize_plan(emb).collect()}

    q = np.floor(np.array(rng, dtype=np.float64).astype(np.float32).astype(np.float64) * 10000).astype(np.int64)
    n = q.shape[0]
    s1 = q.sum(axis=0)
    s2 = (q * q).sum(axis=0)
    c = n * q - s1
    det0 = n * s2[0] - s1[0] * s1[0]
    for i in range(len(rng)):
        r = got[i]
        assert r["n_dims"] == 4
        assert r["c_abs_sum"] == int(np.abs(c[i]).sum())
        assert r["n_pos"] == int((c[i] > 0).sum())
        if det0 > 0:
            assert r["z0"] == float(c[i][0]) / math.sqrt(float(det0))


def test_embed_normalize_constant_dim_yields_null_z0(spark):
    """A constant dimension has det = 0: z0 must be NULL, never a
    division by zero or an inf leaking into the hash."""
    from sparkclif.queries.group_r10 import embed_normalize_plan

    emb = spark.createDataFrame(
        [(0, [0.5, 0.1]), (1, [0.5, 0.2]), (2, [0.5, 0.3])],
        "vec_id long, embedding array<float>",
    )
    rows = embed_normalize_plan(emb).collect()
    assert all(r["z0"] is None for r in rows)
    # centered values on the constant dim are 0 on every row
    assert all(r["n_pos"] <= 1 for r in rows)


def test_embed_normalize_ragged_and_null_vectors_match_oracle_semantics(spark):
    """Round-10 review: the oracle unnests WHERE d.i < len(v) — a
    NULL/empty vector is ABSENT from the output, a shorter vector
    folds over its own dims only, and a NULL element is skipped by
    SQL's sum/CASE. The Spark plan must state the same rules (the
    original zip_with NULL-padded against the corpus-width moment
    array and poisoned the folds)."""
    from sparkclif.queries.group_r10 import embed_normalize_plan

    emb = spark.createDataFrame(
        [
            (0, [0.5, 0.2, 0.1]),
            (1, [0.3, 0.4, 0.2]),
            (2, [0.1, 0.6]),          # shorter: folds over 2 dims
            (3, None),                # NULL vector: absent from output
            (4, []),                  # empty vector: absent from output
            (5, [0.2, None, 0.3]),    # NULL element: skipped, not poison
        ],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r for r in embed_normalize_plan(emb).collect()}
    assert set(got) == {0, 1, 2, 5}
    assert got[2]["n_dims"] == 2
    assert got[2]["c_abs_sum"] is not None and got[2]["n_pos"] is not None
    # NULL element counts toward n_dims (the oracle's count(*) does)
    # but contributes nothing to the folds
    assert got[5]["n_dims"] == 3
    assert got[5]["c_abs_sum"] is not None
    # dim 0 is present on every surviving row, so z0 is computable
    # wherever the corpus dim-0 variance is positive
    assert got[0]["z0"] is not None


def test_stream_dedup_store_survives_empty_micro_batch(spark, tmp_path):
    """Round-10 review: an empty source chunk commits no part files;
    the store-delta read-back must skip it rather than raise
    UNABLE_TO_INFER_SCHEMA inside foreachBatch and kill the stream."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkclif.operators.dedup import fingerprint_sha256
    from sparkclif.streaming.dedup import stream_dedup_against_store

    src = str(tmp_path / "src")
    store_dir = str(tmp_path / "store")
    os.makedirs(src)
    batches = [
        [(0, "alpha")],
        [],                      # empty micro-batch mid-stream
        [(3, "alpha"), (6, "beta")],
    ]
    for i, rows in enumerate(batches):
        p = f"{src}/chunk-{i:04d}.parquet"
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            ),
            p,
        )
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    spark.createDataFrame([("seed",)], "text string").select(
        fingerprint_sha256("text").alias("content_hash")
    ).write.mode("overwrite").parquet(store_dir)

    out = stream_dedup_against_store(
        spark, src, "doc_id long, text string", store_dir
    )
    got = {r["doc_id"]: r["status"] for r in out.collect()}
    assert got == {0: "kept", 3: "dup_store", 6: "kept"}


def test_stream_dedup_store_statuses_across_batches(spark, tmp_path):
    """Crafted 3-micro-batch ingest against a seeded store, every
    status class exercised:
    - hash in the initial store -> dup_store in ANY batch;
    - hash first kept in batch 0 -> dup_store when it reappears in
      batch 1/2 (the store delta worked);
    - two copies inside ONE batch -> lower id kept, higher dup_batch;
    - fresh hash -> kept."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkclif.operators.dedup import fingerprint_sha256
    from sparkclif.streaming.dedup import stream_dedup_against_store

    src = str(tmp_path / "src")
    store_dir = str(tmp_path / "store")
    os.makedirs(src)
    batches = [
        # batch 0: seeded dup, within-batch pair, fresh
        [(0, "in store"), (3, "pair text"), (6, "pair text"), (9, "fresh zero")],
        # batch 1: reappearance of batch-0 kept hash, fresh
        [(12, "pair text"), (15, "fresh one")],
        # batch 2: reappearance of batch-1 kept hash, seeded dup again
        [(18, "fresh one"), (21, "in store")],
    ]
    for i, rows in enumerate(batches):
        p = f"{src}/chunk-{i:04d}.parquet"
        pq.write_table(
            pa.table(
                {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
            ),
            p,
        )
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
    spark.createDataFrame([("in store",)], "text string").select(
        fingerprint_sha256("text").alias("content_hash")
    ).write.mode("overwrite").parquet(store_dir)

    out = stream_dedup_against_store(
        spark, src, "doc_id long, text string", store_dir
    )
    got = {r["doc_id"]: r["status"] for r in out.collect()}
    assert got == {
        0: "dup_store",
        3: "kept",
        6: "dup_batch",
        9: "kept",
        12: "dup_store",   # batch 0 kept 'pair text' into the store
        15: "kept",
        18: "dup_store",   # batch 1 kept 'fresh one' into the store
        21: "dup_store",
    }
    # the store now holds exactly: seed + the 3 kept rows' hashes
    n_store = spark.read.parquet(store_dir).distinct().count()
    assert n_store == 4


def test_registrable_domain_psl_longest_match_and_fallback(spark):
    """registrable_domain_psl against a straight Python model of PSL
    longest-suffix-match semantics — including the cases ADVICE r9
    flagged the heuristic collapses (example.com.au, example.or.jp,
    example.net.nz), bare-suffix hosts, unlisted-TLD fallback and
    single-label hosts."""
    from sparkclif.operators.dedup import (
        DEFAULT_MULTI_SUFFIXES,
        registrable_domain_psl,
    )

    hosts = [
        "www.example.co.uk",       # 2-label suffix + subdomain
        "example.com.au",          # heuristic collapsed this to com.au
        "a.b.example.or.jp",
        "cdn1.example.net.nz",
        "deep.sub.x.pvt.k12.ma.us",  # 4-label suffix
        "com.au",                  # host IS a bare public suffix
        "example.com",             # unlisted TLD -> last-two fallback
        "www.example.com",
        "localhost",               # single label: unchanged
        "example.io",
    ]
    sfx = set(DEFAULT_MULTI_SUFFIXES)

    def model(h):
        labels = h.split(".")
        best = None
        for k in range(1, min(len(labels), 4) + 1):
            cand = ".".join(labels[-k:])
            if cand in sfx:
                best = k
        if best is not None:
            if len(labels) > best:
                return ".".join(labels[-(best + 1):])
            return h
        if len(labels) < 2:
            return h
        return ".".join(labels[-2:])

    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = {
        r["host"]: r["domain"]
        for r in registrable_domain_psl(df, "host").collect()
    }
    for h in hosts:
        assert got[h] == model(h), (h, got[h], model(h))
    assert got["example.com.au"] == "example.com.au"
    assert got["www.example.co.uk"] == "example.co.uk"
    assert got["com.au"] == "com.au"


def test_stream_dedup_store_state_outlives_the_query(spark, tmp_path):
    """The design claim behind h_stream_dedup_store: the fingerprint
    store is a parquet table that OUTLIVES the streaming query — a
    second, later stream run against the same store must see the first
    run's kept hashes as dup_store (the recurring-crawl refresh)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkclif.operators.dedup import fingerprint_sha256
    from sparkclif.streaming.dedup import stream_dedup_against_store

    store_dir = str(tmp_path / "store")
    spark.createDataFrame([("seed",)], "text string").select(
        fingerprint_sha256("text").alias("content_hash")
    ).write.mode("overwrite").parquet(store_dir)

    def run(srcname, batches):
        src = str(tmp_path / srcname)
        os.makedirs(src)
        for i, rows in enumerate(batches):
            p = f"{src}/chunk-{i:04d}.parquet"
            pq.write_table(
                pa.table(
                    {"doc_id": [r[0] for r in rows],
                     "text": [r[1] for r in rows]}
                ),
                p,
            )
            os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))
        out = stream_dedup_against_store(
            spark, src, "doc_id long, text string", store_dir
        )
        return {r["doc_id"]: r["status"] for r in out.collect()}

    first = run("src1", [[(0, "crawl one doc")], [(3, "another doc")]])
    assert first == {0: "kept", 3: "kept"}
    second = run(
        "src2",
        [[(6, "crawl one doc"), (9, "fresh in run two")], [(12, "seed")]],
    )
    assert second == {6: "dup_store", 9: "kept", 12: "dup_store"}
