"""Round-12 additions: ADVICE r11 regressions (ANSI-safe IVF-PQ probe
lookup, eval-gram memo data-versioning + eviction unpersist), then
the round-12 growth surface (residual-encoded IVF-PQ with trained
codebooks, streaming ANN index maintenance). Parity vs the DuckDB
oracle is covered for every registered query by test_oracle_parity.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


# ------------------------------------------------- ADVICE r11 closures


def test_ivf_pq_search_ansi_safe(spark):
    """ADVICE r11 (low): the probe-map lookup must yield NULL for
    unprobed clusters (the common case) so explode drops them — plain
    map subscript throws MAP_KEY_DOES_NOT_EXIST under
    spark.sql.ansi.enabled=true. try_element_at is the ANSI-safe
    form; results must be identical either way."""
    from sparkclif.operators.quantize import ivf_pq_search

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = sorted(
        tuple(r) for r in ivf_pq_search(emb).collect()
    )
    assert base, "searcher returned no rows on the test corpus"
    prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        ansi = sorted(tuple(r) for r in ivf_pq_search(emb).collect())
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert ansi == base


def _write_docs(path: str, rows: list[tuple[int, str]]) -> None:
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["t"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, path)


def test_decontaminate_memo_busts_on_data_rewrite(spark, tmp_path):
    """ADVICE r11 (low): the eval-gram memo was keyed only by
    (applicationId, sf_dir) — an in-process harness regenerating the
    parquet under the same path would be served a silently-stale
    checkpointed fingerprint. The key now folds the source parquet's
    (mtime, size), so a rewrite gets a fresh eval-gram set."""
    from sparkclif.registry import all_queries

    fn = all_queries()["i_decontaminate"].fn
    sf_dir = str(tmp_path)
    p = os.path.join(sf_dir, "documents.parquet")
    # doc 0 is the eval set (doc_id % 101 == 0); doc 1 shares its gram
    _write_docs(p, [(0, "a b c d"), (1, "a b c x"), (2, "p q r s")])
    first = {r["doc_id"]: r["n_shared"] for r in fn(spark, sf_dir).collect()}
    assert first == {1: 1}
    # regenerate under the SAME path: eval grams change entirely
    os.remove(p)
    _write_docs(p, [(0, "p q r s t"), (1, "a b c x"), (2, "p q r s")])
    second = {r["doc_id"]: r["n_shared"] for r in fn(spark, sf_dir).collect()}
    assert second == {2: 2}, (
        "stale eval-gram fingerprint served after data rewrite"
    )


def test_ev_gram_evict_unpersists():
    """ADVICE r11 (low): eviction must best-effort free the
    checkpointed blocks immediately, not wait for GC + the
    ContextCleaner sweep."""
    from sparkclif.queries import group_i_r4 as g

    calls = []

    class _RDD:
        def unpersist(self):
            calls.append("unpersist")

    class _DF:
        rdd = _RDD()

    g._EV_GRAMS["__t__"] = _DF()
    g._evict_ev_gram("__t__")
    assert "__t__" not in g._EV_GRAMS
    assert calls == ["unpersist"]

    class _Dead:
        @property
        def rdd(self):
            raise RuntimeError("context gone")

    g._EV_GRAMS["__t2__"] = _Dead()
    g._evict_ev_gram("__t2__")  # must not raise
    assert "__t2__" not in g._EV_GRAMS


# ------------------------------------- residual IVF-PQ (growth, r12)


def _residual_ivf_pq_model(
    vecs_by_id,
    residual=True,
    n_queries=4,
    k=3,
    n_clusters=8,
    n_probe=2,
    n_sub=4,
    sub_dim=16,
    n_codes=8,
    n_updates=1,
):
    """Independent Python model of the residual IVF-PQ pipeline (and,
    with residual=False + no training, of the raw ivf_pq_search
    encoding at the same code budget) — the third derivation next to
    the engine and the SQL oracle. Returns sorted (vec_id,
    neighbor_id, cluster, adc_dist, rank) rows."""
    import hashlib
    import math

    ids = sorted(vecs_by_id)
    qv = {
        i: [math.floor(float(x) * 10000) for x in vecs_by_id[i]]
        for i in ids
    }
    heads = ids[: max(n_clusters, n_queries)]
    centroids = [(i, qv[i]) for i in heads[:n_clusters]]
    queries = [(i, qv[i]) for i in heads[:n_queries]]
    donors = sorted(
        ids,
        key=lambda i: (hashlib.md5(f"pq|{i}".encode()).hexdigest(), i),
    )[:n_codes]

    def coarse(v):
        return min(
            centroids,
            key=lambda c: (-sum(a * b for a, b in zip(v, c[1])), c[0]),
        )

    post = {}
    for i in ids:
        cid, cv = coarse(qv[i])
        base = [a - b for a, b in zip(qv[i], cv)] if residual else qv[i]
        post[i] = (cid, base)
    cb = {
        s: [post[d][1][s * sub_dim : (s + 1) * sub_dim] for d in donors]
        for s in range(n_sub)
    }

    def assign(bv, s, cbk):
        return min(
            (
                (
                    sum(
                        (a - b) ** 2
                        for a, b in zip(
                            bv[s * sub_dim : (s + 1) * sub_dim], cw
                        )
                    ),
                    c,
                )
                for c, cw in enumerate(cbk[s])
            )
        )[1]

    if residual:
        for _ in range(n_updates):
            sums = {}
            for i in ids:
                bv = post[i][1]
                for s in range(n_sub):
                    c = assign(bv, s, cb)
                    acc = sums.setdefault((s, c), [[0] * sub_dim, 0])
                    for j in range(sub_dim):
                        acc[0][j] += bv[s * sub_dim + j]
                    acc[1] += 1
            cb = {
                s: [
                    (
                        [
                            x // n if x >= 0 else -((-x) // n)
                            for x in sums[(s, c)][0]
                            for n in (sums[(s, c)][1],)
                        ]
                        if (s, c) in sums
                        else cb[s][c]
                    )
                    for c in range(n_codes)
                ]
                for s in range(n_sub)
            }
    codes = {
        i: [assign(post[i][1], s, cb) for s in range(n_sub)] for i in ids
    }
    out = []
    for qid, qvv in queries:
        order = sorted(
            centroids,
            key=lambda c: (-sum(a * b for a, b in zip(qvv, c[1])), c[0]),
        )[:n_probe]
        cands = []
        for cid, cv in order:
            bq = [a - b for a, b in zip(qvv, cv)] if residual else qvv
            lut = [
                [
                    sum(
                        (bq[s * sub_dim + j] - cw[j]) ** 2
                        for j in range(sub_dim)
                    )
                    for cw in cb[s]
                ]
                for s in range(n_sub)
            ]
            for i in ids:
                if i == qid or post[i][0] != cid:
                    continue
                cands.append(
                    (
                        sum(lut[s][codes[i][s]] for s in range(n_sub)),
                        i,
                        cid,
                    )
                )
        cands.sort()
        for r, (adc, i, cid) in enumerate(cands[:k], 1):
            out.append((qid, i, cid, adc, r))
    return sorted(out)


def test_ivf_pq_residual_matches_model(spark):
    """Triple derivation leg: the engine's residual IVF-PQ equals an
    independent Python model on the test corpus (the SQL oracle is
    the second leg, checked by test_oracle_parity)."""
    import duckdb

    from sparkclif.operators.quantize import ivf_pq_residual_search

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    got = sorted(tuple(r) for r in ivf_pq_residual_search(emb).collect())
    vecs = {
        int(r[0]): r[1]
        for r in duckdb.sql(
            f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet'"
        ).fetchall()
    }
    want = _residual_ivf_pq_model(vecs)
    assert got == want


def test_ivf_pq_residual_recall_beats_raw():
    """The point of residual encoding (Jégou et al. 2011 §V): on
    clustered data, residual+trained codebooks must recall at least
    as much of the exact top-k as raw seed-donor PQ at the SAME code
    budget (same n_sub/sub_dim/n_codes, same coarse stage — the
    comparison isolates the encoding). Deterministic seeded data;
    measured margin at this shape: 0.44 vs 0.30."""
    rng = np.random.default_rng(0)
    n, dim, n_clusters = 256, 64, 8
    centers = rng.normal(0, 1.0, (n_clusters, dim))
    vecs = {
        i: centers[i % n_clusters] + rng.normal(0, 0.15, dim)
        for i in range(n)
    }
    kw = dict(n_queries=8, k=10)
    res = _residual_ivf_pq_model(vecs, residual=True, **kw)
    raw = _residual_ivf_pq_model(vecs, residual=False, **kw)

    import math

    qv = {
        i: [math.floor(float(x) * 10000) for x in vecs[i]] for i in vecs
    }
    ids = sorted(vecs)

    def exact_topk(qid, k=10):
        d = sorted(
            (
                sum((a - b) ** 2 for a, b in zip(qv[qid], qv[i])),
                i,
            )
            for i in ids
            if i != qid
        )
        return {i for _, i in d[:k]}

    def recall(rows):
        hits = tot = 0
        for qid in {r[0] for r in rows}:
            gt = exact_topk(qid)
            hits += len(gt & {r[1] for r in rows if r[0] == qid})
            tot += len(gt)
        return hits / tot

    r_res, r_raw = recall(res), recall(raw)
    assert r_res >= r_raw, (r_res, r_raw)
    assert r_res > 0.35  # and it genuinely finds neighbors


def test_ivf_pq_residual_tiny_and_empty(spark):
    """Degenerate inputs: empty corpus returns an empty frame with
    the searcher schema; a corpus smaller than n_codes/n_clusters
    still runs (smaller codebook/centroid set)."""
    from sparkclif.operators.quantize import ivf_pq_residual_search

    schema = "vec_id long, embedding array<float>"
    empty = spark.createDataFrame([], schema)
    out = ivf_pq_residual_search(empty)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "vec_id", "neighbor_id", "cluster", "adc_dist", "rank",
    ]

    tiny = spark.createDataFrame(
        [(i, [float(i + j) / 10 for j in range(64)]) for i in range(3)],
        schema,
    )
    rows = ivf_pq_residual_search(tiny, n_queries=2, k=2).collect()
    assert all(r["vec_id"] != r["neighbor_id"] for r in rows)


# ----------------------------------- streaming ANN index (growth, r12)


def test_ann_merge_state_side_joins_without_exchange(spark):
    """The O(delta) contract: the bucketed state side of the per-batch
    index MERGE join carries no Exchange — only the (delta-sized)
    encode side shuffles (the test_r8 merge discipline applied to the
    ANN state table)."""
    import re

    from sparkclif.plans import formatted_plan
    from sparkclif.streaming.ann import merge_ann_codes
    from sparkclif.streaming.merge import STATE_BUCKETS

    schema = "vec_id long, cluster long, codes array<int>"
    rows = [(i, i % 8, [i % 16] * 8) for i in range(100)]
    tbl = "t_r12_ann_state_plan"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    (
        spark.createDataFrame(rows, schema)
        .write.bucketBy(STATE_BUCKETS, "vec_id")
        .sortBy("vec_id")
        .mode("overwrite")
        .saveAsTable(tbl)
    )
    try:
        delta = spark.createDataFrame(rows[:7], schema)
        plan = formatted_plan(merge_ann_codes(spark.table(tbl), delta))
        assert "Bucketed: true" in plan, "state scan must be bucket-aware"
        n_exchanges = len(re.findall(r"^\(\d+\) Exchange\b", plan, re.M))
        assert n_exchanges == 1, (
            "exactly one shuffle Exchange (the delta side); a second "
            "means the O(state) side shuffled:\n" + plan
        )
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")


def test_ann_merge_delta_wins_on_match(spark):
    """WHEN MATCHED semantics: the delta row replaces the stored one
    (latest encode wins); unmatched state rows survive; new keys
    insert."""
    from sparkclif.streaming.ann import merge_ann_codes

    schema = "vec_id long, cluster long, codes array<int>"
    state = spark.createDataFrame(
        [(1, 0, [1, 1]), (2, 3, [2, 2])], schema
    )
    delta = spark.createDataFrame(
        [(2, 5, [9, 9]), (7, 1, [7, 7])], schema
    )
    got = {
        r["vec_id"]: (r["cluster"], list(r["codes"]))
        for r in merge_ann_codes(state, delta).collect()
    }
    assert got == {1: (0, [1, 1]), 2: (5, [9, 9]), 7: (1, [7, 7])}


def test_stream_ann_index_equals_batch_encode(spark, tmp_path):
    """The maintenance contract: after the stream drains (including
    re-delivered duplicates exercising WHEN MATCHED), the state table
    equals the one-shot batch encode of the full corpus."""
    from sparkclif.operators.quantize import _collect_pq_metadata
    from sparkclif.streaming.ann import (
        ann_delta,
        stream_ann_index,
        write_vec_chunks,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    codebook, heads = _collect_pq_metadata(emb, 16, 8, "vec_id", "embedding")
    centroids = heads[:8]

    src = str(tmp_path / "chunks")
    write_vec_chunks(f"{SF_DIR}/embeddings.parquet", src, n_chunks=3)
    state = stream_ann_index(spark, src, centroids, codebook)

    batch = {
        r["vec_id"]: (r["cluster"], list(r["codes"]))
        for r in ann_delta(emb, centroids, codebook).collect()
    }
    got = {
        int(r.vec_id): (int(r.cluster), list(r.codes))
        for r in state.itertuples()
    }
    assert got == batch
    assert len(got) == emb.count()


def test_write_vec_chunks_redelivers(tmp_path):
    """The at-least-once property the chunk writer exists for: every
    chunk after the first contains its predecessor's redeliver slice
    verbatim, and the union of chunks covers the corpus exactly."""
    import duckdb

    src = str(tmp_path / "chunks")
    write_parquet = f"{SF_DIR}/embeddings.parquet"
    from sparkclif.streaming.ann import write_vec_chunks

    write_vec_chunks(write_parquet, src, n_chunks=3)
    chunks = [
        duckdb.sql(
            f"SELECT vec_id FROM '{src}/chunk-{i:04d}.parquet'"
        ).fetchall()
        for i in range(3)
    ]
    ids = [sorted(x[0] for x in c) for c in chunks]
    all_ids = sorted(
        x[0]
        for x in duckdb.sql(
            f"SELECT vec_id FROM '{write_parquet}'"
        ).fetchall()
    )
    assert sorted(set(ids[0]) | set(ids[1]) | set(ids[2])) == all_ids
    for i in (1, 2):
        prev_native = [
            v for v in ids[i - 1] if (v // 16) % 3 == i - 1
        ]
        expect_echo = {v for v in prev_native if v % 11 == 0}
        native = {v for v in ids[i] if (v // 16) % 3 == i}
        echoed = set(ids[i]) - native
        assert echoed == expect_echo, (i, echoed ^ expect_echo)


def test_ivf_pq_residual_ansi_safe(spark):
    """The residual searcher shares the probe-map-explode hazard the
    ADVICE r11 fix closed in ivf_pq_search (plus a centroid-map
    lookup whose keys are always present by construction): results
    must be identical under spark.sql.ansi.enabled=true."""
    from sparkclif.operators.quantize import ivf_pq_residual_search

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = sorted(tuple(r) for r in ivf_pq_residual_search(emb).collect())
    assert base
    prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        ansi = sorted(
            tuple(r) for r in ivf_pq_residual_search(emb).collect()
        )
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert ansi == base


def test_stream_ann_index_empty_corpus(spark, tmp_path):
    """Round-12 review: an empty corpus must return an empty typed
    frame, not fail analysis on empty quantizer literals."""
    from sparkclif.registry import all_queries

    sf_dir = str(tmp_path)
    empty = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
            "label": pa.array([], pa.int32()),
        }
    )
    pq.write_table(empty, os.path.join(sf_dir, "embeddings.parquet"))
    fn = all_queries()["h_stream_ann_index"].fn
    out = fn(spark, sf_dir)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "vec_id", "cluster", "sub", "code",
    ]


def test_residual_codebook_training_reduces_error(spark):
    """The training loop does what Lloyd promises: the engine-trained
    codebook (a) exactly equals the independent Python model's (same
    assignments, same truncating means) and (b) strictly reduces the
    total residual-space quantization error vs the seed codebook on
    clustered data (measured: −24% after one update at this shape)."""
    import math

    from sparkclif.operators.quantize import _train_residual_codebooks

    rng = np.random.default_rng(0)
    n, dim, n_clusters = 256, 64, 8
    n_sub, sub_dim, n_codes = 4, 16, 8
    centers = rng.normal(0, 1.0, (n_clusters, dim))
    vecs = {
        i: centers[i % n_clusters] + rng.normal(0, 0.15, dim)
        for i in range(n)
    }
    import hashlib

    ids = sorted(vecs)
    qv = {i: [math.floor(float(x) * 10000) for x in vecs[i]] for i in ids}
    centroids = [(i, qv[i]) for i in ids[:n_clusters]]
    donors = sorted(
        ids, key=lambda i: (hashlib.md5(f"pq|{i}".encode()).hexdigest(), i)
    )[:n_codes]

    def coarse(v):
        return min(
            centroids,
            key=lambda c: (-sum(a * b for a, b in zip(v, c[1])), c[0]),
        )

    resid = {}
    for i in ids:
        _, cv = coarse(qv[i])
        resid[i] = [a - b for a, b in zip(qv[i], cv)]
    cb0 = {
        s: [resid[d][s * sub_dim : (s + 1) * sub_dim] for d in donors]
        for s in range(n_sub)
    }

    # the engine's training input: the (id, cluster, residual-slices)
    # projection, here built driver-side so the test pins the LOOP
    rows = [
        (
            i,
            coarse(qv[i])[0],
            [resid[i][s * sub_dim : (s + 1) * sub_dim] for s in range(n_sub)],
        )
        for i in ids
    ]
    proj = spark.createDataFrame(
        rows, "vec_id long, __cluster long, __rs array<array<long>>"
    )
    got = _train_residual_codebooks(proj, cb0, n_sub, sub_dim, 1, "vec_id")

    # model-trained codebook (one update, truncating means)
    def assign(bv, s, cbk):
        return min(
            (
                (
                    sum(
                        (a - b) ** 2
                        for a, b in zip(bv[s * sub_dim : (s + 1) * sub_dim], cw)
                    ),
                    c,
                )
                for c, cw in enumerate(cbk[s])
            )
        )[1]

    sums: dict = {}
    for i in ids:
        for s in range(n_sub):
            c = assign(resid[i], s, cb0)
            acc = sums.setdefault((s, c), [[0] * sub_dim, 0])
            for j in range(sub_dim):
                acc[0][j] += resid[i][s * sub_dim + j]
            acc[1] += 1
    want = {
        s: [
            (
                [
                    x // nn if x >= 0 else -((-x) // nn)
                    for x in sums[(s, c)][0]
                    for nn in (sums[(s, c)][1],)
                ]
                if (s, c) in sums
                else cb0[s][c]
            )
            for c in range(n_codes)
        ]
        for s in range(n_sub)
    }
    assert got == want

    def err(cb):
        return sum(
            min(
                sum(
                    (a - b) ** 2
                    for a, b in zip(
                        resid[i][s * sub_dim : (s + 1) * sub_dim], cw
                    )
                )
                for cw in cb[s]
            )
            for i in ids
            for s in range(n_sub)
        )

    assert err(got) < err(cb0)


def test_ivf_pq_residual_oracle_differential_random():
    """Randomized differential: the registered SQL oracle (DuckDB)
    must equal the independent Python model on random SMALL corpora —
    including duplicate vectors (ADC ties) and negative-heavy values
    (the truncating-division convention on negative sums) that the
    fixed test corpus may under-exercise. No Spark involved: the
    engine==oracle and engine==model legs are pinned elsewhere; this
    leg stresses the oracle's trickier SQL on adversarial shapes."""
    import duckdb
    import pandas as pd

    from sparkclif.registry import all_queries

    sql = all_queries()["i_sim_ivf_pq_residual"].oracle
    rng = np.random.default_rng(7)
    for trial in range(6):
        n = int(rng.integers(12, 40))
        vecs = {}
        for i in range(n):
            if trial == 1:
                # heavy ties: few distinct vectors, many duplicates
                base = rng.integers(0, 3)
                v = np.full(64, -0.5) + base * 0.25
            elif trial == 2:
                # negative-dominated: exercises s < 0 truncating means
                v = -np.abs(rng.normal(0.5, 0.3, 64))
            else:
                v = rng.normal(0, 0.6, 64)
            vecs[i] = v.astype(np.float64)
        pdf = pd.DataFrame(
            {
                "vec_id": list(vecs),
                "embedding": [
                    np.asarray(v, dtype=np.float32) for v in vecs.values()
                ],
            }
        )
        con = duckdb.connect()
        con.register("embeddings", pdf)
        got = sorted(tuple(r) for r in con.execute(sql).fetchall())
        con.close()
        want = _residual_ivf_pq_model(
            {i: [float(np.float32(x)) for x in v] for i, v in vecs.items()}
        )
        assert got == want, f"trial {trial}: oracle != model"


# ------------------------- incremental simhash near-dup (growth, r12)


def test_simhash_incremental_threshold_and_precedence(spark):
    """Crafted fingerprints pin the contract: hamming <= 3 matches
    (pigeonhole over 4 x 16-bit bands — even with the 3 flips spread
    across 3 different bands), hamming 4 never matches (threshold,
    not band luck), store precedence over a closer batch match, and
    the (hamming, id)-minimal winner."""
    from sparkclif.operators.dedup import dedup_simhash_incremental

    base = 0x0123456789ABCDEF

    def flip(v, *bits):
        for b in bits:
            v ^= 1 << b
        return v - (1 << 64) if v >= 1 << 63 else v

    batch = spark.createDataFrame(
        [
            (100, flip(base)),            # exact store dup (ham 0)
            (101, flip(base, 1, 17, 33)), # ham 3 across 3 bands -> match
            (102, flip(base, 1, 17, 33, 49)),  # ham 4 -> NOT a match
            (103, flip(base, 63)),        # sign-bit band flip, ham 1
            (104, flip(base, 2)),         # ham1 vs store AND ham2 vs 100?
        ],
        "doc_id long, simhash long",
    )
    store = spark.createDataFrame(
        [(1, flip(base)), (2, flip(base, 5))],
        "doc_id long, simhash long",
    )
    got = {
        r["doc_id"]: (r["status"], r["match_id"], r["hamming"])
        for r in dedup_simhash_incremental(batch, store).collect()
    }
    assert got[100] == ("dup_store", 1, 0)
    assert got[101] == ("dup_store", 1, 3)
    # ham 4 to every STORE doc (threshold is exact — no dup_store
    # despite sharing bands), but ham 1 to batch peer 101 (they
    # differ only in bit 49): batch path catches it
    assert got[102] == ("dup_batch", 101, 1)
    assert got[103] == ("dup_store", 1, 1)
    # doc 104: ham 1 vs store doc 1 — store wins and is minimal
    assert got[104] == ("dup_store", 1, 1)


def test_simhash_incremental_batch_precedence_and_order(spark):
    """No store match -> nearest LOWER-id batch doc wins; ties on
    hamming break to the smaller id; the lowest batch doc of a
    near-dup cluster stays kept."""
    from sparkclif.operators.dedup import dedup_simhash_incremental

    base = 0x7123456789ABCDE0
    batch = spark.createDataFrame(
        [(10, base), (11, base ^ 2), (12, base ^ 4)],
        "doc_id long, simhash long",
    )
    store = spark.createDataFrame([], "doc_id long, simhash long")
    got = {
        r["doc_id"]: (r["status"], r["match_id"], r["hamming"])
        for r in dedup_simhash_incremental(batch, store).collect()
    }
    assert got[10] == ("kept", None, None)
    assert got[11] == ("dup_batch", 10, 1)
    # doc 12: ham 1 to 10, ham 2 to 11 -> (1, 10) minimal
    assert got[12] == ("dup_batch", 10, 1)
