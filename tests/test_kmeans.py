"""kmeans_exact (operators/kmeans.py): numpy model equivalence,
empty-cluster handling, and partition invariance — the properties the
DuckDB oracle can't isolate (it shares the SQL formulation; these
tests pin the semantics against an independent numpy implementation).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkclif.io import table
from sparkclif.operators.kmeans import kmeans_exact


def _numpy_lloyd(ids, vecs, k, n_updates):
    """Independent reference: same integer basis, md5 seeds,
    truncating centroid means, (dist, cluster) tiebreak."""
    q = np.floor(vecs.astype(np.float64) * 10_000).astype(np.int64)
    order = sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(f"km|{ids[i]}".encode()).hexdigest(), ids[i]),
    )
    cents = {c: q[order[c]].copy() for c in range(k)}

    def assign():
        out = {}
        for i, vid in enumerate(ids):
            best = min(
                (int(((q[i] - cents[c]) ** 2).sum()), c) for c in range(k)
            )
            out[vid] = (best[1], best[0], i)
        return out

    for _ in range(n_updates):
        a = assign()
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for vid, (c, _, i) in a.items():
            sums[c] = sums.get(c, np.zeros(q.shape[1], dtype=np.int64)) + q[i]
            counts[c] = counts.get(c, 0) + 1
        for c in range(k):
            if c in sums:
                s, n = sums[c], counts[c]
                cents[c] = np.where(
                    s >= 0, s // n, -((-s) // n)
                ).astype(np.int64)
    return {vid: (c, d) for vid, (c, d, _) in assign().items()}


def test_kmeans_matches_numpy_model(spark):
    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    vecs = np.vstack([np.array(r["embedding"], dtype=np.float32) for r in rows])
    want = _numpy_lloyd(ids, vecs, k=4, n_updates=2)
    got = {
        r["vec_id"]: (r["cluster"], r["dist_sq"])
        for r in kmeans_exact(emb, k=4, n_updates=2).collect()
    }
    assert got == want


def test_kmeans_empty_cluster_keeps_centroid(spark):
    """If both seeds are IDENTICAL vectors, every point ties to
    cluster 0 in pass 1 and cluster 1 goes EMPTY. Its centroid must
    persist through the update (not crash, not zero out) — and
    because the preserved centroid sits exactly on the duplicate
    points while cluster 0's moves to the global mean, pass 2
    re-captures the duplicates into cluster 1 at distance 0. That
    re-capture is only possible if preservation worked."""
    # ids chosen so md5 ordering puts the two IDENTICAL vectors first
    ids = sorted(range(10), key=lambda i: hashlib.md5(f"km|{i}".encode()).hexdigest())
    dup_a, dup_b = ids[0], ids[1]
    rows = []
    for i in range(10):
        if i in (dup_a, dup_b):
            vec = [1.0, 1.0]
        else:
            vec = [float(i) / 10 + 2.0, 0.5]
        rows.append((i, vec))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_exact(emb, k=2, n_updates=2).collect()
    res = {r["vec_id"]: (r["cluster"], r["dist_sq"]) for r in out}
    assert len(out) == 10
    assert res[dup_a] == (1, 0) and res[dup_b] == (1, 0)
    assert all(c == 0 for i, (c, _) in res.items() if i not in (dup_a, dup_b))


def test_kmeans_partition_invariance(spark):
    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    a = sorted(
        (r["vec_id"], r["cluster"], r["dist_sq"])
        for r in kmeans_exact(emb, k=4, n_updates=1).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster"], r["dist_sq"])
        for r in kmeans_exact(emb.repartition(7), k=4, n_updates=1).collect()
    )
    assert a == b


def test_kmeans_single_centroid(spark):
    """k=1 (a single centroid struct — F.least needs two args, so
    this exercises the 1-struct fast path): every row lands in
    cluster 0 and the pass-2 centroid is the global mean."""
    rows = [(i, [float(i), 1.0]) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_exact(emb, k=1, n_updates=1).collect()
    assert len(out) == 5
    assert all(r["cluster"] == 0 for r in out)


def _new_fully_cached_rdds(spark, before_ids):
    jsc = spark.sparkContext._jsc.sc()
    out = []
    for info in jsc.getRDDStorageInfo():
        if info.id() in before_ids:
            continue
        out.append((info.numCachedPartitions(), info.numPartitions()))
    return out


def _storage_ids(spark):
    jsc = spark.sparkContext._jsc.sc()
    return {info.id() for info in jsc.getRDDStorageInfo()}


def test_lazy_checkpoint_materialized_by_kmeans_build(spark):
    """The materialize='checkpoint' projection is a LAZY localCheckpoint
    whose blocks must be FULLY cached by the time the builder returns:
    the seed TakeOrdered is the full-scan action that materializes it
    (optimization r12). If the seed probe ever stops being a full
    scan (early-stopping shape), partitions stay uncached here and
    the per-update scans silently recompute the projection — this
    test is the safety net VERDICT r12 item 6 asked for."""
    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    before = _storage_ids(spark)
    kmeans_exact(emb.repartition(4), k=2, n_updates=1)
    cached = _new_fully_cached_rdds(spark, before)
    assert cached, "builder left no cached checkpoint blocks"
    assert any(n == total and total > 0 for n, total in cached), (
        f"checkpoint only partially materialized by the build: {cached}"
    )


def test_lazy_checkpoint_materialized_by_residual_build(spark):
    """Same net for ivf_pq_residual_search(materialize='checkpoint'):
    the first training aggregation must fully materialize the lazy
    residual-projection checkpoint."""
    from sparkclif.operators.quantize import ivf_pq_residual_search

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    before = _storage_ids(spark)
    ivf_pq_residual_search(emb.repartition(4), materialize="checkpoint")
    cached = _new_fully_cached_rdds(spark, before)
    assert cached, "builder left no cached checkpoint blocks"
    assert any(n == total and total > 0 for n, total in cached), (
        f"checkpoint only partially materialized by the build: {cached}"
    )
