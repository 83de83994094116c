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
