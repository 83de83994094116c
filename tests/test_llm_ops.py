"""Ground-truth tests for the approximate / rows-only LLM-data
operators (SURVEY.md §5.2 layers 2-3): numpy verification for cosine
top-k, containment properties for MinHash, recall for LSH ANN,
determinism for SimHash and the multimodal kernel."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sparkclif.io import table
from sparkclif.operators import dedup as D
from sparkclif.operators import similarity as S
from sparkclif.operators import text as T


@pytest.fixture(scope="module")
def emb_np(spark, sf_dir):
    pdf = table(spark, sf_dir, "embeddings").select("vec_id", "embedding").toPandas()
    ids = pdf["vec_id"].to_numpy()
    mat = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
    return ids, mat


def test_cosine_topk_matches_numpy(spark, sf_dir, emb_np):
    ids, mat = emb_np
    emb = table(spark, sf_dir, "embeddings")
    got = {
        (r.vec_id, r.rn): r.neighbor_id
        for r in S.cosine_topk(emb, k=3).collect()
    }
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    order = np.argsort(ids)
    for qi in range(len(ids)):
        row = sims[qi].copy()
        row[qi] = -np.inf
        # expected top-3 with (cosine desc, id asc) tiebreak
        cand = sorted(range(len(ids)), key=lambda j: (-row[j], ids[j]))[:3]
        for rank, j in enumerate(cand, start=1):
            assert got[(ids[qi], rank)] == ids[j], (
                f"vec {ids[qi]} rank {rank}: got {got[(ids[qi], rank)]}, want {ids[j]}"
            )


def test_minhash_contains_exact_dups(spark, sf_dir):
    """Property: near-dup candidates ⊇ exact duplicates. The testbed
    has no exact dups, so inject some by unioning a copy of 5 docs
    under shifted ids."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    clones = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(clones)
    sigs = D.minhash_signatures(corpus, num_hashes=32, shingle_n=3)
    pairs = D.minhash_candidate_pairs(sigs, num_bands=8)
    found = {
        (r.id_a, r.id_b): r.est_jaccard for r in pairs.collect()
    }
    for i in range(5):
        assert (i, i + 100000) in found, f"exact dup pair {i} not found by MinHash"
        assert found[(i, i + 100000)] == 1.0


def test_minhash_est_close_to_exact(spark, sf_dir):
    """Estimated Jaccard on candidates within 0.35 of exact (32 lanes)."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    sigs = D.minhash_signatures(docs, num_hashes=32, shingle_n=3)
    pairs = D.minhash_candidate_pairs(sigs, num_bands=8).limit(50)
    sh = docs.select(
        "doc_id", F.array_distinct(T.word_shingles(F.col("text"), 3)).alias("sh")
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    joined = pairs.join(a, "id_a").join(b, "id_b").select(
        "id_a", "id_b", "est_jaccard",
        D.ngram_jaccard(F.col("sh_a"), F.col("sh_b")).alias("exact"),
    )
    for r in joined.collect():
        assert abs(r.est_jaccard - r.exact) < 0.35, (
            f"({r.id_a},{r.id_b}): est {r.est_jaccard} vs exact {r.exact}"
        )


def test_lsh_ann_broadcast_and_carry_paths_agree(spark, sf_dir):
    """The broadcast-vector re-rank (small-corpus default) and the
    carry-vectors shuffle (the beyond-broadcast scale path) must
    produce identical results row-for-row."""
    emb = table(spark, sf_dir, "embeddings")
    a = sorted(
        map(tuple, S.lsh_ann(emb, k=3, broadcast_vectors=True).collect())
    )
    b = sorted(
        map(tuple, S.lsh_ann(emb, k=3, broadcast_vectors=False).collect())
    )
    assert a == b


def test_lsh_ann_recall(spark, sf_dir, emb_np):
    """LSH top-3 should recall a reasonable fraction of exact top-3
    (8 planes, single table — recall won't be high; bound it loosely
    and assert determinism instead of tightness)."""
    ids, mat = emb_np
    emb = table(spark, sf_dir, "embeddings")
    approx = S.lsh_ann(emb, k=3)
    got1 = sorted((r.vec_id, r.neighbor_id) for r in approx.collect())
    got2 = sorted((r.vec_id, r.neighbor_id) for r in S.lsh_ann(emb, k=3).collect())
    assert got1 == got2, "LSH ANN is nondeterministic across runs"
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    exact_pairs = set()
    for qi in range(len(ids)):
        row = sims[qi].copy()
        row[qi] = -np.inf
        for j in np.argsort(-row)[:3]:
            exact_pairs.add((ids[qi], ids[j]))
    hits = len(set(got1) & exact_pairs)
    assert hits / len(exact_pairs) > 0.05, "LSH recall collapsed to ~0"


def test_simhash_deterministic_and_discriminative(spark, sf_dir):
    docs = table(spark, sf_dir, "documents").limit(50)
    fp1 = {r.doc_id: r.simhash for r in D.simhash64(docs).collect()}
    fp2 = {r.doc_id: r.simhash for r in D.simhash64(docs).collect()}
    assert fp1 == fp2
    assert len(set(fp1.values())) > 1, "simhash mapped all docs to one bucket"


def test_multimodal_features_deterministic(spark, sf_dir):
    from sparkclif.operators import multimodal as M

    docs = table(spark, sf_dir, "documents").limit(20)
    media = M.attach_fake_media(docs)
    r1 = sorted(M.extract_features(media).collect())
    r2 = sorted(M.extract_features(media).collect())
    assert r1 == r2
    for row in r1:
        assert row.n_bytes > 0
        assert 0 <= row.byte_entropy <= 8.0
        assert len(row.feature) == 4


def test_cosine_threshold_pairs_match_numpy(spark, sf_dir, emb_np):
    ids, mat = emb_np
    emb = table(spark, sf_dir, "embeddings")
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in S.cosine_threshold_pairs(emb, tau=0.4).collect()
    }
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    want = {}
    for i in range(len(ids)):
        for j in range(len(ids)):
            if ids[i] < ids[j] and round(sims[i, j], 4) >= 0.4:
                want[(ids[i], ids[j])] = round(sims[i, j], 4)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-6


def test_ivf_recall_and_determinism(spark, sf_dir, emb_np):
    ids, mat = emb_np
    emb = table(spark, sf_dir, "embeddings")
    got1 = sorted((r.vec_id, r.neighbor_id) for r in S.ivf_ann(emb, k=3).collect())
    got2 = sorted((r.vec_id, r.neighbor_id) for r in S.ivf_ann(emb, k=3).collect())
    assert got1 == got2, "IVF ANN is nondeterministic across runs"
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = norm @ norm.T
    exact_pairs = set()
    for qi in range(len(ids)):
        row = sims[qi].copy()
        row[qi] = -np.inf
        for j in np.argsort(-row)[:3]:
            exact_pairs.add((ids[qi], ids[j]))
    hits = len(set(got1) & exact_pairs)
    assert hits / len(exact_pairs) > 0.05, "IVF recall collapsed to ~0"


def test_sample_frames_shape_and_determinism(spark, sf_dir):
    from sparkclif.operators import multimodal as M

    docs = table(spark, sf_dir, "documents").limit(10)
    media = M.attach_fake_media(docs)
    r1 = sorted(M.sample_frames(media, n_frames=4).collect())
    r2 = sorted(M.sample_frames(media, n_frames=4).collect())
    assert r1 == r2
    by_doc = {}
    for row in r1:
        by_doc.setdefault(row.doc_id, []).append(row.frame_idx)
    for doc_id, frames in by_doc.items():
        assert sorted(frames) == [0, 1, 2, 3], f"doc {doc_id}: {frames}"


def test_minhash_short_docs_get_null_signature(spark):
    """Docs too short to shingle (< n tokens) carry no similarity
    signal: the numpy remix kernel must emit a NULL signature and the
    banding stage must exclude them (they'd otherwise all collide in
    one giant bucket)."""
    docs = spark.createDataFrame(
        [(1, "only two"), (2, "a b c d e f"), (3, "a b c d e f")],
        "doc_id long, text string",
    )
    sigs = {r.doc_id: r.signature for r in D.minhash_signatures(docs).collect()}
    assert sigs[1] is None
    assert sigs[2] == sigs[3] and sigs[2] is not None  # exact dups: equal sigs
    pairs = D.minhash_candidate_pairs(D.minhash_signatures(docs)).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(2, 3)}
    assert pairs[0].est_jaccard == 1.0


def test_simhash_drops_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "   "), (2, "hello world hello")], "doc_id long, text string"
    )
    rows = D.simhash64(docs).collect()
    assert [r.doc_id for r in rows] == [2]


def test_lsh_ann_block_merge_is_exact_within_buckets(spark):
    """Vectors sharing every bucket (identical signatures) must get
    their true top-k: per-bucket top-k + global merge loses nothing
    when a candidate is top-k in some shared bucket."""
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.normal(size=64)
    rows = [
        (i, (base + 0.01 * i * rng.normal(size=64)).astype("float32").tolist())
        for i in range(6)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = S.lsh_ann(emb, k=2, n_planes=4, n_tables=2).collect()
    mat = np.vstack([np.array(r[1]) for r in rows]).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mat @ mat.T
    np.fill_diagonal(sims, -np.inf)
    for r in got:
        # every returned neighbor's cosine must match the exact value
        assert abs(r.cosine - round(float(sims[r.vec_id, r.neighbor_id]), 4)) < 1e-9


def test_minhash_band_guard_checks_actual_signature_length(spark):
    """Round-4 fix (ADVICE r3): the divides-guard must fire on the
    ACTUAL signature array length, not just the caller-declared
    num_hashes — a 6-lane signature with num_bands=4 would silently
    drop the trailing 2 lanes from every band."""
    import pytest

    from sparkclif.operators import dedup as D

    sigs = spark.createDataFrame(
        [(1, [1, 2, 3, 4, 5, 6]), (2, [1, 2, 3, 4, 5, 6])],
        "doc_id long, signature array<long>",
    )
    with pytest.raises(Exception, match="must divide signature length"):
        D.minhash_candidate_pairs(sigs, num_bands=4, num_hashes=None).collect()


def test_threshold_pairs_lsh_precision_and_recall(spark, sf_dir, emb_np):
    """The at-scale embedding-dedup path (LSH candidates + exact
    in-bucket verify) vs the broadcast exact path: every emitted pair
    must appear in the exact result WITH THE SAME COSINE (one-sided
    error: precision 1.0), recall on the high-cosine pairs dedup
    actually acts on (>= 0.9) must be near-total, and the broadcast /
    carry-vector variants must agree row-for-row."""
    ids, mat = emb_np
    emb = table(spark, sf_dir, "embeddings")
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in S.cosine_threshold_pairs(emb, tau=0.4).collect()
    }
    approx = {
        (r.id_a, r.id_b): r.cosine
        for r in S.cosine_threshold_pairs_lsh(
            emb, tau=0.4, n_rows=len(ids), broadcast_vectors=True
        ).collect()
    }
    assert approx, "LSH threshold pairs returned nothing"
    for pair, cos in approx.items():
        assert pair in exact, f"false positive pair {pair}"
        assert cos == exact[pair], f"cosine mismatch on {pair}"
    high = {p for p, c in exact.items() if c >= 0.9}
    if high:
        found_high = sum(1 for p in high if p in approx)
        assert found_high / len(high) >= 0.9, (
            f"high-cosine recall {found_high}/{len(high)} below 0.9"
        )
    carry = {
        (r.id_a, r.id_b): r.cosine
        for r in S.cosine_threshold_pairs_lsh(
            emb, tau=0.4, n_rows=len(ids), broadcast_vectors=False
        ).collect()
    }
    assert carry == approx, "broadcast and carry-vector variants diverge"


def test_exact_cosine_dispatch_routes_to_lsh(spark, sf_dir, monkeypatch):
    """VERDICT r5 item 2: past EXACT_BROADCAST_BYTES the exact
    broadcast variants must route to their LSH scale paths instead of
    toPandas()-ing a larger-than-driver table. Pin the bound to 0 so
    the sf-test table counts as 'too big', and check the dispatched
    result is bit-identical to calling the LSH path directly (same
    seeds, same params); force='broadcast' overrides the bound."""
    emb = table(spark, sf_dir, "embeddings")
    monkeypatch.setattr(S, "EXACT_BROADCAST_BYTES", 0)

    via_dispatch = sorted(map(tuple, S.cosine_topk(emb, k=3).collect()))
    direct_lsh = sorted(map(tuple, S.lsh_ann(emb, k=3).collect()))
    assert via_dispatch == direct_lsh
    assert via_dispatch, "dispatched LSH top-k returned nothing"

    pairs_dispatch = sorted(
        map(tuple, S.cosine_threshold_pairs(emb, tau=0.4).collect())
    )
    pairs_lsh = sorted(
        map(tuple, S.cosine_threshold_pairs_lsh(emb, tau=0.4).collect())
    )
    assert pairs_dispatch == pairs_lsh
    assert pairs_dispatch, "dispatched LSH pairs returned nothing"

    # force pins the exact path even below the (zeroed) bound. The
    # checkable exactness property: per query vector, the exact top-1
    # cosine dominates the LSH top-1 (LSH only sees in-bucket
    # candidates, so its best neighbor can never beat brute force),
    # and the exact path answers for at least every vector LSH did.
    forced = S.cosine_topk(emb, k=3, force="broadcast").collect()
    exact_best = {}
    for r in forced:
        exact_best[r.vec_id] = max(exact_best.get(r.vec_id, -2.0), r.cosine)
    lsh_best = {}
    for t in via_dispatch:
        lsh_best[t[0]] = max(lsh_best.get(t[0], -2.0), t[2])
    assert set(lsh_best) <= set(exact_best)
    assert all(
        exact_best[v] >= lsh_best[v] - 1e-12 for v in lsh_best
    ), "LSH top-1 beat brute force — the forced broadcast path did not run exact"
    exact_pairs = {
        (r.id_a, r.id_b)
        for r in S.cosine_threshold_pairs(emb, tau=0.4, force="broadcast").collect()
    }
    # LSH output is a precision-1 subset of the exact pair set
    assert {(a, b) for a, b, _ in pairs_dispatch} <= exact_pairs


def test_exact_cosine_dispatch_rejects_bad_force(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError):
        S.cosine_topk(emb, k=3, force="brodcast")
    with pytest.raises(ValueError):
        S.cosine_threshold_pairs(emb, force="window")
