"""Edge cases and invariants for the corpus-statistics operators
(operators/corpus.py) and the SemDeDup-shaped semantic_dedup
(operators/similarity.py) that the fixed synthetic corpus never
triggers: empty/short documents, boilerplate-free corpora, chunk
coverage, and partitioning-invariance of the kept set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkclif.operators import corpus as C
from sparkclif.operators.similarity import semantic_dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_boilerplate_short_and_empty_docs(spark):
    docs = _docs(
        spark,
        [
            (0, ""),  # no tokens -> 0 segments
            (1, "one"),  # 1 token -> ragged tail dropped -> 0 segments
            (2, "a b c"),  # 3 tokens -> 1 segment, tail dropped
            (3, "a b a b"),  # 2 segments, both 'a b'
        ],
    )
    out = {
        r["doc_id"]: r
        for r in C.boilerplate_removal(docs, min_docs=3, width=2).collect()
    }
    assert out[0]["n_segs"] == 0 and out[0]["clean_text"] == ""
    assert out[1]["n_segs"] == 0 and out[1]["clean_text"] == ""
    assert out[2]["n_segs"] == 1 and out[2]["clean_text"] == "a b"
    # 'a b' occurs in docs 2 and 3 -> df = 2 < min_docs=3: not boiler
    assert out[3]["n_boiler"] == 0


def test_boilerplate_strips_only_frequent_segments(spark):
    rows = [(i, "hdr txt uniq%d tok" % i) for i in range(5)]
    docs = _docs(spark, rows)
    out = C.boilerplate_removal(docs, min_docs=5, width=2).collect()
    for r in out:
        # 'hdr txt' in all 5 docs -> boiler; 'uniqN tok' unique -> kept
        assert r["n_segs"] == 2 and r["n_boiler"] == 1
        assert r["clean_text"].startswith("uniq")


def test_rarity_all_common_is_zero(spark):
    docs = _docs(spark, [(i, "x y x") for i in range(4)])
    out = C.rarity_score(docs, rare_df_pct=50).collect()
    assert all(r["n_rare"] == 0 and r["rare_bp"] == 0 for r in out)


def test_rarity_counts_occurrences_not_types(spark):
    # 'z' appears only in doc 0 (df=1 <= 25% of 4 docs), 3 times
    rows = [(0, "x z z z"), (1, "x y"), (2, "x y"), (3, "x y")]
    out = {
        r["doc_id"]: r
        for r in C.rarity_score(_docs(spark, rows), rare_df_pct=25).collect()
    }
    assert out[0]["n_rare"] == 3 and out[0]["rare_bp"] == 7500
    assert out[1]["n_rare"] == 0


def test_chunk_overlap_covers_every_token(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    chunks = C.chunk_overlap(docs, chunk=16, stride=12)
    per_doc = chunks.groupBy("doc_id").agg(
        F.max("n_chunk_toks").alias("mx"),
        F.sum("n_chunk_toks").alias("tot"),
        F.count("*").alias("n"),
    )
    joined = per_doc.join(
        docs.select(
            "doc_id",
            F.size(
                F.filter(F.split("text", r"\s+"), lambda x: x != F.lit(""))
            ).alias("n_toks"),
        ),
        "doc_id",
    )
    bad = joined.where(
        # coverage: last chunk ends at n_toks => sum of sizes =
        # n + stride*(n_chunks-1) pattern; the simplest tight check:
        # total chunked tokens = n_toks + overlap*(n_chunks-1)
        (F.col("tot") != F.col("n_toks") + 4 * (F.col("n") - 1))
        & (F.col("n_toks") > 16)
    ).count()
    assert bad == 0


def test_chunk_overlap_short_doc_single_chunk(spark):
    docs = _docs(spark, [(0, "a b c"), (1, "")])
    out = C.chunk_overlap(docs, chunk=16, stride=12).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["doc_id"], []).append(r)
    assert len(by_id[0]) == 1 and by_id[0][0]["chunk_text"] == "a b c"
    assert len(by_id[1]) == 1 and by_id[1][0]["n_chunk_toks"] == 0


def test_semantic_dedup_partitioning_invariant(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = semantic_dedup(emb, n_centroids=4, tau=0.4)
    b = semantic_dedup(emb.repartition(7), n_centroids=4, tau=0.4)
    rows_a = sorted(tuple(r) for r in a.collect())
    rows_b = sorted(tuple(r) for r in b.collect())
    assert rows_a == rows_b


def test_semantic_dedup_exact_dup_drops_higher_id(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(20)
    # clone vec 3 under a higher id: identical vector -> same cluster,
    # cosine 1.0 -> the clone must be dropped, the original kept
    clone = emb.where(F.col("vec_id") == 3).select(
        (F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "label"
    )
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(emb.unionByName(clone), n_centroids=2).collect()
    }
    assert out[3]["kept"] == 1
    assert out[10_003]["kept"] == 0 and out[10_003]["n_dup_lower"] >= 1
    assert out[3]["cluster"] == out[10_003]["cluster"]


def test_semantic_dedup_never_crosses_clusters(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = semantic_dedup(emb, n_centroids=8, tau=0.4)
    # a duplicate needs >= 2 vectors in its cluster
    solo = (
        out.groupBy("cluster")
        .agg(F.count("*").alias("n"), F.sum("n_dup_lower").alias("dups"))
        .where((F.col("n") == 1) & (F.col("dups") > 0))
        .count()
    )
    assert solo == 0


def test_chunk_overlap_null_text_behaves_as_empty(spark):
    docs = spark.createDataFrame(
        [(0, None), (1, "")], "doc_id long, text string"
    )
    out = C.chunk_overlap(docs, chunk=16, stride=12).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == 2
    for r in by_id.values():
        assert r["n_chunk_toks"] == 0 and r["chunk_text"] == ""


def test_substring_dedup_detection_guarantee(spark):
    """Any common verbatim run of >= window + stride - 1 chars MUST be
    detected (some stride-aligned window falls entirely inside it in
    both docs); short overlaps and solo docs yield no pairs."""
    from sparkclif.operators.dedup import substring_candidate_pairs

    run = "X" * 20 + "COMMON VERBATIM SEGMENT HERE!!!" + "Y" * 20  # 71 chars
    rows = [
        (0, "aaa " * 10 + run),                   # shared run, offset 40
        (1, run + " bbb " * 12),                  # shared run, offset 0
        (2, "totally different text " * 5),       # unrelated
        (3, "zz " + run[:30] + " unrelated tail due to short overlap"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in substring_candidate_pairs(docs, window=32, stride=16).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 1
    assert all(k == (0, 1) for k in pairs), pairs


def test_substring_dedup_mass_duplication_star_pairs(spark):
    """A doc verbatim-copied into MORE docs than max_df must still
    surface: over-cap buckets emit star pairs against the lowest id
    (O(members)), so connected components reunite the whole copy set
    — a plain bucket drop would hide exactly the mass-duplication
    case this operator targets."""
    from sparkclif.operators.dedup import substring_candidate_pairs

    text = "the quick brown fox jumps over the lazy dog " * 8
    docs = spark.createDataFrame(
        [(i, text) for i in range(40)], "doc_id long, text string"
    )
    pairs = substring_candidate_pairs(docs, max_df=16).collect()
    ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert ids == set(range(40))
    assert all(r["id_a"] == 0 for r in pairs)  # star centre = lowest id


def test_segment_dedup_keep_first_across_docs(spark):
    docs = _docs(
        spark,
        [
            (0, "a b c x y z"),        # segs: 'a b c', 'x y z' (both first)
            (1, "a b c q r s"),        # 'a b c' removed, 'q r s' kept
            (2, "x y z x y z"),        # both occurrences duplicate doc 0's
            (3, ""),                   # no segs -> row survives
            (4, "one two"),            # ragged tail only -> 0 segs
        ],
    )
    out = {r["doc_id"]: r for r in C.segment_dedup(docs, width=3).collect()}
    assert out[0]["n_removed"] == 0 and out[0]["clean_text"] == "a b c x y z"
    assert out[1]["n_removed"] == 1 and out[1]["clean_text"] == "q r s"
    assert out[2]["n_removed"] == 2 and out[2]["clean_text"] == ""
    assert out[3]["n_segs"] == 0 and out[3]["clean_text"] == ""
    assert out[4]["n_segs"] == 0 and out[4]["clean_text"] == ""


def test_segment_dedup_first_within_doc_by_pos(spark):
    # duplicate segment INSIDE one doc: the earlier position wins
    docs = _docs(spark, [(7, "p q p q p q")])
    out = C.segment_dedup(docs, width=2).collect()[0]
    assert out["n_segs"] == 3 and out["n_removed"] == 2
    assert out["clean_text"] == "p q"


def test_segment_dedup_randomized_model(spark):
    """Randomized differential test against a Python reference model:
    global keep-first over (doc_id, pos) for width-2 segments."""
    import random

    rng = random.Random(20260814)
    vocab = ["w%d" % i for i in range(12)]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randrange(0, 9))))
        for i in range(40)
    ]
    width = 2
    seen, model = set(), {}
    for doc_id, text in rows:
        toks = [t for t in text.split() if t]
        segs = [
            " ".join(toks[i * width : i * width + width])
            for i in range(len(toks) // width)
        ]
        kept = []
        removed = 0
        for s in segs:
            if s in seen:
                removed += 1
            else:
                seen.add(s)
                kept.append(s)
        model[doc_id] = (len(segs), removed, " ".join(kept))
    out = {
        r["doc_id"]: (r["n_segs"], r["n_removed"], r["clean_text"])
        for r in C.segment_dedup(_docs(spark, rows), width=width).collect()
    }
    assert out == model


def test_bigram_lm_score_hand_case(spark):
    # corpus: doc0 'a b a b', doc1 'a b', doc2 'a' (no bigrams)
    # bigrams: doc0 [ab, ba, ab], doc1 [ab] -> c12: ab=3, ba=1
    # c1: a=3 (ab occurrences), b=1 (ba) ; V = 2 types
    # p_bp(ab) = (3+1)*10000 div (3+2) = 8000
    # p_bp(ba) = (1+1)*10000 div (1+2) = 6666
    docs = _docs(spark, [(0, "a b a b"), (1, "a b"), (2, "a")])
    out = {r["doc_id"]: r for r in C.bigram_lm_score(docs).collect()}
    assert out[0]["n_bigrams"] == 3
    assert out[0]["sum_p_bp"] == 8000 + 6666 + 8000
    assert out[0]["lm_score_bp"] == (8000 + 6666 + 8000) // 3
    assert out[1]["lm_score_bp"] == 8000
    assert out[2]["n_bigrams"] == 0 and out[2]["lm_score_bp"] is None


def test_bigram_lm_score_flags_improbable_text(spark):
    # template docs repeat the same continuations; the junk doc pairs
    # tokens never seen together -> strictly lower score
    rows = [(i, "the cat sat on the mat") for i in range(8)]
    rows.append((99, "mat the on cat sat the"))
    docs = _docs(spark, rows)
    out = {r["doc_id"]: r["lm_score_bp"] for r in C.bigram_lm_score(docs).collect()}
    assert out[99] < out[0]


def test_dim_stats_numpy_model(spark):
    import numpy as np

    from sparkclif.operators.quantize import dim_stats

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 8)).astype("float32")
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    out = {r["dim"]: r for r in dim_stats(emb).collect()}
    q = np.floor(vecs.astype("float64") * 10000).astype("int64")
    assert set(out) == set(range(8))
    for d in range(8):
        assert out[d]["n"] == 50
        assert out[d]["sum_q"] == int(q[:, d].sum())
        assert out[d]["sumsq_q"] == int((q[:, d] ** 2).sum())
        assert out[d]["min_q"] == int(q[:, d].min())
        assert out[d]["max_q"] == int(q[:, d].max())


def test_dedup_incremental_precedence(spark):
    from sparkclif.operators.dedup import dedup_incremental, fingerprint_sha256

    batch = _docs(
        spark,
        [
            (0, "known text"),     # hash in store -> dup_store
            (3, "fresh text"),     # first in batch -> kept
            (6, "fresh text"),     # second in batch -> dup_batch
            (9, "known text"),     # in store AND duplicated in batch -> dup_store
        ],
    )
    store = _docs(spark, [(100, "known text"), (101, "other history")]).select(
        fingerprint_sha256("text").alias("content_hash")
    )
    out = {r["doc_id"]: r["status"] for r in dedup_incremental(batch, store).collect()}
    assert out == {0: "dup_store", 3: "kept", 6: "dup_batch", 9: "dup_store"}
    # store delta = hashes of kept rows only
    kept = dedup_incremental(batch, store).filter("status = 'kept'")
    assert kept.count() == 1


def test_bpe_pair_counts_model(spark):
    # vocab: 'abca' x2 occurrences, 'ab' x1, 'x' x1 (no pairs)
    docs = _docs(spark, [(0, "abca ab"), (1, "abca x")])
    out = {
        (r["left_sym"], r["right_sym"]): (r["pair_count"], r["rank"])
        for r in C.bpe_pair_counts(docs, top_k=10).collect()
    }
    # (a,b): abca twice + ab once = 3; (b,c): 2; (c,a): 2 — rank ties
    # broken by (left, right): (b,c) before (c,a)
    assert out == {("a", "b"): (3, 1), ("b", "c"): (2, 2), ("c", "a"): (2, 3)}


def test_bpe_pair_repeated_within_word(spark):
    # 'aaa' has (a,a) at two positions -> counts twice per occurrence
    docs = _docs(spark, [(0, "aaa aaa")])
    out = {
        (r["left_sym"], r["right_sym"]): r["pair_count"]
        for r in C.bpe_pair_counts(docs, top_k=5).collect()
    }
    assert out == {("a", "a"): 4}


def test_sparse_cosine_pairs_model(spark):
    import math

    from sparkclif.operators.similarity import sparse_cosine_pairs

    # 4 docs; 'common' appears in ALL docs (df 100%) -> capped out at
    # the 80% cap, while a/b/z (df <= 75%) survive;
    # remaining vectors: d0 = {a:2, b:1}, d1 = {a:1, b:2}, d2 = {z:1},
    # d3 = {a:1, b:1}  (d2 shares no surviving term with anyone)
    docs = _docs(
        spark,
        [
            (0, "common a a b"),
            (1, "common a b b"),
            (2, "common z"),
            (3, "common a b"),
        ],
    )
    got = {
        (r["id_a"], r["id_b"]): (r["dot"], r["cosine"])
        for r in sparse_cosine_pairs(docs, tau=0.5, df_cap_pct=80).collect()
    }

    def cos(u, v):
        dot = sum(a * b for a, b in zip(u, v))
        return dot, round(dot / (math.sqrt(sum(a * a for a in u)) * math.sqrt(sum(b * b for b in v))), 4)

    assert got == {
        (0, 1): cos((2, 1), (1, 2)),   # 4/5 = 0.8
        (0, 3): cos((2, 1), (1, 1)),   # 3/(sqrt5*sqrt2)
        (1, 3): cos((1, 2), (1, 1)),
    }
    # d2 pairs with nobody (its only surviving term is unique)
    assert not any(2 in p for p in got)


def test_pq_encode_numpy_model(spark):
    """pq_encode == numpy reference: same integer basis, md5-ordered
    codebook, (dist, code) tiebreak."""
    import hashlib

    import numpy as np

    from sparkclif.io import table
    from sparkclif.operators.quantize import pq_encode

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = [r["vec_id"] for r in rows]
    q = np.floor(
        np.vstack([np.array(r["embedding"], dtype=np.float32) for r in rows]).astype(
            np.float64
        )
        * 10_000
    ).astype(np.int64)
    order = sorted(
        range(len(ids)),
        key=lambda i: (hashlib.md5(f"pq|{ids[i]}".encode()).hexdigest(), ids[i]),
    )[:16]
    want = {}
    for i, vid in enumerate(ids):
        for sub in range(8):
            sv = q[i, sub * 8 : (sub + 1) * 8]
            best = min(
                (int(((sv - q[order[c], sub * 8 : (sub + 1) * 8]) ** 2).sum()), c)
                for c in range(16)
            )
            want[(vid, sub)] = (best[1], best[0])
    got = {
        (r["vec_id"], r["sub"]): (r["code"], r["dist_sq"])
        for r in pq_encode(emb).collect()
    }
    assert got == want


def test_pq_encode_empty_input(spark):
    """Zero input rows must yield an empty typed result, not an
    analysis error (the all-literal empty codebook would type as
    array<void> without the guard)."""
    from sparkclif.operators.quantize import pq_encode

    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    out = pq_encode(empty)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "vec_id", "sub", "code", "dist_sq",
    ]


def test_resize_media_short_and_model(spark):
    """resize_media == numpy model; payloads shorter than target hit
    only the buckets the closed-form map produces; empty payloads
    emit nothing."""
    import numpy as np

    from sparkclif.operators.multimodal import resize_media

    rows = [(0, "abcdef"), (1, "xy"), (2, "")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from sparkclif.operators.multimodal import attach_fake_media

    out = {}
    for r in resize_media(attach_fake_media(docs), target=4).collect():
        out[(r["doc_id"], r["bucket"])] = (r["pooled"], r["n_in_bucket"], r["n_bytes"])
    want = {}
    for doc_id, text in rows:
        arr = np.frombuffer(text.encode(), dtype=np.uint8).astype(np.int64)
        n = len(arr)
        if n == 0:
            continue
        b = (np.arange(n) * 4) // n
        for bb in sorted(set(b)):
            seg = arr[b == bb]
            want[(doc_id, int(bb))] = (int(seg.sum() // len(seg)), len(seg), n)
    assert out == want
    assert not any(k[0] == 2 for k in out)


def test_bpe_and_sparse_partition_invariance(spark, sf_dir):
    """Integer aggregations must be partition-order-proof: the BPE
    top-20 and the sparse-cosine pair set are identical at 1 and 13
    partitions."""
    from sparkclif.operators.similarity import sparse_cosine_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for op in (
        lambda d: C.bpe_pair_counts(d, top_k=20),
        lambda d: sparse_cosine_pairs(d, tau=0.5, df_cap_pct=20),
    ):
        a = sorted(tuple(r) for r in op(docs.coalesce(1)).collect())
        b = sorted(tuple(r) for r in op(docs.repartition(13)).collect())
        assert a == b


def test_cube_lattice_shape(spark, sf_dir):
    """d_agg_cube: the four grouping levels exist with consistent
    totals — gid 0 = detail cells, gid 1/2 = one-dim margins whose
    counts each sum to the gid-3 grand total."""
    from sparkclif.registry import all_queries

    rows = all_queries()["d_agg_cube"].fn(spark, sf_dir).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    assert set(by_gid) == {0, 1, 2, 3}
    total = by_gid[3][0]["n"]
    assert len(by_gid[3]) == 1
    for gid in (0, 1, 2):
        assert sum(r["n"] for r in by_gid[gid]) == total
    # margin rows carry NULL on exactly the grouped-out column
    assert all(r["l_linestatus"] is None for r in by_gid[1])
    assert all(r["l_returnflag"] is None for r in by_gid[2])
