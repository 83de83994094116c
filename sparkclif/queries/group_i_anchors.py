"""Group I anchors — exact-SQL-checkable companions for the three
approximate ANN/dedup queries that are rows-only by construction
(i_dedup_minhash, i_sim_lsh_ann, i_sim_ivf use seeded xxhash64 /
numpy RNG planes / k-means, none of which DuckDB can reproduce).

Each anchor swaps ONLY the non-portable ingredient for the
engine-portable md5 basis (operators/hashing.py) or for integer
arithmetic, then runs the SAME distributed shape as its approximate
sibling — so the driver's hash check covers the banding / bucketing /
assignment machinery end-to-end, the way i_dedup_simhash's exact md5
oracle covers the simhash kernel:

- i_dedup_minhash_anchor: portable 8-lane min-over-shingle-md5
  signatures fed through the REAL ``minhash_candidate_pairs``
  operator (band slicing, bucket groupBy, skew cap, in-bucket pair
  gen, cross-band dedup). Bucket membership is band-slice equality,
  so the SQL restatement never needs xxhash64.
- i_sim_lsh_bucket_stats: random-hyperplane bucketing with
  Rademacher (+/-1) planes derived from md5 parity and vectors
  quantized to integer basis points — the sign/pack/bucket/histogram
  pipeline of lsh_ann with order-independent integer dots (a float
  dot's sum order is not cross-engine stable; an integer sum is).
- i_sim_ivf_assign_stats: the IVF ASSIGN phase (broadcast centroids,
  Arrow-batched argmax kernel) against deterministic centroids (the 8
  lowest-id vectors) with integer-quantized dot products, ties to the
  lowest centroid id.

Quantization uses floor(v * 10000): floor of an identical IEEE double
is identical in both engines, where round() diverges on
shortest-decimal boundaries (see i_dedup_keep_best's oracle note).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkclif.io import spread_by_bytes, table
from sparkclif.operators import dedup as D
from sparkclif.operators.hashing import md5_bits
from sparkclif.operators.text import word_shingles
from sparkclif.registry import register

N_LANES = 8  # portable minhash lanes (anchor-sized; production uses 32)
N_PLANES = 8  # Rademacher hyperplanes -> 256 buckets
N_DIM = 64
N_CENTROIDS = 8
QUANT = 10_000.0  # basis points

# Universal-hash lane constants for the portable minhash: lane value =
# (a_l * h + b_l) mod P over the 32-bit md5 base hash h. Everything
# stays under 2^63 (a < 2^30, h < 2^32 => a*h + b < 2^62 + 2^61), so
# BIGINT arithmetic is exact and identical in Spark, numpy, and
# DuckDB. Constants are md5-derived (public hashlib) and inlined into
# the oracle SQL below at import; P = 2^61 - 1 (Mersenne prime).
MINHASH_P = (1 << 61) - 1


def _lane_const(tag: str, lane: int, mod: int, min_val: int) -> int:
    h = hashlib.md5(f"minhash{tag}:{lane}".encode()).hexdigest()
    return max(int(h[:15], 16) % mod, min_val)


MINHASH_A = [_lane_const("A", l, 1 << 30, 1) for l in range(N_LANES)]
MINHASH_B = [_lane_const("B", l, MINHASH_P, 0) for l in range(N_LANES)]


def _rademacher_sign(plane: int, dim: int) -> int:
    """+1/-1 from the parity of the LAST hex char of
    md5('plane{b}:{d}') — the same value DuckDB computes as
    ('0x' || substr(md5(...), 32, 1))::INT % 2. Plain public hashlib;
    the oracle recomputes it independently, so a driver hash-green IS
    the cross-engine proof."""
    h = hashlib.md5(f"plane{plane}:{dim}".encode()).hexdigest()
    return 1 if int(h[31], 16) % 2 == 0 else -1


@register(
    "i_dedup_minhash_anchor",
    # Exact restatement: lane l of a doc's signature is
    # min over shingles of (a_l * h + b_l) mod P, h = the low 32 md5
    # bits of the shingle (ONE md5 per shingle — the same two-stage
    # O(shingles), not O(shingles * k), shape as production minhash);
    # a candidate pair is two docs sharing an identical 4-lane band
    # slice in a bucket of size [2, 256]; est_jaccard = lane
    # agreement / 8 (k/8 is exactly representable, so round(_, 4) is
    # stable).
    oracle=f"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               unnest([array_to_string(toks[i:i+2], ' ')
                       for i in range(1, greatest(len(toks) - 2, 0) + 1)]) AS shingle
        FROM toks
    ),
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(shingle), 25, 8))::BIGINT AS h
        FROM sh
    ),
    lanes AS (
        SELECT * FROM (VALUES {", ".join(
            f"({l}, {MINHASH_A[l]}, {MINHASH_B[l]})" for l in range(N_LANES)
        )}) AS t(lane, a, b)
    ),
    mins AS (
        SELECT doc_id, l.lane, min((l.a * h + l.b) % {MINHASH_P}) AS v
        FROM hashed CROSS JOIN lanes l
        GROUP BY doc_id, l.lane
    ),
    sigs AS (
        SELECT doc_id, list(v ORDER BY lane) AS sig FROM mins GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, sig, b.band, sig[b.band * 4 + 1 : b.band * 4 + 4] AS bslice
        FROM sigs CROSS JOIN (SELECT unnest(range(2)) AS band) b
    ),
    bsize AS (
        SELECT band, bslice, count(*) AS n FROM bands GROUP BY band, bslice
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                        a.sig AS sig_a, b.sig AS sig_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bslice = b.bslice
                        AND b.doc_id > a.doc_id
        JOIN bsize s ON s.band = a.band AND s.bslice = a.bslice
        WHERE s.n BETWEEN 2 AND 256
    )
    SELECT id_a, id_b,
           round(count(*) FILTER (WHERE sig_a[l.i] = sig_b[l.i]) / 8.0, 4)
               AS est_jaccard
    FROM cand CROSS JOIN (SELECT unnest(range(1, 9)) AS i) l
    GROUP BY id_a, id_b
    """,
)
def i_dedup_minhash_anchor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH banding with PORTABLE signatures: the real
    ``minhash_candidate_pairs`` operator (band slice -> bucket groupBy
    -> skew-capped in-bucket pair gen -> cross-band dedup) fed 8-lane
    signatures built exactly like production minhash_signatures —
    base hash once per shingle scan-side (JVM md5, but the PORTABLE
    low-32-bit basis instead of xxhash64), then all lanes as one
    vectorized numpy remix ((a*h+b) mod P universal hashing in exact
    int64) — turning the rows-only i_dedup_minhash machinery into a
    driver hash-checkable query. An earlier formulation evaluated
    md5('L{l}:'||shingle) per lane inside array lambdas: higher-order
    functions are interpreted, not codegen'd, and 8 interpreted md5
    chains per shingle measured 37 s at sf0.1 vs ~1 s for this shape."""
    import numpy as np
    import pandas as pd

    docs = spread_by_bytes(table(spark, sf_dir, "documents"))
    based = docs.select(
        "doc_id",
        F.transform(
            word_shingles(F.col("text"), 3), lambda s: md5_bits(s, 25, 8)
        ).alias("__h"),
    )
    a_vec = np.array(MINHASH_A, dtype=np.int64)
    b_vec = np.array(MINHASH_B, dtype=np.int64)

    def remix_min(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, sigs = [], []
            for did, h in zip(batch["doc_id"], batch["__h"]):
                if h is None or len(h) == 0:
                    continue  # too short to shingle: no signature
                base = np.asarray(h, dtype=np.int64)
                # a*h + b < 2^62 + 2^61: exact in int64, no wraparound
                mixed = (base[:, None] * a_vec[None, :] + b_vec[None, :]) % MINHASH_P
                ids.append(did)
                sigs.append(mixed.min(axis=0))
            yield pd.DataFrame({"doc_id": ids, "signature": sigs})

    sigs = based.mapInPandas(remix_min, "doc_id long, signature array<long>")
    return D.minhash_candidate_pairs(
        sigs, num_bands=2, max_bucket=256, num_hashes=N_LANES
    )


@register(
    "i_sim_lsh_bucket_stats",
    # Exact restatement of the bucketing pipeline: per plane b, the
    # sign bit of sum_d sign(b,d) * floor(v[d] * 10000) (an integer
    # dot — order-independent, unlike a float sum); bucket = packed
    # bits; output the per-vector bucket plus the bucket-size
    # histogram (the quantity lsh_ann's plane-count auto-sizing
    # controls).
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    signs AS (
        SELECT p.b, d.d,
               CASE WHEN ('0x' || substr(md5('plane' || CAST(p.b AS VARCHAR) || ':'
                                             || CAST(d.d - 1 AS VARCHAR)), 32, 1))
                         ::INT % 2 = 0
                    THEN 1 ELSE -1 END AS s
        FROM (SELECT unnest(range(8)) AS b) p
        CROSS JOIN (SELECT unnest(range(1, 65)) AS d) d
    ),
    dots AS (
        SELECT e.vec_id, s.b,
               sum(s.s * CAST(floor(e.v[s.d] * 10000) AS BIGINT)) AS dot
        FROM e CROSS JOIN signs s
        GROUP BY e.vec_id, s.b
    ),
    bk AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN dot >= 0 THEN (1::BIGINT << b) ELSE 0 END)
                    AS BIGINT) AS bucket
        FROM dots GROUP BY vec_id
    )
    SELECT vec_id, bucket,
           CAST(count(*) OVER (PARTITION BY bucket) AS BIGINT) AS bucket_size
    FROM bk
    """,
)
def i_sim_lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH bucket assignment + bucket-size histogram with md5-derived
    Rademacher planes and integer-quantized vectors — the exact-SQL
    anchor for i_sim_lsh_ann's sign/pack/bucket machinery, run as the
    SAME kernel shape lsh_ann uses: one Arrow-batched matmul against
    the broadcast (planes, dim) sign matrix (int64: floor-quantized
    components x +/-1 planes — exact, order-independent, so the SQL
    restatement is bit-identical). Scan-side; the only shuffle is the
    bucket-size window. (An expression formulation — one interpreted
    zip_with+aggregate per plane — measured ~4x slower: higher-order
    lambdas don't codegen.)"""
    import numpy as np
    import pandas as pd

    emb = table(spark, sf_dir, "embeddings")
    signs = np.array(
        [[_rademacher_sign(b, d) for d in range(N_DIM)] for b in range(N_PLANES)],
        dtype=np.int64,
    )
    powers = (1 << np.arange(N_PLANES)).astype(np.int64)
    bc = emb.sparkSession.sparkContext.broadcast((signs, powers))

    def bucket_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sg, pw = bc.value
        for batch in batches:
            v_ids = batch["vec_id"].to_numpy()
            q = np.floor(
                np.vstack(batch["embedding"].to_numpy()).astype(np.float64) * QUANT
            ).astype(np.int64)
            bits = (q @ sg.T) >= 0  # integer dots: exact sign
            yield pd.DataFrame(
                {"vec_id": v_ids, "bucket": (bits.astype(np.int64) @ pw)}
            )

    buckets = emb.select("vec_id", "embedding").mapInPandas(
        bucket_kernel, "vec_id long, bucket long"
    )
    w = Window.partitionBy("bucket")
    return buckets.withColumn("bucket_size", F.count("*").over(w).cast("long"))


@register(
    "i_sim_ivf_assign_stats",
    cache_plan=False,  # builds the centroid broadcast at plan time
    # Exact restatement of the ASSIGN phase: nearest of 8
    # deterministic centroids (the lowest-id vectors) by integer-
    # quantized dot product, ties to the lowest centroid id.
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS c_id, v AS cv FROM e ORDER BY vec_id LIMIT 8),
    scores AS (
        SELECT e.vec_id, c.c_id,
               CAST(sum(CAST(floor(e.v[d.d] * 10000) AS BIGINT)
                        * CAST(floor(c.cv[d.d] * 10000) AS BIGINT))
                    AS BIGINT) AS score
        FROM e
        CROSS JOIN cent c
        CROSS JOIN (SELECT unnest(range(1, 65)) AS d) d
        GROUP BY e.vec_id, c.c_id
    )
    SELECT vec_id, c_id AS cluster, score
    FROM scores
    QUALIFY row_number() OVER (PARTITION BY vec_id
                               ORDER BY score DESC, c_id) = 1
    """,
)
def i_sim_ivf_assign_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ASSIGN anchor: every vector assigned to its nearest of 8
    deterministic centroids (lowest vec_ids) under integer-quantized
    dot products — the broadcast-centroids + Arrow-batched argmax
    kernel of ivf_ann, made exact-SQL-checkable. int64 matmul is
    exact; ties break to the lowest centroid id on both sides."""
    import numpy as np
    import pandas as pd

    emb = table(spark, sf_dir, "embeddings")
    cent_pdf = (
        emb.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(N_CENTROIDS)
        .toPandas()
        .sort_values("vec_id")
    )
    c_ids = cent_pdf["vec_id"].to_numpy()
    c_mat = np.floor(
        np.vstack(cent_pdf["embedding"].to_numpy()).astype(np.float64) * QUANT
    ).astype(np.int64)
    bc = emb.sparkSession.sparkContext.broadcast((c_ids, c_mat))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, cmat = bc.value
        for batch in batches:
            v_ids = batch["vec_id"].to_numpy()
            q = np.floor(
                np.vstack(batch["embedding"].to_numpy()).astype(np.float64) * QUANT
            ).astype(np.int64)
            scores = q @ cmat.T  # exact int64
            # argmax keeps the FIRST max -> lowest centroid id (cmat
            # rows are id-sorted) — the oracle's (score DESC, c_id) tie
            best = scores.argmax(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": v_ids,
                    "cluster": ids[best],
                    "score": scores[np.arange(len(v_ids)), best],
                }
            )

    return emb.select("vec_id", "embedding").mapInPandas(
        assign, "vec_id long, cluster long, score long"
    )


@register(
    "i_dedup_embedding_verify",
    # pure builder since the tag stage moved to Catalyst expressions
    # (no broadcast at build): plan-cacheable, and the 8x zip_with/
    # aggregate lambda analysis cost is paid once, not per run
    # Exact restatement of the VERIFY stage of the at-scale embedding
    # dedup (cosine_threshold_pairs_lsh): bucket by the md5-Rademacher
    # integer-sign machinery of i_sim_lsh_bucket_stats (one table, 8
    # planes), then within each bucket emit every (vec_a < vec_b) pair
    # whose exact quantized cosine clears tau. All sums are integers
    # <= 2^53, so even a double-typed sum is order-independent and
    # bit-identical across engines; the final dot/sqrt(na*nb) is one
    # deterministic IEEE expression on identical integer inputs.
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    dims AS (SELECT unnest(range(1, 65)) AS d),
    q AS (
        SELECT e.vec_id,
               [CAST(floor(e.v[d] * 10000) AS BIGINT)
                for d in range(1, 65)] AS qv
        FROM e
    ),
    qd AS (
        SELECT q.vec_id, d.d, q.qv[d.d] AS c FROM q CROSS JOIN dims d
    ),
    signs AS (
        SELECT p.b, d.d,
               CASE WHEN ('0x' || substr(md5('plane' || CAST(p.b AS VARCHAR) || ':'
                                             || CAST(d.d - 1 AS VARCHAR)), 32, 1))
                         ::INT % 2 = 0
                    THEN 1 ELSE -1 END AS s
        FROM (SELECT unnest(range(8)) AS b) p
        CROSS JOIN dims d
    ),
    dots AS (
        SELECT qd.vec_id, s.b, sum(s.s * qd.c) AS dot
        FROM qd JOIN signs s ON s.d = qd.d
        GROUP BY qd.vec_id, s.b
    ),
    bk AS (
        SELECT vec_id,
               CAST(sum(CASE WHEN dot >= 0 THEN (1::BIGINT << b) ELSE 0 END)
                    AS BIGINT) AS bucket
        FROM dots GROUP BY vec_id
    ),
    nrm AS (
        SELECT vec_id,
               CAST(list_sum([qv[i] * qv[i] for i in range(1, 65)]) AS BIGINT)
                   AS nq
        FROM q
    ),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket,
               CAST(list_sum([qa.qv[i] * qb.qv[i] for i in range(1, 65)])
                    AS BIGINT) AS dot
        FROM bk a
        JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
        JOIN q qa ON qa.vec_id = a.vec_id
        JOIN q qb ON qb.vec_id = b.vec_id
    )
    SELECT p.vec_a, p.vec_b, p.bucket,
           CAST(p.dot AS DOUBLE)
               / sqrt(CAST(na.nq AS DOUBLE) * CAST(nb.nq AS DOUBLE)) AS cos_q
    FROM pairs p
    JOIN nrm na ON na.vec_id = p.vec_a
    JOIN nrm nb ON nb.vec_id = p.vec_b
    WHERE CAST(p.dot AS DOUBLE)
              / sqrt(CAST(na.nq AS DOUBLE) * CAST(nb.nq AS DOUBLE)) >= 0.2
    """,
)
def i_dedup_embedding_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-checkable anchor for ``i_dedup_embedding_at_scale``'s
    verify stage (VERDICT r4 item 8): the SAME two-phase distributed
    shape as ``cosine_threshold_pairs_lsh`` — an Arrow-batched scan
    tags every vector into a hyperplane bucket, a bucket groupBy
    shuffles (id, bucket, vector), and a per-bucket members x members
    BLAS matmul emits only the (vec_a < vec_b, cos >= tau) pairs —
    but with the engine-portable ingredients of
    ``i_sim_lsh_bucket_stats`` (md5-parity Rademacher planes, vectors
    floor-quantized to integer basis points) instead of seeded numpy
    Gaussians, so every emitted pair and its cosine is bit-identical
    to the SQL restatement. Integer Gram matrix stays under 2^53
    (|qv| <= 1e4, 64 dims => |dot| <= 6.4e9), so the float division
    is one exact-input IEEE op on both engines.

    The tag stage is pure JVM codegen (floor-quantize + 8 sign-dots as
    Catalyst ``aggregate``/``zip_with`` over plan-literal Rademacher
    rows): with integer arithmetic the bucket needs no BLAS, and
    keeping it JVM-side drops one Python exchange from the plan
    (measured 0.55 -> 0.38 s warm at sf0.1; at 100 TB the tag is scan-
    side work either way, but one fewer Arrow round-trip per row)."""
    import numpy as np
    import pandas as pd

    emb = table(spark, sf_dir, "embeddings")
    signs = np.array(
        [[_rademacher_sign(b, d) for d in range(N_DIM)] for b in range(N_PLANES)],
        dtype=np.int64,
    )

    qv = F.transform(F.col("embedding"), lambda x: F.floor(x * F.lit(QUANT)).cast("long"))
    bucket = F.lit(0).cast("long")
    for b in range(N_PLANES):
        sg = F.array(*[F.lit(int(s)) for s in signs[b]])
        dot = F.aggregate(
            F.zip_with(F.col("qv"), sg, lambda x, s: x * s),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot >= 0, F.lit(1 << b)).otherwise(F.lit(0)).cast("long")

    tagged = emb.select("vec_id", qv.alias("qv")).withColumn("bucket", bucket)

    out_schema = "vec_a long, vec_b long, bucket long, cos_q double"
    _empty = {
        "vec_a": pd.Series(dtype="int64"),
        "vec_b": pd.Series(dtype="int64"),
        "bucket": pd.Series(dtype="int64"),
        "cos_q": pd.Series(dtype="float64"),
    }

    def verify(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # the group key is a COARSENED bucket hash (the lsh_ann trick:
        # grouped-map UDFs pay a fixed per-invocation cost; 2^planes
        # tiny buckets would each pay it) — iterate real buckets here
        frames = []
        for b, grp in pdf.groupby("bucket", sort=False):
            n = len(grp)
            if n < 2:
                continue
            order = grp["vec_id"].to_numpy().argsort()
            ids = grp["vec_id"].to_numpy()[order]
            qm = np.vstack(grp["qv"].to_numpy()).astype(np.int64)[order]
            gram = qm @ qm.T  # exact int64, |dot| <= 6.4e9 < 2^53
            nq = np.diag(gram).astype(np.float64)
            cos = gram / np.sqrt(nq[:, None] * nq[None, :])
            ia, ib = np.triu_indices(n, k=1)
            keep = cos[ia, ib] >= 0.2
            frames.append(
                pd.DataFrame(
                    {
                        "vec_a": ids[ia[keep]],
                        "vec_b": ids[ib[keep]],
                        "bucket": np.full(int(keep.sum()), b, dtype=np.int64),
                        "cos_q": cos[ia, ib][keep],
                    }
                )
            )
        if not frames:
            return pd.DataFrame(_empty)
        return pd.concat(frames, ignore_index=True)

    # coarse-group count: enough for shuffle parallelism, few enough
    # that the per-invocation grouped-map cost stays amortized. With
    # 2^N_PLANES = 256 real buckets the useful ceiling is 64; floor of
    # 16 keeps sf0.1 from paying 64 near-empty invocations.
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    n_coarse = max(16, min(64, parts))
    coarse = F.pmod(F.xxhash64("bucket"), F.lit(n_coarse)).alias("__coarse")
    return (
        tagged.withColumn("__coarse", coarse)
        .groupBy("__coarse")
        .applyInPandas(verify, out_schema)
    )


@register(
    "i_sim_ivf_probe_stats",
    cache_plan=False,  # builds the centroid broadcast at plan time
    # the candidate-dot CTE expands probe x posting x 64 dims; exact
    # but heavy as a TIMED baseline at sf0.1 — correctness-only
    oracle_in_bench=False,
    # Exact restatement of the SEARCH phase: each vector probes its 2
    # nearest of 8 deterministic centroids (integer-quantized scores,
    # ties to the lowest centroid id); candidates are the postings of
    # the probed clusters (every vector posts to its argmax cluster);
    # top-3 candidates per query by exact integer dot, ties to the
    # lowest neighbor id. A (query, neighbor) pair meets at most once
    # (a posting lives in exactly one cluster), so no dedup stage.
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS c_id, v AS cv FROM e ORDER BY vec_id LIMIT 8),
    scores AS (
        SELECT e.vec_id, c.c_id,
               CAST(sum(CAST(floor(e.v[d.d] * 10000) AS BIGINT)
                        * CAST(floor(c.cv[d.d] * 10000) AS BIGINT))
                    AS BIGINT) AS score
        FROM e
        CROSS JOIN cent c
        CROSS JOIN (SELECT unnest(range(1, 65)) AS d) d
        GROUP BY e.vec_id, c.c_id
    ),
    ranked AS (
        SELECT vec_id, c_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY score DESC, c_id) AS pr
        FROM scores
    ),
    posting AS (SELECT vec_id, c_id AS cluster FROM ranked WHERE pr = 1),
    probe AS (SELECT vec_id, c_id AS cluster FROM ranked WHERE pr <= 2),
    cand AS (
        SELECT pr.vec_id, po.vec_id AS neighbor_id,
               CAST(sum(CAST(floor(eq.v[d.d] * 10000) AS BIGINT)
                        * CAST(floor(en.v[d.d] * 10000) AS BIGINT))
                    AS BIGINT) AS dot
        FROM probe pr
        JOIN posting po ON po.cluster = pr.cluster AND po.vec_id <> pr.vec_id
        JOIN e eq ON eq.vec_id = pr.vec_id
        JOIN e en ON en.vec_id = po.vec_id
        CROSS JOIN (SELECT unnest(range(1, 65)) AS d) d
        GROUP BY pr.vec_id, po.vec_id
    )
    SELECT vec_id, neighbor_id, dot, CAST(rn AS INT) AS rank
    FROM (SELECT vec_id, neighbor_id, dot,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY dot DESC, neighbor_id) AS rn
          FROM cand)
    WHERE rn <= 3
    """,
)
def i_sim_ivf_probe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF SEARCH anchor (VERDICT r5 item 8): the cogrouped
    per-cluster probe machinery of ivf_ann — postings.groupBy(cluster)
    cogrouped with probes.groupBy(cluster), per-cluster BLAS top-k,
    single-shuffle global merge — driven on deterministic centroids
    (the 8 lowest vec_ids) with integer-quantized dot products, so the
    whole phase is exact-SQL-checkable. Completes the anchor set:
    i_sim_ivf_assign_stats covers ASSIGN, this covers PROBE+SEARCH+
    MERGE. int64 matmuls are exact (|component| <= 10^4, 64 dims =>
    |dot| <= 6.4e9); all ties break to the lowest id on both sides."""
    import numpy as np
    import pandas as pd

    n_probe, k = 2, 3
    emb = table(spark, sf_dir, "embeddings")
    cent_pdf = (
        emb.select("vec_id", "embedding")
        .orderBy("vec_id")
        .limit(N_CENTROIDS)
        .toPandas()
        .sort_values("vec_id")
    )
    c_ids = cent_pdf["vec_id"].to_numpy()
    c_mat = np.floor(
        np.vstack(cent_pdf["embedding"].to_numpy()).astype(np.float64) * QUANT
    ).astype(np.int64)
    bc = emb.sparkSession.sparkContext.broadcast((c_ids, c_mat))

    def assign(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        ids, cmat = bc.value
        for batch in batches:
            v_ids = batch["vec_id"].to_numpy()
            q = np.floor(
                np.vstack(batch["embedding"].to_numpy()).astype(np.float64) * QUANT
            ).astype(np.int64)
            scores = q @ cmat.T  # exact int64
            # stable argsort of -scores: equal scores keep matrix
            # order = ascending centroid id (the oracle's tiebreak)
            order = np.argsort(-scores, axis=1, kind="stable")
            frames = [
                pd.DataFrame(
                    {
                        "cluster": ids[order[:, 0]],
                        "vec_id": v_ids,
                        "qv": list(q),
                        "is_query": np.zeros(len(v_ids), dtype=bool),
                    }
                )
            ]
            for p in range(n_probe):
                frames.append(
                    pd.DataFrame(
                        {
                            "cluster": ids[order[:, p]],
                            "vec_id": v_ids,
                            "qv": list(q),
                            "is_query": np.ones(len(v_ids), dtype=bool),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    tagged = emb.select("vec_id", "embedding").mapInPandas(
        assign, "cluster long, vec_id long, qv array<long>, is_query boolean"
    )
    # ONE grouped kernel, probes/postings split inside it (optimization
    # r12; same rewrite as ivf_ann): the old two-branch cogroup ran the
    # Python assign kernel twice over the corpus — the is_query filters
    # sat between the kernel and the two exchanges, so no subtree was
    # reusable. Same shuffle bytes, identical per-cluster computation.
    def search(pdf: "pd.DataFrame") -> "pd.DataFrame":
        probe_pdf = pdf[pdf["is_query"]]
        post_pdf = pdf[~pdf["is_query"]]
        if probe_pdf.empty or post_pdf.empty:
            return pd.DataFrame(columns=["vec_id", "neighbor_id", "dot"])
        q_ids = probe_pdf["vec_id"].to_numpy()
        q = np.vstack(probe_pdf["qv"].to_numpy())
        p_ids = post_pdf["vec_id"].to_numpy()
        p = np.vstack(post_pdf["qv"].to_numpy())
        dots = q @ p.T  # exact int64
        rows = []
        for i, qid in enumerate(q_ids):
            row = dots[i]
            cand = np.nonzero(p_ids != qid)[0]
            if len(cand) == 0:
                continue
            top = cand[np.lexsort((p_ids[cand], -row[cand]))][: min(k, len(cand))]
            for j in top:
                rows.append((qid, p_ids[j], int(row[j])))
        return pd.DataFrame(rows, columns=["vec_id", "neighbor_id", "dot"])

    local = tagged.groupBy("cluster").applyInPandas(
        search, "vec_id long, neighbor_id long, dot long"
    )
    # single-shuffle global merge (ivf_ann's shape): per query, order +
    # top-k inside array expressions over the <= k * n_probe candidates
    cand = F.struct((-F.col("dot")).alias("negd"), F.col("neighbor_id").alias("nid"))
    merged = local.groupBy("vec_id").agg(
        F.slice(F.array_sort(F.collect_list(cand)), 1, k).alias("__top")
    )
    return merged.select(
        "vec_id", F.posexplode("__top").alias("__pos", "__s")
    ).select(
        "vec_id",
        F.col("__s.nid").alias("neighbor_id"),
        (-F.col("__s.negd")).cast("long").alias("dot"),
        (F.col("__pos") + 1).cast("int").alias("rank"),
    )
