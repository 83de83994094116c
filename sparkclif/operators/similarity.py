"""Similarity search over embedding columns (SURVEY.md §2.2 group I:
i_sim_cosine_topk, i_sim_lsh_ann).

Scale design (100 TB regime):
- Brute-force top-k: the query side is broadcast as a dense numpy
  matrix; each executor partition computes a float64 BLAS matmul over
  its Arrow batch (mapInPandas) and emits only its block-local top-k.
  A final window pass merges block winners -> global top-k. Cost:
  one broadcast + one scan + one (tiny) shuffle of k rows per vector.
  Never a |N|x|N| row blowup.
- LSH ANN: seeded random-hyperplane signatures bucket vectors;
  candidates only meet inside a bucket (equi-join on the signature),
  then exact cosine re-rank per candidate set. The bucket join is the
  only shuffle; plane count trades recall vs bucket size (at 100 TB:
  multiple OR-ed tables, each AND-ing ~16 bits).

Determinism: fixed seed for planes, ties broken by neighbor id.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOPK_SCHEMA = "vec_id long, neighbor_id long, cosine double"

# Plan-stats bound for the exact broadcast variants: below it the full
# (ids, matrix) comfortably fits the driver and every executor (64 MB
# of plan bytes ~ 130k x dim-64 float64 vectors ~ 67 MB dense); above
# it cosine_topk / cosine_threshold_pairs auto-route to their LSH
# scale paths instead of OOMing the driver on toPandas(). force=
# pins a path (tests, or a caller that KNOWS recall-1 is required).
EXACT_BROADCAST_BYTES = 64 * 1024 * 1024


def _dispatch_exact(embeddings: DataFrame, force: str | None) -> str:
    """Shared cost dispatch for the exact-broadcast variants, the same
    plan-stats rule as rank.exact_percentiles / corpus.segment_dedup
    (VERDICT r5 item 2): optimizer row/size estimate vs a fixed bound.
    The estimate can under-read post-filter inputs (see
    sampling.py:172 note) — force="broadcast" / "lsh" overrides.

    UNLIKE the other dispatchers, the two paths here are NOT
    result-identical: "lsh" is approximate (bucketed recall < 1).
    That applies to spark.sparkclif.forceDistributed too — the
    fleet-wide override routes these variants to LSH, trading exact
    results for not OOMing the driver; a caller that requires
    recall-1 regardless pins force="broadcast" (and owns the
    broadcast-bound memory implications)."""
    from sparkclif.operators.rank import plan_size_bytes, validate_force

    validate_force(force, {"broadcast", "lsh"})
    if force is None:
        size = plan_size_bytes(embeddings)
        # Long.MaxValue = Catalyst's no-stats sentinel (in-memory
        # local relations, some non-file sources). UNKNOWN stays on
        # the exact path: auto-routing to LSH would silently change
        # semantics (approximate subset) on a toy input, the worse
        # failure mode — file/catalog sources always carry real stats,
        # so the 100 TB case still dispatches.
        if size >= (1 << 63) - 1:
            size = 0
        force = "broadcast" if size <= EXACT_BROADCAST_BYTES else "lsh"
    return force


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _topk_det(row: np.ndarray, cand: np.ndarray, ids: np.ndarray, take: int) -> np.ndarray:
    """Deterministic top-``take`` of ``cand`` (indices into row/ids) by
    (value desc, id asc) INCLUDING the k-boundary: bare argpartition
    keeps an arbitrary subset of candidates tied at the kth value (by
    matrix position), so duplicate embeddings could return a different
    neighbor SET than the oracle's ORDER BY cosine DESC, id ASC.
    Strictly-above-threshold candidates are all kept; ties at the
    threshold are filled in id order."""
    part = cand[np.argpartition(-row[cand], take - 1)[:take]]
    kth = row[part].min()
    above = cand[row[cand] > kth]
    tied = cand[row[cand] == kth]
    tied = tied[np.argsort(ids[tied], kind="stable")][: take - len(above)]
    part = np.concatenate([above, tied])
    return part[np.lexsort((ids[part], -row[part]))]


def cosine_topk(
    embeddings: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    force: str | None = None,
    **lsh_kwargs,
) -> DataFrame:
    """Exact cosine top-k self-join via broadcast + block matmul.

    Per Arrow batch: float64 matmul against the broadcast matrix,
    block-local top-k per row (argpartition, O(N) per row), then a
    global window merge. Self-matches excluded.

    Cost-dispatched: inputs past EXACT_BROADCAST_BYTES route to
    ``lsh_ann`` (same output schema; approximate — recall follows the
    LSH collision probability, concentrated on the high-cosine
    neighbors that matter) instead of collecting a larger-than-driver
    table. ``force`` ("broadcast" | "lsh") pins a path;
    ``lsh_kwargs`` (n_tables, dim, seed, ...) pass through."""
    if _dispatch_exact(embeddings, force) == "lsh":
        return lsh_ann(embeddings, k=k, id_col=id_col, vec_col=vec_col, **lsh_kwargs)
    spark = embeddings.sparkSession
    pdf = embeddings.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = _normalize(np.vstack(pdf[vec_col].to_numpy()).astype(np.float64))
    bc = spark.sparkContext.broadcast((ids, mat))

    def block_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat = bc.value
        for batch in batches:
            q_ids = batch[id_col].to_numpy()
            q = _normalize(np.vstack(batch[vec_col].to_numpy()).astype(np.float64))
            sims = q @ all_mat.T  # |batch| x |N| float64 BLAS
            out_rows = []
            for row_i, qid in enumerate(q_ids):
                row = sims[row_i]
                mask = all_ids != qid
                cand_idx = np.nonzero(mask)[0]
                if len(cand_idx) == 0:
                    continue
                take = min(k, len(cand_idx))
                part = _topk_det(row, cand_idx, all_ids, take)
                for j in part:
                    out_rows.append((qid, all_ids[j], float(row[j])))
            yield pd.DataFrame(out_rows, columns=["vec_id", "neighbor_id", "cosine"])

    blocks = embeddings.select(id_col, vec_col).mapInPandas(block_topk, TOPK_SCHEMA)
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        blocks.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("vec_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rn")
    )


def _lsh_tag(
    embeddings: DataFrame,
    *,
    n_planes: int | None,
    n_tables: int,
    dim: int,
    seed: int,
    target_bucket: int,
    id_col: str,
    vec_col: str,
    n_rows: int | None,
    broadcast_vectors: bool | None,
) -> tuple[DataFrame, object, int]:
    """Shared LSH bucketing front-end (lsh_ann + the at-scale
    threshold-pairs candidate generator): one scan computes ALL
    tables' random-hyperplane signature bits in a single BLAS matmul
    against the broadcast plane matrix and emits (table_id, bucket,
    id[, normalized vec]) tags. Returns (tagged_df, bc_vecs,
    n_planes): bc_vecs is the broadcast (ids, matrix) when vectors fit
    the broadcast bound (then only 3-long tags cross the bucket
    shuffle), else None and each tag carries its normalized vector."""
    spark = embeddings.sparkSession
    rng = np.random.RandomState(seed)
    n = n_rows
    if n_planes is None:
        # n_rows lets callers supply a metadata-cheap count (counting
        # THIS df would run its whole lineage, e.g. a spread() shuffle)
        n = n_rows if n_rows is not None else embeddings.count()
        n_planes = max(4, int(np.ceil(np.log2(max(n / target_bucket, 2)))))
        n_planes = min(n_planes, 62)
    if broadcast_vectors is None:
        broadcast_vectors = n is not None and n * dim <= 4_000_000
    # same rng stream as drawing each table's (n_planes, dim) in turn
    planes = rng.normal(size=(n_tables, n_planes, dim))
    powers = (1 << np.arange(n_planes)).astype(np.int64)
    bc = spark.sparkContext.broadcast((planes.reshape(n_tables * n_planes, dim), powers))

    bc_vecs = None
    if broadcast_vectors:
        vpdf = embeddings.select(id_col, vec_col).toPandas()
        v_ids = vpdf[id_col].to_numpy()
        v_mat = _normalize(np.vstack(vpdf[vec_col].to_numpy()).astype(np.float64))
        bc_vecs = spark.sparkContext.broadcast((v_ids, v_mat))

    resolved_planes = n_planes

    def signature_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        flat_planes, pw = bc.value
        for batch in batches:
            b_ids = batch[id_col].to_numpy()
            q = _normalize(np.vstack(batch[vec_col].to_numpy()).astype(np.float64))
            # (|batch|, tables*planes) dots -> sign bits -> packed longs
            bits = (q @ flat_planes.T) > 0
            sigs = bits.reshape(len(b_ids), n_tables, resolved_planes) @ pw
            frames = []
            for t in range(n_tables):
                cols = {
                    "table_id": np.full(len(b_ids), t, dtype=np.int64),
                    "bucket": sigs[:, t],
                    "vec_id": b_ids,
                }
                if not broadcast_vectors:
                    cols["nv"] = list(q)
                frames.append(pd.DataFrame(cols))
            yield pd.concat(frames, ignore_index=True)

    tag_schema = "table_id long, bucket long, vec_id long" + (
        "" if broadcast_vectors else ", nv array<double>"
    )
    tagged = embeddings.select(id_col, vec_col).mapInPandas(
        signature_kernel, tag_schema
    )
    return tagged, bc_vecs, n_planes


def lsh_ann(
    embeddings: DataFrame,
    k: int = 3,
    n_planes: int | None = None,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    target_bucket: int = 32,
    max_bucket: int = 1024,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
    broadcast_vectors: bool | None = None,
) -> DataFrame:
    """Approximate NN: bucket by random-hyperplane signatures, exact
    cosine re-rank within buckets (equi-join shuffle only).

    ``n_tables`` independent hash tables are OR-ed (standard LSH
    amplification): a pair is a candidate if it collides in ANY table.
    Each table AND-s ``n_planes`` bits.

    ``n_planes`` defaults to log2(N / target_bucket): in-bucket pair
    work is quadratic in bucket size, so a FIXED plane count blows up
    as the corpus grows (measured: 16x vectors -> 24x wall with 6
    planes). Scaling bits with corpus size holds expected bucket size
    — and therefore per-bucket work — constant; recall is then tuned
    with ``n_tables``.

    Both kernels are Arrow-batched BLAS (mapInPandas/applyInPandas):
    all tables' signature bits come from ONE matmul against the
    broadcast (tables*planes, dim) plane matrix, and each bucket
    re-ranks with one members x members matmul emitting only its local
    top-k — the same block-local-then-merge shape as cosine_topk.
    (The earlier per-pair zip_with/aggregate expression formulation
    interpreted ~dim lambda evals per pair and was 4-5x slower.)

    ``broadcast_vectors`` (auto below ~32 MB of vectors): ship only
    (table_id, bucket, id) through the bucket shuffle and let the
    re-rank kernel read members' vectors from a broadcast matrix —
    otherwise every vector crosses the wire n_tables times. Past the
    broadcast bound the carry-vectors plan is the scale path (vectors
    co-shuffle with their bucket; nothing is ever driver-sized)."""
    tagged, bc_vecs, _ = _lsh_tag(
        embeddings,
        n_planes=n_planes,
        n_tables=n_tables,
        dim=dim,
        seed=seed,
        target_bucket=target_bucket,
        id_col=id_col,
        vec_col=vec_col,
        n_rows=n_rows,
        broadcast_vectors=broadcast_vectors,
    )

    def bucket_topk(key, pdf: pd.DataFrame) -> pd.DataFrame:
        # the group key is a COARSENED bucket-hash (grouped-map UDFs
        # pay a fixed cost per invocation; thousands of ~8-row buckets
        # would drown in it) — iterate the real buckets in here
        if bc_vecs is not None:
            all_ids, all_mat = bc_vecs.value
            lookup = pd.Index(all_ids)
        rows = []
        for (_t, _b), grp in pdf.groupby(["table_id", "bucket"], sort=False):
            # oversized bucket: the hash carries no signal there —
            # drop it (skew/memory guard for the 100 TB regime)
            if len(grp) < 2 or len(grp) > max_bucket:
                continue
            m_ids = grp["vec_id"].to_numpy()
            if bc_vecs is not None:
                m = all_mat[lookup.get_indexer(m_ids)]
            else:
                m = np.vstack(grp["nv"].to_numpy())
            sims = m @ m.T
            np.fill_diagonal(sims, -np.inf)
            take = min(k, len(m_ids) - 1)
            for i, qid in enumerate(m_ids):
                row = sims[i]
                top = _topk_det(row, np.arange(len(row)), m_ids, take)
                for j in top:
                    rows.append((qid, m_ids[j], float(row[j])))
        return pd.DataFrame(rows, columns=["vec_id", "neighbor_id", "cosine"])

    # bucket-LOCAL re-rank: one groupBy shuffle; pairs leave the bucket
    # as (id, id, cosine) — never two dim-length vectors. Coarse key
    # keeps all rows of a (table, bucket) together while bounding the
    # number of kernel invocations.
    coarse = F.pmod(F.xxhash64("table_id", "bucket"), F.lit(64)).alias("__coarse")
    local = (
        tagged.withColumn("__coarse", coarse)
        .groupBy("__coarse")
        .applyInPandas(bucket_topk, TOPK_SCHEMA)
    )
    # global merge in ONE shuffle: per query vector, dedup + order +
    # top-k inside array expressions (candidates per vector are
    # bounded by k * n_tables, so the collected array is tiny). A
    # dropDuplicates + row_number window would shuffle twice. A pair
    # colliding in several tables yields bit-identical cosines (same
    # vectors, same dot), so struct-distinct is an exact dedup.
    cand = F.struct((-F.col("cosine")).alias("negc"), F.col("neighbor_id").alias("nid"))
    merged = local.groupBy("vec_id").agg(
        F.slice(
            F.array_sort(F.array_distinct(F.collect_list(cand))), 1, k
        ).alias("__top")
    )
    return merged.select(
        "vec_id", F.posexplode("__top").alias("__pos", "__s")
    ).select(
        "vec_id",
        F.col("__s.nid").alias("neighbor_id"),
        F.round(-F.col("__s.negc"), 4).alias("cosine"),
        (F.col("__pos") + 1).cast("int").alias("rn"),
    )


PAIRS_SCHEMA = "id_a long, id_b long, cosine double"


def cosine_threshold_pairs(
    embeddings: DataFrame,
    tau: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    force: str | None = None,
    **lsh_kwargs,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: every (id_a < id_b)
    with cosine >= tau. Broadcast + block matmul, same kernel shape as
    cosine_topk: each Arrow batch BLAS-multiplies against the broadcast
    matrix and emits ONLY qualifying pairs — the N^2 similarity matrix
    is never materialized as rows.

    Cost-dispatched: inputs past EXACT_BROADCAST_BYTES route to
    ``cosine_threshold_pairs_lsh`` (same schema; a precision-1 subset
    — every emitted pair is exact-verified in-bucket, recall is the
    LSH collision probability) instead of collecting a larger-than-
    driver table. ``force`` ("broadcast" | "lsh") pins a path;
    ``lsh_kwargs`` pass through.

    The kernel thresholds with a 1e-4 margin and the final filter
    applies round(cosine, 4) >= tau, so boundary pairs agree with a
    SQL oracle that rounds the same way."""
    if _dispatch_exact(embeddings, force) == "lsh":
        return cosine_threshold_pairs_lsh(
            embeddings, tau=tau, id_col=id_col, vec_col=vec_col, **lsh_kwargs
        )
    spark = embeddings.sparkSession
    pdf = embeddings.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = _normalize(np.vstack(pdf[vec_col].to_numpy()).astype(np.float64))
    bc = spark.sparkContext.broadcast((ids, mat))

    def block_pairs(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_ids, all_mat = bc.value
        for batch in batches:
            q_ids = batch[id_col].to_numpy()
            q = _normalize(np.vstack(batch[vec_col].to_numpy()).astype(np.float64))
            sims = q @ all_mat.T
            # only (id_a < id_b) and above the (margin-relaxed) threshold
            keep_q, keep_j = np.nonzero(
                (sims >= tau - 1e-4) & (q_ids[:, None] < all_ids[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": q_ids[keep_q],
                    "id_b": all_ids[keep_j],
                    "cosine": sims[keep_q, keep_j],
                }
            )

    blocks = embeddings.select(id_col, vec_col).mapInPandas(block_pairs, PAIRS_SCHEMA)
    return blocks.select(
        "id_a", "id_b", F.round("cosine", 4).alias("cosine")
    ).filter(F.col("cosine") >= tau)


def cosine_threshold_pairs_lsh(
    embeddings: DataFrame,
    tau: float = 0.4,
    n_planes: int | None = None,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
    target_bucket: int = 32,
    max_bucket: int = 4096,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_rows: int | None = None,
    broadcast_vectors: bool | None = None,
) -> DataFrame:
    """Embedding near-duplicate pairs PAST the broadcast bound: LSH
    buckets generate candidates, the exact cosine kernel verifies them
    in-bucket — the scale path ``cosine_threshold_pairs``'s docstring
    promises once one side no longer fits executor memory.

    Plan shape: one scan tags each vector into ``n_tables`` OR-ed
    hyperplane buckets (shared ``_lsh_tag`` front-end); one bucket
    groupBy shuffles tags (id-only when vectors broadcast, else tags
    carry their vector — nothing is ever driver-sized on that path);
    per bucket a members x members BLAS matmul emits only (id_a <
    id_b, cosine >= tau) pairs; one final groupBy dedups pairs that
    collided in several tables (bit-identical cosines, exact dedup).

    Semantics: a SUBSET of cosine_threshold_pairs with one-sided
    error — every emitted pair is exact-verified (precision 1.0);
    recall is the LSH collision probability (1-(1-p^planes)^tables,
    p = 1-theta/pi), concentrated on high-cosine pairs — the ones
    dedup keeps or drops. Parity + recall vs the broadcast path are
    pinned in tests/test_llm_ops.py; SCALE.md documents when each
    path engages."""
    tagged, bc_vecs, _ = _lsh_tag(
        embeddings,
        n_planes=n_planes,
        n_tables=n_tables,
        dim=dim,
        seed=seed,
        target_bucket=target_bucket,
        id_col=id_col,
        vec_col=vec_col,
        n_rows=n_rows,
        broadcast_vectors=broadcast_vectors,
    )

    def bucket_pairs(key, pdf: pd.DataFrame) -> pd.DataFrame:
        if bc_vecs is not None:
            all_ids, all_mat = bc_vecs.value
            lookup = pd.Index(all_ids)
        frames = []
        for (_t, _b), grp in pdf.groupby(["table_id", "bucket"], sort=False):
            # oversized bucket: hash carries no signal there — drop
            # (same skew/memory guard as lsh_ann, wider cap since
            # threshold output is bounded by qualifying pairs, not k)
            if len(grp) < 2 or len(grp) > max_bucket:
                continue
            m_ids = grp["vec_id"].to_numpy()
            if bc_vecs is not None:
                m = all_mat[lookup.get_indexer(m_ids)]
            else:
                m = np.vstack(grp["nv"].to_numpy())
            sims = m @ m.T
            keep_i, keep_j = np.nonzero(
                (sims >= tau - 1e-4) & (m_ids[:, None] < m_ids[None, :])
            )
            if len(keep_i):
                frames.append(
                    pd.DataFrame(
                        {
                            "id_a": m_ids[keep_i],
                            "id_b": m_ids[keep_j],
                            "cosine": sims[keep_i, keep_j],
                        }
                    )
                )
        if not frames:
            return pd.DataFrame(columns=["id_a", "id_b", "cosine"])
        return pd.concat(frames, ignore_index=True)

    coarse = F.pmod(F.xxhash64("table_id", "bucket"), F.lit(64)).alias("__coarse")
    local = (
        tagged.withColumn("__coarse", coarse)
        .groupBy("__coarse")
        .applyInPandas(bucket_pairs, PAIRS_SCHEMA)
    )
    # cross-table dedup: same pair => same vectors => bit-identical
    # cosine, so max() is an exact dedup; one shuffle of (id, id, cos)
    deduped = local.groupBy("id_a", "id_b").agg(F.max("cosine").alias("cosine"))
    return deduped.select(
        "id_a", "id_b", F.round("cosine", 4).alias("cosine")
    ).filter(F.col("cosine") >= tau)


def ivf_ann(
    embeddings: DataFrame,
    k: int = 3,
    n_clusters: int | None = None,
    n_probe: int = 2,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_train: int = 65_536,
) -> DataFrame:
    """IVF-style approximate nearest neighbors: a coarse k-means
    quantizer buckets vectors into inverted lists; each query probes
    its ``n_probe`` nearest centroids and searches only those lists.

    ``n_clusters=None`` (the default) scales the cluster count with
    the table: ``max(16, isqrt(N))``, the FAISS-style ~sqrt(N) rule.
    This is what keeps IVF sub-quadratic — with a FIXED cluster count
    the inverted lists grow with N and the per-cluster probes x
    postings matmul is O(N²) total (the 32x scale probe measures
    exactly that blowup: ~10x wall for 4x data at fixed 16, ~linear
    with sqrt-N clusters). With C ~ sqrt(N) total search work is
    O(N^1.5 · n_probe / 1), the canonical IVF cost. Auto mode spends
    one count() on the input; pass an explicit n_clusters to skip it.

    Layout (the 100 TB shape):
    - TRAIN: centroids fitted on a BOUNDED deterministic sample — the
      ``n_train`` vectors with the smallest portable md5 of their id
      (orderBy + limit = TakeOrdered: per-partition top-n then a
      driver merge of n_train rows; the full table never reaches the
      driver). The hash order makes the sample independent of
      partitioning/layout, so training is reproducible run-to-run at
      any scale. Seed centroids = the lowest ``n_clusters`` ids of the
      sample.
    - ASSIGN: one scan; mapInPandas argmax against broadcast centroids
      emits (cluster, id, normalized vec) postings, plus n_probe probe
      rows per query. Both sides partition by cluster.
    - SEARCH: ONE grouped applyInPandas per cluster over the tagged
      stream (probes and postings split inside the kernel) — BLAS
      matmul of the cluster's probes x postings, emit per-cluster
      top-k only. Work is bounded per cluster; only k rows per
      (query, cluster) shuffle.
    - MERGE: global window top-k over the probed clusters' candidates.
    """
    import math

    from sparkclif.operators.hashing import md5_bits

    spark = embeddings.sparkSession
    if n_clusters is None:
        n_clusters = max(16, math.isqrt(embeddings.count()))
    train = (
        embeddings.select(id_col, vec_col)
        .orderBy(
            md5_bits(F.col(id_col).cast("string"), 17, 15), F.col(id_col)
        )
        .limit(n_train)
    )
    pdf = train.toPandas().sort_values(id_col)
    ids = pdf[id_col].to_numpy()
    mat = _normalize(np.vstack(pdf[vec_col].to_numpy()).astype(np.float64))
    # a tiny table can't seed more centroids than it has sample rows
    n_clusters = min(n_clusters, len(pdf))
    # deterministic Lloyd iterations (cosine/IP metric on unit vectors)
    cent = mat[:n_clusters].copy()
    for _ in range(n_iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(n_clusters):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _normalize(cent)
    bc = spark.sparkContext.broadcast(cent)

    def assign_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        centroids = bc.value
        for batch in batches:
            b_ids = batch[id_col].to_numpy()
            q = _normalize(np.vstack(batch[vec_col].to_numpy()).astype(np.float64))
            sims = q @ centroids.T
            order = np.argsort(-sims, axis=1)
            out = {
                "cluster": order[:, 0].astype("int64"),
                "vec_id": b_ids,
                "nv": list(q),
                "is_query": np.zeros(len(b_ids), dtype=bool),
            }
            frames = [pd.DataFrame(out)]
            for p in range(n_probe):
                frames.append(
                    pd.DataFrame(
                        {
                            "cluster": order[:, p].astype("int64"),
                            "vec_id": b_ids,
                            "nv": list(q),
                            "is_query": np.ones(len(b_ids), dtype=bool),
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    tagged = embeddings.select(id_col, vec_col).mapInPandas(
        assign_kernel,
        "cluster long, vec_id long, nv array<double>, is_query boolean",
    )

    # ONE grouped kernel over the tagged stream, probes/postings split
    # INSIDE it (optimization r12) — the old cogroup filtered the
    # mapInPandas output into two branches, each shuffling separately
    # by cluster, so the Python assign kernel ran TWICE over the
    # corpus (the filters sit between the kernel and the exchanges, so
    # AQE has no identical subtree to reuse; a repartition pin would
    # not survive filter pushdown either). Same shuffle bytes (N + 2N
    # rows either way), identical per-cluster computation, one
    # FlatMapGroupsInPandas instead of two exchanges + cogroup.
    def search_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        probe_pdf = pdf[pdf["is_query"]]
        post_pdf = pdf[~pdf["is_query"]]
        if probe_pdf.empty or post_pdf.empty:
            return pd.DataFrame(columns=["vec_id", "neighbor_id", "cosine"])
        q_ids = probe_pdf["vec_id"].to_numpy()
        q = np.vstack(probe_pdf["nv"].to_numpy())
        p_ids = post_pdf["vec_id"].to_numpy()
        p = np.vstack(post_pdf["nv"].to_numpy())
        sims = q @ p.T
        rows = []
        for i, qid in enumerate(q_ids):
            row = sims[i]
            mask = p_ids != qid
            cand = np.nonzero(mask)[0]
            if len(cand) == 0:
                continue
            take = min(k, len(cand))
            top = _topk_det(row, cand, p_ids, take)
            for j in top:
                rows.append((qid, p_ids[j], float(row[j])))
        return pd.DataFrame(rows, columns=["vec_id", "neighbor_id", "cosine"])

    local = tagged.groupBy("cluster").applyInPandas(search_kernel, TOPK_SCHEMA)
    # single-shuffle global merge (same shape as lsh_ann): per-query
    # dedup + order + top-k inside array expressions over the tiny
    # (<= k * n_probe) candidate list
    cand = F.struct((-F.col("cosine")).alias("negc"), F.col("neighbor_id").alias("nid"))
    merged = local.groupBy("vec_id").agg(
        F.slice(
            F.array_sort(F.array_distinct(F.collect_list(cand))), 1, k
        ).alias("__top")
    )
    return merged.select(
        "vec_id", F.posexplode("__top").alias("__pos", "__s")
    ).select(
        "vec_id",
        F.col("__s.nid").alias("neighbor_id"),
        F.round(-F.col("__s.negc"), 4).alias("cosine"),
        (F.col("__pos") + 1).cast("int").alias("rn"),
    )


def semantic_dedup(
    embeddings: DataFrame,
    n_centroids: int = 8,
    tau: float = 0.4,
    quant: float = 10_000.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication: cluster the embedding
    space, then mark duplicates ONLY within clusters — the whole point
    of the design is that the N^2 pairwise pass never happens; each
    cluster runs its own members x members BLAS and the cross-cluster
    pairs are never considered.

    Determinism contract (what makes this exact-SQL-checkable where
    k-means is not): centroids are the ``n_centroids`` lowest-id
    vectors, assignment maximizes the INTEGER dot product of
    floor(v * quant) components (exact int64, order-independent,
    ties to the lowest centroid id), and a vector is a duplicate iff
    some SAME-CLUSTER vector with a LOWER id has
    round(cosine, 4) >= tau (round half-away-from-zero, the Spark /
    DuckDB convention; cosines on the normalized float64 matmul).

    Returns one row per vector: (id, cluster, n_dup_lower, kept) with
    kept = 1 iff no lower-id in-cluster near-duplicate exists — the
    keep-first policy whose kept-set is invariant under partitioning.

    Scale: the assign pass is a scan against broadcast centroids (at
    100 TB raise n_centroids so clusters fit a task — SemDeDup uses
    ~100k clusters for web-scale corpora; cluster size ~N/C bounds the
    per-task matmul). One shuffle total (the cluster groupBy); skewed
    clusters are the k-means-quality concern, not a join-key concern.
    """
    spark = embeddings.sparkSession
    vec_type = dict(embeddings.dtypes)[vec_col]

    cent_pdf = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_centroids)
        .toPandas()
        .sort_values(id_col)
    )
    c_ids = cent_pdf[id_col].to_numpy()
    c_mat = np.floor(
        np.vstack(cent_pdf[vec_col].to_numpy()).astype(np.float64) * quant
    ).astype(np.int64)
    bc = spark.sparkContext.broadcast((c_ids, c_mat))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, cmat = bc.value
        for batch in batches:
            q = np.floor(
                np.vstack(batch[vec_col].to_numpy()).astype(np.float64) * quant
            ).astype(np.int64)
            # argmax keeps the FIRST max; cmat rows are id-sorted, so
            # ties land on the lowest centroid id (the SQL tiebreak)
            best = (q @ cmat.T).argmax(axis=1)
            yield pd.DataFrame(
                {
                    id_col: batch[id_col].to_numpy(),
                    "cluster": ids[best],
                    vec_col: batch[vec_col],
                }
            )

    assigned = embeddings.select(id_col, vec_col).mapInPandas(
        assign, f"{id_col} long, cluster long, {vec_col} {vec_type}"
    )

    def mark(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(pdf[id_col].to_numpy())
        ids = pdf[id_col].to_numpy()[order]
        mat = _normalize(np.vstack(pdf[vec_col].to_numpy()[order]).astype(np.float64))
        sims = mat @ mat.T
        # round half-away-from-zero to 4 dp (cosines >= tau > 0 are
        # the only ones compared, so the positive branch suffices)
        near = np.floor(sims * 1e4 + 0.5) / 1e4 >= tau
        # strict lower triangle: row i vs lower-id columns j < i
        n_dup_lower = np.tril(near, k=-1).sum(axis=1).astype(np.int64)
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster": np.int64(key[0]),
                "n_dup_lower": n_dup_lower,
                "kept": (n_dup_lower == 0).astype(np.int64),
            }
        )

    return assigned.groupBy("cluster").applyInPandas(
        mark, f"{id_col} long, cluster long, n_dup_lower long, kept long"
    )


def sparse_cosine_pairs(
    docs: DataFrame,
    tau: float = 0.5,
    df_cap_pct: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All-pairs SPARSE cosine similarity over term-frequency vectors
    via an inverted-index join — the bag-of-words complement to the
    dense-embedding near-dup family (Bayardo et al., WWW'07 "Scaling
    Up All Pairs Similarity Search"). Emits every ``(id_a < id_b)``
    pair with tf-vector cosine >= ``tau``.

    The plan IS the inverted index: the tf table ``(doc, term, tf)``
    self-joins on ``term``, so a pair of documents meets once per
    SHARED term — never an N² doc-pair blowup; pair-generation cost is
    the sum of squared posting-list lengths. That sum is dominated by
    the Zipfian head, so the index applies the classic
    document-frequency cap: terms appearing in more than
    ``df_cap_pct`` percent of documents are dropped from the index
    (they carry no discriminative signal and their posting lists are
    corpus-sized; this is Bayardo's frequency-ordered pruning in its
    simplest form). After the cap, posting lists are bounded at
    df_cap·N but the HEAVIEST survivors still skew the join — both
    sides hash-partition on ``term`` and AQE's skew split handles the
    residue. The df relation itself is vocabulary-sized with a tiny
    over-cap subset — derived from the tf relation (one row per
    (doc, term) ⇒ a plain row count per term IS df; no second corpus
    scan, no countDistinct expand).

    Exactness: tf and the pair dot product are BIGINT; norms are
    ``sqrt`` of BIGINT sums-of-squares. sqrt/*// are correctly-rounded
    IEEE-754 operations, so ``cosine`` is bit-identical on any engine
    and the ``>= tau`` selection is deterministic cross-engine (no
    order-dependent float accumulation: every sum is integral).

    Shuffles: tf agg, df agg, the term self-join, the pair agg, and
    two pair->norm joins on unique doc ids. The norm join runs on the
    PAIR table (post-threshold candidates are far fewer than posting
    rows), not carried through the index join.

    Precondition: one row per ``id_col`` (document frequency counts
    rows after per-doc dedup — duplicate id rows would inflate df;
    see corpus.boilerplate_removal). NULL-text docs have no tokens
    and simply never pair.
    """
    from sparkclif.operators.text import tokens

    base = docs.select(id_col, F.explode(tokens(text_col)).alias("tok"))
    tf = base.groupBy(id_col, "tok").agg(F.count("*").cast("long").alias("tf"))
    # tf feeds FOUR consumers (df cap, index build, and — through the
    # index — norms and both join sides). Without materialization each
    # consumer re-runs the scan+tokenize+tf aggregation (measured 41
    # exchanges / 4 corpus passes at sf0.1); materializing collapses
    # the lineage to ONE tokenize pass. localCheckpoint here (executor-
    # local blocks, partitioning preserved, NOT CacheManager-registered
    # — so every fresh build re-pays materialization and bench timings
    # stay honest, the kmeans/dedup_cluster pattern); on a cluster with
    # executor churn prefer .persist(MEMORY_AND_DISK), which keeps
    # lineage for recompute. The tf table is the compressed
    # bag-of-words corpus — executor-sized, never driver-sized.
    tf = tf.localCheckpoint(eager=False)

    n_docs = docs.agg(F.count("*").cast("long").alias("__n_docs"))
    # df derives FROM the tf relation (one row per (doc, term), so
    # counting rows per term IS document frequency) — a vocabulary-
    # sized re-aggregation instead of a second full corpus scan +
    # tokenize pass (the same one-fewer-pass move as bigram_lm_score's
    # c1-from-c12)
    kept_terms = (
        tf.groupBy("tok")
        .agg(F.count("*").alias("__df"))
        .crossJoin(F.broadcast(n_docs))
        .where(F.col("__df") * 100 <= F.col("__n_docs") * df_cap_pct)
        .select("tok")
    )
    # the inverted index: only capped terms post. Not materialized —
    # its three consumers re-run only the cheap cap join over the
    # checkpointed tf (AQE broadcasts the vocabulary-sized kept_terms
    # side at this scale); a second checkpoint barrier measured SLOWER
    # (0.88 vs 0.79 s at sf0.1) than recomputing the join.
    idx = tf.join(kept_terms, "tok")

    # per-doc squared norm over the SAME capped vector the index uses
    norms = idx.groupBy(id_col).agg(
        F.sum(F.col("tf") * F.col("tf")).cast("long").alias("__sq")
    )

    a = idx.select(
        F.col("tok"), F.col(id_col).alias("id_a"), F.col("tf").alias("__tfa")
    )
    b = idx.select(
        F.col("tok"), F.col(id_col).alias("id_b"), F.col("tf").alias("__tfb")
    )
    pairs = (
        a.join(b, "tok")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.sum(F.col("__tfa") * F.col("__tfb")).cast("long").alias("dot"))
    )
    na = norms.select(F.col(id_col).alias("id_a"), F.col("__sq").alias("__sqa"))
    nb = norms.select(F.col(id_col).alias("id_b"), F.col("__sq").alias("__sqb"))
    cos = F.col("dot") / (F.sqrt("__sqa") * F.sqrt("__sqb"))
    return (
        pairs.join(na, "id_a")
        .join(nb, "id_b")
        .where(cos >= tau)
        .select(
            "id_a", "id_b", "dot", F.round(cos, 4).alias("cosine")
        )
    )
