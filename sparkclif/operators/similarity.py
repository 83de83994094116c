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


def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def cosine_topk(
    embeddings: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k self-join via broadcast + block matmul.

    Per Arrow batch: float64 matmul against the broadcast matrix,
    block-local top-k per row (argpartition, O(N) per row), then a
    global window merge. Self-matches excluded."""
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
                part = cand_idx[np.argpartition(-row[cand_idx], take - 1)[:take]]
                # deterministic order: cosine desc, neighbor id asc
                part = part[np.lexsort((all_ids[part], -row[part]))]
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


def lsh_signature(vec_col, planes: np.ndarray):
    """Random-hyperplane signature as a column expression: bit i =
    sign(v . plane_i), packed into a long. Pure zip_with/aggregate —
    JVM-side, no UDF."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec_col,
                F.array(*[F.lit(float(x)) for x in plane]),
                lambda a, b: a.cast("double") * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(dot > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def lsh_ann(
    embeddings: DataFrame,
    k: int = 3,
    n_planes: int | None = None,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    target_bucket: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
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
    with ``n_tables``."""
    rng = np.random.RandomState(seed)
    if n_planes is None:
        n = embeddings.count()
        n_planes = max(4, int(np.ceil(np.log2(max(n / target_bucket, 2)))))
        n_planes = min(n_planes, 62)
    base = embeddings.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    # norm in its own projection (non-cheap, reused by every component)
    normed = base.select(
        id_col,
        "v",
        F.sqrt(
            F.aggregate(
                F.transform("v", lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
            )
        ).alias("nrm"),
    )
    sig_cols = [
        lsh_signature(F.col("v"), rng.normal(size=(n_planes, dim))).alias(f"s{t}")
        for t in range(n_tables)
    ]
    tagged = normed.select(
        F.col(id_col),
        F.transform(
            "v", lambda x: x / F.when(F.col("nrm") > 0, F.col("nrm")).otherwise(1.0)
        ).alias("nv"),
        *sig_cols,
    )
    # (table_id, bucket) rows; vectors meet only inside a shared bucket
    exploded = tagged.select(
        id_col,
        "nv",
        F.posexplode(F.array(*[F.col(f"s{t}") for t in range(n_tables)])).alias(
            "table_id", "bucket"
        ),
    )
    # bucket-LOCAL pair generation: one groupBy shuffle, signature
    # lineage evaluated once (a self-join would evaluate it per side).
    # Pairs leave the bucket as (id, id, cosine) — 24 bytes, never two
    # dim-length vectors. Oversized buckets (hash carries no signal
    # there) are dropped: the skew/memory guard for the 100 TB regime.
    buckets = (
        exploded.groupBy("table_id", "bucket")
        .agg(
            F.collect_list(
                F.struct(F.col(id_col).alias("id"), F.col("nv").alias("nv"))
            ).alias("members")
        )
        .filter((F.size("members") >= 2) & (F.size("members") <= 1024))
    )
    cos = lambda va, vb: F.aggregate(  # noqa: E731
        F.zip_with(va, vb, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    pair_arr = F.flatten(
        F.transform(
            "members",
            lambda a: F.transform(
                F.filter("members", lambda b: b["id"] != a["id"]),
                lambda b: F.struct(
                    a["id"].alias("vec_id"),
                    b["id"].alias("neighbor_id"),
                    cos(a["nv"], b["nv"]).alias("cosine"),
                ),
            ),
        )
    )
    # same pair from different tables has identical cosine: max dedups
    pairs = (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.vec_id", "p.neighbor_id", "p.cosine")
        .groupBy("vec_id", "neighbor_id")
        .agg(F.max("cosine").alias("cosine"))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("vec_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rn")
    )


PAIRS_SCHEMA = "id_a long, id_b long, cosine double"


def cosine_threshold_pairs(
    embeddings: DataFrame,
    tau: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: every (id_a < id_b)
    with cosine >= tau. Broadcast + block matmul, same kernel shape as
    cosine_topk: each Arrow batch BLAS-multiplies against the broadcast
    matrix and emits ONLY qualifying pairs — the N^2 similarity matrix
    is never materialized as rows.

    Scale path: broadcast works while one side fits executor memory
    (~millions of vectors); past that, swap the candidate generator for
    the LSH bucket join (lsh_ann) and keep this kernel as the exact
    verifier within buckets.

    The kernel thresholds with a 1e-4 margin and the final filter
    applies round(cosine, 4) >= tau, so boundary pairs agree with a
    SQL oracle that rounds the same way."""
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


def ivf_ann(
    embeddings: DataFrame,
    k: int = 3,
    n_clusters: int = 16,
    n_probe: int = 2,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate nearest neighbors: a coarse k-means
    quantizer buckets vectors into inverted lists; each query probes
    its ``n_probe`` nearest centroids and searches only those lists.

    Layout (the 100 TB shape):
    - TRAIN: centroids fitted on a driver-side sample (here: the whole
      table — it is tiny locally; at scale you'd sample ~1M vectors),
      deterministic seed = the lowest ``n_clusters`` ids.
    - ASSIGN: one scan; mapInPandas argmax against broadcast centroids
      emits (cluster, id, normalized vec) postings, plus n_probe probe
      rows per query. Both sides partition by cluster.
    - SEARCH: cogrouped applyInPandas per cluster — BLAS matmul of the
      cluster's probes x postings, emit per-cluster top-k only. Work
      is bounded per cluster; only k rows per (query, cluster) shuffle.
    - MERGE: global window top-k over the probed clusters' candidates.
    """
    spark = embeddings.sparkSession
    pdf = embeddings.select(id_col, vec_col).toPandas().sort_values(id_col)
    ids = pdf[id_col].to_numpy()
    mat = _normalize(np.vstack(pdf[vec_col].to_numpy()).astype(np.float64))
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
    postings = tagged.filter(~F.col("is_query")).drop("is_query")
    probes = tagged.filter(F.col("is_query")).drop("is_query")

    def search_kernel(key, probe_pdf: pd.DataFrame, post_pdf: pd.DataFrame) -> pd.DataFrame:
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
            top = cand[np.argpartition(-row[cand], take - 1)[:take]]
            top = top[np.lexsort((p_ids[top], -row[top]))]
            for j in top:
                rows.append((qid, p_ids[j], float(row[j])))
        return pd.DataFrame(rows, columns=["vec_id", "neighbor_id", "cosine"])

    local = (
        probes.groupBy("cluster")
        .cogroup(postings.groupBy("cluster"))
        .applyInPandas(search_kernel, TOPK_SCHEMA)
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        local.dropDuplicates(["vec_id", "neighbor_id"])
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("vec_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rn")
    )
