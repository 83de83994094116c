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
    n_planes: int = 6,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate NN: bucket by random-hyperplane signatures, exact
    cosine re-rank within buckets (equi-join shuffle only).

    ``n_tables`` independent hash tables are OR-ed (standard LSH
    amplification): a pair is a candidate if it collides in ANY table.
    Each table AND-s ``n_planes`` bits. More tables => higher recall,
    more candidates; at 100 TB you tune (n_tables, n_planes) to the
    target recall and let the bucket join bound the work."""
    rng = np.random.RandomState(seed)
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
