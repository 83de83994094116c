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
    sig_cols = [
        lsh_signature(F.col(vec_col), rng.normal(size=(n_planes, dim))).alias(f"s{t}")
        for t in range(n_tables)
    ]
    tagged = embeddings.select(F.col(id_col), F.col(vec_col), *sig_cols)
    # (table_id, bucket) rows; vectors meet only inside a shared bucket
    exploded = tagged.select(
        id_col,
        vec_col,
        F.posexplode(F.array(*[F.col(f"s{t}") for t in range(n_tables)])).alias(
            "table_id", "bucket"
        ),
    )
    left = exploded.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("va"), "table_id", "bucket"
    )
    right = exploded.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vb"),
        "table_id",
        "bucket",
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    pairs = (
        left.join(right, ["table_id", "bucket"])
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .dropDuplicates(["vec_id", "neighbor_id"])
        .withColumn("cosine", dot / (norm(F.col("va")) * norm(F.col("vb"))))
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("vec_id", "neighbor_id", F.round("cosine", 4).alias("cosine"), "rn")
    )
