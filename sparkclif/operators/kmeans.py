"""Distributed Lloyd's k-means over the embedding column — EXACT.

The canonical iterative algorithm of a training-data pipeline
(embedding-space clustering feeds corpus curation: SemDeDup-style
pruning, domain discovery, diversity sampling), implemented so that
every number it produces is an exact integer and the whole run is
bit-identical on any engine — an iterative algorithm with a full SQL
oracle, not a rows-only check:

- Vectors live in the shared portable basis ``q = floor(v * 10⁴)``
  (BIGINT, operators/quantize.py). Distances are integer sums of
  squared integer differences — associative, partition-order-proof.
- Init is deterministic and seedless: the ``k`` vectors with the
  smallest ``(md5('km|' || id), id)`` are the starting centroids
  (portable md5 basis; any engine picks the same seeds).
- The centroid update is an INTEGER mean with TRUNCATING division:
  ``c_d = trunc(sum_d / n)``. The convention matters because
  dimension sums go negative, and the engines disagree at the
  default: Python ``//`` floors (-7//2 = -4) while DuckDB's integer
  ``//`` and Spark's ``div`` truncate toward zero (-7//2 = -3;
  DuckDB only floors on FLOATs — measured, not assumed). Truncation
  is the convention all SQL engines share, so the driver-side update
  spells it explicitly (``-(-s // n)`` for negative ``s``) and the
  oracle uses plain ``//``.
- Assignment ties (equidistant centroids) break to the smallest
  cluster index; empty clusters keep their previous centroid.

Scale shape (the MLlib shape, stated explicitly): per iteration, the
centroids are k×D BOUNDED METADATA — they ride the plan as literals
(broadcast in spirit; at k×D beyond literal size, a broadcast join on
a crossJoin'd centroid relation, same plan) — and the update is one
map-side-combined aggregation producing k×D rows. The only per-
iteration driver traffic is those k×D longs, exactly like
pack_sequences' per-partition offsets. The quantized projection is
materialized once (localCheckpoint locally; .persist() on a cluster)
so the n_updates + 1 passes don't re-read and re-quantize the input;
lineage stays shallow regardless, because every iteration restarts
from that projection plus fresh literals (contrast
graph.connected_components, whose lineage deepens per round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkclif.operators.quantize import int_basis


def _dist_sq(qv, centroid: list[int]):
    """Exact integer squared distance from the vector column to a
    literal centroid."""
    lit = F.array(*[F.lit(int(c)) for c in centroid])
    return F.aggregate(
        F.zip_with(qv, lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(q_df: DataFrame, centroids: dict[int, list[int]], id_col: str):
    """(id, qv) -> (id, qv, cluster, dist_sq): argmin over the literal
    centroids via least(struct(dist, cluster)) — lexicographic struct
    ordering IS the (min dist, then min index) tiebreak."""
    structs = [
        F.struct(
            _dist_sq(F.col("qv"), centroids[c]).alias("d"),
            F.lit(c).cast("int").alias("c"),
        )
        for c in sorted(centroids)
    ]
    # F.least needs >= 2 args; with a single centroid (k=1, or a
    # 1-row input yielding one seed) the argmin is that centroid.
    best = structs[0] if len(structs) == 1 else F.least(*structs)
    return q_df.select(
        id_col,
        "qv",
        best["c"].alias("cluster"),
        best["d"].alias("dist_sq"),
    )


def kmeans_exact(
    emb: DataFrame,
    k: int = 8,
    n_updates: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: str = "checkpoint",
) -> DataFrame:
    """Run Lloyd's k-means: deterministic init, ``n_updates`` integer
    centroid updates, and return the final assignment
    ``(id, cluster, dist_sq)`` — every column an exact BIGINT/INT.

    ``n_updates + 1`` passes over the input total (one assignment per
    update plus the final one). The update aggregation explodes
    assigned vectors to (cluster, dim, q) and partial-aggregates to
    k×D rows map-side — the shuffle carries partitions × k × D tiny
    rows no matter the corpus size (same argument as
    quantize.dim_stats).

    Preconditions: non-null fixed-dimension vectors (a NULL or ragged
    vector propagates NULL distances) and unique ``id_col``. If the
    input has fewer than ``k`` rows the run proceeds with that many
    centroids. With ``materialize='persist'`` the returned assignment
    still reads the persisted projection — the caller owns unpersist
    after its terminal action.
    """
    q_df = emb.select(F.col(id_col), int_basis(F.col(vec_col)).alias("qv"))
    # materialize the quantized projection ONCE: every pass (seed scan,
    # n_updates update jobs, final assignment) would otherwise re-read
    # and re-quantize the input. 'checkpoint' (localCheckpoint) cuts
    # lineage hardest but its blocks are UNRECOVERABLE on executor
    # loss AND it drops outputPartitioning (every keyed consumer
    # re-exchanges); 'persist' is lineage-recoverable and keeps the
    # child's partitioning — the registered query passes it
    # (optimization r13 A/B: persist >= checkpoint locally too).
    if materialize == "checkpoint":
        # lazy: the seed TakeOrdered below scans every partition, so it
        # materializes the checkpoint as a side effect — same compute,
        # one fewer job barrier (optimization r12; was eager=True).
        # NOTE: this trade pays off only while the seed probe plans as
        # a full-scan single job (TakeOrderedAndProject); an
        # early-stopping seed shape would leave partitions
        # unmaterialized and doCheckpoint would launch an extra job
        # for them (ADVICE r12).
        q_df = q_df.localCheckpoint(eager=False)
    elif materialize == "persist":
        q_df = q_df.persist()
    elif materialize is not None:
        raise ValueError(f"materialize must be 'checkpoint'|'persist'|None, got {materialize!r}")

    # deterministic portable init: k smallest (md5('km|'||id), id)
    seed_rows = (
        q_df.select(
            id_col,
            "qv",
            F.md5(F.concat(F.lit("km|"), F.col(id_col).cast("string"))).alias("__h"),
        )
        .orderBy("__h", id_col)
        .limit(k)
        .collect()
    )
    centroids = {i: list(r["qv"]) for i, r in enumerate(seed_rows)}

    for _ in range(n_updates):
        assigned = _assign(q_df, centroids, id_col)
        sums = (
            assigned.select("cluster", F.posexplode("qv").alias("dim", "q"))
            .groupBy("cluster", "dim")
            .agg(F.sum("q").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new: dict[int, list[int]] = {}
        for r in sums:
            vec = new.setdefault(r["cluster"], [0] * len(centroids[0]))
            s, n = int(r["s"]), int(r["n"])
            # TRUNCATING integer division — Python // would floor
            # negative sums one lower than SQL (module docstring)
            vec[r["dim"]] = s // n if s >= 0 else -((-s) // n)
        # empty clusters keep their previous centroid
        centroids = {c: new.get(c, centroids[c]) for c in centroids}

    return _assign(q_df, centroids, id_col).select(
        id_col, "cluster", "dist_sq"
    )
