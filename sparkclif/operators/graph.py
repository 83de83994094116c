"""Graph operators for dedup pipelines — connected components over a
candidate-pair edge list (SURVEY.md §2.2 group I; north-star).

After candidate generation (MinHash bands, exact-hash groups, embedding
pairs), production dedup keeps ONE doc per connected component of the
near-duplicate graph. That closure is iterative — out of scope for a
single SQL statement in general — so the engine implements min-label
propagation with POINTER JUMPING:

    l(v) <- min(l(v), min over neighbors u of l(u))   (edge relax)
    l(v) <- l(l(v))                                   (pointer jump)

Edge relaxation alone needs O(diameter) rounds (a 1M-doc chain would
take 1M rounds); the jump step halves label-tree depth every round, so
convergence is O(log diameter) — the same doubling trick as
large-star/small-star CC (public literature). Each round is two
equi-join shuffles + an agg, and ONE action: a lazy localCheckpoint
materialized by the convergence count (the count's scan computes and
caches every partition; doCheckpoint truncates lineage at job end —
optimization r12), so the plan does not grow with the iteration count
(on a cluster, point checkpoints at reliable storage instead). State
per round is one (vertex, label) table — never driver-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    id_col: str = "id",
    max_iter: int = 50,
) -> DataFrame:
    """Return (id, component) with component = MIN vertex id reachable.

    ``edges`` is undirected (each pair listed once, either direction).
    ``vertices`` optionally adds isolated vertices (one ``id_col``
    column); every edge endpoint is a vertex automatically.
    """
    both = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))

    verts = both.select(F.col("a").alias(id_col)).distinct()
    if vertices is not None:
        verts = verts.unionByName(
            vertices.select(F.col(vertices.columns[0]).alias(id_col))
        ).distinct()

    labels = verts.select(id_col, F.col(id_col).alias("component"))
    # lazy: the first round's probe job materializes both checkpoint
    # RDDs as a side effect — same compute, two fewer job barriers
    # (optimization r12; was eager=True)
    labels = labels.localCheckpoint(eager=False)
    both = both.localCheckpoint(eager=False)

    # Loop shuffle sizing (optimization r13, guide §2.2): every
    # per-round relation is VERTEX-sized, so the loop's shuffle
    # partitions derive from the vertex relation's plan-stats size
    # (~64 KB/partition) instead of inheriting the session default,
    # which hands each tiny round 32 near-empty reduce tasks AND pins
    # the checkpointed label RDDs at that width for the next round's
    # scans (measured in a calm phase: cluster 2.57 -> 2.34 s,
    # keep_best 2.81 -> 2.50 s at 32 cores; flat across 1-8 partitions
    # at sf0.1, labels bit-identical). The derived value is CAPPED at
    # the session's configured width, so it only ever shrinks tiny
    # loops — on a real graph the cap binds and this is a no-op.
    # Derived from ``vertices`` when given (a clean scan with real
    # stats); the post-union ``edges`` estimate is a join product
    # (garbage), so without ``vertices`` the cap keeps today's
    # behavior. Pinned via session conf for the loop only and restored
    # after (the stream_shuffle pattern; CC runs its rounds
    # synchronously on this thread).
    spark = edges.sparkSession
    _size_src = vertices if vertices is not None else edges
    _stats = int(
        _size_src._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    _conf_key = "spark.sql.shuffle.partitions"
    _prev_parts = spark.conf.get(_conf_key)
    try:
        _cap = int(_prev_parts)
    except (TypeError, ValueError):
        _cap = spark.sparkContext.defaultParallelism
    loop_parts = max(1, min(_cap, -(-_stats // (64 * 1024))))

    spark.conf.set(_conf_key, str(loop_parts))
    try:
        converged, labels = _cc_loop(labels, both, id_col, max_iter)
    finally:
        spark.conf.set(_conf_key, _prev_parts)
    if not converged:
        # pointer jumping converges in O(log diameter) rounds, so
        # exhausting max_iter (default 50 => diameter ~2^50) always
        # means a bug or pathological input — returning the unconverged
        # labels would silently over-split components downstream
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    return labels


def _cc_loop(labels, both, id_col, max_iter):
    """The min-label-propagation rounds (see connected_components).
    Returns (converged, labels)."""
    converged = False
    for _ in range(max_iter):
        # edge relax: min neighbor label per vertex
        nbr = (
            both.join(labels.withColumnRenamed(id_col, "b2"), F.col("b") == F.col("b2"))
            .groupBy("a")
            .agg(F.min("component").alias("nbr_min"))
        )
        relaxed = (
            labels.join(nbr, labels[id_col] == nbr["a"], "left")
            .select(
                id_col,
                F.col("component").alias("__old"),
                F.least(
                    F.col("component"), F.coalesce("nbr_min", F.col("component"))
                ).alias("component"),
            )
        )
        # pointer jump: follow the label one hop (component of component)
        jump_tbl = relaxed.select(
            F.col(id_col).alias("j_id"), F.col("component").alias("j_comp")
        )
        jumped = (
            relaxed.join(jump_tbl, relaxed["component"] == jump_tbl["j_id"], "left")
            .select(
                id_col,
                F.coalesce("j_comp", "component").alias("component"),
                # in-row change flag: the round's input label rides along
                # through relax+jump, so convergence needs no new-vs-old
                # join (one fewer shuffle per round at any scale)
                (F.coalesce("j_comp", "component") != F.col("__old")).alias(
                    "__chg"
                ),
            )
        )
        # ONE action per round (optimization r12): the lazy checkpoint
        # is materialized BY the convergence count — the count's scan
        # computes and caches every partition of the marked RDD, and
        # doCheckpoint truncates lineage at job end. The old shape
        # (eager ckpt job + separate limit(1) probe job) paid two
        # scheduling barriers per round for the same compute.
        new_labels = jumped.localCheckpoint(eager=False)
        changed = new_labels.filter("__chg").count()
        labels = new_labels.drop("__chg")
        if changed == 0:
            converged = True
            break
    return converged, labels


def pagerank_int(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    damping_pct: int = 85,
    scale_bp: int = 10000,
) -> DataFrame:
    """Fixed-iteration PageRank in an EXACT INTEGER basis — the graph
    centrality pass a corpus pipeline runs over link/co-occurrence
    graphs (quality priors, crawl ordering). Returns
    ``(node, pr_bp)`` after ``iters`` power iterations of

        pr(v) <- (1-d)·S + d · Σ_{u->v} (pr(u) div outdeg(u))

    with every quantity a BIGINT (ranks start at ``scale_bp``; ``div``
    is integer division; d = damping_pct/100 applied as an integer
    mul-then-div). Floating PageRank is NOT reproducible across
    engines — float summation over in-neighbors is order-dependent —
    but the integer basis makes each iteration a pure function of the
    edge multiset, so a SQL oracle can restate the iterations as
    unrolled CTEs and hash-match exactly.

    Plan shape per iteration: one equi-join (ranks x out-degree
    contributions) + one map-side-combined sum by destination — the
    standard message-passing round. Ranks and degrees are node-sized
    relations; edges are scanned once per iteration (at 100 TB,
    materialize the normalized edge relation once — it is reused
    ``iters`` times — and co-partition edges and ranks on the node key
    so every round reuses one exchange; iters is a FIXED small
    constant, so the unrolled plan does not grow with the data).
    Dangling nodes (outdeg 0) contribute nothing; nodes with no
    in-edges settle at the teleport term. Nodes = every id appearing
    as src or dst.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    outdeg = e.groupBy("u").agg(F.count("*").alias("__deg"))
    # Materialize the degree-normalized edge relation and the node set
    # ONCE: both are consumed every iteration, and without it each
    # round re-runs the full upstream lineage (scan + distinct per
    # iteration — measured 3 extra corpus scans at iters=3).
    # persist + explicit keyed repartition, NOT localCheckpoint
    # (optimization r13): localCheckpoint drops outputPartitioning, so
    # every iteration re-exchanged BOTH cached relations; persist
    # keeps the hash layout, making the per-round message join and
    # teleport join exchange-free on the cached sides — the
    # co-partitioning the docstring prescribes for 100 TB. The
    # partition count derives from the edge relation's plan-stats size
    # (~1 MB/partition, capped at the session's parallelism — the cap
    # binds on any real cluster; locally a 4 MB graph gets 4-5
    # partitions instead of 32 near-empty tasks per stage per round:
    # measured 1.57 s -> 0.78 s at 32 cores, identical ranks, and
    # repartition(32)+persist was the worst shape measured, 2.4 s).
    sc = edges.sparkSession.sparkContext
    stats_bytes = int(
        e._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    n_parts = max(1, min(sc.defaultParallelism, -(-stats_bytes // (1 << 20))))
    en = e.join(outdeg, "u").repartition(n_parts, "u").persist()
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .distinct()
        .repartition(n_parts, "node")
        .persist()
    )
    teleport = (100 - damping_pct) * scale_bp // 100
    pr = nodes.withColumn("pr_bp", F.lit(scale_bp).cast("long"))
    for _ in range(iters):
        contrib = (
            en.join(pr, en["u"] == pr["node"])
            .select(
                F.col("v").alias("node"),
                F.expr("pr_bp div __deg").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__in"))
        )
        pr = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(teleport)
                + F.expr(f"{damping_pct} * coalesce(__in, 0) div 100")
            ).cast("long").alias("pr_bp"),
        )
    return pr
