"""Int8 embedding quantization for training-data pipelines.

Symmetric per-vector int8 quantization — the standard compression step
before embeddings ship to an ANN index or a feature store:
``q[i] = trunc(127 * x[i] / scale)`` with ``scale = max|x|``. All math
runs in the exact integer basis ``floor(v * 10000)`` (the same
engine-portable quantization the ANN anchors pin down in
queries/group_i_anchors.py), so every output column is an exact
integer and bit-identical across engines.

Portability details (each one is load-bearing for the SQL oracle):

- Magnitude and sign are handled separately. Truncating integer
  division is only engine-portable on non-negatives (Spark ``div``
  truncates toward zero; DuckDB ``//`` floors — identical on
  non-negatives, off by one on negatives), so we quantize ``|xi|``.
- The division itself is stated as ``(127*a - (127*a) % scale) /
  scale``: the numerator is exactly divisible, so the double division
  both engines produce is exact — no float-floor edge cases.
- The reconstruction error is reported as the integer residual energy
  ``sum(((127*a) % scale)^2)`` — the squared error of ``127 * xi``
  against ``q * scale`` in the 127× integer basis. Exact BIGINT; the
  float MSE is this divided by ``(127 * 10000)^2 * dim``.

At 100 TB this is a pure scan kernel: per-row array lambdas inside
whole-stage codegen, no shuffle, no Python workers.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared integer basis with the ANN anchors (group_i_anchors.py).
QUANT = 10_000
INT8_MAX = 127


def int_basis(vec: Column) -> Column:
    """``floor(v * 10000)`` per element, BIGINT — the portable basis.
    The float32 element is widened to DOUBLE before the multiply:
    DuckDB promotes FLOAT * INTEGER to DOUBLE, while Spark would
    multiply in FLOAT and floor a value that is one ulp off."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * QUANT).cast("long")
    )


def _lsum(arr: Column) -> Column:
    """Exact BIGINT sum over an array (0 for empty)."""
    return F.aggregate(arr, F.lit(0).cast("long"), lambda acc, x: acc + x)


def dim_stats(emb, vec_col: str = "embedding"):
    """Per-DIMENSION corpus moments over an embedding column — the
    input to mean-centering / variance scaling / whitening before
    quantization or ANN indexing. One row per dimension (0-based):
    ``(dim, n, sum_q, sumsq_q, min_q, max_q)`` in the exact integer
    basis ``floor(v * 10000)`` — every column is an exact BIGINT, so
    the SQL restatement is bit-identical (no float-sum order
    sensitivity: integer addition is associative, so the result is
    independent of partition order, unlike a double mean).

    Plan: posexplode to ``(dim, q)`` then one hash aggregation on
    ``dim``. The explode looks like a D× row blowup but is NOT a
    D× shuffle: partial aggregation combines each map task down to
    ``D`` rows before the exchange, so the shuffle carries
    ``partitions × D`` tiny rows regardless of corpus size. ``dim``
    has perfectly uniform cardinality — no skew.

    At ~100 TB (1e12 vectors), ``sumsq_q`` sums 1e8-magnitude terms
    over 1e12 rows ≈ 1e20 and overflows BIGINT — widen that column
    (only) to ``decimal(38, 0)`` at that scale; the bench keeps BIGINT
    so the DuckDB hash compare sees identical dtypes.
    """

    q = int_basis(F.col(vec_col))
    exploded = emb.select(F.posexplode(q).alias("dim", "q"))
    return exploded.groupBy(F.col("dim").cast("long").alias("dim")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum("q").cast("long").alias("sum_q"),
        F.sum(F.col("q") * F.col("q")).cast("long").alias("sumsq_q"),
        F.min("q").cast("long").alias("min_q"),
        F.max("q").cast("long").alias("max_q"),
    )


def int8_quant_stats(vec: Column) -> dict[str, Column]:
    """Per-vector int8 quantization summary as named columns:

    - ``dim``: vector length
    - ``scale_int``: max |floor(v*10000)| (>= 1), the per-vector scale
    - ``sum_q_abs``: sum of quantized magnitudes, each in [0, 127]
    - ``n_sat``: lanes that hit the int8 max (|q| = 127)
    - ``n_zero``: lanes that quantize to 0 (underflow — information loss)
    - ``err_sq``: integer residual energy sum(((127*a) % scale)^2)
    """
    from sparkclif.operators.expr import bind

    # both the abs array and the scalar scale are bind-bound: scale
    # embeds array_max(ax), and referenced bare inside the per-element
    # lambdas it is re-evaluated PER LANE — O(dim²) per vector (16M
    # element ops at dim 4096; see expr.bind for the no-CSE-in-lambdas
    # trap). Bound, every field is O(dim).
    def build(a: Column) -> Column:
        def with_scale(s: Column) -> Column:
            def qmag(x: Column) -> Column:
                num = x * INT8_MAX
                return ((num - num % s) / s).cast("long")

            qm = F.transform(a, qmag)
            res = F.transform(a, lambda x: (x * INT8_MAX) % s)
            return F.struct(
                F.size(a).cast("long").alias("dim"),
                s.alias("scale_int"),
                _lsum(qm).alias("sum_q_abs"),
                F.size(F.filter(qm, lambda q: q == INT8_MAX))
                .cast("long")
                .alias("n_sat"),
                F.size(F.filter(qm, lambda q: q == 0)).cast("long").alias("n_zero"),
                _lsum(F.transform(res, lambda r: r * r)).alias("err_sq"),
            )

        return bind(
            F.greatest(F.coalesce(F.array_max(a), F.lit(0)), F.lit(1)), with_scale
        )

    stats = bind(F.transform(int_basis(vec), lambda x: F.abs(x)), build)
    # field extraction from the struct duplicates the (now linear)
    # expression per column; Catalyst's SimplifyExtractValueOps prunes
    # the unused fields of each copy
    return {
        c: stats[c]
        for c in ("dim", "scale_int", "sum_q_abs", "n_sat", "n_zero", "err_sq")
    }


def _pq_seed_candidates(emb, n_codes, id_col, vec_col):
    """The md5-ordered donor subtree — the ONE definition of the PQ
    codebook's seed-selection recipe (order key ``(md5('pq|' || id),
    id)``, raw vectors carried through the sort so int_basis projects
    AFTER the limit and compiles into TakeOrderedAndProject). Shared
    by ``pq_codebook`` (direct collect) and ``pq_adc_search`` (its
    union-fused metadata collect): the searcher's lookup tables MUST
    be built against exactly the encoder's codewords, and a second
    inlined copy of the recipe would let a future edit split them
    silently — both oracles restate their own recipe, so parity
    alone would not catch the drift (round-11 review finding).
    Columns: ``(__o1, __sid, __v)`` — the order keys ride along so a
    caller that unions this subtree (losing TakeOrdered's row order)
    can re-sort driver-side."""
    return (
        emb.select(
            F.md5(
                F.concat(F.lit("pq|"), F.col(id_col).cast("string"))
            ).alias("__o1"),
            F.col(id_col).alias("__sid"),
            F.col(vec_col).alias("__v"),
        )
        .orderBy("__o1", "__sid")
        .limit(n_codes)
    )


def pq_codebook(
    emb,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "list[list[int]]":
    """The deterministic PQ codebook donors as driver-side metadata:
    the ``n_codes`` vectors with the smallest ``(md5('pq|' || id),
    id)``, each as its full integer-basis vector. Shared by
    ``pq_encode`` and ``pq_adc_search`` so the searcher's lookup
    tables are built against EXACTLY the encoder's codewords; the
    selection recipe itself lives in ``_pq_seed_candidates`` (one
    definition)."""
    seeds = _pq_seed_candidates(emb, n_codes, id_col, vec_col).select(
        "__o1", "__sid", int_basis(F.col("__v")).alias("qv")
    ).collect()
    seeds.sort(key=lambda r: (r["__o1"], r["__sid"]))
    return [[int(x) for x in r["qv"]] for r in seeds]


def _arr_lit(xs):
    """BIGINT array literal fragment for ONE F.expr parse (the
    pq_encode py4j-cost rule) — one definition for every searcher
    literal (codebook, centroid, LUT)."""
    return "array(" + ",".join(f"{v}L" for v in xs) + ")"


def _q_lut_struct(qid, lut):
    """``named_struct('q', <id>, 'lut', ...)`` literal fragment — the
    (query, lookup-table) plan-literal element shared by
    pq_adc_search's query array and ivf_pq_search's probe map."""
    return (
        f"named_struct('q',{qid}L,'lut',array("
        + ",".join(_arr_lit(sub_lut) for sub_lut in lut)
        + "))"
    )


def _collect_pq_metadata(meta, n_codes, n_heads, id_col, vec_col):
    """ONE action collecting the md5-ordered codebook donors
    (``_pq_seed_candidates`` — the encoder's exact recipe) AND the
    ``n_heads`` smallest-id vectors (queries; for ivf_pq_search the
    heads double as centroids): both are bounded TakeOrdered subtrees
    over the same scan, and unioning them halves the driver job
    round-trips of a cache_plan=False build (measured ~0.2 s of the
    warm pass). Union output order is not guaranteed, so each
    subtree's order key rides along and the split/sort happens
    driver-side. Returns ``(seed_qvs, heads)`` with ``heads`` as
    id-sorted ``[(id, qv)]`` pairs — one definition for both
    searchers (round-11 review)."""
    seeds_q = _pq_seed_candidates(meta, n_codes, id_col, vec_col).select(
        F.lit(0).alias("__tag"), "__o1", "__sid", "__v"
    )
    heads_q = (
        meta.select(
            F.lit(1).alias("__tag"),
            F.lit(None).cast("string").alias("__o1"),
            F.col(id_col).alias("__sid"),
            F.col(vec_col).alias("__v"),
        )
        .orderBy("__sid")
        .limit(n_heads)
    )
    collected = (
        seeds_q.unionAll(heads_q)
        .select("__tag", "__o1", "__sid", int_basis(F.col("__v")).alias("qv"))
        .collect()
    )
    seed_qvs = [
        [int(x) for x in r["qv"]]
        for r in sorted(
            (r for r in collected if r["__tag"] == 0),
            key=lambda r: (r["__o1"], r["__sid"]),
        )
    ]
    heads = sorted(
        (
            (int(r["__sid"]), [int(x) for x in r["qv"]])
            for r in collected
            if r["__tag"] == 1
        ),
        key=lambda t: t[0],
    )
    return seed_qvs, heads


def _code_fold(codes, id_col, *extra):
    """Stored-codes table: one sub-ordered code array per vector (the
    one corpus-sized shuffle of a searcher; callers spread by the id
    so this groupBy reuses that exchange). ``extra``: additional
    per-vector columns to carry through the fold (the residual
    searcher carries the posting cluster, which its encode derives
    in-row — folding it here deletes the postings join
    ivf_pq_search pays)."""
    return codes.groupBy(id_col, *extra).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))),
            lambda s: s["code"],
        ).alias("__codes")
    )


def _adc_fold(n_sub):
    """In-row ADC sum: fold the exploded ``__q.lut`` over the row's
    ``__codes`` array — n_sub table adds, no join."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(n_sub - 1)),
        F.lit(0).cast("long"),
        lambda acc, sub: acc
        + F.element_at(
            F.element_at(F.col("__q.lut"), (sub + 1).cast("int")),
            (F.element_at("__codes", (sub + 1).cast("int")) + 1).cast("int"),
        ),
    )


def _salted_topk(s, k, salt_buckets, carry=()):
    """Two-phase per-query top-k by (adc_dist, neighbor_id): partial
    top-k per (query, salt) bucket bounds the q-way hot-key skew; the
    final per-query window sees q x salt_buckets x k rows, never the
    corpus. ``carry``: extra columns to keep through to the result
    (ivf_pq_search carries the posting cluster). One definition for
    both searchers (round-11 review: an edit to the tiebreak or salt
    scheme in one inlined copy would silently diverge the other)."""
    from pyspark.sql import Window

    salt = F.pmod(F.xxhash64("neighbor_id"), F.lit(salt_buckets))
    w1 = Window.partitionBy("vec_id", "__salt").orderBy("adc_dist", "neighbor_id")
    partial = (
        s.withColumn("__salt", salt)
        .withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= k)
    )
    w2 = Window.partitionBy("vec_id").orderBy("adc_dist", "neighbor_id")
    return (
        partial.select("vec_id", "neighbor_id", *carry, "adc_dist")
        .withColumn("rank", F.row_number().over(w2).cast("int"))
        .where(F.col("rank") <= k)
    )


def pq_adc_search(
    emb,
    n_queries: int = 4,
    k: int = 10,
    n_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt_buckets: int = 64,
    meta_src=None,
):
    """PQ asymmetric-distance (ADC) top-k search (Jégou et al. 2011,
    §III-B) — the step that READS the codes ``pq_encode`` writes and
    completes the IVF-PQ story: a query is never quantized; instead a
    per-query lookup table ``lut[sub][code] = ||q_sub - c_code||²``
    (exact integers, ``n_sub × n_codes`` entries) turns each database
    vector's 8 code bytes into an approximate distance with ``n_sub``
    table adds — the 100 TB ANN scan never touches a float vector.
    Queries are the ``n_queries`` smallest-id vectors (the IVF-anchor
    convention); a query never matches itself. Returns the top ``k``
    per query: ``(vec_id, neighbor_id, adc_dist, rank)``, ties by
    (adc_dist, neighbor_id) — every column exact BIGINT/INT, so the
    SQL restatement is a full hash check.

    Plan: codes (from the shared encoder, in-row argmin, zero
    exchanges) fold to one code array per vector (ONE map-side-
    combined shuffle, the stored-codes table of a real pipeline);
    the ``n_queries`` LUTs ride the plan as ONE parsed literal
    (bounded metadata: q × 8 × 16 longs) and each code row explodes
    into q scored rows scan-side — the ADC sum is an in-row fold over
    the code array, no join. Top-k is the two-phase window: partial
    top-k per (query, salt) bucket bounds the q-way hot-key skew —
    the final per-query window sees ``q × salt_buckets × k`` rows,
    never the corpus.

    Headroom: |lut entry| <= sub_dim·(2·QUANT)² = 3.2e9; the ADC sum
    <= n_sub× that = 2.56e10 — exact in BIGINT at any corpus size."""
    # ``meta_src``: the frame to run the bounded metadata collect
    # against — callers that pre-repartition ``emb`` for the heavy
    # encode path should pass the UN-spread scan here: a
    # TakeOrdered(16) does not need the repartition exchange the
    # encode does, and paying it twice under the union tripled the
    # collect job (0.94 -> 0.32 s measured at sf0.1; at real scale
    # the scan is already parallel and the choice is neutral).
    meta = emb if meta_src is None else meta_src
    seed_qvs, queries = _collect_pq_metadata(
        meta, n_codes, n_queries, id_col, vec_col
    )
    codes = pq_encode(
        emb,
        n_sub=n_sub,
        sub_dim=sub_dim,
        n_codes=n_codes,
        id_col=id_col,
        vec_col=vec_col,
        codebook=seed_qvs,
    )
    code_arr = _code_fold(codes, id_col)
    if not seed_qvs or not queries:
        return code_arr.select(
            F.col(id_col).alias("vec_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(None).cast("long").alias("adc_dist"),
            F.lit(None).cast("int").alias("rank"),
        ).where(F.lit(False))

    # per-query ADC tables, driver-side exact ints: lut[q][sub][code];
    # ONE parsed literal: array<struct<q:bigint, lut:array<array<bigint>>>>
    q_lit = F.expr(
        "array("
        + ",".join(
            _q_lut_struct(qid, _lut_for(qv, seed_qvs, n_sub, sub_dim))
            for qid, qv in queries
        )
        + ")"
    )

    scored = code_arr.select(
        F.col(id_col).alias("neighbor_id"),
        "__codes",
        F.explode(q_lit).alias("__q"),
    ).where(F.col("neighbor_id") != F.col("__q.q"))
    s = scored.select(
        F.col("__q.q").alias("vec_id"),
        "neighbor_id",
        _adc_fold(n_sub).alias("adc_dist"),
    )
    return _salted_topk(s, k, salt_buckets)


def _lut_for(qv, seed_qvs, n_sub, sub_dim):
    """ADC lookup table for one query: lut[sub][code] = exact integer
    ||q_sub - c_sub||² — one definition for pq_adc_search and
    ivf_pq_search."""
    return [
        [
            sum(
                (qv[sub * sub_dim + j] - cv[sub * sub_dim + j]) ** 2
                for j in range(sub_dim)
            )
            for cv in seed_qvs
        ]
        for sub in range(n_sub)
    ]


def _cluster_expr(centroids, qv_col: str):
    """The coarse-quantizer assignment as ONE Column over a quantized
    vector column: in-row argmax exact dot over the centroid literal,
    ties to the lowest centroid id — array_min of (-score, id)
    structs, each dot computed exactly once. The single definition of
    the convention; every caller (the fused encode carry used by both
    batch searchers and the streaming delta, the residual projection)
    binds it to its own qv column name."""
    cent_lit = F.expr(
        "array("
        + ",".join(
            f"named_struct('c',{cid}L,'cv',{_arr_lit(cv)})"
            for cid, cv in centroids
        )
        + ")"
    )

    def dot_to(cw):
        return F.aggregate(
            F.zip_with(qv_col, cw["cv"], lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    scored_c = F.transform(
        cent_lit,
        lambda cw: F.struct((-dot_to(cw)).alias("ns"), cw["c"].alias("c")),
    )
    return F.array_min(scored_c)["c"]


def ivf_pq_search(
    emb,
    n_queries: int = 4,
    k: int = 3,
    n_clusters: int = 8,
    n_probe: int = 2,
    n_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt_buckets: int = 64,
    meta_src=None,
):
    """IVF-PQ search — the two stages fused, the actual 100 TB ANN
    memory layout (Jégou et al. 2011 §V): an IVF coarse quantizer
    prunes the corpus to the postings of each query's ``n_probe``
    nearest clusters, and within those postings the ranking is
    PQ asymmetric distance over the stored code bytes — the scan
    touches a float vector exactly never, and touches only
    ~n_probe/n_clusters of the codes.

    Deterministic exact-integer conventions shared with the anchors:
    centroids are the ``n_clusters`` smallest-id vectors and every
    vector posts to its argmax-dot cluster, ties to the lowest
    centroid id (the ``i_sim_ivf_probe_stats`` recipe); queries are
    the ``n_queries`` smallest-id vectors and the codebook is the
    md5-ordered seed set (the ``pq_adc_search``/``i_embed_pq``
    recipe, one definition: ``_pq_seed_candidates``). Returns top
    ``k`` per query: ``(vec_id, neighbor_id, cluster, adc_dist,
    rank)``, ties by (adc_dist, neighbor_id) — all exact, full hash
    check. A (query, neighbor) pair meets at most once (a posting
    lives in exactly one cluster), so no dedup stage exists.

    Plan: ONE metadata collect (md5 seeds ∪ smallest-id heads — the
    heads double as centroids and queries); cluster assignment is an
    in-row argmax over the centroid literal computed IN the encode
    scan itself (``pq_encode(cluster_centroids=...)``) and carried
    through the code fold per (vector, cluster) — the one
    corpus-sized shuffle, exchange-reused from the caller's id-keyed
    spread, with NO postings join (round-12 adoption from the
    residual searcher; the prior second-projection + post-fold join
    shape measured 1.14 vs 1.03 s build+exec at sf0.1); the
    (cluster -> [(query, lut)]) probe table rides the plan as ONE
    parsed map literal, so candidate generation is a map-lookup
    explode that emits rows ONLY for probed clusters (unprobed
    postings never leave the scan); two-phase salted top-k as in
    pq_adc_search. At 100 TB the probe table is queries × n_probe
    entries of bounded LUTs and the candidate stream is the probed
    fraction of the corpus."""
    meta = emb if meta_src is None else meta_src
    seed_qvs, heads = _collect_pq_metadata(
        meta, n_codes, max(n_clusters, n_queries), id_col, vec_col
    )
    centroids = heads[:n_clusters]
    queries = heads[:n_queries]
    if not seed_qvs or not centroids or not queries:
        return emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(None).cast("long").alias("cluster"),
            F.lit(None).cast("long").alias("adc_dist"),
            F.lit(None).cast("int").alias("rank"),
        ).where(F.lit(False))

    # the posting cluster is computed IN the encode scan and rides
    # the code fold (round-12 adoption from the residual searcher:
    # one scan + zero joins instead of a second corpus projection
    # joined post-fold — interleaved same-session sf0.1 measurement
    # before adoption: exec 0.51 -> 0.42 s, build+exec 1.14 -> 1.03 s,
    # results identical; in-window verified this round)
    codes = pq_encode(
        emb,
        n_sub=n_sub,
        sub_dim=sub_dim,
        n_codes=n_codes,
        id_col=id_col,
        vec_col=vec_col,
        codebook=seed_qvs,
        cluster_centroids=centroids,
    )
    cand_side = _code_fold(codes, id_col, "__cluster")

    # driver-side probe selection: each query's n_probe best clusters
    # by the SAME exact integer dot + tiebreak, then the probe table
    # (cluster -> [(query, lut)]) as one parsed map literal
    probes: dict = {}
    for qid, qv in queries:
        order = sorted(
            centroids,
            key=lambda c: (-sum(a * b for a, b in zip(qv, c[1])), c[0]),
        )[:n_probe]
        lut = _lut_for(qv, seed_qvs, n_sub, sub_dim)
        for cid, _ in order:
            probes.setdefault(cid, []).append((qid, lut))
    probe_lit = F.expr(
        "map("
        + ",".join(
            f"{cid}L,array("
            + ",".join(_q_lut_struct(qid, lut) for qid, lut in lst)
            + ")"
            for cid, lst in sorted(probes.items())
        )
        + ")"
    )

    # try_element_at, not probe_lit[...]: unprobed clusters (the
    # common case, ~(1 - n_probe/n_clusters) of postings) must yield
    # NULL so explode drops them — plain map subscript throws
    # MAP_KEY_DOES_NOT_EXIST under spark.sql.ansi.enabled (ADVICE
    # r11; same ANSI discipline as sequence.py / sketch.py)
    scored = cand_side.select(
        F.col(id_col).alias("neighbor_id"),
        "__codes",
        F.col("__cluster").alias("cluster"),
        F.explode(
            F.try_element_at(probe_lit, F.col("__cluster"))
        ).alias("__q"),
    ).where(F.col("neighbor_id") != F.col("__q.q"))
    s = scored.select(
        F.col("__q.q").alias("vec_id"),
        "neighbor_id",
        F.col("cluster").cast("long").alias("cluster"),
        _adc_fold(n_sub).alias("adc_dist"),
    )
    return _salted_topk(s, k, salt_buckets, carry=("cluster",))


def pq_encode(
    emb,
    n_sub: int = 8,
    sub_dim: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebook: "list[list[int]] | None" = None,
    cluster_centroids=None,
):
    """Product-quantization encoding (Jégou et al. 2011): split each
    vector into ``n_sub`` subspaces of ``sub_dim`` dims and assign
    each sub-vector to its nearest codeword — the memory-compression
    step before an IVF-PQ index (64 floats -> 8 code bytes here).
    Returns one row per (vector, subspace): ``(id, sub, code,
    dist_sq)`` with the exact integer residual.

    The codebook is TRAINING-FREE and deterministic: the ``n_codes``
    vectors with the smallest ``(md5('pq|' || id), id)`` donate their
    sub-vectors as codewords (the sampled-codebook baseline; swap in
    ``operators/kmeans.kmeans_exact`` per subspace for trained
    codebooks — same assignment plan). Everything runs in the shared
    ``floor(v·10⁴)`` integer basis, so assignment ties break exactly
    ((dist, code) lexicographic min) and the SQL restatement is
    bit-identical.

    Plan: ONE posexplode to (id, sub, subvec) — n_sub× rows — and the
    argmin happens IN the row: the codebook (n_sub × n_codes rows of
    sub_dim longs — bounded metadata) rides the plan as a map literal
    keyed by subspace, each row transforms its 16 codewords to
    (dist, code) structs (each distance computed exactly once — the
    HOF-recompute hazard), and ``array_min`` takes the lexicographic
    min. Zero joins, zero exchanges: pure scan-side codegen. At
    100 TB that beats the earlier broadcast-join + min(struct)-agg
    shape, which fanned rows out n_codes× and paid a shuffle to fold
    them back (measured 1.9× slower at sf0.1).

    Precondition: non-null vectors of exactly ``n_sub × sub_dim``
    dims (a short vector's trailing subspace slices come out ragged
    and zip_with pads NULL into the distances). Fewer than
    ``n_codes`` input rows simply yields a smaller codebook.

    ``cluster_centroids``: optional ``[(cid, qv)]`` metadata — when
    given, the coarse IVF posting cluster (``_cluster_expr``, the one
    assignment convention) is computed IN the same scan and carried
    through as ``__cluster``, so an IVF-PQ caller's code fold can
    group by (id, cluster) with NO postings join (the round-12
    residual-searcher shape, adopted by ivf_pq_search). ``None``
    leaves the default plan byte-identical.
    """
    q_df = emb.select(F.col(id_col), int_basis(F.col(vec_col)).alias("qv"))
    carry: list = []
    if cluster_centroids is not None:
        q_df = q_df.select(
            F.col(id_col),
            "qv",
            _cluster_expr(cluster_centroids, "qv").alias("__cluster"),
        )
        carry = ["__cluster"]
    subs = q_df.select(
        id_col,
        *carry,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_sub - 1)),
                lambda i: F.slice("qv", (i * sub_dim + 1).cast("int"), sub_dim),
            )
        ).alias("sub", "sv"),
    ).select(id_col, *carry, F.col("sub").cast("int").alias("sub"), "sv")

    # ``codebook``: a pq_codebook() result to reuse — pq_adc_search
    # passes its own so encode+search cost ONE seed-collection job per
    # plan build, not two (0.17 s of the searcher's warm build time)
    seed_qvs = (
        codebook
        if codebook is not None
        else pq_codebook(emb, n_codes=n_codes, id_col=id_col, vec_col=vec_col)
    )
    if not seed_qvs:
        # empty input: preserve the broadcast-join version's graceful
        # empty result — an all-literal empty codebook would type as
        # array<void> and fail analysis in the lambda field accesses
        return subs.select(
            id_col,
            *carry,
            "sub",
            F.lit(None).cast("int").alias("code"),
            F.lit(None).cast("long").alias("dist_sq"),
        ).where(F.lit(False))
    # codebook as a plan literal: map<sub, array<struct<code, cv>>>
    cb_by_sub = {
        sub: [
            (code, qv[sub * sub_dim : (sub + 1) * sub_dim])
            for code, qv in enumerate(seed_qvs)
        ]
        for sub in range(n_sub)
    }
    # ONE parsed SQL expression, not per-element F.lit()/F.array()
    # calls: the literal tree is ~1k nodes and building it through
    # the Python column API costs a py4j round trip per node
    # (measured 2.3 s of plan-BUILD time; the parser does the same
    # tree in ~30 ms)
    def _arr(cv: list[int]) -> str:
        return "array(" + ",".join(f"{v}L" for v in cv) + ")"

    cb_map = F.expr(
        "map("
        + ",".join(
            f"{sub},array("
            + ",".join(
                f"named_struct('c',{code},'cv',{_arr(cv)})" for code, cv in rows
            )
            + ")"
            for sub, rows in sorted(cb_by_sub.items())
        )
        + ")"
    )

    def dist_to(cw):
        return F.aggregate(
            F.zip_with("sv", cw["cv"], lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    # one (dist, code) struct per codeword — each distance computed
    # exactly once — then a lexicographic array_min: in-row argmin.
    # The min rides through its own projection so the two field reads
    # below don't re-evaluate the fold (CollapseProject keeps
    # non-cheap expressions single-evaluation, but don't rely on it).
    scored = F.transform(
        cb_map[F.col("sub")],
        lambda cw: F.struct(dist_to(cw).alias("d"), cw["c"].alias("c")),
    )
    return (
        subs.withColumn("__best", F.array_min(scored))
        .select(
            id_col,
            *carry,
            "sub",
            F.col("__best.c").alias("code"),
            F.col("__best.d").alias("dist_sq"),
        )
    )


# ------------------------------------------------- residual IVF-PQ


def _coarse_best(qv: "list[int]", centroids):
    """Driver-side coarse assignment: argmax exact dot over the
    centroid list, ties to the lowest centroid id — the SAME
    convention as the in-row assignment (``ivf_pq_search``) and the
    probe selection, stated once for driver-side metadata (donor
    residuals, query residuals)."""
    return min(
        centroids,
        key=lambda c: (-sum(a * b for a, b in zip(qv, c[1])), c[0]),
    )


def _residual_cb_lit(cb: "dict[int, list[list[int]]]"):
    """Trained-codebook plan literal, indexed by subspace:
    ``array`` (1-based via element_at) of per-sub ``array<struct<c,
    cv>>`` — n_sub × n_codes × sub_dim longs of bounded metadata,
    ONE parsed expression (the pq_encode py4j-cost rule)."""
    return F.expr(
        "array("
        + ",".join(
            "array("
            + ",".join(
                f"named_struct('c',{code},'cv',{_arr_lit(cw)})"
                for code, cw in enumerate(cb[sub])
            )
            + ")"
            for sub in range(len(cb))
        )
        + ")"
    )


def _rs_assign(proj, cb_lit, id_col):
    """(id, cluster, residual-slices) -> one row per (vector,
    subspace) with its nearest-codeword assignment: posexplode the
    per-sub residual slices, then an IN-ROW argmin over that sub's
    codewords ((dist, code) lexicographic array_min — each distance
    computed exactly once, ties to the lowest code, the pq_encode
    discipline). Zero joins: the codebook rides the plan as a
    literal."""
    subs = proj.select(
        id_col, "__cluster", F.posexplode("__rs").alias("sub", "sv")
    )

    def dist_to(cw):
        return F.aggregate(
            F.zip_with("sv", cw["cv"], lambda a, b: (a - b) * (a - b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    scored = F.transform(
        F.element_at(cb_lit, (F.col("sub") + 1).cast("int")),
        lambda cw: F.struct(dist_to(cw).alias("d"), cw["c"].alias("c")),
    )
    return (
        subs.withColumn("__best", F.array_min(scored))
        .select(
            id_col,
            "__cluster",
            F.col("sub").cast("int").alias("sub"),
            "sv",
            F.col("__best.c").alias("code"),
        )
    )


def _trunc_div(s: int, n: int) -> int:
    """TRUNCATING integer division — the engine-portable centroid-
    mean convention (operators/kmeans.py module docstring: Python //
    floors negatives one lower than Spark div / DuckDB integer //)."""
    return s // n if s >= 0 else -((-s) // n)


def _train_residual_codebooks(
    proj, cb0, n_sub: int, sub_dim: int, n_updates: int, id_col: str
):
    """Per-subspace Lloyd training over the residual sub-vectors —
    ``kmeans_exact``'s loop shape with (sub, code) as the cluster
    key: per update, ONE map-side-combined aggregation folds the
    corpus to n_sub × n_codes × sub_dim rows (bounded driver
    metadata, 512 longs at the registered shape) and the centroid
    mean truncates (portable). Empty (sub, code) cells keep their
    previous codeword, exactly as kmeans keeps empty clusters.

    All subspaces train CONCURRENTLY in each pass — the subspace is
    part of the aggregation key, so k independent per-sub k-means
    runs cost the same jobs as one (the independence that makes PQ
    training cheap at 100 TB: n_updates scans, each collapsing
    map-side to bounded metadata)."""
    cb = cb0
    for _ in range(n_updates):
        assigned = _rs_assign(proj, _residual_cb_lit(cb), id_col)
        sums = (
            assigned.select(
                "sub", "code", F.posexplode("sv").alias("dim", "qd")
            )
            .groupBy("sub", "code", "dim")
            .agg(F.sum("qd").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        new: dict = {}
        for r in sums:
            vec = new.setdefault(
                (int(r["sub"]), int(r["code"])), [0] * sub_dim
            )
            vec[int(r["dim"])] = _trunc_div(int(r["s"]), int(r["n"]))
        cb = {
            sub: [
                new.get((sub, code), cb[sub][code])
                for code in range(len(cb[sub]))
            ]
            for sub in range(n_sub)
        }
    return cb


def ivf_pq_residual_search(
    emb,
    n_queries: int = 4,
    k: int = 3,
    n_clusters: int = 8,
    n_probe: int = 2,
    n_sub: int = 4,
    sub_dim: int = 16,
    n_codes: int = 8,
    n_updates: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    salt_buckets: int = 64,
    meta_src=None,
    materialize: str = "checkpoint",
):
    """IVF-PQ with RESIDUAL encoding and TRAINED codebooks — the
    actual production layout of Jégou et al. 2011 §V, closing the
    gap ``ivf_pq_search`` declares (raw vectors, seed-donor
    codebooks): each vector is quantized as the residual
    ``r = x − centroid(x)`` against its coarse cluster, and the
    per-subspace codebooks are Lloyd-TRAINED over those residuals
    (``_train_residual_codebooks`` — kmeans_exact's loop with
    (sub, code) as the key). Residuals concentrate near zero once
    the coarse quantizer absorbs cluster structure, so a trained
    residual codebook spends its codes where the mass is — the
    recall-per-byte argument, property-tested in
    tests/test_r12_queries.py against the raw-PQ baseline at equal
    code budget.

    Deterministic exact-integer conventions shared with the anchors:
    centroids/queries are the smallest-id heads, coarse assignment is
    argmax-dot (ties to lowest centroid id), codebook seeds are the
    md5-ordered donors' residual sub-vectors (selection recipe:
    ``_pq_seed_candidates``, one definition), centroid means
    truncate. The ADC tables are per (query, PROBED CLUSTER): the
    query is re-expressed as its residual against EACH probed
    centroid (the §V asymmetric-distance form — a raw-PQ LUT reused
    across clusters would be wrong under residual encoding). Returns
    top ``k`` per query: ``(vec_id, neighbor_id, cluster, adc_dist,
    rank)``, ties by (adc_dist, neighbor_id) — all exact
    BIGINT/INT, full hash check.

    Plan: ONE metadata collect (donors ∪ heads); the residual
    projection (in-row coarse argmax + centroid-map residual +
    per-sub slices) is materialized ONCE (the registered query passes
    ``materialize='persist'`` — lineage-recoverable AND it preserves
    the projection's hash partitioning, which the final code fold's
    groupBy(id, cluster) reuses; localCheckpoint drops
    outputPartitioning and forced a fresh corpus exchange there —
    optimization r13)
    so the n_updates training passes and the final encode don't
    re-read the corpus; each training pass collapses map-side to
    n_sub × n_codes × sub_dim metadata rows; the final encode folds
    codes per (vector, cluster) in ONE corpus-sized shuffle (the
    posting cluster rides the fold — no postings join); the
    (cluster -> [(query, lut)]) probe table rides the plan as ONE
    map literal (ANSI-safe try_element_at — unprobed postings never
    leave the scan); two-phase salted top-k. At 100 TB: training
    cost is n_updates bounded-metadata scans, search cost is the
    probed fraction of the codes table — same asymptotics as
    ivf_pq_search, better recall per code byte.

    Headroom: residual elements are |r| <= 2·QUANT··· bounded by
    2e4 in practice (unit-norm-ish inputs); per-sub dist <=
    sub_dim·(4e4)² ≈ 2.6e10, ADC sum <= n_sub× that ≈ 1e11 — exact
    in BIGINT at any corpus size."""
    meta = emb if meta_src is None else meta_src
    seed_qvs, heads = _collect_pq_metadata(
        meta, n_codes, max(n_clusters, n_queries), id_col, vec_col
    )
    centroids = heads[:n_clusters]
    queries = heads[:n_queries]
    if not seed_qvs or not centroids or not queries:
        return emb.select(
            F.col(id_col).alias("vec_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(None).cast("long").alias("cluster"),
            F.lit(None).cast("long").alias("adc_dist"),
            F.lit(None).cast("int").alias("rank"),
        ).where(F.lit(False))

    # seed codebook: each md5-ordered donor contributes its RESIDUAL
    # sub-vectors (vs its own coarse centroid) — the residual-space
    # analogue of pq_encode's donor convention
    cb0: dict = {sub: [] for sub in range(n_sub)}
    for qv in seed_qvs:
        _, cqv = _coarse_best(qv, centroids)
        rv = [a - b for a, b in zip(qv, cqv)]
        for sub in range(n_sub):
            cb0[sub].append(rv[sub * sub_dim : (sub + 1) * sub_dim])

    # residual projection: in-row coarse argmax (``_cluster_expr``,
    # the one assignment convention), residual via a centroid
    # map-literal lookup (key always present — assignment picks from
    # the map's own keys), per-sub slices; materialized once for the
    # training passes + final encode
    cmap_lit = F.expr(
        "map("
        + ",".join(f"{cid}L,{_arr_lit(cv)}" for cid, cv in centroids)
        + ")"
    )
    rv_col = F.zip_with(
        "__qv",
        F.element_at(cmap_lit, F.col("__cluster")),
        lambda a, b: a - b,
    )
    proj = (
        emb.select(F.col(id_col), int_basis(F.col(vec_col)).alias("__qv"))
        .select(
            F.col(id_col),
            "__qv",
            _cluster_expr(centroids, "__qv").alias("__cluster"),
        )
        .select(
            F.col(id_col),
            "__cluster",
            F.transform(
                F.sequence(F.lit(0), F.lit(n_sub - 1)),
                lambda i: F.slice(
                    rv_col, (i * sub_dim + 1).cast("int"), sub_dim
                ),
            ).alias("__rs"),
        )
    )
    if materialize == "checkpoint":
        # lazy: the first training pass's full-scan aggregation (or,
        # at n_updates=0, the final encode) materializes the
        # checkpoint as a side effect — same compute, one fewer job
        # barrier (optimization r12; was eager=True)
        proj = proj.localCheckpoint(eager=False)
    elif materialize == "persist":
        proj = proj.persist()
    elif materialize is not None:
        raise ValueError(
            f"materialize must be 'checkpoint'|'persist'|None, got {materialize!r}"
        )

    cb = _train_residual_codebooks(
        proj, cb0, n_sub, sub_dim, n_updates, id_col
    )

    codes = _rs_assign(proj, _residual_cb_lit(cb), id_col)
    code_arr = _code_fold(codes, id_col, "__cluster")

    # probe table: per query, its n_probe best clusters by the SAME
    # exact dot + tiebreak; the LUT is per (query, cluster) — the
    # query residual changes with the probed centroid
    probes: dict = {}
    for qid, qv in queries:
        order = sorted(
            centroids,
            key=lambda c: (-sum(a * b for a, b in zip(qv, c[1])), c[0]),
        )[:n_probe]
        for cid, cqv in order:
            rvq = [a - b for a, b in zip(qv, cqv)]
            lut = [
                [
                    sum(
                        (rvq[sub * sub_dim + j] - cw[j]) ** 2
                        for j in range(sub_dim)
                    )
                    for cw in cb[sub]
                ]
                for sub in range(n_sub)
            ]
            probes.setdefault(cid, []).append((qid, lut))
    probe_lit = F.expr(
        "map("
        + ",".join(
            f"{cid}L,array("
            + ",".join(_q_lut_struct(qid, lut) for qid, lut in lst)
            + ")"
            for cid, lst in sorted(probes.items())
        )
        + ")"
    )

    scored = code_arr.select(
        F.col(id_col).alias("neighbor_id"),
        "__codes",
        F.col("__cluster").alias("cluster"),
        F.explode(
            F.try_element_at(probe_lit, F.col("__cluster"))
        ).alias("__q"),
    ).where(F.col("neighbor_id") != F.col("__q.q"))
    s = scored.select(
        F.col("__q.q").alias("vec_id"),
        "neighbor_id",
        F.col("cluster").cast("long").alias("cluster"),
        _adc_fold(n_sub).alias("adc_dist"),
    )
    return _salted_topk(s, k, salt_buckets, carry=("cluster",))
