"""Round-12 surface additions (SURVEY.md §2.2 growth set) — the two
shapes VERDICT r11 items 3 and 4 named plus the near-dup incremental
the dedup arc lacked, all landed BEFORE the round's window commit so
they take their first driver rows THIS round:

- i_sim_ivf_pq_residual — IVF-PQ with RESIDUAL encoding and
  Lloyd-TRAINED per-subspace codebooks (Jégou et al. 2011 §V — the
  production ANN layout i_sim_ivf_pq approximates with raw
  vectors and seed-donor codebooks; the swap SURVEY §2.2's
  i_embed_pq row promised). Exact integer basis end to end:
  truncating centroid means, deterministic donor seeds, per-(query,
  probed-cluster) residual ADC tables — full hash check despite the
  iterative training (the i_cluster_kmeans discipline).
- h_stream_ann_index — streaming ANN index MAINTENANCE: a real
  Structured Streaming ingest folds micro-batches of vectors into a
  bucketed (vec_id-clustered) postings+codes state table via
  foreachBatch MERGE — the continuous form of the codes table every
  searcher reads, completing crawl-ingest → incremental dedup
  (h_stream_dedup_store) → incremental index. Per-batch shuffle
  bytes are O(delta), never O(state) (the h_stream_merge_bucketed
  contract); the final state equals the one-shot batch encode, which
  is the oracle.
- ``i_dedup_simhash_incremental`` — incremental NEAR-dup detection:
  the ingest batch's simhash fingerprints probed against the
  persisted store via 4×16-bit BANDED candidates. The pigeonhole
  guarantee is exact (Hamming ≤ 3 forces a shared band), so unlike
  MinHash-LSH the banding is a pure-function plan and the row is
  fully hash-checked — the near-dup counterpart of
  ``i_dedup_incremental`` (which only catches byte-identical
  content; this catches the near-misses exact hashing is blind to).

Reference ties: the reference's event loop folds arriving payloads
into persisted per-site state (app.py R28-R31, R36); these are that
maintain-an-index-continuously discipline applied to the ANN layout
of the brief's similarity-search pillar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkclif.io import spread_by_bytes, table
from sparkclif.registry import register
from sparkclif.session import tmp_dir


@register(
    "i_sim_ivf_pq_residual",
    # cache_plan=False: plan BUILD runs the iterative work (metadata
    # collect, residual-projection checkpoint, one training
    # aggregation job) — the i_cluster_kmeans discipline.
    cache_plan=False,
    # oracle_in_bench=False: same rule as i_cluster_kmeans — the
    # engine schedules ~4 jobs (collect + checkpoint + train + final)
    # whose per-job floor amortizes on a cluster, while the oracle's
    # one-shot unrolled-CTE chain pays none of it; not a comparable
    # plan shape for baseline timing. The oracle still gates
    # CORRECTNESS at sf0.01 every round.
    oracle_in_bench=False,
    # Exact restatement of the full residual pipeline: coarse
    # argmax-dot postings (ties lowest centroid id), residuals vs the
    # assigned centroid, md5-ordered donors seeding per-subspace
    # codebooks with the donors' RESIDUAL sub-vectors, ONE unrolled
    # Lloyd update with truncating integer means (empty (sub, code)
    # cells keep their seed via the LEFT JOIN), trained-codebook
    # encode, per-(query, probed-cluster) residual ADC tables, top-3
    # by (adc, neighbor). All-integer — DuckDB's integer // truncates
    # toward zero, matching the driver-side update (the
    # operators/kmeans.py convention note).
    oracle=r"""WITH q AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(floor(x::DOUBLE * 10000) AS BIGINT)) AS qv
    FROM embeddings
),
cent AS (
    SELECT vec_id AS cid, qv FROM q ORDER BY vec_id LIMIT 8
),
posts AS (
    SELECT vec_id, qv, c AS cluster FROM (
        SELECT q.vec_id, q.qv, cent.cid AS c,
               CAST(list_sum(list_transform(range(1, 65),
                   i -> q.qv[i] * cent.qv[i])) AS BIGINT) AS dot
        FROM q CROSS JOIN cent
    ) QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, c) = 1
),
resid AS (
    SELECT p.vec_id, p.cluster,
           list_transform(range(1, 65), i -> p.qv[i] - cent.qv[i]) AS rv
    FROM posts p JOIN cent ON cent.cid = p.cluster
),
rsub AS (
    SELECT vec_id, cluster, CAST(s.i AS INT) AS sub,
           rv[s.i * 16 + 1 : s.i * 16 + 16] AS sv
    FROM resid CROSS JOIN (SELECT unnest(range(4)) AS i) s
),
donors AS (
    SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS code, vec_id
    FROM (SELECT vec_id, md5('pq|' || vec_id::VARCHAR) AS h
          FROM q ORDER BY h, vec_id LIMIT 8)
),
cb0 AS (
    SELECT CAST(d.code AS INT) AS code, r.sub, r.sv
    FROM donors d JOIN rsub r ON r.vec_id = d.vec_id
),
a1 AS (
    SELECT vec_id, sub, sv, code FROM (
        SELECT r.vec_id, r.sub, r.sv, c.code,
               CAST(list_sum(list_transform(range(1, 17),
                   j -> (r.sv[j] - c.sv[j]) * (r.sv[j] - c.sv[j])))
                   AS BIGINT) AS d
        FROM rsub r JOIN cb0 c USING (sub)
    ) QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) = 1
),
cb1 AS (
    SELECT s.sub, s.code, coalesce(u.cv, s.sv) AS sv
    FROM cb0 s LEFT JOIN (
        SELECT sub, code, list(cd ORDER BY dim) AS cv FROM (
            SELECT sub, code, d.i AS dim,
                   CAST(CAST(sum(sv[d.i]) AS BIGINT) // count(*) AS BIGINT) AS cd
            FROM a1 CROSS JOIN (SELECT unnest(range(1, 17)) AS i) d
            GROUP BY sub, code, d.i
        ) GROUP BY sub, code
    ) u USING (sub, code)
),
codes AS (
    SELECT vec_id, sub, code FROM (
        SELECT r.vec_id, r.sub, c.code,
               CAST(list_sum(list_transform(range(1, 17),
                   j -> (r.sv[j] - c.sv[j]) * (r.sv[j] - c.sv[j])))
                   AS BIGINT) AS d
        FROM rsub r JOIN cb1 c USING (sub)
    ) QUALIFY row_number() OVER (PARTITION BY vec_id, sub ORDER BY d, code) = 1
),
qs AS (SELECT cid AS qid, qv FROM cent ORDER BY cid LIMIT 4),
probes AS (
    SELECT qid, c FROM (
        SELECT qs.qid, cent.cid AS c,
               CAST(list_sum(list_transform(range(1, 65),
                   i -> qs.qv[i] * cent.qv[i])) AS BIGINT) AS dot
        FROM qs CROSS JOIN cent
    ) QUALIFY row_number() OVER (PARTITION BY qid ORDER BY dot DESC, c) <= 2
),
qrsub AS (
    SELECT p.qid, p.c, CAST(s.i AS INT) AS sub,
           list_transform(range(s.i * 16 + 1, s.i * 16 + 17),
               j -> qs.qv[j] - cent.qv[j]) AS sv
    FROM probes p
    JOIN qs USING (qid)
    JOIN cent ON cent.cid = p.c
    CROSS JOIN (SELECT unnest(range(4)) AS i) s
),
lut AS (
    SELECT u.qid, u.c, u.sub, cb.code,
           CAST(list_sum(list_transform(range(1, 17),
               j -> (u.sv[j] - cb.sv[j]) * (u.sv[j] - cb.sv[j])))
               AS BIGINT) AS dist
    FROM qrsub u JOIN cb1 cb USING (sub)
),
cand AS (
    SELECT l.qid, co.vec_id AS neighbor_id, po.cluster,
           CAST(sum(l.dist) AS BIGINT) AS adc_dist
    FROM codes co
    JOIN posts po ON po.vec_id = co.vec_id
    JOIN lut l ON l.c = po.cluster AND l.sub = co.sub AND l.code = co.code
    WHERE co.vec_id <> l.qid
    GROUP BY l.qid, co.vec_id, po.cluster
)
SELECT vec_id, neighbor_id, CAST(cluster AS BIGINT) AS cluster, adc_dist, rank FROM (
    SELECT qid AS vec_id, neighbor_id, cluster, adc_dist,
           CAST(row_number() OVER (PARTITION BY qid ORDER BY adc_dist, neighbor_id) AS INT) AS rank
    FROM cand
) WHERE rank <= 3
""",
)
def i_sim_ivf_pq_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with residual encoding + trained codebooks — the
    production ANN layout (Jégou et al. 2011 §V): vectors are
    quantized as residuals against their coarse centroid, per-
    subspace codebooks are Lloyd-trained over those residuals (one
    bounded-metadata aggregation per update — kmeans_exact's loop
    with (sub, code) as the key), and each query's ADC tables are
    rebuilt per PROBED cluster from ITS residual. Closes VERDICT
    r11's declared gap in i_sim_ivf_pq (raw vectors, seed
    codebooks). Triple-derived: engine == SQL oracle == an
    independent Python model (tests/test_r12_queries.py), plus a
    recall property showing residual ≥ raw at equal code budget.
    See operators/quantize.py ivf_pq_residual_search for the plan
    (checkpointed residual projection, in-row training assignment,
    cluster-carrying code fold, ANSI-safe probe-map explode,
    two-phase salted top-k)."""
    from sparkclif.operators.quantize import ivf_pq_residual_search

    raw = table(spark, sf_dir, "embeddings")
    # bytes-derived spread + persist (optimization r13): a core-count
    # spread target gave every stage 32 near-empty tasks (the r12
    # driver measured 8c/32c ratio 0.64 — negative core scaling), and
    # localCheckpoint DROPS outputPartitioning, so the final code fold
    # re-shuffled the corpus; persist preserves the hash layout the
    # fold's groupBy(vec_id, cluster) reuses. Measured 1.87 -> 1.36 s
    # at 32c / neutral at 8c, results identical.
    return ivf_pq_residual_search(
        spread_by_bytes(raw, by=["vec_id"]),
        meta_src=raw,
        materialize="persist",
    )


@register(
    "h_stream_ann_index",
    cache_plan=False,
    # The stream's final state is SQL-checkable because the index is
    # a pure function of the corpus under frozen quantizers: posting
    # cluster = argmax integer dot vs the 8 smallest-id centroids
    # (ties lowest id), codes = i_embed_pq's exact encode vs the 16
    # md5-ordered donors — and the merge is idempotent (re-delivered
    # vectors re-encode identically), so final state == one-shot
    # batch encode. oracle_in_bench=False: the engine runs a genuine
    # multi-micro-batch stream with per-batch bucketed table swaps;
    # the oracle's one-shot join is not a comparable plan shape for
    # baseline timing (the h_stream_merge_bucketed rule).
    oracle_in_bench=False,
    oracle=r"""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(x::DOUBLE * 10000) AS BIGINT)) AS qv
        FROM embeddings
    ),
    cent AS (SELECT vec_id AS c_id, qv AS cqv FROM q ORDER BY vec_id LIMIT 8),
    scores AS (
        SELECT q.vec_id, c.c_id,
               CAST(list_sum(list_transform(range(1, 65),
                   j -> q.qv[j] * c.cqv[j])) AS BIGINT) AS score
        FROM q CROSS JOIN cent c
    ),
    posting AS (
        SELECT vec_id, c_id AS cluster FROM (
            SELECT vec_id, c_id,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY score DESC, c_id) AS pr
            FROM scores
        ) WHERE pr = 1
    ),
    seeds AS (
        SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS code, qv
        FROM (SELECT vec_id, qv, md5('pq|' || vec_id::VARCHAR) AS h
              FROM q ORDER BY h, vec_id LIMIT 16)
    ),
    subs AS (
        SELECT vec_id, CAST(s.i AS INT) AS sub,
               qv[s.i * 8 + 1 : s.i * 8 + 8] AS sv
        FROM q CROSS JOIN (SELECT unnest(range(8)) AS i) s
    ),
    cb AS (
        SELECT CAST(code AS INT) AS code, CAST(s.i AS INT) AS sub,
               qv[s.i * 8 + 1 : s.i * 8 + 8] AS cv
        FROM seeds CROSS JOIN (SELECT unnest(range(8)) AS i) s
    ),
    codes AS (
        SELECT vec_id, sub, code FROM (
            SELECT subs.vec_id, subs.sub, cb.code,
                   CAST(list_sum(list_transform(range(1, 9),
                       j -> (sv[j] - cv[j]) * (sv[j] - cv[j])))
                       AS BIGINT) AS dist
            FROM subs JOIN cb USING (sub)
        ) QUALIFY row_number() OVER (PARTITION BY vec_id, sub
                                     ORDER BY dist, code) = 1
    )
    SELECT co.vec_id, CAST(p.cluster AS BIGINT) AS cluster,
           co.sub, co.code
    FROM codes co JOIN posting p USING (vec_id)
    """,
)
def h_stream_ann_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ANN index maintenance: embeddings split into 3
    interleaved-id files (chunks after the first re-deliver a slice
    of their predecessor — at-least-once input, so the WHEN MATCHED
    re-encode path runs on real data) -> file source, one file per
    micro-batch -> foreachBatch coarse-assign + PQ-encode against
    FROZEN centroids/codebook -> delta-wins MERGE into a bucketed
    (vec_id, cluster, codes) state table (streaming/ann.py). Returns
    the final index exploded to (vec_id, cluster, sub, code). The
    state side of every per-batch merge join is read bucket-
    co-located — per-batch shuffle bytes are O(delta), never
    O(state) (asserted in tests/test_r12_queries.py) — and the final
    state equals the one-shot batch encode, which is the oracle."""
    from sparkclif.operators.quantize import _collect_pq_metadata
    from sparkclif.streaming.ann import stream_ann_index, write_vec_chunks

    raw = table(spark, sf_dir, "embeddings")
    # frozen index parameters, ONE bounded collect: 16 md5-ordered
    # codebook donors + the 8 smallest-id coarse centroids
    codebook, heads = _collect_pq_metadata(
        raw, 16, 8, "vec_id", "embedding"
    )
    centroids = heads[:8]
    if not codebook or not centroids:
        # empty corpus: nothing to index — and empty quantizer
        # literals would fail analysis in the scan-side encode
        # (round-12 review)
        return spark.createDataFrame(
            [], "vec_id long, cluster long, sub int, code int"
        )

    src = tmp_dir() + "/stream_ann_src"
    write_vec_chunks(f"{sf_dir}/embeddings.parquet", src, n_chunks=3)
    state = stream_ann_index(spark, src, centroids, codebook)
    out = spark.createDataFrame(
        state, "vec_id long, cluster long, codes array<int>"
    )
    return out.select(
        "vec_id",
        "cluster",
        F.posexplode("codes").alias("sub", "code"),
    )


@register(
    "i_dedup_simhash_incremental",
    # Exact restatement: i_dedup_simhash's fps CTE chain verbatim
    # (md5 token basis, per-bit majority, sign-bit packing), split
    # into batch (doc_id % 3 = 0) and store; bands via the portable
    # signed-shift-then-mask slice (the mask discards sign-extension
    # bits — identical on both engines including the sign-bit band);
    # candidates share an exact band; winner = (hamming, id)-minimal
    # within threshold; store precedence over batch order (the
    # i_dedup_incremental convention). bit_count(xor()) on signed
    # BIGINT counts two's-complement bits identically on both
    # engines (measured, see tests).
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_distinct(list_filter(
                   regexp_split_to_array(text, '\s+'), x -> x <> ''))) AS tok
        FROM documents
    ),
    hashed AS (
        SELECT doc_id, ('0x' || substr(md5(tok), 17, 16))::UBIGINT AS h
        FROM toks
    ),
    votes AS (
        SELECT doc_id, b.bit,
               CASE WHEN 2 * count(*) FILTER (WHERE ((h >> b.bit) & 1) = 1)
                         > count(*)
                    THEN 1 ELSE 0 END AS maj
        FROM hashed CROSS JOIN (SELECT unnest(range(64)) AS bit) b
        GROUP BY doc_id, b.bit
    ),
    fps AS (
        SELECT doc_id,
               CAST(sum(CASE WHEN bit = 63
                             THEN -maj * 9223372036854775808
                             ELSE maj * (1::BIGINT << bit) END)
                    AS BIGINT) AS simhash
        FROM votes GROUP BY doc_id
    ),
    batchf AS (SELECT doc_id, simhash FROM fps WHERE doc_id % 3 = 0),
    storef AS (SELECT doc_id, simhash FROM fps WHERE doc_id % 3 <> 0),
    bands AS (SELECT unnest(range(4)) AS band),
    bb AS (SELECT doc_id, simhash, band,
                  (simhash >> (16 * band)) & 65535 AS bv
           FROM batchf CROSS JOIN bands),
    sb AS (SELECT doc_id, simhash, band,
                  (simhash >> (16 * band)) & 65535 AS bv
           FROM storef CROSS JOIN bands),
    sm AS (
      SELECT doc_id, match_id, ham FROM (
        SELECT DISTINCT bb.doc_id, sb.doc_id AS match_id,
               bit_count(xor(bb.simhash, sb.simhash)) AS ham
        FROM bb JOIN sb ON bb.band = sb.band AND bb.bv = sb.bv
      ) WHERE ham <= 3
      QUALIFY row_number() OVER (PARTITION BY doc_id
                                 ORDER BY ham, match_id) = 1
    ),
    bm AS (
      SELECT doc_id, match_id, ham FROM (
        SELECT DISTINCT a.doc_id, b2.doc_id AS match_id,
               bit_count(xor(a.simhash, b2.simhash)) AS ham
        FROM bb a JOIN bb b2 ON a.band = b2.band AND a.bv = b2.bv
                            AND b2.doc_id < a.doc_id
      ) WHERE ham <= 3
      QUALIFY row_number() OVER (PARTITION BY doc_id
                                 ORDER BY ham, match_id) = 1
    )
    SELECT f.doc_id, f.simhash,
           CASE WHEN sm.match_id IS NOT NULL THEN 'dup_store'
                WHEN bm.match_id IS NOT NULL THEN 'dup_batch'
                ELSE 'kept' END AS status,
           coalesce(sm.match_id, bm.match_id) AS match_id,
           CAST(coalesce(sm.ham, bm.ham) AS BIGINT) AS hamming
    FROM batchf f
    LEFT JOIN sm USING (doc_id)
    LEFT JOIN bm USING (doc_id)
    """,
)
def i_dedup_simhash_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental NEAR-dup detection: the new ingest batch's simhash
    fingerprints probed against the persisted store's via BANDED
    candidate generation (4 × 16-bit bands; pigeonhole makes the
    Hamming ≤ 3 guarantee exact, so the banding is a pure-function
    plan, fully hash-checked — unlike MinHash-LSH's probabilistic
    recall). The near-dup counterpart of ``i_dedup_incremental``:
    byte-identical content is that query's job; this one catches the
    near-misses exact hashing is blind to. History/batch simulated by
    doc_id % 3; each side's filter sits BELOW the simhash kernel
    (Catalyst cannot push a filter through mapInPandas — the
    i_decontaminate scan-once lesson). Statuses at sf0.01:
    88 dup_store / 6 dup_batch / 73 kept — all three paths
    data-exercised. See operators/dedup.py
    dedup_simhash_incremental for the 100 TB plan (bounded band
    explodes, two equi-joins, min-struct winners; runs after exact
    dedup so band buckets stay small)."""
    from sparkclif.operators import dedup as D

    docs = spread_by_bytes(table(spark, sf_dir, "documents"))
    batch_fps = D.simhash64(docs.where(F.col("doc_id") % 3 == 0))
    store_fps = D.simhash64(docs.where(F.col("doc_id") % 3 != 0))
    return D.dedup_simhash_incremental(batch_fps, store_fps)
