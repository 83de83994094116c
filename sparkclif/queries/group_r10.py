"""Round-10 surface additions (SURVEY.md §2.2 growth set) — the three
shapes VERDICT r9 item 3 named, all landed BEFORE the round's window
commit so they take their first driver rows THIS round:

- ``c_join_asof_forward`` — forward-direction as-of join, closing the
  direction family (backward r5, tolerance + nearest r8): each event
  matched to its user's EARLIEST at-or-after order. Same
  single-shuffle union-sort operator, carried by one DESCENDING
  window (``operators/asof.py asof_join_forward``).
- ``i_embed_normalize`` — the projection ``i_embed_dim_stats`` exists
  to feed: per-dimension corpus moments applied to every vector as a
  mean-center / variance-whiten transform (the preprocessing step
  before PQ/IVF indexing and before embedding-space dedup). Moments
  aggregate to ONE broadcast row; the projection is scan-side
  arithmetic over the exact integer basis.
- ``h_stream_dedup_store`` — the streaming form of
  ``i_dedup_incremental`` (the one r8 candidate not yet picked up):
  micro-batches of new documents probed against a persisted
  fingerprint store that each batch's kept hashes are appended to —
  the production crawl-ingest loop, with state as a parquet table
  (restart-safe, queryable) instead of a private state store.

Reference ties: the reference's event loop processes arriving payloads
against persisted listing state and appends accepted entries back
(app.py R23–R27 ingest + R36 loop); ``h_stream_dedup_store`` is that
accept/ignore-duplicate discipline over corpus fingerprints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkclif.io import table
from sparkclif.operators.asof import asof_join_forward
from sparkclif.operators.quantize import dim_stats, int_basis
from sparkclif.registry import register
from sparkclif.session import tmp_dir


def embed_normalize_plan(emb: DataFrame) -> DataFrame:
    """See i_embed_normalize. Moments ride the exact BIGINT basis
    (q = floor(v*10000), the dim_stats/quantize convention): the
    centered value is stated as the all-integer numerator
    ``c_i = n_i*q_i - sum_q_i`` (the e_win_zscore trick — scaling by
    n clears the division, so c is EXACT), and the whitened z divides
    by ``sqrt(n_i*sumsq_q_i - sum_q_i^2)`` — both operands exact
    integer-valued doubles, so division and sqrt are each one
    correctly-rounded IEEE op and the unrounded double is
    bit-identical across engines (the i_quality_classifier
    precedent; round(4) would sit on decimal half-boundaries).

    Plan: dim_stats' posexplode+agg collapses the corpus to D moment
    rows; ONE further single-row aggregation packs them into a
    dim-sorted struct array; a broadcast cross join hands that one
    row to every scan task (Catalyst broadcasts a 1-row side with or
    without the hint — stated anyway); the projection itself is a
    per-row zip_with + two JVM folds, zero additional exchanges. The
    corpus is scanned twice by construction — global moments must
    exist before any vector can be projected (a real pipeline
    persists the moment row; the shape is otherwise identical).

    BIGINT headroom mirrors dim_stats: at ~1e12 vectors
    ``n*sumsq_q`` ≈ 1e20 overflows — widen the moment columns (only)
    to decimal(38, 0) at that scale; z's numerator/denominator stay
    under 2^53 far longer (|c| ≤ n·2e4) and the bench keeps BIGINT so
    the DuckDB hash compare sees identical dtypes."""
    d = dim_stats(emb)
    m = d.groupBy().agg(
        F.sort_array(
            F.collect_list(F.struct("dim", "n", "sum_q", "sumsq_q"))
        ).alias("m")
    )
    q = int_basis(F.col("embedding"))
    # Ragged/NULL hygiene, stating exactly the oracle's semantics
    # (round-10 review — latent on the uniformly-length-64 testbed):
    # - a NULL/empty vector produces no unnested rows in the oracle
    #   (WHERE d.i < len(v)), so its vec_id is ABSENT from the output
    #   — filtered here (size(NULL) is -1, so > 0 covers both);
    # - a SHORTER vector must fold over its own dims only — zip_with
    #   against the full corpus-width moment array would NULL-pad and
    #   poison the folds, so m is sliced to the vector's length;
    # - a NULL element yields a NULL centered value, which SQL's
    #   sum/CASE skip — the folds coalesce it to the same effect.
    e = (
        emb.select("vec_id", q.alias("q"))
        .where(F.size("q") > 0)
        .crossJoin(F.broadcast(m))
    )
    c = F.zip_with(
        F.col("q"),
        F.slice(F.col("m"), F.lit(1), F.size("q")),
        lambda qi, mi: mi["n"] * qi - mi["sum_q"],
    )
    z0_det = (
        F.col("m")[0]["n"] * F.col("m")[0]["sumsq_q"]
        - F.col("m")[0]["sum_q"] * F.col("m")[0]["sum_q"]
    )
    row = e.select(
        "vec_id",
        F.size("q").cast("long").alias("n_dims"),
        c.alias("c"),
        z0_det.alias("__det0"),
    )
    return row.select(
        "vec_id",
        "n_dims",
        F.aggregate(
            "c",
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.coalesce(F.abs(x), F.lit(0)),
        ).alias("c_abs_sum"),
        F.aggregate(
            "c",
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.coalesce((x > 0).cast("long"), F.lit(0)),
        ).alias("n_pos"),
        F.when(
            F.col("__det0") > 0,
            F.element_at("c", 1).cast("double")
            / F.sqrt(F.col("__det0").cast("double")),
        ).alias("z0"),
    )


@register(
    "c_join_asof_forward",
    # Exact restatement: earliest at-or-after order per event
    # (inclusive >=, min-orderkey tiebreak), stated as the rn=1 row of
    # an ascending rank — c_join_asof's oracle with the direction
    # flipped.
    oracle="""
    WITH ranked AS (
        SELECT e.event_id, o.o_orderkey, o.o_totalprice,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate ASC, o.o_orderkey ASC
               ) AS rn
        FROM events e
        JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate >= e.ts
    )
    SELECT e.event_id, e.user_id, e.event_type,
           m.o_orderkey AS fwd_o_orderkey,
           round(m.o_totalprice, 4) AS fwd_price
    FROM events e
    LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) m USING (event_id)
    """,
)
def c_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: each event matched to its user's earliest
    at-or-after order (inclusive, min-tiebreak — pandas
    ``merge_asof(direction='forward')``). Closes the as-of direction
    family; single-shuffle union-sort with a descending carry window
    (operators/asof.py). The 100 TB plan is the backward variant's:
    one exchange of (|L|+|R|) rows on the key, no row blowup."""
    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    o = table(spark, sf_dir, "orders")
    joined = asof_join_forward(
        ev,
        o,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
        prefix="fwd_",
    )
    return joined.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("fwd_o_orderkey"),
        F.round("fwd_o_totalprice", 4).alias("fwd_price"),
    )


@register(
    "i_embed_normalize",
    # Exact restatement over the shared floor(v*10000) BIGINT basis:
    # per-dim moments joined back to every (vec, dim) pair, centered
    # numerators n*q - s1 as exact BIGINTs, z0 as ONE IEEE division of
    # exact integer-valued doubles by one IEEE sqrt (bit-identical;
    # unrounded by design — see quality_classifier).
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
               FROM embeddings),
    x AS (
        SELECT vec_id, d.i AS dim,
               CAST(floor(v[d.i + 1] * 10000) AS BIGINT) AS q
        FROM e
        CROSS JOIN (SELECT unnest(range(greatest(
                        (SELECT max(len(v)) FROM e), 1))) AS i) d
        WHERE d.i < len(v)
    ),
    m AS (
        SELECT dim, count(*) AS n, sum(q) AS s1, sum(q * q) AS s2
        FROM x GROUP BY dim
    )
    SELECT vec_id,
           CAST(count(*) AS BIGINT) AS n_dims,
           CAST(sum(abs(m.n * q - m.s1)) AS BIGINT) AS c_abs_sum,
           CAST(sum(CASE WHEN m.n * q > m.s1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pos,
           max(CASE WHEN dim = 0 AND m.n * m.s2 - m.s1 * m.s1 > 0
                    THEN CAST(m.n * q - m.s1 AS DOUBLE)
                         / sqrt(CAST(m.n * m.s2 - m.s1 * m.s1 AS DOUBLE))
               END) AS z0
    FROM x JOIN m USING (dim)
    GROUP BY vec_id
    """,
)
def i_embed_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-center / whiten every embedding by the corpus's
    per-dimension moments — the projection i_embed_dim_stats computes
    the inputs for (preprocessing before PQ/IVF indexing and
    embedding-space dedup). Per vector: exact centered-magnitude sum
    and positive-lane count in the integer basis, plus the whitened
    z-score of dimension 0 as a bit-identical unrounded double. One
    broadcast moment row onto the scan; zero exchanges beyond the
    moment aggregation itself."""
    return embed_normalize_plan(table(spark, sf_dir, "embeddings"))


@register(
    "h_stream_dedup_store",
    cache_plan=False,
    # The stream's accumulated output is SQL-checkable because batch
    # membership is a pure function of doc_id: ingest batch = doc_id %
    # 3 = 0 (the i_dedup_incremental convention), micro-batch index
    # b = (doc_id // 100) % 3 (interleaved, so "first occurrence"
    # genuinely exercises the earlier-batch store probe). A hash's
    # status depends only on hash-level facts: in the initial store ->
    # dup_store; first seen in an EARLIER micro-batch -> dup_store
    # (that batch's kept row put it in the store); first seen in THIS
    # batch under a lower doc_id -> dup_batch; else kept. arg-min
    # (b, doc_id) is packed into one BIGINT (doc_ids are far below
    # 1e12) so the oracle needs no second window.
    # oracle_in_bench=False: the engine runs a genuine 3-micro-batch
    # foreachBatch stream with store read-backs and delta appends; the
    # oracle's one-shot join is not a comparable plan for baseline
    # timing.
    oracle_in_bench=False,
    oracle=r"""
    WITH h AS (
        SELECT doc_id,
               sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                   AS content_hash
        FROM documents
    ),
    store AS (SELECT DISTINCT content_hash FROM h WHERE doc_id % 3 <> 0),
    batch AS (
        SELECT doc_id, content_hash, (doc_id // 100) % 3 AS b
        FROM h WHERE doc_id % 3 = 0
    ),
    f AS (
        SELECT content_hash,
               min(b * 1000000000000 + doc_id) AS pk
        FROM batch GROUP BY content_hash
    )
    SELECT doc_id, content_hash,
           CAST(b AS BIGINT) AS batch_idx,
           CASE WHEN s.content_hash IS NOT NULL THEN 'dup_store'
                WHEN b > pk // 1000000000000 THEN 'dup_store'
                WHEN doc_id > pk % 1000000000000 THEN 'dup_batch'
                ELSE 'kept' END AS status
    FROM batch
    LEFT JOIN store s USING (content_hash)
    JOIN f USING (content_hash)
    """,
)
def h_stream_dedup_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental dedup against a persisted fingerprint
    store — the production crawl-ingest loop (the streaming form of
    i_dedup_incremental): history docs' distinct hashes seed a store
    parquet; the ingest batch arrives as 3 micro-batches, each probed
    against the store snapshot and appending its kept hashes before
    the next runs (streaming/dedup.py stream_dedup_against_store).
    batch_idx is re-derived from doc_id in the final projection — a
    pure function, so the stream carries no extra column."""
    from sparkclif.operators.dedup import fingerprint_sha256
    from sparkclif.streaming.dedup import stream_dedup_against_store
    from sparkclif.streaming.source import write_id_chunks

    docs = table(spark, sf_dir, "documents")
    base = tmp_dir() + "/stream_dedup_store"
    src = base + "_src"
    store_dir = base + "_store"
    write_id_chunks(f"{sf_dir}/documents.parquet", src, n_chunks=3)
    # fresh store each run: the stream APPENDS to it, so a reused
    # store from a prior run would turn every batch row dup_store
    docs.where(F.col("doc_id") % 3 != 0).select(
        fingerprint_sha256("text").alias("content_hash")
    ).dropDuplicates(["content_hash"]).write.mode("overwrite").parquet(
        store_dir
    )
    out = stream_dedup_against_store(
        spark, src, "doc_id long, text string", store_dir
    )
    return out.select(
        "doc_id",
        "content_hash",
        (F.expr("doc_id div 100") % 3).cast("long").alias("batch_idx"),
        "status",
    )
