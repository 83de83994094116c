"""Group I round-4 additions, second batch — corpus-statistics
pipeline stages (semantics that depend on the whole corpus, not the
row) plus the SemDeDup-shaped semantic deduplicator:

- i_dedup_semantic: cluster-then-dedup over embeddings — duplicates
  are only sought WITHIN a cluster, so the N^2 pairwise pass never
  happens (the design of Abbas et al.'s SemDeDup); deterministic
  centroids + integer-dot assignment make it exact-SQL-checkable.
- i_text_boilerplate: C4/CCNet-style boilerplate line removal,
  restated over the newline-free testbed docs as 2-word segments
  shared by >= 25 distinct documents.
- i_text_rarity: corpus document-frequency rarity score in integer
  basis points.
- i_chunk_overlap: overlapping token-window chunking (context-length
  splitting), purely scan-side.

Implementations live in operators/corpus.py and
operators/similarity.py; these are the driver-checked bindings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkclif.io import spread_by_bytes, table
from sparkclif.operators import corpus as C
from sparkclif.operators import similarity as S
from sparkclif.registry import register


@register(
    "i_dedup_semantic",
    cache_plan=False,  # builds the centroid broadcast at plan time
    # oracle_in_bench=False: the oracle's within-cluster ALL-PAIRS join
    # is the semantics the cluster-local BLAS replaces — quadratic per
    # cluster in SQL, not a comparable plan shape for baseline timing
    # (same convention as cosine top-k). Correctness stays hash-checked
    # at sf0.01.
    oracle_in_bench=False,
    # Exact restatement: assign = nearest of the 8 lowest-id vectors
    # by integer-quantized dot (ties to lowest centroid id — the IVF
    # assign contract), dup = any SAME-cluster lower-id vector with
    # round(cosine, 4) >= 0.4.
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    cent AS (SELECT vec_id AS c_id, v AS cv FROM e ORDER BY vec_id LIMIT 8),
    scores AS (
        SELECT e.vec_id, c.c_id,
               CAST(sum(CAST(floor(e.v[d.d] * 10000) AS BIGINT)
                        * CAST(floor(c.cv[d.d] * 10000) AS BIGINT))
                    AS BIGINT) AS score
        FROM e CROSS JOIN cent c
        CROSS JOIN (SELECT unnest(range(1, 65)) AS d) d
        GROUP BY e.vec_id, c.c_id
    ),
    asg AS (
        SELECT vec_id, c_id AS cluster FROM scores
        QUALIFY row_number() OVER (PARTITION BY vec_id
                                   ORDER BY score DESC, c_id) = 1
    ),
    dup AS (
        SELECT a.vec_id, count(*) AS n_dup_lower
        FROM asg a
        JOIN asg b ON b.cluster = a.cluster AND b.vec_id < a.vec_id
        JOIN e ea ON ea.vec_id = a.vec_id
        JOIN e eb ON eb.vec_id = b.vec_id
        WHERE round(list_cosine_similarity(ea.v, eb.v), 4) >= 0.4
        GROUP BY a.vec_id
    )
    SELECT a.vec_id, a.cluster,
           CAST(coalesce(d.n_dup_lower, 0) AS BIGINT) AS n_dup_lower,
           CAST(CASE WHEN d.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS kept
    FROM asg a LEFT JOIN dup d ON d.vec_id = a.vec_id
    """,
)
def i_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup, SemDeDup shape: embeddings are clustered
    (deterministic centroids, exact integer-dot assignment) and
    near-duplicates (round(cosine,4) >= 0.4) are marked ONLY within
    clusters via one cluster-local BLAS per group — the oracle's
    all-pairs join is the semantics, never the plan. keep-first policy:
    kept = no lower-id in-cluster near-duplicate."""
    emb = table(spark, sf_dir, "embeddings")
    return S.semantic_dedup(emb, n_centroids=8, tau=0.4)


@register(
    "i_text_boilerplate",
    # Exact restatement: 2-word non-overlapping segments (ragged tail
    # dropped), boilerplate = segment in >= 25 distinct docs,
    # clean_text = kept segments rejoined in document order.
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
        FROM documents
    ),
    s AS (
        SELECT doc_id, d.i AS pos,
               array_to_string(toks[2 * d.i + 1 : 2 * d.i + 2], ' ') AS seg
        FROM t
        CROSS JOIN (SELECT unnest(range((SELECT max(len(toks)) FROM t))) AS i) d
        WHERE d.i < len(toks) // 2
    ),
    b AS (
        SELECT seg FROM s GROUP BY seg HAVING count(DISTINCT doc_id) >= 25
    )
    SELECT t.doc_id,
           CAST(coalesce(count(s.seg), 0) AS BIGINT) AS n_segs,
           CAST(coalesce(sum(CASE WHEN b.seg IS NOT NULL THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_boiler,
           coalesce(string_agg(CASE WHEN b.seg IS NULL THEN s.seg END,
                               ' ' ORDER BY s.pos), '') AS clean_text
    FROM t
    LEFT JOIN s ON s.doc_id = t.doc_id
    LEFT JOIN b ON b.seg = s.seg
    GROUP BY t.doc_id
    """,
)
def i_text_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal: segments occurring in >= 25 distinct docs
    (the headers/nav-chrome of web text) are stripped; each doc comes
    back as (n_segs, n_boiler, clean_text). The boilerplate set is
    heavy-hitters-only, so it broadcasts back over the exploded scan."""
    docs = spread_by_bytes(table(spark, sf_dir, "documents"))
    return C.boilerplate_removal(docs, min_docs=25, width=2)


@register(
    "i_text_rarity",
    # plan-cacheable: below MATERIALIZE_INPUT_BYTES (any bench sf)
    # rarity_score skips the tf checkpoint, so the builder is a pure
    # lazy plan. Above it the build attaches a localCheckpoint — if
    # bench ever runs at that scale, flip back to False so timed runs
    # re-pay the materialization.
    # Exact restatement: rare type = document frequency <= 10% of the
    # corpus; per doc, occurrences of rare types in integer basis
    # points (floor division — both engines floor on positives).
    oracle=r"""
    WITH w AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
                   AS tok
        FROM documents
    ),
    rare AS (
        SELECT tok FROM w GROUP BY tok
        HAVING count(DISTINCT doc_id) * 100 <= (SELECT count(*) FROM documents) * 10
    )
    SELECT w.doc_id,
           CAST(count(*) AS BIGINT) AS n_toks,
           CAST(sum(CASE WHEN r.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rare,
           CAST(sum(CASE WHEN r.tok IS NOT NULL THEN 1 ELSE 0 END) * 10000
                // count(*) AS BIGINT) AS rare_bp
    FROM w LEFT JOIN rare r ON r.tok = w.tok
    GROUP BY w.doc_id
    """,
)
def i_text_rarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency rarity score per document: occurrences of
    rare token types (df <= 10% of docs) as integer basis points —
    high flags junk, zero flags template text. One tokenize pass (df
    derives from the materialized tf relation); the common set
    broadcasts back over tf. Spread is hash-partitioned on doc_id so
    the tf agg and the final per-doc agg reuse that one exchange."""
    docs = spread_by_bytes(table(spark, sf_dir, "documents"), by=["doc_id"])
    return C.rarity_score(docs, rare_df_pct=10)


@register(
    "i_chunk_overlap",
    # Exact restatement: chunk i covers toks[12i+1 : 12i+16];
    # 1 + ceil(max(n-16, 0)/12) chunks so every token is covered and
    # the final chunk may run short.
    # coalesce mirrors the operator's NULL-text-as-empty contract —
    # without it a NULL/empty doc diverges (oracle drops or NULLs the
    # row where the operator keeps one empty chunk)
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    c AS (
        SELECT doc_id, d.i AS chunk_id, toks[d.i * 12 + 1 : d.i * 12 + 16] AS ctoks
        FROM t
        CROSS JOIN (SELECT unnest(range(greatest((SELECT max(len(toks)) FROM t), 1)))
                    AS i) d
        WHERE d.i < 1 + greatest(CAST(ceil((len(toks) - 16) / 12.0) AS BIGINT), 0)
    )
    SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(coalesce(len(ctoks), 0) AS BIGINT) AS n_chunk_toks,
           coalesce(array_to_string(ctoks, ' '), '') AS chunk_text
    FROM c
    """,
)
def i_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (16-token windows, stride 12)
    — the context-length splitter. Purely scan-side array expressions:
    zero shuffle, zero Python."""
    docs = table(spark, sf_dir, "documents")
    return C.chunk_overlap(docs, chunk=16, stride=12)


@register(
    "i_text_tfidf",
    # integer IDF surrogate: idf_bp = (n_docs * 10000) div df — order-
    # equivalent to log(n_docs/df) for ranking, and exact integer
    # arithmetic cross-engine; top-3 terms per doc by
    # (tf * idf_bp desc, tok asc).
    oracle=r"""
    WITH w AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
                   AS tok
        FROM documents
    ),
    tf AS (SELECT doc_id, tok, count(*) AS tf FROM w GROUP BY doc_id, tok),
    df AS (
        SELECT tok,
               (SELECT count(*) FROM documents) * 10000
                   // count(DISTINCT doc_id) AS idf_bp
        FROM w GROUP BY tok
    )
    SELECT doc_id, tok,
           CAST(tf * idf_bp AS BIGINT) AS score,
           CAST(rn AS INT) AS rank
    FROM (
        SELECT tf.doc_id, tf.tok, tf.tf, df.idf_bp,
               row_number() OVER (PARTITION BY tf.doc_id
                                  ORDER BY tf.tf * df.idf_bp DESC, tf.tok) AS rn
        FROM tf JOIN df USING (tok)
    ) scored
    WHERE rn <= 3
    """,
)
def i_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF with an
    integer IDF surrogate (idf_bp = n_docs*10⁴ div df — monotone in
    1/df, so rankings match log-IDF, and the arithmetic is exact
    cross-engine). Plan: ONE tokenize pass — tf agg (map-side
    combined), then df derived FROM the tf relation (tf already holds
    one row per (doc, tok), so df is a plain count over it; the
    sparse-pairs df-from-tf move) — vocabulary-sized idf table
    broadcast back + per-doc top-3 window with deterministic ties.
    The spread is hash-partitioned on doc_id, so the tf agg AND the
    per-doc window both satisfy their distribution from that single
    exchange (only the vocabulary-sized df agg re-shuffles); AQE's
    ReusedExchange dedupes tf between the idf and scored branches."""
    docs = spread_by_bytes(table(spark, sf_dir, "documents"), by=["doc_id"])
    from sparkclif.operators.text import tokens as _tokens

    w = docs.select("doc_id", F.explode(_tokens("text")).alias("tok"))
    tf = w.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    n_docs = docs.agg(F.count("*").cast("long").alias("__n"))
    idf = (
        tf.groupBy("tok")
        .agg(F.count("*").alias("__df"))
        .crossJoin(F.broadcast(n_docs))
        .select("tok", F.expr("(__n * 10000) div __df").alias("idf_bp"))
    )
    # No broadcast hint on idf (r8): unlike rarity's COMMON set or
    # boilerplate's heavy hitters, idf is the FULL vocabulary — under
    # a Zipfian corpus the vocabulary grows with the data and a forced
    # broadcast is a driver OOM at 100 TB (the interval_grid ADVICE r7
    # class). AQE still broadcasts it at bench scale (well under the
    # threshold); past that bound the tok-keyed shuffle join with AQE
    # skew split is the right plan. Join-strategy hints never change
    # results, so the hash is unchanged by construction.
    scored = tf.join(idf, "tok").select(
        "doc_id", "tok", (F.col("tf") * F.col("idf_bp")).cast("long").alias("score")
    )
    win = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.col("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(win).cast("int"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "tok", "score", "rank")
    )


@register(
    "i_dedup_substring",
    # oracle_in_bench=False: the oracle winnows via every-position
    # list comprehensions (134 s/pass in DuckDB at sf0.1) — it states
    # the selection semantics, not a comparable plan, and timing it
    # would both blow the bench budget and inflate the baseline.
    # Correctness stays hash-checked at sf0.01.
    oracle_in_bench=False,
    # Exact restatement of the winnowing selection: every-position
    # 32-char grams, minimum gram of each sliding 16-group (single
    # group when a doc has fewer than 16 grams); distinct selected
    # grams in [2, 16] docs emit all pairs, grams in MORE docs emit
    # star pairs against the bucket's lowest id; count per pair.
    oracle=r"""
    WITH g AS (
        SELECT doc_id,
               [substr(text, i, 32)
                for i in range(1, greatest(length(text) - 31, 0) + 1)] AS grams
        FROM documents
        WHERE length(text) >= 32
    ),
    sel AS (
        SELECT doc_id,
               unnest(list_distinct(
                   CASE WHEN len(grams) < 16
                        THEN [list_aggregate(grams, 'min')]
                        ELSE [list_aggregate(grams[i : i + 15], 'min')
                              for i in range(1, len(grams) - 16 + 2)]
                   END)) AS win
        FROM g
    ),
    freq AS (SELECT win, count(*) AS df, min(doc_id) AS mn
             FROM sel GROUP BY win),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM sel a
        JOIN freq f ON f.win = a.win AND f.df BETWEEN 2 AND 16
        JOIN sel b ON b.win = a.win AND b.doc_id > a.doc_id
        UNION ALL
        SELECT f.mn AS id_a, s.doc_id AS id_b
        FROM freq f
        JOIN sel s ON s.win = f.win AND s.doc_id > f.mn
        WHERE f.df > 16
    )
    SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS n_shared
    FROM pairs GROUP BY 1, 2
    """,
)
def i_dedup_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate candidates (Lee et al. 2022 shape)
    via winnowing fingerprints: content-aligned minimum-gram selection
    guarantees any common verbatim run >= 47 chars is detected
    regardless of where it sits in each document. Scan-side selection
    + one bucket shuffle + in-bucket pair emission with a df <= 16
    boilerplate cap (operators/dedup.py:substring_candidate_pairs)."""
    docs = spread_by_bytes(table(spark, sf_dir, "documents"))
    from sparkclif.operators.dedup import substring_candidate_pairs

    return substring_candidate_pairs(docs, window=32, stride=16, max_df=16)
