"""Group I — LLM-data-pipeline operators (SURVEY.md §2.2 group I +
north-star additions): text analysis, dedup family, similarity search,
multimodal columns.

Implementations live in sparkclif/operators/; these are the
driver-checked query bindings over the testbed ``documents`` and
``embeddings`` tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkclif.io import spread, spread_by_bytes, table
from sparkclif.operators import dedup as D
from sparkclif.operators import multimodal as M
from sparkclif.operators import similarity as S
from sparkclif.operators import text as T
from sparkclif.registry import register


@register(
    "i_text_tokenize",
    oracle="""
    SELECT lang, tok, count(*) AS n
    FROM (
        SELECT lang, unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS tok
        FROM documents
    )
    GROUP BY lang, tok
    HAVING count(*) >= 5
    """,
)
def i_text_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize -> explode -> word frequency per language (threshold 5
    to keep the result bounded at scale)."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("lang", F.explode(T.tokens("text")).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 5)
    )


@register(
    "i_text_stats",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_chars), 4) AS avg_chars,
           CAST(sum(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')))
                AS BIGINT) AS total_tokens,
           round(count(DISTINCT lang) * 1.0, 4) AS n_langs
    FROM documents
    GROUP BY source
    """,
)
def i_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus rollup: doc/char/token counts."""
    docs = table(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.sum(T.token_count("text")).cast("long").alias("total_tokens"),
        F.round(F.countDistinct("lang") * 1.0, 4).alias("n_langs"),
    )


@register(
    "i_text_quality",
    oracle="""
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           round(CAST(len(list_filter(toks, x -> lower(x) IN
                 ('the','a','of','to','and','in','is','it'))) AS DOUBLE)
                 / greatest(len(toks), 1), 4) AS stop_ratio,
           round(CAST(length(regexp_replace(text, '[^a-zA-Z ]', '', 'g')) AS DOUBLE)
                 / greatest(length(text), 1), 4) AS alpha_ratio
    FROM (
        SELECT doc_id, text,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
        FROM documents
    )
    """,
)
def i_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc quality signals: token count, stopword ratio, alpha ratio
    (the standard pretraining quality filters)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        T.token_count("text").alias("n_tokens"),
        F.round(T.stopword_ratio("text"), 4).alias("stop_ratio"),
        F.round(T.alpha_ratio("text"), 4).alias("alpha_ratio"),
    )


@register(
    "i_text_langid",
    oracle="""
    SELECT guess, count(*) AS n_docs,
           count(*) FILTER (WHERE guess = lang) AS n_agree
    FROM (
        SELECT lang,
               CASE WHEN list_has_any(toks, ['the', 'a']) THEN 'en'
                    WHEN list_has_any(toks, ['der', 'und']) THEN 'de'
                    WHEN list_has_any(toks, ['le', 'et']) THEN 'fr'
                    WHEN list_has_any(toks, ['el', 'y']) THEN 'es'
                    ELSE 'und' END AS guess
        FROM (
            SELECT lang, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
            FROM documents
        )
    )
    GROUP BY guess
    """,
)
def i_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID + agreement with the labeled lang
    column. First language in fixed (en,de,fr,es) order wins."""
    docs = table(spark, sf_dir, "documents")
    return (
        docs.select("lang", T.lang_guess("text").alias("guess"))
        .groupBy("guess")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(F.col("guess") == F.col("lang"), 1)).alias("n_agree"),
        )
    )


@register(
    "i_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(norm) AS fp_md5,
           sha256(norm) AS fp_sha256
    FROM (
        SELECT doc_id, trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS norm
        FROM documents
    )
    """,
)
def i_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content fingerprinting: md5 + sha256 over normalized text
    (lowercase, collapsed whitespace) — the dedup key primitive."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(T.normalize_text("text")).alias("fp_md5"),
        T.fingerprint_sha256("text").alias("fp_sha256"),
    )


@register(
    "i_dedup_exact",
    oracle="""
    SELECT doc_id, content_hash, group_size
    FROM (
        SELECT doc_id,
               sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_hash,
               row_number() OVER (PARTITION BY
                   sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
                   ORDER BY doc_id) AS rn,
               count(*) OVER (PARTITION BY
                   sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))))
                   AS group_size
        FROM documents
    )
    WHERE rn = 1
    """,
)
def i_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: normalized sha256 -> keep lowest doc_id per hash
    group (reference R26 duplicate-guard, at corpus scale)."""
    docs = table(spark, sf_dir, "documents")
    return D.dedup_exact(docs).select("doc_id", "content_hash", "group_size")


@register(
    "i_dedup_ngram_jaccard",
    oracle="""
    WITH sh AS (
        SELECT doc_id,
               list_distinct([array_to_string(toks[i:i+2], ' ')
                              for i in range(1, greatest(len(toks) - 2, 0) + 1)]) AS shingles
        FROM (
            SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
            FROM documents
        )
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / greatest(len(list_distinct(list_concat(a.shingles, b.shingles))), 1),
                 4) AS jaccard
    FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
    """,
)
def i_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard between consecutive doc pairs — the exact
    verification kernel that MinHash candidates feed into at scale
    (bounded linear pairing here; the LSH bucket join bounds it there).

    Shingling runs as an Arrow-batched Python kernel: the equivalent
    nested array-lambda expression tree costs ~3 s of whole-stage
    codegen compilation PER SESSION (it is expanded into both join
    sides), dominating the query at bench scale. First-occurrence
    dedup matches array_distinct / DuckDB list_distinct; the Jaccard
    itself stays JVM-side (array_intersect/array_union)."""
    import re

    import pandas as pd

    docs = spread_by_bytes(table(spark, sf_dir, "documents"))

    def shingle_kernel(batches):
        for batch in batches:
            ids, shingles = [], []
            for did, text in zip(batch["doc_id"], batch["text"]):
                toks = [t for t in re.split(r"\s+", text) if t]
                grams = dict.fromkeys(
                    " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
                )
                ids.append(did)
                shingles.append(list(grams))
            yield pd.DataFrame({"doc_id": ids, "shingles": shingles})

    sh = docs.select("doc_id", "text").mapInPandas(
        shingle_kernel, "doc_id long, shingles array<string>"
    )
    # pair-slot explode instead of a shifted self-join (optimization
    # r12): each doc lands in its own pair slot (side 0) and its
    # predecessor's (side 1), one groupBy stitches the pair. The old
    # a/b self-join keyed the two branches differently (id_a+1 vs
    # id_b), so the shingle KERNEL ran twice over the corpus with no
    # reusable exchange. Same shuffle bytes (each array crosses twice
    # either way), one exchange + hash agg instead of two exchanges +
    # sort-merge join, kernel once. Local wall measured neutral at
    # sf0.1 (0.98 vs 0.99 min, results exceptAll-identical at
    # sf0.01/0.1) — adopted for the halved Python-boundary CPU, which
    # is the dominant cost at corpus scale. first(ignorenulls) is
    # deterministic here: doc_id is unique, so each (pid, side) holds
    # at most one non-null array.
    sides = sh.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("doc_id").alias("pid"),
                    F.lit(0).alias("side"),
                    F.col("shingles").alias("sh"),
                ),
                F.struct(
                    (F.col("doc_id") - 1).alias("pid"),
                    F.lit(1).alias("side"),
                    F.col("shingles").alias("sh"),
                ),
            )
        ).alias("e")
    ).select("e.pid", "e.side", "e.sh")
    paired = (
        sides.groupBy("pid")
        .agg(
            F.first(F.when(F.col("side") == 0, F.col("sh")), ignorenulls=True).alias("sh_a"),
            F.first(F.when(F.col("side") == 1, F.col("sh")), ignorenulls=True).alias("sh_b"),
        )
        .filter(F.col("sh_a").isNotNull() & F.col("sh_b").isNotNull())
    )
    return paired.select(
        F.col("pid").alias("id_a"),
        (F.col("pid") + 1).alias("id_b"),
        F.round(D.ngram_jaccard(F.col("sh_a"), F.col("sh_b")), 4).alias("jaccard"),
    )


@register("i_dedup_minhash", oracle=None)  # rows-only: hash-seeded approximation
def i_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate candidates: 32-lane signatures, 8
    bands, bucket self-join (pairs only meet inside a shared band
    bucket). Property-tested against exact Jaccard in tests/."""
    docs = spread_by_bytes(table(spark, sf_dir, "documents"))
    sigs = D.minhash_signatures(docs, num_hashes=32, shingle_n=3)
    return D.minhash_candidate_pairs(sigs, num_bands=8)


@register(
    "i_dedup_simhash",
    # Exact SQL oracle (upgraded from rows-only in round 3): the token
    # hash is the lower 64 bits of md5, which DuckDB reproduces
    # bit-for-bit, so the per-bit majority vote + two's-complement
    # packing is restated relationally. Bit 63 contributes -2^63 (the
    # sign bit); the hugeint sum is always within int64 afterwards.
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_distinct(list_filter(
                   regexp_split_to_array(text, '\\s+'), x -> x <> ''))) AS tok
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
    )
    SELECT doc_id, simhash,
           CAST(count(*) OVER (PARTITION BY simhash) AS BIGINT) AS bucket_size
    FROM fps
    """,
)
def i_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash 64-bit fingerprints + bucket sizes (same-fingerprint
    docs are near-dup candidates). Portable md5-based token hash makes
    the fingerprints exact-SQL-checkable (see operators/dedup.py)."""
    docs = spread_by_bytes(table(spark, sf_dir, "documents"))
    fps = D.simhash64(docs)
    w = Window.partitionBy("simhash")
    return fps.withColumn("bucket_size", F.count("*").over(w))


@register(
    "i_sim_cosine_topk",
    cache_plan=False,
    # Exact operator => exact SQL oracle (pairwise cosine + windowed
    # top-k). oracle_in_bench=False: the N^2 pairwise join is DuckDB's
    # only formulation and costs ~10 s at sf0.1 — not a comparable
    # baseline for the O(N*batch) block-matmul plan; correctness is
    # still hash-checked at sf0.01.
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[64]) AS v FROM embeddings)
    SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
           round(array_cosine_similarity(a.v, b.v), 4) AS cosine,
           CAST(row_number() OVER (
               PARTITION BY a.vec_id
               ORDER BY array_cosine_similarity(a.v, b.v) DESC, b.vec_id
           ) AS INT) AS rn
    FROM e a JOIN e b ON a.vec_id <> b.vec_id
    QUALIFY rn <= 3
    """,
    oracle_in_bench=False,
)
def i_sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-3 neighbors per vector — broadcast + block
    matmul + block-local top-k + global merge (no N^2 row blowup)."""
    emb = table(spark, sf_dir, "embeddings")
    return S.cosine_topk(emb, k=3)


@register(
    "i_sim_lsh_ann",
    cache_plan=False, oracle=None)  # rows-only: approximate by construction
def i_sim_lsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN via seeded random-hyperplane LSH buckets (4
    OR-ed tables x 6 bits) + exact re-rank within bucket; recall vs
    exact measured in tests."""
    raw = table(spark, sf_dir, "embeddings")
    # plane sizing needs only N: read it from parquet footers (zero
    # Spark jobs) — counting the spread() df would shuffle every
    # vector first, and even raw.count() is a full extra scan pass
    from sparkclif.io import parquet_row_count

    return S.lsh_ann(spread_by_bytes(raw), k=3, n_rows=parquet_row_count(sf_dir, "embeddings"))


@register(
    "i_multimodal_join",
    oracle="""
    SELECT label, pos, round(avg(comp), 4) AS centroid_comp, count(*) AS n
    FROM (
        SELECT e.label,
               unnest(range(1, len(e.embedding) + 1)) AS pos,
               unnest(CAST(e.embedding AS DOUBLE[])) AS comp
        FROM embeddings e
        JOIN documents d ON e.vec_id = d.doc_id
        WHERE d.lang = 'en'
    )
    WHERE pos <= 8
    GROUP BY label, pos
    """,
)
def i_multimodal_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join text docs to their embeddings, filter by doc metadata,
    per-label centroid components (posexplode over the vector; first 8
    dims to bound output)."""
    emb = table(spark, sf_dir, "embeddings")
    docs = table(spark, sf_dir, "documents")
    joined = emb.join(
        docs.filter(F.col("lang") == "en").select(F.col("doc_id").alias("vec_id")),
        "vec_id",
    )
    # slice BEFORE exploding: exploding all 64 components and filtering
    # pos <= 8 would generate 8x the rows only to discard 7/8 of them
    exploded = joined.select(
        "label",
        F.posexplode(
            F.slice(F.col("embedding").cast("array<double>"), 1, 8)
        ).alias("pos0", "comp"),
    ).select("label", (F.col("pos0") + 1).alias("pos"), "comp")
    return (
        exploded.groupBy("label", "pos")
        .agg(F.round(F.avg("comp"), 4).alias("centroid_comp"), F.count("*").alias("n"))
    )


@register(
    "i_multimodal_features",
    # The decode stub is a DETERMINISTIC byte view of the payload
    # (UTF-8 of ASCII-only text), so its features are exactly statable
    # in SQL: byte_mean is an exact integer-sum mean, entropy the
    # standard plug-in estimator over the byte histogram. This checks
    # the whole mapInPandas plumbing end-to-end, not just row counts.
    oracle="""
    WITH chars AS (
        -- length guard: string_split('', '') is [''] in DuckDB, which
        -- would fabricate a 1-byte row for an empty doc; the kernel
        -- emits no row for empty payloads
        SELECT doc_id, unnest(string_split(text, '')) AS ch
        FROM documents WHERE length(text) > 0
    ),
    freq AS (
        SELECT doc_id, ch, CAST(count(*) AS DOUBLE) AS c
        FROM chars GROUP BY doc_id, ch
    ),
    tot AS (SELECT doc_id, sum(c) AS n FROM freq GROUP BY doc_id),
    agg AS (
        SELECT f.doc_id,
               max(t.n) AS n,
               sum(ascii(f.ch) * f.c) / max(t.n) AS mean_b,
               -sum((f.c / t.n) * log2(f.c / t.n)) AS ent
        FROM freq f JOIN tot t USING (doc_id)
        GROUP BY f.doc_id
    )
    SELECT a.doc_id,
           CASE WHEN a.doc_id % 3 = 0 THEN 'image/png'
                WHEN a.doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           CAST(a.n AS BIGINT) AS n_bytes,
           round(a.mean_b, 4) AS byte_mean,
           round(a.ent, 4) AS byte_entropy
    FROM agg a
    """,
)
def i_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column multimodal plumbing: opaque payload + typed
    metadata -> Arrow-batched mapInPandas feature extraction (decode
    step stubbed deterministically; see operators/multimodal.py)."""
    docs = spread_by_bytes(table(spark, sf_dir, "documents"))
    media = M.attach_fake_media(docs)
    return M.extract_features(media).select(
        "doc_id", "media_type", "n_bytes", "byte_mean", "byte_entropy"
    )


@register(
    "i_dedup_embedding",
    cache_plan=False,
    oracle="""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(a.v, b.v), 4) AS cosine
    FROM e a JOIN e b ON b.vec_id > a.vec_id
    WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.4
    """,
)
def i_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact, threshold 0.4):
    broadcast + block-matmul kernel emits only qualifying (id_a < id_b)
    pairs — the N^2 similarity matrix never materializes as rows. At
    100 TB the LSH bucket join generates candidates and this kernel
    verifies them (see operators/similarity.py)."""
    emb = table(spark, sf_dir, "embeddings")
    return S.cosine_threshold_pairs(emb, tau=0.4)


@register(
    "i_sim_ivf",
    cache_plan=False, oracle=None)  # rows-only: approximate by construction
def i_sim_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate NN: coarse k-means quantizer -> inverted lists
    per centroid -> n_probe=2 probed lists per query -> cogrouped
    per-cluster BLAS search -> global top-k merge. Recall vs exact
    top-k measured in tests/test_llm_ops.py."""
    emb = table(spark, sf_dir, "embeddings")
    return S.ivf_ann(emb, k=3, n_clusters=16, n_probe=2)


@register(
    "i_text_bpe_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '([a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s])', 1))
                AS INT) AS n_bpe_tokens,
           CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
                AS INT) AS n_ws_tokens
    FROM documents
    """,
)
def i_text_bpe_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: BPE-ish pre-tokenizer regex (letter
    runs | digit runs | single symbols) vs whitespace — the token
    budget estimators for a pretraining corpus."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(T.bpe_ish_tokens("text")).alias("n_bpe_tokens"),
        T.token_count("text").alias("n_ws_tokens"),
    )


@register(
    "i_fingerprint_rolling",
    oracle="""
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                            [CAST(ascii(substring(text, i, 1)) AS BIGINT)
                             for i in range(1, length(text) + 1)]),
               (acc, c) -> (acc * 31 + c) % 1000000007
           ) AS rhash
    FROM documents
    """,
)
def i_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin-Karp polynomial rolling hash per doc — the incremental
    fingerprint primitive (same fold computed by the DuckDB oracle).
    spread(), not spread_by_bytes: the per-character hash fold is
    HEAVY per-row work — the r13 byte-sized target measured 50%
    SLOWER at 32 cores (0.21 -> 0.30 s, 12-rep A/B); compute-bound
    sites keep the full fan-out."""
    docs = spread(table(spark, sf_dir, "documents"))
    return docs.select("doc_id", T.rolling_hash("text").alias("rhash"))


@register(
    "i_multimodal_frames",
    # Deterministic frame segmentation (byte range [f*n//4, (f+1)*n//4)
    # per frame f) restated positionally in SQL; per-frame mean/std
    # (population) rounded at 4 BEFORE the rollup, matching the kernel.
    oracle="""
    WITH pos0 AS (
        SELECT doc_id, text, length(text) AS n,
               unnest(range(length(text))) AS i
        FROM documents
    ),
    pos AS (
        SELECT doc_id, n, CAST(i AS BIGINT) AS i,
               ascii(substr(text, CAST(i + 1 AS INT), 1)) AS b
        FROM pos0
    ),
    tagged AS (
        SELECT doc_id, b,
               CASE WHEN i < n // 4 THEN 0
                    WHEN i < (2 * n) // 4 THEN 1
                    WHEN i < (3 * n) // 4 THEN 2
                    ELSE 3 END AS frame_idx
        FROM pos
    ),
    per_frame AS (
        SELECT doc_id, frame_idx,
               round(avg(b), 4) AS frame_mean,
               round(coalesce(stddev_pop(b), 0), 4) AS frame_std
        FROM tagged GROUP BY doc_id, frame_idx
    )
    SELECT CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                WHEN doc_id % 3 = 1 THEN 'audio/wav'
                ELSE 'video/mp4' END AS media_type,
           CAST(frame_idx AS INT) AS frame_idx,
           count(*) AS n,
           round(avg(frame_mean), 4) AS avg_frame_mean,
           round(avg(frame_std), 4) AS avg_frame_std
    FROM per_frame
    GROUP BY media_type, frame_idx
    """,
)
def i_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-to-many multimodal kernel: payload -> 4 sampled frames via
    mapInPandas (video keyframe shape; decode stubbed, plumbing real).
    Rolled up per (media_type, frame_idx) to bound output."""
    docs = spread_by_bytes(table(spark, sf_dir, "documents"))
    media = M.attach_fake_media(docs)
    frames = M.sample_frames(media, n_frames=4)
    return (
        frames.groupBy("media_type", "frame_idx")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("frame_mean"), 4).alias("avg_frame_mean"),
            F.round(F.avg("frame_std"), 4).alias("avg_frame_std"),
        )
    )


@register(
    "i_text_pii_scrub",
    # The corpus is synthetic word-salad with no real PII, so the query
    # deterministically INJECTS a contact sentence per doc (printf of
    # doc_id on both engines) and then scrubs it — exercising the
    # count + ordered-redaction + verification mechanics end-to-end.
    oracle="""
    WITH enriched AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or ' || printf('%03d', doc_id % 1000)
                    || '-555-' || printf('%04d', doc_id % 10000)
                    || ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                    || '.1' AS text
        FROM documents
    ),
    scrubbed AS (
        SELECT doc_id,
               len(regexp_extract_all(text,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
               len(regexp_extract_all(text, '\\b\\d{3}-\\d{3}-\\d{4}\\b')) AS n_phones,
               regexp_replace(
                   regexp_replace(
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g'),
                       '\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g'),
                   '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g')
                   AS clean
        FROM enriched
    )
    SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
           CAST(n_phones AS BIGINT) AS n_phones,
           CAST(len(regexp_extract_all(clean, '<IP>')) AS BIGINT) AS n_ips,
           md5(clean) AS clean_md5,
           CAST(length(clean) AS BIGINT) AS clean_len
    FROM scrubbed
    """,
)
def i_text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails, phones, IPs) with per-doc counts and an
    md5 of the redacted text — the standard pre-training privacy
    filter, as a pure JVM regexp_replace chain (operators/text.py
    PII_PATTERNS; no Python in the scrub path). spread(): five java
    regex passes per doc are compute-heavy per-row work — a one-file
    scan would run them all on one core (and the r13 byte-sized
    target measured consistently slower, 12-rep A/B — kept on full
    fan-out with fingerprint_rolling)."""
    docs = spread(table(spark, sf_dir, "documents"))
    enriched = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or "),
            F.format_string("%03d", F.col("doc_id") % 1000),
            F.lit("-555-"),
            F.format_string("%04d", F.col("doc_id") % 10000),
            F.lit(" host 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".1"),
        ).alias("text"),
    )
    counted = enriched.select(
        "doc_id",
        T.pii_count("text", T.PII_PATTERNS[0][1]).cast("long").alias("n_emails"),
        T.pii_count("text", T.PII_PATTERNS[1][1]).cast("long").alias("n_phones"),
        T.pii_scrub("text").alias("clean"),
    )
    return counted.select(
        "doc_id",
        "n_emails",
        "n_phones",
        F.size(F.regexp_extract_all("clean", F.lit("<IP>"), 0))
        .cast("long")
        .alias("n_ips"),
        F.md5("clean").alias("clean_md5"),
        F.length("clean").cast("long").alias("clean_len"),
    )


@register(
    "i_sample_stratified",
    oracle="""
    SELECT lang,
           count(*) AS n_total,
           CAST(sum(CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 25, 8))
                              ::UBIGINT % 100 < 10
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
           round(sum(CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 25, 8))
                               ::UBIGINT % 100 < 10
                          THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS sample_rate
    FROM documents
    GROUP BY lang
    """,
)
def i_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% stratified sample per language via the
    engine-portable md5 hash bucket (operators/sampling.py): the same
    rows are selected on any engine, any cluster size, any rerun — no
    RNG seed coordination. The sample decision is a scan-side
    expression (pushes down; map-side-combined agg)."""
    from sparkclif.operators.sampling import stratified_sample_stats

    docs = table(spark, sf_dir, "documents")
    return stratified_sample_stats(docs, "lang", "doc_id", rate_pct=10)


@register(
    "i_pack_sequences",
    # mapInPandas prefix-sum kernel materializes per-partition totals
    # at plan-build time -> must rebuild per run
    cache_plan=False,
    oracle="""
    WITH t AS (
        SELECT doc_id,
               len(list_filter(regexp_split_to_array(text, '\\s+'),
                               x -> x <> '')) AS n_tok
        FROM documents
    ),
    c AS (
        SELECT doc_id, n_tok,
               sum(n_tok) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                   - n_tok AS tokens_before
        FROM t
    )
    SELECT CAST(floor(tokens_before / 2048) AS BIGINT) AS shard_id,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS sum_tokens,
           min(doc_id) AS first_doc,
           max(doc_id) AS last_doc
    FROM c
    GROUP BY 1
    """,
)
def i_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard assignment (contiguous packing into ~2048-
    token training shards) via operators/sampling.pack_sequences:
    cost-dispatched — inputs past SMALL_INPUT_BYTES take the
    DISTRIBUTED prefix sum (range partition + per-partition totals +
    broadcast offsets; no global single-task window), testbed-sized
    inputs take the oracle's own running-sum window (identical
    output, two fewer stage barriers). The oracle states the same
    assignment as a plain running-sum window."""
    from sparkclif.operators.sampling import pack_sequences

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", T.token_count("text").cast("long").alias("n_tok")
    )
    packed = pack_sequences(docs, "doc_id", "n_tok", budget=2048)
    return packed.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


@register(
    "i_dedup_cluster",
    # iterative operator: eager per-round checkpoints at build time
    cache_plan=False,
    # The oracle is exact for THIS edge set (consecutive-doc chains ->
    # gaps-and-islands), but it is not a comparable plan shape for the
    # general iterative operator, so it stays out of baseline timing —
    # same precedent as i_sim_cosine_topk's N^2 oracle.
    oracle_in_bench=False,
    # Edges are injected deterministically from the portable md5 bucket
    # (the corpus has no real near-duplicates — max consecutive-pair
    # jaccard measured 0.035): edge (d, d+1) exists iff
    # bucket('edge' || d) < 40. Both engines derive the identical graph.
    oracle="""
    WITH flagged AS (
        SELECT doc_id,
               CASE WHEN lag(doc_id) OVER (ORDER BY doc_id) = doc_id - 1
                         AND ('0x' || substr(md5('edge' || CAST(doc_id - 1 AS VARCHAR)), 25, 8))
                             ::UBIGINT % 100 < 40
                    THEN 0 ELSE 1 END AS brk
        FROM documents
    ),
    isl AS (
        SELECT doc_id,
               sum(brk) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS g
        FROM flagged
    )
    SELECT min(doc_id) AS component,
           count(*) AS n_docs,
           max(doc_id) AS last_doc
    FROM isl
    GROUP BY g
    """,
)
def i_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate CLUSTERING: connected components over the
    candidate-pair graph via pointer-jumping min-label propagation
    (operators/graph.py — O(log diameter) rounds, per-round lineage
    truncation; the closure step that follows candidate generation in
    every production dedup pipeline). Components roll up to
    (component, n_docs, last_doc)."""
    from sparkclif.operators.graph import connected_components
    from sparkclif.operators.sampling import portable_bucket

    docs = table(spark, sf_dir, "documents").select("doc_id")
    has_edge = (
        portable_bucket(F.concat(F.lit("edge"), F.col("doc_id").cast("string"))) < 40
    )
    edges = (
        docs.filter(has_edge)
        .select(F.col("doc_id").alias("src"), (F.col("doc_id") + 1).alias("dst"))
        .join(docs.select(F.col("doc_id").alias("dst")), "dst")  # dst must exist
    )
    labels = connected_components(edges, vertices=docs, id_col="doc_id")
    return labels.groupBy("component").agg(
        F.count("*").alias("n_docs"),
        F.max("doc_id").alias("last_doc"),
    )
