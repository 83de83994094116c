"""Deduplication operators — exact, MinHash-LSH, SimHash, n-gram
Jaccard (SURVEY.md §2.2 group I; north-star training-data pipeline).

Scale design:
- Exact: hash(normalized text) -> window keep-first. One shuffle on the
  hash; the shuffle carries (hash, doc_id) only, never the text.
- MinHash: per-doc signature computed scan-side (explode shingles ->
  xxhash64 under k seeds -> min per seed = one groupBy), then LSH
  banding: signatures split into b bands, candidate pairs come from a
  self-join on (band_idx, band_hash) — only docs sharing a band bucket
  ever meet, so the join is |buckets| x small, not |docs|^2. Exact
  Jaccard verification only on candidates.
- SimHash: per-token 64-bit hashes -> per-bit weighted majority via
  bit arithmetic in expressions -> single int64 fingerprint; near-dups
  = same fingerprint bucket (or banded Hamming at scale).
All of it is native expressions + joins; no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkclif.operators.text import fingerprint_sha256, normalize_text, tokens, word_shingles


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: normalized-content hash, keep lowest id per group.
    Returns kept rows + group_size. Deterministic (min id wins)."""
    hashed = df.withColumn("content_hash", fingerprint_sha256(text_col))
    w = Window.partitionBy("content_hash").orderBy(F.asc(id_col))
    return (
        hashed.withColumn("rn", F.row_number().over(w))
        .withColumn("group_size", F.count("*").over(Window.partitionBy("content_hash")))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature: array of num_hashes int64 minima over
    word-shingle hashes. Signature computed entirely in expressions —
    shingles stay an array (no explode), the k hash lanes are
    array_min(transform(shingles, xxhash64(seed)))."""
    sh = word_shingles(F.col(text_col), shingle_n)
    sig = F.array(
        *[
            F.array_min(F.transform(sh, lambda s: F.xxhash64(s, F.lit(i))))
            for i in range(num_hashes)
        ]
    )
    return df.select(F.col(id_col), sig.alias("signature"))


def minhash_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 8,
) -> DataFrame:
    """LSH banding: split signatures into bands, bucket-join on
    (band_idx, band_hash). Output candidate (id_a < id_b) pairs with
    estimated Jaccard (signature agreement rate). The only shuffle is
    the band-bucket join — docs never pair outside a shared bucket."""
    # docs too short to shingle have all-null signatures — they carry
    # no similarity signal and would all collide in one bucket
    sigs = sigs.filter(F.col("signature")[0].isNotNull())
    n_hashes_col = F.size("signature")
    rows_per_band = (n_hashes_col / num_bands).cast("int")
    banded = (
        sigs.select(
            id_col,
            "signature",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(num_bands - 1)),
                    lambda b: F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice(
                                    "signature", b * rows_per_band + 1, rows_per_band
                                ),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    ),
                )
            ).alias("band_idx", "band_hash"),
        )
    )
    left = banded.select(
        F.col(id_col).alias("id_a"),
        F.col("signature").alias("sig_a"),
        "band_idx",
        "band_hash",
    )
    right = banded.select(
        F.col(id_col).alias("id_b"),
        F.col("signature").alias("sig_b"),
        "band_idx",
        "band_hash",
    )
    pairs = (
        left.join(right, ["band_idx", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda a, b: (a == b).cast("int")),
            lambda x: x == 1,
        )
    )
    return pairs.select(
        "id_a",
        "id_b",
        F.round(agree / F.size("sig_a"), 4).alias("est_jaccard"),
    )


def ngram_jaccard(
    left_toks,
    right_toks,
) -> F.Column:
    """Exact Jaccard over two token/shingle arrays (column expr)."""
    inter = F.size(F.array_intersect(left_toks, right_toks))
    union = F.size(F.array_union(left_toks, right_toks))
    return inter / F.greatest(union, F.lit(1))


def simhash64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64
) -> DataFrame:
    """SimHash fingerprint per doc: xxhash64 each distinct token,
    explode, per-bit majority vote as ``bits`` map-side-combined sums
    (one groupBy shuffle carrying only (id, 64 ints)), then pack the
    sign bits into one int64. All JVM expressions, no Python."""
    tok_hashes = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("tok"),
    ).select(id_col, F.xxhash64("tok").alias("h"))
    votes = [
        F.sum(
            F.when(F.shiftright("h", i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    voted = tok_hashes.groupBy(id_col).agg(*votes)
    fp = F.lit(0).cast("long")
    for i in range(bits):
        fp = fp + F.when(
            F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
    return voted.select(F.col(id_col), fp.alias("simhash"))
