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

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkclif.operators.text import fingerprint_sha256, normalize_text, tokens, word_shingles

# splitmix64 finalizer constants (public domain, Steele et al.) — the
# per-lane remix applied to base shingle hashes in numpy uint64
# (wrapping) arithmetic
_SM_GOLDEN = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x ^ (x >> np.uint64(30))) * _SM_M1
    x = (x ^ (x >> np.uint64(27))) * _SM_M2
    return x ^ (x >> np.uint64(31))


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


def canonical_url(url) -> "F.Column":
    """Canonical form of a URL for web-corpus dedup — the CC-style
    normalization every crawl pipeline applies before URL-exact dedup
    (two fetches of the same resource rarely share raw bytes of URL):

    - scheme lowercased; ``http`` folded into ``https``
      (protocol-insensitive dedup — the same resource served both ways
      is one resource);
    - host lowercased; a leading ``www.`` stripped; DEFAULT ports
      (``:80`` for http, ``:443`` for https — judged against the
      ORIGINAL scheme) stripped, any other explicit port kept;
    - the fragment dropped (never sent to the server);
    - tracking parameters dropped (``utm_*``, ``ref=``), the remaining
      query parameters SORTED (param order is not semantic), an
      emptied query dropping its ``?``;
    - trailing slashes trimmed from the path.

    Pure scan-side expression (try_parse_url is a JVM intrinsic — the
    try_ variant, because Spark 4's parse_url THROWS on a malformed
    URL and one bad row must never kill a 100 TB scan; invalid URLs
    canonicalize to NULL and dedup_url isolates them; the rest
    is regexp + array lambdas) — zero shuffle, composes under
    whole-stage codegen. The DuckDB restatement in the registered
    query states the identical rules with regexp/list functions.
    """
    url = F.col(url) if isinstance(url, str) else url
    scheme_raw = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    scheme = F.when(scheme_raw == "http", F.lit("https")).otherwise(scheme_raw)
    auth = F.try_parse_url(url, F.lit("AUTHORITY"))
    port = F.regexp_extract(auth, r":(\d+)$", 1)
    host = F.regexp_replace(
        F.regexp_replace(F.lower(auth), r":\d+$", ""), r"^www\.", ""
    )
    is_default = ((scheme_raw == "https") & (port == "443")) | (
        (scheme_raw == "http") & (port == "80")
    )
    port_part = F.when(
        (port != "") & ~is_default, F.concat(F.lit(":"), port)
    ).otherwise(F.lit(""))
    path = F.regexp_replace(
        F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit("")), r"/+$", ""
    )
    q = F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))
    params = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "")
            & ~p.startswith("utm_")
            & ~p.startswith("ref="),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        port_part,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def registrable_domain(host) -> "F.Column":
    """eTLD+1 of an (already lowercased, port-free) hostname — the
    rollup key of every crawl-side corpus census (per-domain quotas,
    robots policy, source weighting group by THIS, never by raw host:
    cdn1.example.com and www.example.com are one publisher). Public-
    suffix heuristic, stated exactly so the SQL restatement can agree:
    the last TWO labels, or the last THREE when the second-to-last
    label is a multi-label-suffix second level (``co``/``ac``/``gov``,
    the common ccTLD pattern — example.co.uk); a host with fewer than
    two labels is returned unchanged. For real crawl hosts use
    ``registrable_domain_psl`` below — the broadcast join against a
    caller-supplied public-suffix list (ADVICE r9's upgrade path,
    landed round 10); this CASE form keeps the oracle-checked census
    query dependency-free and its SQL restatement exact.
    Pure scan-side expression (split + slice), whole-stage codegen.
    """
    host = F.col(host) if isinstance(host, str) else host
    labels = F.split(host, r"\.")
    n = F.size(labels)
    second_last = F.element_at(labels, -2)
    return (
        F.when(n < 2, host)
        .when(
            (n >= 3) & second_last.isin("co", "ac", "gov"),
            F.concat_ws(".", F.slice(labels, -3, 3)),
        )
        .otherwise(F.concat_ws(".", F.slice(labels, -2, 2)))
    )


# A representative multi-label public-suffix subset (the PSL itself is
# public data; callers point ``registrable_domain_psl`` at the full
# ~9k-entry list in production — this default keeps the operator
# usable offline and the tests meaningful). Single-label TLDs need no
# entry: the fallback already takes the last two labels.
DEFAULT_MULTI_SUFFIXES = [
    "co.uk", "org.uk", "gov.uk", "ac.uk", "ltd.uk", "plc.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "co.nz", "org.nz", "net.nz", "govt.nz",
    "com.br", "org.br", "gov.br", "net.br",
    "com.cn", "org.cn", "net.cn", "gov.cn",
    "com.mx", "org.mx", "co.in", "org.in", "gov.in", "co.za",
    "com.sg", "com.hk", "com.tw", "com.ar", "com.tr", "co.kr",
    # three-label suffixes exist too (PSL wildcard classes)
    "pvt.k12.ma.us", "act.edu.au",
]


def registrable_domain_psl(
    df: DataFrame,
    host_col: str,
    suffixes: "DataFrame | list[str] | None" = None,
    out_col: str = "domain",
) -> DataFrame:
    """eTLD+1 via broadcast join against a public-suffix list — the
    production form of ``registrable_domain`` (ADVICE r9's upgrade
    path): ``example.com.au`` rolls up to ``example.com.au``'s
    publisher, not to the suffix ``com.au`` the 3-label heuristic
    collapses it to.

    PSL semantics implemented: the public suffix of a host is its
    LONGEST suffix present in the list; every label sequence of 1..K
    trailing labels is a candidate, where K is the label count of the
    LONGEST supplied suffix (derived from the list, not hardcoded —
    ADVICE r10: a fixed cap of 4 silently never matched longer
    private-section PSL entries). The best suffix is derived per
    DISTINCT host — the output is a pure function of the host string,
    so the probe side is ``df.select(host).dropDuplicates()`` and the
    result joins back ON THE HOST, never on a synthetic row id
    (ADVICE r10: ``monotonically_increasing_id`` referenced from both
    branches of a self-join is evaluated independently per subtree and
    diverges after an upstream shuffle — silent wrong matches).
    Candidates explode (<= K rows per distinct host, bounded); one
    broadcast hash join marks listed suffixes; a groupBy on the host
    keeps the longest listed match. eTLD+1 = one label more than the
    winning suffix; a host that IS a bare suffix (or has no listed
    suffix and fewer than two labels) returns unchanged; unlisted
    hosts fall back to the last-two-labels rule, the PSL's own
    default (`*` rule).

    Plan at 100 TB: the suffix list is ~9k rows — always broadcast;
    the explode is bounded xK over DISTINCT hosts (crawl host
    cardinality, orders of magnitude below row count); the join-back
    keys on the host string — deterministic, AQE can broadcast the
    per-host map when small and skew-split it when not. No Python,
    no window, no nondeterministic expressions.

    ``suffixes``: a one-column (``suffix``) DataFrame, a list of
    suffix strings, or None for DEFAULT_MULTI_SUFFIXES. NOTE
    (ADVICE r11): the DataFrame path runs ONE driver-side collect (a
    Spark job) during plan CONSTRUCTION to derive the label cap from
    the list — a builder that must stay pure-plan (e.g. a
    ``cache_plan=True`` registered query) must pass a list, or
    pre-compute the cap and pass a list-ified suffix set; the
    registered ``i_domain_stats_psl`` uses the list path and stays
    job-free at build."""
    spark = df.sparkSession
    if suffixes is None:
        suffixes = DEFAULT_MULTI_SUFFIXES
    if isinstance(suffixes, list):
        max_labels = max((s.count(".") + 1 for s in suffixes), default=1)
        suffixes = spark.createDataFrame(
            [(s,) for s in suffixes], "suffix string"
        )
    else:
        # one driver-side row off a ~9k-entry broadcastable dim: the
        # cap must cover the longest supplied entry (ADVICE r10)
        row = suffixes.agg(
            F.max(F.size(F.split(F.col("suffix"), r"\."))).alias("m")
        ).collect()
        max_labels = row[0]["m"] or 1
    sfx = suffixes.select(F.col("suffix").alias("__sfx")).dropDuplicates()
    host = F.col(host_col)
    labels = F.split(host, r"\.")
    n = F.size(labels)

    def _cands(h):
        lbls = F.split(h, r"\.")
        return F.filter(
            F.transform(
                F.sequence(
                    F.lit(1), F.least(F.size(lbls), F.lit(int(max_labels)))
                ),
                lambda k: F.concat_ws(".", F.slice(lbls, -k, k)),
            ),
            lambda c: c != "",
        )

    hosts = df.select(host.alias("__host")).dropDuplicates()
    hits = (
        hosts.select(
            "__host", F.explode(_cands(F.col("__host"))).alias("__cand")
        )
        .join(F.broadcast(sfx), F.col("__cand") == F.col("__sfx"))
        .groupBy("__host")
        .agg(
            F.max_by(
                "__cand", F.length("__cand")
            ).alias("__best_sfx")
        )
    )
    joined = df.join(hits, host == F.col("__host"), "left")
    best = F.col("__best_sfx")
    # labels in the winning suffix; +1 label = the registrable domain
    k_sfx = F.size(F.split(best, r"\."))
    listed = F.when(
        n > k_sfx,
        F.concat_ws(".", F.slice(labels, -(k_sfx + 1), k_sfx + 1)),
    ).otherwise(host)  # host IS a bare public suffix: unchanged
    fallback = F.when(n < 2, host).otherwise(
        F.concat_ws(".", F.slice(labels, -2, 2))
    )
    return joined.select(
        *[c for c in df.columns],
        F.when(best.isNotNull(), listed).otherwise(fallback).alias(out_col),
    )


def dedup_url(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """URL-exact dedup over the canonical form: keep the lowest id per
    canonical URL. Returns EVERY row (kept flag, not a filter) so the
    caller sees the full dup structure: ``(.., canon_url, group_size,
    keeper_id, kept)``.

    A URL the canonicalizer cannot parse (malformed scheme/authority —
    ``parse_url`` yields NULL components, so ``canon_url`` is NULL) is
    NOBODY's duplicate: each such row forms its own singleton group
    (kept, group_size 1, keeper itself). Without this the window would
    lump every malformed URL into one NULL-key "dup group" — the same
    NULL-divergence class the theta/percentile/distinct dispatchers
    guard against — and, worse at scale, funnel all of them into one
    hot partition.

    A row whose ``id_col`` is NULL stays in its canonical group
    (ADVICE r9 — the r8 unconditional-singleton rule let true URL
    duplicates with missing ids survive a kept=1 filter): it can never
    BE the keeper (``min`` ignores NULLs), so when the group holds a
    non-NULL id it loses to that keeper like any other duplicate
    (kept=0). Only when the whole group's ids are NULL (min(id) NULL —
    no deterministic winner exists) do its rows surface kept=1 with
    keeper_id NULL, explicitly UNRESOLVED rather than silently
    dropped; downstream consumers must treat ``keeper_id IS NULL``
    kept rows as such.

    Plan: canonicalization is scan-side (one projection); one window
    over the group key — the dedup_exact shape, one shuffle carrying
    (canon, id, url), never the document. Mass-duplicated canonicals
    (a crawl loop hammering one URL) make a hot window partition AQE
    cannot split — at that skew, swap the window for the
    min/count aggregation + shuffle join on the group key (both sides
    key-partitioned, AQE skew-splittable), same result by the
    dedup_exact argument."""
    u = df.withColumn("canon_url", canonical_url(url_col))
    # Malformed URLs are keyed per-row so they can never collapse into
    # a shared NULL group (the sentinel never collides with a real
    # canonical — those start with a scheme, never "\x00"; it is built
    # from monotonically_increasing_id, not id_col, so a NULL id
    # cannot NULL the sentinel out). NULL-id rows keep their canonical
    # key: they lose to the group's keeper when one exists (see
    # docstring / ADVICE r9).
    grp = F.coalesce(
        F.col("canon_url"),
        F.concat(
            F.lit("\x00uncanonical|"),
            F.monotonically_increasing_id().cast("string"),
        ),
    )
    w = Window.partitionBy(grp)
    keeper = F.min(id_col).over(w)
    return u.select(
        "*",
        F.count("*").over(w).cast("long").alias("group_size"),
        keeper.alias("keeper_id"),
        # NULL == keeper yields NULL, never true/false, for NULL-id
        # rows; they fall to the coalesce arm: kept only when the
        # group has NO resolvable keeper at all (all ids NULL).
        F.coalesce(F.col(id_col) == keeper, keeper.isNull())
        .cast("long")
        .alias("kept"),
    )


def dedup_incremental(
    new_docs: DataFrame,
    store: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Dedup a NEW batch against a persisted corpus fingerprint store —
    the recurring-ingest shape (each crawl refresh dedups against every
    earlier one without re-reading old text; only content hashes are
    kept as state). ``store`` needs one ``content_hash`` column (rows
    need not be distinct). Returns one row per batch doc:
    ``(id, content_hash, status)`` with status ``'dup_store'`` (hash
    already known to the corpus — store wins over batch order),
    ``'dup_batch'`` (first seen in THIS batch under a lower id) or
    ``'kept'``. The store delta for the next ingest is exactly the
    hashes of the ``'kept'`` rows.

    Plan: batch hashes are computed scan-side (the shuffle never
    carries text); the within-batch winner is a map-side-combinable
    ``min(id)`` agg; the store probe is a shuffle join on
    ``content_hash`` (uniform key — no skew). At 100 TB of HISTORY the
    store side dwarfs the batch: Spark's runtime bloom-filter injection
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``) builds a
    filter from the small batch side and prunes store scan output
    before the exchange, which is precisely the classic
    bloom-pre-filter design for incremental dedup.

    NULL-text batch rows have a NULL hash and DROP from the output
    (NULL keys match nothing in the winner join) — the SQL
    restatement's USING join agrees; route NULL text to a quality
    filter upstream, not a deduper.
    """
    hashed = new_docs.select(
        F.col(id_col), fingerprint_sha256(text_col).alias("content_hash")
    )
    batch_first = hashed.groupBy("content_hash").agg(
        F.min(id_col).alias("__first_id")
    )
    known = store.select("content_hash").dropDuplicates(["content_hash"]).select(
        "content_hash", F.lit(1).alias("__in_store")
    )
    return (
        hashed.join(batch_first, "content_hash")
        .join(known, "content_hash", "left")
        .select(
            id_col,
            "content_hash",
            F.when(F.col("__in_store").isNotNull(), F.lit("dup_store"))
            .when(F.col(id_col) != F.col("__first_id"), F.lit("dup_batch"))
            .otherwise(F.lit("kept"))
            .alias("status"),
        )
    )


def _simhash_bands(
    fps: DataFrame, n_bands: int, band_bits: int, id_col: str
) -> DataFrame:
    """(id, simhash) -> one row per (id, band) with the band's bit
    slice: ``(simhash >> band*band_bits) & mask``. Arithmetic shift +
    mask is engine-portable on the SIGNED fingerprint (the mask
    discards the sign-extension bits — verified identical on Spark
    shiftright/bitwiseAND, DuckDB >>/& and Python, including the
    sign-bit band)."""
    mask = (1 << band_bits) - 1
    return fps.select(
        F.col(id_col),
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", b * band_bits).bitwiseAND(
                        F.lit(mask)
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "bv"),
    )


def dedup_simhash_incremental(
    batch_fps: DataFrame,
    store_fps: DataFrame,
    hamming_max: int = 3,
    n_bands: int = 4,
    band_bits: int = 16,
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental NEAR-duplicate detection of a new ingest batch
    against a persisted simhash store — the near-dup counterpart of
    ``dedup_incremental`` (which only catches byte-identical
    content): a batch doc is a near-dup if some earlier doc's
    fingerprint is within ``hamming_max`` bits. Inputs are
    FINGERPRINT frames ``(id, simhash)`` (``simhash64``) — in
    production the store side is the persisted fingerprint table;
    only 8-byte fingerprints are ever state.

    Candidate generation is BANDED, never all-pairs: fingerprints
    split into ``n_bands`` bands of ``band_bits`` bits and only pairs
    sharing an exact band meet (one equi-join per side). The
    pigeonhole guarantee is exact, not probabilistic: Hamming
    distance <= n_bands − 1 forces at least one untouched band, so
    with the defaults (4 × 16, hamming_max 3) banding misses NOTHING
    — the output is a pure function of the fingerprints and the SQL
    restatement hash-checks.

    Returns one row per batch doc: ``(id, simhash, status, match_id,
    hamming)`` with status ``'dup_store'`` (store wins over batch
    order, the dedup_incremental precedence), ``'dup_batch'``
    (near-dup of a LOWER-id batch doc) or ``'kept'``; the reported
    match is the (hamming, id)-minimal one, NULL for kept rows.

    Plan at 100 TB: two bounded explodes (n_bands rows per doc), two
    shuffle equi-joins on (band, band_value), map-side-combinable
    min(struct) winner aggs. A candidate pair meets in up to
    ``n_bands`` buckets — the min-agg absorbs the multiplicity, no
    dedup stage. Band-bucket skew is bounded in practice because this
    runs AFTER exact incremental dedup (byte-identical content — the
    pathological bucket filler — is already removed); under residual
    extreme skew apply the minhash ``max_bucket`` valve, accepting
    its documented exactness trade.

    The batch-fingerprint subtree feeds FOUR plan branches (store
    probe, both sides of the batch self-probe, final assembly); an
    id-keyed repartition pins one exchange under all of them so AQE's
    ReusedExchange computes the (mapInPandas-backed) fingerprints
    ONCE — without it the kernel re-runs per branch (interleaved
    same-session sf0.1: 1.88 → 1.55 s warm wall, the
    i_sim_sparse_pairs reuse rule; the remaining wall is local-mode
    stage floor over the join/agg stages — a fused union-form
    single-join rewrite measured WORSE, 2.45 vs 2.03, and was
    rejected on the record, SCALE.md round-12). The store side is
    referenced once and needs no pin."""
    batch_fps = batch_fps.repartition(id_col)
    bb = _simhash_bands(batch_fps, n_bands, band_bits, id_col)
    sb = _simhash_bands(store_fps, n_bands, band_bits, id_col)

    def best_match(cand, other_id, other_sim):
        ham = F.bit_count(F.col("simhash").bitwiseXOR(other_sim))
        return (
            cand.where(ham <= hamming_max)
            .groupBy(id_col)
            .agg(
                F.min(
                    F.struct(
                        ham.cast("long").alias("hamming"),
                        other_id.cast("long").alias("match_id"),
                    )
                ).alias("__m")
            )
        )

    s = sb.select(
        F.col("band"),
        F.col("bv"),
        F.col(id_col).alias("__sid"),
        F.col("simhash").alias("__ssim"),
    )
    smatch = best_match(
        bb.join(s, ["band", "bv"]), F.col("__sid"), F.col("__ssim")
    ).select(id_col, F.col("__m").alias("__sm"))

    b2 = bb.select(
        F.col("band"),
        F.col("bv"),
        F.col(id_col).alias("__bid"),
        F.col("simhash").alias("__bsim"),
    )
    bmatch = best_match(
        bb.join(b2, ["band", "bv"]).where(F.col("__bid") < F.col(id_col)),
        F.col("__bid"),
        F.col("__bsim"),
    ).select(id_col, F.col("__m").alias("__bm"))

    return (
        batch_fps.join(smatch, id_col, "left")
        .join(bmatch, id_col, "left")
        .select(
            id_col,
            "simhash",
            F.when(F.col("__sm").isNotNull(), F.lit("dup_store"))
            .when(F.col("__bm").isNotNull(), F.lit("dup_batch"))
            .otherwise(F.lit("kept"))
            .alias("status"),
            F.coalesce("__sm.match_id", "__bm.match_id").alias("match_id"),
            F.coalesce("__sm.hamming", "__bm.hamming").alias("hamming"),
        )
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
    array_min(transform(shingles, xxhash64(seed))).

    Two-stage hashing keeps this O(shingles) not O(shingles * k):
    each shingle STRING is xxhash64'd exactly once (JVM scan-side),
    then the k lanes re-mix the resulting int64. The remix+min runs as
    a vectorized numpy kernel (mapInPandas, splitmix64 of h + lane *
    golden): k JVM array-lambda passes interpreted ~k*|shingles| hash
    exprs per doc and were ~3x slower than one Arrow transfer plus a
    (|shingles|, k) wrapped-uint64 broadcast in numpy."""
    based = df.select(
        F.col(id_col),
        F.transform(
            word_shingles(F.col(text_col), shingle_n), lambda s: F.xxhash64(s)
        ).alias("__h"),
    )
    lane_offsets = (
        np.arange(1, num_hashes + 1, dtype=np.uint64) * _SM_GOLDEN
    )  # per-lane seed

    def remix_min(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, sigs = [], []
            for did, h in zip(batch[id_col], batch["__h"]):
                ids.append(did)
                if h is None or len(h) == 0:
                    sigs.append(None)  # too short to shingle: no signal
                    continue
                base = np.asarray(h, dtype=np.int64).view(np.uint64)
                mixed = _splitmix64(base[:, None] + lane_offsets[None, :])
                sigs.append(mixed.min(axis=0).view(np.int64))
            yield pd.DataFrame({id_col: ids, "signature": sigs})

    return based.mapInPandas(remix_min, f"{id_col} long, signature array<long>")


def _bucket_pair_array(members, pair_struct, key=None):
    """All (a, b) pairs with key(b) > key(a) inside one bucket's
    ``members`` array, as a flat struct array — the bucket-local pair
    emission shared by minhash banding and the winnowing substring
    dedup. ``pair_struct(a, b)`` builds the pair payload; ``key``
    extracts the ordering field (identity by default)."""
    k = key or (lambda m: m)
    return F.flatten(
        F.transform(
            members,
            lambda a: F.transform(
                F.filter(members, lambda b: k(b) > k(a)),
                lambda b: pair_struct(a, b),
            ),
        )
    )


def minhash_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 8,
    max_bucket: int = 256,
    num_hashes: int | None = 32,
) -> DataFrame:
    """LSH banding: split signatures into bands, then bucket-LOCAL pair
    generation — groupBy (band_idx, band_hash), collect members, emit
    all id_a < id_b pairs inside each bucket with estimated Jaccard
    (signature agreement rate).

    One shuffle total (the bucket groupBy), and the signature lineage
    is evaluated once — a bucket self-JOIN instead would evaluate the
    full signature pipeline once per join side. Buckets larger than
    ``max_bucket`` are dropped: a giant bucket means the band hash
    carries no signal there, and the cap bounds per-bucket memory and
    pair blowup under skew (the 100 TB guard)."""
    # docs too short to shingle have all-null signatures — they carry
    # guard the banding arithmetic: a non-dividing band count silently
    # ignores trailing lanes (lower recall than configured), and
    # num_bands > num_hashes makes every band slice empty — every doc
    # hashes to xxhash64('') and the whole corpus lands in one dropped
    # bucket, returning zero candidates with no error. Checked
    # statically via num_hashes (an action on the signature lineage
    # here would run the whole hashing pipeline twice).
    if num_hashes is not None and num_hashes % num_bands != 0:
        raise ValueError(
            f"num_bands={num_bands} must divide num_hashes={num_hashes}: "
            "a remainder silently drops trailing minhash lanes from "
            "every band"
        )
    # no similarity signal and would all collide in one bucket
    sigs = sigs.filter(F.col("signature")[0].isNotNull())
    n_hashes_col = F.size("signature")
    rows_per_band = (n_hashes_col / num_bands).cast("int")
    # runtime guard on the ACTUAL signature length (the static check
    # above only sees the caller-declared num_hashes): a non-dividing
    # array would silently drop trailing lanes from every band. The
    # branch is per row but trivially cheap; raise_error's NullType
    # coerces to the hash's long.
    divides = F.pmod(n_hashes_col, F.lit(num_bands)) == 0
    guarded_hash = lambda c: F.when(divides, F.xxhash64(c)).otherwise(  # noqa: E731
        F.raise_error(
            F.concat(
                F.lit(f"num_bands={num_bands} must divide signature length "),
                n_hashes_col.cast("string"),
            )
        ).cast("long")
    )
    banded = (
        sigs.select(
            id_col,
            "signature",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(num_bands - 1)),
                    lambda b: guarded_hash(
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
    buckets = (
        banded.groupBy("band_idx", "band_hash")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col(id_col).alias("id"), F.col("signature").alias("sig"))
                )
            ).alias("members")
        )
        .filter((F.size("members") >= 2) & (F.size("members") <= max_bucket))
    )
    agree = lambda sa, sb: F.size(  # noqa: E731
        F.filter(F.zip_with(sa, sb, lambda a, b: (a == b).cast("int")), lambda x: x == 1)
    )
    pair_arr = _bucket_pair_array(
        F.col("members"),
        lambda a, b: F.struct(
            a["id"].alias("id_a"),
            b["id"].alias("id_b"),
            F.round(agree(a["sig"], b["sig"]) / F.size(a["sig"]), 4).alias(
                "est_jaccard"
            ),
        ),
        key=lambda m: m["id"],
    )
    # the same pair can surface from several bands with identical est —
    # dedup on ids only (no signatures cross this shuffle)
    return (
        buckets.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b", "p.est_jaccard")
        .groupBy("id_a", "id_b")
        .agg(F.max("est_jaccard").alias("est_jaccard"))
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
    """SimHash fingerprint per doc: hash each distinct token (JVM
    scan-side), then per-bit majority vote + sign-bit packing in a
    vectorized numpy kernel (mapInPandas). ZERO shuffles: token hashes
    never leave their scan partition (the earlier explode + 64
    aggregate-expression formulation shuffled (id, token_hash) rows and
    interpreted 64 conditionals per token). Docs with no tokens emit no
    row (matching the explode formulation's semantics).

    The token hash is the lower 64 bits of md5 — an ENGINE-PORTABLE
    basis (DuckDB: ('0x' || substr(md5(tok),17,16))::UBIGINT gives the
    identical integer), so the whole fingerprint is exact-SQL-checkable
    rather than rows-only. JVM-side it's parsed as two 32-bit halves
    (conv of 8 hex chars each — 16 at once would overflow signed
    BIGINT) and recombined in the kernel."""
    from sparkclif.operators.hashing import md5_bits

    toks = F.array_distinct(tokens(F.col(text_col)))
    # materialize md5 once, then parse both halves from the stored
    # array (inlining the lambda twice would md5 every token twice);
    # md5_bits re-hashes, so parse the stored hex directly with the
    # same (start, len) contract documented in operators/hashing.py
    hexed = df.select(
        F.col(id_col), F.transform(toks, lambda t: F.md5(t)).alias("__m")
    )
    tok_hashes = hexed.select(
        id_col,
        F.transform(
            "__m", lambda m: F.conv(F.substring(m, 17, 8), 16, 10).cast("long")
        ).alias("__hi"),
        F.transform(
            "__m", lambda m: F.conv(F.substring(m, 25, 8), 16, 10).cast("long")
        ).alias("__lo"),
    )
    shifts = np.arange(bits, dtype=np.uint64)

    def vote_pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, fps = [], []
            for did, hi, lo in zip(batch[id_col], batch["__hi"], batch["__lo"]):
                if hi is None or len(hi) == 0:
                    continue
                x = (
                    np.asarray(hi, dtype=np.int64).view(np.uint64) << np.uint64(32)
                ) | np.asarray(lo, dtype=np.int64).view(np.uint64)
                ones = ((x[:, None] >> shifts[None, :]) & np.uint64(1)).sum(axis=0)
                majority = (2 * ones > len(x)).astype(np.uint64)  # vote > 0
                fp = (majority << shifts).sum(dtype=np.uint64)
                ids.append(did)
                fps.append(int(np.array([fp], dtype=np.uint64).view(np.int64)[0]))
            yield pd.DataFrame({id_col: ids, "simhash": pd.Series(fps, dtype="int64")})

    return tok_hashes.mapInPandas(vote_pack, f"{id_col} long, simhash long")


def substring_candidate_pairs(
    docs: DataFrame,
    window: int = 32,
    stride: int = 16,
    max_df: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring near-duplicate candidates (the Lee et al. 2022
    "Deduplicating Training Data" modality) via WINNOWING (Schleimer
    et al., the MOSS fingerprinter): from each document's
    every-position ``window``-char grams, select the minimum gram of
    every sliding group of ``stride`` positions. Selection is
    CONTENT-aligned — a gram's selection depends only on its
    neighboring grams, never on its document offset — so any common
    verbatim run of length >= window + stride - 1 contains a full
    group on both sides and is GUARANTEED to contribute a shared
    selected gram, at ~1/stride selection density. (A first
    formulation sampled windows at document-offset-aligned strides;
    a run at offsets not congruent mod stride produced disjoint
    window sets and was silently missed — caught by
    test_substring_dedup_detection_guarantee.)

    Plan: gram generation + sliding-min selection are scan-side array
    expressions — the gram array is ``bind``-bound so it is built ONCE
    per row (Spark re-inlines aliased expressions into HOF lambdas;
    unbound, selection measured O(len²·window): 329 s for one 4 KB
    doc), giving the intended O(len·stride) short-string compares;
    the 100 TB variant swaps this kernel for an Arrow-batched numpy
    rolling-hash winnower, same selected-set contract. Per-doc dedup
    via array_distinct so the frequency count needs no distinct
    aggregate; ONE shuffle groups selected grams into buckets.
    Buckets sized [2, max_df] emit all id pairs locally; buckets ABOVE
    the cap emit STAR pairs (every member against the bucket's lowest
    id) — O(members), so a document verbatim-copied hundreds of times
    still surfaces in pairs and downstream connected-components
    clustering reunites the whole copy set, while the quadratic
    all-pairs blowup stays capped (a plain drop would silently hide
    exactly the mass-duplication case this operator exists for).
    """
    from sparkclif.operators.expr import bind

    text = F.col(text_col)
    n_grams = F.greatest(F.length(text) - (window - 1), F.lit(0))
    grams = F.when(
        n_grams > 0,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: text.substr(i.cast("int"), F.lit(window)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    selected = bind(
        grams,
        lambda g: F.when(F.size(g) <= 0, F.array().cast("array<string>"))
        .when(F.size(g) < stride, F.array(F.array_min(g)))
        .otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(g) - (stride - 1)),
                lambda i: F.array_min(F.slice(g, i.cast("int"), stride)),
            )
        ),
    )
    wins = docs.select(
        F.col(id_col),
        F.explode(F.array_distinct(selected)).alias("win"),
    )
    buckets = (
        wins.groupBy("win")
        .agg(F.sort_array(F.collect_list(id_col)).alias("members"))
        .where(F.size("members") >= 2)
    )
    all_pairs = _bucket_pair_array(
        F.col("members"), lambda a, b: F.struct(a.alias("id_a"), b.alias("id_b"))
    )
    star_pairs = F.transform(
        F.slice("members", 2, 2_000_000_000),
        lambda b: F.struct(
            F.element_at("members", 1).alias("id_a"), b.alias("id_b")
        ),
    )
    pair_arr = F.when(F.size("members") <= max_df, all_pairs).otherwise(star_pairs)
    pairs = buckets.select(F.explode(pair_arr).alias("p")).select("p.id_a", "p.id_b")
    return pairs.groupBy("id_a", "id_b").agg(
        F.count("*").cast("long").alias("n_shared")
    )
