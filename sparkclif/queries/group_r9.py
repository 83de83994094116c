"""Round-9 surface additions (SURVEY.md §2.2 growth set) — the three
shapes VERDICT r8 item 5 named, all landed BEFORE the round's window
commit so they take their first driver rows THIS round:

- ``i_tokenizer_bpe_encode`` — APPLY a learned BPE merge table
  (completes the tokenizer story ``i_tokenizer_pair_counts`` begins:
  that query SELECTS merges, this one ENCODES with them). One corpus
  scan builds the vocabulary; the top-20 merge table collects to one
  rank-ordered broadcast array; the 20 greedy merge passes run as a
  two-level dynamic JVM ``aggregate`` fold over packed symbol strings
  (the e_funnel_steps fold discipline — sequential recurrences stay
  in whole-stage codegen, never Python); the encoded vocabulary rolls
  up per word length into the tokenizer's compression curve.
- ``i_quality_classifier`` — a linear model-based quality filter over
  hashing-trick features (the fastText-filter stage of every corpus
  pipeline, e.g. CCNet/GPT-3's quality scoring): token -> md5 bucket
  -> fixed integer weight, summed per document scan-side. The weight
  table is a deterministic function of the bucket id, so the score is
  EXACT-integer and the whole query is one projection — ZERO
  exchanges at any corpus size (a real model swaps the weight
  formula for a broadcast 64-float array; identical plan).
- ``i_domain_stats`` — registrable-domain (eTLD+1) corpus census: the
  crawl-side rollup behind per-domain quotas and source weighting
  (urls synthesized from doc fields per the g_url_funcs/i_dedup_url
  convention — documents carry no URL column — across subdomain,
  case, port and multi-label-suffix variants so the domain extraction
  is actually exercised). Scan-side host parse + eTLD+1
  (operators/dedup.registrable_domain), then ONE bounded-output
  aggregation.

Reference ties: the reference's corpus-side behaviors are
metadata-extraction rollups over per-site listings (app.py R5-R11);
these queries are that census discipline at web-corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkclif.io import table
from sparkclif.operators.corpus import BPE_SEP, bpe_encode_rollup
from sparkclif.operators.dedup import registrable_domain
from sparkclif.operators.hashing import md5_bits
from sparkclif.operators.text import tokens
from sparkclif.registry import register

_N_MERGES = 20


# df-parametrized plan builders — the ONE definition of each shape,
# shared by the registered queries below and by the scale probes
# (probes/scale_stress.py): a probe that re-declared the plan inline
# would silently keep measuring the old shape after a query fix (the
# group_r7 rule; review r9 found exactly that drift risk here).


def quality_classifier_plan(docs: DataFrame) -> DataFrame:
    """See i_quality_classifier. Tokenization is the shared corpus
    ``tokens()`` helper — the same basis as i_text_hash_features and
    word_freqs, never a local copy."""
    toks = tokens(F.coalesce(F.col("text"), F.lit("")))
    d = docs.select("doc_id", toks.alias("toks"))
    score_int = F.aggregate(
        F.col("toks"),
        F.lit(0).cast("long"),
        lambda acc, tok: acc
        + (
            (F.pmod(md5_bits(tok, 25, 8), F.lit(64)) * F.lit(2654435761))
            % F.lit(2001)
            - F.lit(1000)
        ),
    )
    s = d.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        score_int.alias("score_int"),
    )
    # score is UNROUNDED by design: both engines run the identical
    # IEEE division of exact small integers, so the doubles are
    # bit-identical — while round(4) would sit exactly ON decimal
    # half-boundaries (score_int/(1000n) often terminates: -13560/96000
    # = -0.14125) where Spark's BigDecimal HALF_UP and DuckDB's
    # raw-double rounding disagree by one ulp of the last digit.
    return s.select(
        "doc_id",
        "n_tokens",
        "score_int",
        (
            F.col("score_int").cast("double")
            / (F.lit(1000.0) * F.greatest(F.col("n_tokens"), F.lit(1)))
        ).alias("score"),
        F.when(F.col("score_int") > 0, F.lit("keep"))
        .otherwise(F.lit("drop"))
        .alias("label"),
    )


def domain_stats_plan(docs: DataFrame) -> DataFrame:
    """See i_domain_stats: synthesized host variants + eTLD+1 census."""
    # variant from doc_id DIV 20, never doc_id % 4: the testbed's
    # source cycles with doc_id % 20, and a mod-4 variant would be
    # CONSTANT per source — every domain would see exactly one host
    # and the subdomain-collapse rule would never fire (the
    # correlated-modulus trap i_dedup_url's synthesis documents; the
    # round-9 scale probe caught this as n_hosts=1 on every row)
    m = F.expr("doc_id div 20") % 4
    p = F.concat(F.lit("/p/"), (F.col("doc_id") % 50).cast("string"))
    url = (
        F.when(m == 0, F.concat(F.lit("https://docs."), F.col("source"), F.lit(".com"), p))
        .when(
            m == 1,
            F.concat(F.lit("https://WWW."), F.upper("source"), F.lit(".COM:443"), p),
        )
        .when(m == 2, F.concat(F.lit("https://api."), F.col("source"), F.lit(".co.uk"), p))
        .otherwise(
            F.concat(
                F.lit("https://cdn"),
                (F.col("doc_id") % 3).cast("string"),
                F.lit("."),
                F.col("source"),
                F.lit(".gov.uk"),
                p,
            )
        )
    )
    u = docs.select("doc_id", "lang", "n_chars", url.alias("url"))
    host = F.regexp_replace(
        F.lower(F.regexp_extract("url", r"^[A-Za-z]+://([^/?#]*)", 1)),
        r":\d+$",
        "",
    )
    path = F.regexp_extract("url", r"^[A-Za-z]+://[^/?#]*(/[^?#]*)", 1)
    h = u.select(
        "doc_id",
        "lang",
        "n_chars",
        host.alias("host"),
        path.alias("path"),
    ).withColumn("domain", registrable_domain("host"))
    return h.groupBy("domain").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("host").alias("n_hosts"),
        F.countDistinct("path").alias("n_paths"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


def _bpe_encode_oracle(n_merges: int = _N_MERGES) -> str:
    """Generated (deterministic) DuckDB restatement of the BPE encode:
    the vocabulary + merge-table CTEs are the i_tokenizer_pair_counts
    oracle verbatim-in-spirit; each merge pass is a ``list_reduce``
    over the BPE_SEP-packed symbol string via ``SELECT * REPLACE`` —
    character-identical to the engine's fold (see
    operators/corpus._bpe_merge_pass for the recurrence and the NULL
    no-op argument). The separator is embedded as the raw control
    char: DuckDB string literals do not interpret backslash escapes.
    """
    s = BPE_SEP
    pivot = ",\n               ".join(
        f"max(CASE WHEN rank = {i} THEN left_sym END) AS l{i},\n"
        f"               max(CASE WHEN rank = {i} THEN right_sym END) AS r{i}"
        for i in range(1, n_merges + 1)
    )
    passes = []
    prev = "base"
    for i in range(1, n_merges + 1):
        passes.append(
            f"""    p{i} AS (
        SELECT * REPLACE (list_reduce(
            list_prepend('', string_split(p, '{s}')),
            (acc, sym) -> CASE
                WHEN acc = '' THEN sym
                WHEN sym = r{i}
                     AND (acc = l{i} OR ends_with(acc, '{s}' || l{i}))
                    THEN acc || sym
                ELSE acc || '{s}' || sym END) AS p)
        FROM {prev}
    )"""
        )
        prev = f"p{i}"
    return (
        r"""
    WITH w AS (
        SELECT unnest(list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                                  x -> x <> '')) AS word
        FROM documents
    ),
    wf AS (SELECT word, count(*) AS wc FROM w GROUP BY word),
    pr AS (
        SELECT substring(word, d.i, 1)     AS left_sym,
               substring(word, d.i + 1, 1) AS right_sym,
               wc
        FROM wf
        CROSS JOIN (SELECT unnest(range(1, greatest(
                        (SELECT max(len(word)) FROM wf), 2))) AS i) d
        WHERE d.i <= len(word) - 1
    ),
    pc AS (
        SELECT left_sym, right_sym, CAST(sum(wc) AS BIGINT) AS pair_count
        FROM pr GROUP BY left_sym, right_sym
    ),
    ranked AS (
        SELECT left_sym, right_sym,
               row_number() OVER (ORDER BY pair_count DESC,
                                  left_sym, right_sym) AS rank
        FROM pc
    ),
    m AS (
        SELECT """
        + pivot
        + f"""
        FROM ranked WHERE rank <= {n_merges}
    ),
    base AS (
        SELECT wf.word, wf.wc, m.*,
               rtrim(regexp_replace(wf.word, '(.)', '\\1{s}', 'g'), '{s}') AS p
        FROM wf CROSS JOIN m
    ),
"""
        + ",\n".join(passes)
        + f""",
    fin AS (
        SELECT word, wc,
               CAST(len(string_split(p, '{s}')) AS INT) AS n_tokens,
               replace(p, '{s}', '+') AS enc
        FROM {prev}
    )
    SELECT CAST(len(word) AS INT) AS word_len,
           count(*) AS n_words,
           CAST(sum(wc) AS BIGINT) AS total_wc,
           CAST(sum(wc * n_tokens) AS BIGINT) AS total_tokens_wc,
           CAST(sum(n_tokens) AS DOUBLE) / count(*) AS avg_tokens,
           min(word) AS example_word,
           arg_min(enc, word) AS example_enc
    FROM fin GROUP BY word_len
    """
    )


@register(
    "i_tokenizer_bpe_encode",
    # Exact restatement, generated: same vocabulary, same top-20 merge
    # ranking (count desc, left, right), same 20 greedy packed-string
    # folds, same per-word-length rollup. See _bpe_encode_oracle.
    oracle=_bpe_encode_oracle(),
    # the operator localCheckpoints the shared vocabulary on first
    # action; rebuilding per run keeps that inside every timed run
    cache_plan=False,
)
def i_tokenizer_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODE with the corpus's own learned top-20 merges — per
    word-length compression rollup ``(word_len, n_words, total_wc,
    total_tokens_wc, avg_tokens, example_word, example_enc)``. All
    encode work is vocabulary-sized and JVM-side; see
    operators/corpus.bpe_encode_rollup for the plan."""
    return bpe_encode_rollup(table(spark, sf_dir, "documents"), _N_MERGES)


@register(
    "i_quality_classifier",
    # Exact restatement: same md5 bucket basis as i_text_hash_features
    # (hex chars [25,32] of the digest, mod 64), same integer weight
    # law w(b) = (b * 2654435761) % 2001 - 1000 (a Knuth-hash spread
    # over [-1000, 1000]), summed per doc with list_transform/list_sum
    # (the engine folds with aggregate()); score is ONE IEEE division
    # of exact integers, label a strict integer predicate. The UBIGINT
    # stays positive until the BIGINT cast (DuckDB unsigned subtract
    # would underflow below 1000).
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    s AS (
        SELECT doc_id,
               CAST(len(toks) AS INT) AS n_tokens,
               coalesce(CAST(list_sum(list_transform(toks, tok ->
                   CAST(('0x' || substr(md5(tok), 25, 8))::UBIGINT % 64
                        * 2654435761 % 2001 AS BIGINT) - 1000
               )) AS BIGINT), 0) AS score_int
        FROM t
    )
    SELECT doc_id, n_tokens, score_int,
           score_int::DOUBLE / (1000.0 * greatest(n_tokens, 1)) AS score,
           CASE WHEN score_int > 0 THEN 'keep' ELSE 'drop' END AS label
    FROM s
    """,
)
def i_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality classifier over hashing-trick features — the
    fastText-style keep/drop corpus filter. Each token hashes to one
    of 64 buckets (the i_text_hash_features basis); the model is a
    fixed integer weight per bucket; the document score is the token-
    averaged weight. EXACT integer accumulation (weights and sums are
    integers; the only float op is one final IEEE division), so the
    filter is bit-reproducible across engines and runs — the property
    a 100 TB re-run needs for an auditable keep/drop decision.

    Plan: ONE projection — tokenize, fold the token array with
    ``aggregate()`` (md5 + arithmetic inside the lambda, whole-stage
    codegen), no explode, no shuffle, no Python. The 44-query bench
    tail is dominated by per-stage constants; this is the shape that
    avoids them entirely: filter 100 TB with a map-only stage."""
    return quality_classifier_plan(table(spark, sf_dir, "documents"))


@register(
    "i_domain_stats",
    # The oracle synthesizes the IDENTICAL four host variants, then
    # states the same parse (authority regex, lowercase, port strip)
    # and the same eTLD+1 rule (last 2 labels; last 3 when the
    # second-to-last is co/ac/gov; <2 labels unchanged) with
    # string_split + negative list slices.
    oracle=r"""
    WITH u AS (
        SELECT doc_id, lang, n_chars,
               CASE (doc_id // 20) % 4
                 WHEN 0 THEN 'https://docs.' || source || '.com/p/'
                      || CAST(doc_id % 50 AS VARCHAR)
                 WHEN 1 THEN 'https://WWW.' || upper(source) || '.COM:443/p/'
                      || CAST(doc_id % 50 AS VARCHAR)
                 WHEN 2 THEN 'https://api.' || source || '.co.uk/p/'
                      || CAST(doc_id % 50 AS VARCHAR)
                 ELSE 'https://cdn' || CAST(doc_id % 3 AS VARCHAR) || '.'
                      || source || '.gov.uk/p/' || CAST(doc_id % 50 AS VARCHAR)
               END AS url
        FROM documents
    ),
    h AS (
        SELECT doc_id, lang, n_chars, url,
               regexp_replace(
                   lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]*)', 1)),
                   ':[0-9]+$', '') AS host,
               regexp_extract(url, '^[A-Za-z]+://[^/?#]*(/[^?#]*)', 1) AS path
        FROM u
    ),
    d AS (
        SELECT *,
               string_split(host, '.') AS labels,
               CASE
                 WHEN len(string_split(host, '.')) < 2 THEN host
                 WHEN len(string_split(host, '.')) >= 3
                      AND string_split(host, '.')[-2]
                          IN ('co', 'ac', 'gov')
                     THEN array_to_string(string_split(host, '.')[-3:], '.')
                 ELSE array_to_string(string_split(host, '.')[-2:], '.')
               END AS domain
        FROM h
    )
    SELECT domain,
           count(*) AS n_urls,
           count(DISTINCT host) AS n_hosts,
           count(DISTINCT path) AS n_paths,
           count(DISTINCT lang) AS n_langs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM d
    GROUP BY domain
    """,
)
def i_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registrable-domain (eTLD+1) corpus census — per-publisher URL,
    host, path, language and volume counts: the rollup a crawl
    pipeline budgets per-domain quotas and source weights from. Four
    synthesized host variants per doc (the i_dedup_url convention —
    documents carry no URL column): plain subdomain, UPPERCASE www
    with an explicit default port, and two multi-label ccTLD suffixes
    (.co.uk / .gov.uk with rotating cdn hosts) — so the census
    actually exercises case folding, port stripping, subdomain
    collapse, and the public-suffix rule (docs.X.com and www.X.com
    are ONE domain; cdn{0,1,2}.X.gov.uk are one domain with 3 hosts).

    Plan: scan-side projection (regex parse + registrable_domain's
    split/slice CASE) then ONE aggregation whose output is bounded by
    the publisher count — the 3 count-distincts expand the stream 3x
    but partial aggregation collapses each to (domain, value)
    cardinality before the shuffle (the hash_features argument)."""
    return domain_stats_plan(table(spark, sf_dir, "documents"))
