"""Round-11 surface additions (SURVEY.md §2.2 growth set) — the three
shapes VERDICT r10 items 2, 3 and 6 named, all landed BEFORE the
round's window commit so they take their first driver rows THIS round:

- ``i_domain_stats_psl`` — the registrable-domain census driven by
  the PUBLIC-SUFFIX-LIST broadcast join (``operators/dedup.py
  registrable_domain_psl``) instead of the 3-suffix CASE heuristic:
  the operator ADVICE r9 asked for and VERDICT r10 found registered-
  but-undriven. The synthesized hosts include exactly the classes the
  heuristic mis-groups (``.com.au``, ``.or.jp``) plus a 4-label
  private-section suffix (``pvt.k12.ma.us``), so the longest-match
  rule is load-bearing in the hash check, not decorative.
- ``i_embed_pq_search`` — PQ asymmetric-distance (ADC) top-k search:
  the step that READS the codes ``i_embed_pq`` writes (VERDICT r10:
  "the IVF-PQ story ends one step short of its point"). Per-query
  8x16 integer lookup tables ride the plan as one literal; the
  database side is the stored code arrays only — the ANN scan never
  touches a float vector (``operators/quantize.py pq_adc_search``).
- ``e_win_gapfill_linear`` — linear-interpolation resample, the other
  half of the hypertable gap-fill story (``e_win_gapfill`` forward-
  fills): gap buckets get the line between the surrounding occupied
  buckets, stated as ONE IEEE expression both engines evaluate
  identically. Reuses the gapfill two-exchange gap-run expansion
  verbatim (``operators/timeseries.py resample_interpolate``).

Reference ties: the reference's corpus-side behaviors are rollups
over per-site listings and time-ordered status streams (app.py
R5-R11, R28-R31); these are that census/rollup discipline at
web-corpus scale, per the brief's dedup/similarity/curation pillars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkclif.io import table
from sparkclif.operators.dedup import (
    DEFAULT_MULTI_SUFFIXES,
    registrable_domain_psl,
)
from sparkclif.operators.quantize import pq_adc_search
from sparkclif.operators.timeseries import resample_interpolate
from sparkclif.registry import register


def domain_stats_psl_plan(docs: DataFrame) -> DataFrame:
    """See i_domain_stats_psl. Same synthesis conventions as
    domain_stats_plan (variant from doc_id div 20 so every source
    sees every variant — the correlated-modulus trap its round-9
    scale probe caught), but the suffix classes are chosen to
    exercise the PSL operator: m=1 is UPPERCASE + explicit port on a
    ``.com.au`` host (the heuristic collapses it to the bare suffix),
    m=2 is ``.or.jp``, m=3 rotates 3 cdn hosts under a 4-label
    private-section suffix, m=4 is a bare-eTLD+1 ``.co.uk`` host
    (no subdomain to collapse), m=0 is an unlisted ``.com`` (the
    last-two-labels fallback path)."""
    m = F.expr("doc_id div 20") % 5
    p = F.concat(F.lit("/p/"), (F.col("doc_id") % 50).cast("string"))
    url = (
        F.when(
            m == 0,
            F.concat(F.lit("https://docs."), F.col("source"), F.lit(".com"), p),
        )
        .when(
            m == 1,
            F.concat(
                F.lit("https://WWW."), F.upper("source"), F.lit(".COM.AU:443"), p
            ),
        )
        .when(
            m == 2,
            F.concat(F.lit("https://api."), F.col("source"), F.lit(".or.jp"), p),
        )
        .when(
            m == 3,
            F.concat(
                F.lit("https://cdn"),
                (F.col("doc_id") % 3).cast("string"),
                F.lit("."),
                F.col("source"),
                F.lit(".pvt.k12.ma.us"),
                p,
            ),
        )
        .otherwise(
            F.concat(F.lit("https://"), F.col("source"), F.lit(".co.uk"), p)
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
    )
    d = registrable_domain_psl(h, "host")
    return d.groupBy("domain").agg(
        F.count("*").alias("n_urls"),
        F.countDistinct("host").alias("n_hosts"),
        F.countDistinct("path").alias("n_paths"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )


def _domain_stats_psl_oracle() -> str:
    """Generated DuckDB restatement of the PSL census: the suffix
    list is inlined FROM DEFAULT_MULTI_SUFFIXES (one definition — the
    lists cannot drift), candidates are the last 1..K labels with K
    derived from the list exactly as the operator derives it, the
    longest listed match is the last element of the (length-ordered)
    filtered candidate array, and eTLD+1/fallback state the operator's
    rules verbatim."""
    sfx_lit = "[" + ",".join(f"'{s}'" for s in DEFAULT_MULTI_SUFFIXES) + "]"
    k = max(s.count(".") + 1 for s in DEFAULT_MULTI_SUFFIXES)
    return f"""
    WITH u AS (
        SELECT doc_id, lang, n_chars,
               CASE (doc_id // 20) % 5
                 WHEN 0 THEN 'https://docs.' || source || '.com/p/'
                      || CAST(doc_id % 50 AS VARCHAR)
                 WHEN 1 THEN 'https://WWW.' || upper(source)
                      || '.COM.AU:443/p/' || CAST(doc_id % 50 AS VARCHAR)
                 WHEN 2 THEN 'https://api.' || source || '.or.jp/p/'
                      || CAST(doc_id % 50 AS VARCHAR)
                 WHEN 3 THEN 'https://cdn' || CAST(doc_id % 3 AS VARCHAR)
                      || '.' || source || '.pvt.k12.ma.us/p/'
                      || CAST(doc_id % 50 AS VARCHAR)
                 ELSE 'https://' || source || '.co.uk/p/'
                      || CAST(doc_id % 50 AS VARCHAR)
               END AS url
        FROM documents
    ),
    h AS (
        SELECT doc_id, lang, n_chars,
               regexp_replace(
                   lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]*)', 1)),
                   ':[0-9]+$', '') AS host,
               regexp_extract(url, '^[A-Za-z]+://[^/?#]*(/[^?#]*)', 1) AS path
        FROM u
    ),
    d AS (
        SELECT *, string_split(host, '.') AS labels,
               len(string_split(host, '.')) AS nl
        FROM h
    ),
    c AS (
        SELECT *, list_filter(
                   list_transform(range(1, least(nl, {k}) + 1),
                       k -> array_to_string(
                           list_slice(labels, nl - k + 1, nl), '.')),
                   c -> list_contains({sfx_lit}, c)) AS fl
        FROM d
    ),
    b AS (
        SELECT *, fl[-1] AS best,
               len(string_split(fl[-1], '.')) AS ks
        FROM c
    ),
    r AS (
        SELECT doc_id, lang, n_chars, host, path,
               CASE WHEN best IS NOT NULL THEN
                   CASE WHEN nl > ks
                        THEN array_to_string(
                            list_slice(labels, nl - ks, nl), '.')
                        ELSE host END
               ELSE
                   CASE WHEN nl < 2 THEN host
                        ELSE array_to_string(labels[-2:], '.') END
               END AS domain
        FROM b
    )
    SELECT domain,
           count(*) AS n_urls,
           count(DISTINCT host) AS n_hosts,
           count(DISTINCT path) AS n_paths,
           count(DISTINCT lang) AS n_langs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM r
    GROUP BY domain
    """


@register(
    "i_domain_stats_psl",
    oracle=_domain_stats_psl_oracle(),
)
def i_domain_stats_psl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registrable-domain census over the PUBLIC SUFFIX LIST — the
    production eTLD+1 rollup (``i_domain_stats`` keeps the
    dependency-free CASE heuristic; this query drives the broadcast
    longest-match join a real crawl census needs: example.com.au is
    example.com.au's publisher, not the suffix com.au). Same census
    columns; host synthesis exercises case folding, port stripping,
    the two suffix classes the heuristic mis-groups, a 4-label
    private-section suffix, and the unlisted-TLD fallback.

    Plan: scan-side URL parse; the PSL operator derives the best
    suffix per DISTINCT host (pure function of the host — ADVICE
    r10's determinism rule) via a bounded xK explode + ONE broadcast
    hash join + a groupBy that reuses the distinct's partitioning,
    then joins back ON THE HOST STRING; the census is one
    bounded-output aggregation. At 100 TB the suffix list is ~9k
    rows (always broadcast) and the per-host map is crawl-host
    cardinality — AQE broadcasts it when small, skew-splits when
    not."""
    return domain_stats_psl_plan(table(spark, sf_dir, "documents"))


@register(
    "i_embed_pq_search",
    # cache_plan=False: plan build collects the codebook + queries.
    cache_plan=False,
    # Exact restatement: i_embed_pq's codes CTE verbatim, the same 4
    # smallest-id queries, lut as a (query x sub x code) distance CTE,
    # ADC as the lut-join sum grouped per (query, neighbor), top-10
    # by (adc, neighbor_id). All-integer throughout.
    oracle=r"""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(floor(x::DOUBLE * 10000) AS BIGINT)) AS qv
        FROM embeddings
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
    ),
    queries AS (
        SELECT vec_id AS q_id, qv FROM q ORDER BY vec_id LIMIT 4
    ),
    lut AS (
        SELECT qs.q_id, cb.sub, cb.code,
               CAST(list_sum(list_transform(range(1, 9),
                   j -> (qs.qv[cb.sub * 8 + j] - cv[j])
                        * (qs.qv[cb.sub * 8 + j] - cv[j])))
                   AS BIGINT) AS d
        FROM queries qs CROSS JOIN cb
    ),
    adc AS (
        SELECT l.q_id AS vec_id, c.vec_id AS neighbor_id,
               CAST(sum(l.d) AS BIGINT) AS adc_dist
        FROM codes c
        JOIN lut l ON l.sub = c.sub AND l.code = c.code
        WHERE c.vec_id <> l.q_id
        GROUP BY l.q_id, c.vec_id
    )
    SELECT vec_id, neighbor_id, adc_dist, CAST(rn AS INT) AS rank
    FROM (SELECT vec_id, neighbor_id, adc_dist,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY adc_dist, neighbor_id) AS rn
          FROM adc)
    WHERE rn <= 10
    """,
)
def i_embed_pq_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k search — completes the
    IVF-PQ story (VERDICT r10 item 3): the 4 smallest-id vectors
    query the corpus's PQ codes via per-query 8x16 integer lookup
    tables; each stored vector costs 8 table adds, never a float dot.
    Exact in the shared floor(v*10^4) basis, so the oracle is a full
    hash check; recall vs the exact L2 top-k is property-tested
    (tests/test_r11_queries.py). See operators/quantize.py
    pq_adc_search for the plan (one code-fold shuffle + literal LUTs
    + two-phase salted top-k window)."""
    from sparkclif.io import spread_by_bytes

    raw = table(spark, sf_dir, "embeddings")
    # heavy encode path gets the spread, hash-partitioned on vec_id so
    # the code-fold groupBy(vec_id) satisfies its distribution from
    # that single exchange (spread's by= reuse rule); the bounded
    # seed/query collects run on the raw scan (no repartition exchange
    # under a TakeOrdered(16) — 3x off the build's collect job at
    # sf0.1)
    return pq_adc_search(spread_by_bytes(raw, by=["vec_id"]), meta_src=raw)


@register(
    "i_sim_ivf_pq",
    # cache_plan=False: plan build collects codebook + heads.
    cache_plan=False,
    # Exact restatement fusing the two anchor oracles: the
    # i_sim_ivf_probe_stats centroid/posting/probe CTEs (8 smallest-id
    # centroids, argmax integer dot, ties lowest id; queries probe
    # their 2 nearest) over i_embed_pq's codes CTE with
    # i_embed_pq_search's lut, ADC summed per (query, posting of a
    # probed cluster), top-3 by (adc, neighbor). All-integer.
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
    ranked AS (
        SELECT vec_id, c_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY score DESC, c_id) AS pr
        FROM scores
    ),
    posting AS (SELECT vec_id, c_id AS cluster FROM ranked WHERE pr = 1),
    queries AS (SELECT vec_id AS q_id, qv FROM q ORDER BY vec_id LIMIT 4),
    probe AS (
        SELECT r.vec_id AS q_id, r.c_id AS cluster
        FROM ranked r JOIN queries qs ON qs.q_id = r.vec_id
        WHERE r.pr <= 2
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
    ),
    lut AS (
        SELECT qs.q_id, cb.sub, cb.code,
               CAST(list_sum(list_transform(range(1, 9),
                   j -> (qs.qv[cb.sub * 8 + j] - cv[j])
                        * (qs.qv[cb.sub * 8 + j] - cv[j])))
                   AS BIGINT) AS d
        FROM queries qs CROSS JOIN cb
    ),
    cand AS (
        SELECT p.q_id, po.vec_id AS neighbor_id, po.cluster
        FROM probe p
        JOIN posting po ON po.cluster = p.cluster AND po.vec_id <> p.q_id
    ),
    adc AS (
        SELECT c.q_id AS vec_id, c.neighbor_id,
               CAST(c.cluster AS BIGINT) AS cluster,
               CAST(sum(l.d) AS BIGINT) AS adc_dist
        FROM cand c
        JOIN codes cd ON cd.vec_id = c.neighbor_id
        JOIN lut l ON l.q_id = c.q_id AND l.sub = cd.sub
                   AND l.code = cd.code
        GROUP BY c.q_id, c.neighbor_id, c.cluster
    )
    SELECT vec_id, neighbor_id, cluster, adc_dist, CAST(rn AS INT) AS rank
    FROM (SELECT vec_id, neighbor_id, cluster, adc_dist,
                 row_number() OVER (PARTITION BY vec_id
                                    ORDER BY adc_dist, neighbor_id) AS rn
          FROM adc)
    WHERE rn <= 3
    """,
)
def i_sim_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ fused search — the full 100 TB ANN layout, closing the
    arc i_cluster_kmeans -> i_sim_ivf* -> i_embed_pq ->
    i_embed_pq_search built piecewise: the coarse quantizer prunes to
    each query's 2 probed clusters and the ranking inside them is PQ
    asymmetric distance over stored code bytes — no float vector and
    no unprobed posting is ever touched past the scan. Exact integer
    basis end to end, deterministic centroid/codebook/query
    conventions shared with the anchors (one definition each). See
    operators/quantize.py ivf_pq_search for the plan (in-row cluster
    argmax + code fold on one reused exchange + probe-table map
    literal + two-phase salted top-k)."""
    from sparkclif.io import spread_by_bytes
    from sparkclif.operators.quantize import ivf_pq_search

    raw = table(spark, sf_dir, "embeddings")
    return ivf_pq_search(spread_by_bytes(raw, by=["vec_id"]), meta_src=raw)


@register(
    "e_win_gapfill_linear",
    # Exact restatement via the per-user grid + gap-bounding windows
    # (DuckDB's fast idiom — the engine's gap-run expansion stated
    # directly, with lead() + per-entry generate_series, runs 35x
    # slower there: ~1M per-row generator calls vs one per user; both
    # forms emit the identical [first, last] bucket relation). The
    # anchors are the SAME: t0/v0 = the previous OBSERVED (non-NULL
    # valued) bucket and its (ts, event_id)-tiebroken last value,
    # t1/v1 = the next observed one — a bucket whose events all carry
    # NULL values emits its own NULL and is skipped as an anchor, on
    # BOTH engines (round-11 review; the CASE inside the t0/t1
    # windows is what keeps the timestamp anchors paired with the
    # value anchors). The lerp is the IDENTICAL IEEE expression
    # (exact integer-valued operands into each op — unrounded by
    # design, the i_quality_classifier rule).
    oracle="""
    WITH lastrow AS (
        SELECT user_id, date_trunc('hour', ts) AS h, round(value, 4) AS v
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id,
                                       date_trunc('hour', ts)
                                   ORDER BY ts DESC, event_id DESC) = 1
    ),
    hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS h,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    ),
    b AS (
        SELECT user_id, date_trunc('hour', min(ts)) AS h0,
               date_trunc('hour', max(ts)) AS h1
        FROM events GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS gh
        FROM b
    ),
    j AS (
        SELECT g.user_id, g.gh, o.h, o.n, l.v
        FROM grid g
        LEFT JOIN hourly o ON o.user_id = g.user_id AND o.h = g.gh
        LEFT JOIN lastrow l ON l.user_id = g.user_id AND l.h = g.gh
    ),
    w AS (
        SELECT user_id, gh, h, v, coalesce(n, 0) AS n_events,
               last_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY gh
                   ROWS UNBOUNDED PRECEDING) AS v0,
               last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY gh
                         ROWS UNBOUNDED PRECEDING) AS t0,
               first_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY gh
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1,
               first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
                   OVER (PARTITION BY user_id ORDER BY gh
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS t1
        FROM j
    )
    SELECT user_id, epoch_us(gh) AS hour_us,
           CAST(n_events AS BIGINT) AS n_events,
           CASE WHEN h IS NOT NULL THEN v
                ELSE v0 + (v1 - v0)
                     * (CAST(epoch_us(gh) - epoch_us(t0) AS DOUBLE)
                        / CAST(epoch_us(t1) - epoch_us(t0) AS DOUBLE))
           END AS interp_value
    FROM w
    """,
)
def e_win_gapfill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-interpolation time-series resample (the hypertable
    ``interpolate()``): one row per (user, hour) over each user's
    occupied span; gap buckets get the line between the surrounding
    OBSERVED buckets' last values, anchored at bucket timestamps
    (NULL-valued buckets are emitted but never anchor) — where
    ``e_win_gapfill`` repeats the left value, this draws the trend
    through the gap. Same two-exchange gap-run expansion; see
    operators/timeseries.py resample_interpolate."""
    ev = table(spark, sf_dir, "events")
    return resample_interpolate(ev)
