"""Deterministic-sketch queries (SURVEY.md §2.2 group D extension,
round 4): Count-Min and HyperLogLog built on the portable md5 basis —
the sketch STATE itself is hash-checked against SQL, not just row
counts (contrast d_agg_approx, whose engine-private hash seeds force
a rows-only check). See operators/sketch.py for the design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkclif.io import spread_by_bytes, table
from sparkclif.registry import register

_TOKENS_SQL = r"""
        SELECT unnest(list_filter(string_split_regex(text, '\s+'),
                                  x -> x <> '')) AS tok
        FROM documents
"""


def _token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(tok, cnt) — the token stream pre-aggregated to its vocabulary
    (optimization r13, guide §2.3 "aggregate before you shuffle"): all
    three sketch builds are duplicate-insensitive given the count (CMS
    sums weights; HLL max and bloom OR cannot move on a repeat), so the
    4-md5-per-row hash work runs over the VOCABULARY instead of the
    occurrence stream — at corpus scale that is orders of magnitude
    less hashing for bit-identical sketch state, and the shuffled
    partials are vocab-bounded per map task instead of cell-bounded
    (fewer, never more). The tokenize+count pass itself is light
    per-row work, so its parallelism is sized by input bytes, not core
    count (spread_by_bytes — the r12 driver measured the five sketch
    queries scaling NEGATIVELY with cores because every stage's task
    count tracked defaultParallelism)."""
    from sparkclif.operators.text import tokens

    docs = spread_by_bytes(table(spark, sf_dir, "documents"))
    return (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


@register(
    "d_agg_countmin",
    # Exact restatement: every token occurrence increments one column
    # per row, column = md5('cms<r>|' || token) low-32-bits % 64.
    oracle=f"""
    WITH w AS ({_TOKENS_SQL}),
    cells AS (
        SELECT r.i AS row,
               ('0x' || substr(md5('cms' || r.i || '|' || tok), 25, 8))::UBIGINT
                   % 64 AS col
        FROM w CROSS JOIN (SELECT unnest(range(4)) AS i) r
    )
    SELECT CAST(row AS INT) AS row, CAST(col AS INT) AS col,
           count(*)::BIGINT AS cnt
    FROM cells GROUP BY row, col
    """,
)
def d_agg_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (4×64) over token occurrences, portable md5
    hash rows: the full counter matrix is hash-checked. Two-level
    build (optimization r13): token counts first, then the weighted
    CMS over the vocabulary — identical matrix (sum of per-token
    counts == occurrence count), md5 work on the vocab, not the
    stream (operators/sketch.py weight_col path, _token_counts)."""
    from sparkclif.operators.sketch import count_min

    return count_min(
        _token_counts(spark, sf_dir),
        col="tok",
        depth=4,
        width=64,
        weight_col="cnt",
    )


_HLL_T_SQL = f"""
    w AS ({_TOKENS_SQL}),
    hx AS (SELECT md5('hll|' || tok) AS h FROM w),
    t AS (
        SELECT ('0x' || substr(h, 1, 2))::UBIGINT % 64 AS reg,
               CASE WHEN ('0x' || substr(h, 3, 6))::UBIGINT = 0 THEN 25
                    ELSE 25 - length(bin(('0x' || substr(h, 3, 6))::UBIGINT))
               END AS rho
        FROM hx
    ),
    regs AS (
        SELECT r.i AS reg, coalesce(u.mx, 0) AS max_rho
        FROM (SELECT unnest(range(64)) AS i) r
        LEFT JOIN (SELECT reg, max(rho) AS mx FROM t GROUP BY reg) u
               ON u.reg = r.i
    )
"""


@register(
    "d_agg_hll_registers",
    # Exact restatement: register = first 8 md5 bits % 64, rho =
    # 24-bit-suffix leading zeros + 1 (via length(bin(v)) — identical
    # in both engines), max per register, untouched registers 0.
    oracle=f"""
    WITH {_HLL_T_SQL}
    SELECT CAST(reg AS BIGINT) AS reg, CAST(max_rho AS INT) AS max_rho
    FROM regs
    """,
)
def d_agg_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog register table (p=6, m=64) over tokens, portable
    md5 basis: all 64 registers hash-checked. Two-level build
    (optimization r13): duplicates cannot move a max, so the md5/rho
    split runs over the vocabulary (_token_counts) — the weight_col
    path keeps the pre-aggregation from being optimized away (see
    hll_sketch)."""
    from sparkclif.operators.sketch import hll_sketch

    return hll_sketch(
        _token_counts(spark, sf_dir), col="tok", p=6, weight_col="cnt"
    )


@register(
    "d_agg_hll_estimate",
    # Exact restatement: harmonic sum as Σ 2^(25 - M_j) in BIGINT
    # (every term a power of two), then one literal multiply + one
    # IEEE division; 33554432 = 2^25.
    oracle=f"""
    WITH {_HLL_T_SQL},
    s AS (
        SELECT CAST(sum(1::BIGINT << (25 - max_rho)) AS BIGINT)
                   AS harm_sum_e25
        FROM regs
    )
    SELECT harm_sum_e25,
           round(0.709 * 4096.0 * 33554432.0 / harm_sum_e25, 4)
               AS est_distinct
    FROM s
    """,
)
def d_agg_hll_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL raw estimate from the register table: exact-integer
    harmonic sum (powers of two in the 2^25 basis — no float
    accumulation order anywhere) and a single IEEE multiply/divide,
    so even the ESTIMATE is hash-checked cross-engine."""
    from sparkclif.operators.sketch import hll_estimate, hll_sketch

    return hll_estimate(
        hll_sketch(
            _token_counts(spark, sf_dir), col="tok", p=6, weight_col="cnt"
        ),
        p=6,
    )


@register(
    "d_agg_bloom",
    # Exact restatement: 4 md5 hash rows set bits in a 512-bit filter;
    # DISTINCT (word, bit) then per-word sums of exact powers of two,
    # packed as 16 x 32-bit words (bit 63 of a 64-bit word would
    # overflow signed BIGINT packing).
    oracle=f"""
    WITH w AS ({_TOKENS_SQL}),
    bits AS (
        SELECT DISTINCT
               (('0x' || substr(md5('bloom' || j.i || '|' || tok), 25, 8))::UBIGINT
                   % 512) // 32 AS word,
               (('0x' || substr(md5('bloom' || j.i || '|' || tok), 25, 8))::UBIGINT
                   % 512) % 32 AS b
        FROM w CROSS JOIN (SELECT unnest(range(4)) AS i) j
    ),
    packed AS (
        SELECT word, CAST(sum(1::BIGINT << CAST(b AS INT)) AS BIGINT) AS bv
        FROM bits GROUP BY word
    )
    SELECT CAST(r.i AS BIGINT) AS word,
           CAST(coalesce(p.bv, 0) AS BIGINT) AS bits_value
    FROM (SELECT unnest(range(16)) AS i) r
    LEFT JOIN packed p ON p.word = r.i
    """,
)
def d_agg_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter (512 bits, 4 portable md5 hash rows) over the
    token vocabulary, packed as 16 × 32-bit words — the third classic
    sketch with hash-checked STATE. Two-level build (optimization
    r13): OR is idempotent, so the 4-hash explode runs over the
    vocabulary (_token_counts; cnt is pruned, leaving a distinct —
    the explode between the two aggregations blocks
    RemoveRedundantAggregates, unlike the bare-max HLL case)."""
    from sparkclif.operators.sketch import bloom_filter

    return bloom_filter(
        _token_counts(spark, sf_dir), col="tok", m_bits=512, k=4
    )


@register(
    "d_agg_countmin_topk",
    # Exact restatement: true top-10 tokens by (count desc, tok), each
    # joined with its CM point estimate — min over the 4 rows of the
    # cell its hash lands in. The CM guarantee (est >= true) is
    # thereby hash-checked, not just asserted in tests.
    oracle=f"""
    WITH w AS ({_TOKENS_SQL}),
    cells AS (
        SELECT r.i AS row,
               ('0x' || substr(md5('cms' || r.i || '|' || tok), 25, 8))::UBIGINT
                   % 64 AS col,
               count(*) AS cnt
        FROM w CROSS JOIN (SELECT unnest(range(4)) AS i) r
        GROUP BY 1, 2
    ),
    topk AS (
        SELECT tok, count(*)::BIGINT AS true_cnt,
               row_number() OVER (ORDER BY count(*) DESC, tok) AS rank
        FROM w GROUP BY tok
        QUALIFY rank <= 10
    ),
    probes AS (
        SELECT t.tok, t.true_cnt, t.rank, r.i AS row,
               ('0x' || substr(md5('cms' || r.i || '|' || t.tok), 25, 8))::UBIGINT
                   % 64 AS col
        FROM topk t CROSS JOIN (SELECT unnest(range(4)) AS i) r
    )
    SELECT p.tok, p.true_cnt, CAST(min(c.cnt) AS BIGINT) AS cms_est,
           CAST(p.rank AS INT) AS rank
    FROM probes p JOIN cells c ON c.row = p.row AND c.col = p.col
    GROUP BY p.tok, p.true_cnt, p.rank
    """,
)
def d_agg_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Count-Min matrix being USED: true top-10 heavy hitters,
    each with its CM point estimate (min over the 4 hash rows). ONE
    corpus pass: the (token -> count) aggregation feeds BOTH the
    top-k and the CM build (count_min's weight_col path — the matrix
    from pre-aggregated counts is identical, but the hash/explode
    work runs over the vocabulary, not the stream). The probe side is
    40 rows — it broadcasts onto the 256-cell matrix. The CM
    overestimate guarantee (cms_est >= true_cnt) is hash-checked by
    construction."""
    from sparkclif.operators.hashing import md5_bits
    from sparkclif.operators.sketch import count_min

    true_counts = _token_counts(spark, sf_dir).withColumnRenamed(
        "cnt", "true_cnt"
    )
    cms = count_min(true_counts, col="tok", depth=4, width=64, weight_col="true_cnt")
    from pyspark.sql import Window

    topk = (
        true_counts.orderBy(F.desc("true_cnt"), "tok")
        .limit(10)
        .withColumn(
            "rank",
            F.row_number()
            .over(Window.orderBy(F.desc("true_cnt"), F.col("tok")))
            .cast("int"),
        )
    )
    probes = topk.select(
        "tok",
        "true_cnt",
        "rank",
        F.posexplode(
            F.array(
                *[
                    md5_bits(F.concat(F.lit(f"cms{r}|"), F.col("tok")), 25, 8) % 64
                    for r in range(4)
                ]
            )
        ).alias("row", "col"),
    ).select(
        "tok", "true_cnt", "rank",
        F.col("row").cast("int").alias("row"),
        F.col("col").cast("int").alias("col"),
    )
    return (
        F.broadcast(probes)
        .join(cms, ["row", "col"])
        .groupBy("tok", "true_cnt", "rank")
        .agg(F.min("cnt").cast("long").alias("cms_est"))
        .select("tok", "true_cnt", "cms_est", "rank")
    )


@register(
    "d_agg_cube",
    # CUBE over two independent dims (lineitem flag x status) with a
    # grouping_id disambiguator so subtotal NULLs hash apart from any
    # (hypothetical) NULL group values; exact integer sum basis.
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
               AS gid,
           count(*) AS n,
           CAST(sum(CAST(l_quantity * 100 AS BIGINT)) AS BIGINT) AS qty_c
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def d_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all four grouping levels in
    one pass via Expand — the subtotal lattice ROLLUP cannot express
    (column-independent margins). grouping_id disambiguates subtotal
    NULLs; the quantity sum uses the exact centi-integer basis."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            # grouping_id() is only resolvable INSIDE the cube agg
            F.grouping_id().cast("long").alias("gid"),
            F.count("*").alias("n"),
            F.sum((F.col("l_quantity") * 100).cast("long")).cast("long").alias("qty_c"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "qty_c")
    )
