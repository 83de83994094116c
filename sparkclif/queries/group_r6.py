"""Round-6 surface additions (SURVEY.md §2.2 growth set): the
training-pipeline mechanics and scalar/window coverage the earlier
groups didn't yet exercise.

- ``i_sample_hash_split``   — deterministic train/valid/test split via
  the portable md5 basis (the canonical "hash the id, bucket mod 100"
  corpus split every training pipeline ships).
- ``i_text_hash_features``  — hashing-trick featurization (Weinberger
  et al. 2009): vocabulary-free token -> bucket counting.
- ``g_bitwise_funcs``       — the bitwise scalar surface (&, |, xor,
  not, shifts, popcount).
- ``e_win_running_distinct``— running COUNT(DISTINCT) per key over an
  ordered frame (collect_set window formulation).
- ``c_join_interval_grid``  — interval-to-grid overlap as bounded
  explode + equi-agg: the scalable restatement of the "events active
  during period" non-equi join.
- ``d_agg_moments``         — exact higher central moments (skewness /
  kurtosis) from integer power sums.
- ``c_join_bloom_prefilter``— semi-join reduction via an explicit
  Bloom filter (Spark's runtime-row-filter pattern made explicit).

Reference ties: the reference's only sampling/splitting is the R23
catalog batching (app.py:154-168, fixed-size chunks); these queries
generalize it to content-hash bucketing per SURVEY §2.2's declared
LLM-pipeline scope. All seven are exact-oracle (hash-checked).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkclif.io import table
from sparkclif.numeric import fixed_sum
from sparkclif.operators.hashing import md5_bits
from sparkclif.operators.text import tokens
from sparkclif.registry import register

# ---------------------------------------------------------------------
# df-parametrized plan builders — the ONE definition of each growth-set
# shape, shared by the registered queries below and by the scale probes
# (probes/scale_stress.py). A probe that re-declared the plan inline
# would silently keep measuring the old shape after a query fix.


def hash_features_plan(docs: DataFrame) -> DataFrame:
    toks = docs.select(
        "doc_id",
        F.explode(tokens(F.coalesce(F.col("text"), F.lit("")))).alias("tok"),
    )
    b = toks.withColumn("bucket", F.pmod(md5_bits(F.col("tok"), 25, 8), F.lit(64)))
    return b.groupBy("bucket").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct_tokens"),
        F.countDistinct("doc_id").alias("n_docs"),
    )


def running_distinct_plan(ev: DataFrame) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.size(F.collect_set("event_type").over(w)).alias("n_distinct_types"),
    )


def interval_grid_plan(o: DataFrame, li: DataFrame) -> DataFrame:
    """Interval-to-grid rollup as a DIFFERENCE ARRAY (sweep) rather
    than a per-month explode (VERDICT r6 item 6): each interval emits
    exactly TWO delta rows — (+1, +price) at its start month and
    (-1, -price) at the month after its end — which aggregate per
    month and cumulative-sum into the inflight counts. Replaces the
    O(interval_length) sequence-explode (~4-8 rows/order, each a
    month-arithmetic timestamp build) with O(2) struct rows/order; the
    cumulative window runs over the aggregated GRID (#months rows,
    single tiny task), never the data. Measured 1.01 s -> 0.76 s at
    sf0.1, hash unchanged. Price deltas stay scaled longs (the
    fixed_sum trick, numeric.py) so the cumsum is exact and
    order-independent; the decimal rescale happens once per grid row.
    Months where the running count hits zero (no order in flight) are
    emitted by the sweep but not by the oracle's explode — filtered."""
    # No broadcast hint: BOTH sides of this equi-join are
    # order-cardinality relations, so forcing orders driver-side is a
    # 100 TB OOM (ADVICE r7). At bench scale AQE broadcasts it anyway
    # (orders sf0.1 < autoBroadcastJoinThreshold); past that bound the
    # shuffle hash join on l_orderkey/o_orderkey is the right plan.
    span = (
        li.groupBy("l_orderkey")
        .agg(
            F.min("l_shipdate").alias("first_ship"),
            F.max("l_shipdate").alias("last_ship"),
        )
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            # the synthetic testbed lets lines ship before the order
            # month — normalize the interval with least/greatest
            F.date_trunc(
                "month", F.least(F.col("o_orderdate"), F.col("first_ship"))
            ).alias("m0"),
            F.date_trunc(
                "month", F.greatest(F.col("o_orderdate"), F.col("last_ship"))
            ).alias("m1"),
            "o_totalprice",
        )
    )
    # month stays a (month-truncated) timestamp: the driver compare
    # goes through pandas, which has no date dtype — a DATE here and a
    # DATE in the oracle would arrive as mismatched representations
    v = F.col("o_totalprice") * F.lit(1e6)
    scaled = F.when(v >= 0, F.floor(v + F.lit(0.5))).otherwise(
        -F.floor(-v + F.lit(0.5))
    )
    deltas = span.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("m0").alias("month"),
                    F.lit(1).cast("long").alias("dn"),
                    scaled.alias("dp"),
                ),
                F.struct(
                    (F.col("m1") + F.expr("INTERVAL 1 MONTH")).alias("month"),
                    F.lit(-1).cast("long").alias("dn"),
                    (-scaled).alias("dp"),
                ),
            )
        ).alias("e")
    ).select("e.month", "e.dn", "e.dp")
    g = deltas.groupBy("month").agg(
        F.sum("dn").alias("__dn"), F.sum("dp").alias("__dp")
    )
    # Cumsum + densify in ONE window pass over the aggregated grid
    # (~#months rows, single tiny task): a month fully inside an
    # interval has NO delta event, so the running value between two
    # event months is constant — each event row carries its cumulative
    # value forward by exploding the months up to (not including) the
    # next event month. No extra agg/join stage (a bounds-agg +
    # grid-join densify was measured +0.3 s of tiny-stage floors).
    w_ord = Window.orderBy("month")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(
        "month",
        F.sum("__dn").over(w_cum).alias("n_inflight"),
        F.sum("__dp").over(w_cum).alias("__p"),
        F.lead("month").over(w_ord).alias("__next"),
    )
    out = cum.select(
        F.explode(
            F.sequence(
                F.col("month"),
                F.coalesce(
                    F.col("__next") - F.expr("INTERVAL 1 MONTH"), F.col("month")
                ),
                F.expr("INTERVAL 1 MONTH"),
            )
        ).alias("month"),
        "n_inflight",
        "__p",
    ).filter(F.col("n_inflight") > 0)
    return out.select(
        "month",
        "n_inflight",
        F.round(
            (
                F.col("__p").cast("decimal(38,0)")
                / F.lit(10**6).cast("decimal(19,0)")
            ).cast("double"),
            4,
        ).alias("sum_inflight_price"),
    )


# Input-size bound for the LONG-basis power-sum accumulator: the
# tightest per-group overflow bound is s3 (q³ ≤ 1.25e11/row crosses
# 2^63 at ~7.4e7 max-quantity rows per group). 1 GiB of plan bytes is
# ~5e7 lineitem rows TOTAL — a comfortable margin below the per-group
# bound even if one group held every row. Both bases are EXACT, so a
# misdispatch changes nothing but speed — and an actual overflow under
# ANSI mode is a loud error, never a silent wrap.
MOMENTS_LONG_BASIS_BYTES = 1 * 1024 * 1024 * 1024


def moment_power_sums(
    df: DataFrame, group_col: str = "l_returnflag", force: str | None = None
) -> DataFrame:
    """Σq..Σq⁴ over quantity cents, exact. Cost-dispatched accumulator
    basis (r7): per-element q² (≤ 2.5e7) and q³ (≤ 1.25e11) fit
    BIGINT, but their SUMS cross 2^63 at ~3.7e11 / ~7.4e7
    max-quantity rows per group — reachable at the 100 TB deployment
    this query documents. Below MOMENTS_LONG_BASIS_BYTES the s2/s3
    partials therefore accumulate as LONGS (codegen primitives;
    measured 0.68 s -> 0.42 s at sf0.1) and only the final merge
    widens to decimal(38,0); above it they accumulate in decimal
    end-to-end. s4 (q⁴ ≤ 6.25e14/row, overflow at ~1.5e4 rows/group)
    is ALWAYS decimal. Both bases produce identical results; ANSI
    mode turns any misestimated overflow into an error, not a wrap.
    The partial agg stays map-side combinable either way (s1 stays
    BIGINT: 2^63/5000 ≈ 1.8e15 rows/group)."""
    from sparkclif.operators.rank import plan_size_bytes, validate_force

    validate_force(force, {"long", "decimal"})
    if force is None:
        size = plan_size_bytes(df)
        force = "long" if size <= MOMENTS_LONG_BASIS_BYTES else "decimal"
    q = F.round(F.col("l_quantity") * 100).cast("long")
    c = df.select(group_col, q.alias("q"))
    q2l = F.col("q") * F.col("q")
    q2d = q2l.cast("decimal(38,0)")
    if force == "long":
        s2 = F.sum(q2l).cast("decimal(38,0)")
        s3 = F.sum(q2l * F.col("q")).cast("decimal(38,0)")
    else:
        s2 = F.sum(q2d)
        s3 = F.sum(q2d * F.col("q"))
    return c.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum("q").alias("s1"),
        s2.alias("s2"),
        s3.alias("s3"),
        F.sum(q2d * q2d).alias("s4"),
    )


@register(
    "i_sample_hash_split",
    oracle="""
    WITH b AS (
        SELECT doc_id, n_chars,
               CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 25, 8))::UBIGINT
                    % 100 AS BIGINT) AS bucket
        FROM documents
    )
    SELECT CASE WHEN bucket < 90 THEN 'train'
                WHEN bucket < 95 THEN 'valid'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(doc_id) AS BIGINT) AS id_checksum,
           min(doc_id) AS min_doc_id,
           max(doc_id) AS max_doc_id
    FROM b
    GROUP BY 1
    """,
)
def i_sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/valid/test split by content-stable
    hash bucket (md5 of the document id, low 4 bytes, mod 100) — the
    split assignment is a pure function of the id, so it is stable
    across reruns, reshards and cluster sizes, and a late-arriving
    document lands in the same split forever (the property random()
    splits lack). Plan: pure scan -> map-side-combined agg over 3
    groups; zero joins, zero Python. The same md5-bits basis as the
    sketch family (operators/hashing.py) keeps it engine-portable."""
    docs = table(spark, sf_dir, "documents")
    bucket = F.pmod(md5_bits(F.col("doc_id").cast("string"), 25, 8), F.lit(100))
    split = (
        F.when(bucket < 90, F.lit("train"))
        .when(bucket < 95, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "doc_id", "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
            F.sum("doc_id").cast("long").alias("id_checksum"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


@register(
    "i_text_hash_features",
    oracle=r"""
    WITH t AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                                  x -> x <> '')) AS tok
        FROM documents
    ),
    b AS (
        SELECT doc_id, tok,
               CAST(('0x' || substr(md5(tok), 25, 8))::UBIGINT % 64 AS BIGINT)
                   AS bucket
        FROM t
    )
    SELECT bucket,
           count(*) AS n_tokens,
           count(DISTINCT tok) AS n_distinct_tokens,
           count(DISTINCT doc_id) AS n_docs
    FROM b
    GROUP BY bucket
    """,
)
def i_text_hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick featurization (Weinberger et al. 2009, the
    vocabulary-free bag-of-words every large-scale text classifier
    uses): token -> md5 bucket mod 64, with per-bucket mass, distinct
    token (collision) and document-frequency counts. Plan: scan-side
    tokenize + explode, then ONE aggregation whose output is bounded
    by the bucket count (64 rows at any corpus size) — the two
    distinct aggs expand the stream 2x but partial aggregation
    collapses to (bucket, tok)/(bucket, doc) cardinality before the
    shuffle. Portable md5 basis shared with the sketch family."""
    return hash_features_plan(table(spark, sf_dir, "documents"))


@register(
    "g_bitwise_funcs",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS key_and,
           o_orderkey | 4096 AS key_or,
           xor(o_orderkey, o_custkey) AS key_xor,
           ~o_orderkey AS key_not,
           CAST(bit_count(o_orderkey) AS INT) AS key_popcount,
           o_orderkey << 3 AS key_shl,
           o_orderkey >> 2 AS key_shr
    FROM orders
    """,
)
def g_bitwise_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar surface: and/or/xor/not, popcount, shifts — the
    bit-packing toolkit the sketch family (simhash packing, bloom
    words, HLL registers) builds on, exposed as first-class scalars.
    All operands non-negative and far below 2^60, so Spark and DuckDB
    64-bit signed semantics agree exactly. Pure projection: one scan,
    whole-stage codegen, no exchange."""
    o = table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("key_and"),
        k.bitwiseOR(F.lit(4096)).alias("key_or"),
        k.bitwiseXOR(F.col("o_custkey")).alias("key_xor"),
        F.bitwise_not(k).alias("key_not"),
        F.bit_count(k).alias("key_popcount"),
        F.shiftleft(k, 3).alias("key_shl"),
        F.shiftright(k, 2).alias("key_shr"),
    )


@register(
    "e_win_running_distinct",
    oracle="""
    SELECT user_id, event_id,
           CAST(count(DISTINCT event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS INT) AS n_distinct_types
    FROM events
    """,
)
def e_win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running distinct count per user over the event stream — "how
    many distinct behaviors has this user shown so far". Spark has no
    DISTINCT window aggregate; the engine states it as
    size(collect_set() OVER (... ROWS UNBOUNDED PRECEDING)) — one
    hash exchange on user_id + one sort, set state bounded by the
    event-type cardinality (tiny), NOT the frame length, so the
    running frame is safe at any per-user history length. Ordering is
    total (ts, event_id) so both engines see identical frames."""
    return running_distinct_plan(table(spark, sf_dir, "events"))


@register(
    "c_join_interval_grid",
    oracle="""
    WITH span AS (
        SELECT o.o_orderkey, o.o_totalprice,
               date_trunc('month', least(o.o_orderdate, min(l.l_shipdate)))
                   AS m0,
               date_trunc('month', greatest(o.o_orderdate, max(l.l_shipdate)))
                   AS m1
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderkey, o.o_totalprice, o.o_orderdate
    ),
    m AS (
        SELECT unnest(generate_series(m0, m1, INTERVAL 1 MONTH)) AS month,
               o_totalprice
        FROM span
    )
    SELECT month,
           count(*) AS n_inflight,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE), 4)
               AS sum_inflight_price
    FROM m
    GROUP BY month
    """,
)
def c_join_interval_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap against a time grid: each order is "in flight"
    from its order month to its last ship month; count open orders
    (and their value) per calendar month. The naive form is a non-equi
    range join (month BETWEEN start AND end — a BNLJ); the engine
    restates it as a BOUNDED explode of the months each interval spans
    followed by an equi-aggregation — shuffle keys become equi-join
    keys, expansion factor is the interval length in grid units (small
    and data-independent), and the plan scales linearly where the
    BNLJ is quadratic. Same bucket-expansion move as
    c_join_range_bucketed, here producing the grid rollup directly."""
    return interval_grid_plan(
        table(spark, sf_dir, "orders"), table(spark, sf_dir, "lineitem")
    )


@register(
    "d_agg_moments",
    # Skewness/kurtosis are scale-invariant, so they are computed on
    # integer "quantity cents" (exact BIGINT/decimal power sums), and
    # the double-precision derivation is the IDENTICAL expression tree
    # in both engines over identical exact integers — bit-equal
    # doubles, then round(4). Built-in skewness()/kurtosis() are NOT
    # used: Spark's are population moments, DuckDB's sample moments,
    # and both accumulate in streaming double order (non-portable).
    oracle="""
    WITH c AS (
        SELECT l_returnflag,
               CAST(round(l_quantity * 100) AS BIGINT) AS q
        FROM lineitem
    ),
    s AS (
        SELECT l_returnflag,
               count(*) AS n,
               sum(q) AS s1,
               sum(q * q) AS s2,
               sum(q * q * q) AS s3,
               sum((q * q) * (q * q)) AS s4
        FROM c
        GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           n,
           CAST(s1 AS BIGINT) AS sum_q_cents,
           round(CAST(s1 AS DOUBLE) / n, 4) AS mean_cents,
           round(CAST(s2 AS DOUBLE) / n
                 - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n), 4)
               AS var_cents,
           round(CASE WHEN CAST(s2 AS DOUBLE) / n
                           - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                           > 0 THEN
                 (CAST(s3 AS DOUBLE) / n
                  - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s2 AS DOUBLE) / n)
                  + 2 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                      * (CAST(s1 AS DOUBLE) / n))
                 / ((CAST(s2 AS DOUBLE) / n
                     - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                    * sqrt(CAST(s2 AS DOUBLE) / n
                           - (CAST(s1 AS DOUBLE) / n)
                               * (CAST(s1 AS DOUBLE) / n))) END, 4) + 0.0
               AS skewness,
           round(CASE WHEN CAST(s2 AS DOUBLE) / n
                           - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                           > 0 THEN
                 (CAST(s4 AS DOUBLE) / n
                  - 4 * (CAST(s1 AS DOUBLE) / n) * (CAST(s3 AS DOUBLE) / n)
                  + 6 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                      * (CAST(s2 AS DOUBLE) / n)
                  - 3 * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)
                      * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                 / ((CAST(s2 AS DOUBLE) / n
                     - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
                    * (CAST(s2 AS DOUBLE) / n
                       - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)))
                 - 3 END, 4) + 0.0
               AS kurtosis
    FROM s
    """,
)
def d_agg_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact population skewness and excess kurtosis per group from
    integer power sums: quantity -> exact cents (BIGINT), one
    map-side-combined aggregation producing Σq..Σq⁴, moments derived
    in closed form. The power sums commute and merge exactly (integer
    / decimal addition), so partial aggregation IS the sketch — the
    same one-pass two-phase shape as the sketch family, with zero
    accumulation-order sensitivity (contrast built-in skewness():
    streaming double updates whose result depends on row order).
    s2/s3/s4 accumulate in decimal(38,0) (Spark) / HUGEINT (DuckDB),
    both exact — see moment_power_sums for the per-sum overflow
    arithmetic."""
    s = moment_power_sums(table(spark, sf_dir, "lineitem"))
    n = F.col("n")
    m1 = F.col("s1").cast("double") / n
    m2 = F.col("s2").cast("double") / n
    m3 = F.col("s3").cast("double") / n
    m4 = F.col("s4").cast("double") / n
    var = m2 - m1 * m1
    # zero-variance guard: ANSI mode makes /0 an ERROR, not inf/NaN —
    # a constant group yields NULL moments in both engines instead
    skew = F.when(
        var > 0, (m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / (var * F.sqrt(var))
    )
    kurt = F.when(
        var > 0,
        (m4 - 4 * m1 * m3 + 6 * m1 * m1 * m2 - 3 * m1 * m1 * m1 * m1) / (var * var)
        - 3,
    )
    return s.select(
        "l_returnflag",
        "n",
        F.col("s1").cast("long").alias("sum_q_cents"),
        F.round(m1, 4).alias("mean_cents"),
        F.round(var, 4).alias("var_cents"),
        # `+ 0.0` normalizes a rounded -0.0 (skew/kurt can approach
        # zero from below; DuckDB's round keeps the sign, Spark's
        # drops it, and the driver hash stringifies — the r7
        # e_win_zscore class). No-op for every other value.
        (F.round(skew, 4) + F.lit(0.0)).alias("skewness"),
        (F.round(kurt, 4) + F.lit(0.0)).alias("kurtosis"),
    )


@register(
    "c_join_bloom_prefilter",
    # Exact by construction: the bloom admits false POSITIVES only,
    # and every survivor goes through the exact join — so the result
    # equals the plain join, which IS the oracle.
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_lines,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                               AS DECIMAL(30,6))) AS DOUBLE), 4) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 350000
    GROUP BY l_returnflag
    """,
)
def c_join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join reduction via an explicit broadcast Bloom filter —
    the runtime-row-filter pattern (Spark's own
    spark.sql.optimizer.runtime.bloomFilter, DPP's hash cousin) made
    portable and explicit, COST-DISPATCHED (VERDICT r6 item 1): the
    bloom detour only pays once the dim side exceeds the broadcast
    bound — below it the exact join broadcasts the dim anyway and the
    filter build + probe hashing is pure premium (measured ~2.5 s of
    30× at sf0.1) — so ``bloom_prefilter_plan`` routes on the same
    plan-stats machinery as similarity._dispatch_exact and skips the
    bloom for broadcastable dims. Both paths are RESULT-IDENTICAL
    (the bloom admits false positives only; the exact join removes
    them), so unlike the cosine dispatch this one is safe under
    misestimates and under forceDistributed. force="bloom"/"plain"
    pins a path (tests pin "bloom" to keep the reduction covered).
    See bloom_prefilter_plan for the scale shape."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    return bloom_prefilter_plan(o, li)


# Plan-stats bound for the bloom semi-join reduction: a dim side whose
# post-filter keys fit a broadcast hash relation gets BHJ'd by Spark
# regardless, so the runtime filter cannot remove a shuffle — only add
# its build. Sized an order above the default 10 MB
# autoBroadcastJoinThreshold because plan stats under-read post-filter
# outputs (rank.plan_size_bytes caveat) and a false "plain" is the
# cheap mistake here (both paths exact).
BLOOM_DIM_PLAIN_BYTES = 32 * 1024 * 1024


def bloom_prefilter_plan(
    orders: DataFrame, lineitem: DataFrame, force: str | None = None
) -> DataFrame:
    """The c_join_bloom_prefilter shape, df-parametrized.

    Bloom path: build a bloom over the SELECTIVE dim side's join keys
    (one aggregation; partial agg IS the filter union), ship the
    packed words to the probe scan (m_bits/32 longs — ~32 KB here),
    drop non-matching probe rows INSIDE the probe scan before the
    join shuffle, then let the exact join remove the bounded false
    positives. At 100 TB this is the difference between shuffling the
    full fact table and shuffling the ~2% that can match. The probe
    is a LEFT-SEMI join against the broadcast 1-row words relation
    with the membership test as the join condition — semi output
    carries only probe columns, so the 32 KB words array is never
    copied into result rows (a crossJoin+filter materializes it per
    joined row: measured +35% wall; a plan-literal array costs
    seconds of analysis per build: rejected, see
    sketch.bloom_might_contain). Probe hashes are the fast xxhash64
    family — engine-internal, never compared (sketch._bloom_bit; only
    d_agg_bloom's oracle-checked STATE needs portable md5). No false
    negatives by construction (tests/test_r6_queries.py). The final
    exact join carries NO broadcast hint on this path — past the
    dispatch bound the dim must not be forced driver-side; AQE picks
    the strategy from the REDUCED survivor side.

    Plain path (dim under BLOOM_DIM_PLAIN_BYTES): the straight
    broadcast join — exactly the oracle's plan; the bloom could not
    have removed a shuffle."""
    from sparkclif.operators.rank import plan_size_bytes, validate_force
    from sparkclif.operators.sketch import bloom_might_contain, bloom_words

    validate_force(force, {"plain", "bloom"})
    dim = orders.filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_totalprice") > 350000)
    ).select("o_orderkey")
    if force is None:
        size = plan_size_bytes(dim)
        # Long.MaxValue = Catalyst's no-stats sentinel: stay plain —
        # result-identical either way, and a stats-less toy relation
        # should not pay the detour (file sources always carry stats).
        if size >= (1 << 63) - 1:
            size = 0
        force = "plain" if size <= BLOOM_DIM_PLAIN_BYTES else "bloom"
    probe = lineitem.select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    if force == "bloom":
        words = bloom_words(dim, "o_orderkey")
        probe = probe.join(
            F.broadcast(words),
            bloom_might_contain(F.col("l_orderkey"), words["words"]),
            "left_semi",
        )
        joined = probe.join(dim, F.col("l_orderkey") == F.col("o_orderkey"))
    else:
        joined = probe.join(
            F.broadcast(dim), F.col("l_orderkey") == F.col("o_orderkey")
        )
    return joined.groupBy("l_returnflag").agg(
        F.count("*").alias("n_lines"),
        fixed_sum(
            F.col("l_extendedprice") * (1 - F.col("l_discount"))
        ).alias("revenue"),
    )
