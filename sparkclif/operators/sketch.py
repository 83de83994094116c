"""Deterministic, engine-portable sketches — Count-Min and
HyperLogLog built from the shared md5 basis (operators/hashing.py)
instead of engine-private hash families.

The point: sketches are usually consigned to rows-only checks because
every engine seeds its own hashes (``approx_count_distinct`` — see
d_agg_approx). But a sketch is DETERMINISTIC given its hash
functions; pinning the hash family to portable md5 makes the entire
register/counter state bit-identical on any engine — the sketch
itself gets an exact SQL oracle, not just its row count. Mergability
is inherited for free: both builds are plain aggregations (count /
max), so partial aggregation IS the sketch merge — the same combine
that unions per-partition sketches on a 1000-executor cluster.

- Count-Min (Cormode & Muthukrishnan 2005): depth × width counter
  matrix; row r hashes occurrences to ``md5('cms' || r || '|' || x)``
  columns. Point estimate = min over rows (not built here — it's a
  driver-side lookup against the matrix).
- HyperLogLog (Flajolet et al. 2007): 2^p registers, register =
  max over elements of rho(hash suffix) where rho = leading-zero
  count + 1. Duplicates cannot move a max, so the build needs NO
  distinct pass. The estimate's only float work is one literal
  multiply + one divide of an exact integer — IEEE-deterministic.

NULL items: md5(NULL) is NULL, so NULL rows fall out of every build
(HLL/bloom: the dense-register left join drops the NULL group; CMS:
a NULL cell key would surface as a (row, NULL) cell — callers feed
non-null item columns, which explode()-produced token streams
guarantee by construction).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparkclif.operators.hashing import md5_bits


def count_min(
    items: DataFrame,
    col: str = "item",
    depth: int = 4,
    width: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-Min counter matrix over the (multiset) ``col`` column:
    one row per (row, col) cell with its count; cells never touched
    are absent (a dense join with range(depth×width) would add only
    zeros). ONE map-side-combined aggregation over a depth×width key
    space — the explode to ``depth`` rows per occurrence collapses to
    ≤ depth×width rows per map task before the exchange.

    ``weight_col`` feeds PRE-AGGREGATED counts: pass a (value, count)
    relation instead of raw occurrences and each value contributes
    ``weight_col`` to its cells — identical matrix, but the hash/
    explode work runs over the vocabulary, not the stream (use this
    when a per-value count table already exists; see
    d_agg_countmin_topk).
    """
    cols = F.array(
        *[
            md5_bits(
                F.concat(F.lit(f"cms{r}|"), F.col(col).cast("string")), 25, 8
            )
            % width
            for r in range(depth)
        ]
    )
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        items.select(w.alias("__w"), F.posexplode(cols).alias("row", "col"))
        .groupBy(F.col("row").cast("int").alias("row"), F.col("col").cast("int").alias("col"))
        .agg(F.sum("__w").cast("long").alias("cnt"))
    )


def _hll_rho(v: Column, bits: int) -> Column:
    """rho = leading zeros of ``v`` in a ``bits``-wide field, + 1.
    bit-length via length(bin(v)) — identical in Spark and DuckDB;
    v = 0 (all zeros) maps to bits + 1 by convention."""
    return F.when(v == 0, F.lit(bits + 1)).otherwise(
        F.lit(bits) + 1 - F.length(F.bin(v))
    ).cast("int")


# 24 suffix bits (md5 hex chars [3, 9)) — the classic 32-bit HLL
# register geometry (8 index bits + 24 rho bits), so rho <= 25 and the
# integer harmonic sum Σ 2^(25 - M_j) is bounded by m·2^25: BIGINT-safe
# even when most registers are untouched (M = 0 -> term 2^25; a 60-bit
# suffix would put 2^61 per empty register and overflow the sum — hit
# in practice on the 31-token synthetic vocabulary). Saturation at
# rho = 25 only matters beyond ~2^25 distinct keys per register-bucket,
# where a 64-bit-hash HLL++ is the tool anyway.
HLL_SUFFIX_BITS = 24
HLL_ALPHA_64 = 0.709  # Flajolet et al. 2007, m = 64

# Flajolet et al. 2007 bias-correction constants per register count.
# Register selection slices the digest's FIRST 8 BITS (uniform only
# when 2^p divides 256), so p is bounded to [4, 8] — enforced, because
# p > 8 would leave registers >= 256 permanently zero and silently
# halve (or worse) every estimate.
_HLL_ALPHA = {16: 0.673, 32: 0.697, 64: HLL_ALPHA_64,
              128: 0.7213 / (1 + 1.079 / 128),
              256: 0.7213 / (1 + 1.079 / 256)}


def _hll_check_p(p: int) -> int:
    if not 4 <= p <= 8:
        raise ValueError(
            f"p must be in [4, 8] (register index uses the digest's first "
            f"8 bits; alpha constants cover m = 16..256), got {p}"
        )
    return 1 << p


def hll_sketch(
    items: DataFrame,
    col: str = "item",
    p: int = 6,
    weight_col: str | None = None,
) -> DataFrame:
    """HyperLogLog registers over ``col``: one row per register
    ``(reg, max_rho)``, all 2^p registers present (untouched ones 0).
    Build = scan-side hash split + ONE max() aggregation over a
    2^p key space (map-side combined; the combine IS the HLL merge).

    ``weight_col`` feeds PRE-AGGREGATED values: pass a (value, count)
    relation instead of raw occurrences — duplicates cannot move a
    max, so the registers are identical, but the md5/split work runs
    over the vocabulary, not the stream (the count_min weight_col
    discipline). The count itself does not affect any register; it is
    folded into the max as the LOW bits of an encoded long (rho·2^33 +
    min(count, 2^33−1): rho strictly dominates, so the decoded max is
    exactly max(rho)) purely so the optimizer cannot drop the
    pre-aggregation — a bare distinct under max() is removed by
    RemoveRedundantAggregates (max is duplicate-agnostic), which would
    silently put the md5 work back on the occurrence stream. Struct
    max was measured and rejected: it plans as SortAggregate (structs
    are not hash-aggregable); the encoded long keeps HashAggregate.
    (optimization r13)"""
    m = _hll_check_p(p)
    h = F.md5(F.concat(F.lit("hll|"), F.col(col).cast("string")))
    # first 8 bits pick the register (256 % 64 == 0 -> uniform);
    # the next 24 bits feed rho. NOTE: slice the digest string
    # directly — md5_bits() would md5 the digest a second time.
    idx = F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % m
    rho = _hll_rho(
        F.conv(F.substring(h, 3, 6), 16, 10).cast("long"), HLL_SUFFIX_BITS
    )
    if weight_col is None:
        touched = (
            items.select(idx.alias("reg"), rho.alias("__rho"))
            .groupBy("reg")
            .agg(F.max("__rho").alias("max_rho"))
        )
    else:
        cap = (1 << 33) - 1
        enc = rho.cast("long") * (1 << 33) + F.least(
            F.col(weight_col).cast("long"), F.lit(cap)
        )
        touched = (
            items.select(idx.alias("reg"), enc.alias("__enc"))
            .groupBy("reg")
            .agg(
                F.expr(f"max(__enc) div {1 << 33}")
                .cast("int")
                .alias("max_rho")
            )
        )
    spark = items.sparkSession
    # numPartitions=1: the dense side is 2^p <= 256 rows at ANY data
    # size — the default (defaultParallelism splits) made the final
    # join stage's task count track the core count for a fixed-size
    # relation (optimization r13)
    all_regs = spark.range(0, m, 1, 1).select(
        F.col("id").cast("long").alias("reg")
    )
    return all_regs.join(touched, "reg", "left").select(
        "reg", F.coalesce("max_rho", F.lit(0)).cast("int").alias("max_rho")
    )


def hll_estimate(registers: DataFrame, p: int = 6) -> DataFrame:
    """Single-row HLL raw estimate from a register table. The harmonic
    sum is EXACT integer arithmetic (Σ 2^(24+1-M_j) as BIGINT — every
    term a power of two ≤ 2^25), and the final α·m²·2^25 / S is one
    literal multiply + one IEEE division — bit-identical cross-engine.
    (Raw estimate only: the small-range linear-counting correction is
    a driver-side branch in practice and is deliberately not applied,
    so the oracle states one formula.)"""
    m = _hll_check_p(p)
    s = registers.agg(
        F.sum(
            # shiftleft() via expr: the DataFrame helper only accepts a
            # literal int bit count, not a column
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_SUFFIX_BITS + 1} - max_rho)")
        )
        .cast("long")
        .alias("harm_sum_e25")
    )
    est = (
        # alpha tracks m (the old code pinned the m=64 constant for
        # every p — a systematic ~1-5% bias at any other p)
        F.lit(float(_HLL_ALPHA[m]))
        * F.lit(float(m * m))
        * F.lit(float(1 << (HLL_SUFFIX_BITS + 1)))
        / F.col("harm_sum_e25").cast("double")
    )
    return s.select(
        "harm_sum_e25", F.round(est, 4).alias("est_distinct")
    )


def _bloom_bit(value: Column, j: int, m_bits: "int | Column", fast: bool) -> Column:
    """Bit index of hash j for ``value`` — the ONE definition of the
    bloom hash family, shared by build and probe. Two families:

    - portable (default): md5 bits, reproducible in the DuckDB oracle
      — d_agg_bloom's hash-checked filter STATE depends on it.
    - fast: xxhash64 (JVM-native, ~10× cheaper/row). For engine-
      internal filters whose OUTPUT is never compared (the semi-join
      reduction: only the post-exact-join result is oracle-checked),
      paying 4 md5-of-string per probe row is pure waste — at 100 TB
      the probe side IS the fact table.

    TYPE NORMALIZATION (fast family): xxhash64 is TYPE-sensitive —
    int 5 and bigint 5 hash differently — while the md5 family
    normalizes through cast('string'). The fast family therefore
    normalizes the key through ``cast('long')`` BY CONSTRUCTION, so
    an int build side and a bigint probe side hash identically and
    the no-false-negatives guarantee holds without a caller-side
    contract. Consequence: the fast family is for INTEGRAL keys (the
    semi-join-reduction use case — surrogate join keys); a
    non-numeric key errors loudly on the cast under ANSI mode
    instead of silently dropping rows — use fast=False for string
    keys (ADVICE r6: contract-by-construction, not by caller).
    """
    m = F.lit(m_bits) if isinstance(m_bits, int) else m_bits
    if fast:
        h = F.xxhash64(F.lit(j), value.cast("long"))
        # xxhash64 spans the full signed range; pmod folds it positive
        return F.pmod(h, m)
    return (
        md5_bits(F.concat(F.lit(f"bloom{j}|"), value.cast("string")), 25, 8)
        % m
    )


def bloom_filter(
    items: DataFrame,
    col: str = "item",
    m_bits: int = 512,
    k: int = 4,
    fast: bool = False,
) -> DataFrame:
    """Bloom filter (Bloom 1970) over the distinct values of ``col``,
    packed into 32-bit words: one row per word ``(word, bits_value)``,
    all ``m_bits/32`` words present (untouched 0). Words are 32-bit —
    packing bit 63 of a 64-bit word as 2^63 would overflow/wrap signed
    BIGINT differently per engine; 2^31 stays exact everywhere.

    Build: scan-side k-hash explode -> per-word ``bit_or`` of exact
    powers of two — OR is idempotent, so duplicate (word, bit) rows
    need NO distinct pass and the whole build is ONE exchange over the
    tiny word key space with map-side combine; like the other
    sketches, partial aggregation is the filter union. (The earlier
    shape — dropDuplicates then sum — produced the identical state
    through two exchanges; bit_or deletes one.)
    """
    if m_bits <= 0 or m_bits % 32:
        # a ragged tail word would be silently DROPPED by the dense
        # word join below (bits >= 32*(m_bits//32) vanish), and a
        # probe recomputing m_bits from the word count would hash to
        # different positions than the build — false negatives, the
        # one thing a Bloom filter must never produce
        raise ValueError(f"m_bits must be a positive multiple of 32, got {m_bits}")
    n_words = m_bits // 32
    bits = F.array(*[_bloom_bit(F.col(col), j, m_bits, fast) for j in range(k)])
    wb = items.select(F.explode(bits).alias("bit")).select(
        (F.col("bit") / 32).cast("long").alias("word"),
        (F.col("bit") % 32).cast("int").alias("__b"),
    )
    packed = wb.groupBy("word").agg(
        F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), __b)"))
        .cast("long")
        .alias("bits_value")
    )
    spark = items.sparkSession
    # numPartitions=1: fixed m_bits/32-row dense side (the hll_sketch
    # range note — optimization r13)
    all_words = spark.range(0, n_words, 1, 1).select(
        F.col("id").cast("long").alias("word")
    )
    return all_words.join(packed, "word", "left").select(
        "word", F.coalesce("bits_value", F.lit(0)).cast("long").alias("bits_value")
    )


def bloom_words(
    items: DataFrame,
    col: str,
    m_bits: int = 131072,
    k: int = 4,
    fast: bool = True,
) -> DataFrame:
    """``bloom_filter`` packed into ONE row holding the whole filter as
    ``words: array<long>`` (index i = word i) — the broadcastable form
    a semi-join reduction needs. Size m_bits to the build side's
    cardinality: fp = (1 - e^(-k/b))^k at b bits/key, so at k=4,
    b=14 gives ~0.4% and b=20 gives ~0.1%; the array is m_bits/32
    longs, so even a 10M-key filter at b=20 broadcasts ~25 MB.
    Defaults to the fast xxhash64 family (engine-internal use; pass
    fast=False for the oracle-portable md5 family — must match the
    ``bloom_might_contain`` probe)."""
    packed = bloom_filter(items, col, m_bits=m_bits, k=k, fast=fast)
    return packed.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("word", "bits_value"))),
            lambda s: s["bits_value"],
        ).alias("words")
    )


def bloom_might_contain(
    probe: Column,
    words: Column,
    k: int = 4,
    fast: bool = True,
) -> Column:
    """Membership test against ``bloom_words`` output, scan-side: true
    iff all k bits for ``probe`` are set. ``m_bits`` is derived
    STRUCTURALLY from the filter itself (``size(words) * 32``), so the
    build/probe width contract holds by construction and cannot be
    mismatched (ADVICE r6); ``fast``/``k`` must still match the
    build's (key dtype no longer matters — the fast family normalizes
    through cast('long'), see ``_bloom_bit``). Then a value present in
    the build can NEVER test false (no false negatives); false
    positives are bounded by the m/n/k sizing and must be dropped by
    an exact join downstream.

    Feed ``words`` as a broadcast relation column — ideally as the
    condition of a left-semi join, which never materializes the wide
    joined row. A plan-LITERAL words array was prototyped and
    rejected: analyzing a 4096-element CreateArray literal costs
    seconds per plan build."""
    # ONE reference to ``words`` in the whole expression tree: the k
    # bit positions collect into an array and a single forall lambda
    # tests them — the naive k-way AND embedded ``words`` k times,
    # quadrupling plan/codegen size with a plan-literal filter. The
    # words array is expr.bind-bound OUTSIDE the lambda: Spark does no
    # CSE inside HOF lambdas, so a bare 4096-element literal referenced
    # there is REBUILT per element per row (measured 6-38 s at sf0.1 vs
    # ~0.4 s bound — the round-4 winnowing recompute class). m_bits is
    # size(wv)*32 on the BOUND value — an O(1) array-header read.
    from sparkclif.operators.expr import bind

    def test_all(wv: Column) -> Column:
        m_bits = F.size(wv).cast("long") * 32
        bits = F.array(*[_bloom_bit(probe, j, m_bits, fast) for j in range(k)])
        return F.forall(
            bits,
            lambda bit: (
                F.element_at(wv, (bit / 32).cast("int") + 1)
                # shiftright() takes only a literal shift; build the
                # mask as 2^(bit%32) — double pow is exact through 2^31
                .bitwiseAND(F.pow(F.lit(2.0), (bit % 32).cast("int")).cast("long"))
                != 0
            ),
        )

    return bind(words, test_all)
