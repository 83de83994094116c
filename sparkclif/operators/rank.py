"""Distributed exact interpolated percentiles (SURVEY.md §2.2
d_agg_percentile; §4.2 "exact top-k / percentile" row).

Why not the obvious formulations:
- ``percentile()`` aggregate: buffers EVERY group value into one merge
  buffer — driver-sized memory per group, OOM at 100 TB group sizes.
- ``row_number() over (partition by group order by value)``: one task
  per GROUP holds and sorts the whole group — a 3-group query runs on
  3 cores no matter how large the cluster (and a hot group straggles).

This operator is the textbook two-phase distributed rank:

1. ``repartitionByRange(P, group, value)`` — sampled range partitioner
   splits every group's values into P contiguous, ordered segments.
2. Per-(segment, group) counts (a tiny P×G table) → prefix-sum offsets
   per group → each segment knows the GLOBAL rank of its first row.
3. Local ``row_number`` within (segment, group) + offset = exact
   global rank, computed P×G-way parallel.
4. The interpolation boundary ranks (floor/ceil of q·(n-1) per group,
   from the same tiny count table) equi-join back against the ranked
   rows — only 2 rows per (group, quantile) survive to the final
   aggregate.

Shuffle budget: the range partition + the (segment, group) window
hash — two full-data exchanges, both P·G-parallel; everything else is
broadcast-sized. No driver-side value collection at any point.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


# Path thresholds on Catalyst's optimized-plan size estimate (free —
# no job; the same signal AQE uses for join selection).
# - below SMALL: per-group O(n) quickselect kernel (one shuffle, one
#   Arrow batch per group, numpy introselect — no full sort).
# - SMALL..LARGE: sample-bracket selection (2 light scans, no sort of
#   the full data, no per-group task; see _bracket_percentiles).
# - above LARGE: fully distributed two-phase rank (no driver-side
#   values at any point).
SMALL_INPUT_BYTES = 8 * 1024 * 1024
LARGE_INPUT_BYTES = 8 * 1024 * 1024 * 1024

# Threshold for materializing a multi-consumer intermediate relation
# (tokenized corpus / tf table). Below it, letting each consumer
# recompute the shared subtree costs one extra in-memory scan branch
# that Spark's ReusedExchange mostly dedups anyway; above it, the
# duplicate corpus pass dwarfs the write+read of the materialized
# relation. Distinct from SMALL_INPUT_BYTES because the trade is
# recompute-vs-IO, not task-granularity.
MATERIALIZE_INPUT_BYTES = 1 * 1024 * 1024 * 1024


def plan_size_bytes(df: "DataFrame") -> int:
    """Optimizer size estimate used by every cost dispatch in the
    repo (percentiles, prefix sums, segment dedup, exact cosine).
    The estimate can UNDER-read compressed or post-filter inputs; if
    that proves unreliable fleet-wide, set the session conf
    ``spark.sparkclif.forceDistributed=true`` and every dispatcher
    takes its distributed/scale path regardless of estimates (the
    per-call ``force=`` argument still pins individual calls).
    CAVEAT: for the exact-cosine variants the scale path is LSH —
    APPROXIMATE, so under forceDistributed their results change
    (documented at similarity._dispatch_exact); every other
    dispatcher's paths are result-identical. A caller that needs
    recall-1 under the fleet-wide override pins force="broadcast"."""
    if (
        df.sparkSession.conf.get("spark.sparkclif.forceDistributed", "false")
        == "true"
    ):
        return 1 << 62
    return int(
        str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )


def maybe_local_checkpoint(df: "DataFrame", size_of: "DataFrame | None" = None) -> "DataFrame":
    """Cost-dispatched ``localCheckpoint(eager=False)`` for shared
    intermediate relations: materialize only when the SOURCE input
    (``size_of``, typically the scanned corpus — its parquet stats are
    reliable where post-aggregation estimates are not) exceeds
    MATERIALIZE_INPUT_BYTES. ``spark.sparkclif.forceDistributed=true``
    forces the checkpoint path fleet-wide via plan_size_bytes. A
    stats-less source (Catalyst's Long.MaxValue sentinel) also takes
    the checkpoint path — the conservative default: a needless
    checkpoint costs one small write+read, a skipped one at corpus
    scale costs full extra passes."""
    src = df if size_of is None else size_of
    if plan_size_bytes(src) <= MATERIALIZE_INPUT_BYTES:
        return df
    return df.localCheckpoint(eager=False)


def validate_force(force: str | None, allowed: frozenset[str] | set[str]) -> None:
    """Reject a mistyped ``force`` instead of silently falling through
    to whichever path the if-chain treats as the default — a typo such
    as ``'widnow'`` must be an error, never a silent plan pin."""
    if force is not None and force not in allowed:
        raise ValueError(
            f"force must be one of {sorted(allowed)} or None, got {force!r}"
        )


def exact_percentiles(
    df: DataFrame,
    group_col: str,
    specs: list[tuple[str, float, str]],
    round_to: int = 4,
    force: str | None = None,
) -> DataFrame:
    """``specs``: (value_col, quantile, out_name) triples. Returns one
    row per group with each out_name = exact interpolated quantile
    (Spark/DuckDB ``quantile_cont`` semantics: v_lo·(hi-pos) +
    v_hi·(pos-lo) at pos = q·(n-1)).

    Cost-based dispatch: inputs under SMALL_INPUT_BYTES take the
    sorted-array formulation (one JVM exchange, no Python worker;
    groups fit a task by the size bound); mid-size inputs take
    sample-bracket selection (two light scans, no full sort); the
    largest take the two-phase distributed rank. Small-path bake-off
    on sf0.1 lineitem (warm best-of-3): built-in ``percentile()``
    1.86 s (TypedImperativeAggregate — every value buffered, no
    codegen), Arrow+numpy kernel 0.68 s, sorted-array 0.50 s (the
    Arrow round-trip and Python worker hop cost more than the JVM
    O(n log n) sort buys back at task-sized groups) — so "array" is
    the small default and "kernel" stays as a pinned alternative.
    ``force`` ("array" | "kernel" | "window" | "bracket" |
    "distributed") pins a path for tests."""
    validate_force(force, {"array", "kernel", "window", "bracket", "distributed"})
    # NaN -> NULL once, before any path: the five paths otherwise
    # disagree on NaN (Spark ordering treats NaN as the LARGEST value
    # in the array/window/distributed formulations, while the Arrow
    # kernel's pandas dropna conflates NaN with NULL and drops it) —
    # quantile semantics over NaN are undefined anyway, so "NaN is a
    # missing measurement" is pinned as the contract for every path.
    value_cols = sorted({v for v, _, _ in specs})
    df = df.select(
        F.col(group_col),
        *[
            F.when(F.isnan(F.col(v).cast("double")), F.lit(None))
            .otherwise(F.col(v))
            .alias(v)
            for v in value_cols
        ],
    )
    if force is None:
        size = plan_size_bytes(df)
        if size <= SMALL_INPUT_BYTES:
            force = "array"
        elif size <= LARGE_INPUT_BYTES:
            force = "bracket"
        else:
            force = "distributed"
    if force == "array":
        return _array_percentiles(df, group_col, specs, round_to)
    if force == "kernel":
        return _kernel_percentiles(df, group_col, specs, round_to)
    if force == "window":
        return _window_percentiles(df, group_col, specs, round_to)
    if force == "bracket":
        return _bracket_percentiles(df, group_col, specs, round_to)
    return _distributed_percentiles(df, group_col, specs, round_to)


def _array_percentiles(
    df: DataFrame,
    group_col: str,
    specs: list[tuple[str, float, str]],
    round_to: int,
) -> DataFrame:
    """Single-shuffle all-JVM selection (VERDICT r6 item 5): one hash
    exchange on the group key into ``sort_array(collect_list(v))`` per
    distinct value column, then closed-form quantile_cont
    interpolation via ``element_at`` — no Python worker, no Arrow
    hop, stays inside whole-stage codegen up to the agg. collect_list
    drops NULLs, matching quantile_cont / the other paths' dropna.
    Same small-input regime as the kernel path (the whole group
    buffers in one agg buffer — dispatched only below
    SMALL_INPUT_BYTES, where that is by definition task-sized)."""
    value_cols = sorted({v for v, _, _ in specs})
    proj = df.select(
        F.col(group_col), *[F.col(v).cast("double").alias(v) for v in value_cols]
    )
    arrs = proj.groupBy(group_col).agg(
        *[F.sort_array(F.collect_list(v)).alias(f"__a_{v}") for v in value_cols]
    )

    def interp(v: str, q: float) -> Column:
        a = F.col(f"__a_{v}")
        n = F.size(a)
        pos = F.lit(q) * (n - 1).cast("double")
        lo, hi = F.floor(pos), F.ceil(pos)
        lov = F.element_at(a, lo.cast("int") + 1)
        hiv = F.element_at(a, hi.cast("int") + 1)
        val = F.when(lo == hi, lov).otherwise(
            lov * (hi.cast("double") - pos) + hiv * (pos - lo.cast("double"))
        )
        # empty group (all values NULL) => NULL, as quantile_cont
        return F.round(F.when(n > 0, val), round_to)

    return arrs.select(
        group_col, *[interp(v, q).alias(name) for v, q, name in specs]
    )


def _kernel_percentiles(
    df: DataFrame,
    group_col: str,
    specs: list[tuple[str, float, str]],
    round_to: int,
) -> DataFrame:
    """Per-group O(n) selection: one hash shuffle on the group key,
    then each group arrives as Arrow batches to a numpy kernel that
    quickselects (``np.quantile`` = introselect + the same linear
    interpolation as quantile_cont). Beats the sort-based window
    formulation (O(n log n) and two sorts for two value columns) while
    keeping exactly one exchange. One task per group — the same
    small-input regime as the window path, dispatched only below
    SMALL_INPUT_BYTES."""
    import numpy as np
    import pandas as pd

    value_cols = sorted({v for v, _, _ in specs})
    names = [name for _, _, name in specs]
    proj = df.select(
        F.col(group_col), *[F.col(v).cast("double").alias(v) for v in value_cols]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        out = {group_col: [pdf[group_col].iloc[0]]}
        arrs = {v: pdf[v].dropna().to_numpy() for v in value_cols}
        for v, q, name in specs:
            a = arrs[v]
            out[name] = [float(np.quantile(a, q)) if len(a) else None]
        return pd.DataFrame(out)

    schema = ", ".join(
        [f"`{group_col}` {dict(df.dtypes)[group_col]}"]
        + [f"`{n}` double" for n in names]
    )
    res = proj.groupBy(group_col).applyInPandas(kernel, schema)
    return res.select(
        group_col, *[F.round(F.col(n), round_to).alias(n) for n in names]
    )


def _window_percentiles(
    df: DataFrame,
    group_col: str,
    specs: list[tuple[str, float, str]],
    round_to: int,
) -> DataFrame:
    """One window rank per distinct value column; one task per group.
    Right below SMALL_INPUT_BYTES; a straggler/OOM past it."""
    value_cols = sorted({v for v, _, _ in specs})
    out = df.select(group_col, *value_cols)
    wp = Window.partitionBy(group_col)
    rank_col, n_col = {}, {}
    for i, v in enumerate(value_cols):
        w = Window.partitionBy(group_col).orderBy(F.col(v).asc_nulls_first())
        rank_col[v] = f"__rn{i}"
        n_col[v] = f"__n{i}"
        # NULLs sort first; subtracting the per-group null count gives
        # non-null rows ranks 0..n-1 and null rows NEGATIVE ranks (so
        # the lo/hi probes below can never select them) — matching
        # quantile_cont / the kernel path's dropna semantics.
        nullcnt = F.count(F.when(F.col(v).isNull(), F.lit(1))).over(wp)
        out = out.withColumn(
            rank_col[v], F.row_number().over(w) - 1 - nullcnt
        ).withColumn(n_col[v], F.count(F.col(v)).over(wp))

    def interp(q: float, v: str):
        pos = F.lit(q) * (F.col(n_col[v]) - 1).cast("double")
        lo, hi = F.floor(pos), F.ceil(pos)
        rn = F.col(rank_col[v])
        lov = F.max(F.when(rn == lo, F.col(v)))
        hiv = F.max(F.when(rn == hi, F.col(v)))
        posv = F.max(pos)
        lod, hid = F.max(lo.cast("double")), F.max(hi.cast("double"))
        return F.round(
            F.when(lod == hid, lov).otherwise(
                lov * (hid - posv) + hiv * (posv - lod)
            ),
            round_to,
        )

    return out.groupBy(group_col).agg(
        *[interp(q, v).alias(name) for v, q, name in specs]
    ).select(group_col, *[name for _, _, name in specs])


def _bracket_percentiles(
    df: DataFrame,
    group_col: str,
    specs: list[tuple[str, float, str]],
    round_to: int,
    fraction: float = 0.02,
    seed: int = 42,
) -> DataFrame:
    """Exact percentiles by sample-guided selection — the distributed
    selection algorithm (the same idea Spark's own range partitioner
    uses for split points, applied to order statistics):

    1. Sample pass: a ~2% sample per group gives, via the DKW
       inequality, a value bracket [lo, hi] per (group, quantile) that
       contains the true boundary ranks with probability 1-1e-9.
    2. Count pass: ONE partial-aggregated scan computes per group the
       exact count below each bracket plus the (small) sorted list of
       in-bracket values. Exact global ranks of the bracket contents
       follow; the interpolation boundary values are read off directly.
    3. Any bracket miss (probability ~1e-9, or a degenerate sample)
       falls back to the single-window exact path.

    Both passes are map-side-combined aggregations — no full-data
    sort, no per-group single-task stage; wall-clock is two scans.
    Bracket width is O(n/sqrt(m)) rows, so the driver-held remainder
    stays small while group counts dwarf the sample. Past
    LARGE_INPUT_BYTES the dispatcher switches to the all-distributed
    rank instead (no driver-side values at any scale)."""
    import math

    spark = df.sparkSession
    value_cols = sorted({v for v, _, _ in specs})
    proj = df.select(
        F.col(group_col), *[F.col(v).cast("double").alias(v) for v in value_cols]
    )

    samp = proj.sample(fraction=fraction, seed=seed).toPandas()
    if len(samp) == 0:
        return _window_percentiles(df, group_col, specs, round_to)

    # per-group brackets; z = sqrt(ln(2/delta)/2), delta = 1e-9
    z = math.sqrt(math.log(2 / 1e-9) / 2.0)
    bracket_rows = []
    for g, gpdf in samp.groupby(group_col, sort=False):
        m = len(gpdf)
        row = {group_col: g}
        eps = z / math.sqrt(m) if m > 0 else 1.0
        for k, (v, q, _name) in enumerate(specs):
            vals = gpdf[v].dropna()
            if m < 1000 or len(vals) == 0:
                row[f"__lo{k}"], row[f"__hi{k}"] = float("-inf"), float("inf")
            else:
                row[f"__lo{k}"] = float(vals.quantile(max(0.0, q - eps), interpolation="lower"))
                row[f"__hi{k}"] = float(vals.quantile(min(1.0, q + eps), interpolation="higher"))
        bracket_rows.append(row)
    # pandas groupby drops NULL group keys (dropna default), so a
    # sample whose every row has a NULL key leaves no bracket rows —
    # fall back like the empty-sample case instead of letting
    # createDataFrame choke on an empty frame
    if not bracket_rows:
        return _window_percentiles(df, group_col, specs, round_to)
    import pandas as pd

    bdf = spark.createDataFrame(pd.DataFrame(bracket_rows))

    aggs = []
    for k, (v, _q, _name) in enumerate(specs):
        # a group the sample missed has NULL brackets after the left
        # join: coalesce to full range (such a group is tiny with
        # overwhelming probability, so collecting all of it is bounded
        # — the same rule as the under-sampled-group fallback above)
        lo = F.coalesce(F.col(f"__lo{k}"), F.lit(float("-inf")))
        hi = F.coalesce(F.col(f"__hi{k}"), F.lit(float("inf")))
        aggs.append(F.count(F.col(v)).alias(f"__n{k}"))
        aggs.append(
            F.sum((F.col(v) < lo).cast("long")).alias(f"__lt{k}")
        )
        aggs.append(
            F.sort_array(
                F.collect_list(F.when(F.col(v).between(lo, hi), F.col(v)))
            ).alias(f"__in{k}")
        )
    # toPandas, not collect(): the in-bracket arrays come back as one
    # Arrow batch (numpy) instead of row-pickled Python lists
    stats = (
        proj.join(F.broadcast(bdf), group_col, "left")
        .groupBy(group_col)
        .agg(*aggs)
        .toPandas()
    )

    out_rows = []
    for _, r in stats.iterrows():
        out = {group_col: r[group_col]}
        for k, (_v, q, name) in enumerate(specs):
            n = int(r[f"__n{k}"])
            if n == 0:
                # all-NULL value group: the quantile is NULL (every
                # other path's convention); without this the bracket
                # check below can never pass (lo_rank = -1) and ONE
                # such group used to silently re-run the whole
                # mid-size input through the single-task window path
                out[name] = None
                continue
            pos = q * (n - 1)
            lo_rank, hi_rank = math.floor(pos), math.ceil(pos)
            lt, vals = int(r[f"__lt{k}"]), r[f"__in{k}"]
            if not (lt <= lo_rank and lt + len(vals) - 1 >= hi_rank):
                return _window_percentiles(df, group_col, specs, round_to)
            v_lo = vals[lo_rank - lt]
            v_hi = vals[hi_rank - lt]
            out[name] = (
                v_lo
                if lo_rank == hi_rank
                else v_lo * (hi_rank - pos) + v_hi * (pos - lo_rank)
            )
        out_rows.append(out)

    names = [name for _, _, name in specs]
    result = spark.createDataFrame(
        pd.DataFrame(out_rows, columns=[group_col] + names)
    )
    # round JVM-side so rounding semantics match every other query
    return result.select(
        group_col, *[F.round(F.col(c), round_to).alias(c) for c in names]
    )


def _distributed_percentiles(
    df: DataFrame,
    group_col: str,
    specs: list[tuple[str, float, str]],
    round_to: int,
) -> DataFrame:
    spark = df.sparkSession
    p = spark.sparkContext.defaultParallelism
    value_cols = sorted({v for v, _, _ in specs})

    results = []
    for value_col in value_cols:
        sub = [(q, name) for v, q, name in specs if v == value_col]
        # drop NULL values up front: quantile_cont ignores them, and
        # leaving them in would shift counts and boundary ranks (the
        # kernel/bracket paths dropna too — dispatch must not change
        # the answer)
        vals = df.select(group_col, value_col).filter(
            F.col(value_col).isNotNull()
        )
        ranged = vals.repartitionByRange(p, F.col(group_col), F.col(value_col))
        seg = ranged.withColumn("__seg", F.spark_partition_id())
        # PIN the physical partitioning: the counts/offsets subtree and
        # the ranked subtree both hang off this exchange, and exchange
        # reuse is an optimization, not a guarantee — RangePartitioner
        # re-samples boundaries per materialization (rdd.id-seeded), so
        # two independent executions could disagree on __seg and the
        # offsets would describe the wrong layout (same hazard pinned
        # in sampling.pack_sequences).
        seg = seg.localCheckpoint(eager=True)

        counts = seg.groupBy("__seg", group_col).agg(F.count("*").alias("__c"))
        w_off = (
            Window.partitionBy(group_col)
            .orderBy("__seg")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offsets = counts.withColumn(
            "__offset", F.coalesce(F.sum("__c").over(w_off), F.lit(0))
        )
        totals = counts.groupBy(group_col).agg(F.sum("__c").alias("__n"))

        # boundary ranks per (group, quantile): tiny G×Q relation
        qdf = spark.createDataFrame([(q,) for q, _ in sub], "__q double")
        pos: Column = F.col("__q") * (F.col("__n") - 1).cast("double")
        bounds = (
            totals.crossJoin(F.broadcast(qdf))
            .withColumn("__pos", pos)
            .withColumn("__lo", F.floor("__pos"))
            .withColumn("__hi", F.ceil("__pos"))
        )
        need = bounds.select(
            group_col, "__q", "__pos", "__lo", "__hi", F.explode(F.array("__lo", "__hi")).alias("__rank")
        ).dropDuplicates([group_col, "__q", "__rank"])

        w_local = Window.partitionBy("__seg", group_col).orderBy(value_col)
        # null-safe group-key joins throughout (r8, the d_agg_distinct
        # ADVICE class): a NULL group key survives the kernel/window/
        # array paths, so it must survive this one too — a plain
        # equi-join would silently drop it (NULL != NULL) and the
        # dispatch paths would diverge on nullable group columns.
        off2 = offsets.select(
            F.col("__seg").alias("__seg_o"),
            F.col(group_col).alias("__g_o"),
            "__offset",
        )
        ranked = (
            seg.withColumn("__local", F.row_number().over(w_local))
            .join(
                F.broadcast(off2),
                (F.col("__seg") == F.col("__seg_o"))
                & F.col(group_col).eqNullSafe(F.col("__g_o")),
            )
            .withColumn("__grank", F.col("__offset") + F.col("__local") - 1)
        )
        hits = ranked.join(
            F.broadcast(need), ranked[group_col].eqNullSafe(need[group_col]) & (ranked["__grank"] == need["__rank"])
        ).select(
            ranked[group_col].alias(group_col),
            "__q",
            "__pos",
            "__lo",
            "__hi",
            "__rank",
            F.col(value_col).alias("__v"),
        )
        # per (group, q): pick lo/hi values, interpolate
        agg = hits.groupBy(group_col, "__q").agg(
            F.max(F.when(F.col("__rank") == F.col("__lo"), F.col("__v"))).alias("__lov"),
            F.max(F.when(F.col("__rank") == F.col("__hi"), F.col("__v"))).alias("__hiv"),
            F.max("__pos").alias("__posv"),
            F.max(F.col("__lo").cast("double")).alias("__lod"),
            F.max(F.col("__hi").cast("double")).alias("__hid"),
        )
        interp = F.when(F.col("__lod") == F.col("__hid"), F.col("__lov")).otherwise(
            F.col("__lov") * (F.col("__hid") - F.col("__posv"))
            + F.col("__hiv") * (F.col("__posv") - F.col("__lod"))
        )
        out = agg.select(group_col, "__q", F.round(interp, round_to).alias("__val"))
        # one output column per requested quantile of this value col
        pivoted = out.groupBy(group_col).agg(
            *[
                F.max(F.when(F.col("__q") == q, F.col("__val"))).alias(name)
                for q, name in sub
            ]
        )
        results.append(pivoted)

    # left-join every per-value result onto the full group-key set: a
    # group whose values are ALL NULL for some value column vanished at
    # that column's isNotNull filter, while the kernel/window paths
    # keep such groups with NULL percentiles — dispatch must never
    # change the row set (tiny G-row joins, broadcast-sized)
    final = df.select(group_col).distinct()
    for r in results:
        # null-safe: the NULL group's computed percentiles must attach
        # to its row, not be dropped to NULLs by NULL != NULL
        r2 = r.withColumnRenamed(group_col, "__g_r")
        final = final.join(
            r2, F.col(group_col).eqNullSafe(F.col("__g_r")), "left"
        ).drop("__g_r")
    return final.select(group_col, *[name for _, _, name in specs])
