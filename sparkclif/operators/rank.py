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


# Below this input size the two-phase plan's extra stages cost more
# than the parallelism they buy; a single window rank per group is
# faster and memory-safe. Catalyst's optimized-plan size estimate is
# free (no job) — the same signal AQE uses for join selection.
SMALL_INPUT_BYTES = 256 * 1024 * 1024


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
    single-window formulation (one task per group — fine when groups
    fit a task); larger inputs take the two-phase distributed rank.
    ``force`` ("window" | "distributed") pins a path for tests."""
    if force is None:
        size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        force = "window" if size <= SMALL_INPUT_BYTES else "distributed"
    if force == "window":
        return _window_percentiles(df, group_col, specs, round_to)
    return _distributed_percentiles(df, group_col, specs, round_to)


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
    rank_col = {}
    for i, v in enumerate(value_cols):
        w = Window.partitionBy(group_col).orderBy(v)
        rank_col[v] = f"__rn{i}"
        out = out.withColumn(rank_col[v], F.row_number().over(w) - 1)
    out = out.withColumn("__n", F.count("*").over(Window.partitionBy(group_col)))

    def interp(q: float, v: str):
        pos = F.lit(q) * (F.col("__n") - 1).cast("double")
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
        vals = df.select(group_col, value_col)
        ranged = vals.repartitionByRange(p, F.col(group_col), F.col(value_col))
        seg = ranged.withColumn("__seg", F.spark_partition_id())

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
        ranked = (
            seg.withColumn("__local", F.row_number().over(w_local))
            .join(F.broadcast(offsets), ["__seg", group_col])
            .withColumn("__grank", F.col("__offset") + F.col("__local") - 1)
        )
        hits = ranked.join(
            F.broadcast(need), (ranked[group_col] == need[group_col]) & (ranked["__grank"] == need["__rank"])
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

    final = results[0]
    for r in results[1:]:
        final = final.join(r, group_col)
    return final.select(group_col, *[name for _, _, name in specs])
