"""Group D — aggregation (SURVEY.md §2.2 group D).

Reference ties: R22 (the status-dashboard pivot, state.py:145-179 — the
reference's flagship query), R19 (ordered grouped string agg,
state.py:116-134), R26 (set membership), R14 (map explode = unpivot).

Scale notes:
- Every groupBy here goes through partial (map-side) + final
  aggregation automatically — the shuffle carries only group keys +
  partial states, never raw rows.
- The pivot uses an EXPLICIT value list: Spark's pivot otherwise runs
  an extra distinct-collection job, and an unbounded value set is the
  reference's own pivot-explosion hazard (SURVEY.md §4.2). At 100 TB the
  value list comes from the catalog, not from a scan.
- approx_* sketches (rows-only check) are the 100 TB substitutes for
  exact distinct/percentile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkclif.numeric import fixed_sum
from sparkclif.io import table
from sparkclif.registry import register

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "d_agg_global",
    oracle="""
    SELECT count(*) AS n_rows,
           count(DISTINCT o_custkey) AS n_customers,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE), 4) AS sum_price,
           round(avg(o_totalprice), 4) AS avg_price,
           round(min(o_totalprice), 4) AS min_price,
           round(max(o_totalprice), 4) AS max_price
    FROM orders
    """,
)
def d_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped global aggregate (partial+final, single row out).

    Large-magnitude double sums accumulate in DECIMAL on both engines:
    float summation order differs (parallel partials vs sequential)
    and at ~1e10 magnitude the drift exceeds the round(4) grid —
    caught at sf0.1. Decimal addition is exact => order-independent."""
    o = table(spark, sf_dir, "orders")
    return o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_customers"),
        fixed_sum("o_totalprice").alias("sum_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.min("o_totalprice"), 4).alias("min_price"),
        F.round(F.max("o_totalprice"), 4).alias("max_price"),
    )


@register(
    "d_agg_groupby",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE), 4) AS sum_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE), 4) AS sum_base_price,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 4) AS sum_disc_price,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE), 4) AS sum_charge,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def d_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLAGSHIP (powers entry()): TPC-H Q1-style pricing summary —
    scan -> pushed filter -> hash agg (partial+final) -> sort. The
    grouped-rollup analog of the reference's status dashboard (R22)."""
    li = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # money sums: exact + order-independent via scaled-long
            # accumulation (sparkclif.numeric) — decimal-equal results
            # with the hot path fully inside whole-stage codegen
            fixed_sum("l_quantity").alias("sum_qty"),
            fixed_sum("l_extendedprice").alias("sum_base_price"),
            fixed_sum(disc_price).alias("sum_disc_price"),
            fixed_sum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "d_agg_distinct",
    oracle="""
    SELECT l_returnflag,
           count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(*) AS n_lines
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def d_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact multi-distinct aggregation — reference R26 set-membership
    semantics. Cost-dispatched shape (r7): Spark plans two distinct
    columns in one agg via Expand (every row replicated per distinct
    group — ONE scan, 3x shuffle rows), which is the right trade at
    100 TB where the scan dominates; below SMALL_INPUT_BYTES the
    expand's extra shuffle volume and merge constants cost more than
    simply scanning twice (two single-distinct aggs, each planned
    expand-free as a two-phase (group, key) dedup, joined on the tiny
    group key — measured 0.60 s vs 0.45 s warm at sf0.1).
    Result-identical by construction."""
    from sparkclif.operators.rank import SMALL_INPUT_BYTES, plan_size_bytes

    li = table(spark, sf_dir, "lineitem")
    if plan_size_bytes(li.select("l_returnflag", "l_partkey", "l_suppkey")) > (
        SMALL_INPUT_BYTES
    ):
        return li.groupBy("l_returnflag").agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.count("*").alias("n_lines"),
        )
    a = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.count("*").alias("n_lines"),
    )
    b = li.groupBy(F.col("l_returnflag").alias("__g")).agg(
        F.countDistinct("l_suppkey").alias("n_supps")
    )
    # Null-safe join key (ADVICE r7): a plain equi-join would drop a
    # NULL group (NULL != NULL), so the two dispatch paths could
    # diverge on a nullable group column. eqNullSafe keeps the paths
    # result-identical by construction.
    return a.join(b, a["l_returnflag"].eqNullSafe(b["__g"])).select(
        "l_returnflag", "n_parts", "n_supps", "n_lines"
    )


@register(
    "d_agg_collect_ordered",
    oracle="""
    SELECT c_nationkey,
           count(*) AS n_customers,
           string_agg(c_name, ' ' ORDER BY c_custkey) AS members
    FROM customer
    WHERE c_acctbal > 9000
    GROUP BY c_nationkey
    """,
)
def d_agg_collect_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ORDERED string aggregation — the POC-mention formatter
    of reference state.py:116-134 (R19): collect members per group,
    deterministic intra-group order, single-string render.
    sort_array(collect_list(struct(k, v))) makes the order explicit
    (the reference relied on dict insertion order)."""
    c = table(spark, sf_dir, "customer")
    members = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(F.struct("c_custkey", "c_name"))),
            lambda s: s["c_name"],
        ),
        " ",
    )
    return (
        c.filter(F.col("c_acctbal") > 9000)
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"), members.alias("members"))
    )


@register(
    "d_agg_pivot",
    oracle="""
    SELECT user_id,
           count(*) FILTER (WHERE event_type = 'click') AS "click",
           count(*) FILTER (WHERE event_type = 'error') AS "error",
           count(*) FILTER (WHERE event_type = 'purchase') AS "purchase",
           count(*) FILTER (WHERE event_type = 'signup') AS "signup",
           count(*) FILTER (WHERE event_type = 'view') AS "view"
    FROM events
    GROUP BY user_id
    """,
)
def d_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-TAB — the reference's flagship status_table pivot
    (state.py:145-179, R22): rows x columns matrix with a default for
    missing cells. Explicit pivot value list (no distinct-collection
    job; bounded columns — the reference's own 25-char truncation is
    the same hazard-control)."""
    ev = table(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", EVENT_TYPES)
        .count()
        .fillna(0, subset=EVENT_TYPES)
    )
    return out


@register(
    "d_agg_grouping_sets",
    oracle="""
    SELECT r_name, n_name,
           count(*) AS n_customers,
           round(CAST(sum(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE), 4) AS sum_acctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def d_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over region -> nation -> grand total."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            fixed_sum("c_acctbal").alias("sum_acctbal"),
        )
    )


@register(
    "d_agg_unpivot",
    oracle="""
    WITH wide AS (
        SELECT c_nationkey,
               CAST(count(*) AS DOUBLE) AS n_customers,
               sum(c_acctbal) AS sum_acctbal,
               avg(c_acctbal) AS avg_acctbal
        FROM customer GROUP BY c_nationkey
    )
    SELECT c_nationkey, 'n_customers' AS metric, round(n_customers, 4) AS val FROM wide
    UNION ALL
    SELECT c_nationkey, 'sum_acctbal' AS metric, round(sum_acctbal, 4) AS val FROM wide
    UNION ALL
    SELECT c_nationkey, 'avg_acctbal' AS metric, round(avg_acctbal, 4) AS val FROM wide
    """,
)
def d_agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Melt wide -> long (reference R14: legacy JSON map exploded to
    rows)."""
    c = table(spark, sf_dir, "customer")
    wide = c.groupBy("c_nationkey").agg(
        F.count("*").cast("double").alias("n_customers"),
        F.sum("c_acctbal").alias("sum_acctbal"),
        F.avg("c_acctbal").alias("avg_acctbal"),
    )
    return wide.unpivot(
        ids=["c_nationkey"],
        values=["n_customers", "sum_acctbal", "avg_acctbal"],
        variableColumnName="metric",
        valueColumnName="raw_val",
    ).select("c_nationkey", "metric", F.round("raw_val", 4).alias("val"))


@register("d_agg_approx", oracle=None)  # rows-only: sketches differ across engines
def d_agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — the 100 TB substitutes for exact distinct /
    percentile: HLL++ approx_count_distinct and GK percentile_approx."""
    li = table(spark, sf_dir, "lineitem")
    # one GK sketch serves both quantiles (array form) — two separate
    # percentile_approx calls would build and merge two sketches
    pcts = F.percentile_approx("l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)))
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.approx_count_distinct("l_orderkey").alias("approx_orders"),
            pcts.alias("__p"),
        )
        .select(
            "l_returnflag",
            "approx_parts",
            "approx_orders",
            F.round(F.element_at("__p", 1), 4).alias("p50_price"),
            F.round(F.element_at("__p", 2), 4).alias("p95_price"),
        )
    )


@register(
    "d_agg_percentile",
    # plan-cacheable: at any size the bench runs (<= SMALL_INPUT_BYTES
    # at sf0.1) the dispatcher picks the kernel path, a pure lazy
    # builder. The bracket path (mid-size inputs) samples + counts
    # eagerly at build — if bench ever runs at a scale that dispatches
    # it, flip this back to False so timings include that work.
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS p50_price,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price,
           round(median(l_discount), 4) AS med_discount
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def d_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT interpolated percentiles via the cost-dispatched operator
    (operators/rank.py): O(n) per-group quickselect kernel at small
    inputs, sample-bracket selection (two light scans, no full sort)
    at mid size, fully distributed two-phase rank at the largest. The
    built-in percentile() aggregate buffers every group value in one
    merge buffer (OOM at 100 TB group sizes) and a plain window rank
    runs one task per group; the big-input paths stay P×G-parallel."""
    from sparkclif.operators.rank import exact_percentiles

    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_discount"
    )
    return exact_percentiles(
        li,
        "l_returnflag",
        [
            ("l_extendedprice", 0.5, "p50_price"),
            ("l_extendedprice", 0.95, "p95_price"),
            ("l_discount", 0.5, "med_discount"),
        ],
    )


@register(
    "d_agg_histogram",
    # fixed 25-wide buckets clamped to [0, 19]: floor(value / 25) is
    # one IEEE division + floor, identical in both engines — no
    # data-dependent bounds, so the histogram is one pass.
    oracle="""
    SELECT CAST(least(floor(value / 25), 19) AS BIGINT) AS bucket,
           CAST(least(floor(value / 25), 19) * 25 AS BIGINT) AS lo_edge,
           count(*) AS n,
           round(CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def d_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (20 x 25-wide buckets, top bucket
    clamped): the one-pass profiling aggregate — bucket assignment is
    scan-side, the agg is map-side-combined, and no second pass
    computes data-dependent bounds (the 100 TB histogram discipline:
    fix the edges or sample them, never min/max-scan first)."""
    ev = table(spark, sf_dir, "events")
    bucket = F.least(F.floor(F.col("value") / 25), F.lit(19)).cast("long")
    return (
        ev.select(
            bucket.alias("bucket"),
            (bucket * 25).cast("long").alias("lo_edge"),
            "value",
        )
        .groupBy("bucket", "lo_edge")
        .agg(
            F.count("*").alias("n"),
            fixed_sum("value").alias("sum_value"),
        )
    )


@register(
    "d_agg_mode",
    # deterministic mode: most frequent o_orderstatus per priority,
    # ties to the lexicographically smallest status
    oracle="""
    WITH c AS (
        SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
        FROM orders GROUP BY 1, 2
    )
    SELECT o_orderpriority, o_orderstatus AS mode_status,
           cnt AS mode_count
    FROM c
    QUALIFY row_number() OVER (PARTITION BY o_orderpriority
                               ORDER BY cnt DESC, o_orderstatus) = 1
    """,
)
def d_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical mode per group, the scalable way: count-then-argmax
    (two map-side-combinable aggregations + a window over the tiny
    (group, value) relation) instead of the built-in mode(), which
    buffers a per-group value->count map in each aggregation buffer
    and breaks ties arbitrarily. Ties break to the smallest value —
    deterministic under any partitioning."""
    orders = table(spark, sf_dir, "orders")
    counts = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("cnt"), F.col("o_orderstatus")
    )
    return (
        counts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("mode_status"),
            F.col("cnt").alias("mode_count"),
        )
    )
