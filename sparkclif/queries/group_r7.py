"""Round-7 surface additions (SURVEY.md §2.2 growth set): weighted
order statistics, time-bucket rollups, runtime partition pruning, and
rolling anomaly scoring — the analytics shapes the earlier groups
didn't yet exercise.

- ``d_agg_weighted_median`` — exact weighted median per group via
  cumulative-weight selection (the weighted generalization of the
  d_agg_percentile family).
- ``e_resample_ohlc``       — 5-minute OHLC bars per event type (the
  hypertable/timeseries rollup: first/last by total event order,
  min/max/count per bucket).
- ``c_join_dpp``            — dynamic partition pruning: a hive-
  partitioned fact joined to a runtime-filtered dim scans ONLY the
  matching partition directories (Spark's DPP subquery filter).
- ``e_win_zscore``          — rolling z-score anomaly flag per user
  over the trailing 20 events, computed from exact integer power
  sums so the float result is bit-identical cross-engine.
- ``g_url_funcs``           — URL parsing scalar surface
  (``parse_url`` host/path/query/param) over synthesized URLs.
- ``i_graph_pagerank``      — fixed-iteration PageRank in an exact
  integer basis (the rare iterative graph op with a full exact-SQL
  oracle — unrolled CTEs; operators/graph.pagerank_int).
- ``a_sink_compact``        — small-file compaction: fragment, then
  rewrite with data-sized file count via shuffle-free coalesce; the
  oracle verifies the cycle is lossless.

Reference ties: the reference's dashboard pivots and status rollups
(app.py R12-R22) are fixed-grid aggregations; these queries extend the
same rollup semantics to weighted/ordered/time-bucketed/iterative
variants per SURVEY §2.2's declared analytics scope. All seven are
exact-oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkclif.io import table
from sparkclif.numeric import fixed_sum
from sparkclif.registry import register
from sparkclif.session import tmp_dir

# ---------------------------------------------------------------------
# df-parametrized plan builders — the ONE definition of each growth-set
# shape, shared by the registered queries below and by the scale probes
# (probes/scale_stress.py). A probe that re-declared the plan inline
# would silently keep measuring the old shape after a query fix.


def weighted_median_plan(li: DataFrame, force: str | None = None) -> DataFrame:
    """Cost-dispatched exact weighted median (round 9, the
    d_agg_percentile "array" move — VERDICT r8 item 2):

    - SMALL (pruned input under rank.SMALL_INPUT_BYTES): ONE exchange
      — ``sort_array(collect_list(struct(v, w)))`` per group, then a
      single JVM ``aggregate()`` fold over the sorted array computes
      the running weight, the distinct-value count, AND the
      half-total boundary value in one codegen pass (no window, no
      second/third exchange; measured 1.02 s -> 0.54 s warm at sf0.1
      against an interleaved A/B of the window plan). The group's
      full value array in one buffer is exactly what the size bound
      certifies is affordable.
    - LARGE: the r7 shape — collapse to the per-(group, value) weight
      table FIRST (map-side-combined agg; at 100 TB the fact stream
      compresses to the distinct-value table before any ordered
      work), then one window cumsum picks the boundary row. No
      buffer ever holds a group's value set.

    Result-identical BY construction: the fold's crossing test
    (2·cw_after >= tw AND 2·cw_before < tw) is the window predicate
    with cw_before = cw - w restated over RAW rows — running weight
    crosses the half-total inside a run of equal v at the same v the
    merged (g, v) table crosses it, and sort_array's (v, w) struct
    order only permutes WITHIN such runs. Exact integer weights both
    paths; values compared, never summed. ``force`` ("array" |
    "window") pins a path for tests."""
    from sparkclif.operators.rank import (
        SMALL_INPUT_BYTES,
        plan_size_bytes,
        validate_force,
    )

    validate_force(force, {"array", "window"})
    if force is None:
        pruned = li.select("l_returnflag", "l_extendedprice", "l_quantity")
        force = (
            "array" if plan_size_bytes(pruned) <= SMALL_INPUT_BYTES else "window"
        )
    if force == "array":
        rows = li.select(
            F.col("l_returnflag").alias("g"),
            F.struct(
                F.col("l_extendedprice").alias("v"),
                F.round("l_quantity").cast("long").alias("w"),
            ).alias("s"),
        )
        g = rows.groupBy("g").agg(F.sort_array(F.collect_list("s")).alias("a"))
        tw = F.aggregate(
            "a", F.lit(0).cast("long"), lambda acc, x: acc + F.coalesce(x["w"], F.lit(0))
        )
        g = g.withColumn("tw", tw)
        init = F.named_struct(
            F.lit("cw"), F.lit(0).cast("long"),
            F.lit("nv"), F.lit(0).cast("long"),
            F.lit("pv"), F.lit(None).cast("double"),
            F.lit("med"), F.lit(None).cast("double"),
        )

        def step(acc, x):
            ncw = acc["cw"] + F.coalesce(x["w"], F.lit(0))
            # null-SAFE distinct count: nv == 0 marks the first row
            # (pv.isNull() cannot — a NULL v stores pv = NULL, and the
            # next NULL-v row must NOT count again; the window path
            # groups (g, NULL) once, and the dispatcher may never
            # change the answer — review r9)
            is_new = (acc["nv"] == F.lit(0)) | ~x["v"].eqNullSafe(acc["pv"])
            med2 = F.when(acc["med"].isNotNull(), acc["med"]).when(
                (2 * ncw >= F.col("tw")) & (2 * acc["cw"] < F.col("tw")), x["v"]
            )
            return F.named_struct(
                F.lit("cw"), ncw,
                F.lit("nv"), acc["nv"] + is_new.cast("long"),
                F.lit("pv"), x["v"].cast("double"),
                F.lit("med"), med2,
            )

        fold = F.aggregate("a", init, step)
        return g.select(
            F.col("g").alias("l_returnflag"),
            F.col("tw").alias("total_w"),
            fold["nv"].alias("n_values"),
            F.round(fold["med"], 4).alias("wmedian_price"),
        )
    pv = (
        li.groupBy(
            F.col("l_returnflag").alias("g"), F.col("l_extendedprice").alias("v")
        )
        .agg(
            # NULL weights coalesce to 0 per row, matching the array
            # path's fold (ADVICE r9: an all-NULL-quantity group must
            # yield total_w = 0 on BOTH dispatch paths, not NULL on
            # this one — the dispatcher may never change the answer).
            F.sum(F.coalesce(F.round("l_quantity").cast("long"), F.lit(0)))
            .cast("long")
            .alias("w")
        )
    )
    w_cum = Window.partitionBy("g").orderBy("v")
    w_all = Window.partitionBy("g")
    c = pv.withColumn("cw", F.sum("w").over(w_cum)).withColumn(
        "tw", F.sum("w").over(w_all)
    )
    picked = F.when(
        (2 * F.col("cw") >= F.col("tw"))
        & (2 * (F.col("cw") - F.col("w")) < F.col("tw")),
        F.col("v"),
    )
    return c.groupBy(F.col("g").alias("l_returnflag")).agg(
        F.max("tw").cast("long").alias("total_w"),
        F.count("*").cast("long").alias("n_values"),
        F.round(F.min(picked), 4).alias("wmedian_price"),
    )


def ohlc_plan(ev: DataFrame) -> DataFrame:
    key = F.struct(F.col("ts"), F.col("event_id"))
    bucket = F.timestamp_micros(
        (F.unix_micros("ts") / 300_000_000).cast("long") * 300_000_000
    )
    return (
        ev.select("event_type", bucket.alias("bucket"), "value", key.alias("__k"))
        .groupBy("event_type", "bucket")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.round(F.min_by("value", F.col("__k")), 4).alias("open"),
            F.round(F.max("value"), 4).alias("high"),
            F.round(F.min("value"), 4).alias("low"),
            F.round(F.max_by("value", F.col("__k")), 4).alias("close"),
            fixed_sum("value").alias("sum_value"),
        )
    )


def zscore_plan(ev: DataFrame) -> DataFrame:
    q = F.floor(F.col("value") * 10000 + F.lit(0.5)).cast("long")
    base = ev.select("event_id", "user_id", "ts", q.alias("q"))
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, 0)
    )
    w = base.select(
        "event_id",
        "user_id",
        "q",
        F.count("*").over(win).alias("n_window"),
        F.sum("q").over(win).alias("s1"),
        F.sum(F.col("q") * F.col("q")).over(win).alias("s2"),
    )
    n, s1, s2 = F.col("n_window"), F.col("s1"), F.col("s2")
    det = n * s2 - s1 * s1
    # Population z-score: (q - mean) / sigma_pop with mean = s1/n and
    # sigma_pop = sqrt(det)/n, i.e. z = (n*q - s1)/sqrt(det) — the
    # all-integer-numerator form. (Round 7 shipped a sqrt(n)-damped
    # variant; fixed per ADVICE r7.) The trailing `+ 0.0` normalizes
    # IEEE -0.0 to +0.0 after the round — a no-op for every other
    # value — so both engines stringify a zero z identically.
    z = (n * F.col("q") - s1) / F.sqrt(det.cast("double"))
    return w.select(
        "event_id",
        "user_id",
        n.cast("long").alias("n_window"),
        (F.round(F.when(det > 0, z), 4) + F.lit(0.0)).alias("z"),
        F.when(det > 0, (F.abs(z) > 2.0).cast("long"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("flagged"),
    )


@register(
    "d_agg_weighted_median",
    # Lower weighted median: the smallest value whose running weight
    # (ascending value order) reaches half the total. Stated over the
    # per-(group, value) weight table so ties in `v` cannot reorder
    # between engines; weights are exact BIGINTs.
    oracle="""
    WITH pv AS (
        SELECT l_returnflag AS g, l_extendedprice AS v,
               CAST(sum(COALESCE(CAST(round(l_quantity) AS BIGINT), 0))
                    AS BIGINT) AS w
        FROM lineitem GROUP BY 1, 2
    ),
    c AS (
        SELECT g, v, w,
               sum(w) OVER (PARTITION BY g ORDER BY v) AS cw,
               sum(w) OVER (PARTITION BY g) AS tw
        FROM pv
    )
    SELECT g AS l_returnflag,
           CAST(max(tw) AS BIGINT) AS total_w,
           CAST(count(*) AS BIGINT) AS n_values,
           round(min(CASE WHEN 2 * cw >= tw AND 2 * (cw - w) < tw
                          THEN v END), 4) AS wmedian_price
    FROM c GROUP BY g
    """,
)
def d_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median (quantity-weighted price) per return
    flag — the weighted order statistic sampling/mixing pipelines use
    for budget split points. Cost-dispatched since round 9 (see
    weighted_median_plan): small inputs take a one-exchange sorted-
    array fold (the d_agg_percentile "array" move; 1.02 s -> 0.54 s
    warm at sf0.1), large inputs the r7 (g, v)-compress + window
    cumsum shape where no buffer ever holds a group's value set. The
    selection predicate (2*cw >= tw AND 2*(cw-w) < tw) is exact
    integer arithmetic on both paths; values are compared and
    selected, never summed — no float accumulation anywhere. (The r8
    probe that measured a sorted-array variant "equal within noise"
    timed a 2-exchange formulation that kept the (g, v) pre-agg; the
    r9 fold drops that exchange AND the window — that is where the
    2x comes from.)"""
    return weighted_median_plan(table(spark, sf_dir, "lineitem"))


@register(
    "e_resample_ohlc",
    # Bucket = 5-minute epoch-microsecond floor (exact integer
    # arithmetic, identical both engines); open/close pick the value
    # at the min/max (ts, event_id) — a TOTAL order, stated as
    # row_number boundaries (this DuckDB's arg_min/arg_max cannot take
    # a composite key), the exact analogue of Spark's min_by/max_by
    # over the struct ordering.
    oracle="""
    WITH o AS (
        SELECT event_type,
               make_timestamp((epoch_us(ts) // 300000000) * 300000000)
                   AS bucket,
               value,
               row_number() OVER (
                   PARTITION BY event_type, epoch_us(ts) // 300000000
                   ORDER BY ts, event_id) AS rn_a,
               row_number() OVER (
                   PARTITION BY event_type, epoch_us(ts) // 300000000
                   ORDER BY ts DESC, event_id DESC) AS rn_d
        FROM events
    )
    SELECT event_type, bucket,
           CAST(count(*) AS BIGINT) AS n_events,
           round(max(CASE WHEN rn_a = 1 THEN value END), 4) AS open,
           round(max(value), 4) AS high,
           round(min(value), 4) AS low,
           round(max(CASE WHEN rn_d = 1 THEN value END), 4) AS close,
           round(CAST(sum(CAST(value AS DECIMAL(30,6))) AS DOUBLE), 4)
               AS sum_value
    FROM o
    GROUP BY 1, 2
    """,
)
def e_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timeseries resample to 5-minute OHLC bars per event type — the
    hypertable rollup (continuous-aggregate shape): open/close are the
    first/last values by the (ts, event_id) TOTAL order inside each
    bucket, high/low/count/sum close the bar. One map-side-combinable
    aggregation: min_by/max_by partials carry a single (value, key)
    pair each, so the shuffle is bars × types rows at any history
    length — this is exactly the incremental shape a streaming
    continuous aggregate maintains (h_tumbling is the readStream
    variant of the same plan). The bucket is epoch-microsecond integer
    arithmetic (no timezone, no calendar) so both engines bucket
    identically."""
    return ohlc_plan(table(spark, sf_dir, "events"))


@register(
    "c_join_dpp",
    cache_plan=False,  # impure build: writes the partitioned fact
    # The oracle is the unpruned logical join — DPP is a pure
    # execution-time scan reduction, results identical by definition.
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE), 4)
               AS sum_price
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o_orderpriority
    """,
)
def c_join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: a hive-partitioned fact joined to a
    dim filtered at RUNTIME scans only the matching partition
    directories — Spark plants a DPP subquery filter
    (``dynamicpruning#N``) on the fact's partition column, built from
    the dim side's join keys during execution. This is the mechanism
    that makes selective dim-filtered star joins cheap on 100 TB
    hive-layout facts: static pruning (a_sink_partitioned) needs the
    literal in the query; DPP prunes when the qualifying partitions
    are only knowable from another table. The fact here is orders
    partitioned by priority (written once to scratch, reused across
    runs via overwrite); the dim is the filtered distinct-priority
    relation. tests/test_r7_queries.py asserts the pruning expression
    sits INSIDE the scan's PartitionFilters (directory-level pruning,
    not a post-scan filter) and that the pruned result equals the
    unpruned join."""
    out = tmp_dir() + "/dpp_orders.parquet"
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    import os

    # idempotent scratch build (same input -> same layout); the
    # marker encodes the source dir so sf changes rebuild
    marker = os.path.join(out, "_built_for.txt")
    want = f"{sf_dir}\n"
    built = False
    try:
        with open(marker) as fh:
            built = fh.read() == want
    except OSError:
        pass
    if not built:
        (
            o.repartition(8, "o_orderpriority", F.pmod(F.col("o_orderkey"), F.lit(2)))
            .write.option("compression", "uncompressed")
            .partitionBy("o_orderpriority")
            .mode("overwrite")
            .parquet(out)
        )
        with open(marker, "w") as fh:
            fh.write(want)
    fact = spark.read.parquet(out)
    dim = (
        table(spark, sf_dir, "orders")
        .select("o_orderpriority")
        .distinct()
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .select(F.col("o_orderpriority").alias("p"))
    )
    return (
        fact.join(F.broadcast(dim), fact["o_orderpriority"] == dim["p"])
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            fixed_sum("o_totalprice").alias("sum_price"),
        )
    )


@register(
    "e_win_zscore",
    # Exact integer power sums over the trailing-20 frame; the float
    # mean/var/z are computed with the IDENTICAL expression tree in
    # both engines (IEEE ops on identical inputs are bit-identical),
    # rounded at 4dp. q = floor(value*10000 + 0.5) — one multiply +
    # floor, exact both sides (value >= 0 in the testbed; the oracle
    # states the same one-sided form).
    oracle="""
    WITH q AS (
        SELECT event_id, user_id, ts,
               CAST(floor(value * 10000 + 0.5) AS BIGINT) AS q
        FROM events
    ),
    w AS (
        SELECT event_id, user_id, q,
               count(*) OVER win AS n_window,
               sum(q) OVER win AS s1,
               sum(q * q) OVER win AS s2
        FROM q
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, CAST(n_window AS BIGINT) AS n_window,
           round(CASE WHEN n_window * s2 - s1 * s1 > 0
                      THEN (n_window * q - s1) /
                           sqrt(CAST(n_window * s2 - s1 * s1 AS DOUBLE))
                 END, 4) + 0.0 AS z,
           CAST(CASE WHEN n_window * s2 - s1 * s1 > 0
                      AND abs((n_window * q - s1) /
                              sqrt(CAST(n_window * s2 - s1 * s1 AS DOUBLE)))
                          > 2.0
                     THEN 1 ELSE 0 END AS BIGINT) AS flagged
    FROM w
    """,
)
def e_win_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flag per user over the trailing 20
    events — the streaming-adjacent outlier detector every metrics
    pipeline runs. The frame aggregates are EXACT integer power sums
    (q, q², the d_agg_moments basis) so the shuffled state is
    order-independent; mean/variance/z derive from them in closed
    form with the identical IEEE expression both engines evaluate —
    the population z-score z = (n·q − s1) / sqrt(n·s2 − s1²), the
    all-integer-numerator form that avoids any engine-ordered float
    accumulation (equals (q − mean)/σ_pop exactly). The rounded z is
    normalized with `+ 0.0` so a −0.0 cannot stringify differently
    across engines (the round-7 driver hash-fail class). One hash
    exchange on user_id + one sort; frame state is O(20) per row.
    Zero-variance windows yield NULL z and flagged=0 (the oracle's
    CASE states the same). q² ≤ (1e4·max_value)² per row: with the
    testbed's value ≤ ~1e3 the 20-row frame sum stays far under 2^63;
    a wider deployment rescales or accumulates decimal (numeric.py
    overflow note)."""
    return zscore_plan(table(spark, sf_dir, "events"))


@register(
    "g_url_funcs",
    # URLs are synthesized deterministically from document fields, so
    # the parse is checkable end-to-end; the oracle restates
    # parse_url's component grammar with string/regexp functions.
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' || doc_id
                   || '?lang=' || lang || '&v=2' AS url
        FROM documents
    )
    SELECT doc_id, url,
           regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
           regexp_extract(url, '^([a-z]+):', 1) AS protocol
    FROM u
    """,
)
def g_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing scalar surface: ``parse_url`` HOST / PATH / QUERY /
    QUERY(key) / PROTOCOL over URLs synthesized from document fields —
    the canonicalization toolkit a web-corpus dedup pipeline runs
    scan-side (CC-style URL dedup normalizes exactly these
    components). Pure projection: one scan, whole-stage codegen, no
    exchange; parse_url is a JVM intrinsic (java.net.URI-grade
    grammar), ~10× cheaper per row than the regexp stack the oracle
    uses to restate it."""
    docs = table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?lang="),
        F.col("lang"),
        F.lit("&v=2"),
    )
    u = docs.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
        F.parse_url("url", F.lit("PROTOCOL")).alias("protocol"),
    )


@register(
    "i_graph_pagerank",
    # NOT plan-cacheable: the builder attaches lazy localCheckpoints
    # to the edge/node relations (graph.pagerank_int) — a cached plan
    # would let repeated timed runs reuse the materialized blocks and
    # skip the scan+distinct, under-reporting the honest per-run cost.
    cache_plan=False,
    # Exact restatement: 3 unrolled power iterations in the integer
    # basis (see operators/graph.pagerank_int — float PageRank is not
    # reproducible across engines; integer div/sum is). Both * and
    # integer-div are parenthesized so precedence cannot differ.
    oracle="""
    WITH e0 AS (
        SELECT DISTINCT l_partkey * 2 AS u, l_suppkey * 2 + 1 AS v
        FROM lineitem WHERE l_quantity >= 45
    ),
    e AS (SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0),
    n AS (SELECT DISTINCT u AS node FROM e),
    d AS (SELECT u, count(*) AS deg FROM e GROUP BY u),
    p0 AS (SELECT node, CAST(10000 AS BIGINT) AS pr FROM n),
    i1 AS (SELECT e.v AS node, sum(p0.pr // d.deg) AS s
           FROM e JOIN p0 ON e.u = p0.node JOIN d ON e.u = d.u GROUP BY e.v),
    p1 AS (SELECT n.node, CAST(1500 + ((85 * coalesce(i1.s, 0)) // 100) AS BIGINT) AS pr
           FROM n LEFT JOIN i1 USING (node)),
    i2 AS (SELECT e.v AS node, sum(p1.pr // d.deg) AS s
           FROM e JOIN p1 ON e.u = p1.node JOIN d ON e.u = d.u GROUP BY e.v),
    p2 AS (SELECT n.node, CAST(1500 + ((85 * coalesce(i2.s, 0)) // 100) AS BIGINT) AS pr
           FROM n LEFT JOIN i2 USING (node)),
    i3 AS (SELECT e.v AS node, sum(p2.pr // d.deg) AS s
           FROM e JOIN p2 ON e.u = p2.node JOIN d ON e.u = d.u GROUP BY e.v),
    p3 AS (SELECT n.node, CAST(1500 + ((85 * coalesce(i3.s, 0)) // 100) AS BIGINT) AS pr
           FROM n LEFT JOIN i3 USING (node))
    SELECT node, pr AS pr_bp FROM p3
    """,
)
def i_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the part<->supplier co-occurrence graph (edges =
    distinct (part, supplier) pairs on high-volume lines, symmetrized;
    node ids disambiguate the two key spaces as 2k / 2k+1) — the graph
    centrality prior a corpus pipeline computes over link graphs for
    crawl ordering / quality weighting. Three power iterations in the
    EXACT INTEGER basis (operators/graph.pagerank_int): float PageRank
    cannot hash-match across engines (in-neighbor summation order),
    integer div/sum can — so this is the rare iterative graph op with
    a full exact-SQL oracle (unrolled CTEs). Per-iteration plan: one
    message join + one map-side-combined sum; ranks/degrees stay
    node-sized; iteration count is a fixed constant, so the unrolled
    plan is data-size-independent."""
    from sparkclif.operators.graph import pagerank_int

    li = table(spark, sf_dir, "lineitem")
    e0 = (
        li.filter(F.col("l_quantity") >= 45)
        .select(
            (F.col("l_partkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .distinct()
    )
    edges = e0.union(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return pagerank_int(edges, src="u", dst="v", iters=3).select("node", "pr_bp")


@register(
    "a_sink_compact",
    cache_plan=False,  # impure: fragments + compacts scratch files
    # The oracle checks CONTENT identity through the fragment->compact
    # cycle (counts + checksums over the source table); file-count
    # assertions live in tests/test_r7_queries.py (not SQL-expressible).
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(sum(p_partkey * p_size) AS BIGINT) AS key_checksum,
           round(CAST(sum(CAST(p_retailprice AS DECIMAL(30,6))) AS DOUBLE), 4)
               AS sum_price
    FROM part
    """,
)
def a_sink_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction — the maintenance pass every streaming or
    partitioned sink needs at 100 TB (micro-batches and per-value
    writers emit thousands of small files; scans then pay per-file
    open/footer costs and the NameNode/object-store pays the listing).
    The query fragments `part` into 64 deliberately-small files, then
    compacts by rewriting with the file count SIZED FROM THE DATA:
    ceil(total_bytes / target_file_bytes) via the source's own parquet
    footprint — the same rule a table-format OPTIMIZE job applies per
    partition. Coalesce (narrow, no shuffle) does the merge: compaction
    must not pay a shuffle, it only concatenates row groups. Returns a
    content checksum over the COMPACTED copy so the oracle verifies
    the cycle is lossless."""
    import math
    import os

    frag = tmp_dir() + "/compact_in.parquet"
    compacted = tmp_dir() + "/compact_out.parquet"
    part = table(spark, sf_dir, "part")
    (
        part.repartition(64)
        .write.option("compression", "uncompressed")
        .mode("overwrite")
        .parquet(frag)
    )
    src = spark.read.parquet(frag)
    total_bytes = sum(
        os.path.getsize(os.path.join(frag, f))
        for f in os.listdir(frag)
        if f.endswith(".parquet")
    )
    target_file_bytes = 128 * 1024 * 1024
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    (
        src.coalesce(n_out)
        .write.option("compression", "uncompressed")
        .mode("overwrite")
        .parquet(compacted)
    )
    back = spark.read.parquet(compacted)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("p_partkey") * F.col("p_size")).cast("long").alias("key_checksum"),
        fixed_sum("p_retailprice").alias("sum_price"),
    )
