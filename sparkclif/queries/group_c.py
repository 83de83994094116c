"""Group C — joins (SURVEY.md §2.2 group C).

Reference ties: R17 (user->site point lookup = broadcast hash join),
R13 (dense matrix init = crossJoin), R26 (duplicate guard = anti join),
R22 (dashboard null-extension = outer join + fillna).

Scale notes:
- Dims (region 5, nation 25, supplier small) broadcast explicitly; the
  5-way star join runs as a chain of broadcast hash joins over ONE
  lineitem scan — no shuffle until the final small aggregate.
- The theta join keeps the small side (supplier) broadcast so the
  nested-loop product is bounded per task.
- The as-of join is the union-sort single-shuffle operator from
  sparkclif.operators.asof — no |L|x|R| blowup per key.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkclif.numeric import fixed_sum
from sparkclif.io import has_data_files, table
from sparkclif.operators.asof import asof_join
from sparkclif.registry import register


@register(
    "c_join_inner",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE), 4) AS sum_price,
           round(avg(o_totalprice), 4) AS avg_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def c_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders |x| customer (reference R17 point lookup,
    state.py:107-108, generalized to a distributed hash join)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            fixed_sum("o_totalprice").alias("sum_price"),
            F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        )
    )


@register(
    "c_join_broadcast_chain",
    oracle="""
    SELECT r_name, n_name,
           count(*) AS n_lines,
           round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE), 4) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def c_join_broadcast_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join with broadcast dims (reference R13/R22 dimension
    semantics). nation/region always broadcast; customer/orders go
    through Catalyst's choice (broadcast at this scale, shuffle join at
    100 TB with AQE picking the strategy)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.count("*").alias("n_lines"),
            fixed_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


@register(
    "c_join_outer",
    oracle="""
    SELECT c_custkey,
           count(o_orderkey) AS n_orders,
           round(coalesce(sum(o_totalprice), 0), 4) AS sum_price
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def c_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null extension — every customer appears even
    with no orders (the dense-matrix semantics of reference R13/R22:
    every site appears in the dashboard even with no status)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias("sum_price"),
        )
    )


@register(
    "c_join_full_outer",
    oracle="""
    SELECT coalesce(cn.n_nationkey, sn.n_nationkey) AS nationkey,
           cn.n_customers,
           sn.n_suppliers
    FROM (SELECT c_nationkey AS n_nationkey, count(*) AS n_customers
          FROM customer GROUP BY c_nationkey) cn
    FULL OUTER JOIN
         (SELECT s_nationkey AS n_nationkey, count(*) AS n_suppliers
          FROM supplier WHERE s_acctbal > 5000 GROUP BY s_nationkey) sn
    USING (n_nationkey)
    """,
)
def c_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with null extension on both sides (supplier side
    filtered so some nations genuinely have no match)."""
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    cn = c.groupBy(F.col("c_nationkey").alias("n_nationkey")).agg(
        F.count("*").alias("n_customers")
    )
    sn = (
        s.filter(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("n_nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return cn.join(sn, "n_nationkey", "full").select(
        F.col("n_nationkey").alias("nationkey"), "n_customers", "n_suppliers"
    )


@register(
    "c_join_semi_anti",
    oracle="""
    SELECT 'with_orders' AS grp, count(*) AS n_customers,
           round(sum(c_acctbal), 4) AS sum_acctbal
    FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    UNION ALL
    SELECT 'without_orders' AS grp, count(*) AS n_customers,
           round(sum(c_acctbal), 4) AS sum_acctbal
    FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def c_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi (EXISTS) + left-anti (NOT EXISTS) — the duplicate-check-
    before-append guard of reference mcide.py:58-59 (R26)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))

    def side(how: str, tag: str) -> DataFrame:
        return (
            c.join(o, "c_custkey", how)
            .agg(
                F.count("*").alias("n_customers"),
                F.round(F.sum("c_acctbal"), 4).alias("sum_acctbal"),
            )
            .select(F.lit(tag).alias("grp"), "n_customers", "sum_acctbal")
        )

    return side("left_semi", "with_orders").unionByName(side("left_anti", "without_orders"))


@register(
    "c_join_cross",
    oracle="""
    SELECT r_name, n_name
    FROM region CROSS JOIN nation
    """,
)
def c_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross join (reference R13 dense matrix init: new project x every
    site, state.py:29-31)."""
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "c_join_theta",
    oracle="""
    SELECT s_suppkey,
           count(*) AS n_richer_customers,
           round(max(c_acctbal), 4) AS max_cust_bal
    FROM supplier JOIN customer
      ON c_acctbal > s_acctbal AND c_acctbal <= s_acctbal + 1000
    GROUP BY s_suppkey
    """,
)
def c_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range (theta) join on acctbal bands. Physical plan:
    broadcast nested-loop with supplier (the small side, bounded by
    construction) broadcast — the per-task product stays |customer
    partition| x |supplier|."""
    s = table(spark, sf_dir, "supplier")
    c = table(spark, sf_dir, "customer")
    return (
        c.join(
            F.broadcast(s),
            (c.c_acctbal > s.s_acctbal) & (c.c_acctbal <= s.s_acctbal + 1000),
        )
        .groupBy("s_suppkey")
        .agg(
            F.count("*").alias("n_richer_customers"),
            F.round(F.max("c_acctbal"), 4).alias("max_cust_bal"),
        )
    )


@register(
    "c_join_asof",
    oracle="""
    WITH ranked AS (
        SELECT e.event_id, o.o_orderkey, o.o_totalprice,
               row_number() OVER (
                   PARTITION BY e.event_id
                   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC
               ) AS rn
        FROM events e
        JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    SELECT e.event_id, e.user_id, e.event_type,
           m.o_orderkey AS asof_o_orderkey,
           round(m.o_totalprice, 4) AS asof_price
    FROM events e
    LEFT JOIN (SELECT * FROM ranked WHERE rn = 1) m USING (event_id)
    """,
)
def c_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event matched to its user's latest prior order
    (backward, inclusive). Uses the single-shuffle union-sort operator
    (sparkclif/operators/asof.py) — the longitudinal alignment pattern
    of the CLIF consortium's data format."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "ts")
    o = table(spark, sf_dir, "orders")
    joined = asof_join(
        ev,
        o,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        "event_type",
        F.col("asof_o_orderkey"),
        F.round("asof_o_totalprice", 4).alias("asof_price"),
    )


BUCKET_TABLES = {
    # name -> (source table, projected cols + DDL types, bucket key)
    "b_orders": (
        "orders",
        [("o_orderkey", "BIGINT"), ("o_custkey", "BIGINT"), ("o_totalprice", "DOUBLE")],
        "o_custkey",
    ),
    "b_customer": (
        "customer",
        [("c_custkey", "BIGINT"), ("c_mktsegment", "STRING")],
        "c_custkey",
    ),
}


def _src_fingerprint(sf_dir: str, src: str) -> dict:
    """Cheap source-identity stamp (path + size + mtime): detects a
    regenerated source parquet without scanning it. A false-stale
    (touched but identical file) costs one harmless rewrite; serving
    buckets built from DIFFERENT data would be silently wrong."""
    p = f"{sf_dir.rstrip('/')}/{src}.parquet"
    st = os.stat(p)
    return {"path": p, "size": st.st_size, "mtime_ns": st.st_mtime_ns}


def _ensure_bucketed(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Idempotent per-SF bucketed table. Bucketing is an ETL-TIME layout
    decision — the canonical stored form of a 100 TB fact table — so the
    write happens once per scale factor, not once per query. If the
    files exist but this (fresh in-memory) catalog has lost the table,
    re-register the existing layout with CREATE TABLE ... CLUSTERED BY
    DDL instead of rewriting the data.

    Staleness guard: the write stamps the source's (path, size, mtime)
    into ``_sparkclif_src.json`` inside the table dir (underscore
    prefix => invisible to the parquet FileIndex). Any reuse path —
    catalog hit or DDL re-register — first checks the stamp against
    the CURRENT source file, so a warehouse surviving a testdata
    regeneration can never serve buckets of the old data."""
    src, cols, key = BUCKET_TABLES[name]
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1].replace(".", "_").replace("-", "_")
    tbl = f"{name}_{tag}"
    want = _src_fingerprint(sf_dir, src)
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    loc = f"{warehouse}/{tbl}"
    meta_file = f"{loc}/_sparkclif_src.json"
    try:
        with open(meta_file) as fh:
            fresh = json.load(fh) == want
    except (OSError, ValueError):
        fresh = False

    if spark.catalog.tableExists(tbl):
        if fresh:
            return tbl
        spark.sql(f"DROP TABLE {tbl}")  # stale buckets: rebuild below
    # files-exist guard: the fingerprint stamp is written only after a
    # completed write, so fresh==True implies commit; still verify the
    # data files survived (io.has_data_files is the shared sentinel
    # rule — the session skips _SUCCESS markers)
    has_files = has_data_files(loc)
    if fresh and has_files:
        ddl = ", ".join(f"{c} {t}" for c, t in cols)
        spark.sql(
            f"CREATE TABLE {tbl} ({ddl}) USING PARQUET "
            f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO 8 BUCKETS "
            f"LOCATION '{loc}'"
        )
        return tbl
    # stale or absent: full rewrite (external-table DROP leaves files)
    shutil.rmtree(loc, ignore_errors=True)
    df = table(spark, sf_dir, src).select(*[c for c, _ in cols])
    df.write.bucketBy(8, key).sortBy(key).mode("overwrite").saveAsTable(tbl)
    with open(meta_file, "w") as fh:
        json.dump(want, fh)
    return tbl


@register(
    "c_join_bucketed",
    cache_plan=False,
    oracle="""
    SELECT o.o_custkey,
           count(*) AS n_orders,
           round(sum(o.o_totalprice), 4) AS sum_price,
           max(c.c_mktsegment) AS segment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')
    GROUP BY o.o_custkey
    """,
)
def c_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: both sides bucketed by the join key
    into the same bucket count, so the join needs NO shuffle exchange
    on either side (asserted in tests/test_plans.py) — the layout that
    turns the 100 TB fact-to-fact join from a full network shuffle
    into a local merge. The merge hint pins sort-merge (at real scale
    neither side broadcasts), and bucketing makes that SMJ exchange-
    and sort-free."""
    bo = spark.table(_ensure_bucketed(spark, sf_dir, "b_orders"))
    bc = spark.table(_ensure_bucketed(spark, sf_dir, "b_customer"))
    return (
        bo.join(bc.hint("merge"), bo.o_custkey == bc.c_custkey)
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("sum_price"),
            F.max("c_mktsegment").alias("segment"),
        )
    )


@register(
    "c_join_salted",
    oracle="""
    SELECT e.event_type,
           n.n_name,
           count(*) AS n_events,
           round(sum(e.value), 4) AS sum_value
    FROM events e JOIN nation n ON (e.user_id % 25) = n.n_nationkey
    GROUP BY e.event_type, n.n_name
    """,
)
def c_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted skew join: the fact side's hot join key is decorated
    with a random-free deterministic salt (key, event_id % N_SALT) and
    the dim side replicated N_SALT ways, splitting each hot key's rows
    across N_SALT reducers. Result provably equals the plain join (the
    oracle IS the plain join). At 100 TB this (or AQE skew-join, which
    is enabled) is what keeps one hot user/shingle from stalling the
    stage."""
    N_SALT = 8
    ev = table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value", (F.col("user_id") % 25).alias("jk")
    )
    nation = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("jk"), "n_name"
    )
    salted_fact = ev.withColumn("salt", (F.col("event_id") % N_SALT).cast("int"))
    salted_dim = nation.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALT - 1)))
    )
    return (
        salted_fact.join(salted_dim, ["jk", "salt"])
        .groupBy("event_type", "n_name")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


@register(
    "c_join_range_bucketed",
    # oracle_in_bench=False: the oracle IS the theta self-join the
    # bucketed plan replaces (26 s/pass in DuckDB at sf0.1) — not a
    # comparable plan shape for baseline timing, and timing it would
    # inflate the DuckDB total in the engine's favor. Correctness
    # stays hash-checked at sf0.01.
    oracle_in_bench=False,
    # Exact restatement as the THETA self-join the bucketed plan
    # replaces: same-user events within +/-1 hour, excluding self;
    # neighbor-value sum in the fixed-point decimal basis.
    oracle="""
    SELECT a.event_id, a.user_id AS user_id,
           CAST(count(b.event_id) AS BIGINT) AS n_near,
           round(CAST(coalesce(sum(CAST(b.value AS DECIMAL(38,6))), 0)
                      AS DOUBLE), 4) AS sum_near
    FROM events a
    LEFT JOIN events b
      ON b.user_id = a.user_id AND b.event_id <> a.event_id
         AND abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 3600000000
    GROUP BY a.event_id, a.user_id
    """,
)
def c_join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join via time-bucketing: for every event, the count and
    exact value-sum of same-user events within +/-1 hour. The oracle
    states the theta join; the plan replaces it with a pure hash
    equi-join on (user_id, bucket) after replicating one side into its
    three reachable buckets (operators/rangejoin.py) — no
    BroadcastNestedLoopJoin, no per-key cross product, AQE-skew-
    splittable at 100 TB."""
    from sparkclif.operators.rangejoin import self_range_neighbors

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    return self_range_neighbors(
        ev,
        key_col="user_id",
        time_us_col="ts_us",
        id_col="event_id",
        window_us=3_600_000_000,
        value_col="value",
    )
