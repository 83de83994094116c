"""Group F — sort / limit / set ops / dedup (SURVEY.md §2.2 group F).

Reference ties: R12 (sort_key dimension order), R16 (last-wins upsert
= keep-newest dedup), R26 (set membership).

Scale notes: global sort+limit compiles to TakeOrderedAndProject (per-
partition top-N then merge — no total sort); dedup is a window over the
dedup key (one shuffle), not a global distinct over wide rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sparkclif.io import table
from sparkclif.registry import register


@register(
    "f_sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
)
def f_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort + LIMIT with a unique tiebreak key (the
    LIMIT set is deterministic). Physical plan: TakeOrderedAndProject —
    per-partition top-100 then driver merge, never a total sort."""
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select(
            "o_orderkey",
            "o_custkey",
            F.round("o_totalprice", 4).alias("totalprice"),
            "o_orderpriority",
        )
    )


@register(
    "f_set_ops",
    oracle="""
    WITH a AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY'),
         b AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
    SELECT 'union_all' AS op, c_custkey FROM (SELECT c_custkey FROM a
                                              UNION ALL SELECT c_custkey FROM b)
    UNION ALL
    SELECT 'union_distinct' AS op, c_custkey FROM (SELECT c_custkey FROM a
                                                   UNION SELECT c_custkey FROM b)
    UNION ALL
    SELECT 'intersect' AS op, c_custkey FROM (SELECT c_custkey FROM a
                                              INTERSECT SELECT c_custkey FROM b)
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (SELECT c_custkey FROM a
                                           EXCEPT SELECT c_custkey FROM b)
    """,
)
def f_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL / UNION / INTERSECT / EXCEPT on customer segments
    (reference R16 union, R26 membership)."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_mktsegment") == "MACHINERY").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")

    def tag(df: DataFrame, op: str) -> DataFrame:
        return df.select(F.lit(op).alias("op"), "c_custkey")

    return (
        tag(a.unionAll(b), "union_all")
        .unionByName(tag(a.union(b).distinct(), "union_distinct"))
        .unionByName(tag(a.intersect(b), "intersect"))
        .unionByName(tag(a.subtract(b), "except"))
    )


@register(
    "f_distinct",
    oracle="""
    SELECT user_id, event_type, event_id AS kept_event_id, round(value, 4) AS kept_value
    FROM (
        SELECT user_id, event_type, event_id, value,
               row_number() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def f_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-newest dedup on a key subset — the reference's last-wins POC
    upsert semantics (state.py:93-105, R16) made deterministic with an
    explicit (ts, event_id) tiebreak, exactly the engine's MERGE-less
    upsert pattern (SURVEY.md §4.2)."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("kept_event_id"),
            F.round("value", 4).alias("kept_value"),
        )
    )
