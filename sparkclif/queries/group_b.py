"""Group B — projection / filter / predicates (SURVEY.md §2.2 group B).

Reference ties: R6 (blank-line filter), R23/R24 (startswith/endswith
catalog filters, mcide.py:18,24), R4/R16/R34 (coalesce/nullif ladders).

Scale notes: all predicates are native Catalyst expressions => pushed
into the parquet scan (PushedFilters) with column pruning; outputs are
key projections or small aggregates, never wide rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkclif.numeric import fixed_sum
from sparkclif.io import table
from sparkclif.registry import register


@register(
    "b_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
           round(l_extendedprice * (1 - l_discount), 4) AS disc_price
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
      AND l_discount BETWEEN 0.02 AND 0.08
      AND l_quantity < 30
    """,
)
def b_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates + BETWEEN + projection pruning; the filter
    set reaches the parquet scan as PushedFilters."""
    li = table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between("1996-01-01", "1996-12-31")
        & F.col("l_discount").between(0.02, 0.08)
        & (F.col("l_quantity") < 30)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_discount",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("disc_price"),
    )


@register(
    "b_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE (p_size IN (1, 5, 10, 15, 20) AND p_type LIKE '%AND%')
       OR (p_name LIKE 'small%' AND NOT p_brand LIKE 'Brand#1%')
       OR (p_name LIKE '%bolt' AND p_size BETWEEN 10 AND 40)
       OR p_type IS NULL
    """,
)
def b_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / LIKE / startswith / endswith / IS NULL / NOT / OR — the
    catalog-filter semantics of reference mcide.py:18 (startswith) and
    mcide.py:24 (endswith)."""
    p = table(spark, sf_dir, "part")
    return p.filter(
        (F.col("p_size").isin(1, 5, 10, 15, 20) & F.col("p_type").like("%AND%"))
        | (F.col("p_name").startswith("small") & ~F.col("p_brand").like("Brand#1%"))
        | (F.col("p_name").endswith("bolt") & F.col("p_size").between(10, 40))
        | F.col("p_type").isNull()
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


@register(
    "b_conditional",
    oracle="""
    SELECT price_band,
           status_norm,
           count(*) AS n_orders,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE), 4) AS sum_price
    FROM (
        SELECT CASE WHEN o_totalprice < 20000 THEN 'small'
                    WHEN o_totalprice < 60000 THEN 'medium'
                    ELSE 'large' END AS price_band,
               coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_norm,
               o_totalprice
        FROM orders
    )
    GROUP BY price_band, status_norm
    """,
)
def b_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN ladder + coalesce/nullif normalization — the
    'General' <-> NULL pattern of reference app.py:567-572 (R34) and the
    .get-with-default ladders of metadata.py:42-45 (R4)."""
    o = table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 20000, "small")
        .when(F.col("o_totalprice") < 60000, "medium")
        .otherwise("large")
    )
    norm = F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN"))
    return (
        o.select(band.alias("price_band"), norm.alias("status_norm"), "o_totalprice")
        .groupBy("price_band", "status_norm")
        .agg(
            F.count("*").alias("n_orders"),
            fixed_sum("o_totalprice").alias("sum_price"),
        )
    )
