"""Driver contract for the spark-graft builder (PySpark target).

Thin views over ``sparkclif.registry`` — every implemented operator
from SURVEY.md §2.2 registers a (spark_fn, oracle_sql) pair there.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary, d_agg_groupby)
    on /root/testdata/sf0.001; driver checks rows>0."""
    from sparkclif.registry import all_queries

    return all_queries()["d_agg_groupby"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.2."""
    from sparkclif.registry import all_queries

    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted => rows-only)."""
    from sparkclif.registry import all_queries

    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }
