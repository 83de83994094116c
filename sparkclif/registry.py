"""Query registry — the driver-checked surface.

Every implemented operator from SURVEY.md §2.2 registers itself here as
a (spark_fn, oracle_sql) pair. ``__spark_entry__.queries()`` /
``oracle_sql()`` are thin views over this registry.

Contract (SURVEY.md §5.2):
- spark_fn(spark, sf_dir) -> DataFrame
- oracle is ANSI SQL runnable by DuckDB over the same parquet tables
  (pre-registered views), or None for rows-only checks.
- Column names must match exactly between the two; computed float
  columns are rounded on BOTH sides; every sort/window has a
  deterministic tiebreaker.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # ANSI SQL for DuckDB, or None => rows-only check
    doc: str = ""
    # False => the oracle is still used for CORRECTNESS (driver runs it
    # at sf0.01) but excluded from bench.py's DuckDB BASELINE timing —
    # for oracles whose only SQL formulation has a different asymptotic
    # cost than the engine's operator (e.g. the N^2 pairwise join
    # behind cosine top-k), where timing it at sf0.1 would inflate the
    # baseline rather than measure a comparable plan.
    oracle_in_bench: bool = True
    # True => fn(spark, sf_dir) is a PURE plan builder (no sink writes,
    # no streaming run, no driver-side collect/broadcast), so repeated
    # invocations may reuse the built DataFrame — the plan-cache every
    # engine applies to repeated parameterized queries. Impure queries
    # (sinks, streaming harnesses, kernels that materialize a broadcast
    # during build) declare False and are always rebuilt so their
    # timed runs include that work.
    cache_plan: bool = True


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    oracle_in_bench: bool = True,
    cache_plan: bool = True,
):
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def wrap(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            fn=fn,
            oracle=oracle,
            doc=doc or (fn.__doc__ or ""),
            oracle_in_bench=oracle_in_bench,
            cache_plan=cache_plan,
        )
        return fn

    return wrap


def all_queries() -> dict[str, QuerySpec]:
    # Import triggers registration of every group module.
    from sparkclif import queries  # noqa: F401

    return dict(REGISTRY)
