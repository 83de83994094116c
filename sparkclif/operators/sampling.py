"""Sampling & shard-assignment operators for training-data pipelines
(SURVEY.md §2.2 group I; north-star additions).

- Deterministic stratified sampling: an engine-portable hash bucket
  (lower 32 bits of md5 of the key) decides membership, so the same
  rows are sampled on ANY engine and any cluster size — no RNG state,
  no seed coordination, re-runnable. This is how production corpus
  subsampling keeps train/eval splits stable across pipeline reruns.
- Token-budget sequence packing: assign docs (in a deterministic
  global order) to contiguous training shards of ~``budget`` tokens
  via a DISTRIBUTED prefix sum — range partition + per-partition
  totals + broadcast offsets; no global window, no single-task sort,
  so the assignment scales to 100 TB while the oracle states it as a
  plain running-sum window.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def portable_bucket(key: Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): lower 32 bits of
    md5(string(key)). DuckDB reproduces it bit-for-bit:
    ('0x' || substr(md5(key::VARCHAR), 25, 8))::UBIGINT % buckets.
    (32 hex chars; chars 25-32 are the low 4 bytes. 8 hex chars fit a
    signed BIGINT, so no unsigned-overflow gymnastics JVM-side.)"""
    return (
        F.conv(F.substring(F.md5(key.cast("string")), 25, 8), 16, 10).cast("long")
        % buckets
    )


def stratified_sample_stats(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    rate_pct: int = 10,
) -> DataFrame:
    """Per-stratum totals vs deterministically-sampled counts: a row is
    sampled iff portable_bucket(key) < rate_pct. One scan, one shuffle
    (the per-stratum agg); the sample decision is a scan-side
    expression, so at 100 TB the filter pushes into the scan and the
    agg is map-side-combined."""
    keep = (portable_bucket(F.col(key_col)) < rate_pct).cast("long")
    return (
        df.select(F.col(strata_col), keep.alias("__keep"))
        .groupBy(strata_col)
        .agg(
            F.count("*").alias("n_total"),
            F.sum("__keep").alias("n_sampled"),
            F.round(F.sum("__keep") / F.count("*"), 4).alias("sample_rate"),
        )
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    count_col: str,
    budget: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Contiguous token-budget shard assignment: rows take shard_id =
    floor(tokens_before / budget) under the global ``order_col`` order
    — the standard contiguous pre-training shard/packing assignment.

    Distributed prefix sum, no global window: (1) range-partition +
    sort within partitions on order_col (one shuffle; partition i
    holds keys < partition i+1); (2) one LIGHT job sums count_col per
    partition (carries one long per partition to the driver); (3) the
    exclusive prefix of those totals is closed over into an Arrow
    kernel that streams each partition once, carrying a running
    offset across batches. Every stage is O(rows/partitions) per task
    at any scale — a plain ``sum() over (order by ...)`` window would
    put ALL rows in one task.
    """
    sc = df.sparkSession.sparkContext
    n_part = num_partitions or sc.defaultParallelism
    part = df.select(order_col, count_col).repartitionByRange(
        n_part, F.col(order_col)
    ).sortWithinPartitions(order_col)

    pid_totals = {
        r["__pid"]: r["__t"]
        for r in part.groupBy(F.spark_partition_id().alias("__pid"))
        .agg(F.sum(count_col).alias("__t"))
        .collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(pid_totals):
        offsets[pid] = acc
        acc += int(pid_totals[pid])

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        running = offsets.get(ctx.partitionId() if ctx else 0, 0)
        for b in batches:
            counts = b[count_col].astype("int64")
            before = running + counts.cumsum() - counts
            running += int(counts.sum())
            yield pd.DataFrame(
                {
                    order_col: b[order_col],
                    count_col: counts,
                    "shard_id": (before // budget).astype("int64"),
                }
            )

    return part.mapInPandas(
        assign, f"{order_col} long, {count_col} long, shard_id long"
    )
