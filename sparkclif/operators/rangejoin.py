"""Bucketized range join — the scale path for time-window joins.

A naive ``a JOIN b ON abs(a.ts - b.ts) <= w AND a.key = b.key`` is a
theta join: Spark plans it as a broadcast-nested-loop (or a key-only
equi-join with a per-key cross product), both of which blow up on hot
keys. Bucketizing the time axis turns it into a pure equi-join:

- each row gets its time bucket ``b = floor(t / w)``;
- one side is replicated into its three reachable buckets
  ``{b-1, b, b+1}`` (any partner within ``w`` differs by at most one
  bucket);
- the join becomes equality on ``(key, bucket)`` — hash-partitioned,
  AQE-skew-splittable — followed by the exact ``|dt| <= w`` filter.

Every qualifying pair is produced EXACTLY once: the left row's single
bucket value matches exactly one of the right row's three distinct
replicas, so no dedup pass is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkclif.numeric import fixed_sum


def self_range_neighbors(
    df: DataFrame,
    key_col: str,
    time_us_col: str,
    id_col: str,
    window_us: int,
    value_col: str | None = None,
) -> DataFrame:
    """For every row: how many OTHER rows with the same ``key_col``
    lie within ``window_us`` microseconds (and, optionally, the exact
    fixed-point sum of their ``value_col``). Rows with no neighbor
    keep their output row with zero counts.

    Plan shape: 3x replication of one side (bucket explode, scan-side)
    -> one hash equi-join on (key, bucket) -> exact window filter ->
    map-side-combined count per left row -> one broadcast-free left
    join back to the input to restore neighbor-less rows. At 100 TB
    the join shuffles on (key, bucket) — time-bucketing spreads a hot
    key's rows over its time range, so skew is bounded by rows-per-
    (key, window) which is the pair-output lower bound anyway.
    """
    t = F.col(time_us_col)
    left = df.select(
        F.col(id_col).alias("__lid"),
        F.col(key_col).alias("__k"),
        t.alias("__lt"),
        F.floor(t / window_us).alias("__b"),
    )
    right_cols = [
        F.col(id_col).alias("__rid"),
        F.col(key_col).alias("__k"),
        t.alias("__rt"),
        F.explode(
            F.array(
                F.floor(t / window_us) - 1,
                F.floor(t / window_us),
                F.floor(t / window_us) + 1,
            )
        ).alias("__b"),
    ]
    if value_col is not None:
        right_cols.insert(3, F.col(value_col).alias("__rv"))
    right = df.select(*right_cols)
    pairs = left.join(right, ["__k", "__b"]).where(
        (F.abs(F.col("__lt") - F.col("__rt")) <= window_us)
        & (F.col("__lid") != F.col("__rid"))
    )
    aggs = [F.count("*").cast("long").alias("n_near")]
    if value_col is not None:
        aggs.append(fixed_sum("__rv").alias("sum_near"))
    counts = pairs.groupBy("__lid").agg(*aggs)
    out = df.select(F.col(id_col), F.col(key_col)).join(
        counts, F.col(id_col) == F.col("__lid"), "left"
    )
    result = out.select(
        id_col,
        key_col,
        F.coalesce("n_near", F.lit(0)).cast("long").alias("n_near"),
        *(
            [F.coalesce("sum_near", F.lit(0.0)).alias("sum_near")]
            if value_col is not None
            else []
        ),
    )
    return result
