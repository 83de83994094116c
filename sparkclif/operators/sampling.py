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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def portable_bucket(key: Column, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets): lower 32 bits of
    md5(string(key)) — the shared engine-portable basis
    (operators/hashing.py; DuckDB restates it as
    ('0x' || substr(md5(key::VARCHAR), 25, 8))::UBIGINT % buckets)."""
    from sparkclif.operators.hashing import md5_bits

    return md5_bits(key.cast("string"), 25, 8) % buckets


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


def pps_sample_topk(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int = 50,
) -> DataFrame:
    """Probability-proportional-to-size sampling without replacement —
    sequential Poisson sampling (Ohlsson 1998; the order-sampling
    cousin of Efraimidis–Spirakis): each row gets priority
    ``u / w`` with ``u`` uniform and ``w`` its weight, and the sample
    is the ``k`` SMALLEST priorities. Heavier rows draw smaller
    priorities, so inclusion probability is ~proportional to weight —
    the standard shape for token-budget-proportional corpus
    subsampling (sample docs proportional to length so the TOKEN
    budget, not the doc count, is what's controlled).

    Deterministic and engine-exact with no RNG coordination: ``u`` is
    the portable md5 basis (28 bits of md5('pps|' || key), +1 so 0 is
    excluded), and the priority is one IEEE double division of those
    exact integers — +,-,*,/ are correctly-rounded in IEEE 754, so
    Spark and any oracle engine produce bit-identical priorities and
    an identical selected SET (contrast ln/pow order keys, whose
    last-ulp behavior is libm-implementation-specific: the classic
    Efraimidis–Spirakis ``u^(1/w)`` key is NOT portably exact, which
    is why the priority form is the one to ship).

    Plan: the priority is a scan-side expression (pushes into the
    scan, no precomputation pass); sort+limit executes as TakeOrdered
    — per-partition k-row heaps and a driver merge of partitions×k
    rows, never a global sort. One job, no shuffle. NULL, zero and
    negative weights are clamped to 1 (a weight-0 row would otherwise
    divide to +inf — deterministically excluded, but silently;
    clamping keeps every row sampleable, and the NULL coalesce
    matters cross-engine: Spark's greatest SKIPS nulls while SQL
    engines differ, so the clamp must not rely on greatest's null
    rule). NULL-KEY rows are dropped: md5(NULL) is NULL, and a NULL
    priority would sort NULLS FIRST in Spark but NULLS LAST in most
    SQL engines — a silent one-slot divergence; a row with no
    identity has no deterministic sample fate, so it is excluded
    explicitly rather than by engine default.
    """
    from sparkclif.operators.hashing import md5_bits

    df = df.where(F.col(key_col).isNotNull())
    u = (
        md5_bits(
            F.concat(F.lit("pps|"), F.col(key_col).cast("string")), 18, 7
        )
        + 1
    ).cast("double")
    # Clamp ONLY degenerate weights (NULL / zero / negative -> 1, the
    # documented contract): the old greatest(w, 1) also flattened every
    # LEGITIMATE fractional weight in (0, 1) to 1, silently turning
    # PPS into uniform sampling for sub-unit weights.
    w = (
        F.when(
            F.col(weight_col).isNull() | (F.col(weight_col) <= 0), F.lit(1)
        )
        .otherwise(F.col(weight_col))
        .cast("double")
    )
    pri = u / w
    return (
        df.select(
            F.col(key_col),
            F.col(weight_col).cast("long").alias("weight"),
            pri.alias("__pri"),
        )
        .orderBy(F.col("__pri"), F.col(key_col))
        .limit(k)
        .select(
            key_col,
            "weight",
            F.round(F.col("__pri"), 4).alias("priority"),
        )
    )


def pack_sequences(
    df: DataFrame,
    order_col: str,
    count_col: str,
    budget: int,
    num_partitions: int | None = None,
    force: str | None = None,
) -> DataFrame:
    """Contiguous token-budget shard assignment: rows take shard_id =
    floor(tokens_before / budget) under the global ``order_col`` order
    — the standard contiguous pre-training shard/packing assignment.

    Distributed prefix sum, no global window: (1) range-partition on
    order_col (one shuffle; partition i holds keys < partition i+1)
    and stamp each row's partition id; (2) one LIGHT job sums
    count_col per partition (one long per partition to the driver);
    (3) the exclusive prefix of those totals re-enters the plan as a
    map literal, and the within-partition running sum is a window
    PARTITIONED BY the stamped pid — parallel across partitions,
    whole-stage-codegen JVM the whole way (an earlier Arrow/pandas
    kernel for stage 3 measured 8× slower at 5M rows purely on
    Python exchange). Every stage is O(rows/partitions) per task —
    a plain ``sum() over (order by ...)`` window puts ALL rows in
    one task, which stops being runnable long before 100 TB.

    At thousands of partitions swap the map literal for a broadcast
    join on pid; same shape otherwise.

    Cost-based dispatch (the rank.py pattern, same size constant):
    inputs whose plan-stats estimate fits SMALL_INPUT_BYTES take the
    oracle's own single-task running-sum window — at that size the
    3-stage distributed sum pays two extra stage barriers plus an
    eager checkpoint to move data one task could fold through (3-4x
    the wall at sf0.1). Identical output either way (both are exact
    prefix sums), pinned by tests. ``force`` ("window" |
    "distributed") pins a path; an explicit ``num_partitions`` also
    pins the distributed path — a partitioning request is a contract
    the single-task window cannot honor.
    """
    from sparkclif.operators.rank import SMALL_INPUT_BYTES, plan_size_bytes, validate_force

    validate_force(force, {"window", "distributed"})
    if force is None:
        if num_partitions is not None:
            force = "distributed"
        else:
            size = plan_size_bytes(df)
            force = "window" if size <= SMALL_INPUT_BYTES else "distributed"
    if force == "window":
        w = (
            Window.orderBy(order_col)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        before = F.sum(count_col).over(w) - F.col(count_col)
        return (
            df.select(order_col, count_col)
            .withColumn("__before", before)
            .selectExpr(
                order_col,
                count_col,
                f"__before div {int(budget)} AS shard_id",
            )
        )
    sc = df.sparkSession.sparkContext
    n_part = num_partitions or sc.defaultParallelism
    part = df.select(order_col, count_col).repartitionByRange(
        n_part, F.col(order_col)
    ).withColumn("__pid", F.spark_partition_id())
    # PIN the physical partitioning: the totals job below and the
    # caller's eventual action are separate jobs, and RangePartitioner
    # re-SAMPLES boundaries per job (seed involves rdd.id) — once an
    # input partition exceeds the sample size (~10k rows) the two jobs
    # could disagree on boundaries and the offsets would describe the
    # wrong partitioning. A localCheckpoint materializes one layout
    # both jobs share (reliable checkpoint dir on a cluster); lazy,
    # because the totals collect RIGHT BELOW is a full scan that
    # materializes it — one fewer job barrier (optimization r12).
    part = part.localCheckpoint(eager=False)

    pid_totals = {
        r["__pid"]: r["__t"]
        for r in part.groupBy("__pid").agg(F.sum(count_col).alias("__t")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(pid_totals):
        offsets[pid] = acc
        # an all-NULL-count partition sums to NULL -> contributes 0
        # (int(None) raised before; the window path already treated
        # those rows as zero-width)
        acc += int(pid_totals[pid] or 0)
    # empty input: an argless create_map() types as map<void,void>
    # and the [__pid] lookup fails analysis — zero is the identity
    # offset for the zero rows it would stamp
    offset_of_pid = (
        F.create_map(*[F.lit(x) for kv in sorted(offsets.items()) for x in kv])[
            F.col("__pid")
        ]
        if offsets
        else F.lit(0).cast("long")
    )

    w = (
        Window.partitionBy("__pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    before = F.sum(count_col).over(w) - F.col(count_col) + offset_of_pid
    # integer `div`, not floor(a/b): double division rounds once the
    # cumulative count passes 2^53 (same hazard io.py avoids for nanos)
    return part.withColumn("__before", before).selectExpr(
        order_col,
        count_col,
        f"__before div {int(budget)} AS shard_id",
    )


def grouped_rank(
    df: DataFrame,
    group_col: str,
    order_col: str,
    rank_name: str = "pos",
    num_partitions: int | None = None,
    force: str | None = None,
) -> DataFrame:
    """Per-group 1-based rank under ``order_col`` WITHOUT a per-group
    single-task sort — the generalization of ``pack_sequences``'s
    distributed prefix sum to grouped ranking.

    A plain ``row_number() over (partition by g order by o)`` puts an
    entire group in ONE task; with a handful of large groups (e.g.
    training shards) that stops being runnable long before 100 TB.
    Instead: (1) range-partition on (group, order) — one shuffle;
    each group occupies a contiguous run of partitions and a partition
    holds at most a few groups' boundary rows; (2) one LIGHT job
    counts rows per (partition, group) — at most partitions + groups
    rows to the driver; (3) the exclusive prefix of those counts
    within each group re-enters the plan as a map literal keyed by
    (pid, group), and the in-partition rank is a window PARTITIONED BY
    (pid, group) — parallel across partitions, JVM the whole way.
    Every task is O(rows / partitions) regardless of group sizes.

    At thousands of partitions × groups swap the map literal for a
    broadcast join on (pid, group); same shape otherwise.

    ``order_col`` must be unique within a group (ties would make the
    range-partition boundary split nondeterministic); callers append a
    unique key to the order expression.

    Cost-based dispatch (same constant as pack_sequences): inputs
    under SMALL_INPUT_BYTES take the plain one-task-per-group
    ``row_number`` window — at that size every group fits a task and
    the 3-stage distributed rank pays two extra barriers plus a
    layout checkpoint for nothing. Identical output either way. ``force``
    ("window" | "distributed") pins a path; an explicit
    ``num_partitions`` also pins the distributed path (the
    single-task-per-group window cannot honor a partitioning request).
    """
    from sparkclif.operators.rank import SMALL_INPUT_BYTES, plan_size_bytes, validate_force

    validate_force(force, {"window", "distributed"})
    if force is None:
        if num_partitions is not None:
            force = "distributed"
        else:
            size = plan_size_bytes(df)
            force = "window" if size <= SMALL_INPUT_BYTES else "distributed"
    if force == "window":
        w = Window.partitionBy(group_col).orderBy(order_col)
        return df.withColumn(rank_name, F.row_number().over(w))
    sc = df.sparkSession.sparkContext
    n_part = num_partitions or sc.defaultParallelism
    part = df.repartitionByRange(
        n_part, F.col(group_col), F.col(order_col)
    ).withColumn("__pid", F.spark_partition_id())
    # Pin the physical partitioning: RangePartitioner re-samples
    # boundaries per job (see pack_sequences) — the counts job and the
    # caller's action must see the SAME layout. Lazy: the counts
    # collect right below is the materializing full scan
    # (optimization r12).
    part = part.localCheckpoint(eager=False)

    # The map probe key and the driver-built map keys must agree
    # EXACTLY, so the group's string form comes from SPARK's cast in
    # both places (collected back verbatim for the map entries) — a
    # Python str(g) diverges from the Spark cast for booleans
    # ('True' vs 'true'), timestamps, and decimals, and bare
    # concat_ws SKIPS a NULL group key ('3' vs '3|None'), silently
    # NULLing every rank of that group. NULL keys get an explicit
    # sentinel no real cast string starts with.
    gs = F.coalesce(
        F.col(group_col).cast("string"), F.lit("\x00NULL")
    )
    counts = (
        part.groupBy("__pid", gs.alias("__gs"))
        .agg(F.count("*").alias("__c"))
        .collect()
    )
    # Exclusive prefix within each group across pids (pid order IS the
    # group's order because partitioning is by (group, order)).
    offsets: dict[tuple[int, str], int] = {}
    acc_by_group: dict[str, int] = {}
    for r in sorted(counts, key=lambda r: (r["__gs"], r["__pid"])):
        g = r["__gs"]
        offsets[(r["__pid"], g)] = acc_by_group.get(g, 0)
        acc_by_group[g] = acc_by_group.get(g, 0) + int(r["__c"])

    key = F.concat_ws("|", F.col("__pid").cast("string"), gs)
    # empty input: an argless create_map() types as map<void,void>
    # and the [key] lookup fails analysis — zero offset for zero rows
    offset_of_key = (
        F.create_map(
            *[
                c
                for (pid, g), off in sorted(offsets.items())
                for c in (F.lit(f"{pid}|{g}"), F.lit(off))
            ]
        )[key]
        if offsets
        else F.lit(0)
    )
    w = Window.partitionBy("__pid", group_col).orderBy(order_col)
    return (
        part.withColumn(rank_name, F.row_number().over(w) + offset_of_key)
        .drop("__pid")
    )


def shard_interleave(
    df: DataFrame,
    key_col: str,
    n_shards: int = 8,
) -> DataFrame:
    """Deterministic global shuffle + shard assignment for training
    data: every row gets a shard in [0, n_shards) and a 1-based
    position within its shard, both pure functions of the key — the
    write layout a pre-training data loader consumes (shard files,
    each internally order-randomized, re-runnable bit-for-bit on any
    engine or cluster size; no RNG seed coordination).

    Two INDEPENDENT portable hashes (domain-separated md5, the
    operators/hashing.py basis): ``shard|key`` decides the shard,
    ``pos|key`` decides the within-shard order — using one hash for
    both would correlate shard membership with position. Positions
    come from :func:`grouped_rank`, so no per-shard single-task sort.
    """
    from sparkclif.operators.hashing import md5_bits

    k = F.col(key_col).cast("string")
    shard = md5_bits(F.concat(F.lit("shard|"), k), 25, 8) % n_shards
    ordh = F.md5(F.concat(F.lit("pos|"), k))
    tagged = df.withColumn("shard", shard).withColumn(
        "__ord", F.concat_ws("|", ordh, k)
    )
    return grouped_rank(tagged, "shard", "__ord", rank_name="pos").drop("__ord")
