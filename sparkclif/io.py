"""Testdata table loaders.

The driver's testbed (TESTDATA.md) is one parquet file per table under
``/root/testdata/sf{0.001,0.01,0.1}/``. Loads are lazy (parquet footer
read only); Catalyst pushes filters/column pruning into the scan.

At 100 TB each of these would be a partitioned parquet/Delta dataset;
the loader interface (name -> DataFrame) is the only thing the query
layer sees, so swapping the physical layout is a one-file change.
"""

from __future__ import annotations

import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

# Per-session {(sf_dir, table) -> DataFrame}. A DataFrame is an
# immutable logical plan, so handing the same one to every query is
# safe, and it skips the per-call file listing + parquet footer read
# (~50 ms) that a metastore-backed catalog would also amortize. The
# cache lives ON the session object (an attribute), so it dies exactly
# when the session does — a module-level WeakKeyDictionary would never
# collect: its DataFrame values strongly reference their session (the
# key), pinning every stopped session plus all its plans forever.
_CACHE_ATTR = "_sparkclif_table_cache"


def has_data_files(path: str, suffix: str = ".parquet") -> bool:
    """Commit sentinel for local sinks: the session disables _SUCCESS
    markers (committer tuning), so "directory exists and holds at least
    one data file" is THE rule for a completed write. Keep the rule
    here — streaming/late.py, queries/group_c.py and the layout tests
    all consult it. Recursive: a partitionBy() sink puts its data
    files in value subdirectories, so a top-level-only listing would
    report a completed partitioned write as absent. Hidden dirs
    (``_temporary``, ``.staging``-style) are pruned: a write killed
    mid-job leaves part files only under ``_temporary``, which Spark's
    own listing ignores — counting them would declare an uncommitted
    write complete."""
    import os

    if not os.path.isdir(path):
        return False
    for _root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        if any(f.endswith(suffix) and not f.startswith(("_", ".")) for f in files):
            return True
    return False


def parquet_row_count(sf_dir: str, name: str) -> int:
    """Exact row count of a testbed parquet table from FILE FOOTERS
    only — no Spark job, no scan (VERDICT r5 item 3: the old
    ``raw.count()`` pre-jobs added a full extra pass per run just for
    LSH plane sizing; at 100 TB that's a complete corpus read).
    Parquet footers carry num_rows per file; pyarrow reads just the
    footer bytes. On a real cluster the same number comes from
    catalog/table stats (ANALYZE) or the manifest of a table format —
    footer metadata is the local-filesystem equivalent."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isdir(path):
        # same listing rule as has_data_files: recurse (partitioned
        # layouts keep data files in value subdirectories) and prune
        # hidden/_temporary dirs and files
        total = 0
        for root, dirs, files in os.walk(path):
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for f in files:
                if f.endswith(".parquet") and not f.startswith(("_", ".")):
                    total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
        return total
    return pq.ParquetFile(path).metadata.num_rows


def _session_cache(spark: SparkSession) -> "dict[tuple[str, str], DataFrame]":
    cache = getattr(spark, _CACHE_ATTR, None)
    if cache is None:
        cache = {}
        setattr(spark, _CACHE_ATTR, cache)
    return cache


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testbed table (lazy parquet scan).

    ``events.ts`` is parquet TIMESTAMP(NANOS,false) which Spark cannot
    represent; with ``spark.sql.legacy.parquet.nanosAsLong`` it arrives
    as nanos-since-epoch long and is converted here to a microsecond
    timestamp (matching DuckDB's comparison semantics at µs grain).
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    per_session = _session_cache(spark)
    cached = per_session.get((sf_dir, name))
    if cached is not None:
        return cached
    # UTC session pin — UNCONDITIONAL, not just for events: every
    # timestamp column's physical type has drifted across driver
    # rounds (FIXTURES.md), and date/window arithmetic on orders/
    # lineitem is only DuckDB-equivalent under UTC too. The driver
    # passes a vanilla session, so this is the one place that
    # guarantees it regardless of which table loads first. NOTE:
    # conf.get VALIDATES defaults for this key (an empty-string
    # fallback throws INVALID_CONF_VALUE), so resolve without one;
    # only set when wrong — a redundant set invalidates plan state.
    tz_key = "spark.sql.session.timeZone"
    try:
        cur_tz = spark.conf.get(tz_key)
    except Exception:
        cur_tz = None
    if cur_tz != "UTC":
        spark.conf.set(tz_key, "UTC")
    if name == "events":
        # Runtime-settable; don't depend on who built the SparkSession.
        key = "spark.sql.legacy.parquet.nanosAsLong"
        if spark.conf.get(key, "false") != "true":
            spark.conf.set(key, "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # nanos file + nanosAsLong: integer division — ts exceeds
            # 2^53, float division rounds off.
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # µs parquet timestamps (isAdjustedToUTC=false) infer as
            # TIMESTAMP_NTZ in Spark 4. Session tz is UTC, so casting
            # to TIMESTAMP is value-preserving and keeps the whole
            # query layer (window(), unix_micros, ...) on one type.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    per_session[(sf_dir, name)] = df
    return df


def spread(
    df: DataFrame,
    min_partitions: int | None = None,
    by: "list[str] | None" = None,
) -> DataFrame:
    """Repartition up to the session's default parallelism before
    compute-heavy per-row work (hashing, shingling, UDF kernels).

    A single small parquet file scans as ONE partition (parquet can't
    split below a row group), serializing heavy expression work onto
    one core. At 100 TB the scan already yields thousands of
    partitions, so this is a no-op there — only the tiny-file case
    pays the extra (cheap) shuffle.

    ``by``: hash-partition on these columns instead of round-robin —
    free exchange reuse when we're shuffling anyway: a downstream
    groupBy/window whose keys start with (or equal) ``by`` satisfies
    its ClusteredDistribution from this exchange and plans NO new one
    (EnsureRequirements). At scale, where spread() is a no-op, the
    downstream ops keep their own map-side-combined exchanges — the
    right plan there; ``by`` only piggybacks keys onto a shuffle the
    tiny-file case already pays."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if _num_partitions(df) < target:
        return df.repartition(target, *by) if by else df.repartition(target)
    return df


def spread_by_bytes(
    df: DataFrame,
    split_bytes: int = 64 * 1024,
    by: "list[str] | None" = None,
) -> DataFrame:
    """``spread()`` with the target derived from the INPUT SIZE instead
    of the session's core count (optimization r13, guide §2: make
    partitioning scale-adaptive — derive from input size — rather than
    a constant tuned for either local mode or the cluster).

    For LIGHT per-row passes (tokenize + map-side count), a
    core-count target gives each task a few ms of work at small
    inputs, so the stage wall is task-launch overhead times cores —
    measured 0.25 s for 32 tasks vs 0.15 s for 8 on the same 270k-token
    scan (plans/r13 sketch record): the query got SLOWER as cores grew.
    Sizing by bytes (~64 KB/task of text) keeps per-task work above the
    launch cost at any core count; the cap at defaultParallelism keeps
    the big-input case identical to spread() (and at real scale the
    scan's own splits exceed any target, so this is a no-op exactly
    like spread). Size comes from plan stats (parquet footer — no job).

    For HEAVY per-row work (pandas kernels, shingling) keep spread():
    there the per-task work dwarfs launch overhead and idle cores are
    the waste.

    ``by``: hash-partition on these columns instead of round-robin
    (same contract as spread's ``by`` — downstream groupBy/window
    keyed on a prefix of ``by`` reuses this exchange)."""
    sc = df.sparkSession.sparkContext
    stats_bytes = int(
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
    )
    target = max(1, min(sc.defaultParallelism, -(-stats_bytes // split_bytes)))
    if _num_partitions(df) < target:
        return df.repartition(target, *by) if by else df.repartition(target)
    return df


# df.rdd.getNumPartitions() runs the physical planner (~100 ms); the
# input split count of an immutable plan never changes, so probe once.
_NPART_CACHE: "weakref.WeakKeyDictionary[DataFrame, int]" = weakref.WeakKeyDictionary()


def _num_partitions(df: DataFrame) -> int:
    n = _NPART_CACHE.get(df)
    if n is None:
        n = df.rdd.getNumPartitions()
        _NPART_CACHE[df] = n
    return n


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testbed table as a temp view (for spark.sql use)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
