"""Group A — scans / sources / sinks (SURVEY.md §2.2 group A).

Reference ties: R5/R6 (line split + blank filter, metadata.py:54-58),
R14/R15 (JSON document load/sink, state.py:44-90), R25 (single-column
text scan, mcide.py:33-39).

Scale notes: every query here is a single parquet scan with pushdown;
``a_scan_parquet`` aggregates via partial+final (no wide shuffle of raw
rows), ``a_scan_text_lines`` keeps the token pipeline inside array
lambdas (no explode => no row blowup), ``a_sink_roundtrip`` writes
columnar and re-reads with column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkclif.numeric import fixed_sum
from sparkclif.io import table
from sparkclif.registry import register
from sparkclif.session import tmp_dir


@register(
    "a_scan_parquet",
    oracle="""
    SELECT count(*) AS n_rows,
           min(l_orderkey) AS min_orderkey,
           max(l_orderkey) AS max_orderkey,
           min(l_shipdate) AS min_shipdate,
           max(l_shipdate) AS max_shipdate,
           round(min(l_extendedprice), 4) AS min_price,
           round(max(l_extendedprice), 4) AS max_price,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE), 4) AS sum_qty
    FROM lineitem
    """,
)
def a_scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar scan + per-column min/max/count (footer-stat friendly)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.min("l_orderkey").alias("min_orderkey"),
        F.max("l_orderkey").alias("max_orderkey"),
        F.min("l_shipdate").alias("min_shipdate"),
        F.max("l_shipdate").alias("max_shipdate"),
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
        fixed_sum("l_quantity").alias("sum_qty"),
    )


@register(
    "a_scan_text_lines",
    oracle="""
    SELECT doc_id,
           len(toks) AS n_tokens,
           toks[1] AS first_token,
           toks[-1] AS last_token
    FROM (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> trim(x) <> '') AS toks
        FROM documents
    )
    """,
)
def a_scan_text_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line/token scan: split -> trim -> drop blanks (mCIDE CSV semantics,
    reference mcide.py:33-39 / metadata.py:54-58), kept inside array
    lambdas so no row explosion happens at scale."""
    docs = table(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.col("text"), " "), lambda x: F.trim(x) != "")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        # try_element_at: ANSI-mode element_at throws on an empty token
        # array (all-whitespace doc); the oracle's toks[1] yields NULL
        F.try_element_at(toks, F.lit(1)).alias("first_token"),
        F.try_element_at(toks, F.lit(-1)).alias("last_token"),
    )


@register(
    "a_scan_json_string",
    oracle="""
    SELECT event_type,
           count(*) AS n_events,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
           max(CAST(props->>'$.k' AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def a_scan_json_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string extraction (reference R3/R14: yaml/json parse into
    fixed schema, metadata.py:38-41)."""
    ev = table(spark, sf_dir, "events")
    # project the parse FIRST so the JSON is parsed once per row; as
    # three agg-child expressions it would be parsed three times
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "a_sink_roundtrip",
    cache_plan=False,
    # The write->re-read is an identity on the projected columns, so the
    # post-roundtrip aggregate is directly checkable against lineitem.
    oracle="""
    SELECT count(*) AS n_rows,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE), 4) AS sum_qty,
           round(CAST(sum(CAST(round(l_extendedprice, 4) AS DECIMAL(38,6))) AS DOUBLE), 4)
               AS sum_price,
           CAST(sum(CAST(l_orderkey AS BIGINT) * l_linenumber) AS BIGINT) AS key_checksum
    FROM lineitem
    """,
)
def a_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a projection to parquet, re-read, return a checksum row.

    Reference tie: R15 (JSON document sink, state.py:70-90) — but the
    engine's canonical sink is columnar parquet, partition-parallel,
    instead of the reference's whole-file rewrite per mutation."""
    out = tmp_dir() + "/roundtrip.parquet"
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )
    # scratch roundtrip on local tmpfs: skip compression (measured
    # ~25% faster write+read than snappy), page CRCs and dictionary
    # encoding (another -25% write wall; numeric columns here don't
    # dictionary-compress anyway). A durable 100 TB sink keeps all
    # three — storage economics and integrity dominate there.
    (
        li.write.option("compression", "uncompressed")
        .option("parquet.page.write-checksum.enabled", "false")
        .option("parquet.enable.dictionary", "false")
        .mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return back.agg(
        F.count("*").alias("n_rows"),
        fixed_sum("l_quantity").alias("sum_qty"),
        fixed_sum("l_extendedprice", scale=4).alias("sum_price"),
        F.sum(F.col("l_orderkey") * F.col("l_linenumber")).cast("long").alias("key_checksum"),
    )


@register(
    "a_sink_partitioned",
    cache_plan=False,
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE), 4) AS sum_price
    FROM lineitem
    WHERE l_returnflag = 'R'
    GROUP BY l_returnflag
    """,
)
def a_sink_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned sink + partition-pruned re-read: write lineitem
    partitioned by l_returnflag, read back one partition. The re-read
    filter prunes at the directory level (PartitionFilters, zero
    non-matching files opened) — the layout that makes 100 TB fact
    tables scannable. The write itself is the exercised sink."""
    out = tmp_dir() + "/partitioned.parquet"
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_orderkey"
    )
    # Writer layout: cluster by the partition column WITH a small salt,
    # at EVERY size (the r6 size dispatch is gone — ADVICE r6 flagged
    # that a plan-stats under-read could silently take the no-shuffle
    # path on a big input and emit tasks x values small files; the
    # salted shuffle is also simply faster here, 0.58 s vs 0.71 s
    # warm best-of-3, because the single 128 MB scan split otherwise
    # serializes the whole encode onto one writer task).
    # repartition(col) alone would serialize each partition value onto
    # ONE writer (a straggler at scale); no repartition emits
    # tasks x values small files — the classic partitioned-sink
    # mistake. The salt keeps a bounded k writers per value: files
    # stay O(k * values) and writers parallelize; at 100 TB size k
    # to the per-value volume.
    # scratch sink on tmpfs: uncompressed, no page CRCs, no dictionary
    # pass (see a_sink_roundtrip note)
    salt = F.pmod(F.xxhash64("l_orderkey"), F.lit(4))
    li = li.repartition(12, F.col("l_returnflag"), salt)
    (
        li.write.option("compression", "uncompressed")
        .option("parquet.page.write-checksum.enabled", "false")
        .option("parquet.enable.dictionary", "false")
        .partitionBy("l_returnflag")
        .mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    return back.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        fixed_sum("l_extendedprice").alias("sum_price"),
    )


@register(
    "a_sink_csv_roundtrip",
    cache_plan=False,
    # identity roundtrip on the projected columns => aggregate checks
    # directly against orders
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS n_status,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE), 4)
               AS sum_price,
           CAST(sum(o_orderkey * o_custkey) AS BIGINT) AS key_checksum
    FROM orders
    """,
)
def a_sink_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + source: write an orders projection as headered CSV,
    re-read with an EXPLICIT schema (schema inference reads the data
    twice and guesses — never on a 100 TB interchange path), return a
    checksum row. Doubles survive the text roundtrip exactly: the JVM
    writes shortest-round-trip decimal and the reader parses it back
    to the identical bit pattern."""
    out = tmp_dir() + "/roundtrip.csv"
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    orders = table(spark, sf_dir, "orders").select(*cols)
    # CSV encode is CPU-bound text formatting — when the scan yields
    # fewer splits than cores (here: one 128 MB-bound local split),
    # fan out before the write (0.57 s vs 0.72 s warm best-of-3). A
    # multi-file 100 TB input already scans wide, so the shuffle is
    # skipped there; parquet encode is cheap enough that the same move
    # LOSES on a_sink_roundtrip (measured 0.94 vs 0.54) — only the
    # text sink pays for the fan-out.
    n_parts = orders.rdd.getNumPartitions()
    target = min(16, spark.sparkContext.defaultParallelism)
    if n_parts < target:
        orders = orders.repartition(target)
    orders.write.option("header", "true").mode("overwrite").csv(out)
    back = spark.read.schema(
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double"
    ).option("header", "true").csv(out)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderstatus").cast("long").alias("n_status"),
        fixed_sum("o_totalprice").alias("sum_price"),
        F.sum(F.col("o_orderkey") * F.col("o_custkey")).cast("long").alias("key_checksum"),
    )


@register(
    "a_sink_orc_roundtrip",
    cache_plan=False,
    oracle="""
    SELECT count(*) AS n_rows,
           CAST(sum(p_size) AS BIGINT) AS sum_size,
           round(CAST(sum(CAST(p_retailprice AS DECIMAL(30,6))) AS DOUBLE), 4)
               AS sum_price,
           CAST(count(DISTINCT p_brand) AS BIGINT) AS n_brands
    FROM part
    """,
)
def a_sink_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source (the second columnar interchange format the
    JVM ships natively): write part, re-read, checksum. Same pushdown/
    pruning machinery as parquet on the read side — a format choice,
    not a planner change."""
    out = tmp_dir() + "/roundtrip.orc"
    part = table(spark, sf_dir, "part")
    part.write.option("compression", "uncompressed").mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.agg(
        F.count("*").alias("n_rows"),
        F.sum("p_size").cast("long").alias("sum_size"),
        fixed_sum("p_retailprice").alias("sum_price"),
        F.countDistinct("p_brand").cast("long").alias("n_brands"),
    )
