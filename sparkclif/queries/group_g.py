"""Group G — scalar functions & CLIF-semantic composites (SURVEY.md
§2.2 group G).

Reference ties: R1 (URL rewrite), R7-R10 (the parse_repo README
pipeline, metadata.py:59-66), R19/R22 (formatting), R33 (truncation),
plus g_reminder_sweep = the README.md:10 promised-but-never-implemented
reminder feature, implemented as a real relational query.

Scale notes: pure per-row expression pipelines — whole-stage codegen,
no shuffle except the final small aggregates; regex work stays JVM-side
(no Python UDFs on the hot path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sparkclif.numeric import fixed_sum
from sparkclif.io import table
from sparkclif.registry import register


@register(
    "g_string_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           length(c_name) AS name_len,
           substring(c_mktsegment, 1, 3) AS seg3,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS key_padded,
           rpad(c_mktsegment, 12, '.') AS seg_padded,
           printf('%s#%04d', c_mktsegment, c_custkey) AS fmt,
           replace(c_name, 'Customer', 'Cust') AS replaced,
           split_part(c_name, '#', 1) AS name_prefix,
           trim(concat(' ', c_mktsegment, ' ')) AS trimmed,
           CASE WHEN length(c_name) > 12
                THEN concat(substring(c_name, 1, 9), '...')
                ELSE c_name END AS truncated
    FROM customer
    """,
)
def g_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's entire string surface in one projection:
    substring/length/case/trim/pad/concat/replace/split_part/
    format_string (R1, R19, R22, R31) + the 25->22+'...' truncation
    rule of state.py:155-157 (R33 analog, width 12->9 here)."""
    c = table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.length("c_name").alias("name_len"),
        F.substring("c_mktsegment", 1, 3).alias("seg3"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_padded"),
        F.rpad("c_mktsegment", 12, ".").alias("seg_padded"),
        F.format_string("%s#%04d", "c_mktsegment", "c_custkey").alias("fmt"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias("replaced"),
        F.split_part(F.col("c_name"), F.lit("#"), F.lit(1)).alias("name_prefix"),
        F.trim(F.concat(F.lit(" "), F.col("c_mktsegment"), F.lit(" "))).alias("trimmed"),
        F.when(
            F.length("c_name") > 12,
            F.concat(F.substring("c_name", 1, 9), F.lit("...")),
        )
        .otherwise(F.col("c_name"))
        .alias("truncated"),
    )


@register(
    "g_regex_extract",
    oracle="""
    SELECT doc_id,
           regexp_replace(regexp_extract(text, '^\\s*(\\S+)', 1), '^#*', '') AS title_token,
           regexp_extract(text, '(?i)tables? (\\w+)', 1) AS after_tables,
           CAST(len(regexp_extract_all(text, 'value')) AS BIGINT) AS n_value,
           CAST(len(string_split_regex(text, '[,;]')) AS BIGINT) AS n_parts,
           array_to_string(
               list_filter(string_split_regex(
                   concat(lang, ';', source, ',', substring(text, 1, 5)), '[,;]'),
                   x -> trim(x) <> ''),
               '|') AS split_joined
    FROM documents
    """,
)
def g_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The parse_repo README pipeline (metadata.py:59-66, R7-R10),
    relationally: first-token title with heading strip, case-insensitive
    'tables ...' capture, occurrence count, [,;] delimited-list split ->
    trim -> drop empties -> join."""
    docs = table(spark, sf_dir, "documents")
    parts = F.split(F.concat_ws("", F.col("lang"), F.lit(";"), F.col("source"), F.lit(","), F.substring("text", 1, 5)), "[,;]")
    return docs.select(
        "doc_id",
        F.regexp_replace(F.regexp_extract("text", r"^\s*(\S+)", 1), "^#*", "").alias(
            "title_token"
        ),
        F.regexp_extract("text", r"(?i)tables? (\w+)", 1).alias("after_tables"),
        F.regexp_count("text", F.lit("value")).cast("long").alias("n_value"),
        F.size(F.split("text", "[,;]")).cast("long").alias("n_parts"),
        F.array_join(
            F.filter(parts, lambda x: F.trim(x) != ""), "|"
        ).alias("split_joined"),
    )


@register(
    "g_date_funcs",
    oracle="""
    SELECT CAST(year(o_orderdate) AS INT) AS o_year,
           CAST(month(o_orderdate) AS INT) AS o_month,
           count(*) AS n_orders,
           count(DISTINCT CAST(dayofweek(o_orderdate) AS INT) + 1) AS n_dows,
           min(CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS BIGINT) * 86400)
               AS min_epoch,
           max(CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP)) AS max_plus3m,
           CAST(sum(CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT))
               AS BIGINT) AS sum_days_since
    FROM orders
    GROUP BY 1, 2
    """,
)
def g_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time expression surface: year/month/dayofweek/epoch/
    add_months/datediff, rolled up per calendar month."""
    o = table(spark, sf_dir, "orders")
    return (
        o.select(
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
            F.dayofweek("o_orderdate").alias("dow"),  # 1=Sunday (DuckDB dayofweek+1)
            # tz-free epoch: days-since-epoch * 86400 (unix_timestamp would
            # depend on the driver session's spark.sql.session.timeZone)
            (
                F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
                .cast("long")
                * 86400
            ).alias("epoch_s"),
            F.add_months("o_orderdate", 3).cast("timestamp").alias("plus3m"),
            F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("date")).alias(
                "days_since"
            ),
        )
        .groupBy("o_year", "o_month")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("dow").alias("n_dows"),
            F.min("epoch_s").alias("min_epoch"),
            F.max("plus3m").alias("max_plus3m"),
            F.sum("days_since").cast("long").alias("sum_days_since"),
        )
    )


@register(
    "g_math_funcs",
    oracle="""
    SELECT l_returnflag,
           round(CAST(sum(CAST(round(l_extendedprice, 1) AS DECIMAL(30,6))) AS DOUBLE), 4) AS sum_rounded,
           round(CAST(sum(CAST(round(abs(l_discount - 0.05), 6) AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_absdev,
           round(sum(CAST(ceil(l_quantity) AS DOUBLE)), 4) AS sum_ceil,
           round(sum(CAST(floor(l_quantity) AS DOUBLE)), 4) AS sum_floor,
           CAST(sum(((CAST(l_orderkey AS BIGINT) % 7) + 7) % 7) AS BIGINT) AS sum_pmod,
           round(CAST(sum(CAST(round(sqrt(l_quantity), 6) AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_sqrt,
           round(CAST(sum(CAST(round(ln(l_extendedprice + 1), 6) AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_ln,
           round(CAST(sum(CAST(round(pow(l_discount, 2), 6) AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_pow,
           round(CAST(sum(CAST(round(greatest(l_quantity, 25.0), 6) AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_greatest,
           round(CAST(sum(CAST(round(least(l_quantity, 25.0), 6) AS DECIMAL(38,6))) AS DOUBLE), 4) AS sum_least
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def g_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math expression surface: round/abs/ceil/floor/pmod/pow/sqrt/ln/
    greatest/least, aggregated per returnflag."""
    li = table(spark, sf_dir, "lineitem")

    def dsum(col):
        # fixed_sum(scale=6) rounds each value at 6 digits and sums
        # exactly — identical to the oracle's round(x, 6) -> DECIMAL
        # sum, with no per-row BigDecimal allocation.
        return fixed_sum(col, scale=6)

    return li.groupBy("l_returnflag").agg(
        fixed_sum("l_extendedprice", scale=1).alias("sum_rounded"),
        dsum(F.abs(F.col("l_discount") - 0.05)).alias("sum_absdev"),
        F.round(F.sum(F.ceil("l_quantity").cast("double")), 4).alias("sum_ceil"),
        F.round(F.sum(F.floor("l_quantity").cast("double")), 4).alias("sum_floor"),
        F.sum(F.pmod(F.col("l_orderkey"), F.lit(7))).cast("long").alias("sum_pmod"),
        dsum(F.sqrt("l_quantity")).alias("sum_sqrt"),
        dsum(F.log(F.col("l_extendedprice") + 1)).alias("sum_ln"),
        dsum(F.pow("l_discount", F.lit(2))).alias("sum_pow"),
        dsum(F.greatest("l_quantity", F.lit(25.0))).alias("sum_greatest"),
        dsum(F.least("l_quantity", F.lit(25.0))).alias("sum_least"),
    )


@register(
    "g_array_funcs",
    oracle="""
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_toks,
           CAST(list_contains(toks, 'value') AS INT) AS has_value,
           array_to_string(list_slice(list_sort(toks), 1, 5), ' ') AS first5_sorted,
           CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS total_chars
    FROM (
        SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
        FROM documents
    )
    """,
)
def g_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface: size/contains/sort/slice/join + transform/filter/
    aggregate lambdas (reference R10 list parse, R19 mention array,
    R30 array_join)."""
    docs = table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_toks"),
        F.array_contains(toks, "value").cast("int").alias("has_value"),
        F.array_join(F.slice(F.array_sort(toks), 1, 5), " ").alias("first5_sorted"),
        F.aggregate(
            F.transform(toks, lambda x: F.length(x).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("total_chars"),
    )


@register(
    "g_map_json_funcs",
    # The map->JSON->map round trip must be LOSSLESS: the exploded
    # output equals the plain relational (user, type, count) facts it
    # started from, which is exactly what this oracle states. (The
    # intermediate JSON string itself stays engine-specific — key
    # order — and is deliberately not part of the checked output.)
    oracle="""
    WITH counts AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
    )
    SELECT user_id,
           CAST(count(*) OVER (PARTITION BY user_id) AS INT) AS n_keys,
           event_type, n
    FROM counts
    """,
)
def g_map_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map + JSON round trip — the legacy nested-JSON document shape of
    reference state.py:44-90 (R14/R15): rows -> map_from_entries ->
    to_json -> from_json -> explode back to rows."""
    ev = table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    as_map = per_user.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("event_type", "n")))
        ).alias("type_counts")
    )
    as_json = as_map.select(
        "user_id",
        F.to_json("type_counts").alias("doc"),
        F.map_keys("type_counts").alias("keys"),
    )
    back = as_json.select(
        "user_id",
        F.size("keys").alias("n_keys"),
        F.from_json("doc", "map<string,bigint>").alias("parsed"),
    )
    return back.select(
        "user_id", "n_keys", F.explode("parsed").alias("event_type", "n")
    )


@register(
    "g_reminder_sweep",
    oracle="""
    WITH pending AS (
        SELECT DISTINCT n_name, c_name
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderstatus IN ('O', 'P')
        )
    )
    SELECT n_name,
           count(*) AS n_pending,
           string_agg(c_name, ' ' ORDER BY c_name) AS mentions
    FROM pending
    GROUP BY n_name
    """,
)
def g_reminder_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The README.md:10 promised-but-unimplemented weekly reminder,
    as a real query (SURVEY.md §0.1): find entities with pending status
    (orderstatus in O/P = status in ❓/🛠), group by dimension, emit an
    ordered mention list (R19 semantics, deterministic order)."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    o = table(spark, sf_dir, "orders")
    pending_cust = (
        c.join(
            o.filter(F.col("o_orderstatus").isin("O", "P")).select(
                F.col("o_custkey").alias("c_custkey")
            ),
            "c_custkey",
            "left_semi",
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", "c_name")
        .distinct()
    )
    return pending_cust.groupBy("n_name").agg(
        F.count("*").alias("n_pending"),
        F.array_join(F.array_sort(F.collect_list("c_name")), " ").alias("mentions"),
    )
