"""Group J — UDF / UDAF / UDTF surface (SURVEY.md §2.2 group J).

Reference ties: R3 (yaml.safe_load scalar parse -> scalar UDF),
R5 (README line splitter -> UDTF).

Scale notes: the scalar UDF is deliberately the SLOW path shown next
to its native-expression equivalence (the oracle); real pipelines use
the Arrow-batched pandas UDF (j_pandas_udf_agg) which transfers
columnar batches and vectorizes in numpy/pandas.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as STypes

from sparkclif.io import table
from sparkclif.registry import register


@register(
    "j_udf_scalar",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def j_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python scalar UDF (the reference's yaml.safe_load
    analog, metadata.py:38-41) — same pure function the oracle states
    in SQL. Kept off hot paths by design."""

    @F.udf(STypes.LongType())
    def parse_k(props: str) -> int | None:
        try:
            return int(json.loads(props)["k"])
        except Exception:
            return None

    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(parse_k("props")).alias("sum_k"),
    )


@register(
    "j_pandas_udf_agg",
    oracle="""
    SELECT event_id, user_id,
           round((value - avg(value) OVER w)
                 / nullif(stddev_samp(value) OVER w, 0), 4) + 0.0 AS znorm
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
)
def j_pandas_udf_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized per-group normalization via applyInPandas (Arrow
    batches, pandas kernel): znorm = (v - mean)/std with SAMPLE stddev
    (pandas ddof=1 == stddev_samp — pinned, SURVEY.md §2.2).

    Grouped on a COARSENED key (hash(user_id) into 64 buckets), with
    the per-user groupby vectorized inside the kernel: a grouped-map
    UDF pays fixed cost per GROUP INVOCATION, so keying directly on a
    high-cardinality column (1 user ≈ a handful of rows) drowns in
    per-group overhead. All rows of a user share a bucket, so the
    per-user statistics are exact."""
    ev = table(spark, sf_dir, "events").select("event_id", "user_id", "value")

    def znorm(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        g = pdf.groupby("user_id")["value"]
        mean = g.transform("mean")
        std = g.transform("std")  # ddof=1 == stddev_samp
        raw = (pdf["value"] - mean) / std.where(std != 0)
        # half AWAY FROM ZERO, the engine-wide rounding convention
        # (Spark/DuckDB round) — pandas .round(4) is half-to-even and
        # disagrees on .xxxx5 grid points (see multimodal._r4)
        # `+ 0.0` flips a rounded -0.0 (tiny negative deviation) to
        # +0.0 on both engines — the driver hash stringifies cells,
        # so a sign-of-zero disagreement is a hash fail (r7 class).
        z = np.floor(np.abs(raw) * 1e4 + 0.5) / 1e4 * np.sign(raw) + 0.0
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "znorm": z}
        )

    return (
        ev.groupBy(F.pmod(F.hash("user_id"), F.lit(64)).alias("__g"))
        .applyInPandas(znorm, "event_id long, user_id long, znorm double")
    )


@register(
    "j_udtf",
    oracle="""
    SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> trim(x) <> '')) AS tok
    FROM documents
    """,
)
def j_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: one doc row -> N token rows (the reference's README
    line-splitter R5 as a table function). Input is spread() first: a
    single-file scan is one partition, which would serialize the
    Python workers onto one core (halves the wall-clock at sf0.1;
    no-op at cluster scale)."""
    from pyspark.sql.functions import udtf

    from sparkclif.io import spread_by_bytes

    @udtf(returnType="doc_id bigint, tok string")
    class SplitWords:
        def eval(self, doc_id: int, text: str):
            for tok in text.split(" "):
                if tok.strip():
                    yield doc_id, tok

    spark.udtf.register("split_words", SplitWords)
    spread_by_bytes(table(spark, sf_dir, "documents")).createOrReplaceTempView(
        "__docs_for_udtf"
    )
    return spark.sql(
        "SELECT s.doc_id, s.tok FROM __docs_for_udtf d, "
        "LATERAL split_words(d.doc_id, d.text) s"
    )
