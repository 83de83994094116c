"""Sampling / packing / PII operators (round-3 group-I additions):
partition-count invariance for the distributed prefix sum, hash-bucket
determinism + rate sanity, and scrub semantics on crafted rows."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sparkclif.io import table
from sparkclif.operators import text as T
from sparkclif.operators.sampling import (
    pack_sequences,
    portable_bucket,
    stratified_sample_stats,
)


def test_pack_sequences_matches_single_window(spark, sf_dir):
    """The distributed prefix sum must equal the plain global-window
    formulation REGARDLESS of partition count (offsets, not luck)."""
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", T.token_count("text").cast("long").alias("n_tok")
    )
    rows = sorted(docs.collect())
    # ground truth: running sum in plain Python
    run, truth = 0, {}
    for doc_id, n_tok in rows:
        truth[doc_id] = run // 2048
        run += n_tok
    for n_part in (1, 3, 16):
        got = {
            r["doc_id"]: r["shard_id"]
            for r in pack_sequences(
                docs,
                "doc_id",
                "n_tok",
                budget=2048,
                num_partitions=n_part,
                force="distributed",
            ).collect()
        }
        assert got == truth, f"shard drift at num_partitions={n_part}"
    # the small-input window path (what cost dispatch picks at this
    # size) must agree bit-for-bit with the distributed path
    got_w = {
        r["doc_id"]: r["shard_id"]
        for r in pack_sequences(
            docs, "doc_id", "n_tok", budget=2048, force="window"
        ).collect()
    }
    assert got_w == truth, "window fast path drifted from ground truth"


def test_dispatch_contract(spark, sf_dir):
    """Cost-dispatch contract: an explicit ``num_partitions`` pins the
    distributed path even on a small input (the single-task window
    cannot honor a partitioning request), and a mistyped ``force``
    raises instead of silently pinning whichever path the if-chain
    falls through to."""
    import pytest

    from sparkclif.operators.corpus import segment_dedup
    from sparkclif.operators.rank import exact_percentiles
    from sparkclif.operators.sampling import grouped_rank

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", T.token_count("text").cast("long").alias("n_tok")
    )
    # sf0.001 docs sit well under SMALL_INPUT_BYTES: without the
    # explicit num_partitions this would auto-pick the window path
    out = pack_sequences(docs, "doc_id", "n_tok", budget=2048, num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, "num_partitions was ignored"

    tiny = spark.range(4).selectExpr(
        "cast(id as string) AS doc_id", "'a b c d e' AS text"
    )
    for call in (
        lambda: pack_sequences(docs, "doc_id", "n_tok", budget=2048, force="widnow"),
        lambda: grouped_rank(docs, "doc_id", "n_tok", force="auto"),
        lambda: segment_dedup(tiny, force="distributed"),  # not a segment_dedup path
        lambda: exact_percentiles(docs, "doc_id", [("n_tok", 0.5, "p50")], force="Window"),
    ):
        with pytest.raises(ValueError, match="force must be one of"):
            call()


def test_portable_bucket_matches_hashlib(spark):
    """The engine-portable bucket is pinned to md5 semantics — guards
    against conv/md5/cast drift across Spark versions."""
    df = spark.createDataFrame([(i,) for i in range(200)], "k long")
    got = {
        r["k"]: r["b"]
        for r in df.select("k", portable_bucket(F.col("k")).alias("b")).collect()
    }
    for k in range(200):
        expect = int(hashlib.md5(str(k).encode()).hexdigest()[24:32], 16) % 100
        assert got[k] == expect


def test_stratified_sample_rate_and_determinism(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    a = {r["lang"]: r for r in stratified_sample_stats(docs, "lang", "doc_id").collect()}
    b = {r["lang"]: r for r in stratified_sample_stats(docs, "lang", "doc_id").collect()}
    assert a.keys() == b.keys()
    total = sampled = 0
    for lang in a:
        assert a[lang]["n_sampled"] == b[lang]["n_sampled"]  # deterministic
        total += a[lang]["n_total"]
        sampled += a[lang]["n_sampled"]
    # ~10% overall; md5 is uniform enough for a wide tolerance
    assert 0.04 < sampled / total < 0.18


def test_pii_scrub_semantics(spark):
    df = spark.createDataFrame(
        [
            (1, "mail a.b-c_d@foo-bar.example.org now"),
            (2, "call 555-123-4567 twice 555-123-4567"),
            (3, "from 192.168.0.1 to 10.0.255.254"),
            (4, "overlap 123-456-7890 vs 1.2.3.4 and x@y.io"),
            (5, "clean text with no identifiers at all"),
        ],
        "id long, text string",
    )
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            T.pii_scrub("text").alias("clean"),
            T.pii_count("text", T.PII_PATTERNS[0][1]).alias("n_email"),
            T.pii_count("text", T.PII_PATTERNS[1][1]).alias("n_phone"),
        ).collect()
    }
    assert rows[1]["clean"] == "mail <EMAIL> now"
    assert rows[2]["clean"] == "call <PHONE> twice <PHONE>"
    assert rows[3]["clean"] == "from <IP> to <IP>"
    assert rows[4]["clean"] == "overlap <PHONE> vs <IP> and <EMAIL>"
    assert rows[5]["clean"] == "clean text with no identifiers at all"
    assert rows[1]["n_email"] == 1 and rows[2]["n_phone"] == 2


def test_simhash_matches_pure_python(spark):
    """Pin simhash64 to a hashlib reimplementation: guards the
    md5-basis (which the DuckDB oracle also reproduces) against
    conv/substring/cast drift."""
    from sparkclif.operators.dedup import simhash64

    texts = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "single"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: r["simhash"] for r in simhash64(df).collect()}

    import re

    for doc_id, text in texts:
        toks = []
        for t in re.split(r"\s+", text):
            if t and t not in toks:
                toks.append(t)
        hashes = [int(hashlib.md5(t.encode()).hexdigest()[16:32], 16) for t in toks]
        fp = 0
        for bit in range(64):
            ones = sum((h >> bit) & 1 for h in hashes)
            if 2 * ones > len(hashes):
                fp |= 1 << bit
        if fp >= 1 << 63:  # two's complement int64
            fp -= 1 << 64
        assert got[doc_id] == fp, f"doc {doc_id}"


def test_pps_priority_pinned_to_hashlib(spark):
    """The PPS priority must equal (md5-28bit('pps|'||id)+1)/w computed
    with hashlib — the portable-basis pin (and weight<=0 clamps to 1)."""
    from sparkclif.operators.sampling import pps_sample_topk

    df = spark.createDataFrame(
        [(1, 100), (2, 7), (3, 0)], "doc_id long, w long"
    )
    got = {
        r["doc_id"]: (r["weight"], r["priority"])
        for r in pps_sample_topk(df, "doc_id", "w", k=3).collect()
    }
    for doc_id, w in [(1, 100), (2, 7), (3, 0)]:
        h = int(hashlib.md5(f"pps|{doc_id}".encode()).hexdigest()[17:24], 16)
        pri = round((h + 1) / max(w, 1), 4)
        assert got[doc_id] == (w, pri), doc_id


def test_pps_weight_monotonicity(spark, sf_dir):
    """Doubling every weight halves every priority — the sample is
    scale-invariant in the weights (only ratios matter)."""
    from sparkclif.operators.sampling import pps_sample_topk

    docs = table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("w")
    )
    base = [r["doc_id"] for r in pps_sample_topk(docs, "doc_id", "w", k=40).collect()]
    doubled = [
        r["doc_id"]
        for r in pps_sample_topk(
            docs.withColumn("w", F.col("w") * 2), "doc_id", "w", k=40
        ).collect()
    ]
    assert base == doubled


def test_pps_heavier_rows_sampled_more(spark):
    """With 1000 rows where ids 0..99 carry 50x the weight of the
    rest, the k=100 sample must be dominated by heavy rows (PPS
    semantics, not uniform)."""
    from sparkclif.operators.sampling import pps_sample_topk

    rows = [(i, 5000 if i < 100 else 100) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    picked = [
        r["doc_id"] for r in pps_sample_topk(df, "doc_id", "w", k=100).collect()
    ]
    heavy = sum(1 for i in picked if i < 100)
    # E[heavy] ~ 85 of 100; uniform would give ~10
    assert heavy > 60, heavy
