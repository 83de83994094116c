"""Crafted-input tests for round 9's growth operators: the BPE merge
pass (greedy non-overlap, merge ordering, merged-symbol re-matching in
LATER passes, NULL-merge no-op), the registrable-domain public-suffix
rule (label counts, multi-label suffixes, degenerate hosts), and the
quality classifier's exact-integer contract (empty/NULL docs, weight
law pinned to hashlib, keep/drop boundary)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from sparkclif.operators.corpus import BPE_SEP, _bpe_merge_pass


def _encode(spark, words, merges):
    """Apply `merges` (list of (l, r)) in order to each word; return
    {word: [tokens]}."""
    df = spark.createDataFrame([(w,) for w in words], ["word"])
    packed = F.array_join(F.split("word", ""), BPE_SEP)
    for l, r in merges:
        packed = _bpe_merge_pass(
            packed,
            F.lit(l).cast("string") if l is not None else F.lit(None).cast("string"),
            F.lit(r).cast("string") if r is not None else F.lit(None).cast("string"),
        )
    out = df.select("word", F.split(packed, BPE_SEP).alias("toks")).collect()
    return {r["word"]: r["toks"] for r in out}


def test_bpe_merge_pass_greedy_non_overlapping(spark):
    enc = _encode(spark, ["banana", "aaa", "b", "nan"], [("a", "n")])
    assert enc["banana"] == ["b", "an", "an", "a"]
    # greedy left-to-right: 'aaa' under (a,n) untouched
    assert enc["aaa"] == ["a", "a", "a"]
    assert enc["b"] == ["b"]
    assert enc["nan"] == ["n", "an"]


def test_bpe_merge_pass_overlap_is_left_greedy(spark):
    # 'aaa' under (a,a): positions 1 and 2 overlap; greedy takes 1
    enc = _encode(spark, ["aaa", "aaaa"], [("a", "a")])
    assert enc["aaa"] == ["aa", "a"]
    assert enc["aaaa"] == ["aa", "aa"]


def test_bpe_later_merge_sees_earlier_symbol(spark):
    # pass 1 makes 'an'; pass 2 merges the two 'an' symbols
    enc = _encode(spark, ["banana"], [("a", "n"), ("an", "an")])
    assert enc["banana"] == ["b", "anan", "a"]
    # and a merged symbol never re-matches its own left in one pass:
    # (a,a) on 'aaaa' -> [aa,aa], the new 'aa' does not re-pair; the
    # LATER (aa,a) pass then merges the trailing [aa, a] of 'aaaaa'
    enc2 = _encode(spark, ["aaaa", "aaaaa"], [("a", "a"), ("aa", "a")])
    assert enc2["aaaa"] == ["aa", "aa"]
    assert enc2["aaaaa"] == ["aa", "aaa"]


def test_bpe_null_merge_is_noop(spark):
    enc = _encode(spark, ["banana"], [("a", "n"), (None, None)])
    assert enc["banana"] == ["b", "an", "an", "a"]


def test_registrable_domain_rules(spark):
    from sparkclif.operators.dedup import registrable_domain

    hosts = [
        "docs.example.com",
        "www.example.com",
        "example.com",
        "api.site.co.uk",
        "cdn1.site.gov.uk",
        "deep.sub.host.ac.jp",
        "co.uk",          # exactly 2 labels: last-2 rule, never last-3
        "localhost",      # 1 label: unchanged
        "a.b.c.d.e",      # plain deep host: last 2
    ]
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    out = {
        r["host"]: r["d"]
        for r in df.select("host", registrable_domain("host").alias("d")).collect()
    }
    assert out["docs.example.com"] == "example.com"
    assert out["www.example.com"] == "example.com"
    assert out["example.com"] == "example.com"
    assert out["api.site.co.uk"] == "site.co.uk"
    assert out["cdn1.site.gov.uk"] == "site.gov.uk"
    assert out["deep.sub.host.ac.jp"] == "host.ac.jp"
    assert out["co.uk"] == "co.uk"
    assert out["localhost"] == "localhost"
    assert out["a.b.c.d.e"] == "d.e"


def test_quality_classifier_weight_law_pinned_to_hashlib(spark, sf_dir):
    """Recompute one doc's score with hashlib + pure Python and pin
    the engine to it — the md5-bits basis contract."""
    from sparkclif.queries.group_r9 import i_quality_classifier
    from sparkclif.io import table

    out = {
        r["doc_id"]: r
        for r in i_quality_classifier(spark, sf_dir).collect()
    }
    doc = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") == 0)
        .select("text")
        .collect()[0]["text"]
    )
    toks = [t for t in doc.split() if t]
    score = 0
    for t in toks:
        b = int(hashlib.md5(t.encode()).hexdigest()[24:32], 16) % 64
        score += (b * 2654435761) % 2001 - 1000
    row = out[0]
    assert row["n_tokens"] == len(toks)
    assert row["score_int"] == score
    assert row["label"] == ("keep" if score > 0 else "drop")
    assert row["score"] == score / (1000.0 * max(len(toks), 1))


def test_quality_classifier_empty_and_null_docs(spark):
    from sparkclif.queries.group_r9 import quality_classifier_plan

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "   "), (4, "x")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["score_int"], r["label"])
        for r in quality_classifier_plan(df).collect()
    }
    assert out[1] == (0, 0, "drop")
    assert out[2] == (0, 0, "drop")
    assert out[3] == (0, 0, "drop")
    assert out[4][0] == 1


def test_bpe_encode_rollup_token_accounting(spark):
    """Tiny corpus with a known merge outcome: total_tokens_wc must
    equal the hand-computed corpus token count after the top merges."""
    from sparkclif.operators.corpus import bpe_encode_rollup

    # 'aa' x3, 'ab' x1 -> pair counts: (a,a)=3, (a,b)=1 -> both merge
    docs = spark.createDataFrame(
        [(1, "aa aa ab"), (2, "aa",)], "doc_id long, text string"
    )
    out = {r["word_len"]: r for r in bpe_encode_rollup(docs, n_merges=2).collect()}
    row = out[2]
    # vocab at len 2: 'aa' (wc 3) -> ['aa'], 'ab' (wc 1) -> ['ab']
    assert row["n_words"] == 2
    assert row["total_wc"] == 4
    assert row["total_tokens_wc"] == 4  # every word one token after merges
    assert row["avg_tokens"] == 1.0
    assert row["example_word"] == "aa"
    assert row["example_enc"] == "aa"


def test_weighted_median_paths_identical_and_array_single_exchange(
    spark, sf_dir
):
    """The r9 cost dispatch: array and window paths agree row-for-row
    on real data; the array path plans exactly ONE exchange (the
    whole point — no window, no second shuffle)."""
    from sparkclif.io import table
    from sparkclif.queries.group_r7 import weighted_median_plan

    li = table(spark, sf_dir, "lineitem")
    a = sorted(map(tuple, weighted_median_plan(li, force="array").collect()))
    w = sorted(map(tuple, weighted_median_plan(li, force="window").collect()))
    assert a == w
    plan = (
        weighted_median_plan(li, force="array")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1, plan


# ---------------------------------------------------------------- property


def _py_merge_pass(syms, l, r):
    """Python model of one greedy left-to-right merge pass."""
    if l is None or r is None:
        return list(syms)
    out = []
    for s in syms:
        if s == r and out and out[-1] == l:
            out[-1] = out[-1] + s
        else:
            out.append(s)
    return out


def test_bpe_merge_pass_matches_python_model(spark):
    """Randomized words/merges vs the pure-Python fold model — the
    packed-string representation must be invisible."""
    import itertools
    import random

    rng = random.Random(909)
    alphabet = "ab"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
        for _ in range(40)
    ]
    pairs = ["".join(p) for p in itertools.product("ab", repeat=2)]
    merges = []
    for _ in range(4):
        merges.append((rng.choice(pairs + list("ab")), rng.choice(list("ab"))))
    got = _encode(spark, sorted(set(words)), merges)
    for w in sorted(set(words)):
        syms = list(w)
        for l, r in merges:
            syms = _py_merge_pass(syms, l, r)
        assert got[w] == syms, (w, merges)


def test_registrable_domain_matches_python_model(spark):
    import random

    from sparkclif.operators.dedup import registrable_domain

    def py_model(host):
        labels = host.split(".")
        if len(labels) < 2:
            return host
        if len(labels) >= 3 and labels[-2] in ("co", "ac", "gov"):
            return ".".join(labels[-3:])
        return ".".join(labels[-2:])

    rng = random.Random(1717)
    parts = ["www", "api", "cdn1", "x", "site", "co", "ac", "gov", "com", "uk", "jp"]
    hosts = sorted(
        {
            ".".join(rng.choice(parts) for _ in range(rng.randint(1, 5)))
            for _ in range(60)
        }
    )
    df = spark.createDataFrame([(h,) for h in hosts], ["host"])
    got = {
        r["host"]: r["d"]
        for r in df.select("host", registrable_domain("host").alias("d")).collect()
    }
    for h in hosts:
        assert got[h] == py_model(h), h


def test_weighted_median_all_null_weight_group_paths_agree(spark):
    """ADVICE r9: a group whose EVERY l_quantity is NULL must yield
    total_w = 0 on both dispatch paths (the window path used to sum
    over all-NULL weights and publish NULL where the array fold's
    per-row coalesce published 0)."""
    from sparkclif.queries.group_r7 import weighted_median_plan

    df = spark.createDataFrame(
        [("g", 5.0, None), ("g", 7.0, None), ("h", 1.0, 2.0)],
        "l_returnflag string, l_extendedprice double, l_quantity double",
    )
    a = sorted(map(tuple, weighted_median_plan(df, force="array").collect()))
    w = sorted(map(tuple, weighted_median_plan(df, force="window").collect()))
    assert a == w
    g_row = [r for r in a if r[0] == "g"][0]
    assert g_row[1] == 0          # total_w: 0, not NULL, on both paths
    assert g_row[3] is None       # no half-total crossing -> no median
    h_row = [r for r in a if r[0] == "h"][0]
    assert h_row[1] == 2 and h_row[3] == 1.0


def test_weighted_median_null_value_group_paths_agree(spark):
    """NULL l_extendedprice rows: the window path counts the (g, NULL)
    bucket once; the array fold must too (review r9 — pv.isNull()
    cannot mark first-row, a nv==0 test can)."""
    from sparkclif.queries.group_r7 import weighted_median_plan

    df = spark.createDataFrame(
        [("g", None, 2.0), ("g", None, 3.0), ("g", 5.0, 4.0), ("g", 7.0, 1.0)],
        "l_returnflag string, l_extendedprice double, l_quantity double",
    )
    a = sorted(map(tuple, weighted_median_plan(df, force="array").collect()))
    w = sorted(map(tuple, weighted_median_plan(df, force="window").collect()))
    assert a == w
    # 3 distinct values: NULL, 5.0, 7.0 — counted once each
    assert a[0][2] == 3


def test_dedup_url_null_id_rows_lose_to_a_real_keeper(spark):
    """ADVICE r9: a NULL-id row whose canonical URL matches a group
    with a real keeper is a RESOLVED duplicate (kept=0) — the r8
    unconditional-singleton rule let true URL duplicates with missing
    ids survive a kept=1 filter. Only an ALL-NULL-id group (no
    deterministic winner) surfaces kept=1 / keeper_id NULL, explicitly
    unresolved rather than silently dropped."""
    from sparkclif.operators.dedup import dedup_url

    df = spark.createDataFrame(
        [
            (None, "https://a.com/x"),   # loses to keeper 7
            (None, "https://a.com/x"),   # loses to keeper 7
            (7, "https://a.com/x"),      # the group's keeper
            (None, "https://b.com/y"),   # all-NULL-id group: unresolved
            (None, "https://b.com/y"),
            (None, "%%%not a url"),      # NULL id AND unparseable
        ],
        "doc_id long, url string",
    )
    rows = dedup_url(df).collect()
    a_group = [r for r in rows if r["canon_url"] == "https://a.com/x"]
    assert len(a_group) == 3
    for r in a_group:
        assert r["group_size"] == 3 and r["keeper_id"] == 7
        assert r["kept"] == (1 if r["doc_id"] == 7 else 0)
    b_group = [r for r in rows if r["canon_url"] == "https://b.com/y"]
    assert len(b_group) == 2
    for r in b_group:
        assert r["group_size"] == 2
        assert r["kept"] == 1 and r["keeper_id"] is None  # unresolved
    bad = [r for r in rows if r["canon_url"] is None]
    assert len(bad) == 1
    assert bad[0]["group_size"] == 1 and bad[0]["kept"] == 1
    assert bad[0]["keeper_id"] is None
