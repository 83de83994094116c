"""Physical-plan regression tests — lock in the scale-critical plan
properties (SCALE.md): predicate pushdown reaching the parquet scan,
column pruning, broadcast joins for bounded dimensions, map-side
partial aggregation, and no total sort in per-group top-k.

These guard against silent plan regressions (e.g. a refactor routing a
filter through an opaque UDF, which would kill row-group skipping at
100 TB while still passing every correctness test).
"""

from __future__ import annotations

import re

import pytest

from sparkclif.registry import all_queries


def formatted_plan(spark, name, sf_dir):
    from sparkclif.plans import formatted_plan as _fp

    return _fp(all_queries()[name].fn(spark, sf_dir))


def test_filter_pushdown_and_pruning(spark, sf_dir):
    plan = formatted_plan(spark, "b_filter_project", sf_dir)
    pushed = re.search(r"PushedFilters: \[([^\]]+)\]", plan)
    assert pushed and "GreaterThanOrEqual" in pushed.group(1), (
        "range predicates must reach the parquet scan"
    )
    read = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert read is not None
    n_cols = len(read.group(1).split(","))
    assert n_cols <= 6, f"column pruning lost: scan reads {n_cols} columns"


def test_star_join_is_pure_broadcast(spark, sf_dir):
    plan = formatted_plan(spark, "c_join_broadcast_chain", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, (
        "dimension star join must broadcast, not shuffle"
    )
    assert "ShuffledHashJoin" not in plan


def test_theta_join_broadcasts_small_side(spark, sf_dir):
    plan = formatted_plan(spark, "c_join_theta", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan, (
        "non-equi join must BNLJ with the small side broadcast"
    )


def test_groupby_has_partial_aggregation(spark, sf_dir):
    plan = formatted_plan(spark, "d_agg_groupby", sf_dir)
    # partial + final hash aggregate pair around the exchange
    assert plan.count("HashAggregate") >= 2, "map-side partial agg missing"


def test_topk_per_group_has_no_global_sort(spark, sf_dir):
    plan = formatted_plan(spark, "e_topk_per_group", sf_dir)
    # window sort is per-partition-key; a global Sort over the full
    # relation without partitioning would appear as Exchange rangepartitioning
    assert "rangepartitioning" not in plan.lower(), (
        "per-group top-k must not range-partition (global sort)"
    )


def test_sort_limit_uses_take_ordered(spark, sf_dir):
    plan = formatted_plan(spark, "f_sort_limit", sf_dir)
    assert "TakeOrderedAndProject" in plan, (
        "orderBy().limit() must plan as TakeOrdered, not total sort"
    )


@pytest.mark.parametrize(
    "name", ["i_dedup_exact", "i_text_tokenize", "g_regex_extract"]
)
def test_no_python_udf_on_native_paths(spark, sf_dir, name):
    plan = formatted_plan(spark, name, sf_dir)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
        f"{name} must stay JVM-side (no Python eval in the hot path)"
    )


def test_partitioned_sink_prunes_partitions(spark, sf_dir):
    plan = formatted_plan(spark, "a_sink_partitioned", sf_dir)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "l_returnflag" in m.group(1), (
        "re-read of the hive-partitioned sink must prune at directory level"
    )


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    """Both sides bucketed by the join key => SortMergeJoin with ZERO
    Exchange anywhere in the query — the join is co-located AND the
    groupBy on the bucket key reuses the bucket partitioning (the
    co-located 100 TB fact-to-fact layout)."""
    df = all_queries()["c_join_bucketed"].fn(spark, sf_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "SortMergeJoin" in plan, "merge hint + bucketing must yield SMJ"
    assert "Exchange" not in plan, (
        "bucketed-by-join-key tables must join and aggregate without any shuffle"
    )


def test_simhash_has_no_shuffle(spark, sf_dir):
    """SimHash votes/packing run inside the scan partition (numpy
    kernel over scan-side token hashes): the plan must contain NO
    Exchange — token hashes never cross the wire."""
    from sparkclif.io import table
    from sparkclif.operators.dedup import simhash64

    df = simhash64(table(spark, sf_dir, "documents"))
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, "simhash must be shuffle-free"
    assert "MapInPandas" in plan


def test_minhash_pairs_single_shuffle(spark, sf_dir):
    """MinHash-LSH candidate generation budget: exactly the bucket
    groupBy + the final pair-dedup groupBy — no extra exchange from
    signature computation or banding."""
    from sparkclif.io import table
    from sparkclif.operators.dedup import minhash_candidate_pairs, minhash_signatures

    sigs = minhash_signatures(table(spark, sf_dir, "documents"))
    pairs = minhash_candidate_pairs(sigs)
    plan = spark._jvm.PythonSQLUtils.explainString(
        pairs._jdf.queryExecution(), "formatted"
    )
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 2, f"minhash pair-gen grew extra shuffles:\n{plan}"


def test_percentile_kernel_single_exchange(spark, sf_dir):
    """The small-input quickselect path: exactly ONE hash exchange (the
    group shuffle into the Arrow kernel) — no sort, no window."""
    from sparkclif.io import table
    from sparkclif.operators.rank import exact_percentiles

    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    df = exact_percentiles(
        li, "l_returnflag", [("l_extendedprice", 0.5, "p50")], force="kernel"
    )
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, f"kernel path must shuffle once:\n{plan}"
    # grouped-map clusters rows by KEY (a cheap partition-local sort on
    # l_returnflag); what must never appear is a sort on the VALUE —
    # that would mean we fell back to a sort-based rank
    sort_args = re.search(r"\(\d+\) Sort[^\n]*\n(?:[^\n]*\n)*?Arguments: \[([^\]]*)\]", plan)
    if sort_args:
        assert "l_extendedprice" not in sort_args.group(1), (
            f"kernel path must not sort by value:\n{plan}"
        )
    assert "FlatMapGroupsInPandas" in plan


def test_percentile_bracket_count_pass_partial_agg(spark, sf_dir):
    """The bracket path's count pass must be a map-side-combined
    aggregation over a broadcast bracket join — no sort-based window,
    no full-data range exchange."""
    from sparkclif.io import table
    from sparkclif.operators.rank import _bracket_percentiles

    li = table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    df = _bracket_percentiles(
        li, "l_returnflag", [("l_extendedprice", 0.5, "p50")], 4
    )
    # final result plan is trivial (driver-built rows); assert instead
    # on correctness of the shape contract: the operator ran without a
    # window/sort by construction — verify output matches the window path
    from sparkclif.operators.rank import exact_percentiles

    want = sorted(
        map(
            tuple,
            exact_percentiles(
                li, "l_returnflag", [("l_extendedprice", 0.5, "p50")], force="window"
            ).collect(),
        )
    )
    assert sorted(map(tuple, df.collect())) == want


def test_lsh_ann_shuffle_budget(spark, sf_dir):
    """LSH ANN: one bucket-groupBy exchange for the re-rank plus the
    dedup/merge exchanges on (vec_id[, neighbor_id]) — signature
    computation itself (mapInPandas over the scan) must add none."""
    from sparkclif.io import table
    from sparkclif.operators.similarity import lsh_ann

    df = lsh_ann(table(spark, sf_dir, "embeddings"), k=3)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 3, f"LSH ANN grew extra shuffles:\n{plan}"


def test_pack_sequences_two_exchanges_no_global_sort(spark, sf_dir):
    """The distributed prefix sum: exactly the range exchange + the
    pid-hash exchange for the within-partition window — and no
    single-partition Exchange (the global-window anti-pattern)."""
    import re

    from sparkclif.io import table as load_table
    from sparkclif.operators.sampling import pack_sequences
    from sparkclif.operators.text import token_count

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", token_count("text").cast("long").alias("n_tok")
    )
    plan = (
        pack_sequences(docs, "doc_id", "n_tok", budget=2048, force="distributed")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan)) or plan.count("Exchange")
    assert n_exchanges <= 2, f"pack_sequences grew extra shuffles:\n{plan}"
    assert "SinglePartition" not in plan, (
        "pack_sequences must never collapse to one partition:\n" + plan
    )
    # cost dispatch: the testbed input sits under SMALL_INPUT_BYTES, so
    # the default path must be the one-task window (no range exchange,
    # no eager checkpoint)
    auto = (
        pack_sequences(docs, "doc_id", "n_tok", budget=2048)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" in auto, (
        "small input should dispatch to the window path:\n" + auto
    )


def test_repetition_and_quantize_are_scan_kernels(spark, sf_dir):
    """The round-4 quality/quantization filters are pure scan work:
    the only Exchange allowed is io.spread()'s tiny-file round-robin
    (a no-op at scale) — no hash/range exchange, no Python workers."""
    for name in ("i_text_repetition", "i_embed_quantize"):
        plan = formatted_plan(spark, name, sf_dir)
        assert "hashpartitioning" not in plan, f"{name} must not hash-shuffle"
        assert "rangepartitioning" not in plan, f"{name} must not range-shuffle"
        for py in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
            assert py not in plan, f"{name} must stay JVM-side, found {py}"


def test_decontaminate_broadcasts_eval_grams(spark, sf_dir):
    """The eval-gram side is tiny by construction and must broadcast;
    the training side must reach the join without a hash exchange (the
    only hash exchange allowed is the final per-doc count agg)."""
    plan = formatted_plan(spark, "i_decontaminate", sf_dir)
    assert "BroadcastHashJoin" in plan, "eval grams must broadcast"
    assert "SortMergeJoin" not in plan
    n_hash = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n_hash <= 1, f"only the final count agg may hash-shuffle:\n{plan}"


def test_corpus_stats_backjoins_broadcast(spark, sf_dir):
    """Boilerplate / rarity / tfidf: the frequency-table back-join must
    be a broadcast hash join (never a sort-merge shuffle of the full
    occurrence relation) and the df aggregation must be a plain
    partial+final count — the countDistinct expand shape is banned."""
    for name in ("i_text_boilerplate", "i_text_rarity", "i_text_tfidf"):
        plan = formatted_plan(spark, name, sf_dir)
        assert "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name
        assert "Expand" not in plan, (
            f"{name}: distinct-aggregate expand crept back into the df stats"
        )


def test_chunk_overlap_zero_shuffle(spark, sf_dir):
    plan = formatted_plan(spark, "i_chunk_overlap", sf_dir)
    assert "Exchange" not in plan, "chunking must stay scan-side"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_range_join_is_hash_equi_join(spark, sf_dir):
    plan = formatted_plan(spark, "c_join_range_bucketed", sf_dir)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # the bucket equi-join may be SMJ or SHJ depending on stats; what
    # matters is that it IS an equi-join on (key, bucket)
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    )


def test_histogram_and_mode_have_partial_aggregation(spark, sf_dir):
    for name in ("d_agg_histogram", "d_agg_mode"):
        plan = formatted_plan(spark, name, sf_dir)
        assert "partial_count" in plan or "Partial" in plan, name


def test_dim_stats_partial_agg_no_python(spark, sf_dir):
    """Per-dimension moments: the posexplode must feed a map-side
    partial aggregation (the shuffle carries partitions x D rows, not
    N x D), all JVM-side."""
    plan = formatted_plan(spark, "i_embed_dim_stats", sf_dir)
    assert "HashAggregate" in plan and "partial" in plan.lower()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # exactly one aggregation exchange on dim (plus the spread input
    # repartition) — an extra shuffle means partial agg was lost
    assert plan.count("+- Exchange") <= 2, plan


def test_segment_dedup_winner_agg_is_partial(spark, sf_dir):
    """Span dedup at scale (force='join'): the keep-first winner must
    come from a partial+final min(struct) aggregation (map-side
    combinable — a mass-duplicated segment contributes one row per map
    task), never from a window rank over the raw occurrence relation
    (a window partition cannot be skew-split by AQE), never Expand."""
    from sparkclif.io import spread, table
    from sparkclif.operators.corpus import segment_dedup
    from sparkclif.plans import formatted_plan as _fp

    docs = spread(table(spark, sf_dir, "documents"))
    plan = _fp(segment_dedup(docs, width=3, force="join"))
    assert "CartesianProduct" not in plan
    assert "Expand" not in plan
    assert "Window" not in plan, "winner must be an aggregation, not a window rank"
    assert re.search(r"(Sort|ObjectHash|Hash)Aggregate", plan)


def test_segment_dedup_small_input_takes_window_path(spark, sf_dir):
    """Below SMALL_INPUT_BYTES the dispatcher takes the single-scan
    window formulation (one explode instead of the join path's two);
    the registered query at the test SF is small enough to dispatch
    there. The join path stays the above-bound default — that is
    pinned by test_segment_dedup_winner_agg_is_partial above."""
    plan = formatted_plan(spark, "i_dedup_paragraph", sf_dir)
    assert "Window" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    # exactly one scan of documents (one numbered detail block in the
    # formatted plan): the window path's whole point
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan


def test_lm_score_no_expand_vocab_broadcast(spark, sf_dir):
    """Bigram LM: vocabulary size must be a 1-row broadcast (cross
    join), the df/count tables plain partial+final aggregations (no
    countDistinct Expand), bigrams built scan-side (no self-join of
    the token relation, i.e. no extra join beyond the three stated)."""
    plan = formatted_plan(spark, "i_text_lm_score", sf_dir)
    assert "Expand" not in plan
    assert "BroadcastNestedLoopJoin Cross" in plan  # the 1-row V scalar
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_pps_sample_zero_shuffle_takeordered(spark, sf_dir):
    """The PPS sampler is one scan + TakeOrdered: per-partition k-row
    heaps, NO exchange, no global sort (the priority is a scan-side
    expression)."""
    plan = formatted_plan(spark, "i_sample_pps", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan, "PPS sampling must not shuffle"
    assert "Sort" not in plan.replace("TakeOrderedAndProject", ""), (
        "no standalone global sort"
    )


def test_bpe_pair_counts_vocab_collapse_then_takeordered(spark, sf_dir):
    """BPE pair counting: both aggregations partial (the corpus
    collapses to its vocabulary map-side) and the global top-k is
    TakeOrdered, never a full sort."""
    plan = formatted_plan(spark, "i_tokenizer_pair_counts", sf_dir)
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 4, "partial+final aggs expected"


def test_sparse_pairs_inverted_index_no_python(spark, sf_dir):
    """The sparse-cosine plan is the inverted index: equi-joins on the
    term key (hash-partitioned; no nested-loop all-pairs), partial
    aggregation on the tf/df/pair aggs, no Python in the path."""
    plan = formatted_plan(spark, "i_sim_sparse_pairs", sf_dir)
    assert "CartesianProduct" not in plan, (
        "pair generation must ride the term equi-join, not a cross join"
    )
    # the only nested-loop joins allowed are the 1-row n_docs scalar
    # broadcasts (the df-cap comparison), never a doc x doc product
    n_bnlj = len(re.findall(r"\) BroadcastNestedLoopJoin", plan))
    n_scalar = len(re.findall(r"Join condition: \(\(__df#\d+L? \* 100\)", plan))
    assert n_bnlj == n_scalar, (plan_counts := (n_bnlj, n_scalar))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_funnel_single_shuffle_no_python(spark, sf_dir):
    """The funnel is ONE groupBy(user) exchange + a codegen fold — no
    per-stage self-joins (the oracle's shape), no Python workers."""
    plan = formatted_plan(spark, "e_funnel_steps", sf_dir)
    assert "Join" not in plan, "funnel must fold, not join per stage"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, f"expected exactly 1 shuffle, saw {n_exchanges}"
    # the step-type filter reaches the parquet scan
    assert "PushedFilters" in plan and "In(event_type" in plan


def test_retention_no_count_distinct_expand(spark, sf_dir):
    """Cohort retention collapses (user, cohort, k) via dropDuplicates
    BEFORE counting — the plan must contain no Expand (the
    count-distinct rewrite that doubles shuffle volume)."""
    plan = formatted_plan(spark, "d_agg_retention", sf_dir)
    assert "Expand" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_kmeans_assignment_is_scan_side(spark, sf_dir):
    """The final k-means assignment plan (what the query returns) is a
    pure scan + projection over centroid literals: no join, no
    aggregation, no Python — distances are codegen expressions."""
    plan = formatted_plan(spark, "i_cluster_kmeans", sf_dir)
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_session_transitions_single_user_shuffle(spark, sf_dir):
    """All three windows (gap flag, session cumsum, predecessor lag)
    must share the ONE user-hash exchange — partitioning by user
    satisfies the (user, session) clustering, so Catalyst must not
    re-exchange between windows. Total exchanges: that one + the tiny
    type-pair agg."""
    plan = formatted_plan(spark, "e_session_transitions", sf_dir)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 2, f"expected 2 exchanges, saw {n_exchanges}"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_r7_rewrites_hold_their_exchange_budgets(spark, sf_dir):
    """Lock in the round-7 plan rewrites: a refactor that re-adds a
    join tree to corpus_mix, a BNLJ to interval_grid, or a Python
    kernel to the percentile small path would pass correctness but
    regress the 100 TB plan shape."""
    from sparkclif.plans import plan_metrics

    # corpus_mix: one window+agg pipeline over the lattice (was a
    # 12-exchange join tree)
    mix = formatted_plan(spark, "i_corpus_mix", sf_dir)
    m = plan_metrics(mix)
    assert m["exchanges"] <= 4, mix[:1500]
    assert "Join" not in mix, "corpus_mix must not rebuild its join tree"

    # interval grid: difference-array sweep — data exchanges bounded
    # (span agg + month agg + the tiny single-partition window); never
    # a nested-loop join
    grid = formatted_plan(spark, "c_join_interval_grid", sf_dir)
    g = plan_metrics(grid)
    assert g["bnlj"] == 0 and not g["cartesian"]
    assert g["exchanges"] <= 4, grid[:1500]

    # percentile small path: all-JVM sorted-array (no Python eval,
    # exactly one exchange)
    pct = formatted_plan(spark, "d_agg_percentile", sf_dir)
    p = plan_metrics(pct)
    assert not p["python_eval"] and not p["arrow_pandas"]
    assert p["exchanges"] == 1, pct[:1500]


def test_bloom_prefilter_force_distributed_takes_bloom_path(spark, sf_dir):
    """The fleet-wide forceDistributed override routes the dispatch to
    the bloom (scale) path — and because both paths are
    result-identical, the override is safe here (unlike the cosine
    dispatch, where it trades exactness)."""
    from sparkclif.io import table
    from sparkclif.queries.group_r6 import bloom_prefilter_plan

    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    spark.conf.set("spark.sparkclif.forceDistributed", "true")
    try:
        df = bloom_prefilter_plan(o, li)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "xxhash64" in plan, "forceDistributed must take the bloom path"
        got = {tuple(r) for r in df.collect()}
    finally:
        spark.conf.unset("spark.sparkclif.forceDistributed")
    want = {tuple(r) for r in bloom_prefilter_plan(o, li, force="plain").collect()}
    assert got == want


def test_quality_classifier_is_map_only(spark, sf_dir):
    """The fastText-filter shape contract: the whole query is one
    projection — tokenize + aggregate() fold, md5 inside the lambda.
    NO Exchange (a 100 TB filter pass touches no network), NO Python
    eval (the fold is whole-stage codegen, not a UDF)."""
    from sparkclif.io import table
    from sparkclif.queries.group_r9 import quality_classifier_plan

    df = quality_classifier_plan(table(spark, sf_dir, "documents"))
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, "quality classifier must be map-only"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_domain_stats_single_aggregation(spark, sf_dir):
    """Registrable-domain census: scan-side parse + ONE aggregation.
    The 3 count-distincts expand the plan but partial aggregation must
    be present, and the only exchanges are the expand's two."""
    from sparkclif.io import table
    from sparkclif.queries.group_r9 import domain_stats_plan

    df = domain_stats_plan(table(spark, sf_dir, "documents"))
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re

    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_ex <= 2, f"census must stay one (expanded) aggregation, got {n_ex}"
    assert "HashAggregate" in plan
