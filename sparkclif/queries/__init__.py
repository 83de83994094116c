"""Driver-checked query surface (SURVEY.md §2.2).

Importing this package registers every query group into
``sparkclif.registry.REGISTRY`` (128 queries as of round 6), then
reorders the registry so the external driver's correctness runner —
which verifies the FIRST 50 entries of ``queries()`` in registration
order (all five CORRECTNESS_r* files cut off exactly there) — covers
this round's must-verify set.

Round-6 window (50), per VERDICT r5 item 4 (stalest-first rotation):
leads with the seven brand-new growth-set queries (group_r6.py —
never driver-checked anywhere), then everything TOUCHED this round —
the brand-new ``i_sim_ivf_probe_stats`` (the SEARCH-phase anchor
completing the IVF pair, VERDICT item 8), the three rewritten
text-corpus queries
(``i_text_tfidf``/``i_text_rarity``/``i_text_lm_score``, exchange-
reuse rewrites whose hashes must not move), ``a_sink_partitioned``
(salted writer fan-out), the two queries whose count() pre-jobs were
replaced by parquet-footer metadata (``i_sim_lsh_ann``,
``i_dedup_embedding_at_scale``), and the two exact-cosine queries
now behind the broadcast/LSH cost dispatcher (``i_sim_cosine_topk``,
``i_dedup_embedding``) — then the STALEST driver rows: all 22
remaining round-3-green queries (C-joins, trivial D-aggs, group-I
dedup/multimodal/text/sampling, J-UDFs — verified against the union
of CORRECTNESS_r01..r05: no r<=3 row is outside this window), then
``d_agg_approx`` (round 2, the oldest row), and 11 of the round-4
set, prioritizing the queries whose plans this round rewrote
(``e_win_gapfill``, ``d_agg_percentile``) plus B-predicates,
as-of/range joins, D-agg shapes and ``e_win_distribution`` (the
plain E-window/F rows last checked in r4 — rank/analytic/frames/
topk/f_distinct — yielded their slots to the growth set; all stay
locally oracle-checked every round).

Outside the window: every remaining query was driver-green in round
4 or round 5 and is untouched since; all of them are still
oracle-checked locally each round by tests/test_oracle_parity.py
under the driver's own row-count+schema+hash comparison, and a
fresh-process driver simulation (.claude/skills/verify) runs the
full registry.
"""

from sparkclif.queries import (  # noqa: F401
    group_i,
    group_i_anchors,
    group_j,
    group_h,
    group_a,
    group_c,
    group_d,
    group_b,
    group_e,
    group_f,
    group_g,
    group_i_late,
    group_i_r4,
    group_i_r4b,
    group_i_r4c,
    group_i_r4d,
    group_events,
    group_d_sketches,
    group_r6,
)
from sparkclif.registry import REGISTRY

# The driver's 50-query verification window, in order.
WINDOW_ORDER = [
    # -- brand-new this round (never driver-checked): the round-6
    # growth set (group_r6.py, seven queries) --
    "i_sample_hash_split",
    "i_text_hash_features",
    "g_bitwise_funcs",
    "e_win_running_distinct",
    "c_join_interval_grid",
    "d_agg_moments",
    "c_join_bloom_prefilter",
    # -- touched this round (hashes must not move when plans do) --
    "i_sim_ivf_probe_stats",
    "i_text_tfidf",
    "i_text_rarity",
    "i_text_lm_score",
    "a_sink_partitioned",
    "i_sim_lsh_ann",
    "i_dedup_embedding_at_scale",
    "i_sim_cosine_topk",
    "i_dedup_embedding",
    # -- stalest: round-3 driver rows --
    "c_join_broadcast_chain",
    "c_join_full_outer",
    "c_join_semi_anti",
    "d_agg_collect_ordered",
    "d_agg_distinct",
    "d_agg_global",
    "d_agg_groupby",
    "d_agg_pivot",
    "i_dedup_cluster",
    "i_dedup_minhash",
    "i_dedup_ngram_jaccard",
    "i_dedup_simhash",
    "i_fingerprint_rolling",
    "i_multimodal_features",
    "i_multimodal_frames",
    "i_multimodal_join",
    "i_sample_stratified",
    "i_sim_ivf",
    "i_text_bpe_count",
    "i_text_pii_scrub",
    "j_pandas_udf_agg",
    "j_udf_scalar",
    # -- oldest row of all (round 2) --
    "d_agg_approx",
    # -- next-stalest: round-4 driver rows --
    "b_conditional",
    "b_filter_project",
    "b_predicates",
    "c_join_asof",
    "c_join_range_bucketed",
    "d_agg_grouping_sets",
    "d_agg_histogram",
    "d_agg_mode",
    "d_agg_percentile",
    "e_win_distribution",
    "e_win_gapfill",
]

assert len(WINDOW_ORDER) == 50, len(WINDOW_ORDER)
_missing = [n for n in WINDOW_ORDER if n not in REGISTRY]
assert not _missing, f"WINDOW_ORDER names not registered: {_missing}"
assert len(set(WINDOW_ORDER)) == 50, "duplicate names in WINDOW_ORDER"

# Rebuild the registry dict in window order; the remainder keeps its
# registration order after the window.
_rest = [n for n in REGISTRY if n not in set(WINDOW_ORDER)]
_ordered = {n: REGISTRY[n] for n in WINDOW_ORDER + _rest}
REGISTRY.clear()
REGISTRY.update(_ordered)
