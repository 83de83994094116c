"""Scale-stress probes — the empirical half of SCALE.md.

Replicates the testbed N-fold (tmpfs scratch) and re-times the
operators whose scaling behavior is design-load-bearing, so "would
this survive a scale-up" is answered by measurement, not assertion:

- flagship hash agg: must stay ~flat (scan-bound, partial+final agg)
- minhash dedup: worst-case bucket density (every doc cloned) must
  stay sub-quadratic thanks to the max_bucket skew cap
- simhash: shuffle-free scan kernel, must scale ~linearly
- LSH ANN: n_planes grows with log2(N) to hold bucket size constant —
  wall must stay ~linear in N, not quadratic
- IVF ANN: cluster count scales with N, per-cluster work constant
- distributed percentiles: the two-phase rank path at N-fold input

Usage: python probes/scale_stress.py [replication_factor]
Writes one JSON line per probe; ~2-4 min total at the default 8x.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from sparkclif.io import table
    from sparkclif.session import get_spark, tmp_dir

    spark = get_spark("scale-probes")
    spark.sparkContext.setLogLevel("ERROR")
    scratch = tmp_dir() + "/probes"
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)

    def replicate(name: str, id_col: str, n: int) -> str:
        """n-fold replication with shifted ids (clones share content —
        worst-case density for dedup)."""
        out = f"{scratch}/{name}_x{n}.parquet"
        src = table(spark, sf_dir, name)
        copies = src.withColumn("__copy", F.explode(F.sequence(F.lit(0), F.lit(n - 1))))
        shifted = copies.withColumn(
            id_col, F.col(id_col) + F.col("__copy") * F.lit(10_000_000)
        ).drop("__copy")
        # spread over many files: the sf0.1 source is ONE parquet file,
        # and explode is narrow, so without this the replica is one
        # ~40 MB file -> one scan partition -> every downstream kernel
        # runs single-task and the probe measures one core, not the
        # engine (a real corpus arrives as many files per executor)
        shifted.repartition(64).write.mode("overwrite").parquet(out)
        return out

    def timed(label: str, fn) -> None:
        t0 = time.perf_counter()
        n_rows = fn()
        print(
            json.dumps(
                {
                    "probe": label,
                    "sec": round(time.perf_counter() - t0, 2),
                    "rows_out": n_rows,
                    "replication": k,
                }
            ),
            flush=True,
        )

    # --- flagship agg at 1x and kx -------------------------------------
    li = table(spark, sf_dir, "lineitem")
    li_k = li.withColumn("__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))).drop("__c")

    def q1(df):
        return (
            df.filter(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.avg("l_extendedprice"), F.count("*"))
            .count()
        )

    q1(li)  # warm: JIT/codegen so 1x vs kx compares work, not compile
    timed("flagship_agg_1x", lambda: q1(li))
    timed(f"flagship_agg_{k}x", lambda: q1(li_k))

    # --- dedup family at kx (cloned docs = max bucket density) ---------
    docs_k = spark.read.parquet(replicate("documents", "doc_id", k))
    from sparkclif.operators import dedup as D

    timed(
        f"minhash_{k}x_cloned",
        lambda: D.minhash_candidate_pairs(
            D.minhash_signatures(docs_k, num_hashes=32, shingle_n=3), num_bands=8
        ).count(),
    )
    timed(f"simhash_{k}x", lambda: D.simhash64(docs_k).count())
    # connected components over the clone-dense candidate graph:
    # materialize edges once so the CC timing isolates the iterative
    # engine (per-round: relax join + jump join + checkpoint; the
    # convergence probe is an in-row flag, no extra shuffle)
    from sparkclif.operators import graph as G

    D.minhash_candidate_pairs(
        D.minhash_signatures(docs_k, num_hashes=32, shingle_n=3), num_bands=8
    ).select("id_a", "id_b").write.mode("overwrite").parquet(
        f"{scratch}/cc_edges.parquet"
    )
    cc_edges = spark.read.parquet(f"{scratch}/cc_edges.parquet")
    timed(
        f"cc_{k}x_cloned",
        lambda: G.connected_components(cc_edges, src="id_a", dst="id_b").count(),
    )
    # clone-dense winnowing: every selected gram lands in a bucket of
    # >= k docs, so the star-pair over-cap path carries the output
    timed(
        f"substring_{k}x_cloned",
        lambda: D.substring_candidate_pairs(docs_k, max_df=k).count(),
    )

    # --- similarity at kx ----------------------------------------------
    emb_k = spark.read.parquet(replicate("embeddings", "vec_id", k))
    from sparkclif.operators import similarity as S

    timed(f"lsh_ann_{k}x", lambda: S.lsh_ann(emb_k, k=3).count())
    # PQ encode is a pure scan (codebook is a plan literal, argmin is
    # in-row) — wall must track the scan, i.e. ~linear in k
    from sparkclif.operators.quantize import pq_encode

    timed(f"pq_encode_{k}x", lambda: pq_encode(emb_k).count())
    # fixed cluster count = postings lists grow with N = O(N²) search
    # (the documented failure); auto sqrt(N) clusters restore ~N^1.5
    timed(f"ivf_{k}x_fixed16", lambda: S.ivf_ann(emb_k, k=3, n_clusters=16).count())
    timed(f"ivf_{k}x_auto", lambda: S.ivf_ann(emb_k, k=3).count())

    # --- distributed percentile path at kx -----------------------------
    from sparkclif.operators.rank import exact_percentiles

    timed(
        f"percentile_distributed_{k}x",
        lambda: exact_percentiles(
            li_k.select("l_returnflag", "l_extendedprice"),
            "l_returnflag",
            [("l_extendedprice", 0.5, "p50"), ("l_extendedprice", 0.95, "p95")],
            force="distributed",
        ).count(),
    )
    timed(
        f"percentile_bracket_{k}x",
        lambda: exact_percentiles(
            li_k.select("l_returnflag", "l_extendedprice"),
            "l_returnflag",
            [("l_extendedprice", 0.5, "p50"), ("l_extendedprice", 0.95, "p95")],
            force="bracket",
        ).count(),
    )

    # --- semantic dedup: the n_centroids knob is the scale path --------
    # Cloned embeddings all land in their original's cluster, so with
    # FIXED centroids the per-cluster matmul grows quadratically in k —
    # measuring exactly the failure SemDeDup's cluster-count scaling
    # prevents. Scaling n_centroids with N restores ~linear wall.
    timed(
        f"semantic_dedup_{k}x_fixed_centroids",
        lambda: S.semantic_dedup(emb_k, n_centroids=8).count(),
    )
    timed(
        f"semantic_dedup_{k}x_scaled_centroids",
        lambda: S.semantic_dedup(emb_k, n_centroids=8 * k).count(),
    )

    # --- boilerplate removal at kx (df table k-fold denser) ------------
    from sparkclif.operators import corpus as CO

    timed(
        f"boilerplate_{k}x",
        lambda: CO.boilerplate_removal(docs_k, min_docs=25 * k).count(),
    )

    # --- span dedup at kx (cloned docs = every segment duplicated ------
    # k-fold: the min(struct) winner agg must combine map-side and the
    # seg back-join must survive the k-dense key distribution)
    timed(
        f"segment_dedup_{k}x_cloned",
        lambda: CO.segment_dedup(docs_k, width=3).count(),
    )

    # --- bigram LM at kx (same vocabulary, k-fold occurrence counts: ---
    # count aggs are map-side combined, so wall should track the scan,
    # not the occurrence blowup)
    timed(
        f"bigram_lm_{k}x_cloned",
        lambda: CO.bigram_lm_score(docs_k).count(),
    )

    # --- per-dimension moments at kx (partial agg -> partitions x D ----
    # shuffle rows regardless of N; wall must track the scan)
    from sparkclif.operators.quantize import dim_stats

    timed(f"dim_stats_{k}x", lambda: dim_stats(emb_k).count())

    # --- BPE pair counts at kx (cloned docs: the vocabulary is ---------
    # IDENTICAL, only word counts scale k-fold — so after the
    # vocab-collapse agg the pair work is constant and wall must track
    # the scan, the design claim of the vocabulary-first plan)
    timed(
        f"bpe_pairs_{k}x_cloned",
        lambda: CO.bpe_pair_counts(docs_k, top_k=20).count(),
    )

    # --- exact k-means at kx embeddings (assignment is scan-side; the --
    # update shuffle is partitions x k x D regardless of N -> wall
    # must track the scan across the 3 passes)
    from sparkclif.operators.kmeans import kmeans_exact

    timed(f"kmeans_{k}x", lambda: kmeans_exact(emb_k, k=8, n_updates=2).count())

    # --- sparse cosine pairs at kx CLONED docs: posting lists grow -----
    # k-fold inside every clone cluster, so pair OUTPUT grows ~k^2 —
    # the inherent inverted-index cost law (same argument as the
    # minhash clone-dense probe); wall should track pair output, and
    # the df cap is what keeps the Zipfian head out of that law
    from sparkclif.operators.similarity import sparse_cosine_pairs

    timed(
        f"sparse_pairs_{k}x_cloned",
        lambda: sparse_cosine_pairs(docs_k, tau=0.5, df_cap_pct=20).count(),
    )

    # --- sketch builds at kx (cloned docs: same vocabulary, k-fold ----
    # occurrences; CMS counts scale k-fold but the agg output is the
    # fixed 256-cell matrix, HLL registers are INVARIANT to clones —
    # both walls must track the scan, the partial-agg-is-the-merge law)
    from sparkclif.operators.sketch import count_min, hll_sketch
    from sparkclif.operators.text import tokens as _tokens

    toks_k = docs_k.select(F.explode(_tokens("text")).alias("item"))
    timed(f"count_min_{k}x_cloned", lambda: count_min(toks_k).count())
    timed(f"hll_sketch_{k}x_cloned", lambda: hll_sketch(toks_k).count())

    # --- funnel at kx (users SHIFTED: per-user event counts constant, --
    # so the per-user fold is constant work and wall must track the
    # scan + the one groupBy shuffle)
    from sparkclif.operators.sequence import funnel_stages

    ev_f = table(spark, sf_dir, "events")
    ev_fk = (
        ev_f.withColumn("__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .select(
            (F.col("event_id") + F.col("__c") * 100_000_000).alias("event_id"),
            (F.col("user_id") + F.col("__c") * 1_000_000).alias("user_id"),
            "ts",
            "event_type",
        )
    )
    timed(
        f"funnel_{k}x_users",
        lambda: funnel_stages(
            ev_fk, ["view", "click", "purchase"], window_us=43_200_000_000
        ).count(),
    )

    # --- EWMA at kx (users shifted: per-key fold length constant; ------
    # wall must track the scan + the one key shuffle, like the funnel)
    from sparkclif.operators.timeseries import ewma_last

    ev_ek = (
        ev_f.withColumn("__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .select(
            (F.col("event_id") + F.col("__c") * 100_000_000).alias("event_id"),
            (F.col("user_id") + F.col("__c") * 1_000_000).alias("user_id"),
            "ts",
            "value",
        )
    )
    timed(f"ewma_{k}x_users", lambda: ewma_last(ev_ek).count())

    # --- bucketized range join at kx (users shifted: pair density ------
    # per (user, bucket) constant, so wall isolates engine scaling,
    # not the k^2 pair blowup identical timestamps would inflict)
    from sparkclif.operators.rangejoin import self_range_neighbors

    ev = table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("ts_us")
    )
    ev_k = (
        ev.withColumn("__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .select(
            (F.col("event_id") + F.col("__c") * 100_000_000).alias("event_id"),
            (F.col("user_id") + F.col("__c") * 1_000_000).alias("user_id"),
            "ts_us",
        )
    )
    timed(
        f"range_join_{k}x",
        lambda: self_range_neighbors(
            ev_k, "user_id", "ts_us", "event_id", window_us=3_600_000_000
        ).count(),
    )

    # --- gap-run gapfill at kx (users shifted: per-user span and gap ---
    # structure constant, so the occupied-bucket relation and the
    # exploded grid both scale linearly in k; wall must track the scan
    # + the two exchanges (bucket agg, per-key window) — the design
    # claim of the r6 gap-run rewrite, which never shuffles the grid)
    from sparkclif.operators.timeseries import resample_gapfill

    ev_g = table(spark, sf_dir, "events")
    ev_gk = (
        ev_g.withColumn("__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .select(
            (F.col("event_id") + F.col("__c") * 100_000_000).alias("event_id"),
            (F.col("user_id") + F.col("__c") * 1_000_000).alias("user_id"),
            "ts",
            "value",
        )
    )
    timed(f"gapfill_1x", lambda: resample_gapfill(ev_g).count())
    timed(f"gapfill_{k}x_users", lambda: resample_gapfill(ev_gk).count())

    # --- sequence packing: distributed prefix sum vs global window -----
    # Probed on 5M synthetic rows, not the 40k-doc table. With the
    # window genuinely materialized (see the pruning note below) the
    # distributed path already wins at 5M (~2.7 s vs ~3.9 s): the
    # one-task sort+window stops scaling the moment it saturates a
    # core, long before it stops fitting in memory.
    from sparkclif.operators.sampling import pack_sequences
    from pyspark.sql import Window

    n_big = 5_000_000
    toks_big = (
        spark.range(n_big)
        .select(F.col("id").alias("doc_id"), (F.col("id") % 997 + 1).alias("n_tok"))
        .repartition(32)
    )
    toks_big.write.mode("overwrite").parquet(f"{scratch}/toks_big.parquet")
    toks_big = spark.read.parquet(f"{scratch}/toks_big.parquet")
    # aggregate ON shard_id so the window cannot be column-pruned away:
    # a bare .count() references no columns, Catalyst removes the unused
    # window, and the "global window" number degenerates to a scan-count
    timed(
        f"pack_distributed_{n_big}rows",
        lambda: pack_sequences(toks_big, "doc_id", "n_tok", budget=2048)
        .agg(F.max("shard_id"), F.count("*"))
        .collect()
        and n_big,
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, 0)
    timed(
        f"pack_global_window_{n_big}rows",  # the single-task anti-pattern
        lambda: toks_big.withColumn(
            "shard_id",
            F.floor((F.sum("n_tok").over(w) - F.col("n_tok")) / 2048),
        )
        .agg(F.max("shard_id"), F.count("*"))
        .collect()
        and n_big,
    )

    # --- r6 growth set --------------------------------------------------
    # The probes run the SAME plan builders the registered queries use
    # (queries/group_r6.py) — an inline re-declaration would silently
    # keep measuring the old shape after a query fix. And every timed
    # action aggregates ON the computed columns: a bare .count() lets
    # Catalyst prune the window/aggregate under probe (the
    # pack_sequences lesson below), so each probe's result must
    # reference the expensive output.
    from sparkclif.queries.group_r6 import (
        hash_features_plan,
        interval_grid_plan,
        moment_power_sums,
        running_distinct_plan,
    )

    def force_all(df):
        """Aggregate over EVERY column so no probe work is prunable;
        returns the row count (non-null count of the first column)."""
        return int(df.agg(*[F.count(c) for c in df.columns]).collect()[0][0])

    # interval grid at kx (orderkeys shifted: span length per order
    # constant => month expansion factor constant => rows exploded
    # scale linearly in k; wall must track scan + the two exchanges)
    o_g = table(spark, sf_dir, "orders")
    li_g = table(spark, sf_dir, "lineitem")

    o_k = (
        o_g.withColumn("__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .select(
            (F.col("o_orderkey") + F.col("__c") * 100_000_000).alias("o_orderkey"),
            "o_totalprice",
            "o_orderdate",
        )
    )
    li_gk = (
        li_g.withColumn("__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .select(
            (F.col("l_orderkey") + F.col("__c") * 100_000_000).alias("l_orderkey"),
            "l_shipdate",
        )
    )
    timed("interval_grid_1x", lambda: force_all(interval_grid_plan(o_g, li_g)))
    timed(f"interval_grid_{k}x", lambda: force_all(interval_grid_plan(o_k, li_gk)))

    # hashing-trick features at kx (docs cloned: token mass kx, the
    # (bucket, tok)/(bucket, doc) partial-agg relations stay
    # vocabulary/doc-bounded — wall must track the tokenize scan)
    docs_h = spark.read.parquet(replicate("documents", "doc_id", k))
    timed(
        "hash_features_1x",
        lambda: force_all(hash_features_plan(table(spark, sf_dir, "documents"))),
    )
    timed(f"hash_features_{k}x_cloned", lambda: force_all(hash_features_plan(docs_h)))

    # running COUNT(DISTINCT) at kx users (per-user history length and
    # type cardinality constant => set state constant; one exchange +
    # one sort, wall must track the scan). force_all counts the window
    # output column, so the collect_set window cannot be pruned.
    ev_rk = (
        ev_f.withColumn("__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .select(
            (F.col("event_id") + F.col("__c") * 100_000_000).alias("event_id"),
            (F.col("user_id") + F.col("__c") * 1_000_000).alias("user_id"),
            "ts",
            "event_type",
        )
    )
    timed("running_distinct_1x", lambda: force_all(running_distinct_plan(ev_f)))
    timed(
        f"running_distinct_{k}x_users",
        lambda: force_all(running_distinct_plan(ev_rk)),
    )

    # exact moments at kx (pure two-phase agg over integer power sums —
    # must stay scan-bound/flat like the flagship agg; force_all
    # references every power sum, so none is prunable)
    timed("moments_1x", lambda: force_all(moment_power_sums(li)))
    timed(f"moments_{k}x", lambda: force_all(moment_power_sums(li_k)))

    # --- round-7 growth set (same plan builders as the queries) --------
    from sparkclif.queries.group_r7 import (
        ohlc_plan,
        weighted_median_plan,
        zscore_plan,
    )

    # weighted median at kx clones (values and flags repeat, so the
    # per-(group, value) weight table is CONSTANT-sized while weights
    # scale by k: wall must track the map-side-combined scan, and the
    # window runs over the same distinct-value grid at every k)
    li_wm_k = li.withColumn(
        "__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    ).drop("__c")
    timed("weighted_median_1x", lambda: force_all(weighted_median_plan(li)))
    timed(
        f"weighted_median_{k}x_cloned",
        lambda: force_all(weighted_median_plan(li_wm_k)),
    )

    # OHLC at kx event clones (bars x types output constant; min_by/
    # max_by partials carry ONE (value, key) pair each, so the shuffle
    # is bar-grid-sized at every k — wall must track the scan)
    ev_o = table(spark, sf_dir, "events")
    ev_ok = ev_o.withColumn(
        "__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    ).drop("__c")
    timed("ohlc_1x", lambda: force_all(ohlc_plan(ev_o)))
    timed(f"ohlc_{k}x", lambda: force_all(ohlc_plan(ev_ok)))

    # rolling z-score at kx USERS (per-user history constant => frame
    # state O(20)/row at every k; one exchange + one sort, linear)
    ev_zk = ev_o.withColumn(
        "__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    ).select(
        (F.col("event_id") + F.col("__c") * 100_000_000).alias("event_id"),
        (F.col("user_id") + F.col("__c") * 1_000_000).alias("user_id"),
        "ts",
        "value",
    )
    timed("zscore_1x", lambda: force_all(zscore_plan(ev_o)))
    timed(f"zscore_{k}x_users", lambda: force_all(zscore_plan(ev_zk)))

    # integer PageRank at kx DISJOINT subgraphs (shifted part/supp keys:
    # per-node degree structure constant => per-iteration join/agg
    # volume linear in k; ranks stay node-sized; wall must scale
    # sub-linearly once splits parallelize)
    from sparkclif.operators.graph import pagerank_int

    def pr_edges(df):
        e0 = (
            df.filter(F.col("l_quantity") >= 45)
            .select(
                (F.col("l_partkey") * 2).alias("u"),
                (F.col("l_suppkey") * 2 + 1).alias("v"),
            )
            .distinct()
        )
        return e0.union(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))

    li_pk = (
        li.withColumn("__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .select(
            (F.col("l_partkey") + F.col("__c") * 10_000_000).alias("l_partkey"),
            (F.col("l_suppkey") + F.col("__c") * 10_000_000).alias("l_suppkey"),
            "l_quantity",
        )
    )
    timed(
        "pagerank_1x",
        lambda: force_all(pagerank_int(pr_edges(li), src="u", dst="v", iters=3)),
    )
    timed(
        f"pagerank_{k}x_subgraphs",
        lambda: force_all(pagerank_int(pr_edges(li_pk), src="u", dst="v", iters=3)),
    )

    # --- round-8 growth set ---------------------------------------------
    # tolerance as-of at kx USERS (shifted keys: per-key history
    # constant => the single union-sort shuffle is the only exchange
    # at every k; tolerance adds a projection, zero plan nodes — wall
    # must track the scan like the plain as-of)
    from sparkclif.operators.asof import asof_join

    o_t = table(spark, sf_dir, "orders")
    o_tk = o_t.withColumn(
        "__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1)))
    ).select(
        (F.col("o_custkey") + F.col("__c") * 1_000_000).alias("o_custkey"),
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
    )
    asof_kw = dict(
        left_key="user_id", right_key="o_custkey", left_time="ts",
        right_time="o_orderdate", payload=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey", tolerance="30 DAYS",
    )
    timed(
        "asof_tolerance_1x",
        lambda: force_all(asof_join(ev_f.select("event_id", "user_id", "ts"),
                                    o_t, **asof_kw)),
    )
    timed(
        f"asof_tolerance_{k}x_users",
        lambda: force_all(
            asof_join(ev_rk.select("event_id", "user_id", "ts"), o_tk, **asof_kw)
        ),
    )

    # bucketed MERGE at kx STATE with a CONSTANT delta: the state side
    # joins exchange-free (bucket co-location), so per-merge SHUFFLE
    # bytes are delta-sized at every k — wall grows only with the
    # state scan term, never with a state reshuffle. (The probe times
    # the merge plan read side; the epoch rewrite cost is the sink
    # family's committer floor, measured separately.)
    from sparkclif.streaming.merge import STATE_BUCKETS, _delta, merge_into_state

    def bucketed_state(mult: int, tag: str) -> str:
        evm = ev_f if mult == 1 else ev_f.withColumn(
            "__c", F.explode(F.sequence(F.lit(0), F.lit(mult - 1)))
        ).select(
            (F.col("event_id") + F.col("__c") * 100_000_000).alias("event_id"),
            (F.col("user_id") + F.col("__c") * 1_000_000).alias("user_id"),
            "ts",
            "value",
        )
        tbl = f"probe_merge_state_{tag}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            _delta(evm).write.bucketBy(STATE_BUCKETS, "user_id")
            .sortBy("user_id").mode("overwrite").saveAsTable(tbl)
        )
        return tbl

    # KMV theta-union at kx SHIFTED keys (distinct cardinality scales
    # by ~k): the per-(group, shard) bottom-k windows stay k-bounded,
    # the merge input stays shards x k — wall must track the scan +
    # the (g, shard, h) dedup exchange, never the distinct count
    from sparkclif.queries.group_r8 import theta_union_plan

    li_th = li.select("l_returnflag", "l_partkey")
    li_thk = (
        li.withColumn("__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .select(
            "l_returnflag",
            (F.col("l_partkey") + F.col("__c") * 10_000_000).alias("l_partkey"),
        )
    )
    # force="merge" pins the sharded scale path: these probes measure
    # the 100 TB shape, not the fused small-path the cost dispatcher
    # picks below SMALL_INPUT_BYTES (the r8 fused/merge equivalence is
    # pinned separately in tests/test_r8_queries.py)
    timed(
        "theta_union_1x",
        lambda: force_all(theta_union_plan(li_th, force="merge")),
    )
    timed(
        "theta_union_1x_fused_smallpath",
        lambda: force_all(theta_union_plan(li_th, force="fused")),
    )
    timed(
        f"theta_union_{k}x_keys_8shards",
        lambda: force_all(theta_union_plan(li_thk, force="merge")),
    )
    # shard count is THE scale knob: at kx keys with 8x the shards the
    # per-shard sort stays 1x-sized and the wall must flatten back
    timed(
        f"theta_union_{k}x_keys_64shards",
        lambda: force_all(theta_union_plan(li_thk, n_shards=64, force="merge")),
    )

    t1x = bucketed_state(1, "1x")
    tkx = bucketed_state(k, f"{k}x")
    delta_const = _delta(ev_f.limit(5000))
    timed(
        "merge_bucketed_1x_state",
        lambda: force_all(merge_into_state(spark.table(t1x), delta_const)),
    )
    timed(
        f"merge_bucketed_{k}x_state",
        lambda: force_all(merge_into_state(spark.table(tkx), delta_const)),
    )
    spark.sql(f"DROP TABLE IF EXISTS {t1x}")
    spark.sql(f"DROP TABLE IF EXISTS {tkx}")

    # --- late-r8 growth set --------------------------------------------
    # nearest as-of at kx USERS (shifted keys, per-key history
    # constant): same single union-sort shuffle as the backward/
    # tolerance variants — the second (descending) carry adds one
    # in-partition sort, zero exchanges, so the law must match
    # asof_tolerance's
    from sparkclif.operators.asof import asof_join_nearest

    near_kw = dict(
        left_key="user_id", right_key="o_custkey", left_time="ts",
        right_time="o_orderdate", payload=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
    )
    timed(
        "asof_nearest_1x",
        lambda: force_all(
            asof_join_nearest(ev_f.select("event_id", "user_id", "ts"), o_t, **near_kw)
        ),
    )
    timed(
        f"asof_nearest_{k}x_users",
        lambda: force_all(
            asof_join_nearest(
                ev_rk.select("event_id", "user_id", "ts"), o_tk, **near_kw
            )
        ),
    )

    # URL dedup at kx docs (cloned ids shift doc_id so canonical
    # groups stay constant-size — the window partitions grow in COUNT,
    # not width): canonicalization is scan-side, one window exchange;
    # wall must track the scan
    from sparkclif.registry import all_queries as _aq

    url_fn = _aq()["i_dedup_url"].fn
    timed("url_dedup_1x", lambda: force_all(url_fn(spark, sf_dir)))
    docs_u = spark.read.parquet(replicate("documents", "doc_id", k))
    from sparkclif.operators.dedup import dedup_url

    def url_plan(docs):
        base = F.col("doc_id") % 100
        u = docs.select(
            "doc_id",
            F.concat(
                F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
                base.cast("string"), F.lit("?lang="), F.col("lang"), F.lit("&v=2"),
            ).alias("url"),
        )
        return dedup_url(u)

    timed(f"url_dedup_{k}x_docs", lambda: force_all(url_plan(docs_u)))

    # CUSUM at kx USERS (shifted keys, per-key series constant): the
    # funnel — one groupBy exchange, fold work linear in rows; state
    # per key is 4 BIGINTs regardless of history length
    from sparkclif.operators.timeseries import cusum_page

    ev_cu = ev_f.select("event_id", "user_id", "ts", "value")
    ev_cuk = (
        ev_f.withColumn("__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .select(
            (F.col("event_id") + F.col("__c") * 100_000_000).alias("event_id"),
            (F.col("user_id") + F.col("__c") * 1_000_000).alias("user_id"),
            "ts",
            "value",
        )
    )
    timed("cusum_1x", lambda: force_all(cusum_page(ev_cu)))
    timed(f"cusum_{k}x_users", lambda: force_all(cusum_page(ev_cuk)))

    # ---- round-9 growth probes ----
    # quality classifier at kx docs: ZERO-exchange map-only fold —
    # wall must track the scan linearly (the 100 TB filter contract:
    # one pass, no network)
    from sparkclif.operators.corpus import bpe_encode_rollup
    from sparkclif.queries.group_r9 import (
        domain_stats_plan,
        quality_classifier_plan,
    )

    docs_k_path = f"{scratch}/documents_x{k}.parquet"
    docs_k = (
        spark.read.parquet(docs_k_path)
        if os.path.exists(docs_k_path)
        else spark.read.parquet(replicate("documents", "doc_id", k))
    )
    docs_1x = table(spark, sf_dir, "documents")

    timed("quality_classifier_1x", lambda: force_all(quality_classifier_plan(docs_1x)))
    timed(
        f"quality_classifier_{k}x_docs",
        lambda: force_all(quality_classifier_plan(docs_k)),
    )

    # domain census at kx docs: scan-side parse + ONE bounded agg —
    # output cardinality (publisher count) is replication-invariant,
    # so wall must track the scan and the shuffle stays domain-sized
    timed("domain_stats_1x", lambda: force_all(domain_stats_plan(docs_1x)))
    timed(f"domain_stats_{k}x_docs", lambda: force_all(domain_stats_plan(docs_k)))

    # BPE encode at kx docs: clones share content, so the VOCABULARY
    # is replication-INVARIANT — all encode/merge work is constant;
    # only the stage-1 corpus scan (word_freqs) grows. Wall must grow
    # sublinearly (scan term only)
    timed("bpe_encode_1x", lambda: force_all(bpe_encode_rollup(
        table(spark, sf_dir, "documents"))))
    timed(f"bpe_encode_{k}x_docs", lambda: force_all(bpe_encode_rollup(docs_k)))

    # weighted median at kx rows: above SMALL_INPUT_BYTES the
    # dispatcher switches array -> window (no task-sized buffer at
    # scale); probe BOTH paths at kx so the crossover is measured,
    # not asserted
    from sparkclif.queries.group_r7 import weighted_median_plan

    li_wm = table(spark, sf_dir, "lineitem")
    li_wmk = (
        li_wm.withColumn("__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .select("l_returnflag", "l_extendedprice", "l_quantity")
    )
    timed("weighted_median_1x_dispatch", lambda: force_all(weighted_median_plan(li_wm)))
    timed(
        f"weighted_median_{k}x_window",
        lambda: force_all(weighted_median_plan(li_wmk, force="window")),
    )
    timed(
        f"weighted_median_{k}x_array",
        lambda: force_all(weighted_median_plan(li_wmk, force="array")),
    )

    # ---- round-10/11 growth probes ----
    # Replicated inputs are MATERIALIZED to scratch parquet before
    # timing (round-11 review): a narrow in-plan explode of the
    # one-file sf0.1 source scans as ONE partition, so the kx side of
    # every envelope would measure single-task throughput, not the
    # engine — the exact pitfall replicate()'s write-out exists to
    # avoid. Both the 1x and kx sides go through the same write+read
    # so the comparison is scan-parallel on both ends. (The r10
    # asof_forward/embed_normalize envelopes published before this
    # fix compared a 1-file 1x scan against an in-plan exploded kx —
    # re-measured below under the corrected protocol.)
    def materialize(df, name: str):
        out = f"{scratch}/{name}.parquet"
        df.repartition(64).write.mode("overwrite").parquet(out)
        return spark.read.parquet(out)

    # forward as-of at kx events (users shifted so keys spread, same
    # orders side): the union-sort operator's wall must track
    # (|L|+|R|) through its ONE exchange — same law as backward as-of
    from sparkclif.operators.asof import asof_join_forward

    ev_af = materialize(
        table(spark, sf_dir, "events").select("event_id", "user_id", "ts"),
        "ev_af_1x",
    )
    o_af = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    ev_afk = materialize(
        ev_af.withColumn("__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .select(
            (F.col("event_id") + F.col("__c") * 100_000_000).alias("event_id"),
            (F.col("user_id") + F.col("__c") * 1_000_000).alias("user_id"),
            "ts",
        ),
        f"ev_af_{k}x",
    )

    def fwd(ev):
        return asof_join_forward(
            ev, o_af, left_key="user_id", right_key="o_custkey",
            left_time="ts", right_time="o_orderdate",
            payload=["o_orderkey", "o_totalprice"], tiebreak="o_orderkey",
        )

    timed("asof_forward_1x", lambda: force_all(fwd(ev_af)))
    timed(f"asof_forward_{k}x_events", lambda: force_all(fwd(ev_afk)))

    # embed normalize at kx vectors (ids shifted; clones share values
    # so the MOMENTS are scaled but the moment-row stays ONE broadcast
    # row): wall must track the two scans linearly — the projection is
    # per-row arithmetic, the moment shuffle stays partitions x D
    from sparkclif.queries.group_r10 import embed_normalize_plan

    emb_1x = materialize(table(spark, sf_dir, "embeddings"), "emb_1x")
    emb_k = materialize(
        emb_1x.withColumn("__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .select(
            (F.col("vec_id") + F.col("__c") * 10_000_000).alias("vec_id"),
            "embedding",
        ),
        f"emb_{k}x",
    )
    timed("embed_normalize_1x", lambda: force_all(embed_normalize_plan(emb_1x)))
    timed(
        f"embed_normalize_{k}x_vecs",
        lambda: force_all(embed_normalize_plan(emb_k)),
    )

    # ---- round-11 growth probes ----
    # PQ ADC search at kx vectors (ids shifted, clones share values):
    # the codebook collect + LUT literal are size-invariant, the code
    # fold is the only corpus-sized shuffle, and the two-phase top-k
    # sees q x salt x k rows regardless of N — wall must track the
    # scan+fold linearly
    from sparkclif.operators.quantize import pq_adc_search

    timed("pq_adc_search_1x", lambda: force_all(pq_adc_search(emb_1x)))
    timed(
        f"pq_adc_search_{k}x_vecs",
        lambda: force_all(pq_adc_search(emb_k)),
    )

    # fused IVF-PQ at kx vectors: candidate volume is the probed
    # fraction of the corpus (2/8 of postings here), the rest of the
    # corpus never leaves the scan — wall must track the scan+fold,
    # strictly below a full-corpus ADC pass
    from sparkclif.operators.quantize import ivf_pq_search

    timed("ivf_pq_search_1x", lambda: force_all(ivf_pq_search(emb_1x)))
    timed(
        f"ivf_pq_search_{k}x_vecs",
        lambda: force_all(ivf_pq_search(emb_k)),
    )

    # PSL census at kx docs (ids shifted, sources shared): the
    # synthesized host set is CONSTANT under replication, so the
    # distinct-host probe, the bounded explode, the broadcast join and
    # the per-host map all stay fixed-size — only the scan and the
    # host join-back scale; wall must stay well under kx
    from sparkclif.queries.group_r11 import domain_stats_psl_plan

    docs_1x = materialize(
        table(spark, sf_dir, "documents").select(
            "doc_id", "source", "lang", "n_chars"
        ),
        "docs_psl_1x",
    )
    docs_k = materialize(
        docs_1x.withColumn("__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .select(
            (F.col("doc_id") + F.col("__c") * 10_000_000).alias("doc_id"),
            "source",
            "lang",
            "n_chars",
        ),
        f"docs_psl_{k}x",
    )
    timed("domain_stats_psl_1x", lambda: force_all(domain_stats_psl_plan(docs_1x)))
    timed(
        f"domain_stats_psl_{k}x_docs",
        lambda: force_all(domain_stats_psl_plan(docs_k)),
    )

    # linear gap-fill at kx events (users shifted so the key count
    # grows kx, spans unchanged): the gap-run expansion's grid is sum
    # of per-key spans — wall and output must both track kx linearly,
    # same law as the forward-fill gapfill
    from sparkclif.operators.timeseries import resample_interpolate

    ev_gl = materialize(
        table(spark, sf_dir, "events").select(
            "event_id", "user_id", "ts", "value"
        ),
        "ev_gl_1x",
    )
    ev_glk = materialize(
        ev_gl.withColumn("__c", F.explode(F.sequence(F.lit(0), F.lit(k - 1))))
        .select(
            (F.col("event_id") + F.col("__c") * 100_000_000).alias("event_id"),
            (F.col("user_id") + F.col("__c") * 1_000_000).alias("user_id"),
            "ts",
            "value",
        ),
        f"ev_gl_{k}x",
    )
    timed("gapfill_linear_1x", lambda: force_all(resample_interpolate(ev_gl)))
    timed(
        f"gapfill_linear_{k}x_events",
        lambda: force_all(resample_interpolate(ev_glk)),
    )

    # ---- round-12 growth probes ----
    # residual IVF-PQ at kx vectors: training is n_updates bounded-
    # metadata aggregations over the checkpointed residual projection
    # and the search touches the probed fraction of the codes fold —
    # wall must track the scan+fold linearly, same law as the raw
    # fused searcher (build constants are size-invariant)
    from sparkclif.operators.quantize import ivf_pq_residual_search

    timed(
        "ivf_pq_residual_1x",
        lambda: force_all(ivf_pq_residual_search(emb_1x)),
    )
    timed(
        f"ivf_pq_residual_{k}x_vecs",
        lambda: force_all(ivf_pq_residual_search(emb_k)),
    )

    # streaming ANN index pieces at kx: the per-batch encode delta is
    # a pure scan kernel (frozen quantizer literals) and must track
    # kx; the merge against a kx bucketed state with a FIXED-size
    # delta must track the state scan with ONE exchange (the delta
    # side) — the O(delta)-shuffle contract measured, not just
    # plan-asserted
    from sparkclif.operators.quantize import _collect_pq_metadata
    from sparkclif.streaming.ann import ann_delta, merge_ann_codes

    cbk, ann_heads = _collect_pq_metadata(emb_1x, 16, 8, "vec_id", "embedding")
    cents = ann_heads[:8]
    timed("ann_delta_1x", lambda: force_all(ann_delta(emb_1x, cents, cbk)))
    timed(
        f"ann_delta_{k}x_vecs",
        lambda: force_all(ann_delta(emb_k, cents, cbk)),
    )

    def ann_state(df, tag: str) -> str:
        tbl = f"probe_ann_state_{tag}"
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        (
            ann_delta(df, cents, cbk)
            .write.bucketBy(STATE_BUCKETS, "vec_id")
            .sortBy("vec_id")
            .mode("overwrite")
            .saveAsTable(tbl)
        )
        return tbl

    ann_s1 = ann_state(emb_1x, "1x")
    ann_sk = ann_state(emb_k, f"{k}x")
    ann_fixed_delta = ann_delta(emb_1x.limit(200), cents, cbk)
    timed(
        "ann_merge_1x_state",
        lambda: force_all(merge_ann_codes(spark.table(ann_s1), ann_fixed_delta)),
    )
    timed(
        f"ann_merge_{k}x_state_fixed_delta",
        lambda: force_all(merge_ann_codes(spark.table(ann_sk), ann_fixed_delta)),
    )
    spark.sql(f"DROP TABLE IF EXISTS {ann_s1}")
    spark.sql(f"DROP TABLE IF EXISTS {ann_sk}")

    shutil.rmtree(scratch, ignore_errors=True)


if __name__ == "__main__":
    main()
