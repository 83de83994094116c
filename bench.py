"""Benchmark harness — times every registered query end-to-end on the
bench scale factor and prints ONE JSON line (driver contract).

Execution is ``df.write.format("noop")`` so the full plan runs without
driver-side collection cost. DuckDB wall-clock per query is recorded
alongside (it is both the oracle and the baseline timer — SURVEY.md §6).

Round 10: Spark and DuckDB are timed INTERLEAVED per query (each
query's warm Spark run immediately followed by its DuckDB baseline
run), so every per-query ratio is measured inside one VM weather phase
— the old sequential blocks let a multi-minute slow phase land on one
engine only and spread identical-code aggregate ratios 1.43-2.44
(SCALE.md round-9 spread table).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    # the sf field must stay an honest grouping key: parse it only
    # from a basename of the form sf<digits...>, else report the raw
    # dir (rsplit('sf') on an arbitrary path published garbage like
    # 'ast/run1' for /data/sfast/run1)
    _m = re.fullmatch(r"sf([0-9.]+)", os.path.basename(sf_dir.rstrip("/")))
    sf = _m.group(1) if _m else sf_dir

    from sparkclif.registry import all_queries
    from sparkclif.session import get_spark

    spark = get_spark("sparkclif-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_queries()
    # Warm up JVM / codegen / parquet footer caches AND the Arrow
    # Python worker pool outside the timings (the first pandas-kernel
    # query otherwise absorbs ~1-2 s of worker spawn).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    specs["d_agg_groupby"].fn(spark, sf_dir).collect()
    spark.range(32_000).repartition(cpus).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # Warm pass (untimed) then timed pass, for BOTH engines. At sf0.1 a
    # cold Spark run is dominated by one-off plan/codegen JIT compile
    # (~0.3-1 s per distinct query shape) that a real cluster amortizes
    # over minutes-long queries; warm timings measure engine throughput,
    # not compiler latency. The same two-pass protocol is applied to the
    # DuckDB baseline so the comparison stays apples-to-apples.
    # Plan cache for PURE declarative queries (QuerySpec.cache_plan):
    # the warm pass builds each plan, the timed pass reuses it — the
    # standard repeated-parameterized-query plan cache. Impure queries
    # (sinks, streaming harnesses, broadcast-building kernels) rebuild
    # every run so their timings include that work.
    plans: dict[str, object] = {}

    def run_spark(name: str) -> float:
        spec = specs[name]
        t0 = time.perf_counter()
        df = plans.get(name)
        if df is None:
            df = spec.fn(spark, sf_dir)
            if spec.cache_plan:
                plans[name] = df
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 4)

    # DuckDB baseline: ONE connection with the views registered ONCE,
    # OUTSIDE the timed region (the late-r8 honesty correction — a
    # per-call connect + CREATE VIEW binds inside the timing inflated
    # every baseline by a fixed ~2-10 ms). Opened BEFORE the timing
    # loop because round 10 interleaves the two engines per query (see
    # below). Any baseline failure is RECORDED in the summary instead
    # of silently shrinking the gate set.
    duck: dict[str, float] = {}
    duck_warmed: set[str] = set()
    baseline_error = None
    con = None
    try:
        import duckdb

        from sparkclif.io import TABLES

        con = duckdb.connect()
        for t_name in TABLES:
            con.execute(
                f"CREATE VIEW {t_name} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t_name}.parquet')"
            )
    except Exception as e:
        baseline_error = f"{type(e).__name__}: {e}"[:300]
        print(f"baseline error: {baseline_error}", file=sys.stderr)
        con = None

    def run_duck(name: str) -> None:
        """One timed DuckDB run of ``name``'s oracle (warm-then-timed:
        the first call per query runs the oracle once untimed first),
        folded into the per-query minimum. Baseline failures are
        recorded once and stop further baseline timing — partial gate
        sets must never be silent (the r7 swallowed-exception lesson)."""
        nonlocal baseline_error, con
        spec = specs[name]
        if con is None or spec.oracle is None or not spec.oracle_in_bench:
            return
        try:
            if name not in duck_warmed:
                con.execute(spec.oracle).fetchdf()
                duck_warmed.add(name)
            t0 = time.perf_counter()
            con.execute(spec.oracle).fetchdf()
            t = round(time.perf_counter() - t0, 4)
            if name not in duck or t < duck[name]:
                duck[name] = t
        except Exception as e:
            baseline_error = f"{type(e).__name__}: {e}"[:300]
            print(f"baseline error: {baseline_error}", file=sys.stderr)
            con.close()
            con = None

    # Soft wall-clock budget: degrade gracefully (drop the second timed
    # pass, then the cold pass's role as warm-up is already paid) rather
    # than risk a harness timeout producing no JSON line at all.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "420"))
    bench_t0 = time.perf_counter()

    # INTERLEAVED protocol (round 10 — VERDICT r9 item 1): each query's
    # Spark runs and its DuckDB baseline run back-to-back, inside ONE
    # VM weather phase. The old block protocol (all Spark, then all
    # DuckDB) let a multi-minute slow phase hit one engine's block and
    # not the other's; identical code spread fa 1.433 -> 2.438 across
    # 11 runs (SCALE.md round-9 spread table), with the ~2x gate
    # deciding on weather. Interleaving makes each PER-QUERY ratio
    # weather-paired; the aggregate ratio inherits that stability.
    #
    # Pass 0 runs each query COLD then immediately WARM (back-to-back:
    # the second run reuses the cached plan + hot codegen/worker pool
    # for that exact query shape), so one warm measurement per query is
    # GUARANTEED before any budget gate fires — the round-5 driver run
    # tripped the old gate after the cold sweep alone and published
    # cold numbers as "warm, best-of-0" (VERDICT r5 item 1) — then that
    # query's DuckDB baseline (warm-then-timed, same two-run shape).
    # Passes 1..2 add warm best-of-N candidates for BOTH engines when
    # budget allows. Per-query noise on this shared VM is ±2-5x on
    # Python-worker-heavy kernels (worker pool churn, GC); min-of-N
    # measures the engine, not the weather.
    # Fixed per-query floors of local-mode Spark, reported so total
    # wall-clock decomposes into engine work vs harness floor (the
    # floor is unavoidable at any data size and amortizes away on
    # minutes-long cluster queries). Two shapes:
    # - floor: one empty single-stage job (pure scheduler round-trip)
    # - floor_shuffle: a near-empty scan -> exchange -> agg with AQE
    #   (stage barrier + AQE re-plan + shuffle machinery) — the shape
    #   every relational query in this suite pays at least once, so
    #   (spark_time - floor_shuffle) is the defensible data-dependent
    #   cost to hold against the DuckDB baseline.
    # SAMPLED THROUGHOUT the run and aggregated as the MEDIAN (round
    # 10): the floor is subtracted ~127 times, so a single-instant
    # measurement leveraged VM weather into the headline ratio — the
    # first two interleaved runs had raw gate totals within 3%
    # (47.1 vs 45.8 s Spark, 18.3 vs 18.4 s DuckDB) yet published fa
    # 1.92 vs 1.46 purely because one run's end-of-run floor probe
    # (0.096 s) hit a different weather instant than the other's
    # (0.160 s): 127 x 0.064 s IS the entire 8 s fa gap. A median of
    # samples interspersed with the timed queries measures the floor
    # in the same weather mix the queries paid.
    from pyspark.sql import functions as _F

    floor_samples: list[float] = []
    floor_shuffle_samples: list[float] = []

    def sample_floors() -> None:
        t0 = time.perf_counter()
        spark.range(1).write.format("noop").mode("overwrite").save()
        floor_samples.append(round(time.perf_counter() - t0, 4))
        t0 = time.perf_counter()
        spark.range(1000).repartition(4).groupBy(
            (_F.col("id") % 4).alias("g")
        ).count().write.format("noop").mode("overwrite").save()
        floor_shuffle_samples.append(round(time.perf_counter() - t0, 4))

    cold: dict[str, float] = {}
    timings: dict[str, float] = {}
    n_passes = 0
    # Gates re-leveled for the interleaved shape: pass 0 (cold + warm
    # Spark + warm + timed DuckDB per query) is ~255-270 s of the
    # budget by itself; a warm-only pass adds ~110 s. 0.70 lets the
    # second pass start whenever it can finish near the budget; 0.85
    # effectively reserves pass 2 for fast-weather runs.
    _gates = {1: 0.70, 2: 0.85}
    for _pass in range(3):
        if _pass > 0 and time.perf_counter() - bench_t0 > budget * _gates[_pass]:
            break
        for i, name in enumerate(sorted(specs)):
            if i % 25 == 0:
                sample_floors()  # floor in the queries' own weather
            t = run_spark(name)
            if _pass == 0:
                cold[name] = t
                t = run_spark(name)  # guaranteed warm run, same shape
            if name not in timings or t < timings[name]:
                timings[name] = t
            run_duck(name)  # adjacent: same weather phase as the Spark run
        sample_floors()
        n_passes += 1

    import statistics

    floor = round(statistics.median(floor_samples), 4)
    floor_shuffle = round(statistics.median(floor_shuffle_samples), 4)

    # ADVICE r8: close on every path — run_duck already closes on a
    # mid-loop oracle error (and nulls con so later queries skip).
    if con is not None:
        con.close()
        con = None

    total = round(sum(timings.values()), 4)
    # self-report the BASELINE.md bench gate (spark <= 2x duckdb per
    # query) over the queries that have a comparable-plan baseline,
    # both raw and floor-adjusted: at sf0.1 DuckDB medians are
    # ~20-130 ms/query while local-mode Spark carries a fixed
    # ~floor_shuffle of scheduler/stage/AQE machinery per query, so
    # the raw gate mostly measures that constant, not plan quality.
    gate_checked = [k for k in timings if k in duck]
    gate_over = sorted(k for k in gate_checked if timings[k] > 2 * duck[k])
    fa = {k: round(max(timings[k] - floor_shuffle, 0.0), 4) for k in timings}
    gate_fa_over = sorted(k for k in gate_checked if fa[k] > 2 * duck[k])
    duck_total = round(sum(duck.values()), 4)
    fa_checked_total = round(sum(fa[k] for k in gate_checked), 4)
    # ONE compact JSON line (driver contract — its tail capture
    # truncated the round-3 line that inlined the full DuckDB map);
    # per-query baselines and floor-adjusted detail go to a side file.
    # Shared run id stamped into BOTH artifacts (VERDICT r6 item 3):
    # derived from this run's own timing content (no wall-clock), so a
    # BENCH.json and BENCH_DETAILS.json from DIFFERENT runs can never
    # silently pair — probes/plan_audit.py refuses mixed ids, and the
    # invariant fa == max(t - floor_shuffle, 0) is checkable from the
    # committed pair alone.
    import hashlib

    run_id = hashlib.md5(
        json.dumps([timings, floor_shuffle], sort_keys=True).encode()
    ).hexdigest()[:12]
    summary = {
        "metric": "sparkclif_total_query_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "gate_2x_checked": len(gate_checked),
        "gate_2x_over_count": len(gate_over),
        "gate_2x_floor_adj_over": gate_fa_over,
        "floor_adjusted_ratio": (
            round(fa_checked_total / duck_total, 3) if duck_total else None
        ),
        "duckdb_total": duck_total,
        "cpus": cpus,
        "mode": f"warm, best-of-{n_passes}, spark/duckdb interleaved "
        "per query (weather-paired ratios; round 10); "
        "details+baselines in BENCH_DETAILS.json",
        "cold_total": round(sum(cold.values()), 4),
        "per_query_floor": floor,
        "floor_shuffle": floor_shuffle,
        "baseline_error": baseline_error,
        "run_id": run_id,
    }
    details = {
        "run_id": run_id,
        "floor_shuffle": floor_shuffle,
        "floor_samples": floor_samples,
        "floor_shuffle_samples": floor_shuffle_samples,
        "duckdb_baseline": duck,
        "floor_adjusted": fa,
        "gate_2x_over": gate_over,
        "cold_queries": cold,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_DETAILS.json"), "w") as fh:
        json.dump(details, fh, indent=1, sort_keys=True)
    # bench.py writes BENCH.json itself (same payload as the stdout
    # line) so the committed pair is produced by ONE run by
    # construction — the r5/r6 drift came from hand-copying a stdout
    # line next to a details file from a different run.
    with open(os.path.join(here, "BENCH.json"), "w") as fh:
        json.dump(summary, fh, indent=1, sort_keys=True)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
