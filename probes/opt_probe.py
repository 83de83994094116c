"""Optimization probe — isolate named queries per guide §1.

For each query name given on the command line (or a preset group):
- builds the plan, times a warm noop-sink execution N times
  (``df.write.format("noop")`` — full plan, no sink cost, guide §1.4),
- labels the jobs (`setJobDescription`) so event logs stay readable,
- optionally dumps ``explain("formatted")`` to
  plans/$SPARKCLIF_PLANS_ROUND/<q>_<tag>.txt (default r13; the judge
  checks plan claims against these files).

Usage:
    python probes/opt_probe.py [--plans TAG] [--runs N] q1 q2 ...

Timings print as one JSON line per query: build (plan-construction,
includes any impure builder work: collects, checkpoints, streams) and
exec (warm noop wall, best + all samples). For cache_plan=False
queries every run rebuilds, so 'run' = build+exec per pass — the same
accounting bench.py uses.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    plans_tag = None
    runs = 3
    while args and args[0].startswith("--"):
        if args[0] == "--plans":
            plans_tag = args[1]
            args = args[2:]
        elif args[0] == "--runs":
            runs = int(args[1])
            args = args[2:]
        else:
            raise SystemExit(f"unknown flag {args[0]}")
    names = args
    if not names:
        raise SystemExit("usage: opt_probe.py [--plans TAG] [--runs N] query ...")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from sparkclif.plans import formatted_plan
    from sparkclif.registry import all_queries
    from sparkclif.session import get_spark

    spark = get_spark("opt-probe")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()

    # same warmup as bench.py: JVM/codegen/parquet-footer + Arrow workers
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    specs["d_agg_groupby"].fn(spark, sf_dir).collect()
    spark.range(32_000).repartition(8).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARKCLIF_PLANS_ROUND", "r13"),
    )
    os.makedirs(plans_dir, exist_ok=True)

    for name in names:
        spec = specs[name]
        spark.sparkContext.setJobDescription(f"opt:{name}")
        samples = []
        builds = []
        df = None
        for i in range(runs):
            if df is None or not spec.cache_plan:
                t0 = time.perf_counter()
                df = spec.fn(spark, sf_dir)
                builds.append(round(time.perf_counter() - t0, 4))
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 4))
        build_s = min(builds) if builds else 0.0
        if plans_tag:
            with open(f"{plans_dir}/{name}_{plans_tag}.txt", "w") as fh:
                fh.write(formatted_plan(df))
        spark.sparkContext.setJobDescription(None)
        # run_best mirrors bench.py exactly: cache_plan=False rebuilds
        # per pass, so a "run" is one pass's OWN build+exec pair —
        # min(builds)+min(samples) could pair a fast build from pass 1
        # with a fast exec from pass 3, a time no pass achieved
        # (ADVICE r12).
        if spec.cache_plan:
            run_best = round(build_s + min(samples), 4)
        else:
            run_best = round(min(b + s for b, s in zip(builds, samples)), 4)
        print(json.dumps({
            "query": name,
            "build_s": round(build_s, 4),
            "build_samples": builds,
            "exec_best": min(samples),
            "exec_samples": samples,
            "run_best": run_best,
            "cache_plan": spec.cache_plan,
        }), flush=True)


if __name__ == "__main__":
    main()
