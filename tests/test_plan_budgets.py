"""Full-surface plan-budget regression net (round 10, VERDICT r9
item 5): every registered query's recorded plan metrics (PLANS.json,
regenerated per round by probes/plan_audit.py) become CI assertions,
so a rewrite that adds an exchange, a cartesian product, or a Python
row-eval to any of the 148 queries fails here instead of surfacing as
a bench-tail mystery next round.

Coverage split (mirrors the audit's own):

- PURE queries (cache_plan=True, ~115): the audit records the STATIC
  plan, which is a deterministic function of (code, sf0.01 stats) —
  so the test rebuilds the plan at the audit's scale factor and
  asserts the ENTIRE metric row equal. Any drift — even an improvement
  — fails until PLANS.json is deliberately regenerated, putting the
  plan diff in review where it belongs.
- IMPURE queries (cache_plan=False: sinks, streaming harnesses,
  materializing kernels, 33): the audit executes them and records the
  FINAL adaptive plan; re-executing all of them here would re-run
  every streaming harness per suite invocation (test_oracle_parity
  already executes each once for correctness). The test instead
  asserts the scale-killer BOOLEANS on the cheap static plan —
  python_eval and cartesian, which AQE neither inserts nor removes,
  so static == runtime for them — and leaves exchange-count drift to
  the per-round audit regeneration.
"""

from __future__ import annotations

import json
import os

import pytest

from sparkclif.registry import all_queries

PLANS_PATH = os.path.join(os.path.dirname(__file__), "..", "PLANS.json")
# PINNED, never env-derived (round-10 review): PLANS.json is recorded
# at sf0.01 and plan choices in the recorded metrics (broadcast vs
# sort-merge, pushed filters, cost dispatch) depend on file-size
# stats — a stray SPARK_GRAFT_SF_DIR left over from a bench run would
# rebuild plans at a different sf and hard-compare them against
# sf0.01 baselines. probes/plan_audit.py pins the same constant.
AUDIT_SF_DIR = "/root/testdata/sf0.01"

with open(PLANS_PATH) as _fh:
    PLANS = json.load(_fh)

_SPECS = all_queries()
_PURE = sorted(n for n, s in _SPECS.items() if s.cache_plan)
_IMPURE = sorted(n for n, s in _SPECS.items() if not s.cache_plan)


def test_every_query_has_an_audit_row():
    """A query registered without a PLANS.json row has never been
    plan-audited: run `python probes/plan_audit.py` before shipping."""
    missing = sorted(set(_SPECS) - set(PLANS))
    assert not missing, f"unaudited queries (run probes/plan_audit.py): {missing}"
    stale = sorted(set(PLANS) - set(_SPECS))
    assert not stale, f"PLANS.json rows for unregistered queries: {stale}"


@pytest.mark.parametrize("name", _PURE)
def test_pure_plan_metrics_match_audit(spark, name):
    from sparkclif.plans import formatted_plan, plan_metrics

    if name not in PLANS:
        pytest.skip("covered by test_every_query_has_an_audit_row")
    got = plan_metrics(formatted_plan(_SPECS[name].fn(spark, AUDIT_SF_DIR)))
    # full-dict compare (ADVICE r10): filtering the recorded row to
    # got's keys let a removed/renamed metric silently drop out of the
    # check on both sides. A metric-schema change must regenerate
    # PLANS.json, not shrink the assertion.
    assert got == PLANS[name], (
        f"{name}: plan metrics drifted from PLANS.json — if intended, "
        f"regenerate with `python probes/plan_audit.py`"
    )


# Impure queries whose fn() RUNS the whole harness at build time and
# returns a bare scan of its own accumulated output (streaming
# harnesses, roundtrip sinks): asserting cartesian/python_eval on that
# scan is cost without coverage — test_oracle_parity already executes
# each once per suite run, and the audit's runtime row records the
# same scan. Excluded here (round-10 review).
_SCAN_RETURN_PREFIXES = ("h_stream", "h_stateful", "a_sink")
_IMPURE_RICH = [
    n for n in _IMPURE if not n.startswith(_SCAN_RETURN_PREFIXES)
]


@pytest.mark.parametrize("name", _IMPURE_RICH)
def test_impure_plan_has_no_new_scale_killers(spark, name):
    """The returned frame's plan for these impure builders is rich
    (the real join/agg/kernel shape); building it does bounded driver
    work (broadcast seeds, kmeans iterations) but never runs a sink or
    stream — those are excluded above. AQE neither inserts nor removes
    CartesianProduct/Python-eval nodes, so the static booleans compare
    against the audit's runtime row exactly."""
    from sparkclif.plans import formatted_plan, plan_metrics

    if name not in PLANS:
        pytest.skip("covered by test_every_query_has_an_audit_row")
    got = plan_metrics(formatted_plan(_SPECS[name].fn(spark, AUDIT_SF_DIR)))
    want = PLANS[name]
    assert got["cartesian"] == want["cartesian"], (
        f"{name}: cartesian product drift vs PLANS.json"
    )
    assert got["python_eval"] == want["python_eval"], (
        f"{name}: Python row-eval drift vs PLANS.json"
    )
