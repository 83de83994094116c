"""Whole-surface plan gates (sparkclif/plans.py): the invariants
PLANS.json records, enforced as a regression test over EVERY pure
query — not just the spot-checked ones in test_plans.py. A refactor
that routes any native path through a Python UDF or degrades a join
to a cartesian product fails here regardless of which query it hits.
"""

from __future__ import annotations

import pytest

from sparkclif.plans import formatted_plan, plan_metrics
from sparkclif.registry import all_queries

# The ONLY queries allowed to evaluate Python row-at-a-time: the two
# whose PURPOSE is the Python-UDF surface itself.
PYTHON_EVAL_ALLOWED = {"j_udf_scalar", "j_udtf"}


def _pure_names():
    return [n for n, s in all_queries().items() if s.cache_plan]


@pytest.fixture(scope="module")
def audit(spark, sf_dir):
    out = {}
    for name in _pure_names():
        spec = all_queries()[name]
        out[name] = plan_metrics(formatted_plan(spec.fn(spark, sf_dir)))
    return out


def test_no_python_eval_outside_udf_surface(audit):
    offenders = [
        n for n, m in audit.items() if m["python_eval"] and n not in PYTHON_EVAL_ALLOWED
    ]
    assert not offenders, offenders


def test_no_cartesian_products_anywhere(audit):
    offenders = [n for n, m in audit.items() if m["cartesian"]]
    assert not offenders, offenders


def test_exchange_counts_bounded(audit):
    """No pure query may exceed the worst known static exchange count
    (i_sim_sparse_pairs' 33, an upper bound deduped by ReusedExchange
    at runtime). A query suddenly above it has grown an unplanned
    shuffle structure."""
    offenders = {n: m["exchanges"] for n, m in audit.items() if m["exchanges"] > 33}
    assert not offenders, offenders
