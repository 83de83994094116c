"""Differential oracle parity — every registered query with an oracle
is compared against DuckDB exactly the way the driver does it
(row-count + columns + order-insensitive values). Rows-only queries
are smoke-checked for executability and schema stability."""

from __future__ import annotations

import pytest

from sparkclif.oracle import compare, run_oracle
from sparkclif.registry import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_parity(spark, sf_dir, name):
    spec = QUERIES[name]
    sdf = spec.fn(spark, sf_dir)
    if spec.oracle is None:
        rows = sdf.collect()
        assert rows is not None
        assert len(sdf.columns) > 0
        return
    oracle_pdf = run_oracle(spec.oracle, sf_dir)
    problems = compare(sdf, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)
