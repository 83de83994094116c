"""Property tests for sparkclif.numeric.fixed_sum — the scaled-long
accumulation must be value-identical to decimal accumulation (the
big=True path) on any fixed-point data, including negatives, across
partition layouts (order independence is the whole point)."""

from __future__ import annotations

import math
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sparkclif.numeric import fixed_sum

# fixed-point doubles: value = k / 100 with |k| <= 2e7 (money-like)
fixed_point = st.integers(min_value=-(2 * 10**7), max_value=2 * 10**7).map(
    lambda k: k / 100.0
)


@settings(max_examples=15, deadline=None)
@given(st.lists(fixed_point, min_size=1, max_size=60), st.integers(1, 7))
def test_fixed_sum_equals_decimal_path(spark, values, nparts):
    df = spark.createDataFrame(
        [(v,) for v in values], "v double"
    ).repartition(nparts)
    row = df.agg(
        fixed_sum("v").alias("fast"),
        fixed_sum("v", big=True).alias("big"),
    ).collect()[0]
    # exact reference in python Decimal, rounded half-up at 4
    ref = sum(Decimal(str(v)) for v in values)
    ref4 = float(ref.quantize(Decimal("0.0001"), rounding="ROUND_HALF_UP"))
    assert row.fast == row.big, (values, row)
    assert math.isclose(row.fast, ref4, abs_tol=5e-5), (values, row.fast, ref4)


@settings(max_examples=10, deadline=None)
@given(st.lists(fixed_point, min_size=1, max_size=40))
def test_fixed_sum_partition_order_independent(spark, values):
    """Same multiset, different partitionings => bit-identical result."""
    results = set()
    for nparts in (1, 3, 8):
        df = spark.createDataFrame([(v,) for v in values], "v double").repartition(
            nparts
        )
        results.add(df.agg(fixed_sum("v").alias("s")).collect()[0].s)
    assert len(results) == 1, results


def test_fixed_sum_scales(spark):
    """scale=1 sums round-at-1-digit values (the g_math_funcs
    sum_rounded contract): sum of round(x, 1), exactly."""
    vals = [1.25, 1.24, -1.25, 10.049]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = df.agg(fixed_sum("v", scale=1).alias("s")).collect()[0].s
    # round half away from zero at 1 digit: 1.3 + 1.2 - 1.3 + 10.0
    assert got == 11.2, got
