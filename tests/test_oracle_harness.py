"""The local parity harness itself must be at least as strict as the
driver's stringify-then-hash compare. Round 7's only red row
(`e_win_zscore`) passed locally because Python `==` treats -0.0 and
0.0 as equal while the driver's stringified hash does not — these
tests pin the harness classes that have bitten a driver round so they
can never pass locally again."""

from __future__ import annotations

import numpy as np
import pandas as pd

from sparkclif.oracle import _norm_cell, canonical_rows


def test_negative_zero_distinguished():
    # The round-7 e_win_zscore class: the driver stringifies cells, so
    # "-0.0" != "0.0" even though Python == says they are equal.
    assert _norm_cell(-0.0) != _norm_cell(0.0)
    assert _norm_cell(np.float64(-0.0)) != _norm_cell(0.0)


def test_negative_zero_fails_row_compare():
    a = canonical_rows(pd.DataFrame({"z": [0.0]}))
    b = canonical_rows(pd.DataFrame({"z": [-0.0]}))
    assert a != b


def test_equal_floats_still_equal():
    # repr of equal rounded floats is identical — the sign fix must
    # not introduce false mismatches for ordinary values.
    for x in (1.2345, -1.2345, 0.0001, 123456.789, 2.0, -2.0):
        assert _norm_cell(x) == _norm_cell(float(np.float64(x)))
    # round-to-4dp guard still collapses sub-precision noise
    assert _norm_cell(1.00000001) == _norm_cell(1.0)


def test_int_float_classes_still_distinct():
    # The round-1 g_date_funcs class: int64 2758 vs float64 2758.0.
    assert _norm_cell(2758) != _norm_cell(2758.0)


def test_nan_is_null():
    assert _norm_cell(float("nan")) is None
