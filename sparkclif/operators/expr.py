"""Expression-level helpers shared by the array/HOF operators.

``bind``: Spark performs no common-subexpression elimination inside
higher-order-function lambdas, and Catalyst's CollapseProject happily
substitutes an aliased expression into every use site — so an
expensive array expression referenced inside a ``transform`` lambda
is RECOMPUTED per element (measured: O(len²·window) instead of
O(len·stride) on the winnowing selector — 329 s for a single 4 KB
document). Binding the value as a lambda variable of an outer
one-element ``transform`` forces exactly-once evaluation per row:
lambda variables are values, not expressions, and cannot be
re-inlined by the optimizer.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind(col: Column, fn: "Callable[[Column], Column]") -> Column:
    """Evaluate ``col`` once per row and feed the VALUE to ``fn``.

    Implemented as ``element_at(transform(array(col), fn), 1)`` — the
    single array element becomes a lambda variable, so every
    reference inside ``fn`` (including nested lambdas) reads the
    computed value instead of re-evaluating the expression tree.
    """
    return F.element_at(F.transform(F.array(col), fn), 1)
