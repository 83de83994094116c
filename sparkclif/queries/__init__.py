"""Driver-checked query surface (SURVEY.md §2.2).

Importing this package registers every query group into
``sparkclif.registry.REGISTRY``.
"""

from sparkclif.queries import (  # noqa: F401
    group_a,
    group_b,
    group_c,
    group_d,
    group_e,
    group_f,
    group_g,
    group_h,
    group_i,
    group_j,
)
