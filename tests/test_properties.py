"""Property-based tests (SURVEY.md §5.2 layer 3, Hypothesis).

A 20-line Python dict model of the reference's StatusStore
(state.py:26-143) is the executable spec: applying a random command
log through the engine's append + last-wins-window path must equal
applying it through the model. The pivot property: for any sparse
status set, pivot(long) -> unpivot == dense original + defaults.

Examples are kept small (Spark round-trip per example); the point is
the random structure, not volume.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from sparkclif.clif.fixtures import STATUS_DEFAULT
from sparkclif.clif.status_store import current_pocs, current_site_status

SITES = ["site_a", "site_b", "site_c"]
REPOS = ["r1", "r2"]
STATUSES = ["✅", "🛠", "❌", STATUS_DEFAULT]

_settings = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

status_command = st.tuples(
    st.sampled_from(REPOS), st.sampled_from(SITES), st.sampled_from(STATUSES)
)


@given(log=st.lists(status_command, min_size=0, max_size=12))
@_settings
def test_upsert_log_matches_dict_model(spark, log):
    """Engine append-log + last-wins window == reference dict semantics
    (state.py:141-143: plain last-write-wins per (repo, site))."""
    model: dict[tuple[str, str], str] = {}
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for i, (repo, site, status) in enumerate(log):
        model[(repo, site)] = status
        rows.append((repo, site, status, t0 + dt.timedelta(seconds=i)))
    schema = "repo_url string, site_name string, status string, updated_at timestamp"
    df = spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
    got = {
        (r.repo_url, r.site_name): r.status for r in current_site_status(df).collect()
    }
    assert got == model


poc_command = st.tuples(
    st.sampled_from(["u1", "u2", "u3"]),
    st.sampled_from(SITES),
    st.sampled_from(["projX", None]),
)


@given(log=st.lists(poc_command, min_size=0, max_size=10))
@_settings
def test_poc_upsert_matches_dict_model(spark, log):
    """One site per user, last-wins (state.py:93-105) + 'General'
    default for a missing project (state.py:100-103)."""
    model: dict[str, tuple[str, str]] = {}
    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for i, (user, site, project) in enumerate(log):
        model[user] = (site, project or "General")
        rows.append((user, site, project or "General", t0 + dt.timedelta(seconds=i)))
    schema = "user_id string, site_name string, project string, assigned_at timestamp"
    df = spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
    got = {r.user_id: (r.site_name, r.project) for r in current_pocs(df).collect()}
    assert got == model


sparse_cells = st.dictionaries(
    st.tuples(st.sampled_from(SITES), st.sampled_from(["p1", "p2", "p3"])),
    st.sampled_from(STATUSES),
    max_size=9,
)


@given(cells=sparse_cells)
@_settings
def test_pivot_unpivot_roundtrip(spark, cells):
    """pivot(long) with defaults -> unpivot == dense(original+default)
    — the R22 dashboard matrix invariant."""
    projects = ["p1", "p2", "p3"]
    rows = [(s, p, v) for (s, p), v in cells.items()]
    schema = "site_name string, project string, status string"
    long_df = (
        spark.createDataFrame(rows, schema) if rows else spark.createDataFrame([], schema)
    )
    sites_df = spark.createDataFrame([(s,) for s in SITES], "site_name string")
    wide = (
        sites_df.join(long_df, "site_name", "left")
        .groupBy("site_name")
        .pivot("project", projects)
        .agg(F.first("status"))
        .fillna(STATUS_DEFAULT, subset=projects)
    )
    unpivoted = wide.unpivot("site_name", projects, "project", "status")
    got = {
        (r.site_name, r.project): r.status
        for r in unpivoted.collect()
        if r.status is not None
    }
    want = {
        (s, p): cells.get((s, p), STATUS_DEFAULT) for s in SITES for p in projects
    }
    assert got == want
