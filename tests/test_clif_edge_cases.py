"""CLIF-layer edge cases from the round-3 review: re-release column
order, same-instant status ties, mcide line numbering/trim, command-log
tie and error-routing semantics, append-only export."""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from sparkclif.clif.fixtures import sites_df


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_rerelease_keeps_original_column_position(spark):
    """Reference dict re-assignment keeps a re-released project at its
    ORIGINAL insertion position; column order must follow the first
    release, not the latest."""
    from sparkclif.clif.commands import apply_command_log
    from sparkclif.clif.dashboard import status_pivot

    rows = [
        (1, _ts("2024-01-01T10:00"), "release", "UA",
         json.dumps({"repo_url": "repoA", "project_name": "A"})),
        (2, _ts("2024-01-01T11:00"), "release", "UA",
         json.dumps({"repo_url": "repoB", "project_name": "B"})),
        (3, _ts("2024-01-01T12:00"), "release", "UA",
         json.dumps({"repo_url": "repoA", "project_name": "A2"})),
    ]
    log = spark.createDataFrame(
        rows, "event_id long, ts timestamp, kind string, user_id string, payload string"
    )
    sites = sites_df(spark)
    projects, status, _, _ = apply_command_log(log, sites)
    _, ordered = status_pivot(status, projects, sites)
    assert ordered == ["repoA", "repoB"], "re-release must not move repoA last"
    # metadata still follows the LAST release
    name = {r.repo_url: r.project_name for r in projects.collect()}
    assert name["repoA"] == "A2"


def test_same_instant_update_beats_init_row(spark):
    from sparkclif.clif.status_store import (
        current_site_status,
        init_site_status,
        set_site_status,
    )

    t = _ts("2024-01-01T10:00")
    projects = spark.createDataFrame(
        [("repoA", t)], "repo_url string, released_at timestamp"
    )
    sites = sites_df(spark)
    log = init_site_status(projects, sites)
    # '✅' (U+2705) sorts BELOW '❓' (U+2753): a status-string tiebreak
    # would let the init row win
    log = set_site_status(log, "repoA", "University of Michigan", "✅", t)
    cur = {
        r.site_name: r.status for r in current_site_status(log).collect()
    }
    assert cur["University of Michigan"] == "✅"


def test_mcide_append_after_blank_lines_and_trim(spark, tmp_path):
    from sparkclif.clif.mcide import (
        DuplicateValueError,
        append_value,
        list_values,
        read_catalog,
    )

    d = tmp_path / "vitals"
    d.mkdir()
    (d / "clif_vitals_vital_category_categories.csv").write_text("a\n\nb\n")
    catalog = read_catalog(spark, str(tmp_path))
    # line_nos are 1 and 3 (the blank line is numbered then dropped);
    # len-based numbering would collide with b at 3
    updated, contents = append_value(catalog, "vitals", "vital_category", "c")
    assert contents == "a\nb\nc\n"
    assert list_values(updated, "vitals", "vital_category") == ["a", "b", "c"]
    # whitespace variant of an existing value must be caught
    with pytest.raises(DuplicateValueError):
        append_value(updated, "vitals", "vital_category", "  b ")
    with pytest.raises(ValueError):
        append_value(updated, "vitals", "vital_category", "   ")


def test_command_log_tie_and_error_routing(spark):
    """(a) a set_poc at the SAME ts as a status_update but later in the
    log must not affect it; (b) updates between first release and a
    re-release are dropped silently, not phantom 'unknown_project'
    errors; (c) updates before the FIRST release are errors."""
    from sparkclif.clif.commands import apply_command_log

    t0, t1, t2, t3 = (
        _ts("2024-01-01T09:00"),
        _ts("2024-01-01T10:00"),
        _ts("2024-01-01T11:00"),
        _ts("2024-01-01T12:00"),
    )
    rows = [
        (1, t1, "release", "UA", json.dumps({"repo_url": "repoA", "project_name": "A"})),
        (2, t1, "set_poc", "U1", json.dumps({"site": "Emory University"})),
        # same ts as event 4 but LATER event_id: must not reassign U1
        (5, t2, "set_poc", "U1", json.dumps({"site": "Oregon Health & Science University"})),
        (4, t2, "status_update", "U1", json.dumps({"value": "repoA|✅"})),
        # update on never-released repoB (user registered) -> error
        (6, t2, "status_update", "U1", json.dumps({"value": "repoB|✅"})),
        # re-release repoA at t3: the t2 update is wiped, NOT an error
        (7, t3, "release", "UA", json.dumps({"repo_url": "repoA", "project_name": "A"})),
    ]
    log = spark.createDataFrame(
        rows, "event_id long, ts timestamp, kind string, user_id string, payload string"
    )
    projects, status, pocs, errors = apply_command_log(log, sites_df(spark))
    err = {(r.event_id, r.error) for r in errors.collect()}
    assert (6, "unknown_project") in err
    assert all(e[0] != 4 for e in err), "wiped update must not be an error row"
    # the t2 update was attributed to Emory (assignment event 2), then
    # wiped by the re-release -> final matrix all-default
    statuses = {r.status for r in status.collect()}
    assert statuses == {"❓"}


def test_export_document_tolerates_append_only_tables(spark):
    from sparkclif.clif.legacy import export_document
    from sparkclif.clif.status_store import set_poc, set_site_status

    t1, t2 = _ts("2024-01-01T10:00"), _ts("2024-01-01T11:00")
    projects = spark.createDataFrame(
        [("repoA", "A", "", [], "U", t1)],
        "repo_url string, project_name string, description string, "
        "tables_required array<string>, released_by string, released_at timestamp",
    )
    status = spark.createDataFrame(
        [], "repo_url string, site_name string, status string, updated_at timestamp"
    )
    status = set_site_status(status, "repoA", "Emory University", "🛠", t1)
    status = set_site_status(status, "repoA", "Emory University", "✅", t2)  # re-set
    pocs = spark.createDataFrame(
        [], "user_id string, site_name string, project string, assigned_at timestamp"
    )
    pocs = set_poc(pocs, "U1", "Emory University", None, t1)
    pocs = set_poc(pocs, "U1", "Rush University", None, t2)  # reassigned
    assignments = spark.createDataFrame(
        [("Emory University", "U1", "General")],
        "site_name string, user_id string, project string",
    )
    doc = json.loads(export_document(projects, status, pocs, assignments))
    assert doc["projects"]["repoA"]["site_status"]["Emory University"] == "✅"
    assert doc["pocs"] == {"U1": "Rush University"}
