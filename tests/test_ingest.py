"""Ingestion adapters (clif/ingest.py): contents-API catalog
normalization must be schema- and value-identical to the file-tree
reader, and Slack interactivity payloads must land as command_log rows
the command applier consumes unchanged."""

from __future__ import annotations

import base64
import json

from sparkclif.clif.ingest import (
    fetch_catalog_payloads,
    github_contents_to_catalog,
    slack_payloads_to_command_log,
)


def _b64(text: str) -> str:
    # the contents API wraps base64 at 60 chars with newlines
    raw = base64.b64encode(text.encode()).decode()
    return "\n".join(raw[i : i + 60] for i in range(0, len(raw), 60))


FILES = {
    "mCIDE/vitals/clif_vitals_vital_category_categories.csv": "heart_rate\nsbp\n",
    "mCIDE/respiratory_support/clif_respiratory_support_device_category_categories.csv": (
        "vent\nhigh flow nc\n \ntrach collar\n"
    ),
}


def fake_fetch(path: str) -> str:
    if path == "mCIDE":
        return json.dumps(
            [
                {"name": "vitals", "type": "dir"},
                {"name": "respiratory_support", "type": "dir"},
                {"name": "00_template", "type": "dir"},  # excluded
                {"name": "README.md", "type": "file"},  # not a dir
            ]
        )
    if path in ("mCIDE/vitals", "mCIDE/respiratory_support"):
        table = path.split("/")[-1]
        return json.dumps(
            [
                {"name": p.split("/")[-1], "type": "file"}
                for p in FILES
                if f"/{table}/" in p
            ]
            + [{"name": "notes.txt", "type": "file"}]  # ignored
        )
    assert path in FILES, path
    return json.dumps(
        {
            "name": path.split("/")[-1],
            "path": path,
            "type": "file",
            "content": _b64(FILES[path]),
            "encoding": "base64",
        }
    )


def test_contents_api_catalog_matches_file_tree_reader(spark, tmp_path):
    from sparkclif.clif.mcide import read_catalog

    payloads = fetch_catalog_payloads(fake_fetch)
    assert len(payloads) == 2  # 00_template and non-csv entries skipped
    via_api = github_contents_to_catalog(spark, payloads)

    # same files on disk -> read_catalog; outputs must be identical
    for path, text in FILES.items():
        d = tmp_path / path.split("/")[1]
        d.mkdir(exist_ok=True)
        (d / path.split("/")[-1]).write_text(text)
    via_tree = read_catalog(spark, str(tmp_path))

    assert [(f.name, f.dataType) for f in via_api.schema] == [
        (f.name, f.dataType) for f in via_tree.schema
    ]
    assert sorted(map(tuple, via_api.collect())) == sorted(
        map(tuple, via_tree.collect())
    )
    # underscore table name parsed past the first underscore
    vals = {
        (r["table_name"], r["variable"]) for r in via_api.collect()
    }
    assert ("respiratory_support", "device_category") in vals
    # blank line dropped, order preserved
    rows = sorted(
        (r["line_no"], r["value"])
        for r in via_api.where("table_name = 'respiratory_support'").collect()
    )
    assert rows == [(1, "vent"), (2, "high flow nc"), (4, "trach collar")]


def _view_submission(cb, user, state):
    # faithful shape: real view_submission bodies carry NO timestamp
    return json.dumps(
        {
            "type": "view_submission",
            "user": {"id": user},
            "view": {"callback_id": cb, "state": {"values": state}},
        }
    )


def test_slack_payloads_become_command_log_rows(spark):
    payloads = [
        (
            1700000000.123456,  # arrival ts from the transport layer
            _view_submission(
                "clif_project_modal",
                "U_ADMIN",
                {
                    "github_url_block": {
                        "github_url": {"value": "https://github.com/x/p"}
                    },
                    "project_name_block": {"project_name": {"value": "P"}},
                    "result_box_block": {"result_box_link": {"value": "box"}},
                    "special_instructions_block": {
                        "special_instructions": {"value": None}
                    },
                },
            ),
        ),
        (
            1700000001.000001,
            _view_submission(
                "clif_site_poc_modal",
                "U_SUBMITTER",
                {
                    "site_block": {
                        "site_select": {"selected_option": {"value": "Rush"}}
                    },
                    "user_block": {"user_select": {"selected_user": "U_POC"}},
                    "project_block": {"project_select": {"selected_option": None}},
                },
            ),
        ),
        json.dumps(  # dashboard status button
            {
                "type": "block_actions",
                "user": {"id": "U_POC"},
                "actions": [
                    {
                        "action_id": "status_update",
                        "action_ts": "1700000002.5",
                        "value": "https://github.com/x/p|In Progress",
                    }
                ],
            }
        ),
        _view_submission(  # help modal: non-mutating, must be filtered
            "clif_help_modal", "U_X", {"summary_block": {"summary_input": {"value": "?"}}}
        ),
    ]
    log = slack_payloads_to_command_log(spark, payloads)
    rows = {r["kind"]: r for r in log.collect()}
    assert set(rows) == {"release", "set_poc", "status_update"}
    # arrival timestamps landed (no 1970-epoch rows)
    assert rows["release"]["ts"].year >= 2023
    rel = json.loads(rows["release"]["payload"])
    assert rel["repo_url"] == "https://github.com/x/p"
    # set_poc: user_id is the ASSIGNED poc, submitter audited in payload
    assert rows["set_poc"]["user_id"] == "U_POC"
    assert json.loads(rows["set_poc"]["payload"])["submitted_by"] == "U_SUBMITTER"
    assert json.loads(rows["set_poc"]["payload"])["site"] == "Rush"
    # status value stays packed "repo|status" (commands splits it)
    assert json.loads(rows["status_update"]["payload"])["value"].endswith(
        "|In Progress"
    )
    # the applier consumes the ingested log unchanged
    from sparkclif.clif.commands import poc_events, releases

    assert releases(log).count() == 1
    assert poc_events(log).collect()[0]["site_name"] == "Rush"


def test_mutating_view_submission_without_arrival_ts_rejected(spark):
    import pytest

    bare = _view_submission(
        "clif_project_modal",
        "U_A",
        {"github_url_block": {"github_url": {"value": "u"}}},
    )
    with pytest.raises(ValueError, match="no\\s+timestamp"):
        slack_payloads_to_command_log(spark, [bare])


def test_block_actions_without_any_ts_rejected(spark):
    import pytest

    bare = json.dumps(
        {
            "type": "block_actions",
            "user": {"id": "U"},
            "actions": [{"action_id": "status_update", "value": "r|Done"}],
        }
    )
    with pytest.raises(ValueError, match="no action_ts"):
        slack_payloads_to_command_log(spark, [bare])
    # with an arrival timestamp the same payload ingests fine
    out = slack_payloads_to_command_log(spark, [(1700000005.0, bare)])
    assert out.collect()[0]["ts"].year >= 2023


def test_issue_sink_status_branching(spark):
    """R35 (app.py:222-258): the issue REST sink, driven by a canned
    transport — 201 success, non-201 failure text, raised transport
    error, all in event order with the reference's exact messages."""
    from sparkclif.clif.issues import ISSUES_URL, post_issues

    issues = spark.createDataFrame(
        [
            (1, "U1", "bug A", "details A"),
            (2, "U2", "bug B", None),  # missing description posts as ""
            (3, "U3", "bug C", "details C"),
        ],
        "event_id long, user_id string, title string, description string",
    )
    calls = []

    def post(url, headers, payload):
        calls.append((url, headers["Authorization"], payload))
        if payload["title"] == "bug B":
            return 422, '{"message":"Validation Failed"}'
        if payload["title"] == "bug C":
            raise OSError("connection reset")
        return 201, '{"html_url":"https://github.com/x/y/issues/7"}'

    out = {
        r["event_id"]: (r["ok"], r["message"])
        for r in post_issues(spark, issues, post, token="tkn").collect()
    }
    assert out[1] == (True, "Issue created: https://github.com/x/y/issues/7")
    assert out[2] == (False, 'Failed to create issue: {"message":"Validation Failed"}')
    assert out[3] == (False, "Error creating issue: connection reset")
    # transport saw the reference's URL, bearer header, and "" body
    assert [c[0] for c in calls] == [ISSUES_URL] * 3
    assert calls[0][1] == "Bearer tkn"
    assert calls[1][2] == {"title": "bug B", "body": ""}
    # event order: bug A attempted before bug B before bug C
    assert [c[2]["title"] for c in calls] == ["bug A", "bug B", "bug C"]


def test_issue_sink_without_token_posts_nothing(spark):
    """The no-token branch mirrors app.py:236-238: no transport call,
    every row reports the not-set message."""
    from sparkclif.clif.issues import post_issues

    issues = spark.createDataFrame(
        [(1, "U1", "t", "d")],
        "event_id long, user_id string, title string, description string",
    )

    def post(url, headers, payload):  # pragma: no cover - must not run
        raise AssertionError("transport must not be called without a token")

    rows = post_issues(spark, issues, post, token=None).collect()
    assert [(r["ok"], r["message"]) for r in rows] == [
        (False, "GITHUB_TOKEN is not set.")
    ]
    # the reference branches on falsy `if not token:` (app.py:234), so
    # the empty-string shape os.environ.get('GITHUB_TOKEN', '') must
    # take the same branch — not fire requests with 'Bearer '
    rows = post_issues(spark, issues, post, token="").collect()
    assert [(r["ok"], r["message"]) for r in rows] == [
        (False, "GITHUB_TOKEN is not set.")
    ]
