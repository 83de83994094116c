"""GitHub-issue REST sink (reference R35, app.py:222-258
``handle_issue_submission``) — the last reference surface, closed with
the same injected-transport pattern as ``clif.ingest`` (SURVEY.md §3.3
keeps transport out of engine scope; auth tokens live at the
orchestration layer).

The reference posts ONE issue per Slack modal submission and routes
the outcome back to the submitting user as a chat message. The engine
reinterprets that as a SINK over an issues relation: every input row
is attempted in event order and yields exactly one outcome row on the
user's "channel" — the same status-code branching, byte-for-byte
messages:

- no token        -> "GITHUB_TOKEN is not set."      (app.py:236-238)
- HTTP 201        -> "Issue created: {html_url}"     (app.py:249-251)
- other status    -> "Failed to create issue: {text}" (app.py:252-256)
- transport error -> "Error creating issue: {e}"     (app.py:257-258)

Scale note: issues are human-authored — O(interactions), never
data-scaled — so this is a driver-side presentation sink like
``clif.dashboard``, not a relational operator. A pipeline that did
need bulk REST fan-out would move the same ``post`` callable into
``foreachPartition`` with per-partition sessions; the branching logic
below would be unchanged.
"""

from __future__ import annotations

import json
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

# the reference's fixed endpoint (app.py:240-242); the repo path is a
# public constant of the reference project, injected here so tests and
# forks can point elsewhere
ISSUES_URL = (
    "https://api.github.com/repos/Common-Longitudinal-ICU-data-Format/CLIF/issues"
)

OUTCOME_SCHEMA = "event_id long, user_id string, ok boolean, message string"

# post(url, headers, payload_json_dict) -> (status_code, response_text)
# — the shape of requests.post(url, headers=headers, json=payload)
Transport = Callable[[str, dict, dict], "tuple[int, str]"]


def post_issues(
    spark: SparkSession,
    issues: DataFrame,
    post: Transport,
    token: str | None = None,
    url: str = ISSUES_URL,
) -> DataFrame:
    """Post every row of ``issues(event_id, user_id, title,
    description)`` as a GitHub issue via the injected ``post`` and
    return outcome rows ``(event_id, user_id, ok, message)``.

    Mirrors app.py:222-258 exactly: the Authorization/Accept headers,
    the ``{"title", "body"}`` payload (missing description posts as
    ""), the 201 -> html_url success branch, the non-201
    response-text branch, and the exception branch; with no ``token``
    nothing is posted and every row reports the reference's
    "GITHUB_TOKEN is not set." message. Rows are attempted in
    ``event_id`` order (the reference processes submissions in arrival
    order); one attempt per row, no retry — retry policy belongs to
    the transport, as in ``ingest.fetch_catalog_payloads``."""
    rows = issues.select("event_id", "user_id", "title", "description").collect()
    # None-safe key: a NULL event_id must sort (first) instead of
    # raising TypeError on None < int
    rows.sort(key=lambda r: (r["event_id"] is not None, r["event_id"]))
    out = []
    headers = {
        "Authorization": f"Bearer {token}",
        "Accept": "application/vnd.github+json",
    }
    for r in rows:
        # falsy check, not an is-None check: the reference branches on
        # `if not token:` (app.py:234), so an empty-string token (the
        # os.environ.get('GITHUB_TOKEN', '') shape) must also post
        # nothing and report the not-set message
        if not token:
            out.append((r["event_id"], r["user_id"], False, "GITHUB_TOKEN is not set."))
            continue
        payload = {"title": r["title"], "body": r["description"] or ""}
        try:
            status, text = post(url, headers, payload)
            if status == 201:
                issue_url = json.loads(text).get("html_url")
                out.append(
                    (r["event_id"], r["user_id"], True, f"Issue created: {issue_url}")
                )
            else:
                out.append(
                    (
                        r["event_id"],
                        r["user_id"],
                        False,
                        f"Failed to create issue: {text}",
                    )
                )
        except Exception as e:  # the reference's blanket except (app.py:257)
            out.append(
                (r["event_id"], r["user_id"], False, f"Error creating issue: {e}")
            )
    return spark.createDataFrame(out, OUTCOME_SCHEMA)
