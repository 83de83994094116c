"""Ingestion adapters — the thin driver-side fetch half that turns the
reference's live REST surfaces into the engine's ingested tables
(VERDICT r3 "missing" item 1; SURVEY.md §3.3 keeps transport out of
engine scope, so transport here is an INJECTED callable and the
engine-side normalization is distributed Spark).

Two surfaces, mirroring the reference:

- GitHub contents API (reference clif_bot/mcide.py:9-39): the mCIDE
  catalog tree. ``fetch_catalog_payloads`` walks the directory
  listings driver-side (a handful of listing-sized responses — the
  reference does the same five sequential round-trips);
  ``github_contents_to_catalog`` then normalizes the per-file
  contents-API JSON (base64 bodies) into the SAME
  mcide_categories(table_name, variable, value, line_no) relation
  ``clif.mcide.read_catalog`` produces from a file tree — decoding,
  line-splitting and name-parsing all run as Spark expressions.

- Slack interactivity payloads (reference app.py:452-634): modal
  ``view_submission`` and ``block_actions`` bodies become
  command_log(event_id, ts, kind, user_id, payload) rows — the
  ingested form ``clif.commands.apply_command_log`` consumes. The
  callback_id -> kind mapping and the per-modal state paths mirror
  app.py's handlers (clif_project_modal -> release,
  clif_site_poc_modal -> set_poc, status_update action ->
  status_update).

No network module is imported here: callers inject ``fetch`` (tests
use a fake; production wires urllib/requests at the orchestration
layer, where auth tokens also live — reference mcide.py:48-50).
"""

from __future__ import annotations

import json
from typing import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CONTENTS_SCHEMA = (
    "name string, path string, type string, content string, encoding string"
)


def fetch_catalog_payloads(
    fetch: Callable[[str], str], base: str = "mCIDE"
) -> list[str]:
    """Walk the contents API tree: list ``base`` (dirs = tables,
    00_-prefixed excluded, reference mcide.py:18), list each table dir,
    fetch every ``*_categories.csv`` file's contents JSON. Returns the
    raw per-file JSON strings for ``github_contents_to_catalog``.

    ``fetch(path)`` takes a repo-relative path ("mCIDE",
    "mCIDE/<table>", "mCIDE/<table>/<file>") and returns the contents
    API response body as text. Listing calls are O(tables) and
    listing-sized — driver-side by design; the file BODIES are what
    scale, and those are parsed distributed."""
    payloads: list[str] = []
    for entry in json.loads(fetch(base)):
        if entry.get("type") != "dir" or entry["name"].startswith("00_"):
            continue
        table = entry["name"]
        for item in json.loads(fetch(f"{base}/{table}")):
            if item.get("name", "").endswith("_categories.csv"):
                payloads.append(fetch(f"{base}/{table}/{item['name']}"))
    return payloads


def github_contents_to_catalog(
    spark: SparkSession, payloads: Iterable[str]
) -> DataFrame:
    """Normalize contents-API file JSON into
    mcide_categories(table_name, variable, value, line_no) — schema-
    identical to ``clif.mcide.read_catalog``, so every downstream
    query (list_tables/list_variables/list_values/append_value) runs
    unchanged on ingested data.

    All decoding is Spark-side: from_json -> unbase64 (the API wraps
    base64 at 60 chars; the newlines are stripped first) -> line
    split -> posexplode preserving file order -> the same
    table-aware variable regex read_catalog uses (tables with
    underscores parse correctly)."""
    raw = spark.createDataFrame(
        [(p,) for p in payloads], "raw string"
    ).select(F.from_json("raw", CONTENTS_SCHEMA).alias("j"))
    decoded = raw.select(
        F.element_at(F.split("j.path", "/"), -2).alias("table_name"),
        F.element_at(F.split("j.path", "/"), -1).alias("fname"),
        F.when(
            F.col("j.encoding") == "base64",
            F.unbase64(F.regexp_replace("j.content", "\\s", "")).cast("string"),
        )
        .otherwise(F.col("j.content"))
        .alias("body"),
    )
    from sparkclif.clif.mcide import variable_from_fname

    lines = decoded.select(
        "table_name",
        variable_from_fname("fname", "table_name").alias("variable"),
        F.posexplode(F.split("body", "\n")).alias("idx", "value"),
    )
    return (
        lines.select(
            "table_name",
            "variable",
            F.trim("value").alias("value"),
            (F.col("idx") + 1).cast("int").alias("line_no"),
        )
        .filter(F.col("value") != "")
    )


# callback_id -> (kind, [(payload_key, state JSON path)]) — the modal
# state paths exactly as app.py reads them (lines 452-474, 557-575)
_VIEW_KINDS = {
    "clif_project_modal": (
        "release",
        [
            ("repo_url", "github_url_block.github_url.value"),
            ("project_name", "project_name_block.project_name.value"),
            ("result_box_link", "result_box_block.result_box_link.value"),
            (
                "special_instructions",
                "special_instructions_block.special_instructions.value",
            ),
        ],
    ),
    "clif_site_poc_modal": (
        "set_poc",
        [
            ("site", "site_block.site_select.selected_option.value"),
            ("poc_user", "user_block.user_select.selected_user"),
            ("project", "project_block.project_select.selected_option.value"),
        ],
    ),
    "mcide_modal": (
        "mcide_add",
        [
            ("table", "table_block.mcide_table_select.selected_option.value"),
            ("variable", "variable_block.mcide_variable_select.selected_option.value"),
            ("new_value", "new_value_block.new_value.value"),
        ],
    ),
}


def slack_payloads_to_command_log(
    spark: SparkSession, payloads: Iterable["str | tuple[float, str]"]
) -> DataFrame:
    """Slack interactivity bodies -> command_log(event_id, ts, kind,
    user_id, payload). Supports the three mutating surfaces of the
    reference bot: project release and site-POC modals
    (``view_submission``) and the dashboard's status button
    (``block_actions`` with action_id ``status_update`` whose value is
    the reference's "repo|status" packing, app.py:623-634 — kept
    packed here; ``commands.status_events`` splits it).

    Timestamps: ``view_submission`` bodies carry NO event timestamp
    (only block_actions embeds action_ts), so each payload item may be
    a ``(arrival_epoch_seconds, body_json)`` pair — the orchestration
    layer reads arrival time from the X-Slack-Request-Timestamp header
    it already validates for request signing. A bare string is
    accepted for block_actions (action_ts is inside the body); a bare
    view_submission without an arrival time is rejected rather than
    silently stamped with the 1970 epoch (which would corrupt every
    ts-ordered last-wins/as-of computation downstream).

    event_id = arrival order (Slack guarantees per-payload uniqueness
    via trigger ids; the engine needs a total order for last-wins
    ties, and arrival order is the reference's processing order).
    Non-mutating payloads (help/issue modals, option selects) are
    filtered out exactly as app.py routes them to side channels."""
    rows = []
    for i, item in enumerate(payloads):
        arrival: float | None = None
        if isinstance(item, tuple):
            arrival, p = float(item[0]), item[1]
        else:
            p = item
        body = json.loads(p)
        user_id = (body.get("user") or {}).get("id")
        embedded = (
            body.get("action_ts")
            or (body.get("actions") or [{}])[0].get("action_ts")
        )
        if embedded is not None:
            ts = float(embedded)
        elif arrival is not None:
            ts = arrival
        elif body.get("type") == "view_submission":
            cb = (body.get("view") or {}).get("callback_id")
            if cb in _VIEW_KINDS:
                raise ValueError(
                    f"view_submission payload {i} ({cb}) carries no "
                    "timestamp: pass (arrival_ts, body) pairs — Slack "
                    "view submissions have no embedded event time"
                )
            ts = 0.0  # non-mutating: filtered below anyway
        else:
            ts = 0.0
        if body.get("type") == "view_submission":
            cb = (body.get("view") or {}).get("callback_id")
            if cb not in _VIEW_KINDS:
                continue
            kind, fields = _VIEW_KINDS[cb]
            state = (body.get("view") or {}).get("state", {}).get("values", {})
            payload: dict = {}
            for key, path in fields:
                cur = state
                for part in path.split("."):
                    if not isinstance(cur, dict) or cur is None:
                        cur = None
                        break
                    cur = cur.get(part)
                if cur is not None:
                    payload[key] = cur
            if kind == "set_poc":
                # the command_log's user_id is the ASSIGNED poc (the
                # modal's selected user — commands.poc_events reads it
                # from the row, mirroring app.py:565); the submitter
                # moves into the payload for audit
                payload["submitted_by"] = user_id
                user_id = payload.pop("poc_user", user_id)
            rows.append((i, ts, kind, user_id, json.dumps(payload, sort_keys=True)))
        elif body.get("type") == "block_actions":
            for act in body.get("actions") or []:
                if act.get("action_id") == "status_update":
                    act_ts = act.get("action_ts")
                    if act_ts is None and arrival is None:
                        # same epoch-corruption guard as the mutating
                        # view_submission branch: a status row stamped
                        # 1970 always loses last-wins ties silently
                        raise ValueError(
                            f"block_actions payload {i} (status_update) "
                            "carries no action_ts and no arrival time "
                            "was provided: pass (arrival_ts, body) pairs"
                        )
                    rows.append(
                        (
                            i,
                            float(act_ts) if act_ts is not None else arrival,
                            "status_update",
                            user_id,
                            json.dumps({"value": act.get("value")}, sort_keys=True),
                        )
                    )
    df = spark.createDataFrame(
        rows, "event_id long, ts_s double, kind string, user_id string, payload string"
    )
    return df.select(
        "event_id",
        F.timestamp_micros((F.col("ts_s") * 1_000_000).cast("long")).alias("ts"),
        "kind",
        "user_id",
        "payload",
    )
