"""Command-log application (reference app.py:452-634, R28-R31) — the
event-driven mutation flow as ONE relational computation over a
command_log table (FIXTURES.md):

    command_log(event_id, ts, kind, user_id, payload)
    kind in ('release', 'set_poc', 'status_update'); payload is JSON.

The reference processes commands one-at-a-time against mutable dicts.
Sequential-state semantics map to relational ones exactly:
- 'which site does this user belong to when they click' (app.py:631,
  R17/R31) = an AS-OF join of status_update events against set_poc
  events (latest prior assignment wins) — sparkclif.operators.asof.
- unregistered-user guard (app.py:627-630) = the as-of miss branch,
  routed to an error channel instead of the reference's silent
  ephemeral message.
- last-wins cell updates (R21) = keep-newest window by (ts, event_id).

Batch (this module) and streaming (sparkclif.streaming.upsert) share
these semantics; property tests replay random logs against a python
model of the reference's dicts (SURVEY.md §5.2 layer 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkclif.clif.fixtures import STATUS_DEFAULT
from sparkclif.operators.asof import asof_join


def releases(log: DataFrame) -> DataFrame:
    """'release' events -> projects table (last release of a repo_url
    wins, mirroring the reference's dict overwrite in new_project)."""
    rel = log.filter(F.col("kind") == "release").select(
        "event_id",
        "ts",
        F.get_json_object("payload", "$.repo_url").alias("repo_url"),
        F.get_json_object("payload", "$.project_name").alias("project_name"),
        F.coalesce(F.get_json_object("payload", "$.description"), F.lit("")).alias(
            "description"
        ),
        F.from_json(
            F.coalesce(F.get_json_object("payload", "$.tables_required"), F.lit("[]")),
            "array<string>",
        ).alias("tables_required"),
        F.col("user_id").alias("released_by"),
    )
    w = Window.partitionBy("repo_url").orderBy(F.desc("ts"), F.desc("event_id"))
    # first_released_at: the reference dict keeps a re-released project
    # at its ORIGINAL insertion position, so dashboard column order
    # follows the FIRST release even though metadata follows the last
    return (
        rel.withColumn(
            "first_released_at", F.min("ts").over(Window.partitionBy("repo_url"))
        )
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumnRenamed("ts", "released_at")
    )


def poc_events(log: DataFrame) -> DataFrame:
    """'set_poc' events -> pocs append log (R16/R34)."""
    return log.filter(F.col("kind") == "set_poc").select(
        "event_id",
        F.col("user_id"),
        F.get_json_object("payload", "$.site").alias("site_name"),
        F.coalesce(F.get_json_object("payload", "$.project"), F.lit("General")).alias(
            "project"
        ),
        F.col("ts").alias("assigned_at"),
    )


def apply_command_log(
    log: DataFrame, sites: DataFrame
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Apply a full command log; returns (projects, site_status_current,
    pocs_current, errors).

    site_status_current resolves: dense '❓' init per release (R13),
    then status_update cells last-wins (R21), exactly the state the
    reference's dicts would hold after sequential processing."""
    projects = releases(log)
    pocs = poc_events(log)

    updates = log.filter(F.col("kind") == "status_update").select(
        "event_id",
        "ts",
        "user_id",
        F.split_part(F.get_json_object("payload", "$.value"), F.lit("|"), F.lit(1)).alias(
            "repo_url"
        ),
        F.split_part(F.get_json_object("payload", "$.value"), F.lit("|"), F.lit(2)).alias(
            "status"
        ),
    )
    # R17/R31 as the as-of join: the user's site at click time
    with_site = asof_join(
        updates,
        pocs.select("user_id", "site_name", "assigned_at", "event_id"),
        left_key="user_id",
        right_key="user_id",
        left_time="ts",
        right_time="assigned_at",
        payload=["site_name"],
        tiebreak="event_id",
        # log-order refinement: a set_poc sharing the update's ts but
        # LATER in the log must not influence it (sequential replay)
        left_seq="event_id",
        right_seq="event_id",
    )
    # guards: unregistered user (app.py:627-630) or unknown repo
    # (the reference would KeyError, app.py:632 -> crash; we route to
    # an error channel — the one deliberate divergence, SURVEY.md §0.1)
    known = with_site.join(
        projects.select("repo_url", "released_at", "first_released_at"),
        "repo_url",
        "left",
    )
    # error rows: unregistered user, never-released repo, or an update
    # BEFORE the repo first existed (the reference would KeyError).
    # Updates between the first release and a later re-release are NOT
    # errors — the reference accepted them and the re-init wiped them —
    # so they are dropped from the final matrix silently.
    errors = known.filter(
        F.col("asof_site_name").isNull()
        | F.col("released_at").isNull()
        | (F.col("ts") < F.col("first_released_at"))
    ).select(
        "event_id",
        "ts",
        "user_id",
        "repo_url",
        F.when(F.col("asof_site_name").isNull(), "unregistered_user")
        .otherwise("unknown_project")
        .alias("error"),
    )
    valid = known.filter(
        F.col("asof_site_name").isNotNull()
        & F.col("released_at").isNotNull()
        & (F.col("ts") >= F.col("released_at"))
    ).select(
        "repo_url",
        F.col("asof_site_name").alias("site_name"),
        "status",
        F.col("ts").alias("updated_at"),
        "event_id",
    )

    init = (
        projects.select("repo_url", "released_at")
        .crossJoin(F.broadcast(sites.select("site_name")))
        .select(
            "repo_url",
            "site_name",
            F.lit(STATUS_DEFAULT).alias("status"),
            F.col("released_at").alias("updated_at"),
            F.lit(-1).cast("long").alias("event_id"),
        )
    )
    status_log = init.unionByName(valid)
    w = Window.partitionBy("repo_url", "site_name").orderBy(
        F.desc("updated_at"), F.desc("event_id")
    )
    site_status_current = (
        status_log.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    wp = Window.partitionBy("user_id").orderBy(F.desc("assigned_at"), F.desc("event_id"))
    pocs_current = (
        pocs.withColumn("__rn", F.row_number().over(wp))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return projects, site_status_current, pocs_current, errors
