"""Status store (reference state.py:26-143) as pure DataFrame
transforms over three tables:

    projects(repo_url, project_name, description, tables_required,
             released_by, released_at)
    site_status(repo_url, site_name, status, updated_at)
    pocs(user_id, site_name, project, assigned_at)

The reference mutates nested dicts in place and rewrites one JSON file
per mutation (state.py:70-90) — a lost-update race under Bolt's thread
pool (SURVEY.md §3.1). Here every mutation is an APPEND; reads resolve
last-wins deterministically by (updated_at/assigned_at, tiebreak).
At scale the append target is a Delta/Iceberg table and the last-wins
window becomes MERGE INTO; the read-side semantics are identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sparkclif.clif.fixtures import STATUS_DEFAULT


def init_site_status(new_projects: DataFrame, sites: DataFrame) -> DataFrame:
    """R13/R20 (state.py:29-31,137-139): dense matrix init — every new
    project x every site with the '❓' default. crossJoin against the
    broadcast sites dim."""
    return new_projects.select("repo_url", "released_at").crossJoin(
        F.broadcast(sites.select("site_name"))
    ).select(
        "repo_url",
        "site_name",
        F.lit(STATUS_DEFAULT).alias("status"),
        F.col("released_at").alias("updated_at"),
    )


def current_site_status(site_status: DataFrame) -> DataFrame:
    """Last-wins view of the append-only status log (R21 upsert read
    side): one row per (repo_url, site_name), newest updated_at wins.
    At equal timestamps the '❓' init row LOSES to any real update —
    otherwise a same-second release+update would be decided by emoji
    codepoint order ('❓' U+2753 sorts above '✅'/'❌', silently hiding
    the write). Remaining ties (two real statuses at the identical
    instant through this row-append API, which carries no sequence)
    fall back to desc(status) — deterministic, causality unknowable
    here; the event-log replay path (clif/commands.py) resolves those
    by event_id instead."""
    w = Window.partitionBy("repo_url", "site_name").orderBy(
        F.desc("updated_at"),
        F.when(F.col("status") == STATUS_DEFAULT, 1).otherwise(0).asc(),
        F.desc("status"),
    )
    return (
        site_status.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def set_site_status(
    site_status: DataFrame, repo_url: str, site_name: str, status: str, updated_at
) -> DataFrame:
    """R21 (state.py:141-143): point update = append one row; the
    last-wins view resolves it."""
    spark = site_status.sparkSession
    new = spark.createDataFrame(
        [(repo_url, site_name, status, updated_at)],
        "repo_url string, site_name string, status string, updated_at timestamp",
    )
    return site_status.unionByName(new)


def current_pocs(pocs: DataFrame) -> DataFrame:
    """One site per user, last-wins (state.py:93-105, R16): newest
    assigned_at (tie: site_name) wins per user_id."""
    w = Window.partitionBy("user_id").orderBy(F.desc("assigned_at"), F.desc("site_name"))
    return (
        pocs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def set_poc(
    pocs: DataFrame, user_id: str, site_name: str, project: str | None, assigned_at
) -> DataFrame:
    """R16 + R34: append with coalesce(project, 'General')
    (state.py:100-103; app.py:567-572 'General'<->NULL)."""
    spark = pocs.sparkSession
    new = spark.createDataFrame(
        [(user_id, site_name, project, assigned_at)],
        "user_id string, site_name string, project string, assigned_at timestamp",
    ).select(
        "user_id",
        "site_name",
        F.coalesce("project", F.lit("General")).alias("project"),
        "assigned_at",
    )
    return pocs.unionByName(new)


def site_for_user(pocs: DataFrame, user_id: str) -> str | None:
    """R17 (state.py:107-108): point lookup against the last-wins view."""
    rows = (
        current_pocs(pocs).filter(F.col("user_id") == user_id).select("site_name").take(1)
    )
    return rows[0].site_name if rows else None


def poc_mentions(pocs: DataFrame, sites: DataFrame) -> str:
    """R19 (state.py:116-134): '<@id>' mentions grouped by site, sites
    in dimension order, users within a site in assigned_at order (the
    survey's deterministic replacement for the reference's dict
    insertion order); empty store -> literal 'Site POCs'."""
    cur = current_pocs(pocs)
    per_site = (
        cur.groupBy("site_name")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("assigned_at", "user_id"))
                ),
                lambda s: F.format_string("<@%s>", s["user_id"]),
            ).alias("mentions")
        )
        .join(F.broadcast(sites), "site_name")
    )
    # collect_list order is not guaranteed across partitions — sort the
    # collected (sort_key, mentions) structs instead of relying on a
    # pre-agg orderBy
    row = per_site.agg(
        F.array_join(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sort_key", "mentions"))),
                    lambda s: s["mentions"],
                )
            ),
            " ",
        ).alias("s")
    ).collect()[0]
    return row.s if row.s else "Site POCs"
