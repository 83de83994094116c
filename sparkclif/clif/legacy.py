"""Lossless legacy-document compatibility layer (reference
state.py:44-90, R14/R15; document schema workflow.md:145-160).

The reference persists its whole state as ONE nested JSON document:

    {"projects":  {repo_url: {"metadata": {...}, "site_status": {site: status}}},
     "pocs":      {user_id: site},
     "poc_assignments": {site: {user_id: project}}}

Import = permissive parse (missing keys -> ''/[]/{}; the reference's
.get-defaulting, metadata.py:39-45) into the engine's normalized
tables. Export = the exact reverse (map_from_entries over grouped
rows -> to_json), so a reference deployment can round-trip its
clif_bot_data.json through the engine without loss.

The canonical store remains Parquet tables; this is a boundary
adapter, not the storage engine.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

METADATA_SCHEMA = T.StructType(
    [
        T.StructField("project_name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("tables_required", T.ArrayType(T.StringType())),
    ]
)
PROJECT_SCHEMA = T.StructType(
    [
        T.StructField("metadata", METADATA_SCHEMA),
        T.StructField("site_status", T.MapType(T.StringType(), T.StringType())),
    ]
)
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("projects", T.MapType(T.StringType(), PROJECT_SCHEMA)),
        T.StructField("pocs", T.MapType(T.StringType(), T.StringType())),
        T.StructField(
            "poc_assignments",
            T.MapType(T.StringType(), T.MapType(T.StringType(), T.StringType())),
        ),
    ]
)


def import_document(spark: SparkSession, doc_json: str):
    """Parse one legacy JSON document into (projects, site_status,
    pocs, poc_assignments) DataFrames with the reference's tolerance:
    absent top-level keys become empty relations, absent metadata
    fields become ''/[] (state.py:47-68, metadata.py:42-45)."""
    doc = spark.createDataFrame([(doc_json,)], "raw string").select(
        F.from_json("raw", DOCUMENT_SCHEMA).alias("d")
    )
    projects_map = doc.select(
        F.explode_outer(F.coalesce("d.projects", F.create_map())).alias(
            "repo_url", "p"
        )
    ).filter(F.col("repo_url").isNotNull())
    projects = projects_map.select(
        "repo_url",
        F.coalesce(F.col("p.metadata.project_name"), F.lit("")).alias("project_name"),
        F.coalesce(F.col("p.metadata.description"), F.lit("")).alias("description"),
        F.coalesce(F.col("p.metadata.tables_required"), F.array().cast("array<string>")).alias(
            "tables_required"
        ),
    )
    site_status = projects_map.select(
        "repo_url",
        F.explode_outer(F.coalesce("p.site_status", F.create_map())).alias(
            "site_name", "status"
        ),
    ).filter(F.col("site_name").isNotNull())
    pocs = (
        doc.select(
            F.explode_outer(F.coalesce("d.pocs", F.create_map())).alias(
                "user_id", "site_name"
            )
        )
        .filter(F.col("user_id").isNotNull())
    )
    poc_assignments = (
        doc.select(
            F.explode_outer(F.coalesce("d.poc_assignments", F.create_map())).alias(
                "site_name", "users"
            )
        )
        .filter(F.col("site_name").isNotNull())
        .select(
            "site_name", F.explode_outer("users").alias("user_id", "project")
        )
        .filter(F.col("user_id").isNotNull())
    )
    return projects, site_status, pocs, poc_assignments


def export_document(
    projects: DataFrame,
    site_status: DataFrame,
    pocs: DataFrame,
    poc_assignments: DataFrame,
) -> str:
    """Rebuild the legacy nested document from the normalized tables
    (reverse of import; reference save_data state.py:70-90). Maps are
    built with map_from_entries over sorted collect_lists so the
    output is deterministic; key order is not semantic in JSON."""
    from sparkclif.clif.status_store import current_pocs, current_site_status

    # resolve last-wins views FIRST: the store's tables are append-only
    # (a re-set cell or reassigned user has multiple rows), and
    # map_from_entries raises DUPLICATE_MAP_KEY on the duplicates.
    # Legacy-imported tables carry no timestamps (the reference's JSON
    # document has none) and are already one-row-per-key — dedup by
    # key there instead of the timestamped last-wins view.
    if "updated_at" in site_status.columns:
        site_status = current_site_status(site_status)
    else:
        site_status = site_status.dropDuplicates(["repo_url", "site_name"])
    if "assigned_at" in pocs.columns:
        pocs = current_pocs(pocs)
    else:
        pocs = pocs.dropDuplicates(["user_id"])
    poc_assignments = poc_assignments.dropDuplicates(["site_name", "user_id"])
    per_project = (
        site_status.groupBy("repo_url")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("site_name", "status")))
            ).alias("site_status")
        )
    )
    proj_entries = (
        projects.join(per_project, "repo_url", "left")
        .select(
            F.struct(
                F.col("repo_url").alias("key"),
                F.struct(
                    F.struct(
                        "project_name", "description", "tables_required"
                    ).alias("metadata"),
                    F.coalesce(
                        "site_status", F.create_map().cast("map<string,string>")
                    ).alias("site_status"),
                ).alias("value"),
            ).alias("e")
        )
        # entries hold maps (not orderable by array_sort); final key
        # order is normalized by json.dumps(sort_keys=True) below
        .agg(F.map_from_entries(F.collect_list("e")).alias("projects"))
    )
    poc_entries = pocs.agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("user_id", "site_name")))
        ).alias("pocs")
    )
    assign_entries = (
        poc_assignments.groupBy("site_name")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("user_id", "project")))
            ).alias("users")
        )
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("site_name", "users"))
            ).alias("poc_assignments")
        )
    )
    row = (
        proj_entries.crossJoin(poc_entries)
        .crossJoin(assign_entries)
        .select(
            F.to_json(
                F.struct("projects", "pocs", "poc_assignments")
            ).alias("doc")
        )
        .collect()[0]
    )
    # normalize through python json for stable formatting
    parsed = json.loads(row.doc)
    for key in ("projects", "pocs", "poc_assignments"):
        parsed.setdefault(key, {})
    return json.dumps(parsed, ensure_ascii=False, sort_keys=True)
