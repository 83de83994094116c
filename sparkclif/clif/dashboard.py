"""The status dashboard (reference state.py:145-179, R22 — the
flagship query): pivot site_status into a sites x projects cross-tab,
then render the reference's exact text layout.

Split per SURVEY.md §3.2: the PIVOT is engine work (groupBy().pivot()
with an explicit, bounded column list — Spark would otherwise run a
distinct-collection job, and unbounded project columns are the
reference's own formatting hazard); the text renderer is a
presentation-layer pure function over the collected rows, golden-tested
byte-for-byte against the reference's format (truncation 25->22+'...',
' | ' separators, dash rule, ljust/center padding).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from sparkclif.clif.fixtures import STATUS_DEFAULT
from sparkclif.clif.status_store import current_site_status

MAX_NAME = 25
TRUNC_AT = 22
MIN_COL = 8


def truncate_name(name: str) -> str:
    """state.py:155-157."""
    return name[:TRUNC_AT] + "..." if len(name) > MAX_NAME else name


def status_pivot(
    site_status: DataFrame, projects: DataFrame, sites: DataFrame
) -> tuple[DataFrame, list[str]]:
    """Pivot to one row per site (dimension order), one column per
    project (release order — the reference's dict-insertion order made
    explicit). Returns (pivoted_df, ordered project repo_urls).

    Missing cells default to '❓' (state.py:175). Pivot values are the
    explicit project list -> no distinct-scan job, bounded columns."""
    # column order follows the FIRST release when the projects table
    # tracks it (commands.releases does): the reference dict keeps a
    # re-released project at its original insertion position
    order_col = (
        "first_released_at"
        if "first_released_at" in projects.columns
        else "released_at"
    )
    ordered = [
        r.repo_url
        for r in projects.select("repo_url", F.col(order_col).alias("__o"))
        .orderBy("__o", "repo_url")
        .collect()
    ]
    # pivot on sanitized keys (p0, p1, ...) — raw repo URLs contain
    # dots/slashes that break column resolution in fillna/select
    pkeys = [f"p{i}" for i in range(len(ordered))]
    spark = site_status.sparkSession
    key_map = F.broadcast(
        spark.createDataFrame(
            list(zip(ordered, pkeys)), "repo_url string, pkey string"
        )
    )
    cur = current_site_status(site_status).join(key_map, "repo_url")
    pivoted = (
        sites.select("site_name", "sort_key")
        .join(
            cur.groupBy("site_name").pivot("pkey", pkeys).agg(F.first("status")),
            "site_name",
            "left",
        )
        .orderBy("sort_key")
    )
    if pkeys:
        pivoted = pivoted.fillna(STATUS_DEFAULT, subset=pkeys)
    return pivoted, ordered


def render_status_table(
    site_status: DataFrame, projects: DataFrame, sites: DataFrame
) -> str:
    """Byte-for-byte reproduction of the reference layout
    (state.py:145-179). Empty store -> 'No active projects.'"""
    name_by_repo = {
        r.repo_url: r.project_name
        for r in projects.select("repo_url", "project_name").collect()
    }
    if not name_by_repo:
        return "No active projects."
    pivoted, ordered = status_pivot(site_status, projects, sites)
    rows = pivoted.collect()

    display_names = [truncate_name(name_by_repo[u]) for u in ordered]
    # size and iterate from the PIVOTED rows (already in sort_key
    # order), not the module SITES constant — a caller-supplied sites
    # dimension that diverges from the hardcoded list must render its
    # own rows, not KeyError / silently drop
    site_names = [r.site_name for r in rows]
    site_width = max(len("Site"), max(len(s) for s in site_names))
    col_widths = [site_width] + [max(MIN_COL, len(n)) for n in display_names]

    header_parts = ["Site".ljust(site_width)] + [
        n.ljust(col_widths[i + 1]) for i, n in enumerate(display_names)
    ]
    lines = [" | ".join(header_parts)]
    lines.append("-" * (sum(col_widths) + 3 * (len(col_widths) - 1)))
    for r in rows:
        site = r.site_name
        row_parts = [site.ljust(site_width)] + [
            (r[f"p{i}"] if r[f"p{i}"] is not None else STATUS_DEFAULT).center(
                col_widths[i + 1]
            )
            for i in range(len(ordered))
        ]
        lines.append(" | ".join(row_parts))
    return "\n".join(lines)
