"""CLIF dimension + fixture data (FIXTURES.md §B).

``SITES`` replicates the reference's ordered 12-site list verbatim
(state.py:10-23) — including the "John Hopkins University" misspelling
— because order IS semantic there: it drives dashboard row order and
mention order. The engine keeps it as a single broadcast dimension with
an explicit sort_key instead of the reference's duplicated hardcoded
lists (state.py:10-23 vs app.py:330-333).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

SITES = [
    "University of Chicago",
    "Emory University",
    "John Hopkins University",
    "Northwestern University",
    "Oregon Health & Science University",
    "Rush University",
    "University of California San Francisco",
    "University of Michigan",
    "University of Minnesota",
    "University of Pennsylvania",
    "University of Toronto",
    "MIMIC-IV",
]

STATUS_DEFAULT = "❓"
STATUSES = ["❓", "✅", "🛠", "❌"]  # state.py:30, app.py:509-523


def sites_df(spark: SparkSession) -> DataFrame:
    """The sites dimension: (site_id, site_name, sort_key). Broadcast-
    sized by construction (12 rows)."""
    rows = [(i, name, i) for i, name in enumerate(SITES)]
    return spark.createDataFrame(rows, "site_id int, site_name string, sort_key int")


def demo_projects(spark: SparkSession) -> DataFrame:
    """Seeded projects fixture incl. >25-char names (truncation golden,
    state.py:155-157) and empty tables_required ('None specified' path,
    app.py:479)."""
    rows = [
        (
            "https://github.com/Common-Longitudinal-ICU-data-Format/sepsis-study",
            "Sepsis Study",
            "Early sepsis detection across sites",
            ["vitals", "labs"],
            "U01AAAAA1",
            "2025-01-01 10:00:00",
        ),
        (
            "https://github.com/Common-Longitudinal-ICU-data-Format/ventilation-outcomes-longitudinal",
            "Ventilation Outcomes Longitudinal Analysis",
            "Ventilator weaning outcomes",
            ["respiratory_support"],
            "U01AAAAA2",
            "2025-01-02 11:00:00",
        ),
        (
            "https://github.com/Common-Longitudinal-ICU-data-Format/mortality",
            "Mortality",
            "",
            [],
            "U01AAAAA3",
            "2025-01-03 12:00:00",
        ),
    ]
    return spark.createDataFrame(
        rows,
        "repo_url string, project_name string, description string, "
        "tables_required array<string>, released_by string, released_at string",
    ).selectExpr(
        "repo_url",
        "project_name",
        "description",
        "tables_required",
        "released_by",
        "CAST(released_at AS TIMESTAMP) AS released_at",
    )


def demo_pocs(spark: SparkSession) -> DataFrame:
    """POC fixture incl. a user reassigned across sites (last-wins path,
    state.py:95) and a 'General' assignment (state.py:100-103)."""
    rows = [
        ("U0000001", "University of Chicago", "General", "2025-01-01 09:00:00"),
        ("U0000002", "Emory University", "Sepsis Study", "2025-01-01 09:30:00"),
        ("U0000003", "University of Chicago", "General", "2025-01-01 10:00:00"),
        # U0000002 reassigned: last-wins should move them to Rush
        ("U0000002", "Rush University", "General", "2025-01-02 09:00:00"),
    ]
    return spark.createDataFrame(
        rows, "user_id string, site_name string, project string, assigned_at string"
    ).selectExpr(
        "user_id",
        "site_name",
        "project",
        "CAST(assigned_at AS TIMESTAMP) AS assigned_at",
    )


def demo_repo_documents(spark: SparkSession) -> DataFrame:
    """Metadata-extraction corpus (FIXTURES.md repo_documents): covers
    yaml-only, json-only, readme-only, and none (404 everywhere)."""
    readme = (
        "# Vent Outcomes\n"
        "\n"
        "Weaning analysis across CLIF sites.\n"
        "Tables required: respiratory_support, vitals; labs\n"
        "More text.\n"
        "tables required - adt\n"
    )
    rows = [
        (
            "https://github.com/org/yaml-repo",
            "project.yaml",
            "project_name: Yaml Project\ndescription: From yaml\n"
            "tables_required:\n  - vitals\n  - labs\n",
        ),
        (
            "https://github.com/org/json-repo",
            "metadata.json",
            '{"name": "Json Project", "description": "From json", '
            '"tables_required": ["adt"]}',
        ),
        ("https://github.com/org/readme-repo", "README.md", readme),
        # bare-repo: no recognized docs at all -> project_name ''
        # (URL fallback applies only when a README row exists)
    ]
    return spark.createDataFrame(rows, "repo_url string, path string, body string")


ALL_REPO_URLS = [
    "https://github.com/org/yaml-repo",
    "https://github.com/org/json-repo",
    "https://github.com/org/readme-repo",
    "https://github.com/org/bare-repo",
]


def demo_mcide_rows(spark: SparkSession) -> DataFrame:
    """Flattened mCIDE catalog fixture incl. a 00_-prefixed dir (the
    exclusion filter, mcide.py:18)."""
    rows = [
        ("vitals", "vital_category", "heart_rate", 1),
        ("vitals", "vital_category", "sbp", 2),
        ("vitals", "vital_category", "spo2", 3),
        ("labs", "lab_category", "sodium", 1),
        ("labs", "lab_category", "potassium", 2),
        ("00_template", "template_var", "placeholder", 1),
    ]
    return spark.createDataFrame(
        rows, "table_name string, variable string, value string, line_no int"
    )
