"""Project-metadata extraction (reference metadata.py:19-69, R1-R11)
as a distributed DataFrame pipeline.

The reference fetches per-repo over HTTPS and parses eagerly; the
engine separates FETCH (an ingestion adapter filling a repo_documents
table: repo_url, path, body) from PARSE (this module — distributed,
Catalyst-optimized). Semantics reproduced exactly:

- fallback ladder project.yaml -> metadata.json -> README.md, first
  present source wins (metadata.py:33-48)
- key coalesce: project_name | name | ''; description ''; tables []
- README: 1st non-blank line = title (heading strip), 2nd = description,
  LAST case-insensitive 'tables? required[:-]? ...' match wins, split
  on [,;], trimmed, blanks dropped (metadata.py:54-66)
- no sources at all -> title from the URL's last path segment
  (metadata.py:67-68)

Scale: per-row expressions + one groupBy(repo_url); YAML is the only
Python step (scalar UDF like the reference's yaml.safe_load, applied
ONLY to yaml rows — never the hot path).
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as STypes

META_SCHEMA = STypes.StructType(
    [
        STypes.StructField("project_name", STypes.StringType()),
        STypes.StructField("name", STypes.StringType()),
        STypes.StructField("description", STypes.StringType()),
        STypes.StructField("tables_required", STypes.ArrayType(STypes.StringType())),
    ]
)


def github_raw_url(repo_url: Column, path: Column | str) -> Column:
    """R1 (metadata.py:19-21): repo URL -> raw-content URL."""
    owner_repo = F.regexp_extract(F.rtrim(repo_url), r"github\.com/(.*?)/*$", 1)
    path_col = F.lit(path) if isinstance(path, str) else path
    return F.concat(
        F.lit("https://raw.githubusercontent.com/"),
        owner_repo,
        F.lit("/main/"),
        path_col,
    )


def _parse_yaml_one(body):
    """YAML parse of ONE document (reference's yaml.safe_load,
    metadata.py:38). PyYAML if present; else a minimal key/value+list
    subset parser sufficient for project.yaml shapes."""
    try:
        try:
            import yaml  # type: ignore

            data = yaml.safe_load(body) or {}
        except ImportError:
            data = _mini_yaml(body)
        if not isinstance(data, dict):
            return (None, None, None, None)
        tables = data.get("tables_required")
        if tables is not None and not isinstance(tables, list):
            tables = [str(tables)]
        return (
            data.get("project_name"),
            data.get("name"),
            data.get("description"),
            [str(t) for t in tables] if tables is not None else None,
        )
    except Exception:
        return (None, None, None, None)


@F.pandas_udf(META_SCHEMA)
def _parse_yaml_udf(bodies):
    """Arrow-batched YAML parse: one Python call per batch instead of
    per row (the parse itself is per-document either way — the batch
    form removes only the per-row invocation overhead, which is the
    whole cost at metadata-file sizes)."""
    import pandas as pd

    rows = [_parse_yaml_one(b) for b in bodies]
    return pd.DataFrame(
        rows,
        columns=["project_name", "name", "description", "tables_required"],
    )


def _mini_yaml(body: str) -> dict:
    out: dict = {}
    current_list_key = None
    for raw in body.splitlines():
        if not raw.strip() or raw.strip().startswith("#"):
            continue
        if raw.lstrip().startswith("- ") and current_list_key:
            out.setdefault(current_list_key, []).append(raw.lstrip()[2:].strip())
            continue
        if ":" in raw:
            key, _, val = raw.partition(":")
            key, val = key.strip(), val.strip()
            if val == "":
                current_list_key = key
                out[key] = []
            else:
                current_list_key = None
                out[key] = val
    return out


def _parse_structured(docs: DataFrame) -> DataFrame:
    """YAML + JSON rows -> (repo_url, src_rank, parsed struct)."""
    yaml_rows = docs.filter(F.col("path") == "project.yaml").select(
        "repo_url", F.lit(0).alias("src_rank"), _parse_yaml_udf("body").alias("m")
    )
    json_rows = docs.filter(F.col("path") == "metadata.json").select(
        "repo_url",
        F.lit(1).alias("src_rank"),
        F.from_json("body", META_SCHEMA).alias("m"),
    )
    return yaml_rows.unionByName(json_rows)


def _parse_readme(docs: DataFrame) -> DataFrame:
    """README rows -> (repo_url, src_rank=2, parsed struct), the
    R5-R10 line pipeline."""
    lines = (
        docs.filter(F.col("path") == "README.md")
        .select("repo_url", F.posexplode(F.split("body", "\n")).alias("pos", "line"))
        .withColumn("stripped", F.trim("line"))
        .filter(F.col("stripped") != "")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("repo_url").orderBy("pos")),
        )
    )
    title = F.max(
        F.when(F.col("rn") == 1, F.regexp_replace("stripped", r"^#*\s*", ""))
    ).alias("title")
    description = F.max(F.when(F.col("rn") == 2, F.col("stripped"))).alias("description")
    # LAST match wins (the reference loop keeps overwriting, R9):
    # NOTE the reference `continue`s on the title line, so line rn=1 is
    # never scanned for the tables-required pattern.
    tbl_capture = F.when(
        F.col("rn") > 1,
        F.regexp_extract("stripped", r"(?i)tables? required[:\-]?\s*(.*)", 1),
    )
    tables_raw = F.max_by(
        F.when(tbl_capture != "", tbl_capture), F.when(tbl_capture != "", F.col("pos"))
    ).alias("tables_raw")
    agg = lines.groupBy("repo_url").agg(title, description, tables_raw)
    tables = F.filter(
        F.transform(F.split("tables_raw", "[,;]"), lambda t: F.trim(t)),
        lambda t: t != "",
    )
    return agg.select(
        "repo_url",
        F.lit(2).alias("src_rank"),
        F.struct(
            F.col("title").alias("project_name"),
            F.lit(None).cast("string").alias("name"),
            F.col("description").alias("description"),
            F.when(F.col("tables_raw").isNotNull(), tables).alias("tables_required"),
        ).alias("m"),
    )


def extract_metadata(repos: DataFrame, docs: DataFrame) -> DataFrame:
    """parse_repo (metadata.py:24-69) for every repo at once.

    repos: (repo_url); docs: (repo_url, path, body) — only rows for
    files that exist (the fetch adapter omits 404s).
    Returns (repo_url, project_name, description, tables_required)."""
    parsed = _parse_structured(docs).unionByName(_parse_readme(docs))
    # first present source wins: min src_rank per repo (fallback ladder)
    best = parsed.groupBy("repo_url").agg(
        F.min_by("m", "src_rank").alias("m"), F.min("src_rank").alias("src_rank")
    )
    # an all-blank README yields NO parsed row at all, but the
    # reference's URL fallback runs inside the successful-fetch branch
    # — track README existence separately from parse success
    has_readme = (
        docs.filter(F.col("path") == "README.md")
        .select("repo_url")
        .distinct()
        .withColumn("__has_readme", F.lit(True))
    )
    out = repos.join(best, "repo_url", "left").join(has_readme, "repo_url", "left")
    url_fallback = F.element_at(F.split(F.rtrim(F.col("repo_url")), "/"), -1)
    # structured sources: name coalesce ladder + '' defaults
    # (metadata.py:42-45); README: empty title falls back to URL
    # (metadata.py:67-68) — applies when a README row EXISTS, even one
    # whose lines are all blank (no parsed row, src_rank NULL); a repo
    # with no sources at all yields project_name=''.
    project_name = F.coalesce(
        F.nullif(F.col("m.project_name"), F.lit("")),
        F.nullif(F.col("m.name"), F.lit("")),
        F.when(
            (F.col("src_rank") == 2)
            | (F.col("src_rank").isNull() & F.col("__has_readme")),
            url_fallback,
        ),
        F.lit(""),
    )
    return out.select(
        "repo_url",
        project_name.alias("project_name"),
        F.coalesce(F.col("m.description"), F.lit("")).alias("description"),
        F.coalesce(F.col("m.tables_required"), F.array().cast("array<string>")).alias(
            "tables_required"
        ),
    )
