"""mCIDE controlled-vocabulary catalog (reference mcide.py:13-98,
R23-R27) over a local file tree or a flattened catalog table.

Layout mirrored from the reference's GitHub tree:
    {base}/{table}/clif_{table}_{variable}_categories.csv
one permitted value per line, no header (mcide.py:9-11).

The reference's five sequential REST round-trips become: catalog reads
= queries over an ingested table; the guarded append = anti-join check
+ staged versioned write (the engine owns validation + new contents;
branch/PR choreography stays an orchestration adapter, SURVEY.md §3.3).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def variable_from_fname(fname_col: str, table_col: str) -> "F.Column":
    """Variable name from a catalog filename: strip the
    ``clif_{table}_`` prefix using the directory-derived table name so
    tables whose names contain underscores (respiratory_support,
    medication_admin_continuous, ...) resolve correctly — mirrors
    reference removeprefix(f"clif_{table}_") (mcide.py:20-31); a
    '[^_]+' regex would stop at the first underscore and yield e.g.
    'support_device_category'. ONE definition: the file-tree reader
    below and the contents-API ingester (clif/ingest.py) must parse
    identically (test_ingest pins their outputs equal)."""
    return F.expr(
        "regexp_replace("
        f"  regexp_replace({fname_col}, '_categories\\\\.csv$', ''),"
        f"  concat('^clif_', {table_col}, '_'), '')"
    )


def read_catalog(spark: SparkSession, base_dir: str) -> DataFrame:
    """Scan the CSV tree into mcide_categories(table_name, variable,
    value, line_no). R24 filename parse + R25 line scan, distributed:
    spark.read.text over the glob, filename split via
    input_file_name()."""
    df = (
        spark.read.text(f"{base_dir}/*/*_categories.csv")
        .withColumn("path", F.input_file_name())
        .withColumn("table_name", F.element_at(F.split("path", "/"), -2))
        .withColumn("fname", F.element_at(F.split("path", "/"), -1))
        .withColumn("variable", variable_from_fname("fname", "table_name"))
    )
    # line_no preserves file order (append keeps order, mcide.py:57-61)
    from pyspark.sql import Window

    w = Window.partitionBy("path").orderBy(F.monotonically_increasing_id())
    return (
        df.withColumn("line_no", F.row_number().over(w))
        .select("table_name", "variable", F.trim("value").alias("value"), "line_no")
        .filter(F.col("value") != "")
    )


def list_tables(catalog: DataFrame) -> list[str]:
    """R23 (mcide.py:13-18): tables, excluding 00_-prefixed dirs."""
    rows = (
        catalog.select("table_name")
        .distinct()
        .filter(~F.col("table_name").startswith("00_"))
        .orderBy("table_name")
        .collect()
    )
    return [r.table_name for r in rows]


def list_variables(catalog: DataFrame, table: str) -> list[str]:
    """R24 (mcide.py:20-31)."""
    rows = (
        catalog.filter(F.col("table_name") == table)
        .select("variable")
        .distinct()
        .orderBy("variable")
        .collect()
    )
    return [r.variable for r in rows]


def list_values(catalog: DataFrame, table: str, variable: str) -> list[str]:
    """R25 (mcide.py:33-39): values in file order; missing -> []."""
    rows = (
        catalog.filter(
            (F.col("table_name") == table) & (F.col("variable") == variable)
        )
        .orderBy("line_no")
        .select("value")
        .collect()
    )
    return [r.value for r in rows]


class DuplicateValueError(ValueError):
    pass


def append_value(
    catalog: DataFrame, table: str, variable: str, new_value: str
) -> tuple[DataFrame, str]:
    """R26 (mcide.py:52-62): duplicate-checked append. Returns the new
    catalog and the updated file contents (existing order preserved,
    trailing newline — byte-compatible with the reference's PUT body).

    The duplicate check is a semi-join count (set membership); at scale
    it is a broadcast anti-join, never a collect of the value set.

    ``new_value`` is trimmed before the check and the append (catalog
    values are trimmed at read, so a raw ' sodium' would slip past the
    equality check and re-ingest as a real duplicate); blank values are
    rejected outright — a blank line is invisible to read_catalog."""
    new_value = new_value.strip()
    if not new_value:
        raise ValueError("blank value")
    exists = (
        catalog.filter(
            (F.col("table_name") == table)
            & (F.col("variable") == variable)
            & (F.col("value") == new_value)
        ).count()
        > 0
    )
    if exists:
        raise DuplicateValueError("Value already exists")
    current = list_values(catalog, table, variable)
    # next line_no from MAX, not len(current)+1: read_catalog numbers
    # lines before dropping blanks, so line_nos can have gaps and a
    # length-based number could collide with an existing line
    max_no = (
        catalog.filter(
            (F.col("table_name") == table) & (F.col("variable") == variable)
        )
        .agg(F.coalesce(F.max("line_no"), F.lit(0)))
        .first()[0]
    )
    spark = catalog.sparkSession
    new_row = spark.createDataFrame(
        [(table, variable, new_value, int(max_no) + 1)],
        "table_name string, variable string, value string, line_no int",
    )
    updated_catalog = catalog.unionByName(new_row)
    contents = "\n".join(current + [new_value]) + "\n"
    return updated_catalog, contents


def stage_change(
    base_dir: str, table: str, variable: str, contents: str, staging: str = "_staging"
) -> str:
    """R27 (mcide.py:64-98) engine half: stage the new file version for
    the orchestration adapter (which owns branch/PR). Atomic rename
    into the staging dir; returns the staged path."""
    stage_dir = os.path.join(base_dir, staging, table)
    os.makedirs(stage_dir, exist_ok=True)
    fname = f"clif_{table}_{variable}_categories.csv"
    tmp = os.path.join(stage_dir, fname + ".tmp")
    final = os.path.join(stage_dir, fname)
    with open(tmp, "w") as f:
        f.write(contents)
    os.replace(tmp, final)
    return final
