"""The bucketed-table lifecycle (c_join_bucketed): write once per scale
factor, re-register from existing files via CLUSTERED BY DDL when the
in-memory catalog has lost the table — a fresh session must never
rewrite the data, and the re-registered table must still join
exchange-free."""

from __future__ import annotations

import os
import shutil

from sparkclif.io import has_data_files
from sparkclif.queries.group_c import _ensure_bucketed


def _loc(spark, tbl: str) -> str:
    return (
        spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:") + "/" + tbl
    )


def test_ddl_reregister_reuses_files(spark, sf_dir):
    tbl = _ensure_bucketed(spark, sf_dir, "b_orders")
    loc = _loc(spark, tbl)
    # the session skips _SUCCESS markers; bucket data files are the
    # layout sentinel (shared rule: io.has_data_files)
    assert has_data_files(loc)

    # Simulate a fresh session's empty catalog WITHOUT losing the data:
    # stash the files, drop the table, restore the files. The first
    # CTAS registration is a managed table (DROP purges the dir); a
    # re-registered one is EXTERNAL (DROP leaves the dir) — handle both
    # or the move nests the stash inside the surviving dir.
    stash = loc + ".stash"
    shutil.rmtree(stash, ignore_errors=True)  # leftover from a killed run
    shutil.copytree(loc, stash)
    spark.sql(f"DROP TABLE {tbl}")
    assert not spark.catalog.tableExists(tbl)
    if os.path.exists(loc):
        shutil.rmtree(stash)  # external drop left the files in place
    else:
        shutil.move(stash, loc)  # managed drop purged them: restore

    before = {f: os.path.getmtime(f"{loc}/{f}") for f in os.listdir(loc)}
    tbl2 = _ensure_bucketed(spark, sf_dir, "b_orders")
    assert tbl2 == tbl and spark.catalog.tableExists(tbl)
    after = {f: os.path.getmtime(f"{loc}/{f}") for f in os.listdir(loc)}
    assert before == after, "re-register must not rewrite any data file"

    # the re-registered table keeps its bucket metadata: joining two
    # bucketed sides stays SortMergeJoin with zero Exchange
    from sparkclif.registry import all_queries

    df = all_queries()["c_join_bucketed"].fn(spark, sf_dir)
    plan = spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "SortMergeJoin" in plan and "Exchange" not in plan


def test_stale_source_triggers_rebuild(spark, tmp_path):
    """Round-4 fix (VERDICT r3): the warehouse can outlive a testdata
    regeneration (it persists in the repo dir across rounds), so every
    reuse path must check the source fingerprint stamped at write time
    — a stale sf directory must trigger a rebuild, never serve buckets
    of the old data."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkclif.io import _session_cache

    sf = str(tmp_path / "sfstale")
    os.makedirs(sf)

    def write_orders(n: int) -> None:
        pq.write_table(
            pa.table(
                {
                    "o_orderkey": pa.array(range(n), pa.int64()),
                    "o_custkey": pa.array([i % 3 for i in range(n)], pa.int64()),
                    "o_totalprice": pa.array([float(i) for i in range(n)], pa.float64()),
                }
            ),
            f"{sf}/orders.parquet",
        )
        # the per-session table cache holds the OLD file's plan; a real
        # regeneration happens between driver processes where no cache
        # exists, so drop it rather than model mid-session mutation
        _session_cache(spark).pop((sf, "orders"), None)

    write_orders(4)
    tbl = _ensure_bucketed(spark, sf, "b_orders")
    assert spark.table(tbl).count() == 4

    # same catalog, same session: catalog-hit path must detect staleness
    write_orders(6)
    tbl2 = _ensure_bucketed(spark, sf, "b_orders")
    assert tbl2 == tbl
    assert spark.table(tbl).count() == 6, "stale buckets served after regen"

    # fresh-catalog (DDL re-register) path must also detect staleness:
    # drop from the catalog but keep/restore files, then regen source
    loc = _loc(spark, tbl)
    stash = loc + ".stash"
    shutil.rmtree(stash, ignore_errors=True)
    shutil.copytree(loc, stash)
    spark.sql(f"DROP TABLE {tbl}")
    if os.path.exists(loc):
        shutil.rmtree(stash)
    else:
        shutil.move(stash, loc)
    write_orders(8)
    tbl3 = _ensure_bucketed(spark, sf, "b_orders")
    assert spark.table(tbl3).count() == 8, "re-register path served stale buckets"


def test_has_data_files_ignores_uncommitted_temporary(tmp_path):
    """A write killed mid-job leaves part files only under
    _temporary/ — the commit sentinel must not count them (Spark's
    own listing ignores _-prefixed dirs)."""
    from sparkclif.io import has_data_files

    staging = tmp_path / "_temporary" / "0" / "attempt_0"
    staging.mkdir(parents=True)
    (staging / "part-0000.parquet").write_bytes(b"x")
    assert not has_data_files(str(tmp_path))
    # a committed file in a partition subdirectory IS counted
    part = tmp_path / "flag=R"
    part.mkdir()
    (part / "part-0001.parquet").write_bytes(b"x")
    assert has_data_files(str(tmp_path))


def test_parquet_row_count_recurses_partitioned_layout(tmp_path):
    """Footer-based row counts must see data files in partition value
    subdirectories and skip hidden/_temporary entries — the same
    listing rule as has_data_files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from sparkclif.io import parquet_row_count

    root = tmp_path / "t.parquet"
    (root / "flag=A").mkdir(parents=True)
    (root / "flag=B").mkdir()
    (root / "_temporary").mkdir()
    pq.write_table(pa.table({"x": [1, 2, 3]}), root / "flag=A" / "part-0.parquet")
    pq.write_table(pa.table({"x": [4]}), root / "flag=B" / "part-1.parquet")
    pq.write_table(pa.table({"x": [9, 9]}), root / "_temporary" / "part-2.parquet")
    assert parquet_row_count(str(tmp_path), "t") == 4


def test_overwrite_saveastable_replaces_changed_bucket_spec(spark):
    """run_versioned_merge_stream dropped its guard DROP on the claim
    that mode('overwrite').saveAsTable drops and recreates an existing
    managed table INCLUDING a changed bucket spec (optimization r12).
    That behavior is version-sensitive; this pins it on the running
    Spark (ADVICE r12) — if an upgrade ever keeps the stale spec, the
    bucketed merge-join exchange elimination silently breaks."""
    name = "t_bucket_overwrite_pin"
    df = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    try:
        df.write.bucketBy(4, "k").sortBy("k").mode("overwrite").saveAsTable(name)
        df.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(name)
        ddl = spark.sql(f"SHOW CREATE TABLE {name}").collect()[0][0]
        assert "8 BUCKETS" in ddl, ddl
        assert spark.table(name).count() == 100
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
