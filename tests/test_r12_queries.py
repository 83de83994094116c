"""Round-12 additions: ADVICE r11 regressions (ANSI-safe IVF-PQ probe
lookup, eval-gram memo data-versioning + eviction unpersist), then
the round-12 growth surface (residual-encoded IVF-PQ with trained
codebooks, streaming ANN index maintenance). Parity vs the DuckDB
oracle is covered for every registered query by test_oracle_parity.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


# ------------------------------------------------- ADVICE r11 closures


def test_ivf_pq_search_ansi_safe(spark):
    """ADVICE r11 (low): the probe-map lookup must yield NULL for
    unprobed clusters (the common case) so explode drops them — plain
    map subscript throws MAP_KEY_DOES_NOT_EXIST under
    spark.sql.ansi.enabled=true. try_element_at is the ANSI-safe
    form; results must be identical either way."""
    from sparkclif.operators.quantize import ivf_pq_search

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    base = sorted(
        tuple(r) for r in ivf_pq_search(emb).collect()
    )
    assert base, "searcher returned no rows on the test corpus"
    prev = spark.conf.get("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        ansi = sorted(tuple(r) for r in ivf_pq_search(emb).collect())
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert ansi == base


def _write_docs(path: str, rows: list[tuple[int, str]]) -> None:
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["t"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, path)


def test_decontaminate_memo_busts_on_data_rewrite(spark, tmp_path):
    """ADVICE r11 (low): the eval-gram memo was keyed only by
    (applicationId, sf_dir) — an in-process harness regenerating the
    parquet under the same path would be served a silently-stale
    checkpointed fingerprint. The key now folds the source parquet's
    (mtime, size), so a rewrite gets a fresh eval-gram set."""
    from sparkclif.registry import all_queries

    fn = all_queries()["i_decontaminate"].fn
    sf_dir = str(tmp_path)
    p = os.path.join(sf_dir, "documents.parquet")
    # doc 0 is the eval set (doc_id % 101 == 0); doc 1 shares its gram
    _write_docs(p, [(0, "a b c d"), (1, "a b c x"), (2, "p q r s")])
    first = {r["doc_id"]: r["n_shared"] for r in fn(spark, sf_dir).collect()}
    assert first == {1: 1}
    # regenerate under the SAME path: eval grams change entirely
    os.remove(p)
    _write_docs(p, [(0, "p q r s t"), (1, "a b c x"), (2, "p q r s")])
    second = {r["doc_id"]: r["n_shared"] for r in fn(spark, sf_dir).collect()}
    assert second == {2: 2}, (
        "stale eval-gram fingerprint served after data rewrite"
    )


def test_ev_gram_evict_unpersists():
    """ADVICE r11 (low): eviction must best-effort free the
    checkpointed blocks immediately, not wait for GC + the
    ContextCleaner sweep."""
    from sparkclif.queries import group_i_r4 as g

    calls = []

    class _RDD:
        def unpersist(self):
            calls.append("unpersist")

    class _DF:
        rdd = _RDD()

    g._EV_GRAMS["__t__"] = _DF()
    g._evict_ev_gram("__t__")
    assert "__t__" not in g._EV_GRAMS
    assert calls == ["unpersist"]

    class _Dead:
        @property
        def rdd(self):
            raise RuntimeError("context gone")

    g._EV_GRAMS["__t2__"] = _Dead()
    g._evict_ev_gram("__t2__")  # must not raise
    assert "__t2__" not in g._EV_GRAMS
