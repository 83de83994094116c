"""Simulated stream source: split a batch DataFrame into a time-ordered
parquet file sequence for Spark's file streaming source.

Spark's file source orders micro-batches by file mtime, so chunks get
strictly increasing mtimes — equal mtimes would randomize arrival order
and a watermark would then drop valid data. Harness setup, not engine
work (the production source is Kafka / cloud-storage arrival order).
"""

from __future__ import annotations

import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame


def write_time_chunks(df: DataFrame, src: str, n_chunks: int = 4) -> None:
    """Write ``df`` (must have ts + event_id columns) as ``n_chunks``
    time-ordered parquet files with increasing mtimes."""
    shutil.rmtree(src, ignore_errors=True)
    os.makedirs(src, exist_ok=True)
    pdf = df.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    chunk = (len(pdf) + n_chunks - 1) // n_chunks
    for i in range(n_chunks):
        path = f"{src}/chunk-{i:04d}.parquet"
        tbl = pa.Table.from_pandas(pdf.iloc[i * chunk : (i + 1) * chunk])
        ts_idx = tbl.schema.get_field_index("ts")
        tbl = tbl.set_column(
            ts_idx,
            pa.field("ts", pa.timestamp("us")),
            tbl.column("ts").cast(pa.timestamp("us")),
        )
        pq.write_table(tbl, path)
        os.utime(path, (1_700_000_000 + i, 1_700_000_000 + i))
