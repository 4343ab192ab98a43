"""Parquet footer introspection: the column-chunk statistics a
manifest/data-skipping layer (Iceberg/Delta-style) indexes, surfaced
as a relation.

The read is driver-side pyarrow footer parsing — bounded by FILE COUNT
(kilobytes per footer), never data size; this is exactly what a table
format's manifest writer does, and the right place for it (executors
scan data; the planner scans metadata). The relation then behaves like
any other DataFrame — here aggregated per column to audit compression
ratios and chunk counts, the inputs to "is my layout skippable"
decisions (see io.py's z-order/clustered writers for the fix side).
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CHUNK_SCHEMA = (
    "path_in_schema string, num_values long, compressed long, uncompressed long"
)


def parquet_chunk_stats(spark: SparkSession, path: str) -> DataFrame:
    """One row per (row-group, column chunk) across the file or
    directory at ``path``: value counts and compressed/uncompressed
    byte sizes from the footers only."""
    import pyarrow.parquet as pq

    files = (
        [path]
        if os.path.isfile(path)
        else sorted(glob.glob(os.path.join(path, "*.parquet")))
    )
    rows = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            for c in range(md.num_columns):
                col = md.row_group(rg).column(c)
                rows.append(
                    (
                        col.path_in_schema,
                        col.num_values,
                        col.total_compressed_size,
                        col.total_uncompressed_size,
                    )
                )
    return spark.createDataFrame(rows, CHUNK_SCHEMA)


def column_storage_report(spark: SparkSession, path: str) -> DataFrame:
    """Per-column storage audit: chunk count, value count, exact byte
    totals. The compression-ratio inputs stay integers so the report
    hash-matches the engine-native metadata functions (DuckDB
    parquet_metadata) exactly."""
    return (
        parquet_chunk_stats(spark, path)
        .groupBy("path_in_schema")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum("num_values").cast("long").alias("n_values"),
            F.sum("compressed").cast("long").alias("compressed"),
            F.sum("uncompressed").cast("long").alias("uncompressed"),
        )
    )
