"""Non-parquet sources and sinks.

The reference's only wire format is JSON over HTTP (main.go:90-91);
JSON-lines is its batch analogue. CSV rounds out ingest coverage.
Sinks write parquet partitioned by the engine's canonical keys — at
100 TB the events table partitions by (game, date) so delta scans
become partition pruning (SURVEY.md §4).

All readers take explicit schemas: schema inference is a full extra
pass over the data — never acceptable at scale.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


# Micro-second timestamp fidelity: the default JSON/CSV timestampFormat
# truncates to milliseconds, silently corrupting event times on a
# round-trip. One format constant, used by every reader and writer.
TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def read_jsonl(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.schema(schema).option("timestampFormat", TS_FORMAT).json(path)


def read_csv(spark: SparkSession, path: str, schema: StructType) -> DataFrame:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", TS_FORMAT)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("timestampFormat", TS_FORMAT).json(path)


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").option("timestampFormat", TS_FORMAT).csv(path)


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: Sequence[str]
) -> None:
    """Partition-pruned layout: the scan side of delta_scan/time-range
    queries prunes whole directories when filters hit these columns."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    target_files: int | None = None,
) -> None:
    """Layout-optimized parquet write: repartition to a bounded file
    count (small-file compaction) and sort WITHIN each partition on
    the cluster columns, so every row group's min/max statistics span
    a narrow range of the cluster key — the property that lets later
    scans with predicates on those columns skip whole row groups
    (and, with one file per partition range, whole files).

    This is the batch-side of the 100 TB layout discipline: the event
    lake partitions by (game, date) directories and clusters by ts
    within files; a delta scan then prunes directories AND row groups.
    repartitionByRange samples the cluster key to build range bounds
    (one exchange, skew absorbed by sampling — NOT a single-partition
    global sort), so each output file owns a contiguous, disjoint key
    range; the local sort then orders rows inside every row group.
    A plain hash repartition would spread the full key range into
    every file and leave row-group stats useless (measured: widest
    row-group span == global span).
    """
    out = df
    if target_files is not None:
        out = out.repartitionByRange(target_files, *cluster_cols)
    out.sortWithinPartitions(*cluster_cols).write.mode("overwrite").parquet(path)
