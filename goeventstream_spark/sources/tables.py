"""Parquet table sources for the engine.

The fixture star schema (FIXTURES.md) mirrors the reference's data model:
``events`` is the append-only event log (reference model/event.go:7-12 —
{T, Type, Origin, Body} becomes {ts/event_id, event_type, user_id,
value+props}); the TPC-H-ish dims exercise the relational surface the
reference lacks (SURVEY.md §2a "explicitly absent").

Scale notes: parquet scans here are the 100 TB entry point — operators
must keep filters/projections *above* these reads expressed so Catalyst
pushes them into the scan (verify via .explain: PushedFilters/ReadSchema).
At cluster scale `events` would be partitioned by (game, date); the
fixtures are single files, but no operator in this package assumes that.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Schema comes from parquet footers (no
    inference pass); column pruning/pushdown happen in the scan node.

    ``events.ts`` is written as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; we read it as raw INT64 nanos (legacy
    conf, runtime-settable) and convert with integer division — NOT
    float division, which would lose precision on ~1.7e18 ns epochs.
    DuckDB performs the identical nanos->micros truncation, so oracle
    timestamps agree exactly.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # Timestamp arithmetic (tick derivation, NTZ->instant casts) must
    # not depend on the caller session's timezone conf — the driver
    # passes its own SparkSession. Pin UTC (runtime-settable).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql use."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
