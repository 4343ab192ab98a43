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


def load_events_delta(
    spark: SparkSession,
    sf_dir: str,
    t_lo: int,
    t_hi: int,
    stream_start_ms: int = 1_704_067_200_000,  # 2024-01-01T00:00:00Z
    tick_ms: int = 50,
) -> DataFrame:
    """Events restricted to ticks (t_lo, t_hi] with the range predicate
    PUSHED INTO THE PARQUET SCAN.

    The tick column derives from ts through a nanos->micros conversion
    Catalyst cannot invert, so a filter on `t` never reaches the scan.
    But tick is monotone in the raw INT64 nanos column, and the tick
    range maps exactly to a nanos range (integer truncation preserves
    the equivalences: ms >= X <=> ns >= X*1e6 for integer X):

        t >  t_lo  <=>  ns >= (start + (t_lo+1)*50) * 1e6
        t <= t_hi  <=>  ns <  (start + (t_hi+1)*50) * 1e6

    Filtering BEFORE the conversion makes it a plain comparison on a
    stored column -> parquet row-group pruning (and, on a date/tick-
    partitioned 100 TB event lake, partition pruning). This is what
    turns the reference's O(log-length) rescan (model/eventStream.go:63-71)
    into O(delta) at scale.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(raw.dtypes).get("ts") != "bigint":  # pragma: no cover
        return load_table(spark, sf_dir, "events")
    lo_ns = (stream_start_ms + (t_lo + 1) * tick_ms) * 1_000_000
    hi_ns = (stream_start_ms + (t_hi + 1) * tick_ms) * 1_000_000
    return raw.where((F.col("ts") >= lo_ns) & (F.col("ts") < hi_ns)).withColumn(
        "ts", F.expr("timestamp_micros(ts div 1000)")
    )
