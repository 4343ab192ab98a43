"""Streaming sketch accumulation: per-micro-batch partial sketches
written to a batch_id-partitioned lake (idempotent under replay, same
dynamic-overwrite contract as streaming/dedup.py), merged exactly on
read because CMS counters are associative sums. This is the
continuous-ingest form of the mergeability already pinned for the
batch sketches: a 100 TB stream never rebuilds the sketch — each
micro-batch contributes O(depth x width) cells and the union
re-aggregates to the exact full-corpus sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from goeventstream_spark.operators.sketches import cms_build


def streaming_cms_build(
    stream_items: DataFrame,
    cells_dir: str,
    checkpoint_dir: str,
    key_col: str = "token",
    depth: int = 4,
    width: int = 256,
):
    """Start the sketch-accumulation stream; returns the
    StreamingQuery. Read the lake with spark.read.parquet(cells_dir)
    and merge via operators.sketches.cms_merge."""

    def sink(batch_df, batch_id):
        spark = batch_df.sparkSession  # CLONED session — conf goes here
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                cms_build(batch_df, key_col, depth, width)
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(cells_dir)
            )
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
            else:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return (
        stream_items.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
