"""Streaming heavy hitters: a persisted Misra-Gries summary per hash
bucket, maintained incrementally over continuous ingest.

Batch `sketches.heavy_hitters` proposes candidates with one shuffle-free
MG pass; this is its continuous-ingest form. Each micro-batch:

1. exact word counts for the batch (one bounded aggregation);
2. union with the persisted per-bucket summaries;
3. MG-compress each bucket back to <= k counters: subtract the
   (k+1)-largest combined count from every counter, keep positives —
   the standard mergeable-summaries compress (Agarwal et al., PODS'12),
   which adds at most n_batch/(k+1) to the undercount error;
4. overwrite the summary index.

Because ALL occurrences of a word hash to ONE bucket, a word absent
from its bucket's summary after any number of merges has true count
<= n_bucket/(k+1) <= n_total/(k+1) — the same superset guarantee the
batch operator relies on, so "candidates + exact verify" stays EXACT
under streaming. State is n_buckets * k counters total, bounded
forever; n_buckets spreads summary maintenance across executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SUMMARY_SCHEMA = "bucket int, word string, mg_count long"


def word_bucket(word, n_buckets: int):
    """Deterministic bucket for a word (md5-derived, engine-portable —
    same derivation family as sketches._bucket)."""
    return (
        F.conv(F.substring(F.md5(word), 1, 4), 16, 10).cast("int")
        % F.lit(n_buckets)
    )


def mg_compress(counts: DataFrame, k: int) -> DataFrame:
    """Compress (bucket, word, mg_count) rows to <= k counters per
    bucket: subtract the (k+1)-largest count in the bucket from every
    counter and keep the positive ones. Ties on count break by word so
    the summary is deterministic for a given merge order."""
    w = Window.partitionBy("bucket").orderBy(F.col("mg_count").desc(), "word")
    ranked = counts.withColumn("rn", F.row_number().over(w))
    thr = F.max(F.when(F.col("rn") == k + 1, F.col("mg_count")).otherwise(0)).over(
        Window.partitionBy("bucket")
    )
    return (
        ranked.withColumn("mg_count", F.col("mg_count") - thr)
        .where((F.col("rn") <= k) & (F.col("mg_count") > 0))
        .select("bucket", "word", "mg_count")
    )


def streaming_heavy_hitter_index(
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    k: int = 64,
    n_buckets: int = 32,
):
    """Maintain the per-bucket MG summary index over a document stream;
    returns the StreamingQuery. Candidates = the index contents; exact
    heavy hitters = candidates semi-joined to an exact count pass, as
    in batch `sketches.heavy_hitters` (test pins the equality)."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        batch_counts = (
            batch_df.select(F.explode(F.split(text_col, " ")).alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("mg_count"))
            .withColumn("bucket", word_bucket(F.col("word"), n_buckets))
        )
        try:
            prev = spark.read.parquet(index_dir)
        except Exception:  # first batch: no index yet
            prev = spark.createDataFrame([], SUMMARY_SCHEMA)
        merged = (
            prev.unionByName(batch_counts.select("bucket", "word", "mg_count"))
            .groupBy("bucket", "word")
            .agg(F.sum("mg_count").alias("mg_count"))
        )
        # pin BEFORE overwriting the files the lineage still reads
        out = mg_compress(merged, k).localCheckpoint(eager=True)
        out.write.mode("overwrite").parquet(index_dir)

    return (
        docs_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
