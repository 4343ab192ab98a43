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
        # per-WRITE dynamic overwrite (not a session-conf toggle, which
        # concurrent streams/queries on the same session could observe
        # mid-batch — r7, ADVICE r6): only this batch's partitions are
        # replaced on replay, everything else untouched
        (
            cms_build(batch_df, key_col, depth, width)
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(cells_dir)
        )

    return (
        stream_items.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Streaming heavy hitters: persisted per-bucket Misra-Gries summaries
# ---------------------------------------------------------------------------
# Batch `sketches.heavy_hitters` proposes candidates with one
# shuffle-free MG pass; this is its continuous-ingest form. Each
# micro-batch: (1) exact batch word counts; (2) union with persisted
# per-bucket summaries; (3) MG-compress each bucket back to <= k
# counters (subtract the (k+1)-largest combined count, keep positives
# — the mergeable-summaries compress of Agarwal et al., PODS'12, which
# adds at most n_batch/(k+1) undercount); (4) overwrite the index.
# ALL occurrences of a word hash to ONE bucket, so a word absent from
# its bucket's summary has true count <= n_bucket/(k+1) <=
# n_total/(k+1): the same superset guarantee the batch operator relies
# on — "candidates + exact verify" stays EXACT under streaming. State
# is n_buckets * k counters, bounded forever.

from pyspark.sql import Window  # noqa: E402  (window for MG compress)

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


def _committed_index_versions(index_dir: str) -> list[int]:
    """Batch ids of fully-committed (has _SUCCESS) index versions under
    ``index_dir/v=<batch_id>/``. Local-filesystem scope, like
    sources.io.write_idempotent; on an object store swap the listing
    for the store's manifest API."""
    import os

    out = []
    try:
        names = os.listdir(index_dir)
    except FileNotFoundError:
        return out
    for name in names:
        if name.startswith("v="):
            try:
                v = int(name.split("=", 1)[1])
            except ValueError:
                continue
            if os.path.exists(os.path.join(index_dir, name, "_SUCCESS")):
                out.append(v)
    return sorted(out)


def read_heavy_hitter_index(spark, index_dir: str) -> DataFrame:
    """The latest committed MG summary (bucket, word, mg_count) — the
    candidate set for exact heavy-hitter verification."""
    versions = _committed_index_versions(index_dir)
    if not versions:
        return spark.createDataFrame([], SUMMARY_SCHEMA)
    return spark.read.parquet(f"{index_dir}/v={versions[-1]}")


def streaming_heavy_hitter_index(
    docs_stream: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    k: int = 64,
    n_buckets: int = 32,
):
    """Maintain the per-bucket MG summary index over a document stream;
    returns the StreamingQuery. Candidates = the index contents (read
    with :func:`read_heavy_hitter_index`); exact heavy hitters =
    candidates semi-joined to an exact count pass, as in batch
    `sketches.heavy_hitters` (test pins the equality).

    Exactly-once under replay: each micro-batch writes its merged,
    compressed summary to a NEW versioned directory
    ``index_dir/v=<batch_id>`` after reading only the latest COMMITTED
    version with id < batch_id. A batch replayed after a crash is a
    no-op if its own version already committed (the recompute is
    deterministic, so the directory already holds the exact output —
    and skipping never deletes a ``_SUCCESS`` a concurrent reader may
    be mid-read on); if it crashed mid-write, the uncommitted (no
    ``_SUCCESS``) directory is invisible to readers/successors and is
    simply rewritten from the same committed predecessor — never
    double-merging either way. State stays bounded: each version is
    <= n_buckets * k counters and older committed versions are pruned
    down to the TWO most recent predecessors — a concurrent
    `read_heavy_hitter_index` caller that listed versions just before
    a batch commits therefore always has a full trigger interval of
    grace before its chosen version can be pruned (pruning only the
    latest predecessor would let two quick back-to-back commits delete
    a version mid-read)."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        spark = batch_df.sparkSession
        all_committed = _committed_index_versions(index_dir)
        if batch_id in all_committed:
            # replayed batch whose version already COMMITTED (crash fell
            # between the parquet _SUCCESS and the stream checkpoint):
            # the recompute is deterministic, so the existing directory
            # already holds exactly what we would rewrite — skip, never
            # deleting a _SUCCESS a concurrent reader may be using.
            return
        batch_counts = (
            batch_df.select(F.explode(F.split(text_col, " ")).alias("word"))
            .groupBy("word")
            .agg(F.count("*").alias("mg_count"))
            .withColumn("bucket", word_bucket(F.col("word"), n_buckets))
        )
        committed = [v for v in all_committed if v < batch_id]
        if committed:
            prev = spark.read.parquet(f"{index_dir}/v={committed[-1]}")
        else:
            prev = spark.createDataFrame([], SUMMARY_SCHEMA)
        merged = (
            prev.unionByName(batch_counts.select("bucket", "word", "mg_count"))
            .groupBy("bucket", "word")
            .agg(F.sum("mg_count").alias("mg_count"))
        )
        # reads v=<predecessor>, writes v=<batch_id>: never overwrites
        # files its own lineage is reading, so no checkpoint pin needed.
        mg_compress(merged, k).write.mode("overwrite").parquet(
            f"{index_dir}/v={batch_id}"
        )
        # keep the two most recent committed predecessors (replay safety
        # net + one trigger interval of grace for a concurrent reader
        # that resolved its version just before this commit); prune the
        # rest.
        for v in committed[:-2]:
            shutil.rmtree(f"{index_dir}/v={v}", ignore_errors=True)

    return (
        docs_stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def streaming_dsir_distribution(
    docs_stream: DataFrame,
    cells_dir: str,
    checkpoint_dir: str,
    target_pred_sql: str = "lang = 'en'",
    text_col: str = "text",
    n_buckets: int = 64,
):
    """Accumulate the DSIR hashed-unigram bucket distribution over
    continuous ingest: per micro-batch, one bounded (bucket, tc, rc)
    partial written to a batch_id-partitioned lake (idempotent under
    replay, the streaming_cms_build contract); the union re-aggregates
    to the exact full-corpus distribution because both counters are
    plain sums. Importance scores are then priced from the merged
    distribution exactly as the batch `sampling.dsir_importance` —
    the test pins distribution equality."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        words = batch_df.select(
            F.expr(f"CAST(({target_pred_sql}) AS INT)").alias("is_target"),
            F.explode(F.split(F.col(text_col), " ")).alias("word"),
        )
        cells = words.select(
            "is_target",
            word_bucket(F.col("word"), n_buckets).alias("bucket"),
        ).groupBy("bucket").agg(
            F.sum("is_target").cast("long").alias("tc"),
            F.count("*").cast("long").alias("rc"),
        )
        # per-write dynamic overwrite — see streaming_cms_build
        (
            cells.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(cells_dir)
        )

    return (
        docs_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Streaming KMV / bottom-k distinct sketches: per-batch partials
# ---------------------------------------------------------------------------
# Batch `sketches.kmv_bottom_k` builds the per-key bottom-k sketch in
# one pass; this is its continuous-ingest form. Bottom-k summaries are
# MERGEABLE (bottom-k of a union == bottom-k of the per-part bottom-k
# union), so each micro-batch writes only its own <= k rows per key to
# a batch_id-partitioned lake (idempotent under replay, the
# streaming_cms_build contract) and the reader re-ranks the union —
# the index never rescans history and equals the batch sketch exactly.


def streaming_kmv_index(
    stream_items: DataFrame,
    cells_dir: str,
    checkpoint_dir: str,
    key_col: str = "event_type",
    id_col: str = "user_id",
    k: int = 32,
):
    """Start the sketch-accumulation stream; returns the
    StreamingQuery. Read back via read_kmv_index."""
    from goeventstream_spark.operators.sketches import kmv_bottom_k, kmv_hash48

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        part = batch_df.select(key_col, kmv_hash48(id_col)).distinct()
        # per-write dynamic overwrite — see streaming_cms_build
        (
            kmv_bottom_k(part, key_col, k=k)
            .select(key_col, "h")
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(cells_dir)
        )

    return (
        stream_items.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_kmv_index(spark, cells_dir: str, key_col: str = "event_type", k: int = 32):
    """Merge the persisted per-batch partials into the current per-key
    bottom-k sketch: distinct the (key, h) union (the same id arriving
    in several batches must count once) and re-rank. Equals the batch
    sketch over all ingested rows exactly."""
    from goeventstream_spark.operators.sketches import kmv_bottom_k

    parts = spark.read.parquet(cells_dir).select(key_col, "h").distinct()
    return kmv_bottom_k(parts, key_col, k=k)
