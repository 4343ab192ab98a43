"""Streaming quality gating: the foreachBatch production shape for
classifier-filtering a document stream at ingest time, before anything
heavier (dedup, indexing) sees the rejects.

Each micro-batch is scored with the SAME hashed linear classifier the
batch path uses (operators/text.hashed_linear_scores) and split:
accepted docs (logit >= 0, plus the deterministic exploration sample
of rejects) land in the kept lake, the rest in the rejects lake —
both partitioned by batch_id under dynamic partition overwrite, so a
replayed batch overwrites exactly its own partitions (the repo's
lake-side exactly-once contract).

Correctness invariant (pinned by the streaming==batch test): both
gates are pure per-document functions of content and id, so the union
of kept partitions over any batching of the corpus equals the batch
`quality_filter_with_exploration` keep set exactly — INCLUDING
token-less documents (empty / whitespace-only / NULL text), which both
paths score sw=0 and keep (the batch query and its oracle are total
over documents via the same keep_tokenless contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from goeventstream_spark.operators.text import hashed_linear_scores

EXPLORE_DRAW_MAX = 6554  # ~10% of the 16-bit md5 key space


def quality_gate_flags(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document gate decisions — shared by the batch query and the
    streaming sink so the two paths can never drift: ``is_quality``
    (classifier logit >= 0, i.e. BIGINT weight sum >= 0) and
    ``is_explore`` (rejected but drawn into the deterministic ~10%
    md5(doc_id) exploration sample).

    TOTAL over the batch: token-less documents (empty or
    whitespace-only text) score sw=0, n=0 (``keep_tokenless`` — a
    join-free sentinel inside the same explode+agg), so sw >= 0 routes
    them to the kept lake and kept + rejects provably partition every
    batch. Without this they would vanish from BOTH lakes at ingest."""
    d = hashed_linear_scores(docs, id_col=id_col, keep_tokenless=True)
    draw = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 4), 16, 10
    ).cast("long")
    return d.withColumn("is_quality", F.col("sw") >= 0).withColumn(
        "is_explore", (F.col("sw") < 0) & (draw < EXPLORE_DRAW_MAX)
    )


def streaming_quality_gate(
    stream_docs: DataFrame,
    kept_dir: str,
    rejects_dir: str,
    checkpoint_dir: str,
    id_col: str = "doc_id",
):
    """Start the ingest-time quality gate over a streaming documents
    DataFrame (doc_id, text, ...). Returns the StreamingQuery; the
    caller owns awaitTermination. No cross-batch state at all — the
    gate is a pure function of each document, which is what makes the
    streaming and batch paths trivially equal and the sink replayable.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # per-write dynamic overwrite (never a session-conf toggle a
        # concurrent stream could observe — r7, see streaming/dedup.py)
        flags = quality_gate_flags(batch_df, id_col=id_col).withColumn(
            "batch_id", F.lit(batch_id)
        )
        kept = flags.where(F.col("is_quality") | F.col("is_explore"))
        rejects = flags.where(
            ~(F.col("is_quality") | F.col("is_explore"))
        )
        (
            kept.drop("is_quality", "is_explore")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(kept_dir)
        )
        (
            rejects.drop("is_quality", "is_explore")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(rejects_dir)
        )

    return (
        stream_docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
