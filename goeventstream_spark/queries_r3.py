"""Round-3 additions, each declared with a DuckDB oracle: real PNG
media decode (pure-stdlib codec, full filter reconstruction,
oracle-checked pixel sums), deterministic ANN components promoted
from rows-only to hash-oracled (hyperplane band signatures, probe-all
IVF == exact brute force), and BM25 term scoring (rational odds-idf,
log-free for bit-exact cross-engine hashes).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goeventstream_spark.queries import query
from goeventstream_spark.sources import load_table


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


@query(
    "multimodal_png_decode",
    """
    WITH rr AS (SELECT r FROM range(0, 32) t(r)),
         cc AS (SELECT c FROM range(0, 32) t(c))
    SELECT d.doc_id,
           CAST(4 + d.doc_id % 29 AS BIGINT) AS width,
           CAST(4 + (d.doc_id // 29) % 29 AS BIGINT) AS height,
           CAST(sum((d.doc_id + 7 * rr.r + 3 * cc.c) % 251) AS BIGINT) AS px_sum
    FROM documents d
    JOIN rr ON rr.r < 4 + (d.doc_id // 29) % 29
    JOIN cc ON cc.c < 4 + d.doc_id % 29
    GROUP BY d.doc_id
    """,
)
def q_multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode end-to-end: encode one deterministic PNG per
    document (functions/png.fixture_png), then fully decode it back —
    signature + per-chunk CRC verification, zlib inflate, and
    reconstruction of all five PNG row filters (the encoder cycles
    them) — and emit width/height/pixel-sum. The oracle states the
    expected output in closed form, so a header-peek or a broken
    unfilter CANNOT pass. Both encode and decode run map-side in Arrow
    batches; no shuffle anywhere in the plan."""
    from goeventstream_spark.operators import multimodal as mm

    # Re-shard BEFORE the CPU-heavy codec: the fixture table is one
    # small parquet split, which would serialize all encode+decode work
    # into one task; a media lake does the same doc_id re-shard ahead
    # of per-asset CPU so every core decodes. Only (doc_id) rows cross
    # the shuffle — payloads are generated after it.
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .repartition(spark.sparkContext.defaultParallelism, "doc_id")
    )
    return mm.decode_stats(mm.as_media_png(docs))


def _plane_sql(p: int, dims: int = 64) -> str:
    vals = [
        "1.0" if int(hashlib.md5(f"{p}|{j}".encode()).hexdigest(), 16) % 2 == 0 else "-1.0"
        for j in range(dims)
    ]
    return "CAST([" + ", ".join(vals) + "] AS DOUBLE[])"


def _band_sig_sql(b: int, planes_per_band: int = 4) -> str:
    bits = " || ".join(
        f"CASE WHEN list_dot_product(v, {_plane_sql(b * planes_per_band + r)}) >= 0 "
        "THEN '1' ELSE '0' END"
        for r in range(planes_per_band)
    )
    return f"SELECT vec_id, CAST({b} AS INT) AS band_id, {bits} AS band_sig FROM e"


@query(
    "lsh_band_signatures",
    "WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)\n"
    + "\nUNION ALL\n".join(_band_sig_sql(b) for b in range(8)),
)
def q_lsh_band_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic signature table of lsh_banded_near_dup
    (similarity.band_signatures): md5-parity hyperplanes + exact-fold
    projections make the component hash-oracle-able even though the
    banded near-dup RESULT is recall-bounded (rows-only by design)."""
    from goeventstream_spark.operators import similarity

    return similarity.band_signatures(_emb(spark, sf_dir))


@query(
    "ivf_probe_all_topk",
    """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    scored AS (
      SELECT query_id, vec_id,
             list_dot_product(qe, e)
               / (sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e))) AS cos_sim
      FROM q, c WHERE vec_id <> query_id
    )
    SELECT query_id, vec_id, cos_sim, rk FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY cos_sim DESC, vec_id) AS BIGINT) AS rk
      FROM scored
    ) WHERE rk <= 5
    """,
)
def q_ivf_probe_all_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF searched with EVERY cell probed must equal exact brute-force
    top-k — the correctness surface of the whole IVF path (assignment,
    probe join, Arrow scorer, tie-break), hash-oracled against the same
    SQL as similarity_topk. The recall-bounded n_probe<16 form stays
    rows-only by design (ivf_topk)."""
    from goeventstream_spark.operators import similarity

    emb = _emb(spark, sf_dir)
    qs = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    return similarity.ivf_topk(emb, qs, k=5, n_centroids=16, n_probe=16)


@query(
    "bm25_term_topk",
    """
    WITH words AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
    ), w AS (SELECT doc_id, word FROM words WHERE word <> ''),
    corpus AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents),
    dl AS (SELECT doc_id, count(*) AS dl FROM w GROUP BY doc_id),
    avgdl AS (SELECT CAST(sum(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl FROM dl),
    tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
    df AS (SELECT word, count(*) AS df FROM (SELECT DISTINCT doc_id, word FROM w) GROUP BY word),
    scored AS (
      SELECT tf.doc_id, tf.word,
             ((CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5) / (CAST(df AS DOUBLE) + 0.5))
             * ((CAST(tf AS DOUBLE) * 2.2)
                / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE) / avgdl))))
               AS bm25
      FROM tf JOIN df ON tf.word = df.word JOIN dl ON tf.doc_id = dl.doc_id, corpus, avgdl
    )
    SELECT doc_id, word, bm25, rk FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
                                        ORDER BY bm25 DESC, word) AS BIGINT) AS rk
      FROM scored
    ) WHERE rk <= 5
    """,
)
def q_bm25_term_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 BM25-salient terms per document (text.bm25_term_scores):
    tf saturation with document-length normalization times the rational
    odds-idf — the retrieval-grade upgrade of term_scores' raw TF-IDF,
    log-free so the oracle hash-matches bit-exactly."""
    from goeventstream_spark.operators import text

    return text.bm25_term_scores(load_table(spark, sf_dir, "documents"), top_k=5)
