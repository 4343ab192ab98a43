"""Round-3 additions, each declared with a DuckDB oracle where the
semantics are SQL-expressible: real PNG media decode (pure-stdlib
codec, full filter reconstruction, oracle-checked pixel sums) and
deterministic ANN index components (MinHash band signatures, PQ code
assignments) promoted from rows-only to hash-oracled.
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

    docs = load_table(spark, sf_dir, "documents")
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
