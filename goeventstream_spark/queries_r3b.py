"""Round-3 continuation batch: sketch-verified exact heavy hitters,
hybrid-retrieval rank fusion, deterministic integer-exact k-means,
recency-weighted activity scoring, binary-segmentation changepoints,
and entity-resolution golden records. Every declared query here is
DuckDB-hash-oracled; approximation (where any) lives in the propose
step and is verified exactly before the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goeventstream_spark.queries import query
from goeventstream_spark.sources import load_table


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# ---------------------------------------------------------------------------
# Heavy hitters: Misra-Gries propose (bounded, shuffle-free) + exact verify
# ---------------------------------------------------------------------------


@query(
    "heavy_hitter_words",
    """
    WITH w AS (
      SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ),
    t AS (SELECT count(*) AS n_total FROM w),
    c AS (SELECT word, count(*) AS cnt FROM w GROUP BY word)
    SELECT c.word, CAST(c.cnt AS BIGINT) AS cnt,
           CAST(t.n_total AS BIGINT) AS n_total
    FROM c, t WHERE c.cnt * 32 > t.n_total
    """,
)
def q_heavy_hitter_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy hitters (frequency > n/32) found the scalable way:
    a per-partition Misra-Gries sketch proposes <= 64 candidates per
    partition in one shuffle-free Arrow pass, then only those
    candidates are exactly counted (one aggregation whose key space is
    the candidate set, not the vocabulary). Because 32 < k+1 = 65 the
    MG superset guarantee makes the output EXACTLY the brute-force
    heavy hitters — the oracle states the brute-force definition.
    At 100 TB the difference is shuffling ~numPartitions*64 candidate
    rows instead of a billions-distinct token-frequency table."""
    from goeventstream_spark.operators import sketches

    words = _docs(spark, sf_dir).select(
        F.explode(F.split("text", " ")).alias("word")
    )
    return sketches.heavy_hitters(words, "word", k=64, denom=32)
