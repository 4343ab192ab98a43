"""Round-3 batch J: shingle containment pairs (the subset-duplicate
detector symmetric Jaccard misses) and hourly peak detection over the
gap-filled spine. Both integer-exact, both hash-oracled.

Reference parity note: the reference (GoEventStream) has no analytics
surface — these are SURVEY.md §2b group-2/3 extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from goeventstream_spark.queries import query
from goeventstream_spark.sources import load_table


def _containment_sql() -> str:
    from goeventstream_spark.queries_llm import _SHINGLES

    return f"""
    WITH {_SHINGLES},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           CAST(n_common AS BIGINT) AS n_common,
           CAST(1000000 * n_common // sa.n AS BIGINT) AS contain_a_ppm,
           CAST(1000000 * n_common // sb.n AS BIGINT) AS contain_b_ppm,
           CAST(1000000 * n_common // (sa.n + sb.n - n_common) AS BIGINT)
             AS jaccard_ppm
    FROM inter
    JOIN sizes sa ON doc_a = sa.doc_id
    JOIN sizes sb ON doc_b = sb.doc_id
    WHERE 1000000 * n_common // sa.n >= 800000
       OR 1000000 * n_common // sb.n >= 800000
    """


@query("shingle_containment_pairs", _containment_sql())
def q_shingle_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle CONTAINMENT pairs: doc pairs where >= 80% of
    one side's 3-gram shingles appear in the other — the
    subset-duplicate detector (quoted inclusions, boilerplate
    supersets, truncated copies) that symmetric Jaccard structurally
    misses: a short doc fully contained in a long one has high
    containment but LOW Jaccard, so ``minhash_near_dedup`` never
    surfaces it. Reported with both directions and the Jaccard for
    contrast, all exact ppm floors.

    Scale plan: same inverted-index anatomy as
    ``dedup.ngram_jaccard_pairs`` (shingle-keyed intersection counts,
    size dims joined back); at 100 TB the candidate source swaps to
    the banded-LSH path and this exact containment runs as the
    verifier. Citation: Broder's containment/resemblance distinction
    (SEQUENCES'97) — resemblance is the Jaccard the dedup family
    already covers, containment is this query.
    """
    from goeventstream_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    sh = dd.shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    joined = inter.join(sa, "doc_a").join(sb, "doc_b")
    ca = F.expr("CAST(1000000 * n_common DIV na AS BIGINT)")
    cb = F.expr("CAST(1000000 * n_common DIV nb AS BIGINT)")
    return (
        joined.select(
            "doc_a",
            "doc_b",
            F.col("n_common").cast("long").alias("n_common"),
            ca.alias("contain_a_ppm"),
            cb.alias("contain_b_ppm"),
            F.expr(
                "CAST(1000000 * n_common DIV (na + nb - n_common) AS BIGINT)"
            ).alias("jaccard_ppm"),
        )
        .where(
            (F.col("contain_a_ppm") >= 800000) | (F.col("contain_b_ppm") >= 800000)
        )
    )


@query(
    "hourly_peaks",
    """
    WITH hourly AS (
      SELECT epoch_ms(ts) // 3600000 AS hr, count(*) AS c
      FROM events GROUP BY 1
    ),
    bounds AS (SELECT min(hr) AS lo, max(hr) AS hi FROM hourly),
    spine AS (SELECT unnest(range(lo, hi + 1)) AS hr FROM bounds),
    filled AS (
      SELECT spine.hr, COALESCE(hourly.c, 0) AS c
      FROM spine LEFT JOIN hourly ON spine.hr = hourly.hr
    ),
    w AS (
      SELECT hr, c,
             lag(c) OVER (ORDER BY hr) AS pc,
             lead(c) OVER (ORDER BY hr) AS nc,
             max(c) OVER (ORDER BY hr ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
               AS lmax,
             max(c) OVER (ORDER BY hr ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING)
               AS rmax
      FROM filled
    )
    SELECT hr, CAST(c AS BIGINT) AS c,
           CAST(c - greatest(lmax, rmax) AS BIGINT) AS score
    FROM w
    WHERE pc IS NOT NULL AND nc IS NOT NULL AND c > pc AND c > nc
      AND lmax IS NOT NULL AND rmax IS NOT NULL
    ORDER BY score DESC, hr LIMIT 15
    """,
)
def q_hourly_peaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak detection on the hourly event series: strict local maxima
    (above both neighbors) scored by how far they rise above the
    highest value within ±3 hours — the burst-localization readout
    that complements ``error_bursts`` (per-key) and the Haar detail
    coefficients (block-aligned) with a point-wise, alignment-free
    detector. Pure integer window arithmetic, top-15 by prominence
    score.

    Scale plan: the heavy step is the hourly hash agg; every window
    runs on the O(time-span) spine (the single-partition argument of
    ``seasonal_decompose_hourly``), and top-15 is
    TakeOrderedAndProject.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.select(F.expr("unix_millis(ts) DIV 3600000").alias("hr"))
        .groupBy("hr")
        .agg(F.count("*").alias("c"))
    )
    bounds = hourly.agg(F.min("hr").alias("lo"), F.max("hr").alias("hi"))
    spine = bounds.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("hr")
    )
    filled = spine.join(hourly, "hr", "left").select(
        "hr", F.coalesce("c", F.lit(0)).alias("c")
    )
    wo = Window.orderBy("hr")
    w = filled.select(
        "hr",
        "c",
        F.lag("c").over(wo).alias("pc"),
        F.lead("c").over(wo).alias("nc"),
        F.max("c").over(wo.rowsBetween(-3, -1)).alias("lmax"),
        F.max("c").over(wo.rowsBetween(1, 3)).alias("rmax"),
    )
    return (
        w.where(
            F.col("pc").isNotNull()
            & F.col("nc").isNotNull()
            & (F.col("c") > F.col("pc"))
            & (F.col("c") > F.col("nc"))
            & F.col("lmax").isNotNull()
            & F.col("rmax").isNotNull()
        )
        .select(
            "hr",
            F.col("c").cast("long").alias("c"),
            (F.col("c") - F.greatest("lmax", "rmax")).cast("long").alias("score"),
        )
        .orderBy(F.desc("score"), "hr")
        .limit(15)
    )
