"""Round-3 batch F: Kaplan-Meier survival of session durations
(right-censored at the data horizon, integer-ppm survival fold) and
reciprocal-rank fusion of two retrieval rankers (exact cosine + int8
quantized dot).

Exactness strategy: the KM survival curve is a sequential integer fold
S' = (S * (n - d)) DIV n replayed by a recursive-CTE oracle; RRF
contributions are 1e9 DIV (60 + rank) BIGINT floors, and the quantized
ranker's scores are exact integers, so both queries keep the hash gate
bit-for-bit. The only doubles are the cosine scores INSIDE ranking
(same proven machinery as ``similarity_topk``), never in the output.

Reference parity note: the reference (GoEventStream) has no analytics
surface — these are SURVEY.md §2b group-2/3 extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from goeventstream_spark.operators import similarity
from goeventstream_spark.queries import query
from goeventstream_spark.sources import load_table


# ---------------------------------------------------------------------------
# Kaplan-Meier survival of session durations
# ---------------------------------------------------------------------------


@query(
    "kaplan_meier_sessions",
    """
    WITH RECURSIVE s AS (
      SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS session_id
      FROM (
        SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 3600000
                       THEN 1 ELSE 0 END AS is_new
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      )
    ),
    hi AS (SELECT CAST(max(epoch_ms(ts)) AS BIGINT) AS hi FROM events),
    sess AS (
      SELECT (max(epoch_ms(ts)) - min(epoch_ms(ts))) // 1000 AS dur_s,
             CASE WHEN max(epoch_ms(ts)) >= (SELECT hi FROM hi) - 3600000
                  THEN 1 ELSE 0 END AS censored
      FROM s GROUP BY user_id, session_id
    ),
    g AS (
      SELECT dur_s,
             CAST(sum(1 - censored) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS removed
      FROM sess GROUP BY dur_s
    ),
    tab AS (
      SELECT dur_s, d,
             (SELECT count(*) FROM sess)
               - coalesce(sum(removed) OVER (ORDER BY dur_s
                                             ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND 1 PRECEDING), 0) AS n,
             row_number() OVER (ORDER BY dur_s) AS rn
      FROM g
    ),
    ev AS (SELECT dur_s, d, n,
                  row_number() OVER (ORDER BY dur_s) AS ern
           FROM tab WHERE d > 0),
    km AS (
      SELECT dur_s, d, n, ern, (1000000 * (n - d)) // n AS surv
      FROM ev WHERE ern = 1
      UNION ALL
      SELECT e.dur_s, e.d, e.n, e.ern, (km.surv * (e.n - e.d)) // e.n
      FROM km JOIN ev e ON e.ern = km.ern + 1
    )
    SELECT dur_s, CAST(n AS BIGINT) AS n_at_risk, CAST(d AS BIGINT) AS d_events,
           CAST(surv AS BIGINT) AS surv_ppm
    FROM km
    """,
)
def q_kaplan_meier_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve of session durations (gap-3600s
    sessions; sessions still open within one gap of the data horizon
    are right-CENSORED — they inform the risk set but never count as
    deaths, the estimator's whole point). At each death time t:
    S(t) = S(t-) * (n_t - d_t) / n_t, kept in integer ppm with a
    truncating per-step division, so the curve is bit-identical across
    engines and the oracle replays it as a recursive CTE.

    Scale plan: sessionization and the (duration -> deaths, removals)
    table are fully distributed (one user-keyed window + one duration
    agg); the risk-set cumulative and the product fold run on the
    DISTINCT-DURATION series, whose length is bounded by the observed
    second-resolution duration range — O(time), not O(rows) — so the
    single-partition tail is correct at any corpus size (same argument
    as ``seasonal_decompose_hourly``).
    """
    from pyspark.sql import types as T

    from goeventstream_spark.operators import stream_ops as so

    ev = load_table(spark, sf_dir, "events")
    sess = (
        so.sessionize(ev, gap_s=3600)
        .groupBy("user_id", "session_id")
        .agg(
            F.expr(
                "(max(unix_millis(ts)) - min(unix_millis(ts))) DIV 1000"
            ).alias("dur_s"),
            F.max(F.expr("unix_millis(ts)")).alias("end_ms"),
        )
    )
    hi = ev.agg(F.expr("CAST(max(unix_millis(ts)) AS BIGINT)").alias("hi"))
    sess = sess.crossJoin(F.broadcast(hi)).select(
        "dur_s",
        F.when(F.col("end_ms") >= F.col("hi") - 3600000, 1)
        .otherwise(0)
        .alias("censored"),
    )
    g = sess.groupBy("dur_s").agg(
        F.sum(1 - F.col("censored")).cast("long").alias("d"),
        F.count("*").cast("long").alias("removed"),
    )
    tot = sess.agg(F.count("*").cast("long").alias("total"))
    w_prev = Window.orderBy("dur_s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tab = (
        g.crossJoin(F.broadcast(tot))
        .withColumn(
            "n",
            F.col("total")
            - F.coalesce(F.sum("removed").over(w_prev), F.lit(0)),
        )
        .where(F.col("d") > 0)
        .select("dur_s", "d", "n")
    )
    out_schema = T.StructType(
        [
            T.StructField("dur_s", T.LongType()),
            T.StructField("n_at_risk", T.LongType()),
            T.StructField("d_events", T.LongType()),
            T.StructField("surv_ppm", T.LongType()),
        ]
    )

    def fold(pdf):
        # SELF-CONTAINED closure (executor workers don't share the
        # driver's sys.path).
        import pandas as pd

        pdf = pdf.sort_values("dur_s", ignore_index=True)
        surv, out = 1000000, []
        for n, d in zip(pdf["n"], pdf["d"]):
            surv = (surv * (int(n) - int(d))) // int(n)
            out.append(surv)
        return pd.DataFrame(
            {
                "dur_s": pdf["dur_s"],
                "n_at_risk": pdf["n"],
                "d_events": pdf["d"],
                "surv_ppm": out,
            }
        )

    return (
        tab.withColumn("_g", F.lit(1))
        .groupBy("_g")
        .applyInPandas(fold, out_schema)
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of two retrieval rankers
# ---------------------------------------------------------------------------

_COS_SQL = (
    "list_dot_product(qe, e) / "
    "(sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e)))"
)

_Q8 = (
    "list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * (127.0 / "
    "list_max(list_transform(embedding, y -> abs(CAST(y AS DOUBLE)))))) AS BIGINT))"
)


@query(
    "rrf_fused_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe,
                      {_Q8} AS qq
               FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
                 {_Q8} AS cq
          FROM embeddings),
    ra AS (
      SELECT query_id, vec_id, rk FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY {_COS_SQL} DESC, vec_id) AS rk
        FROM q, c WHERE vec_id <> query_id
      ) WHERE rk <= 20
    ),
    rb AS (
      SELECT query_id, vec_id, rk FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY CAST(list_dot_product(qq, cq) AS BIGINT)
                                             DESC, vec_id) AS rk
        FROM q, c WHERE vec_id <> query_id
      ) WHERE rk <= 20
    ),
    fused AS (
      SELECT coalesce(ra.query_id, rb.query_id) AS query_id,
             coalesce(ra.vec_id, rb.vec_id) AS vec_id,
             CAST(coalesce(1000000000 // (60 + ra.rk), 0)
                  + coalesce(1000000000 // (60 + rb.rk), 0) AS BIGINT) AS rrf_ppb
      FROM ra FULL OUTER JOIN rb
        ON ra.query_id = rb.query_id AND ra.vec_id = rb.vec_id
    )
    SELECT query_id, vec_id, rrf_ppb,
           CAST(frk AS BIGINT) AS fused_rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_ppb DESC, vec_id) AS frk
      FROM fused
    ) WHERE frk <= 5
    """,
)
def q_rrf_fused_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al., SIGIR'09) of two
    retrieval rankers over the embedding corpus: exact cosine top-20
    (the ``similarity_topk`` machinery) fused with int8-quantized dot
    top-20 (the ``embedding_quantize`` codes — integer scores, exactly
    comparable). Each doc scores sum of 1e9 DIV (60 + rank) over the
    rankers that retrieved it; top-5 fused per query. Output is
    integer-only. Sibling of ``hybrid_rrf_search`` (dense + lexical
    over documents); this one fuses exact vs QUANTIZED rankers over
    the same modality — the compression-loss readout.

    Scale plan: both rankers are broadcast-queries x corpus scans; the
    fusion is a full-outer join of two k x |queries| row lists — tiny.
    At 100 TB each ranker swaps for its ANN variant (``ivf_topk``,
    LSH-bucketed quantized scan) and the fusion tail is unchanged.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q8 = F.transform(
        "embedding",
        lambda x: F.floor(
            x.cast("double")
            * (
                F.lit(127.0)
                / F.array_max(
                    F.transform("embedding", lambda y: F.abs(y.cast("double")))
                )
            )
        ).cast("long"),
    )
    corpus = emb.select("vec_id", q8.alias("cq"))
    queries_df = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_embedding"),
        q8.alias("qq"),
    )
    # ranker A: exact cosine top-20 (proven parity machinery)
    ra = similarity.cosine_topk(
        emb, queries_df.select("query_id", "q_embedding"), k=20
    ).select("query_id", "vec_id", F.col("rk").alias("rk_a"))
    # ranker B: int8-quantized dot top-20 (exact integer scores)
    pairs = corpus.crossJoin(
        F.broadcast(queries_df.select("query_id", "qq"))
    ).where(F.col("vec_id") != F.col("query_id"))
    dotq = pairs.select(
        "query_id",
        "vec_id",
        F.aggregate(
            F.zip_with("qq", "cq", lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("qdot"),
    )
    wb = Window.partitionBy("query_id").orderBy(F.desc("qdot"), "vec_id")
    rb = (
        dotq.withColumn("rk_b", F.row_number().over(wb))
        .where(F.col("rk_b") <= 20)
        .select("query_id", "vec_id", "rk_b")
    )
    fused = (
        ra.join(rb, ["query_id", "vec_id"], "full_outer")
        .select(
            "query_id",
            "vec_id",
            (
                F.coalesce(
                    F.expr("1000000000 DIV (60 + rk_a)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr("1000000000 DIV (60 + rk_b)"), F.lit(0)
                )
            )
            .cast("long")
            .alias("rrf_ppb"),
        )
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("rrf_ppb"), "vec_id")
    return (
        fused.withColumn("fused_rank", F.row_number().over(wf).cast("long"))
        .where(F.col("fused_rank") <= 5)
    )
