"""Round-3 batch D: kNN label voting over the exact cosine search,
join-key skew diagnostics, classical additive seasonal decomposition,
frequent 3-itemsets, and cross-source token-distribution cosine.

Exactness strategy (repo-wide conventions): all aggregation happens in
BIGINT (counts, ppm/milli fixed-point floors via truncating DIV — DuckDB
``//`` and Spark ``DIV`` both truncate toward zero, so negative
detrended sums stay bit-identical); the only doubles are final-step
expressions computed from already-exact integers (cast → sqrt → divide),
which are identical IEEE-754 op sequences in both engines, so every
query here is hash-oracled.

Reference parity note: the reference (GoEventStream) has no analytics
surface — these are SURVEY.md §2b group-2/3 extensions, same as
queries_r2/r3*.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from goeventstream_spark.operators import similarity
from goeventstream_spark.queries import query
from goeventstream_spark.sources import load_table


_COS_SQL = (
    "list_dot_product(qe, e) / "
    "(sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e)))"
)


# ---------------------------------------------------------------------------
# kNN label vote: exact top-k cosine neighbors -> majority-label classifier
# ---------------------------------------------------------------------------


@query(
    "knn_label_vote",
    f"""
    WITH q AS (SELECT vec_id AS query_id, label AS true_label,
                      CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < 20),
    c AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    scored AS (
      SELECT query_id, true_label, c.vec_id, c.label, {_COS_SQL} AS cos_sim
      FROM q, c WHERE c.vec_id <> query_id
    ),
    topk AS (
      SELECT query_id, true_label, label FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, vec_id) AS rk
        FROM scored
      ) WHERE rk <= 10
    ),
    votes AS (
      SELECT query_id, true_label, label, count(*) AS votes
      FROM topk GROUP BY 1, 2, 3
    )
    SELECT query_id, CAST(true_label AS INT) AS true_label,
           CAST(label AS INT) AS pred_label,
           CAST(votes AS BIGINT) AS votes,
           CAST(CASE WHEN label = true_label THEN 1 ELSE 0 END AS INT) AS hit
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY votes DESC, label) AS vrk
      FROM votes
    ) WHERE vrk = 1
    """,
)
def q_knn_label_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN majority-vote classification over the exact cosine search:
    for each held-out query vector, take its 10 nearest neighbors
    (cosine, ties by vec_id — same mechanics as ``similarity_topk``)
    and predict the plurality neighbor label (ties broken toward the
    smaller label id). Output is integer-only (labels/votes/hit), so
    the hash gate never sees a float.

    Scale plan: queries broadcast, corpus scan embarrassingly parallel
    (``similarity.cosine_topk`` — Arrow GEMM per batch, one top-k
    TakeOrdered per query); the vote is a tiny agg on k*|queries|
    rows. At 100 TB the exact scan swaps for ``ivf_topk`` with the
    identical vote tail.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    truth = emb.select(
        F.col("vec_id").alias("query_id"),
        F.col("label").cast("int").alias("true_label"),
    )
    nbr_labels = emb.select("vec_id", F.col("label").cast("int").alias("label"))
    topk = (
        similarity.cosine_topk(emb, queries_df, k=10)
        .select("query_id", "vec_id")
        .join(F.broadcast(nbr_labels), "vec_id")
        .join(F.broadcast(truth), "query_id")
    )
    votes = topk.groupBy("query_id", "true_label", "label").agg(
        F.count("*").alias("votes")
    )
    # plurality with deterministic ties: max over (votes, -label) —
    # windowless argmax, one struct-max per query key.
    best = votes.groupBy("query_id", "true_label").agg(
        F.max(F.struct(F.col("votes"), (-F.col("label")).alias("neg_label"))).alias(
            "w"
        )
    )
    return best.select(
        "query_id",
        "true_label",
        (-F.col("w.neg_label")).cast("int").alias("pred_label"),
        F.col("w.votes").cast("long").alias("votes"),
        F.when(-F.col("w.neg_label") == F.col("true_label"), 1)
        .otherwise(0)
        .cast("int")
        .alias("hit"),
    )


# ---------------------------------------------------------------------------
# Join-key skew diagnostics: heavy hitters + ppm concentration
# ---------------------------------------------------------------------------


@query(
    "key_skew_report",
    """
    WITH k AS (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY 1),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
                   CAST(count(*) AS BIGINT) AS n_keys FROM k),
    top10 AS (
      SELECT o_custkey, cnt FROM k
      ORDER BY cnt DESC, o_custkey LIMIT 10
    )
    SELECT o_custkey AS custkey, CAST(cnt AS BIGINT) AS cnt,
           CAST(1000000 * cnt // total AS BIGINT) AS share_ppm,
           CAST(1000000 * cnt * n_keys // total AS BIGINT) AS x_mean_ppm,
           CAST(1000000 * sum(cnt) OVER (ORDER BY cnt DESC, o_custkey
                                         ROWS UNBOUNDED PRECEDING)
                // total AS BIGINT) AS cum_share_ppm
    FROM top10, tot
    """,
)
def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostics on ``orders.o_custkey``: the 10
    heaviest keys with their exact ppm share of all rows, multiple of
    the mean key load, and cumulative share — the report that decides
    whether a downstream join needs salting or AQE skew handling.

    Scale plan: one hash agg keyed on custkey (map-side combined),
    then a 10-row TakeOrderedAndProject; the cumulative window runs on
    the 10 surviving rows only — never a global window over all keys.
    Totals ride in via a broadcast 1-row aggregate.
    """
    orders = load_table(spark, sf_dir, "orders")
    k = orders.groupBy("o_custkey").agg(F.count("*").alias("cnt"))
    tot = k.agg(
        F.sum("cnt").cast("long").alias("total"),
        F.count("*").cast("long").alias("n_keys"),
    )
    top10 = k.orderBy(F.desc("cnt"), "o_custkey").limit(10)
    w = Window.orderBy(F.desc("cnt"), "o_custkey").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top10.crossJoin(F.broadcast(tot))
        .withColumn("cum_cnt", F.sum("cnt").over(w))
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("cnt").cast("long").alias("cnt"),
            F.expr("CAST(1000000 * cnt DIV total AS BIGINT)").alias("share_ppm"),
            F.expr("CAST(1000000 * cnt * n_keys DIV total AS BIGINT)").alias(
                "x_mean_ppm"
            ),
            F.expr("CAST(1000000 * cum_cnt DIV total AS BIGINT)").alias(
                "cum_share_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Classical additive seasonal decomposition (trend / seasonal / remainder)
# ---------------------------------------------------------------------------


@query(
    "seasonal_decompose_hourly",
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
    tr AS (
      SELECT hr, c,
             CAST(1000 * sum(c) OVER w // 25 AS BIGINT) AS trend_milli,
             count(*) OVER w AS n_win
      FROM filled
      WINDOW w AS (ORDER BY hr ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    detr AS (
      SELECT hr, c, hr % 24 AS hod,
             trend_milli, 1000 * c - trend_milli AS detr_milli
      FROM tr WHERE n_win = 25
    ),
    seas AS (
      SELECT hod, CAST(sum(detr_milli) // count(*) AS BIGINT) AS seasonal_milli
      FROM detr GROUP BY 1
    )
    SELECT detr.hr AS hr, CAST(detr.c AS BIGINT) AS c, detr.trend_milli,
           seas.seasonal_milli,
           CAST(detr.detr_milli - seas.seasonal_milli AS BIGINT) AS remainder_milli
    FROM detr JOIN seas ON detr.hod = seas.hod
    """,
)
def q_seasonal_decompose_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of the hourly event
    count (period 24): trend = centered 25-point moving average
    (milli-fixed-point floor), seasonal = per-hour-of-day mean of the
    detrended series, remainder = what's left. The textbook
    decompose() loop re-expressed as three window/agg passes.

    Exactness: trend and seasonal are truncating integer divisions
    (DuckDB ``//`` == Spark ``DIV``, both toward zero — detrended sums
    can be negative and still match). Hours are epoch-integer math,
    never calendar functions.

    Scale plan: the heavy step (events -> hourly counts) is one
    distributed hash agg; everything after runs on the hourly spine,
    whose length is O(time span) — independent of row count — so the
    single-partition trend window is correct at any data scale. The
    spine gap-fills with zeros via a generated sequence, so silent
    gaps cannot fake a trend.
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
    filled = (
        spine.join(hourly, "hr", "left")
        .select("hr", F.coalesce("c", F.lit(0)).alias("c"))
    )
    w = Window.orderBy("hr").rowsBetween(-12, 12)
    tr = filled.select(
        "hr",
        "c",
        (1000 * F.sum("c").over(w)).alias("sum1000"),
        F.count("*").over(w).alias("n_win"),
    )
    detr = tr.where(F.col("n_win") == 25).select(
        "hr",
        "c",
        (F.col("hr") % 24).alias("hod"),
        F.expr("CAST(sum1000 DIV 25 AS BIGINT)").alias("trend_milli"),
        (1000 * F.col("c") - F.expr("CAST(sum1000 DIV 25 AS BIGINT)")).alias(
            "detr_milli"
        ),
    )
    seas = detr.groupBy("hod").agg(
        F.expr("CAST(sum(detr_milli) DIV count(*) AS BIGINT)").alias(
            "seasonal_milli"
        )
    )
    return (
        detr.join(F.broadcast(seas), "hod")
        .select(
            "hr",
            F.col("c").cast("long").alias("c"),
            "trend_milli",
            "seasonal_milli",
            (F.col("detr_milli") - F.col("seasonal_milli"))
            .cast("long")
            .alias("remainder_milli"),
        )
    )


# ---------------------------------------------------------------------------
# Frequent 3-itemsets over order baskets
# ---------------------------------------------------------------------------


@query(
    "frequent_triples",
    """
    WITH b AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS pk FROM lineitem),
    nb AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS n_baskets FROM b),
    tri AS (
      SELECT t1.pk AS p1, t2.pk AS p2, t3.pk AS p3, count(*) AS cnt
      FROM b t1 JOIN b t2 ON t1.g = t2.g AND t1.pk < t2.pk
                JOIN b t3 ON t2.g = t3.g AND t2.pk < t3.pk
      GROUP BY 1, 2, 3
    )
    SELECT p1, p2, p3, CAST(cnt AS BIGINT) AS cnt,
           CAST(1000000 * cnt // n_baskets AS BIGINT) AS support_ppm
    FROM tri, nb
    ORDER BY cnt DESC, p1, p2, p3 LIMIT 15
    """,
)
def q_frequent_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-15 frequent 3-itemsets over order baskets (the 3-way
    extension of ``basket_pair_lift``'s pair mining), with exact ppm
    support.

    Scale plan: triples are enumerated per basket via two
    orderkey-equi self-joins with pk-ordering predicates, so the work
    is sum over baskets of C(size, 3) — bounded by basket size (<= 7
    in TPC-H-shaped data), never |parts|^3. The count agg is one
    shuffle keyed on the triple; top-15 is TakeOrderedAndProject. For
    corpora with pathological basket sizes, cap basket size upstream
    (the standard a-priori length guard) before enumeration.
    """
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("g"), F.col("l_partkey").alias("pk")
    ).distinct()
    nb = b.agg(F.count_distinct("g").cast("long").alias("n_baskets"))
    t1, t2, t3 = b.alias("t1"), b.alias("t2"), b.alias("t3")
    tri = (
        t1.join(
            t2, (F.col("t1.g") == F.col("t2.g")) & (F.col("t1.pk") < F.col("t2.pk"))
        )
        .join(
            t3, (F.col("t2.g") == F.col("t3.g")) & (F.col("t2.pk") < F.col("t3.pk"))
        )
        .groupBy(
            F.col("t1.pk").alias("p1"),
            F.col("t2.pk").alias("p2"),
            F.col("t3.pk").alias("p3"),
        )
        .agg(F.count("*").alias("cnt"))
    )
    return (
        tri.crossJoin(F.broadcast(nb))
        .select(
            "p1",
            "p2",
            "p3",
            F.col("cnt").cast("long").alias("cnt"),
            F.expr("CAST(1000000 * cnt DIV n_baskets AS BIGINT)").alias(
                "support_ppm"
            ),
        )
        .orderBy(F.desc("cnt"), "p1", "p2", "p3")
        .limit(15)
    )


# ---------------------------------------------------------------------------
# Cross-source token-distribution cosine (corpus similarity matrix)
# ---------------------------------------------------------------------------


@query(
    "source_token_cosine",
    """
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tc AS (
      SELECT source, tok, count(*) AS c FROM toks WHERE tok <> '' GROUP BY 1, 2
    ),
    norms AS (SELECT source, CAST(sum(c * c) AS BIGINT) AS nrm FROM tc GROUP BY 1),
    dots AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(sum(a.c * b.c) AS BIGINT) AS dot
      FROM tc a JOIN tc b ON a.tok = b.tok AND a.source < b.source
      GROUP BY 1, 2
    )
    SELECT src_a, src_b, dot,
           CAST(dot AS DOUBLE) / (sqrt(CAST(na.nrm AS DOUBLE))
                                  * sqrt(CAST(nb.nrm AS DOUBLE))) AS cos_sim
    FROM dots
    JOIN norms na ON na.source = dots.src_a
    JOIN norms nb ON nb.source = dots.src_b
    """,
)
def q_source_token_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus similarity matrix: cosine between the per-source token
    count vectors, for every unordered source pair — the cheap
    distribution-shift readout that tells a data-mixing pipeline which
    sources are near-duplicates of each other at the vocabulary level.

    Exactness: dot products and norms are exact BIGINT sums; the final
    cosine is a single double expression over those integers
    (cast -> sqrt -> multiply -> divide), the identical IEEE op
    sequence in both engines, so the double still hash-matches.

    Scale plan: the token-count agg is the one data-sized shuffle
    (map-side combined, keyed on (source, token)); the pair dot join
    is keyed on token, whose fan-out per token is C(#sources, 2) — a
    constant — and norms are a #sources-row broadcast. Nothing is
    ever keyed on the full document corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select(
            "source", F.explode(F.split("text", " ")).alias("tok")
        )
        .where(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count("*").alias("c"))
    )
    norms = tc.groupBy("source").agg(F.sum(F.col("c") * F.col("c")).alias("nrm"))
    a, b = tc.alias("a"), tc.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.sum(F.col("a.c") * F.col("b.c")).cast("long").alias("dot"))
    )
    na = norms.select(F.col("source").alias("src_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("source").alias("src_b"), F.col("nrm").alias("nb"))
    return (
        dots.join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .select(
            "src_a",
            "src_b",
            "dot",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                )
            ).alias("cos_sim"),
        )
    )
