"""Round-3 continuation batch: sketch-verified exact heavy hitters,
hybrid-retrieval rank fusion, deterministic integer-exact k-means,
recency-weighted activity scoring, binary-segmentation changepoints,
and entity-resolution golden records. Every declared query here is
DuckDB-hash-oracled; approximation (where any) lives in the propose
step and is verified exactly before the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from goeventstream_spark.queries import query
from goeventstream_spark.sources import load_table
from goeventstream_spark.kq_sql import KQ_CELL_CTES  # noqa: F401  (re-export)
from goeventstream_spark.kq_sql import kq_dist as _kq_dist
from goeventstream_spark.kq_sql import kq_iter as _kq_iter


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


# ---------------------------------------------------------------------------
# Hybrid retrieval: dense cosine + lexical Jaccard, RRF-fused
# ---------------------------------------------------------------------------

_COS = (
    "list_dot_product(qe, e) / "
    "(sqrt(list_dot_product(qe, qe)) * sqrt(list_dot_product(e, e)))"
)


@query(
    "hybrid_rrf_search",
    f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < 3),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    dense AS (
      SELECT query_id, vec_id AS doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY {_COS} DESC, vec_id) AS rk
      FROM q, c WHERE vec_id <> query_id
    ),
    words AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents),
    sizes AS (SELECT doc_id, count(*) AS n_doc FROM words GROUP BY doc_id),
    qw AS (SELECT doc_id AS query_id, word FROM words WHERE doc_id < 3),
    qsizes AS (SELECT query_id, count(*) AS n_query FROM qw GROUP BY query_id),
    inter AS (
      SELECT qw.query_id, w.doc_id, count(*) AS n_inter
      FROM words w JOIN qw ON w.word = qw.word AND w.doc_id <> qw.query_id
      GROUP BY qw.query_id, w.doc_id
    ),
    lex AS (
      SELECT query_id, doc_id,
             row_number() OVER (
               PARTITION BY query_id
               ORDER BY CAST(n_inter AS DOUBLE)
                        / CAST(n_doc + n_query - n_inter AS DOUBLE) DESC,
                        doc_id) AS rk
      FROM inter JOIN sizes USING (doc_id) JOIN qsizes USING (query_id)
    ),
    contrib AS (
      SELECT query_id, doc_id, 1000000000000 // (60 + rk) AS contrib
      FROM dense WHERE rk <= 20
      UNION ALL
      SELECT query_id, doc_id, 1000000000000 // (60 + rk) FROM lex WHERE rk <= 20
    ),
    fused AS (
      SELECT query_id, doc_id, CAST(sum(contrib) AS BIGINT) AS rrf_scaled
      FROM contrib GROUP BY query_id, doc_id
    )
    SELECT query_id, doc_id, rrf_scaled,
           CAST(row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_scaled DESC, doc_id) AS BIGINT)
             AS fused_rank
    FROM fused
    QUALIFY fused_rank <= 10
    """,
)
def q_hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search the way a RAG/data-curation stack runs it: a dense
    retriever (brute-force cosine top-20, the exact baseline) and a
    sparse retriever (word-set Jaccard top-20 via an inverted-index
    join, never all-pairs) each rank the corpus per query; Reciprocal
    Rank Fusion merges them using ranks only (Cormack SIGIR'09), so no
    cross-retriever score calibration is needed. Fusion arithmetic is
    scaled-integer division — hash-exact across engines. The query
    batch is broadcast on both paths; each retriever is one corpus
    scan, and the fused relation is (n_queries x 40) rows regardless
    of corpus size."""
    from goeventstream_spark.operators import retrieval

    return retrieval.hybrid_retrieval(
        _docs(spark, sf_dir),
        load_table(spark, sf_dir, "embeddings"),
        n_queries=3,
        k_per_ranking=20,
        top_k=10,
    )


# ---------------------------------------------------------------------------
# Deterministic fixed-point k-means (integer grid, floored-mean Lloyd)
# ---------------------------------------------------------------------------

@query(
    "kmeans_fixed_point",
    f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
      FROM e ORDER BY vec_id LIMIT 4
    ),{_kq_iter(1, "c0")},{_kq_iter(2, "c1")}
    SELECT a.cluster_id, CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(a.vec_id) AS BIGINT) AS sum_vec_id,
           CAST(min(c2.v[1]) AS BIGINT) AS centroid_dim0
    FROM a2 a JOIN c2 ON a.cluster_id = c2.cid
    GROUP BY a.cluster_id
    """,
)
def q_kmeans_fixed_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two Lloyd iterations of deterministic fixed-point k-means (k=4)
    over the embedding corpus — clustering as an ORACLED query, which
    float k-means can never be (float means depend on summation order).
    Vectors live on an integer grid (floor(x*1000)), assignment is
    exact integer argmin with ties to the lowest centroid id, and the
    update is the floored mean — so DuckDB replays the identical
    trajectory. Centroids are k x dims driver-held ints between
    iterations (corpus-size-independent, the IVF-codebook contract);
    each iteration is one broadcast map pass + one (k x dims)-key
    aggregation. See operators/clustering.py for the 100 TB anatomy."""
    from goeventstream_spark.operators import clustering

    return clustering.kmeans_fixed_point(
        load_table(spark, sf_dir, "embeddings"), k=4, iters=2, scale=1000
    )


# ---------------------------------------------------------------------------
# Time-series: binary-segmentation changepoints + recency-weighted activity
# ---------------------------------------------------------------------------


@query(
    "changepoint_candidates",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket, count(*) AS cnt
      FROM events GROUP BY event_type, bucket
    ),
    runs AS (
      SELECT event_type, bucket,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket
                            ROWS UNBOUNDED PRECEDING) AS s_left,
             row_number() OVER (PARTITION BY event_type ORDER BY bucket) AS i,
             sum(cnt) OVER (PARTITION BY event_type) AS s_tot,
             count(*) OVER (PARTITION BY event_type) AS n_tot
      FROM hourly
    ),
    scored AS (
      SELECT event_type, bucket AS split_after,
             CAST(abs(s_left * (n_tot - i) - (s_tot - s_left) * i) AS BIGINT)
               AS split_score,
             CAST(i AS BIGINT) AS n_left,
             CAST(n_tot - i AS BIGINT) AS n_right
      FROM runs WHERE i < n_tot
    )
    SELECT event_type, split_after, split_score, n_left, n_right,
           CAST(row_number() OVER (PARTITION BY event_type
                                   ORDER BY split_score DESC, split_after)
                AS BIGINT) AS rk
    FROM scored
    QUALIFY rk <= 3
    """,
)
def q_changepoint_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-round binary-segmentation changepoint candidates per
    event_type: rank every hourly boundary by the exact-integer
    cross-multiplied level-shift statistic |S_l*n_r - S_r*n_l|
    (= n_l*n_r*|mean_l - mean_r|, same argmax, no floats). See
    analytics.split_score_changepoints for the scale anatomy."""
    from goeventstream_spark.operators import analytics

    return analytics.split_score_changepoints(
        load_table(spark, sf_dir, "events"), top_k=3
    )


@query(
    "recency_weighted_activity",
    """
    SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(sum(1::BIGINT << CAST(extract(hour FROM ts) AS INT)) AS BIGINT)
             AS recency_score,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY event_type, day
    """,
)
def q_recency_weighted_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted daily activity: the alpha=1/2 hourly EWMA
    numerator, exact (2^hour BIGINT weights — later hours dominate;
    partial aggregates merge exactly). One map-side-combinable
    aggregation; see analytics.recency_weighted_daily_activity."""
    from goeventstream_spark.operators import analytics

    return analytics.recency_weighted_daily_activity(
        load_table(spark, sf_dir, "events")
    )


# ---------------------------------------------------------------------------
# Entity resolution: fuzzy pairs -> connected components -> golden records
# ---------------------------------------------------------------------------


def er_part_fuzzy_pairs(part: DataFrame) -> DataFrame:
    """Fuzzy match edges for part entity resolution: exact
    Levenshtein <= 3 self-join via q-gram prefix filtering over
    DISTINCT names (`dedup.edit_distance_qgram_join`), with the
    query's own ``p_size`` equality as the exact-match block column,
    expanded as SPANNING edges (member->group-representative stars +
    one edge per matched name pair) — the same connected components as
    the full pair list with O(rows + matched names) edges instead of
    sum-of-group-size-products (the full expansion is ~251k pairs at
    sf0.1 because duplicate names form large ed=0 cliques; the
    clustering consumer only needs connectivity).

    Candidate volume scales with q-gram posting-list collisions among
    DISTINCT names — data-dependent quantities that grow ~linearly
    with the corpus — never with block-size² (the round-4 compound
    (p_size, length bucket) block had data-INdependent cardinality, so
    100× corpus meant 10⁴× pairs per block). Recall is exactly 1 by
    the Gravano VLDB'01 count bound + prefix-filter theorem (proof in
    the operator docstring); precision is exactly 1 via the builtin
    bounded levenshtein verify; all-pairs-vs-naive-theta equality and
    the short-string stratum are pinned in tests/test_operators.py.
    Split out of q_er_golden_parts so tests can pin the prefix join's
    equi-keys (the clustering step checkpoints pairs, hiding this
    join from the final plan)."""
    from goeventstream_spark.operators import dedup

    return dedup.edit_distance_qgram_join(
        part,
        id_col="p_partkey",
        text_col="p_name",
        max_dist=3,
        q=3,
        block_cols=("p_size",),
        expand="spanning",
    ).select(F.col("id_a").alias("part_a"), F.col("id_b").alias("part_b"))


@query(
    "er_golden_parts",
    """
    WITH RECURSIVE pairs AS (
      SELECT a.p_partkey AS part_a, b.p_partkey AS part_b
      FROM part a JOIN part b
        ON a.p_size = b.p_size AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 3
    ),
    cedges AS (
      SELECT part_a AS src, part_b AS dst FROM pairs
      UNION SELECT part_b AS src, part_a AS dst FROM pairs
    ),
    reach AS (
      SELECT src AS id, src AS lbl FROM cedges
      UNION
      SELECT e.dst AS id, r.lbl FROM reach r JOIN cedges e ON e.src = r.id
    ),
    comp AS (SELECT id, min(lbl) AS cluster_id FROM reach GROUP BY id),
    assigned AS (
      SELECT p.p_partkey, coalesce(c.cluster_id, p.p_partkey) AS cluster_id
      FROM part p LEFT JOIN comp c ON p.p_partkey = c.id
    )
    SELECT a.cluster_id AS golden_partkey,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(min(p.p_retailprice) AS DOUBLE) AS best_price,
           min(CASE WHEN p.p_partkey = a.cluster_id THEN p.p_name END)
             AS canonical_name,
           CAST(count(DISTINCT p.p_brand) AS BIGINT) AS n_brands
    FROM assigned a JOIN part p USING (p_partkey)
    GROUP BY a.cluster_id
    """,
)
def q_er_golden_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution end-to-end: fuzzy candidate pairs (exact
    Levenshtein <= 3 via q-gram prefix filtering, p_size as the exact
    block key, spanning-edge expansion), transitive closure via
    min-label propagation (spanning edges keep components identical
    while shrinking the edge list ~10× — stars have diameter 2, and
    the name-level match graph is tiny, so propagation still
    converges in 2-3 rounds; star contraction remains the tool only
    for adversarially long chains), then survivorship into one golden
    record per entity: canonical id/name from the minimum-id member,
    merged best price, and a brand-conflict count.

    Candidate recall is EXACT with data-scalable volume: similarity
    work runs on DISTINCT (name, size) groups, and the q-gram prefix
    filter (Gravano et al. VLDB'01 count bound; proof in
    `dedup.edit_distance_qgram_join`) generates candidates from
    rare-first gram posting lists, so pair counts track distinct-value
    gram collisions (~linear in the corpus) instead of any fixed
    block's n². The prefix join's equi-keys (gram + p_size) are pinned
    in tests/test_plans.py; all-pairs equality vs the naive theta join
    is property-pinned in tests/test_operators.py.
    Survivorship is one aggregation over (entity, member) rows.
    Measured negative result: a char-histogram count-filter
    (L1/2 <= lev lower bound) prepended to the bounded levenshtein ran
    3x SLOWER at sf0.1 — the zip_with/aggregate HOF evaluates
    interpreted per pair while the builtin bounded levenshtein stays
    codegen'd — so the simpler predicate IS the fast one here."""
    from goeventstream_spark.operators import dedup

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_size", "p_brand", "p_retailprice"
    )
    pairs = er_part_fuzzy_pairs(part)
    clusters = dedup.dedup_clusters(
        pairs,
        all_docs=part.select("p_partkey"),
        src_col="part_a",
        dst_col="part_b",
        id_col="p_partkey",
    )
    return (
        clusters.join(part, "p_partkey")
        .groupBy(F.col("cluster_id").alias("golden_partkey"))
        .agg(
            F.count("*").cast("long").alias("n_members"),
            F.min("p_retailprice").cast("double").alias("best_price"),
            F.min(
                F.when(
                    F.col("p_partkey") == F.col("cluster_id"), F.col("p_name")
                )
            ).alias("canonical_name"),
            F.countDistinct("p_brand").cast("long").alias("n_brands"),
        )
    )


# ---------------------------------------------------------------------------
# MMR diversified retrieval (greedy, unrolled in the oracle)
# ---------------------------------------------------------------------------

_COS_AB = (
    "list_dot_product(ae, be) / "
    "(sqrt(list_dot_product(ae, ae)) * sqrt(list_dot_product(be, be)))"
)


def _mmr_step(i: int) -> str:
    """Greedy MMR step i (i >= 2): among not-yet-selected pool members,
    pick argmax(rel - max sim to selected), ties to lowest doc_id."""
    return f"""
    m{i} AS (
      SELECT c.query_id, c.doc_id, c.rel, max(y.sim) AS maxsim
      FROM cand c
      JOIN sel{i - 1} s ON s.query_id = c.query_id
      JOIN ssym y ON y.query_id = c.query_id
                 AND y.doc_a = c.doc_id AND y.doc_b = s.doc_id
      LEFT JOIN sel{i - 1} x ON x.query_id = c.query_id AND x.doc_id = c.doc_id
      WHERE x.doc_id IS NULL
      GROUP BY c.query_id, c.doc_id, c.rel
    ),
    s{i} AS (
      SELECT query_id, doc_id, rel, {i} AS pick_order FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rel - maxsim DESC, doc_id) AS rk
        FROM m{i}
      ) WHERE rk = 1
    ),
    sel{i} AS (
      SELECT query_id, doc_id FROM sel{i - 1}
      UNION ALL SELECT query_id, doc_id FROM s{i}
    )"""


_MMR_STEPS = ",".join(_mmr_step(i) for i in range(2, 6))
_MMR_UNION = " UNION ALL ".join(
    f"SELECT query_id, doc_id, pick_order, rel FROM s{i}" for i in range(1, 6)
)


@query(
    "mmr_diversified_topk",
    f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < 3),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    cand AS (
      SELECT query_id, doc_id, rel FROM (
        SELECT query_id, vec_id AS doc_id,
               CAST(floor(({_COS}) * 1000000000) AS BIGINT) AS rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY {_COS} DESC, vec_id) AS rk
        FROM q, c WHERE vec_id <> query_id
      ) WHERE rk <= 20
    ),
    sims AS (
      SELECT p.query_id, p.da AS doc_a, p.db AS doc_b,
             CAST(floor(({_COS_AB}) * 1000000000) AS BIGINT) AS sim
      FROM (SELECT c1.query_id, c1.doc_id AS da, c2.doc_id AS db
            FROM cand c1 JOIN cand c2
              ON c1.query_id = c2.query_id AND c1.doc_id < c2.doc_id) p
      JOIN (SELECT vec_id, e AS ae FROM c) a ON a.vec_id = p.da
      JOIN (SELECT vec_id, e AS be FROM c) b ON b.vec_id = p.db
    ),
    ssym AS (
      SELECT query_id, doc_a, doc_b, sim FROM sims
      UNION ALL SELECT query_id, doc_b, doc_a, sim FROM sims
    ),
    s1 AS (
      SELECT query_id, doc_id, rel, 1 AS pick_order FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY rel DESC, doc_id) AS rk
        FROM cand
      ) WHERE rk = 1
    ),
    sel1 AS (SELECT query_id, doc_id FROM s1),{_MMR_STEPS}
    SELECT query_id, doc_id, CAST(pick_order AS BIGINT) AS pick_order, rel
    FROM ({_MMR_UNION})
    """,
)
def q_mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified top-5 per query by greedy Maximal Marginal Relevance
    (lambda = 1/2) over the top-20 cosine pool: each pick maximizes
    relevance minus max-similarity-to-already-picked, so near-duplicate
    results are suppressed — the standard de-redundancy step after
    retrieval. Relevance and pairwise similarities cross the float->int
    boundary ONCE (floor(cos * 1e9)), making the greedy trajectory
    engine-exact; the oracle unrolls the same five picks in SQL. Pool
    size is constant, so selection work per query is corpus-size-
    independent (cogrouped applyInPandas over <= 20 rows per query)."""
    from goeventstream_spark.operators import retrieval

    return retrieval.mmr_select(
        load_table(spark, sf_dir, "embeddings"), n_queries=3, pool_k=20, top_k=5
    )


# ---------------------------------------------------------------------------
# Survival analysis, trend regression, correlation, Benford DQ audit
# ---------------------------------------------------------------------------


@query(
    "survival_table",
    """
    WITH last_day AS (
      SELECT user_id, CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS churn_day
      FROM events GROUP BY user_id
    ),
    per_day AS (
      SELECT churn_day, CAST(count(*) AS BIGINT) AS n_churned
      FROM last_day GROUP BY churn_day
    )
    SELECT churn_day, n_churned,
           CAST(sum(n_churned) OVER (ORDER BY churn_day DESC
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS n_at_risk
    FROM per_day
    """,
)
def q_survival_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier risk table over user lifetimes: per churn day, how
    many users churned and how many were still at risk. Emits the exact
    integer (d_i, n_i) table rather than the float survival product —
    see analytics.survival_table (the suffix-sum window runs over the
    bounded distinct-days relation, never raw events)."""
    from goeventstream_spark.operators import analytics

    return analytics.survival_table(load_table(spark, sf_dir, "events"))


@query(
    "trend_slopes_by_type",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket, count(*) AS y
      FROM events GROUP BY event_type, bucket
    ),
    xy AS (
      SELECT event_type, y,
             row_number() OVER (PARTITION BY event_type ORDER BY bucket) - 1
               AS x
      FROM hourly
    ),
    sums AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM xy GROUP BY event_type
    )
    SELECT event_type, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0) AS slope_per_hour,
           (CAST(sy AS DOUBLE)
            - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / nullif(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE), 0))
              * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
    FROM sums
    """,
)
def q_trend_slopes_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type hourly volume trend: least-squares slope/intercept from
    EXACT BIGINT sums; only the final two products and divisions run in
    DOUBLE, on identical integers — bit-equal on any IEEE engine. See
    analytics.trend_slopes."""
    from goeventstream_spark.operators import analytics

    return analytics.trend_slopes(load_table(spark, sf_dir, "events"))


@query(
    "pearson_qty_price",
    """
    WITH xy AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) // 100 AS y
      FROM lineitem
    ),
    sums AS (
      SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM xy GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / nullif(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0)
             AS pearson_r
    FROM sums
    """,
)
def q_pearson_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs price per return flag,
    computed from exact integer sums (quantity is integer-valued;
    price is floored to whole dollars from exact cents so sum(y*y)
    stays far inside BIGINT at every SF). Built-in corr() aggregates
    use engine-specific Welford orders and can NOT hash-match; this
    form does, because the float boundary is two products, two sqrts
    and one division over identical integers."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("long")
    y = F.floor(F.round(F.col("l_extendedprice") * 100, 0).cast("long") / 100).cast(
        "long"
    )
    sums = (
        li.select(F.col("l_returnflag"), x.alias("x"), y.alias("y"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        )
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col(
        "sy"
    ).cast("double")
    dx = F.sqrt(nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
    dy = F.sqrt(nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double"))
    return sums.select(
        "l_returnflag",
        "n",
        (num / F.nullif(dx * dy, F.lit(0.0))).alias("pearson_r"),
    )


# Benford expected first-digit shares in ppm: floor(1e6*log10(1+1/d)),
# precomputed so both engines compare against identical constants.
_BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}
_BENFORD_CASE = "CASE digit " + " ".join(
    f"WHEN '{d}' THEN {p}" for d, p in _BENFORD_PPM.items()
) + " END"


@query(
    "benford_price_audit",
    f"""
    WITH d AS (
      SELECT substr(CAST(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                    AS VARCHAR), 1, 1) AS digit
      FROM lineitem
    ),
    c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM c)
    SELECT c.digit, c.n, t.n_total,
           CAST(c.n * 1000000 // t.n_total AS BIGINT) AS observed_ppm,
           CAST({_BENFORD_CASE} AS BIGINT) AS expected_ppm
    FROM c, t
    """,
)
def q_benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law data-quality audit on prices: observed vs expected
    first-significant-digit distribution (fabricated or unit-mangled
    numeric columns show up as large ppm gaps). The digit comes from
    the exact-cents integer's leading character (x100 shifts no leading
    digit), observed shares are integer-ppm (floor division), and the
    expected shares are precomputed constants — all hash-exact. One
    map-side digit projection + a 9-key aggregation."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    counts = (
        li.select(F.substring(cents.cast("string"), 1, 1).alias("digit"))
        .groupBy("digit")
        .agg(F.count("*").cast("long").alias("n"))
    )
    total = counts.agg(F.sum("n").cast("long").alias("n_total"))
    expected = F.coalesce(
        *[
            F.when(F.col("digit") == str(d), F.lit(p))
            for d, p in _BENFORD_PPM.items()
        ]
    ).cast("long")
    return counts.crossJoin(F.broadcast(total)).select(
        "digit",
        "n",
        "n_total",
        F.expr("div(n * 1000000, n_total)").alias("observed_ppm"),
        expected.alias("expected_ppm"),
    )


# ---------------------------------------------------------------------------
# Concentration (Gini), experimentation (chi-square), weighted median
# ---------------------------------------------------------------------------


@query(
    "gini_by_segment",
    """
    WITH rev AS (
      SELECT c.c_mktsegment, c.c_custkey,
             coalesce(CAST(sum(round(o.o_totalprice * 100, 0)) AS BIGINT), 0)
               AS cents
      FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_mktsegment, c.c_custkey
    ),
    ranked AS (
      SELECT c_mktsegment, cents,
             row_number() OVER (PARTITION BY c_mktsegment
                                ORDER BY cents, c_custkey) AS i
      FROM rev
    ),
    sums AS (
      SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS sx,
             CAST(sum(i * cents) AS BIGINT) AS six
      FROM ranked GROUP BY c_mktsegment
    )
    SELECT c_mktsegment, n, sx AS total_cents,
           CAST(floor(1000000.0
                      * (2.0 * CAST(six AS DOUBLE)
                         - (CAST(n AS DOUBLE) + 1.0) * CAST(sx AS DOUBLE))
                      / nullif(CAST(n AS DOUBLE) * CAST(sx AS DOUBLE), 0)) AS BIGINT)
             AS gini_ppm
    FROM sums
    """,
)
def q_gini_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration Gini coefficient per market segment (the
    Lorenz-rank form G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)),
    x ascending): zero-revenue customers included, rank sums exact
    BIGINT, the single float division floor-scaled to ppm — identical
    doubles from identical integers on any engine. One join-aggregate
    on custkey, one per-segment window, one per-segment fold."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    rev = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_mktsegment", "c_custkey")
        .agg(
            F.coalesce(
                F.sum(F.round(F.col("o_totalprice") * 100, 0)).cast("long"),
                F.lit(0).cast("long"),
            ).alias("cents")
        )
    )
    # Rank-sum over distinct VALUES, not individuals: for a block of m
    # customers tied at value x occupying ranks prev+1..prev+m,
    # sum(i * x) over the block is x * (m*prev + m*(m+1)/2) — tie order
    # never matters in the Gini rank sum. The running-count window
    # therefore scans the (segment, cents) relation (bounded by the
    # value domain), never raw customers; the oracle states the plain
    # per-individual row_number() definition and the hashes must agree.
    blocks = rev.groupBy("c_mktsegment", "cents").agg(
        F.count("*").cast("long").alias("m")
    )
    run = (
        Window.partitionBy("c_mktsegment")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    contrib = F.col("cents") * (
        F.col("m") * (F.col("cum_m") - F.col("m"))
        + F.expr("div(m * (m + 1), 2)")
    )
    sums = (
        blocks.withColumn("cum_m", F.sum("m").over(run))
        .select(
            "c_mktsegment",
            F.col("m").alias("n_part"),
            (F.col("m") * F.col("cents")).alias("sx_part"),
            contrib.alias("six_part"),
        )
        .groupBy("c_mktsegment")
        .agg(
            F.sum("n_part").cast("long").alias("n"),
            F.sum("sx_part").cast("long").alias("sx"),
            F.sum("six_part").cast("long").alias("six"),
        )
    )
    nd = F.col("n").cast("double")
    gini = (
        F.lit(1000000.0)
        * (F.lit(2.0) * F.col("six").cast("double") - (nd + F.lit(1.0)) * F.col("sx").cast("double"))
        / F.nullif(nd * F.col("sx").cast("double"), F.lit(0.0))
    )
    return sums.select(
        "c_mktsegment",
        "n",
        F.col("sx").alias("total_cents"),
        F.floor(gini).cast("long").alias("gini_ppm"),
    )


@query(
    "ab_test_chi_square",
    """
    WITH assign AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS variant,
             max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY user_id, date_trunc('day', ts)
    ),
    cells AS (
      SELECT CAST(sum(CASE WHEN variant = 0 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(sum(CASE WHEN variant = 0 AND converted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(sum(CASE WHEN variant = 1 AND converted = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(sum(CASE WHEN variant = 1 AND converted = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM assign
    )
    SELECT a, b, c, d,
           (CAST(a + b + c + d AS DOUBLE)
            * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
               - CAST(b AS DOUBLE) * CAST(c AS DOUBLE))
            * (CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
               - CAST(b AS DOUBLE) * CAST(c AS DOUBLE)))
           / nullif(CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
                    * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE), 0)
             AS chi_square
    FROM cells
    """,
)
def q_ab_test_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experimentation readout: deterministic hash assignment
    (user_id % 2), per-user conversion (any 'purchase'), and the 2x2
    chi-square statistic over (user, day) exposure units in its
    closed product form
    N*(ad-bc)^2 / ((a+b)(c+d)(a+c)(b+d)) — exact integer cells, one
    fixed-shape float expression. One per-user aggregation + a 1-row
    fold; nothing scales with events beyond the first shuffle."""
    ev = load_table(spark, sf_dir, "events")
    # experiment unit = (user, day): lifetime "ever purchased" is
    # degenerate on the fixtures (every user converts; b = d = 0)
    assign = ev.groupBy("user_id", F.date_trunc("day", "ts")).agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    ).select((F.col("user_id") % 2).cast("long").alias("variant"), "converted")
    cells = assign.agg(
        F.sum(F.when((F.col("variant") == 0) & (F.col("converted") == 1), 1).otherwise(0)).cast("long").alias("a"),
        F.sum(F.when((F.col("variant") == 0) & (F.col("converted") == 0), 1).otherwise(0)).cast("long").alias("b"),
        F.sum(F.when((F.col("variant") == 1) & (F.col("converted") == 1), 1).otherwise(0)).cast("long").alias("c"),
        F.sum(F.when((F.col("variant") == 1) & (F.col("converted") == 0), 1).otherwise(0)).cast("long").alias("d"),
    )
    ad_bc = F.col("a").cast("double") * F.col("d").cast("double") - F.col("b").cast(
        "double"
    ) * F.col("c").cast("double")
    n = (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast("double")
    den = (
        (F.col("a") + F.col("b")).cast("double")
        * (F.col("c") + F.col("d")).cast("double")
        * (F.col("a") + F.col("c")).cast("double")
        * (F.col("b") + F.col("d")).cast("double")
    )
    return cells.select(
        "a",
        "b",
        "c",
        "d",
        (n * ad_bc * ad_bc / F.nullif(den, F.lit(0.0))).alias("chi_square"),
    )


@query(
    "weighted_median_price",
    """
    WITH w AS (
      SELECT l_returnflag,
             CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wt
      FROM lineitem GROUP BY l_returnflag, cents
    ),
    c AS (
      SELECT l_returnflag, cents, wt,
             sum(wt) OVER (PARTITION BY l_returnflag ORDER BY cents
                           ROWS UNBOUNDED PRECEDING) AS cum_wt,
             sum(wt) OVER (PARTITION BY l_returnflag) AS tot_wt
      FROM w
    )
    SELECT l_returnflag,
           CAST(min(cents) AS BIGINT) AS median_cents,
           CAST(min(tot_wt) AS BIGINT) AS total_weight
    FROM c WHERE 2 * cum_wt >= tot_wt
    GROUP BY l_returnflag
    """,
)
def q_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median price per return flag: the first
    value (price-ordered) whose running weight reaches half the total
    — all integer arithmetic. The per-value weights collapse in one
    map-side-combinable aggregation FIRST, so the running-sum window
    scans the distinct-cents relation (bounded by the value domain),
    never raw rows. The unweighted `percentile` builtin cannot express
    this."""
    li = load_table(spark, sf_dir, "lineitem")
    # Collapse to (flag, cents) BEFORE the window: the running sum then
    # scans distinct VALUES per flag (bounded by the cents domain), not
    # raw rows — the form that survives a billions-row flag partition.
    # Collapsing groups of equal cents cannot move the crossing value:
    # the first row-level crossing happens inside some cents group, and
    # min(cents) over crossings picks that same group either way.
    w = li.groupBy(
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    ).agg(F.sum(F.col("l_quantity").cast("long")).cast("long").alias("wt"))
    run = (
        Window.partitionBy("l_returnflag")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot = Window.partitionBy("l_returnflag")
    c = w.select(
        "l_returnflag",
        "cents",
        F.sum("wt").over(run).alias("cum_wt"),
        F.sum("wt").over(tot).alias("tot_wt"),
    )
    return (
        c.where(2 * F.col("cum_wt") >= F.col("tot_wt"))
        .groupBy("l_returnflag")
        .agg(
            F.min("cents").cast("long").alias("median_cents"),
            F.min("tot_wt").cast("long").alias("total_weight"),
        )
    )


@query(
    "autocorr_lag1_by_type",
    """
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket, count(*) AS y
      FROM events GROUP BY event_type, bucket
    ),
    pairs AS (
      SELECT event_type, y,
             lead(y) OVER (PARTITION BY event_type ORDER BY bucket) AS y1
      FROM hourly
    ),
    sums AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(y) AS BIGINT) AS sx, CAST(sum(y1) AS BIGINT) AS sy,
             CAST(sum(y * y1) AS BIGINT) AS sxy,
             CAST(sum(y * y) AS BIGINT) AS sxx,
             CAST(sum(y1 * y1) AS BIGINT) AS syy
      FROM pairs WHERE y1 IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / nullif(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)), 0)
             AS autocorr_lag1
    FROM sums
    """,
)
def q_autocorr_lag1_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of hourly volume per type — the
    burstiness/persistence signal monitoring pipelines alarm on —
    via the same exact-integer-sums Pearson form as pearson_qty_price
    (consecutive pairs from one lead() window per key)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.col("event_type"), F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.count("*").alias("y"))
    y1 = F.lead("y").over(Window.partitionBy("event_type").orderBy("bucket"))
    pairs = hourly.select("event_type", "y", y1.alias("y1")).where(
        F.col("y1").isNotNull()
    )
    sums = pairs.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("y").cast("long").alias("sx"),
        F.sum("y1").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y1")).cast("long").alias("sxy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("sxx"),
        F.sum(F.col("y1") * F.col("y1")).cast("long").alias("syy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy").cast("double")
    dx = F.sqrt(nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
    dy = F.sqrt(nd * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy").cast("double"))
    return sums.select(
        "event_type",
        "n",
        (num / F.nullif(dx * dy, F.lit(0.0))).alias("autocorr_lag1"),
    )


# ---------------------------------------------------------------------------
# Winnowing fingerprints (MOSS) — position-aware near-dup evidence
# ---------------------------------------------------------------------------


@query(
    "winnowing_digests",
    """
    WITH words AS (
      SELECT doc_id, word,
             row_number() OVER (PARTITION BY doc_id ORDER BY raw_pos) - 1
               AS pos
      FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS raw_pos
        FROM documents
      ) WHERE word <> ''
    ),
    sh AS (
      SELECT doc_id, pos,
             CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h
      FROM (
        SELECT doc_id, pos,
               concat_ws(' ', word,
                         lead(word, 1) OVER win, lead(word, 2) OVER win)
                 AS shingle,
               lead(word, 2) OVER win AS _tail
        FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      ) WHERE _tail IS NOT NULL
    ),
    starts AS (
      SELECT s.doc_id, s.pos AS wstart
      FROM sh s JOIN (SELECT doc_id, max(pos) AS mx FROM sh GROUP BY doc_id) m
        ON s.doc_id = m.doc_id
      WHERE s.pos + 3 <= m.mx
    ),
    pick AS (
      SELECT doc_id, pos, h FROM (
        SELECT st.doc_id, st.wstart, sh.pos, sh.h,
               row_number() OVER (PARTITION BY st.doc_id, st.wstart
                                  ORDER BY sh.h, sh.pos DESC) AS rk
        FROM starts st JOIN sh
          ON sh.doc_id = st.doc_id
         AND sh.pos BETWEEN st.wstart AND st.wstart + 3
      ) WHERE rk = 1
    ),
    sel AS (SELECT DISTINCT doc_id, pos, h FROM pick)
    SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fingerprints,
           CAST(sum(h % 1000003) AS BIGINT) AS fp_digest,
           CAST(min(h) AS BIGINT) AS min_fp, CAST(max(h) AS BIGINT) AS max_fp
    FROM sel GROUP BY doc_id
    """,
)
def q_winnowing_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document winnowing fingerprint digest (count + exact modular
    digest + extremes of the selected 60-bit hashes): the MOSS
    selection keeps ~2/(w+1) of shingle hashes while guaranteeing any
    shared run of >= w+k-1 words leaves a common fingerprint — the
    position-aware middle ground between exact-dup md5 and full
    shingle Jaccard. See dedup.winnowing_fingerprints (k=3, w=4)."""
    from goeventstream_spark.operators import dedup

    fps = dedup.winnowing_fingerprints(_docs(spark, sf_dir), k=3, w=4)
    return fps.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_fingerprints"),
        F.sum(F.col("h") % 1000003).cast("long").alias("fp_digest"),
        F.min("h").cast("long").alias("min_fp"),
        F.max("h").cast("long").alias("max_fp"),
    )


_WINNOW_SEL = """
    words AS (
      SELECT doc_id, word,
             row_number() OVER (PARTITION BY doc_id ORDER BY raw_pos) - 1
               AS pos
      FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS raw_pos
        FROM documents
      ) WHERE word <> ''
    ),
    sh AS (
      SELECT doc_id, pos,
             CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS h
      FROM (
        SELECT doc_id, pos,
               concat_ws(' ', word,
                         lead(word, 1) OVER win, lead(word, 2) OVER win)
                 AS shingle,
               lead(word, 2) OVER win AS _tail
        FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      ) WHERE _tail IS NOT NULL
    ),
    starts AS (
      SELECT s.doc_id, s.pos AS wstart
      FROM sh s JOIN (SELECT doc_id, max(pos) AS mx FROM sh GROUP BY doc_id) m
        ON s.doc_id = m.doc_id
      WHERE s.pos + 3 <= m.mx
    ),
    pick AS (
      SELECT doc_id, pos, h FROM (
        SELECT st.doc_id, st.wstart, sh.pos, sh.h,
               row_number() OVER (PARTITION BY st.doc_id, st.wstart
                                  ORDER BY sh.h, sh.pos DESC) AS rk
        FROM starts st JOIN sh
          ON sh.doc_id = st.doc_id
         AND sh.pos BETWEEN st.wstart AND st.wstart + 3
      ) WHERE rk = 1
    ),
    sel AS (SELECT DISTINCT doc_id, pos, h FROM pick)
"""


@query(
    "winnowing_candidate_pairs",
    f"""
    WITH {_WINNOW_SEL},
    fp AS (SELECT DISTINCT doc_id, h FROM sel)
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING count(*) >= 2
    """,
)
def q_winnowing_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidates from shared winnowing fingerprints (>= 2
    common selected hashes): the MOSS matching step — an inverted-index
    self-join on the ~2/(w+1)-sampled fingerprint table, so the pair
    generation cost is a fraction of the full-shingle index while still
    guaranteed to catch any w+k-1-word shared run (twice, for the >= 2
    filter, i.e. runs of ~2(w+k-1) or two separate shared runs)."""
    from goeventstream_spark.operators import dedup

    # materialized once: both self-join sides consume fps (round-9 opt
    # — the window-heavy fingerprint build ran twice per execution)
    fps = (
        dedup.winnowing_fingerprints(_docs(spark, sf_dir), k=3, w=4)
        .select("doc_id", "h")
        .distinct()
        .localCheckpoint(eager=False)
    )
    a, b = fps.alias("a"), fps.alias("b")
    return (
        a.join(b, (F.col("a.h") == F.col("b.h")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= 2)
    )


@query(
    "ivf_fixed_topk",
    f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
      FROM e ORDER BY vec_id LIMIT 4
    ),{_kq_iter(1, "c0")},{_kq_iter(2, "c1")},
    a3 AS (
      SELECT vec_id, v, cid AS cluster_id FROM (
        SELECT e.vec_id, e.v, c2.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_kq_dist("e.v", "c2.v")},
                                           c2.cid) AS rk
        FROM e, c2
      ) WHERE rk = 1
    ),
    probes AS (
      SELECT query_id, cid AS cluster_id FROM (
        SELECT e.vec_id AS query_id, c2.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_kq_dist("e.v", "c2.v")},
                                           c2.cid) AS rk
        FROM e, c2 WHERE e.vec_id < 3
      ) WHERE rk <= 2
    ),
    cand AS (
      SELECT p.query_id, a.vec_id,
             CAST({_kq_dist("q.v", "a.v")} AS BIGINT) AS dist
      FROM probes p
      JOIN a3 a ON a.cluster_id = p.cluster_id
      JOIN e q ON q.vec_id = p.query_id
      WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, vec_id, dist, rk FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY dist, vec_id) AS BIGINT) AS rk
      FROM cand
    ) WHERE rk <= 5
    """,
)
def q_ivf_fixed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN search with a FULLY hash-oracled trajectory: coarse
    codebook = deterministic fixed-point k-means (k=4, 2 iterations),
    corpus indexed to the final centroids in one literal-broadcast map
    pass, 2-of-4 cell probing, exact integer distance ranking. The
    sampled float-KMeans variant (`ivf_topk`) remains the production
    scale path and stays rows-only by design; THIS query proves the
    whole IVF mechanism — train, index, probe, rank — end-to-end
    against SQL. See clustering.ivf_fixed_search."""
    from goeventstream_spark.operators import clustering

    return clustering.ivf_fixed_search(
        load_table(spark, sf_dir, "embeddings"),
        k=4,
        iters=2,
        probes=2,
        n_queries=3,
        top_k=5,
    )


def _kq_iter_s(i: int, prev_c: str, sfx: str, src: str) -> str:
    """Suffix-parameterized Lloyd iteration (per-subspace variant of
    _kq_iter): assign from ``src`` vs ``prev_c``, floored-mean update."""
    return f"""
    a{i}{sfx} AS (
      SELECT vec_id, v, cid AS cluster_id FROM (
        SELECT {src}.vec_id, {src}.v, {prev_c}.cid,
               row_number() OVER (PARTITION BY {src}.vec_id
                                  ORDER BY {_kq_dist(f"{src}.v", f"{prev_c}.v")},
                                           {prev_c}.cid) AS rk
        FROM {src}, {prev_c}
      ) WHERE rk = 1
    ),
    s{i}{sfx} AS (
      SELECT cluster_id, dim, sum(val) AS s, count(*) AS n
      FROM (SELECT cluster_id, generate_subscripts(v, 1) AS dim,
                   unnest(v) AS val FROM a{i}{sfx})
      GROUP BY cluster_id, dim
    ),
    c{i}{sfx} AS (
      SELECT {prev_c}.cid, coalesce(m.mv, {prev_c}.v) AS v
      FROM {prev_c} LEFT JOIN (
        SELECT cluster_id AS cid,
               list(CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
                    ORDER BY dim) AS mv
        FROM s{i}{sfx} GROUP BY cluster_id
      ) m USING (cid)
    )"""


def _pq_sql(n_sub: int = 4, sub_dims: int = 16, n_queries: int = 3, top_k: int = 5) -> str:
    parts = ["""
    WITH e AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1000) AS BIGINT)) AS v
      FROM embeddings
    )"""]
    for s in range(n_sub):
        lo, hi = s * sub_dims + 1, (s + 1) * sub_dims
        parts.append(
            f""",
    e{s} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM e),
    c0s{s} AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
      FROM e{s} ORDER BY vec_id LIMIT 4
    ),{_kq_iter_s(1, f"c0s{s}", f"s{s}", f"e{s}")},
    code{s} AS (
      SELECT vec_id, cid FROM (
        SELECT e{s}.vec_id, c1s{s}.cid,
               row_number() OVER (PARTITION BY e{s}.vec_id
                                  ORDER BY {_kq_dist(f"e{s}.v", f"c1s{s}.v")},
                                           c1s{s}.cid) AS rk
        FROM e{s}, c1s{s}
      ) WHERE rk = 1
    )"""
        )
    adc_terms = " + ".join(
        f"({_kq_dist(f'q{s}.v', f'k{s}.v')})" for s in range(n_sub)
    )
    qjoins = "\n      ".join(
        f"JOIN e{s} q{s} ON q{s}.vec_id = q.query_id" for s in range(n_sub)
    )
    kjoins = "\n      ".join(
        f"JOIN c1s{s} k{s} ON k{s}.cid = x{s}.cid" for s in range(n_sub)
    )
    xjoins = "\n      ".join(
        f"JOIN code{s} x{s} ON x{s}.vec_id = x.vec_id" for s in range(n_sub)
    )
    parts.append(
        f""",
    q AS (SELECT vec_id AS query_id FROM e WHERE vec_id < {n_queries}),
    adc AS (
      SELECT q.query_id, x.vec_id,
             CAST({adc_terms} AS BIGINT) AS adc_dist
      FROM e x
      CROSS JOIN q
      {xjoins}
      {qjoins}
      {kjoins}
      WHERE x.vec_id <> q.query_id
    )
    SELECT query_id, vec_id, adc_dist, rk FROM (
      SELECT *, CAST(row_number() OVER (PARTITION BY query_id
                                        ORDER BY adc_dist, vec_id) AS BIGINT)
                  AS rk
      FROM adc
    ) WHERE rk <= {top_k}"""
    )
    return "".join(parts)


@query("pq_fixed_adc_topk", _pq_sql())
def q_pq_fixed_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization fully hash-oracled end-to-end: 4 subspace
    codebooks trained by fixed-point k-means (1 Lloyd iteration each),
    map-side encoding to per-subspace centroid ids, and ADC search
    (query-to-reconstructed-centroid exact integer distances, summed)
    over broadcast queries. The sampled float-codebook PQ
    (`pq_codes`/`pq_adc_topk`) remains the production scale path and
    stays rows-only by design; this query proves the whole PQ
    mechanism against SQL. See clustering.pq_fixed_adc_topk."""
    from goeventstream_spark.operators import clustering

    return clustering.pq_fixed_adc_topk(
        load_table(spark, sf_dir, "embeddings"),
        n_sub=4,
        k=4,
        iters=1,
        n_queries=3,
        top_k=5,
    )


@query(
    "dsir_importance_scores",
    """
    WITH wb AS (
      SELECT doc_id,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_target,
             CAST(('0x' || substr(md5(word), 1, 4)) AS BIGINT) % 64 AS bucket
      FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS word
            FROM documents)
    ),
    dist AS (
      SELECT bucket, CAST(sum(is_target) AS BIGINT) AS tc,
             CAST(count(*) AS BIGINT) AS rc
      FROM wb GROUP BY bucket
    ),
    totals AS (
      SELECT CAST(sum(tc) AS BIGINT) AS t_total,
             CAST(sum(rc) AS BIGINT) AS r_total
      FROM dist
    ),
    scores AS (
      SELECT s.bucket,
             (1000000 * (coalesce(d.tc, 0) + 1) * (t.r_total + 64))
               // ((coalesce(d.rc, 0) + 1) * (t.t_total + 64)) AS bucket_score
      FROM (SELECT CAST(range AS INT) AS bucket FROM range(0, 64)) s
      LEFT JOIN dist d ON d.bucket = s.bucket
      CROSS JOIN totals t
    ),
    per_doc AS (
      SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS cnt
      FROM wb GROUP BY doc_id, bucket
    )
    SELECT p.doc_id, CAST(sum(p.cnt) AS BIGINT) AS n_tokens,
           CAST(sum(p.cnt * s.bucket_score) AS BIGINT) AS dsir_score
    FROM per_doc p JOIN scores s ON p.bucket = s.bucket
    GROUP BY p.doc_id
    """,
)
def q_dsir_importance_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data-selection scores: per-document importance of the
    hashed-unigram distribution vs the English target slice, log-free
    (scaled-integer smoothed ratios — libm log is not bit-portable;
    rationals are). The selection step of a distribution-matched
    pretraining mix. See sampling.dsir_importance for the bucket /
    broadcast anatomy."""
    from goeventstream_spark.operators import sampling

    docs = _docs(spark, sf_dir)
    return sampling.dsir_importance(docs, F.col("lang") == "en")


@query(
    "sequential_pair_support",
    """
    WITH per_ut AS (
      SELECT user_id, event_type, min(ts) AS mn, max(ts) AS mx
      FROM events GROUP BY user_id, event_type
    ),
    u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
          FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           CAST(sum(CASE WHEN a.mn < b.mx THEN 1 ELSE 0 END) AS BIGINT)
             AS support,
           u.n_users
    FROM per_ut a JOIN per_ut b ON a.user_id = b.user_id, u
    GROUP BY a.event_type, b.event_type, u.n_users
    """,
)
def q_sequential_pair_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern support for every ordered type pair: how many
    users exhibit "a then b" as a SUBSEQUENCE (some a occurrence
    strictly before some b occurrence — min(a) < max(b) per user, which
    also covers a==b as 'a at least twice spanning time'). One per-
    (user, type) min/max aggregation, then a per-user self-join bounded
    by the TYPE domain squared — never by events — so the pattern
    relation stays ~|types|^2 rows at any scale. The sequence-mining
    support table (PrefixSpan's length-2 seed) the funnel/transition
    operators don't provide."""
    ev = load_table(spark, sf_dir, "events")
    per_ut = ev.groupBy("user_id", "event_type").agg(
        F.min("ts").alias("mn"), F.max("ts").alias("mx")
    )
    n_users = ev.agg(
        F.countDistinct("user_id").cast("long").alias("n_users")
    )
    a, b = per_ut.alias("a"), per_ut.alias("b")
    return (
        a.join(b, F.col("a.user_id") == F.col("b.user_id"))
        .crossJoin(F.broadcast(n_users))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            "n_users",
        )
        .agg(
            F.sum(
                F.when(F.col("a.mn") < F.col("b.mx"), 1).otherwise(0)
            )
            .cast("long")
            .alias("support")
        )
        .select("type_a", "type_b", "support", "n_users")
    )


@query(
    "principal_direction",
    """
    WITH e AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    pos AS (
      SELECT vec_id, generate_subscripts(v, 1) - 1 AS i, unnest(v) AS xi
      FROM e
    ),
    cov AS (
      SELECT a.i, b.i AS j, CAST(sum(a.xi * b.xi) AS BIGINT) AS c
      FROM pos a JOIN pos b USING (vec_id) GROUP BY a.i, b.i
    ),
    v1 AS (SELECT i, CAST(sum(c) AS BIGINT) AS v FROM cov GROUP BY i),
    m1 AS (SELECT CAST(max(abs(v)) AS BIGINT) AS m FROM v1),
    w1 AS (SELECT i, CAST((v * 1000) // m AS BIGINT) AS w FROM v1, m1),
    v2 AS (
      SELECT cov.i, CAST(sum(c * w1.w) AS BIGINT) AS v
      FROM cov JOIN w1 ON w1.i = cov.j GROUP BY cov.i
    ),
    m2 AS (SELECT CAST(max(abs(v)) AS BIGINT) AS m FROM v2),
    w2 AS (SELECT i, CAST((v * 1000) // m AS BIGINT) AS w FROM v2, m2),
    rqn AS (
      SELECT CAST(sum(wi.w * cov.c * wj.w) AS BIGINT) AS rq_num
      FROM cov JOIN w2 wi ON wi.i = cov.i JOIN w2 wj ON wj.i = cov.j
    ),
    rqd AS (SELECT CAST(sum(w * w) AS BIGINT) AS rq_den FROM w2)
    SELECT CAST(w2.i AS BIGINT) AS dim, w2.w AS component, rq_num, rq_den
    FROM w2, rqn, rqd
    """,
)
def q_principal_direction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two fixed-point power steps toward the leading principal
    direction of the embedding second-moment matrix — distributed
    linear algebra as a hash-oracled query, which float PCA can never
    be. The exact Rayleigh quotient in the output certifies the
    captured variance (70-86% of lambda_max on the near-isotropic
    fixtures; convergence per step is the eigenvalue ratio, so spiked
    real-world spectra converge fast while the arithmetic stays
    engine-exact). The
    second-moment aggregation is the only data-sized stage (one
    (i, j)-keyed shuffle, dims^2 keys); both power steps and the exact
    Rayleigh quotient run on the 64x64 matrix relation. The per-step
    rescale is TRUNCATING integer division (identical in Spark's div
    and DuckDB's //; floor of a float quotient is not engine-safe).
    See operators/linalg.py."""
    from goeventstream_spark.operators import linalg

    return linalg.top_principal_direction(
        load_table(spark, sf_dir, "embeddings"), iters=2
    )


@query("lineitem_storage_report")  # rows-only: the oracle needs a file
# path (parquet_metadata), which the driver's view-based harness cannot
# express — verified impossible, not assumed: DuckDB's parquet_metadata
# "only accepts constant parameters" (Binder Error on a scalar-subquery
# path recovered from duckdb_views()), so no static SQL over the
# pre-registered views can reach the footers. The EXACT byte-level
# equality vs DuckDB's parquet_metadata() is pinned in
# tests/test_sources.py instead.
def q_lineitem_storage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-layout audit of the fact table from parquet FOOTERS
    only: per-column chunk counts, value counts, exact compressed /
    uncompressed byte totals — the statistics a manifest/data-skipping
    layer indexes, read driver-side in kilobytes per file (the planner
    reads metadata; executors read data). Pytest pins the report
    hash-equal to DuckDB's native parquet_metadata() over the same
    footers. See sources/stats.py."""
    import os

    from goeventstream_spark.sources import stats

    return stats.column_storage_report(
        spark, os.path.join(sf_dir, "lineitem.parquet")
    )


# Scaled DCG discounts floor(1e6 / log2(rank + 1)) for ranks 1..5 —
# precomputed so both engines weight with identical integers.
_DCG_DISC = [1000000, 630929, 500000, 430676, 386852]
_IDCG = sum(_DCG_DISC)
_DISC_CASE = "CASE rk " + " ".join(
    f"WHEN {i + 1} THEN {d}" for i, d in enumerate(_DCG_DISC)
) + " END"


@query(
    "ann_quality_report",
    f"""
    WITH e AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
      FROM e ORDER BY vec_id LIMIT 4
    ),{_kq_iter(1, "c0")},{_kq_iter(2, "c1")},
    a3 AS (
      SELECT vec_id, v, cid AS cluster_id FROM (
        SELECT e.vec_id, e.v, c2.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_kq_dist("e.v", "c2.v")},
                                           c2.cid) AS rk
        FROM e, c2
      ) WHERE rk = 1
    ),
    probes AS (
      SELECT query_id, cid AS cluster_id FROM (
        SELECT e.vec_id AS query_id, c2.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_kq_dist("e.v", "c2.v")},
                                           c2.cid) AS rk
        FROM e, c2 WHERE e.vec_id < 3
      ) WHERE rk <= 2
    ),
    ivf AS (
      SELECT query_id, vec_id, rk FROM (
        SELECT p.query_id, a.vec_id,
               row_number() OVER (PARTITION BY p.query_id
                                  ORDER BY {_kq_dist("q.v", "a.v")}, a.vec_id)
                 AS rk
        FROM probes p
        JOIN a3 a ON a.cluster_id = p.cluster_id
        JOIN e q ON q.vec_id = p.query_id
        WHERE a.vec_id <> p.query_id
      ) WHERE rk <= 5
    ),
    exact AS (
      SELECT query_id, vec_id FROM (
        SELECT q.vec_id AS query_id, x.vec_id,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_kq_dist("q.v", "x.v")}, x.vec_id)
                 AS rk
        FROM (SELECT * FROM e WHERE vec_id < 3) q, e x
        WHERE x.vec_id <> q.vec_id
      ) WHERE rk <= 5
    )
    SELECT i.query_id,
           CAST(sum(CASE WHEN x.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_overlap,
           CAST(sum(CASE WHEN x.vec_id IS NOT NULL
                         THEN {_DISC_CASE} ELSE 0 END) AS BIGINT) AS dcg_scaled,
           CAST((1000000 * sum(CASE WHEN x.vec_id IS NOT NULL
                                    THEN {_DISC_CASE} ELSE 0 END))
                // {_IDCG} AS BIGINT) AS ndcg_ppm
    FROM ivf i
    LEFT JOIN exact x ON x.query_id = i.query_id AND x.vec_id = i.vec_id
    GROUP BY i.query_id
    """,
)
def q_ann_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality readout of the oracled IVF path against exact
    search: per query, top-5 overlap (recall numerator) and the
    rank-weighted NDCG@5 in scaled integers (precomputed 1/log2
    discount constants — no float boundary anywhere, so even the
    EVALUATION is hash-oracled). The eval-harness shape every ANN
    deployment runs before trusting an index; probes=all equals exact
    by construction (pinned for ivf_topk), probes=2 trades recall for
    a 2-of-4 corpus scan and this report prices that trade."""
    from goeventstream_spark.operators import clustering

    emb = load_table(spark, sf_dir, "embeddings")
    # one codebook training shared by both searches
    cents = clustering.kmeans_fit(
        clustering.quantize_vectors(emb), k=4, iters=2
    )[1]
    ivf = clustering.ivf_fixed_search(
        emb, k=4, iters=2, probes=2, n_queries=3, top_k=5, centroids=cents
    ).select("query_id", "vec_id", "rk")
    exact = clustering.ivf_fixed_search(
        emb, k=4, iters=2, probes=4, n_queries=3, top_k=5, centroids=cents
    ).select(
        F.col("query_id").alias("xq"), F.col("vec_id").alias("xv")
    )
    disc = F.coalesce(
        *[
            F.when(F.col("rk") == i + 1, F.lit(d))
            for i, d in enumerate(_DCG_DISC)
        ]
    )
    hit = F.col("xv").isNotNull()
    joined = ivf.join(
        exact,
        (F.col("query_id") == F.col("xq")) & (F.col("vec_id") == F.col("xv")),
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.sum(F.when(hit, 1).otherwise(0)).cast("long").alias("n_overlap"),
        F.sum(F.when(hit, disc).otherwise(0)).cast("long").alias("dcg_scaled"),
        F.expr(
            f"div(1000000 * sum(CASE WHEN xv IS NOT NULL THEN "
            f"({_DISC_CASE}) ELSE 0 END), {_IDCG})"
        ).alias("ndcg_ppm"),
    )


@query(
    "ab_test_mann_whitney",
    """
    WITH units AS (
      SELECT CAST(user_id % 2 AS BIGINT) AS variant, count(*) AS x
      FROM events GROUP BY user_id, date_trunc('day', ts)
    ),
    ranked AS (
      SELECT variant, x,
             rank() OVER (ORDER BY x) AS rk,
             count(*) OVER (PARTITION BY x) AS tie_n
      FROM units
    ),
    sums AS (
      SELECT
        CAST(sum(CASE WHEN variant = 0 THEN 2 * rk + tie_n - 1 ELSE 0 END)
             AS BIGINT) AS r0_doubled,
        CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
        CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1
      FROM ranked
    )
    SELECT n0, n1,
           CAST(r0_doubled - n0 * (n0 + 1) AS BIGINT) AS u0_doubled,
           CAST(2 * n0 * n1 - (r0_doubled - n0 * (n0 + 1)) AS BIGINT)
             AS u1_doubled
    FROM sums
    """,
)
def q_ab_test_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nonparametric A/B readout: the Mann-Whitney U statistic over
    (user, day) activity counts, exact — tied values get the average
    rank, kept integer by working in DOUBLED ranks (2*rank + ties - 1),
    so U is reported as 2U with no float anywhere. Complements the
    chi-square conversion test with a continuous-metric test. One unit
    aggregation, one global rank window over the (bounded) unit
    relation, one fold."""
    ev = load_table(spark, sf_dir, "events")
    units = ev.groupBy("user_id", F.date_trunc("day", "ts")).agg(
        F.count("*").alias("x")
    ).select((F.col("user_id") % 2).cast("long").alias("variant"), "x")
    # Rank sums over distinct VALUES: every unit tied at x shares the
    # doubled average rank 2*cum - n_x + 1 (cum = running unit count
    # through x), so the window scans the bounded value domain, never
    # raw units — the same hardening as gini_by_segment; the oracle
    # states the per-unit rank() definition and the hashes must agree.
    blocks = units.groupBy("x").agg(
        F.count("*").cast("long").alias("n_x"),
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n0_x"),
    )
    cum = F.sum("n_x").over(
        Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    )
    per_x = blocks.select(
        "n_x",
        "n0_x",
        (2 * cum - F.col("n_x") + 1).alias("dr"),
    )
    sums = per_x.agg(
        F.sum(F.col("n0_x") * F.col("dr")).cast("long").alias("r0_doubled"),
        F.sum("n0_x").cast("long").alias("n0"),
        F.sum(F.col("n_x") - F.col("n0_x")).cast("long").alias("n1"),
    )
    u0 = F.col("r0_doubled") - F.col("n0") * (F.col("n0") + 1)
    return sums.select(
        "n0",
        "n1",
        u0.cast("long").alias("u0_doubled"),
        (2 * F.col("n0") * F.col("n1") - u0).cast("long").alias("u1_doubled"),
    )


from goeventstream_spark.queries_llm import _BANDED as _LLM_BANDED  # noqa: E402
from goeventstream_spark.queries_llm import _NUM_HASHES as _LLM_K  # noqa: E402

_MINHASH_CAL_SQL = """
    WITH 
  words AS (
    SELECT doc_id, word, pos FROM (
      SELECT doc_id, unnest(string_split(text, ' ')) AS word,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents
    ) WHERE word <> ''
  )
,
  sh AS (
    SELECT DISTINCT doc_id, shingle FROM (
      SELECT doc_id,
             concat_ws(' ', word, lead(word, 1) OVER win, lead(word, 2) OVER win) AS shingle,
             lead(word, 2) OVER win AS w3
      FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
    ) WHERE w3 IS NOT NULL
  )
,
  sig AS (SELECT doc_id, min(md5('0|' || shingle)) AS m0, min(md5('1|' || shingle)) AS m1, min(md5('2|' || shingle)) AS m2, min(md5('3|' || shingle)) AS m3, min(md5('4|' || shingle)) AS m4, min(md5('5|' || shingle)) AS m5, min(md5('6|' || shingle)) AS m6, min(md5('7|' || shingle)) AS m7, min(md5('8|' || shingle)) AS m8, min(md5('9|' || shingle)) AS m9, min(md5('10|' || shingle)) AS m10, min(md5('11|' || shingle)) AS m11, min(md5('12|' || shingle)) AS m12, min(md5('13|' || shingle)) AS m13, min(md5('14|' || shingle)) AS m14, min(md5('15|' || shingle)) AS m15 FROM sh GROUP BY doc_id),
  banded AS (
    SELECT doc_id, m0, m1, m2, m3, m4, m5, m6, m7, m8, m9, m10, m11, m12, m13, m14, m15, 0 AS band_id, md5(concat_ws('|', m0, m1, m2, m3)) AS band_sig FROM sig UNION ALL SELECT doc_id, m0, m1, m2, m3, m4, m5, m6, m7, m8, m9, m10, m11, m12, m13, m14, m15, 1 AS band_id, md5(concat_ws('|', m4, m5, m6, m7)) AS band_sig FROM sig UNION ALL SELECT doc_id, m0, m1, m2, m3, m4, m5, m6, m7, m8, m9, m10, m11, m12, m13, m14, m15, 2 AS band_id, md5(concat_ws('|', m8, m9, m10, m11)) AS band_sig FROM sig UNION ALL SELECT doc_id, m0, m1, m2, m3, m4, m5, m6, m7, m8, m9, m10, m11, m12, m13, m14, m15, 3 AS band_id, md5(concat_ws('|', m12, m13, m14, m15)) AS band_sig FROM sig
  )
,
    est AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             (CAST(a.m0 = b.m0 AS INT) + CAST(a.m1 = b.m1 AS INT) + CAST(a.m2 = b.m2 AS INT) + CAST(a.m3 = b.m3 AS INT) + CAST(a.m4 = b.m4 AS INT) + CAST(a.m5 = b.m5 AS INT) + CAST(a.m6 = b.m6 AS INT) + CAST(a.m7 = b.m7 AS INT) + CAST(a.m8 = b.m8 AS INT) + CAST(a.m9 = b.m9 AS INT) + CAST(a.m10 = b.m10 AS INT) + CAST(a.m11 = b.m11 AS INT) + CAST(a.m12 = b.m12 AS INT) + CAST(a.m13 = b.m13 AS INT) + CAST(a.m14 = b.m14 AS INT) + CAST(a.m15 = b.m15 AS INT)) AS n_match
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_sig = b.band_sig
       AND a.doc_id < b.doc_id
    ),
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    inter AS (
      SELECT e.doc_a, e.doc_b, count(*) AS n_inter
      FROM est e
      JOIN sh a ON a.doc_id = e.doc_a
      JOIN sh b ON b.doc_id = e.doc_b AND b.shingle = a.shingle
      GROUP BY e.doc_a, e.doc_b
    ),
    joined AS (
      SELECT e.n_match, coalesce(i.n_inter, 0) AS n_inter,
             za.n_sh + zb.n_sh - coalesce(i.n_inter, 0) AS n_union
      FROM est e
      LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
      JOIN sizes za ON za.doc_id = e.doc_a
      JOIN sizes zb ON zb.doc_id = e.doc_b
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(abs(n_match * n_union - 16 * n_inter)) AS BIGINT)
             AS err_num,
           CAST(16 * sum(n_union) AS BIGINT) AS err_den,
           CAST(max(abs(n_match * n_union - 16 * n_inter)) AS BIGINT)
             AS worst_err_num
    FROM joined
"""


@query("minhash_calibration_report", _MINHASH_CAL_SQL)
def q_minhash_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit of the MinHash estimator — the dedup
    counterpart of ann_quality_report: over EVERY banded-LSH candidate
    pair (no threshold), compare the 128-perm signature estimate with
    the exact shingle Jaccard, reporting the aggregate absolute error
    as an exact integer fraction
        sum |n_match * union - 128 * inter|  /  (128 * sum union)
    plus the worst single-pair error numerator. No float anywhere, so
    even the calibration is hash-oracled. This is the report that
    justifies (or indicts) a chosen band/perm configuration before
    trusting it at 100 TB; candidate generation stays the banded join,
    and the exact-Jaccard verification touches candidate pairs only."""
    from goeventstream_spark.operators import dedup

    docs = _docs(spark, sf_dir)
    sh = dedup.shingles(docs)
    # candidate pairs with exact signature match counts (threshold-free)
    est = dedup.minhash_near_dedup(docs, threshold=0.0).select(
        "doc_a",
        "doc_b",
        F.round(F.col("est_jaccard") * dedup.DEFAULT_NUM_HASHES)
        .cast("long")
        .alias("n_match"),
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        est.select("doc_a", "doc_b")
        .join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    k = dedup.DEFAULT_NUM_HASHES
    joined = (
        est.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"n_inter": 0})
        .join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b")), "doc_b")
        .select(
            "n_match",
            "n_inter",
            (F.col("n_a") + F.col("n_b") - F.col("n_inter")).alias("n_union"),
        )
    )
    err = F.abs(F.col("n_match") * F.col("n_union") - k * F.col("n_inter"))
    return joined.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum(err).cast("long").alias("err_num"),
        (F.lit(k) * F.sum("n_union")).cast("long").alias("err_den"),
        F.max(err).cast("long").alias("worst_err_num"),
    )


@query(
    "basket_pair_rules",
    """
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n
                 FROM baskets),
    item AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS item_cnt
             FROM baskets GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(count(*) AS BIGINT) AS pair_cnt
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ),
    scored AS (
      SELECT p.part_a, p.part_b, p.pair_cnt,
             CAST(1000000 * p.pair_cnt // ia.item_cnt AS BIGINT)
               AS conf_a_to_b_ppm,
             CAST((1000000 * p.pair_cnt * n.n)
                  // (ia.item_cnt * ib.item_cnt) AS BIGINT) AS lift_ppm
      FROM pairs p
      JOIN item ia ON ia.l_partkey = p.part_a
      JOIN item ib ON ib.l_partkey = p.part_b
      CROSS JOIN n_orders n
    )
    SELECT part_a, part_b, pair_cnt, conf_a_to_b_ppm, lift_ppm,
           CAST(row_number() OVER (ORDER BY pair_cnt DESC, part_a, part_b)
                AS BIGINT) AS rk
    FROM scored
    QUALIFY rk <= 20
    """,
)
def q_basket_pair_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: top-20 part
    pairs by co-occurrence support, with confidence(A->B) and lift in
    exact integer ppm (floor division — no float anywhere). The pair
    self-join is keyed on the basket id, so blowup is bounded by
    (lines per order choose 2) — ~21 pairs for TPC-H's 7-line cap —
    NEVER by catalog size; support counting is one map-side-combinable
    aggregation. The global top-20 plans as TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    # materialized once: three consumers (n_orders, item, both join
    # sides) re-ran the distinct shuffle per reference (round-9 opt)
    baskets = li.select("l_orderkey", "l_partkey").distinct().localCheckpoint(eager=False)
    n_orders = baskets.agg(
        F.countDistinct("l_orderkey").cast("long").alias("n")
    )
    item = baskets.groupBy("l_partkey").agg(
        F.count("*").cast("long").alias("item_cnt")
    )
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count("*").cast("long").alias("pair_cnt"))
    )
    ia = item.select(
        F.col("l_partkey").alias("part_a"), F.col("item_cnt").alias("cnt_a")
    )
    ib = item.select(
        F.col("l_partkey").alias("part_b"), F.col("item_cnt").alias("cnt_b")
    )
    scored = (
        pairs.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "pair_cnt",
            F.expr("div(1000000 * pair_cnt, cnt_a)").alias("conf_a_to_b_ppm"),
            F.expr("div(1000000 * pair_cnt * n, cnt_a * cnt_b)").alias(
                "lift_ppm"
            ),
        )
    )
    top = scored.orderBy(
        F.col("pair_cnt").desc(), "part_a", "part_b"
    ).limit(20)
    return top.withColumn(
        "rk",
        F.row_number()
        .over(
            Window.orderBy(F.col("pair_cnt").desc(), "part_a", "part_b")
        )
        .cast("long"),
    )
