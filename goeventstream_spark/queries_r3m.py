"""Round-3 batch M: a SimHash-vs-exact-Jaccard evaluation report
(precision/recall of the sketch detector against exact ground truth —
completing the eval-harness family next to the ANN quality and MinHash
calibration reports), degree assortativity of the co-purchase graph,
and a per-type burstiness (Fano factor) readout.

Reference parity note: the reference (GoEventStream) has no analytics
surface — these are SURVEY.md §2b group-2/3 extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goeventstream_spark.queries import query
from goeventstream_spark.sources import load_table


def _simhash_eval_sql() -> str:
    from goeventstream_spark.queries_llm import _SEG_BITS, _SEG_MASK, _SIMHASH_CTE

    # _SIMHASH_CTE embeds the words CTE, so the truth side's shingles
    # are built from those words directly (importing _SHINGLES too
    # would duplicate the words CTE).
    return f"""
    WITH {_SIMHASH_CTE},
    sh AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               concat_ws(' ', word, lead(word, 1) OVER win, lead(word, 2) OVER win)
                 AS shingle,
               lead(word, 2) OVER win AS w3
        FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      ) WHERE w3 IS NOT NULL
    ),
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON doc_a = sa.doc_id
      JOIN sizes sb ON doc_b = sb.doc_id
      WHERE CAST(n_common AS DOUBLE)
              / CAST(sa.n + sb.n - n_common AS DOUBLE) >= 0.5
    ),
    segs AS (
      SELECT doc_id, simhash, seg_id,
             (simhash >> (seg_id * {_SEG_BITS})) & {_SEG_MASK} AS seg_val
      FROM simhashes, (SELECT unnest([0, 1, 2, 3]) AS seg_id)
    ),
    pred AS (
      SELECT doc_a, doc_b FROM (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
        FROM segs a JOIN segs b
          ON a.seg_id = b.seg_id AND a.seg_val = b.seg_val AND a.doc_id < b.doc_id
      ) WHERE hamming <= 3
    ),
    j AS (
      SELECT CASE WHEN t.doc_a IS NOT NULL THEN 1 ELSE 0 END AS is_true,
             CASE WHEN p.doc_a IS NOT NULL THEN 1 ELSE 0 END AS is_pred
      FROM truth t FULL OUTER JOIN pred p
        ON t.doc_a = p.doc_a AND t.doc_b = p.doc_b
    )
    SELECT CAST(sum(is_true * is_pred) AS BIGINT) AS tp,
           CAST(sum((1 - is_true) * is_pred) AS BIGINT) AS fp,
           CAST(sum(is_true * (1 - is_pred)) AS BIGINT) AS fn,
           CAST(1000000 * sum(is_true * is_pred)
                // nullif(sum(is_pred), 0) AS BIGINT) AS precision_ppm,
           CAST(1000000 * sum(is_true * is_pred)
                // nullif(sum(is_true), 0) AS BIGINT) AS recall_ppm
    FROM j
    """


@query("simhash_eval_report", _simhash_eval_sql())
def q_simhash_eval_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-detector evaluation: SimHash near-dup pairs (hamming <=
    3, pigeonhole-complete) scored against exact 3-gram Jaccard >= 0.5
    ground truth — exact tp/fp/fn and ppm precision/recall, the
    decide-your-threshold report that tells a 100 TB pipeline how much
    the cheap 64-bit sketch misses before it replaces the exact pass.
    Completes the evaluation-harness family (``ann_quality_report``,
    ``minhash_calibration_report``).

    Scale plan: both pair generators are the repo's existing bounded
    shapes (shingle inverted index; SimHash pigeonhole segment join);
    the comparison is one full-outer join of two pair lists + a 1-row
    rollup. At 100 TB the exact side runs on a sampled stratum — the
    report is a calibration artifact, not a production pass.
    """
    from goeventstream_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    truth = dd.ngram_jaccard_pairs(docs, threshold=0.5).select("doc_a", "doc_b")
    pred = dd.simhash_near_dup_pairs(docs).select("doc_a", "doc_b")
    j = truth.withColumn("is_true", F.lit(1)).join(
        pred.withColumn("is_pred", F.lit(1)), ["doc_a", "doc_b"], "full_outer"
    )
    flags = j.select(
        F.coalesce("is_true", F.lit(0)).alias("t"),
        F.coalesce("is_pred", F.lit(0)).alias("p"),
    )
    return flags.agg(
        F.sum(F.col("t") * F.col("p")).cast("long").alias("tp"),
        F.sum((1 - F.col("t")) * F.col("p")).cast("long").alias("fp"),
        F.sum(F.col("t") * (1 - F.col("p"))).cast("long").alias("fn"),
        F.expr(
            "CAST(1000000 * sum(t * p) DIV nullif(sum(p), 0) AS BIGINT)"
        ).alias("precision_ppm"),
        F.expr(
            "CAST(1000000 * sum(t * p) DIV nullif(sum(t), 0) AS BIGINT)"
        ).alias("recall_ppm"),
    )


@query(
    "copurchase_assortativity",
    """
    WITH b AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS pk FROM lineitem),
    e AS (
      SELECT t1.pk AS u, t2.pk AS v
      FROM b t1 JOIN b t2 ON t1.g = t2.g AND t1.pk < t2.pk
      GROUP BY 1, 2
    ),
    deg AS (
      SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM e UNION ALL SELECT v AS node FROM e
      ) GROUP BY 1
    ),
    arcs AS (
      SELECT du.d AS x, dv.d AS y
      FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
      UNION ALL
      SELECT dv.d AS x, du.d AS y
      FROM e JOIN deg du ON e.u = du.node JOIN deg dv ON e.v = dv.node
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM arcs
    )
    SELECT n AS n_arcs, sxy, sxx,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             AS assortativity
    FROM m
    """,
)
def q_copurchase_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity (Newman 2002) of the part co-purchase
    graph: the Pearson correlation of endpoint degrees over all arcs
    (each undirected edge contributes both orientations) — one number
    saying whether hubs connect to hubs (positive) or to leaves
    (negative), which predicts how badly the graph's joins skew.

    Exactness: all moment sums are exact BIGINT; the final coefficient
    is one fixed double expression over those integers (identical IEEE
    sequence both engines).

    Scale plan: edges are basket-bounded (sum C(size,2), never
    |parts|^2); degrees broadcast back onto the edge list; the moment
    rollup is a 1-row agg. No windows.
    """
    li = load_table(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("g"), F.col("l_partkey").alias("pk")
    ).distinct()
    t1, t2 = b.alias("t1"), b.alias("t2")
    e = (
        t1.join(
            t2, (F.col("t1.g") == F.col("t2.g")) & (F.col("t1.pk") < F.col("t2.pk"))
        )
        .select(F.col("t1.pk").alias("u"), F.col("t2.pk").alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("x"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("y"))
    joined = e.join(F.broadcast(du), "u").join(F.broadcast(dv), "v")
    arcs = joined.select("x", "y").unionAll(
        joined.select(F.col("y").alias("x"), F.col("x").alias("y"))
    )
    m = arcs.agg(
        F.count("*").cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    num = F.col("n").cast("double") * F.col("sxy").cast("double") - F.col(
        "sx"
    ).cast("double") * F.col("sy").cast("double")
    varx = F.col("n").cast("double") * F.col("sxx").cast("double") - F.col(
        "sx"
    ).cast("double") * F.col("sx").cast("double")
    vary = F.col("n").cast("double") * F.col("syy").cast("double") - F.col(
        "sy"
    ).cast("double") * F.col("sy").cast("double")
    return m.select(
        F.col("n").alias("n_arcs"),
        "sxy",
        "sxx",
        (num / F.sqrt(varx * vary)).alias("assortativity"),
    )


@query(
    "burstiness_by_type",
    """
    WITH hb AS (
      SELECT event_type, epoch_ms(ts) // 3600000 AS hr, count(*) AS c
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT event_type, min(hr) AS lo, max(hr) AS hi FROM hb GROUP BY 1
    ),
    spine AS (
      SELECT event_type, unnest(range(lo, hi + 1)) AS hr FROM bounds
    ),
    filled AS (
      SELECT spine.event_type, spine.hr, COALESCE(hb.c, 0) AS c
      FROM spine LEFT JOIN hb
        ON spine.event_type = hb.event_type AND spine.hr = hb.hr
    ),
    m AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS ss
      FROM filled GROUP BY 1
    )
    SELECT event_type, n AS n_hours, s AS n_events,
           (CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
            - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
           / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)) AS fano
    FROM m
    """,
)
def q_burstiness_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burstiness (Fano factor = variance/mean of the gap-filled
    hourly counts) per event type: fano ~ 1 is Poisson-like traffic,
    >> 1 is bursty — the one-number prior that says whether rate
    monitors (EWMA/CUSUM) need wide or tight bands for this stream.

    Exactness: integer count moments over the zero-filled hourly
    spine; the Fano ratio is one fixed double expression over exact
    integers.

    Scale plan: one (type, hour) hash agg; the spine is O(keys x time
    span); the moment rollup is per key. No windows.
    """
    ev = load_table(spark, sf_dir, "events")
    hb = (
        ev.select(
            "event_type", F.expr("unix_millis(ts) DIV 3600000").alias("hr")
        )
        .groupBy("event_type", "hr")
        .agg(F.count("*").alias("c"))
    )
    bounds = hb.groupBy("event_type").agg(
        F.min("hr").alias("lo"), F.max("hr").alias("hi")
    )
    spine = bounds.select(
        "event_type", F.explode(F.sequence("lo", "hi")).alias("hr")
    )
    filled = spine.join(hb, ["event_type", "hr"], "left").select(
        "event_type", "hr", F.coalesce("c", F.lit(0)).alias("c")
    )
    m = filled.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("long").alias("ss"),
    )
    fano = (
        F.col("n").cast("double") * F.col("ss").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
    ) / (F.col("n").cast("double") * F.col("s").cast("double"))
    return m.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.col("s").alias("n_events"),
        fano.alias("fano"),
    )


# ---------------------------------------------------------------------------
# Personalized PageRank from a seed region
# ---------------------------------------------------------------------------


def _ppr_sql() -> str:
    from goeventstream_spark.operators import graph as gr

    it = """
    c{i} AS (
      SELECT dst, CAST(sum((r.rank * norm.wn) // {W}) AS BIGINT) AS in_sum
      FROM norm JOIN r{p} r ON norm.src = r.node GROUP BY dst
    ),
    r{i} AS (
      SELECT sm.node, sm.is_seed,
             sm.is_seed * (({S} * 15) // (100 * ns))
               + (85 * COALESCE(in_sum, 0)) // 100 AS rank
      FROM sm LEFT JOIN c{i} ON sm.node = c{i}.dst, nn
    )"""
    its = ",".join(
        it.format(i=i, p=i - 1, W=gr.W_SCALE, S=gr.SCALE) for i in range(1, 4)
    )
    return f"""
    WITH e AS (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS w
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    ow AS (SELECT src, CAST(sum(w) AS BIGINT) AS out_w FROM e GROUP BY src),
    norm AS (
      SELECT e.src, e.dst, (CAST(e.w AS BIGINT) * {gr.W_SCALE}) // ow.out_w AS wn
      FROM e JOIN ow ON e.src = ow.src
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM e UNION ALL SELECT dst FROM e
      )
    ),
    seeds AS (
      SELECT n.n_nationkey AS node FROM nation n
      JOIN region rg ON n.n_regionkey = rg.r_regionkey
      WHERE rg.r_name = 'ASIA'
    ),
    sm AS (
      SELECT nodes.node,
             CASE WHEN seeds.node IS NOT NULL THEN 1 ELSE 0 END AS is_seed
      FROM nodes LEFT JOIN seeds ON nodes.node = seeds.node
    ),
    nn AS (SELECT CAST(sum(is_seed) AS BIGINT) AS ns FROM sm),
    r0 AS (
      SELECT node, is_seed,
             CASE WHEN is_seed = 1 THEN {gr.SCALE} // ns ELSE 0 END AS rank
      FROM sm, nn
    ),
    {its}
    SELECT n.n_name, CAST(r3.rank AS BIGINT) AS rank
    FROM r3 JOIN nation n ON r3.node = n.n_nationkey
    """


@query("nation_personalized_pagerank", _ppr_sql())
def q_nation_personalized_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank over the supplier-nation -> customer-
    nation trade graph, teleporting only to ASIA nations — "trade
    influence as seen FROM Asia", the seeded variant of
    ``nation_pagerank`` used for related-item and
    local-neighborhood ranking. Same exact int64 fixed-point
    recurrences, 3 unrolled iterations, seed-restricted teleport.

    Scale plan: identical to the global variant (one heavy edge
    aggregation, then broadcast-sized iteration joins); the seed set
    rides as a broadcast 1-column dim.
    """
    from goeventstream_spark.operators import graph as gr

    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    edges = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    seeds = (
        nation.join(
            F.broadcast(region.where(F.col("r_name") == "ASIA")),
            nation.n_regionkey == region.r_regionkey,
        )
        .select(F.col("n_nationkey").alias("node"))
    )
    ranks = gr.personalized_pagerank_fixed(edges, seeds, iterations=3)
    return ranks.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        ranks.node == F.col("n_nationkey"),
    ).select("n_name", F.col("rank").cast("long").alias("rank"))


# ---------------------------------------------------------------------------
# Fair (diversity-capped) top-k and dedup cluster-size histogram
# ---------------------------------------------------------------------------


def _fair_topk_sql() -> str:
    from goeventstream_spark.queries_llm import _QUAL_CTE, _WORDS

    return f"""
    WITH {_WORDS},
    {_QUAL_CTE}
    SELECT doc_id, source, quality_score, src_rank FROM (
      SELECT d.doc_id, d.source, q.quality_score,
             CAST(row_number() OVER (PARTITION BY d.source
                                     ORDER BY q.quality_score DESC, d.doc_id)
                  AS BIGINT) AS src_rank
      FROM documents d JOIN qual q ON d.doc_id = q.doc_id
    ) WHERE src_rank <= 3
    ORDER BY quality_score DESC, doc_id LIMIT 12
    """


@query("fair_topk_docs", _fair_topk_sql())
def q_fair_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversity-capped (fair) top-k: the 12 highest-quality documents
    subject to AT MOST 3 per source — the result-diversification rule
    every search/curation surface applies so one prolific source
    cannot monopolize the head of the ranking.

    Scale plan: the per-source cap is a source-partitioned rank window
    (parallel across sources) filtered to 3 survivors per source —
    at most 3x|sources| rows — and the global top-12 over that tiny
    relation is TakeOrderedAndProject. Never a global rank over the
    corpus.
    """
    from goeventstream_spark.operators import text as tx
    from pyspark.sql import Window as W

    docs = load_table(spark, sf_dir, "documents")
    qual = tx.quality_score(docs).select("doc_id", "quality_score")
    w = W.partitionBy("source").orderBy(F.desc("quality_score"), "doc_id")
    capped = (
        docs.select("doc_id", "source")
        .join(qual, "doc_id")
        .withColumn("src_rank", F.row_number().over(w).cast("long"))
        .where(F.col("src_rank") <= 3)
    )
    return capped.select(
        "doc_id", "source", "quality_score", "src_rank"
    ).orderBy(F.desc("quality_score"), "doc_id").limit(12)


def _cluster_hist_sql() -> str:
    from goeventstream_spark.queries_llm import _JPAIRS_CTE

    return f"""
    WITH RECURSIVE {_JPAIRS_CTE},
    assign AS (
      SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
    ),
    csizes AS (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS size FROM assign GROUP BY 1
    ),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(max(size) AS BIGINT) AS max_size
            FROM assign, (SELECT max(size) AS size FROM csizes))
    SELECT size, CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(1000000 * max_size // n_docs AS BIGINT) AS giant_share_ppm
    FROM csizes CROSS JOIN tot
    GROUP BY size, max_size, n_docs
    """


@query("dedup_cluster_size_histogram", _cluster_hist_sql())
def q_dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster size distribution (how many components of each
    size) plus the giant-component share of all docs in ppm — the
    health check that catches a collapsed dedup graph (one giant
    cluster swallowing the corpus means the threshold is too loose)
    before representatives are dropped.

    Scale plan: clustering is the existing propagation operator; the
    histogram is two tiny aggs keyed on cluster id then size; the
    giant share rides as a broadcast 1-row stat.
    """
    from goeventstream_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    clusters = dd.dedup_clusters(dd.ngram_jaccard_pairs(docs), all_docs=docs)
    sizes = clusters.groupBy("cluster_id").agg(F.count("*").alias("size"))
    tot = sizes.agg(
        F.sum("size").cast("long").alias("n_docs"),
        F.max("size").cast("long").alias("max_size"),
    )
    return (
        sizes.groupBy("size")
        .agg(F.count("*").cast("long").alias("n_clusters"))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("size").cast("long").alias("size"),
            "n_clusters",
            F.expr("CAST(1000000 * max_size DIV n_docs AS BIGINT)").alias(
                "giant_share_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# 3-hop-bounded harmonic centrality over the sparse trade graph
# ---------------------------------------------------------------------------


@query(
    "nation_harmonic_centrality",
    """
    WITH e0 AS (
      SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS w
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE s.s_nationkey <> c.c_nationkey
      GROUP BY 1, 2
    ),
    sparse AS (
      SELECT src, dst FROM (
        SELECT src, dst,
               row_number() OVER (PARTITION BY src ORDER BY w DESC, dst) AS rn
        FROM e0
      ) WHERE rn <= 2
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM sparse UNION ALL SELECT dst FROM sparse
      )
    ),
    reach AS (
      WITH RECURSIVE r(s, node, hop) AS (
        SELECT node AS s, node, 0 AS hop FROM nodes
        UNION ALL
        SELECT r.s, sparse.dst AS node, r.hop + 1 AS hop
        FROM r JOIN sparse ON sparse.src = r.node
        WHERE r.hop < 3
      )
      SELECT s, node, CAST(min(hop) AS BIGINT) AS d FROM r GROUP BY 1, 2
    )
    SELECT n.n_name,
           CAST(sum(1000000 // d) AS BIGINT) AS harmonic_ppm,
           CAST(count(*) AS BIGINT) AS n_reached
    FROM reach JOIN nation n ON reach.s = n.n_nationkey
    WHERE d > 0
    GROUP BY n.n_name
    """,
)
def q_nation_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-hop-bounded harmonic centrality over each nation's top-2
    heaviest trade lanes: sum over reachable others of 1e6/hops (exact
    integer floors) — the centrality that, unlike closeness, handles
    disconnected graphs gracefully; bounded depth makes it the
    streaming-refreshable variant (same sparse graph and depth bound
    as ``trade_reach_hops``, extended from one seed to ALL sources).

    Scale plan: the heavy stage is the one edge aggregation; the
    all-sources expansion unrolls 3 joins over the broadcast-sized
    sparse graph (<= 2 successors/node), so path rows are bounded by
    |nodes| * 2^3; min-hop and the harmonic sum are two tiny aggs.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    from pyspark.sql import Window as W

    e0 = (
        li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .where(F.col("s_nationkey") != F.col("c_nationkey"))
        .groupBy(
            F.col("s_nationkey").alias("src"), F.col("c_nationkey").alias("dst")
        )
        .agg(F.count("*").alias("w"))
    )
    wsp = W.partitionBy("src").orderBy(F.desc("w"), "dst")
    sparse = (
        e0.withColumn("rn", F.row_number().over(wsp))
        .where(F.col("rn") <= 2)
        .select("src", "dst")
        .localCheckpoint(eager=False)
    )
    nodes = (
        sparse.select(F.col("src").alias("node"))
        .unionAll(sparse.select(F.col("dst").alias("node")))
        .distinct()
    )
    paths = nodes.select(
        F.col("node").alias("s"), "node", F.lit(0).alias("hop")
    )
    cur = paths
    for hop in (1, 2, 3):
        cur = (
            cur.join(F.broadcast(sparse), cur.node == sparse.src)
            .select("s", F.col("dst").alias("node"), F.lit(hop).alias("hop"))
        )
        paths = paths.unionAll(cur)
    mind = paths.groupBy("s", "node").agg(F.min("hop").cast("long").alias("d"))
    return (
        mind.where(F.col("d") > 0)
        .groupBy("s")
        .agg(
            F.sum(F.expr("1000000 DIV d")).cast("long").alias("harmonic_ppm"),
            F.count("*").cast("long").alias("n_reached"),
        )
        .join(F.broadcast(nation), F.col("s") == F.col("n_nationkey"))
        .select("n_name", "harmonic_ppm", "n_reached")
    )
