"""Round-2 additions, each declared with a DuckDB oracle: temporal
state history (interval concurrency, SCD2, CDC merge + snapshot-diff,
TWAP), iterative graph analytics (fixed-point PageRank, recursive-CTE
reachability), exact weighted/stratified sampling, robust statistics
(median/MAD, histogram quantiles), count-min sketch, n-gram novelty,
and Spark-4 surface coverage (VARIANT, null-safe join, max_by,
higher-order array folds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from goeventstream_spark.operators import graph as gr
from goeventstream_spark.operators import relational as rel
from goeventstream_spark.operators import sampling as sp
from goeventstream_spark.operators import stream_ops as so
from goeventstream_spark.operators import temporal as tp
from goeventstream_spark.queries import query
from goeventstream_spark.sources import load_table

# Gap-sessionization oracle fragment shared with session_stats.
_SESSIONS_SQL = """
  sess AS (
    SELECT user_id, session_id, min(ts) AS session_start, max(ts) AS session_end
    FROM (
      SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM (
        SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 3600000
                       THEN 1 ELSE 0 END AS is_new
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      )
    ) GROUP BY user_id, session_id
  )
"""

CDC_CUTOFF = "2024-01-16 00:00:00"


@query(
    "max_concurrent_sessions",
    f"""
    WITH {_SESSIONS_SQL},
    b AS (
      SELECT session_start AS ts, 1 AS delta, user_id, session_id FROM sess
      UNION ALL
      SELECT session_end, -1, user_id, session_id FROM sess
    ),
    bd AS (SELECT CAST(ts AS DATE) AS day, ts, delta, user_id, session_id FROM b),
    runq AS (
      SELECT day, CAST(sum(delta) OVER (PARTITION BY day
                    ORDER BY ts, delta DESC, user_id, session_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS run
      FROM bd
    ),
    mr AS (SELECT day, max(run) AS max_run FROM runq GROUP BY day),
    dn AS (SELECT day, CAST(sum(delta) AS BIGINT) AS net FROM bd GROUP BY day),
    cr AS (
      SELECT day, CAST(COALESCE(sum(net) OVER (ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS carry
      FROM dn
    )
    SELECT CAST(mr.day AS TIMESTAMP) AS day,
           CAST(cr.carry + GREATEST(mr.max_run, 0) AS BIGINT) AS max_concurrent
    FROM mr JOIN cr ON mr.day = cr.day
    """,
)
def q_max_concurrent_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval overlap: peak concurrent sessions per day,
    computed with a two-phase (per-day + day-carry) prefix sum instead
    of one global running-sum window. See operators/temporal.py."""
    sessions = so.session_stats(load_table(spark, sf_dir, "events"), gap_s=3600)
    return tp.max_concurrency_by_day(sessions)


@query(
    "scd2_user_activity",
    """
    SELECT user_id, attr, valid_from, valid_to, valid_to IS NULL AS is_current
    FROM (
      SELECT user_id, event_type AS attr, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM (
        SELECT *, lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM events
      ) WHERE prev IS NULL OR event_type <> prev
    )
    """,
)
def q_scd2_user_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 change tracking of each user's activity state:
    one row per attribute run with half-open [valid_from, valid_to)
    validity. Generalizes the reference's LWW state map into the
    'what was the value at time t' dimension shape."""
    return tp.scd2_intervals(load_table(spark, sf_dir, "events"))


@query(
    "cdc_apply_snapshot",
    f"""
    WITH base AS (
      SELECT user_id, value, ts FROM (
        SELECT user_id, value, ts,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{CDC_CUTOFF}'
      ) WHERE rn = 1
    ),
    chg AS (
      SELECT user_id, op, ts, value FROM (
        SELECT user_id, CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
               ts, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{CDC_CUTOFF}'
      ) WHERE rn = 1
    )
    SELECT COALESCE(b.user_id, c.user_id) AS user_id,
           CASE WHEN c.op = 'U' THEN c.value ELSE b.value END AS value,
           CASE WHEN c.op = 'U' THEN c.ts ELSE b.ts END AS updated_at
    FROM base b FULL OUTER JOIN chg c ON b.user_id = c.user_id
    WHERE c.op IS NULL OR c.op = 'U'
    """,
)
def q_cdc_apply_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch MERGE INTO: the first half-month's latest-state snapshot
    updated by the second half-month's change stream ('error' events
    act as deletes, everything else as LWW upserts)."""
    events = load_table(spark, sf_dir, "events")
    cutoff = F.to_timestamp(F.lit(CDC_CUTOFF))
    base = (
        events.where(F.col("ts") < cutoff)
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.col("ts").desc(), F.col("event_id").desc()
                )
            ),
        )
        .where(F.col("_rn") == 1)
        .select("user_id", "value", "ts")
    )
    changelog = events.where(F.col("ts") >= cutoff).withColumn(
        "op", F.when(F.col("event_type") == "error", "D").otherwise("U")
    )
    return tp.cdc_apply(base, changelog)


@query(
    "nation_pagerank",
    f"""
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
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
    r0 AS (SELECT node, {gr.SCALE} // n AS rank FROM nodes, nn),
    c1 AS (
      SELECT dst, CAST(sum((r.rank * norm.wn) // {gr.W_SCALE}) AS BIGINT) AS in_sum
      FROM norm JOIN r0 r ON norm.src = r.node GROUP BY dst
    ),
    r1 AS (
      SELECT node, ({gr.SCALE} * 15) // (100 * n)
                   + (85 * COALESCE(in_sum, 0)) // 100 AS rank
      FROM nodes LEFT JOIN c1 ON node = c1.dst, nn
    ),
    c2 AS (
      SELECT dst, CAST(sum((r.rank * norm.wn) // {gr.W_SCALE}) AS BIGINT) AS in_sum
      FROM norm JOIN r1 r ON norm.src = r.node GROUP BY dst
    ),
    r2 AS (
      SELECT node, ({gr.SCALE} * 15) // (100 * n)
                   + (85 * COALESCE(in_sum, 0)) // 100 AS rank
      FROM nodes LEFT JOIN c2 ON node = c2.dst, nn
    ),
    c3 AS (
      SELECT dst, CAST(sum((r.rank * norm.wn) // {gr.W_SCALE}) AS BIGINT) AS in_sum
      FROM norm JOIN r2 r ON norm.src = r.node GROUP BY dst
    ),
    r3 AS (
      SELECT node, ({gr.SCALE} * 15) // (100 * n)
                   + (85 * COALESCE(in_sum, 0)) // 100 AS rank
      FROM nodes LEFT JOIN c3 ON node = c3.dst, nn
    )
    SELECT n.n_name, r3.rank FROM r3 JOIN nation n ON r3.node = n.n_nationkey
    """,
)
def q_nation_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the supplier-nation -> customer-nation
    trade graph: the one heavy edge-aggregation stage, then 3 unrolled
    power iterations as broadcast joins over the tiny aggregated graph.
    Exact BIGINT arithmetic — bit-identical across engines."""
    edges = gr.nation_trade_edges(
        load_table(spark, sf_dir, "lineitem"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "supplier"),
        load_table(spark, sf_dir, "customer"),
    )
    ranks = gr.pagerank_fixed_point(edges, iterations=3)
    nation = load_table(spark, sf_dir, "nation")
    return ranks.join(
        F.broadcast(nation), ranks.node == nation.n_nationkey
    ).select("n_name", "rank")


@query(
    "weighted_sample_lineitems",
    """
    WITH it AS (
      SELECT l_orderkey, l_linenumber,
             (CAST(l_quantity AS INT) + 9) // 10 AS w
      FROM lineitem
    ),
    draws AS (
      SELECT l_orderkey, l_linenumber, w,
             unnest(flatten(list_transform(range(0, (w + 3) // 4),
               i -> list_transform(range(0, least(4, w - i * 4)),
                 l -> substring(md5(concat_ws('#', l_orderkey, l_linenumber, i)),
                                l * 8 + 1, 8))))) AS pri
      FROM it
    )
    SELECT l_orderkey, l_linenumber, max(pri) AS sample_pri,
           CAST(max(w) AS BIGINT) AS weight
    FROM draws GROUP BY l_orderkey, l_linenumber
    ORDER BY sample_pri DESC, l_orderkey, l_linenumber
    LIMIT 100
    """,
)
def q_weighted_sample_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted sampling without replacement (top-100 lineitems
    weighted by quantity DECILE, 1..5 — the bounded-weight contract
    that keeps per-row draw work constant) via the max-of-w-uniform-
    draws priority — all md5/string arithmetic, no float pow/log.
    Plans the global top-k as TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "qty_decile", F.expr("(CAST(l_quantity AS INT) + 9) DIV 10")
    )
    return sp.weighted_sample_topk(
        li,
        weight_col="qty_decile",
        key_cols=("l_orderkey", "l_linenumber"),
        k=100,
        max_weight=5,
    )


@query(
    "stratified_sample_docs",
    """
    SELECT doc_id, source, lang, n_chars FROM (
      SELECT doc_id, source, lang, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    ) WHERE rn <= 30
    """,
)
def q_stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with EXACT per-stratum quotas (30 docs per
    source): rank within each stratum by the content-stable md5 key and
    keep the first n. Unlike Bernoulli sampleBy, quotas are exact and
    growth-stable (a kept doc is only displaced when a lower-keyed doc
    arrives — no RNG). One shuffle, partitioned by stratum — scales to
    any stratum count; per-stratum work is a bounded top-n."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 30)
        .select("doc_id", "source", "lang", "n_chars")
    )


@query(
    "snapshot_diff",
    f"""
    WITH old AS (
      SELECT user_id, value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{CDC_CUTOFF}'
      ) WHERE rn = 1
    ),
    new AS (
      SELECT user_id, value FROM (
        SELECT user_id, value,
               row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{CDC_CUTOFF}'
      ) WHERE rn = 1
    )
    SELECT COALESCE(o.user_id, n.user_id) AS user_id,
           CASE WHEN o.user_id IS NULL THEN 'I'
                WHEN n.user_id IS NULL THEN 'D'
                ELSE 'U' END AS op,
           o.value AS old_value, n.value AS new_value
    FROM old o FULL OUTER JOIN new n ON o.user_id = n.user_id
    WHERE o.user_id IS NULL OR n.user_id IS NULL
       OR o.value IS DISTINCT FROM n.value
    """,
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-feed generation — the inverse of cdc_apply: diff two
    per-key LWW snapshots (before/after the cutoff) into an I/U/D
    changelog, dropping unchanged keys. Both snapshots partition on the
    key, so the reductions and the full-outer join share one shuffle
    key; at 100 TB this is the standard reconciliation / anti-entropy
    scan."""
    events = load_table(spark, sf_dir, "events")
    cutoff = F.to_timestamp(F.lit(CDC_CUTOFF))
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )

    def snap(df: DataFrame) -> DataFrame:
        return (
            df.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("user_id", "value")
        )

    # Presence travels as explicit marker flags, NOT value nullability:
    # a key PRESENT in a snapshot with a NULL value must classify as
    # U/D (row exists), exactly like the oracle's o.user_id/n.user_id
    # tests — and the change filter is null-safe so NULL<->value
    # transitions surface as updates instead of being NULL-dropped.
    old = (
        snap(events.where(F.col("ts") < cutoff))
        .withColumnRenamed("value", "old_value")
        .withColumn("_in_old", F.lit(True))
    )
    new = (
        snap(events.where(F.col("ts") >= cutoff))
        .withColumnRenamed("value", "new_value")
        .withColumn("_in_new", F.lit(True))
    )
    j = old.join(new, "user_id", "full_outer")
    in_old = F.col("_in_old").isNotNull()
    in_new = F.col("_in_new").isNotNull()
    return (
        j.where(
            ~in_old
            | ~in_new
            | ~F.col("old_value").eqNullSafe(F.col("new_value"))
        )
        .select(
            "user_id",
            F.when(~in_old, "I").when(~in_new, "D").otherwise("U").alias("op"),
            "old_value",
            "new_value",
        )
    )


@query(
    "trade_reach_hops",
    f"""
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
    reach AS (
      WITH RECURSIVE r(node, hop) AS (
        SELECT CAST(0 AS INT) AS node, 0 AS hop
        UNION ALL
        SELECT sparse.dst AS node, r.hop + 1 AS hop
        FROM r JOIN sparse ON sparse.src = r.node
        WHERE r.hop < 3
      )
      SELECT node, CAST(min(hop) AS BIGINT) AS hops FROM r GROUP BY node
    )
    SELECT n.n_name, reach.hops
    FROM reach JOIN nation n ON reach.node = n.n_nationkey
    """,
)
def q_trade_reach_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph reachability via a RECURSIVE CTE (Spark 4 SQL surface):
    minimum trade-hops from nation 0 over each nation's top-2 heaviest
    outbound trade lanes, depth-bounded at 3. The heavy stage is the
    one edge aggregation; the recursion expands over the tiny sparse
    graph (<= 2 successors/node, <= 3 hops), so the iterative part is
    broadcast-sized — the same scale split as nation_pagerank."""
    for t in ("lineitem", "supplier", "orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"{t}_rh")
    return spark.sql(
        """
        WITH e0 AS (
          SELECT s.s_nationkey AS src, c.c_nationkey AS dst, count(*) AS w
          FROM lineitem_rh l
          JOIN supplier_rh s ON l.l_suppkey = s.s_suppkey
          JOIN orders_rh o ON l.l_orderkey = o.o_orderkey
          JOIN customer_rh c ON o.o_custkey = c.c_custkey
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
        reach AS (
          WITH RECURSIVE r(node, hop) AS (
            SELECT CAST(0 AS INT) AS node, 0 AS hop
            UNION ALL
            SELECT sparse.dst AS node, r.hop + 1 AS hop
            FROM r JOIN sparse ON sparse.src = r.node
            WHERE r.hop < 3
          )
          SELECT node, CAST(min(hop) AS BIGINT) AS hops FROM r GROUP BY node
        )
        SELECT n.n_name, reach.hops
        FROM reach JOIN nation_rh n ON reach.node = n.n_nationkey
        """
    )


@query(
    "props_variant_stats",
    """
    SELECT event_type,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(min(k) AS BIGINT) AS min_k,
           CAST(max(k) AS BIGINT) AS max_k,
           count(k) AS n
    FROM (
      SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    GROUP BY event_type
    """,
)
def q_props_variant_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured analytics through the VARIANT type (Spark 4):
    parse the JSON props column ONCE into a variant, then typed-path
    extraction — the columnar-shredded path a lakehouse uses instead of
    per-field get_json_object string re-parsing. Exact integer
    aggregates; oracle mirrors with DuckDB json_extract."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'bigint')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count("k").alias("n"),
        )
    )


@query(
    "ngram_novelty",
    """
    WITH w AS (
      SELECT doc_id, word, pos FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS word,
               generate_subscripts(string_split(text, ' '), 1) AS pos
        FROM documents
      ) WHERE word <> ''
    ),
    db AS (
      SELECT DISTINCT doc_id, bigram FROM (
        SELECT doc_id,
               word || ' ' || lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
        FROM w
      ) WHERE bigram IS NOT NULL
    ),
    bf AS (SELECT bigram, count(*) AS ndocs FROM db GROUP BY bigram)
    SELECT db.doc_id, count(*) AS n_bigrams,
           CAST(sum(CASE WHEN bf.ndocs = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
           CAST(sum(CASE WHEN bf.ndocs = 1 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS novelty
    FROM db JOIN bf ON db.bigram = bf.bigram
    GROUP BY db.doc_id
    """,
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc bigram novelty (share of bigrams unique to the doc) —
    the boilerplate/memorization-risk quality signal. See
    text.ngram_novelty for the plan anatomy."""
    from goeventstream_spark.operators import text as tx

    return tx.ngram_novelty(load_table(spark, sf_dir, "documents"))


@query(
    "cms_token_counts",
    """
    WITH toks AS (
      SELECT word AS token FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
      ) WHERE word <> ''
    ),
    cells AS (
      SELECT i.row_i,
             CAST(('0x' || substr(md5(CAST(i.row_i AS VARCHAR) || '|' || token), 1, 2))::BIGINT
                  % 256 AS INT) AS bucket
      FROM toks CROSS JOIN (VALUES (0), (1), (2), (3)) AS i(row_i)
    ),
    cms AS (SELECT row_i, bucket, count(*) AS cnt FROM cells GROUP BY 1, 2),
    exact AS (
      SELECT token, count(*) AS exact_n FROM toks GROUP BY token
      ORDER BY exact_n DESC, token LIMIT 20
    ),
    probes AS (
      SELECT token, exact_n, i.row_i,
             CAST(('0x' || substr(md5(CAST(i.row_i AS VARCHAR) || '|' || token), 1, 2))::BIGINT
                  % 256 AS INT) AS bucket
      FROM exact CROSS JOIN (VALUES (0), (1), (2), (3)) AS i(row_i)
    )
    SELECT p.token, CAST(min(p.exact_n) AS BIGINT) AS exact_n,
           CAST(min(coalesce(cms.cnt, 0)) AS BIGINT) AS cms_est
    FROM probes p LEFT JOIN cms ON p.row_i = cms.row_i AND p.bucket = cms.bucket
    GROUP BY p.token
    """,
)
def q_cms_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation for the corpus's 20 most
    frequent tokens, alongside exact counts (est >= exact; gap =
    collision bias). The sketch build is one bounded-cardinality
    aggregation (4 x 256 cells) and merges associatively across
    partitions/days — see operators/sketches.py."""
    from goeventstream_spark.operators import sketches as sk

    docs = load_table(spark, sf_dir, "documents")
    toks = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .where(F.col("token") != "")
    )
    cms = sk.cms_build(toks, "token", depth=4, width=256)
    top = (
        toks.groupBy("token")
        .agg(F.count("*").alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "token")
        .limit(20)
    )
    est = sk.cms_estimate(cms, top.select("token"), "token", depth=4, width=256)
    return top.join(est, "token").select("token", "exact_n", "cms_est")


@query(
    "robust_outliers",
    """
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
    ),
    med AS (
      SELECT event_type, quantile_cont(cents, 0.5) AS med FROM c GROUP BY event_type
    ),
    dev AS (
      SELECT c.event_type, abs(c.cents - med.med) AS dev
      FROM c JOIN med ON c.event_type = med.event_type
    ),
    mad AS (
      SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY event_type
    )
    SELECT dev.event_type, min(med.med) AS med_cents, min(mad.mad) AS mad_cents,
           CAST(sum(CASE WHEN dev.dev > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           count(*) AS n
    FROM dev
    JOIN mad ON dev.event_type = mad.event_type
    JOIN med ON dev.event_type = med.event_type
    GROUP BY dev.event_type
    """,
)
def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median/MAD robust outlier detection per event type — the
    heavy-tail-safe alternative to z-scores. All arithmetic happens in
    exact integer-cents space (medians of integers interpolate to .5s,
    deviations to .25s — every intermediate is exactly representable,
    so both engines agree bit-for-bit). Two percentile passes + the
    deviation join all share the event_type shuffle key."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(cents, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("cents") - F.col("med")).alias("dev")
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(dev, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("med").alias("med_cents"),
            F.min("mad").alias("mad_cents"),
            F.sum((F.col("dev") > 3 * F.col("mad")).cast("long")).alias("n_outliers"),
            F.count("*").alias("n"),
        )
    )


@query(
    "histogram_quantiles",
    """
    WITH b AS (
      SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 10000 AS bucket,
             count(*) AS cnt
      FROM orders GROUP BY 1
    ),
    cum AS (
      SELECT bucket, CAST(sum(cnt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM b
    ),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM b)
    SELECT
      (SELECT min(bucket) FROM cum, tot WHERE cum >= (n + 1) // 2) * 10000 AS p50_lo_cents,
      (SELECT min(bucket) FROM cum, tot WHERE cum >= (95 * n + 99) // 100) * 10000 AS p95_lo_cents,
      (SELECT n FROM tot) AS n
    """,
)
def q_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantiles from a mergeable integer histogram: bucket order
    totals into $100 bins (one bounded-cardinality aggregation — the
    sketch), then read p50/p95 off the cumulative counts. The histogram
    relation is tiny, so its running sum is a bounded window; at 100 TB
    per-partition histograms merge by bucket-wise addition first (the
    CMS/HLL contract) and only the merged ~thousands-row relation sees
    the quantile walk. Bucket lower bound is the answer — exact
    integer semantics, no interpolation ambiguity."""
    orders = load_table(spark, sf_dir, "orders")
    b = (
        orders.select(
            F.expr("CAST(round(o_totalprice * 100) AS BIGINT) DIV 10000").alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )
    # ONE traversal: running count + grand total both as windows over
    # the tiny bucket relation (total = full-frame max of the running
    # sum), then a single conditional-min aggregation reads both
    # quantiles. The fact table is scanned exactly once.
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = b.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.max(F.sum("cnt").over(w)).over(w_all)
    )
    return cum.agg(
        (
            F.min(F.when(F.col("cum") >= F.expr("(n + 1) DIV 2"), F.col("bucket")))
            * 10000
        ).alias("p50_lo_cents"),
        (
            F.min(
                F.when(F.col("cum") >= F.expr("(95 * n + 99) DIV 100"), F.col("bucket"))
            )
            * 10000
        ).alias("p95_lo_cents"),
        F.max("n").cast("long").alias("n"),
    )


@query(
    "null_safe_join_status",
    """
    WITH a AS (
      SELECT nullif(o_orderstatus, 'O') AS k, count(*) AS n_even
      FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1
    ),
    b AS (
      SELECT nullif(o_orderstatus, 'O') AS k, count(*) AS n_odd
      FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1
    )
    SELECT a.k, a.n_even, b.n_odd
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
)
def q_null_safe_join_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other instead of vanishing — the semantics MERGE/dedup
    pipelines need when the join key is legitimately nullable. Open
    orders map to a NULL key on both sides and still pair up."""
    orders = load_table(spark, sf_dir, "orders")
    k = F.expr("nullif(o_orderstatus, 'O')")
    a = (
        orders.where(F.col("o_orderkey") % 2 == 0)
        .select(k.alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("n_even"))
    )
    b = (
        orders.where(F.col("o_orderkey") % 2 == 1)
        .select(k.alias("k2"))
        .groupBy("k2")
        .agg(F.count("*").alias("n_odd"))
    )
    return a.join(b, a.k.eqNullSafe(b.k2)).select("k", "n_even", "n_odd")


@query(
    "argmax_user_state",
    """
    SELECT user_id,
           arg_max(event_type, epoch_ms(ts) * 1000000 + event_id) AS last_type,
           arg_min(value, epoch_ms(ts) * 1000000 + event_id) AS first_value,
           arg_max(value, epoch_ms(ts) * 1000000 + event_id) AS last_value,
           count(*) AS n
    FROM events GROUP BY user_id
    """,
)
def q_argmax_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax) aggregation surface: per-user
    latest/earliest attributes in ONE aggregation pass — no
    row_number window, no self-join. The ordering key packs
    (millis, event_id) into one BIGINT (exact while event_id < 1e6,
    which the fixtures guarantee; at larger scales widen to a struct
    ordering)."""
    ev = load_table(spark, sf_dir, "events")
    ok = F.expr("unix_millis(ts) * 1000000 + event_id")
    return ev.groupBy("user_id").agg(
        F.max_by("event_type", ok).alias("last_type"),
        F.min_by("value", ok).alias("first_value"),
        F.max_by("value", ok).alias("last_value"),
        F.count("*").alias("n"),
    )


@query(
    "throttled_events",
    """
    SELECT event_id, user_id, event_type,
           CAST(date_trunc('minute', ts) AS TIMESTAMP) AS minute
    FROM (
      SELECT event_id, user_id, event_type, ts,
             row_number() OVER (PARTITION BY user_id, event_type, date_trunc('minute', ts)
                                ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def q_throttled_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate limiting / dedup-throttle: keep only the FIRST event per
    (user, type, minute) bucket — the alert-suppression shape. Bucketed
    keep-first is the scale-safe form of 'drop events within N seconds
    of the last kept one' (which is inherently sequential); one
    window shuffle on the full key."""
    ev = load_table(spark, sf_dir, "events")
    minute = F.date_trunc("minute", F.col("ts"))
    w = Window.partitionBy("user_id", "event_type", minute).orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type", minute.cast("timestamp").alias("minute"))
    )


@query(
    "embedding_array_funcs",
    """
    SELECT vec_id,
           len(embedding) AS n_dims,
           list_reduce(list_transform(embedding, x -> CAST(abs(x) AS DOUBLE)),
                       (a, b) -> a + b) AS l1,
           CAST(len(list_filter(embedding, x -> x <> 0)) AS INT) AS nnz,
           CAST(list_reduce(embedding, (a, b) -> greatest(a, b)) AS DOUBLE) AS vmax,
           CAST(list_reduce(embedding, (a, b) -> least(a, b)) AS DOUBLE) AS vmin
    FROM embeddings
    """,
)
def q_embedding_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array function battery over the embedding column:
    size, L1 norm via an ORDERED left fold (aggregate/list_reduce —
    float addition isn't associative, so only the fold form is
    engine-exact; a groupBy-sum over exploded elements would not be),
    filter-count, and fold-max/min. All map-side; at 100 TB this is a
    pure scan projection with no shuffle at all."""
    emb = load_table(spark, sf_dir, "embeddings")
    to_d = lambda x: x.cast("double")  # noqa: E731
    return emb.select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        F.aggregate(
            F.col("embedding"), F.lit(0.0), lambda acc, x: acc + F.abs(to_d(x))
        ).alias("l1"),
        F.size(F.filter(F.col("embedding"), lambda x: x != 0)).alias("nnz"),
        F.array_max("embedding").cast("double").alias("vmax"),
        F.array_min("embedding").cast("double").alias("vmin"),
    )


@query(
    "time_weighted_value",
    """
    SELECT user_id,
           CAST(sum(cents * dur_ms) AS BIGINT) AS weighted_sum,
           CAST(sum(dur_ms) AS BIGINT) AS total_ms,
           count(*) AS n_intervals,
           CAST(sum(cents * dur_ms) AS DOUBLE) / sum(dur_ms) / 100 AS twap
    FROM (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS cents,
             epoch_ms(lead(ts) OVER w) - epoch_ms(ts) AS dur_ms
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ) WHERE dur_ms IS NOT NULL
    GROUP BY user_id
    """,
)
def q_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's LWW state value (TWAP):
    every event sets the value until the next one, so the mean weights
    each value by how long it was current — the honest aggregate for
    irregularly-sampled state (a plain avg over-weights chatty
    periods). Products and sums stay in exact BIGINT
    (cents x duration-ms); only the final ratio is a float. One window
    + one aggregation, both on the user_id shuffle key."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    iv = ev.select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.unix_millis(F.lead("ts").over(w)) - F.unix_millis("ts")).alias("dur_ms"),
    ).where(F.col("dur_ms").isNotNull())
    return iv.groupBy("user_id").agg(
        F.sum(F.col("cents") * F.col("dur_ms")).alias("weighted_sum"),
        F.sum("dur_ms").alias("total_ms"),
        F.count("*").alias("n_intervals"),
        # try_divide: a user whose covered intervals all have zero
        # duration (every event at one ms) must yield NULL like the
        # oracle, not an ANSI DIVIDE_BY_ZERO crash
        (
            F.try_divide(
                F.sum(F.col("cents") * F.col("dur_ms")).cast("double"),
                F.sum("dur_ms"),
            )
            / F.lit(100)
        ).alias("twap"),
    )


@query(
    "basket_pair_lift",
    """
    WITH pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_ab
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
    ),
    pc AS (
      SELECT l_partkey, count(DISTINCT l_orderkey) AS n_orders
      FROM lineitem GROUP BY 1
    ),
    tot AS (SELECT CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n FROM orders)
    SELECT p.part_a, p.part_b, p.n_ab,
           pa.n_orders AS n_a, pb.n_orders AS n_b,
           CAST(p.n_ab * tot.n AS DOUBLE) / (pa.n_orders * pb.n_orders) AS lift
    FROM pairs p
    JOIN pc pa ON p.part_a = pa.l_partkey
    JOIN pc pb ON p.part_b = pb.l_partkey
    CROSS JOIN tot
    ORDER BY p.n_ab DESC, lift DESC, p.part_a, p.part_b
    LIMIT 50
    """,
)
def q_basket_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift: part pairs bought in the
    same order, scored by lift = P(a,b) / (P(a)P(b)). Pair generation
    is a SELF-JOIN ON THE ORDER KEY — co-partitioned, and bounded by
    the per-order line count (<= 7 lines -> <= 21 pairs/order), never
    an all-pairs product over parts. Counts stay integer; lift is one
    float ratio; the global top-50 plans as TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count("*").alias("n_ab"))
    )
    pc = li.groupBy("l_partkey").agg(F.count_distinct("l_orderkey").alias("n_orders"))
    tot = (
        load_table(spark, sf_dir, "orders")
        .agg(F.count_distinct("o_orderkey").cast("long").alias("n"))
    )
    out = (
        pairs.join(
            pc.select(F.col("l_partkey").alias("part_a"), F.col("n_orders").alias("n_a")),
            "part_a",
        )
        .join(
            pc.select(F.col("l_partkey").alias("part_b"), F.col("n_orders").alias("n_b")),
            "part_b",
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            ((F.col("n_ab") * F.col("n")).cast("double") / (F.col("n_a") * F.col("n_b"))).alias(
                "lift"
            ),
        )
    )
    return out.orderBy(
        F.col("n_ab").desc(), F.col("lift").desc(), "part_a", "part_b"
    ).limit(50)


@query(
    "cohort_ltv",
    """
    WITH first_order AS (
      SELECT o_custkey, strftime(min(o_orderdate), '%Y-%m') AS cohort_month
      FROM orders GROUP BY o_custkey
    ),
    monthly AS (
      SELECT f.cohort_month, strftime(o.o_orderdate, '%Y-%m') AS order_month,
             sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders o JOIN first_order f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2
    )
    SELECT cohort_month, order_month,
           CAST(rev AS DOUBLE) AS month_revenue,
           CAST(sum(rev) OVER (PARTITION BY cohort_month ORDER BY order_month
                               ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_revenue
    FROM monthly
    """,
)
def q_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: customers grouped by first-order month,
    revenue accumulated per cohort across calendar months. Decimal sums
    (exact, order-free) cast to double only at the edge; the running
    total windows over the tiny (cohort x month) aggregate, partitioned
    by cohort. The first-order reduction and the revenue join share the
    custkey shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    fo = orders.groupBy("o_custkey").agg(
        F.date_format(F.min("o_orderdate"), "yyyy-MM").alias("cohort_month")
    )
    monthly = (
        orders.join(fo, "o_custkey")
        .groupBy(
            "cohort_month",
            F.date_format("o_orderdate", "yyyy-MM").alias("order_month"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    w = Window.partitionBy("cohort_month").orderBy("order_month").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return monthly.select(
        "cohort_month",
        "order_month",
        F.col("rev").cast("double").alias("month_revenue"),
        F.sum("rev").over(w).cast("double").alias("cum_revenue"),
    )


@query(
    "modal_event_type",
    """
    SELECT user_id, event_type AS modal_type, n FROM (
      SELECT user_id, event_type, n,
             row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) AS rn
      FROM (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type
      )
    ) WHERE rn = 1
    """,
)
def q_modal_event_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user mode (most frequent event type) with a DETERMINISTIC
    tie-break (lexicographically first on equal counts) — the built-in
    mode() aggregate leaves ties engine-defined, so the portable form
    is count + per-key argmax. Both steps share the user_id shuffle;
    the window runs over the tiny per-user-type aggregate."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("modal_type"), "n")
    )


@query(
    "session_paths_topk",
    """
    WITH s AS (
      SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM (
        SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 3600000
                       THEN 1 ELSE 0 END AS is_new
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      )
    ),
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM s GROUP BY user_id, session_id
    )
    SELECT path, count(*) AS n_sessions FROM paths
    GROUP BY path ORDER BY n_sessions DESC, path LIMIT 20
    """,
)
def q_session_paths_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path analysis: the 20 most common within-session
    event-type sequences. The path string is built ORDER-DETERMINISTIC
    via array_sort over (ts, event_id, type) structs — a bare
    collect_list has engine/partition-dependent order and would never
    hash-match. Two aggregations, both shuffling on compact keys; the
    global top-20 is TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    sess = so.sessionize(ev, gap_s=3600)
    paths = (
        sess.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), "path")
        .limit(20)
    )


def _register_sync_backlog():
    # the protocol CTE block lives in queries_ext (shared with the
    # server-log/deliveries/envelope oracles); reuse it verbatim so the
    # two sides can never drift.
    from goeventstream_spark import queries_ext as qe

    oracle = (
        qe._proto_ctes("'_'")
        + """,
    lk AS (
      SELECT user_id, clock_t,
             COALESCE(lag(clock_t) OVER (PARTITION BY game, gen, user_id
                                         ORDER BY poll_ms, sync_id), 0) AS last_known
      FROM sc
    )
    SELECT user_id, count(*) AS n_syncs,
           CAST(max(clock_t - last_known) AS BIGINT) AS max_backlog,
           CAST(sum(CASE WHEN clock_t - last_known > 4 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_catchup_syncs
    FROM lk GROUP BY user_id
    """
    )

    @query("sync_backlog_stats", oracle)
    def q_sync_backlog_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Client catch-up analytics (README.md:22-26 — a client ticks
        faster when > 4 ticks behind): per user, how many ticks each
        poll had to deliver (clock_t - previous clock_t seen by that
        user) and how often the catch-up rule would fire. One
        sync_clock pass + a per-user lag sharing the same exchange."""
        from goeventstream_spark.operators import protocol_replay as pr

        ev = load_table(spark, sf_dir, "events")
        syncs = ev.select(
            F.col("event_id").alias("sync_id"),
            "user_id",
            F.unix_millis("ts").alias("poll_ms"),
        )
        sc = pr.sync_clock(syncs)
        w = Window.partitionBy("game", "gen", "user_id").orderBy("poll_ms", "sync_id")
        lk = sc.select(
            "user_id",
            "clock_t",
            F.coalesce(F.lag("clock_t").over(w), F.lit(0)).alias("last_known"),
        )
        backlog = F.col("clock_t") - F.col("last_known")
        return lk.groupBy("user_id").agg(
            F.count("*").alias("n_syncs"),
            F.max(backlog).cast("long").alias("max_backlog"),
            F.sum((backlog > 4).cast("long")).alias("n_catchup_syncs"),
        )


_register_sync_backlog()


@query(
    "vocab_coverage",
    """
    WITH toks AS (
      SELECT word AS token FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
      ) WHERE word <> ''
    ),
    freq AS (SELECT token, count(*) AS n FROM toks GROUP BY token),
    ranked AS (
      SELECT token, n,
             CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rnk,
             CAST(sum(n) OVER (ORDER BY n DESC, token ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(sum(n) OVER () AS BIGINT) AS total
      FROM freq
    )
    SELECT rnk, token, n, cum, total,
           CAST(cum AS DOUBLE) / total AS coverage
    FROM ranked WHERE rnk <= 100
    """,
)
def q_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve: what fraction of all token
    occurrences the top-k vocabulary entries cover — the Zipf-tail
    report that sizes a tokenizer's vocab. The token-frequency
    aggregation is the only big shuffle; ranking, the running share,
    and the grand total are windows over the aggregated (distinct
    tokens) relation, which is vocabulary-bounded, with integer
    cumulative sums and one final float ratio."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token")).where(
        F.col("token") != ""
    )
    freq = toks.groupBy("token").agg(F.count("*").alias("n"))
    # A raw web corpus's distinct vocabulary is NOT bounded (typos,
    # URLs), so no window may run over the full freq relation: take the
    # top-100 first (TakeOrderedAndProject — parallel partial top-k,
    # never a global sort), compute the grand total as a separate 1-row
    # aggregate broadcast onto it, and only then window over the
    # 100-row result — the same rank recipe as the TPC-H Q3/Q10 pages.
    total_df = freq.agg(F.sum("n").cast("long").alias("total"))
    top = freq.orderBy(F.col("n").desc(), "token").limit(100)
    w_rank = Window.orderBy(F.col("n").desc(), "token")
    ranked = (
        top.crossJoin(F.broadcast(total_df))
        .withColumn("rnk", F.row_number().over(w_rank).cast("long"))
        .withColumn(
            "cum",
            F.sum("n")
            .over(w_rank.rowsBetween(Window.unboundedPreceding, 0))
            .cast("long"),
        )
    )
    return ranked.select(
        "rnk",
        "token",
        "n",
        "cum",
        "total",
        (F.col("cum").cast("double") / F.col("total")).alias("coverage"),
    )


def _register_lang_confusion():
    # reuse the lang_id oracle fragments from queries_llm verbatim so
    # the prediction definition cannot drift between the two queries.
    from goeventstream_spark import queries_llm as ql
    from goeventstream_spark.operators import text as tx

    oracle = f"""
    WITH {ql._WORDS},
    scores AS (SELECT doc_id, count(*) AS n_words, {ql._LANG_SCORES}
               FROM words GROUP BY doc_id),
    pred AS (
      SELECT doc_id,
             CASE WHEN {ql._BEST} > 0 THEN {ql._PRED} ELSE 'und' END AS pred_lang
      FROM scores
    )
    SELECT d.lang, p.pred_lang, count(*) AS n_docs
    FROM documents d JOIN pred p ON d.doc_id = p.doc_id
    GROUP BY d.lang, p.pred_lang
    """

    @query("lang_confusion", oracle)
    def q_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
        """Language-ID quality audit: the confusion matrix between the
        labeled language and the n-gram classifier's prediction — the
        mislabeled-document detector a curation pipeline runs before
        trusting either signal. Composes the lang_id operator with a
        doc_id join; one extra shuffle on the tiny (lang, pred) key."""
        docs = load_table(spark, sf_dir, "documents")
        pred = tx.lang_id(docs).select("doc_id", "pred_lang")
        return (
            docs.select("doc_id", "lang")
            .join(pred, "doc_id")
            .groupBy("lang", "pred_lang")
            .agg(F.count("*").alias("n_docs"))
        )


_register_lang_confusion()


@query(
    "shipping_delay_percentiles",
    """
    SELECT o_orderpriority,
           quantile_cont(delay_days, 0.5) AS p50_days,
           quantile_cont(delay_days, 0.9) AS p90_days,
           CAST(max(delay_days) AS BIGINT) AS max_days,
           count(*) AS n
    FROM (
      SELECT o.o_orderpriority,
             (epoch_ms(l.l_shipdate) - epoch_ms(o.o_orderdate)) // 86400000 AS delay_days
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    )
    GROUP BY o_orderpriority
    """,
)
def q_shipping_delay_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship SLA distribution per priority: exact interpolated
    percentiles over INTEGER day delays (integer inputs keep the
    interpolation bit-exact cross-engine — the percentile discipline
    this repo uses everywhere). One broadcast-free fact join on the
    order key, one aggregation shuffle on the 5-value priority."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.expr(
            "(unix_millis(CAST(l_shipdate AS TIMESTAMP))"
            " - unix_millis(CAST(o_orderdate AS TIMESTAMP))) DIV 86400000"
        ).alias("delay_days"),
    )
    return j.groupBy("o_orderpriority").agg(
        F.expr("percentile(delay_days, 0.5)").alias("p50_days"),
        F.expr("percentile(delay_days, 0.9)").alias("p90_days"),
        F.max("delay_days").cast("long").alias("max_days"),
        F.count("*").alias("n"),
    )


@query(
    "activity_heatmap",
    """
    SELECT CAST((epoch_ms(ts) // 86400000 + 4) % 7 AS INT) AS dow,
           CAST((epoch_ms(ts) % 86400000) // 3600000 AS INT) AS hour,
           count(*) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY 1, 2
    """,
)
def q_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekday x hour activity heatmap (dow 0=Monday). Day-of-week is
    computed as pure epoch integer arithmetic — engine dayofweek()
    conventions disagree on week start, integer math does not. One
    aggregation on the 168-cell key."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            # integer DIV end-to-end (the docstring's promise): float
            # division of epoch_ms is only exact below 2^53
            F.expr(
                "CAST((unix_millis(ts) DIV 86400000 + 4) % 7 AS INT)"
            ).alias("dow"),
            F.expr(
                "CAST((unix_millis(ts) % 86400000) DIV 3600000 AS INT)"
            ).alias("hour"),
            "user_id",
        )
        .groupBy("dow", "hour")
        .agg(
            F.count("*").alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


@query(
    "source_drift_ks",
    """
    WITH d AS (
      SELECT n_chars,
             CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS ia,
             CASE WHEN source = 'src1' THEN 1 ELSE 0 END AS ib
      FROM documents WHERE source IN ('src0', 'src1')
    ),
    g AS (SELECT n_chars, CAST(sum(ia) AS BIGINT) AS da, CAST(sum(ib) AS BIGINT) AS db
          FROM d GROUP BY n_chars),
    c AS (
      SELECT n_chars,
             CAST(sum(da) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ca,
             CAST(sum(db) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cb,
             CAST(sum(da) OVER () AS BIGINT) AS na,
             CAST(sum(db) OVER () AS BIGINT) AS nb
      FROM g
    )
    SELECT CAST(max(abs(ca * nb - cb * na)) AS BIGINT) AS ks_num,
           min(na) AS n_a, min(nb) AS n_b,
           CAST(max(abs(ca * nb - cb * na)) AS DOUBLE) / (min(na) * min(nb)) AS ks
    FROM c
    """,
)
def q_source_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic between two
    sources' length distributions — the distribution-shift gate a
    pipeline runs when a new crawl lands. Computed EXACTLY: the max
    CDF gap is max |ca*nb - cb*na| over the merged value axis, all
    integer (cross-multiplied instead of dividing), with one float
    ratio at the edge. The sweep windows run over the distinct-value
    relation, bounded by the value domain, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    d = docs.where(F.col("source").isin("src0", "src1")).select(
        "n_chars",
        (F.col("source") == "src0").cast("long").alias("ia"),
        (F.col("source") == "src1").cast("long").alias("ib"),
    )
    g = d.groupBy("n_chars").agg(
        F.sum("ia").alias("da"), F.sum("ib").alias("db")
    )
    w = Window.orderBy("n_chars").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    c = g.select(
        F.sum("da").over(w).alias("ca"),
        F.sum("db").over(w).alias("cb"),
        F.sum("da").over(w_all).alias("na"),
        F.sum("db").over(w_all).alias("nb"),
    )
    gap = F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na"))
    return c.agg(
        F.max(gap).cast("long").alias("ks_num"),
        F.min("na").alias("n_a"),
        F.min("nb").alias("n_b"),
        (F.max(gap).cast("double") / (F.min("na") * F.min("nb"))).alias("ks"),
    )


@query(
    "hourly_baseline_dev",
    """
    WITH b AS (
      SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
             CAST((epoch_ms(ts) % 86400000) // 3600000 AS INT) AS hod,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT day, hod, n,
             CAST(COALESCE(sum(n) OVER tw, 0) AS BIGINT) AS base_sum,
             CAST(count(n) OVER tw AS BIGINT) AS base_n
      FROM b
      WINDOW tw AS (PARTITION BY hod ORDER BY day RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT day, hod, n, base_sum, base_n,
           CAST(n * base_n - base_sum AS BIGINT) AS dev_num
    FROM w WHERE base_n > 0
    """,
)
def q_hourly_baseline_dev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ops-monitoring anomaly shape: each hour's event count against
    its trailing 7-day SAME-HOUR baseline (hour-of-day partitioned
    RANGE window over integer day indices — RANGE over integers has
    identical peer semantics in both engines). The deviation is kept
    as the exact integer cross-product n*base_n - base_sum; consumers
    divide at the edge. Window partitions by hour-of-day — 24-way
    parallel, never global."""
    ev = load_table(spark, sf_dir, "events")
    epoch_ms = F.unix_millis(F.col("ts"))
    b = (
        ev.select(
            F.expr("unix_millis(ts) DIV 86400000").alias("day"),
            ((epoch_ms % 86400000) / 3600000).cast("int").alias("hod"),
        )
        .groupBy("day", "hod")
        .agg(F.count("*").alias("n"))
    )
    tw = (
        Window.partitionBy("hod").orderBy("day").rangeBetween(-7, -1)
    )
    w = b.select(
        "day",
        "hod",
        "n",
        F.coalesce(F.sum("n").over(tw), F.lit(0)).cast("long").alias("base_sum"),
        F.count("n").over(tw).cast("long").alias("base_n"),
    )
    return w.where(F.col("base_n") > 0).select(
        "day",
        "hod",
        "n",
        "base_sum",
        "base_n",
        (F.col("n") * F.col("base_n") - F.col("base_sum")).cast("long").alias("dev_num"),
    )


@query(
    "order_date_gaps",
    """
    WITH bounds AS (
      SELECT CAST(min(o_orderdate) AS DATE) AS lo, CAST(max(o_orderdate) AS DATE) AS hi
      FROM orders
    ),
    spine AS (
      SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    ),
    present AS (SELECT DISTINCT CAST(o_orderdate AS DATE) AS day FROM orders)
    SELECT CAST(s.day AS TIMESTAMP) AS day
    FROM spine s LEFT JOIN present p ON s.day = p.day
    WHERE p.day IS NULL
    """,
)
def q_order_date_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completeness audit: calendar days inside the data's own date
    range with ZERO orders — the missing-partition detector a lake
    health check runs nightly. The spine generates from the 1-row
    min/max aggregate (sequence explode, calendar-bounded); the
    present-days set is a distinct on the date key; an anti-join
    yields the holes."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.to_date("o_orderdate")).alias("lo"),
        F.max(F.to_date("o_orderdate")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    present = orders.select(F.to_date("o_orderdate").alias("day")).distinct()
    return (
        spine.join(present, "day", "left_anti")
        .select(F.col("day").cast("timestamp").alias("day"))
    )


@query(
    "dedup_rate_by_source",
    r"""
    SELECT source, count(*) AS n_docs,
           CAST(count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) ) AS BIGINT)
             AS n_unique,
           CAST(count(*) - count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
                AS BIGINT) AS n_dups,
           1.0 - CAST(count(DISTINCT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')))
                      AS DOUBLE) / count(*) AS dup_rate
    FROM documents GROUP BY source
    """,
)
def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplicate rate — THE headline number of a dedup
    report: docs whose normalized-content fingerprint collides within
    the source. One aggregation with a distinct on the md5 fingerprint;
    the ratio divides exact integers at the edge."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct(fp).alias("n_unique"),
        (F.count("*") - F.count_distinct(fp)).cast("long").alias("n_dups"),
        (F.lit(1.0) - F.count_distinct(fp).cast("double") / F.count("*")).alias(
            "dup_rate"
        ),
    )


@query(
    "winsorized_value_stats",
    """
    WITH c AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
    ),
    q AS (
      SELECT event_type,
             CAST(quantile_disc(cents, 0.05) AS BIGINT) AS p05,
             CAST(quantile_disc(cents, 0.95) AS BIGINT) AS p95
      FROM c GROUP BY event_type
    )
    SELECT c.event_type,
           CAST(sum(least(greatest(c.cents, q.p05), q.p95)) AS BIGINT) AS wsum_cents,
           count(*) AS n,
           CAST(sum(CASE WHEN c.cents < q.p05 OR c.cents > q.p95 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_clamped
    FROM c JOIN q ON c.event_type = q.event_type
    GROUP BY c.event_type
    """,
)
def q_winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized aggregation: clamp each value into its group's
    [p05, p95] band before summing — the outlier-robust mean's
    building block. DISCRETE percentiles (an actual data value, not an
    interpolation) keep the thresholds exact BIGINTs, so the clamp,
    the boundary comparisons, and the sum are pure integer arithmetic
    — interpolated 0.05-quantiles land on non-representable fractions
    where engine cast semantics (truncate vs round) diverge. Two
    passes sharing the event_type key."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    q05_95 = ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY cents)")
        .cast("long")
        .alias("p05"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY cents)")
        .cast("long")
        .alias("p95"),
    )
    clamped = ev.join(F.broadcast(q05_95), "event_type").select(
        "event_type",
        F.least(F.greatest(F.col("cents"), F.col("p05")), F.col("p95")).alias("w"),
        ((F.col("cents") < F.col("p05")) | (F.col("cents") > F.col("p95")))
        .cast("long")
        .alias("is_clamped"),
    )
    return clamped.groupBy("event_type").agg(
        F.sum("w").cast("long").alias("wsum_cents"),
        F.count("*").alias("n"),
        F.sum("is_clamped").alias("n_clamped"),
    )


@query(
    "part_triangles_topk",
    """
    WITH li AS (SELECT DISTINCT l_orderkey AS g, l_partkey AS pk FROM lineitem),
    e AS (
      SELECT DISTINCT a.pk AS a, b.pk AS b
      FROM li a JOIN li b ON a.g = b.g AND a.pk < b.pk
    ),
    t AS (
      SELECT e1.a, e1.b, e2.b AS c
      FROM e e1
      JOIN e e2 ON e1.a = e2.a AND e1.b < e2.b
      JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b
    ),
    m AS (
      SELECT a AS node FROM t
      UNION ALL SELECT b FROM t
      UNION ALL SELECT c FROM t
    )
    SELECT node AS l_partkey, CAST(count(*) AS BIGINT) AS tri_cnt
    FROM m GROUP BY node
    ORDER BY tri_cnt DESC, l_partkey LIMIT 10
    """,
)
def q_part_triangles_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph motif counting: top-10 parts by triangle participation in
    the parts-co-ordered graph (edge = two parts in the same order).

    The Spark side runs degree-oriented wedge enumeration
    (graph.triangle_participation) — per-source fan-out bounded by
    O(sqrt(m)) so hot hub parts can't produce the quadratic wedge
    blowup the oracle's naive a<b<c triple-join would hit at scale;
    both enumerate the identical triangle set. Final top-10 is a
    TakeOrderedAndProject, not a global window.
    """
    li = load_table(spark, sf_dir, "lineitem")
    edges = gr.cooccurrence_edges(li, "l_orderkey", "l_partkey")
    part_tris = gr.triangle_participation(edges)
    return (
        part_tris.select(F.col("node").alias("l_partkey"), "tri_cnt")
        .orderBy(F.desc("tri_cnt"), "l_partkey")
        .limit(10)
    )


@query(
    "unigram_fluency_topk",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    cnt AS (SELECT tok, count(*) AS c FROM tok GROUP BY tok),
    tot AS (SELECT sum(c) AS n FROM cnt),
    doc AS (
      SELECT doc_id, count(*) AS n_tok, sum(c) AS s
      FROM tok JOIN cnt USING (tok) GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
           CAST((s * 1000000000) // (n_tok * (SELECT n FROM tot)) AS BIGINT)
             AS mean_freq_ppb
    FROM doc ORDER BY mean_freq_ppb ASC, doc_id LIMIT 15
    """,
)
def q_unigram_fluency_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM fluency proxy: rank documents by mean corpus
    frequency of their tokens (lowest = most out-of-distribution), the
    cheap first-pass stand-in for perplexity filtering in an LLM data
    pipeline (reference has no text surface; SURVEY.md §2b group 3).

    Exactness: the score is the rational sum(freq)/(n_tok * N) floored
    at parts-per-billion in pure BIGINT arithmetic, so Spark and the
    oracle agree bit-for-bit (float log-probs would diverge in the
    last ulp across engines). Overflow bound: s * 1e9 <= doc_len *
    (N/vocab) * 1e9 — safe in int64 through ~sf100; beyond that drop
    the scale to ppm or lift to DECIMAL(38,0).

    Scale plan: one explode + one agg shuffle builds the unigram table
    (vocab-bounded, so it broadcasts back), per-doc scoring is a
    map-side broadcast join + one agg shuffle on doc_id, and the
    global top-15 is a TakeOrderedAndProject.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    cnt = tok.groupBy("tok").agg(F.count("*").alias("c"))
    tot = cnt.agg(F.sum("c").alias("n"))
    doc = (
        tok.join(F.broadcast(cnt), "tok")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tok"), F.sum("c").alias("s"))
    )
    return (
        doc.crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.col("n_tok").cast("long").alias("n_tok"),
            F.expr("CAST((s * 1000000000) DIV (n_tok * n) AS BIGINT)").alias(
                "mean_freq_ppb"
            ),
        )
        .orderBy("mean_freq_ppb", "doc_id")
        .limit(15)
    )


@query(
    "attribution_by_channel",
    """
    WITH ev AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type IN ('view', 'click', 'purchase')
    ),
    marked AS (
      SELECT *,
        last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
          OVER w AS lt_channel,
        last_value(CASE WHEN event_type <> 'purchase' THEN ts END IGNORE NULLS)
          OVER w AS lt_ts,
        first_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
          OVER w AS ft_channel
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    conv AS (
      SELECT
        CASE WHEN lt_ts IS NOT NULL AND lt_ts >= ts - INTERVAL 7 DAY
             THEN lt_channel ELSE 'direct' END AS lt,
        COALESCE(ft_channel, 'direct') AS ft,
        cents
      FROM marked WHERE event_type = 'purchase'
    )
    SELECT model, channel, CAST(count(*) AS BIGINT) AS conversions,
           CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM (
      SELECT 'last_touch' AS model, lt AS channel, cents FROM conv
      UNION ALL
      SELECT 'first_touch', ft, cents FROM conv
    ) GROUP BY model, channel
    """,
)
def q_attribution_by_channel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing attribution: revenue per channel under last-touch
    (7-day lookback, else 'direct') and first-touch models, in one
    pass. The reference has no analytics surface; this is the standard
    conversion-attribution query an event-stream deployment runs.

    Plan: one per-user window shuffle computes both the carry-forward
    last touch and the carry-first touch (ROWS ... AND 1 PRECEDING —
    strictly-prior events only, (ts, event_id) total order so ties are
    deterministic), then two tiny channel aggregates union. Revenue is
    exact integer cents. No global windows; the user-keyed window is
    the same partitioning every sessionization query here uses.
    """
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("view", "click", "purchase")
    ).select(
        "user_id", "ts", "event_id", "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch_ch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    touch_ts = F.when(F.col("event_type") != "purchase", F.col("ts"))
    marked = ev.select(
        "*",
        F.last(touch_ch, ignorenulls=True).over(w).alias("lt_channel"),
        F.last(touch_ts, ignorenulls=True).over(w).alias("lt_ts"),
        F.first(touch_ch, ignorenulls=True).over(w).alias("ft_channel"),
    )
    conv = marked.where(F.col("event_type") == "purchase").select(
        F.when(
            F.col("lt_ts").isNotNull()
            & (F.col("lt_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAY")),
            F.col("lt_channel"),
        ).otherwise(F.lit("direct")).alias("lt"),
        F.coalesce(F.col("ft_channel"), F.lit("direct")).alias("ft"),
        "cents",
    )
    both = conv.select(F.lit("last_touch").alias("model"), F.col("lt").alias("channel"), "cents").unionAll(
        conv.select(F.lit("first_touch").alias("model"), F.col("ft").alias("channel"), "cents")
    )
    return both.groupBy("model", "channel").agg(
        F.count("*").alias("conversions"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


@query(
    "incremental_sessionize",
    """
    WITH ev AS (
      SELECT user_id, ts, event_id, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
    ),
    s AS (
      SELECT *, CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sid
      FROM (
        SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 3600000
                       THEN 1 ELSE 0 END AS is_new
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      )
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           CAST(count(*) AS BIGINT) AS n_events, CAST(sum(cents) AS BIGINT) AS cents
    FROM s GROUP BY user_id, sid
    """,
)
def q_incremental_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental session-view maintenance: history events (before the
    2024-01-16 cutoff) are folded into a compact per-session aggregate
    once; the delta batch is then merged via temporal.
    incremental_sessionize WITHOUT rescanning raw history — only the
    per-user last-session argmax of the compact state joins the delta.
    The oracle is the from-scratch sessionization of the full log; the
    incremental fold must reproduce it exactly (boundary sessions that
    straddle the cutoff are extended in place).

    At 100 TB the raw log scan is the whole cost of re-sessionizing;
    this pattern's cost is O(|delta| + |session state|) per day instead.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    cutoff = F.lit(CDC_CUTOFF).cast("timestamp")
    hist = ev.where(F.col("ts") < cutoff)
    delta = ev.where(F.col("ts") >= cutoff)
    hist_sessions = (
        so.sessionize(hist, gap_s=3600)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum("cents").alias("cents"),
        )
        .drop("session_id")
    )
    return tp.incremental_sessionize(hist_sessions, delta, gap_s=3600)


@query(
    "asof_nearest_click_error",
    """
    WITH u AS (
      SELECT event_id, user_id, ts AS _ts, 1 AS _side,
             CAST(NULL AS TIMESTAMP) AS _r_ts, CAST(NULL AS DOUBLE) AS _r_value
      FROM events WHERE event_type = 'error'
      UNION ALL
      SELECT CAST(NULL AS BIGINT), user_id, ts, 0, ts, value
      FROM events WHERE event_type = 'click'
    ),
    c AS (
      -- struct carries (not per-column): mirrors relational.asof_join's
      -- atomic matched-row semantics under NULL right values
      SELECT *,
        last_value(CASE WHEN _r_ts IS NOT NULL
                        THEN struct_pack(ts := _r_ts, val := _r_value) END
                   IGNORE NULLS) OVER wb AS _b,
        first_value(CASE WHEN _r_ts IS NOT NULL
                         THEN struct_pack(ts := _r_ts, val := _r_value) END
                    IGNORE NULLS) OVER wf AS _f
      FROM u
      WINDOW
        wb AS (PARTITION BY user_id ORDER BY _ts, _side, _r_value
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wf AS (PARTITION BY user_id ORDER BY _ts, _side DESC, _r_value
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    ),
    g AS (
      SELECT *,
        (_b IS NOT NULL AND epoch_ms(_ts) - epoch_ms(_b.ts) <= 1800000) AS b_ok,
        (_f IS NOT NULL AND epoch_ms(_f.ts) - epoch_ms(_ts) <= 1800000) AS f_ok
      FROM c
    )
    SELECT event_id, user_id, _ts AS ts,
      CASE WHEN use_b THEN _b.ts WHEN f_ok THEN _f.ts END AS asof_ts,
      CASE WHEN use_b THEN _b.val WHEN f_ok THEN _f.val END AS asof_value
    FROM (
      SELECT *, b_ok AND (NOT f_ok OR
               epoch_ms(_ts) - epoch_ms(_b.ts) <= epoch_ms(_f.ts) - epoch_ms(_ts))
             AS use_b
      FROM g
    ) WHERE _side = 1
    """,
)
def q_asof_nearest_click_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of join (pandas merge_asof nearest /
    kdb aj generalization): every error event paired with the CLOSEST
    click by the same user within +/-30 min, backward winning exact
    ties; per-side equal-ts ties resolve by mirrored value-tuple rules
    so the result is run-deterministic. Same union-merge shape as the
    backward as-of: ONE shuffle on user_id, both window orders share
    the exchange. The oracle replays the identical algorithm in SQL.
    """
    ev = load_table(spark, sf_dir, "events")
    err = ev.where(F.col("event_type") == "error").select("event_id", "user_id", "ts")
    clk = ev.where(F.col("event_type") == "click").select("user_id", "ts", "value")
    return rel.asof_join(
        err, clk,
        keys=["user_id"], left_ts="ts", right_ts="ts",
        value_cols=["value"], tolerance_ms=1_800_000, direction="nearest",
    )


@query(
    "daily_user_accounting",
    """
    WITH fd AS (
      SELECT user_id, CAST(min(ts) AS DATE) AS first_day FROM events GROUP BY user_id
    ),
    act AS (
      SELECT CAST(ts AS DATE) AS day, user_id FROM events GROUP BY 1, 2
    ),
    daily AS (
      SELECT act.day,
             CAST(count(*) AS BIGINT) AS active_users,
             CAST(sum(CASE WHEN fd.first_day = act.day THEN 1 ELSE 0 END) AS BIGINT)
               AS new_users
      FROM act JOIN fd USING (user_id) GROUP BY act.day
    )
    SELECT CAST(day AS TIMESTAMP) AS day, active_users, new_users,
           CAST(active_users - new_users AS BIGINT) AS returning_users,
           CAST(sum(new_users) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS cumulative_unique_users
    FROM daily
    """,
)
def q_daily_user_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active / new / returning / cumulative-unique users — the
    growth-accounting identity every event deployment reports.
    Cumulative distinct is EXACT without sketches: distinct-count of
    users-first-seen-per-day, then a running sum over the per-day
    relation (one row per day — its unpartitioned window is bounded by
    calendar size, the same deliberate exception the concurrency
    sweep documents). Two agg shuffles on user_id + (day,user_id),
    both fact-partitioned; the day-level rollup is tiny.
    """
    ev = load_table(spark, sf_dir, "events")
    act = ev.select(F.col("ts").cast("date").alias("day"), "user_id").distinct()
    # first_day from the already-distinct (day, user) relation — min of
    # a monotone cast is the cast of the min, so this equals min(ts)
    # per user without a second full-fact aggregation
    fd = act.groupBy("user_id").agg(F.min("day").alias("first_day"))
    daily = (
        act.join(fd, "user_id")
        .groupBy("day")
        .agg(
            F.count("*").alias("active_users"),
            F.sum((F.col("first_day") == F.col("day")).cast("long")).alias("new_users"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.col("day").cast("timestamp").alias("day"),
        "active_users",
        "new_users",
        (F.col("active_users") - F.col("new_users")).cast("long").alias("returning_users"),
        F.sum("new_users").over(w).cast("long").alias("cumulative_unique_users"),
    )


@query(
    "column_profile_orders",
    """
    SELECT 'o_orderkey' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_value,
           CAST(max(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_custkey', count(*), count(*) - count(o_custkey),
           count(DISTINCT o_custkey),
           CAST(min(o_custkey) AS VARCHAR), CAST(max(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus), min(o_orderstatus), max(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority), min(o_orderpriority), max(o_orderpriority)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
           count(DISTINCT o_orderdate),
           strftime(min(o_orderdate), '%Y-%m-%d %H:%M:%S'),
           strftime(max(o_orderdate), '%Y-%m-%d %H:%M:%S')
    FROM orders
    UNION ALL
    SELECT 'o_totalprice_cents', count(*), count(*) - count(o_totalprice),
           count(DISTINCT CAST(round(o_totalprice * 100) AS BIGINT)),
           CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS VARCHAR),
           CAST(max(CAST(round(o_totalprice * 100) AS BIGINT)) AS VARCHAR)
    FROM orders
    """,
)
def q_column_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style data-profile report: per column — row count,
    nulls, exact NDV, min/max — in engine-neutral string rendering
    (timestamps formatted, doubles profiled in exact integer cents).

    Plan shape: one branch PER COLUMN, unioned — each branch is a
    column-pruned parquet scan feeding a plain two-phase distinct agg.
    On columnar storage the six single-column scans read the same
    bytes as one six-column scan, and avoiding the multi-distinct
    Expand (x7 row multiplication through one shuffle) measured 5x
    faster at sf0.1. At 100 TB swap exact NDVs for
    approx_count_distinct partials and fuse back to one scan — the
    exact form is kept here for the hash-parity gate.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    as_str = lambda c: c.cast("string")  # noqa: E731
    as_ts = lambda c: F.date_format(c, "yyyy-MM-dd HH:mm:ss")  # noqa: E731
    ident = lambda c: c  # noqa: E731
    # (name, typed column, renderer applied AFTER the typed min/max —
    # aggregating the rendering instead would compare lexicographically)
    specs = [
        ("o_orderkey", F.col("o_orderkey"), as_str),
        ("o_custkey", F.col("o_custkey"), as_str),
        ("o_orderstatus", F.col("o_orderstatus"), ident),
        ("o_orderpriority", F.col("o_orderpriority"), ident),
        ("o_orderdate", F.col("o_orderdate"), as_ts),
        ("o_totalprice_cents", cents, as_str),
    ]
    import functools

    def branch(name, col, rend):
        return o.agg(
            F.lit(name).alias("column_name"),
            F.count("*").cast("long").alias("n_rows"),
            (F.count("*") - F.count(col)).cast("long").alias("n_nulls"),
            F.count_distinct(col).cast("long").alias("n_distinct"),
            rend(F.min(col)).alias("min_value"),
            rend(F.max(col)).alias("max_value"),
        )

    return functools.reduce(
        lambda a, b: a.unionAll(b), [branch(*spec) for spec in specs]
    )


@query(
    "trending_event_types",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, event_type, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    r AS (
      SELECT day, event_type, cnt,
             CAST(rank() OVER (PARTITION BY day ORDER BY cnt DESC, event_type)
                  AS BIGINT) AS rk
      FROM d
    )
    SELECT CAST(day AS TIMESTAMP) AS day, event_type, cnt, rk,
           CAST(lag(rk) OVER (PARTITION BY event_type ORDER BY day) AS BIGINT)
             AS prev_rk,
           CAST(lag(rk) OVER (PARTITION BY event_type ORDER BY day) - rk AS BIGINT)
             AS rank_delta
    FROM r
    """,
)
def q_trending_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending report: daily event-type leaderboard with day-over-day
    rank movement (positive rank_delta = climbing). prev_rk is the
    rank on the type's previous OBSERVED day (lag over the per-type
    day series — calendar gaps carry the last appearance, the usual
    leaderboard convention). Two windows over the tiny per-day
    aggregate; the fact table is touched by one agg shuffle only.
    """
    ev = load_table(spark, sf_dir, "events")
    d = (
        ev.groupBy(F.col("ts").cast("date").alias("day"), "event_type")
        .agg(F.count("*").alias("cnt"))
    )
    wd = Window.partitionBy("day").orderBy(F.desc("cnt"), "event_type")
    r = d.select(
        "day", "event_type", "cnt", F.rank().over(wd).cast("long").alias("rk")
    )
    wt = Window.partitionBy("event_type").orderBy("day")
    prev = F.lag("rk").over(wt)
    return r.select(
        F.col("day").cast("timestamp").alias("day"),
        "event_type", "cnt", "rk",
        prev.cast("long").alias("prev_rk"),
        (prev - F.col("rk")).cast("long").alias("rank_delta"),
    )


@query(
    "conversion_latency_percentiles",
    """
    WITH f AS (
      SELECT user_id,
        min(CASE WHEN event_type = 'view' THEN ts END) AS t_view
      FROM events GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id,
        min(e.ts) AS t_click
      FROM events e JOIN f ON e.user_id = f.user_id
      WHERE e.event_type = 'click' AND f.t_view IS NOT NULL AND e.ts > f.t_view
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t_click
      GROUP BY e.user_id
    ),
    lat AS (
      SELECT 'view_to_click' AS step,
             epoch_ms(c.t_click) - epoch_ms(f.t_view) AS ms
      FROM c JOIN f ON c.user_id = f.user_id
      UNION ALL
      SELECT 'click_to_purchase', epoch_ms(p.t_purchase) - epoch_ms(c.t_click)
      FROM p JOIN c ON p.user_id = c.user_id
    )
    SELECT step, CAST(count(*) AS BIGINT) AS n,
      CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY ms) AS BIGINT) AS p50_ms,
      CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY ms) AS BIGINT) AS p90_ms,
      CAST(max(ms) AS BIGINT) AS max_ms
    FROM lat GROUP BY step
    """,
)
def q_conversion_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion-latency distribution: per adjacent step pair
    (greedy in-order funnel, same semantics as analytics.funnel), the
    p50/p90/max time-to-convert in exact integer milliseconds with
    DISCRETE percentiles (an actual observed latency, so the quantile
    is engine-exact). Three user-keyed aggregates share one
    partitioning; latencies re-aggregate per step (2 rows out).
    """
    from goeventstream_spark.operators import analytics as an

    ev = load_table(spark, sf_dir, "events")
    f = an.funnel(ev, steps=("view", "click", "purchase"))
    lat = (
        f.where(F.col("t_click").isNotNull())
        .select(
            F.lit("view_to_click").alias("step"),
            (F.unix_millis("t_click") - F.unix_millis("t_view")).alias("ms"),
        )
        .unionAll(
            f.where(F.col("t_purchase").isNotNull()).select(
                F.lit("click_to_purchase").alias("step"),
                (F.unix_millis("t_purchase") - F.unix_millis("t_click")).alias("ms"),
            )
        )
    )
    return lat.groupBy("step").agg(
        F.count("*").alias("n"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY ms)").cast("long").alias("p50_ms"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY ms)").cast("long").alias("p90_ms"),
        F.max("ms").cast("long").alias("max_ms"),
    )


@query(
    "pareto_user_concentration",
    """
    WITH uc AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY user_id
    ),
    ranked AS (
      SELECT cnt, row_number() OVER (ORDER BY cnt DESC, user_id) AS rn,
             (SELECT count(*) FROM uc) AS n_users,
             (SELECT sum(cnt) FROM uc) AS total
      FROM uc
    )
    SELECT CAST(pct AS BIGINT) AS top_pct,
           CAST(count(*) AS BIGINT) AS n_top_users,
           CAST(sum(cnt) AS BIGINT) AS events_from_top,
           CAST(max(total) AS BIGINT) AS total_events,
           CAST((sum(cnt) * 1000000) // max(total) AS BIGINT) AS share_ppm
    FROM ranked
    CROSS JOIN (SELECT unnest([1, 5, 10, 25]) AS pct)
    WHERE rn <= (n_users * pct + 99) // 100
    GROUP BY pct
    """,
)
def q_pareto_user_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration report: what share of all events comes from
    the top 1/5/10/25% most active users. The per-user count relation
    shuffles once; the rank is a window over that compact relation
    (one row per user — at 100 TB partition it by count bucket or use
    the documented two-phase sweep; here user cardinality is the
    aggregate's output, already reduced). Shares are exact ppm integer
    floors; the top-k cut is ceil(n*pct/100) so both engines take
    identical row sets.
    """
    ev = load_table(spark, sf_dir, "events")
    uc = ev.groupBy("user_id").agg(F.count("*").alias("cnt"))
    # Scalable rank-free form: aggregate users into per-count buckets
    # (distinct activity counts are bounded — thousands, not billions),
    # then take whole buckets in descending count order plus an exact
    # partial slice of the boundary bucket. Users inside a bucket are
    # interchangeable (identical cnt), so the result equals ANY
    # user-level tie order — which is why the per-user row_number
    # oracle matches. The only window runs over the bucket relation.
    bc = uc.groupBy("cnt").agg(F.count("*").alias("nu"))
    w = Window.orderBy(F.desc("cnt")).rowsBetween(Window.unboundedPreceding, -1)
    bc2 = bc.select(
        "cnt", "nu", F.coalesce(F.sum("nu").over(w), F.lit(0)).alias("cum_before")
    )
    totals = uc.agg(F.count("*").alias("n_users"), F.sum("cnt").alias("total"))
    pcts = F.explode(F.array(*[F.lit(p) for p in (1, 5, 10, 25)])).alias("top_pct")
    taken = F.greatest(
        F.lit(0),
        F.least(F.col("nu"), F.expr("(n_users * top_pct + 99) DIV 100 - cum_before")),
    ).alias("taken")
    return (
        bc2.crossJoin(F.broadcast(totals))
        .select("cnt", "nu", "cum_before", "n_users", "total", pcts)
        .select("cnt", "total", F.col("top_pct"), taken)
        .groupBy("top_pct")
        .agg(
            F.sum("taken").cast("long").alias("n_top_users"),
            F.sum(F.col("taken") * F.col("cnt")).cast("long").alias("events_from_top"),
            F.max("total").cast("long").alias("total_events"),
            F.expr(
                "CAST((sum(taken * cnt) * 1000000) DIV max(total) AS BIGINT)"
            ).alias("share_ppm"),
        )
        .where(F.col("n_top_users") > 0)
        .select(
            F.col("top_pct").cast("long").alias("top_pct"),
            "n_top_users", "events_from_top", "total_events", "share_ppm",
        )
    )


@query(
    "audience_overlap_priorities",
    """
    WITH m AS (
      SELECT DISTINCT o_custkey, o_orderpriority AS pri FROM orders
    )
    SELECT a.pri AS pri_a, b.pri AS pri_b,
           CAST(count(*) AS BIGINT) AS both_customers
    FROM m a JOIN m b ON a.o_custkey = b.o_custkey AND a.pri < b.pri
    GROUP BY a.pri, b.pri
    """,
)
def q_audience_overlap_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience overlap matrix: for every pair of order priorities, how
    many customers ordered under BOTH — the exact form of the
    segment-overlap report ad/analytics systems estimate with theta
    sketches. Plan: distinct (customer, priority) memberships (one
    shuffle, output bounded by customers x 5 priorities), then a
    self-join on the customer key — membership lists are per-customer
    bounded (<= 5), so join fan-out is <= C(5,2) per customer. At
    100 TB with unbounded segment vocabularies, swap the self-join
    for per-segment HLL/theta sketch unions (sketches.py) — exact is
    kept for the parity gate.
    """
    o = load_table(spark, sf_dir, "orders")
    m = o.select(F.col("o_custkey"), F.col("o_orderpriority").alias("pri")).distinct()
    a = m.alias("a")
    b = m.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.pri") < F.col("b.pri")),
        )
        .groupBy(F.col("a.pri").alias("pri_a"), F.col("b.pri").alias("pri_b"))
        .agg(F.count("*").alias("both_customers"))
    )


@query(
    "scd2_point_in_time_join",
    """
    WITH sg AS (
      SELECT user_id, CAST(floor(value / 100) AS BIGINT) AS band, ts, event_id
      FROM events WHERE event_type = 'signup'
    ),
    runs AS (
      SELECT user_id, band, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      FROM (
        SELECT *, lag(band) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        FROM sg
      ) WHERE prev IS NULL OR band <> prev
    ),
    p AS (
      SELECT user_id, ts, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    )
    SELECT COALESCE(r.band, -1) AS signup_band,
           CAST(count(*) AS BIGINT) AS purchases,
           CAST(sum(p.cents) AS BIGINT) AS revenue_cents
    FROM p LEFT JOIN runs r
      ON p.user_id = r.user_id AND r.valid_from <= p.ts
         AND (r.valid_to IS NULL OR p.ts < r.valid_to)
    GROUP BY 1
    """,
)
def q_scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (repeatable) dimension join — the feature-store
    correctness pattern: each purchase joins the signup-value band
    that was valid AT PURCHASE TIME (never a later value: no leakage).
    The SCD2 runs partition each user's timeline, so the containment
    join is equivalently the backward as-of join on valid_from — the
    union-merge form, one shuffle, no interval theta-join. Equal-ts
    runs tiebreak on event_id in both engines (the zero-length run an
    equal-ts pair creates is never the container). Purchases before
    any signup fall into band -1.
    """
    ev = load_table(spark, sf_dir, "events")
    sg = ev.where(F.col("event_type") == "signup").select(
        "user_id",
        F.floor(F.col("value") / 100).cast("long").alias("band"),
        "ts",
        "event_id",
    )
    # run starts with the defining event_id carried (scd2_intervals
    # drops it; the equal-ts tiebreak below needs it) — same
    # change-detection window shape as temporal.scd2_intervals
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("band").over(w)
    starts = sg.withColumn("_chg", prev.isNull() | (F.col("band") != prev)).where(
        "_chg"
    ).select("user_id", "band", F.col("ts").alias("valid_from"), "event_id")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    joined = rel.asof_join(
        p,
        starts,
        keys=["user_id"],
        left_ts="ts",
        right_ts="valid_from",
        value_cols=["event_id", "band"],
    )
    return joined.groupBy(
        F.coalesce(F.col("asof_band"), F.lit(-1)).alias("signup_band")
    ).agg(
        F.count("*").alias("purchases"),
        F.sum("cents").cast("long").alias("revenue_cents"),
    )


@query(
    "pit_trailing_features",
    """
    WITH e AS (
      SELECT event_id, user_id, ts, event_type, epoch_ms(ts) AS ems FROM events
    ),
    feat AS (
      SELECT *,
        CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             OVER w AS BIGINT) AS views_7d,
        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             OVER w AS BIGINT) AS clicks_7d,
        CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             OVER w AS BIGINT) AS errors_7d
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ems
                   RANGE BETWEEN 604800000 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, ts, views_7d, clicks_7d, errors_7d
    FROM feat WHERE event_type = 'purchase'
    """,
)
def q_pit_trailing_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct trailing features: for every purchase,
    the user's 7-day trailing view/click/error counts STRICTLY before
    the purchase millisecond (RANGE frame ... AND 1 PRECEDING — no
    same-instant leakage, the training-serving-skew bug this pattern
    exists to prevent). One user-keyed window pass over the raw
    stream; the integer-ms RANGE frame is engine-exact. All three
    features share the frame, so Catalyst computes them in one sort.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id", "user_id", "ts", "event_type",
        F.unix_millis("ts").alias("ems"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ems")
        .rangeBetween(-604_800_000, -1)
    )
    feat = e.select(
        "event_id", "user_id", "ts", "event_type",
        F.sum((F.col("event_type") == "view").cast("long")).over(w).cast("long").alias("views_7d"),
        F.sum((F.col("event_type") == "click").cast("long")).over(w).cast("long").alias("clicks_7d"),
        F.sum((F.col("event_type") == "error").cast("long")).over(w).cast("long").alias("errors_7d"),
    )
    return feat.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "views_7d", "clicks_7d", "errors_7d"
    )


from goeventstream_spark.queries_llm import _SHINGLES as _SHINGLES_SQL


@query(
    "dedup_threshold_sweep",
    f"""
    WITH {_SHINGLES_SQL},
    sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jac AS (
      SELECT i.doc_a, i.doc_b,
             (i.n_common * 100) // (sa.n + sb.n - i.n_common) AS pct_floor
      FROM inter i
      JOIN sizes sa ON i.doc_a = sa.doc_id
      JOIN sizes sb ON i.doc_b = sb.doc_id
    )
    SELECT CAST(t AS BIGINT) AS threshold_pct,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM jac CROSS JOIN (SELECT unnest([50, 60, 70, 80, 90]) AS t)
    WHERE pct_floor >= t
    GROUP BY t
    """,
)
def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup tuning curve: near-duplicate pair counts at five Jaccard
    thresholds from ONE pass of the exact inverted-index pair
    generator — the sweep an operator runs to pick the production LSH
    threshold. Comparisons are integer floors ((n_common * 100) DIV
    union) so the threshold test is engine-exact — no float Jaccard
    crosses a boundary differently in the last ulp.
    """
    from goeventstream_spark.operators import dedup as dd

    docs = load_table(spark, sf_dir, "documents")
    sh = dd.shingles(docs, 3)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    jac = (
        inter.join(sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a")), "doc_a")
        .join(sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b")), "doc_b")
        .select(F.expr("(n_common * 100) DIV (n_a + n_b - n_common)").alias("pct_floor"))
    )
    ts = F.explode(F.array(*[F.lit(t) for t in (50, 60, 70, 80, 90)])).alias("t")
    return (
        jac.select("pct_floor", ts)
        .where(F.col("pct_floor") >= F.col("t"))
        .groupBy(F.col("t").cast("long").alias("threshold_pct"))
        .agg(F.count("*").alias("n_pairs"))
    )


@query(
    "weekly_lifecycle",
    """
    WITH wk AS (
      SELECT DISTINCT user_id,
             CAST(epoch_ms(ts) // 604800000 AS BIGINT) AS week
      FROM events
    ),
    lagged AS (
      SELECT user_id, week,
             lag(week) OVER (PARTITION BY user_id ORDER BY week) AS prev_week,
             row_number() OVER (PARTITION BY user_id ORDER BY week) AS rn
      FROM wk
    ),
    cls AS (
      SELECT week,
             CASE WHEN rn = 1 THEN 'new'
                  WHEN week - prev_week = 1 THEN 'retained'
                  ELSE 'resurrected' END AS stage
      FROM lagged
    ),
    churn AS (
      SELECT week + 1 AS week, 'churned' AS stage
      FROM lagged l
      WHERE NOT EXISTS (
        SELECT 1 FROM wk w2 WHERE w2.user_id = l.user_id AND w2.week = l.week + 1
      ) AND week + 1 <= (SELECT max(week) FROM wk)
    )
    SELECT week, stage, CAST(count(*) AS BIGINT) AS n_users
    FROM (SELECT * FROM cls UNION ALL SELECT * FROM churn)
    GROUP BY week, stage
    """,
)
def q_weekly_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth-accounting lifecycle matrix: per epoch-week, how many
    users are new (first week ever), retained (active prior week),
    resurrected (active before, but not prior week), and churned
    (active prior week, absent this week — attributed to the week of
    absence, bounded by the last observed week). The full identity
    behind daily_user_accounting's new/returning split.

    Plan: one distinct on (user, week), one user-keyed window for the
    lag/first flags, and the churn side is the SAME lagged relation
    anti-checked against next week (expressed as lead != week+1 — no
    correlated subquery at scale). Weeks are integer epoch-week
    ordinals — engine-identical arithmetic, no week-start conventions.
    """
    ev = load_table(spark, sf_dir, "events")
    wk = ev.select(
        "user_id",
        F.expr("CAST(unix_millis(ts) DIV 604800000 AS BIGINT)").alias("week"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("week")
    lagged = wk.select(
        "user_id",
        "week",
        F.lag("week").over(w).alias("prev_week"),
        F.lead("week").over(w).alias("next_week"),
        F.row_number().over(w).alias("rn"),
    )
    cls = lagged.select(
        "week",
        F.when(F.col("rn") == 1, "new")
        .when(F.col("week") - F.col("prev_week") == 1, "retained")
        .otherwise("resurrected")
        .alias("stage"),
    )
    max_week = wk.agg(F.max("week").alias("_max_week"))
    churn = (
        lagged.where(
            F.col("next_week").isNull() | (F.col("next_week") > F.col("week") + 1)
        )
        .crossJoin(F.broadcast(max_week))
        .where(F.col("week") + 1 <= F.col("_max_week"))
        .select((F.col("week") + 1).alias("week"), F.lit("churned").alias("stage"))
    )
    return cls.unionByName(churn).groupBy("week", "stage").agg(
        F.count("*").alias("n_users")
    )


@query(
    "revenue_mom_growth",
    """
    WITH m AS (
      SELECT strftime(o_orderdate, '%Y-%m') AS month,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents
      FROM orders GROUP BY 1
    )
    SELECT month, revenue_cents,
           lag(revenue_cents) OVER (ORDER BY month) AS prev_cents,
           CAST(revenue_cents - lag(revenue_cents) OVER (ORDER BY month) AS BIGINT)
             AS delta_cents,
           CAST(((revenue_cents - lag(revenue_cents) OVER (ORDER BY month)) * 1000000)
                // lag(revenue_cents) OVER (ORDER BY month) AS BIGINT) AS growth_ppm
    FROM m
    """,
)
def q_revenue_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth in exact integer cents and ppm
    (floor division — no float ratios to disagree on). The window runs
    over the per-month aggregate (one row per month: the same bounded
    unpartitioned-window exception the calendar rollups document).
    """
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month")).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("revenue_cents")
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue_cents").over(w)
    return m.select(
        "month",
        "revenue_cents",
        prev.alias("prev_cents"),
        (F.col("revenue_cents") - prev).cast("long").alias("delta_cents"),
        F.expr(
            "CAST(((revenue_cents - lag(revenue_cents) OVER (ORDER BY month)) * 1000000)"
            " DIV lag(revenue_cents) OVER (ORDER BY month) AS BIGINT)"
        ).alias("growth_ppm"),
    )
