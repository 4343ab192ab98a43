"""Round-3 batch G: rank-based quantile normalization of order values
(the feature-engineering "quantile transform") and an unnormalized Haar
wavelet pyramid over the hourly event series (multi-resolution
time-series compression).

Exactness: ranks come from the repo's distributed total-order rank
(``relational.exact_global_rank``) over a tie-free key; normalized
scores are ppm floors via truncating DIV; Haar smooth/detail
coefficients are pure BIGINT sums with ±1 signs (no division at all).

Reference parity note: the reference (GoEventStream) has no analytics
surface — these are SURVEY.md §2b group-2 extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goeventstream_spark.queries import query
from goeventstream_spark.sources import load_table


@query(
    "quantile_normalize_orders",
    """
    WITH c AS (
      SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ),
    r AS (
      SELECT o_orderkey, cents,
             CAST(row_number() OVER (ORDER BY cents, o_orderkey) AS BIGINT) AS rk,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM c
    )
    SELECT o_orderkey, cents,
           CAST((rk - 1) * 1000000 // (n - 1) AS BIGINT) AS norm_ppm
    FROM r
    """,
)
def q_quantile_normalize_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile (rank) normalization of order totals: each order's
    value mapped to its empirical-CDF position in ppm — the
    feature-engineering transform that makes any downstream model
    scale-free. Ties are broken by o_orderkey so the rank is total and
    the output deterministic.

    Scale plan: the rank is ``relational.exact_global_rank`` — range
    repartition + per-partition sort + a bounded one-row-per-partition
    offset window — i.e. it parallelizes exactly like a global sort;
    there is NO single-partition window over the data (the oracle's
    ``row_number() OVER (ORDER BY ...)`` is the semantic spec only).
    The normalization itself is a map-side ppm floor.
    """
    from goeventstream_spark.operators.relational import exact_global_rank

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("CAST(round(o_totalprice * 100) AS BIGINT)").alias("cents"),
    )
    ranked = exact_global_rank(orders, [F.col("cents"), F.col("o_orderkey")])
    return ranked.select(
        "o_orderkey",
        "cents",
        F.expr("CAST((_rk - 1) * 1000000 DIV (_n - 1) AS BIGINT)").alias(
            "norm_ppm"
        ),
    )


@query(
    "haar_hourly_pyramid",
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
    lv AS (
      SELECT l, hr // (1 << l) AS block,
             CAST(sum(c) AS BIGINT) AS s_sum,
             CAST(sum(c * (1 - 2 * ((hr // (1 << (l - 1))) % 2))) AS BIGINT)
               AS d_detail,
             CAST(count(*) AS BIGINT) AS n_hours
      FROM filled, (SELECT unnest([1, 2, 3]) AS l)
      GROUP BY 1, 2
    )
    SELECT CAST(l AS INT) AS level, block, s_sum, d_detail
    FROM lv WHERE n_hours = (1 << l)
    """,
)
def q_haar_hourly_pyramid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unnormalized Haar wavelet pyramid of the hourly event count
    (levels 1-3: 2h/4h/8h blocks): per block the smooth coefficient
    (block sum) and the detail coefficient (first-half sum minus
    second-half sum, via a ±1 sign from bit l-1 of the hour index) —
    the classic multi-resolution sketch for time-series compression
    and burst localization, exact because it is additions only.
    Partial edge blocks are dropped (n_hours must equal 2^level).

    Scale plan: one distributed hash agg builds the hourly series
    (O(time span) rows); the three pyramid levels are a 3-way
    map-side fan-out of that tiny series and one more agg keyed on
    (level, block). No windows, no sequential pass.
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
    levels = spark.range(1, 4).select(F.col("id").cast("int").alias("l"))
    lv = (
        filled.crossJoin(F.broadcast(levels))
        .groupBy(
            "l", F.expr("hr DIV shiftleft(1, l)").alias("block")
        )
        .agg(
            F.sum("c").cast("long").alias("s_sum"),
            F.sum(
                F.expr("c * (1 - 2 * ((hr DIV shiftleft(1, l - 1)) % 2))")
            )
            .cast("long")
            .alias("d_detail"),
            F.count("*").cast("long").alias("n_hours"),
        )
    )
    return lv.where(F.expr("n_hours = shiftleft(1, l)")).select(
        F.col("l").alias("level"), "block", "s_sum", "d_detail"
    )


# ---------------------------------------------------------------------------
# Bloom filter build + false-positive audit (deterministic md5 lanes)
# ---------------------------------------------------------------------------


@query(
    "bloom_filter_fp_audit",
    """
    WITH lanes AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS t(lane)),
    members AS (SELECT CAST(c_custkey AS VARCHAR) AS key FROM customer),
    bits AS (
      SELECT DISTINCT
             CAST(('0x' || substr(md5(CAST(lane AS VARCHAR) || '|' || key), 1, 4))
                    ::BIGINT % 16384 AS INT) AS pos
      FROM members CROSS JOIN lanes
    ),
    probes AS (
      SELECT CAST(c_custkey + 100000000 AS VARCHAR) AS pkey FROM customer
    ),
    pcells AS (
      SELECT DISTINCT pkey,
             CAST(('0x' || substr(md5(CAST(lane AS VARCHAR) || '|' || pkey), 1, 4))
                    ::BIGINT % 16384 AS INT) AS pos
      FROM probes CROSS JOIN lanes
    ),
    hits AS (
      SELECT pkey, count(*) AS n_pos, count(bits.pos) AS n_hit
      FROM pcells LEFT JOIN bits USING (pos)
      GROUP BY pkey
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_probes,
             CAST(sum(CASE WHEN n_hit = n_pos THEN 1 ELSE 0 END) AS BIGINT)
               AS fp_count
      FROM hits
    ),
    bc AS (SELECT CAST(count(*) AS BIGINT) AS bits_set FROM bits)
    SELECT bits_set, n_probes, fp_count,
           CAST(1000000 * fp_count // n_probes AS BIGINT) AS fp_ppm,
           CAST(floor(CAST(1000000 AS DOUBLE)
                * (CAST(bits_set AS DOUBLE) / 16384.0)
                * (CAST(bits_set AS DOUBLE) / 16384.0)
                * (CAST(bits_set AS DOUBLE) / 16384.0)
                * (CAST(bits_set AS DOUBLE) / 16384.0)) AS BIGINT)
             AS expected_fp_ppm
    FROM agg CROSS JOIN bc
    """,
)
def q_bloom_filter_fp_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter built from customer keys (m = 16384 bits, k = 4
    deterministic md5 lanes into one shared bit array), then audited
    with guaranteed-non-member probes: exact false-positive count/ppm
    vs the (bits_set/m)^k theoretical expectation — the sizing report
    a 100 TB join-pruning deployment needs before trusting a filter.

    Exactness: bit positions are md5-hex slices mod m (the repo's CMS
    idiom — identical in both engines); FP counting is pure integer;
    the expectation is one fixed double expression over exact integers.

    Scale plan: the bit array is at most m DISTINCT positions — a
    bounded-cardinality aggregate that broadcasts; probes then check
    membership map-side (left join against the broadcast bit set +
    one count-compare per probe). Nothing is ever keyed on the member
    corpus after the distinct.
    """
    cust = load_table(spark, sf_dir, "customer")
    lanes = spark.range(0, 4).select(F.col("id").cast("int").alias("lane"))

    def pos_expr(key_col: str):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.col("lane").cast("string"),
                            F.lit("|"),
                            F.col(key_col),
                        )
                    ),
                    1,
                    4,
                ),
                16,
                10,
            )
            .cast("long")
            % 16384
        ).cast("int")

    members = cust.select(F.col("c_custkey").cast("string").alias("key"))
    # Materialize once: the bit set feeds both the membership join and
    # the bits_set count, and without a checkpoint each consumer
    # re-runs the member scan + distinct. Bounded at m = 16384 rows.
    bits = (
        members.crossJoin(F.broadcast(lanes))
        .select(pos_expr("key").alias("pos"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    probes = cust.select(
        (F.col("c_custkey") + 100000000).cast("string").alias("pkey")
    )
    pcells = (
        probes.crossJoin(F.broadcast(lanes))
        .select("pkey", pos_expr("pkey").alias("pos"))
        .distinct()
    )
    hits = (
        pcells.join(F.broadcast(bits.withColumn("_hit", F.lit(1))), "pos", "left")
        .groupBy("pkey")
        .agg(
            F.count("*").alias("n_pos"),
            F.count("_hit").alias("n_hit"),
        )
    )
    agg = hits.agg(
        F.count("*").cast("long").alias("n_probes"),
        F.sum(F.when(F.col("n_hit") == F.col("n_pos"), 1).otherwise(0))
        .cast("long")
        .alias("fp_count"),
    )
    bc = bits.agg(F.count("*").cast("long").alias("bits_set"))
    frac = F.col("bits_set").cast("double") / F.lit(16384.0)
    return (
        agg.crossJoin(F.broadcast(bc))
        .select(
            "bits_set",
            "n_probes",
            "fp_count",
            F.expr("CAST(1000000 * fp_count DIV n_probes AS BIGINT)").alias(
                "fp_ppm"
            ),
            F.floor(F.lit(1000000.0) * frac * frac * frac * frac)
            .cast("long")
            .alias("expected_fp_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# Daily table checksums (order-independent content fingerprints)
# ---------------------------------------------------------------------------


@query(
    "daily_table_checksums",
    """
    WITH rows_h AS (
      SELECT epoch_ms(o_orderdate) // 86400000 AS day,
             ('0x' || substr(md5(
                CAST(o_orderkey AS VARCHAR) || '|' ||
                CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR) || '|' ||
                o_orderstatus), 1, 12))::BIGINT AS h
      FROM orders
    )
    SELECT day, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(h) AS BIGINT) AS checksum,
           CAST(min(h) AS BIGINT) AS min_h, CAST(max(h) AS BIGINT) AS max_h
    FROM rows_h GROUP BY day
    """,
)
def q_daily_table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day content fingerprints of the orders table: each row
    hashes (key | exact cents | status) through md5 into a 48-bit
    integer, and the day's checksum is the SUM of those hashes — an
    order-independent, partial-aggregable fingerprint (plus min/max
    sentinels), the anti-entropy primitive for reconciling two copies
    of a 100 TB table day-by-day without moving data: compare (n_rows,
    checksum) per day, re-sync only mismatched days.

    Exactness: md5 hex is identical across engines, the 12-hex-char
    slice fits int64 (sums of ~10^6 rows x 2^48 stay under 2^63), and
    addition is commutative — no ordering sensitivity anywhere.

    Scale plan: one map-side hash projection + one day-keyed agg with
    full map-side combine; output is O(days).
    """
    orders = load_table(spark, sf_dir, "orders")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.col("o_orderkey").cast("string"),
                    F.lit("|"),
                    F.expr(
                        "CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING)"
                    ),
                    F.lit("|"),
                    F.col("o_orderstatus"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    return (
        orders.select(
            F.expr("unix_millis(o_orderdate) DIV 86400000").alias("day"),
            h.alias("h"),
        )
        .groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum("h").cast("long").alias("checksum"),
            F.min("h").cast("long").alias("min_h"),
            F.max("h").cast("long").alias("max_h"),
        )
    )


# ---------------------------------------------------------------------------
# 2D skyline (Pareto front) via bounded-domain suffix minima
# ---------------------------------------------------------------------------


@query(
    "skyline_parts",
    """
    WITH p AS (
      SELECT p_partkey, p_name, p_size,
             CAST(round(p_retailprice * 100) AS BIGINT) AS cents
      FROM part
    ),
    per_size AS (SELECT p_size, min(cents) AS m FROM p GROUP BY 1),
    best AS (
      SELECT p_size, m AS m_eq,
             min(m) OVER (ORDER BY p_size DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS m_above
      FROM per_size
    )
    SELECT p.p_partkey AS partkey, p.p_size AS size, p.cents AS cents
    FROM p JOIN best USING (p_size)
    WHERE (best.m_above IS NULL OR best.m_above > p.cents)
      AND best.m_eq >= p.cents
    """,
)
def q_skyline_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2D skyline (Pareto front) of parts: keep every part not
    DOMINATED by another — dominated means some part has size >= and
    price <= with at least one strict. Equivalently a part survives
    iff no strictly-larger size offers an equal-or-lower price AND its
    own size class offers nothing cheaper (ties in both dims don't
    dominate, so equal-price minima within a size all survive).

    Scale plan: the naive skyline is an O(n^2) self-join; this plans
    as one hash agg to the per-size minimum (bounded: the dominance
    test only ever needs the best price per size), a suffix-min window
    over the DISTINCT SIZE DOMAIN (50 rows — O(domain), not O(rows)),
    and a broadcast join back to the parts. Exact integer cents
    end-to-end.
    """
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_size",
        F.expr("CAST(round(p_retailprice * 100) AS BIGINT)").alias("cents"),
    )
    per_size = part.groupBy("p_size").agg(F.min("cents").alias("m"))
    from pyspark.sql import Window as W

    w = W.orderBy(F.desc("p_size")).rowsBetween(W.unboundedPreceding, -1)
    best = per_size.select(
        "p_size",
        F.col("m").alias("m_eq"),
        F.min("m").over(w).alias("m_above"),
    )
    return (
        part.join(F.broadcast(best), "p_size")
        .where(
            (F.col("m_above").isNull() | (F.col("m_above") > F.col("cents")))
            & (F.col("m_eq") >= F.col("cents"))
        )
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_size").alias("size"),
            "cents",
        )
    )


# ---------------------------------------------------------------------------
# Leakage-safe train/val split (split by near-dup cluster, not by doc)
# ---------------------------------------------------------------------------


def _leakage_sql() -> str:
    from goeventstream_spark.queries_llm import _JPAIRS_CTE

    return f"""
    WITH RECURSIVE {_JPAIRS_CTE},
    assign AS (
      SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.id
    ),
    tagged AS (
      SELECT doc_id, cluster_id,
             CASE WHEN ('0x' || substr(md5(CAST(cluster_id AS VARCHAR)), 1, 4))
                         ::BIGINT % 10 = 0
                  THEN 'val' ELSE 'train' END AS split
      FROM assign
    ),
    straddle AS (
      SELECT CAST(count(*) AS BIGINT) AS straddling_clusters FROM (
        SELECT cluster_id FROM tagged
        GROUP BY cluster_id HAVING count(DISTINCT split) > 1
      )
    )
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT cluster_id) AS BIGINT) AS n_clusters,
           straddling_clusters
    FROM tagged CROSS JOIN straddle
    GROUP BY split, straddling_clusters
    """


@query("leakage_safe_split", _leakage_sql())
def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val split: documents are split by the md5 of
    their NEAR-DUP CLUSTER id (the exact-Jaccard connected components
    of ``dedup_clusters``), never by doc id — so near-duplicates can
    never straddle the boundary and leak evaluation data into
    training. Reports per-split doc/cluster counts plus an executable
    straddle audit (count of clusters seen in both splits — proved 0
    by running the check, not by assumption).

    Scale plan: clustering is the ``dedup.dedup_clusters``
    min-label propagation (at 100 TB the pair source swaps to the LSH
    candidate path); the split tag is one map-side hash of the cluster
    label, and both report and audit are small aggregations keyed on
    cluster/split.
    """
    from goeventstream_spark.operators import dedup as dd
    from goeventstream_spark.operators import text as tx  # noqa: F401

    docs = load_table(spark, sf_dir, "documents")
    clusters = dd.dedup_clusters(dd.ngram_jaccard_pairs(docs), all_docs=docs)
    tagged = clusters.select(
        "doc_id",
        "cluster_id",
        F.when(
            F.conv(
                F.substring(F.md5(F.col("cluster_id").cast("string")), 1, 4),
                16,
                10,
            ).cast("long")
            % 10
            == 0,
            F.lit("val"),
        )
        .otherwise(F.lit("train"))
        .alias("split"),
    )
    straddle = (
        tagged.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("ns"))
        .where(F.col("ns") > 1)
        .agg(F.count("*").cast("long").alias("straddling_clusters"))
    )
    return (
        tagged.groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count_distinct("cluster_id").cast("long").alias("n_clusters"),
        )
        .crossJoin(F.broadcast(straddle))
    )
