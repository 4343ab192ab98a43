"""Round-3 batch L: sorted-neighborhood entity-resolution blocking —
the second classic ER candidate-generation scheme (Hernandez &
Stolfo's merge/purge), complementing ``er_golden_parts``'s
attribute-equality blocking.

Reference parity note: the reference (GoEventStream) has no analytics
surface — this is a SURVEY.md §2b group-2 extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goeventstream_spark.queries import query
from goeventstream_spark.sources import load_table


@query(
    "er_sorted_neighborhood_pairs",
    """
    WITH r AS (
      SELECT p_partkey, p_name,
             CAST(row_number() OVER (ORDER BY p_name, p_partkey) AS BIGINT) AS rk
      FROM part
    )
    SELECT a.p_partkey AS part_a, b.p_partkey AS part_b,
           CAST(b.rk - a.rk AS BIGINT) AS rank_gap,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS lev
    FROM r a JOIN r b
      ON b.rk > a.rk AND b.rk - a.rk <= 5
    WHERE levenshtein(a.p_name, b.p_name) <= 3
    """,
)
def q_er_sorted_neighborhood_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood ER blocking (Hernandez & Stolfo, SIGMOD'95
    merge/purge): sort all records by the name key, slide a window of
    5 over the sorted order, and verify candidates with bounded
    Levenshtein — the blocking scheme that catches near-duplicates
    attribute-equality blocks miss (records whose blocking attribute
    itself is dirty) at O(n * w) candidate cost instead of O(n^2).

    Scale plan: the sort rank is ``relational.exact_global_rank``
    (global-sort-shaped, never a data-row single-partition window —
    the oracle's plain window is the semantic spec); the rank-band
    self-join is BANDED, not theta: each row fans out map-side to its
    rank-bucket and the next (2 rows), the join keys on the bucket
    (equi hash join), and the gap predicate filters inside — the
    standard band-join decomposition, |candidates| = n * w. The
    bounded ``levenshtein(_, _, 3)`` early-exit verifies.
    """
    from goeventstream_spark.operators.relational import exact_global_rank

    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    ranked = exact_global_rank(part, [F.col("p_name"), F.col("p_partkey")]).select(
        "p_partkey", "p_name", F.col("_rk").alias("rk")
    )
    w = 5
    # band-join decomposition: left side fans out to (its bucket) and
    # (its bucket + 1) so every pair with 0 < gap <= w shares a key.
    left = ranked.select(
        "p_partkey",
        "p_name",
        "rk",
        F.explode(
            F.array(
                F.expr(f"rk DIV {w}"), F.expr(f"rk DIV {w} + 1")
            )
        ).alias("bucket"),
    )
    right = ranked.select(
        F.col("p_partkey").alias("b_partkey"),
        F.col("p_name").alias("b_name"),
        F.col("rk").alias("b_rk"),
        F.expr(f"rk DIV {w}").alias("bucket"),
    )
    bounded = F.levenshtein(F.col("p_name"), F.col("b_name"), 3)
    return (
        left.join(right, "bucket")
        .where((F.col("b_rk") > F.col("rk")) & (F.col("b_rk") - F.col("rk") <= w))
        .where(bounded >= 0)
        .select(
            F.col("p_partkey").alias("part_a"),
            F.col("b_partkey").alias("part_b"),
            (F.col("b_rk") - F.col("rk")).cast("long").alias("rank_gap"),
            F.levenshtein(F.col("p_name"), F.col("b_name"))
            .cast("long")
            .alias("lev"),
        )
    )


# ---------------------------------------------------------------------------
# Vocabulary drift between corpus halves
# ---------------------------------------------------------------------------


@query(
    "vocab_drift_topk",
    """
    WITH med AS (
      SELECT CAST((min(doc_id) + max(doc_id)) // 2 AS BIGINT) AS mid
      FROM documents
    ),
    toks AS (
      SELECT CASE WHEN doc_id <= mid THEN 0 ELSE 1 END AS half,
             unnest(string_split(text, ' ')) AS tok
      FROM documents CROSS JOIN med
    ),
    tc AS (
      SELECT half, tok, CAST(count(*) AS BIGINT) AS c
      FROM toks WHERE tok <> '' GROUP BY 1, 2
    ),
    tot AS (SELECT half, CAST(sum(c) AS BIGINT) AS n FROM tc GROUP BY 1),
    wide AS (
      SELECT tok,
             CAST(coalesce(sum(CASE WHEN tc.half = 0 THEN 1000000 * c // n END), 0)
                  AS BIGINT) AS ppm_0,
             CAST(coalesce(sum(CASE WHEN tc.half = 1 THEN 1000000 * c // n END), 0)
                  AS BIGINT) AS ppm_1,
             CAST(sum(c) AS BIGINT) AS total_c
      FROM tc JOIN tot ON tc.half = tot.half
      GROUP BY tok
    )
    SELECT tok, ppm_0, ppm_1,
           CAST(abs(ppm_1 - ppm_0) AS BIGINT) AS drift_ppm
    FROM wide WHERE total_c >= 20
    ORDER BY drift_ppm DESC, tok LIMIT 20
    """,
)
def q_vocab_drift_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary drift report: the 20 tokens whose relative frequency
    (exact ppm of each half's token mass) moved most between the first
    and second half of the corpus (split at the doc_id midpoint — the
    stand-in for a time axis) — the cheap distribution-shift monitor a
    training pipeline runs between crawl snapshots before trusting a
    data mix. A minimum-support filter (>= 20 occurrences) keeps
    one-off tokens from dominating the ranking.

    Scale plan: one (half, token) hash agg over the exploded tokens
    (map-side combined), a 2-row totals dim joined back broadcast, a
    token-keyed pivot agg, and a TakeOrderedAndProject top-20.
    """
    docs = load_table(spark, sf_dir, "documents")
    med = docs.agg(
        F.expr("CAST((min(doc_id) + max(doc_id)) DIV 2 AS BIGINT)").alias("mid")
    )
    toks = (
        docs.crossJoin(F.broadcast(med))
        .select(
            F.when(F.col("doc_id") <= F.col("mid"), 0).otherwise(1).alias("half"),
            F.explode(F.split("text", " ")).alias("tok"),
        )
        .where(F.col("tok") != "")
    )
    tc = toks.groupBy("half", "tok").agg(F.count("*").cast("long").alias("c"))
    tot = tc.groupBy("half").agg(F.sum("c").cast("long").alias("n"))
    wide = (
        tc.join(F.broadcast(tot), "half")
        .groupBy("tok")
        .agg(
            F.coalesce(
                F.sum(F.expr("CASE WHEN half = 0 THEN 1000000 * c DIV n END")),
                F.lit(0),
            )
            .cast("long")
            .alias("ppm_0"),
            F.coalesce(
                F.sum(F.expr("CASE WHEN half = 1 THEN 1000000 * c DIV n END")),
                F.lit(0),
            )
            .cast("long")
            .alias("ppm_1"),
            F.sum("c").cast("long").alias("total_c"),
        )
    )
    return (
        wide.where(F.col("total_c") >= 20)
        .select(
            "tok",
            "ppm_0",
            "ppm_1",
            F.abs(F.col("ppm_1") - F.col("ppm_0")).cast("long").alias("drift_ppm"),
        )
        .orderBy(F.desc("drift_ppm"), "tok")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Line-number completeness audit (dense-sequence invariant)
# ---------------------------------------------------------------------------


@query(
    "linenumber_gap_audit",
    """
    WITH g AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
             CAST(min(l_linenumber) AS BIGINT) AS min_ln,
             CAST(max(l_linenumber) AS BIGINT) AS max_ln,
             CAST(count(DISTINCT l_linenumber) AS BIGINT) AS n_distinct
      FROM lineitem GROUP BY 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN min_ln = 1 AND max_ln = n_lines
                          AND n_distinct = n_lines
                         THEN 0 ELSE 1 END) AS BIGINT) AS broken_orders,
           CAST(sum(CASE WHEN n_distinct < n_lines THEN 1 ELSE 0 END) AS BIGINT)
             AS dup_linenumbers,
           CAST(sum(CASE WHEN min_ln <> 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS bad_starts,
           CAST(sum(CASE WHEN max_ln <> n_lines THEN 1 ELSE 0 END) AS BIGINT)
             AS gapped
    FROM g
    """,
)
def q_linenumber_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-sequence invariant audit: every order's line numbers must
    be exactly 1..count with no duplicates or gaps (min=1, max=count,
    all distinct — the three checks jointly imply density). The
    contract check for any child-sequence column (CDC line items,
    message parts, chunk indices) after merges and reprocessing.

    Scale plan: one orderkey-keyed agg (map-side combined) + a 1-row
    rollup; no windows, no sort.
    """
    li = load_table(spark, sf_dir, "lineitem")
    g = li.groupBy("l_orderkey").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.min("l_linenumber").cast("long").alias("min_ln"),
        F.max("l_linenumber").cast("long").alias("max_ln"),
        F.count_distinct("l_linenumber").cast("long").alias("n_distinct"),
    )
    return g.agg(
        F.count("*").cast("long").alias("n_orders"),
        F.sum(
            F.when(
                (F.col("min_ln") == 1)
                & (F.col("max_ln") == F.col("n_lines"))
                & (F.col("n_distinct") == F.col("n_lines")),
                0,
            ).otherwise(1)
        )
        .cast("long")
        .alias("broken_orders"),
        F.sum(F.when(F.col("n_distinct") < F.col("n_lines"), 1).otherwise(0))
        .cast("long")
        .alias("dup_linenumbers"),
        F.sum(F.when(F.col("min_ln") != 1, 1).otherwise(0))
        .cast("long")
        .alias("bad_starts"),
        F.sum(F.when(F.col("max_ln") != F.col("n_lines"), 1).otherwise(0))
        .cast("long")
        .alias("gapped"),
    )


# ---------------------------------------------------------------------------
# Dedup storage-savings report per source
# ---------------------------------------------------------------------------


@query(
    "dedup_savings_by_source",
    """
    WITH h AS (
      SELECT doc_id, source, n_chars,
             md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
               AS content_hash
      FROM documents
    ),
    keep AS (
      SELECT content_hash, min(doc_id) AS keep_doc_id FROM h GROUP BY 1
    )
    SELECT h.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN h.doc_id <> k.keep_doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS dropped_docs,
           CAST(sum(h.n_chars) AS BIGINT) AS chars_total,
           CAST(sum(CASE WHEN h.doc_id <> k.keep_doc_id THEN h.n_chars ELSE 0 END)
                AS BIGINT) AS chars_dropped,
           CAST(1000000 * sum(CASE WHEN h.doc_id <> k.keep_doc_id
                                   THEN h.n_chars ELSE 0 END)
                // sum(h.n_chars) AS BIGINT) AS savings_ppm
    FROM h JOIN keep k USING (content_hash)
    GROUP BY h.source
    """,
)
def q_dedup_savings_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-savings report for exact dedup, per source: how many
    docs and how many characters each source would shed if only the
    min-id winner per content hash survives (same normalization and
    winner rule as ``exact_dedup``) — the sizing readout that decides
    whether the dedup pass pays for itself at 100 TB.

    Scale plan: one hash projection, one (content_hash) agg for the
    winners, one hash-keyed join back, one source-keyed rollup — all
    map-side-combinable, no windows.
    """
    from goeventstream_spark.operators.dedup import normalized_text

    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(normalized_text("text")).alias("content_hash"),
    )
    keep = h.groupBy("content_hash").agg(F.min("doc_id").alias("keep_doc_id"))
    dropped = F.when(F.col("doc_id") != F.col("keep_doc_id"), 1).otherwise(0)
    dropped_chars = F.when(
        F.col("doc_id") != F.col("keep_doc_id"), F.col("n_chars")
    ).otherwise(0)
    return (
        h.join(keep, "content_hash")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(dropped).cast("long").alias("dropped_docs"),
            F.sum("n_chars").cast("long").alias("chars_total"),
            F.sum(dropped_chars).cast("long").alias("chars_dropped"),
            F.expr(
                "CAST(1000000 * sum(CASE WHEN doc_id <> keep_doc_id "
                "THEN n_chars ELSE 0 END) DIV sum(n_chars) AS BIGINT)"
            ).alias("savings_ppm"),
        )
    )
