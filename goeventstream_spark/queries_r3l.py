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
