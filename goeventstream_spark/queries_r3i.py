"""Round-3 batch I: functional-dependency discovery (schema profiling)
and equi-depth histogram boundaries (the ANALYZE-style optimizer
statistic), both exact.

Reference parity note: the reference (GoEventStream) has no analytics
surface — these are SURVEY.md §2b group-2 extensions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goeventstream_spark.queries import query
from goeventstream_spark.sources import load_table


@query(
    "fd_violation_audit",
    """
    WITH li AS (SELECT l_orderkey, l_partkey, l_suppkey FROM lineitem),
    o AS (SELECT o_orderkey, o_custkey, o_orderpriority FROM orders),
    fd1 AS (  -- l_orderkey -> l_partkey? (false: orders have many parts)
      SELECT 'l_orderkey->l_partkey' AS fd,
             CAST(count(*) AS BIGINT) AS lhs_values,
             CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violations
      FROM (SELECT l_orderkey, count(DISTINCT l_partkey) AS nd FROM li GROUP BY 1)
    ),
    fd2 AS (  -- l_partkey -> l_suppkey? (false: parts have many suppliers)
      SELECT 'l_partkey->l_suppkey' AS fd,
             CAST(count(*) AS BIGINT) AS lhs_values,
             CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violations
      FROM (SELECT l_partkey, count(DISTINCT l_suppkey) AS nd FROM li GROUP BY 1)
    ),
    fd3 AS (  -- o_orderkey -> o_custkey? (true: PK determines everything)
      SELECT 'o_orderkey->o_custkey' AS fd,
             CAST(count(*) AS BIGINT) AS lhs_values,
             CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violations
      FROM (SELECT o_orderkey, count(DISTINCT o_custkey) AS nd FROM o GROUP BY 1)
    ),
    fd4 AS (  -- o_custkey -> o_orderpriority? (false)
      SELECT 'o_custkey->o_orderpriority' AS fd,
             CAST(count(*) AS BIGINT) AS lhs_values,
             CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violations
      FROM (SELECT o_custkey, count(DISTINCT o_orderpriority) AS nd FROM o GROUP BY 1)
    ),
    u AS (
      SELECT * FROM fd1 UNION ALL SELECT * FROM fd2
      UNION ALL SELECT * FROM fd3 UNION ALL SELECT * FROM fd4
    )
    SELECT fd, lhs_values, violations,
           CAST(1000000 * violations // lhs_values AS BIGINT) AS violation_ppm,
           CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS INT) AS holds
    FROM u
    """,
)
def q_fd_violation_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery over candidate column pairs
    (the schema-profiling pass that finds join keys, denormalization
    opportunities, and broken invariants): for each candidate
    ``A -> B``, count LHS values with more than one distinct B —
    zero violations means the FD holds exactly.

    Scale plan: each candidate is one (A)-keyed agg with a distinct-B
    count (two-level hash agg, map-side combined); candidates run as
    independent branches of one plan and the report is a 4-row union.
    """

    def audit(df: DataFrame, lhs: str, rhs: str) -> DataFrame:
        return (
            df.groupBy(lhs)
            .agg(F.count_distinct(rhs).alias("nd"))
            .agg(
                F.lit(f"{lhs}->{rhs}").alias("fd"),
                F.count("*").cast("long").alias("lhs_values"),
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                .cast("long")
                .alias("violations"),
            )
        )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    u = (
        audit(li, "l_orderkey", "l_partkey")
        .unionAll(audit(li, "l_partkey", "l_suppkey"))
        .unionAll(audit(o, "o_orderkey", "o_custkey"))
        .unionAll(audit(o, "o_custkey", "o_orderpriority"))
    )
    return u.select(
        "fd",
        "lhs_values",
        "violations",
        F.expr("CAST(1000000 * violations DIV lhs_values AS BIGINT)").alias(
            "violation_ppm"
        ),
        F.when(F.col("violations") == 0, 1).otherwise(0).cast("int").alias("holds"),
    )


@query(
    "equi_depth_boundaries",
    """
    WITH c AS (
      SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem
    ),
    r AS (
      SELECT cents,
             CAST(row_number() OVER (ORDER BY cents) AS BIGINT) AS rk,
             CAST(count(*) OVER () AS BIGINT) AS n
      FROM c
    ),
    b AS (SELECT unnest(range(1, 16)) AS bucket)
    SELECT CAST(bucket AS INT) AS bucket,
           CAST(min(CASE WHEN rk >= (bucket * n) // 16 THEN cents END) AS BIGINT)
             AS boundary_cents
    FROM r CROSS JOIN b
    GROUP BY bucket
    """,
)
def q_equi_depth_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram boundaries (15 internal cut points of a
    16-bucket histogram) over lineitem extended price — the ANALYZE
    statistic an optimizer uses for selectivity estimation, computed
    EXACTLY: boundary b = the value whose global rank is the smallest
    >= b*n/16. Duplicate-heavy columns are handled by rank (the same
    value may serve several boundaries).

    Scale plan: the rank is ``relational.exact_global_rank`` (global-
    sort-shaped, no data-row single-partition window — the oracle's
    plain window is the semantic spec); boundary extraction is a
    conditional-min agg over a broadcast 15-row bucket dim, one
    exchange.
    """
    from goeventstream_spark.operators.relational import exact_global_rank

    c = load_table(spark, sf_dir, "lineitem").select(
        F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)").alias("cents")
    )
    ranked = exact_global_rank(c, [F.col("cents")])
    buckets = spark.range(1, 16).select(F.col("id").cast("int").alias("bucket"))
    return (
        ranked.crossJoin(F.broadcast(buckets))
        .groupBy("bucket")
        .agg(
            F.min(
                F.when(
                    F.col("_rk") >= F.expr("(bucket * _n) DIV 16"), F.col("cents")
                )
            )
            .cast("long")
            .alias("boundary_cents")
        )
    )
