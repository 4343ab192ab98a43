"""Graph analytics over relational data: edge-list aggregation and a
fixed-point (exact-integer) PageRank via unrolled iterative joins.

The reference has no graph surface (SURVEY.md §2a "explicitly absent");
this is the standard "entity influence" extension a deployment builds on
the same tables. The interesting part is the *scale split*:

1. Edge aggregation is the heavy stage — it scans the fact table once,
   broadcast-joins the dims, and shuffles once on the (src, dst) pair.
   At 100 TB this is the only stage that touches big data.
2. The aggregated graph (distinct src/dst pairs — e.g. nation×nation is
   ≤ 625 rows) is tiny, so the power iterations are joins over a
   broadcast-sized relation: k iterations = k cheap stages, no driver
   loop over .collect() rows, no single-partition windows.

All arithmetic is fixed-point BIGINT (scores scaled by 1e12, weights
normalized to parts-per-million), so every engine computes bit-identical
ranks: integer multiply/divide/sum is exact and associative, unlike
float PageRank whose sums depend on reduction order.

Overflow bounds: score <= SCALE (1e12) after normalization-loss, weight
wn <= 1e6, so score*wn <= 1e18 < 2^63.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000_000_000  # 1e12 fixed-point score scale
W_SCALE = 1_000_000  # weights normalized to parts-per-million


def nation_trade_edges(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    customer: DataFrame,
) -> DataFrame:
    """Weighted edge list supplier-nation -> customer-nation, weight =
    number of lineitems shipped along that pair.

    Plan: lineitem joins supplier (broadcast dim) for the source nation
    and orders->customer (orders is fact-sized — hash join on orderkey;
    customer broadcast) for the destination nation, then one aggregation
    shuffle on the (src, dst) pair.
    """
    src = lineitem.join(
        F.broadcast(supplier.select("s_suppkey", F.col("s_nationkey").alias("src"))),
        lineitem.l_suppkey == F.col("s_suppkey"),
    )
    dst = orders.join(
        F.broadcast(customer.select("c_custkey", F.col("c_nationkey").alias("dst"))),
        orders.o_custkey == F.col("c_custkey"),
    ).select("o_orderkey", "dst")
    return (
        src.join(dst, src.l_orderkey == dst.o_orderkey)
        .groupBy("src", "dst")
        .agg(F.count("*").alias("w"))
    )


def pagerank_fixed_point(edges: DataFrame, iterations: int = 3) -> DataFrame:
    """Exact fixed-point PageRank (damping 0.85) on an aggregated edge
    list (src, dst, w), unrolled ``iterations`` times.

    Spec (all BIGINT ops, floor division):
      wn(e)   = (w * 1e6) DIV out_w(src)          -- ppm out-share
      s0(v)   = SCALE DIV n
      s_k+1(v)= (SCALE*15) DIV (100*n)
                + (85 * SUM_in((s_k(src) * wn) DIV 1e6)) DIV 100
    Nodes with no in-edges keep only the teleport term; dangling-node
    mass is dropped (documented spec choice — rank is a *relative*
    score here).

    The edge relation is assumed pre-aggregated and small (node-pair
    bounded); every join below is broadcast-sized. No .collect(), no
    global windows — the scalar n travels as a crossJoin of a 1-row agg.
    """
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    norm = (
        edges.join(out_w, "src")
        .select("src", "dst", F.expr(f"(w * {W_SCALE}) DIV out_w").alias("wn"))
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n_df = nodes.agg(F.count("*").alias("n"))
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", F.expr(f"{SCALE} DIV n").alias("rank")
    )
    for _ in range(iterations):
        contrib = (
            norm.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", F.expr(f"(rank * wn) DIV {W_SCALE}").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib.withColumnRenamed("dst", "node"), "node", "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                F.expr(
                    f"({SCALE} * 15) DIV (100 * n)"
                    f" + (85 * coalesce(in_sum, 0)) DIV 100"
                ).alias("rank"),
            )
        )
    return ranks
