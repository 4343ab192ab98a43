"""Hybrid retrieval: lexical + dense rankings fused with Reciprocal
Rank Fusion (Cormack et al., SIGIR'09).

The shape every RAG/data-curation pipeline needs: a sparse (word
overlap / BM25-family) retriever and a dense (embedding cosine)
retriever each produce a per-query ranking; RRF merges them without
score calibration because it only consumes RANKS:

    rrf(d) = sum over rankings r of  1 / (K + rank_r(d))

Scale shape: the query set is the small side everywhere — query words
and query vectors are broadcast, so both retrievers are a single
corpus scan each; the fusion joins two (n_queries x k)-row rankings,
trivially tiny. All fusion arithmetic is integer (scores scaled by
1e12 with integer division), so results hash-match any engine.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 1/(K+rank) scaled to integers: div(SCALE, K+rank). SCALE/61 ~ 1.6e10,
# sums of a few rankings stay far below int64.
RRF_K = 60
RRF_SCALE = 1_000_000_000_000


def lexical_jaccard_topk(
    docs: DataFrame, query_docs: DataFrame, k: int = 20
) -> DataFrame:
    """Word-set Jaccard ranking of the corpus against each query doc.

    ``query_docs`` is (query_id, text) — small, broadcast. One corpus
    words-explode feeds both the per-doc set sizes and the intersection
    counts; the only shuffle is the (query_id, doc_id) intersection
    aggregation, bounded by docs-that-share-a-word (the inverted-index
    candidate set), never all pairs. Jaccard = inter/union is a single
    int/int division — bit-identical across engines. Self-matches
    excluded. Returns (query_id, doc_id, jaccard, rk), rk <= k.
    """
    words = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("word")
    )
    qwords = query_docs.select(
        F.col("query_id"),
        F.explode(F.array_distinct(F.split("text", " "))).alias("word"),
    )
    sizes = words.groupBy("doc_id").agg(F.count("*").alias("n_doc"))
    qsizes = qwords.groupBy("query_id").agg(F.count("*").alias("n_query"))
    inter = (
        words.join(F.broadcast(qwords), "word")
        .where(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count("*").alias("n_inter"))
    )
    scored = (
        inter.join(sizes, "doc_id")
        .join(F.broadcast(qsizes), "query_id")
        .select(
            "query_id",
            "doc_id",
            (
                F.col("n_inter").cast("double")
                / (F.col("n_doc") + F.col("n_query") - F.col("n_inter")).cast("double")
            ).alias("jaccard"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("jaccard").desc(), F.col("doc_id"))
    return scored.withColumn("rk", F.row_number().over(w).cast("long")).where(
        F.col("rk") <= k
    )


def rrf_fuse(
    rankings: list[DataFrame], top_k: int = 10, k_const: int = RRF_K
) -> DataFrame:
    """Fuse any number of (query_id, doc_id, rk) rankings by RRF.

    Scores are ``div(RRF_SCALE, k_const + rk)`` summed as BIGINTs —
    exact, engine-portable, calibration-free. A doc absent from one
    ranking simply contributes 0 from it. Ties broken by doc_id.
    Returns (query_id, doc_id, rrf_scaled, fused_rank), rank <= top_k.
    """
    contribs = [
        r.select(
            "query_id",
            "doc_id",
            F.expr(f"div({RRF_SCALE}, {k_const} + rk)").alias("contrib"),
        )
        for r in rankings
    ]
    all_rows = reduce(DataFrame.unionByName, contribs)
    fused = all_rows.groupBy("query_id", "doc_id").agg(
        F.sum("contrib").cast("long").alias("rrf_scaled")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_scaled").desc(), F.col("doc_id")
    )
    return fused.withColumn("fused_rank", F.row_number().over(w).cast("long")).where(
        F.col("fused_rank") <= top_k
    )


def hybrid_retrieval(
    docs: DataFrame,
    emb: DataFrame,
    n_queries: int = 3,
    k_per_ranking: int = 20,
    top_k: int = 10,
) -> DataFrame:
    """End-to-end hybrid search over the (documents, embeddings) corpus
    (doc_id == vec_id): dense cosine top-k and lexical Jaccard top-k,
    RRF-fused. Queries are the first ``n_queries`` ids — stand-ins for
    a user query batch, which is always the broadcast-small side."""
    from goeventstream_spark.operators import similarity

    qvecs = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    dense = similarity.cosine_topk(emb, qvecs, k=k_per_ranking).select(
        "query_id", F.col("vec_id").alias("doc_id"), "rk"
    )
    qdocs = docs.where(F.col("doc_id") < n_queries).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    lexical = lexical_jaccard_topk(docs, qdocs, k=k_per_ranking).select(
        "query_id", "doc_id", "rk"
    )
    return rrf_fuse([dense, lexical], top_k=top_k)


def mmr_select(
    emb: DataFrame,
    n_queries: int = 3,
    pool_k: int = 20,
    top_k: int = 5,
    scale: int = 1_000_000_000,
) -> DataFrame:
    """Greedy Maximal Marginal Relevance (Carbonell & Goldstein '98),
    lambda = 1/2: pick argmax rel first, then repeatedly the candidate
    maximizing rel - max_sim_to_selected (2x the lambda-1/2 MMR score —
    same argmax), ties to the lowest doc_id. All scores are
    floor-scaled BIGINTs, so the greedy trajectory is engine-exact.

    Scale shape: the pool per query is a CONSTANT pool_k (top-k cosine
    is the scalable step, see cosine_topk); selection runs per query
    group over pool_k rows via cogrouped applyInPandas — pure integer
    ops on <= pool_k^2 values, corpus-size-independent.
    """
    from goeventstream_spark.operators import similarity

    qvecs = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_embedding")
    )
    pool = (
        similarity.cosine_topk(emb, qvecs, k=pool_k)
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            F.floor(F.col("cos_sim") * F.lit(float(scale))).cast("long").alias("rel"),
        )
        .localCheckpoint(eager=False)
    )
    # pairwise pool cosines: pool x pool within query; each DISTINCT
    # pair is scored once by the same arrow fold as the pool itself,
    # then floor-scaled once and joined back per query
    pa = pool.select("query_id", F.col("doc_id").alias("pair_key"))
    pb = pool.select(F.col("query_id").alias("qb"), F.col("doc_id").alias("vec_id"))
    pairs = pa.join(
        pb, (F.col("query_id") == F.col("qb")) & (F.col("pair_key") < F.col("vec_id"))
    ).select("query_id", F.col("pair_key").alias("doc_a"), F.col("vec_id").alias("doc_b"))
    upairs = pairs.select("doc_a", "doc_b").distinct()
    ea = emb.select(
        F.col("vec_id").alias("doc_a"), F.col("embedding").alias("q_embedding")
    )
    scored = similarity._arrow_pair_scores(
        upairs.join(ea, "doc_a")
        .join(emb.select("vec_id", "embedding"), upairs.doc_b == emb.vec_id)
        .select(
            F.col("doc_a").alias("query_id"),  # scorer's group key slot
            "vec_id",
            "q_embedding",
            "embedding",
        )
    ).select(
        F.col("query_id").alias("doc_a"),
        F.col("vec_id").alias("doc_b"),
        F.floor(F.col("cos_sim") * F.lit(float(scale))).cast("long").alias("sim"),
    )
    sims = (
        pairs.alias("p")
        .join(
            scored.alias("s"),
            (F.col("p.doc_a") == F.col("s.doc_a"))
            & (F.col("p.doc_b") == F.col("s.doc_b")),
        )
        # Alias every output: the cogroup below keys BOTH frames on
        # query_id, and without fresh attribute ids Spark flags the
        # shared lineage (pool feeds both sides) as ambiguous.
        .select(
            F.col("p.query_id").alias("query_id"),
            F.col("p.doc_a").alias("doc_a"),
            F.col("p.doc_b").alias("doc_b"),
            F.col("s.sim").alias("sim"),
        )
    )

    def pick(key, cand_it, sim_it):
        import pandas as pd

        cand = cand_it
        rel = dict(zip(cand["doc_id"], cand["rel"]))
        sim: dict = {}
        for a, b, s in zip(sim_it["doc_a"], sim_it["doc_b"], sim_it["sim"]):
            sim[(a, b)] = s
            sim[(b, a)] = s
        selected: list = []
        remaining = set(rel)
        while remaining and len(selected) < top_k:
            if not selected:
                best = min(((-rel[d], d) for d in remaining))[1]
            else:
                best = min(
                    (
                        (-(rel[d] - max(sim[(d, s)] for s in selected)), d)
                        for d in remaining
                    )
                )[1]
            selected.append(best)
            remaining.discard(best)
        return pd.DataFrame(
            {
                "query_id": [key[0]] * len(selected),
                "doc_id": selected,
                "pick_order": list(range(1, len(selected) + 1)),
                "rel": [rel[d] for d in selected],
            }
        )

    def pick_wrapper(key, cand_it, sim_it):
        import pandas as pd

        cand = pd.concat(list(cand_it)) if not isinstance(cand_it, pd.DataFrame) else cand_it
        simdf = pd.concat(list(sim_it)) if not isinstance(sim_it, pd.DataFrame) else sim_it
        return pick(key, cand, simdf)

    return (
        pool.groupBy("query_id")
        .cogroup(sims.groupBy("query_id"))
        .applyInPandas(
            pick_wrapper,
            "query_id long, doc_id long, pick_order long, rel long",
        )
    )
