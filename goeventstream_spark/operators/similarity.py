"""Similarity search over embedding columns (SURVEY.md §2b group 3).

Embeddings are ``array<float>`` columns; all arithmetic casts to double
element-wise first, then multiplies pairwise and sums left-to-right via
``aggregate`` — the same order DuckDB's list_dot_product uses on
DOUBLE[], so cosine scores are bit-identical cross-engine (and sqrt is
IEEE-correctly-rounded everywhere).

Scale shape:
- ``cosine_topk``: broadcast the (small) query set against the corpus —
  a map-side cross product, no shuffle until the final per-query top-k
  window. This is the brute-force baseline.
- ``embedding_near_dup``: blocked self-join — pairs are only generated
  within a block (here ``label``; at 100 TB an IVF/k-means centroid id
  or LSH hyperplane bucket). The block key is the shuffle key; n² only
  within blocks.
- ``lsh_bucket``: sign-of-projection bucketing against deterministic
  hyperplanes for the sub-brute-force path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Left-to-right double-precision dot product of two float arrays."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(emb: DataFrame, queries: DataFrame, k: int = 5) -> DataFrame:
    """Brute-force top-k cosine neighbors for each query vector.

    ``queries`` is a small DataFrame (query_id, q_embedding); it is
    broadcast, so the corpus scan is embarrassingly parallel. Exact
    baseline for ANN variants. Self-matches excluded by id.
    """
    joined = emb.crossJoin(F.broadcast(queries)).where(
        F.col("vec_id") != F.col("query_id")
    )
    scored = joined.select(
        "query_id",
        "vec_id",
        cosine(F.col("q_embedding"), F.col("embedding")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
    )


def embedding_near_dup(emb: DataFrame, threshold: float = 0.95, block_col: str = "label") -> DataFrame:
    """Near-duplicate vector pairs above a cosine threshold, blocked by
    ``block_col`` so the self-join is per-block instead of global n²."""
    a = emb.alias("a")
    b = emb.alias("b")
    pairs = a.join(
        b,
        (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        cosine(F.col("a.embedding"), F.col("b.embedding")).alias("cos_sim"),
    )
    return pairs.where(F.col("cos_sim") >= F.lit(threshold))


def lsh_bucket(emb: DataFrame, n_planes: int = 8, seed_dims: int = 64) -> DataFrame:
    """Random-hyperplane LSH bucket id per vector: hyperplane p's
    component j is ±1 from the parity of md5(p|j) — deterministic,
    reproducible on any engine, no stored model. Bucket = bit-packed
    signs of the projections.

    This is the ANN scale path: equality on bucket id prunes candidate
    pairs before exact cosine verification.
    """
    import hashlib

    planes = [
        [
            1.0 if int(hashlib.md5(f"{p}|{j}".encode()).hexdigest(), 16) % 2 == 0 else -1.0
            for j in range(seed_dims)
        ]
        for p in range(n_planes)
    ]
    proj_bits = []
    for p, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                _as_double(F.col("embedding")),
                F.array(*[F.lit(v) for v in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        proj_bits.append(F.when(proj >= 0, F.lit(2**p)).otherwise(F.lit(0)))
    bucket = sum(proj_bits).cast("long")
    return emb.select("vec_id", "label", "embedding", bucket.alias("lsh_bucket"))
