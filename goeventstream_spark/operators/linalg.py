"""Distributed linear algebra kept exactly reproducible: fixed-point
power iteration for the leading principal direction of the embedding
second-moment matrix.

Float PCA (MLlib, LAPACK) is not cross-engine reproducible — summation
order changes the low bits, normalization uses sqrt. This variant stays
in exact integer arithmetic end to end:

- vectors on the integer grid (clustering.quantize_vectors);
- the second-moment matrix C[i][j] = sum_docs x_i * x_j from exact
  BIGINT sums (one (i, j)-keyed aggregation, 64 x 64 = bounded);
- each power step is the exact integer matvec v' = C v followed by a
  fixed-point RESCALE w_i = div(v'_i * RES, max|v'|) — integer division
  truncates toward zero in both Spark (`div`) and DuckDB (`//`), so the
  trajectory is engine-identical (a floor() of a float quotient is NOT:
  the quotient's last-bit rounding can straddle the floor boundary);
- the answer is the rescaled direction plus the exact Rayleigh quotient
  as a (numerator, denominator) BIGINT pair — no sqrt, no division.

Scale shape: the only data-sized stage is the second-moment
aggregation (one shuffle keyed on (i, j), dims^2 keys); every
iteration afterwards runs on the 64x64 matrix relation. At 100 TB the
moment matrix is computed once and iterated for free — the same
"aggregate once, iterate on the small thing" anatomy as PageRank and
the k-means codebooks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RES = 1000  # fixed-point resolution of the rescaled direction


def second_moment(vectors: DataFrame) -> DataFrame:
    """(i, j, c): exact BIGINT second-moment matrix of the quantized
    (vec_id, v) relation. One self-join per doc exploded to dims^2
    rows, one bounded-key aggregation."""
    pos = vectors.select("vec_id", F.posexplode("v").alias("i", "xi"))
    a = pos.alias("a")
    b = pos.select(
        F.col("vec_id"), F.col("i").alias("j"), F.col("xi").alias("xj")
    ).alias("b")
    return (
        a.join(b, "vec_id")
        .groupBy("i", "j")
        .agg(F.sum(F.col("xi") * F.col("xj")).cast("long").alias("c"))
    )


def _rescale(matvec: DataFrame) -> DataFrame:
    """(i, w): div(v_i * RES, max|v|) — truncating integer division,
    identical in Spark and DuckDB."""
    m = matvec.agg(F.max(F.abs(F.col("v"))).cast("long").alias("m"))
    return matvec.crossJoin(F.broadcast(m)).select(
        "i", F.expr(f"div(v * {RES}, m)").cast("long").alias("w")
    )


def top_principal_direction(
    emb: DataFrame, iters: int = 2, scale: int = 1000
) -> DataFrame:
    """``iters`` fixed-point power steps toward the leading principal
    direction from the all-ones start, with the exact Rayleigh
    quotient. Convergence is spectrum-dependent (per-step gain is the
    eigenvalue ratio): on the near-isotropic synthetic fixtures two
    steps reach 70-86% of lambda_max — the exact rq_num/rq_den in the
    output IS the quality certificate; more steps converge further at
    one bounded matvec each. Values are engine-exact regardless.
    Returns 64 rows (dim, component, rq_num, rq_den) where
    rq_num/rq_den = (w^T C w) / (w^T w) — both exact BIGINTs, scalars
    repeated per row for a flat, hash-friendly shape."""
    from goeventstream_spark.operators import clustering

    vectors = clustering.quantize_vectors(emb, scale=scale)
    cov = second_moment(vectors).localCheckpoint(eager=False)
    # v1 = C * ones — just the row sums
    w = _rescale(cov.groupBy("i").agg(F.sum("c").cast("long").alias("v")))
    for _ in range(iters - 1):
        wj = w.select(F.col("i").alias("j"), F.col("w").alias("wj"))
        w = _rescale(
            cov.join(wj, "j")
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("wj")).cast("long").alias("v"))
        )
    wi = w.select(F.col("i"), F.col("w").alias("wi"))
    wj = w.select(F.col("i").alias("j"), F.col("w").alias("wj"))
    rq = (
        cov.join(wi, "i")
        .join(wj, "j")
        .agg(
            F.sum(F.col("wi") * F.col("c") * F.col("wj"))
            .cast("long")
            .alias("rq_num")
        )
        .crossJoin(
            F.broadcast(
                w.agg(
                    F.sum(F.col("w") * F.col("w")).cast("long").alias("rq_den")
                )
            )
        )
    )
    return w.crossJoin(F.broadcast(rq)).select(
        F.col("i").cast("long").alias("dim"),
        F.col("w").alias("component"),
        "rq_num",
        "rq_den",
    )
