"""Shared DuckDB-oracle SQL fragments for the deterministic
fixed-point k-means trajectory (integer grid, floored-mean Lloyd) —
leaf module with no intra-package imports, so any queries_* module can
compose these without import-order coupling. Mirrors
operators/clustering.py exactly; see q_kmeans_fixed_point for the
semantics walkthrough."""

from __future__ import annotations


def kq_dist(x: str, y: str) -> str:
    """Exact integer squared distance between two BIGINT lists, expanded
    via dot products (every term < 2^53, so DOUBLE-exact in DuckDB)."""
    return (
        f"(list_dot_product({x}, {x}) - 2 * list_dot_product({x}, {y})"
        f" + list_dot_product({y}, {y}))"
    )


def kq_iter(i: int, prev_c: str) -> str:
    """One Lloyd iteration as SQL CTEs: assign (argmin, ties to lowest
    cid) then floored-mean update (empty cluster keeps its centroid)."""
    return f"""
    a{i} AS (
      SELECT vec_id, v, cid AS cluster_id FROM (
        SELECT e.vec_id, e.v, {prev_c}.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {kq_dist("e.v", f"{prev_c}.v")},
                                           {prev_c}.cid) AS rk
        FROM e, {prev_c}
      ) WHERE rk = 1
    ),
    s{i} AS (
      SELECT cluster_id, dim, sum(val) AS s, count(*) AS n
      FROM (SELECT cluster_id, generate_subscripts(v, 1) AS dim,
                   unnest(v) AS val FROM a{i})
      GROUP BY cluster_id, dim
    ),
    c{i} AS (
      SELECT {prev_c}.cid, coalesce(m.mv, {prev_c}.v) AS v
      FROM {prev_c} LEFT JOIN (
        SELECT cluster_id AS cid,
               list(CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
                    ORDER BY dim) AS mv
        FROM s{i} GROUP BY cluster_id
      ) m USING (cid)
    )"""


# Deterministic IVF cell per vector: fixed-point k-means (k=4, 2 Lloyd
# iterations, grid scale 1000) then assignment of every vector to the
# FINAL centroids (ties to lowest cid). Mirrors
# clustering.ivf_cell_assign exactly; `a3(vec_id, cluster_id)` is the
# cell relation downstream oracles join on. Uses CTE names e/c0/c1/c2/a*,
# so composing queries must pick other names for their own CTEs.
KQ_CELL_CTES = f"""e AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1000) AS BIGINT)) AS v
      FROM embeddings
    ),
    c0 AS (
      SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
      FROM e ORDER BY vec_id LIMIT 4
    ),{kq_iter(1, "c0")},{kq_iter(2, "c1")},
    a3 AS (
      SELECT vec_id, cid AS cluster_id FROM (
        SELECT e.vec_id, c2.cid,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {kq_dist("e.v", "c2.v")},
                                           c2.cid) AS rk
        FROM e, c2
      ) WHERE rk = 1
    )"""
