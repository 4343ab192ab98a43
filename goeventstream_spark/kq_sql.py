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


def kq_sub_iter(i: int, prev_c: str) -> str:
    """One PER-CELL Lloyd iteration (the hot-cell re-cluster of
    ivf_cell_assign_capped): same assign/floored-mean steps as
    kq_iter, with every window and group key extended by `cell`.
    Reads `ksub(vec_id, cell, v)`; emits ksa{i}/kss{i}/ksc{i}."""
    return f"""
    ksa{i} AS (
      SELECT vec_id, cell, v, scid FROM (
        SELECT s.vec_id, s.cell, s.v, c.scid,
               row_number() OVER (PARTITION BY s.cell, s.vec_id
                                  ORDER BY {kq_dist("s.v", "c.v")},
                                           c.scid) AS rk
        FROM ksub s JOIN {prev_c} c USING (cell)
      ) WHERE rk = 1
    ),
    kss{i} AS (
      SELECT cell, scid, dim, sum(val) AS s, count(*) AS n
      FROM (SELECT cell, scid, generate_subscripts(v, 1) AS dim,
                   unnest(v) AS val FROM ksa{i})
      GROUP BY cell, scid, dim
    ),
    ksc{i} AS (
      SELECT p.cell, p.scid, coalesce(m.mv, p.v) AS v
      FROM {prev_c} p LEFT JOIN (
        SELECT cell, scid,
               list(CAST(floor(CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS BIGINT)
                    ORDER BY dim) AS mv
        FROM kss{i} GROUP BY cell, scid
      ) m USING (cell, scid)
    )"""


# One-level hot-cell-capped cell assignment: cells holding more than
# CAP_FRAC of the corpus are re-clustered with the same fixed-point
# k-means (k=4, 2 iterations, seeds = the 4 lowest vec_ids in the
# cell), every vector re-assigned to the FINAL sub-centroids; the j-th
# hot cell (by id) maps its sub-cells to ids 4 + j*4 + scid, cold
# cells keep their base id. Mirrors
# clustering.ivf_cell_assign_capped(k=4, iters=2, cap_frac=CAP_FRAC,
# max_levels=1) exactly; composes AFTER KQ_CELL_CTES and emits
# `kcap(vec_id, cell)`.
KQ_CAPPED_FRAC = 0.26

KQ_CAPPED_CELL_CTES = f"""kbase AS (SELECT vec_id, cluster_id AS cell FROM a3),
    ktot AS (SELECT count(*) AS n FROM kbase),
    khot AS (
      SELECT cell, row_number() OVER (ORDER BY cell) - 1 AS hidx
      FROM (SELECT cell, count(*) AS cnt FROM kbase GROUP BY cell) g, ktot
      WHERE g.cnt > {KQ_CAPPED_FRAC} * ktot.n
    ),
    ksub AS (
      SELECT b.vec_id, b.cell, e.v
      FROM kbase b JOIN khot USING (cell) JOIN e USING (vec_id)
    ),
    ksc0 AS (
      SELECT cell, rk - 1 AS scid, v FROM (
        SELECT cell, v,
               row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rk
        FROM ksub
      ) WHERE rk <= 4
    ),{kq_sub_iter(1, "ksc0")},{kq_sub_iter(2, "ksc1")},
    kfin AS (
      SELECT vec_id, cell, scid FROM (
        SELECT s.vec_id, s.cell, c.scid,
               row_number() OVER (PARTITION BY s.cell, s.vec_id
                                  ORDER BY {kq_dist("s.v", "c.v")},
                                           c.scid) AS rk
        FROM ksub s JOIN ksc2 c USING (cell)
      ) WHERE rk = 1
    ),
    kcap AS (
      SELECT b.vec_id,
             CASE WHEN h.cell IS NULL THEN b.cell
                  ELSE 4 + h.hidx * 4 + f.scid END AS cell
      FROM kbase b LEFT JOIN khot h USING (cell)
                   LEFT JOIN kfin f USING (vec_id)
    )"""
