"""Count-min sketch: mergeable approximate frequency counting.

Complements the HLL distinct-count sketch (queries_ext
`hll_segment_customers`): CMS answers "how often did x occur" from a
fixed-size table regardless of stream size. The sketch is a (depth x
width) grid of counters; each item increments one bucket per row
(md5-derived), and a point estimate is the MIN across rows — an upper
bound on the true count, biased only by collisions.

Why it matters at 100 TB: the sketch build is ONE aggregation shuffle
of (depth x width) bounded cardinality (1024 cells here, independent of
corpus size), and counters are plain sums — partial per-partition
sketches merge associatively, so per-day sketches re-aggregate without
rescanning raw data (same contract the HLL test pins).

Everything is exact integer/md5 arithmetic — given the same input the
sketch is bit-identical across engines, so the declared query is fully
DuckDB-oracled (the *approximation* is deterministic; only its error
vs ground truth varies with data).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(key: Column, row_i: Column, width: int) -> Column:
    """Bucket index for one sketch row: first 2 hex chars of
    md5("<row>|<key>") as an int, mod width (<= 256). Lowercase-hex
    md5 is engine-portable; conv/'0x'-cast keep the arithmetic exact."""
    h = F.md5(F.concat_ws("|", row_i.cast("string"), key))
    return (F.conv(F.substring(h, 1, 2), 16, 10).cast("int") % F.lit(width)).alias(
        "bucket"
    )


def cms_build(
    items: DataFrame, key_col: str = "token", depth: int = 4, width: int = 256
) -> DataFrame:
    """Build the sketch: one row per non-empty (row_i, bucket) cell with
    its counter. The depth-way fan-out is an explode (single scan of the
    item subtree, no self-union), then one bounded-cardinality
    aggregation."""
    if width > 256:
        raise ValueError(
            f"cms width={width} > 256: the bucket hash consumes 2 hex "
            "chars (0..255), so wider sketches would silently leave "
            "buckets 256+ unreachable and quadruple the collision rate"
        )
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                _bucket(F.col(key_col), F.lit(i), width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        items.select(F.explode(cells).alias("_c"))
        .select("_c.row_i", "_c.bucket")
        .groupBy("row_i", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame, queries: DataFrame, key_col: str = "token", depth: int = 4, width: int = 256
) -> DataFrame:
    """Point-estimate each query key: join its depth buckets against
    the sketch and take the MIN counter. The sketch is bounded (depth x
    width rows) so it broadcasts; the query side never shuffles."""
    probes = queries.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row_i"),
                        _bucket(F.col(key_col), F.lit(i), width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("_p"),
    ).select(key_col, "_p.row_i", "_p.bucket")
    # LEFT join + coalesce 0: the sketch stores only NON-EMPTY cells,
    # and an unseen key's empty bucket must contribute 0 to the MIN —
    # an inner join would take the min over the colliding cells only
    # (inflated estimate) and drop all-empty keys from the output.
    return (
        probes.join(F.broadcast(cms), ["row_i", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_est"))
    )
