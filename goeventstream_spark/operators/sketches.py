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


def bloom_positions(key: Column, k: int = 4, m: int = 16384) -> Column:
    """Array of k bloom-bit positions for a key: position j is the
    first 4 hex chars of md5("<j>|<key>") mod m. m <= 65536 (4 hex
    chars); lowercase-hex md5 keeps it engine-portable/exact."""
    if m > 65536:
        raise ValueError(f"bloom m={m} > 65536: position hash consumes 4 hex chars")
    return F.array(
        *[
            (
                F.conv(
                    F.substring(F.md5(F.concat_ws("|", F.lit(str(j)), key)), 1, 4),
                    16,
                    10,
                ).cast("long")
                % F.lit(m)
            )
            for j in range(k)
        ]
    )


def bloom_build(keys: DataFrame, key_col: str, k: int = 4, m: int = 16384) -> DataFrame:
    """Build a bloom filter over a key set as the DISTINCT set-bit
    positions — one narrowing aggregation of bounded cardinality (<= m
    rows out, like the CMS cells). At 100 TB the positions OR into an
    m-bit bitmap (m/64 int64 words, bit_or partial agg) and the whole
    filter broadcasts in KBs; the relational set-of-positions form here
    is the same object, kept flat so the oracle can hash it."""
    return (
        keys.select(
            F.explode(bloom_positions(F.col(key_col).cast("string"), k, m)).alias("pos")
        )
        .distinct()
    )


def bloom_probe_report(
    build_keys: DataFrame,
    probe_keys: DataFrame,
    build_col: str,
    probe_col: str,
    k: int = 4,
    m: int = 16384,
) -> DataFrame:
    """Probe a bloom filter and report its confusion counts in one row:
    distinct probe keys, bloom-predicted members (all k bits set), true
    members (exact semi-join ground truth), false positives, and bits
    set. Blooms never false-negative, so predicted >= true always —
    the gap IS the false-positive count (asserted by construction in
    the report arithmetic).

    Scale shape: the filter is a bounded aggregate (broadcast side);
    the probe side is scanned once, exploded k-fold only on the
    bounded distinct-key relation. This is the data-level form of the
    runtime bloom join pinned in test_scale_patterns — useful where
    the pruning must survive ACROSS jobs (write the positions table
    once, probe it from any later pipeline)."""
    bits = bloom_build(build_keys, build_col, k, m)
    bk = build_keys.select(F.col(build_col).cast("long").alias("key")).distinct()
    pk = probe_keys.select(F.col(probe_col).cast("long").alias("key")).distinct()
    probe_pos = pk.select(
        "key", F.explode(bloom_positions(F.col("key").cast("string"), k, m)).alias("pos")
    )
    # predicted member <=> NO position is missing from the filter
    # (a key's k hashes may collide with each other, so "k matched
    # bits" would be the wrong test — absence-of-missing is exact)
    missing = probe_pos.join(bits, "pos", "left_anti").select("key").distinct()
    pred = pk.join(missing, "key", "left_anti").select(
        "key", F.lit(1).alias("pred")
    )
    memb = bk.select("key", F.lit(1).alias("memb"))
    report = (
        pk.join(pred, "key", "left")
        .join(memb, "key", "left")
        .agg(
            F.count("*").cast("long").alias("n_probe"),
            # outer coalesce: an EMPTY probe set must report zeros,
            # not NULL sums (the report row always exists)
            F.coalesce(F.sum(F.coalesce(F.col("pred"), F.lit(0))), F.lit(0))
            .cast("long")
            .alias("predicted_members"),
            F.coalesce(F.sum(F.coalesce(F.col("memb"), F.lit(0))), F.lit(0))
            .cast("long")
            .alias("true_members"),
            F.coalesce(
                F.sum(
                    F.coalesce(F.col("pred"), F.lit(0))
                    * (F.lit(1) - F.coalesce(F.col("memb"), F.lit(0)))
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("false_positives"),
        )
    )
    nbits = bits.agg(F.count("*").cast("long").alias("bits_set"))
    return report.crossJoin(F.broadcast(nbits))


def cms_merge(cells: DataFrame) -> DataFrame:
    """Merge any number of partial CMS sketches (unioned cell rows)
    into one: counters are plain sums, so merging is associative and
    commutative — per-day / per-batch sketches re-aggregate exactly,
    never approximately."""
    return cells.groupBy("row_i", "bucket").agg(F.sum("cnt").alias("cnt"))


def misra_gries_candidates(items: DataFrame, key_col: str, k: int = 64) -> DataFrame:
    """Per-partition Misra-Gries frequency summaries, unioned.

    Each input partition is summarized by at most ``k`` (key, lower
    bound) counters in ONE Arrow pass — the classic streaming heavy-
    hitter sketch (Misra & Gries 1982). The union over partitions is a
    SUPERSET of every key whose global frequency exceeds n/(k+1):
    within one partition of n_p rows a non-surviving key was decremented
    to zero, which costs at most n_p/(k+1) occurrences, so a key absent
    from every partition's summary has total count <= sum n_p/(k+1)
    = n/(k+1). That guarantee is what `heavy_hitters` relies on.

    Scale shape: zero shuffles — the sketch is computed where the data
    sits, and the output is <= k rows PER PARTITION regardless of
    corpus size (the 100 TB contract of a sketch). `mg_count` is the
    standard MG lower bound (true partition count is in
    [mg_count, mg_count + decrements]).
    """

    def mg(it):
        import pandas as pd

        counters: dict = {}
        for pdf in it:
            for key in pdf[key_col]:
                if key in counters:
                    counters[key] += 1
                elif len(counters) < k:
                    counters[key] = 1
                else:
                    dead = [c for c, v in counters.items() if v == 1]
                    for c in counters:
                        counters[c] -= 1
                    for c in dead:
                        del counters[c]
        if counters:
            yield pd.DataFrame(
                {key_col: list(counters), "mg_count": list(counters.values())}
            )

    return items.select(key_col).mapInPandas(mg, f"{key_col} string, mg_count long")


def heavy_hitters(
    items: DataFrame, key_col: str, k: int = 64, denom: int = 32
) -> DataFrame:
    """Exact heavy hitters (count * denom > n) via the two-pass
    sketch-propose / exact-verify pattern.

    Pass 1 proposes candidates with :func:`misra_gries_candidates`
    (bounded to k rows per partition, no shuffle). Pass 2 semi-joins the
    corpus to the BROADCAST candidate set and exactly counts only those
    keys — one aggregation shuffle whose key space is the candidate set,
    not the vocabulary. Because denom < k+1, the MG superset guarantee
    makes the result EXACTLY equal to the brute-force heavy hitters, so
    the declared query is fully hash-oracled despite the sketch.

    At 100 TB this is the difference between shuffling the full
    token-frequency table (billions of distinct keys) and shuffling
    only numPartitions*k candidate counts.
    """
    if denom >= k + 1:
        raise ValueError("need denom <= k for the MG guarantee to be exact")
    rows = items.select(key_col)
    cand = misra_gries_candidates(rows, key_col, k=k).select(key_col).distinct()
    total = rows.agg(F.count("*").cast("long").alias("n_total"))
    counts = (
        rows.join(F.broadcast(cand), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(total))
        .where(F.col("cnt") * F.lit(denom) > F.col("n_total"))
        .select(key_col, "cnt", "n_total")
    )


def kmv_bottom_k(distinct_hashes: DataFrame, key_col: str, k: int = 32) -> DataFrame:
    """KMV / bottom-k distinct-value sketch (Bar-Yossef et al. 2002;
    Beyer et al. SIGMOD'07): per key, the k smallest values of a
    uniform hash over the distinct items. The sketch supports
    cardinality estimation ((k-1) * H / h_k for hash domain H) and —
    because bottom-k of a union is computable from the per-set
    bottom-k's — union/intersection/Jaccard estimates between keys,
    the Theta-sketch workload. Deterministic given the hash, so the
    whole estimator pipeline is replayable cross-engine.

    Input: ``distinct_hashes`` must be DISTINCT (key, h) rows with h a
    BIGINT hash. Output: (key, h, rn) with rn in 1..k ascending by h.

    Scale shape: exact per-key bottom-k WITHOUT a per-key global sort —
    phase 1 takes each physical partition's per-key bottom-k (a window
    over the (key, partition-id) pair, so no single task ever sorts a
    whole key), phase 2 re-ranks the <= k * n_partitions survivors per
    key. Bottom-k of per-partition bottom-k's equals the global
    bottom-k, so the partition-id intermediate is invisible in the
    result. This is the repo's exact_global_rank discipline applied to
    per-key top-k: correct under any row placement, bounded per-task.
    """
    from pyspark.sql import Window

    w1 = Window.partitionBy(key_col, "_pid").orderBy("h")
    cand = (
        distinct_hashes.withColumn("_pid", F.spark_partition_id())
        .withColumn("_rn", F.row_number().over(w1))
        .where(F.col("_rn") <= k)
        .select(key_col, "h")
    )
    w2 = Window.partitionBy(key_col).orderBy("h")
    return (
        cand.withColumn("rn", F.row_number().over(w2).cast("long"))
        .where(F.col("rn") <= k)
        .select(key_col, "h", "rn")
    )


def kmv_hash48(id_col: str) -> Column:
    """The KMV hash: first 12 md5 hex digits of the id's decimal string
    as a BIGINT in [0, 2^48) — wide enough that ties are negligible,
    small enough that every estimator product stays in BIGINT."""
    return (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10)
        .cast("long")
        .alias("h")
    )
