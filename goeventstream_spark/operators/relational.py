"""Relational operators the reference lacks entirely (SURVEY.md §2a
"explicitly absent": no joins, aggregations, windows, sorts, set ops).
This module supplies the non-trivial compositions; thin one-liner
surface (plain joins/aggs/windows) lives directly in queries.py.

Scale discipline:
- ``asof_join`` is the union-merge form: ONE shuffle on the key, no
  per-row subqueries, no cross product. This is the only as-of shape
  that survives 100 TB (a correlated/theta formulation explodes).
- ``range_join`` bucketizes the band so the physical plan is an
  *equi*-join on (key?, bucket) + residual filter — Spark would
  otherwise fall back to BroadcastNestedLoopJoin, which is O(n*m).
- ``topk_per_group`` is rank-then-filter: the window's partial sort
  runs map-side per partition after one hash exchange; never a global
  sort + limit per group.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def ms(col: str | Column) -> Column:
    """Epoch milliseconds of a timestamp column. Parquet
    isAdjustedToUTC=0 columns surface as TIMESTAMP_NTZ in Spark 4,
    which unix_millis rejects; the cast to TIMESTAMP interprets them in
    the session timezone, which sources.load_table pins to UTC — same
    wall-clock-as-UTC reading DuckDB's epoch_ms applies."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unix_millis(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tolerance_ms: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """As-of join in the pandas-merge_asof / kdb-aj sense: for every
    left row, one matching right row on the same keys —

    - ``backward`` (default): the latest right with right_ts <= left_ts
    - ``forward``: the earliest right with right_ts >= left_ts
    - ``nearest``: whichever of those two is closer in time (exact-tie
      -> backward; within a side, equal-ts ties order by the value
      tuple: greatest wins backward, smallest wins forward — mirrored
      rules so both sides stay deterministic)

    Spark has no built-in as-of join; this is the scalable union-merge
    composition: tag both sides, union, and carry right values with
    last(..., ignorenulls) over (keys ORDER BY ts, side) — and, for
    forward, first(...) over the mirrored following frame. One shuffle
    on ``keys`` either way (the two window orders share the exchange);
    state per key is a single carried row.

    value_cols are emitted as ``asof_<name>`` plus ``asof_ts``.
    """
    assert direction in ("backward", "forward", "nearest"), direction
    lcols = left.columns
    # _ts/_r_ts must be computed inside each select, from the ORIGINAL
    # side's columns — the right-side projection nulls out left column
    # names (which may collide with right_ts, e.g. both sides "ts").
    l_tagged = left.select(
        *[F.col(c) for c in lcols],
        F.lit(1).alias("_side"),
        F.col(left_ts).alias("_ts"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_r_ts"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
            for c in value_cols
        ],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in keys],
        *[F.col(k) for k in keys],
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_ts"),
        F.col(right_ts).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )

    # Tiebreak: among right rows sharing (keys, _ts), the greatest
    # value tuple wins — without this the carried row depends on
    # physical partition order (run-to-run nondeterminism; the same
    # class of bug the protocol sweep had at sf0.1). The _r_* columns
    # are NULL only on left rows, which the _side key already groups
    # after all right rows, so NULL-ordering never enters a comparison.
    wb = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_side", *[F.col(f"_r_{c}") for c in value_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy(*keys)
        .orderBy("_ts", F.col("_side").desc(), *[F.col(f"_r_{c}") for c in value_cols])
        .rowsBetween(0, Window.unboundedFollowing)
    )
    # The matched right row travels as ONE nullable struct (null on
    # left rows), so last/first(ignorenulls) can never mix fields from
    # DIFFERENT right rows — carrying each _r_* column independently
    # would let a NULL right VALUE pull that one column from an older
    # row while asof_ts comes from the newer one.
    r_struct = F.when(
        F.col("_side") == 0,
        F.struct(
            F.col("_r_ts").alias("ts"),
            *[F.col(f"_r_{c}").alias(c) for c in value_cols],
        ),
    )
    u = l_tagged.unionByName(r_tagged).withColumn("_r", r_struct)
    fields = ["ts"] + list(value_cols)
    if direction == "backward":
        chosen = F.last("_r", ignorenulls=True).over(wb)
        picked = [chosen[f] for f in fields]
    elif direction == "forward":
        chosen = F.first("_r", ignorenulls=True).over(wf)
        picked = [chosen[f] for f in fields]
    else:
        b = F.last("_r", ignorenulls=True).over(wb)
        fw = F.first("_r", ignorenulls=True).over(wf)
        l_ms = F.unix_millis(F.col("_ts").cast("timestamp"))
        d_b = l_ms - F.unix_millis(b["ts"].cast("timestamp"))
        d_f = F.unix_millis(fw["ts"].cast("timestamp")) - l_ms
        # Tolerance gates each SIDE before the choice — a closer
        # out-of-tolerance backward match must not mask an in-tolerance
        # forward one (pandas merge_asof nearest+tolerance semantics).
        b_ok = b.isNotNull() & (
            F.lit(True) if tolerance_ms is None else d_b <= F.lit(tolerance_ms)
        )
        f_ok = fw.isNotNull() & (
            F.lit(True) if tolerance_ms is None else d_f <= F.lit(tolerance_ms)
        )
        use_b = b_ok & (~f_ok | (d_b <= d_f))
        chosen = F.when(use_b, b).when(f_ok, fw)
        picked = [chosen[f] for f in fields]
    out_names = ["asof_ts"] + [f"asof_{c}" for c in value_cols]
    carried = u.select(
        *lcols,
        "_side",
        *[c.alias(n) for c, n in zip(picked, out_names)],
    )
    out = carried.where(F.col("_side") == 1).drop("_side")
    if tolerance_ms is not None and direction != "nearest":
        delta = ms(left_ts) - ms("asof_ts")
        within = F.abs(delta) <= F.lit(tolerance_ms)
        out = out.select(
            *lcols,
            F.when(within, F.col("asof_ts")).alias("asof_ts"),
            *[F.when(within, F.col(f"asof_{c}")).alias(f"asof_{c}") for c in value_cols],
        )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_ms: int,
    upper_ms: int,
    bucket_ms: int | None = None,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Band join: pairs where ``left_ts + lower_ms <= right_ts <
    left_ts + upper_ms`` (and optional equi-keys).

    Implemented as bucketized equi-join: each left row explodes to the
    few time buckets its band overlaps, joins right rows on bucket
    (hash shuffle — never a nested-loop cross product), then applies
    the exact band as a residual filter. Bucket width defaults to the
    band width, bounding the explode factor at 2.
    """
    width = bucket_ms or max(upper_ms - lower_ms, 1)
    lo = F.floor((ms(left_ts) + F.lit(lower_ms)) / width)
    hi = F.floor((ms(left_ts) + F.lit(upper_ms) - 1) / width)
    l_b = left.withColumn("_bucket", F.explode(F.sequence(lo, hi)))
    r_b = right.withColumn("_bucket", F.floor(ms(right_ts) / width))
    cond = [l_b["_bucket"] == r_b["_bucket"]] + [l_b[k] == r_b[k] for k in keys]
    band = (
        F.unix_millis(r_b[right_ts].cast("timestamp")) >= F.unix_millis(l_b[left_ts].cast("timestamp")) + F.lit(lower_ms)
    ) & (F.unix_millis(r_b[right_ts].cast("timestamp")) < F.unix_millis(l_b[left_ts].cast("timestamp")) + F.lit(upper_ms))
    joined = l_b.join(r_b, cond + [band], "inner")
    return joined.drop("_bucket")


def topk_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
) -> DataFrame:
    """Per-group top-k via rank-then-filter; ``order_cols`` must make
    the order total (include a unique tiebreak) for determinism."""
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .withColumn("rk", F.col("_rn").cast("long"))
        .drop("_rn")
    )


def dec_sum(col: str | Column, scale: int = 2, alias: str | None = None) -> Column:
    """Exact-decimal sum cast back to double.

    Float sums are order-dependent and Spark/DuckDB would disagree in
    the last bits; summing as DECIMAL is exact and order-independent,
    so the final double is bit-identical on both engines. Decimal
    aggregation stays JVM-side (whole-stage codegen supports it).
    """
    c = F.col(col) if isinstance(col, str) else col
    out = F.sum(c.cast(f"decimal(28,{scale})")).cast("double")
    return out.alias(alias) if alias else out


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    agg_exprs: Sequence[Column],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation: shuffle on (key, salt) first so
    one hot key spreads over ``salt_buckets`` reducers, then merge the
    partials per key. Use when a single group's row count exceeds what
    one task should hold and the aggregate is decomposable (sum/count/
    min/max). AQE's skew handling covers *joins*; skewed aggregations
    still need explicit salting.

    ``agg_exprs`` are the phase-1 partial aggregates; each must carry an
    alias, and phase 2 re-aggregates by the same function name, which is
    correct for sum/count-as-sum/min/max style partials.
    """
    salted = df.withColumn(
        "_salt", (F.spark_partition_id() + F.monotonically_increasing_id()) % salt_buckets
    )
    phase1 = salted.groupBy(*key_cols, "_salt").agg(*agg_exprs)
    merge_exprs = [
        _merge_fn(c)(c).alias(c)
        for c in phase1.columns
        if c not in key_cols and c != "_salt"
    ]
    return phase1.groupBy(*key_cols).agg(*merge_exprs)


def _merge_fn(col_name: str):
    """Merge function for a partial-aggregate column by naming
    convention: min_*/max_* merge with min/max; counts and sums both
    merge by summing the partials."""
    if col_name.startswith("min"):
        return F.min
    if col_name.startswith("max"):
        return F.max
    return F.sum


def multigrain_rollup(
    events: DataFrame,
    grains: tuple[str, ...] = ("hour", "day", "month"),
    key_cols: tuple[str, ...] = ("event_type",),
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Hypertable-style multi-granularity time rollup.

    The big table is aggregated ONCE at the finest grain (the only
    shuffle that touches |events| rows, with map-side partial
    aggregation); every coarser grain is re-aggregated from the
    already-tiny finest-grain relation — at 100 TB the hour->day->month
    rollups run over thousands of rows, not billions. Decomposable
    aggregates only (count merges as sum-of-counts; sums stay DECIMAL
    until the final cast so every grain is order-independent exact).

    Output: grain, bucket_start, *key_cols, n_events, sum_value.
    """
    fine, *coarser = grains
    hourly = events.groupBy(
        F.date_trunc(fine, F.col(ts_col)).alias("bucket_start"), *key_cols
    ).agg(
        F.count("*").alias("n_events"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("_sum_dec"),
    )
    out = hourly.select(F.lit(fine).alias("grain"), "*")
    for g in coarser:
        out = out.unionByName(
            hourly.groupBy(
                F.date_trunc(g, F.col("bucket_start")).alias("bucket_start"), *key_cols
            )
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("_sum_dec").alias("_sum_dec"),
            )
            .select(F.lit(g).alias("grain"), "*")
        )
    return out.select(
        "grain",
        "bucket_start",
        *key_cols,
        F.col("n_events").cast("long").alias("n_events"),
        F.col("_sum_dec").cast("double").alias("sum_value"),
    )


def merge_partial_aggs(
    parts: Sequence[DataFrame], key_cols: Sequence[str]
) -> DataFrame:
    """Incremental-view-maintenance merge: union partial aggregates
    computed over disjoint slices (yesterday's materialized rollup +
    today's delta) and re-aggregate per key — correct for any
    decomposable aggregate, using the same naming convention as
    salted_agg (min_*/max_* merge by min/max, everything else by sum;
    avg must be carried as sum + count and derived after the merge).

    This is THE pattern that makes a 100 TB rollup cheap to keep
    fresh: each day aggregates only its own partition (map-side
    combine over the new data), and the merge touches one row per
    (key, slice) — never the raw history. Decimal sums and integer
    counts merge bit-exactly regardless of slice boundaries.
    """
    it = iter(parts)
    unioned = next(it)
    for p in it:
        unioned = unioned.unionByName(p)
    merge_exprs = [
        _merge_fn(c)(c).alias(c) for c in unioned.columns if c not in key_cols
    ]
    return unioned.groupBy(*key_cols).agg(*merge_exprs)


def delta_join_maintain(
    base_l: DataFrame,
    delta_l: DataFrame,
    base_r: DataFrame,
    delta_r: DataFrame,
    on: list[str],
    base_view: DataFrame | None = None,
) -> DataFrame:
    """Incremental maintenance of an inner-join view: given both
    relations split into an already-materialized base and a new delta,
    the refreshed view is

        V' = (Bl JOIN Br)  UNION ALL  (dL JOIN Br)
             UNION ALL  (Bl JOIN dR)  UNION ALL  (dL JOIN dR)

    — the classic delta-join identity (dV = dL><Br + Bl><dR + dL><dR),
    exact for inner joins because the four quadrants partition
    (Bl+dL) x (Br+dR). Pass ``base_view`` to reuse a materialized
    Bl JOIN Br instead of recomputing it — at scale that quadrant IS
    the stored view, so a refresh touches only the three delta joins,
    each shuffling one delta against a co-partitioned (or broadcast)
    base; history is never rescanned. Aggregates over the view then
    merge via ``merge_partial_aggs``.
    """
    quadrants = [
        base_view if base_view is not None else base_l.join(base_r, on),
        delta_l.join(base_r, on),
        base_l.join(delta_r, on),
        delta_l.join(delta_r, on),
    ]
    it = iter(quadrants)
    out = next(it)
    for p in it:
        out = out.unionByName(p)
    return out


def exact_global_rank(
    df: DataFrame, order_cols: list[Column]
) -> DataFrame:
    """Global row_number over a TOTAL order without a single-partition
    window: range-repartition + per-partition sort (parallel, the
    global-sort machinery), per-partition counts prefix-summed in one
    bounded unpartitioned window (one row per PARTITION), and
    rank = offset + local row_number. Adds ``_rk`` (1-based global
    rank), ``_n`` (total rows) and the internal ``_pid``/``_lrk``/
    ``_off`` columns — callers drop what they don't need. Exact for
    any tie-free order; range boundaries are sample-based and
    nondeterministic, but ranks are boundary-independent.
    """
    nparts = max(df.sparkSession.sparkContext.defaultParallelism, 2)
    ranged = df.repartitionByRange(nparts, *order_cols).sortWithinPartitions(
        *order_cols
    )
    # Materialize ONCE: range boundaries are sample-based, and the
    # offset relation and the rank pass are two consumers — without a
    # checkpoint each may re-execute the exchange with different
    # sampled boundaries, making offsets inconsistent with ranks
    # (observed at sf0.1; exchange reuse is not guaranteed across
    # these subtrees under AQE).
    with_pid = ranged.withColumn(
        "_pid", F.spark_partition_id()
    ).localCheckpoint(eager=False)
    sizes = with_pid.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    offsets = sizes.select(
        "_pid",
        (
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            )
        ).alias("_off"),
        F.sum("_cnt").over(
            Window.orderBy("_pid").rangeBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("_n"),
    )
    wlocal = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        with_pid.withColumn("_lrk", F.row_number().over(wlocal))
        .join(F.broadcast(offsets), "_pid")
        .withColumn("_rk", F.col("_off") + F.col("_lrk"))
    )


def exact_global_ntile(
    df: DataFrame,
    order_cols: list[Column],
    n_buckets: int,
    out_col: str,
) -> DataFrame:
    """SQL-standard ntile over a TOTAL order, without the
    single-partition window the naive ``Window.orderBy`` plans: rows
    are range-repartitioned and sorted on the order columns (parallel,
    the same machinery as a global sort), per-partition row counts
    form a partition-count-sized offset relation whose prefix sum runs
    in one bounded unpartitioned window (the deliberate exception of
    temporal.max_concurrency_by_day — one row per partition, never per
    data row), and each row's global rank is its partition offset plus
    a row_number PARTITIONED by partition id. The bucket then derives
    from (rank, n) by the standard ntile fill rule — the first n mod b
    buckets take one extra row.

    Exact for any total order (make ``order_cols`` tie-free by
    appending a key); range boundaries are sample-based and therefore
    nondeterministic, but ranks — and so buckets — are
    boundary-independent.
    """
    ranked = exact_global_rank(df, order_cols)
    # ntile fill rule in pure integers (no float division — exact past
    # 2^53 rows): q = n DIV b, r = n MOD b; the first r buckets hold
    # q+1 rows. When n < b, r = n and every row lands in the big
    # branch, so the q=0 divisor is never reached.
    b = n_buckets
    bucket = F.expr(
        f"CASE WHEN _rk <= (_n % {b}) * (_n DIV {b} + 1)"
        f" THEN (_rk - 1) DIV (_n DIV {b} + 1)"
        f" ELSE (_n % {b}) + (_rk - (_n % {b}) * (_n DIV {b} + 1) - 1)"
        f" DIV (_n DIV {b}) END"
    )
    out = ranked.withColumn(out_col, (bucket + 1).cast("int"))
    return out.drop("_pid", "_lrk", "_off", "_n", "_rk")
