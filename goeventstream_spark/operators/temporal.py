"""Temporal/state-history operators: interval-overlap concurrency,
SCD Type-2 change tracking, and CDC changelog application.

These generalize the reference's LWW state model (model/game.go:55-74 —
a per-client map with last-write-wins upserts and delete-on-disconnect)
into the standard warehouse temporal surface a real deployment layers on
the same event log: "how many sessions were live at once", "what was
each key's attribute over time", "apply a change stream to a snapshot".

Scale design (100 TB):

- ``max_concurrency_by_day`` is a parallel sweep-line. The classic
  formulation is one global running sum over every interval boundary —
  a single-partition window that dies at scale. Here the prefix sum is
  two-phase: per-day partitioned running sums (shuffles on ``day``,
  thousands of tasks), plus a day-level carry computed by a window over
  the *day aggregate* relation, which has one row per day (~3 650 rows
  for a decade) — small enough that its unpartitioned window is a
  deliberate, bounded exception, the same shape Spark itself uses for
  TakeOrderedAndProject's driver merge.
- ``scd2_intervals`` / ``cdc_apply`` shuffle once on the entity key;
  consecutive windows/aggregations share that partitioning so Catalyst
  plans a single exchange.
- Everything is exact integer/copy arithmetic — no floats are computed,
  so results are bit-identical across engines and partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interval_boundaries(
    intervals: DataFrame,
    start_col: str = "session_start",
    end_col: str = "session_end",
    keys: tuple[str, ...] = ("user_id", "session_id"),
) -> DataFrame:
    """Explode [start, end] intervals into +1/-1 boundary events.

    Intervals are treated as closed: a session covering instant t
    contributes to concurrency at t, so the -1 at ``end`` sorts AFTER
    any +1 at the same instant (delta DESC in the sweep order).
    """
    pairs = F.array(
        F.struct(F.col(start_col).alias("ts"), F.lit(1).alias("delta")),
        F.struct(F.col(end_col).alias("ts"), F.lit(-1).alias("delta")),
    )
    # explode, not union: a union would duplicate the (possibly
    # expensive) interval-producing subtree in the plan; the explode is
    # a shuffle-free 1->2 fan-out over a single scan of it.
    return intervals.select(*[F.col(k) for k in keys], F.explode(pairs).alias("_b")).select(
        F.col("_b.ts").alias("ts"), F.col("_b.delta").alias("delta"), *[F.col(k) for k in keys]
    )


def max_concurrency_by_day(
    intervals: DataFrame,
    start_col: str = "session_start",
    end_col: str = "session_end",
    keys: tuple[str, ...] = ("user_id", "session_id"),
) -> DataFrame:
    """Max number of concurrently-open intervals per day (sweep-line).

    The sweep order is the total order (ts, delta DESC, *keys): +1
    before -1 at the same instant (closed intervals), and the key
    columns make the order unique so the running sum's prefix *set* is
    engine-independent — integer addition then gives bit-exact results
    regardless of physical evaluation order.

    Days with no boundary events are not emitted (the concurrency level
    is flat across them — it equals the carry, which the neighbouring
    days' rows already expose). A day's max accounts for the level
    carried in from prior days: ``carry + greatest(max_running, 0)``,
    covering the case where the day opens at its peak and only closes
    sessions.
    """
    b = interval_boundaries(intervals, start_col, end_col, keys).withColumn(
        "day", F.to_date("ts")
    )
    order = [F.col("ts").asc(), F.col("delta").desc()] + [F.col(k).asc() for k in keys]
    w_in_day = (
        Window.partitionBy("day")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # One aggregation yields BOTH per-day facts: the in-day running max
    # and the day's net (= the running sum at the day's last boundary),
    # so the boundary relation is traversed exactly once.
    day_aggs = (
        b.withColumn("run", F.sum("delta").over(w_in_day))
        .groupBy("day")
        .agg(F.max("run").alias("max_run"), F.sum("delta").alias("net"))
    )
    # Day-level carry: one row per day — tiny relation, bounded window.
    w_days = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    return day_aggs.withColumn(
        "carry", F.coalesce(F.sum("net").over(w_days), F.lit(0))
    ).select(
        # DATE->TIMESTAMP for engine-portable comparison (repo convention).
        F.col("day").cast("timestamp").alias("day"),
        (F.col("carry") + F.greatest(F.col("max_run"), F.lit(0)))
        .cast("long")
        .alias("max_concurrent"),
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension Type-2 view of an attribute stream:
    one row per (key, attribute run), with [valid_from, valid_to)
    half-open validity and an is_current flag on the open interval.

    Plan: one shuffle on ``key_col``; the change-detection lag and the
    valid_to lead share the same (key, ts, tiebreak) window spec, so
    both run in the same exchange. Values are copies — exact.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(attr_col).over(w)
    # First-row detection must use a NON-NULL column's lag — a NULL
    # attribute value would otherwise be indistinguishable from the
    # partition start (NULL runs dropped, the next row phantom-split);
    # the value comparison is null-safe for the same reason.
    is_first = F.lag(ts_col).over(w).isNull()
    changes = df.withColumn(
        "_chg", is_first | ~F.col(attr_col).eqNullSafe(prev)
    ).where(F.col("_chg"))
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return changes.select(
        F.col(key_col),
        F.col(attr_col).alias("attr"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.lead(ts_col).over(w2).isNull().alias("is_current"),
    )


def cdc_apply(
    base: DataFrame,
    changelog: DataFrame,
    key_col: str = "user_id",
    op_col: str = "op",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    payload_cols: tuple[str, ...] = ("value",),
) -> DataFrame:
    """Apply a CDC changelog (op in {'U','D'}) to a base snapshot:
    last-write-wins per key, 'D' removes the key, 'U' upserts the
    payload; keys untouched by the changelog keep their base row.

    This is the batch MERGE INTO shape: reduce the changelog to its
    last entry per key (one shuffle), then full-outer join with the
    snapshot on the key and resolve per-column with CASE. At 100 TB
    both sides are key-partitioned; if the changelog is small relative
    to the snapshot the join broadcast-degenerates automatically under
    AQE.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).desc(), F.col(tiebreak_col).desc())
    last_chg = (
        changelog.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col(key_col),
            F.col(op_col).alias("_op"),
            F.col(ts_col).alias("_chg_ts"),
            *[F.col(c).alias(f"_chg_{c}") for c in payload_cols],
        )
    )
    joined = base.join(last_chg, key_col, "full_outer")
    is_upsert = F.col("_op") == F.lit("U")
    cols: list[Column] = [F.col(key_col)]
    for c in payload_cols:
        cols.append(F.when(is_upsert, F.col(f"_chg_{c}")).otherwise(F.col(c)).alias(c))
    cols.append(
        F.when(is_upsert, F.col("_chg_ts")).otherwise(F.col(ts_col)).alias("updated_at")
    )
    # Drop keys whose final op is a delete; keep base-only and upserted.
    return joined.where(F.col("_op").isNull() | is_upsert).select(*cols)


def incremental_sessionize(
    hist_sessions: DataFrame,
    delta_events: DataFrame,
    gap_s: int,
) -> DataFrame:
    """Incremental session maintenance: fold a new batch of events into
    an existing per-session aggregate table WITHOUT rescanning raw
    history — the materialized-view analogue of ``stream_ops.
    sessionize`` (generalizing the reference's lazy per-poll liveness
    model, model/game.go:76-83, to batch pipelines).

    ``hist_sessions`` is the compact maintained state (user_id,
    session_start, session_end, n_events, cents), orders of magnitude
    smaller than the raw log; ``delta_events`` must be wholly AFTER
    every history event (the daily-append contract). Only a user's
    LAST history session can merge with their FIRST delta session
    (history is fully sessionized and the delta starts after it), so
    the merge is one equi-join on user_id against a per-user argmax of
    the compact state — cost O(|state| + |delta|), independent of raw
    history size.

    Returns the same schema as ``hist_sessions``; the result equals a
    from-scratch sessionization of history+delta (session ids dropped —
    renumbering is not identity-stable across incremental folds).
    """
    from goeventstream_spark.operators import stream_ops as so

    dsess = (
        so.sessionize(delta_events, gap_s=gap_s)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            F.sum("cents").alias("cents"),
        )
    )
    first_delta = dsess.groupBy("user_id").agg(
        F.min("session_id").alias("_first_sid")
    )
    dsess = dsess.join(first_delta, "user_id").withColumn(
        "_is_first", F.col("session_id") == F.col("_first_sid")
    )
    last_hist = hist_sessions.groupBy("user_id").agg(
        F.max("session_end").alias("_last_end")
    )
    firsts = (
        dsess.where("_is_first")
        .join(last_hist, "user_id", "left")
        .withColumn(
            "_merges",
            F.col("_last_end").isNotNull()
            & (
                F.unix_millis("session_start") - F.unix_millis("_last_end")
                <= gap_s * 1000
            ),
        )
    )
    # History sessions, with the merged ones' stats extended in place.
    merged_delta = firsts.where("_merges").select(
        "user_id",
        F.col("_last_end").alias("session_end_key"),
        F.col("session_end").alias("d_end"),
        F.col("n_events").alias("d_n"),
        F.col("cents").alias("d_cents"),
    )
    hist_out = (
        hist_sessions.alias("h")
        .join(
            merged_delta.alias("m"),
            (F.col("h.user_id") == F.col("m.user_id"))
            & (F.col("h.session_end") == F.col("m.session_end_key")),
            "left",
        )
        .select(
            F.col("h.user_id").alias("user_id"),
            F.col("h.session_start").alias("session_start"),
            F.coalesce("m.d_end", "h.session_end").alias("session_end"),
            (F.col("h.n_events") + F.coalesce("m.d_n", F.lit(0))).alias("n_events"),
            # SUM semantics across the merge: NULL only when BOTH parts
            # are all-NULL (sum() skips NULLs), never NULL-poisoned by a
            # one-sided all-NULL part — matches from-scratch sessionize.
            F.when(
                F.col("h.cents").isNull() & F.col("m.d_cents").isNull(),
                F.lit(None).cast("long"),
            )
            .otherwise(
                F.coalesce("h.cents", F.lit(0)) + F.coalesce("m.d_cents", F.lit(0))
            )
            .alias("cents"),
        )
    )
    delta_out = dsess.join(
        firsts.where("_merges").select("user_id", "session_id"),
        ["user_id", "session_id"],
        "left_anti",
    ).select("user_id", "session_start", "session_end", "n_events", "cents")
    return hist_out.unionByName(delta_out)


def interval_align_join(
    left: DataFrame, right: DataFrame, key_col: str = "user_id"
) -> DataFrame:
    """Temporal alignment join of two validity-interval tables on a
    shared key: one row per OVERLAPPING (left, right) interval pair,
    carrying both sides' attributes plus the intersected half-open
    window [ov_from, ov_to) and its exact millisecond length (NULL
    while the intersection is still open). This is the SCD2 x SCD2
    "align" primitive — e.g. which activity state held WHILE which
    value band held — that row-at-a-time engines do with cursors.

    Inputs carry (key_col, valid_from, valid_to, attributes...); a
    NULL valid_to is the open/current interval. Open ends are mapped
    to a far-future sentinel for the overlap arithmetic (engine-
    portable — greatest/least NULL semantics differ between engines,
    the sentinel sidesteps them) and mapped back to NULL on output.

    Plan: one equi-join on the key (sort-merge at scale, broadcast if
    a side is dim-sized) with the overlap predicate as the join
    residual; per key the output is O(runs_left + runs_right), never
    quadratic, because intervals within a side are disjoint by
    construction.
    """
    far = F.to_timestamp(F.lit("9999-12-31 00:00:00"))
    l = left.withColumnRenamed("valid_from", "_lf").withColumnRenamed("valid_to", "_lt")
    r = right.withColumnRenamed("valid_from", "_rf").withColumnRenamed("valid_to", "_rt")
    j = l.join(r, key_col).where(
        (F.col("_lf") < F.coalesce(F.col("_rt"), far))
        & (F.col("_rf") < F.coalesce(F.col("_lt"), far))
    )
    ov_from = F.greatest(F.col("_lf"), F.col("_rf"))
    ov_to_s = F.least(F.coalesce(F.col("_lt"), far), F.coalesce(F.col("_rt"), far))
    ov_to = F.when(ov_to_s == far, F.lit(None).cast("timestamp")).otherwise(ov_to_s)
    keep = [c for c in j.columns if c not in ("_lf", "_lt", "_rf", "_rt")]
    return j.select(
        *keep,
        ov_from.alias("ov_from"),
        ov_to.alias("ov_to"),
        F.when(
            ov_to_s != far,
            (F.unix_millis(ov_to_s) - F.unix_millis(ov_from)),
        )
        .cast("long")
        .alias("ov_ms"),
    )
