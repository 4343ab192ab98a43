"""Analytic batch replay of the reference server's full request
lifecycle (SURVEY.md §3, hard-part 1 of §7): given a poll schedule
(`syncs`) and the events posted with each poll (`posted`), reconstruct
the exact event log and per-sync deliveries the reference server would
produce — declaratively, as one DataFrame plan.

Reference semantics modeled (file:line):
- Virtual clock with remainder carry AND the strict tick threshold
  (model/game.go:81-90): `elapsedTime > STREAM_TICK_THRESHOLD_MS` is a
  strict inequality, so a poll landing exactly 50 ms after lastTick
  does NOT advance the clock (and lastTick stays put). The carry keeps
  lastTick ≡ t0 (mod 50), so with f = floor((now-t0)/50) and
  r = (now-t0) mod 50 the clock is f - d where the boundary lag
  d ∈ {0,1} obeys d_i = (d_{i-1} + Δf) mod 2 on polls with r == 0 and
  Δf ≤ 1, and d_i = 0 otherwise (r > 0 forces a catch-up tick; Δf ≥ 2
  means elapsed > 50 regardless of d). The recursion telescopes:
  d = (f - f_base) mod 2 from the last "reset" poll (r > 0, Δf ≥ 2, or
  stream start) — a pure two-window column expression, no loop. For
  any poll NOT landing exactly on a 50 ms boundary from t0 this
  reduces to the memoryless floor((now-t0)/50).
- Event time assignment T = LastSentT + 1 (model/eventStream.go:48-54)
  where LastSentT is the *previous* poll's clock (MarkSent runs after
  appends, model/game.go:65-69): a lag() over the poll order.
- Seed event `_a` at T=1 on stream creation (model/eventStream.go:34-42
  — stamped 1, not 0; SURVEY.md §1.4.6).
- Connect `_c` on first contact or reconnect after expiry
  (model/game.go:44-58); disconnect `_d` detected lazily at the first
  poll (by anyone) later than lastTouch + 10 s (model/game.go:92-107).
- Delivery = range scan lastKnown < T <= clock (model/eventStream.go:63-71),
  where lastKnown is the T the client saw on its previous poll.

Scale: everything partitions by game (single-game inputs here carry an
implicit key); windows order by (poll_ms, sync_id). No collects, no
loops — the "server" is a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TICK_MS = 50
CLIENT_TIMEOUT_MS = 10_000


def sync_clock(syncs: DataFrame) -> DataFrame:
    """Annotate each sync with the server clock after its tick
    (clock_t), the delivery watermark before it (last_sent_prev = the
    previous sync's clock), and the T assigned to events appended
    during it (assign_t = last_sent_prev + 1)."""
    w = Window.orderBy("poll_ms", "sync_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    t0 = F.min("poll_ms").over(w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
    fr = syncs.select(
        "*",
        F.floor((F.col("poll_ms") - t0) / TICK_MS).alias("_f"),
        ((F.col("poll_ms") - t0) % TICK_MS).alias("_r"),
    )
    prev_f = F.lag("_f").over(w)
    # Strict-boundary lag (module docstring): reset rows have d = 0;
    # chains of boundary-aligned polls alternate d by Δf parity.
    reset = (F.col("_r") > 0) | prev_f.isNull() | ((F.col("_f") - prev_f) >= 2)
    flagged = fr.select("*", F.when(reset, F.col("_f")).alias("_base_f"))
    base_f = F.last("_base_f", ignorenulls=True).over(wcum)
    d = F.when(F.col("_base_f").isNotNull(), F.lit(0)).otherwise((F.col("_f") - base_f) % 2)
    staged = flagged.select("*", (F.col("_f") - d).cast("long").alias("clock_t"))
    prev_clock = F.lag("clock_t").over(w)
    return staged.select(
        "*",
        F.coalesce(prev_clock, F.lit(0)).alias("last_sent_prev"),
        (F.coalesce(prev_clock, F.lit(0)) + 1).alias("assign_t"),
    ).drop("_f", "_r", "_base_f")


def connections(syncs: DataFrame) -> DataFrame:
    """Connection segments per user: a poll opens a new connection iff
    it is the user's first ever, or follows > timeout of silence (the
    previous registration expired — model/game.go:44-58,92-107, and a
    reconnect after expiry gets a NEW proxy id, unlike a reconnect
    before expiry, README.md:40). Proxy ids are the reference's single
    monotone counter (model/game.go:49-53) in connect-detection order =
    connection start order. Returns every sync annotated with its
    (conn_id, proxy_id)."""
    sc = sync_clock(syncs)
    wu = Window.partitionBy("user_id").orderBy("poll_ms", "sync_id")
    prev_ms = F.lag("poll_ms").over(wu)
    next_ms = F.lead("poll_ms").over(wu)
    # Start AND end flags come from the same window spec, so Spark
    # evaluates lag+lead in ONE sort pass; conn_start/conn_end rows are
    # then plain filters downstream (no per-consumer ranking windows).
    flagged = sc.withColumn(
        "is_conn_start",
        F.when(
            prev_ms.isNull() | (F.col("poll_ms") - prev_ms > CLIENT_TIMEOUT_MS), 1
        ).otherwise(0),
    ).withColumn(
        "is_conn_end",
        F.when(
            next_ms.isNull() | (next_ms - F.col("poll_ms") > CLIENT_TIMEOUT_MS), 1
        ).otherwise(0),
    ).withColumn(
        "conn_id", F.sum("is_conn_start").over(wu.rowsBetween(Window.unboundedPreceding, 0))
    )
    starts = flagged.where(F.col("is_conn_start") == 1).select(
        "user_id", "conn_id", F.col("poll_ms").alias("conn_start_ms")
    )
    wp = Window.orderBy("conn_start_ms", "user_id")
    proxies = starts.withColumn("proxy_id", F.row_number().over(wp).cast("string"))
    # The annotated relation is consumed by four log branches (seed,
    # connects, disconnects, posted) — without materialization each
    # branch re-executes the whole window chain (exchange reuse does not
    # fire across these shapes). |syncs| rows is tiny relative to the
    # log at any scale, so a lazy local checkpoint (materialized on
    # first action) is the right trade.
    return flagged.join(proxies, ["user_id", "conn_id"]).localCheckpoint(eager=False)


def server_log(syncs: DataFrame, posted: DataFrame) -> DataFrame:
    """The reconstructed append-only event log: seed, connects,
    disconnects, and posted events, each stamped with the reference's
    exact T and origin. Output: (t, kind_order, event_type, origin,
    body) where kind_order reproduces within-tick append order
    (_d before _c before posted — model/game.go:63-65).
    """
    conn = connections(syncs)

    # seed _a: appended at stream creation, always T=1, origin "_"
    seed = conn.groupBy().agg(F.min("poll_ms")).select(
        F.lit(1).cast("long").alias("t"),
        F.lit(0).alias("kind_order"),
        F.lit("_a").alias("event_type"),
        F.lit("_").alias("origin"),
        F.lit("seed").alias("body"),
    )

    # connect markers: each connection's opening poll appends _c
    connects = conn.where(F.col("is_conn_start") == 1).select(
        F.col("assign_t").alias("t"),
        F.lit(2).alias("kind_order"),
        F.lit("_c").alias("event_type"),
        F.col("proxy_id").alias("origin"),
        F.lit(None).cast("string").alias("body"),
    )

    # disconnect: each connection's LAST poll starts a 10 s deadline;
    # the _d is appended by the FIRST sync (any user) with
    # poll_ms > deadline. That is an as-of-FORWARD join, done scalably
    # with the union-merge trick (one sort, no theta/nested-loop join):
    # traverse all rows in ms-DESC order carrying the most recent sync
    # seen — for a deadline row that carried sync is exactly the
    # earliest sync strictly after it. Tie order (_side: deadline 0
    # before sync 1 at equal ms) enforces the STRICT inequality.
    deadlines = conn.where(F.col("is_conn_end") == 1).select(
        "user_id",
        "proxy_id",
        (F.col("poll_ms") + CLIENT_TIMEOUT_MS).alias("_ms"),
        F.lit(0).alias("_side"),
        F.lit(None).cast("long").alias("_sync_t"),
    )
    sync_rows = conn.select(
        F.lit(None).cast(conn.schema["user_id"].dataType).alias("user_id"),
        F.lit(None).cast("string").alias("proxy_id"),
        F.col("poll_ms").alias("_ms"),
        F.lit(1).alias("_side"),
        F.col("assign_t").alias("_sync_t"),
    )
    wd = (
        Window.orderBy(F.col("_ms").desc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    detected = (
        deadlines.unionByName(sync_rows)
        .withColumn("t", F.last("_sync_t", ignorenulls=True).over(wd))
        .where((F.col("_side") == 0) & F.col("t").isNotNull())
    )
    disconnects = detected.select(
        F.col("t"),
        F.lit(1).alias("kind_order"),
        F.lit("_d").alias("event_type"),
        F.col("proxy_id").alias("origin"),
        F.lit(None).cast("string").alias("body"),
    )

    # posted events: origin overwritten with the caller's proxy id
    # (model/game.go:119-125), T = the sync's assign_t
    events = (
        posted.join(conn.select("sync_id", "assign_t", "proxy_id"), "sync_id")
        .select(
            F.col("assign_t").alias("t"),
            (F.lit(3) + F.col("event_seq")).alias("kind_order"),
            F.col("event_type"),
            F.col("proxy_id").alias("origin"),
            F.col("body"),
        )
    )

    return (
        seed.unionByName(disconnects)
        .unionByName(connects)
        .unionByName(events)
        .withColumn("kind_order", F.col("kind_order").cast("long"))
        .orderBy("t", "kind_order", "origin")
    )


def deliveries(syncs: DataFrame, posted: DataFrame, users: list | None = None) -> DataFrame:
    """Per-sync delivered events: the range scan
    last_known < T <= clock_t (model/eventStream.go:63-71), where
    last_known is the clock the same client saw on its previous poll.
    Output: (sync_id, user_id, t, event_type, origin).

    Scalable form: a client's delivery windows partition the tick axis
    (last_known_k = clock_{k-1}), so each log row is delivered to a
    user by exactly ONE sync — the user's first sync with
    clock_t >= row.t. That is an as-of-forward join, computed with the
    union-merge trick per user (one sort; no range theta join, which
    Spark would nested-loop). Among equal-clock syncs (clock didn't
    advance between polls) the EARLIEST poll delivers — enforced by the
    tie order poll_ms DESC in the descending traversal. Self-posted
    events deliver in their own sync iff a tick elapsed (SURVEY.md
    §1.4.4) — they map to that same sync naturally when
    clock_k >= assign_t_k.

    ``users`` optionally restricts the receiving clients (the output is
    O(log-rows x clients) by nature — every client eventually receives
    every event).
    """
    sc = sync_clock(syncs)
    if users is not None:
        sc = sc.where(F.col("user_id").isin(users))
    log = server_log(syncs, posted)
    targets = sc.select("user_id").distinct()
    ev_rep = log.crossJoin(targets).select(
        "user_id",
        F.col("t").alias("_key"),
        F.lit(1).alias("_side"),
        F.lit(-1).cast("long").alias("_poll_ms"),
        F.lit(None).cast("long").alias("_sync_id"),
        "t",
        "event_type",
        "origin",
    )
    sync_rows = sc.select(
        "user_id",
        F.col("clock_t").alias("_key"),
        F.lit(0).alias("_side"),
        F.col("poll_ms").alias("_poll_ms"),
        F.col("sync_id").alias("_sync_id"),
        F.lit(None).cast("long").alias("t"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("string").alias("origin"),
    )
    wd = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("_key").desc(),
            F.col("_side").asc(),
            F.col("_poll_ms").desc(),
            F.col("_sync_id").desc(),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = ev_rep.unionByName(sync_rows).withColumn(
        "sync_id", F.last("_sync_id", ignorenulls=True).over(wd)
    )
    return carried.where(
        (F.col("_side") == 1) & F.col("sync_id").isNotNull()
    ).select("sync_id", "user_id", "t", "event_type", "origin")
