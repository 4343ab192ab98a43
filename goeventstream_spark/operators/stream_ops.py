"""Stream-semantics operators — the reference's query surface, batch form.

Every operator here reimplements a behavior of the reference server
(michaeldgagnon/GoEventStream) as a *declarative DataFrame composition*
so Catalyst plans it; nothing is imperative, nothing collects.

Reference parity map (SURVEY.md §2a):
- assign_ticks    <- R3  virtual-clock tick        (model/game.go:81-90)
- delta_scan      <- R9  delta event query         (model/eventStream.go:63-71)
- latest_state    <- R10 LWW state upsert          (model/stateStream.go:19-21)
- state_delta     <- R11 delta state query         (model/stateStream.go:27-35)
- connects        <- R5  connect detect + proxy id (model/game.go:44-58)
- disconnects     <- R4  liveness sweep            (model/game.go:92-107)
- sessionize      <- R4+R5 generalized             (model/game.go:12,17 — 10 s gap)
- stream_replay   <- R3-R13 composed               (model/game.go:60-74)

Determinism discipline (SURVEY.md §1.4): the reference's total order is
(T, arrival-slice-order). Spark has no implicit row order, so every
operator carries the explicit tiebreak key ``event_id`` (monotone per
FIXTURES.md) and orders by (t, event_id) where order matters.

Scale notes: all windows partition by ``user_id`` (at cluster scale, by
(game, user_id)) — state per key is tiny (one row), so these are
shuffle-once, no-skew plans. The only global window is proxy-id
assignment in ``connects``, which is inherently sequential in the
reference (a single counter, model/game.go:49-53); at 100 TB it must be
per-game (partition by game), never truly global — documented inline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# The fixtures' stream epoch (TESTDATA.md: events start 2024-01-01).
# Reference: stream start is captured at creation (model/eventStream.go:35).
STREAM_START = "2024-01-01 00:00:00"
# 1 tick = 50 ms: STREAM_TICKS_PER_SECOND=20 (model/game.go:10,15).
TICK_MS = 50
# Client disconnect after 10 s silence (model/game.go:12,17).
CLIENT_TIMEOUT_S = 10


def tick_col(ts: Column, stream_start: str = STREAM_START, tick_ms: int = TICK_MS) -> Column:
    """Wall-clock -> virtual tick (reference model/game.go:85: elapsed
    wall ms integer-divided by 50 ms). Pure column expression: stays in
    whole-stage codegen, pushes down through scans."""
    start_ms = F.unix_millis(F.lit(stream_start).cast("timestamp"))
    return F.floor((F.unix_millis(ts) - start_ms) / F.lit(tick_ms))


def assign_ticks(events: DataFrame, stream_start: str = STREAM_START, tick_ms: int = TICK_MS) -> DataFrame:
    """Add the virtual-tick column ``t`` (R3)."""
    return events.withColumn("t", tick_col(F.col("ts"), stream_start, tick_ms))


def delta_scan(events: DataFrame, t_lo: int, t_hi: int) -> DataFrame:
    """THE core query of the reference (R9): all events with
    ``t_lo < t <= t_hi`` in stable (t, event_id) order
    (model/eventStream.go:63-71: lastKnown < e.T && e.T <= stream.T).

    The range predicate sits directly over the scan so Catalyst pushes
    it into parquet row-group pruning; with a date/tick-partitioned
    event table at 100 TB this becomes partition pruning — O(delta), not
    the reference's O(log-length) rescan.
    """
    t = tick_col(F.col("ts"))
    return (
        events.where((t > F.lit(t_lo)) & (t <= F.lit(t_hi)))
        .withColumn("t", t)
        .orderBy("t", "event_id")
    )


def latest_state(events: DataFrame) -> DataFrame:
    """Last-writer-wins state per origin (R10): each event's ``props``
    payload is a state report; keep only the newest per ``user_id``
    (model/stateStream.go:19-21 overwrites the whole map).

    row_number over (user_id, t desc, event_id desc) — one shuffle on
    user_id, no skew (state is per-client). Streaming form lives in
    streaming/replay.py as keyed state.
    """
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        assign_ticks(events)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "t", F.col("props").alias("data"), "event_id")
    )


def state_delta(events: DataFrame, t_lo: int) -> DataFrame:
    """States changed since ``t_lo`` (R11): range predicate over the
    LWW relation (model/stateStream.go:27-35)."""
    return latest_state(events).where(F.col("t") > F.lit(t_lo))


def connects(events: DataFrame, game_col: str = "game") -> DataFrame:
    """First-seen per client + proxy-id assignment (R5,
    model/game.go:44-58): the reference allocates a monotone counter on
    first contact, and the counter lives on the Game object — it is
    PER GAME (model/game.go:49-53), never global. Batch replay: first
    event per (game, user), then row_number partitioned by game and
    ordered by (first_ts, user_id) = the arrival-order counter.

    SCALE NOTE: the sequential counter window is partitioned by the
    game key, so at 100 TB each stream's counter is one bounded task
    (clients-per-game rows), exactly the reference's per-game mutex
    scope. The per-user min() is the heavy part and is a normal
    partial-agg shuffle on (game, user). For a log that is a single
    stream, use :func:`connects_single_stream`.
    """
    firsts = (
        assign_ticks(events)
        .groupBy(game_col, "user_id")
        .agg(F.min("ts").alias("first_ts"), F.min("t").alias("t"))
    )
    w = Window.partitionBy(game_col).orderBy("first_ts", "user_id")
    return firsts.withColumn("proxy_id", F.row_number().over(w)).select(
        game_col, "user_id", "first_ts", "t", "proxy_id"
    )


def connects_single_stream(events: DataFrame) -> DataFrame:
    """Single-stream scoped form of :func:`connects`: the whole log IS
    one game, so the counter window is one (bounded, per-game) task by
    construction. Only for logs known to be one stream — the declared
    multi-stream form above is the scale default."""
    out = connects(events.withColumn("_g", F.lit(0)), game_col="_g")
    return out.drop("_g")


def disconnects(events: DataFrame, gap_s: int = CLIENT_TIMEOUT_S) -> DataFrame:
    """Session-end detection (R4, model/game.go:92-107): a client silent
    > gap_s seconds is disconnected. Batch analogue of the state
    timeout: lead(ts) gap predicate per user — an event is a disconnect
    point if the *next* event from the same user is > gap_s later (or
    never comes).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        assign_ticks(events)
        .withColumn("_next_ts", nxt)
        .where(
            F.col("_next_ts").isNull()
            | (F.unix_millis("_next_ts") - F.unix_millis("ts") > gap_s * 1000)
        )
        .select("user_id", F.col("ts").alias("last_seen_ts"), "t", "event_id")
    )


def sessionize(events: DataFrame, gap_s: int = CLIENT_TIMEOUT_S) -> DataFrame:
    """Gap sessionization (generalizes R4+R5): assign each event a
    per-user session number via the cumulative-sum-of-new-session-flags
    window trick. One shuffle on user_id; both windows share it
    (identical partitioning), so Catalyst plans a single exchange.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull() | (F.unix_millis("ts") - F.unix_millis(prev) > gap_s * 1000), 1
    ).otherwise(0)
    return events.withColumn("_new", is_new).withColumn(
        "session_id",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_new")


def session_stats(events: DataFrame, gap_s: int = CLIENT_TIMEOUT_S) -> DataFrame:
    """Per-session aggregate view: start/end/duration/event count."""
    return (
        sessionize(events, gap_s)
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            # exact decimal sum (order-independent; fixture values are
            # cents-precise) — a raw double sum is fold-order-dependent
            # and can flip a .005 rounding boundary between engines
            F.sum(F.col("value").cast("decimal(28,2)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


def stream_replay(
    events: DataFrame, gap_s: int = CLIENT_TIMEOUT_S, t_lo: int | None = None, t_hi: int | None = None
) -> DataFrame:
    """Flagship composition (R3-R13): deterministic reconstruction of
    the full stream a reference client would observe — the raw events
    *plus* synthesized ``_c`` (connect, model/eventStream.go:81-83) and
    ``_d`` (disconnect, model/eventStream.go:77-79) marker rows at
    session boundaries, all tick-stamped, optionally restricted to the
    delta window ``(t_lo, t_hi]`` (R9).

    Output schema: (t, user_id, event_type, body) ordered by
    (t, user_id, event_type). Marker rows carry a null body, mirroring
    server-authored events whose Body the clients interpret by Type
    (README.md:59-62).
    """
    # Session bounds fall out of the SAME gap window that sessionize
    # uses: an event starts a session iff its lag-gap exceeds gap_s (or
    # is first), ends one iff its lead-gap does (or is last). Deriving
    # markers per-row instead of re-aggregating (user_id, session_id)
    # saves the second shuffle — the whole replay is ONE exchange on
    # user_id plus the final presentation sort.
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev, nxt = F.lag("ts").over(w), F.lead("ts").over(w)
    gap_ms = gap_s * 1000
    starts = prev.isNull() | (F.unix_millis("ts") - F.unix_millis(prev) > gap_ms)
    ends = nxt.isNull() | (F.unix_millis(nxt) - F.unix_millis("ts") > gap_ms)
    null_body = F.lit(None).cast("string")
    # one window pass, then EXPLODE each event into 1-3 output rows
    # (event + optional _c/_d markers) — a 3-way union would re-execute
    # the window subplan per branch; this form computes it once. The
    # window flags must be projected BEFORE the generator (window
    # expressions are not allowed inside explode).
    flagged = events.select(
        tick_col(F.col("ts")).alias("t"),
        "user_id",
        "event_type",
        F.col("props").alias("body"),
        starts.alias("_starts"),
        ends.alias("_ends"),
    )
    emitted = F.array_compact(
        F.array(
            F.when(
                F.col("_starts"),
                F.struct(F.lit("_c").alias("event_type"), null_body.alias("body")),
            ),
            F.struct(F.col("event_type"), F.col("body")),
            F.when(
                F.col("_ends"),
                F.struct(F.lit("_d").alias("event_type"), null_body.alias("body")),
            ),
        )
    )
    out = flagged.select("t", "user_id", F.explode(emitted).alias("_r")).select(
        "t", "user_id", F.col("_r.event_type"), F.col("_r.body")
    )
    if t_lo is not None:
        out = out.where(F.col("t") > F.lit(t_lo))
    if t_hi is not None:
        out = out.where(F.col("t") <= F.lit(t_hi))
    # Presentation order must keep the server's within-tick append
    # semantics: connect BEFORE the session's events, disconnect AFTER
    # them. A plain event_type sort would place '_d' (0x5F) before
    # every lowercase event type at the same tick.
    marker_rank = (
        F.when(F.col("event_type") == "_c", 0)
        .when(F.col("event_type") == "_d", 2)
        .otherwise(1)
    )
    return out.orderBy("t", "user_id", marker_rank, "event_type")
