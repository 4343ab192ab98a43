"""Analytic batch replay of the reference server's full request
lifecycle (SURVEY.md §3, hard-part 1 of §7): given a poll schedule
(`syncs`) and the events posted with each poll (`posted`), reconstruct
the exact event log and per-sync deliveries the reference server would
produce — declaratively, as one DataFrame plan.

Reference semantics modeled (file:line):
- Multi-game partitioning (main.go:74-80, model/game.go:25-32): every
  stream is an independent keyed state machine; all windows below
  partition by (game, gen). Single-game callers get a constant key —
  the plan is identical, so the single-game form IS the per-game form.
- Game GC -> restart (model/game.go:76-78, main.go:32-46): a game idle
  > 60 s is deleted by the sweeper; the next poll recreates it from
  scratch (NewGame -> NewEventStream -> Restart, model/eventStream.go:
  34-42): fresh clock epoch, fresh proxy counter, fresh log with a new
  seed `_a` at T=1. Each such instance is a `gen` (generation),
  segmented on > 60 s gaps between a game's consecutive polls.
  Two documented idealizations: (1) the real sweeper fires once per
  minute at arbitrary phase, so a gap in (60 s, 120 s) restarts only
  if a sweep lands in it — we model the deterministic limit where
  every > 60 s gap restarts; (2) expiry compares against lastTick
  (= last poll rounded down to its tick boundary), so the true
  threshold exceeds the raw poll gap by the carry (< 100 ms) — we
  segment on the raw gap. The Python reference simulator
  (tests/reference_sim.py) applies the same two rules, so equivalence
  is exact and fuzz-tested. The reference's StreamSeq is 1 in every
  instance (Restart only runs at creation; MarkEnd is dead code), so
  `gen` is replay bookkeeping, not a protocol field.
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
  generation start) — a pure two-window column expression, no loop.
  For any poll NOT landing exactly on a 50 ms boundary from t0 this
  reduces to the memoryless floor((now-t0)/50).
- Event time assignment T = LastSentT + 1 (model/eventStream.go:48-54)
  where LastSentT is the *previous* poll's clock (MarkSent runs after
  appends, model/game.go:65-69): a lag() over the generation's polls.
- Seed event `_a` at T=1 on stream creation (model/eventStream.go:34-42
  — stamped 1, not 0; SURVEY.md §1.4.6) — once per (game, gen).
- Connect `_c` on first contact or reconnect after expiry
  (model/game.go:44-58); disconnect `_d` detected lazily at the first
  poll (by anyone in the same game instance) later than
  lastTouch + 10 s (model/game.go:92-107). Proxy ids are the per-game
  monotone counter (model/game.go:49-53), reset with the instance.
- Delivery = range scan lastKnown < T <= clock (model/eventStream.go:
  63-71), where lastKnown is the T the client saw on its previous poll
  of the same generation (clients reset on `_a` per README.md's
  OnReset contract, so the first poll of a generation reads from 0).

Scale: every window partitions by (game, gen) (plus user_id where the
semantics are per-client); nothing is single-partition when there are
many games. No collects, no loops — the "server" is a query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TICK_MS = 50
CLIENT_TIMEOUT_MS = 10_000
GAME_TIMEOUT_MS = 60_000


def with_game_gen(syncs: DataFrame, game_col: str | None = None) -> DataFrame:
    """Annotate the poll schedule with (game, gen): `game` is the
    stream key (a constant for single-game inputs — same plan shape),
    `gen` counts the game's instances, incremented whenever a poll
    follows > 60 s of game silence (GC -> recreate; module docstring).
    """
    g = F.col(game_col).cast("string") if game_col else F.lit("_")
    base = syncs.withColumn("game", g)
    wg = Window.partitionBy("game").orderBy("poll_ms", "sync_id")
    gap = F.col("poll_ms") - F.lag("poll_ms").over(wg)
    flagged = base.select(
        "*",
        F.when(gap.isNull() | (gap > GAME_TIMEOUT_MS), 1).otherwise(0).alias("_new_gen"),
    )
    return flagged.select(
        "*",
        F.sum("_new_gen").over(wg.rowsBetween(Window.unboundedPreceding, 0)).alias("gen"),
    ).drop("_new_gen")


def sync_clock(syncs: DataFrame, game_col: str | None = None) -> DataFrame:
    """Annotate each sync with (game, gen), the server clock after its
    tick (clock_t), the delivery watermark before it (last_sent_prev =
    the previous sync's clock within the generation), and the T
    assigned to events appended during it (assign_t = last_sent_prev
    + 1)."""
    s = with_game_gen(syncs, game_col)
    w = Window.partitionBy("game", "gen").orderBy("poll_ms", "sync_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, 0)
    t0 = F.first("poll_ms").over(wcum)  # generation epoch: its first poll
    fr = s.select(
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


def connections(syncs: DataFrame, game_col: str | None = None) -> DataFrame:
    """Connection segments per (game, gen, user): a poll opens a new
    connection iff it is the user's first in this game instance, or
    follows > timeout of silence (the previous registration expired —
    model/game.go:44-58,92-107; a reconnect after expiry gets a NEW
    proxy id, unlike a reconnect before expiry — the README.md:40
    same-public-id claim describes pre-expiry reconnects only, the
    code deletes the mapping on expiry). Proxy ids are the per-game
    monotone counter (model/game.go:49-53), reset per instance, in
    connect-detection order = connection start order. Returns every
    sync annotated with its (conn_id, proxy_id)."""
    sc = sync_clock(syncs, game_col)
    wu = Window.partitionBy("game", "gen", "user_id").orderBy("poll_ms", "sync_id")
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
        "game", "gen", "user_id", "conn_id",
        F.col("poll_ms").alias("conn_start_ms"),
        F.col("sync_id").alias("_start_sync"),
    )
    # Tie order at equal ms is ARRIVAL order = sync_id (the reference
    # processes polls sequentially under one mutex; the sim and the
    # streaming game_server both sort by (poll_ms, sync_id)) — NOT
    # user_id, which diverges whenever two users' first polls share a
    # millisecond with sync ids opposite to user order.
    wp = Window.partitionBy("game", "gen").orderBy("conn_start_ms", "_start_sync")
    proxies = starts.withColumn("proxy_id", F.row_number().over(wp).cast("string"))
    # The annotated relation is consumed by four log branches (seed,
    # connects, disconnects, posted) — without materialization each
    # branch re-executes the whole window chain (exchange reuse does not
    # fire across these shapes). |syncs| rows is tiny relative to the
    # log at any scale, so a lazy local checkpoint (materialized on
    # first action) is the right trade.
    return flagged.join(
        proxies.select("game", "gen", "user_id", "conn_id", "proxy_id"),
        ["game", "gen", "user_id", "conn_id"],
    ).localCheckpoint(eager=False)


def server_log(
    syncs: DataFrame,
    posted: DataFrame,
    game_col: str | None = None,
    conn: DataFrame | None = None,
) -> DataFrame:
    """The reconstructed append-only event log across every game
    instance: seed, connects, disconnects, and posted events, each
    stamped with the reference's exact T and origin. Output: (game,
    gen, t, kind_order, event_type, origin, body) where kind_order
    reproduces within-tick append order (_d before _c before posted —
    model/game.go:63-65).

    ``conn`` lets a caller that already materialized connections()
    share it (the envelope path consumes it from three operators —
    one checkpoint instead of three).
    """
    if conn is None:
        conn = connections(syncs, game_col)

    # seed _a: appended at instance creation, always T=1, origin "_"
    seed = conn.select("game", "gen").distinct().select(
        "game",
        "gen",
        F.lit(1).cast("long").alias("t"),
        F.lit(0).alias("kind_order"),
        F.lit("_a").alias("event_type"),
        F.lit("_").alias("origin"),
        F.lit("seed").alias("body"),
    )

    # connect markers: each connection's opening poll appends _c
    connects = conn.where(F.col("is_conn_start") == 1).select(
        "game",
        "gen",
        F.col("assign_t").alias("t"),
        F.lit(2).alias("kind_order"),
        F.lit("_c").alias("event_type"),
        F.col("proxy_id").alias("origin"),
        F.lit(None).cast("string").alias("body"),
    )

    # disconnect: each connection's LAST poll starts a 10 s deadline;
    # the _d is appended by the FIRST sync (any user, same game
    # instance) with poll_ms > deadline. That is an as-of-FORWARD
    # join, done scalably with the union-merge trick (one sort, no
    # theta/nested-loop join): traverse rows in ms-DESC order carrying
    # the most recent sync seen — for a deadline row that carried sync
    # is exactly the earliest sync strictly after it. Tie order
    # (_side: deadline 0 before sync 1 at equal ms) enforces the
    # STRICT inequality. A deadline with no later sync in its instance
    # never emits a _d (the game was GC'd silently) — the isNotNull
    # filter per partition.
    deadlines = conn.where(F.col("is_conn_end") == 1).select(
        "game",
        "gen",
        "user_id",
        "proxy_id",
        (F.col("poll_ms") + CLIENT_TIMEOUT_MS).alias("_ms"),
        F.lit(0).alias("_side"),
        F.col("sync_id").alias("_sid"),
        F.lit(None).cast("long").alias("_sync_t"),
    )
    sync_rows = conn.select(
        "game",
        "gen",
        F.lit(None).cast(conn.schema["user_id"].dataType).alias("user_id"),
        F.lit(None).cast("string").alias("proxy_id"),
        F.col("poll_ms").alias("_ms"),
        F.lit(1).alias("_side"),
        F.col("sync_id").alias("_sid"),
        F.col("assign_t").alias("_sync_t"),
    )
    # _sid DESC makes the running last() pick the SMALLEST sync_id
    # among syncs tied on the same millisecond — the reference's
    # arrival order (our declared (poll_ms, sync_id) serialization).
    # Without it the tie order is physical-partition-dependent: at
    # sf0.1 (~26 polls/s, frequent ms collisions) two runs assigned
    # different t to a handful of _d rows.
    wd = (
        Window.partitionBy("game", "gen")
        .orderBy(F.col("_ms").desc(), F.col("_side").asc(), F.col("_sid").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    detected = (
        deadlines.unionByName(sync_rows)
        .withColumn("t", F.last("_sync_t", ignorenulls=True).over(wd))
        .where((F.col("_side") == 0) & F.col("t").isNotNull())
    )
    disconnects = detected.select(
        "game",
        "gen",
        F.col("t"),
        F.lit(1).alias("kind_order"),
        F.lit("_d").alias("event_type"),
        F.col("proxy_id").alias("origin"),
        F.lit(None).cast("string").alias("body"),
    )

    # posted events: origin overwritten with the caller's proxy id
    # (model/game.go:119-125), T = the sync's assign_t
    events = (
        posted.join(conn.select("sync_id", "game", "gen", "assign_t", "proxy_id"), "sync_id")
        .select(
            "game",
            "gen",
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
        .withColumn("gen", F.col("gen").cast("long"))
        .orderBy("game", "gen", "t", "kind_order", "origin")
    )


def deliveries(
    syncs: DataFrame,
    posted: DataFrame,
    users: list | None = None,
    game_col: str | None = None,
    with_detail: bool = False,
    conn: DataFrame | None = None,
) -> DataFrame:
    """Per-sync delivered events: the range scan
    last_known < T <= clock_t (model/eventStream.go:63-71), where
    last_known is the clock the same client saw on its previous poll
    of the same game instance (restart-aware clients — README OnReset —
    read a fresh instance from 0). Output: (sync_id, user_id, t,
    event_type, origin).

    Scalable form: a client's delivery windows partition the tick axis
    (last_known_k = clock_{k-1}), so each log row is delivered to a
    user by exactly ONE sync — the user's first sync with
    clock_t >= row.t. That is an as-of-forward join, computed with the
    union-merge trick per (game, gen, user) (one sort; no range theta
    join, which Spark would nested-loop). Among equal-clock syncs
    (clock didn't advance between polls) the EARLIEST poll delivers —
    enforced by the tie order poll_ms DESC in the descending
    traversal. Self-posted events deliver in their own sync iff a tick
    elapsed (SURVEY.md §1.4.4) — they map to that same sync naturally
    when clock_k >= assign_t_k.

    ``users`` optionally restricts the receiving clients (the output is
    O(log-rows x clients) by nature — every client eventually receives
    every event of the instances it polls). ``with_detail`` carries the
    log row's (kind_order, body) through for envelope serialization.
    """
    sc = conn if conn is not None else sync_clock(syncs, game_col)
    if users is not None:
        sc = sc.where(F.col("user_id").isin(users))
    log = server_log(syncs, posted, game_col, conn=conn)
    targets = sc.select("game", "gen", "user_id").distinct()
    ev_rep = log.join(targets, ["game", "gen"]).select(
        "game",
        "gen",
        "user_id",
        F.col("t").alias("_key"),
        F.lit(1).alias("_side"),
        F.lit(-1).cast("long").alias("_poll_ms"),
        F.lit(None).cast("long").alias("_sync_id"),
        "t",
        "event_type",
        "origin",
        "kind_order",
        "body",
    )
    sync_rows = sc.select(
        "game",
        "gen",
        "user_id",
        F.col("clock_t").alias("_key"),
        F.lit(0).alias("_side"),
        F.col("poll_ms").alias("_poll_ms"),
        F.col("sync_id").alias("_sync_id"),
        F.lit(None).cast("long").alias("t"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("string").alias("origin"),
        F.lit(None).cast("long").alias("kind_order"),
        F.lit(None).cast("string").alias("body"),
    )
    wd = (
        Window.partitionBy("game", "gen", "user_id")
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
    cols = ["sync_id", "user_id", "t", "event_type", "origin"]
    if with_detail:
        cols += ["kind_order", "body"]
    return carried.where(
        (F.col("_side") == 1) & F.col("sync_id").isNotNull()
    ).select(*cols)


def state_deltas(
    syncs: DataFrame,
    states: DataFrame,
    users: list | None = None,
    game_col: str | None = None,
    conn: DataFrame | None = None,
) -> DataFrame:
    """Per-sync delivered STATE stamps — GetDeltaState's LWW map scan
    (model/stateStream.go:27-35), replayed declaratively.

    Model: every poll reports the caller's state (``states``:
    (sync_id, data) — GameRequest.State non-nil on every request), so
    proxy p's live stamp at any instant is p's most recent poll, stamped
    with that poll's STATE clock = event clock + 1 (SetState stamps
    stateStream.T, which starts at 1 — model/stateStream.go:11-17 —
    and ticks in lockstep with the event clock, model/game.go:86-88;
    so a first-poll state echoes back immediately: 1 > 0). A receiver
    sync k by user u then sees p's state iff (model/game.go:60-74 order
    of operations):

    1. p's latest poll m_p is at-or-before k in mutex order — including
       p == u's own stamp at k itself (applyState precedes
       GetDeltaState);
    2. p survived k's expiry sweep: ms_k - ms(m_p) <= 10 s (strict >
       expires, model/game.go:96-99; expiry deletes the state, and a
       later re-poll re-creates it, so only the LATEST poll's age
       matters);
    3. the LWW delta condition last_known < clock(m_p) + 1, i.e.
       last_known <= clock(m_p) (stamp <= stateStream.T_k holds
       automatically — clocks are monotone).

    Scalable form: stamps replicated per receiving user (output is
    O(stamps x receivers) by nature, like deliveries), then one
    union-merge carry per (game, gen, receiver, sender) — no theta
    join. Output: (sync_id, user_id, state_t, origin, data).
    """
    if conn is None:
        conn = connections(syncs, game_col)
    # EVERY sender poll is a liveness touch (model/game.go:92-107 keys
    # expiry on lastTouch, refreshed by any poll); only polls that
    # REPORT state are stamps. Keying expiry on the last stamp would
    # wrongly drop a state whose sender kept polling without
    # re-reporting — the reference keeps it while the client lives.
    # A stamp also dies with its connection (expiry deletes the state
    # map entry, model/game.go:99), so the carried stamp remembers its
    # conn_id and is only visible while the sender's CURRENT conn is
    # the same one.
    stamps = conn.join(states, "sync_id", "left").select(
        "game",
        "gen",
        F.col("user_id").alias("_sender"),
        "poll_ms",
        "sync_id",
        "clock_t",
        "proxy_id",
        "conn_id",
        "data",
    )
    # Fan-out bound: a sender that never reports state has nothing to
    # deliver (its carried stamp stays NULL and the final filter drops
    # every row), so tracking its liveness per receiver is pure waste —
    # with sparse reporting the blowup is all-polls x receivers instead
    # of reporting-senders' polls x receivers. Semi-join the per-sender
    # stream to senders with >= 1 actual stamp before replication.
    real_senders = (
        stamps.where(F.col("data").isNotNull())
        .select("game", "gen", "_sender")
        .distinct()
    )
    stamps = stamps.join(real_senders, ["game", "gen", "_sender"], "left_semi")
    recv = conn if users is None else conn.where(F.col("user_id").isin(users))
    # lastKnownT is what the CLIENT saw on ITS previous poll of this
    # generation (the URL's lastTime param, main.go:60-62) — a per-user
    # lag of the clock, NOT the stream-global last_sent_prev.
    wlk = Window.partitionBy("game", "gen", "user_id").orderBy("poll_ms", "sync_id")
    recv = recv.withColumn(
        "_last_known", F.coalesce(F.lag("clock_t").over(wlk), F.lit(0))
    )
    targets = recv.select("game", "gen", F.col("user_id").alias("_recv")).distinct()
    # SetState stamps stateStream.T, which starts at 1 and ticks in
    # lockstep with the event clock (model/stateStream.go:11-25) —
    # so the stamp is clock_t + 1, and the LWW delta condition
    # last_known < stamp is the reference's last_known <= clock.
    # The stamp travels as ONE nullable struct so a touch-only poll
    # (data null) can never split the carry into a mixed tuple of new
    # clock + old data.
    stamp_struct = F.when(
        F.col("data").isNotNull(),
        F.struct(
            F.col("poll_ms").alias("ms"),
            (F.col("clock_t") + 1).cast("long").alias("clock"),
            F.col("proxy_id").alias("proxy"),
            F.col("data").alias("data"),
            F.col("conn_id").alias("conn"),
        ),
    )
    touch_struct = F.struct(
        F.col("poll_ms").alias("ms"), F.col("conn_id").alias("conn")
    )
    stamp_rows = stamps.join(targets, ["game", "gen"]).select(
        "game",
        "gen",
        "_recv",
        "_sender",
        F.col("poll_ms").alias("_ms"),
        F.col("sync_id").alias("_sid"),
        F.lit(0).alias("_side"),
        stamp_struct.alias("s_stamp"),
        touch_struct.alias("s_touch"),
        F.lit(None).cast("long").alias("r_sync_id"),
        F.lit(None).cast("long").alias("r_last_known"),
        F.lit(None).cast(conn.schema["user_id"].dataType).alias("r_user"),
    )
    stamp_t = stamp_rows.schema["s_stamp"].dataType
    touch_t = stamp_rows.schema["s_touch"].dataType
    recv_rows = recv.join(
        stamps.select("game", "gen", "_sender").distinct(), ["game", "gen"]
    ).select(
        "game",
        "gen",
        F.col("user_id").alias("_recv"),
        "_sender",
        F.col("poll_ms").alias("_ms"),
        F.col("sync_id").alias("_sid"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(stamp_t).alias("s_stamp"),
        F.lit(None).cast(touch_t).alias("s_touch"),
        F.col("sync_id").alias("r_sync_id"),
        F.col("_last_known").alias("r_last_known"),
        F.col("user_id").alias("r_user"),
    )
    # Ascending mutex order; at the same sync the stamp (side 0) lands
    # before the read (side 1): applyState precedes GetDeltaState.
    wc = (
        Window.partitionBy("game", "gen", "_recv", "_sender")
        .orderBy("_ms", "_sid", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = (
        stamp_rows.unionByName(recv_rows)
        .withColumn("_stamp", F.last("s_stamp", ignorenulls=True).over(wc))
        .withColumn("_touch", F.last("s_touch", ignorenulls=True).over(wc))
    )
    # Visible iff the sender is ALIVE at this sync (last touch within
    # the timeout) and the stamp belongs to the sender's current
    # connection (an expiry in between deleted it; a reconnect without
    # a fresh report has no state), and the LWW clock gate passes.
    return carried.where(
        (F.col("_side") == 1)
        & F.col("_stamp").isNotNull()
        & (F.col("_ms") - F.col("_touch.ms") <= CLIENT_TIMEOUT_MS)
        & (F.col("_stamp.conn") == F.col("_touch.conn"))
        & (F.col("_stamp.clock") > F.col("r_last_known"))
    ).select(
        F.col("r_sync_id").alias("sync_id"),
        F.col("r_user").alias("user_id"),
        F.col("_stamp.clock").alias("state_t"),
        F.col("_stamp.proxy").alias("origin"),
        F.col("_stamp.data").alias("data"),
    )


def _json_escape(col):
    """Minimal JSON string escaping (backslash, quote) — identical
    formulas exist in DuckDB, so serialized envelopes hash-match
    cross-engine. Fixture bodies contain neither control chars nor
    non-ASCII, so the minimal escape IS the full escape here."""
    return F.replace(
        F.replace(col, F.lit("\\"), F.lit("\\\\")), F.lit('"'), F.lit('\\"')
    )


def game_response(
    syncs: DataFrame,
    posted: DataFrame,
    states: DataFrame,
    users: list | None = None,
    game_col: str | None = None,
) -> DataFrame:
    """The per-sync GameResponse envelope ``{T, Events, States,
    ProxyId}`` the reference serializes to every poll (main.go:102-115,
    json.Marshal field order) — the engine's sink-side parity surface.

    Per receiver sync: T = the stream clock after this poll's tick,
    Events = GetDeltaEvents(last_known) serialized as the reference's
    Event structs — for ``_a``/``_c``/``_d`` markers Origin is "_" and
    Body carries the payload/proxy id (model/eventStream.go:41,77-84);
    posted events carry the caller's proxy as Origin (game.go:119-125)
    — States = GetDeltaState(last_known) as State structs, ProxyId =
    the caller's proxy.

    Two documented canonicalizations (both parity-neutral): Events sort
    by (T, kind_order, origin) — the reference emits append order,
    which (T, within-tick kind order) reproduces except between two
    same-tick posts, where append order = mutex order is replay-
    equivalent but not column-derivable; States sort by numeric origin
    — the reference iterates a Go map, whose order is deliberately
    randomized, so ANY fixed order is as faithful as the server is to
    itself. Seed bodies are the constant 'seed' where the reference
    draws rand.Int63 (model/eventStream.go:41) — the one field replay
    cannot reproduce by definition.
    """
    conn = connections(syncs, game_col)
    recv = conn if users is None else conn.where(F.col("user_id").isin(users))

    ev = deliveries(
        syncs, posted, users=users, game_col=game_col, with_detail=True, conn=conn
    )
    ev_origin = F.when(
        F.col("event_type").isin("_a", "_c", "_d"), F.lit("_")
    ).otherwise(F.col("origin"))
    ev_body = (
        F.when(F.col("event_type").isin("_c", "_d"), F.col("origin"))
        .otherwise(F.coalesce(F.col("body"), F.lit("")))
    )
    ev_str = F.concat(
        F.lit('{"T":'),
        F.col("t").cast("string"),
        F.lit(',"Type":"'),
        F.col("event_type"),
        F.lit('","Origin":"'),
        ev_origin,
        F.lit('","Body":"'),
        _json_escape(ev_body),
        F.lit('"}'),
    )
    ev_agg = (
        ev.select(
            "sync_id",
            "user_id",
            F.struct(
                F.col("t"), F.col("kind_order"), ev_origin.alias("o"), ev_str.alias("s")
            ).alias("_e"),
        )
        .groupBy("sync_id", "user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("_e")), lambda e: e["s"]), ","
            ).alias("events_json")
        )
    )

    st = state_deltas(syncs, states, users=users, game_col=game_col, conn=conn)
    st_str = F.concat(
        F.lit('{"T":'),
        F.col("state_t").cast("string"),
        F.lit(',"Origin":"'),
        F.col("origin"),
        F.lit('","Data":'),
        F.col("data"),
        F.lit("}"),
    )
    st_agg = (
        st.select(
            "sync_id",
            "user_id",
            F.struct(
                F.col("origin").cast("long").alias("o"), st_str.alias("s")
            ).alias("_s"),
        )
        .groupBy("sync_id", "user_id")
        .agg(
            F.array_join(
                F.transform(F.array_sort(F.collect_list("_s")), lambda s: s["s"]), ","
            ).alias("states_json")
        )
    )

    base = recv.select("sync_id", "user_id", F.col("clock_t").alias("t"), "proxy_id")
    out = (
        base.join(ev_agg, ["sync_id", "user_id"], "left")
        .join(st_agg, ["sync_id", "user_id"], "left")
    )
    return out.select(
        "sync_id",
        "user_id",
        "t",
        "proxy_id",
        F.concat(
            F.lit('{"T":'),
            F.col("t").cast("string"),
            F.lit(',"Events":['),
            F.coalesce(F.col("events_json"), F.lit("")),
            F.lit('],"States":['),
            F.coalesce(F.col("states_json"), F.lit("")),
            F.lit('],"ProxyId":"'),
            F.col("proxy_id"),
            F.lit('"}'),
        ).alias("response"),
    )
