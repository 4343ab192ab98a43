"""Round-trip protocol equivalence (SURVEY.md §5.3): a scripted
multi-client session driven through the pure-Python reference
simulator AND the Spark analytic replay must produce identical event
logs and identical per-sync deliveries."""

from __future__ import annotations

import random

import pytest
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from goeventstream_spark.operators import protocol_replay as pr
from tests.reference_sim import ReferenceSim, ServerSim

SYNCS_SCHEMA = StructType(
    [
        StructField("sync_id", LongType()),
        StructField("user_id", StringType()),
        StructField("poll_ms", LongType()),
    ]
)
POSTED_SCHEMA = StructType(
    [
        StructField("sync_id", LongType()),
        StructField("event_seq", LongType()),
        StructField("event_type", StringType()),
        StructField("body", StringType()),
    ]
)


@pytest.fixture(
    scope="module",
    params=[
        (42, "mixed"),
        (7, "mixed"),
        (1234, "mixed"),
        (42, "boundary"),
        (99, "boundary"),
        (5, "collision"),
        (61, "collision"),
    ],
    ids=["s42", "s7", "s1234", "s42-boundary", "s99-boundary", "s5-coll", "s61-coll"],
)
def schedule(request):
    """Deterministic scripted session: clients polling with deliberate
    >10 s silences (forcing expiry/reconnect cycles) and occasional
    posted events. Unique poll times to sidestep the reference's
    map-iteration nondeterminism on simultaneous expiry. Parametrized
    over seeds — cheap fuzzing of the equivalence.

    The "boundary" mode is a single client whose gaps are mostly
    EXACTLY 50 ms — the strict-threshold edge (model/game.go:83) where
    a poll landing exactly one tick after lastTick must NOT advance
    the clock; chains of such polls alternate a 1-tick lag vs the
    naive floor((now-t0)/50) model (ADVICE r1, medium)."""
    seed, mode = request.param
    rng = random.Random(seed)
    t = 1_000_000
    syncs, posted = [], []
    sync_id = 0
    if mode == "boundary":
        now = t
        for _step in range(400):
            syncs.append((sync_id, "u0", now))
            if rng.random() < 0.3:
                posted.append((sync_id, 0, f"ev{rng.randint(0, 9)}", f"b{sync_id}"))
            # mostly exact-tick gaps; sprinkle of off-by-one and
            # multi-tick jumps to break and restart boundary chains
            gap = rng.choices([50, 100, 49, 51, 150, 25], weights=[60, 15, 8, 8, 5, 4])[0]
            now += gap
            sync_id += 1
        return syncs, posted
    if mode == "collision":
        # Multiple users polling at the SAME millisecond — the tie
        # class that made the sf0.1 sweep's _d tick assignment
        # partition-order-dependent before the (_ms, _side, _sid)
        # total order. Our declared serialization is (poll_ms,
        # sync_id); the sim consumes polls in exactly that order, so
        # equivalence is well-defined even under ties. Long silences
        # force expiry sweeps to land ON collision instants.
        users = [f"u{i}" for i in range(5)]
        now = t
        for _step in range(250):
            # shuffle arrival order so equal-ms sync ids are routinely
            # DISCORDANT with user order — the tie case where a proxy
            # window ordered by user_id (instead of arrival sync_id)
            # diverges from the reference's serialized loop
            batch = [u for u in users if rng.random() < 0.6]
            rng.shuffle(batch)
            for u in batch:
                syncs.append((sync_id, u, now))
                if rng.random() < 0.25:
                    posted.append(
                        (sync_id, 0, f"ev{rng.randint(0, 9)}", f"b{sync_id}")
                    )
                sync_id += 1
            gap = (
                11_000 + 50 * rng.randint(0, 100)
                if rng.random() < 0.05
                else 50 * rng.randint(1, 6)
            )
            now += gap
        return syncs, posted
    users = [f"u{i}" for i in range(5)]
    # per-user next poll time; stagger starts
    next_poll = {u: t + i * 37 for i, u in enumerate(users)}
    for _step in range(600):
        u = min(next_poll, key=lambda k: (next_poll[k], k))
        now = next_poll[u]
        syncs.append((sync_id, u, now))
        if rng.random() < 0.3:
            for seq in range(rng.randint(1, 3)):
                posted.append((sync_id, seq, f"ev{rng.randint(0, 9)}", f"b{sync_id}-{seq}"))
        # mostly ~200 ms cadence; sometimes a long silence > 10 s
        gap = 11_000 + rng.randint(0, 5_000) if rng.random() < 0.03 else 150 + rng.randint(0, 150)
        # keep times unique across users
        now2 = now + gap
        while any(abs(now2 - m) < 2 for m in next_poll.values()):
            now2 += 3
        next_poll[u] = now2
        sync_id += 1
    return syncs, posted


def test_strict_boundary_clock_trace(spark):
    """Hand-computed trace of the strict threshold: polls every exactly
    50 ms give clocks 0, 0, 2, 2, 4, ... (tick only when elapsed > 50,
    full catch-up then), NOT the naive floor sequence 0, 1, 2, 3, 4."""
    syncs = [(i, "u0", 1_000_000 + 50 * i) for i in range(6)]
    sc = {
        r.sync_id: r.clock_t
        for r in pr.sync_clock(spark.createDataFrame(syncs, SYNCS_SCHEMA)).collect()
    }
    assert [sc[i] for i in range(6)] == [0, 0, 2, 2, 4, 4]


def test_server_log_matches_reference_sim(spark, schedule):
    syncs, posted = schedule
    sim = ReferenceSim()
    posted_by_sync: dict[int, list] = {}
    for sid, seq, etype, body in posted:
        posted_by_sync.setdefault(sid, []).append((etype, body))
    last_known: dict[str, int] = {}
    sim_deliveries = {}
    for sid, u, now in syncs:
        t, delivered = sim.sync(u, now, posted_by_sync.get(sid, []), last_known.get(u, 0))
        last_known[u] = t
        sim_deliveries[sid] = sorted(delivered)

    syncs_df = spark.createDataFrame(syncs, SYNCS_SCHEMA)
    posted_df = spark.createDataFrame(posted, POSTED_SCHEMA)

    got_log = sorted(
        (r.t, r.kind_order, r.event_type, r.origin, r.body)
        for r in pr.server_log(syncs_df, posted_df).collect()
    )
    want_log = sorted(sim.log)
    assert got_log == want_log, (
        f"log mismatch: {len(got_log)} vs {len(want_log)} rows; "
        f"first diff: {next((a, b) for a, b in zip(got_log, want_log) if a != b)}"
    )

    got_deliv: dict[int, list] = {sid: [] for sid, _u, _n in syncs}
    for r in pr.deliveries(syncs_df, posted_df).collect():
        got_deliv[r.sync_id].append((r.t, r.event_type, r.origin))
    for sid in got_deliv:
        got_deliv[sid] = sorted(got_deliv[sid])
    assert got_deliv == sim_deliveries


MULTI_SYNCS_SCHEMA = StructType(
    [
        StructField("sync_id", LongType()),
        StructField("user_id", StringType()),
        StructField("poll_ms", LongType()),
        StructField("game", StringType()),
    ]
)


@pytest.fixture(scope="module", params=[21, 77, 303], ids=["m21", "m77", "m303"])
def multigame_schedule(request):
    """Three games polled concurrently, each in activity bursts
    separated by > 60 s of game-wide silence — forcing GC -> restart
    generations — with per-user > 10 s silences inside bursts forcing
    client expiry/reconnect. Times unique within a game."""
    rng = random.Random(request.param)
    syncs, posted = [], []
    sync_id = 0
    for game in ["gA", "gB", "gC"]:
        users = [f"{game}-u{i}" for i in range(3)]
        now_base = 1_000_000 + rng.randint(0, 500)
        for _burst in range(rng.randint(2, 3)):
            next_poll = {u: now_base + i * 37 for i, u in enumerate(users)}
            last_ms = now_base
            for _step in range(rng.randint(60, 120)):
                u = min(next_poll, key=lambda k: (next_poll[k], k))
                now = next_poll[u]
                syncs.append((sync_id, u, now, game))
                if rng.random() < 0.3:
                    posted.append((sync_id, 0, f"ev{rng.randint(0, 9)}", f"b{sync_id}"))
                gap = (
                    11_000 + rng.randint(0, 5_000)
                    if rng.random() < 0.04
                    else 150 + rng.randint(0, 150)
                )
                now2 = now + gap
                while any(abs(now2 - m) < 2 for m in next_poll.values()):
                    now2 += 3
                next_poll[u] = now2
                last_ms = max(last_ms, now)
                sync_id += 1
            now_base = last_ms + 61_000 + rng.randint(0, 30_000)
    return syncs, posted


def test_multigame_log_and_deliveries_match_sim(spark, multigame_schedule):
    """Full multi-game equivalence (VERDICT r1 next-#4): per-(game,
    gen) logs AND per-sync deliveries from the Spark replay equal the
    multi-game reference simulator, across GC restarts."""
    syncs, posted = multigame_schedule
    posted_by_sync: dict[int, list] = {}
    for sid, seq, etype, body in posted:
        posted_by_sync.setdefault(sid, []).append((etype, body))

    sim = ServerSim()
    game_state: dict[str, tuple[int, int]] = {}  # game -> (last_ms, gen)
    lk: dict[tuple, tuple[int, int]] = {}  # (game, user) -> (gen, clock)
    sim_deliveries = {}
    for sid, u, now, g in sorted(syncs, key=lambda r: (r[2], r[0])):
        last = game_state.get(g)
        gen = 1 if last is None else (last[1] + 1 if now - last[0] > 60_000 else last[1])
        game_state[g] = (now, gen)
        prev = lk.get((g, u))
        last_known = prev[1] if prev is not None and prev[0] == gen else 0
        got_gen, clock, delivered = sim.sync(g, u, now, posted_by_sync.get(sid, []), last_known)
        assert got_gen == gen
        lk[(g, u)] = (gen, clock)
        sim_deliveries[sid] = sorted(delivered)

    syncs_df = spark.createDataFrame(syncs, MULTI_SYNCS_SCHEMA)
    posted_df = spark.createDataFrame(posted, POSTED_SCHEMA)

    got_log = sorted(
        (r.game, r.gen, r.t, r.kind_order, r.event_type, r.origin, r.body)
        for r in pr.server_log(syncs_df, posted_df, game_col="game").collect()
    )
    want_log = sorted(sim.full_log())
    assert got_log == want_log, (
        f"log mismatch: {len(got_log)} vs {len(want_log)} rows; "
        f"first diff: {next((a, b) for a, b in zip(got_log, want_log) if a != b)}"
    )

    got_deliv: dict[int, list] = {sid: [] for sid, _u, _n, _g in syncs}
    for r in pr.deliveries(syncs_df, posted_df, game_col="game").collect():
        got_deliv[r.sync_id].append((r.t, r.event_type, r.origin))
    for sid in got_deliv:
        got_deliv[sid] = sorted(got_deliv[sid])
    assert got_deliv == sim_deliveries


def test_restart_resets_seed_clock_and_proxies(spark):
    """A single game with a > 60 s gap restarts: second generation gets
    its own `_a` seed at T=1, a fresh clock epoch, and proxy ids
    restarting at 1 (model/eventStream.go:34-42, model/game.go:49-53)."""
    syncs = [(0, "u0", 1_000_000), (1, "u1", 1_000_200)]
    # > 60 s silence, then both users return
    syncs += [(2, "u0", 1_070_000), (3, "u1", 1_070_400)]
    syncs_df = spark.createDataFrame(syncs, SYNCS_SCHEMA)
    posted_df = spark.createDataFrame([], POSTED_SCHEMA)
    log = pr.server_log(syncs_df, posted_df).collect()
    by_gen: dict[int, list] = {}
    for r in log:
        by_gen.setdefault(r.gen, []).append(r)
    assert sorted(by_gen) == [1, 2]
    for gen, rows in by_gen.items():
        seeds = [r for r in rows if r.event_type == "_a"]
        assert [(s.t, s.origin) for s in seeds] == [(1, "_")]
        connects = sorted(
            (r.t, r.origin) for r in rows if r.event_type == "_c"
        )
        # both generations: two connects with proxies 1 and 2 at T=1
        # (gen epoch restarts, so clock is 0 at both polls -> assign 1)
        assert connects == [(1, "1"), (1, "2")], (gen, connects)


def test_no_late_data_invariant(spark, schedule):
    """SURVEY.md §1.4.2: no event is ever stamped at or below a tick a
    client has already been sent — T assignment strictly exceeds every
    previously delivered clock."""
    syncs, posted = schedule
    syncs_df = spark.createDataFrame(syncs, SYNCS_SCHEMA)
    sc = pr.sync_clock(syncs_df).collect()
    for r in sc:
        assert r.assign_t == r.last_sent_prev + 1
        assert r.assign_t > r.last_sent_prev


def test_game_response_envelope_json(spark, schedule):
    """The GameResponse envelope (main.go:102-115) is valid JSON with
    the reference's exact field set, and its Events/States arrays agree
    with the deliveries/state_deltas operators row-for-row."""
    import json

    syncs, posted = schedule
    syncs_df = spark.createDataFrame(syncs, SYNCS_SCHEMA)
    posted_df = spark.createDataFrame(posted, POSTED_SCHEMA)
    states_df = spark.createDataFrame(
        [(sid, '{"hp": %d}' % (sid % 100)) for sid, _u, _ms in syncs],
        StructType(
            [StructField("sync_id", LongType()), StructField("data", StringType())]
        ),
    )

    env = {
        r.sync_id: r
        for r in pr.game_response(syncs_df, posted_df, states_df).collect()
    }
    assert set(env) == {sid for sid, _u, _ms in syncs}

    deliv: dict[int, list] = {sid: [] for sid in env}
    for r in pr.deliveries(syncs_df, posted_df).collect():
        deliv[r.sync_id].append((r.t, r.event_type))
    st: dict[int, list] = {sid: [] for sid in env}
    for r in pr.state_deltas(syncs_df, states_df).collect():
        st[r.sync_id].append((r.state_t, r.origin, r.data))

    for sid, row in env.items():
        doc = json.loads(row.response)  # valid JSON, or this raises
        assert sorted(doc) == ["Events", "ProxyId", "States", "T"]
        assert doc["T"] == row.t
        assert doc["ProxyId"] == row.proxy_id
        got_ev = sorted((e["T"], e["Type"]) for e in doc["Events"])
        assert got_ev == sorted(deliv[sid]), f"sync {sid}"
        for e in doc["Events"]:
            if e["Type"] in ("_a", "_c", "_d"):
                assert e["Origin"] == "_"
            if e["Type"] in ("_c", "_d"):
                assert e["Body"].isdigit()  # the proxy id rides in Body
        got_st = sorted(
            (s["T"], s["Origin"], json.dumps(s["Data"], separators=(", ", ": ")).replace('{"', '{"'))
            for s in doc["States"]
        )
        want_st = sorted((t, o, json.dumps(json.loads(d), separators=(", ", ": "))) for t, o, d in st[sid])
        assert [g[:2] for g in got_st] == [w[:2] for w in want_st], f"sync {sid}"
        # the state clock runs one ahead of the event clock
        # (stateStream.T = T + 1), so a state stamped at this very
        # poll carries doc["T"] + 1 — never more
        for s in doc["States"]:
            assert s["T"] <= doc["T"] + 1


def test_state_deltas_lww_and_expiry(spark):
    """GetDeltaState semantics (model/stateStream.go:27-35 +
    game.go:92-107): LWW per proxy, own-state echo when the clock
    advanced, expired senders dropped from the map."""
    # u0 polls at 0ms and 5000ms; u1 polls at 300ms then goes silent;
    # u0 polls again at 20000ms — u1 expired (> 10 s silent).
    syncs = [
        (0, "u0", 1_000_000),
        (1, "u1", 1_000_300),
        (2, "u0", 1_005_000),
        (3, "u0", 1_020_000),
    ]
    syncs_df = spark.createDataFrame(syncs, SYNCS_SCHEMA)
    states_df = spark.createDataFrame(
        [(0, "s0"), (1, "s1"), (2, "s2"), (3, "s3")],
        StructType(
            [StructField("sync_id", LongType()), StructField("data", StringType())]
        ),
    )
    rows = pr.state_deltas(syncs_df, states_df).collect()
    by_sync: dict[int, list] = {}
    for r in rows:
        by_sync.setdefault(r.sync_id, []).append((r.origin, r.data))

    # State stamps are stateStream.T = event clock + 1 (the state
    # clock starts at 1, model/stateStream.go:11-17). So the very
    # first poll echoes its own state: stamp 1 > last_known 0 — the
    # reference really does this (applyState precedes GetDeltaState).
    assert by_sync.get(0) == [("1", "s0")]
    # sync 1 (u1, clock 6, last_known 0): u0's stamp (T=1 > 0) and
    # u1's own stamp (T=7 > 0)
    assert sorted(by_sync[1]) == [("1", "s0"), ("2", "s1")]
    # sync 2 (u0 at 5s, clock 100, last_known 0): u1's stamp (T=7 > 0)
    # and its own fresh stamp (T=101 > 0)
    assert sorted(by_sync[2]) == [("1", "s2"), ("2", "s1")]
    # sync 3 (u0 at 20s, last_known 100): BOTH u0 and u1 expired (15s /
    # 19.7s > 10s silent — updateClients sweeps the caller too,
    # model/game.go:95-107); u0 reconnects with a fresh proxy id 3 and
    # re-stamps (T=401 > 100); u1's old state is GONE
    assert sorted(by_sync[3]) == [("3", "s3")]


def test_state_survives_stateless_polls_while_sender_alive(spark):
    """Liveness is keyed to the sender's last POLL (any touch), not the
    last state STAMP (model/game.go:92-107: expiry reads lastTouch;
    SetState only updates the map). A sender who stamps once and then
    keeps polling WITHOUT re-reporting stays visible; after an expiry,
    a reconnect without a fresh report has no state."""
    syncs = [
        (0, "u0", 1_000_000),   # u0 stamps state here
        (1, "u0", 1_008_000),   # u0 touch only (8 s later, no state)
        (2, "u1", 1_012_000),   # receiver: u0 alive (touch 4 s ago),
                                # stamp is 12 s old -> must STILL see it
        (3, "u0", 1_030_000),   # u0 reconnects (18 s gap > 10 s), NO state
        (4, "u1", 1_031_000),   # receiver: u0 alive but state died with
                                # the old connection -> must NOT see it
    ]
    syncs_df = spark.createDataFrame(syncs, SYNCS_SCHEMA)
    states_df = spark.createDataFrame(
        [(0, "s0")],
        StructType(
            [StructField("sync_id", LongType()), StructField("data", StringType())]
        ),
    )
    rows = pr.state_deltas(syncs_df, states_df).collect()
    by_sync: dict[int, list] = {}
    for r in rows:
        by_sync.setdefault(r.sync_id, []).append((r.origin, r.data))
    assert ("1", "s0") in by_sync.get(2, []), "stamp dropped while sender alive"
    assert by_sync.get(4) is None or ("1", "s0") not in by_sync[4], (
        "stamp survived the sender's expiry/reconnect"
    )
