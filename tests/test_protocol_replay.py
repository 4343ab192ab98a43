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
from tests.reference_sim import ReferenceSim

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
    params=[(42, "mixed"), (7, "mixed"), (1234, "mixed"), (42, "boundary"), (99, "boundary")],
    ids=["s42", "s7", "s1234", "s42-boundary", "s99-boundary"],
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
