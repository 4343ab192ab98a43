"""Pure-Python behavioral simulator of the reference server, written
from the documented semantics in SURVEY.md §1.4/§3 (tick carry,
T = LastSentT + 1 assignment, lazy liveness sweep, LWW state, range
delivery). Used as the ground truth for the Spark analytic replay —
a reimplementation of *behavior*, not a translation of the Go code.
"""

from __future__ import annotations

TICK_MS = 50
CLIENT_TIMEOUT_MS = 10_000
GAME_TIMEOUT_MS = 60_000


class ReferenceSim:
    def __init__(self) -> None:
        self.t0: int | None = None
        self.last_tick_ms = 0
        self.clock = 0
        self.last_sent = 0
        self.next_proxy = 1
        self.clients: dict[object, dict] = {}
        self.log: list[tuple[int, int, str, str, str | None]] = []
        self._seq = 0

    def _append(self, t: int, kind_order: int, etype: str, origin: str, body: str | None) -> None:
        self.log.append((t, kind_order, etype, origin, body))

    def sync(self, user, now: int, events: list[tuple[str, str]], last_known: int):
        if self.t0 is None:
            # stream creation: clock at 0, seed _a stamped LastSentT+1=1
            self.t0 = now
            self.last_tick_ms = now
            self._append(1, 0, "_a", "_", "seed")
        # tick with remainder carry — STRICT threshold: the reference
        # only advances when elapsed strictly exceeds one tick
        # (model/game.go:83 `elapsedTime > STREAM_TICK_THRESHOLD_MS`),
        # so a poll landing exactly TICK_MS after lastTick does NOT
        # tick and lastTick stays put.
        elapsed = now - self.last_tick_ms
        if elapsed > TICK_MS:
            n = elapsed // TICK_MS
            self.clock += n
            self.last_tick_ms = now - (elapsed - n * TICK_MS)
        # liveness sweep: expire ANY silent client (caller included)
        for u in sorted(self.clients):
            if now - self.clients[u]["last_touch"] > CLIENT_TIMEOUT_MS:
                self._append(self.last_sent + 1, 1, "_d", self.clients[u]["proxy"], None)
                del self.clients[u]
        # connect or touch the caller
        if user not in self.clients:
            proxy = str(self.next_proxy)
            self.next_proxy += 1
            self.clients[user] = {"proxy": proxy, "last_touch": now}
            self._append(self.last_sent + 1, 2, "_c", proxy, None)
        else:
            self.clients[user]["last_touch"] = now
        # append posted events, origin overwritten with caller's proxy
        for i, (etype, body) in enumerate(events):
            self._append(self.last_sent + 1, 3 + i, etype, self.clients[user]["proxy"], body)
        # delivery watermark, then the range scan
        self.last_sent = self.clock
        delivered = [
            (t, etype, origin)
            for (t, _k, etype, origin, _b) in self.log
            if last_known < t <= self.clock
        ]
        return self.clock, delivered


class ServerSim:
    """Multi-game front matching main.go:74-80 + the GC sweeper
    (main.go:32-46): polls route to per-game ReferenceSim instances; a
    game idle > GAME_TIMEOUT_MS is deleted, so the next poll recreates
    it from scratch (new generation: fresh clock epoch, proxy counter,
    seed `_a`). Deterministic-limit idealizations shared with the
    Spark replay (operators/protocol_replay docstring): every > 60 s
    raw poll gap restarts, measured poll-to-poll rather than against
    the tick-rounded lastTick."""

    def __init__(self) -> None:
        self.games: dict[object, dict] = {}
        self._instances: list[tuple[object, int, ReferenceSim]] = []

    def sync(self, game, user, now: int, events, last_known: int):
        entry = self.games.get(game)
        if entry is None or now - entry["last"] > GAME_TIMEOUT_MS:
            gen = 1 if entry is None else entry["gen"] + 1
            entry = {"gen": gen, "sim": ReferenceSim(), "last": now}
            self.games[game] = entry
            self._instances.append((game, gen, entry["sim"]))
        entry["last"] = now
        clock, delivered = entry["sim"].sync(user, now, events, last_known)
        return entry["gen"], clock, delivered

    def full_log(self):
        """[(game, gen, t, kind_order, event_type, origin, body)] over
        every instance ever created (live ones included)."""
        return [
            (game, gen, t, k, etype, origin, body)
            for game, gen, sim in self._instances
            for (t, k, etype, origin, body) in sim.log
        ]
