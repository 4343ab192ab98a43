"""The reference's client-registry state machine as Spark keyed state —
the only genuinely custom stateful logic in the whole engine
(SURVEY.md §4: "custom work is semantic, not planner-level").

Reference semantics reproduced (file:line in the reference repo):
- connect:    first sight of an unknown client id -> emit ``_c``
              (model/game.go:44-58, model/eventStream.go:81-83)
- state LWW:  every report overwrites the whole state map, stamped with
              the latest event time (model/stateStream.go:19-21)
- disconnect: silent > 10 s -> emit ``_d``, hard-delete state
              (model/game.go:92-107, model/stateStream.go:37-39)
- GC/TTL:     the timeout mechanism itself (model/game.go:76-78)

The batch analogues (stream_ops.connects/disconnects/latest_state) are
exact; this streaming form is watermark-approximate for disconnects, as
documented in SURVEY.md §7 hard-part 4: the reference detects timeouts
lazily during any request, streaming timeouts fire when the event-time
watermark passes last_seen + gap.

Keyed by user_id (at cluster scale: (game, user_id)); state per key is
one small dict — memory O(active clients), like the reference's
StateStream (SURVEY.md §6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

CLIENT_TIMEOUT_MS = 10_000

REGISTRY_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("marker", StringType()),  # _c | _d | state
        StructField("event_ms", LongType()),
        StructField("data", StringType()),
    ]
)

REGISTRY_STATE_SCHEMA = StructType(
    [
        StructField("last_seen_ms", LongType()),
        StructField("state_json", StringType()),
    ]
)


def client_registry(events: DataFrame, timeout_ms: int = CLIENT_TIMEOUT_MS) -> DataFrame:
    """applyInPandasWithState over user_id: emits ``_c`` on first
    contact, ``state`` rows on last-writer-wins updates, ``_d`` when the
    event-time watermark passes last_seen + timeout.

    Input must carry (user_id, ts, props) and a watermark on ts.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def _update(key, pdfs, state):  # self-contained: executor-safe
        user_id = key[0]
        if state.hasTimedOut:
            (last_seen, _sj) = state.get
            state.remove()
            import pandas as _pd

            yield _pd.DataFrame(
                [(user_id, "_d", last_seen + timeout_ms, None)],
                columns=["user_id", "marker", "event_ms", "data"],
            )
            return

        import pandas as _pd

        rows = []
        existed = state.exists
        last_seen = state.get[0] if existed else None
        best_json = state.get[1] if existed else None
        first_ms = None
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ms_vals = (pdf["ts"].astype("int64") // 1_000_000).tolist()
            for m, props in sorted(zip(ms_vals, pdf["props"].tolist())):
                if first_ms is None or m < first_ms:
                    first_ms = m
                if last_seen is None or m > last_seen:
                    last_seen = m
                    best_json = props
        if first_ms is None:
            return
        if not existed:
            # connect is stamped at FIRST contact (model/game.go:44-58)
            rows.append((user_id, "_c", first_ms, None))
        rows.append((user_id, "state", last_seen, best_json))
        state.update((last_seen, best_json))
        state.setTimeoutTimestamp(last_seen + timeout_ms)
        yield _pd.DataFrame(rows, columns=["user_id", "marker", "event_ms", "data"])

    return (
        events.select("user_id", "ts", "props")
        .withWatermark("ts", "0 seconds")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=REGISTRY_OUTPUT_SCHEMA,
            stateStructType=REGISTRY_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
