"""Python Data Source (Spark 4) emitting protocol-shaped events: the
live-ingest analogue of the reference's HTTP poll endpoint (R1,
main.go:48-92), as a first-class `spark.read.format(...)` /
`spark.readStream.format(...)` source instead of a file reader.

The reference receives client polls over a wire at up to 20 ticks/s and
appends their events to the stream log. This source synthesizes that
arrival process deterministically: every (tick, client) pair yields one
event whose fields derive from md5 of the pair — so reads are
reproducible across runs, partitions, and engines, and the STREAMING
reader is replayable (a re-read of the same offset range returns the
same rows, which is what gives Structured Streaming exactly-once from
this source).

Scale anatomy: the client id space splits across `numPartitions` input
partitions — each Spark task generates only its slice, so ingest
parallelism scales with the cluster, and generation is pure compute (no
driver state, no shared cursor). The streaming offset is just the tick
counter — monotone, dense, and cheap to checkpoint.

All imports are deferred into methods: Spark pickles the DataSource
instance to executors, where /root/repo may not be on sys.path (same
self-contained-closure rule the pandas-UDF operators follow).
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = "ts timestamp, user_id bigint, event_type string, value double, event_id bigint"
EVENT_TYPES = ("view", "click", "purchase", "error", "signup")
BASE_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z
TICK_MS = 50


class _Slice(InputPartition):
    def __init__(self, lo: int, hi: int, t0: int, t1: int):
        self.lo, self.hi, self.t0, self.t1 = lo, hi, t0, t1


def _gen(lo: int, hi: int, t0: int, t1: int, silent_client: int = -1, silent_after: int = 0):
    """Deterministic events for clients [lo, hi) over ticks [t0, t1).
    ``silent_client`` stops polling at tick ``silent_after`` — the
    went-away client the liveness sweep (R4) must detect."""
    import datetime as dt
    import hashlib

    for tick in range(t0, t1):
        for client in range(lo, hi):
            if client == silent_client and tick >= silent_after:
                continue
            h = hashlib.md5(f"{tick}|{client}".encode()).hexdigest()
            hv = int(h[:8], 16)
            ts = dt.datetime.fromtimestamp(
                (BASE_MS + tick * TICK_MS) / 1000.0, dt.timezone.utc
            ).replace(tzinfo=None)
            yield (
                ts,
                client,
                EVENT_TYPES[hv % len(EVENT_TYPES)],
                float(hv % 1000),
                tick * 1_000_000 + client,
            )


class _BatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_clients = int(options.get("n_clients", 8))
        self.ticks = int(options.get("ticks", 100))
        self.num_partitions = int(options.get("numPartitions", 4))
        self.silent_client = int(options.get("silent_client", -1))
        self.silent_after = int(options.get("silent_after", 0))

    def partitions(self):
        n, p = self.n_clients, self.num_partitions
        step = max(1, (n + p - 1) // p)
        return [
            _Slice(lo, min(lo + step, n), 0, self.ticks) for lo in range(0, n, step)
        ]

    def read(self, partition):
        yield from _gen(
            partition.lo, partition.hi, partition.t0, partition.t1,
            self.silent_client, self.silent_after,
        )


class _StreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.n_clients = int(options.get("n_clients", 8))
        self.ticks_per_batch = int(options.get("ticks_per_batch", 20))
        self.num_partitions = int(options.get("numPartitions", 2))
        self.silent_client = int(options.get("silent_client", -1))
        self.silent_after = int(options.get("silent_after", 0))
        self._tick = 0

    def initialOffset(self):
        return {"tick": 0}

    def latestOffset(self):
        # each poll of the source advances the virtual clock one batch
        self._tick += self.ticks_per_batch
        return {"tick": self._tick}

    def _fast_forward(self, *offsets):
        # The clock lives in this instance, but Spark restores progress
        # from the CHECKPOINT: after a restart a fresh reader would
        # otherwise report latestOffset() behind the committed start,
        # rewinding the offset log and re-emitting committed ticks.
        # Every offset Spark hands back fast-forwards the clock, so
        # latestOffset is always >= the restored position.
        for off in offsets:
            if off and off.get("tick", 0) > self._tick:
                self._tick = off["tick"]

    def partitions(self, start, end):
        self._fast_forward(start, end)
        n, p = self.n_clients, self.num_partitions
        step = max(1, (n + p - 1) // p)
        return [
            _Slice(lo, min(lo + step, n), start["tick"], end["tick"])
            for lo in range(0, n, step)
        ]

    def read(self, partition):
        yield from _gen(
            partition.lo, partition.hi, partition.t0, partition.t1,
            self.silent_client, self.silent_after,
        )

    def commit(self, end):
        self._fast_forward(end)


class ProtocolEventsDataSource(DataSource):
    """format("protocol_events") — options: n_clients, ticks (batch),
    ticks_per_batch (stream), numPartitions."""

    @classmethod
    def name(cls):
        return "protocol_events"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return _BatchReader(self.options)

    def streamReader(self, schema):
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(ProtocolEventsDataSource)
