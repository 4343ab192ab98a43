"""R1 wire-path fidelity: the reference's actual network entry point is
an HTTP listener taking ``POST /{stream}/{clientPrivateId}/{lastKnownTick}``
with a JSON GameRequest body (main.go:48-92). This module provides the
live-ingest analogue for the Spark engine:

- :class:`HttpWireBridge` — a stdlib HTTP server that accepts the
  reference's exact wire shape and bridges each request as one JSON
  line over a TCP socket that Spark's built-in ``socket`` streaming
  source consumes. The bridge stamps arrival order (``sync_id``) and
  server wall time (``now_ms``) exactly where the reference does
  (main.go:71), leaving ALL protocol parsing to the engine.
- :func:`wire_stream` — the Spark side of R1: a socket-source stream
  plus the URL-path split and GameRequest JSON decode (main.go:58-69)
  done declaratively, emitting poll rows ready for
  ``streaming.game_server``.

Divergence, documented: the reference answers each POST inline with
the GameResponse. A streaming engine decouples ingest from delivery —
the bridge ACKs with the assigned sync_id (HTTP 202) and the envelope
for that sync_id comes out of game_server's sink. A production
deployment would put a broker (Kafka) where the bridge's in-memory
queue is; the bridge replays from the start of its buffer on socket
reconnect (at-least-once), which is exactly the guarantee a broker
would give, minus durability the sandbox cannot host.
"""

from __future__ import annotations

import json
import socket
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    MapType,
    StringType,
    StructField,
    StructType,
)

# GameRequest {Events []Event, State map[string]string} — main.go:97-100;
# posted events carry Type/Body (T/Origin are server-overwritten, so a
# faithful client needn't send them and the engine ignores them if sent).
GAME_REQUEST_SCHEMA = StructType(
    [
        StructField(
            "Events",
            ArrayType(
                StructType(
                    [
                        StructField("Type", StringType()),
                        StructField("Body", StringType()),
                    ]
                )
            ),
        ),
        StructField("State", MapType(StringType(), StringType())),
    ]
)


class HttpWireBridge:
    """Accepts the reference wire protocol over HTTP and re-emits each
    request as one JSON line ``{"sync_id", "now_ms", "path", "body"}``
    on a TCP port for Spark's socket source. ``X-Sim-Now-Ms`` header,
    when present, overrides the server clock (test determinism; the
    reference uses time.Now() — main.go:71)."""

    def __init__(self, host: str = "127.0.0.1") -> None:
        self.host = host
        self._lines: list[bytes] = []
        self._lock = threading.Condition()
        self._stop = False
        self._seq = 0
        bridge = self

        class _Handler(BaseHTTPRequestHandler):
            def do_POST(self) -> None:  # noqa: N802 (stdlib casing)
                length = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(length) if length else b"{}"
                now_hdr = self.headers.get("X-Sim-Now-Ms")
                now_ms = int(now_hdr) if now_hdr else int(time.time() * 1000)
                with bridge._lock:
                    bridge._seq += 1
                    sid = bridge._seq
                    line = json.dumps(
                        {
                            "sync_id": sid,
                            "now_ms": now_ms,
                            "path": self.path,
                            "body": raw.decode("utf-8"),
                        }
                    ).encode("utf-8")
                    bridge._lines.append(line)
                    bridge._lock.notify_all()
                ack = json.dumps({"SyncId": sid}).encode("utf-8")
                self.send_response(202)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(ack)))
                # CORS preflight parity with main.go:50-56
                self.send_header("Access-Control-Allow-Origin", "*")
                self.end_headers()
                self.wfile.write(ack)

            def do_OPTIONS(self) -> None:  # noqa: N802
                self.send_response(204)
                self.send_header("Access-Control-Allow-Origin", "*")
                self.send_header("Access-Control-Allow-Methods", "POST, OPTIONS")
                self.send_header("Access-Control-Allow-Headers", "*")
                self.end_headers()

            def log_message(self, *args) -> None:  # silence test output
                pass

        self._http = ThreadingHTTPServer((host, 0), _Handler)
        self.http_port = self._http.server_address[1]
        self._tcp = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._tcp.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._tcp.bind((host, 0))
        self._tcp.listen(4)
        self.tcp_port = self._tcp.getsockname()[1]
        self._threads = [
            threading.Thread(target=self._http.serve_forever, daemon=True),
            threading.Thread(target=self._serve_tcp, daemon=True),
        ]

    def start(self) -> "HttpWireBridge":
        for t in self._threads:
            t.start()
        return self

    def _serve_tcp(self) -> None:
        while not self._stop:
            try:
                conn, _ = self._tcp.accept()
            except OSError:
                return
            # replay from the start of the buffer (at-least-once on
            # reconnect — what a broker offset-reset would do)
            cursor = 0
            try:
                while not self._stop:
                    with self._lock:
                        while cursor >= len(self._lines) and not self._stop:
                            self._lock.wait(timeout=0.2)
                        batch = self._lines[cursor:]
                        cursor = len(self._lines)
                    for line in batch:
                        conn.sendall(line + b"\n")
            except OSError:
                continue  # client went away; accept again
            finally:
                conn.close()

    def stop(self) -> None:
        self._stop = True
        with self._lock:
            self._lock.notify_all()
        self._http.shutdown()
        self._http.server_close()
        try:
            self._tcp.close()
        except OSError:
            pass

    def post(self, game: str, client_id: str, last_known: int, events=None, state=None, now_ms: int | None = None) -> int:
        """Test/demo client: one reference-shaped sync POST. Returns the
        assigned sync_id from the ACK."""
        import urllib.request

        body = {}
        if events:
            body["Events"] = [{"Type": t, "Body": b} for t, b in events]
        if state is not None:
            body["State"] = state  # omitempty — absent when not reported
        req = urllib.request.Request(
            f"http://{self.host}:{self.http_port}/{game}/{client_id}/{last_known}",
            data=json.dumps(body).encode("utf-8"),
            method="POST",
            headers={"Content-Type": "application/json"}
            | ({"X-Sim-Now-Ms": str(now_ms)} if now_ms is not None else {}),
        )
        with urllib.request.urlopen(req, timeout=10) as rsp:
            return json.loads(rsp.read())["SyncId"]


def wire_stream(spark: SparkSession, host: str, port: int) -> DataFrame:
    """The Spark side of R1 (main.go:58-69), declaratively: read the
    bridge's JSON lines from the built-in socket source, split the URL
    path into (game, clientPrivateId, lastKnownTick), and decode the
    GameRequest body — emitting poll rows in the exact shape
    ``streaming.game_server`` consumes. ``last_known_t`` is parsed for
    wire fidelity; the server derives each client's delta from its own
    per-client watermark state, as the reference effectively does for
    honest clients (README.md:20).
    """
    raw = (
        spark.readStream.format("socket")
        .option("host", host)
        .option("port", port)
        .load()
    )
    env_schema = StructType(
        [
            StructField("sync_id", StringType()),
            StructField("now_ms", StringType()),
            StructField("path", StringType()),
            StructField("body", StringType()),
        ]
    )
    env = raw.select(F.from_json("value", env_schema).alias("e")).select("e.*")
    parts = F.split(F.col("path"), "/")  # "/game/client/lastKnown" -> ["", g, c, t]
    req = F.from_json("body", GAME_REQUEST_SCHEMA)
    return env.select(
        parts.getItem(1).alias("game"),
        F.col("sync_id").cast("long").alias("sync_id"),
        parts.getItem(2).cast("long").alias("user_id"),
        F.col("now_ms").cast("long").alias("poll_ms"),
        parts.getItem(3).cast("long").alias("last_known_t"),
        F.when(
            req["Events"].isNotNull(),
            F.to_json(
                F.transform(req["Events"], lambda e: F.array(e["Type"], e["Body"]))
            ),
        ).alias("posted_json"),
        F.when(req["State"].isNotNull(), F.to_json(req["State"])).alias("state_json"),
    )
