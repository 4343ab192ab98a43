from goeventstream_spark.streaming.windows import (
    delta_delivery,
    read_event_stream,
    session_window_stats,
    windowed_counts,
)
from goeventstream_spark.streaming.stateful import (
    client_registry,
    game_registry,
    game_server,
)

__all__ = [
    "read_event_stream",
    "windowed_counts",
    "session_window_stats",
    "delta_delivery",
    "client_registry",
    "game_registry",
    "game_server",
]
