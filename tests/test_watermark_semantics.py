"""Watermark late-data semantics: the streaming analogue of the
reference's no-late-data guarantee (SURVEY.md §1.4.2) — a row behind
the watermark never appears in finalized (append-mode) windows."""

from __future__ import annotations

import datetime as dt
import os

from goeventstream_spark.streaming import read_event_stream, windowed_counts
from goeventstream_spark.streaming.windows import EVENTS_SCHEMA


def _ts(h: int, m: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, m, 0)


def test_append_mode_drops_late_rows(spark, tmp_path):
    src = str(tmp_path / "late_src")
    os.makedirs(src)

    def write_chunk(name: str, rows: list, mtime: int) -> None:
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / name))
        part = next(
            f for f in os.listdir(str(tmp_path / name)) if f.endswith(".parquet")
        )
        dest = os.path.join(src, f"{name}.parquet")
        os.rename(os.path.join(str(tmp_path / name), part), dest)
        # the file source batches in modification-time order; make the
        # intended micro-batch order unambiguous
        os.utime(dest, (mtime, mtime))

    # Spark's two-watermark design (late-event filtering uses the
    # PREVIOUS batch's watermark; state eviction uses the current one)
    # means a late row is only guaranteed dropped once the filter
    # watermark has advanced past it — hence the intermediate batch.
    # batch 0: on-time events; max event time 11:45
    write_chunk(
        "c0",
        [
            (1, _ts(10, 15), 1, "click", 1.0, "{}"),
            (2, _ts(11, 45), 1, "click", 1.0, "{}"),
        ],
        mtime=1_000_000,
    )
    # batch 1: advances the *filter* watermark to 10:45 for batch 2
    write_chunk(
        "c1",
        [(3, _ts(12, 0), 1, "click", 1.0, "{}")],
        mtime=2_000_000,
    )
    # batch 2: the LATE row (09:15 — window end 10:00 < filter
    # watermark 10:45 => dropped) plus a row pushing eviction to 13:00
    write_chunk(
        "c2",
        [
            (4, _ts(9, 15), 1, "click", 1.0, "{}"),
            (5, _ts(14, 0), 1, "click", 1.0, "{}"),
        ],
        mtime=3_000_000,
    )

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    q = (
        windowed_counts(stream, window="1 hour", watermark="1 hour")
        .writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = {
        r.window_start.hour: r.n_events
        for r in spark.sql("SELECT * FROM late_test").collect()
    }
    # finalized: 10:00, 11:00, 12:00 windows, one event each
    assert rows.get(10) == 1 and rows.get(11) == 1 and rows.get(12) == 1
    # the late 09:15 row was DROPPED — no 09:00 window ever appears
    assert 9 not in rows
    # the 14:00 window is not yet finalized at stream end
    assert 14 not in rows
