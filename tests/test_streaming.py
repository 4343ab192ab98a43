"""Structured Streaming tests: feed sf0.001 events through a chunked
file source (maxFilesPerTrigger=1 => many micro-batches) and check the
streaming results against the exact batch analogues."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from goeventstream_spark.operators import stream_ops as so
from goeventstream_spark.sources import load_table
from goeventstream_spark.operators import protocol_replay as pr
from goeventstream_spark.streaming import (
    client_registry,
    delta_delivery,
    game_registry,
    read_event_stream,
    session_window_stats,
    windowed_counts,
)


@pytest.fixture(scope="module")
def chunked_events_dir(spark, sf_dir, tmp_path_factory):
    """sf0.001 events split into 4 time-ordered parquet chunks."""
    out = str(tmp_path_factory.mktemp("stream_src"))
    ev = load_table(spark, sf_dir, "events").orderBy("ts")
    n = ev.count()
    rows = ev.collect()
    chunk = (n + 3) // 4
    for i in range(4):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, ev.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(out, f"chunk={i}"))
    # flatten: move part files up so the source sees a flat dir
    flat = str(tmp_path_factory.mktemp("stream_flat"))
    idx = 0
    for root, _dirs, files in os.walk(out):
        for f in files:
            if f.endswith(".parquet"):
                os.rename(os.path.join(root, f), os.path.join(flat, f"{idx:04d}.parquet"))
                idx += 1
    assert idx == 4
    return flat


def _run_stream(df, name: str, mode: str) -> None:
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_windowed_counts_match_batch(spark, sf_dir, chunked_events_dir):
    stream = read_event_stream(spark, chunked_events_dir)
    _run_stream(windowed_counts(stream, window="1 day"), "win_counts", "complete")
    got = {
        (r.window_start, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 day").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    )
    want = {(r.win.start, r.event_type): (r.n, round(r.s, 6)) for r in batch}
    assert got == want


def test_session_windows_match_batch_sessionize(spark, sf_dir, chunked_events_dir):
    stream = read_event_stream(spark, chunked_events_dir)
    _run_stream(session_window_stats(stream, gap="10 seconds"), "sess_win", "complete")
    got = {
        (r.user_id, r.session_start): r.n_events
        for r in spark.sql("SELECT * FROM sess_win").collect()
    }
    batch = (
        so.sessionize(load_table(spark, sf_dir, "events"), gap_s=10)
        .groupBy("user_id", "session_id")
        .agg(F.min("ts").alias("start"), F.count("*").alias("n"))
        .collect()
    )
    want = {(r.user_id, r.start): r.n for r in batch}
    assert got == want


def test_delta_delivery_exactly_once(spark, sf_dir, chunked_events_dir):
    stream = read_event_stream(spark, chunked_events_dir)
    _run_stream(delta_delivery(stream), "delta_out", "append")
    out = spark.sql("SELECT * FROM delta_out").collect()
    ev_n = load_table(spark, sf_dir, "events").count()
    assert len(out) == ev_n  # every event delivered exactly once
    ids = [r.event_id for r in out]
    assert len(set(ids)) == ev_n
    # tick stamps match the batch operator
    batch_t = {
        r.event_id: r.t for r in so.assign_ticks(load_table(spark, sf_dir, "events")).collect()
    }
    assert all(batch_t[r.event_id] == r.t for r in out)


def test_client_registry_connects_and_lww(spark, sf_dir, chunked_events_dir):
    stream = read_event_stream(spark, chunked_events_dir)
    _run_stream(client_registry(stream), "registry_out", "append")
    out = spark.sql("SELECT * FROM registry_out").collect()
    events = load_table(spark, sf_dir, "events")

    # With a 10 s TTL and chunked micro-batches the registry emits a
    # _c/_d cycle per watermark-visible silence (reference semantics:
    # reconnect after expiry is a fresh connect, README.md:40 inverse);
    # exact per-batch boundaries depend on watermark progression, so we
    # assert the reference invariants rather than one fixed trace.
    users = {r.user_id for r in out}
    ev_ms = {
        u: {r.ms for r in events.where(F.col("user_id") == u)
            .select(F.unix_millis("ts").alias("ms")).collect()}
        for u in users
    }
    first_ms = {u: min(ms) for u, ms in ev_ms.items()}
    for u in users:
        markers = sorted(
            ((r.event_ms, r.marker) for r in out if r.user_id == u and r.marker != "state"),
        )
        # first marker is a connect stamped at the user's first event
        assert markers[0] == (first_ms[u], "_c")
        # strict _c/_d alternation, each cycle closed before the next opens
        kinds = [m for _, m in markers]
        assert all(k == "_c" for k in kinds[0::2]) and all(k == "_d" for k in kinds[1::2])
        n_c, n_d = kinds.count("_c"), kinds.count("_d")
        assert n_c - n_d in (0, 1)
        # every marker anchors to a real event of that user
        for ms, kind in markers:
            anchor = ms - 10_000 if kind == "_d" else ms
            assert anchor in ev_ms[u]

    # the LAST state row per user matches batch latest_state (LWW)
    state_rows = [r for r in out if r.marker == "state"]
    last_state = {}
    for r in sorted(state_rows, key=lambda r: (r.user_id, r.event_ms)):
        last_state[r.user_id] = r.data
    batch_lww = {r.user_id: r.data for r in so.latest_state(events).collect()}
    assert last_state == batch_lww


def test_game_registry_matches_batch_proxy_assignment(spark, sf_dir, chunked_events_dir):
    """VERDICT r1 next-#5: the streaming per-game state machine
    allocates the exact monotone proxy ids of the batch replay
    (model/game.go:49-53) — connect-for-connect, generation-for-
    generation — when the stream arrives in event-time order."""
    stream = read_event_stream(spark, chunked_events_dir)
    polls = stream.select(
        (F.col("user_id") % 4).cast("string").alias("game"),
        "user_id",
        F.unix_millis("ts").alias("poll_ms"),
        F.col("event_id").alias("sync_id"),
    )
    _run_stream(game_registry(polls), "game_reg_out", "append")
    out = spark.sql("SELECT * FROM game_reg_out").collect()

    ev = load_table(spark, sf_dir, "events")
    syncs = ev.select(
        F.col("event_id").alias("sync_id"),
        "user_id",
        F.unix_millis("ts").alias("poll_ms"),
        (F.col("user_id") % 4).alias("game_key"),
    )
    conn = pr.connections(syncs, game_col="game_key")

    got_connects = sorted(
        (r.game, r.gen, r.user_id, r.poll_ms, r.proxy_id)
        for r in out
        if r.marker == "_c"
    )
    want_connects = sorted(
        (r.game, r.gen, r.user_id, r.poll_ms, r.proxy_id)
        for r in conn.where(F.col("is_conn_start") == 1).collect()
    )
    assert got_connects == want_connects

    # exactly one _a per (game, gen), stamped at the generation's first poll
    got_seeds = sorted((r.game, r.gen, r.poll_ms) for r in out if r.marker == "_a")
    want_seeds = sorted(
        (r.game, r.gen, r.mn)
        for r in conn.groupBy("game", "gen").agg(F.min("poll_ms").alias("mn")).collect()
    )
    assert got_seeds == want_seeds

    # lazy disconnects: same (game, gen, proxy) set as the batch log's _d rows
    got_d = sorted((r.game, r.gen, r.proxy_id) for r in out if r.marker == "_d")
    posted_empty = ev.limit(0).select(
        F.col("event_id").alias("sync_id"),
        F.lit(0).cast("long").alias("event_seq"),
        "event_type",
        F.col("props").alias("body"),
    )
    log = pr.server_log(syncs, posted_empty, game_col="game_key")
    want_d = sorted(
        (r.game, r.gen, r.origin)
        for r in log.where(F.col("event_type") == "_d").collect()
    )
    assert got_d == want_d


def test_game_server_envelope_equals_batch(spark, sf_dir, chunked_events_dir):
    """The full streaming server (stateful.game_server) must produce
    GameResponse envelopes byte-equal to the batch replay
    (protocol_replay.game_response) on the same in-order poll schedule
    — T, delivered events, LWW state deltas, and proxy ids, across
    micro-batch boundaries and game GC generations."""
    from goeventstream_spark.streaming import game_server

    stream = read_event_stream(spark, chunked_events_dir)
    polls = stream.select(
        (F.col("user_id") % 4).cast("string").alias("game"),
        F.col("event_id").alias("sync_id"),
        "user_id",
        F.unix_millis("ts").alias("poll_ms"),
        F.to_json(F.array(F.array(F.col("event_type"), F.col("props")))).alias(
            "posted_json"
        ),
        F.col("props").alias("state_json"),
    )
    _run_stream(game_server(polls), "game_server_out", "append")
    got = {
        r.sync_id: (r.t, r.proxy_id, r.response)
        for r in spark.sql("SELECT * FROM game_server_out").collect()
    }

    ev = load_table(spark, sf_dir, "events")
    syncs = ev.select(
        F.col("event_id").alias("sync_id"),
        "user_id",
        F.unix_millis("ts").alias("poll_ms"),
        (F.col("user_id") % 4).alias("game_key"),
    )
    posted = ev.select(
        F.col("event_id").alias("sync_id"),
        F.lit(0).cast("long").alias("event_seq"),
        "event_type",
        F.col("props").alias("body"),
    )
    states = ev.select(F.col("event_id").alias("sync_id"), F.col("props").alias("data"))
    want = {
        r.sync_id: (r.t, r.proxy_id, r.response)
        for r in pr.game_response(syncs, posted, states, game_col="game_key").collect()
    }

    assert set(got) == set(want)
    mismatches = [
        (sid, got[sid], want[sid]) for sid in sorted(got) if got[sid] != want[sid]
    ]
    assert not mismatches, mismatches[:3]


def test_first_seen_activity_matches_batch_growth_accounting(spark, sf_dir, chunked_events_dir):
    """Streaming keyed-state growth accounting == the batch
    daily_user_accounting query: aggregating the per-(user, day)
    first-seen rows by day reproduces active/new/returning exactly."""
    from goeventstream_spark.streaming.stateful import first_seen_activity
    import goeventstream_spark.queries_r2  # noqa: F401
    from goeventstream_spark import queries as q

    stream = read_event_stream(spark, chunked_events_dir)
    _run_stream(first_seen_activity(stream), "first_seen_out", "append")
    out = spark.sql("SELECT * FROM first_seen_out")

    got = {
        (r.day, r.active, r.new): None
        for r in out.groupBy("day")
        .agg(
            F.count("*").alias("active"),
            F.sum("is_new").cast("long").alias("new"),
        )
        .collect()
    }
    want = {
        (r.day.strftime("%Y-%m-%d"), r.active_users, r.new_users): None
        for r in q.QUERIES["daily_user_accounting"](spark, sf_dir).collect()
    }
    assert got == want


def test_streaming_attribution_matches_batch_last_touch(spark, sf_dir, chunked_events_dir):
    """Streaming keyed-state last-touch attribution == the batch
    attribution_by_channel last_touch model, channel by channel."""
    from goeventstream_spark.streaming.stateful import streaming_attribution
    import goeventstream_spark.queries_r2  # noqa: F401
    from goeventstream_spark import queries as q

    stream = read_event_stream(spark, chunked_events_dir)
    _run_stream(streaming_attribution(stream), "attrib_out", "append")
    got = {
        (r.channel, r.conversions, r.revenue_cents): None
        for r in spark.sql("SELECT * FROM attrib_out")
        .groupBy("channel")
        .agg(
            F.count("*").alias("conversions"),
            F.sum("cents").cast("long").alias("revenue_cents"),
        )
        .collect()
    }
    want = {
        (r.channel, r.conversions, r.revenue_cents): None
        for r in q.QUERIES["attribution_by_channel"](spark, sf_dir)
        .where(F.col("model") == "last_touch")
        .collect()
    }
    assert got == want


def test_lateness_intolerant_ops_reject_nonzero_watermark(spark, sf_dir, chunked_events_dir):
    """first_seen_activity / streaming_attribution are exact only under
    the 0 s watermark (single-scalar state + append mode cannot handle
    late earlier days / late winning touches); non-zero delays and
    watermark=None must raise instead of being silently wrong."""
    import pytest

    from goeventstream_spark.streaming.stateful import (
        first_seen_activity,
        streaming_attribution,
    )

    stream = read_event_stream(spark, chunked_events_dir)
    for bad in ("10 seconds", "1 hour", None):
        with pytest.raises(ValueError, match="0-second watermark"):
            first_seen_activity(stream, watermark=bad)
        with pytest.raises(ValueError, match="0-second watermark"):
            streaming_attribution(stream, watermark=bad)
    # the exact form still constructs
    first_seen_activity(stream)
    streaming_attribution(stream, watermark="0 seconds")


def test_streaming_ewma_matches_batch_scan(spark, sf_dir, chunked_events_dir):
    """Streaming keyed EWMA == batch analytics.ewma_series on every
    CLOSED hour (the still-open max hour per key is never emitted in
    append mode), including cnt=0 gap hours."""
    from goeventstream_spark.operators.analytics import ewma_series
    from goeventstream_spark.streaming.stateful import streaming_ewma

    stream = read_event_stream(spark, chunked_events_dir)
    _run_stream(streaming_ewma(stream), "ewma_out", "append")
    got = {
        (r.event_type, r.hour_epoch): (r.cnt, r.ewma_ppm)
        for r in spark.sql("SELECT * FROM ewma_out").collect()
    }

    batch = ewma_series(
        load_table(spark, sf_dir, "events"), key_col="event_type"
    ).select(
        F.col("k").alias("event_type"),
        F.unix_timestamp("h").alias("hour_epoch"),
        "c",
        "e",
    )
    last = batch.groupBy("event_type").agg(
        F.max("hour_epoch").alias("last_h")
    )
    want = {
        (r.event_type, r.hour_epoch): (r.c, r.e)
        for r in batch.join(last, "event_type")
        .where(F.col("hour_epoch") < F.col("last_h"))
        .collect()
    }
    assert got == want
    assert len(got) > 100  # non-trivial trajectory actually compared


def test_streaming_ewma_rejects_nonzero_watermark(spark, sf_dir, chunked_events_dir):
    from goeventstream_spark.streaming.stateful import streaming_ewma

    stream = read_event_stream(spark, chunked_events_dir)
    with pytest.raises(ValueError, match="0-second watermark"):
        streaming_ewma(stream, watermark="10 minutes")


def test_streaming_wau_matches_batch_rolling_actives(spark, sf_dir, chunked_events_dir):
    """Streaming watermarked (day, user) dedup + 7-day fan-out == the
    batch rolling_active_users_7d query: counting distinct users per
    target day over the streamed first-occurrence rows reproduces WAU7
    and DAU exactly."""
    from goeventstream_spark.streaming.windows import rolling_active_firsts
    import goeventstream_spark.queries_r3e  # noqa: F401
    from goeventstream_spark import queries as q

    stream = read_event_stream(spark, chunked_events_dir)
    _run_stream(rolling_active_firsts(stream), "wau_firsts", "append")
    out = spark.sql("SELECT * FROM wau_firsts")

    batch = q.QUERIES["rolling_active_users_7d"](spark, sf_dir)
    want = {(r.day, r.wau7, r.dau): None for r in batch.collect()}
    lo = min(d for d, _, _ in want)
    hi = max(d for d, _, _ in want)

    wau = (
        out.where((F.col("d") >= lo) & (F.col("d") <= hi))
        .groupBy("d")
        .agg(F.count_distinct("user_id").cast("long").alias("wau7"))
    )
    dau = (
        out.where(F.col("d") == F.col("src_day"))
        .groupBy(F.col("src_day").alias("d"))
        .agg(F.count_distinct("user_id").cast("long").alias("dau"))
    )
    got = {
        (r.d, r.wau7, r.dau): None
        for r in wau.join(dau, "d").collect()
    }
    assert got == want


def test_streaming_ingest_dedup_matches_batch_exact_dedup(spark, sf_dir, tmp_path_factory):
    """Streaming dedup-on-ingest == batch exact_dedup: a chunked
    documents stream deduplicated on the content hash (watermarked
    dropDuplicates, first arrival wins) keeps exactly one doc per
    content hash, and with id-ordered arrival the kept ids equal the
    batch min-id winners — the exactly-once ingestion-dedup step of a
    training-data pipeline, streaming-native."""
    from goeventstream_spark.operators.dedup import exact_dedup, normalized_text

    docs = load_table(spark, sf_dir, "documents").orderBy("doc_id")
    rows = docs.collect()
    flat = str(tmp_path_factory.mktemp("docs_stream"))
    chunk = (len(rows) + 3) // 4
    for i in range(4):
        part = rows[i * chunk : (i + 1) * chunk]
        if part:
            spark.createDataFrame(part, docs.schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(flat, f"c{i}"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat + "/c*")
    )
    hashed = stream.select(
        "doc_id", F.md5(normalized_text("text")).alias("content_hash")
    ).dropDuplicates(["content_hash"])
    _run_stream(hashed, "dedup_ingest", "append")
    got = {
        (r.content_hash, r.doc_id): None
        for r in spark.sql("SELECT * FROM dedup_ingest").collect()
    }
    want = {
        (r.content_hash, r.keep_doc_id): None
        for r in exact_dedup(load_table(spark, sf_dir, "documents")).collect()
    }
    assert got == want
