"""Stream-stream interval join: the two-unbounded-inputs shape
(click stream ⋈ purchase stream within a time bound) that Structured
Streaming supports only with watermarks on both sides plus a time-range
join condition — the state-cleanup contract that keeps the join's
buffered state finite on an unbounded run.

Reference tie-in: the closest reference concept is the per-stream
delta delivery (model/eventStream.go:63-71) — events paired with the
states changed in the same sync window. Here the generalization is two
event substreams paired within a bounded event-time interval.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from goeventstream_spark.sources import load_table
from goeventstream_spark.streaming import read_event_stream


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, tmp_path_factory):
    """Clicks joined to purchases by the same user within [0, 30 min]
    after the click, streamed with availableNow, must equal the batch
    interval join over the same data. Both sides carry watermarks so
    Spark can age out buffered rows — without them the join state grows
    without bound (analysis error in append mode)."""
    import os

    # one-file-per-chunk source dir (same trick as test_streaming_advanced)
    out = str(tmp_path_factory.mktemp("ssj_src"))
    ev = load_table(spark, sf_dir, "events").orderBy("ts")
    rows = ev.collect()
    chunk = (len(rows) + 3) // 4
    for i in range(4):
        part = rows[i * chunk : (i + 1) * chunk]
        d = str(tmp_path_factory.mktemp(f"ssj_c{i}"))
        spark.createDataFrame(part, ev.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        src = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        os.rename(os.path.join(d, src), os.path.join(out, f"{i:04d}.parquet"))

    def split_sides(df):
        clicks = df.where(F.col("event_type") == "click").select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        buys = df.where(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        return clicks, buys

    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES"))
    )

    stream = read_event_stream(spark, out)
    s_clicks, s_buys = split_sides(stream)
    s_clicks = s_clicks.withWatermark("click_ts", "1 hour")
    s_buys = s_buys.withWatermark("purchase_ts", "1 hour")
    q = (
        s_clicks.join(s_buys, cond, "inner")
        .select("click_id", "purchase_id")
        .writeStream.format("memory")
        .queryName("ssj_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM ssj_out").collect()
    }

    b_clicks, b_buys = split_sides(load_table(spark, sf_dir, "events"))
    want = {
        (r.click_id, r.purchase_id)
        for r in b_clicks.join(b_buys, cond, "inner")
        .select("click_id", "purchase_id")
        .collect()
    }
    assert got == want and len(want) > 0


def test_streaming_funnel_matches_batch(spark, sf_dir, tmp_path_factory):
    """The keyed-state streaming funnel's final per-user position must
    equal the batch funnel over the same (event-time-ordered) data."""
    import os

    from goeventstream_spark.operators import analytics
    from goeventstream_spark.streaming import read_event_stream
    from goeventstream_spark.streaming.stateful import streaming_funnel

    out = str(tmp_path_factory.mktemp("sf_src"))
    ev = load_table(spark, sf_dir, "events").orderBy("ts")
    rows = ev.collect()
    chunk = (len(rows) + 3) // 4
    for i in range(4):
        part = rows[i * chunk : (i + 1) * chunk]
        d = str(tmp_path_factory.mktemp(f"sf_c{i}"))
        spark.createDataFrame(part, ev.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        src = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        os.rename(os.path.join(d, src), os.path.join(out, f"{i:04d}.parquet"))

    q = (
        streaming_funnel(read_event_stream(spark, out))
        .writeStream.format("memory")
        .queryName("sfunnel_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {}
    for r in spark.sql(
        "SELECT * FROM sfunnel_out ORDER BY coalesce(t_purchase_ms, 0),"
        " coalesce(t_click_ms, 0), t_view_ms"
    ).collect():
        got[r.user_id] = (r.t_view_ms, r.t_click_ms, r.t_purchase_ms)  # last wins

    def ms(t):
        return None if t is None else int(t.timestamp() * 1000)

    want = {
        r.user_id: (ms(r.t_view), ms(r.t_click), ms(r.t_purchase))
        for r in analytics.funnel(load_table(spark, sf_dir, "events")).collect()
    }
    assert got == want and len(want) > 0


def test_stream_stream_left_outer_join_matches_batch(spark, sf_dir, tmp_path_factory):
    """LEFT OUTER stream-stream interval join: clicks with no purchase
    inside [0, 30 min] must surface as null-padded rows — but Structured
    Streaming can only emit a null-padded row once the watermark proves
    no match can still arrive, so a run that simply exhausts its input
    leaves the tail's unmatched clicks buffered forever. The test
    appends a far-future flush event on EACH side (sentinel ids,
    excluded from comparison) to push both watermarks past all real
    rows; the streamed result must then equal the batch left-outer join
    exactly — including every unmatched click."""
    import datetime
    import os

    out = str(tmp_path_factory.mktemp("ssjlo_src"))
    ev = load_table(spark, sf_dir, "events").orderBy("ts")
    rows = ev.collect()
    max_ts = max(r.ts for r in rows)
    flush_ts = max_ts + datetime.timedelta(days=10)
    flush = [
        rows[0].asDict() | {"event_id": -1, "user_id": -1, "event_type": "click", "ts": flush_ts},
        rows[0].asDict() | {"event_id": -2, "user_id": -2, "event_type": "purchase", "ts": flush_ts},
    ]
    chunk = (len(rows) + 3) // 4
    parts = [rows[i * chunk : (i + 1) * chunk] for i in range(4)]
    parts.append([type(rows[0])(**d) for d in flush])
    for i, part in enumerate(parts):
        d = str(tmp_path_factory.mktemp(f"ssjlo_c{i}"))
        spark.createDataFrame(part, ev.schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(d)
        src = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        os.rename(os.path.join(d, src), os.path.join(out, f"{i:04d}.parquet"))

    def split_sides(df):
        clicks = df.where(F.col("event_type") == "click").select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        buys = df.where(F.col("event_type") == "purchase").select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        return clicks, buys

    cond = (
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES"))
    )

    stream = read_event_stream(spark, out)
    s_clicks, s_buys = split_sides(stream)
    s_clicks = s_clicks.withWatermark("click_ts", "1 hour")
    s_buys = s_buys.withWatermark("purchase_ts", "1 hour")
    q = (
        s_clicks.join(s_buys, cond, "left_outer")
        .select("click_id", "purchase_id")
        .writeStream.format("memory")
        .queryName("ssjlo_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM ssjlo_out").collect()
        if r.click_id not in (-1, -2)
    }

    b_clicks, b_buys = split_sides(load_table(spark, sf_dir, "events"))
    want = {
        (r.click_id, r.purchase_id)
        for r in b_clicks.join(b_buys, cond, "left_outer")
        .select("click_id", "purchase_id")
        .collect()
    }
    assert got == want
    # the outer semantics actually fired: some clicks are unmatched
    assert any(p is None for _c, p in want)
