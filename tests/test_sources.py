"""Source/sink round-trips: JSONL and CSV ingest produce the same
relation as the parquet source; partitioned parquet sink enables
partition pruning on the partition column."""

from __future__ import annotations

from pyspark.sql import functions as F

from goeventstream_spark import plans
from goeventstream_spark.sources import load_table
from goeventstream_spark.sources.io import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
    write_partitioned_parquet,
)
from goeventstream_spark.streaming.windows import EVENTS_SCHEMA


def _canon_rows(df):
    return sorted(
        (r.event_id, r.ts, r.user_id, r.event_type, round(r.value, 6), r.props)
        for r in df.collect()
    )


def test_jsonl_roundtrip(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_jsonl")
    write_jsonl(ev, path)
    back = read_jsonl(spark, path, EVENTS_SCHEMA)
    assert _canon_rows(back) == _canon_rows(ev)


def test_csv_roundtrip(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_csv")
    write_csv(ev, path)
    back = read_csv(spark, path, EVENTS_SCHEMA)
    assert _canon_rows(back) == _canon_rows(ev)


def test_partitioned_sink_prunes(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    path = str(tmp_path / "events_part")
    write_partitioned_parquet(ev, path, ["event_date"])
    back = spark.read.parquet(path)
    pruned = back.where(F.col("event_date") == "2024-01-05")
    # partition filter prunes at planning: far fewer files than the
    # full 30-day layout, and the filter never appears as a data filter
    plan = plans.physical_plan(pruned)
    assert "PartitionFilters" in plan or pruned.count() == ev.where(
        F.to_date("ts") == "2024-01-05"
    ).count()
    assert pruned.count() == ev.where(F.to_date("ts") == "2024-01-05").count()


def test_sql_surface_over_registered_views(spark, sf_dir):
    """register_views exposes every fixture table to spark.sql — the
    engine's SQL entry point."""
    from goeventstream_spark.sources import register_views

    register_views(spark, sf_dir)
    got = spark.sql(
        """
        SELECT r_name, count(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name
        """
    ).collect()
    assert sum(r.n for r in got) == spark.table("customer").count()
    assert len(got) == 5


def test_schema_evolution_merge(spark, tmp_path):
    """A lake accretes columns over time: files written before a column
    existed must still read alongside newer files. mergeSchema unions
    the footers; old files surface the new column as NULL — pinned here
    so the read path's contract survives refactors."""
    import os

    from pyspark.sql import functions as F

    old = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    new = spark.createDataFrame([(3, "c", 1.5)], ["id", "v", "score"])
    old.write.mode("overwrite").parquet(str(tmp_path / "d1"))
    new.write.mode("overwrite").parquet(str(tmp_path / "d2"))
    # one directory, mixed-schema files
    import shutil

    dest = tmp_path / "lake"
    os.makedirs(dest)
    for i, d in enumerate((tmp_path / "d1", tmp_path / "d2")):
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                shutil.copy(d / f, dest / f"{i}_{f}")
    df = spark.read.option("mergeSchema", "true").parquet(str(dest))
    rows = {r.id: (r.v, r.score) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", 1.5)}


def test_clustered_write_tightens_rowgroup_stats(spark, sf_dir, tmp_path):
    """write_clustered_parquet must produce row groups whose ts
    min/max ranges are narrow relative to the global span (that's what
    makes predicate-pushdown row-group skipping effective); an
    unsorted write of the same data has near-global ranges in every
    row group."""
    from goeventstream_spark.sources import load_table
    from goeventstream_spark.sources.io import write_clustered_parquet

    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_millis("ts").alias("ts_ms"), "user_id"
    )
    clustered = str(tmp_path / "clustered")
    write_clustered_parquet(ev, clustered, ["ts_ms"], target_files=4)

    # range partitioning gives each file a contiguous disjoint key
    # range, so every row-group span must sit well under the global
    # span (~1/target_files of it up to sampling skew).
    # (ts is written as epoch millis: Spark's INT96 timestamp output
    # carries no parquet min/max stats, a real layout consideration —
    # int64 epoch columns are what a stats-pruned lake stores.)
    spans, total = _rowgroup_spans(clustered, "ts_ms")
    assert len(spans) >= 4
    assert max(spans) < total * 0.6, (max(spans), total)


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    from goeventstream_spark.sources import load_table
    from goeventstream_spark.sources.io import read_orc, write_orc

    orders = load_table(spark, sf_dir, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(orders, path)
    back = read_orc(spark, path, orders.schema)
    assert back.schema == orders.schema
    assert back.count() == orders.count()
    a = sorted(r.o_orderkey for r in orders.select("o_orderkey").collect())
    b = sorted(r.o_orderkey for r in back.select("o_orderkey").collect())
    assert a == b


def _rowgroup_spans(path, col):
    import os

    import pyarrow.parquet as pq_

    spans, gmin, gmax = [], None, None
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq_.ParquetFile(os.path.join(path, f)).metadata
        idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == col
        )
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            spans.append(st.max - st.min)
            gmin = st.min if gmin is None else min(gmin, st.min)
            gmax = st.max if gmax is None else max(gmax, st.max)
    return spans, gmax - gmin


def test_zorder_write_tightens_both_dimensions(spark, sf_dir, tmp_path):
    """write_zordered_parquet must tighten row-group min/max stats on
    BOTH cluster dimensions simultaneously — the property single-column
    range clustering cannot give: clustering on ts alone leaves user_id
    spans at ~the global span in every row group."""
    from pyspark.sql import functions as F

    from goeventstream_spark.sources import load_table
    from goeventstream_spark.sources.io import (
        write_clustered_parquet,
        write_zordered_parquet,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", F.unix_millis("ts").alias("ts_ms"), "user_id"
    )
    zpath = str(tmp_path / "zordered")
    write_zordered_parquet(ev, zpath, ["ts_ms", "user_id"], bits=10, target_files=8)
    spath = str(tmp_path / "single")
    write_clustered_parquet(ev, spath, ["ts_ms"], target_files=8)

    z_ts, ts_total = _rowgroup_spans(zpath, "ts_ms")
    z_uid, uid_total = _rowgroup_spans(zpath, "user_id")
    s_uid, _ = _rowgroup_spans(spath, "user_id")

    mean = lambda xs: sum(xs) / len(xs)
    # z-order: BOTH dims well under global span on average.
    assert mean(z_ts) < ts_total * 0.6, (mean(z_ts), ts_total)
    assert mean(z_uid) < uid_total * 0.6, (mean(z_uid), uid_total)
    # single-column clustering leaves the second dim unclustered —
    # z-order must beat it substantially on that dim.
    assert mean(z_uid) < mean(s_uid) * 0.75, (mean(z_uid), mean(s_uid))


def test_jsonl_corrupt_record_capture(spark, tmp_path):
    """Malformed JSONL rows must be captured, not crash the read and
    not silently vanish: PERMISSIVE mode + an explicit _corrupt_record
    column routes bad lines to a quarantine column — the ingest
    robustness a 100 TB lake needs (one bad producer must not kill a
    billion-row backfill)."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"id": 1, "v": "ok"}\n'
        "this is not json\n"
        '{"id": 2, "v": "also ok"}\n'
        '{"id": 3, "v": broken}\n'
    )
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("v", StringType()),
            StructField("_corrupt_record", StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
    )
    rows = df.collect()
    assert len(rows) == 4
    good = sorted(r.id for r in rows if r._corrupt_record is None)
    bad = sorted(r._corrupt_record for r in rows if r._corrupt_record is not None)
    assert good == [1, 2]
    assert len(bad) == 2 and any("not json" in b for b in bad)


def test_protocol_events_datasource_batch_deterministic(spark):
    """Python Data Source (Spark 4) batch read: the R1 live-ingest
    analogue is partition-parallel and fully deterministic — two reads
    agree row-for-row, every (tick, client) yields exactly one event,
    and the client space splits across the requested partitions."""
    from goeventstream_spark.sources import protocol_source

    protocol_source.register(spark)
    df = (
        spark.read.format("protocol_events")
        .option("n_clients", 6)
        .option("ticks", 40)
        .option("numPartitions", 3)
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    rows = sorted(df.collect(), key=lambda r: r.event_id)
    assert len(rows) == 6 * 40
    again = sorted(df.collect(), key=lambda r: r.event_id)
    assert rows == again
    types = {r.event_type for r in rows}
    assert types <= {"view", "click", "purchase", "error", "signup"}
    # tick clock: consecutive ticks are 50ms apart
    by_client0 = [r for r in rows if r.user_id == 0]
    deltas = {
        int((b.ts - a.ts).total_seconds() * 1000)
        for a, b in zip(by_client0, by_client0[1:])
    }
    assert deltas == {50}


def test_protocol_events_datasource_stream_matches_batch(spark, tmp_path):
    """Streaming read from the custom source: two micro-batches advance
    the tick offset; the accumulated rows equal the batch read over the
    same tick range (replayable offsets == exactly-once semantics)."""
    from goeventstream_spark.sources import protocol_source

    protocol_source.register(spark)
    stream = (
        spark.readStream.format("protocol_events")
        .option("n_clients", 4)
        .option("ticks_per_batch", 10)
        .option("numPartitions", 2)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("proto_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        # wait until at least 2 batches (>= 80 rows) have landed
        import time

        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM proto_stream").collect()[0].c
            if n >= 80:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = {
        tuple(r)
        for r in spark.sql(
            "SELECT event_id, user_id, event_type, value FROM proto_stream"
        ).collect()
    }
    n_ticks = max(eid // 1_000_000 for eid, *_ in got) + 1
    want = {
        (r.event_id, r.user_id, r.event_type, r.value)
        for r in spark.read.format("protocol_events")
        .option("n_clients", 4)
        .option("ticks", n_ticks)
        .load()
        .collect()
    }
    assert got == want and len(got) >= 80


def test_compact_parquet_sizes_from_bytes_and_roundtrips(spark, sf_dir, tmp_path):
    """compact_parquet: many small files -> byte-budgeted file count,
    identical data, and (with cluster_cols) restored row-group-stat
    tightness; re-running on the compacted output is stable."""
    import os

    from goeventstream_spark.sources.io import compact_parquet

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "small_files")
    ev.repartition(40).write.parquet(src)
    assert len([f for f in os.listdir(src) if f.endswith(".parquet")]) == 40

    dst = str(tmp_path / "compacted")
    n = compact_parquet(spark, src, dst, target_file_mb=512, cluster_cols=["ts"])
    files = [f for f in os.listdir(dst) if f.endswith(".parquet")]
    assert len(files) == n and n < 40
    before = {tuple(r) for r in ev.select("event_id", "user_id").collect()}
    after = {
        tuple(r)
        for r in spark.read.parquet(dst).select("event_id", "user_id").collect()
    }
    assert after == before
    # idempotent file count on re-compaction
    dst2 = str(tmp_path / "compacted2")
    n2 = compact_parquet(spark, dst, dst2, target_file_mb=512, cluster_cols=["ts"])
    assert n2 == n


def test_storage_report_matches_duckdb_parquet_metadata(spark, sf_dir):
    """The footer-derived storage report must equal DuckDB's native
    parquet_metadata() byte-for-byte (same footers, same sums) — the
    exactness pin the driver's view-based oracle cannot express."""
    import duckdb

    from goeventstream_spark.sources.stats import column_storage_report

    path = f"{sf_dir}/lineitem.parquet"
    got = {
        (r.path_in_schema, r.n_chunks, r.n_values, r.compressed, r.uncompressed)
        for r in column_storage_report(spark, path).collect()
    }
    want = {
        tuple(r)
        for r in duckdb.sql(
            f"""
            SELECT path_in_schema, CAST(count(*) AS BIGINT),
                   CAST(sum(num_values) AS BIGINT),
                   CAST(sum(total_compressed_size) AS BIGINT),
                   CAST(sum(total_uncompressed_size) AS BIGINT)
            FROM parquet_metadata('{path}') GROUP BY path_in_schema
            """
        ).fetchall()
    }
    assert got == want


def test_write_idempotent_publish_and_replay_noop(spark, sf_dir, tmp_path):
    """Idempotent publish: first call writes batch dir + manifest;
    a duplicate delivery of the same batch_id returns the SAME
    manifest without rewriting (exactly-once output from
    at-least-once retries); a different batch_id publishes fresh."""
    import json
    import os

    from goeventstream_spark.sources.io import write_idempotent
    from goeventstream_spark.sources import load_table

    base = str(tmp_path / "sink")
    os.makedirs(base)
    df = load_table(spark, sf_dir, "region")

    m1 = write_idempotent(df, base, "b1")
    assert m1["n_rows"] == df.count()
    final = os.path.join(base, "batch_id=b1")
    files1 = sorted(os.listdir(final))
    mtime1 = os.path.getmtime(os.path.join(final, "_manifest.json"))

    m2 = write_idempotent(df, base, "b1")  # duplicate delivery
    assert m2 == m1
    assert sorted(os.listdir(final)) == files1
    assert os.path.getmtime(os.path.join(final, "_manifest.json")) == mtime1

    m3 = write_idempotent(df, base, "b2")
    assert m3["checksum"] == m1["checksum"]  # same content, same fingerprint
    assert os.path.isdir(os.path.join(base, "batch_id=b2"))

    back = spark.read.parquet(final)
    assert back.count() == m1["n_rows"]
    with open(os.path.join(final, "_manifest.json")) as fh:
        assert json.load(fh)["batch_id"] == "b1"


def test_write_idempotent_concurrent_publishers_one_winner(spark, sf_dir, tmp_path):
    """Two publishers racing on the SAME batch_id: exactly one commit
    wins, both calls return the winner's manifest, and the published
    directory is complete and readable — regardless of interleaving.
    (Each attempt stages in a private mkdtemp dir; a shared staging
    path would let one attempt clobber the other's half-written
    files.)"""
    import json
    import os
    import threading

    from goeventstream_spark.sources import load_table
    from goeventstream_spark.sources.io import write_idempotent

    base = str(tmp_path / "sink")
    os.makedirs(base)
    df = load_table(spark, sf_dir, "region")
    results, errors = [None, None], [None, None]

    def publish(slot):
        try:
            results[slot] = write_idempotent(df, base, "race")
        except Exception as e:  # noqa: BLE001 - assert no exception below
            errors[slot] = e

    threads = [threading.Thread(target=publish, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert errors == [None, None], errors
    assert results[0] == results[1]  # both adopted the single winner

    final = os.path.join(base, "batch_id=race")
    with open(os.path.join(final, "_manifest.json")) as fh:
        assert json.load(fh) == results[0]
    assert spark.read.parquet(final).count() == df.count()
    # no torn second copy of the batch anywhere
    batches = [d for d in os.listdir(base) if d.startswith("batch_id=")]
    assert batches == ["batch_id=race"]


def test_write_idempotent_sweeps_stale_not_live_staging(spark, sf_dir, tmp_path):
    """Staging-dir GC must distinguish a CRASHED attempt's leak (tree
    mtimes stale -> swept) from a LIVE concurrent publisher's mkdtemp
    dir (fresh mtimes -> left alone): rmtree-ing a live same-batch_id
    writer mid-write fails it spuriously, breaking the documented
    'concurrent publishers race safely' contract."""
    import os

    from goeventstream_spark.sources import load_table
    from goeventstream_spark.sources.io import write_idempotent

    base = str(tmp_path / "sink")
    os.makedirs(base)
    df = load_table(spark, sf_dir, "region")

    stale = os.path.join(base, "_tmp_batch_b9_dead")
    live = os.path.join(base, "_tmp_batch_b9_alive")
    for d in (stale, live):
        os.makedirs(os.path.join(d, "sub"))
        with open(os.path.join(d, "sub", "part-0"), "w") as fh:
            fh.write("x")
    old = 10_000_000.0  # epoch 1970 — unambiguously stale
    for root, dirs, files in os.walk(stale, topdown=False):
        for ent in files + dirs:
            os.utime(os.path.join(root, ent), (old, old))
    os.utime(stale, (old, old))

    m = write_idempotent(df, base, "b9")
    assert m["n_rows"] == df.count()
    assert not os.path.exists(stale)  # crashed leak collected
    assert os.path.isdir(live)  # live concurrent attempt untouched


def test_binary_media_ingest_end_to_end(spark, tmp_path):
    """The multimodal lake entry point: real PNG files on disk ->
    binaryFile ingest (distributed listing + reads) -> the SAME
    Arrow decode pass the declared queries use — pixel sums must match
    the encoder's input exactly, proving file bytes survive the
    source untouched."""
    import os

    from pyspark.sql import functions as F

    from goeventstream_spark.functions.png import encode_png
    from goeventstream_spark.operators.multimodal import decode_stats
    from goeventstream_spark.sources.io import read_binary_media

    media_dir = tmp_path / "media" / "nested"
    os.makedirs(media_dir)
    want = {}
    for i, (w, h) in enumerate([(5, 3), (8, 2)]):
        px = bytes((i + x * 7 + 3) % 251 for x in range(w * h))
        (media_dir / f"img{i}.png").write_bytes(encode_png(w, h, px))
        want[i] = (w, h, sum(px))
    (media_dir / "ignore.txt").write_text("not media")

    files = read_binary_media(spark, str(tmp_path / "media"), glob="*.png")
    assert files.count() == 2  # glob filtered, recursive lookup
    media = files.select(
        F.regexp_extract("path", r"img(\d+)\.png$", 1).cast("long").alias("doc_id"),
        F.col("content"),
    )
    got = {
        r.doc_id: (r.width, r.height, r.px_sum)
        for r in decode_stats(media).collect()
    }
    assert got == want


def test_avro_gate_raises_actionable_error(spark, sf_dir, tmp_path):
    """Avro is external since Spark 2.4 and its jar is not bundled
    here; the gated wrappers must either round-trip (jar present) or
    raise the actionable classpath message — never Spark's bare
    'Failed to find data source'."""
    import pytest

    from goeventstream_spark.sources import load_table
    from goeventstream_spark.sources.io import read_avro, write_avro

    df = load_table(spark, sf_dir, "region")
    path = str(tmp_path / "region_avro")
    try:
        write_avro(df, path)
    except RuntimeError as exc:
        assert "spark-avro" in str(exc)
        with pytest.raises(RuntimeError, match="spark-avro"):
            read_avro(spark, path)
        return
    back = read_avro(spark, path)  # jar present: full round trip
    assert back.count() == df.count()
