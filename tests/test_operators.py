"""Unit tests for operator APIs not (or not directly) covered by the
declared-query oracle gate: the generic pair-producing band join, as-of
join tolerance, top-k tie handling, and multimodal frame sampling."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from goeventstream_spark.operators import multimodal
from goeventstream_spark.operators.relational import asof_join, range_join, topk_per_group
from goeventstream_spark.sources import load_table
from tests.oracle import run_oracle


def test_generic_range_join_matches_theta_oracle(spark, sf_dir):
    """The generic bucketized band join must equal a plain theta join
    (DuckDB IEJoin) — pairs of events within (0, 60s] per user."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    left = ev.select(F.col("event_id").alias("l_id"), "user_id", F.col("ts").alias("l_ts"))
    right = ev.select(F.col("event_id").alias("r_id"), "user_id", F.col("ts").alias("r_ts"))
    got = {
        (r.l_id, r.r_id)
        for r in range_join(
            left, right, "l_ts", "r_ts", 1, 60_001, keys=["user_id"]
        ).collect()
    }
    want = {
        (r.l_id, r.r_id)
        for r in run_oracle(
            """
            SELECT a.event_id AS l_id, b.event_id AS r_id
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND epoch_ms(b.ts) >= epoch_ms(a.ts) + 1
             AND epoch_ms(b.ts) < epoch_ms(a.ts) + 60001
            """,
            sf_dir,
        ).itertuples(index=False)
    }
    assert got == want and len(got) > 0


def test_asof_join_tolerance(spark, sf_dir):
    """With a tolerance, matches older than the window become NULL."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    tol_ms = 3_600_000
    out = asof_join(
        clicks, purchases, ["user_id"], "ts", "ts", ["value"], tolerance_ms=tol_ms
    ).collect()
    assert len(out) == clicks.count()
    for r in out:
        if r.asof_ts is not None:
            delta = (r.ts - r.asof_ts).total_seconds() * 1000
            assert 0 <= delta <= tol_ms
    # some matches exist and some were nulled by the tolerance
    assert any(r.asof_ts is not None for r in out)
    assert any(r.asof_ts is None for r in out)


def test_topk_per_group_exact_k_with_total_order(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    out = topk_per_group(
        orders.select("o_orderpriority", "o_orderkey", "o_totalprice"),
        ["o_orderpriority"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    ).collect()
    by_group: dict = {}
    for r in out:
        by_group.setdefault(r.o_orderpriority, []).append(r)
    for g, rows in by_group.items():
        assert len(rows) == 3
        assert sorted(r.rk for r in rows) == [1, 2, 3]


def test_frame_sample_expansion(spark, sf_dir):
    """mapInPandas 1->N expansion: one frame per 64-byte chunk, counts
    derived exactly from byte lengths."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = multimodal.as_media(docs)
    frames = multimodal.frame_sample(media, every_n_bytes=64)
    counts = {r.doc_id: r.n for r in frames.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    want = {
        r.doc_id: max(1, math.ceil(len(r.text.encode("utf-8")) / 64))
        for r in docs.collect()
    }
    assert counts == want


def test_resize_media_contract(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(30)
    media = multimodal.as_media(docs)
    out = multimodal.resize_media(media, target_bytes=128).collect()
    assert len(out) == 30
    for r in out:
        assert r.new_bytes == min(r.orig_bytes, 128)
        assert len(bytes(r.content)) == r.new_bytes
        assert r.media_type == "image/fake"


def test_chunk_documents_reconstructs_text(spark, sf_dir):
    """Stripping each chunk to its stride-width prefix and concatenating
    in chunk_idx order must reproduce the original text exactly; overlap
    between consecutive chunks is chunk_size - stride."""
    from goeventstream_spark.operators import text as text_ops

    docs = load_table(spark, sf_dir, "documents").limit(40)
    chunks = text_ops.chunk_documents(docs, chunk_size=200, stride=160).collect()
    by_doc = {}
    for r in sorted(chunks, key=lambda r: (r.doc_id, r.chunk_idx)):
        assert r.chunk_offset == r.chunk_idx * 160
        assert r.chunk_len == len(r.chunk_text) and r.chunk_len <= 200
        by_doc.setdefault(r.doc_id, []).append(r.chunk_text)
    originals = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, parts in by_doc.items():
        rebuilt = "".join(p[:160] for p in parts[:-1]) + parts[-1]
        assert rebuilt == originals[doc_id]


def test_sample_by_hash_deterministic_and_stable(spark, sf_dir):
    """Same threshold -> identical kept set across runs; a lower
    threshold keeps a strict subset (stability under rate changes)."""
    from goeventstream_spark.operators import sampling

    docs = load_table(spark, sf_dir, "documents")
    k50 = {r.doc_id for r in sampling.sample_by_hash(docs, "7fff").select("doc_id").collect()}
    k50_again = {r.doc_id for r in sampling.sample_by_hash(docs, "7fff").select("doc_id").collect()}
    k25 = {r.doc_id for r in sampling.sample_by_hash(docs, "3fff").select("doc_id").collect()}
    assert k50 == k50_again
    assert k25 <= k50
    n = docs.count()
    assert 0.15 * n < len(k25) < 0.35 * n and 0.4 * n < len(k50) < 0.6 * n


def test_decontaminate_flags_exact_ngram_overlap(spark):
    """A corpus doc sharing a word 3-gram with the benchmark set is
    flagged with the exact count of its distinct overlapping shingles;
    disjoint docs produce no row."""
    from goeventstream_spark.operators import dedup

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            # shares "the quick brown" and "quick brown fox"
            (1, "see the quick brown fox run"),
            # no 3-gram in common
            (2, "a completely different sentence here"),
            # shares one shingle, repeated (distinct shingles counted once)
            (3, "the quick brown cat and the quick brown cat"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r.n_contaminated_ngrams
        for r in dedup.decontaminate(corpus, bench).collect()
    }
    assert out == {1: 2, 3: 1}


def test_dedup_clusters_chain_and_singletons(spark):
    """A 4-node chain (1-2, 2-3, 3-4) must collapse to one component
    labeled by its min id even though no single pair links 1 to 4 —
    this is the transitivity near-dup pairs alone don't give you.
    Docs outside any pair come back as singleton clusters."""
    from goeventstream_spark.operators import dedup

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["doc_a", "doc_b"]
    )
    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 99]], ["doc_id"])
    out = {
        r.doc_id: r.cluster_id
        for r in dedup.dedup_clusters(pairs, all_docs=docs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 99: 99}


def test_dedup_representatives_picks_best_quality(spark):
    from goeventstream_spark.operators import dedup

    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["doc_a", "doc_b"])
    docs = spark.createDataFrame([(1,), (2,), (3,), (7,)], ["doc_id"])
    quality = spark.createDataFrame(
        [(1, 0.5), (2, 2.0), (3, 2.0), (7, 1.0)], ["doc_id", "quality_score"]
    )
    clusters = dedup.dedup_clusters(pairs, all_docs=docs)
    reps = {
        r.cluster_id: (r.rep_doc_id, r.n_members)
        for r in dedup.dedup_representatives(clusters, quality).collect()
    }
    # cluster 1: quality tie between 2 and 3 -> lowest doc_id wins
    assert reps == {1: (2, 3), 7: (7, 1)}


def test_pii_redact_counts_and_scrubs(spark):
    """Emails/phones/IPs are replaced with kind tokens and counted;
    clean text passes through untouched with zero counts. The fixture
    corpus contains no PII (verified), so the operator contract is
    pinned here instead of an all-zero oracle query."""
    from goeventstream_spark.operators import text

    docs = spark.createDataFrame(
        [
            (1, "contact alice@example.com or bob.smith@corp.co.uk today"),
            (2, "call +1-555-123-4567 from 10.0.0.1 now"),
            (3, "perfectly clean text with no identifiers"),
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in text.pii_redact(docs).collect()}
    assert out[1].n_email == 2 and "[EMAIL]" in out[1].redacted_text
    assert "alice@example.com" not in out[1].redacted_text
    assert out[2].n_phone == 1 and out[2].n_ipv4 == 1
    assert "[PHONE]" in out[2].redacted_text and "[IPV4]" in out[2].redacted_text
    assert out[3].n_email == out[3].n_phone == out[3].n_ipv4 == 0
    assert out[3].redacted_text == "perfectly clean text with no identifiers"


def test_bigram_topk_counts(spark):
    from goeventstream_spark.operators import text

    docs = spark.createDataFrame(
        [
            (1, "en", "a b a b c"),
            (2, "en", "a b x"),
            (3, "fr", "le chat"),
        ],
        ["doc_id", "lang", "text"],
    )
    out = {
        (r.lang, r.bigram): (r.n, r.rk)
        for r in text.bigram_topk(docs, top_k=2, group_col="lang").collect()
    }
    # "a b" appears twice in doc1 + once in doc2 = 3; no cross-doc bigrams
    assert out[("en", "a b")] == (3, 1)
    assert out[("fr", "le chat")] == (1, 1)
    assert len([k for k in out if k[0] == "en"]) == 2


def test_max_concurrency_carry_across_midnight(spark):
    """A session spanning midnight raises the NEXT day's base level via
    the carry even when that day only closes sessions (max_run < 0)."""
    from goeventstream_spark.operators.temporal import max_concurrency_by_day

    rows = [
        # two sessions open on day 1, one closes day 1, one spans into day 2
        (1, 1, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
        (2, 1, "2024-01-01 10:30:00", "2024-01-02 01:00:00"),
        # day 2: only the close of session (2,1) — peak there is the carry
        # day 3: fresh session, overlapping nothing
        (3, 1, "2024-01-03 09:00:00", "2024-01-03 10:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, session_id long, session_start string, session_end string"
    ).select(
        "user_id",
        "session_id",
        F.to_timestamp("session_start").alias("session_start"),
        F.to_timestamp("session_end").alias("session_end"),
    )
    got = {
        r["day"].strftime("%Y-%m-%d"): r["max_concurrent"]
        for r in max_concurrency_by_day(df).collect()
    }
    assert got == {"2024-01-01": 2, "2024-01-02": 1, "2024-01-03": 1}


def test_max_concurrency_closed_interval_touch(spark):
    """Closed-interval semantics: a session starting exactly when
    another ends counts as overlapping at that instant (+1 sorts
    before -1)."""
    from goeventstream_spark.operators.temporal import max_concurrency_by_day

    rows = [
        (1, 1, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
        (2, 1, "2024-01-01 11:00:00", "2024-01-01 12:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, session_id long, session_start string, session_end string"
    ).select(
        "user_id",
        "session_id",
        F.to_timestamp("session_start").alias("session_start"),
        F.to_timestamp("session_end").alias("session_end"),
    )
    [r] = max_concurrency_by_day(df).collect()
    assert r["max_concurrent"] == 2


def test_cdc_apply_delete_insert_upsert(spark):
    """cdc_apply: 'D' removes base keys, 'U' upserts (including keys
    new to the snapshot), untouched base keys survive, and only the
    LAST changelog entry per key counts."""
    from goeventstream_spark.operators.temporal import cdc_apply

    base = spark.createDataFrame(
        [(1, 10.0, "2024-01-01 00:00:00"), (2, 20.0, "2024-01-01 00:00:00")],
        "user_id long, value double, ts string",
    ).select("user_id", "value", F.to_timestamp("ts").alias("ts"))
    chg = spark.createDataFrame(
        [
            # key 1: upsert then delete -> gone
            (1, "U", 11.0, "2024-01-02 00:00:00", 1),
            (1, "D", None, "2024-01-03 00:00:00", 2),
            # key 3: insert (not in base)
            (3, "U", 30.0, "2024-01-02 00:00:00", 3),
            # key 4: delete of a nonexistent key -> stays absent
            (4, "D", None, "2024-01-02 00:00:00", 4),
        ],
        "user_id long, op string, value double, ts string, event_id long",
    ).select("user_id", "op", "value", F.to_timestamp("ts").alias("ts"), "event_id")
    got = {r["user_id"]: r["value"] for r in cdc_apply(base, chg).collect()}
    assert got == {2: 20.0, 3: 30.0}


def test_udtf_chunk_text_lateral(spark):
    """Python UDTF surface (Spark 4): a table function exploding each
    doc into fixed-size chunks, invoked via SQL LATERAL join. UDTFs are
    the sanctioned 1->N Python row generator (the imperative cousin of
    text.chunk_documents' pure-expression explode — which remains the
    100 TB hot path; this pins the API works for logic that genuinely
    needs Python)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id: int, chunk: string")
    class ChunkText:
        def eval(self, text: str, size: int):
            if text is None:
                return
            for i in range(0, len(text), size):
                yield i // size, text[i : i + size]

    spark.udtf.register("chunk_text", ChunkText)
    docs = spark.createDataFrame(
        [(1, "abcdefgh"), (2, "xy"), (3, None)], "doc_id long, body string"
    )
    docs.createOrReplaceTempView("udtf_docs")
    rows = spark.sql(
        """
        SELECT doc_id, c.chunk_id, c.chunk
        FROM udtf_docs, LATERAL chunk_text(body, 3) AS c
        ORDER BY doc_id, chunk_id
        """
    ).collect()
    got = [(r.doc_id, r.chunk_id, r.chunk) for r in rows]
    assert got == [
        (1, 0, "abc"),
        (1, 1, "def"),
        (1, 2, "gh"),
        (2, 0, "xy"),
    ]


def test_observe_inflight_quality_metrics(spark, sf_dir):
    """Observation metrics (df.observe): data-quality counters computed
    IN the same pass as the real query — zero extra scans, the way a
    100 TB pipeline audits itself without doubling I/O."""
    from pyspark.sql import Observation

    ev = load_table(spark, sf_dir, "events")
    obs = Observation("dq")
    out = (
        ev.observe(
            obs,
            F.count(F.lit(1)).alias("rows_seen"),
            F.sum(F.col("value").isNull().cast("long")).alias("null_values"),
            F.max("ts").alias("max_ts"),
        )
        .groupBy("event_type")
        .count()
    )
    n_types = out.count()
    m = obs.get
    assert n_types > 0
    assert m["rows_seen"] == ev.count()
    assert m["null_values"] == 0
    assert m["max_ts"] is not None


def test_asof_join_duplicate_right_ts_deterministic(spark):
    """Two right rows on the same (key, ts) must resolve by the
    declared tie rule (greatest value tuple wins), not physical
    partition order."""
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:05")], "user_id long, ts string"
    ).select("user_id", F.to_timestamp("ts").alias("ts"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 5.0),
            (1, "2024-01-01 10:00:00", 9.0),
            (1, "2024-01-01 10:00:00", 1.0),
        ],
        "user_id long, ts string, value double",
    ).select("user_id", F.to_timestamp("ts").alias("ts"), "value").repartition(3)
    for _ in range(3):
        [row] = asof_join(
            left, right, keys=["user_id"], left_ts="ts", right_ts="ts",
            value_cols=["value"],
        ).collect()
        assert row["asof_value"] == 9.0


def test_png_codec_roundtrip_and_corruption():
    """Pure-stdlib PNG codec: encode/decode round-trips arbitrary
    gray + RGB pixels through all five cycling row filters; corrupting
    any byte is caught by chunk CRC verification."""
    import random

    from goeventstream_spark.functions.png import decode_png, encode_png, fixture_png

    rng = random.Random(7)
    for _ in range(20):
        ct = rng.choice([0, 2])
        bpp = 1 if ct == 0 else 3
        w, h = rng.randint(1, 24), rng.randint(1, 24)
        px = bytes(rng.randrange(256) for _ in range(w * h * bpp))
        assert decode_png(encode_png(w, h, px, ct)) == (w, h, ct, px)
    data = bytearray(fixture_png(42))
    data[33] ^= 0x01  # flip one IHDR payload bit
    import pytest

    with pytest.raises(ValueError):
        decode_png(bytes(data))
    # adversarial mutation fuzz: truncation/bitflip/insertion must only
    # ever raise ValueError (the "undecodable -> null dims" contract of
    # the Spark-side extractors) — never zlib.error/struct.error/IndexError
    base = fixture_png(123)
    for trial in range(200):
        mut = bytearray(base)
        op = rng.randrange(3)
        if op == 0:
            mut = mut[: rng.randrange(len(mut))]
        elif op == 1:
            mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
        else:
            i = rng.randrange(len(mut))
            mut = mut[:i] + bytes([rng.randrange(256)] * rng.randrange(9)) + mut[i:]
        try:
            decode_png(bytes(mut))
        except ValueError:
            pass


def test_extract_features_real_decode(spark, sf_dir):
    """extract_features(fake=False) REALLY decodes PNG payloads —
    dimensions match the fixture formula — and nulls the dims of
    non-PNG payloads instead of crashing the task."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = multimodal.as_media_png(docs)
    rows = multimodal.extract_features(media, fake=False).collect()
    assert len(rows) == 50
    for r in rows:
        assert r.width == 4 + r.doc_id % 29
        assert r.height == 4 + (r.doc_id // 29) % 29
        assert r.n_bytes > 0 and len(r.content_md5) == 32
    # non-PNG payloads (utf-8 text) -> null dims, no crash
    bad = multimodal.extract_features(
        multimodal.as_media(docs.limit(5)), fake=False
    ).collect()
    assert len(bad) == 5 and all(r.width is None and r.height is None for r in bad)


def test_wav_codec_roundtrip_and_corruption():
    """Pure-stdlib WAV codec: encode/decode round-trips arbitrary
    mono/stereo int16 sample runs (odd data lengths exercise RIFF word
    padding); mutation fuzz must only ever raise ValueError — never
    struct.error/IndexError — matching the undecodable->null contract
    of decode_audio_stats."""
    import random

    import pytest

    from goeventstream_spark.functions.wav import decode_wav, encode_wav, fixture_wav

    rng = random.Random(11)
    for _ in range(20):
        ch = rng.choice([1, 2])
        n = rng.randint(1, 50) * ch
        samples = [rng.randint(-32768, 32767) for _ in range(n)]
        rate = rng.choice([8000, 16000, 44100])
        assert decode_wav(encode_wav(rate, ch, samples)) == (rate, ch, samples)
    with pytest.raises(ValueError):
        encode_wav(8000, 2, [1])  # not a multiple of channels
    with pytest.raises(ValueError):
        encode_wav(8000, 1, [40000])  # outside int16
    base = fixture_wav(123)
    for _trial in range(200):
        mut = bytearray(base)
        op = rng.randrange(3)
        if op == 0:
            mut = mut[: rng.randrange(len(mut))]
        elif op == 1:
            mut[rng.randrange(len(mut))] ^= 1 << rng.randrange(8)
        else:
            i = rng.randrange(len(mut))
            mut = mut[:i] + bytes([rng.randrange(256)] * rng.randrange(9)) + mut[i:]
        try:
            decode_wav(bytes(mut))
        except ValueError:
            pass


def test_decode_audio_stats_real_decode(spark, sf_dir):
    """decode_audio_stats REALLY decodes WAV payloads — stats match
    the fixture formula — and nulls the stats of non-WAV payloads
    instead of crashing the task."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = multimodal.as_media_wav(docs)
    rows = multimodal.decode_audio_stats(media).collect()
    assert len(rows) == 50
    for r in rows:
        n = 64 + r.doc_id % 193
        samples = [(r.doc_id * 31 + i * 17) % 4001 - 2000 for i in range(n)]
        assert r.sample_rate == 8000 + (r.doc_id % 5) * 1000
        assert r.n_samples == n
        assert r.peak_amp == max(abs(s) for s in samples)
        assert r.abs_sum == sum(abs(s) for s in samples)
    bad = multimodal.decode_audio_stats(multimodal.as_media(docs.limit(5))).collect()
    assert len(bad) == 5 and all(r.sample_rate is None and r.abs_sum is None for r in bad)


def test_incremental_minhash_equals_full_on_any_split(spark, sf_dir):
    """Incremental dedup (delta vs persisted signature index) must
    equal the full-corpus recompute restricted to delta-touching
    pairs, for ANY corpus split — the correctness contract that lets
    a 100 TB pipeline dedup per-ingest-batch without rescanning."""
    from goeventstream_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    full = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in dedup.minhash_near_dedup(docs).collect()
    }
    for split_expr in [
        F.col("doc_id") % 3 == 0,
        F.col("doc_id") < 100,
        F.md5(F.col("doc_id").cast("string")).startswith("a"),
    ]:
        hist_docs = docs.where(~split_expr)
        delta_docs = docs.where(split_expr)
        hist_sigs = dedup.minhash_signatures(dedup.shingles(hist_docs))
        delta_sigs, pairs = dedup.incremental_minhash_dedup(hist_sigs, delta_docs)
        got = {(r.doc_a, r.doc_b): r.est_jaccard for r in pairs.collect()}
        delta_ids = {r.doc_id for r in delta_docs.select("doc_id").collect()}
        want = {
            p: j for p, j in full.items() if p[0] in delta_ids or p[1] in delta_ids
        }
        assert got == want
        # the returned signature rows are exactly the delta's index rows
        assert delta_sigs.count() == len(delta_ids)


def test_incremental_minhash_empty_edges(spark, sf_dir):
    """Degenerate ingest batches: an empty delta yields empty outputs;
    an all-delta batch (empty history index) equals the full
    recompute; an empty probe/build bloom reports zeros, not NULLs."""
    from goeventstream_spark.operators import dedup, sketches

    docs = load_table(spark, sf_dir, "documents")
    sigs = dedup.minhash_signatures(dedup.shingles(docs))
    empty_docs = docs.where(F.lit(False))
    d_sigs, pairs = dedup.incremental_minhash_dedup(sigs, empty_docs)
    assert d_sigs.count() == 0 and pairs.count() == 0
    empty_sigs = sigs.where(F.lit(False))
    _s, pairs_all = dedup.incremental_minhash_dedup(empty_sigs, docs)
    full = {
        (r.doc_a, r.doc_b) for r in dedup.minhash_near_dedup(docs).collect()
    }
    assert {(r.doc_a, r.doc_b) for r in pairs_all.collect()} == full
    keys = docs.select(F.col("doc_id").alias("key")).limit(10)
    [r] = sketches.bloom_probe_report(
        keys.where(F.lit(False)), keys, "key", "key"
    ).collect()
    assert (r.n_probe, r.predicted_members, r.true_members, r.false_positives) == (
        10, 0, 0, 0,
    )
    [r] = sketches.bloom_probe_report(
        keys, keys.where(F.lit(False)), "key", "key"
    ).collect()
    assert (r.n_probe, r.predicted_members, r.true_members, r.false_positives) == (
        0, 0, 0, 0,
    )


def test_interval_align_join_edges(spark):
    """Hand-built interval algebra edges: touching half-open intervals
    do NOT overlap, open (NULL-end) intervals overlap everything after
    their start, and both-open intersections stay open (NULL ov_to/ms)."""
    from goeventstream_spark.operators.temporal import interval_align_join

    def T(s):
        return f"2024-01-01 00:00:{s:02d}"

    left = spark.createDataFrame(
        [(1, "a1", T(0), T(10)), (1, "a2", T(10), T(20)), (1, "a3", T(30), None)],
        "user_id int, attr string, valid_from string, valid_to string",
    ).select(
        "user_id", "attr",
        F.to_timestamp("valid_from").alias("valid_from"),
        F.to_timestamp("valid_to").alias("valid_to"),
    )
    right = spark.createDataFrame(
        [(1, "b1", T(5), T(10)), (1, "b2", T(25), None)],
        "user_id int, band string, valid_from string, valid_to string",
    ).select(
        "user_id", "band",
        F.to_timestamp("valid_from").alias("valid_from"),
        F.to_timestamp("valid_to").alias("valid_to"),
    )
    rows = {
        (r.attr, r.band): (r.ov_from.second, r.ov_to.second if r.ov_to else None, r.ov_ms)
        for r in interval_align_join(left, right).collect()
    }
    assert rows == {
        # a1 x b1 overlap [5,10); a2 x b1 touch at 10 -> excluded
        ("a1", "b1"): (5, 10, 5000),
        # b2 open: overlaps a3 (also open) from 30, intersection open
        ("a3", "b2"): (30, None, None),
    }


def test_prefix_filter_join_equals_inverted_index(spark, sf_dir):
    """Prefix filtering is exact — recall 1 by the prefix-filter
    theorem, precision 1 by verification — so across thresholds its
    pair set must EQUAL the exhaustive inverted-index join's. Also
    re-asserts the size filter is consistent (no pair lost to the
    t*|other| pre-check)."""
    from goeventstream_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    for t in (0.3, 0.5, 0.8):
        got = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in dedup.prefix_filter_jaccard_join(docs, threshold=t).collect()
        }
        want = {
            (r.doc_a, r.doc_b, round(r.jaccard, 9))
            for r in dedup.ngram_jaccard_pairs(docs, threshold=t).collect()
        }
        assert got == want, f"t={t}: {got ^ want}"


def test_trend_slope_degenerate_inputs_null_not_crash(spark):
    """A key with a single hourly bucket has zero x-variance: the slope
    must be NULL (nullif guard), never an ANSI DIVIDE_BY_ZERO crash."""
    import datetime as dt

    from goeventstream_spark.operators import analytics

    ev = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 0, 10), "solo")],
        "user_id long, ts timestamp, event_type string",
    )
    rows = analytics.trend_slopes(ev).collect()
    assert len(rows) == 1
    assert rows[0].slope_per_hour is None


def test_pandas_grouped_agg_udaf_matches_builtin_median(spark, sf_dir):
    """Series-to-scalar (grouped-agg) pandas UDAF — the one Arrow UDF
    flavor the rest of the repo doesn't exercise (scalar pandas_udf,
    mapInPandas, applyInPandas, UDTF are all covered elsewhere): an
    exact integer low-median per event_type, pinned equal to the
    builtin percentile. Documented slow path: use builtins in real
    queries; this pins that the UDAF *surface* works and agrees."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    from goeventstream_spark.sources import load_table

    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def lo_median(v):
        # exact discrete low median of integer cents (no interpolation)
        s = v.sort_values(ignore_index=True)
        return int(s.iloc[(len(s) - 1) // 2])

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
    )
    got = {
        (r.event_type, r.med): None
        for r in ev.groupBy("event_type").agg(lo_median("cents").alias("med")).collect()
    }
    want = {
        (r.event_type, r.med): None
        for r in ev.groupBy("event_type")
        .agg(
            F.expr(
                "sort_array(collect_list(cents))"
                "[CAST((count(*) - 1) DIV 2 AS INT)]"
            ).alias("med")
        )
        .collect()
    }
    assert got == want


def test_edit_distance_qgram_join_matches_naive_theta(spark, sf_dir):
    """dedup.edit_distance_qgram_join (q-gram prefix filter) must equal
    the naive within-block theta join — exact recall by the Gravano
    count bound + prefix-filter theorem, exact precision via the
    bounded-levenshtein verify. Run on the real part table (the
    er_golden_parts candidate step)."""
    from goeventstream_spark.operators.dedup import edit_distance_qgram_join

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_size"
    )
    got = {
        (r.id_a, r.id_b)
        for r in edit_distance_qgram_join(
            part, "p_partkey", "p_name", max_dist=3, q=3,
            block_cols=("p_size",),
        ).collect()
    }
    a = part.select(
        F.col("p_partkey").alias("ka"), F.col("p_name").alias("na"),
        F.col("p_size").alias("sa"),
    )
    b = part.select(
        F.col("p_partkey").alias("kb"), F.col("p_name").alias("nb"),
        F.col("p_size").alias("sb"),
    )
    want = {
        (r.ka, r.kb)
        for r in a.join(
            b, (F.col("sa") == F.col("sb")) & (F.col("ka") < F.col("kb"))
        )
        .where(F.levenshtein(F.col("na"), F.col("nb"), 3) >= 0)
        .collect()
    }
    assert got == want and len(got) > 0


def test_edit_distance_qgram_join_short_string_fallback(spark):
    """Strings under q + k*q chars escape the count bound (two
    length-4 strings at ed<=3 can share zero 3-grams) — the short
    stratum must still pair exactly, and short/long pairs must come
    from the gram path exactly once."""
    from goeventstream_spark.operators.dedup import edit_distance_qgram_join

    rows = [
        (1, "abcd"),          # short; ed("abcd","axyd")=2, zero shared 3-grams
        (2, "axyd"),          # short
        (3, "ab"),            # shorter than q: no grams at all
        (4, "abc"),           # ed to "ab" is 1
        (5, "promise wheat almond"),    # long
        (6, "promise wheat almonds"),   # long, ed 1
        (7, "promise wheat almond"),    # exact dup of 5
        (8, "completely different str"),
        (9, "chocolate"),     # len 9 < 12: short; ed 3+ to everything
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {
        (r.id_a, r.id_b)
        for r in edit_distance_qgram_join(df, "id", "s", max_dist=3, q=3).collect()
    }
    a = df.select(F.col("id").alias("ka"), F.col("s").alias("na"))
    b = df.select(F.col("id").alias("kb"), F.col("s").alias("nb"))
    want = {
        (r.ka, r.kb)
        for r in a.join(b, F.col("ka") < F.col("kb"))
        .where(F.levenshtein(F.col("na"), F.col("nb"), 3) >= 0)
        .collect()
    }
    assert (1, 2) in want  # the count-bound-escaping pair is exercised
    assert got == want


def test_edit_distance_qgram_join_randomized_boundary_mix(spark):
    """Seeded randomized equivalence on a small-alphabet corpus mixing
    lengths 2..20 — straddling the q+k*q=12 short/long boundary, with
    heavy duplicate structure (the distinct-projection path) and many
    true matches. Must equal brute force exactly for several (k, q)
    settings, including q=2 (boundary at 8)."""
    import random

    from goeventstream_spark.operators.dedup import edit_distance_qgram_join

    rng = random.Random(20260815)
    alpha = "abc"
    rows = [
        (i, "".join(rng.choice(alpha) for _ in range(rng.randint(2, 20))))
        for i in range(90)
    ]
    df = spark.createDataFrame(rows, "id long, s string")
    a = df.select(F.col("id").alias("ka"), F.col("s").alias("na"))
    b = df.select(F.col("id").alias("kb"), F.col("s").alias("nb"))
    for k, qg in ((3, 3), (2, 2), (1, 3)):
        got = {
            (r.id_a, r.id_b)
            for r in edit_distance_qgram_join(
                df, "id", "s", max_dist=k, q=qg
            ).collect()
        }
        want = {
            (r.ka, r.kb)
            for r in a.join(b, F.col("ka") < F.col("kb"))
            .where(F.levenshtein(F.col("na"), F.col("nb"), k) >= 0)
            .collect()
        }
        assert got == want, (k, qg, len(got), len(want))


def test_canonicalize_urls_rejects_reserved_column_collisions(spark):
    """The staged transform re-selects every input column while
    aliasing intermediates under fixed names; a colliding input (or an
    out_col shadowing an existing column) must be refused loudly, not
    silently clobbered."""
    import pytest

    from goeventstream_spark.operators.text import canonicalize_urls

    ok = spark.createDataFrame(
        [(1, "HTTPS://WWW.Ex.com:443/a/?utm_x=1&b=2#f")], "id long, url string"
    )
    got = canonicalize_urls(ok).collect()[0]["canonical_url"]
    assert got == "https://ex.com/a?b=2"

    clash = ok.withColumnRenamed("id", "_auth")
    with pytest.raises(ValueError, match="_auth"):
        canonicalize_urls(clash)
    with pytest.raises(ValueError, match="out_col"):
        canonicalize_urls(ok, out_col="url")


def test_hashed_linear_scores_keep_tokenless_totality(spark):
    """keep_tokenless=True must score token-less docs sw=0, n=0 while
    leaving token-ful scores identical to the default path (the gate's
    totality contract: kept + rejects partition every batch)."""
    from pyspark.sql import functions as F

    from goeventstream_spark.operators.text import hashed_linear_scores

    docs = spark.createDataFrame(
        [
            (1, "s", "alpha beta  beta"),
            (2, "s", ""),
            (3, "s", "   "),
            (4, "s", "gamma"),
            (5, "s", None),  # NULL text: split(NULL) explodes to NOTHING
        ],
        "doc_id long, source string, text string",
    )
    default = {
        r.doc_id: (r.sw, r.n) for r in hashed_linear_scores(docs).collect()
    }
    total = {
        r.doc_id: (r.sw, r.n)
        for r in hashed_linear_scores(docs, keep_tokenless=True).collect()
    }
    assert set(default) == {1, 4}  # documented: token-less rows absent
    assert set(total) == {1, 2, 3, 4, 5}
    assert total[2] == (0, 0) and total[3] == (0, 0) and total[5] == (0, 0)
    for d in (1, 4):  # token-ful scores identical across modes
        assert total[d] == default[d]
