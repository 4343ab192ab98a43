"""Round-5 query registrations: web-scale curation steps a crawl-based
training pipeline runs before text ever reaches dedup — URL
canonicalization/dedup and a hashed linear quality classifier.

The fixture corpus has no URL column, so `url_canonical_dedup`
synthesizes deterministic messy URLs from order keys INSIDE the query
(the queries_r4 PII-synthesis pattern): four variants per canonical
page — case-mangled authority, default :443 port, www prefix,
utm_* tracking params, unsorted query params, trailing slash,
fragments — and runs the production canonicalizer over them; DuckDB
replays the identical synthesis and string algebra, so the report is
hash-exact.

Cross-engine determinism notes (the repo-wide rules): every ratio is
ONE double division (no float accumulation); the classifier works in
BIGINT weight space and exposes the logit, not a sigmoid (libm exp
differs between the JVM and DuckDB; the sigmoid is monotone so
keep/bucket decisions are identical); regexp replacement syntax
differs ($1 vs \\1) but outputs are equal, which is all the value-hash
compares.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from goeventstream_spark.queries import query
from goeventstream_spark.sources import load_table

# Deterministic messy-URL synthesis: 4 wire variants per (custkey)
# page, selected by o_orderkey % 4. Valid in BOTH Spark SQL and DuckDB
# (shared string, like queries_r4._SYNTH_SQL).
_URL_SYNTH = (
    "CASE CAST(o_orderkey % 4 AS INT) "
    "WHEN 0 THEN 'https://shop-' || CAST(o_custkey % 50 AS STRING) || "
    "'.example.com/u/' || CAST(o_custkey AS STRING) || '?a=1&b=2' "
    "WHEN 1 THEN 'HTTPS://WWW.SHOP-' || CAST(o_custkey % 50 AS STRING) || "
    "'.EXAMPLE.COM:443/u/' || CAST(o_custkey AS STRING) || '/?b=2&a=1' "
    "WHEN 2 THEN 'https://www.shop-' || CAST(o_custkey % 50 AS STRING) || "
    "'.example.com/u/' || CAST(o_custkey AS STRING) || "
    "'?utm_source=mail&a=1&b=2#top' "
    "ELSE 'https://shop-' || CAST(o_custkey % 50 AS STRING) || "
    "'.example.com:443/u/' || CAST(o_custkey AS STRING) || "
    "'/?b=2&utm_campaign=x&a=1#frag' END"
)


@query(
    "url_canonical_dedup",
    f"""
    WITH synth AS (
      SELECT {_URL_SYNTH} AS url FROM orders
    ),
    s1 AS (SELECT url, regexp_replace(url, '#.*$', '') AS u1 FROM synth),
    s2 AS (
      SELECT *, regexp_extract(u1, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)', 1) AS auth,
             substr(u1, length(regexp_extract(u1, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)', 1)) + 1) AS rest
      FROM s1
    ),
    s3 AS (
      SELECT *, regexp_replace(regexp_replace(regexp_replace(lower(auth),
                  '^(https://[^:]*):443$', '\\1'),
                  '^(http://[^:]*):80$', '\\1'),
                  '://www\\.', '://') AS cauth,
             regexp_extract(rest, '^([^?]*)', 1) AS path,
             CASE WHEN strpos(rest, '?') > 0
                  THEN substr(rest, length(regexp_extract(rest, '^([^?]*)', 1)) + 2)
                  ELSE '' END AS qs
      FROM s2
    ),
    s4 AS (
      SELECT *, CASE WHEN regexp_replace(path, '/+$', '') = '' THEN '/'
                     ELSE regexp_replace(path, '/+$', '') END AS cpath,
             array_to_string(list_sort(list_filter(str_split(qs, '&'),
                 x -> x <> '' AND NOT starts_with(x, 'utm_'))), '&') AS params
      FROM s3
    ),
    canon AS (
      SELECT url,
             cauth || cpath || CASE WHEN params = '' THEN ''
                                    ELSE '?' || params END AS canonical_url
      FROM s4
    )
    SELECT regexp_extract(canonical_url, '^[a-z][a-z0-9+.-]*://([^/]*)', 1) AS host,
           CAST(count(*) AS BIGINT) AS n_urls,
           CAST(count(DISTINCT canonical_url) AS BIGINT) AS n_pages,
           CAST(sum(CASE WHEN url LIKE '%utm_%' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_tracking,
           CAST(count(*) AS DOUBLE) / count(DISTINCT canonical_url) AS dup_ratio
    FROM canon GROUP BY 1
    """,
)
def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + host-level dedup report — the crawl
    frontier's first dedup pass (RFC 3986 §6 normalization): strip
    fragment, lowercase scheme+authority, drop default ports
    (:443/:80), drop the www prefix, strip trailing path slashes,
    drop utm_* tracking params, sort the remaining query params.
    Grouping the raw crawl by canonical URL collapses wire-level
    variants of the same page; the report shows per-host fetch
    inflation (dup_ratio = fetched URLs per distinct page).

    100 TB shape: canonicalization is a pure map pass of builtin
    string expressions (the only HOF — the param filter/sort — runs
    on tiny per-URL arrays); the report is one hash aggregation keyed
    by host with a count-distinct expansion. No joins, no UDFs.
    """
    from goeventstream_spark.operators.text import canonicalize_urls

    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    synth = orders.select(F.expr(_URL_SYNTH).alias("url"))
    canon = canonicalize_urls(synth, "url", "canonical_url")
    return canon.groupBy(
        F.regexp_extract("canonical_url", r"^[a-z][a-z0-9+.-]*://([^/]*)", 1).alias(
            "host"
        )
    ).agg(
        F.count("*").cast("long").alias("n_urls"),
        F.countDistinct("canonical_url").cast("long").alias("n_pages"),
        F.sum(F.when(F.col("url").like("%utm_%"), 1).otherwise(0))
        .cast("long")
        .alias("n_tracking"),
        (
            F.count("*").cast("double") / F.countDistinct("canonical_url")
        ).alias("dup_ratio"),
    )


# 6-hex-digit md5 slice -> BIGINT, DuckDB side (the queries_llm strpos
# idiom; Spark side uses conv()).
_HEX6 = " + ".join(
    f"(strpos('0123456789abcdef', substr(md5(word), {j + 1}, 1)) - 1) * {16 ** (5 - j)}"
    for j in range(6)
)


@query(
    "hashed_linear_quality",
    f"""
    WITH words AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    w AS (
      SELECT doc_id, source, ({_HEX6}) % 2001 - 1000 AS wt
      FROM words WHERE word <> ''
    ),
    d AS (
      SELECT doc_id, min(source) AS source, sum(wt) AS sw, count(*) AS n
      FROM w GROUP BY doc_id
    )
    SELECT source,
           CAST(floor((sw * 5) / (1000.0 * n)) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(sw / (1000.0 * n)) AS min_logit,
           max(sw / (1000.0 * n)) AS max_logit
    FROM d GROUP BY source, bucket
    """,
)
def q_hashed_linear_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear quality classifier: each token's
    weight is a deterministic hash of the token itself (6 hex digits
    of md5 -> integer in [-1000, 1000] — the "hashing trick" standing
    in for trained weights, same plumbing and plan shape), a
    document's logit is the mean token weight, and documents bucket
    into logit deciles per source. keep = logit >= 0 falls out of the
    bucket sign; the sigmoid is omitted on purpose — it is monotone,
    so decisions are identical, and libm exp differs across engines.

    Cross-engine exactness: all accumulation happens in BIGINT weight
    space (order-independent integer sums); each logit is ONE double
    division, and min/max are order-independent — no float
    accumulation anywhere.

    100 TB shape: explode -> per-doc integer agg (one shuffle on
    doc_id, map-side combinable) -> per-(source, bucket) count (one
    tiny agg). Pure builtin expressions; the weight hash is computed
    inline — no vocabulary table, no join, which is the point of
    hashed features at scale."""
    from goeventstream_spark.operators.text import hashed_linear_scores

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    d = hashed_linear_scores(docs)
    return d.groupBy(
        "source",
        F.floor((F.col("sw") * 5) / (F.lit(1000.0) * F.col("n")))
        .cast("long")
        .alias("bucket"),
    ).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min(F.col("sw") / (F.lit(1000.0) * F.col("n"))).alias("min_logit"),
        F.max(F.col("sw") / (F.lit(1000.0) * F.col("n"))).alias("max_logit"),
    )


# 4-hex-digit md5 slice -> BIGINT (DuckDB side); Spark side uses conv().
_HEX4_DOC = " + ".join(
    "(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), "
    f"{j + 1}, 1)) - 1) * {16 ** (3 - j)}"
    for j in range(4)
)


@query(
    "quality_filter_with_exploration",
    f"""
    WITH words AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS word
      FROM documents
    ),
    w AS (
      SELECT doc_id, source, ({_HEX6}) % 2001 - 1000 AS wt
      FROM words WHERE word <> ''
    ),
    d AS (
      -- TOTAL over documents: a token-less doc (empty/whitespace/NULL
      -- text) scores sw=0, mirroring hashed_linear_scores'
      -- keep_tokenless mode — the streaming ingest gate and this batch
      -- report must agree on every doc, not just scoreable ones
      SELECT doc.doc_id, doc.source, coalesce(s.sw, 0) AS sw
      FROM documents doc LEFT JOIN (
        SELECT doc_id, sum(wt) AS sw FROM w GROUP BY doc_id
      ) s USING (doc_id)
    ),
    flags AS (
      SELECT source,
             CASE WHEN sw >= 0 THEN 1 ELSE 0 END AS is_quality,
             CASE WHEN sw < 0 AND ({_HEX4_DOC}) < 6554 THEN 1 ELSE 0 END
               AS is_explore
      FROM d
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(is_quality) AS BIGINT) AS n_quality,
           CAST(sum(is_explore) AS BIGINT) AS n_explore,
           CAST(sum(is_quality) + sum(is_explore) AS BIGINT) AS n_keep
    FROM flags GROUP BY source
    """,
)
def q_quality_filter_with_exploration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-gated corpus filter with exploration: keep documents
    the hashed linear classifier scores positive, PLUS a deterministic
    ~10% hash sample of the rejects (the standard guard against a
    quality filter's blind spots — rejected-but-sampled docs are the
    labeling pool for the classifier's next training round, and the
    keep set stays reproducible because both gates are pure functions
    of content and id). The exploration draw is the repo's md5
    doc-key idiom: 4 hex digits of md5(doc_id) < 6554/65536.

    100 TB shape: the classifier pass is one explode + one integer agg
    keyed by doc (map-side combinable); gating and sampling are
    map-only expressions on the doc-level relation; the per-source
    report is one tiny aggregation. No joins, no UDFs, nothing
    retained beyond the counters."""
    from goeventstream_spark.operators.text import hashed_linear_scores

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    # keep_tokenless: the report is TOTAL over documents (token-less
    # docs score sw=0 -> kept), matching the streaming ingest gate and
    # the oracle's LEFT JOIN from documents — the two paths must
    # partition/count the same doc set on every corpus.
    d = hashed_linear_scores(docs, keep_tokenless=True)
    draw = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    flags = d.select(
        "source",
        F.when(F.col("sw") >= 0, 1).otherwise(0).alias("is_quality"),
        F.when((F.col("sw") < 0) & (draw < 6554), 1)
        .otherwise(0)
        .alias("is_explore"),
    )
    return flags.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("is_quality").cast("long").alias("n_quality"),
        F.sum("is_explore").cast("long").alias("n_explore"),
        (F.sum("is_quality") + F.sum("is_explore")).cast("long").alias("n_keep"),
    )


@query(
    "image_ahash_neardup",
    """
    WITH g AS (
      SELECT doc_id, 4 + doc_id % 29 AS w, 4 + (doc_id // 29) % 29 AS h
      FROM documents
    ),
    cells AS (
      SELECT doc_id,
             (doc_id + 7 * ((i.i * h) // 8) + 3 * ((j.j * w) // 8)) % 251 AS p,
             (i.i * 8 + j.j) AS pos
      FROM g, (SELECT unnest(range(8)) AS i) i, (SELECT unnest(range(8)) AS j) j
    ),
    tot AS (SELECT doc_id, sum(p) AS sp FROM cells GROUP BY doc_id),
    bits AS (
      SELECT c.doc_id, c.pos, CASE WHEN c.p * 64 >= t.sp THEN 1 ELSE 0 END AS b
      FROM cells c JOIN tot t USING (doc_id)
    ),
    halves AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN pos < 32
                  THEN b * (1::BIGINT << CAST(31 - pos AS INT)) ELSE 0 END)
               AS BIGINT) AS hi,
             CAST(sum(CASE WHEN pos >= 32
                  THEN b * (1::BIGINT << CAST(63 - pos AS INT)) ELSE 0 END)
               AS BIGINT) AS lo
      FROM bits GROUP BY doc_id
    ),
    segs AS (
      SELECT doc_id, pos // 22 AS seg_id,
             CAST(sum(b * (1::BIGINT << CAST(21 - (pos % 22) AS INT)))
               AS BIGINT) AS seg_val
      FROM bits GROUP BY doc_id, pos // 22
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM segs a JOIN segs b
        ON a.seg_id = b.seg_id AND a.seg_val = b.seg_val
       AND a.doc_id < b.doc_id
    ),
    pairs AS (
      SELECT bit_count(xor(ha.hi, hb.hi)) + bit_count(xor(ha.lo, hb.lo))
               AS hamming
      FROM cand c
      JOIN halves ha ON ha.doc_id = c.doc_a
      JOIN halves hb ON hb.doc_id = c.doc_b
    )
    SELECT CAST(hamming AS BIGINT) AS hamming,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs WHERE hamming <= 2 GROUP BY 1
    """,
)
def q_image_ahash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup via average-hash over REAL decoded
    pixels: every document's deterministic PNG fixture is fully
    decoded (CRC-checked chunk walk, inflate, all 5 filters —
    functions/png.py), aHash'd on an 8x8 nearest-neighbor grid with a
    cross-multiplied integer mean compare, and paired by pigeonhole
    segment join (3 ~22-bit segments: exact recall for hamming <= 2).
    The report is the pair count per hamming distance — the signal an
    image-dedup pipeline thresholds before dropping visual dups.

    The oracle never runs the codec: it replays the fixture's
    closed-form pixel algebra (pixel(r,c) = (doc_id + 7r + 3c) % 251)
    straight into the same integer hash, so hash-equality here proves
    the REAL decode end-to-end, the same contract as
    multimodal_png_decode.

    100 TB shape: decode+hash is one Arrow-batched map pass emitting 3
    segment rows per asset; the only shuffle is the segment equi-join
    (collision-bounded, the SimHash theorem), then an 3-row aggregate.
    """
    from goeventstream_spark.operators import multimodal as mm

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = mm.ahash_neardup_pairs(mm.as_media_png(docs), max_hamming=2)
    return pairs.groupBy("hamming").agg(
        F.count("*").cast("long").alias("n_pairs")
    )


@query(
    "audio_envelope_neardup",
    """
    WITH g AS (SELECT doc_id, 64 + doc_id % 193 AS n FROM documents),
    samp AS (SELECT doc_id, n, unnest(range(n)) AS i FROM g),
    sv AS (
      SELECT doc_id, abs((doc_id * 31 + i * 17) % 4001 - 2000) AS a,
             (i * 32) // n AS frame
      FROM samp
    ),
    fr AS (SELECT doc_id, frame, sum(a) AS e FROM sv GROUP BY doc_id, frame),
    tot AS (SELECT doc_id, sum(e) AS te FROM fr GROUP BY doc_id),
    bits AS (
      SELECT f.doc_id, f.frame AS pos,
             CASE WHEN f.e * 32 >= t.te THEN 1 ELSE 0 END AS b
      FROM fr f JOIN tot t USING (doc_id)
    ),
    segs AS (
      SELECT doc_id, pos // 11 AS seg_id,
             CAST(sum(b * (1::BIGINT << CAST(10 - (pos % 11) AS INT)))
               AS BIGINT) AS seg_val
      FROM bits GROUP BY doc_id, pos // 11
    ),
    h AS (
      SELECT doc_id,
             CAST(sum(b * (1::BIGINT << CAST(31 - pos AS INT))) AS BIGINT) AS hv
      FROM bits GROUP BY doc_id
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM segs a JOIN segs b
        ON a.seg_id = b.seg_id AND a.seg_val = b.seg_val
       AND a.doc_id < b.doc_id
    ),
    pairs AS (
      SELECT bit_count(xor(ha.hv, hb.hv)) AS hamming
      FROM cand c
      JOIN h ha ON ha.doc_id = c.doc_a
      JOIN h hb ON hb.doc_id = c.doc_b
    )
    SELECT CAST(hamming AS BIGINT) AS hamming,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM pairs WHERE hamming <= 2 GROUP BY 1
    """,
)
def q_audio_envelope_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup via energy-envelope fingerprints over REAL
    decoded samples: every document's deterministic 16-bit PCM WAV
    fixture is fully decoded (functions/wav.py), folded into 32
    floor-bucketed frames of integer |sample| energy, bit-signed
    against the clip mean (cross-multiplied — exact integer math), and
    paired by the 3-segment pigeonhole join (exact recall for hamming
    <= 2). The report is the pair count per hamming distance — the
    audio sibling of image_ahash_neardup.

    The oracle replays the fixture's closed-form sample algebra
    (sample(i) = (doc_id*31 + i*17) % 4001 - 2000) without running the
    codec, so hash-equality proves the real signed-PCM decode
    end-to-end.

    100 TB shape: decode + fingerprint is one Arrow-batched map pass
    (3 segment rows per clip); the only shuffle is the
    collision-bounded segment equi-join, then a 3-row aggregate."""
    from goeventstream_spark.operators import multimodal as mm

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = mm.audio_envelope_neardup_pairs(mm.as_media_wav(docs), max_hamming=2)
    return pairs.groupBy("hamming").agg(
        F.count("*").cast("long").alias("n_pairs")
    )


@query(
    "video_scene_changes",
    """
    WITH g AS (SELECT doc_id, 3 + doc_id % 6 AS nf FROM documents),
    fr AS (SELECT doc_id, nf, unnest(range(nf)) AS f FROM g),
    px AS (
      SELECT doc_id, f, r.r AS r, c.c AS c,
             (doc_id + 31 * ((f * f) % 5) + 7 * r.r + 3 * c.c) % 251 AS p
      FROM fr, (SELECT unnest(range(8)) AS r) r,
               (SELECT unnest(range(8)) AS c) c
    ),
    d AS (
      SELECT a.doc_id, a.f, sum(abs(a.p - b.p)) AS delta
      FROM px a JOIN px b
        ON a.doc_id = b.doc_id AND a.r = b.r AND a.c = b.c AND b.f = a.f - 1
      GROUP BY a.doc_id, a.f
    ),
    agg AS (
      SELECT doc_id, sum(delta) AS total_delta, max(delta) AS max_delta,
             sum(CASE WHEN delta > 6000 THEN 1 ELSE 0 END) AS n_changes
      FROM d GROUP BY doc_id
    )
    SELECT g.doc_id, CAST(g.nf AS BIGINT) AS n_frames,
           CAST(coalesce(a.total_delta, 0) AS BIGINT) AS total_delta,
           CAST(coalesce(a.max_delta, 0) AS BIGINT) AS max_frame_delta,
           CAST(coalesce(a.n_changes, 0) AS BIGINT) AS n_scene_changes
    FROM g LEFT JOIN agg a USING (doc_id)
    """,
)
def q_video_scene_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change detection over multi-frame video assets with REAL
    per-frame decode: each document's fixture video (a minimal
    length-prefixed container of 3-8 PNG frames) is demuxed, every
    frame fully PNG-decoded, and consecutive frames scored by integer
    L1 pixel delta; deltas above 6000 mark scene cuts (the
    frame-sampling signal a video curation pipeline keys on). Output
    is one row per asset: frame count, total/max delta, scene count.

    The oracle replays the fixture's closed-form pixel algebra
    (pixel(f,r,c) = (doc_id + 31*((f*f)%5) + 7r + 3c) % 251) without
    demuxing or decoding anything, so hash-equality proves the
    container walk AND every frame's decode end-to-end — completing
    the real-decode modality triad (image, audio, video).

    100 TB shape: one Arrow-batched map pass, one row per asset, zero
    shuffles."""
    from goeventstream_spark.operators import multimodal as mm

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return mm.video_scene_stats(mm.as_media_video(docs), change_threshold=6000)


@query(
    "image_resize_roundtrip",
    """
    WITH g AS (
      SELECT doc_id, 4 + doc_id % 29 AS w, 4 + (doc_id // 29) % 29 AS h
      FROM documents
    ),
    cells AS (
      SELECT doc_id, w, h, r.r AS r, c.c AS c
      FROM g, LATERAL (SELECT unnest(range((h // 2))) AS r) r,
              LATERAL (SELECT unnest(range((w // 2))) AS c) c
    ),
    resized AS (
      SELECT doc_id, w, h,
             (  (doc_id + 7 * (2 * r)     + 3 * (2 * c))     % 251
              + (doc_id + 7 * (2 * r)     + 3 * (2 * c + 1)) % 251
              + (doc_id + 7 * (2 * r + 1) + 3 * (2 * c))     % 251
              + (doc_id + 7 * (2 * r + 1) + 3 * (2 * c + 1)) % 251
             ) // 4 AS p
      FROM cells
    )
    SELECT doc_id,
           CAST(min(w) // 2 AS BIGINT) AS out_width,
           CAST(min(h) // 2 AS BIGINT) AS out_height,
           CAST(sum(p) AS BIGINT) AS px_sum
    FROM resized GROUP BY doc_id
    """,
)
def q_image_resize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize round trip: full PNG decode, exact-integer
    2x2 box downsample (output pixel = floor(mean of its box); odd
    edges dropped), re-encode as PNG, re-decode, and report the
    re-decoded pixel sum per asset — so oracle equality proves decode
    -> transform -> ENCODE -> decode, exercising the encoder's filter
    selection on executor workers, not just arithmetic. This is the
    'resize' step of the multimodal contract made real (resize_media
    documents the byte-level stub form).

    The oracle replays the fixture pixel algebra and the box mean in
    pure integer SQL (floor-division AFTER the integer sum — exact in
    both engines); it never touches the codec.

    100 TB shape: one Arrow-batched map pass, one row per asset, zero
    shuffles. out_bytes (compressed size) is available from the
    operator but excluded here: zlib stream length is not
    SQL-expressible."""
    from goeventstream_spark.operators import multimodal as mm

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return mm.resize_image_real(mm.as_media_png(docs)).select(
        "doc_id", "out_width", "out_height", "px_sum"
    )


@query(
    "video_keyframe_sample",
    """
    WITH g AS (SELECT doc_id, 3 + doc_id % 6 AS nf FROM documents),
    fr AS (SELECT doc_id, nf, unnest(range(nf)) AS f FROM g),
    px AS (
      SELECT doc_id, f, r.r AS r, c.c AS c,
             (doc_id + 31 * ((f * f) % 5) + 7 * r.r + 3 * c.c) % 251 AS p
      FROM fr, (SELECT unnest(range(8)) AS r) r,
               (SELECT unnest(range(8)) AS c) c
    ),
    sums AS (SELECT doc_id, f, sum(p) AS px_sum FROM px GROUP BY doc_id, f),
    d AS (
      SELECT a.doc_id, a.f, sum(abs(a.p - b.p)) AS delta
      FROM px a JOIN px b
        ON a.doc_id = b.doc_id AND a.r = b.r AND a.c = b.c AND b.f = a.f - 1
      GROUP BY a.doc_id, a.f
    )
    SELECT s.doc_id, CAST(s.f AS BIGINT) AS frame_idx,
           CAST(s.px_sum AS BIGINT) AS frame_px_sum
    FROM sums s LEFT JOIN d USING (doc_id, f)
    WHERE s.f = 0 OR d.delta > 6000
    """,
)
def q_video_keyframe_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyframe extraction with REAL per-frame decode: demux each
    asset's container, decode every frame, keep frame 0 plus every
    scene cut (L1 delta to the predecessor > 6000), and report each
    keyframe's decoded pixel sum — the frame-sample step a video
    curation pipeline feeds to downstream vision models, with
    data-dependent output cardinality (scenes, not frames). Oracle
    replays the closed-form pixel algebra; equality proves the demux,
    every frame's decode, and the cut rule.

    100 TB shape: one Arrow-batched map pass, zero shuffles."""
    from goeventstream_spark.operators import multimodal as mm

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return mm.video_keyframes(mm.as_media_video(docs), change_threshold=6000)
