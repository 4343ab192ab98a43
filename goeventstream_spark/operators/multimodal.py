"""Multimodal-column operators (SURVEY.md §2b group 3): images/audio/
video travel as opaque ``binary`` columns with typed metadata. The
Spark-side plumbing — schema, Arrow batching, mapInPandas signatures,
partition-preserving flow — is real and tested. Image decode is REAL
for PNG payloads (functions/png.py: pure-stdlib zlib+struct codec with
CRC verification and full filter reconstruction); other media formats
(JPEG, audio, video) would need external libraries and keep the
deterministic fake path as the tested stand-in.

Design notes for 100 TB media lakes:
- binary payloads stay columnar end-to-end (parquet BYTE_ARRAY ->
  Arrow LargeBinary -> pandas bytes); never base64 strings.
- mapInPandas (not a scalar pandas UDF) so one input batch can emit a
  different number of rows (frame sampling explodes, filtering drops).
- maxRecordsPerBatch bounds executor memory per Arrow batch — media
  rows are fat, so the session factory sets it explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from goeventstream_spark.sources.tables import scan_fanout_for

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("content", BinaryType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def as_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Fixture adapter: lift a text column into the binary media
    envelope (utf-8 bytes stand in for image payloads).

    Round 10: per-operator scan fan-out on the id (VERDICT r9 #2 —
    replaces the round-9 load-time documents fan-out): every consumer
    runs a Python (Arrow) pass over the payloads, which an undersized
    single-split scan would serialize on one worker."""
    docs = scan_fanout_for(docs, id_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.lit("image/fake").alias("media_type"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
    )


def as_media_png(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter producing REAL image payloads: one deterministic
    PNG per doc (functions/png.fixture_png — dimensions and pixel
    values are SQL-expressible functions of doc_id, so a decode of the
    output is DuckDB-oracle-checkable). Encode runs map-side in Arrow
    batches; the codec module ships by value (see _ship_codec).
    Round 10: per-operator scan fan-out on the id (VERDICT r9 #2) so
    the PNG encode pass parallelizes over an undersized input. The
    floor is 4 KiB, not the 256 KiB table default: the input is an
    id-only projection (tiny size estimate) while the per-row encode
    cost is payload-scale — the gate must key on having enough rows to
    spread, not on input bytes."""
    docs = scan_fanout_for(docs, id_col, min_bytes=4 << 10)
    _ship_codec()
    from goeventstream_spark.functions import png as _png

    def _gen(batches):
        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": "image/png",
                    "content": [_png.fixture_png(int(d)) for d in pdf[id_col]],
                }
            )

    return docs.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        _gen, MEDIA_SCHEMA
    )


def _ship_codec() -> None:
    """Register functions/png.py for pickle-by-value with pyspark's
    cloudpickle: closures referencing the codec then carry its code to
    executor Python workers even when the workers cannot import the
    package (driver launched from a foreign cwd in local mode). On a
    real cluster the package wheel goes via --py-files and this is a
    harmless no-op."""
    from pyspark import cloudpickle as _cp

    from goeventstream_spark.functions import png as _png

    _cp.register_pickle_by_value(_png)


def decode_image(content: bytes) -> tuple[int, int, int, bytes]:
    """True media decode for PNG payloads: returns (width, height,
    color_type, raw pixels). Pure stdlib — see functions/png.py. Other
    container formats would be dispatched here on magic bytes."""
    from goeventstream_spark.functions.png import decode_png

    return decode_png(content)


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Per-asset feature extraction via mapInPandas: Arrow batches in,
    Arrow batches out, grouped-free (pure map side — preserves input
    partitioning, no shuffle). ``fake=True`` derives pseudo-dimensions
    from the content hash (any payload); ``fake=False`` REALLY decodes
    the payload as PNG (width/height from a full CRC-checked decode,
    not a header peek) and nulls the dimensions of undecodable
    payloads."""

    if fake:
        # The closure must be SELF-CONTAINED (imports inside, no module
        # globals): cloudpickle otherwise pickles it by reference to
        # this module, and executor Python workers — which don't share
        # the driver's sys.path — fail with ModuleNotFoundError.
        def _extract(batches):
            import hashlib as _hashlib

            import pandas as _pd

            for pdf in batches:
                rows = []
                for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                    if content is None:
                        # NULL payload: null features, never a task crash
                        rows.append((doc_id, None, None, None, None))
                        continue
                    data = bytes(content)
                    digest = _hashlib.md5(data).hexdigest()
                    w, h = 64 + int(digest[0:2], 16), 64 + int(digest[2:4], 16)
                    rows.append((doc_id, len(data), digest, w, h))
                yield _pd.DataFrame(
                    rows,
                    columns=["doc_id", "n_bytes", "content_md5", "width", "height"],
                )

        return media.mapInPandas(_extract, FEATURE_SCHEMA)

    _ship_codec()
    from goeventstream_spark.functions import png as _png

    def _extract_real(batches):
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                if content is None:
                    rows.append((doc_id, None, None, None, None))
                    continue
                data = bytes(content)
                digest = _hashlib.md5(data).hexdigest()
                try:
                    w, h, _ct, _px = _png.decode_png(data)
                except ValueError:
                    w = h = None  # undecodable: null dims, never a crash
                rows.append((doc_id, len(data), digest, w, h))
            yield _pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "content_md5", "width", "height"]
            )

    return media.mapInPandas(_extract_real, FEATURE_SCHEMA)


def decode_stats(media: DataFrame) -> DataFrame:
    """Full-decode statistics per asset: width/height and the SUM of
    raw pixel samples — a value only obtainable by actually inflating
    the IDAT stream and reconstructing every row filter, which makes
    the decode path itself oracle-checkable against the fixture_png
    closed-form pixel function."""
    _ship_codec()
    from goeventstream_spark.functions import png as _png

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", LongType()),
            StructField("height", LongType()),
            StructField("px_sum", LongType()),
        ]
    )

    def _stats(batches):
        import pandas as _pd

        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                if content is None:
                    rows.append((doc_id, None, None, None))
                    continue
                try:
                    w, h, _ct, px = _png.decode_png(bytes(content))
                    rows.append((doc_id, w, h, sum(px)))
                except ValueError:
                    rows.append((doc_id, None, None, None))
            yield _pd.DataFrame(rows, columns=["doc_id", "width", "height", "px_sum"])

    return media.mapInPandas(_stats, schema)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame-sampling shape: one input asset -> many output "frames"
    (here: one synthetic frame per ``every_n_bytes`` chunk). Exercises
    the 1->N row expansion contract of mapInPandas that real video
    frame extraction needs."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_no", LongType()),
            StructField("frame_md5", StringType()),
        ]
    )

    def _sample(batches):  # self-contained: see extract_features note
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                if content is None:
                    continue  # NULL payload: no frames, never a crash
                data = bytes(content)
                for i, off in enumerate(range(0, len(data), every_n_bytes)):
                    chunk = data[off : off + every_n_bytes]
                    rows.append((doc_id, i, _hashlib.md5(chunk).hexdigest()))
            yield _pd.DataFrame(rows, columns=["doc_id", "frame_no", "frame_md5"])

    return media.mapInPandas(_sample, schema)


def resize_media(media: DataFrame, target_bytes: int = 256) -> DataFrame:
    """Resize shape: binary in -> binary out with updated metadata.
    True image resampling is stubbed (no imaging lib — decode_image is
    the extension point); the deterministic stand-in truncates payloads,
    which exercises the real contract: binary->binary mapInPandas with
    a typed metadata struct, 1:1 rows, partition-preserving."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media_type", StringType()),
            StructField("content", BinaryType()),
            StructField("orig_bytes", LongType()),
            StructField("new_bytes", LongType()),
        ]
    )

    def _resize(batches):  # self-contained: see extract_features note
        import pandas as _pd

        for pdf in batches:
            rows = []
            for doc_id, mt, content in zip(
                pdf["doc_id"], pdf["media_type"], pdf["content"]
            ):
                if content is None:
                    rows.append((doc_id, mt, None, None, None))
                    continue
                data = bytes(content)
                out = data[:target_bytes]
                rows.append((doc_id, mt, out, len(data), len(out)))
            yield _pd.DataFrame(
                rows,
                columns=["doc_id", "media_type", "content", "orig_bytes", "new_bytes"],
            )

    return media.mapInPandas(_resize, schema)


def _ship_wav_codec() -> None:
    """Same pickle-by-value shipping as _ship_codec, for the audio
    codec module."""
    from pyspark import cloudpickle as _cp

    from goeventstream_spark.functions import wav as _wav

    _cp.register_pickle_by_value(_wav)


def as_media_wav(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter producing REAL audio payloads: one deterministic
    16-bit PCM WAV clip per doc (functions/wav.fixture_wav — rate,
    length, and sample values are SQL-expressible functions of doc_id,
    so a decode of the output is DuckDB-oracle-checkable). Encode runs
    map-side in Arrow batches. Round 10: per-operator scan fan-out on
    the id (VERDICT r9 #2) so the WAV encode pass parallelizes over an
    undersized input (4 KiB floor — id-only input, payload-scale
    per-row encode; see as_media_png)."""
    docs = scan_fanout_for(docs, id_col, min_bytes=4 << 10)
    _ship_wav_codec()
    from goeventstream_spark.functions import wav as _wav

    def _gen(batches):
        import pandas as _pd

        for pdf in batches:
            yield _pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": "audio/wav",
                    "content": [_wav.fixture_wav(int(d)) for d in pdf[id_col]],
                }
            )

    return docs.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        _gen, MEDIA_SCHEMA
    )


def decode_audio(content: bytes) -> tuple[int, int, list[int]]:
    """True media decode for WAV payloads: returns (sample_rate,
    channels, samples). Pure stdlib — see functions/wav.py."""
    from goeventstream_spark.functions.wav import decode_wav

    return decode_wav(content)


def decode_audio_stats(media: DataFrame) -> DataFrame:
    """Full-decode audio statistics per asset: sample rate, sample
    count, peak absolute amplitude, and the sum of absolute sample
    values — values only obtainable by actually walking the RIFF
    chunks and unpacking the signed PCM stream, which makes the decode
    path itself oracle-checkable against the fixture_wav closed-form
    sample function. Undecodable payloads null out (same quarantine
    contract as the image path)."""
    _ship_wav_codec()
    from goeventstream_spark.functions import wav as _wav

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("sample_rate", LongType()),
            StructField("n_samples", LongType()),
            StructField("peak_amp", LongType()),
            StructField("abs_sum", LongType()),
        ]
    )

    def _stats(batches):
        import pandas as _pd

        for pdf in batches:
            rows = []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                if content is None:
                    rows.append((doc_id, None, None, None, None))
                    continue
                try:
                    rate, _ch, samples = _wav.decode_wav(bytes(content))
                    rows.append(
                        (
                            doc_id,
                            rate,
                            len(samples),
                            max((abs(s) for s in samples), default=0),
                            sum(abs(s) for s in samples),
                        )
                    )
                except ValueError:
                    rows.append((doc_id, None, None, None, None))
            yield _pd.DataFrame(
                rows,
                columns=["doc_id", "sample_rate", "n_samples", "peak_amp", "abs_sum"],
            )

    return media.mapInPandas(_stats, schema)


AHASH_SEG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("hi", LongType()),
        StructField("lo", LongType()),
        StructField("seg_id", LongType()),
        StructField("seg_val", LongType()),
    ]
)


def ahash_segments(media: DataFrame) -> DataFrame:
    """Perceptual average-hash (aHash) of REAL decoded image payloads,
    emitted in pigeonhole-segment form for exact near-dup joins.

    Per asset: a full CRC-checked PNG decode (functions/png.py), an
    8x8 nearest-neighbor downsample (sample at r_i = i*h//8,
    c_j = j*w//8 — the classic aHash resize), then bit (i,j) = 1 iff
    the sampled pixel >= the 64-sample mean. The mean compare is
    CROSS-MULTIPLIED integer math (p*64 >= sum), so the hash is exact
    and engine-independent. The 64 bits travel as two 32-bit BIGINTs
    (hi, lo) — never a single 64-bit value, whose sign bit would make
    shift/sum construction engine-dependent — plus three ~22-bit
    pigeonhole segments: two hashes within hamming distance <= 2 must
    agree on at least one of 3 segments, so a segment equi-join has
    exact recall for that radius (same theorem as the SimHash
    operator, wider segments because gradient-like images collide
    heavily on 8-bit segments).

    100 TB anatomy: decode + hash is one Arrow-batched map pass (3
    output rows per asset); the only shuffle downstream is the
    segment equi-join, whose volume is collision-bounded."""
    _ship_codec()
    from goeventstream_spark.functions import png as _png

    # bind through the shipped-by-value module (see _ship_codec): an
    # import inside the closure would pickle by reference and die with
    # ModuleNotFoundError on executors launched from a foreign cwd.
    _dec = _png.decode_png

    def _hash(batches):
        import pandas as _pd

        out = {"doc_id": [], "hi": [], "lo": [], "seg_id": [], "seg_val": []}
        for pdf in batches:
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                w, h, _ct, px = _dec(bytes(content))
                sampled = [
                    px[(i * h // 8) * w + (j * w // 8)]
                    for i in range(8)
                    for j in range(8)
                ]
                total = sum(sampled)
                bits = [1 if p * 64 >= total else 0 for p in sampled]
                hi = sum(b << (31 - pos) for pos, b in enumerate(bits[:32]))
                lo = sum(b << (31 - pos) for pos, b in enumerate(bits[32:]))
                for seg_id in range(3):
                    seg = bits[seg_id * 22 : seg_id * 22 + 22]
                    seg_val = sum(
                        b << (21 - k) for k, b in enumerate(seg)
                    )
                    out["doc_id"].append(int(doc_id))
                    out["hi"].append(hi)
                    out["lo"].append(lo)
                    out["seg_id"].append(seg_id)
                    out["seg_val"].append(seg_val)
            yield _pd.DataFrame(out)
            out = {k: [] for k in out}

    return media.mapInPandas(_hash, AHASH_SEG_SCHEMA)


def ahash_neardup_pairs(media: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Exact perceptual near-dup pairs: segment equi-join (recall 1
    for hamming <= 2 by pigeonhole over the 3 segments), then the
    exact hamming verify via xor + bit_count on the (hi, lo) halves.
    Returns (doc_a, doc_b, hamming)."""
    if max_hamming > 2:
        raise ValueError(
            "ahash_neardup_pairs: 3 segments guarantee exact recall "
            f"only for hamming <= 2, got {max_hamming}"
        )
    # materialize once: both self-join sides consume the segment table,
    # and the executed plan showed ReuseExchange does NOT fire across
    # the aliased sides — without this the decode+hash Python pass runs
    # twice per execution (round-9 opt: 2.65 s -> measured below /
    # OPTIMIZATION_r09.md; guide §4 — don't recompute the expensive
    # Python boundary)
    segs = ahash_segments(media).localCheckpoint(eager=False)
    a = segs.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hi").alias("hi_a"),
        F.col("lo").alias("lo_a"),
        "seg_id",
        "seg_val",
    )
    b = segs.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hi").alias("hi_b"),
        F.col("lo").alias("lo_b"),
        "seg_id",
        "seg_val",
    )
    cand = (
        a.join(b, ["seg_id", "seg_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "hi_a", "lo_a", "hi_b", "lo_b")
        .distinct()
    )
    ham = F.expr("bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)")
    return cand.select(
        "doc_a", "doc_b", ham.cast("long").alias("hamming")
    ).where(F.col("hamming") <= max_hamming)


AUDIO_SEG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("hv", LongType()),
        StructField("seg_id", LongType()),
        StructField("seg_val", LongType()),
    ]
)


def audio_envelope_segments(media: DataFrame) -> DataFrame:
    """Energy-envelope fingerprint of REAL decoded audio payloads in
    pigeonhole-segment form — the audio sibling of :func:`ahash_segments`.

    Per clip: a full WAV decode (functions/wav.py), 32 floor-bucketed
    frames (sample i lands in frame i*32//n), per-frame energy =
    integer sum of |sample|, then bit f = 1 iff the frame's energy is
    >= the clip mean (cross-multiplied: e*32 >= total — exact integer
    math, engine-independent). The 32-bit signature travels as ONE
    BIGINT < 2^32 (sign-safe) plus three ~11-bit pigeonhole segments:
    hamming <= 2 forces agreement on at least one segment, so the
    segment equi-join has exact recall for that radius.

    100 TB anatomy: decode + fingerprint is one Arrow-batched map pass
    (3 output rows per clip); the only shuffle downstream is the
    collision-bounded segment equi-join."""
    _ship_wav_codec()
    from goeventstream_spark.functions import wav as _wav

    # bind through the shipped-by-value module — an import inside the
    # closure would pickle by reference and die on foreign-cwd workers.
    _dec = _wav.decode_wav

    def _fp(batches):
        import pandas as _pd

        out = {"doc_id": [], "hv": [], "seg_id": [], "seg_val": []}
        for pdf in batches:
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                _rate, _ch, samples = _dec(bytes(content))
                n = len(samples)
                energy = [0] * 32
                for i, s in enumerate(samples):
                    energy[i * 32 // n] += abs(s)
                total = sum(energy)
                bits = [1 if e * 32 >= total else 0 for e in energy]
                hv = sum(b << (31 - pos) for pos, b in enumerate(bits))
                for seg_id in range(3):
                    seg = bits[seg_id * 11 : seg_id * 11 + 11]
                    seg_val = sum(b << (10 - k) for k, b in enumerate(seg))
                    out["doc_id"].append(int(doc_id))
                    out["hv"].append(hv)
                    out["seg_id"].append(seg_id)
                    out["seg_val"].append(seg_val)
            yield _pd.DataFrame(out)
            out = {k: [] for k in out}

    return media.mapInPandas(_fp, AUDIO_SEG_SCHEMA)


def audio_envelope_neardup_pairs(media: DataFrame, max_hamming: int = 2) -> DataFrame:
    """Exact audio near-dup pairs: segment equi-join (recall 1 for
    hamming <= 2 by pigeonhole over the 3 segments), exact hamming
    verify via xor + bit_count. Returns (doc_a, doc_b, hamming)."""
    if max_hamming > 2:
        raise ValueError(
            "audio_envelope_neardup_pairs: 3 segments guarantee exact "
            f"recall only for hamming <= 2, got {max_hamming}"
        )
    # materialize once: same non-firing ReuseExchange story as
    # ahash_neardup_pairs — without this the WAV decode pass runs twice
    segs = audio_envelope_segments(media).localCheckpoint(eager=False)
    a = segs.select(
        F.col("doc_id").alias("doc_a"), F.col("hv").alias("hv_a"),
        "seg_id", "seg_val",
    )
    b = segs.select(
        F.col("doc_id").alias("doc_b"), F.col("hv").alias("hv_b"),
        "seg_id", "seg_val",
    )
    cand = (
        a.join(b, ["seg_id", "seg_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "hv_a", "hv_b")
        .distinct()
    )
    return cand.select(
        "doc_a",
        "doc_b",
        F.expr("bit_count(hv_a ^ hv_b)").cast("long").alias("hamming"),
    ).where(F.col("hamming") <= max_hamming)


VIDEO_SCENE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_frames", LongType()),
        StructField("total_delta", LongType()),
        StructField("max_frame_delta", LongType()),
        StructField("n_scene_changes", LongType()),
    ]
)


def _pack_video(frames: list[bytes]) -> bytes:
    """Minimal deterministic video container: 4-byte big-endian frame
    count, then per frame a 4-byte big-endian length + the full PNG
    payload. A stand-in for a real container format (MP4/MKV need
    external demuxers); the per-frame codec work is REAL PNG decode."""
    import struct

    out = [struct.pack(">I", len(frames))]
    for fb in frames:
        out.append(struct.pack(">I", len(fb)))
        out.append(fb)
    return b"".join(out)


def _unpack_video(data: bytes) -> list[bytes]:
    import struct

    (n,) = struct.unpack_from(">I", data, 0)
    off = 4
    frames = []
    for _ in range(n):
        (ln,) = struct.unpack_from(">I", data, off)
        off += 4
        frames.append(data[off : off + ln])
        off += ln
    if off != len(data):
        raise ValueError("video container has trailing bytes")
    return frames


def as_media_video(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fixture adapter producing multi-frame video payloads with REAL
    per-frame PNG encoding: 3 + doc_id % 6 grayscale 8x8 frames whose
    pixels are the SQL-expressible function

        pixel(f, r, c) = (doc_id + 31*((f*f) % 5) + 7r + 3c) % 251

    — the (f*f) % 5 term makes inter-frame deltas non-uniform, so
    scene-change detection has real structure to find. Round 10:
    per-operator scan fan-out on the id (VERDICT r9 #2) so the
    multi-frame PNG encode parallelizes over an undersized input
    (4 KiB floor — id-only input, payload-scale per-row encode; see
    as_media_png)."""
    docs = scan_fanout_for(docs, id_col, min_bytes=4 << 10)
    _ship_codec()
    from goeventstream_spark.functions import png as _png

    _enc = _png.encode_png

    def _gen(batches):
        # container packing is inlined: a module-global helper would
        # pickle the closure by reference to this module and die on
        # foreign-cwd workers (only _enc ships by value via _ship_codec)
        import struct as _struct

        import pandas as _pd

        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                frames = []
                for f in range(3 + d % 6):
                    px = bytes(
                        (d + 31 * ((f * f) % 5) + 7 * r + 3 * c) % 251
                        for r in range(8)
                        for c in range(8)
                    )
                    frames.append(_enc(8, 8, px, color_type=0))
                parts = [_struct.pack(">I", len(frames))]
                for fb in frames:
                    parts.append(_struct.pack(">I", len(fb)))
                    parts.append(fb)
                payloads.append(b"".join(parts))
            yield _pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": "video/x-png-frames",
                    "content": payloads,
                }
            )

    return docs.select(F.col(id_col).cast("long").alias(id_col)).mapInPandas(
        _gen, MEDIA_SCHEMA
    )


def video_scene_stats(media: DataFrame, change_threshold: int = 6000) -> DataFrame:
    """Scene-change detection over REAL decoded video frames: demux the
    container, fully PNG-decode every frame, and score consecutive
    frames by the integer L1 pixel delta — a frame whose delta exceeds
    ``change_threshold`` starts a new scene. Returns per asset:
    n_frames, total_delta, max_frame_delta, n_scene_changes.

    All-integer math end-to-end, so the output is exactly
    oracle-replayable from the fixture's closed-form pixel function
    (the oracle never demuxes or decodes — equality proves BOTH the
    container walk and every frame's decode).

    100 TB anatomy: one Arrow-batched map pass, one output row per
    asset, zero shuffles (the consumer aggregates as it likes)."""
    _ship_codec()
    from goeventstream_spark.functions import png as _png

    _dec = _png.decode_png

    def _stats(batches):
        # demux inlined for the same pickle-by-reference reason as _gen
        import struct as _struct

        import pandas as _pd

        def _unpack(data):
            (n,) = _struct.unpack_from(">I", data, 0)
            off = 4
            frames = []
            for _ in range(n):
                (ln,) = _struct.unpack_from(">I", data, off)
                off += 4
                frames.append(data[off : off + ln])
                off += ln
            if off != len(data):
                raise ValueError("video container has trailing bytes")
            return frames

        out = {
            "doc_id": [],
            "n_frames": [],
            "total_delta": [],
            "max_frame_delta": [],
            "n_scene_changes": [],
        }
        for pdf in batches:
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                frames = _unpack(bytes(content))
                pixels = []
                for fb in frames:
                    _w, _h, _ct, px = _dec(fb)
                    pixels.append(px)
                total = mx = changes = 0
                for prev, cur in zip(pixels, pixels[1:]):
                    delta = sum(abs(a - b) for a, b in zip(cur, prev))
                    total += delta
                    mx = max(mx, delta)
                    if delta > change_threshold:
                        changes += 1
                out["doc_id"].append(int(doc_id))
                out["n_frames"].append(len(frames))
                out["total_delta"].append(total)
                out["max_frame_delta"].append(mx)
                out["n_scene_changes"].append(changes)
            yield _pd.DataFrame(out)
            out = {k: [] for k in out}

    return media.mapInPandas(_stats, VIDEO_SCENE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("out_width", LongType()),
        StructField("out_height", LongType()),
        StructField("out_bytes", LongType()),
        StructField("px_sum", LongType()),
    ]
)


def resize_image_real(media: DataFrame) -> DataFrame:
    """REAL image resize: full PNG decode, 2x2 box downsample in exact
    integer math (each output pixel = floor(mean of its 2x2 box); odd
    edge rows/columns are dropped, so out_w = w//2, out_h = h//2),
    then RE-ENCODE as PNG and RE-DECODE the result — px_sum is summed
    from the re-decoded bytes, so oracle equality proves the decode ->
    transform -> encode -> decode round trip, not just the arithmetic.
    The real-pixel upgrade of :func:`resize_media` (which documents
    the byte-level stub contract).

    100 TB anatomy: one Arrow-batched map pass, one output row per
    asset (in production you would emit the resized payload itself;
    the stats row is what the oracle can check), zero shuffles."""
    _ship_codec()
    from goeventstream_spark.functions import png as _png

    _dec = _png.decode_png
    _enc = _png.encode_png

    def _resize(batches):
        import pandas as _pd

        out = {
            "doc_id": [],
            "out_width": [],
            "out_height": [],
            "out_bytes": [],
            "px_sum": [],
        }
        for pdf in batches:
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                w, h, _ct, px = _dec(bytes(content))
                ow, oh = w // 2, h // 2
                small = bytes(
                    (
                        px[(2 * r) * w + 2 * c]
                        + px[(2 * r) * w + 2 * c + 1]
                        + px[(2 * r + 1) * w + 2 * c]
                        + px[(2 * r + 1) * w + 2 * c + 1]
                    )
                    // 4
                    for r in range(oh)
                    for c in range(ow)
                )
                payload = _enc(ow, oh, small, color_type=0)
                w2, h2, _ct2, px2 = _dec(payload)
                out["doc_id"].append(int(doc_id))
                out["out_width"].append(w2)
                out["out_height"].append(h2)
                out["out_bytes"].append(len(payload))
                out["px_sum"].append(sum(px2))
            yield _pd.DataFrame(out)
            out = {k: [] for k in out}

    return media.mapInPandas(_resize, RESIZE_SCHEMA)


KEYFRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame_px_sum", LongType()),
    ]
)


def video_keyframes(media: DataFrame, change_threshold: int = 6000) -> DataFrame:
    """REAL frame sampling: demux the video container, fully decode
    every frame, and emit one row per KEYFRAME — frame 0 plus every
    frame whose integer L1 delta to its predecessor exceeds
    ``change_threshold`` (the scene-cut rule of
    :func:`video_scene_stats`). Each emitted row carries the frame's
    decoded pixel sum, a value only obtainable by actually inflating
    and reconstructing that frame — so the per-keyframe output is
    oracle-checkable end-to-end. This is the frame-sample step of the
    multimodal contract made real (:func:`frame_sample` documents the
    byte-level stub form); a production pipeline would emit the frame
    payload itself alongside.

    100 TB anatomy: one Arrow-batched map pass whose output cardinality
    is data-dependent (scene count, not frame count) — exactly why
    mapInPandas rather than a scalar UDF; zero shuffles."""
    _ship_codec()
    from goeventstream_spark.functions import png as _png

    _dec = _png.decode_png

    def _keyframes(batches):
        import struct as _struct

        import pandas as _pd

        def _unpack(data):
            (n,) = _struct.unpack_from(">I", data, 0)
            off = 4
            frames = []
            for _ in range(n):
                (ln,) = _struct.unpack_from(">I", data, off)
                off += 4
                frames.append(data[off : off + ln])
                off += ln
            if off != len(data):
                raise ValueError("video container has trailing bytes")
            return frames

        out = {"doc_id": [], "frame_idx": [], "frame_px_sum": []}
        for pdf in batches:
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                pixels = [
                    _dec(fb)[3] for fb in _unpack(bytes(content))
                ]
                for f, px in enumerate(pixels):
                    if f == 0:
                        keep = True
                    else:
                        delta = sum(
                            abs(a - b) for a, b in zip(px, pixels[f - 1])
                        )
                        keep = delta > change_threshold
                    if keep:
                        out["doc_id"].append(int(doc_id))
                        out["frame_idx"].append(f)
                        out["frame_px_sum"].append(sum(px))
            yield _pd.DataFrame(out)
            out = {k: [] for k in out}

    return media.mapInPandas(_keyframes, KEYFRAME_SCHEMA)
