"""Pure-stdlib WAV (RIFF PCM) codec: the REAL audio decode behind
operators/multimodal.py — the audio sibling of functions/png.py. No
audio library exists in this environment, and none is needed for the
PCM container itself: RIFF is length-prefixed chunks and PCM samples
are little-endian integers (struct is the whole decoder).

Scope: 16-bit signed PCM, mono or stereo, uncompressed (format tag 1)
— enough to round-trip deterministic fixture clips and prove a full
container walk (RIFF/WAVE validation, fmt parsing with consistency
checks, odd-chunk padding, data extraction).

Deliberately free of pyspark/pandas imports so cloudpickle's
``register_pickle_by_value`` can ship it inside closures to executor
workers that cannot import the package (foreign-cwd local mode; a
real cluster ships the wheel via --py-files).
"""

from __future__ import annotations

import struct


def encode_wav(sample_rate: int, channels: int, samples: list[int]) -> bytes:
    """Encode 16-bit signed PCM samples (interleaved when stereo) as a
    valid RIFF/WAVE file. ``len(samples)`` must be a multiple of
    ``channels``."""
    if channels not in (1, 2):
        raise ValueError(f"channels={channels}: only mono/stereo supported")
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channel count")
    for s in samples:
        if not -32768 <= s <= 32767:
            raise ValueError(f"sample {s} outside int16 range")
    data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    body = b"WAVE" + _chunk(b"fmt ", fmt) + _chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _chunk(tag: bytes, payload: bytes) -> bytes:
    # RIFF chunks are word-aligned: odd payloads carry a pad byte that
    # is NOT counted in the chunk length.
    return tag + struct.pack("<I", len(payload)) + payload + (b"\0" if len(payload) % 2 else b"")


def decode_wav(data: bytes) -> tuple[int, int, list[int]]:
    """Decode a RIFF/WAVE PCM file: returns ``(sample_rate, channels,
    samples)`` with samples as interleaved signed ints. Validates the
    RIFF envelope, the fmt chunk's internal consistency (byte rate and
    block align must agree with rate/channels/width), and the data
    length. Raises ValueError on anything malformed or outside the
    16-bit PCM profile."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE header")
    (riff_len,) = struct.unpack("<I", data[4:8])
    if riff_len + 8 > len(data):
        raise ValueError("truncated RIFF payload")
    pos = 12
    rate = channels = None
    pcm = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (length,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        if tag == b"fmt ":
            if length < 16:
                raise ValueError("fmt chunk too short")
            fmt_tag, channels, rate, byte_rate, block_align, bits = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if fmt_tag != 1 or bits != 16 or channels not in (1, 2):
                raise ValueError(
                    f"unsupported WAV profile: fmt={fmt_tag} bits={bits} ch={channels}"
                )
            if block_align != channels * 2 or byte_rate != rate * block_align:
                raise ValueError("inconsistent fmt chunk")
        elif tag == b"data":
            pcm = payload
        pos += 8 + length + (length % 2)  # odd chunks carry a pad byte
    if rate is None:
        raise ValueError("missing fmt chunk")
    if pcm is None:
        raise ValueError("missing data chunk")
    if len(pcm) % (channels * 2):
        raise ValueError("data length not a multiple of the frame size")
    samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    return rate, channels, samples


def fixture_wav(doc_id: int) -> bytes:
    """Deterministic fixture clip for doc_id: rate/length/sample values
    derived by SQL-expressible arithmetic so a DuckDB oracle can state
    the expected decode output without running the codec:

        rate      = 8000 + (doc_id % 5) * 1000
        n_samples = 64 + doc_id % 193
        sample(i) = (doc_id * 31 + i * 17) % 4001 - 2000

    The sample ramp wraps through negative and positive int16 values,
    so abs/peak statistics genuinely exercise signed decoding.
    """
    rate = 8000 + (doc_id % 5) * 1000
    n = 64 + doc_id % 193
    samples = [(doc_id * 31 + i * 17) % 4001 - 2000 for i in range(n)]
    return encode_wav(rate, 1, samples)
