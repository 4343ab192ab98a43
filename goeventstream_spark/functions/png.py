"""Pure-stdlib PNG codec (zlib + struct): the REAL media decode behind
operators/multimodal.py — no imaging library exists in this
environment, and none is needed for the PNG container itself, whose
spec (RFC 2083) is deflate + per-row byte filters.

Scope: 8-bit grayscale (color type 0) and truecolor (color type 2),
no interlace — enough to round-trip deterministic fixture images and
to prove a full decode path (chunk walk, CRC verification, inflate,
and all five filter reconstructions, including Average and Paeth).

This module is deliberately free of any pyspark/pandas imports so it
can be registered with cloudpickle's ``register_pickle_by_value`` and
shipped INSIDE closures to executor workers that cannot import the
package (foreign-cwd local mode; on a real cluster you would instead
ship the wheel via --py-files).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIG = b"\x89PNG\r\n\x1a\n"

_BPP = {0: 1, 2: 3}  # color type -> bytes per pixel at bit depth 8


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(width: int, height: int, pixels: bytes, color_type: int = 0) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``width*height*bpp`` bytes)
    as a valid PNG. Rows cycle through ALL five filter types
    (``r % 5``) so that any decoder consuming the output must implement
    full filter reconstruction — uniform images do NOT decode correctly
    with a header-peek or a None-filter-only reader."""
    bpp = _BPP[color_type]
    stride = width * bpp
    if len(pixels) != stride * height:
        raise ValueError(f"need {stride * height} pixel bytes, got {len(pixels)}")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        row = pixels[r * stride : (r + 1) * stride]
        f = r % 5
        raw.append(f)
        for i in range(stride):
            x = row[i]
            left = row[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                v = x
            elif f == 1:
                v = x - left
            elif f == 2:
                v = x - up
            elif f == 3:
                v = x - ((left + up) >> 1)
            else:
                v = x - _paeth(left, up, ul)
            raw.append(v & 0xFF)
        prev = row
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG: returns ``(width, height, color_type, pixels)``
    with pixels as raw row-major 8-bit samples. Verifies the signature
    and every chunk CRC, inflates the IDAT stream, and reconstructs all
    five row filters. Raises ValueError on anything malformed or
    outside the supported profile (8-bit gray/truecolor, no
    interlace)."""
    if data[:8] != PNG_SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = color_type = None
    idat = bytearray()
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length or pos + 12 + length > len(data):
            raise ValueError("truncated chunk payload")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r}")
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth != 8 or color_type not in _BPP or comp or filt or interlace:
                raise ValueError(
                    f"unsupported PNG profile: depth={depth} color={color_type}"
                )
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("missing IHDR")
    bpp = _BPP[color_type]
    stride = width * bpp
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # normalize: callers treat ValueError = undecodable
        raise ValueError(f"bad IDAT stream: {e}") from e
    if len(raw) != (stride + 1) * height:
        raise ValueError("inflated size mismatch")
    out = bytearray()
    prev = bytes(stride)
    for r in range(height):
        f = raw[r * (stride + 1)]
        line = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        for i in range(stride):
            left = line[i - bpp] if i >= bpp else 0
            up = prev[i]
            ul = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                pass
            elif f == 1:
                line[i] = (line[i] + left) & 0xFF
            elif f == 2:
                line[i] = (line[i] + up) & 0xFF
            elif f == 3:
                line[i] = (line[i] + ((left + up) >> 1)) & 0xFF
            elif f == 4:
                line[i] = (line[i] + _paeth(left, up, ul)) & 0xFF
            else:
                raise ValueError(f"bad filter type {f}")
        out.extend(line)
        prev = bytes(line)
    return width, height, color_type, bytes(out)


def fixture_png(doc_id: int) -> bytes:
    """Deterministic fixture image for doc_id: width/height/pixel values
    derived by SQL-expressible arithmetic so a DuckDB oracle can state
    the expected decode output without running the codec:

        width  = 4 + doc_id % 29
        height = 4 + (doc_id // 29) % 29
        pixel(r, c) = (doc_id + 7*r + 3*c) % 251

    The pixel gradient + the encoder's cycling row filters mean the
    decode genuinely exercises Sub/Up/Average/Paeth reconstruction.
    """
    w = 4 + doc_id % 29
    h = 4 + (doc_id // 29) % 29
    px = bytes(((doc_id + 7 * r + 3 * c) % 251) for r in range(h) for c in range(w))
    return encode_png(w, h, px, color_type=0)
