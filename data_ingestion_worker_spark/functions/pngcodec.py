"""Dependency-free PNG codec (8-bit, non-interlaced).

PNG is DEFLATE-compressed (RFC 1950/2083) and Python ships ``zlib``, so
— unlike JPEG/MP4 — a complete, correct decoder needs no third-party
dependency.  This widens the real-codec matrix (BMP/PPM stills, PCM
WAV, DIB AVI) to the dominant lossless web image format the reference
would fetch from S3 (src/services/s3_service.py:57-63).

Supported (the overwhelmingly common profile): bit depth 8, color types
0 (grayscale), 2 (truecolor RGB), 3 (palette) and 6 (RGBA), interlace
0, all five scanline filters (None/Sub/Up/Average/Paeth), chunk CRCs
verified.  Exotic profiles (1/2/4/16-bit depths, Adam7 interlace,
ancillary transforms) raise ``ValueError`` — the caller's
corrupt-payload path (NULL metadata, reference T10) handles them like
any undecodable input.

Decoders return top-to-bottom RGB/RGBA bytes exactly like
``imagecodec.DecodedImage``; ``encode_png`` (truecolor, filter 0)
exists so tests and round-trip queries can build real fixtures
in-container.  Runs per-payload inside Arrow-batched ``mapInPandas``
stages; nothing here touches Spark.
"""

from __future__ import annotations

import struct
import zlib

from .imagecodec import DecodedImage

PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: Decompression-bomb guard (the Pillow MAX_IMAGE_PIXELS idea): a tiny
#: payload may not declare a multi-gigabyte geometry and have the
#: executor allocate it.  64M pixels ≈ 256 MB RGBA — beyond any sane
#: per-row media payload in a mapInPandas batch.
MAX_PIXELS = 1 << 26

#: color type -> bytes per pixel in the filtered scanlines
_CHANNELS = {0: 1, 2: 3, 3: 1, 6: 4}
_MODES = {0: "L", 2: "RGB", 3: "P", 6: "RGBA"}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _chunks(payload: bytes):
    pos = len(PNG_SIG)
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("PNG: truncated chunk header")
        (ln,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + ln]
        crc = payload[pos + 8 + ln:pos + 12 + ln]
        if len(data) != ln or len(crc) != 4:
            raise ValueError("PNG: truncated chunk body")
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != \
                struct.unpack(">I", crc)[0]:
            raise ValueError("PNG: chunk CRC mismatch")
        yield ctype, data
        pos += 12 + ln
        if ctype == b"IEND":
            return
    raise ValueError("PNG: missing IEND")


def decode_png(payload: bytes) -> DecodedImage:
    """Decode a non-interlaced 8-bit PNG to top-to-bottom RGB/RGBA."""
    if payload[:8] != PNG_SIG:
        raise ValueError("PNG: bad signature")
    ihdr = None
    plte: bytes | None = None
    idat = bytearray()
    for ctype, data in _chunks(payload):
        if ctype == b"IHDR":
            if ihdr is not None or len(data) != 13:
                raise ValueError("PNG: bad IHDR")
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
    if ihdr is None:
        raise ValueError("PNG: no IHDR")
    w, h, depth, ctype_n, comp, filt, interlace = ihdr
    if w <= 0 or h <= 0:
        raise ValueError("PNG: bad dimensions")
    if w * h > MAX_PIXELS:
        raise ValueError("PNG: declared geometry exceeds MAX_PIXELS")
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError("PNG: unsupported profile")
    if ctype_n not in _CHANNELS:
        raise ValueError(f"PNG: unsupported color type {ctype_n}")

    bpp = _CHANNELS[ctype_n]
    stride = w * bpp
    expected = h * (stride + 1)
    # Bound the inflate to the declared geometry BEFORE allocating: a
    # crafted tiny payload must not be able to balloon to gigabytes
    # inside an executor (decompression bomb) — it fails the length
    # check as a ValueError like any other corrupt row.
    try:
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), expected + 1)
    except zlib.error as e:
        raise ValueError(f"PNG: bad IDAT stream ({e})") from e
    if len(raw) != expected or d.unconsumed_tail:
        raise ValueError("PNG: decompressed size != h*(1+stride)")

    prev = bytearray(stride)
    planes = bytearray()
    for row in range(h):
        base = row * (stride + 1)
        ft = raw[base]
        line = bytearray(raw[base + 1:base + 1 + stride])
        if ft == 1:    # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ft != 0:
            raise ValueError(f"PNG: unknown filter type {ft}")
        planes += line
        prev = line

    if ctype_n == 0:       # grayscale -> RGB
        pixels = bytes(b for v in planes for b in (v, v, v))
    elif ctype_n == 3:     # palette -> RGB
        if plte is None or len(plte) % 3:
            raise ValueError("PNG: palette image without valid PLTE")
        out = bytearray()
        for idx in planes:
            if 3 * idx + 3 > len(plte):
                raise ValueError("PNG: palette index out of range")
            out += plte[3 * idx:3 * idx + 3]
        pixels = bytes(out)
    else:                  # RGB / RGBA pass through
        pixels = bytes(planes)
    return DecodedImage(w, h, _MODES[ctype_n], "PNG", pixels)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(width: int, height: int, rgb: bytes) -> bytes:
    """Encode top-to-bottom RGB bytes as a truecolor PNG (filter 0)."""
    if len(rgb) != width * height * 3:
        raise ValueError("encode_png: rgb length != width*height*3")
    stride = width * 3
    scan = b"".join(
        b"\x00" + rgb[r * stride:(r + 1) * stride] for r in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (PNG_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(scan))
            + _chunk(b"IEND", b""))
