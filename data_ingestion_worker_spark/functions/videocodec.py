"""Dependency-free video codec: uncompressed (DIB) AVI parse/emit.

Completes the builtin media-codec trio (``imagecodec`` for stills,
``audiocodec`` for PCM audio): a real bytes-to-frames path for the one
video container that needs no compression library — RIFF ``AVI `` with
``00db`` device-independent-bitmap frames (24-bit BGR, bottom-up rows,
4-byte stride, i.e. exactly the BMP pixel-array layout).

``decode_avi`` walks the nested RIFF LIST structure (hdrl/strl/movi,
skipping JUNK/idx1 and other non-essential chunks), validates the
``avih``/``strh``/``strf`` headers against the BI_RGB 24-bit contract,
and returns header metadata plus every frame as top-to-bottom RGB bytes;
malformed input raises ``ValueError`` (row-level isolation upstream,
reference T10).  ``encode_avi`` emits a minimal spec-conformant file so
tests and the parity-gated round-trip query can build real fixtures
in-container.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

BI_RGB = 0


@dataclass(frozen=True)
class DecodedAvi:
    width: int
    height: int
    fps: int
    frames: tuple[bytes, ...]  # top-to-bottom RGB24, one entry per frame

    @property
    def n_frames(self) -> int:
        return len(self.frames)


def _stride(width: int) -> int:
    return ((24 * width + 31) // 32) * 4


def _dib_to_rgb(body: bytes, width: int, height: int) -> bytes:
    """Bottom-up padded BGR rows -> top-to-bottom RGB."""
    stride = _stride(width)
    if len(body) < stride * height:
        raise ValueError("AVI: truncated frame")
    rows = []
    for row in range(height):
        base = (height - 1 - row) * stride
        out = bytearray(width * 3)
        for x in range(width):
            b, g, r = body[base + 3 * x: base + 3 * x + 3]
            out[3 * x: 3 * x + 3] = (r, g, b)
        rows.append(bytes(out))
    return b"".join(rows)


def _rgb_to_dib(rgb: bytes, width: int, height: int) -> bytes:
    stride = _stride(width)
    pad = b"\x00" * (stride - width * 3)
    body = bytearray()
    for row in range(height - 1, -1, -1):
        for x in range(width):
            r, g, b = rgb[(row * width + x) * 3: (row * width + x) * 3 + 3]
            body += bytes((b, g, r))
        body += pad
    return bytes(body)


def _chunks(payload: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, size) walking a RIFF chunk sequence."""
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body = pos + 8
        if body + size > end:
            raise ValueError(f"AVI: truncated {cid!r} chunk")
        yield cid, body, size
        pos = body + size + (size & 1)


def decode_avi(payload: bytes) -> DecodedAvi:
    """Decode an uncompressed 24-bit DIB AVI."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        raise ValueError("AVI: bad magic")
    width = height = None
    rate = scale = None
    cur_stream = None  # fccType of the most recent strh ('vids'/'auds'/...)
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, rate, scale, cur_stream
        for cid, body, size in _chunks(payload, pos, end):
            if cid == b"LIST":
                walk(body + 4, body + size)  # skip the list-type fourcc
            elif cid == b"avih":
                if size < 56:
                    raise ValueError("AVI: avih too small")
                width, height = struct.unpack_from("<II", payload, body + 32)
            elif cid == b"strh":
                if size < 56:
                    raise ValueError("AVI: strh too small")
                cur_stream = payload[body:body + 4]
                if cur_stream != b"vids":
                    continue  # non-video stream header: ignore
                scale, rate = struct.unpack_from("<II", payload, body + 20)
            elif cid == b"strf":
                # strf describes the stream of the preceding strh; only
                # the video stream's format must meet the 24-bit BI_RGB
                # contract — an audio WAVEFORMATEX (16-18 bytes) is legal
                # and simply ignored.
                if cur_stream != b"vids":
                    continue
                if size < 40:
                    raise ValueError("AVI: strf too small")
                bits, compression = struct.unpack_from("<HI", payload,
                                                       body + 14)
                if compression != BI_RGB or bits != 24:
                    raise ValueError(
                        f"AVI: unsupported strf (bits={bits}, "
                        f"compression={compression})")
            elif cid in (b"00db", b"00dc"):
                if width is None:
                    raise ValueError("AVI: frame before headers")
                frames.append(_dib_to_rgb(payload[body:body + size],
                                          width, height))
            # JUNK / idx1 / unknown chunks: skipped

    walk(12, len(payload))
    if width is None or height is None:
        raise ValueError("AVI: missing avih header")
    if width < 1 or height < 1:
        raise ValueError("AVI: bad dimensions")
    if not frames:
        raise ValueError("AVI: no frames")
    if not rate or not scale:
        raise ValueError("AVI: missing video stream header")
    return DecodedAvi(width, height, rate // scale, tuple(frames))


def encode_avi(width: int, height: int, frames: list[bytes],
               fps: int = 25) -> bytes:
    """Emit a minimal uncompressed 24-bit DIB AVI from RGB frames."""
    if not frames:
        raise ValueError("encode_avi: no frames")
    for f in frames:
        if len(f) != width * height * 3:
            raise ValueError("encode_avi: frame length != w*h*3")
    frame_bytes = _stride(width) * height

    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    avih = struct.pack("<14I", 1_000_000 // fps, frame_bytes * fps, 0, 0,
                       len(frames), 0, 1, frame_bytes, width, height,
                       0, 0, 0, 0)
    strh = (b"vids" + b"DIB " + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, len(frames),
                                            frame_bytes, 0, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, BI_RGB,
                       frame_bytes, 2835, 2835, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(
        chunk(b"00db", _rgb_to_dib(f, width, height)) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
