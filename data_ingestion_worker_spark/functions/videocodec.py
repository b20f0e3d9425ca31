"""Dependency-free video codec: uncompressed (DIB) and Motion-JPEG AVI.

Completes the builtin media-codec trio (``imagecodec`` for stills,
``audiocodec`` for PCM audio): a real bytes-to-frames path for RIFF
``AVI `` with either ``00db`` device-independent-bitmap frames (24-bit
BGR, bottom-up rows, 4-byte stride, i.e. exactly the BMP pixel-array
layout) or — since round 7, composing the container parser with
``jpegcodec`` — ``MJPG`` streams whose every ``00dc`` chunk is an
independent baseline JPEG (the dominant legacy-camera/webcam AVI
profile, and r6 verdict ask #4).

``decode_avi`` walks the nested RIFF LIST structure (hdrl/strl/movi,
skipping JUNK/idx1 and other non-essential chunks), validates the
``avih``/``strh``/``strf`` headers against the BI_RGB-24 or MJPG
contract, and returns header metadata plus every frame as
top-to-bottom RGB bytes; malformed input raises ``ValueError``
(row-level isolation upstream, reference T10).  For the production
shape — demux once, decode frames independently with per-frame error
isolation — ``demux_avi_mjpeg`` returns the raw JPEG payloads instead,
so a single corrupt frame poisons one row, not the file.
``encode_avi`` / ``encode_avi_mjpeg`` emit minimal spec-conformant
files so tests and the parity-gated round-trip queries can build real
fixtures in-container.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

BI_RGB = 0

#: biCompression fourcc for Motion-JPEG streams ('MJPG' little-endian).
BI_MJPG = struct.unpack("<I", b"MJPG")[0]


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


def _demux_avi(payload: bytes):
    """Shared container walk: header metadata + raw frame chunk bodies.

    Returns ``(width, height, fps, compression, [frame_bytes, ...])``
    with frames still encoded as they sit in the stream (DIB rows or
    per-frame JPEG)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" \
            or payload[8:12] != b"AVI ":
        raise ValueError("AVI: bad magic")
    width = height = None
    rate = scale = None
    compression = None
    cur_stream = None  # fccType of the most recent strh ('vids'/'auds'/...)
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, rate, scale, cur_stream, compression
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
                # the video stream's format must meet the BI_RGB-24 /
                # MJPG contract — an audio WAVEFORMATEX (16-18 bytes) is
                # legal and simply ignored.
                if cur_stream != b"vids":
                    continue
                if size < 40:
                    raise ValueError("AVI: strf too small")
                bits, compression = struct.unpack_from("<HI", payload,
                                                       body + 14)
                if compression == BI_RGB and bits != 24:
                    raise ValueError(f"AVI: DIB bits={bits} unsupported")
                if compression not in (BI_RGB, BI_MJPG):
                    raise ValueError(
                        f"AVI: unsupported strf (bits={bits}, "
                        f"compression={compression})")
            elif cid in (b"00db", b"00dc"):
                if width is None:
                    raise ValueError("AVI: frame before headers")
                frames.append(payload[body:body + size])
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
    return width, height, rate // scale, compression, frames


def decode_avi(payload: bytes) -> DecodedAvi:
    """Decode a 24-bit DIB or Motion-JPEG AVI to RGB frames (strict:
    any corrupt frame fails the file — use :func:`demux_avi_mjpeg` +
    per-frame ``decode_jpeg`` for row-level frame isolation)."""
    width, height, fps, compression, raw = _demux_avi(payload)
    if compression == BI_MJPG:
        from .jpegcodec import decode_jpeg

        frames = []
        for f in raw:
            img = decode_jpeg(f)
            if (img.width, img.height) != (width, height):
                raise ValueError("AVI: MJPG frame geometry mismatch")
            frames.append(img.pixels)
    else:
        frames = [_dib_to_rgb(f, width, height) for f in raw]
    return DecodedAvi(width, height, fps, tuple(frames))


def demux_avi_mjpeg(payload: bytes):
    """Demux a Motion-JPEG AVI WITHOUT decoding the frames: returns
    ``(width, height, fps, [jpeg_payload, ...])``.  The production
    shape — one cheap container walk, then per-frame JPEG decodes that
    can fail independently (a corrupt frame poisons its own row, not
    the file) and distribute across tasks."""
    width, height, fps, compression, raw = _demux_avi(payload)
    if compression != BI_MJPG:
        raise ValueError("AVI: not a Motion-JPEG stream")
    return width, height, fps, raw


def _mux_avi(width: int, height: int, fps: int, handler: bytes,
             compression: int, frame_bytes: int,
             frame_chunks: list[tuple[bytes, bytes]]) -> bytes:
    """Assemble the RIFF structure around already-encoded frame chunks
    (``(chunk_id, body)`` pairs) — shared by the DIB and MJPG muxers."""
    def chunk(cid: bytes, body: bytes) -> bytes:
        return cid + struct.pack("<I", len(body)) + body \
            + (b"\x00" if len(body) & 1 else b"")

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    n = len(frame_chunks)
    avih = struct.pack("<14I", 1_000_000 // fps, frame_bytes * fps, 0, 0,
                       n, 0, 1, frame_bytes, width, height,
                       0, 0, 0, 0)
    strh = (b"vids" + handler + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, n,
                                            frame_bytes, 0, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24,
                       compression, frame_bytes, 2835, 2835, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(cid, body)
                                 for cid, body in frame_chunks))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_avi(width: int, height: int, frames: list[bytes],
               fps: int = 25) -> bytes:
    """Emit a minimal uncompressed 24-bit DIB AVI from RGB frames."""
    if not frames:
        raise ValueError("encode_avi: no frames")
    for f in frames:
        if len(f) != width * height * 3:
            raise ValueError("encode_avi: frame length != w*h*3")
    frame_bytes = _stride(width) * height
    return _mux_avi(width, height, fps, b"DIB ", BI_RGB, frame_bytes,
                    [(b"00db", _rgb_to_dib(f, width, height))
                     for f in frames])


def encode_avi_mjpeg(width: int, height: int, frames: list[bytes],
                     fps: int = 25, quality: int = 90) -> bytes:
    """Emit a Motion-JPEG AVI: every frame an independent baseline JPEG
    in its own ``00dc`` chunk (intra-only — the property that makes
    MJPEG streams splittable at frame granularity)."""
    from .jpegcodec import encode_jpeg

    if not frames:
        raise ValueError("encode_avi_mjpeg: no frames")
    for f in frames:
        if len(f) != width * height * 3:
            raise ValueError("encode_avi_mjpeg: frame length != w*h*3")
    chunks = [(b"00dc", encode_jpeg(width, height, f, quality=quality))
              for f in frames]
    frame_bytes = max(len(b) for _cid, b in chunks)
    return _mux_avi(width, height, fps, b"MJPG", BI_MJPG, frame_bytes,
                    chunks)
