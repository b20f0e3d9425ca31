"""Dependency-free MP4 (ISO BMFF) container codec — Motion-JPEG track.

Closes the container half of the "JPEG/MP4" gap: MP4 is a *container*
(ISO/IEC 14496-12 box structure), and with the baseline JPEG codec
(``functions.jpegcodec``) in the tree a complete, real
bytes-to-frames path needs no third-party library — Motion-JPEG in MP4
(the QuickTime ``jpeg`` visual sample entry) is a standard, playable
combination where every sample in ``mdat`` is an independent baseline
JPEG image.

``decode_mp4`` walks the box tree (``ftyp``/``moov``/``trak``/``mdia``/
``minf``/``stbl``), reads the sample tables the way a real demuxer does
— ``stsd`` for the sample entry + dimensions, ``stts`` for timing,
``stsz`` for sample sizes, ``stsc``+``stco`` for chunk mapping — then
extracts each sample from ``mdat`` and decodes it with the builtin JPEG
decoder.  Unsupported codecs (an ``avc1``/H.264 track) and malformed
boxes raise ``ValueError`` — row-level isolation upstream (reference
T10).  ``encode_mp4`` emits a minimal spec-conformant progressive
layout (``ftyp`` + ``mdat`` + ``moov``) so tests and the parity-gated
round-trip query can build real fixtures in-container.

Box tables are genuinely exercised: the encoder stores samples in TWO
chunks (so ``stsc``/``stco`` mapping is non-trivial) and per-sample
sizes differ (JPEG output length varies with content).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from .jpegcodec import decode_jpeg, encode_jpeg

#: Geometry guard, same idea as pngcodec/jpegcodec.
MAX_PIXELS = 1 << 26


@dataclass(frozen=True)
class DecodedMp4:
    width: int
    height: int
    timescale: int
    duration: int               # in timescale units
    sample_format: str          # 'jpeg'
    frames: tuple[bytes, ...]   # top-to-bottom RGB24 per sample

    @property
    def n_frames(self) -> int:
        return len(self.frames)

    @property
    def duration_ms(self) -> int:
        return self.duration * 1000 // self.timescale


def _box(btype: bytes, body: bytes) -> bytes:
    return struct.pack(">I", len(body) + 8) + btype + body


def _full(btype: bytes, version: int, flags: int, body: bytes) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + body)


def encode_mp4(width: int, height: int, frames: list[bytes],
               fps: int = 10, quality: int = 90) -> bytes:
    """Encode top-to-bottom RGB24 frames as Motion-JPEG in MP4.

    Samples are written into two chunks (first half / second half) so a
    decoder must honour the stsc chunk map, not assume one chunk.
    """
    if not frames:
        raise ValueError("encode_mp4: need at least one frame")
    jpegs = [encode_jpeg(width, height, f, quality=quality)
             for f in frames]
    n = len(jpegs)
    split = max(1, n // 2) if n > 1 else 1
    chunk1, chunk2 = jpegs[:split], jpegs[split:]

    timescale = 1000
    delta = timescale // fps
    duration = n * delta

    # mdat precedes moov; offsets are absolute file offsets.
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
    mdat_body = b"".join(jpegs)
    mdat = _box(b"mdat", mdat_body)
    chunk1_off = len(ftyp) + 8
    chunk2_off = chunk1_off + sum(len(j) for j in chunk1)

    sample_entry = _box(
        b"jpeg",
        b"\x00" * 6 + struct.pack(">H", 1)          # reserved + dref idx
        + b"\x00" * 16                              # pre-defined/reserved
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4 + struct.pack(">H", 1)        # frame count 1
        + b"\x00" * 32                              # compressor name
        + struct.pack(">Hh", 24, -1),               # depth, color table
    )
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + sample_entry)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, delta))
    if chunk2:
        stsc_entries = [(1, split, 1), (2, n - split, 1)]
    else:
        stsc_entries = [(1, n, 1)]
    stsc = _full(b"stsc", 0, 0, struct.pack(">I", len(stsc_entries))
                 + b"".join(struct.pack(">III", *e) for e in stsc_entries))
    stsz = _full(b"stsz", 0, 0, struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(j)) for j in jpegs))
    offs = [chunk1_off] + ([chunk2_off] if chunk2 else [])
    stco = _full(b"stco", 0, 0, struct.pack(">I", len(offs))
                 + b"".join(struct.pack(">I", o) for o in offs))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    url_ = _full(b"url ", 0, 1, b"")                # self-contained
    dref = _full(b"dref", 0, 0, struct.pack(">I", 1) + url_)
    dinf = _box(b"dinf", dref)
    vmhd = _full(b"vmhd", 0, 1, struct.pack(">HHHH", 0, 0, 0, 0))
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _full(b"hdlr", 0, 0, b"\x00" * 4 + b"vide" + b"\x00" * 12
                 + b"VideoHandler\x00")
    mdhd = _full(b"mdhd", 0, 0, struct.pack(">IIII", 0, 0, timescale,
                                            duration)
                 + struct.pack(">HH", 0x55C4, 0))   # und language
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7, struct.pack(">III", 0, 0, 1)   # track 1
                 + b"\x00" * 4 + struct.pack(">I", duration)
                 + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0, 0)
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)
                 + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0, struct.pack(">IIII", 0, 0, timescale,
                                            duration)
                 + struct.pack(">I", 0x00010000)    # rate 1.0
                 + struct.pack(">H", 0x0100)        # volume
                 + b"\x00" * 10
                 + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0,
                               0, 0, 0x40000000)
                 + b"\x00" * 24
                 + struct.pack(">I", 2))            # next track id
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _boxes(payload: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) walking a box sequence."""
    while pos + 8 <= end:
        size = struct.unpack_from(">I", payload, pos)[0]
        btype = payload[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:                      # 64-bit largesize
            if body + 8 > end:
                raise ValueError("MP4: truncated largesize box")
            size = struct.unpack_from(">Q", payload, body)[0]
            body += 8
            boxend = pos + size
        elif size == 0:                    # to end of file
            boxend = end
        else:
            boxend = pos + size
        if boxend > end or boxend < body:
            raise ValueError(f"MP4: truncated {btype!r} box")
        yield btype, body, boxend
        pos = boxend


def _find(payload: bytes, pos: int, end: int, btype: bytes):
    for t, b, e in _boxes(payload, pos, end):
        if t == btype:
            return b, e
    raise ValueError(f"MP4: missing {btype!r} box")


def decode_mp4(payload: bytes) -> DecodedMp4:
    """Demux a Motion-JPEG MP4 and decode every sample to RGB24."""
    try:
        return _decode_mp4(payload)
    except (IndexError, KeyError, struct.error) as exc:
        raise ValueError(f"MP4: malformed stream ({exc!r})") from exc


def _decode_mp4(payload: bytes) -> DecodedMp4:
    top = list(_boxes(payload, 0, len(payload)))
    types = [t for t, _, _ in top]
    if b"ftyp" not in types or b"moov" not in types:
        raise ValueError("MP4: not an ISO-BMFF file (no ftyp/moov)")
    moov_b, moov_e = _find(payload, 0, len(payload), b"moov")
    trak_b, trak_e = _find(payload, moov_b, moov_e, b"trak")
    mdia_b, mdia_e = _find(payload, trak_b, trak_e, b"mdia")
    mdhd_b, _ = _find(payload, mdia_b, mdia_e, b"mdhd")
    version = payload[mdhd_b]
    if version == 1:
        timescale = struct.unpack_from(">I", payload, mdhd_b + 4 + 16)[0]
        duration = struct.unpack_from(">Q", payload, mdhd_b + 4 + 20)[0]
    else:
        timescale = struct.unpack_from(">I", payload, mdhd_b + 4 + 8)[0]
        duration = struct.unpack_from(">I", payload, mdhd_b + 4 + 12)[0]
    if not timescale:
        raise ValueError("MP4: zero timescale")
    minf_b, minf_e = _find(payload, mdia_b, mdia_e, b"minf")
    stbl_b, stbl_e = _find(payload, minf_b, minf_e, b"stbl")

    # stsd: sample entry format + dimensions.
    stsd_b, stsd_e = _find(payload, stbl_b, stbl_e, b"stsd")
    n_entries = struct.unpack_from(">I", payload, stsd_b + 4)[0]
    if n_entries < 1:
        raise ValueError("MP4: empty stsd")
    entry_t, entry_b, _ = next(_boxes(payload, stsd_b + 8, stsd_e))
    fmt = entry_t.decode("latin-1").strip()
    if entry_t != b"jpeg":
        raise ValueError(f"MP4: unsupported sample entry {fmt!r} "
                         "(builtin demuxer decodes Motion-JPEG only)")
    width, height = struct.unpack_from(">HH", payload, entry_b + 24)
    if not width or not height or width * height > MAX_PIXELS:
        raise ValueError("MP4: bad visual sample entry geometry")

    # stsz: per-sample byte sizes.
    stsz_b, _ = _find(payload, stbl_b, stbl_e, b"stsz")
    fixed, n_samples = struct.unpack_from(">II", payload, stsz_b + 4)
    if n_samples == 0:
        raise ValueError("MP4: zero samples")
    if fixed:
        sizes = [fixed] * n_samples
    else:
        sizes = list(struct.unpack_from(f">{n_samples}I", payload,
                                        stsz_b + 12))

    # stsc: chunk -> samples-per-chunk map (run-length encoded).
    stsc_b, _ = _find(payload, stbl_b, stbl_e, b"stsc")
    n_runs = struct.unpack_from(">I", payload, stsc_b + 4)[0]
    runs = [struct.unpack_from(">III", payload, stsc_b + 8 + 12 * i)
            for i in range(n_runs)]

    # stco: absolute chunk offsets (co64 for 64-bit).
    try:
        stco_b, _ = _find(payload, stbl_b, stbl_e, b"stco")
        n_chunks = struct.unpack_from(">I", payload, stco_b + 4)[0]
        offsets = [struct.unpack_from(">I", payload, stco_b + 8 + 4 * i)[0]
                   for i in range(n_chunks)]
    except ValueError:
        co64_b, _ = _find(payload, stbl_b, stbl_e, b"co64")
        n_chunks = struct.unpack_from(">I", payload, co64_b + 4)[0]
        offsets = [struct.unpack_from(">Q", payload, co64_b + 8 + 8 * i)[0]
                   for i in range(n_chunks)]

    # Expand the stsc runs into per-chunk sample counts.
    per_chunk: list[int] = []
    for i, (first, spc, _desc) in enumerate(runs):
        last = runs[i + 1][0] if i + 1 < len(runs) else n_chunks + 1
        per_chunk.extend([spc] * (last - first))
    if len(per_chunk) != n_chunks or sum(per_chunk) != n_samples:
        raise ValueError("MP4: stsc/stco/stsz tables disagree")

    frames: list[bytes] = []
    si = 0
    for ci, off in enumerate(offsets):
        pos = off
        for _ in range(per_chunk[ci]):
            sz = sizes[si]
            if pos + sz > len(payload):
                raise ValueError("MP4: sample beyond end of file")
            img = decode_jpeg(payload[pos:pos + sz])
            if (img.width, img.height) != (width, height):
                raise ValueError("MP4: sample geometry != stsd geometry")
            frames.append(img.pixels)
            pos += sz
            si += 1
    return DecodedMp4(width, height, timescale, duration, "jpeg",
                      tuple(frames))
