"""Dependency-free GIF codec (GIF87a/89a, LZW, still + animated).

GIF is the remaining high-frequency web image format the codec matrix
(BMP/PPM/PNG/JPEG stills, WAV/AVI/MP4 containers) did not cover; a real
crawl of the reference's arbitrary S3 objects
(src/services/s3_service.py:57-63) fetches plenty of them, and the
animated profile doubles as a second video-ish frame-sampling source
next to MJPEG-AVI.  Pure stdlib: GIF's only compression is LZW with
variable 3..12-bit codes, implemented here from the GIF89a spec
(Appendix F) — encoder and decoder are a matched pair, and
``tests/test_gifcodec.py`` pins the decoder INDEPENDENTLY of the
encoder with a from-first-principles LZW reference and hand-built
interlace fixtures (the T.81-spec-vector discipline the JPEG codec
uses).

Supported: global and local color tables, GIF87a and 89a, multiple
frames with Graphic Control Extensions (delay, transparency index,
disposal 0/1/2), sub-rectangle frames composited onto the running
canvas, Adam-style 4-pass GIF interlacing on decode, NETSCAPE2.0 loop
extension (skipped like any application extension), deferred-clear LZW
streams and the KwKwK continuation case.  Disposal 3 (restore-previous)
raises ``ValueError`` — the caller's corrupt-payload path (NULL
metadata, reference T10) treats it like any undecodable input.

Encoders (``encode_gif`` over palette-index frames, ``encode_gif_rgb``
over exact-palette RGB frames) exist so tests and round-trip queries
build real fixtures in-container.  Runs per-payload inside
Arrow-batched ``mapInPandas`` stages; nothing here touches Spark.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

from .imagecodec import DecodedImage

GIF87_SIG = b"GIF87a"
GIF89_SIG = b"GIF89a"

#: Same decompression-bomb guard as pngcodec.MAX_PIXELS.
MAX_PIXELS = 1 << 26

#: Row order of the four GIF interlace passes: (first row, step).
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


@dataclass
class DecodedGif:
    width: int
    height: int
    frames: list[bytes]     # top-to-bottom RGB (3 bytes/px) per frame
    delays_cs: list[int]    # per-frame delay in centiseconds (0 if none)
    format: str = "GIF"
    mode: str = "RGB"


# --------------------------------------------------------------------------
# LZW (GIF variable-code-size variant, LSB-first bit packing)


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-LZW compress palette indices at the given minimum code size.

    Emits CLEAR, the data codes (dictionary reset via CLEAR whenever the
    next code would exceed 12 bits), and EOI; variable code width grows
    the moment the next unassigned code no longer fits the current
    width, which is the convention every mainstream decoder expects.
    """
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    cur = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal cur, nbits
        cur |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(cur & 0xFF)
            cur >>= 8
            nbits -= 8

    def fresh() -> tuple[dict, int, int]:
        return ({bytes([i]): i for i in range(clear)}, eoi + 1,
                min_code_size + 1)

    table, next_code, width = fresh()
    emit(clear, width)
    s = b""
    for byte in data:
        c = bytes([byte])
        if byte >= clear:
            raise ValueError("GIF: index out of palette range")
        sc = s + c
        if sc in table:
            s = sc
            continue
        emit(table[s], width)
        if next_code < (1 << 12):
            table[sc] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:                                  # table full: clear + restart
            emit(clear, width)
            table, next_code, width = fresh()
        s = c
    if s:
        emit(table[s], width)
        # The decoder appends an entry for this final data code too (it
        # appends on every data code after the first) and bumps its code
        # width if that append lands on 2^width — mirror it with a
        # "virtual add" so EOI is written at the width the decoder reads.
        if next_code < (1 << 12):
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
    emit(eoi, width)
    if nbits:
        out.append(cur & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> bytes:
    """Decompress a GIF-LZW stream to exactly ``expect`` indices."""
    if not 2 <= min_code_size <= 11:
        raise ValueError("GIF: bad LZW minimum code size")
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    cur = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, cur, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF: truncated LZW stream")
            cur |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = cur & ((1 << width) - 1)
        cur >>= width
        nbits -= width
        return code

    out = bytearray()
    table: list[bytes] = []
    width = min_code_size + 1
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= len(table) or code >= clear:
                raise ValueError("GIF: first code not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < (1 << 12):       # deferred-clear streams stop
                table.append(prev + entry[:1])   # growing at 4096
        elif code == len(table) and len(table) < (1 << 12):   # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF: LZW code out of range")
        if prev is not None and len(table) == (1 << width) and width < 12:
            width += 1
        out += entry
        if len(out) > expect:
            raise ValueError("GIF: LZW output exceeds frame size")
        prev = entry
    if len(out) != expect:
        raise ValueError("GIF: LZW output short of frame size")
    return bytes(out)


# --------------------------------------------------------------------------
# Encode


def _color_table(palette: list[tuple[int, int, int]]) -> tuple[bytes, int]:
    """Pack a palette into a power-of-two GIF color table; returns the
    packed bytes and the table-size exponent-minus-one field."""
    n = len(palette)
    if not 1 <= n <= 256:
        raise ValueError("GIF: palette must have 1..256 colors")
    size = 2
    exp = 0
    while size < max(n, 2):
        size <<= 1
        exp += 1
    body = bytearray()
    for r, g, b in palette:
        body += bytes((r, g, b))
    body += b"\x00" * (3 * (size - n))
    return bytes(body), exp


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def encode_gif(width: int, height: int, frames: list[bytes],
               palette: list[tuple[int, int, int]],
               delays_cs: list[int] | None = None) -> bytes:
    """Encode full-canvas palette-index frames as GIF89a (one frame →
    still; several → animated with per-frame GCE delays and a
    NETSCAPE2.0 infinite loop block)."""
    if not frames:
        raise ValueError("GIF: need at least one frame")
    for f in frames:
        if len(f) != width * height:
            raise ValueError("GIF: frame size != width*height")
    table, exp = _color_table(palette)
    mcs = max(2, exp + 1)
    out = bytearray()
    out += GIF89_SIG
    out += struct.pack("<HH", width, height)
    out += bytes((0x80 | (exp << 4) | exp, 0, 0))  # GCT present
    out += table
    animated = len(frames) > 1
    if animated:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    delays = delays_cs or [0] * len(frames)
    for f, delay in zip(frames, delays):
        if animated or delay:
            out += b"\x21\xf9\x04"
            out += bytes((0x04,))                  # disposal 1, no transp
            out += struct.pack("<H", delay)
            out += b"\x00\x00"                     # transp index, terminator
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height)
        out += b"\x00"                             # no LCT, not interlaced
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(f, mcs))
    out += b"\x3b"
    return bytes(out)


def encode_gif_rgb(width: int, height: int, rgb_frames: list[bytes],
                   delays_cs: list[int] | None = None) -> bytes:
    """Encode RGB frames via an exact palette (deterministic: colors
    sorted ascending).  Raises when the frames use > 256 distinct
    colors — GIF needs quantization beyond that, which would break the
    lossless round-trip contract this encoder exists to test."""
    colors: set[tuple[int, int, int]] = set()
    for f in rgb_frames:
        if len(f) != width * height * 3:
            raise ValueError("GIF: RGB frame size != w*h*3")
        colors.update(
            (f[i], f[i + 1], f[i + 2]) for i in range(0, len(f), 3))
    if len(colors) > 256:
        raise ValueError("GIF: more than 256 distinct colors")
    palette = sorted(colors)
    index = {c: i for i, c in enumerate(palette)}
    frames = [
        bytes(index[(f[i], f[i + 1], f[i + 2])]
              for i in range(0, len(f), 3))
        for f in rgb_frames
    ]
    return encode_gif(width, height, frames, palette, delays_cs)


# --------------------------------------------------------------------------
# Decode


def _deinterlace(idx: bytes, width: int, height: int) -> bytes:
    rows = [idx[r * width:(r + 1) * width] for r in range(height)]
    out: list[bytes | None] = [None] * height
    src = 0
    for first, step in _INTERLACE_PASSES:
        for r in range(first, height, step):
            out[r] = rows[src]
            src += 1
    return b"".join(out)  # type: ignore[arg-type]


def decode_gif(payload: bytes) -> DecodedGif:
    # Disposal-2 divergence note (r7 ADVICE, kept as-is by design): this
    # decoder restores disposed rects — and initializes uncovered canvas
    # — to the OPAQUE global background color, per the GIF89a spec text.
    # Mainstream renderers (browsers, Pillow) instead treat those
    # regions as TRANSPARENT on an RGBA canvas.  The in-repo round-trip
    # gates only compare against the matched encoder's fixtures, where
    # the two models agree; when frame BYTES of real crawled animated
    # GIFs are compared against a third-party decoder, background-
    # disposed pixels will differ (RGB background vs alpha=0).
    """Decode a GIF87a/89a payload to full-canvas RGB frames (frames
    composited per the disposal model onto the running canvas)."""
    if payload[:6] not in (GIF87_SIG, GIF89_SIG):
        raise ValueError("GIF: bad signature")
    if len(payload) < 13:
        raise ValueError("GIF: truncated header")
    width, height = struct.unpack("<HH", payload[6:10])
    if width == 0 or height == 0 or width * height > MAX_PIXELS:
        raise ValueError("GIF: bad logical screen geometry")
    flags = payload[10]
    bg_index = payload[11]
    pos = 13
    gct: list[tuple[int, int, int]] | None = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        raw = payload[pos:pos + 3 * n]
        if len(raw) != 3 * n:
            raise ValueError("GIF: truncated global color table")
        gct = [(raw[i], raw[i + 1], raw[i + 2])
               for i in range(0, len(raw), 3)]
        pos += 3 * n

    # The composited state lives in RGB space, not index space — frames
    # may switch palettes (local color tables) mid-stream.
    bg_rgb = gct[bg_index] if gct and bg_index < len(gct) else (0, 0, 0)
    rgb_canvas = bytearray(bytes(bg_rgb) * (width * height))
    frames: list[bytes] = []
    delays: list[int] = []
    delay = 0
    transp: int | None = None
    disposal = 0

    def read_sub_blocks(p: int) -> tuple[bytes, int]:
        out = bytearray()
        while True:
            if p >= len(payload):
                raise ValueError("GIF: truncated sub-blocks")
            n = payload[p]
            p += 1
            if n == 0:
                return bytes(out), p
            out += payload[p:p + n]
            if len(payload) < p + n:
                raise ValueError("GIF: truncated sub-block body")
            p += n

    while True:
        if pos >= len(payload):
            raise ValueError("GIF: missing trailer")
        block = payload[pos]
        pos += 1
        if block == 0x3B:                     # trailer
            break
        if block == 0x21:                     # extension
            if pos >= len(payload):
                raise ValueError("GIF: truncated extension")
            label = payload[pos]
            pos += 1
            data, pos = read_sub_blocks(pos)
            if label == 0xF9 and len(data) >= 4:
                packed = data[0]
                disposal = (packed >> 2) & 0x07
                if disposal == 3:
                    raise ValueError(
                        "GIF: restore-previous disposal unsupported")
                delay = struct.unpack("<H", data[1:3])[0]
                transp = data[3] if packed & 0x01 else None
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unknown block 0x{block:02x}")
        if pos + 9 > len(payload):
            raise ValueError("GIF: truncated image descriptor")
        fx, fy, fw, fh = struct.unpack("<HHHH", payload[pos:pos + 8])
        iflags = payload[pos + 8]
        pos += 9
        if fw == 0 or fh == 0 or fx + fw > width or fy + fh > height:
            raise ValueError("GIF: frame rect outside canvas")
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            raw = payload[pos:pos + 3 * n]
            if len(raw) != 3 * n:
                raise ValueError("GIF: truncated local color table")
            pal = [(raw[i], raw[i + 1], raw[i + 2])
                   for i in range(0, len(raw), 3)]
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF: frame has no color table")
        if pos >= len(payload):
            raise ValueError("GIF: missing LZW code size")
        mcs = payload[pos]
        pos += 1
        lzw, pos = read_sub_blocks(pos)
        idx = _lzw_decode(lzw, mcs, fw * fh)
        if iflags & 0x40:
            idx = _deinterlace(idx, fw, fh)
        for r in range(fh):
            row = idx[r * fw:(r + 1) * fw]
            base = ((fy + r) * width + fx) * 3
            for cidx, v in enumerate(row):
                if transp is not None and v == transp:
                    continue
                if v >= len(pal):
                    raise ValueError("GIF: index outside color table")
                off = base + cidx * 3
                rgb_canvas[off:off + 3] = bytes(pal[v])
        frames.append(bytes(rgb_canvas))
        delays.append(delay)
        if disposal == 2:                     # restore to background
            for r in range(fh):
                base = ((fy + r) * width + fx) * 3
                rgb_canvas[base:base + 3 * fw] = bytes(bg_rgb) * fw
        delay = 0
        transp = None
        disposal = 0
    if not frames:
        raise ValueError("GIF: no image data")
    return DecodedGif(width, height, frames, delays)


def decode_gif_still(payload: bytes) -> DecodedImage:
    """First frame as a ``DecodedImage`` — the still-image dispatch
    surface (``imagecodec.decode_builtin``)."""
    g = decode_gif(payload)
    return DecodedImage(g.width, g.height, "P", "GIF", g.frames[0])
