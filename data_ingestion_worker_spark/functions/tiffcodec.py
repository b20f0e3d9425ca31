"""Dependency-free baseline TIFF codec (II, 8-bit, strips, LZW).

TIFF is the document/scan-corpus format (faxes, book scans, OCR
pipelines) the image matrix (BMP/PPM/PNG/JPEG/GIF) did not cover.  The
baseline profile implemented here: little-endian ("II") byte order,
8-bit samples, grayscale (PhotometricInterpretation 1) and RGB (2),
strip layout, Compression 1 (none) and 5 (LZW), horizontal-differencing
Predictor 2 on decode.  Everything else (big-endian "MM", tiles,
16-bit, palette, JPEG-in-TIFF, CCITT) raises ``ValueError`` — the
caller's corrupt-payload path (NULL metadata, reference T10) treats it
like any undecodable input.

TIFF-LZW is the OTHER variable-width LZW (TIFF 6.0 §13): MSB-first bit
packing (GIF is LSB-first), fixed 8-bit symbol alphabet (ClearCode 256,
EOI 257), and the spec's famous **early width change** — the code width
grows one code EARLIER than GIF's rule (at table size 2^width − 1),
because the writer bumps when the NEXT code to be assigned would not
fit.  Encoder and decoder are a matched pair; ``tests/test_tiffcodec.py``
pins the decoder independently with a clean-room reference LZW and
hand-built fixtures (the GIF/JPEG spec-vector discipline).

Runs per-payload inside Arrow-batched ``mapInPandas`` stages; nothing
here touches Spark.
"""

from __future__ import annotations

import struct

from .imagecodec import DecodedImage

#: Decompression-bomb guard (pngcodec.MAX_PIXELS convention).
MAX_PIXELS = 1 << 26

_CLEAR = 256
_EOI = 257


# --------------------------------------------------------------------------
# TIFF-LZW (MSB-first, early change)


def _lzw_encode(data: bytes) -> bytes:
    """TIFF-LZW compress a byte string (TIFF 6.0 §13 writer)."""
    out = bytearray()
    cur = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal cur, nbits
        cur = (cur << width) | code
        nbits += width
        while nbits >= 8:
            out.append((cur >> (nbits - 8)) & 0xFF)
            nbits -= 8
        cur &= (1 << nbits) - 1

    def fresh() -> tuple[dict, int, int]:
        return ({bytes([i]): i for i in range(256)}, _EOI + 1, 9)

    table, next_code, width = fresh()
    emit(_CLEAR, width)
    s = b""
    for byte in data:
        c = bytes([byte])
        sc = s + c
        if sc in table:
            s = sc
            continue
        emit(table[s], width)
        if next_code < 4094:             # keep headroom below 12-bit cap
            table[sc] = next_code
            next_code += 1
            # Early change (TIFF 6.0 §13): the width grows one code
            # earlier than GIF's rule — the decoder-side threshold is
            # table size 2^width − 1, so the encoder (whose dictionary
            # runs one entry ahead of the decoder's) bumps when
            # next_code reaches 2^width.
            if next_code == (1 << width) and width < 12:
                width += 1
        else:                            # table full: clear + restart
            emit(_CLEAR, width)
            table, next_code, width = fresh()
        s = c
    if s:
        emit(table[s], width)
        # Mirror the decoder's append on the final data code (the GIF
        # codec's "virtual add" lesson) so EOI is written at the width
        # the decoder reads.
        if next_code < 4094:
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
    emit(_EOI, width)
    if nbits:
        out.append((cur << (8 - nbits)) & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, expect: int) -> bytes:
    """Decompress a TIFF-LZW stream to exactly ``expect`` bytes."""
    pos = 0
    cur = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, cur, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("TIFF: truncated LZW stream")
            cur = (cur << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (cur >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        cur &= (1 << nbits) - 1
        return code

    out = bytearray()
    table: list[bytes] = []
    width = 9
    prev: bytes | None = None
    while True:
        code = read(width)
        if code == _CLEAR:
            table = [bytes([i]) for i in range(256)] + [b"", b""]
            width = 9
            prev = None
            continue
        if code == _EOI:
            break
        if prev is None:
            if code >= 256 or code >= len(table):
                raise ValueError("TIFF: first code not a root")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4094:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4094:       # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("TIFF: LZW code out of range")
        if prev is not None and len(table) == (1 << width) - 1 \
                and width < 12:
            width += 1
        out += entry
        if len(out) > expect:
            raise ValueError("TIFF: LZW output exceeds strip size")
        prev = entry
    if len(out) != expect:
        raise ValueError("TIFF: LZW output short of strip size")
    return bytes(out)


# --------------------------------------------------------------------------
# Encode (II, single strip, LZW, photometric 1/2)


def encode_tiff(width: int, height: int, pixels: bytes,
                mode: str = "RGB", compression: int = 5) -> bytes:
    """Encode 8-bit grayscale ('L') or RGB pixels as a little-endian
    baseline TIFF: one strip, Compression 1 (none) or 5 (LZW)."""
    spp = 3 if mode == "RGB" else 1
    if mode not in ("RGB", "L"):
        raise ValueError("TIFF: encoder supports L and RGB")
    if len(pixels) != width * height * spp:
        raise ValueError("TIFF: pixel buffer size mismatch")
    if compression == 5:
        strip = _lzw_encode(pixels)
    elif compression == 1:
        strip = bytes(pixels)
    else:
        raise ValueError("TIFF: encoder supports compression 1 and 5")
    # Layout: header(8) + strip + IFD
    strip_off = 8
    strip_len = len(strip)               # tag 279 counts the DATA only —
    ifd_off = strip_off + strip_len      # the alignment pad below is
    if ifd_off % 2:                      # layout, not strip content
        strip = strip + b"\x00"          # (a strict reader treats an
        ifd_off += 1                     # overlong count as corruption)
    entries = []

    def tag(t: int, typ: int, cnt: int, val: int) -> None:
        entries.append(struct.pack("<HHII", t, typ, cnt, val))

    bits_extra = b""
    if spp == 3:
        # BitsPerSample for 3 samples does not fit the value slot:
        # point it past the IFD.
        bits_val_off = ifd_off + 2 + 12 * 10 + 4
        bits_extra = struct.pack("<HHH", 8, 8, 8)
    tag(256, 3, 1, width)                # ImageWidth SHORT
    tag(257, 3, 1, height)               # ImageLength
    if spp == 3:
        tag(258, 3, 3, bits_val_off)     # BitsPerSample -> offset
    else:
        tag(258, 3, 1, 8)
    tag(259, 3, 1, compression)          # Compression
    tag(262, 3, 1, 2 if spp == 3 else 1)  # Photometric
    tag(273, 4, 1, strip_off)            # StripOffsets LONG
    tag(277, 3, 1, spp)                  # SamplesPerPixel
    tag(278, 3, 1, height)               # RowsPerStrip
    tag(279, 4, 1, strip_len)            # StripByteCounts (unpadded)
    tag(284, 3, 1, 1)                    # PlanarConfiguration chunky
    ifd = (struct.pack("<H", len(entries)) + b"".join(entries)
           + struct.pack("<I", 0) + bits_extra)
    return (b"II*\x00" + struct.pack("<I", ifd_off) + strip + ifd)


# --------------------------------------------------------------------------
# Decode


def _read_ifd(payload: bytes, off: int) -> dict[int, tuple[int, list[int]]]:
    if off + 2 > len(payload):
        raise ValueError("TIFF: truncated IFD")
    (n,) = struct.unpack_from("<H", payload, off)
    tags: dict[int, tuple[int, list[int]]] = {}
    sizes = {1: 1, 2: 1, 3: 2, 4: 4}
    fmts = {1: "<B", 3: "<H", 4: "<I"}
    for i in range(n):
        base = off + 2 + 12 * i
        if base + 12 > len(payload):
            raise ValueError("TIFF: truncated IFD entry")
        t, typ, cnt, _ = struct.unpack_from("<HHII", payload, base)
        if typ not in sizes:
            continue                     # RATIONAL etc. — not needed
        total = sizes[typ] * cnt
        if total <= 4:
            vals_off = base + 8
        else:
            (vals_off,) = struct.unpack_from("<I", payload, base + 8)
        if typ == 2:
            continue
        vals = []
        for k in range(cnt):
            p = vals_off + sizes[typ] * k
            if p + sizes[typ] > len(payload):
                raise ValueError("TIFF: tag value out of bounds")
            vals.append(struct.unpack_from(fmts[typ], payload, p)[0])
        tags[t] = (typ, vals)
    return tags


def decode_tiff(payload: bytes) -> DecodedImage:
    """Decode a baseline little-endian TIFF to top-to-bottom RGB."""
    if payload[:4] == b"MM\x00*":
        raise ValueError("TIFF: big-endian not supported")
    if payload[:4] != b"II*\x00" or len(payload) < 8:
        raise ValueError("TIFF: bad header")
    (ifd_off,) = struct.unpack_from("<I", payload, 4)
    tags = _read_ifd(payload, ifd_off)

    def one(t: int, default: int | None = None) -> int:
        if t not in tags:
            if default is None:
                raise ValueError(f"TIFF: missing required tag {t}")
            return default
        return tags[t][1][0]

    width, height = one(256), one(257)
    if width == 0 or height == 0 or width * height > MAX_PIXELS:
        raise ValueError("TIFF: bad geometry")
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    predictor = one(317, 1)
    bits = tags.get(258, (3, [8]))[1]
    if any(b != 8 for b in bits) or spp not in (1, 3):
        raise ValueError("TIFF: only 8-bit gray/RGB supported")
    if photo not in (0, 1, 2):
        raise ValueError("TIFF: unsupported photometric")
    if comp not in (1, 5):
        raise ValueError("TIFF: unsupported compression")
    if predictor not in (1, 2):
        raise ValueError("TIFF: unsupported predictor")
    offsets = tags.get(273, (4, []))[1]
    counts = tags.get(279, (4, []))[1]
    if not offsets or len(offsets) != len(counts):
        raise ValueError("TIFF: bad strip tables")
    rows_per_strip = one(278, height)
    row_bytes = width * spp
    raw = bytearray()
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        if so + sc > len(payload):
            raise ValueError("TIFF: strip out of bounds")
        strip = payload[so:so + sc]
        nrows = min(rows_per_strip, height - si * rows_per_strip)
        if nrows <= 0:
            raise ValueError("TIFF: surplus strip")
        if comp == 5:
            raw += _lzw_decode(strip, nrows * row_bytes)
        else:
            if sc < nrows * row_bytes:
                raise ValueError("TIFF: short uncompressed strip")
            raw += strip[: nrows * row_bytes]
    if len(raw) != height * row_bytes:
        raise ValueError("TIFF: pixel data size mismatch")
    if predictor == 2:                   # horizontal differencing
        und = bytearray(raw)
        for r in range(height):
            base = r * row_bytes
            for x in range(spp, row_bytes):
                und[base + x] = (und[base + x] + und[base + x - spp]) \
                    & 0xFF
        raw = und
    if spp == 1:
        if photo == 0:                   # WhiteIsZero: invert
            raw = bytes(255 - v for v in raw)
        rgb = bytes(v for px in raw for v in (px, px, px))
        return DecodedImage(width, height, "L", "TIFF", rgb)
    return DecodedImage(width, height, "RGB", "TIFF", bytes(raw))
