"""Dependency-free image codecs: uncompressed BMP and binary PPM.

The container ships no Pillow/libav, but a multimodal pipeline's decode
stage must still be exercisable end-to-end with REAL bytes-to-pixels
work (reference `src/services/s3_service.py` fetches real objects; the
decode stage here is the Spark-side analogue).  These two formats are
simple enough to decode correctly in pure Python with zero dependencies:

- **BMP** (Windows bitmap, ``BITMAPINFOHEADER``, BI_RGB uncompressed,
  8-bit palette / 24-bit BGR / 32-bit BGRA) — the classic uncompressed
  interchange format.
- **PPM** (``P6`` binary Portable Pixmap, maxval <= 255) — the simplest
  raster format in existence.
- **PNG** (8-bit non-interlaced; gray/RGB/palette/RGBA, all five
  scanline filters) lives in the sibling ``pngcodec`` module —
  DEFLATE comes from the stdlib ``zlib``, so it is dependency-free
  too; ``sniff_format``/``decode_builtin`` route it here.

Decoders return header metadata plus fully decoded top-to-bottom RGB
pixel bytes, and raise ``ValueError`` on malformed input (callers treat
that as a corrupt payload and emit NULL metadata — row-level error
isolation, reference T10).  ``encode_bmp`` / ``encode_ppm`` exist so
tests can build real fixtures in-container.

These run per-payload inside Arrow-batched ``mapInPandas`` stages — the
sanctioned Python-in-the-loop shape; nothing here touches Spark.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

BI_RGB = 0  # the only BMP compression mode supported (uncompressed)


@dataclass(frozen=True)
class DecodedImage:
    width: int
    height: int
    mode: str      # 'L' (grayscale), 'P' (palette source), 'RGB',
                   # 'RGBA' — Pillow naming; L/P pixels arrive
                   # pre-expanded to 3-byte RGB by the decoders
    format: str    # 'BMP' | 'PPM'
    pixels: bytes  # top-to-bottom RGB (3 bytes/px) or RGBA (4 bytes/px)

    @property
    def bytes_per_pixel(self) -> int:
        return 4 if self.mode == "RGBA" else 3


def sniff_format(payload: bytes) -> str | None:
    """Return 'BMP' / 'PPM' / 'PNG' / 'JPEG' when the magic matches a
    builtin codec."""
    if payload[:2] == b"BM":
        return "BMP"
    if payload[:2] == b"P6":
        return "PPM"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "PNG"
    if payload[:3] == b"\xff\xd8\xff":
        return "JPEG"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "GIF"
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return "TIFF"
    return None


# --------------------------------------------------------------------------
# BMP


def decode_bmp(payload: bytes) -> DecodedImage:
    """Decode an uncompressed BMP (8-bit palette, 24-bit, or 32-bit).

    Handles both bottom-up (positive height — the common case) and
    top-down (negative height) row order; output pixels are always
    top-to-bottom.  Raises ValueError on anything malformed or on
    unsupported bit depths / compression.
    """
    if len(payload) < 54:
        raise ValueError("BMP: truncated header")
    if payload[:2] != b"BM":
        raise ValueError("BMP: bad magic")
    pixel_offset = struct.unpack_from("<I", payload, 10)[0]
    dib_size = struct.unpack_from("<I", payload, 14)[0]
    if dib_size < 40:
        raise ValueError(f"BMP: unsupported DIB header size {dib_size}")
    width, raw_height = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if planes != 1:
        raise ValueError(f"BMP: planes must be 1, got {planes}")
    if compression != BI_RGB:
        raise ValueError(f"BMP: unsupported compression {compression}")
    if bpp not in (8, 24, 32):
        raise ValueError(f"BMP: unsupported bit depth {bpp}")
    if width <= 0 or raw_height == 0:
        raise ValueError(f"BMP: bad dimensions {width}x{raw_height}")
    top_down = raw_height < 0
    height = abs(raw_height)

    palette: list[bytes] = []
    if bpp == 8:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or 256
        pal_off = 14 + dib_size
        if pal_off + 4 * n_colors > len(payload):
            raise ValueError("BMP: truncated palette")
        for i in range(n_colors):
            b, g, r, _ = payload[pal_off + 4 * i: pal_off + 4 * i + 4]
            palette.append(bytes((r, g, b)))

    stride = ((bpp * width + 31) // 32) * 4  # rows pad to 4-byte boundary
    if pixel_offset + stride * height > len(payload):
        raise ValueError("BMP: truncated pixel array")

    rows: list[bytes] = []
    for row in range(height):
        src_row = row if top_down else height - 1 - row
        base = pixel_offset + src_row * stride
        if bpp == 24:
            out = bytearray(width * 3)
            for x in range(width):
                b, g, r = payload[base + 3 * x: base + 3 * x + 3]
                out[3 * x: 3 * x + 3] = (r, g, b)
            rows.append(bytes(out))
        elif bpp == 32:
            out = bytearray(width * 4)
            for x in range(width):
                b, g, r, a = payload[base + 4 * x: base + 4 * x + 4]
                out[4 * x: 4 * x + 4] = (r, g, b, a)
            rows.append(bytes(out))
        else:  # 8-bit palette -> RGB
            out = bytearray(width * 3)
            for x in range(width):
                idx = payload[base + x]
                if idx >= len(palette):
                    raise ValueError(f"BMP: palette index {idx} out of range")
                out[3 * x: 3 * x + 3] = palette[idx]
            rows.append(bytes(out))

    mode = {8: "P", 24: "RGB", 32: "RGBA"}[bpp]
    return DecodedImage(width, height, mode, "BMP", b"".join(rows))


def encode_bmp(width: int, height: int, rgb: bytes) -> bytes:
    """Encode top-to-bottom RGB bytes as a 24-bit bottom-up BI_RGB BMP."""
    if len(rgb) != width * height * 3:
        raise ValueError("encode_bmp: rgb length != width*height*3")
    stride = ((24 * width + 31) // 32) * 4
    pad = b"\x00" * (stride - width * 3)
    body = bytearray()
    for row in range(height - 1, -1, -1):  # bottom-up storage
        for x in range(width):
            r, g, b = rgb[(row * width + x) * 3: (row * width + x) * 3 + 3]
            body += bytes((b, g, r))
        body += pad
    pixel_offset = 14 + 40
    file_size = pixel_offset + len(body)
    header = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_offset)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, BI_RGB,
                      len(body), 2835, 2835, 0, 0)
    return header + dib + bytes(body)


# --------------------------------------------------------------------------
# PPM (P6 binary)


def _ppm_token(payload: bytes, pos: int) -> tuple[bytes, int]:
    """Next whitespace-delimited token, skipping '#' comments."""
    n = len(payload)
    while pos < n:
        c = payload[pos: pos + 1]
        if c == b"#":
            while pos < n and payload[pos: pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            pos += 1
        else:
            break
    start = pos
    while pos < n and not payload[pos: pos + 1].isspace():
        pos += 1
    if start == pos:
        raise ValueError("PPM: truncated header")
    return payload[start:pos], pos


def decode_ppm(payload: bytes) -> DecodedImage:
    """Decode a binary ``P6`` PPM with maxval <= 255."""
    magic, pos = _ppm_token(payload, 0)
    if magic != b"P6":
        raise ValueError("PPM: bad magic")
    fields = []
    for _ in range(3):
        tok, pos = _ppm_token(payload, pos)
        if not tok.isdigit():
            raise ValueError(f"PPM: non-numeric header field {tok!r}")
        fields.append(int(tok))
    width, height, maxval = fields
    if width <= 0 or height <= 0:
        raise ValueError(f"PPM: bad dimensions {width}x{height}")
    if not 0 < maxval <= 255:
        raise ValueError(f"PPM: unsupported maxval {maxval}")
    pos += 1  # exactly one whitespace byte after maxval
    need = width * height * 3
    pixels = payload[pos: pos + need]
    if len(pixels) < need:
        raise ValueError("PPM: truncated pixel data")
    return DecodedImage(width, height, "RGB", "PPM", bytes(pixels))


def encode_ppm(width: int, height: int, rgb: bytes) -> bytes:
    """Encode top-to-bottom RGB bytes as a binary P6 PPM."""
    if len(rgb) != width * height * 3:
        raise ValueError("encode_ppm: rgb length != width*height*3")
    return b"P6\n%d %d\n255\n" % (width, height) + rgb


def decode_builtin(payload: bytes) -> DecodedImage:
    """Dispatch to the builtin codec matching the payload's magic.

    Raises ValueError for unknown magics — the caller's corrupt-payload
    path (NULL metadata) handles it.
    """
    fmt = sniff_format(payload)
    if fmt == "BMP":
        return decode_bmp(payload)
    if fmt == "PPM":
        return decode_ppm(payload)
    if fmt == "PNG":
        from .pngcodec import decode_png  # deferred: pngcodec imports us

        return decode_png(payload)
    if fmt == "JPEG":
        from .jpegcodec import decode_jpeg  # deferred: jpegcodec imports us

        return decode_jpeg(payload)
    if fmt == "GIF":
        from .gifcodec import decode_gif_still  # deferred: imports us

        return decode_gif_still(payload)
    if fmt == "TIFF":
        from .tiffcodec import decode_tiff  # deferred: imports us

        return decode_tiff(payload)
    raise ValueError(
        "no builtin codec for payload (not BMP/PPM/PNG/JPEG/GIF/TIFF)")
