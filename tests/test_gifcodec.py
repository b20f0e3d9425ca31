"""GIF codec contracts.

Discipline mirrors test_jpegcodec.py: the decoder is pinned
INDEPENDENTLY of the encoder — a from-first-principles reference LZW
decoder validates every encoder stream, and hand-assembled payloads
(interlace, sub-rect compositing, transparency, disposal) exercise
decode paths the encoder never emits.  Mutation fuzzing pins the
corrupt-payload ValueError net (reference T10 row-isolation).
"""

from __future__ import annotations

import random
import struct

import pytest

from data_ingestion_worker_spark.functions.gifcodec import (
    _lzw_decode,
    _lzw_encode,
    _sub_blocks,
    decode_gif,
    decode_gif_still,
    encode_gif,
    encode_gif_rgb,
)
from data_ingestion_worker_spark.functions.imagecodec import (
    decode_builtin,
    sniff_format,
)


# --------------------------------------------------------------------------
# Independent reference LZW decoder (clean-room: explicit bit cursor,
# (prefix, suffix) linked-list table — a different data structure from
# the codec's bytes-table, so a shared bug cannot hide).


def _ref_lzw(data: bytes, mcs: int) -> bytes:
    bitpos = 0

    def read(width: int) -> int:
        nonlocal bitpos
        v = 0
        for k in range(width):
            byte = bitpos // 8
            if byte >= len(data):
                raise ValueError("ref: truncated")
            v |= ((data[byte] >> (bitpos % 8)) & 1) << k
            bitpos += 1
        return v

    clear, eoi = 1 << mcs, (1 << mcs) + 1

    def expand(code: int, prefix, suffix) -> bytes:
        out = bytearray()
        while code is not None:
            out.append(suffix[code])
            code = prefix[code]
        return bytes(reversed(out))

    prefix: dict[int, int | None] = {}
    suffix: dict[int, int] = {}
    out = bytearray()
    width = mcs + 1
    nxt = eoi + 1
    prev = None
    while True:
        code = read(width)
        if code == clear:
            prefix = {i: None for i in range(clear)}
            suffix = {i: i for i in range(clear)}
            nxt, width, prev = eoi + 1, mcs + 1, None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            out += expand(code, prefix, suffix)
        else:
            if code < nxt:
                first = expand(code, prefix, suffix)[0]
            elif code == nxt:
                first = expand(prev, prefix, suffix)[0]
            else:
                raise ValueError("ref: bad code")
            if nxt < 4096:
                prefix[nxt] = prev
                suffix[nxt] = first
                nxt += 1
            out += expand(code, prefix, suffix)
            if nxt == (1 << width) and width < 12:
                width += 1
        prev = code


def test_lzw_encoder_streams_decode_with_independent_reference():
    rng = random.Random(42)
    cases = [bytes(66), bytes([0] * 50000),
             bytes(i % 4 for i in range(1000))]
    for _ in range(120):
        mcs = rng.randint(2, 8)
        n = rng.randint(1, 6000)
        kind = rng.randrange(3)
        if kind == 0:
            cases.append(bytes(rng.randrange(1 << mcs)
                               for _ in range(n)))
        elif kind == 1:
            run = rng.randint(1, 40)
            cases.append(bytes((i // run) % (1 << mcs) for i in range(n)))
        else:
            cases.append(bytes(i % (1 << mcs) for i in range(n)))
    for data in cases:
        mcs = max(2, max(data).bit_length()) if data else 2
        enc = _lzw_encode(data, mcs)
        assert _ref_lzw(enc, mcs) == data
        assert _lzw_decode(enc, mcs, len(data)) == data


def test_lzw_table_overflow_emits_clear_and_stays_in_sync():
    rng = random.Random(9)
    data = bytes(rng.randrange(200) for _ in range(60000))  # fills 4096
    enc = _lzw_encode(data, 8)
    assert _ref_lzw(enc, 8) == data
    assert _lzw_decode(enc, 8, len(data)) == data


def test_roundtrip_still_and_animated():
    rng = random.Random(7)
    for _ in range(40):
        w, h = rng.randint(1, 30), rng.randint(1, 30)
        cols = [(rng.randrange(256),) * 3 for _ in range(rng.randint(1, 6))]
        nfr = rng.randint(1, 4)
        frames = [b"".join(bytes(cols[rng.randrange(len(cols))])
                           for _ in range(w * h)) for _ in range(nfr)]
        delays = [7 * i for i in range(nfr)]
        g = decode_gif(encode_gif_rgb(w, h, frames, delays))
        assert (g.width, g.height) == (w, h)
        assert g.frames == frames
        if nfr > 1:
            assert g.delays_cs == delays


def test_sniff_and_builtin_dispatch():
    payload = encode_gif_rgb(2, 2, [bytes(range(12))])
    assert sniff_format(payload) == "GIF"
    img = decode_builtin(payload)
    assert (img.width, img.height, img.mode, img.format) == \
        (2, 2, "P", "GIF")
    assert img.pixels == bytes(range(12))
    assert decode_gif_still(payload).pixels == img.pixels


# --------------------------------------------------------------------------
# Hand-assembled payloads for decode-only paths.


def _manual_gif(width, height, palette, descriptors, gces=None):
    """Assemble a GIF89a byte stream directly (descriptors: list of
    (fx, fy, fw, fh, iflags, indices); gces: optional per-image GCE
    bytes-4 payloads)."""
    n = len(palette)
    size, exp = 2, 0
    while size < max(n, 2):
        size <<= 1
        exp += 1
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes((0x80 | exp, 0, 0))
    for c in palette:
        out += bytes(c)
    out += b"\x00" * (3 * (size - n))
    mcs = max(2, exp + 1)
    for i, (fx, fy, fw, fh, iflags, idx) in enumerate(descriptors):
        if gces and gces[i] is not None:
            out += b"\x21\xf9\x04" + gces[i] + b"\x00"
        out += b"\x2c" + struct.pack("<HHHH", fx, fy, fw, fh)
        out += bytes((iflags,))
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(idx, mcs))
    out += b"\x3b"
    return bytes(out)


def test_interlaced_frame_deinterlaces():
    # 4x8 two-color: row r is color r%2.  Interlace pass order for
    # height 8: rows 0, 4, 2, 6, 1, 3, 5, 7.
    w, h = 4, 8
    sequential = [bytes([r % 2] * w) for r in range(h)]
    stored = b"".join(sequential[r] for r in (0, 4, 2, 6, 1, 3, 5, 7))
    payload = _manual_gif(
        w, h, [(0, 0, 0), (255, 255, 255)],
        [(0, 0, w, h, 0x40, stored)])
    g = decode_gif(payload)
    expect = b"".join(bytes(c) * w for r in range(h)
                      for c in [[(0, 0, 0), (255, 255, 255)][r % 2]])
    assert g.frames[0] == expect


def test_subrect_composite_and_transparency():
    # Frame 1: full 4x4 of color 0.  Frame 2: 2x2 rect at (1,1) with
    # [1, transparent, transparent, 1] — transparent pixels must show
    # frame 1's color through.
    pal = [(10, 10, 10), (200, 200, 200), (0, 0, 0)]
    f1 = bytes([0] * 16)
    f2 = bytes([1, 2, 2, 1])
    payload = _manual_gif(
        4, 4, pal,
        [(0, 0, 4, 4, 0, f1), (1, 1, 2, 2, 0, f2)],
        gces=[None, bytes((0x05, 0, 0, 2))])  # disposal 1 + transp idx 2
    g = decode_gif(payload)
    assert len(g.frames) == 2
    base = bytes((10, 10, 10))
    lit = bytes((200, 200, 200))
    rows = [base * 4,
            base + lit + base + base,
            base + base + lit + base,
            base * 4]
    assert g.frames[1] == b"".join(rows)


def test_disposal_background_restores_rect():
    pal = [(1, 1, 1), (2, 2, 2)]
    f1 = bytes([1] * 4)   # 2x2 all color 1
    f2 = bytes([1])       # 1x1 at origin
    payload = _manual_gif(
        2, 2, pal,
        [(0, 0, 2, 2, 0, f1), (0, 0, 1, 1, 0, f2)],
        gces=[bytes((0x08, 0, 0, 0)), None])  # frame1 disposal 2
    g = decode_gif(payload)
    # Frame 1 paints color 1 everywhere; its disposal-2 then resets the
    # rect to the background color (palette[0]) before frame 2 paints
    # its 1x1 of color 1 at the origin.
    assert g.frames[0] == bytes((2, 2, 2)) * 4
    assert g.frames[1] == bytes((2, 2, 2)) + bytes((1, 1, 1)) * 3


def test_local_color_table_overrides_global():
    pal = [(0, 0, 0), (1, 1, 1)]
    idx = bytes([0, 1, 1, 0])
    base = _manual_gif(2, 2, pal, [(0, 0, 2, 2, 0, idx)])
    # Inject an LCT variant: set LCT flag (0x80|exp 0 -> 2 colors) and
    # splice a 2-color table after the descriptor.
    desc_at = base.index(b"\x2c")
    lct = bytes((9, 9, 9, 90, 90, 90))
    patched = (base[:desc_at + 9] + bytes((0x80,)) + lct
               + base[desc_at + 10:])
    g = decode_gif(patched)
    assert g.frames[0] == bytes((9, 9, 9)) + bytes((90, 90, 90)) * 2 \
        + bytes((9, 9, 9))


def test_corrupt_payloads_raise_valueerror():
    good = encode_gif_rgb(3, 3, [bytes(range(27))], [0])
    bad = [
        b"GIF89a",                                 # truncated header
        b"NOTGIF" + good[6:],                      # bad signature
        good[:-1],                                 # missing trailer
        good[:20],                                 # mid-stream cut
    ]
    # geometry bomb: huge logical screen
    bomb = bytearray(good)
    bomb[6:10] = struct.pack("<HH", 65535, 65535)
    bad.append(bytes(bomb))
    # frame rect outside canvas
    esc = bytearray(good)
    at = bytes(esc).index(b"\x2c")
    esc[at + 1:at + 5] = struct.pack("<HH", 2, 2)
    bad.append(bytes(esc))
    # disposal 3
    pal = [(0, 0, 0)]
    d3 = _manual_gif(1, 1, pal, [(0, 0, 1, 1, 0, b"\x00")],
                     gces=[bytes((0x0C, 0, 0, 0))])
    bad.append(d3)
    for payload in bad:
        with pytest.raises(ValueError):
            decode_gif(payload)


def test_mutation_fuzz_never_escapes_valueerror():
    rng = random.Random(31337)
    base = encode_gif_rgb(
        4, 3, [b"".join(bytes((rng.randrange(256),) * 3)
                        for _ in range(12)) for _ in range(2)], [0, 5])
    for _ in range(400):
        b = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            op = rng.randrange(3)
            if op == 0 and len(b) > 8:
                b[rng.randrange(6, len(b))] = rng.randrange(256)
            elif op == 1 and len(b) > 10:
                del b[rng.randrange(6, len(b))]
            else:
                b.insert(rng.randrange(6, len(b) + 1),
                         rng.randrange(256))
        try:
            decode_gif(bytes(b))
        except ValueError:
            pass  # the contract: ValueError or a successful decode
