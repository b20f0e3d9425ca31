"""TIFF codec contracts (the GIF/JPEG spec-vector discipline).

The decoder is pinned independently of the encoder: a clean-room
reference TIFF-LZW decoder (explicit MSB bit cursor, (prefix, suffix)
linked-list table) validates every encoder stream, and hand-assembled
payloads exercise decode paths the encoder never emits (multi-strip,
predictor 2, WhiteIsZero, uncompressed).  Mutation fuzzing pins the
corrupt-payload ValueError net (reference T10 row-isolation).
"""

from __future__ import annotations

import random
import struct

import pytest

from data_ingestion_worker_spark.functions.imagecodec import (
    decode_builtin,
    sniff_format,
)
from data_ingestion_worker_spark.functions.tiffcodec import (
    _lzw_decode,
    _lzw_encode,
    decode_tiff,
    encode_tiff,
)


def _ref_lzw(data: bytes) -> bytes:
    """Clean-room TIFF-LZW reference: MSB-first bit cursor, linked-list
    table, early width change at table size 2^width − 1."""
    bitpos = 0

    def read(width: int) -> int:
        nonlocal bitpos
        v = 0
        for _ in range(width):
            byte = bitpos // 8
            if byte >= len(data):
                raise ValueError("ref: truncated")
            v = (v << 1) | ((data[byte] >> (7 - bitpos % 8)) & 1)
            bitpos += 1
        return v

    def expand(code, prefix, suffix) -> bytes:
        out = bytearray()
        while code is not None:
            out.append(suffix[code])
            code = prefix[code]
        return bytes(reversed(out))

    prefix: dict[int, int | None] = {}
    suffix: dict[int, int] = {}
    out = bytearray()
    width, nxt, prev = 9, 258, None
    while True:
        code = read(width)
        if code == 256:                       # CLEAR
            prefix = {i: None for i in range(256)}
            suffix = {i: i for i in range(256)}
            width, nxt, prev = 9, 258, None
            continue
        if code == 257:                       # EOI
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
            if nxt < 4094:
                prefix[nxt] = prev
                suffix[nxt] = first
                nxt += 1
            out += expand(code, prefix, suffix)
            if nxt == (1 << width) - 1 and width < 12:
                width += 1
        prev = code


def test_lzw_encoder_streams_decode_with_independent_reference():
    rng = random.Random(5)
    cases = [bytes(66), bytes(50000), bytes(i % 3 for i in range(900))]
    for _ in range(100):
        n = rng.randint(1, 6000)
        kind = rng.randrange(3)
        if kind == 0:
            cases.append(bytes(rng.randrange(256) for _ in range(n)))
        elif kind == 1:
            run = rng.randint(1, 40)
            cases.append(bytes((i // run) % 256 for i in range(n)))
        else:
            cases.append(bytes(i % 256 for i in range(n)))
    # table-overflow stream (forces the clear-on-full path)
    cases.append(bytes(rng.randrange(256) for _ in range(80000)))
    for data in cases:
        enc = _lzw_encode(data)
        assert _ref_lzw(enc) == data
        assert _lzw_decode(enc, len(data)) == data


def test_roundtrip_rgb_and_gray_both_compressions():
    rng = random.Random(3)
    for _ in range(30):
        w, h = rng.randint(1, 32), rng.randint(1, 32)
        for mode in ("RGB", "L"):
            spp = 3 if mode == "RGB" else 1
            px = bytes(rng.randrange(256) for _ in range(w * h * spp))
            for comp in (1, 5):
                img = decode_tiff(encode_tiff(w, h, px, mode, comp))
                assert (img.width, img.height, img.mode,
                        img.format) == (w, h, mode, "TIFF")
                expect = px if mode == "RGB" else \
                    bytes(v for p in px for v in (p, p, p))
                assert img.pixels == expect


def test_sniff_and_builtin_dispatch():
    payload = encode_tiff(2, 2, bytes(range(12)), "RGB", 5)
    assert sniff_format(payload) == "TIFF"
    img = decode_builtin(payload)
    assert img.pixels == bytes(range(12))


# --------------------------------------------------------------------------
# Hand-assembled payloads for decoder-only paths.


def _manual_tiff(width, height, strips, extra_tags, spp=1, comp=1):
    """Assemble a little-endian TIFF directly: strips is a list of raw
    strip byte strings; extra_tags maps tag -> (type, [values])."""
    data = b"".join(strips)
    offs, pos = [], 8
    for s in strips:
        offs.append(pos)
        pos += len(s)
    ifd_off = pos + (pos % 2)
    tags = {
        256: (3, [width]), 257: (3, [height]),
        258: (3, [8] * spp), 259: (3, [comp]),
        262: (3, [2 if spp == 3 else 1]),
        273: (4, offs), 277: (3, [spp]),
        279: (4, [len(s) for s in strips]),
        284: (3, [1]),
    }
    tags.update(extra_tags)
    items = sorted(tags.items())
    entries = bytearray()
    overflow = bytearray()
    sizes = {1: 1, 3: 2, 4: 4}
    fmts = {1: "<B", 3: "<H", 4: "<I"}
    ov_base = ifd_off + 2 + 12 * len(items) + 4
    for t, (typ, vals) in items:
        total = sizes[typ] * len(vals)
        packed = b"".join(struct.pack(fmts[typ], v) for v in vals)
        if total <= 4:
            slot = packed + b"\x00" * (4 - total)
            entries += struct.pack("<HHI", t, typ, len(vals)) + slot
        else:
            entries += struct.pack("<HHII", t, typ, len(vals),
                                   ov_base + len(overflow))
            overflow += packed
    out = bytearray(b"II*\x00")
    out += struct.pack("<I", ifd_off)
    out += data
    out += b"\x00" * (ifd_off - 8 - len(data))
    out += struct.pack("<H", len(items)) + entries
    out += struct.pack("<I", 0)
    out += overflow
    return bytes(out)


def test_multi_strip_decode():
    # 2x4 grayscale split into two 2-row strips.
    rows = [bytes((10 * r, 10 * r + 1)) for r in range(4)]
    strips = [rows[0] + rows[1], rows[2] + rows[3]]
    payload = _manual_tiff(2, 4, strips, {278: (3, [2])})
    img = decode_tiff(payload)
    flat = b"".join(rows)
    assert img.pixels == bytes(v for p in flat for v in (p, p, p))


def test_predictor2_horizontal_differencing():
    # Row [5, 7, 4] stored as diffs [5, 2, 253] (mod 256).
    payload = _manual_tiff(3, 1, [bytes((5, 2, 253))],
                           {317: (3, [2]), 278: (3, [1])})
    img = decode_tiff(payload)
    assert img.pixels == bytes(v for p in (5, 7, 4) for v in (p, p, p))


def test_white_is_zero_inverts():
    payload = _manual_tiff(2, 1, [bytes((0, 255))],
                           {262: (3, [0]), 278: (3, [1])})
    img = decode_tiff(payload)
    assert img.pixels == bytes((255, 255, 255, 0, 0, 0))


def test_corrupt_payloads_raise_valueerror():
    good = encode_tiff(3, 3, bytes(range(27)), "RGB", 5)
    bad = [
        b"II*\x00",                            # truncated header
        b"MM\x00*" + good[4:],                 # big-endian unsupported
        good[:20],                             # mid-stream cut
        good[:-4],                             # truncated IFD tail
    ]
    bomb = bytearray(good)
    # ImageWidth tag value -> absurd (find tag 256 in IFD and patch)
    payload = _manual_tiff(1, 1, [b"\x00"], {256: (3, [65535]),
                                             257: (3, [65535])})
    bad.append(payload)
    for p in bad:
        with pytest.raises(ValueError):
            decode_tiff(bytes(p))


def test_mutation_fuzz_never_escapes_valueerror():
    rng = random.Random(424242)
    base = encode_tiff(4, 3, bytes(rng.randrange(256)
                                   for _ in range(36)), "RGB", 5)
    for _ in range(400):
        b = bytearray(base)
        for _ in range(rng.randint(1, 6)):
            op = rng.randrange(3)
            if op == 0 and len(b) > 8:
                b[rng.randrange(4, len(b))] = rng.randrange(256)
            elif op == 1 and len(b) > 10:
                del b[rng.randrange(4, len(b))]
            else:
                b.insert(rng.randrange(4, len(b) + 1), rng.randrange(256))
        try:
            decode_tiff(bytes(b))
        except ValueError:
            pass  # the contract: ValueError or a successful decode
