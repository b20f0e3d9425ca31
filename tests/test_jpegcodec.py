"""Baseline + progressive JPEG codec contracts (functions/jpegcodec.py).

JPEG is lossy, so unlike the BMP/PPM/PNG/WAV/AVI codecs the round-trip
contract is a *bounded reconstruction error*, not byte equality.  These
tests pin:

- exact round-trips where the math says they must be exact (uniform
  blocks quantize to a DC-only spectrum);
- error bounds for smooth and adversarial (noise) content;
- decode of a HAND-BUILT single-block grayscale JPEG assembled byte by
  byte from the T.81 spec (canonical Huffman codes, EXTEND, dequant,
  IDCT scale) — independent of the encoder, so a compensating
  encoder/decoder bug pair cannot hide;
- marker/stream structure, padding (non-block-aligned dims), 4:2:0
  MCU interleave, and the corrupt-payload error paths;
- progressive (SOF2): ``decode(encode_jpeg_progressive(x)) ==
  decode(encode_jpeg(x))`` BIT-FOR-BIT (both encoders quantize the same
  coefficients; progressive merely reorders their transmission), a
  hand-built non-interleaved DC+AC scan pair, and progressive corrupt
  paths.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_ingestion_worker_spark.functions.imagecodec import (
    decode_builtin,
    sniff_format,
)
from data_ingestion_worker_spark.functions.jpegcodec import (
    _AC_LUMA_BITS,
    _AC_LUMA_VALS,
    _DC_LUMA_BITS,
    _DC_LUMA_VALS,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _rt(w, h, rgb, q=90, sub="444"):
    enc = encode_jpeg(w, h, rgb.tobytes(), quality=q, subsampling=sub)
    img = decode_jpeg(enc)
    assert (img.width, img.height, img.format) == (w, h, "JPEG")
    dec = np.frombuffer(img.pixels, np.uint8).reshape(h, w, 3)
    return enc, int(np.abs(dec.astype(int) - rgb.astype(int)).max())


def test_uniform_blocks_roundtrip_exactly():
    # A uniform 8x8 block has a DC-only spectrum; at any quality the
    # reconstruction must be bit-exact for these values (the DC error
    # divides out through the /8 basis scaling and rounding).
    for v in (0, 17, 128, 200, 255):
        rgb = np.full((8, 8, 3), v, np.uint8)
        _, err = _rt(8, 8, rgb)
        assert err == 0, f"uniform {v}: err={err}"


def test_smooth_gradient_within_tolerance():
    xx, yy = np.meshgrid(np.arange(16), np.arange(24))
    rgb = np.stack([np.abs((xx * 6 + yy * 3) % 510 - 255),
                    np.abs((xx * 4 + 100) % 510 - 255),
                    np.abs((yy * 7 + 60) % 510 - 255)],
                   axis=-1).astype(np.uint8)
    _, err444 = _rt(16, 24, rgb, q=90, sub="444")
    assert err444 <= 12
    _, err420 = _rt(16, 24, rgb, q=90, sub="420")
    assert err420 <= 32          # chroma decimation costs more
    _, err50 = _rt(16, 24, rgb, q=50, sub="444")
    assert err50 <= 24


def test_noise_bounded_at_444():
    rng = np.random.RandomState(3)
    rgb = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    _, err = _rt(16, 16, rgb, q=90, sub="444")
    assert err <= 40             # measured 26; quantization-bound slack


def test_non_block_aligned_dims_pad_and_crop():
    rng = np.random.RandomState(5)
    for (w, h) in ((13, 11), (9, 16), (8, 10), (17, 17)):
        rgb = rng.randint(0, 256, (h, w, 3)).astype(np.uint8)
        for sub in ("444", "420"):
            img = decode_jpeg(encode_jpeg(w, h, rgb.tobytes(),
                                          subsampling=sub))
            assert (img.width, img.height) == (w, h)
            assert len(img.pixels) == w * h * 3


def test_encode_is_deterministic_and_wellformed():
    rgb = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    a = encode_jpeg(8, 8, rgb.tobytes())
    b = encode_jpeg(8, 8, rgb.tobytes())
    assert a == b
    assert a[:3] == b"\xff\xd8\xff" and a[-2:] == b"\xff\xd9"
    assert sniff_format(a) == "JPEG"
    assert decode_builtin(a).format == "JPEG"


def _hand_built_gray_block(dc_quantized: int = 5) -> bytes:
    """A single-block 8x8 grayscale baseline JPEG assembled from the
    spec: uniform quant table 16, Annex-K luma Huffman tables, entropy
    data = DC diff 5 (category 3: code '100', amplitude '101') + EOB
    ('1010'), 1-padded to a byte boundary -> bytes 0x96 0xBF.

    Expected decode: dequantized DC 5*16=80; IDCT of a DC-only block is
    the constant 80/8 = 10; +128 level shift -> every pixel 138.
    """
    assert dc_quantized == 5, "entropy bits below encode exactly diff=5"
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([16] * 64)
    sof = bytes((8,)) + struct.pack(">HH", 8, 8) + bytes((1, 1, 0x11, 0))
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    for cls, bits, vals in ((0, _DC_LUMA_BITS, _DC_LUMA_VALS),
                            (1, _AC_LUMA_BITS, _AC_LUMA_VALS)):
        body = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    sos = bytes((1, 1, 0x00, 0, 63, 0))
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += bytes((0x96, 0xBF))           # 100 101 1010 + '111111' pad
    out += b"\xff\xd9"
    return bytes(out)


def test_hand_built_spec_vector_decodes_exactly():
    img = decode_jpeg(_hand_built_gray_block())
    assert (img.width, img.height, img.mode, img.format) \
        == (8, 8, "L", "JPEG")
    assert img.pixels == bytes([138]) * (8 * 8 * 3)   # L expanded to RGB


def test_error_paths():
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG")                        # wrong magic
    good = _hand_built_gray_block()
    with pytest.raises(ValueError):
        decode_jpeg(good[:40])                         # truncated stream
    # A baseline-shaped scan (Ss=0, Se=63) inside an SOF2 frame is
    # malformed — a progressive DC scan must have Se=0.
    prog = good.replace(b"\xff\xc0", b"\xff\xc2")
    with pytest.raises(ValueError):
        decode_jpeg(prog)
    # Decompression-bomb guard: tiny payload declaring huge geometry.
    bomb = bytearray(good)
    i = bomb.find(b"\xff\xc0") + 5
    struct.pack_into(">HH", bomb, i, 0xFFFF, 0xFFFF)
    with pytest.raises(ValueError):
        decode_jpeg(bytes(bomb))
    with pytest.raises(ValueError):
        encode_jpeg(4, 4, b"\x00" * 10)                # bad buffer length


def test_grayscale_l_mode_expansion_matches_png_contract():
    # DecodedImage contract: 'L' pixels arrive pre-expanded to 3-byte
    # RGB (imagecodec.DecodedImage docstring) — bytes_per_pixel is 3.
    img = decode_jpeg(_hand_built_gray_block())
    assert img.bytes_per_pixel == 3
    assert len(img.pixels) == img.width * img.height * 3


def test_restart_interval_resets_dc_predictor():
    """Hand-built two-MCU grayscale JPEG with DRI=1 and an RST0 marker
    between blocks: the decoder must byte-align at the restart, skip
    the marker, and RESET the DC predictor — so two identical DC-diff
    encodings produce two identical blocks (without the reset the
    second block would decode to 2x the DC)."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([16] * 64)
    # SOF0: 8-bit, 8 rows x 16 cols, 1 component 1x1 -> two MCUs.
    sof = bytes((8,)) + struct.pack(">HH", 8, 16) + bytes((1, 1, 0x11, 0))
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    for cls, bits, vals in ((0, _DC_LUMA_BITS, _DC_LUMA_VALS),
                            (1, _AC_LUMA_BITS, _AC_LUMA_VALS)):
        body = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    out += b"\xff\xdd" + struct.pack(">HH", 4, 1)      # DRI = 1 MCU
    sos = bytes((1, 1, 0x00, 0, 63, 0))
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    block = bytes((0x96, 0xBF))      # DC diff 5 + EOB, 1-padded
    out += block + b"\xff\xd0" + block                 # RST0 between
    out += b"\xff\xd9"
    img = decode_jpeg(bytes(out))
    assert (img.width, img.height, img.mode) == (16, 8, "L")
    # Both blocks uniform 138 (5*16/8 + 128) — predictor reset proven.
    assert img.pixels == bytes([138]) * (16 * 8 * 3)


def test_422_asymmetric_sampling_roundtrip():
    """4:2:2 (h=2, v=1) exercises the decoder's asymmetric upsample
    path — chroma repeats horizontally only."""
    xx, yy = np.meshgrid(np.arange(20), np.arange(13))
    rgb = np.stack([np.abs((xx * 5 + yy * 4) % 510 - 255),
                    np.abs((xx * 3 + 80) % 510 - 255),
                    np.abs((yy * 6 + 10) % 510 - 255)],
                   axis=-1).astype(np.uint8)
    enc = encode_jpeg(20, 13, rgb.tobytes(), quality=90,
                      subsampling="422")
    # SOF declares 2x1 sampling for Y.
    i = enc.find(b"\xff\xc0")
    assert enc[i + 11] == 0x21
    img = decode_jpeg(enc)
    assert (img.width, img.height) == (20, 13)
    dec = np.frombuffer(img.pixels, np.uint8).reshape(13, 20, 3)
    assert int(np.abs(dec.astype(int) - rgb.astype(int)).max()) <= 16


# --------------------------------------------------------------------------
# Progressive (SOF2)


@pytest.mark.parametrize("dims", [(8, 8), (20, 13), (33, 17)])
@pytest.mark.parametrize("sub", ["444", "422", "420"])
def test_progressive_decodes_bit_identical_to_baseline(dims, sub):
    """The strongest possible progressive contract: both encoders
    quantize the exact same coefficient blocks, so the decoded pixels
    must be BIT-identical — any divergence in the scan encoders, the
    successive-approximation refinement, the EOB-run bookkeeping or the
    non-interleaved block geometry breaks equality."""
    w, h = dims
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    rgb = np.stack([np.abs((xx * 7 + yy * 3) % 510 - 255),
                    np.abs((xx * 2 + yy * 5 + 60) % 510 - 255),
                    np.abs((yy * 9 + 11) % 510 - 255)],
                   axis=-1).astype(np.uint8)
    base = decode_jpeg(encode_jpeg(w, h, rgb.tobytes(), 85, sub))
    prog = decode_jpeg(
        encode_jpeg_progressive(w, h, rgb.tobytes(), 85, sub))
    assert (prog.width, prog.height, prog.mode) == (w, h, "RGB")
    assert prog.pixels == base.pixels


def test_progressive_stream_is_sof2_and_deterministic():
    rgb = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    a = encode_jpeg_progressive(16, 16, rgb.tobytes())
    b = encode_jpeg_progressive(16, 16, rgb.tobytes())
    assert a == b
    assert b"\xff\xc2" in a and b"\xff\xc0" not in a[2:]
    assert a[:2] == b"\xff\xd8" and a[-2:] == b"\xff\xd9"
    # libjpeg's default script: 10 scans for 3-component YCbCr.
    assert a.count(b"\xff\xda") >= 10
    assert sniff_format(a) == "JPEG"


def test_progressive_decode_is_bit_stable():
    xx, yy = np.meshgrid(np.arange(24), np.arange(16))
    rgb = np.stack([xx * 10 % 256, yy * 14 % 256, (xx + yy) * 6 % 256],
                   axis=-1).astype(np.uint8)
    enc = encode_jpeg_progressive(24, 16, rgb.tobytes(), 75, "420")
    assert decode_jpeg(enc).pixels == decode_jpeg(enc).pixels


def _hand_built_gray_progressive() -> bytes:
    """Single-component 8x8 SOF2 stream with a NON-INTERLEAVED DC scan
    (ns=1 exercises the component-grid traversal the 3-component
    encoder never emits) followed by a full-band AC scan at Ah=Al=0.
    Entropy bytes reuse the spec vector of the baseline hand-built
    block (DC diff 5, all AC zero), so the decode must equal the
    baseline hand-built image: every pixel 138."""
    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([16] * 64)
    sof = bytes((8,)) + struct.pack(">HH", 8, 8) + bytes((1, 1, 0x11, 0))
    out += b"\xff\xc2" + struct.pack(">H", len(sof) + 2) + sof
    for cls, bits, vals in ((0, _DC_LUMA_BITS, _DC_LUMA_VALS),
                            (1, _AC_LUMA_BITS, _AC_LUMA_VALS)):
        body = bytes([cls << 4]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body
    # Scan 1: DC only, Ss=Se=0, Ah=Al=0; diff 5 = '100' + '101',
    # 1-padded -> 1001011 1 -> 0x97.
    sos = bytes((1, 1, 0x00, 0, 0, 0x00))
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += bytes((0x97,))
    # Scan 2: AC 1..63, Ah=Al=0; EOB = '1010', 1-padded -> 0xAF.
    sos = bytes((1, 1, 0x00, 1, 63, 0x00))
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += bytes((0xAF,))
    out += b"\xff\xd9"
    return bytes(out)


def test_hand_built_progressive_noninterleaved_scans():
    img = decode_jpeg(_hand_built_gray_progressive())
    assert (img.width, img.height, img.mode, img.format) \
        == (8, 8, "L", "JPEG")
    assert img.pixels == bytes([138]) * (8 * 8 * 3)


def test_progressive_corrupt_paths():
    rgb = np.arange(16 * 16 * 3, dtype=np.uint8).reshape(16, 16, 3)
    good = encode_jpeg_progressive(16, 16, rgb.tobytes())
    with pytest.raises(ValueError):
        decode_jpeg(good[:60])                         # truncated headers
    with pytest.raises(ValueError):
        decode_jpeg(good[:-40])                        # truncated scans
    # SOF2 frame with no scans at all.
    i = good.find(b"\xff\xda")
    with pytest.raises(ValueError):
        decode_jpeg(good[:i] + b"\xff\xd9")
    # Flipped entropy bytes must error or decode — never crash with a
    # non-ValueError (the mapInPandas corrupt-payload contract).
    flipped = bytearray(good)
    for j in range(i + 20, min(len(flipped) - 2, i + 60)):
        flipped[j] ^= 0x55
    try:
        decode_jpeg(bytes(flipped))
    except ValueError:
        pass
