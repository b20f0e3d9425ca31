"""MP4 (ISO BMFF) Motion-JPEG container contracts (functions/mp4codec.py).

The container is lossless; the per-sample JPEG payloads are lossy — so
the contracts split: box structure, sample tables and timing must be
exact, pixels must honour the JPEG tolerance.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_ingestion_worker_spark.functions.mp4codec import (
    decode_mp4,
    encode_mp4,
)


def _frames(n, w, h, seed=17):
    out = []
    for i in range(n):
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        arr = np.zeros((h, w, 3), np.uint8)
        for c in range(3):
            t = (3 * xx + 2 * yy + seed + 40 * i + 85 * c) % 510
            arr[:, :, c] = np.abs(t - 255).astype(np.uint8)
        out.append(arr.tobytes())
    return out


def test_roundtrip_geometry_timing_and_tolerance():
    for n, w, h in ((1, 8, 8), (3, 16, 8), (5, 13, 11)):
        fr = _frames(n, w, h)
        vid = decode_mp4(encode_mp4(w, h, fr, fps=10))
        assert (vid.width, vid.height, vid.n_frames) == (w, h, n)
        assert vid.sample_format == "jpeg"
        assert vid.duration_ms == n * 100          # fps 10, ts 1000
        for dec, orig in zip(vid.frames, fr):
            d = np.frombuffer(dec, np.uint8).astype(int)
            o = np.frombuffer(orig, np.uint8).astype(int)
            assert int(np.abs(d - o).max()) <= 24


def test_multi_chunk_sample_map_is_honoured():
    # 4 samples -> two chunks of 2; corrupting the second stco offset
    # must break decode (proves the decoder reads stsc/stco, not just
    # a linear mdat walk).
    fr = _frames(4, 8, 8)
    enc = bytearray(encode_mp4(8, 8, fr))
    vid = decode_mp4(bytes(enc))
    assert vid.n_frames == 4
    i = bytes(enc).find(b"stco")
    # stco body: version/flags (4) + count (4) + two uint32 offsets.
    (count,) = struct.unpack_from(">I", enc, i + 8)
    assert count == 2
    struct.pack_into(">I", enc, i + 16, 5)         # bogus chunk-2 offset
    with pytest.raises(ValueError):
        decode_mp4(bytes(enc))


def test_variable_sample_sizes_in_stsz():
    # Content differs per frame, so JPEG sizes differ — the stsz table
    # must carry per-sample sizes (fixed-size field 0).
    enc = encode_mp4(16, 16, _frames(3, 16, 16))
    i = enc.find(b"stsz")
    fixed, n = struct.unpack_from(">II", enc, i + 8)
    assert fixed == 0 and n == 3
    sizes = struct.unpack_from(">3I", enc, i + 16)
    assert len(set(sizes)) > 1


def test_unsupported_codec_rejected():
    enc = encode_mp4(8, 8, _frames(1, 8, 8))
    with pytest.raises(ValueError, match="sample entry"):
        decode_mp4(enc.replace(b"jpeg", b"avc1", 1))


def test_malformed_streams_rejected():
    enc = encode_mp4(8, 8, _frames(2, 8, 8))
    with pytest.raises(ValueError):
        decode_mp4(enc[:60])                       # truncated
    with pytest.raises(ValueError):
        decode_mp4(b"\x00\x00\x00\x08free")        # no ftyp/moov
    with pytest.raises(ValueError):
        encode_mp4(8, 8, [])                       # no frames


def test_encode_is_deterministic():
    fr = _frames(3, 13, 11)
    assert encode_mp4(13, 11, fr) == encode_mp4(13, 11, fr)
