"""Corrupt-payload robustness for every builtin codec (reference T10).

The row-level error-isolation contract upstream (NULL metadata instead
of a failed Arrow batch) catches ``ValueError`` — so a mutated payload
must either decode or raise exactly ``ValueError`` (wrapped parse
errors), never ``IndexError``/``KeyError``/``struct.error``/
``ZeroDivisionError`` or an unbounded loop.  Deterministic mutation
fuzzing: byte flips, truncations and length-field scrambles over valid
fixtures from each encoder.
"""

from __future__ import annotations

import random

import numpy as np

from data_ingestion_worker_spark.functions.audiocodec import (
    decode_wav,
    encode_wav,
)
from data_ingestion_worker_spark.functions.imagecodec import encode_bmp
from data_ingestion_worker_spark.functions.jpegcodec import (
    decode_jpeg,
    encode_jpeg,
)
from data_ingestion_worker_spark.functions.mp4codec import (
    decode_mp4,
    encode_mp4,
)
from data_ingestion_worker_spark.functions.pngcodec import (
    decode_png,
    encode_png,
)
from data_ingestion_worker_spark.functions.videocodec import (
    decode_avi,
    encode_avi,
)
from data_ingestion_worker_spark.functions.imagecodec import decode_bmp

N_MUTATIONS = 150


def _fuzz(decoder, payload: bytes, seed: int) -> None:
    rng = random.Random(seed)
    for i in range(N_MUTATIONS):
        b = bytearray(payload)
        kind = i % 3
        if kind == 0:                      # flip 1-4 random bytes
            for _ in range(rng.randint(1, 4)):
                b[rng.randrange(len(b))] = rng.randrange(256)
        elif kind == 1:                    # truncate
            del b[rng.randrange(1, len(b)):]
        else:                              # scramble a 4-byte window
            p = rng.randrange(max(1, len(b) - 4))
            b[p:p + 4] = bytes(rng.randrange(256) for _ in range(4))
        try:
            decoder(bytes(b))
        except ValueError:
            pass                           # the contract
        # Any other exception type propagates and fails the test.


def _gradient(w, h):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    arr = np.stack([np.abs((3 * xx + 2 * yy + 85 * c) % 510 - 255)
                    for c in range(3)], axis=-1).astype(np.uint8)
    return arr.tobytes()


def test_fuzz_jpeg():
    _fuzz(decode_jpeg, encode_jpeg(16, 11, _gradient(16, 11)), 1)


def test_fuzz_png():
    _fuzz(decode_png, encode_png(9, 7, _gradient(9, 7)), 2)


def test_fuzz_bmp():
    _fuzz(decode_bmp, encode_bmp(9, 7, _gradient(9, 7)), 3)


def test_fuzz_mp4():
    _fuzz(decode_mp4, encode_mp4(8, 8, [_gradient(8, 8),
                                        _gradient(8, 8)]), 4)


def test_fuzz_avi():
    _fuzz(decode_avi, encode_avi(8, 6, [_gradient(8, 6)]), 5)


def test_fuzz_wav():
    _fuzz(decode_wav, encode_wav(8000, 2, bytes(range(64))), 6)


def test_fuzz_jpeg_progressive():
    from data_ingestion_worker_spark.functions.jpegcodec import (
        encode_jpeg_progressive,
    )

    _fuzz(decode_jpeg, encode_jpeg_progressive(16, 11, _gradient(16, 11)),
          7)


def test_fuzz_avi_mjpeg():
    from data_ingestion_worker_spark.functions.videocodec import (
        demux_avi_mjpeg,
        encode_avi_mjpeg,
    )

    fixture = encode_avi_mjpeg(8, 6, [_gradient(8, 6), _gradient(8, 6)])
    _fuzz(decode_avi, fixture, 8)
    _fuzz(lambda b: demux_avi_mjpeg(b), fixture, 9)
