"""Dependency-free audio codec: PCM WAV (RIFF) parse/emit.

The audio counterpart of ``imagecodec``: a real bytes-to-samples path
that runs in-container with zero dependencies, so the multimodal decode
stage can exercise genuine audio work (reference ingests real objects;
this is the Spark-side decode analogue).  Covers the format every
training corpus of raw audio actually stores: uncompressed little-endian
PCM inside a RIFF/WAVE container.

``decode_wav`` walks the chunk list properly (skipping LIST/fact/cue and
other non-essential chunks), validates the fmt chunk, and returns header
metadata plus the raw PCM frames; malformed input raises ``ValueError``
(callers treat it as a corrupt payload and emit NULL metadata — row-level
error isolation, reference T10).  ``encode_wav`` exists so tests and the
parity-gated round-trip query can build real fixtures in-container.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

PCM_FORMAT = 1  # WAVE_FORMAT_PCM — the only format supported


@dataclass(frozen=True)
class DecodedWav:
    sample_rate: int
    channels: int
    bits_per_sample: int
    n_frames: int
    pcm: bytes  # raw little-endian PCM frames, as stored

    @property
    def duration_us(self) -> int:
        """Duration in integer microseconds (exact, engine-portable)."""
        return self.n_frames * 1_000_000 // self.sample_rate


def decode_wav(payload: bytes) -> DecodedWav:
    """Decode a PCM RIFF/WAVE payload (8/16/24/32-bit, any rate)."""
    if len(payload) < 12:
        raise ValueError("WAV: truncated RIFF header")
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("WAV: bad magic")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        body_start = pos + 8
        if body_start + size > len(payload):
            raise ValueError(f"WAV: truncated {cid!r} chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("WAV: fmt chunk too small")
            (audio_format, channels, sample_rate, _byte_rate,
             _block_align, bits) = struct.unpack_from("<HHIIHH",
                                                      payload, body_start)
            if audio_format != PCM_FORMAT:
                raise ValueError(f"WAV: unsupported format {audio_format}")
            if channels < 1 or sample_rate < 1:
                raise ValueError("WAV: bad channels/sample_rate")
            if bits not in (8, 16, 24, 32):
                raise ValueError(f"WAV: unsupported bit depth {bits}")
            fmt = (channels, sample_rate, bits)
        elif cid == b"data":
            data = payload[body_start:body_start + size]
        pos = body_start + size + (size & 1)  # chunks pad to even offsets
    if fmt is None:
        raise ValueError("WAV: missing fmt chunk")
    if data is None:
        raise ValueError("WAV: missing data chunk")
    channels, sample_rate, bits = fmt
    frame_size = channels * bits // 8
    if len(data) % frame_size:
        raise ValueError("WAV: data chunk not a whole number of frames")
    return DecodedWav(sample_rate, channels, bits,
                      len(data) // frame_size, data)


def encode_wav(sample_rate: int, channels: int, pcm16: bytes) -> bytes:
    """Emit a minimal 16-bit PCM RIFF/WAVE container."""
    if len(pcm16) % (2 * channels):
        raise ValueError("encode_wav: pcm16 length not a whole frame count")
    block_align = 2 * channels
    fmt = struct.pack("<HHIIHH", PCM_FORMAT, channels, sample_rate,
                      sample_rate * block_align, block_align, 16)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(pcm16)) + pcm16
              + (b"\x00" if len(pcm16) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks
