"""Multimodal-column plumbing: opaque binary payloads + Pandas-UDF decode.

The pattern a 100 TB multimodal pipeline needs: media as an opaque
``binary`` column with typed metadata beside it, and decode / feature
extraction as Arrow-batched ``mapInPandas`` stages (the only sanctioned
Python-in-the-loop shape — vectorized batch in, vectorized batch out,
never row-at-a-time).

``decode_image_real`` is a REAL decoder: the dependency-free builtin
codecs (uncompressed BMP / binary PPM, ``functions.imagecodec``) handle
their formats per-payload via magic-byte sniffing, and Pillow — when the
environment has it — widens coverage to every other format.  The
parity-gated ``mm_roundtrip_*`` registry queries verify the codecs
bytes-to-pixels against an algebraic DuckDB oracle.

``fake_decode_image`` remains alongside it as the clearly-marked
deterministic plumbing stub: it derives "image dimensions" from the
cross-engine md5 hash of the payload, so the *plumbing* — schema
declaration, binary handling, Arrow batch iteration — is oracle-verified
independently of any codec (rare for UDF code; pins the Arrow round-trip
bytes in == bytes out).
"""

from __future__ import annotations

import hashlib
import importlib.util
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..spec import QuerySpec
from ..tables import load_table
from ..functions.checkpoint import cut_lineage

#: True when Pillow is importable — the seam between the deterministic
#: stub decoder (oracle-verified) and the real codec path.
HAS_PIL: bool = importlib.util.find_spec("PIL") is not None

DECODE_SCHEMA = ("doc_id bigint, byte_len int, fake_width int, "
                 "fake_height int, payload_sha string")


def with_payload(documents: DataFrame) -> DataFrame:
    """Attach an opaque binary column (here: the utf-8 bytes of the text —
    a stand-in for image/audio bytes read via ``format('binaryFile')``).

    Every consumer is a per-payload Python codec behind ``mapInPandas``;
    the caller's ``load_table`` spread (``tables.spread_scan``) is what
    keeps a single-row-group input from funnelling the whole decode
    through one task (guide §2.5) — measured 5.4 s → 1.1 s on
    ``mm_roundtrip_jpeg`` at sf0.1/local[32].
    """
    return documents.select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )


def _hash64_py(payload: bytes) -> int:
    """Python twin of functions.hashing.hash64 (same md5-prefix integer)."""
    return int(hashlib.md5(payload).hexdigest()[:15], 16)


def fake_decode_image(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB decoder: deterministic pseudo-metadata instead of real pixels.

    Real implementation would do ``PIL.Image.open(io.BytesIO(b))`` per
    payload inside the same loop; batch shape, Arrow transfer and output
    schema are identical.
    """
    for pdf in batches:
        payloads = pdf["payload"]
        h = payloads.map(_hash64_py)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "byte_len": payloads.map(len).astype("int32"),
            "fake_width": (h % 640).astype("int32"),
            "fake_height": (h % 480).astype("int32"),
            "payload_sha": payloads.map(
                lambda b: hashlib.sha256(b).hexdigest()
            ),
        })


REAL_DECODE_SCHEMA = ("doc_id bigint, byte_len int, width int, "
                      "height int, mode string, format string")


def _pil_meta_fn():
    """Build the Pillow metadata probe (split out so tests can exercise
    the Pillow seam with a monkeypatched ``PIL`` module even in
    containers that don't ship it)."""
    import io

    from PIL import Image

    def _meta(b: bytes):
        try:
            with Image.open(io.BytesIO(b)) as img:
                return (img.width, img.height, img.mode, img.format)
        except Exception:  # noqa: BLE001 — corrupt payload, not a bug
            return (None, None, None, None)

    return _meta


def decode_image_real(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Real image decode, same batch loop as the stub.

    Codec selection is per payload, sniff first: magic bytes route
    BMP/PPM/PNG/JPEG to the dependency-free builtin codecs
    (``functions.imagecodec`` / ``pngcodec`` / ``jpegcodec`` — real
    bytes-to-pixels work, not a stub); anything else falls through to
    Pillow when the environment has it.  A payload the builtin codec
    REJECTS (e.g. a
    valid PNG profile outside the builtin's support: Adam7 interlace,
    16-bit depth) also falls through to Pillow — the builtin owning a
    magic must never shrink coverage below what Pillow alone gave.
    Both seams therefore execute whenever their format appears — neither
    is a dead branch gated on the other's presence.  Undecodable or
    malformed payloads (bad bytes, wrong type, ``None``) yield NULL
    dimensions instead of failing the Arrow batch (row-level error
    isolation, reference T10).
    """
    from ..functions.imagecodec import decode_builtin, sniff_format

    pil_meta = _pil_meta_fn() if HAS_PIL else None

    def _meta(b):
        try:
            raw = bytes(b)
            if sniff_format(raw) is not None:
                try:
                    img = decode_builtin(raw)
                    return (img.width, img.height, img.mode, img.format)
                except ValueError:
                    if pil_meta is None:
                        return (None, None, None, None)
                    # fall through: Pillow may support this profile
            if pil_meta is not None:
                return pil_meta(raw)
        except Exception:  # noqa: BLE001 — corrupt payload, not a bug
            pass
        return (None, None, None, None)

    for pdf in batches:
        metas = pdf["payload"].map(_meta)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "byte_len": pdf["payload"].map(
                lambda b: None if b is None else len(b)
            ).astype("Int32"),
            "width": metas.map(lambda m: m[0]).astype("Int32"),
            "height": metas.map(lambda m: m[1]).astype("Int32"),
            "mode": metas.map(lambda m: m[2]),
            "format": metas.map(lambda m: m[3]),
        })


#: The decode seam: ``decode_image`` is always the real codec path now
#: that the builtin BMP/PPM decoders exist in-container (Pillow widens
#: format coverage when present).  ``fake_decode_image`` remains solely
#: the oracle-verified plumbing stub — note the two emit different
#: schemas (REAL_DECODE_SCHEMA vs DECODE_SCHEMA).
decode_image = decode_image_real


def mm_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> mapInPandas decode -> typed metadata columns."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(fake_decode_image, DECODE_SCHEMA)


def mm_decode_real(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Real-codec decode over any (doc_id, payload) DataFrame."""
    return df.mapInPandas(decode_image_real, REAL_DECODE_SCHEMA)


MM_DECODE_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS INT) AS byte_len,
       CAST(('0x' || substr(md5(text), 1, 15))::BIGINT % 640 AS INT) AS fake_width,
       CAST(('0x' || substr(md5(text), 1, 15))::BIGINT % 480 AS INT) AS fake_height,
       sha256(text) AS payload_sha
FROM documents
"""


def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing: one row per sampled "frame" index.

    For video you'd emit decoded frames; here each payload yields
    ``byte_len mod 5 + 1`` deterministic frame offsets — the explode
    pattern (1 media row -> N frame rows) is the real thing.
    """
    docs = load_table(spark, sf_dir, "documents")
    payload = with_payload(docs)
    n_frames = (F.length(F.col("payload")) % 5 + 1).alias("n_frames")
    return (
        payload.select("doc_id", n_frames)
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.col("n_frames") - 1))
            .alias("frame_idx"),
        )
    )


MM_FRAME_ORACLE = """
SELECT doc_id, CAST(unnest(range(0, octet_length(encode(text)) % 5 + 1)) AS INT)
       AS frame_idx
FROM documents
"""


RESIZE_BOX = 256
RESIZE_SCHEMA = ("doc_id bigint, src_width int, src_height int, "
                 "out_width int, out_height int")


def fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB resize: fit the fake dimensions into a RESIZE_BOX square,
    preserving aspect ratio with integer (truncating) arithmetic.

    A real implementation resizes pixel buffers in the same loop
    (``img.thumbnail((256, 256))``); the scaling arithmetic, batch shape
    and output schema are what the stub pins down.
    """
    for pdf in batches:
        h64 = pdf["payload"].map(_hash64_py)
        w = (h64 % 640 + 1).astype("int64")     # avoid degenerate 0-dim
        h = (h64 % 480 + 1).astype("int64")
        long_side = w.combine(h, max)
        scale_num = long_side.map(lambda s: min(s, RESIZE_BOX))
        out_w = (w * scale_num // long_side).astype("int32")
        out_h = (h * scale_num // long_side).astype("int32")
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "src_width": w.astype("int32"),
            "src_height": h.astype("int32"),
            "out_width": out_w,
            "out_height": out_h,
        })


def mm_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-then-resize plumbing as a chained mapInPandas stage."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(fake_resize, RESIZE_SCHEMA)


_H64 = "(('0x' || substr(md5(text), 1, 15))::BIGINT)"
MM_RESIZE_ORACLE = f"""
WITH dims AS (
  SELECT doc_id, {_H64} % 640 + 1 AS w, {_H64} % 480 + 1 AS h
  FROM documents
),
scaled AS (
  SELECT doc_id, w, h, greatest(w, h) AS long_side,
         least(greatest(w, h), {RESIZE_BOX}) AS scale_num
  FROM dims
)
SELECT doc_id, CAST(w AS INT) AS src_width, CAST(h AS INT) AS src_height,
       CAST(w * scale_num // long_side AS INT) AS out_width,
       CAST(h * scale_num // long_side AS INT) AS out_height
FROM scaled
"""


RESIZE_REAL_SCHEMA = ("doc_id bigint, src_width int, src_height int, "
                      "out_width int, out_height int, pixel_hex string")


def real_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL resize: decode an actual PNG (built from the payload hash),
    nearest-neighbor downsample the decoded pixel buffer by 2 (ceil
    dims, sampling src pixel (2i, 2j)), and emit the resized bytes.

    This upgrades the resize stage from dimension arithmetic
    (``fake_resize``) to genuine pixel-buffer work through the real
    compressed codec; the oracle recomputes every sampled pixel's bytes
    algebraically, so a stride/order bug in the resampler breaks parity.
    """
    from ..functions.imagecodec import decode_builtin
    from ..functions.pngcodec import encode_png

    def _rt(b: bytes):
        b = bytes(b)
        h64 = _hash64_py(b)
        w, h = 1 + h64 % 3, 1 + h64 % 3
        raw = hashlib.sha256(b).digest()[: w * h * 3]
        img = decode_builtin(encode_png(w, h, raw))
        ow, oh = (w + 1) // 2, (h + 1) // 2
        out = bytearray()
        for i in range(oh):
            for j in range(ow):
                src = (2 * i * img.width + 2 * j) * 3
                out += img.pixels[src:src + 3]
        return (img.width, img.height, ow, oh, bytes(out).hex())

    for pdf in batches:
        metas = pdf["payload"].map(_rt)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "src_width": metas.map(lambda m: m[0]).astype("int32"),
            "src_height": metas.map(lambda m: m[1]).astype("int32"),
            "out_width": metas.map(lambda m: m[2]).astype("int32"),
            "out_height": metas.map(lambda m: m[3]).astype("int32"),
            "pixel_hex": metas.map(lambda m: m[4]),
        })


def mm_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload -> real PNG decode -> nearest-neighbor downsample."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(real_resize, RESIZE_REAL_SCHEMA)


#: Every output pixel is the sha256 bytes of its nearest-neighbor source
#: position — recomputed per (i, j) via a correlated unnest, concatenated
#: in row-major order.
MM_RESIZE_REAL_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_H64} AS h64, sha256(text) AS sha_hex FROM documents
),
dims AS (
  SELECT doc_id, 1 + h64 % 3 AS w, 1 + h64 % 3 AS hh,
         (1 + h64 % 3 + 1) // 2 AS ow, (1 + h64 % 3 + 1) // 2 AS oh,
         sha_hex
  FROM h
),
px AS (
  SELECT d.doc_id, d.w, d.hh, d.ow, d.oh, i.i, j.j,
         substr(d.sha_hex, ((2 * i.i) * d.w + 2 * j.j) * 6 + 1, 6) AS hexpx
  FROM dims d
  CROSS JOIN UNNEST(range(d.oh)) AS i(i)
  CROSS JOIN UNNEST(range(d.ow)) AS j(j)
)
SELECT doc_id, CAST(w AS INT) AS src_width, CAST(hh AS INT) AS src_height,
       CAST(ow AS INT) AS out_width, CAST(oh AS INT) AS out_height,
       string_agg(hexpx, '' ORDER BY i, j) AS pixel_hex
FROM px
GROUP BY doc_id, w, hh, ow, oh
"""


FRAME_SAMPLE_REAL_SCHEMA = "doc_id bigint, frame_idx int, frame_hex string"


def real_frame_sample(
        batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL frame sampling: build a multi-frame AVI from per-frame
    hashes, decode it with the builtin RIFF walker, and emit every
    SECOND decoded frame as its own row (1 media row -> N frame rows,
    the explode shape of ``mm_frame_sample`` — but the frames exploded
    here came out of an actual video decode)."""
    from ..functions.videocodec import decode_avi, encode_avi

    def _rt(b: bytes):
        b = bytes(b)
        h64 = _hash64_py(b)
        n_frames = 3 + h64 % 4
        frames = [hashlib.sha256(b + str(i).encode()).digest()[:12]
                  for i in range(n_frames)]
        avi = decode_avi(encode_avi(2, 2, frames, fps=10))
        return [(i, avi.frames[i].hex())
                for i in range(0, avi.n_frames, 2)]

    for pdf in batches:
        ids, idxs, hexes = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for i, fx in _rt(payload):
                ids.append(doc_id)
                idxs.append(i)
                hexes.append(fx)
        yield pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "frame_idx": pd.Series(idxs, dtype="int32"),
            "frame_hex": pd.Series(hexes, dtype="object"),
        })


def mm_frame_sample_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload -> real AVI decode -> every-2nd-frame explode."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(real_frame_sample,
                                          FRAME_SAMPLE_REAL_SCHEMA)


#: Each sampled frame's bytes are the leading sha256 of (payload || idx)
#: — Spark must reproduce them THROUGH the encoder + RIFF decode walk.
MM_FRAME_REAL_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_H64} AS h64, text FROM documents
),
n AS (
  SELECT doc_id, 3 + h64 % 4 AS nf, text FROM h
)
SELECT doc_id, CAST(i.i AS INT) AS frame_idx,
       substr(sha256(text || CAST(i.i AS VARCHAR)), 1, 24) AS frame_hex
FROM n CROSS JOIN UNNEST(range(n.nf)) AS i(i)
WHERE i.i % 2 = 0
"""


ROUNDTRIP_SCHEMA = ("doc_id bigint, width int, height int, mode string, "
                    "format string, pixel_hex string")


def bmp_roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL codec work per payload: derive WxH RGB pixels from the payload
    hash, ``encode_bmp`` them, ``decode_bmp`` the result with the builtin
    codec, and emit the decoded metadata + pixel bytes (hex).

    Unlike the stubs, the bytes-to-pixels path here is genuine — a codec
    bug (stride, bottom-up flip, channel order) changes ``pixel_hex`` and
    fails the DuckDB oracle, so the decoder itself is parity-gated.
    """
    from ..functions.imagecodec import decode_bmp, encode_bmp

    def _rt(b: bytes):
        b = bytes(b)
        h64 = _hash64_py(b)
        w, h = 1 + h64 % 3, 1 + h64 % 2
        raw = hashlib.sha256(b).digest()[: w * h * 3]
        img = decode_bmp(encode_bmp(w, h, raw))
        return (img.width, img.height, img.mode, img.format,
                img.pixels.hex())

    for pdf in batches:
        metas = pdf["payload"].map(_rt)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "width": metas.map(lambda m: m[0]).astype("int32"),
            "height": metas.map(lambda m: m[1]).astype("int32"),
            "mode": metas.map(lambda m: m[2]),
            "format": metas.map(lambda m: m[3]),
            "pixel_hex": metas.map(lambda m: m[4]),
        })


def mm_roundtrip_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> real BMP encode/decode round-trip -> metadata."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(bmp_roundtrip, ROUNDTRIP_SCHEMA)


#: The oracle recomputes the expected pixels algebraically: the first
#: w*h*3 bytes of sha256(payload) are, in hex, the first w*h*6 chars of
#: the sha256 hex string.  Spark must arrive at the same bytes THROUGH
#: the encoder+decoder, so any codec defect breaks parity.
MM_ROUNDTRIP_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_H64} AS h64, sha256(text) AS sha_hex FROM documents
)
SELECT doc_id,
       CAST(1 + h64 % 3 AS INT) AS width,
       CAST(1 + h64 % 2 AS INT) AS height,
       'RGB' AS mode, 'BMP' AS format,
       substr(sha_hex, 1, CAST((1 + h64 % 3) * (1 + h64 % 2) * 6 AS INT))
         AS pixel_hex
FROM h
"""


def png_roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL compressed-codec work per payload: derive WxH RGB pixels
    from the payload hash, ``encode_png`` them (DEFLATE + chunk CRCs),
    then decode through the ``decode_builtin`` dispatch — so magic
    sniffing, CRC verification, inflation and scanline unfiltering are
    all on the gated path.  Unlike BMP/PPM this exercises a genuinely
    *compressed* format end to end with stdlib zlib only.
    """
    from ..functions.imagecodec import decode_builtin
    from ..functions.pngcodec import encode_png

    def _rt(b: bytes):
        b = bytes(b)
        h64 = _hash64_py(b)
        w, h = 1 + h64 % 3, 1 + h64 % 3
        raw = hashlib.sha256(b).digest()[: w * h * 3]
        img = decode_builtin(encode_png(w, h, raw))
        return (img.width, img.height, img.mode, img.format,
                img.pixels.hex())

    for pdf in batches:
        metas = pdf["payload"].map(_rt)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "width": metas.map(lambda m: m[0]).astype("int32"),
            "height": metas.map(lambda m: m[1]).astype("int32"),
            "mode": metas.map(lambda m: m[2]),
            "format": metas.map(lambda m: m[3]),
            "pixel_hex": metas.map(lambda m: m[4]),
        })


def mm_roundtrip_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> real PNG encode/decode round-trip -> metadata."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(png_roundtrip, ROUNDTRIP_SCHEMA)


#: Same algebraic-recompute gate as the BMP oracle: the pixels Spark
#: must produce THROUGH deflate/inflate + unfiltering are the leading
#: sha256 bytes, in hex.
MM_PNG_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_H64} AS h64, sha256(text) AS sha_hex FROM documents
)
SELECT doc_id,
       CAST(1 + h64 % 3 AS INT) AS width,
       CAST(1 + h64 % 3 AS INT) AS height,
       'RGB' AS mode, 'PNG' AS format,
       substr(sha_hex, 1, CAST((1 + h64 % 3) * (1 + h64 % 3) * 6 AS INT))
         AS pixel_hex
FROM h
"""


#: Max per-channel reconstruction error the JPEG round-trip tolerates at
#: quality 90, 4:4:4.  Worst observed over 500 derived fixtures is 11;
#: 24 is 2× headroom while still failing loudly on any Huffman / zigzag
#: / DCT / quantization defect (a broken stage produces errors in the
#: hundreds).
JPEG_RT_TOL = 24

JPEG_SCHEMA = ("doc_id bigint, width int, height int, mode string, "
               "format string, within_tol int")


def jpeg_roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL lossy-codec work per payload: derive a smooth W×H RGB
    triangle-wave image from the payload hash (smooth because random
    noise is exactly what JPEG is *supposed* to discard), encode it as
    baseline JFIF (quality 90, 4:4:4 — DCT, quantization, Huffman,
    byte stuffing), decode it back through the ``decode_builtin``
    dispatch (magic sniffing on the gated path), and report whether the
    reconstruction honours the lossy-codec error contract
    (``max_abs_err ≤ JPEG_RT_TOL``).

    JPEG is the one codec in the matrix where byte equality is the
    *wrong* expectation — the oracle therefore gates dimensions (the
    decoder must parse SOF0 correctly through padding: dims 8-16 are
    never block-aligned on both axes) and the tolerance flag, while
    ``tests/test_jpegcodec.py`` pins exact behavior on hand-built
    spec vectors.
    """
    import numpy as np

    from ..functions.imagecodec import decode_builtin
    from ..functions.jpegcodec import encode_jpeg

    def _pixels(h64: int, w: int, h: int) -> "np.ndarray":
        a, b = 1 + h64 % 7, 1 + (h64 // 7) % 7
        base = h64 % 256
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        arr = np.zeros((h, w, 3), np.uint8)
        for c in range(3):
            t = (a * xx + b * yy + base + 85 * c) % 510
            arr[:, :, c] = np.abs(t - 255).astype(np.uint8)
        return arr

    def _rt(b: bytes):
        b = bytes(b)
        h64 = _hash64_py(b)
        w, h = 8 + h64 % 9, 8 + (h64 // 9) % 9
        rgb = _pixels(h64, w, h)
        img = decode_builtin(encode_jpeg(w, h, rgb.tobytes(), quality=90))
        dec = np.frombuffer(img.pixels, np.uint8).reshape(h, w, 3)
        err = int(np.abs(dec.astype(np.int64) - rgb.astype(np.int64)).max())
        return (img.width, img.height, img.mode, img.format,
                int(err <= JPEG_RT_TOL))

    for pdf in batches:
        metas = pdf["payload"].map(_rt)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "width": metas.map(lambda m: m[0]).astype("int32"),
            "height": metas.map(lambda m: m[1]).astype("int32"),
            "mode": metas.map(lambda m: m[2]),
            "format": metas.map(lambda m: m[3]),
            "within_tol": metas.map(lambda m: m[4]).astype("int32"),
        })


def mm_roundtrip_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> real JPEG encode/decode round-trip -> bounded
    reconstruction-error gate."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(jpeg_roundtrip, JPEG_SCHEMA)


#: Dimension gate is algebraic like BMP/PNG; the pixel gate is the
#: lossy-codec tolerance flag (within_tol must be 1 for every row —
#: a Huffman/zigzag/DCT/quant defect produces errors far past it).
MM_JPEG_ORACLE = f"""
WITH h AS (SELECT doc_id, {_H64} AS h64 FROM documents)
SELECT doc_id,
       CAST(8 + h64 % 9 AS INT) AS width,
       CAST(8 + (h64 // 9) % 9 AS INT) AS height,
       'RGB' AS mode, 'JPEG' AS format,
       1 AS within_tol
FROM h
"""


JPEG_PROG_SCHEMA = ("doc_id bigint, width int, height int, mode string, "
                    "format string, within_tol int, equals_baseline int")


def jpeg_progressive_roundtrip(
        batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Progressive (SOF2) JPEG round-trip: same derived image as
    :func:`jpeg_roundtrip`, encoded with libjpeg's default progressive
    scan script and decoded through the multi-scan coefficient
    accumulator.  Gates the lossy tolerance AND bit-equality to the
    baseline decode — both encoders quantize identical coefficients, so
    any divergence in spectral-selection/successive-approximation
    decode shows as ``equals_baseline = 0``.
    """
    import numpy as np

    from ..functions.jpegcodec import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    def _pixels(h64: int, w: int, h: int) -> "np.ndarray":
        a, b = 1 + h64 % 7, 1 + (h64 // 7) % 7
        base = h64 % 256
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        arr = np.zeros((h, w, 3), np.uint8)
        for c in range(3):
            t = (a * xx + b * yy + base + 85 * c) % 510
            arr[:, :, c] = np.abs(t - 255).astype(np.uint8)
        return arr

    def _rt(b: bytes):
        b = bytes(b)
        h64 = _hash64_py(b)
        w, h = 8 + h64 % 9, 8 + (h64 // 9) % 9
        rgb = _pixels(h64, w, h)
        prog = decode_jpeg(
            encode_jpeg_progressive(w, h, rgb.tobytes(), quality=90))
        base = decode_jpeg(encode_jpeg(w, h, rgb.tobytes(), quality=90))
        dec = np.frombuffer(prog.pixels, np.uint8).reshape(h, w, 3)
        err = int(np.abs(dec.astype(np.int64) - rgb.astype(np.int64)).max())
        return (prog.width, prog.height, prog.mode, prog.format,
                int(err <= JPEG_RT_TOL),
                int(prog.pixels == base.pixels))

    for pdf in batches:
        metas = pdf["payload"].map(_rt)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "width": metas.map(lambda m: m[0]).astype("int32"),
            "height": metas.map(lambda m: m[1]).astype("int32"),
            "mode": metas.map(lambda m: m[2]),
            "format": metas.map(lambda m: m[3]),
            "within_tol": metas.map(lambda m: m[4]).astype("int32"),
            "equals_baseline": metas.map(lambda m: m[5]).astype("int32"),
        })


def mm_roundtrip_jpeg_progressive(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """Binary payload -> progressive (SOF2) JPEG round-trip ->
    tolerance + baseline-bit-equality gate."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(jpeg_progressive_roundtrip,
                                          JPEG_PROG_SCHEMA)


MM_JPEG_PROG_ORACLE = f"""
WITH h AS (SELECT doc_id, {_H64} AS h64 FROM documents)
SELECT doc_id,
       CAST(8 + h64 % 9 AS INT) AS width,
       CAST(8 + (h64 // 9) % 9 AS INT) AS height,
       'RGB' AS mode, 'JPEG' AS format,
       1 AS within_tol,
       1 AS equals_baseline
FROM h
"""


MP4_SCHEMA = ("doc_id bigint, width int, height int, n_frames int, "
              "duration_ms bigint, sample_format string, within_tol int")


def mp4_roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL container + lossy-codec work per payload: derive 2-4 smooth
    RGB frames from the payload hash, mux them as Motion-JPEG in MP4
    (``encode_mp4`` — every sample an independent baseline JPEG; two
    chunks so the stsc/stco map is non-trivial), demux + decode with
    ``decode_mp4`` (box walk, stsd/stts/stsz/stsc/stco sample tables,
    per-sample JPEG decode), and gate geometry, frame count, duration
    math and the lossy reconstruction tolerance.
    """
    import numpy as np

    from ..functions.mp4codec import decode_mp4, encode_mp4

    def _pixels(h64: int, w: int, h: int, i: int) -> "np.ndarray":
        a, b = 1 + h64 % 7, 1 + (h64 // 7) % 7
        base = (h64 + 40 * i) % 256
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        arr = np.zeros((h, w, 3), np.uint8)
        for c in range(3):
            t = (a * xx + b * yy + base + 85 * c) % 510
            arr[:, :, c] = np.abs(t - 255).astype(np.uint8)
        return arr

    def _rt(b: bytes):
        b = bytes(b)
        h64 = _hash64_py(b)
        w, h = 8 + h64 % 9, 8 + (h64 // 9) % 9
        n = 2 + h64 % 3
        frames = [_pixels(h64, w, h, i) for i in range(n)]
        vid = decode_mp4(encode_mp4(w, h, [f.tobytes() for f in frames],
                                    fps=10, quality=90))
        err = 0
        for dec, orig in zip(vid.frames, frames):
            d = np.frombuffer(dec, np.uint8).astype(np.int64)
            err = max(err, int(np.abs(d - orig.reshape(-1)
                                      .astype(np.int64)).max()))
        return (vid.width, vid.height, vid.n_frames, vid.duration_ms,
                vid.sample_format, int(err <= JPEG_RT_TOL))

    for pdf in batches:
        metas = pdf["payload"].map(_rt)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "width": metas.map(lambda m: m[0]).astype("int32"),
            "height": metas.map(lambda m: m[1]).astype("int32"),
            "n_frames": metas.map(lambda m: m[2]).astype("int32"),
            "duration_ms": metas.map(lambda m: m[3]).astype("int64"),
            "sample_format": metas.map(lambda m: m[4]),
            "within_tol": metas.map(lambda m: m[5]).astype("int32"),
        })


def mm_roundtrip_mp4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> Motion-JPEG-in-MP4 mux/demux round-trip ->
    geometry/timing/tolerance gate."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(mp4_roundtrip, MP4_SCHEMA)


#: Geometry + frame count + duration math are algebraic; pixels carry
#: the lossy-codec tolerance flag (see MM_JPEG_ORACLE).  duration_ms =
#: n_frames · (1000/fps) with fps=10 and timescale 1000.
MM_MP4_ORACLE = f"""
WITH h AS (SELECT doc_id, {_H64} AS h64 FROM documents)
SELECT doc_id,
       CAST(8 + h64 % 9 AS INT) AS width,
       CAST(8 + (h64 // 9) % 9 AS INT) AS height,
       CAST(2 + h64 % 3 AS INT) AS n_frames,
       CAST((2 + h64 % 3) * 100 AS BIGINT) AS duration_ms,
       'jpeg' AS sample_format,
       1 AS within_tol
FROM h
"""


MJPEG_FRAMES_SCHEMA = ("doc_id bigint, frame_idx int, n_frames int, "
                       "width int, height int, decoded_ok int, "
                       "matches_container int, within_tol int")


def mjpeg_frame_sample(
        batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL video frame sampling (r6 verdict ask #4): derive 2-4 smooth
    RGB frames from the payload hash, mux them as Motion-JPEG in AVI
    (every ``00dc`` chunk an independent baseline JPEG), then run the
    PRODUCTION decode shape — ``demux_avi_mjpeg`` walks the container
    once and each frame is decoded by its own ``decode_jpeg`` call with
    per-frame error isolation (a corrupt frame poisons one row, not the
    file; reference T10 at frame granularity).  Emits one row per
    frame (the 1-media-row -> N-frame-rows explode of
    ``mm_frame_sample``, but through real codecs) gating: the isolated
    decode succeeded, its pixels BIT-match the strict full-file
    ``decode_avi`` path (same frame, two decode routes), and the lossy
    reconstruction error stays within JPEG_RT_TOL.
    """
    import numpy as np

    from ..functions.jpegcodec import decode_jpeg
    from ..functions.videocodec import (
        decode_avi,
        demux_avi_mjpeg,
        encode_avi_mjpeg,
    )

    def _pixels(h64: int, w: int, h: int, i: int) -> "np.ndarray":
        a, b = 1 + h64 % 7, 1 + (h64 // 7) % 7
        base = (h64 + 40 * i) % 256
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        arr = np.zeros((h, w, 3), np.uint8)
        for c in range(3):
            t = (a * xx + b * yy + base + 85 * c) % 510
            arr[:, :, c] = np.abs(t - 255).astype(np.uint8)
        return arr

    def _rows(b: bytes):
        b = bytes(b)
        h64 = _hash64_py(b)
        w, h = 8 + h64 % 9, 8 + (h64 // 9) % 9
        n = 2 + h64 % 3
        frames = [_pixels(h64, w, h, i) for i in range(n)]
        avi = encode_avi_mjpeg(w, h, [f.tobytes() for f in frames],
                               fps=10, quality=90)
        strict = decode_avi(avi).frames          # full-file route
        dw, dh, _fps, payloads = demux_avi_mjpeg(avi)
        out = []
        for i, p in enumerate(payloads):
            try:                                  # per-frame isolation
                img = decode_jpeg(p)
                ok = 1
                match = int(img.pixels == strict[i])
                d = np.frombuffer(img.pixels, np.uint8).astype(np.int64)
                err = int(np.abs(d - frames[i].reshape(-1)
                                 .astype(np.int64)).max())
                tol = int(err <= JPEG_RT_TOL)
            except ValueError:
                ok, match, tol = 0, 0, 0
            out.append((i, n, dw, dh, ok, match, tol))
        return out

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for r in _rows(payload):
                rows.append((doc_id,) + r)
        cols = list(zip(*rows)) if rows else [[]] * 8
        yield pd.DataFrame({
            "doc_id": pd.Series(cols[0], dtype="int64"),
            "frame_idx": pd.Series(cols[1], dtype="int32"),
            "n_frames": pd.Series(cols[2], dtype="int32"),
            "width": pd.Series(cols[3], dtype="int32"),
            "height": pd.Series(cols[4], dtype="int32"),
            "decoded_ok": pd.Series(cols[5], dtype="int32"),
            "matches_container": pd.Series(cols[6], dtype="int32"),
            "within_tol": pd.Series(cols[7], dtype="int32"),
        })


def gif_roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL LZW-codec work per payload: derive WxH RGB pixels from the
    payload hash, ``encode_gif_rgb`` them (exact palette, variable-width
    LZW, sub-block framing), then decode through the ``decode_builtin``
    dispatch — magic sniffing, LZW decompression (incl. the KwKwK
    continuation), color-table lookup and the compositing canvas are all
    on the gated path.  GIF is palette-lossless, so byte equality is the
    contract (like BMP/PNG, unlike JPEG)."""
    from ..functions.gifcodec import encode_gif_rgb
    from ..functions.imagecodec import decode_builtin

    def _rt(b: bytes):
        b = bytes(b)
        h64 = _hash64_py(b)
        w, h = 1 + h64 % 3, 1 + (h64 // 4) % 3
        raw = hashlib.sha256(b).digest()[: w * h * 3]
        img = decode_builtin(encode_gif_rgb(w, h, [raw]))
        return (img.width, img.height, img.mode, img.format,
                img.pixels.hex())

    for pdf in batches:
        metas = pdf["payload"].map(_rt)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "width": metas.map(lambda m: m[0]).astype("int32"),
            "height": metas.map(lambda m: m[1]).astype("int32"),
            "mode": metas.map(lambda m: m[2]),
            "format": metas.map(lambda m: m[3]),
            "pixel_hex": metas.map(lambda m: m[4]),
        })


def tiff_roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL TIFF-LZW codec work per payload: derive WxH RGB pixels from
    the payload hash, ``encode_tiff`` them (single LZW strip, IFD tag
    table), decode through the ``decode_builtin`` dispatch — magic
    sniffing, IFD walk, MSB-first early-change LZW decompression all on
    the gated path.  Baseline TIFF is lossless, so byte equality is the
    contract."""
    from ..functions.imagecodec import decode_builtin
    from ..functions.tiffcodec import encode_tiff

    def _rt(b: bytes):
        b = bytes(b)
        h64 = _hash64_py(b)
        w, h = 1 + h64 % 3, 1 + (h64 // 9) % 3
        raw = hashlib.sha256(b).digest()[: w * h * 3]
        img = decode_builtin(encode_tiff(w, h, raw, "RGB", compression=5))
        return (img.width, img.height, img.mode, img.format,
                img.pixels.hex())

    for pdf in batches:
        metas = pdf["payload"].map(_rt)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "width": metas.map(lambda m: m[0]).astype("int32"),
            "height": metas.map(lambda m: m[1]).astype("int32"),
            "mode": metas.map(lambda m: m[2]),
            "format": metas.map(lambda m: m[3]),
            "pixel_hex": metas.map(lambda m: m[4]),
        })


def mm_roundtrip_tiff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> real TIFF (LZW strip) encode/decode round-trip
    -> decoded metadata + pixels."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(tiff_roundtrip, ROUNDTRIP_SCHEMA)


#: Same algebraic-recompute gate as BMP/PNG/GIF: the pixels Spark must
#: produce THROUGH the IFD walk + LZW inflate are the leading sha256
#: bytes, in hex.
MM_TIFF_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_H64} AS h64, sha256(text) AS sha_hex FROM documents
)
SELECT doc_id,
       CAST(1 + h64 % 3 AS INT) AS width,
       CAST(1 + (h64 // 9) % 3 AS INT) AS height,
       'RGB' AS mode, 'TIFF' AS format,
       substr(sha_hex, 1,
              CAST((1 + h64 % 3) * (1 + (h64 // 9) % 3) * 6 AS INT))
         AS pixel_hex
FROM h
"""


def mm_roundtrip_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> real GIF (LZW) encode/decode round-trip ->
    decoded metadata + pixels."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(gif_roundtrip, ROUNDTRIP_SCHEMA)


#: Same algebraic-recompute gate as BMP/PNG: the pixels Spark must
#: produce THROUGH palette build + LZW compress/decompress are the
#: leading sha256 bytes, in hex.
MM_GIF_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_H64} AS h64, sha256(text) AS sha_hex FROM documents
)
SELECT doc_id,
       CAST(1 + h64 % 3 AS INT) AS width,
       CAST(1 + (h64 // 4) % 3 AS INT) AS height,
       'P' AS mode, 'GIF' AS format,
       substr(sha_hex, 1,
              CAST((1 + h64 % 3) * (1 + (h64 // 4) % 3) * 6 AS INT))
         AS pixel_hex
FROM h
"""


GIF_FRAMES_SCHEMA = ("doc_id bigint, frame_idx int, delay_cs int, "
                     "frame_hex string")


def gif_frame_sample(
        batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """ANIMATED-GIF frame sampling through the real codec: derive
    ``nf`` per-frame RGB buffers and per-frame delays from the payload
    hash, encode them as one animated GIF89a (GCE delay blocks +
    NETSCAPE loop), decode it back, and emit every 2nd frame with its
    delay — the decoded delay gates the Graphic Control Extension
    parse, the frame bytes gate per-frame LZW + compositing."""
    from ..functions.gifcodec import decode_gif, encode_gif_rgb

    def _rows(doc_id: int, b: bytes):
        b = bytes(b)
        h64 = _hash64_py(b)
        w, h = 1 + h64 % 3, 2
        nf = 2 + h64 % 3
        frames = [
            hashlib.sha256(b + str(i).encode()).digest()[: w * h * 3]
            for i in range(nf)
        ]
        g = decode_gif(encode_gif_rgb(w, h, frames,
                                      [10 * i for i in range(nf)]))
        return [
            (doc_id, i, g.delays_cs[i], g.frames[i].hex())
            for i in range(len(g.frames)) if i % 2 == 0
        ]

    for pdf in batches:
        rows = [r for d, p in zip(pdf["doc_id"], pdf["payload"])
                for r in _rows(int(d), p)]
        yield pd.DataFrame({
            "doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
            "frame_idx": pd.Series([r[1] for r in rows], dtype="int32"),
            "delay_cs": pd.Series([r[2] for r in rows], dtype="int32"),
            "frame_hex": pd.Series([r[3] for r in rows], dtype="object"),
        })


def mm_gif_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload -> real animated-GIF encode/decode -> every-2nd-frame
    explode with decoded GCE delays."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(gif_frame_sample,
                                          GIF_FRAMES_SCHEMA)


#: Frame bytes are the leading sha256 of (payload || idx); the delay is
#: 10·idx — Spark must reproduce BOTH through the GIF container walk.
MM_GIF_FRAMES_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_H64} AS h64, text FROM documents
),
n AS (
  SELECT doc_id, h64, 2 + h64 % 3 AS nf,
         CAST(1 + h64 % 3 AS INT) AS w, text
  FROM h
)
SELECT doc_id, CAST(i.i AS INT) AS frame_idx,
       CAST(10 * i.i AS INT) AS delay_cs,
       substr(sha256(text || CAST(i.i AS VARCHAR)), 1,
              CAST(w * 2 * 6 AS INT)) AS frame_hex
FROM n CROSS JOIN UNNEST(range(n.nf)) AS i(i)
WHERE i.i % 2 = 0
"""


def mm_video_mjpeg_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> MJPEG-in-AVI mux -> demux + per-frame JPEG
    decode (isolated) -> one gated row per frame."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(mjpeg_frame_sample,
                                          MJPEG_FRAMES_SCHEMA)


#: Geometry and frame fan-out are algebraic; the three flags assert
#: decode success, cross-route pixel equality and the lossy tolerance —
#: any container-walk, chunk-framing or per-frame decode defect zeroes
#: a flag and fails parity.
MM_MJPEG_FRAMES_ORACLE = f"""
WITH h AS (SELECT doc_id, {_H64} AS h64 FROM documents),
n AS (SELECT doc_id, h64, 2 + h64 % 3 AS nf FROM h)
SELECT doc_id, CAST(i.i AS INT) AS frame_idx,
       CAST(nf AS INT) AS n_frames,
       CAST(8 + h64 % 9 AS INT) AS width,
       CAST(8 + (h64 // 9) % 9 AS INT) AS height,
       1 AS decoded_ok, 1 AS matches_container, 1 AS within_tol
FROM n CROSS JOIN UNNEST(range(n.nf)) AS i(i)
"""


WAV_SCHEMA = ("doc_id bigint, sample_rate int, channels int, "
              "n_frames int, duration_us bigint, pcm_hex string")


def wav_roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL audio codec work per payload: derive PCM frames from the
    payload hash, ``encode_wav`` them, ``decode_wav`` the result with the
    builtin RIFF parser, and emit the decoded header + frames (hex).

    Like :func:`bmp_roundtrip`, the oracle recomputes the expected bytes
    algebraically, so a chunk-walk or frame-count defect in the codec
    fails DuckDB parity.
    """
    from ..functions.audiocodec import decode_wav, encode_wav

    def _rt(b: bytes):
        b = bytes(b)
        h64 = _hash64_py(b)
        rate = 8000 * (1 + h64 % 3)
        channels = 1 + h64 % 2
        n_frames = 1 + h64 % 5
        pcm = hashlib.sha256(b).digest()[: n_frames * channels * 2]
        wav = decode_wav(encode_wav(rate, channels, pcm))
        return (wav.sample_rate, wav.channels, wav.n_frames,
                wav.duration_us, wav.pcm.hex())

    for pdf in batches:
        metas = pdf["payload"].map(_rt)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "sample_rate": metas.map(lambda m: m[0]).astype("int32"),
            "channels": metas.map(lambda m: m[1]).astype("int32"),
            "n_frames": metas.map(lambda m: m[2]).astype("int32"),
            "duration_us": metas.map(lambda m: m[3]).astype("int64"),
            "pcm_hex": metas.map(lambda m: m[4]),
        })


def mm_roundtrip_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> real WAV encode/decode round-trip -> metadata."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(wav_roundtrip, WAV_SCHEMA)


MM_WAV_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_H64} AS h64, sha256(text) AS sha_hex FROM documents
)
SELECT doc_id,
       CAST(8000 * (1 + h64 % 3) AS INT) AS sample_rate,
       CAST(1 + h64 % 2 AS INT) AS channels,
       CAST(1 + h64 % 5 AS INT) AS n_frames,
       CAST((1 + h64 % 5) * 1000000 // (8000 * (1 + h64 % 3)) AS BIGINT)
         AS duration_us,
       substr(sha_hex, 1, CAST((1 + h64 % 5) * (1 + h64 % 2) * 4 AS INT))
         AS pcm_hex
FROM h
"""


RESAMPLE_SCHEMA = ("doc_id bigint, channels int, in_frames int, "
                   "out_rate int, out_frames int, pcm_hex string")


def real_audio_resample(
        batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL audio resample: decode an actual PCM WAV and decimate by 2 —
    keep every second FRAME (a frame is ``channels * 2`` bytes, so the
    stride is channel-aware; byte-level decimation would interleave
    channels wrongly on stereo).  The image-resize analogue for the
    audio modality, parity-gated on the exact surviving PCM bytes."""
    from ..functions.audiocodec import decode_wav, encode_wav

    def _rt(b: bytes):
        b = bytes(b)
        h64 = _hash64_py(b)
        rate = 8000 * (1 + h64 % 3)
        channels = 1 + h64 % 2
        n_frames = 1 + h64 % 5
        pcm = hashlib.sha256(b).digest()[: n_frames * channels * 2]
        wav = decode_wav(encode_wav(rate, channels, pcm))
        fsz = wav.channels * 2
        frames = [wav.pcm[i * fsz:(i + 1) * fsz]
                  for i in range(wav.n_frames)]
        out = b"".join(frames[::2])
        return (wav.channels, wav.n_frames, wav.sample_rate // 2,
                (wav.n_frames + 1) // 2, out.hex())

    for pdf in batches:
        metas = pdf["payload"].map(_rt)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "channels": metas.map(lambda m: m[0]).astype("int32"),
            "in_frames": metas.map(lambda m: m[1]).astype("int32"),
            "out_rate": metas.map(lambda m: m[2]).astype("int32"),
            "out_frames": metas.map(lambda m: m[3]).astype("int32"),
            "pcm_hex": metas.map(lambda m: m[4]),
        })


def mm_audio_resample_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload -> real WAV decode -> every-2nd-frame decimation."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(real_audio_resample,
                                          RESAMPLE_SCHEMA)


#: Surviving PCM = the even frames' hex slices, concatenated in order —
#: frame size is channel-dependent, so a stereo stride bug breaks parity.
MM_AUDIO_RESAMPLE_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_H64} AS h64, sha256(text) AS sha_hex FROM documents
),
d AS (
  SELECT doc_id, 1 + h64 % 2 AS ch, 1 + h64 % 5 AS nf,
         8000 * (1 + h64 % 3) AS rate, sha_hex
  FROM h
),
fr AS (
  SELECT d.doc_id, d.ch, d.nf, d.rate, i.i,
         substr(d.sha_hex, i.i * d.ch * 4 + 1, d.ch * 4) AS fx
  FROM d CROSS JOIN UNNEST(range(d.nf)) AS i(i)
  WHERE i.i % 2 = 0
)
SELECT doc_id, CAST(ch AS INT) AS channels, CAST(nf AS INT) AS in_frames,
       CAST(rate // 2 AS INT) AS out_rate,
       CAST((nf + 1) // 2 AS INT) AS out_frames,
       string_agg(fx, '' ORDER BY i) AS pcm_hex
FROM fr
GROUP BY doc_id, ch, nf, rate
"""


AVI_SCHEMA = ("doc_id bigint, width int, height int, fps int, "
              "n_frames int, frames_hex string")


def avi_roundtrip(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL video codec work per payload: derive 2x2 RGB frames from the
    payload hash, ``encode_avi`` them, ``decode_avi`` the result with the
    builtin RIFF walker, and emit the decoded header + concatenated
    frame bytes (hex) — parity-gated like the BMP/WAV round-trips."""
    from ..functions.videocodec import decode_avi, encode_avi

    def _rt(b: bytes):
        b = bytes(b)
        h64 = _hash64_py(b)
        n_frames = 1 + h64 % 2
        fps = 10 + h64 % 15
        raw = hashlib.sha256(b).digest()[: n_frames * 12]
        frames = [raw[i * 12:(i + 1) * 12] for i in range(n_frames)]
        avi = decode_avi(encode_avi(2, 2, frames, fps=fps))
        return (avi.width, avi.height, avi.fps, avi.n_frames,
                b"".join(avi.frames).hex())

    for pdf in batches:
        metas = pdf["payload"].map(_rt)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "width": metas.map(lambda m: m[0]).astype("int32"),
            "height": metas.map(lambda m: m[1]).astype("int32"),
            "fps": metas.map(lambda m: m[2]).astype("int32"),
            "n_frames": metas.map(lambda m: m[3]).astype("int32"),
            "frames_hex": metas.map(lambda m: m[4]),
        })


def mm_roundtrip_avi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> real AVI encode/decode round-trip -> metadata."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(avi_roundtrip, AVI_SCHEMA)


MM_AVI_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_H64} AS h64, sha256(text) AS sha_hex FROM documents
)
SELECT doc_id, 2 AS width, 2 AS height,
       CAST(10 + h64 % 15 AS INT) AS fps,
       CAST(1 + h64 % 2 AS INT) AS n_frames,
       substr(sha_hex, 1, CAST((1 + h64 % 2) * 24 AS INT)) AS frames_hex
FROM h
"""


N_FEATURES = 8
FEATURE_SCHEMA = "doc_id bigint, feature array<bigint>"


def fake_feature_extract(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """STUB feature extractor: deterministic pseudo-embedding per payload.

    Feature d = hash64(sha256-hex(payload) + ':' + d) mod 1000 — stands in
    for a real vision/audio encoder producing an embedding column.  The
    output shape (one fixed-length array per media row, Arrow list
    transfer) is the contract ANN operators consume downstream.
    """
    for pdf in batches:
        shas = pdf["payload"].map(
            lambda b: hashlib.sha256(b).hexdigest()
        )
        feats = shas.map(
            lambda s: [
                int(hashlib.md5(f"{s}:{d}".encode()).hexdigest()[:15], 16)
                % 1000
                for d in range(N_FEATURES)
            ]
        )
        yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})


def mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload -> mapInPandas -> embedding column (array<bigint>)."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(fake_feature_extract,
                                          FEATURE_SCHEMA)


MM_FEATURE_ORACLE = f"""
SELECT doc_id, [
  {', '.join(f"(('0x' || substr(md5(sha256(text) || ':{d}'), 1, 15))::BIGINT) % 1000"
             for d in range(N_FEATURES))}
] AS feature
FROM documents
"""


AUDIO_FEATURES_SCHEMA = (
    "doc_id bigint, sample_rate int, channels int, n_samples int, "
    "sum_amp bigint, sum_sq bigint, peak_abs int, rms double"
)


def audio_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL audio analysis per payload: decode the WAV (same derivation
    as :func:`wav_roundtrip`), unpack int16-LE samples, and emit exact
    integer loudness features — the decode→analyze stage of an audio
    curation pipeline (silence/clipping gates run on exactly these
    quantities).  Sum/sum-of-squares/peak are integers, so hashes are
    exact; only the derived RMS is floating, floored at 4 decimals."""
    import struct

    from ..functions.audiocodec import decode_wav, encode_wav

    def _feat(b: bytes):
        b = bytes(b)
        h64 = _hash64_py(b)
        rate = 8000 * (1 + h64 % 3)
        channels = 1 + h64 % 2
        n_frames = 1 + h64 % 5
        pcm = hashlib.sha256(b).digest()[: n_frames * channels * 2]
        wav = decode_wav(encode_wav(rate, channels, pcm))
        n = wav.n_frames * wav.channels
        vals = struct.unpack(f"<{n}h", wav.pcm)
        return (wav.sample_rate, wav.channels, n, sum(vals),
                sum(v * v for v in vals), max(abs(v) for v in vals))

    for pdf in batches:
        metas = pdf["payload"].map(_feat)
        import numpy as np

        sum_sq = metas.map(lambda m: m[4]).astype("int64")
        n = metas.map(lambda m: m[2]).astype("int64")
        rms = np.floor(np.sqrt(sum_sq.values.astype("float64")
                               / n.values.astype("float64"))
                       * 10000.0) / 10000.0
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "sample_rate": metas.map(lambda m: m[0]).astype("int32"),
            "channels": metas.map(lambda m: m[1]).astype("int32"),
            "n_samples": metas.map(lambda m: m[2]).astype("int32"),
            "sum_amp": metas.map(lambda m: m[3]).astype("int64"),
            "sum_sq": sum_sq,
            "peak_abs": metas.map(lambda m: m[5]).astype("int32"),
            "rms": rms,
        })


def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → loudness features through the real PCM-WAV codec."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(audio_features,
                                          AUDIO_FEATURES_SCHEMA)


#: 2-hex-char unsigned byte at 1-based position p of column hx.
def _hexbyte(hx: str, p: str) -> str:
    return f"(('0x' || substr({hx}, {p}, 2))::INT)"


MM_AUDIO_FEATURES_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_H64} AS h64, sha256(text) AS sha_hex FROM documents
),
hdr AS (
  SELECT doc_id,
         CAST(8000 * (1 + h64 % 3) AS INT) AS sample_rate,
         CAST(1 + h64 % 2 AS INT) AS channels,
         CAST((1 + h64 % 5) * (1 + h64 % 2) AS INT) AS n_samples,
         sha_hex
  FROM h
),
samples AS (
  -- fixed 0..9 index domain (max 5 frames x 2 channels), filtered per
  -- row: DuckDB's generate_series cannot take lateral column bounds
  SELECT doc_id, sample_rate, channels, n_samples,
         {_hexbyte('sha_hex', '4 * gs.i + 3')} * 256
           + {_hexbyte('sha_hex', '4 * gs.i + 1')} AS vu
  FROM hdr CROSS JOIN generate_series(0, 9) AS gs(i)
  WHERE gs.i < n_samples
),
signed_s AS (
  SELECT doc_id, sample_rate, channels, n_samples,
         vu - CASE WHEN vu >= 32768 THEN 65536 ELSE 0 END AS v
  FROM samples
)
SELECT doc_id, sample_rate, channels, n_samples,
       CAST(sum(v) AS BIGINT) AS sum_amp,
       CAST(sum(v * v) AS BIGINT) AS sum_sq,
       CAST(max(abs(v)) AS INT) AS peak_abs,
       floor(sqrt(CAST(sum(v * v) AS DOUBLE) / n_samples) * 10000.0)
         / 10000.0 AS rms
FROM signed_s
GROUP BY 1, 2, 3, 4
"""


MOTION_SCHEMA = ("doc_id bigint, width int, height int, n_frames int, "
                 "motion_energy bigint, mean_abs_diff double")


def video_motion(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL video analysis per payload: decode the AVI (same derivation
    as :func:`avi_roundtrip`) and emit frame-difference energy —
    Σ|frame₁[j] − frame₀[j]| over raw bytes — the scene-change /
    static-content signal a video curation pipeline thresholds on.
    Single-frame clips score 0.  Energy is an exact integer; the
    per-byte mean is floored at 4 decimals."""
    from ..functions.videocodec import decode_avi, encode_avi

    def _mo(b: bytes):
        b = bytes(b)
        h64 = _hash64_py(b)
        n_frames = 1 + h64 % 2
        fps = 10 + h64 % 15
        raw = hashlib.sha256(b).digest()[: n_frames * 12]
        frames = [raw[i * 12:(i + 1) * 12] for i in range(n_frames)]
        avi = decode_avi(encode_avi(2, 2, frames, fps=fps))
        energy = 0
        if avi.n_frames >= 2:
            a, c = avi.frames[0], avi.frames[1]
            energy = sum(abs(x - y) for x, y in zip(a, c))
        return (avi.width, avi.height, avi.n_frames, energy,
                len(avi.frames[0]))

    import numpy as np

    for pdf in batches:
        metas = pdf["payload"].map(_mo)
        energy = metas.map(lambda m: m[3]).astype("int64")
        nbytes = metas.map(lambda m: m[4]).astype("int64")
        mean_ad = np.floor(energy.values.astype("float64")
                           / nbytes.values.astype("float64")
                           * 10000.0) / 10000.0
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "width": metas.map(lambda m: m[0]).astype("int32"),
            "height": metas.map(lambda m: m[1]).astype("int32"),
            "n_frames": metas.map(lambda m: m[2]).astype("int32"),
            "motion_energy": energy,
            "mean_abs_diff": mean_ad,
        })


def mm_video_motion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → frame-difference energy through the real AVI codec."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(video_motion, MOTION_SCHEMA)


MM_VIDEO_MOTION_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_H64} AS h64, sha256(text) AS sha_hex FROM documents
),
hdr AS (
  SELECT doc_id, CAST(1 + h64 % 2 AS INT) AS n_frames, sha_hex FROM h
),
-- frame f, byte j lives at digest byte (12*f + j): hex position
-- 2*(12*f + j) + 1.  Fixed 12-byte frame domain (2x2 BI_RGB24).
diffs AS (
  SELECT doc_id, n_frames,
         abs({_hexbyte('sha_hex', '2 * (12 + gs.j) + 1')}
             - {_hexbyte('sha_hex', '2 * gs.j + 1')}) AS d
  FROM hdr CROSS JOIN generate_series(0, 11) AS gs(j)
  WHERE n_frames >= 2
),
energy AS (
  SELECT doc_id, CAST(sum(d) AS BIGINT) AS motion_energy FROM diffs
  GROUP BY 1
)
SELECT hdr.doc_id, 2 AS width, 2 AS height, hdr.n_frames,
       coalesce(e.motion_energy, 0) AS motion_energy,
       floor(CAST(coalesce(e.motion_energy, 0) AS DOUBLE) / 12.0
             * 10000.0) / 10000.0 AS mean_abs_diff
FROM hdr LEFT JOIN energy e ON hdr.doc_id = e.doc_id
"""


IMAGE_STATS_SCHEMA = ("doc_id bigint, width int, height int, "
                      "sum_r bigint, sum_g bigint, sum_b bigint, "
                      "mean_luma double")


def image_stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL image analysis per payload: decode the BMP (same derivation
    as :func:`bmp_roundtrip`) and emit exact per-channel pixel sums plus
    a floored ITU-R 601 luminance mean — the brightness/black-frame gate
    of an image curation pipeline.  Channel sums are integers over the
    decoded (not source) bytes, so any stride/flip/channel-order defect
    shifts them and breaks oracle parity."""
    from ..functions.imagecodec import decode_bmp, encode_bmp

    def _st(b: bytes):
        b = bytes(b)
        h64 = _hash64_py(b)
        w, h = 1 + h64 % 3, 1 + h64 % 2
        raw = hashlib.sha256(b).digest()[: w * h * 3]
        img = decode_bmp(encode_bmp(w, h, raw))
        px = img.pixels
        sr = sum(px[0::3])
        sg = sum(px[1::3])
        sb = sum(px[2::3])
        return (img.width, img.height, sr, sg, sb, w * h)

    import numpy as np

    for pdf in batches:
        metas = pdf["payload"].map(_st)
        sr = metas.map(lambda m: m[2]).astype("int64")
        sg = metas.map(lambda m: m[3]).astype("int64")
        sb = metas.map(lambda m: m[4]).astype("int64")
        n = metas.map(lambda m: m[5]).astype("int64").values.astype("float64")
        luma = np.floor(
            (0.299 * sr.values.astype("float64")
             + 0.587 * sg.values.astype("float64")
             + 0.114 * sb.values.astype("float64")) / n * 10000.0
        ) / 10000.0
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "width": metas.map(lambda m: m[0]).astype("int32"),
            "height": metas.map(lambda m: m[1]).astype("int32"),
            "sum_r": sr, "sum_g": sg, "sum_b": sb,
            "mean_luma": luma,
        })


def mm_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → channel sums / luminance through the real BMP codec."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(image_stats, IMAGE_STATS_SCHEMA)


AHASH_SCHEMA = "doc_id bigint, width int, height int, ahash bigint"


def image_ahash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL perceptual average-hash per payload: decode the BMP, take
    integer ITU-R 601 luma per pixel (×1000 so it stays exact), and set
    bit p when pixel p is brighter than the image mean — the aHash used
    for near-duplicate image detection.  The mean comparison is the
    cross-multiplied integer ``L_p · n_px > ΣL`` so no division ever
    happens."""
    from ..functions.imagecodec import decode_bmp, encode_bmp

    def _ah(b: bytes):
        b = bytes(b)
        h64 = _hash64_py(b)
        w, h = 1 + h64 % 3, 1 + h64 % 2
        raw = hashlib.sha256(b).digest()[: w * h * 3]
        img = decode_bmp(encode_bmp(w, h, raw))
        px = img.pixels
        n = w * h
        lum = [299 * px[3 * p] + 587 * px[3 * p + 1] + 114 * px[3 * p + 2]
               for p in range(n)]
        s = sum(lum)
        ah = sum(1 << p for p in range(n) if lum[p] * n > s)
        return (w, h, ah)

    for pdf in batches:
        metas = pdf["payload"].map(_ah)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "width": metas.map(lambda m: m[0]).astype("int32"),
            "height": metas.map(lambda m: m[1]).astype("int32"),
            "ahash": metas.map(lambda m: m[2]).astype("int64"),
        })


def mm_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup: every image gets its aHash through
    the REAL decode path, then images bucket on (width, height, ahash)
    and each bucket keeps its smallest doc_id — exact-fingerprint dedup
    applied to *pixels*, the image-side twin of ``dedup_exact`` (at
    production hash widths, identical aHash ⇔ visually-identical; the
    banding/hamming refinement is the LSH ladder's job).

    Scale shape: one Arrow-batched decode pass, one shuffle on the
    bucket key, and a key-join back for the keeper flag — the decode
    never re-runs (lazy localCheckpoint), nothing is driver-side.

    Oracle: DuckDB re-derives the pixel bytes algebraically (the
    ``mm_image_stats`` derivation) and recomputes luma bits — a codec
    stride/flip/channel-order bug changes the hash and fails parity.
    """
    docs = load_table(spark, sf_dir, "documents")
    per = with_payload(docs).mapInPandas(image_ahash, AHASH_SCHEMA) \
        .transform(cut_lineage)   # decode once: feeds agg + join
    buckets = per.groupBy("width", "height", "ahash").agg(
        F.count(F.lit(1)).alias("n_bucket"),
        F.min("doc_id").alias("keeper"),
    )
    return per.join(buckets, ["width", "height", "ahash"]).select(
        "doc_id", "width", "height", "ahash", "n_bucket",
        (F.col("doc_id") == F.col("keeper")).cast("int")
        .alias("is_keeper"),
    )


MM_AHASH_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_H64} AS h64, sha256(text) AS sha_hex FROM documents
),
hdr AS (
  SELECT doc_id,
         CAST(1 + h64 % 3 AS INT) AS width,
         CAST(1 + h64 % 2 AS INT) AS height,
         CAST((1 + h64 % 3) * (1 + h64 % 2) AS INT) AS n_px,
         sha_hex
  FROM h
),
px AS (
  SELECT doc_id, width, height, n_px, gs.p AS p,
         {_hexbyte('sha_hex', '6 * gs.p + 1')} AS r,
         {_hexbyte('sha_hex', '6 * gs.p + 3')} AS g,
         {_hexbyte('sha_hex', '6 * gs.p + 5')} AS b
  FROM hdr CROSS JOIN generate_series(0, 5) AS gs(p)
  WHERE gs.p < n_px
),
lum AS (
  SELECT doc_id, width, height, n_px, p,
         299 * r + 587 * g + 114 * b AS l
  FROM px
),
tot AS (SELECT doc_id, sum(l) AS sl FROM lum GROUP BY 1),
ah AS (
  SELECT lum.doc_id, width, height,
         CAST(sum(CASE WHEN l * n_px > sl THEN (1 << p) ELSE 0 END)
              AS BIGINT) AS ahash
  FROM lum JOIN tot ON lum.doc_id = tot.doc_id
  GROUP BY 1, 2, 3
),
buckets AS (
  SELECT width, height, ahash, CAST(count(*) AS BIGINT) AS n_bucket,
         min(doc_id) AS keeper
  FROM ah GROUP BY 1, 2, 3
)
SELECT ah.doc_id, ah.width, ah.height, ah.ahash, b.n_bucket,
       CAST(ah.doc_id = b.keeper AS INT) AS is_keeper
FROM ah JOIN buckets b ON ah.width = b.width AND ah.height = b.height
                      AND ah.ahash = b.ahash
"""


MM_IMAGE_STATS_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_H64} AS h64, sha256(text) AS sha_hex FROM documents
),
hdr AS (
  SELECT doc_id,
         CAST(1 + h64 % 3 AS INT) AS width,
         CAST(1 + h64 % 2 AS INT) AS height,
         CAST((1 + h64 % 3) * (1 + h64 % 2) AS INT) AS n_px,
         sha_hex
  FROM h
),
-- pixel p channel c (0=R,1=G,2=B) is digest byte (3p + c):
-- hex position 2*(3p + c) + 1.  Max 6 pixels (3x2).
px AS (
  SELECT doc_id, width, height, n_px,
         {_hexbyte('sha_hex', '6 * gs.p + 1')} AS r,
         {_hexbyte('sha_hex', '6 * gs.p + 3')} AS g,
         {_hexbyte('sha_hex', '6 * gs.p + 5')} AS b
  FROM hdr CROSS JOIN generate_series(0, 5) AS gs(p)
  WHERE gs.p < n_px
)
SELECT doc_id, width, height,
       CAST(sum(r) AS BIGINT) AS sum_r,
       CAST(sum(g) AS BIGINT) AS sum_g,
       CAST(sum(b) AS BIGINT) AS sum_b,
       floor((0.299 * CAST(sum(r) AS DOUBLE)
              + 0.587 * CAST(sum(g) AS DOUBLE)
              + 0.114 * CAST(sum(b) AS DOUBLE)) / n_px * 10000.0)
         / 10000.0 AS mean_luma
FROM px
GROUP BY doc_id, width, height, n_px
"""


#: A frame is "silent" when every channel's |int16 sample| is below this
#: (25% of full scale — roughly a -12 dBFS gate on the hash-uniform PCM).
SILENCE_THRESHOLD = 8192

TRIM_SCHEMA = ("doc_id bigint, n_frames int, silent_frames int, "
               "trim_start int, trim_end_excl int, trimmed_hex string")


def audio_trim_silence(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """REAL audio curation per payload: decode the WAV (same derivation
    as :func:`wav_roundtrip`), gate each frame on max-channel amplitude,
    and TRIM leading/trailing silence — the standard pre-training audio
    cleanup (interior quiet frames stay; only the edges go).  Emits the
    silent-frame census, the kept [start, end) frame range, and the
    surviving PCM bytes (hex) so a stride or endianness bug in the gate
    breaks value parity, not just counts."""
    import struct

    from ..functions.audiocodec import decode_wav, encode_wav

    def _trim(b: bytes):
        b = bytes(b)
        h64 = _hash64_py(b)
        rate = 8000 * (1 + h64 % 3)
        channels = 1 + h64 % 2
        n_frames = 1 + h64 % 5
        pcm = hashlib.sha256(b).digest()[: n_frames * channels * 2]
        wav = decode_wav(encode_wav(rate, channels, pcm))
        fsz = wav.channels * 2
        frames = [wav.pcm[i * fsz:(i + 1) * fsz]
                  for i in range(wav.n_frames)]
        loud = [
            max(abs(v) for v in struct.unpack(f"<{wav.channels}h", fr))
            >= SILENCE_THRESHOLD
            for fr in frames
        ]
        loud_idx = [i for i, keep in enumerate(loud) if keep]
        start = loud_idx[0] if loud_idx else wav.n_frames
        end = loud_idx[-1] + 1 if loud_idx else 0
        return (wav.n_frames, loud.count(False), start, end,
                b"".join(frames[start:end]).hex())

    for pdf in batches:
        metas = pdf["payload"].map(_trim)
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_frames": metas.map(lambda m: m[0]).astype("int32"),
            "silent_frames": metas.map(lambda m: m[1]).astype("int32"),
            "trim_start": metas.map(lambda m: m[2]).astype("int32"),
            "trim_end_excl": metas.map(lambda m: m[3]).astype("int32"),
            "trimmed_hex": metas.map(lambda m: m[4]),
        })


def mm_audio_trim_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload -> real WAV decode -> leading/trailing silence trim."""
    docs = load_table(spark, sf_dir, "documents")
    return with_payload(docs).mapInPandas(audio_trim_silence, TRIM_SCHEMA)


#: int16-LE from 4 hex chars (lo byte first): v = hi·256 + lo, signed.
_S16 = ("(('0x' || substr(sx, 3, 2) || substr(sx, 1, 2))::INT)")

MM_AUDIO_TRIM_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_H64} AS h64, sha256(text) AS sha_hex FROM documents
),
d AS (
  SELECT doc_id, 1 + h64 % 2 AS ch, 1 + h64 % 5 AS nf, sha_hex FROM h
),
sm AS (
  SELECT doc_id, nf, i, fx,
         max(abs(CASE WHEN v >= 32768 THEN v - 65536 ELSE v END)) AS amp
  FROM (
    SELECT d.doc_id, d.nf, i.i,
           substr(d.sha_hex, CAST(i.i * d.ch * 4 + 1 AS INT),
                  CAST(d.ch * 4 AS INT)) AS fx,
           {_S16.replace("sx",
                         "substr(d.sha_hex,"
                         " CAST((i.i * d.ch + c.c) * 4 + 1 AS INT), 4)")} AS v
    FROM d
    CROSS JOIN UNNEST(range(d.nf)) AS i(i)
    CROSS JOIN UNNEST(range(d.ch)) AS c(c)
  )
  GROUP BY doc_id, nf, i, fx
),
fl AS (SELECT *, amp >= {SILENCE_THRESHOLD} AS loud FROM sm),
ag AS (
  SELECT doc_id, max(nf) AS nf,
         sum(CASE WHEN NOT loud THEN 1 ELSE 0 END) AS silent,
         coalesce(min(CASE WHEN loud THEN i END), max(nf)) AS ts,
         coalesce(max(CASE WHEN loud THEN i END) + 1, 0) AS te
  FROM fl GROUP BY 1
)
SELECT ag.doc_id, CAST(ag.nf AS INT) AS n_frames,
       CAST(ag.silent AS INT) AS silent_frames,
       CAST(ag.ts AS INT) AS trim_start,
       CAST(ag.te AS INT) AS trim_end_excl,
       coalesce(string_agg(fl.fx, '' ORDER BY fl.i)
                FILTER (WHERE fl.i >= ag.ts AND fl.i < ag.te), '')
         AS trimmed_hex
FROM ag JOIN fl ON fl.doc_id = ag.doc_id
GROUP BY ag.doc_id, ag.nf, ag.silent, ag.ts, ag.te
"""


WAV_BYTES_SCHEMA = "doc_id bigint, wav binary"


def wav_encode_only(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Encode-only half of the WAV path (see :func:`png_encode_only`)."""
    from ..functions.audiocodec import encode_wav

    def _enc(b: bytes) -> bytes:
        b = bytes(b)
        h64 = _hash64_py(b)
        rate = 8000 * (1 + h64 % 3)
        channels = 1 + h64 % 2
        n_frames = 1 + h64 % 5
        pcm = hashlib.sha256(b).digest()[: n_frames * channels * 2]
        return encode_wav(rate, channels, pcm)

    for pdf in batches:
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "wav": pdf["payload"].map(_enc),
        })


def _le_int(col: str, pos: int, nbytes: int) -> F.Column:
    """Little-endian unsigned int from bytes [pos, pos+nbytes), 1-based —
    the byte-order mirror of :func:`_be_int` (RIFF/WAVE is LE where PNG
    is BE; a lake's header parser needs both)."""
    total = F.lit(0).cast("long")
    for i in range(nbytes):
        byte = F.conv(
            F.hex(F.expr(f"substring({col}, {pos + i}, 1)")), 16, 10
        ).cast("long")
        total = total + byte * F.lit(256 ** i).cast("long")
    return total


def mm_wav_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIFF/WAVE header metadata parsed relationally from the binary
    column — the little-endian companion of :func:`mm_png_header_parse`:
    magic tags as hex compares, fmt-chunk fields (PCM tag, channels,
    sample rate, block align, bits) as LE byte-weighted sums, and the
    data-chunk length cross-checked against the frame geometry.  The
    oracle re-derives every field from the payload-hash recipe, so a
    wrong byte anywhere in the emitted container breaks parity.
    """
    docs = load_table(spark, sf_dir, "documents")
    wavs = with_payload(docs).mapInPandas(wav_encode_only, WAV_BYTES_SCHEMA)
    # Layout: RIFF(4) size(4) WAVE(4) 'fmt '(4) len(4) fmt(16) 'data'(4)
    # len(4) pcm...  => fmt starts at byte 21, data length at byte 41.
    return wavs.select(
        "doc_id",
        (F.hex(F.expr("substring(wav, 1, 4)")) == F.lit("52494646"))
        .alias("riff_ok"),
        (F.hex(F.expr("substring(wav, 9, 4)")) == F.lit("57415645"))
        .alias("wave_ok"),
        _le_int("wav", 21, 2).cast("int").alias("audio_format"),
        _le_int("wav", 23, 2).cast("int").alias("channels"),
        _le_int("wav", 25, 4).cast("int").alias("sample_rate"),
        _le_int("wav", 33, 2).cast("int").alias("block_align"),
        _le_int("wav", 35, 2).cast("int").alias("bits_per_sample"),
        _le_int("wav", 41, 4).cast("long").alias("data_len"),
    ).withColumn(
        "n_frames",
        F.expr("data_len div block_align").cast("int"),
    )


MM_WAV_HEADER_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_H64} AS h64 FROM documents
)
SELECT doc_id,
       TRUE AS riff_ok, TRUE AS wave_ok,
       CAST(1 AS INT) AS audio_format,
       CAST(1 + h64 % 2 AS INT) AS channels,
       CAST(8000 * (1 + h64 % 3) AS INT) AS sample_rate,
       CAST(2 * (1 + h64 % 2) AS INT) AS block_align,
       CAST(16 AS INT) AS bits_per_sample,
       CAST((1 + h64 % 5) * (1 + h64 % 2) * 2 AS BIGINT) AS data_len,
       CAST(1 + h64 % 5 AS INT) AS n_frames
FROM h
"""


PNG_BYTES_SCHEMA = "doc_id bigint, png binary"


def png_encode_only(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Encode-only half of the PNG path: payload -> real PNG bytes.
    (The decode half is deliberately NOT here — downstream parsing
    happens relationally, on the binary column.)"""
    from ..functions.pngcodec import encode_png

    def _enc(b: bytes) -> bytes:
        b = bytes(b)
        h64 = _hash64_py(b)
        w = h = 1 + h64 % 3
        raw = hashlib.sha256(b).digest()[: w * h * 3]
        return encode_png(w, h, raw)

    for pdf in batches:
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "png": pdf["payload"].map(_enc),
        })


def _be_int(pos: int, nbytes: int) -> F.Column:
    """Big-endian unsigned int from PNG bytes [pos, pos+nbytes), 1-based —
    pure column algebra over the binary type (hex + base conversion)."""
    return F.conv(
        F.hex(F.expr(f"substring(png, {pos}, {nbytes})")), 16, 10
    ).cast("long")


def mm_png_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata FROM the opaque binary column, relationally: emit
    real PNG bytes (the codec's encode half through the Arrow seam),
    then parse the signature and IHDR fields — width, height, bit
    depth, color type — with plain column expressions on the binary
    type (``substring``/``hex``/``conv``), never touching Python again.

    This is the metadata-extraction shape a multimodal lake runs right
    after ingest (million-file `binaryFile` scans -> header columns for
    partition pruning): container sniffing and fixed-offset fields are
    cheap column algebra; only genuine pixel decoding needs the Pandas
    seam.  The oracle derives the same fields algebraically from the
    payload-hash geometry — so a wrong byte ANYWHERE in the emitted
    header breaks parity.
    """
    docs = load_table(spark, sf_dir, "documents")
    pngs = with_payload(docs).mapInPandas(png_encode_only, PNG_BYTES_SCHEMA)
    return pngs.select(
        "doc_id",
        (F.hex(F.expr("substring(png, 1, 8)"))
         == F.lit("89504E470D0A1A0A")).alias("magic_ok"),
        _be_int(9, 4).alias("ihdr_len"),
        _be_int(17, 4).alias("width"),
        _be_int(21, 4).alias("height"),
        _be_int(25, 1).cast("int").alias("bit_depth"),
        _be_int(26, 1).cast("int").alias("color_type"),
        F.length("png").cast("long").alias("n_bytes"),
    ).withColumn(
        # Compressed size is codec-dependent; what IS invariant is that
        # the container overhead (sig + IHDR/IDAT/IEND framing = 57
        # bytes) plus at least one DEFLATE byte per scanline is present.
        "framing_ok",
        (F.col("n_bytes") >= 57 + F.col("height")).cast("boolean"),
    ).drop("n_bytes")


MM_PNG_HEADER_ORACLE = f"""
WITH h AS (
  SELECT doc_id, {_H64} AS h64 FROM documents
)
SELECT doc_id,
       TRUE AS magic_ok,
       CAST(13 AS BIGINT) AS ihdr_len,
       CAST(1 + h64 % 3 AS BIGINT) AS width,
       CAST(1 + h64 % 3 AS BIGINT) AS height,
       CAST(8 AS INT) AS bit_depth,
       CAST(2 AS INT) AS color_type,
       TRUE AS framing_ok
FROM h
"""


SPECS: dict[str, QuerySpec] = {
    "mm_png_header_parse": QuerySpec(mm_png_header_parse,
                                     MM_PNG_HEADER_ORACLE),
    "mm_wav_header_parse": QuerySpec(mm_wav_header_parse,
                                     MM_WAV_HEADER_ORACLE),
    "mm_decode_stub": QuerySpec(mm_decode_stub, MM_DECODE_ORACLE),
    "mm_audio_trim_silence": QuerySpec(mm_audio_trim_silence,
                                       MM_AUDIO_TRIM_ORACLE),
    "mm_audio_features": QuerySpec(mm_audio_features,
                                   MM_AUDIO_FEATURES_ORACLE),
    "mm_video_motion": QuerySpec(mm_video_motion, MM_VIDEO_MOTION_ORACLE),
    "mm_image_stats": QuerySpec(mm_image_stats, MM_IMAGE_STATS_ORACLE),
    "mm_image_ahash_dedup": QuerySpec(mm_image_ahash_dedup,
                                      MM_AHASH_ORACLE),
    "mm_frame_sample": QuerySpec(mm_frame_sample, MM_FRAME_ORACLE),
    "mm_resize_stub": QuerySpec(mm_resize_stub, MM_RESIZE_ORACLE),
    "mm_resize_real": QuerySpec(mm_resize_real, MM_RESIZE_REAL_ORACLE),
    "mm_frame_sample_real": QuerySpec(mm_frame_sample_real,
                                      MM_FRAME_REAL_ORACLE),
    "mm_audio_resample_real": QuerySpec(mm_audio_resample_real,
                                        MM_AUDIO_RESAMPLE_ORACLE),
    "mm_roundtrip_bmp": QuerySpec(mm_roundtrip_bmp, MM_ROUNDTRIP_ORACLE),
    "mm_roundtrip_png": QuerySpec(mm_roundtrip_png, MM_PNG_ORACLE),
    "mm_roundtrip_gif": QuerySpec(mm_roundtrip_gif, MM_GIF_ORACLE),
    "mm_roundtrip_tiff": QuerySpec(mm_roundtrip_tiff, MM_TIFF_ORACLE),
    "mm_gif_frames": QuerySpec(mm_gif_frames, MM_GIF_FRAMES_ORACLE),
    "mm_roundtrip_jpeg": QuerySpec(mm_roundtrip_jpeg, MM_JPEG_ORACLE),
    "mm_roundtrip_jpeg_progressive": QuerySpec(
        mm_roundtrip_jpeg_progressive, MM_JPEG_PROG_ORACLE),
    "mm_roundtrip_mp4": QuerySpec(mm_roundtrip_mp4, MM_MP4_ORACLE),
    "mm_video_mjpeg_frames": QuerySpec(mm_video_mjpeg_frames,
                                       MM_MJPEG_FRAMES_ORACLE),
    "mm_roundtrip_wav": QuerySpec(mm_roundtrip_wav, MM_WAV_ORACLE),
    "mm_roundtrip_avi": QuerySpec(mm_roundtrip_avi, MM_AVI_ORACLE),
    "mm_feature_extract": QuerySpec(mm_feature_extract, MM_FEATURE_ORACLE),
}
