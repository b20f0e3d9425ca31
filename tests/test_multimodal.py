"""Multimodal decode seam: stub plumbing always, real codec when present.

The stub path is oracle-verified (mm_decode_stub in the registry); these
tests pin the seam itself — that the dispatch picks the right decoder
and that the real path works end-to-end whenever Pillow exists in the
environment (skipped otherwise, by design: the container has no codecs).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_ingestion_worker_spark.operators.multimodal import (
    HAS_PIL,
    decode_image,
    decode_image_real,
    fake_decode_image,
    mm_decode_real,
)


def test_seam_dispatches_on_pillow_presence():
    expected = decode_image_real if HAS_PIL else fake_decode_image
    assert decode_image is expected


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not installed")
def test_real_decode_reads_png_and_isolates_corrupt_rows(spark):
    """A real 2x3 PNG decodes to its true dimensions; a corrupt payload
    yields NULL metadata instead of failing the batch (T10)."""
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (2, 3)).save(buf, format="PNG")
    rows = [(1, bytearray(buf.getvalue())), (2, bytearray(b"not an image"))]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    out = {r["doc_id"]: r for r in mm_decode_real(spark, df).collect()}
    assert (out[1]["width"], out[1]["height"]) == (2, 3)
    assert out[1]["format"] == "PNG"
    assert out[2]["width"] is None and out[2]["mode"] is None


def test_real_decode_raises_cleanly_without_pillow(spark):
    if HAS_PIL:
        pytest.skip("Pillow present; covered by the real-decode test")
    df = spark.createDataFrame([(1, bytearray(b"x"))],
                               "doc_id bigint, payload binary")
    with pytest.raises(Exception) as exc:
        mm_decode_real(spark, df).collect()
    assert "NotImplementedError" in str(exc.value) \
        or isinstance(exc.value, NotImplementedError)


def test_stub_oracle_path_unchanged(spark, sf_dir):
    """mm_decode_stub keeps the deterministic stub regardless of codecs."""
    from data_ingestion_worker_spark.operators.multimodal import (
        mm_decode_stub,
    )
    row = mm_decode_stub(spark, sf_dir).filter(F.col("doc_id") == 0) \
        .collect()[0]
    assert row["fake_width"] is not None and row["payload_sha"] is not None
