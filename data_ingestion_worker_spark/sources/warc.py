"""WARC (Web ARChive, ISO 28500) source — the Common-Crawl container.

The reference ingests one CSV per job from object storage
(``/root/reference/src/services/s3_service.py``); a pretraining-scale
text pipeline ingests *web crawls*, and the interchange format for
those is WARC: a sequence of records, each a block of named headers
followed by exactly ``Content-Length`` bytes of content.  This module
is a dependency-free reader/writer pair:

- :func:`parse_warc` — pure-Python record parser over one archive's
  bytes.  Honors ``Content-Length`` (content may itself contain blank
  lines and even ``WARC/1.0`` magic — delimiters cannot be trusted),
  handles the per-record-gzip-member layout real crawls use
  (``.warc.gz``: each record its own gzip member, so a reader can
  seek to any member without decompressing the file), and strips the
  HTTP envelope from ``response`` records.
- :func:`read_warc` — the Spark face: ``binaryFile`` scan → Arrow-
  batched ``mapInPandas``, one output row per record.  Parsing is
  per-archive-embarrassingly-parallel; at 100 TB the unit of work is
  one ~1 GB archive per task, the same layout Common Crawl publishes
  (``crawl-data/CC-MAIN-*/segments/*/warc/*.warc.gz``).
- :func:`write_warc` — byte-deterministic writer used by tests and
  fixture tooling (zero-entropy headers only; real crawlers stamp
  record ids — the reader treats them as opaque).

Records surface as ``(archive, rec_type, target_uri, warc_date,
content_type, content_length, body)`` with ``body`` the *payload*
(HTTP envelope removed for ``response`` records) decoded
UTF-8-with-replacement — ready for the text-analysis operators.
"""

from __future__ import annotations

import gzip
import io
import zlib
from typing import Iterator

_CRLF = b"\r\n"


def _gzip_members(payload: bytes) -> Iterator[bytes]:
    """Decompress a multi-member gzip stream, yielding one bytes blob
    per member (the .warc.gz record-per-member layout)."""
    pos = 0
    while pos < len(payload):
        d = zlib.decompressobj(wbits=31)   # gzip wrapper
        out = d.decompress(payload[pos:])
        yield out
        consumed = len(payload) - pos - len(d.unused_data)
        if consumed <= 0:   # corrupt trailer; stop rather than spin
            break
        pos += consumed


def _split_records(raw: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, content) per WARC record in a raw byte stream."""
    pos = 0
    n = len(raw)
    while pos < n:
        # Skip inter-record padding (spec: two CRLFs after content).
        while raw.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            return
        if not raw.startswith(b"WARC/", pos):
            # Not at a record boundary: resync to the next magic (a
            # truncated or corrupt record must not sink the archive —
            # the reference's poison-message discard, S3 analog).
            nxt = raw.find(b"\r\nWARC/", pos)
            if nxt < 0:
                return
            pos = nxt + 2
        hdr_end = raw.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        lines = raw[pos:hdr_end].split(_CRLF)
        for line in lines[1:]:              # lines[0] is "WARC/1.0"
            k, _, v = line.partition(b":")
            if _:
                headers[k.decode("ascii", "replace").strip().lower()] = \
                    v.decode("utf-8", "replace").strip()
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            # Unrecoverable without a length: resync past this header.
            pos = hdr_end + 4
            continue
        body_start = hdr_end + 4
        yield headers, raw[body_start:body_start + clen]
        pos = body_start + clen


def _http_payload(content: bytes) -> bytes:
    """Strip the HTTP envelope of a ``response`` record's content."""
    if content.startswith(b"HTTP/"):
        sep = content.find(_CRLF + _CRLF)
        if sep >= 0:
            return content[sep + 4:]
    return content


def parse_warc(payload: bytes, gzipped: bool | None = None) -> list[dict]:
    """Parse one archive's bytes into a list of record dicts.

    ``gzipped=None`` sniffs the gzip magic.  Each dict carries
    ``rec_type, target_uri, warc_date, content_type, content_length,
    body`` (body = HTTP payload for response records, full content
    otherwise; UTF-8 with replacement).
    """
    if gzipped is None:
        gzipped = payload[:2] == b"\x1f\x8b"
    if gzipped:
        raw = b"".join(_gzip_members(payload))
    else:
        raw = payload
    out = []
    for headers, content in _split_records(raw):
        rec_type = headers.get("warc-type", "")
        body = _http_payload(content) if rec_type == "response" \
            else content
        out.append({
            "rec_type": rec_type,
            "target_uri": headers.get("warc-target-uri", ""),
            "warc_date": headers.get("warc-date", ""),
            "content_type": headers.get("content-type", ""),
            "content_length": len(content),
            "body": body.decode("utf-8", "replace"),
        })
    return out


WARC_SCHEMA = ("archive string, rec_type string, target_uri string, "
               "warc_date string, content_type string, "
               "content_length bigint, body string")


def _explode_archives(batches):
    import pandas as pd

    for pdf in batches:
        rows = []
        for path, content in zip(pdf["path"], pdf["content"]):
            for rec in parse_warc(bytes(content)):
                rec["archive"] = path
                rows.append(rec)
        yield pd.DataFrame(
            rows,
            columns=["archive", "rec_type", "target_uri", "warc_date",
                     "content_type", "content_length", "body"],
        )


def read_warc(spark, path: str, glob: str = "*.warc*"):
    """Directory of WARC archives → one row per record.

    ``binaryFile`` scan (one task per archive — Common Crawl's natural
    parallelism unit) exploded through an Arrow-batched ``mapInPandas``;
    downstream filters/projections stay Catalyst-side.
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", "content")
    )
    return raw.mapInPandas(_explode_archives, WARC_SCHEMA)


def write_warc(path: str, records: list[dict],
               gzipped: bool | None = None) -> None:
    """Byte-deterministic WARC writer (fixtures + tests).

    ``records``: dicts with ``rec_type, target_uri, body`` (+ optional
    ``warc_date, content_type, http_headers``).  A ``response`` record
    gets an HTTP/1.1 200 envelope so readers exercise the strip path.
    """
    chunks = []
    for rec in records:
        body = rec["body"].encode("utf-8") \
            if isinstance(rec["body"], str) else rec["body"]
        if rec.get("rec_type", "response") == "response":
            envelope = (b"HTTP/1.1 200 OK\r\nContent-Type: " +
                        rec.get("content_type",
                                "text/html").encode("ascii") +
                        b"\r\n\r\n")
            content = envelope + body
        else:
            content = body
        headers = [
            b"WARC/1.0",
            b"WARC-Type: " + rec.get("rec_type",
                                     "response").encode("ascii"),
            b"WARC-Target-URI: " + rec.get("target_uri",
                                           "").encode("utf-8"),
            b"WARC-Date: " + rec.get("warc_date",
                                     "2026-01-01T00:00:00Z")
            .encode("ascii"),
            b"Content-Type: application/http; msgtype=response",
            b"Content-Length: " + str(len(content)).encode("ascii"),
        ]
        chunks.append(_CRLF.join(headers) + _CRLF + _CRLF + content
                      + _CRLF + _CRLF)
    if gzipped is None:
        gzipped = path.endswith(".gz")
    if gzipped:
        # Record-per-gzip-member, mtime pinned for byte determinism.
        buf = io.BytesIO()
        for c in chunks:
            buf.write(gzip.compress(c, mtime=0))
        data = buf.getvalue()
    else:
        data = b"".join(chunks)
    with open(path, "wb") as f:
        f.write(data)
