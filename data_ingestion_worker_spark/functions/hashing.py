"""Deterministic hashing shared by identity, dedup and LSH operators.

Two needs drive the design:

1. **Row identity** (reference ``src/repositories/staging_repository.py:20-44``
   hashes ``{job_id, row_number, email.lower(), first, last, company}`` with
   sha256-over-canonical-json).  We re-specify the canonical form as a
   ``\\x01``-separated field concatenation — same identity semantics
   (ADR-001), no JSON quoting edge cases — and keep sha256.

2. **A numeric hash computable bit-identically in Spark *and* DuckDB**, so
   MinHash / SimHash / LSH operators can be verified against a SQL oracle:
   ``hash64(x) = int(md5(x)[:15], 16)`` — 60 bits, fits a signed int64.
   Spark: ``conv(substr(md5(x),1,15),16,10)::bigint``;
   DuckDB: ``('0x' || substr(md5(x),1,15))::bigint``.
   (Spark's builtin ``hash``/``xxhash64`` are murmur/xxh — fast but not
   reproducible in other engines, so they are used only where no oracle
   parity is needed.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Unit-separator used to build canonical row strings (never appears in data).
FIELD_SEP = "\x01"


def hash64(col: Column | str) -> Column:
    """Deterministic 60-bit integer hash of a string column.

    Reproducible in DuckDB as ``('0x' || substr(md5(x),1,15))::BIGINT``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def hash64_sql(expr: str) -> str:
    """DuckDB rendering of :func:`hash64` for oracle SQL strings."""
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def canonical_row(job_id: Column, row_number: Column, email: Column,
                  first_name: Column, last_name: Column,
                  company: Column) -> Column:
    """Canonical string over the reference's identity fields.

    Mirrors staging_repository.py:20-44: email lowercased, every field
    trimmed, nulls treated as empty.  Field order is fixed
    (job_id, row_number, email, first_name, last_name, company).
    """
    def clean(c: Column) -> Column:
        return F.trim(F.coalesce(c, F.lit("")))

    return F.concat_ws(
        FIELD_SEP,
        job_id.cast("string"),
        row_number.cast("string"),
        F.lower(clean(email)),
        clean(first_name),
        clean(last_name),
        clean(company),
    )


def row_hash(job_id: Column, row_number: Column, email: Column,
             first_name: Column, last_name: Column,
             company: Column) -> Column:
    """sha256 hex row-identity hash (ADR-001 idempotency key).

    Reference: staging_repository.py:20-44 (sha256 over canonical JSON);
    uniqueness enforced per (job_id, row_hash), README.md:131-135.
    """
    return F.sha2(
        canonical_row(job_id, row_number, email, first_name, last_name,
                      company),
        256,
    )
