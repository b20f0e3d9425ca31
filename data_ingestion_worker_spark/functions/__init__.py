"""Scalar column-expression library (no row-at-a-time Python UDFs).

Every scalar rule of the reference (SURVEY.md §2.6, F1-F9) plus the text /
hash / vector functions the scale extensions need, all as built-in
``pyspark.sql.functions`` expressions that stay inside whole-stage codegen.
"""

from .hashing import hash64, row_hash  # noqa: F401
from .validation import (  # noqa: F401
    EMAIL_REGEX,
    issue_key,
    normalize_email,
    validation_verdict,
)
