"""Text-analysis column expressions for the ``documents`` table.

Training-data-pipeline primitives (BASELINE.json north star): token
counting, quality scoring, language-ID heuristics, normalization and
fingerprinting — all as built-in column expressions (JVM-side, codegen),
no Python in the hot path.

Each helper has an exact DuckDB mirror (built next to the SPECS in
``operators/text.py``) so the semantics are pinned by the oracle gate.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: BPE-ish pre-tokenizer: letter runs, digit runs, single non-space symbols.
BPE_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

#: Tiny marker-word inventories for the language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "is", "of"],
    "de": ["der", "die", "das", "und"],
    "es": ["el", "la", "los", "y"],
    "fr": ["le", "les", "et", "dans"],
}

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is"]


def tokens(text: Column) -> Column:
    """Whitespace tokens of the lowercased text (empty text -> empty array)."""
    t = F.trim(F.lower(text))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")) \
        .otherwise(F.split(t, r"\s+"))


def ws_token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_token_count(text: Column) -> Column:
    """Tokens under the BPE-ish regex pre-tokenizer (regexp_count, JVM-side)."""
    return F.regexp_count(text, F.lit(BPE_REGEX))


def marker_count(text: Column, markers: list[str]) -> Column:
    """How many whitespace tokens are in the marker list (higher-order
    filter over the token array — no explode, no shuffle)."""
    return F.size(F.filter(tokens(text), lambda t: t.isin(markers)))


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, strip non-alnum,
    collapse whitespace."""
    t = F.lower(text)
    t = F.regexp_replace(t, r"[^a-z0-9 ]", "")
    t = F.regexp_replace(t, r"\s+", " ")
    return F.trim(t)


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalized_text(text))
