"""Portable text column expressions (tokenization, shingling).

The documents table holds single-space-separated word text
(FIXTURES.md). Tokenization is defined as split-on-single-space so the
same operation is expressible in DuckDB (``string_split(text, ' ')``)
for exact oracle parity.  Everything here is a Catalyst expression --
JVM-side, codegen'd, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny English stopword set used by the language/quality heuristics.
# Kept deliberately small so the oracle SQL stays readable.
STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it"]


def tokens(col: Column | str) -> Column:
    """Split on single spaces -- DuckDB: ``string_split(x, ' ')``."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def ngrams_from_tokens(toks: Column, n: int = 3) -> Column:
    """Array of word n-grams from an ALREADY-SPLIT token-array column.

    ``toks`` must be a plain column reference (an attribute), not the
    ``split(...)`` expression itself: expressions referenced inside a
    ``transform`` lambda are re-evaluated per array element, so an
    inlined split re-tokenizes the document O(n-grams * n) times
    (measured 5x slower at sf0.1).  Project ``tokens(text)`` into a
    column first, then call this.

    DuckDB equivalent:
        list_transform(generate_series(1, len(toks)-(n-1)),
                       i -> toks[i] || ' ' || ... || toks[i+n-1])
    """
    # sequence(1, size-n+1) enumerates starting positions. Guard the
    # short-doc case explicitly: Spark's sequence(1, 0) would count
    # DOWN ([1, 0]), not produce an empty array.
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    parts = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + k) for k in range(n)]
    )
    return F.transform(idx, parts)


def word_ngrams(col: Column | str, n: int = 3) -> Column:
    """Array of word n-grams (space-joined) straight from a text column.

    Convenience wrapper; in hot paths prefer projecting ``tokens(col)``
    to a column and using :func:`ngrams_from_tokens` (see its note on
    per-element re-evaluation inside ``transform``).
    """
    return ngrams_from_tokens(tokens(col), n)


def char_shingles(col: Column | str, k: int = 8) -> Column:
    """Array of all k-char substrings (positions 1..len-k+1).

    DuckDB: list_transform(generate_series(1, length(x)-k+1),
                           i -> substr(x, i, k))
    """
    c = F.col(col) if isinstance(col, str) else col
    idx = F.when(
        F.length(c) >= k, F.sequence(F.lit(1), F.length(c) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.substring(c, i, F.lit(k)))


def count_occurrences(col: Column | str, needle: str) -> Column:
    """Occurrences of a literal substring, via length arithmetic --
    portable to any SQL engine (no regex dialect differences)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        (F.length(c) - F.length(F.replace(c, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("int")


# PII patterns kept RE2-compatible (no lookaround/backrefs) so the same
# strings work in Java regex (Spark), DuckDB, and Go/Rust engines.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\- ]{6,}[0-9]",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}
# Redaction order matters: SSNs and IPs would otherwise be half-eaten
# by the broader phone pattern, so scrub the most specific first.
PII_ORDER = ["email", "ssn", "ipv4", "phone"]


def scrub_pii(col: Column | str,
              kinds: list[str] | None = None) -> Column:
    """Text with each PII match replaced by its ``<KIND>`` tag.

    Pure nested ``regexp_replace`` -- one codegen'd projection, no
    Python, no shuffle; at 100 TB this runs at scan speed as part of
    whatever pipeline stage already touches the text."""
    c = F.col(col) if isinstance(col, str) else col
    for kind in [k for k in PII_ORDER if kinds is None or k in kinds]:
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return c


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind match counts (audit columns for a scrub report).

    Counted on the same partially-scrubbed text the scrubber sees, so
    counts and redactions agree (an SSN is counted as ssn, not again
    as phone)."""
    c = F.col(col) if isinstance(col, str) else col
    out: dict[str, Column] = {}
    for kind in PII_ORDER:
        out[kind] = F.size(
            F.regexp_extract_all(c, F.lit(PII_PATTERNS[kind]), F.lit(0))
        )
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out
