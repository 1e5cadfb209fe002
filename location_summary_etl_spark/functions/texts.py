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
