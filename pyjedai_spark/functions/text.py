"""Tokenization / shingling / hashing column expressions.

All functions return Spark Column expressions built from
``pyspark.sql.functions`` (JVM-side, whole-stage-codegen friendly) — no
per-row Python anywhere in the hot path.

Reference semantics reproduced:
- token split ``re.split('[\\W_]', s.lower())`` + drop empties
  (reference src/pyjedai/block_building.py:503-512).
- q-grams: char n-grams of each token; tokens shorter than q are kept
  whole (block_building.py:539-562).
- suffixes of length >= ``suffix_length``; shorter tokens kept whole
  (block_building.py:599-618).
- all substrings of length >= ``suffix_length`` (block_building.py:655-675).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# `\W` in Java/RE2/Python-on-ASCII all agree for ASCII text; the synthetic
# webtext corpus is ASCII. Documented delta: for non-ASCII pages Python's
# str `\W` is unicode-aware while Java's default is not.
TOKEN_SPLIT_PATTERN = r"[\W_]"

# 2^32 < p, prime — universal-hash modulus for MinHash permutations.
MERSENNE_PRIME_ISH = 4294967311


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def tokens(col, pattern: str = TOKEN_SPLIT_PATTERN, distinct: bool = True) -> Column:
    """lowercase -> split -> drop '' -> (optionally) distinct.

    Mirrors StandardBlocking._tokenize_entity
    (block_building.py:503-512: ``list(set(filter(None, re.split(...))))``).
    """
    toks = F.filter(F.split(F.lower(_col(col)), pattern), lambda x: x != F.lit(""))
    return F.array_distinct(toks) if distinct else toks


def whitespace_tokens(col, distinct: bool = False) -> Column:
    """Whitespace tokenizer of the matching stage (matching.py:385-386)."""
    toks = F.filter(F.split(_col(col), r"\s+"), lambda x: x != F.lit(""))
    return F.array_distinct(toks) if distinct else toks


def char_qgrams(col, q: int, distinct: bool = True) -> Column:
    """Char q-grams of the *whole* lowercased string (joins.py:187:
    ``nltk.ngrams(entity.lower(), n=q)``; grams joined by ' ' there, we
    keep the raw q-char slice — same set cardinalities)."""
    s = F.lower(_col(col))
    grams = F.when(F.length(s) < q, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.length(s) - F.lit(q - 1)),
            lambda i: s.substr(i, F.lit(q)),
        )
    )
    return F.array_distinct(grams) if distinct else grams


def token_qgrams(tokens_col, q: int) -> Column:
    """Q-grams of each token; tokens shorter than q kept whole
    (QGramsBlocking, block_building.py:539-562)."""
    return F.array_distinct(
        F.flatten(
            F.transform(
                _col(tokens_col),
                lambda t: F.when(F.length(t) < q, F.array(t)).otherwise(
                    F.transform(
                        F.sequence(F.lit(1), F.length(t) - F.lit(q - 1)),
                        lambda i: t.substr(i, F.lit(q)),
                    )
                ),
            )
        )
    )


def token_suffixes(tokens_col, suffix_length: int) -> Column:
    """All suffixes with len >= suffix_length; shorter tokens kept whole
    (SuffixArraysBlocking, block_building.py:599-618)."""
    return F.array_distinct(
        F.flatten(
            F.transform(
                _col(tokens_col),
                lambda t: F.when(F.length(t) < suffix_length, F.array(t)).otherwise(
                    F.transform(
                        F.sequence(F.lit(1), F.length(t) - F.lit(suffix_length - 1)),
                        lambda i: t.substr(i, F.length(t)),  # substr clamps to end
                    )
                ),
            )
        )
    )


def token_substrings(tokens_col, min_length: int, max_token_len: int = 24) -> Column:
    """Every substring with len >= min_length; shorter tokens kept whole
    (ExtendedSuffixArraysBlocking, block_building.py:655-675). Token
    length capped (combinatorial guard for webtext junk tokens)."""
    t_ = _col(tokens_col)
    return F.array_distinct(
        F.flatten(
            F.transform(
                t_,
                lambda t: F.when(F.length(t) < min_length, F.array(t)).otherwise(
                    F.flatten(
                        F.transform(
                            # start positions
                            F.sequence(
                                F.lit(1),
                                F.least(F.length(t), F.lit(max_token_len))
                                - F.lit(min_length - 1),
                            ),
                            lambda i: F.transform(
                                # lengths from min_length up to remaining
                                F.sequence(
                                    F.lit(min_length),
                                    F.least(F.length(t), F.lit(max_token_len)) - i + 1,
                                ),
                                lambda L: t.substr(i, L),
                            ),
                        )
                    )
                ),
            )
        )
    )


def token_hash_u32(tok: Column) -> Column:
    """Deterministic 32-bit token hash = first 8 hex chars of md5.

    Portable across Spark and DuckDB (both expose md5 as lowercase hex),
    which keeps MinHash/SimHash signatures oracle-checkable.
    """
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def token_hashes(tokens_col) -> Column:
    """array<string> -> array<long> of 32-bit hashes."""
    return F.transform(_col(tokens_col), token_hash_u32)


def word_shingles(tokens_col, w: int, join_sep: str = " ") -> Column:
    """w-token rolling shingles (non-distinct order preserved) from a
    *non-distinct* token array — the unit for substring/long-span dedup."""
    t_ = _col(tokens_col)
    n = F.size(t_)
    return F.when(n < w, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), n - F.lit(w - 1)),
            lambda i: F.array_join(F.slice(t_, i, w), join_sep),
        )
    )
