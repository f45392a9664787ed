"""Text-analysis operators for a training-data pipeline: language ID,
quality scoring, token counting, document fingerprinting.

All pure column expressions (JVM, codegen) so each has an exact ANSI-SQL
oracle. The reference has a lighter analogue only in clean_dataset
(datamodel.py:310-353, stopword strip); these extend the engine toward
the LLM-corpus use-case the graft targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import text as T

# tiny deterministic stopword inventories per language (public, common
# function words; NOT nltk's lists — those aren't available offline).
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "with", "for"],
    "de": ["der", "die", "das", "und", "zu", "ein", "ist", "mit", "von", "nicht"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "es", "con", "para"],
    "fr": ["le", "la", "de", "et", "un", "est", "que", "pour", "dans", "avec"],
    "zh": ["de", "shi", "le", "bu", "wo", "zai", "you", "he", "ren", "ta"],
}


def token_count(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(eid, n_tokens, n_unique_tokens, n_chars)."""
    toks = T.tokens(F.col(text_col), distinct=False)
    return docs.select(
        F.col(id_col).alias("eid"),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique_tokens"),
        F.length(text_col).alias("n_chars"),
    )


def quality_score(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", lang: str = "en") -> DataFrame:
    """Heuristic quality features + score in [0,1]:
    mean token length in sane range, stopword ratio, uniqueness ratio
    (repetition guard), alpha ratio. Gopher/C4-style filters, SQL-only.
    """
    toks = T.tokens(F.col(text_col), distinct=False)
    sw = F.array([F.lit(s) for s in STOPWORDS[lang]])
    n = F.size(toks)
    uniq = F.size(F.array_distinct(toks))
    avg_len = F.when(n > 0,
                     F.aggregate(toks, F.lit(0).cast("long"),
                                 lambda acc, t: acc + F.length(t)).cast("double") / n
                     ).otherwise(F.lit(0.0))
    stop_ratio = F.when(n > 0,
                        F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
                        .cast("double") / n).otherwise(F.lit(0.0))
    uniq_ratio = F.when(n > 0, uniq.cast("double") / n).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        F.length(text_col) > 0,
        (F.length(F.regexp_replace(F.lower(text_col), r"[^a-z]", ""))
         .cast("double") / F.length(text_col)),
    ).otherwise(F.lit(0.0))
    score = (
        F.when((avg_len >= 3) & (avg_len <= 10), F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(stop_ratio >= 0.05, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(uniq_ratio >= 0.3, F.lit(0.25)).otherwise(F.lit(0.0))
        + F.when(alpha_ratio >= 0.6, F.lit(0.25)).otherwise(F.lit(0.0))
    )
    return docs.select(
        F.col(id_col).alias("eid"),
        F.size(toks).alias("n_tokens"),
        F.round(avg_len, 6).alias("avg_token_len"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(uniq_ratio, 6).alias("unique_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(score, 2).alias("quality_score"),
    )


def language_id(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: score(lang) = #tokens in that lang's
    stopword list; predict argmax (ties -> lexicographically first
    lang). (eid, lang_pred, lang_score)."""
    toks = T.tokens(F.col(text_col), distinct=False)

    def _counter(ws):
        arr = F.array([F.lit(s) for s in ws])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).cast("double")

    scores = {lang: _counter(ws) for lang, ws in sorted(STOPWORDS.items())}
    # argmax = max score, then the lexicographically-first language
    # achieving it (deterministic tie-break, matches a SQL CASE oracle)
    max_s = F.greatest(*[scores[lang] for lang in sorted(STOPWORDS)])
    first_lang = None
    for lang in sorted(STOPWORDS):
        cond = scores[lang] == max_s
        first_lang = F.when(cond, F.lit(lang)) if first_lang is None \
            else first_lang.when(cond, F.lit(lang))
    return docs.select(
        F.col(id_col).alias("eid"),
        first_lang.alias("lang_pred"),
        max_s.alias("lang_score"),
    )


def doc_fingerprint(docs: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(eid, fingerprint): md5 of whitespace-normalized lowercase text —
    the exact-dedup / lineage fingerprint."""
    norm = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    return docs.select(F.col(id_col).alias("eid"), F.md5(norm).alias("fingerprint"))
