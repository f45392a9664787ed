"""Entity matching: score candidate pairs with string-similarity metrics.

Reference: EntityMatching (src/pyjedai/matching.py:335-547) loops python
pairs; here candidate pairs are joined back to the entity text (2 hash
joins) and the metric is a COLUMN EXPRESSION over token arrays for every
set metric (JVM-side, codegen) — pandas UDFs are reserved for the two
genuinely scalar-python kernels (generalized_jaccard's Jaro matching,
jaro itself).

Parity quirks replicated (SURVEY §7.5):
- Jaccard.compare returns inter/(|A|+|B|+inter) — PLUS, not minus
  (string_matchers.py:89-90).
- every set metric returns 1.0 on exact set equality *before* the formula
  (string_matchers.py exact_match), which matters for the quirky jaccard.
- empty side -> 0.0.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..functions import text as T

SET_METRICS = {"cosine", "dice", "jaccard", "true_jaccard", "overlap_coefficient",
               "generalized_jaccard"}


def _tokenize_expr(col, tokenizer: str, qgram: int = 1):
    if tokenizer == "white_space_tokenizer":
        return T.whitespace_tokens(F.lower(col), distinct=True)
    if tokenizer == "char_tokenizer":
        return T.char_qgrams(col, qgram, distinct=True)
    if tokenizer == "word_tokenizer":
        # word q-grams (utils.py WordQgramTokenizer): q-word windows
        return F.array_distinct(T.word_shingles(T.whitespace_tokens(F.lower(col)), qgram))
    raise ValueError(f"unknown tokenizer {tokenizer}")


def set_similarity_expr(t1, t2, metric: str):
    """Set-metric column expression over two array<string> columns.

    string_matchers.py:39-156; arrays are distinct token sets.
    """
    inter = F.size(F.array_intersect(t1, t2))
    n1, n2 = F.size(t1), F.size(t2)
    exact = F.sort_array(t1) == F.sort_array(t2)
    empty = (n1 == 0) | (n2 == 0)
    if metric == "cosine":
        # sqrt(n1)*sqrt(n2), NOT sqrt(n1*n2): bit-identical to the
        # reference's norm1*norm2 (string_matchers.py:51-54)
        body = inter / (F.sqrt(n1) * F.sqrt(n2))
    elif metric == "dice":
        body = 2.0 * inter / (n1 + n2)
    elif metric == "jaccard":  # the reference's quirky plus-form
        body = inter / (n1 + n2 + inter)
    elif metric == "true_jaccard":  # joins.py:230 uses the standard form
        body = inter / (n1 + n2 - inter)
    elif metric == "overlap_coefficient":
        body = inter / F.least(n1, n2)
    else:
        raise ValueError(f"not a column-expressible set metric: {metric}")
    return (
        F.when(exact, F.lit(1.0)).when(empty, F.lit(0.0)).otherwise(body)
    ).cast("double")


def _jaro_py(a: str, b: str) -> float:
    """Classic Jaro similarity, plain-python kernel shared by the two
    pandas UDFs below (reference delegates to the py-stringcompare C++
    kernel, matching.py:11)."""
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i in range(la):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and a[i] == b[j]:
                match_a[i] = match_b[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    t = 0
    k = 0
    for i in range(la):
        if match_a[i]:
            while not match_b[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    return (matches / la + matches / lb + (matches - t) / matches) / 3


@pandas_udf(DoubleType())
def _jaro_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
    """Arrow-batched Jaro similarity (reference delegates to the
    py-stringcompare C++ kernel, matching.py:11; classic Jaro here)."""
    import numpy as np

    return pd.Series(np.fromiter(
        (_jaro_py(x, y) for x, y in zip(s1.astype(str), s2.astype(str))),
        dtype=float, count=len(s1)))


@pandas_udf(DoubleType())
def _generalized_jaccard_udf(t1: pd.Series, t2: pd.Series) -> pd.Series:
    """GeneralizedJaccard (string_matchers.py:92-140): soft token overlap
    via Jaro-matched token pairs. For token sets A, B: all cross pairs
    with jaro > 0.5 are sorted by score desc and greedily consumed
    (each token used once); score = sum(matched jaro) / (|A|+|B|-k).

    Determinism delta (documented, SURVEY §4): the reference iterates
    python ``set``s, so equal-score ties resolve in hash order — here
    ties break by (token1, token2) ascending so runs reproduce.
    """
    def gj(a, b) -> float:
        s1 = set("" if x is None else str(x) for x in (a if a is not None else []))
        s2 = set("" if x is None else str(x) for x in (b if b is not None else []))
        if s1 == s2:
            return 1.0
        if not s1 or not s2:
            return 0.0
        matches = []
        for e1 in s1:
            for e2 in s2:
                score = _jaro_py(e1, e2)
                if score > 0.5:
                    matches.append((-score, e1, e2))
        matches.sort()
        used1: set = set()
        used2: set = set()
        total = 0.0
        k = 0
        for negs, e1, e2 in matches:
            if e1 in used1 or e2 in used2:
                continue
            used1.add(e1)
            used2.add(e2)
            total += -negs
            k += 1
        return total / float(len(s1) + len(s2) - k)

    import numpy as np

    return pd.Series(np.fromiter(
        (gj(x, y) for x, y in zip(t1, t2)), dtype=float, count=len(t1)))


def entity_matching(pairs: DataFrame, docs: DataFrame,
                    metric: str = "dice",
                    tokenizer: str = "white_space_tokenizer",
                    qgram: int = 1,
                    similarity_threshold: float = 0.0,
                    id_col: str = "doc_id", text_col: str = "text",
                    round_to: int | None = None) -> DataFrame:
    """Score (id1,id2) candidate pairs; keep sim > threshold
    (EntityMatching.predict + _similarity, matching.py:398-537; edge kept
    if similarity > threshold via graph insert at matching.py:111-121).

    The doc->tokens projection happens ONCE before the two joins (column
    pruned to (id, tokens)); the pairs table joins it twice.
    """
    if metric in SET_METRICS:
        toks = docs.select(
            F.col(id_col).alias("_id"),
            _tokenize_expr(F.col(text_col), tokenizer, qgram).alias("_toks"),
        )
        j = (
            pairs.join(toks.select(F.col("_id").alias("id1"),
                                   F.col("_toks").alias("_t1")), "id1")
            .join(toks.select(F.col("_id").alias("id2"),
                              F.col("_toks").alias("_t2")), "id2")
        )
        if metric == "generalized_jaccard":
            sim = _generalized_jaccard_udf(F.col("_t1"), F.col("_t2"))
        else:
            sim = set_similarity_expr(F.col("_t1"), F.col("_t2"), metric)
    elif metric == "levenshtein":
        txt = docs.select(F.col(id_col).alias("_id"),
                          F.lower(F.col(text_col)).alias("_s"))
        j = (
            pairs.join(txt.select(F.col("_id").alias("id1"),
                                  F.col("_s").alias("_s1")), "id1")
            .join(txt.select(F.col("_id").alias("id2"),
                             F.col("_s").alias("_s2")), "id2")
        )
        # normalized levenshtein similarity, JVM builtin; equal strings
        # short-circuit to 1.0 (also guards 0/0 on two empty strings)
        sim = F.when(F.col("_s1") == F.col("_s2"), F.lit(1.0)).otherwise(
            (1.0 - F.levenshtein("_s1", "_s2")
             / F.greatest(F.length("_s1"), F.length("_s2")))
        ).cast("double")
    elif metric == "jaro":
        txt = docs.select(F.col(id_col).alias("_id"),
                          F.lower(F.col(text_col)).alias("_s"))
        j = (
            pairs.join(txt.select(F.col("_id").alias("id1"),
                                  F.col("_s").alias("_s1")), "id1")
            .join(txt.select(F.col("_id").alias("id2"),
                             F.col("_s").alias("_s2")), "id2")
        )
        sim = _jaro_udf(F.col("_s1"), F.col("_s2"))
    else:
        raise ValueError(f"unknown metric {metric}")

    if round_to is not None:
        sim = F.round(sim, round_to)
    return (
        j.withColumn("sim", sim)
        .where(F.col("sim") > similarity_threshold)
        .select("id1", "id2", "sim")
    )


def tfidf_cosine_matching(pairs: DataFrame, docs: DataFrame,
                          tokenizer: str = "word", qgram: int = 3,
                          similarity_threshold: float = 0.0,
                          id_col: str = "doc_id", text_col: str = "text",
                          round_to: int = 6,
                          vectorizer: str = "tfidf") -> DataFrame:
    """EntityMatching with the tfidf vectorizer (matching.py:464-497 ->
    utils.py FrequencyEvaluator:1198-1268, sklearn TfidfVectorizer).

    sklearn's default formula reproduced as relational algebra — NEVER
    the reference's full n x n distance matrix (utils.py:1240-1243):
        tf(d, t)  = raw count
        idf(t)    = ln((1 + N) / (1 + df_t)) + 1      (smooth_idf)
        vec(d)    = l2-normalized tf*idf
        sim(a, b) = dot(vec(a), vec(b))
    Doc-term weights are one aggregate; pair scores join the candidate
    pairs to the weights on (id, term) and reduce with a sum — shuffle
    keyed on the pair, so token skew never concentrates on one task.
    """
    if tokenizer == "word":
        toks = T.whitespace_tokens(F.lower(F.col(text_col)), distinct=False)
    elif tokenizer == "char":
        toks = T.char_qgrams(F.col(text_col), qgram, distinct=False)
    else:
        raise ValueError(f"unknown tfidf tokenizer {tokenizer}")

    dt = (
        docs.select(F.col(id_col).alias("eid"), F.explode(toks).alias("term"))
        .groupBy("eid", "term").agg(F.count("*").cast("double").alias("tf"))
    )
    if vectorizer == "tfidf":
        n_docs = docs.count()
        df_ = dt.groupBy("term").agg(F.count("*").alias("df"))
        idf = df_.select(
            "term",
            (F.log((1.0 + F.lit(float(n_docs))) / (1.0 + F.col("df")))
             + 1.0).alias("idf"),
        )
        w = dt.join(idf, "term").select(
            "eid", "term", (F.col("tf") * F.col("idf")).alias("w")
        )
    elif vectorizer == "tf":  # CountVectorizer + cosine
        w = dt.select("eid", "term", F.col("tf").alias("w"))
    elif vectorizer == "boolean":  # presence vectors (utils.py:1235-1236)
        w = dt.select("eid", "term", F.lit(1.0).alias("w"))
    else:
        raise ValueError(f"unknown vectorizer {vectorizer}")
    norms = w.groupBy("eid").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))
    w1 = w.select(F.col("eid").alias("id1"), "term", F.col("w").alias("w1"))
    w2 = w.select(F.col("eid").alias("id2"), "term", F.col("w").alias("w2"))
    dots = (
        pairs.join(w1, "id1").join(w2, ["id2", "term"])
        .groupBy("id1", "id2").agg(F.sum(F.col("w1") * F.col("w2")).alias("dot"))
    )
    out = (
        pairs.join(dots, ["id1", "id2"], "left")
        .join(norms.select(F.col("eid").alias("id1"), F.col("nrm").alias("n1")), "id1")
        .join(norms.select(F.col("eid").alias("id2"), F.col("nrm").alias("n2")), "id2")
        .withColumn(
            "sim",
            F.round(
                F.coalesce(F.col("dot"), F.lit(0.0))
                / (F.col("n1") * F.col("n2")), round_to
            ),
        )
    )
    return out.where(F.col("sim") > similarity_threshold).select("id1", "id2", "sim")
