"""Set-similarity joins: EJoin / TopKJoin / PETopKJoin.

Reference (src/pyjedai/joins.py) builds a python inverted index and
probes it entity-by-entity (joins.py:59-114,244-254). Spark-first
re-expression — the token-join pattern:

    explode(tokens) on both sides -> equi-join on token
    -> groupBy(id1,id2).count() = common tokens
    -> join per-entity token counts -> similarity in SQL -> theta filter

i.e. a theta-join realized as an equi-join plus post-filter; Catalyst
gets a plain shuffle-hash/sort-merge join on the token key and AQE
handles token skew.

Similarity formulas (_calc_similarity, joins.py:209-230):
  cosine  = c / sqrt(f1*f2)
  dice    = 2c / (f1+f2)
  jaccard = c / (f1+f2-c)      (standard form here, unlike the matcher)

Tokenizers (joins.py:183-207): 'standard' word sets, 'qgrams' char
q-gram sets (q=2 default), multiset variants suffix occurrence counts.
Self-pairs (id==id), which the reference's graph quietly absorbs as
self-loops, are excluded. Dirty-ER only (one-table self-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T


def _join_tokens(col, tokenization: str, qgrams: int):
    if tokenization == "standard":
        return T.tokens(col)
    if tokenization == "qgrams":
        return T.char_qgrams(col, qgrams)
    if tokenization == "standard_multiset":
        return _multiset(T.tokens(col, distinct=False))
    if tokenization == "qgrams_multiset":
        return _multiset(T.char_qgrams(col, qgrams, distinct=False))
    raise ValueError(f"unknown tokenization {tokenization}")


def _multiset(toks) -> "F.Column":
    """occurrence-suffixed multiset: k-th occurrence of tok -> tok||(k-1)
    (joins.py:190-205). Expressed per-row with a fold over the token
    array (aggregate keeps a map of counts)."""
    return F.aggregate(
        toks,
        F.struct(
            F.create_map().cast("map<string,int>").alias("cnt"),
            F.array().cast("array<string>").alias("out"),
        ),
        lambda acc, t: F.struct(
            F.map_concat(
                F.map_filter(acc["cnt"], lambda k, v: k != t),
                F.create_map(t, F.coalesce(acc["cnt"][t], F.lit(0)) + 1),
            ).alias("cnt"),
            F.concat(
                acc["out"],
                F.array(F.concat(t, (F.coalesce(acc["cnt"][t], F.lit(0))).cast("string"))),
            ).alias("out"),
        ),
        lambda acc: acc["out"],
    )


def _sim_expr(metric: str, c, f1, f2):
    if metric == "cosine":
        return c / F.sqrt(f1 * f2)
    if metric == "dice":
        return 2 * c / (f1 + f2)
    if metric == "jaccard":
        return c / (f1 + f2 - c)
    raise ValueError(f"unknown join metric {metric}")


def _pair_sims(docs: DataFrame, metric: str, tokenization: str, qgrams: int,
               id_col: str, text_col: str, round_to: int | None) -> DataFrame:
    toks = docs.select(
        F.col(id_col).alias("eid"),
        _join_tokens(F.col(text_col), tokenization, qgrams).alias("toks"),
    )
    sizes = toks.select("eid", F.size("toks").alias("f"))
    ex = toks.select("eid", F.explode("toks").alias("tok"))
    a1 = ex.select(F.col("eid").alias("id1"), "tok")
    a2 = ex.select(F.col("eid").alias("id2"), "tok")
    common = (
        a1.join(a2, "tok")
        .where(F.col("id1") != F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("c"))
    )
    sims = (
        common.join(sizes.select(F.col("eid").alias("id1"), F.col("f").alias("f1")),
                    "id1")
        .join(sizes.select(F.col("eid").alias("id2"), F.col("f").alias("f2")), "id2")
        .withColumn("sim", _sim_expr(metric, F.col("c"), F.col("f1"), F.col("f2"))
                    .cast("double"))
    )
    if round_to is not None:
        sims = sims.withColumn("sim", F.round("sim", round_to))
    return sims


def ejoin(docs: DataFrame, similarity_threshold: float = 0.82,
          metric: str = "cosine", tokenization: str = "qgrams",
          qgrams: int = 2, id_col: str = "doc_id", text_col: str = "text",
          round_to: int | None = 6) -> DataFrame:
    """ε-join (EJoin, joins.py:350-379): all pairs with sim >= θ.
    Output canonical (id1<id2, sim)."""
    sims = _pair_sims(docs, metric, tokenization, qgrams, id_col, text_col, round_to)
    return (
        sims.where((F.col("sim") >= similarity_threshold) & (F.col("id1") < F.col("id2")))
        .select("id1", "id2", "sim")
    )


def topk_join(docs: DataFrame, k: int, metric: str = "cosine",
              tokenization: str = "standard", qgrams: int = 2,
              id_col: str = "doc_id", text_col: str = "text",
              round_to: int | None = 6) -> DataFrame:
    """Global top-K pairs by similarity (TopKJoin, joins.py:381-435 —
    there the PQ yields a global K-th-weight threshold). Deterministic
    tie-break (sim desc, id1 asc, id2 asc); canonical pairs."""
    sims = _pair_sims(docs, metric, tokenization, qgrams, id_col, text_col, round_to)
    return (
        sims.where(F.col("id1") < F.col("id2"))
        .orderBy(F.col("sim").desc(), F.col("id1").asc(), F.col("id2").asc())
        .limit(k)
        .select("id1", "id2", "sim")
    )


def pe_topk_join(docs: DataFrame, k: int, metric: str = "cosine",
                 tokenization: str = "standard", qgrams: int = 2,
                 id_col: str = "doc_id", text_col: str = "text",
                 round_to: int | None = 6) -> DataFrame:
    """Per-entity top-K neighborhoods (PETopKJoin, joins.py:437-551;
    neighborhood sort by (-sim, id) at joins.py:264-269 replicated as
    the window order). Returns (eid, neighbor, sim, rank)."""
    sims = _pair_sims(docs, metric, tokenization, qgrams, id_col, text_col, round_to)
    w = Window.partitionBy("id2").orderBy(F.col("sim").desc(), F.col("id1").asc())
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(F.col("id2").alias("eid"), F.col("id1").alias("neighbor"),
                "sim", "rank")
    )
