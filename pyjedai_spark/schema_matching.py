"""Schema matching: attribute correspondences between two tables.

The reference wraps the Valentine library wholesale
(src/pyjedai/schema/matching.py:100-152 — Coma/Cupid/DistributionBased/
JaccardDistance/SimilarityFlooding run inside valentine_match on pandas
frames). Spark-first, the two matchers whose semantics are pure data
operations are re-expressed as DataFrame plans with exact DuckDB
oracles; the model-based ones (Coma's neural combiner, Cupid's
linguistic thesaurus) stay external — same boundary as the pretrained
encoder hook.

1. ``name_based_matches`` — column-NAME similarity (the linguistic core
   of Cupid-style matching): normalized Levenshtein over the two column
   name lists. Tiny by construction (|cols1| x |cols2|).

2. ``jaccard_leven_matches`` — instance-based fuzzy-Jaccard (Valentine's
   JaccardLevenMatcher semantics re-specified for scale): two string
   values match when ``1 - lev(a,b)/max(len)`` >= ``threshold_leven``;
   per column pair,

       score = |{v in V1 : exists matching w in V2}| / (|V1|+|V2|-that)

   with V = the column's distinct non-null values. The value join is
   LENGTH-BANDED, not a cross join: sim >= t forces
   ceil(t*L1) <= len(w) <= floor(L1/t), so each left value explodes to
   that bounded length range and equi-joins on (col-pair, length) —
   at 10^9 distinct values per column the comparison space is
   ~|V1| x (density of V2 per length) instead of |V1| x |V2|. The
   documented asymmetry (membership counted from V1's side) is what
   makes the score well-defined under fuzzy matching; the oracle
   reproduces it with a plain cross join (fine at oracle scale).

Both return (col1, col2, score double) sorted desc — the
``top_columns`` ranking ValentineSchemaMatching.process exposes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_MAX_DISTINCT = 100_000


def _name_df(spark, names: list[str], col: str) -> DataFrame:
    return spark.createDataFrame([(n,) for n in names], f"{col} string")


def name_based_matches(df1: DataFrame, df2: DataFrame,
                       round_to: int = 6) -> DataFrame:
    """(col1, col2, score): normalized Levenshtein similarity of
    lowercased column names, 1 - lev/max(len)."""
    spark = df1.sparkSession
    a = _name_df(spark, df1.columns, "col1")
    b = _name_df(spark, df2.columns, "col2")
    l1, l2 = F.lower("col1"), F.lower("col2")
    mx = F.greatest(F.length(l1), F.length(l2))
    score = F.when(mx > 0,
                   1.0 - F.levenshtein(l1, l2) / mx).otherwise(F.lit(1.0))
    return (a.crossJoin(b)
            .select("col1", "col2", F.round(score, round_to).alias("score"))
            .orderBy(F.col("score").desc(), "col1", "col2"))


def _distinct_values(df: DataFrame, cols: list[str],
                     max_distinct: int) -> DataFrame:
    """(col, val) — distinct non-null values per column, deterministic
    cap at ``max_distinct`` (first values in ascending order; at crawl
    scale swap for a hash sample — the cap keeps the band join bounded
    either way)."""
    legs = None
    for c in cols:
        leg = (df.select(F.lit(c).alias("col"),
                         F.col(c).cast("string").alias("val"))
               .where(F.col("val").isNotNull()).distinct())
        if max_distinct is not None:
            leg = leg.orderBy("val").limit(max_distinct)
        legs = leg if legs is None else legs.unionByName(leg)
    return legs


def jaccard_leven_matches(df1: DataFrame, df2: DataFrame,
                          threshold_leven: float = 0.8,
                          cols1: list[str] | None = None,
                          cols2: list[str] | None = None,
                          max_distinct: int = DEFAULT_MAX_DISTINCT,
                          round_to: int = 6) -> DataFrame:
    """Instance-based fuzzy-Jaccard column correspondence (module doc).

    Defaults to the STRING-typed columns of each frame (Valentine
    stringifies everything; cross-engine float rendering makes that
    oracle-hostile, so non-string columns must be opted in explicitly
    via ``cols1``/``cols2`` with a caller-controlled cast).
    """
    t = threshold_leven
    if not (0.0 < t <= 1.0):
        raise ValueError("threshold_leven must be in (0, 1]")
    cols1 = cols1 or [c for c, d in df1.dtypes if d == "string"]
    cols2 = cols2 or [c for c, d in df2.dtypes if d == "string"]
    if not cols1 or not cols2:
        raise ValueError("no string columns to match; pass cols1/cols2")

    v1 = _distinct_values(df1, cols1, max_distinct) \
        .withColumnRenamed("col", "col1")
    v2 = _distinct_values(df2, cols2, max_distinct) \
        .withColumnRenamed("col", "col2")
    n1 = v1.groupBy("col1").agg(F.count("*").alias("n1"))
    n2 = v2.groupBy("col2").agg(F.count("*").alias("n2"))

    # length-band expansion of the left side: a match partner's length
    # lies in [ceil(t*L1), floor(L1/t)]
    L1 = F.length("val")
    lo = F.ceil(L1 * t).cast("int")
    hi = F.floor(L1 / t).cast("int")
    v1x = v1.select(
        "col1", F.col("val").alias("v"),
        F.explode(F.sequence(lo, hi)).alias("blen"))
    v2x = v2.select("col2", F.col("val").alias("w"),
                    F.length("val").alias("blen"))

    mx = F.greatest(F.length("v"), F.length("w"))
    sim = F.when(mx > 0, 1.0 - F.levenshtein("v", "w") / mx) \
        .otherwise(F.lit(1.0))
    matched = (
        v1x.join(v2x, "blen")
        .where(F.round(sim, round_to) >= t)
        .select("col1", "col2", "v")
        .distinct()                      # v matched at least once
        .groupBy("col1", "col2").agg(F.count("*").alias("inter"))
    )
    out = (
        matched.join(F.broadcast(n1), "col1")
        .join(F.broadcast(n2), "col2")
        .select(
            "col1", "col2",
            F.round(F.col("inter")
                    / (F.col("n1") + F.col("n2") - F.col("inter")),
                    round_to).alias("score"))
    )
    # column pairs with zero fuzzy overlap still appear, score 0 — the
    # ranking is over ALL pairs like valentine_match's matrix
    allpairs = n1.crossJoin(n2).select("col1", "col2")
    return (allpairs.join(out, ["col1", "col2"], "left")
            .select("col1", "col2",
                    F.coalesce("score", F.lit(0.0)).alias("score"))
            .orderBy(F.col("score").desc(), "col1", "col2"))


def schema_matching(df1: DataFrame, df2: DataFrame,
                    method: str = "jaccard_leven", **kw) -> DataFrame:
    """Dispatch mirroring ValentineMethodBuilder's matcher menu for the
    data-native methods; external-model methods raise with guidance."""
    m = method.lower()
    if m in ("jaccard_leven", "jaccard_distance"):
        return jaccard_leven_matches(df1, df2, **kw)
    if m in ("name", "cupid_name"):
        return name_based_matches(df1, df2, **kw)
    if m in ("coma", "cupid", "distribution_based", "similarity_flooding"):
        raise NotImplementedError(
            f"{method} needs the external Valentine models; use "
            "'jaccard_leven' or 'name', or run Valentine offline and "
            "join its correspondences")
    raise ValueError(f"unknown schema matching method {method!r}")
