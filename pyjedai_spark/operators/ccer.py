"""Clean-Clean ER (two-dataset linkage) variants.

Reference semantics (is_dirty_er=False throughout pyJedAI):
- a block is valid only if BOTH datasets contribute at least one entity
  (drop_single_entity_blocks, utils.py:105-122, CCER branch);
- the comparison space of a block is |D1-side| x |D2-side|
  (datamodel.py:496-506), never intra-dataset pairs;
- ConnectedComponentsClustering keeps ONLY 2-element clusters
  (clustering.py:466-467 — one entity from each side);
- UniqueMappingClustering is CCER-only (clustering.py:477-539).

Spark shape: one postings DataFrame (key, eid, side) for both datasets
— candidate pairs are a side-1 x side-2 join within key, so Catalyst
plans exactly one shuffle keyed on the block key, AQE splitting any hot
key. Entity ids must be disjoint across the two inputs (natural keys of
one corpus split, or pre-offset ids — the reference's n1-offset remap,
datamodel.py:176-177, is not needed when ids are already distinct).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def ccer_blocking(d1: DataFrame, d2: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  max_block_size: int | None = None) -> DataFrame:
    """StandardBlocking over two datasets -> (key, eid, side) postings;
    keeps keys with >= 1 entity on EACH side (CCER
    drop_single_entity_blocks) and optionally caps |D1|+|D2|."""
    def side(df, s):
        return df.select(
            F.col(id_col).alias("eid"), F.explode(T.tokens(text_col)).alias("key")
        ).distinct().withColumn("side", F.lit(s))

    p = side(d1, 1).union(side(d2, 2))
    from pyspark.sql import Window

    w = Window.partitionBy("key")
    p = (
        p.withColumn("_n1", F.sum((F.col("side") == 1).cast("int")).over(w))
        .withColumn("_n2", F.sum((F.col("side") == 2).cast("int")).over(w))
    )
    cond = (F.col("_n1") >= 1) & (F.col("_n2") >= 1)
    if max_block_size is not None:
        cond = cond & (F.col("_n1") + F.col("_n2") <= max_block_size)
    return p.where(cond).select("key", "eid", "side")


def ccer_pairs(postings: DataFrame) -> DataFrame:
    """Distinct D1 x D2 comparisons: (id1 from side 1, id2 from side 2)."""
    a = postings.where(F.col("side") == 1).select("key", F.col("eid").alias("id1"))
    b = postings.where(F.col("side") == 2).select("key", F.col("eid").alias("id2"))
    return a.join(b, "key").select("id1", "id2").distinct()


def ccer_edge_weights(postings: DataFrame, scheme: str = "CBS") -> DataFrame:
    """Blocking-graph edge weights for the CCER pair space. Same
    weighting formulas as Dirty-ER (comparison_cleaning.py:210-249) over
    CCER counters: |Bi| counts blocks an entity occurs in, block
    cardinality = n1*n2."""
    scheme = scheme.upper()
    sizes = postings.groupBy("key").agg(
        F.sum((F.col("side") == 1).cast("long")).alias("b1"),
        F.sum((F.col("side") == 2).cast("long")).alias("b2"),
    ).withColumn("card", F.col("b1") * F.col("b2"))

    a = postings.where(F.col("side") == 1).select("key", F.col("eid").alias("id1"))
    b = postings.where(F.col("side") == 2).select("key", F.col("eid").alias("id2"))
    pairs = a.join(b, "key").join(sizes, "key")

    e = pairs.groupBy("id1", "id2").agg(F.count("*").alias("cbs"))

    nb = postings.groupBy("eid").agg(F.count("*").alias("nb"))
    e = (
        e.join(nb.withColumnRenamed("eid", "id1").withColumnRenamed("nb", "nb1"),
               "id1")
        .join(nb.withColumnRenamed("eid", "id2").withColumnRenamed("nb", "nb2"),
              "id2")
    )
    c, nb1, nb2 = F.col("cbs").cast("double"), F.col("nb1"), F.col("nb2")
    if scheme == "CBS":
        w = c
    elif scheme == "JS":
        w = c / (nb1 + nb2 - c)
    elif scheme == "COSINE":
        w = c / F.sqrt(nb1 * nb2)
    elif scheme == "DICE":
        w = 2 * c / (nb1 + nb2)
    else:
        raise ValueError(f"unsupported CCER scheme {scheme}")
    return e.select("id1", "id2", w.cast("double").alias("weight"))


def ccer_wep(postings: DataFrame, scheme: str = "JS") -> DataFrame:
    """WeightedEdgePruning on the CCER graph: keep w >= global mean."""
    e = ccer_edge_weights(postings, scheme)
    mean = e.agg(F.avg("weight")).collect()[0][0] or 0.0
    return e.where(F.col("weight") >= F.lit(mean) - 1e-9)


def ccc_size2(edges: DataFrame, nodes: DataFrame | None = None) -> DataFrame:
    """CCER ConnectedComponentsClustering: components of the match
    graph, KEEPING ONLY 2-element clusters (clustering.py:466-467 —
    the reference quirk; larger components are ambiguous matches)."""
    from .clustering import connected_components

    cc = connected_components(edges.select("id1", "id2"), nodes)
    sizes = cc.groupBy("cluster_id").agg(F.count("*").alias("n"))
    return cc.join(sizes.where(F.col("n") == 2).select("cluster_id"),
                   "cluster_id").select("eid", "cluster_id")
