"""Progressive / prioritized matching: budgeted pair emission.

Reference (src/pyjedai/prioritization.py:115-373 + DatasetScheduler
emission, utils.py:417-595): a pruning algorithm scores candidate
pairs, pairs are grouped into per-entity neighborhoods sorted by
average weight, and pairs are emitted within a budget by one of four
orders — TOP (global score), HB (best-per-neighborhood first, then
DFS), DFS (neighborhood by neighborhood), BFS (rank round-robin).

Spark-first: emission order is a SORT KEY over the scored-edge
DataFrame, budget is a LIMIT. ``orderBy().limit(k)`` executes as
TakeOrdered (per-partition top-k + driver merge) — no global sort is
materialized, so "progressive" costs one pass over the edges.

Neighborhoods here are node-centric on id1 = min(pair) (the reference
schedules by the first/inorder entity, prioritization.py:234-277;
bilateral indexing is a documented simplification).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.positions import with_global_position

EMIT_METHODS = {"TOP", "HB", "DFS", "BFS"}


def _scheduled(edges: DataFrame, weight_col: str) -> DataFrame:
    """Attach neighborhood rank columns: nb_rank (neighborhoods by avg
    weight desc), within_rank (edges inside a neighborhood by weight
    desc, neighbor asc) — the DatasetScheduler sort (utils.py:460-462)."""
    w = F.col(weight_col)
    nb_stats = edges.groupBy("id1").agg(F.avg(w).alias("_avg"))
    # one row per NEIGHBORHOOD, ranked by avg weight desc — a distributed
    # two-pass rank (functions/positions.py), not an unpartitioned window
    # (which would push every neighborhood through a single task at scale)
    ranked_nbs = with_global_position(
        nb_stats, [F.col("_avg").desc(), F.col("id1").asc()], "_nbr"
    ).withColumn("nb_rank", (F.col("_nbr") + 1).cast("int")).drop("_nbr")
    within = Window.partitionBy("id1").orderBy(w.desc(), F.col("id2").asc())
    return (
        edges.join(ranked_nbs.select("id1", "nb_rank"), "id1")
        .withColumn("within_rank", F.row_number().over(within))
    )


def emit(edges: DataFrame, budget: int, method: str = "HB",
         weight_col: str = "weight") -> DataFrame:
    """Emit up to ``budget`` pairs in the given order; output adds
    ``emit_rank`` (1-based emission position).

    Orders (utils.py:542-595 _emit_pairs):
      TOP: global weight desc.
      HB : every neighborhood's best edge first (neighborhood avg-weight
           order), then the remainder DFS-style.
      DFS: neighborhoods in avg-weight order, each fully drained.
      BFS: round-robin over neighborhoods by within-neighborhood rank.
    """
    method = method.upper()
    if method not in EMIT_METHODS:
        raise ValueError(f"unknown emission method {method}")
    w = F.col(weight_col)
    if method == "TOP":
        key = [w.desc(), F.col("id1").asc(), F.col("id2").asc()]
        ordered = edges
    else:
        ordered = _scheduled(edges, weight_col)
        if method == "HB":
            key = [(F.col("within_rank") > 1).cast("int").asc(),
                   F.col("nb_rank").asc(), F.col("within_rank").asc()]
        elif method == "DFS":
            key = [F.col("nb_rank").asc(), F.col("within_rank").asc()]
        else:  # BFS
            key = [F.col("within_rank").asc(), F.col("nb_rank").asc()]
    out = ordered.orderBy(*key).limit(budget)
    # unpartitioned window is safe HERE: its input is already capped at
    # ``budget`` rows by the limit above (TakeOrdered), not data-sized
    rank_w = Window.orderBy(*key)
    return out.select(
        "id1", "id2", w.alias("weight"),
        F.row_number().over(rank_w).alias("emit_rank"),
    )


def global_top_pm(postings: DataFrame, budget: int,
                  scheme: str = "JS") -> DataFrame:
    """GlobalTopPM (prioritization.py:506-561): PCEP — all blocking-graph
    edges weighted, global top-``budget`` by weight."""
    from .comparison_cleaning import edge_weights

    e = edge_weights(postings, scheme)
    return emit(e, budget, "TOP")


def local_top_pm(postings: DataFrame, budget: int, scheme: str = "JS",
                 k: int | None = None) -> DataFrame:
    """LocalTopPM (prioritization.py:563-619): PCNP — per-node top-k
    neighborhoods, then budgeted emission (DFS neighborhood order)."""
    from .comparison_cleaning import cardinality_node_pruning

    e = cardinality_node_pruning(postings, scheme, k=k)
    return emit(e, budget, "DFS")


def random_pm(postings: DataFrame, budget: int) -> DataFrame:
    """RandomPM (prioritization.py:952-984): random sample of the
    deduped comparisons. The reference uses an unseeded RNG; we use a
    DETERMINISTIC pseudo-random order — md5 of the canonical pair — so
    runs and oracles reproduce (documented delta)."""
    from .block_building import block_pairs

    pairs = block_pairs(postings)
    key = F.md5(F.concat_ws("-", F.col("id1"), F.col("id2")))
    w_ = Window.orderBy(key.asc(), F.col("id1").asc(), F.col("id2").asc())
    return (
        pairs.orderBy(key.asc(), F.col("id1").asc(), F.col("id2").asc())
        .limit(budget)
        .select("id1", "id2", F.row_number().over(w_).alias("emit_rank"))
    )


def pes(postings: DataFrame, budget: int, scheme: str = "CBS",
        method: str = "HB") -> DataFrame:
    """ProgressiveEntityScheduling (comparison_cleaning.py:984-1086 +
    prioritization.py:986-1025): all blocking-graph edge weights,
    neighborhoods scheduled by avg weight, emitted by ``method``."""
    from .comparison_cleaning import edge_weights

    e = edge_weights(postings, scheme)
    return emit(e, budget, method)
