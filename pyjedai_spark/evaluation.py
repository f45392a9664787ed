"""Evaluation: precision / recall / F1 of predicted pairs vs ground
truth (reference src/pyjedai/evaluation.py:54-79; recall = |GT semi-join
pred| / |GT| — a left-semi join + count, never a python loop)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_pairs(df: DataFrame, c1: str = "id1", c2: str = "id2") -> DataFrame:
    return df.select(
        F.least(F.col(c1), F.col(c2)).alias("id1"),
        F.greatest(F.col(c1), F.col(c2)).alias("id2"),
    ).distinct()


def pair_metrics(pred: DataFrame, gt: DataFrame) -> dict:
    """dict(tp, fp, fn, precision, recall, f1). Both inputs any pair
    DataFrames; canonicalized before comparison."""
    p = canonical_pairs(pred).cache()
    g = canonical_pairs(gt).cache()
    tp = p.join(g, ["id1", "id2"], "left_semi").count()
    np_, ng = p.count(), g.count()
    precision = tp / np_ if np_ else 0.0
    recall = tp / ng if ng else 0.0
    f1 = (2 * precision * recall / (precision + recall)) if (precision + recall) else 0.0
    return {"tp": tp, "fp": np_ - tp, "fn": ng - tp,
            "precision": precision, "recall": recall, "f1": f1}


def clusters_recall(assign: DataFrame, gt: DataFrame) -> dict:
    """Recall where a GT pair counts as found iff both sides share a
    cluster (evaluation.py:131-156 entity-index-from-clusters check)."""
    a1 = assign.select(F.col("eid").alias("id1"), F.col("cluster_id").alias("c1"))
    a2 = assign.select(F.col("eid").alias("id2"), F.col("cluster_id").alias("c2"))
    g = canonical_pairs(gt)
    joined = g.join(a1, "id1", "left").join(a2, "id2", "left")
    tp = joined.where(F.col("c1") == F.col("c2")).count()
    ng = g.count()
    return {"tp": tp, "gt": ng, "recall": tp / ng if ng else 0.0}
