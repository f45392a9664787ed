"""Dup-pair recall vs the reference replica (BASELINE.json criterion:
>= 0.99 at identical config).

The replica (parity/reference_replica.py) is a faithful pure-Python
implementation of the reference's best-DER chain; the Spark engine must
reproduce its cluster assignments on the synthetic webtext corpus.
"""

import pytest
from pyspark.sql import functions as F

from parity.reference_replica import der_dedup, dup_pairs_from_clusters
from pyjedai_spark.pipeline import der_dedup_pipeline, minhash_dedup_pipeline
from pyjedai_spark.synth import generate_webtext, webtext_df


@pytest.fixture(scope="module")
def corpus(spark):
    docs, gt = webtext_df(spark, n_docs=300, seed=11, dup_fraction=0.35,
                          mutation_rate=0.08)
    rows, _ = generate_webtext(n_docs=300, seed=11, dup_fraction=0.35,
                               mutation_rate=0.08)
    texts = {r["eid"]: r["text"] for r in rows}
    return docs.cache(), gt.cache(), texts


def _pairs_of(assign_df):
    a = assign_df.select("cluster_id", F.col("eid").alias("id1"))
    b = assign_df.select("cluster_id", F.col("eid").alias("id2"))
    return {
        (r["id1"], r["id2"])
        for r in a.join(b, "cluster_id").where(F.col("id1") < F.col("id2")).collect()
    }


def test_der_chain_matches_reference_replica(spark, corpus):
    docs, gt, texts = corpus
    spark_assign = der_dedup_pipeline(docs, id_col="eid")
    spark_pairs = _pairs_of(spark_assign)
    ref_assign = der_dedup(texts)
    ref_pairs = dup_pairs_from_clusters(ref_assign)
    inter = len(spark_pairs & ref_pairs)
    recall_vs_ref = inter / len(ref_pairs) if ref_pairs else 1.0
    recall_vs_spark = inter / len(spark_pairs) if spark_pairs else 1.0
    assert recall_vs_ref >= 0.99, (
        f"recall vs reference replica {recall_vs_ref:.4f} "
        f"({inter}/{len(ref_pairs)})")
    assert recall_vs_spark >= 0.99, (
        f"reverse recall {recall_vs_spark:.4f} — Spark emits extra pairs")


def test_minhash_pipeline_recall_vs_gt(spark, corpus):
    docs, gt, _ = corpus
    assign = minhash_dedup_pipeline(docs, id_col="eid", k=64, bands=32,
                                    shingle_size=3, jaccard_threshold=0.35)
    pairs = _pairs_of(assign)
    gt_pairs = {(r["id1"], r["id2"]) for r in gt.collect()}
    tp = len(pairs & gt_pairs)
    recall = tp / len(gt_pairs)
    assert recall >= 0.95, f"minhash GT recall {recall:.3f} ({tp}/{len(gt_pairs)})"
