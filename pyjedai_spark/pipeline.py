"""End-to-end dedup pipelines.

1. ``der_dedup_pipeline`` — the reference's best Dirty-ER chain
   (workflow.py:718-735): StandardBlocking -> BlockPurging(1.0) ->
   BlockFiltering(0.8) -> CNP(JS) -> EntityMatching(cosine, 0.55) ->
   ConnectedComponents. The exact-key parity pipeline.

2. ``minhash_dedup_pipeline`` — the 100TB path (north rule):
   MinHash signatures -> LSH band groupBy -> size-capped buckets ->
   exact-Jaccard verify -> ConnectedComponents. Same output shape
   (eid, cluster_id), so both feed the same recall evaluation.

Each stage may checkpoint through a CheckpointManager (resume +
lineage metrics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .checkpoint import CheckpointManager
from .operators import block_building as BB
from .operators import block_cleaning as BC
from .operators import clustering as CL
from .operators import comparison_cleaning as CC
from .operators import dedup as DD
from .operators import matching as M


def der_dedup_pipeline(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text",
                       purging_smoothing: float = 1.0,
                       filtering_ratio: float = 0.8,
                       matching_threshold: float = 0.55,
                       cnp_scheme: str = "JS",
                       ckpt: CheckpointManager | None = None,
                       fingerprint: str = "") -> DataFrame:
    """Reference best-DER chain -> (eid, cluster_id)."""
    spark = docs.sparkSession
    ck = ckpt or CheckpointManager("", enabled=False)
    num_entities = docs.count()

    postings = ck.stage(spark, "blocking",
                        lambda: BB.standard_blocking(docs, id_col, text_col),
                        fingerprint)
    purged = ck.stage(spark, "purging",
                      lambda: BC.block_purging(postings, purging_smoothing),
                      fingerprint)
    filtered = ck.stage(spark, "filtering",
                        lambda: BC.block_filtering(purged, filtering_ratio),
                        fingerprint)
    candidates = ck.stage(
        spark, "cnp",
        lambda: CC.cardinality_node_pruning(filtered, cnp_scheme,
                                            num_entities=num_entities),
        fingerprint)
    matched = ck.stage(
        spark, "matching",
        lambda: M.entity_matching(candidates.select("id1", "id2"), docs,
                                  metric="cosine",
                                  tokenizer="white_space_tokenizer",
                                  similarity_threshold=matching_threshold,
                                  id_col=id_col, text_col=text_col,
                                  round_to=6),
        fingerprint)
    clusters = ck.stage(
        spark, "clustering",
        lambda: CL.connected_components(
            matched.select("id1", "id2"),
            nodes=docs.select(F.col(id_col).alias("eid"))),
        fingerprint)
    return clusters


def minhash_dedup_pipeline(docs: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text",
                           k: int = 32, bands: int = 8,
                           shingle_size: int = 1,
                           jaccard_threshold: float = 0.5,
                           max_bucket: int = 1000,
                           ckpt: CheckpointManager | None = None,
                           fingerprint: str = "") -> DataFrame:
    """MinHash-LSH near-dup chain -> (eid, cluster_id)."""
    spark = docs.sparkSession
    ck = ckpt or CheckpointManager("", enabled=False)

    cands = ck.stage(
        spark, "lsh_candidates",
        lambda: DD.lsh_candidate_pairs(docs, k=k, bands=bands,
                                       shingle_size=shingle_size,
                                       id_col=id_col, text_col=text_col,
                                       max_bucket=max_bucket),
        fingerprint)
    verified = ck.stage(
        spark, "verify",
        lambda: DD.jaccard_verify(cands, docs, jaccard_threshold,
                                  shingle_size, id_col, text_col),
        fingerprint)
    clusters = ck.stage(
        spark, "clustering",
        lambda: CL.connected_components(
            verified.select("id1", "id2"),
            nodes=docs.select(F.col(id_col).alias("eid"))),
        fingerprint)
    return clusters
