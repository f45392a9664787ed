"""Toy-graph semantics for the driver-side sequential clusterers
(reference clustering.py:793-1634 re-expressed; see each docstring)."""

from pyjedai_spark.operators import clustering as CL


def _clusters(df):
    got = {}
    for r in df.collect():
        got.setdefault(r["cluster_id"], set()).add(r["eid"])
    return sorted(sorted(v) for v in got.values())


def test_cut_clustering_separates_weakly_linked_groups(spark):
    edges = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.9), (1, 3, 0.9),
         (4, 5, 0.9), (5, 6, 0.9), (4, 6, 0.9), (3, 4, 0.55)],
        "id1 long, id2 long, sim double")
    out = CL.cut_clustering(edges, similarity_threshold=0.5, alpha=0.6)
    assert _clusters(out) == [[1, 2, 3], [4, 5, 6]]


def test_correlation_clustering_respects_initial_components(spark):
    edges = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.9), (4, 5, 0.9), (3, 4, 0.1)],
        "id1 long, id2 long, sim double")
    out = CL.correlation_clustering(edges, initial_threshold=0.5,
                                    lsi_iterations=50)
    cl = _clusters(out)
    # the 0.1 edge is below initial_threshold AND non-similar: the two
    # dense groups stay apart (objective rewards their separation)
    g1 = next(c for c in cl if 1 in c)
    g4 = next(c for c in cl if 4 in c)
    assert {2, 3} <= set(g1) and 4 not in g1
    assert 5 in g4


def test_kiraly_msm_prefers_higher_similarity(spark):
    # men {1,3}, women {2,4}: 1 prefers 2 (0.9); 3 also proposes to 2
    # (0.8) but is rejected, settles for 4 (0.7)
    edges = spark.createDataFrame(
        [(1, 2, 0.9), (3, 2, 0.8), (3, 4, 0.7)],
        "id1 long, id2 long, sim double")
    out = CL.kiraly_msm_clustering(edges, side1=[1, 3],
                                   similarity_threshold=0.1)
    got = {(r["id1"], r["id2"]) for r in out.collect()}
    assert got == {(1, 2), (3, 4)}


def test_row_column_one_to_one_assignment(spark):
    edges = spark.createDataFrame(
        [(1, 2, 0.9), (1, 4, 0.8), (3, 2, 0.85), (3, 4, 0.6)],
        "id1 long, id2 long, sim double")
    out = CL.row_column_clustering(edges, side1=[1, 3],
                                   similarity_threshold=0.5)
    got = {(r["id1"], r["id2"]) for r in out.collect()}
    # 1-1 matching; every side-1 id matched at most once
    assert len(got) == len({a for a, _ in got}) == len({b for _, b in got})
    assert got  # non-empty


def test_ricochet_centers_cover_all_matched_entities(spark):
    edges = spark.createDataFrame(
        [(1, 2, 0.9), (2, 3, 0.7), (4, 5, 0.95)],
        "id1 long, id2 long, sim double")
    out = CL.ricochet_sr_clustering(edges, similarity_threshold=0.5)
    members = {r["eid"] for r in out.collect()}
    assert {1, 2, 3, 4, 5} <= members
    # 4-5 is the strongest pair: they share a cluster
    cl = _clusters(out)
    g45 = next(c for c in cl if 4 in c)
    assert 5 in g45


def test_unique_mapping_distributed_equals_sequential(spark):
    """Iterated locally-dominant matching == the sequential greedy scan
    (Preis local-dominance), on a corpus with real weight ties."""
    from pyjedai_spark.operators import clustering as CL
    from pyjedai_spark.operators import dedup as DD
    from pyjedai_spark.synth import webtext_df

    docs, _ = webtext_df(spark, n_docs=200, seed=41)
    edges = DD.ngram_jaccard_pairs(docs, n=3, threshold=0.3,
                                   id_col="eid", text_col="text") \
        .withColumnRenamed("jaccard", "sim")
    seq = {(r["id1"], r["id2"]) for r in CL.unique_mapping_clustering(
        edges, similarity_threshold=0.3).collect()}
    dist = {(r["id1"], r["id2"]) for r in CL.unique_mapping_distributed(
        edges, similarity_threshold=0.3).collect()}
    assert seq == dist and seq
