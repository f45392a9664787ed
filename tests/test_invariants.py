"""Per-row invariant (BASELINE.json input_hint): byte-identical
extracted text per url — the Arrow pandas UDF must equal a pandas
.apply of the same pure-Python function. Plus clustering correctness
vs networkx and MinHash-LSH recall vs exact Jaccard."""

import random

import networkx as nx
import pandas as pd
from pyspark.sql import functions as F

from pyjedai_spark.datamodel import extract_text_py, extract_text_udf
from pyjedai_spark.operators.clustering import connected_components
from pyjedai_spark.operators.dedup import minhash_dedup_pairs, ngram_jaccard_pairs
from pyjedai_spark.synth import generate_webtext, webtext_df


def test_extraction_byte_identical(spark):
    rows, _ = generate_webtext(n_docs=200, seed=3)
    sdf = spark.createDataFrame(
        [(r["eid"], bytearray(r["html"])) for r in rows], "eid long, html binary")
    got = {r["eid"]: r["t"] for r in
           sdf.select("eid", extract_text_udf(F.col("html")).alias("t")).collect()}
    ref = pd.Series({r["eid"]: r["html"] for r in rows}).map(extract_text_py)
    for eid, expect in ref.items():
        assert got[eid] == expect, f"doc {eid} extraction differs"
        # and the invariant vs the generator's own text column
        assert got[eid] == rows[eid]["text"]


def test_connected_components_matches_networkx(spark):
    rng = random.Random(5)
    for trial, (n, m) in enumerate([(60, 40), (100, 90), (50, 200)]):
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        # include a long path (worst case for naive min propagation)
        edges += [(i + 200, i + 201) for i in range(40)]
        g = nx.Graph(edges)
        e = spark.createDataFrame(edges, "id1 long, id2 long")
        out = {r["eid"]: r["cluster_id"]
               for r in connected_components(e).collect()}
        for comp in nx.connected_components(g):
            roots = {out[v] for v in comp}
            assert len(roots) == 1, f"trial {trial}: split component {comp}"
            assert min(comp) == roots.pop()


def test_minhash_lsh_recall_vs_exact(spark):
    docs, _ = webtext_df(spark, n_docs=300, seed=23, dup_fraction=0.4,
                         mutation_rate=0.06)
    exact = {(r["id1"], r["id2"])
             for r in ngram_jaccard_pairs(docs, n=3, threshold=0.7,
                                          id_col="eid").collect()}
    lsh = {(r["id1"], r["id2"])
           for r in minhash_dedup_pairs(docs, threshold=0.7, k=64, bands=32,
                                        shingle_size=3, id_col="eid").collect()}
    assert exact, "fixture produced no exact near-dup pairs"
    recall = len(lsh & exact) / len(exact)
    assert recall >= 0.99, f"LSH recall vs exact {recall:.4f}"
    # LSH must not hallucinate: verified pairs are a subset of exact
    assert lsh <= exact
