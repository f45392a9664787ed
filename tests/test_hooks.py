"""External-integration hooks: pretrained-encoder stage and LLM pair
matching — injectable, import-guarded, Spark-side plumbing fully tested
with deterministic fakes (the heavy libs are not in this container)."""

import pytest
from pyspark.sql import functions as F


def make_fake_encoder():
    """Deterministic 8-dim embedding from md5 bytes. Returned as a
    CLOSURE: cloudpickle ships nested functions by value, so the fake
    reaches executors without the tests dir on their PYTHONPATH."""
    def fake_encoder(texts):
        import hashlib as _h
        return [[b / 255.0 for b in _h.md5(t.encode()).digest()[:8]]
                for t in texts]
    return fake_encoder


def make_fake_transport():
    """Match iff both records share their first token (closure, see
    make_fake_encoder)."""
    def fake_transport(prompts):
        out = []
        for p in prompts:
            body = p[len("record 1: "):]
            r1, r2 = body.split(", record 2: ")
            r2 = r2[: -len(". Answer with True. or False.")]
            out.append("True." if r1.split()[:1] == r2.split()[:1]
                       else "False.")
        return out
    return fake_transport


def test_model_embedding_feeds_ann(spark):
    from pyjedai_spark.functions import vectors as V

    docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma delta epsilon"),
         (4, None)],
        "doc_id long, text string")
    fake_encoder = make_fake_encoder()
    emb = V.model_embedding(docs, fake_encoder)
    rows = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    assert len(rows) == 4 and all(len(v) == 8 for v in rows.values())
    assert rows[1] == rows[2] != rows[3]          # deterministic encode
    assert rows[4] == fake_encoder([""])[0]        # null text -> ""
    # exact output shape feeds the ANN path end-to-end
    top = V.lsh_topk(emb, k=2, dim=8)
    got = {(r["query_id"], r["neighbor_id"]) for r in top.collect()}
    assert (1, 2) in got and (2, 1) in got


def test_model_embedding_spec_import_guard(spark):
    from pyjedai_spark.functions import vectors as V

    pytest.importorskip
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    try:
        import sentence_transformers  # noqa: F401
        pytest.skip("sentence-transformers installed; guard not testable")
    except ImportError:
        pass
    with pytest.raises(Exception, match="sentence-transformers"):
        V.model_embedding(docs, "sentence-transformers:all-MiniLM-L6-v2") \
            .collect()
    with pytest.raises(Exception, match="unknown encoder spec"):
        V.model_embedding(docs, "word2vec:foo").collect()


def test_llm_match_with_injected_transport(spark):
    from pyjedai_spark.operators.llm_matching import llm_match

    docs = spark.createDataFrame(
        [(1, "acme corp boston"), (2, "acme inc boston ma"),
         (3, "zenith ltd"), (4, "acme corporation")],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 4), (3, 4)], "id1 long, id2 long")
    out = {(r["id1"], r["id2"]): r["is_match"]
           for r in llm_match(pairs, docs, make_fake_transport()).collect()}
    assert out == {(1, 2): 1, (1, 3): 0, (2, 4): 1, (3, 4): 0}
    # keep_responses exposes the normalized model answers for audit
    from pyjedai_spark.operators.llm_matching import llm_match as lm
    resp = lm(pairs, docs, make_fake_transport(), keep_responses=True)
    assert set(resp.columns) == {"id1", "id2", "is_match", "response"}
    assert {r["response"] for r in resp.collect()} == {"True", "False"}


def test_llm_match_default_transport_import_guard(spark):
    from pyjedai_spark.operators.llm_matching import (llm_match,
                                                      ollama_transport)

    try:
        import ollama  # noqa: F401
        pytest.skip("ollama installed; guard not testable")
    except ImportError:
        pass
    docs = spark.createDataFrame([(1, "a"), (2, "b")],
                                 "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id1 long, id2 long")
    with pytest.raises(Exception, match="ollama"):
        llm_match(pairs, docs, ollama_transport("llama3")).collect()
